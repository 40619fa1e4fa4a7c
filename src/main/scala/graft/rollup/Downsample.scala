package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M4 visualization-oriented time-series downsampling (Jugel et al.,
  * "M4: A Visualization-Oriented Time Series Data Aggregation",
  * VLDB 2014 — public algorithm): per (series, pixel-bucket) keep the
  * FIRST, LAST, MIN-value and MAX-value points. Rendering those ≤4
  * points per bucket reproduces the exact pixel-perfect line a plot of
  * the full series would produce, which is why M4 is the standard
  * dashboard/preview downsampler — the reference's analog is the
  * time-series extraction its outputs feed into plotting workflows.
  *
  * Shape: ONE hash aggregation (map-side partial combine, AQE-balanced
  * on the (key, bucket) grain) — no window, no sort, no second pass.
  * Determinism under ties: every min_by/max_by ordering key is the full
  * (ts, value) / (value, ts) pair and the carried payload is the same
  * pair, so rows tying on the key are bitwise-identical payloads and
  * any winner yields the same output (exact-oracle-checkable).
  */
object Downsample {

  /** M4 per (`keyCol`, bucket) where bucket = floor(ts / bucketWidth)
    * over a numeric time column (any unit; pass epoch-micros for
    * timestamp data). Returns one row per non-empty bucket:
    * (key, bucket, ts_first, v_first, ts_last, v_last,
    *  ts_min, v_min, ts_max, v_max, n).
    */
  def m4(points: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    val ts = col(tsCol)
    val v = col(valueCol)
    val byTime = struct(ts.as("t"), v.as("v"))   // order: (ts, value)
    val byValue = struct(v.as("v"), ts.as("t"))  // order: (value, ts)
    points
      .groupBy(col(keyCol), floor(ts / bucketWidth).cast("long").as("bucket"))
      .agg(
        min_by(byTime, byTime).as("_f"),
        max_by(byTime, byTime).as("_l"),
        min_by(byTime, byValue).as("_mn"),
        max_by(byTime, byValue).as("_mx"),
        count(lit(1)).as("n"))
      .select(col(keyCol), col("bucket"),
        col("_f.t").as("ts_first"), col("_f.v").as("v_first"),
        col("_l.t").as("ts_last"), col("_l.v").as("v_last"),
        col("_mn.t").as("ts_min"), col("_mn.v").as("v_min"),
        col("_mx.t").as("ts_max"), col("_mx.v").as("v_max"),
        col("n"))
  }
}
