package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live in [[graft.queries.Queries]]; the engine
  * proper is under graft.{codec, pivot, rollup, gen}.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The PyReshaper-analog path: pivot → compressed segments → decode.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Queries.pivotRoundtrip(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (non-SQL-expressible ops, e.g.
    * segment_stats) get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = graft.queries.Queries.oracles
}
