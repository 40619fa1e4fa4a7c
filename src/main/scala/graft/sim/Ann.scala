package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and an LSH-bucketed
  * (random-hyperplane / SRP) variant as the scale path.
  *
  * All-vector scoring is a single scan: the query vector travels as a
  * literal/broadcast, the dot product is a `Column` fold
  * (`zip_with` + `aggregate`) — codegen-friendly, no UDF, no collect of the
  * corpus. At 10^9 vectors brute force is one full scan per query; SRP
  * bucketing prunes the scan to matching buckets (partition-prunable if the
  * table is written partitioned by bucket).
  */
object Ann {

  /** Cosine similarity between two array<float/double> columns (double
    * accumulation, sequential fold — deterministic).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def norm(x: Column) =
      sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot(a, b) / (norm(a) * norm(b))
  }

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Exact top-k neighbors of `queryId`'s vector (excluded from results):
    * broadcast the 1-row query side, score all, then `orderBy().limit(k)` —
    * Catalyst plans TakeOrderedAndProject (per-partition heap top-k, driver
    * merge of k·partitions rows), so no global single-partition sort ever
    * materializes. Deterministic via the (sim desc, id asc) tie-break.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qvec"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cosine(col(vecCol), col("_qvec")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane weights (no RNG state: weight
    * of plane p, dim j = hash-derived uniform in [-0.5, 0.5]) — the same
    * planes at any parallelism, any session.
    */
  def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { j =>
        val h = scala.util.hashing.MurmurHash3.productHash((p, j, 42))
        (h & 0xffff).toDouble / 0xffff.toDouble - 0.5
      }
    }

  /** SRP bucket id: sign bits of the vector against `nPlanes` hyperplanes,
    * packed into an int. Pure Column fold over literal plane arrays.
    */
  def srpBucket(vec: Column, ps: Array[Array[Double]]): Column =
    ps.zipWithIndex.map { case (w, p) =>
      val dot = aggregate(
        zip_with(vec, typedlit(w.toSeq), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Approximate top-k via SRP-LSH: score only vectors in the query's
    * bucket or any bucket at Hamming distance 1 (multi-probe) — recall
    * traded for a pruned scan. Returns the same schema as brute force.
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val ps = planes(nPlanes, dim)
    val withBucket = emb.withColumn("_bucket", srpBucket(col(vecCol), ps))
    val q = withBucket.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qvec"), col("_bucket").as("_qbucket"))
    val probes = withBucket.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .filter(bit_count(col("_bucket").bitwiseXOR(col("_qbucket"))) <= 1)
    probes
      .select(col(idCol), cosine(col(vecCol), col("_qvec")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Squared L2 distance between an array column and a literal vector
    * (sequential double fold — deterministic, codegen-friendly).
    */
  private def l2Sq(vec: Column, c: Array[Double]): Column =
    aggregate(zip_with(vec, typedlit(c.toSeq),
      (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Nearest-centroid cell id: argmin over `cents` via array_min on
    * (dist, idx) structs (lexicographic struct order ⇒ min distance,
    * ties to the lower cell id — deterministic).
    */
  def ivfCell(vec: Column, cents: Array[Array[Double]]): Column =
    // array() erases struct field aliases → positional col1/col2
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(l2Sq(vec, c), lit(i))
    }: _*)).getField("col2")

  /** Quantization denominator for Lloyd means: values are accumulated as
    * `floor(v * 2^20)` integers so the per-cell mean is order-independent
    * (bit-identical at any parallelism — and recomputable by any engine
    * with exact integer sums; ~1e-6 quantization is far below any
    * clustering-relevant signal).
    */
  val LloydQuant: Long = 1L << 20

  /** Deterministic IVF centroids: seed with the `nlist` vectors whose ids
    * sort lowest by `md5(id)` (a uniform pseudo-random sample, stable
    * across runs, parallelism, and engines — md5 of the decimal id string
    * is portable SQL, unlike xxhash64), then refine with `iters` Lloyd
    * steps computed as DataFrame aggregations (posexplode → per-(cell, dim)
    * quantized mean) — one distributed pass per iteration, centroids live
    * on the driver like any broadcast dim. Empty cells keep their previous
    * centroid. The seed scan is a TakeOrdered top-nlist (per-partition
    * heap), never a global sort.
    */
  def ivfCentroids(emb: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 1): Array[Array[Double]] = {
    val seeds = emb
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nlist)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue).toArray)
    // corpus smaller than nlist: every vector is its own centroid
    (1 to iters).foldLeft(seeds)((cents, _) => lloydStep(emb, vecCol, cents))
  }

  /** One Lloyd refinement pass: assign every vector to its nearest
    * centroid, return the per-cell per-dimension means. Means are computed
    * over `floor(v * LloydQuant)` integer sums, so the result does not
    * depend on float accumulation order (deterministic at any parallelism;
    * SURVEY.md §7.4.1 numeric discipline).
    */
  private def lloydStep(emb: DataFrame, vecCol: String,
      cents: Array[Array[Double]]): Array[Array[Double]] = {
    // materialize the cell BEFORE exploding: ArrayAggregate HOFs are
    // interpreted (CodegenFallback), and projection collapse would
    // otherwise re-evaluate the nlist-centroid fold once per exploded
    // DIMENSION (a dim× blowup of the most expensive expression)
    val withCell = emb
      .select(ivfCell(col(vecCol), cents).as("cell"), col(vecCol).as("_v"))
      .persist()
    val means = withCell
      .select(col("cell"), posexplode(col("_v")).as(Seq("pos", "v")))
      .groupBy("cell", "pos")
      .agg((sum(floor(col("v").cast("double") * LloydQuant)).cast("long") /
        (count(lit(1)) * LloydQuant.toDouble)).as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("e"))
      .select(col("cell"), expr("transform(e, x -> x.m)").as("c"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    withCell.unpersist()
    Array.tabulate(cents.length)(i => means.getOrElse(i, cents(i)))
  }

  /** IVF approximate top-k: scan only the `nprobe` cells whose centroids
    * are nearest the query vector — the inverted-file scale path (the
    * cell id is a write-once partition column at rest, so the probe is
    * partition pruning). Returned sims are exact cosines of the scanned
    * vectors; orderBy().limit() keeps the top-k plan a per-partition heap.
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = ivfCentroids(emb, idCol, vecCol, nlist)
    val withCell = emb.withColumn("_cell", ivfCell(col(vecCol), cents))
    val q = withCell.filter(col(idCol) === queryId)
      .select(col(vecCol)).head(1).headOption
    if (q.isEmpty)
      // absent query id degrades to an empty result like bruteForceTopK /
      // lshTopK (empty broadcast side), never a NoSuchElementException
      return emb.limit(0).select(col(idCol), lit(0.0).as("sim"))
    val qvec = q.get.getSeq[Number](0).map(_.doubleValue).toArray
    val probeCells = cents.zipWithIndex
      .map { case (c, i) =>
        (c.zip(qvec).map { case (a, b) => (a - b) * (a - b) }.sum, i) }
      .sorted.take(nprobe).map(_._2)
    withCell
      .filter(col("_cell").isin(probeCells.map(Integer.valueOf): _*) &&
        col(idCol) =!= queryId)
      .select(col(idCol),
        cosine(col(vecCol), typedlit(qvec.toSeq)).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** k-nearest-neighbor join over SRP probe buckets — the neighbor-graph
    * builder (semantic clustering / graph-based dedup): for every QUERY
    * vector, score only corpus vectors in its own bucket or any bucket at
    * Hamming distance 1 (the [[lshTopK]] multi-probe rule, generalized
    * from one query to a join) and keep the top `k` by (sim desc, id).
    * Returns (id, neighbor_id, sim, rank), rank in [1, k].
    *
    * Scale shape: each query explodes to its 1 + nPlanes probe buckets
    * (flip one sign bit each) and candidates come from one equi-join on
    * the probed bucket — never an all-pairs scan. The per-query ranking
    * window's input is only that query's probe candidates, bounded by
    * (nPlanes + 1) · maxBucket thanks to the same construction-time
    * bucket cap as [[cosineDupPairs]] (identical vectors share buckets by
    * design — pre-collapse exact duplicates for the O(m) path). The
    * bucketed corpus is materialized once — the cap's count job doubles
    * as the lazy `localCheckpoint`'s barrier — so the nPlanes-hyperplane
    * fold runs once, not once per consumer.
    */
  def knnJoin(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int = 8, dim: Int = 64,
      maxBucket: Long = 10000L): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(nPlanes > 0 && nPlanes < 63, s"nPlanes=$nPlanes out of range")
    require(maxBucket > 1, s"maxBucket=$maxBucket must be > 1")
    val ps = planes(nPlanes, dim)
    val b = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_nv"))
      .withColumn("_nb", srpBucket(col("_nv"), ps))
      .localCheckpoint(eager = false)
    // construction-time corpus-wide bucket cap (Dedup.assertMaxBucket);
    // the count job doubles as the checkpoint materialization barrier
    graft.dedup.Dedup.assertMaxBucket(b, Seq("_nb"), maxBucket,
      "knnJoin", "pre-collapse exact-identical vectors or raise maxBucket")
    // each query probes its own bucket + the nPlanes Hamming-1 buckets
    val qb = queries.select(col(idCol).as("id"), col(vecCol).as("_qv"))
      .withColumn("_qb", srpBucket(col("_qv"), ps))
      .select(col("id"), col("_qv"), explode(array(
        col("_qb") +: (0 until nPlanes).map(p =>
          col("_qb").bitwiseXOR(lit(1L << p))): _*)).as("_nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("sim").desc, col("neighbor_id"))
    qb.join(b, Seq("_nb"))
      .filter(col("id") =!= col("neighbor_id"))
      .select(col("id"), col("neighbor_id"),
        cosine(col("_nv"), col("_qv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs: SRP-bucket join (exact bucket match)
    * then exact cosine >= minSim verification — the embedding analog of
    * MinHash-LSH dedup.
    *
    * `maxBucket` is the duplicate-class fan-out guard (the
    * [[graft.dedup.Dedup.lshCandidatePairs]] contract): identical vectors
    * share their SRP bucket by design, so an uncollapsed m-copy class
    * emits m·(m−1)/2 pairs through the self-join — any bucket beyond the
    * cap fails loudly at operator-construction time
    * ([[graft.dedup.Dedup.assertMaxBucket]], corpus-wide; pre-collapse
    * exact-identical vectors with
    * [[graft.dedup.Dedup.dupComponentsCollapsed]] keyed on the vector
    * column for the O(m) path). The bucketed relation is materialized
    * once — the cap's count job doubles as the lazy `localCheckpoint`'s
    * barrier — so the `nPlanes`-hyperplane fold — an interpreted HOF,
    * the expensive part — runs once, not once per join side.
    */
  def cosineDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      minSim: Double, nPlanes: Int = 12, dim: Int = 64,
      maxBucket: Long = 10000L): DataFrame = {
    require(maxBucket > 1, s"maxBucket=$maxBucket must be > 1")
    val ps = planes(nPlanes, dim)
    val b = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", srpBucket(col("v"), ps))
      .localCheckpoint(eager = false)
    // construction-time corpus-wide bucket cap (Dedup.assertMaxBucket);
    // the count job doubles as the checkpoint materialization barrier
    graft.dedup.Dedup.assertMaxBucket(b, Seq("bucket"), maxBucket,
      "cosineDupPairs",
      "the self-join would emit O(size²) pairs; pre-collapse " +
        "exact-identical vectors (Dedup.dupComponentsCollapsed on the " +
        "vector column) or raise maxBucket")
    b.as("x").join(b.as("y"), Seq("bucket"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        cosine(col("x.v"), col("y.v")).as("sim"))
      .filter(col("sim") >= minSim)
  }
}
