package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]): brute-force
  * cosine top-k as the exact baseline, and a deterministic random-
  * hyperplane LSH variant as the scale path. (Extension surface —
  * BASELINE.json north star.)
  *
  * 100 TB design: the query set is broadcast (queries are small by
  * definition); the corpus is scanned once, partition-parallel; per-query
  * top-k is a key-partitioned window over (query, sim) — the only shuffle
  * is candidate rows, and LSH bucketing cuts candidates from |corpus| to a
  * bucket's worth before any pairwise math.
  */
object Similarity {

  /** Sequential-fold dot product of two equal-length double arrays via
    * zip_with + aggregate — deterministic evaluation order (array order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; callers should `round` the result before ranking
    * if cross-engine determinism matters (float sums differ in the last
    * ulp across engines; rounding to 4dp absorbs that). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cast an Array[Float] embedding to Array[Double] for stable math. */
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact brute-force cosine top-k: for each query row, the k nearest
    * corpus rows (excluding self-matches by id). Cross join with the
    * query side broadcast → corpus is scanned once, no corpus shuffle
    * until the per-query top-k window (which shuffles |Q|·|corpus| sim
    * rows — prune with [[lshTopK]] when |corpus| is large).
    * Similarity is rounded to 4dp BEFORE ranking; ties break on neighbor
    * id, so results are fully deterministic. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val sims = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 4).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * ±1 derived from one md5 hex nibble — no RNG state, reproducible on
    * any engine/partitioning. */
  private def planeSign(p: Int, d: Column): Column =
    when(conv(substring(md5(concat(lit(p.toString), lit("_"),
      d.cast("string"))), 1, 1), 16, 10).cast("int") % 2 === 0, lit(1.0))
      .otherwise(lit(-1.0))

  /** Sign-random-projection LSH signature: bit p = (v · plane_p) > 0, for
    * `planes` md5-derived ±1 hyperplanes, packed into a long. One
    * projection, no shuffle. */
  def lshSignature(vec: Column, planes: Int): Column = {
    val sig = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x * planeSign(p, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    sig.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: candidates = corpus rows sharing the
    * query's signature bucket on ANY of the `bands` signature bands
    * (multi-probe by banding); exact cosine reranking only on candidates.
    * Falls back to fewer than k results when a bucket is sparse — the
    * standard ANN recall/latency trade. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 16, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(planes % bands == 0)
    val r = planes / bands
    val mask = (1L << r) - 1
    // Shift-by-column isn't in the Column API; band buckets are derived by
    // integer division instead: bucket = (sig div 2^(band*r)) & mask.
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"),
      lshSignature(asDouble(col(vecCol)), planes).as("qsig"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"),
      lshSignature(asDouble(col(vecCol)), planes).as("csig"))
    def bandBucket(sig: Column, band: Column): Column =
      pmod(floor(sig / pow(lit(2.0), band * lit(r))).cast("long"), lit(mask + 1))
    val qb = q.select(col("query_id"), col("qv"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"), col("qsig"))
      .withColumn("bucket", bandBucket(col("qsig"), col("band")))
    val cb = c.select(col("neighbor_id"), col("cv"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"), col("csig"))
      .withColumn("bucket", bandBucket(col("csig"), col("band")))
    val candidates = qb.join(cb, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    candidates
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 4).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
