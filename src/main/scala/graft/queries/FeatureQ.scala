package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ml.Features

/** Round-9 feature-engineering pack: leave-one-out target encoding and
  * a single decision stump learned by an integer-exact Gini split —
  * the two tabular-ML preprocessing steps between the raw star schema
  * and a trainer (`t_percep_train` consumes features; this pack
  * MAKES them).
  *
  * Exactness discipline: targets are exact cents, every mean is a
  * sign-safe integer floor division, and the Gini ordering key is a
  * scaled integer floor of the exact rational impurity — identical
  * expression trees on both engines, bit-identical at any
  * partitioning.
  *
  * Scale story: both operators aggregate the fact ONCE onto a
  * dim-sized key space (|segments| = 5, |quantity values| = 50) and do
  * all remaining arithmetic on that tiny relation; the encode's
  * join-back is a broadcast by construction. No global windows ever
  * touch fact-sized data.
  */
object FeatureQ extends QueryPack {

  // ------------------------------------------------------- fe_target_encode

  /** Leave-one-out target encoding of customer market segment against
    * order revenue: for order i in segment g,
    * loo_c = (S_g − x_i) // (n_g − 1) — the standard CV-leak-free
    * category encoding (each row's own target is excluded from its
    * code, so the feature never memorizes the label it will be judged
    * on). Segment sums are ONE partial-agg shuffle onto a 5-row
    * relation broadcast back into the fact; the emitted sample is a
    * deterministic 1-in-97 keyslice (audit rows — the encode itself
    * stays distributed and full-width). Degenerate 1-row segments get
    * NULL (no leave-one-out mean exists), guarded before the division.
    */
  private def feTargetEncode(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .join(Tables.customer(spark, d),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment").as("segment"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_c"))
    Features.looEncode(o, "segment", "price_c")
      .filter(pmod(col("o_orderkey"), lit(97L)) === 0L)
      .select(col("o_orderkey"), col("segment"), col("price_c"),
        col("cat_mean").as("seg_mean_c"),
        col("loo_mean").as("loo_mean_c"))
  }

  private val feTargetEncodeSql =
    """WITH o AS (SELECT o_orderkey, c_mktsegment AS segment,
              CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
            FROM orders JOIN customer ON o_custkey = c_custkey),
       seg AS (SELECT segment, CAST(SUM(price_c) AS HUGEINT) AS s_g,
                      CAST(COUNT(*) AS HUGEINT) AS n_g
               FROM o GROUP BY 1)
       SELECT o_orderkey, segment, price_c,
              CAST(s_g // n_g AS BIGINT) AS seg_mean_c,
              CASE WHEN n_g > 1
                THEN CAST((s_g - price_c) // (n_g - 1) AS BIGINT) END
                AS loo_mean_c
       FROM o JOIN seg USING (segment)
       WHERE o_orderkey % 97 = 0"""

  // --------------------------------------------------------------- ml_stump

  /** Decision stump on the lineitem fact: the quantity threshold t
    * minimizing the Gini-weighted impurity of the split
    * (l_quantity ≤ t) against the label l_returnflag = 'R'. With side
    * counts (n, p) the weighted impurity is the exact rational
    * G(t) = (n_L² − p_L² − q_L²)/n_L + (n_R² − p_R² − q_R²)/n_R
    *      = num/den,  num = A_L·n_R + A_R·n_L,  den = n_L·n_R,
    * all integer. Thresholds are ordered by the scaled floor
    * g_sc = num·10¹² // den (deterministic on both engines; ties →
    * smallest t), and the report carries gini_bp = num·10⁴ // (den·n)
    * = ⌊G/n·10⁴⌋ ∈ [0, 5000]. Widths: at sf1 num ≈ 10²⁰, num·10¹²
    * ≈ 10³² — inside DECIMAL(38,0)/HUGEINT with 6 digits of headroom;
    * past that drop the ordering scale first (documented rescale).
    * Plan: ONE fact shuffle onto the 50-value quantity grid; the
    * cumulative split table and the argmin are windows over those 50
    * rows. The class-count grid is exactly a histogram-split learner's
    * sufficient statistic — the XGBoost/LightGBM binning trick, here
    * exact because quantity is already integral. */
  private def mlStump(spark: SparkSession, d: String): DataFrame =
    Features.giniStump(
      Tables.lineitem(spark, d).select(
        col("l_quantity").cast("long").as("qty"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("pos")),
      "qty", "pos")
      .withColumnRenamed("split_value", "split_qty")

  private val mlStumpSql =
    """WITH grid AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
              COUNT(*) AS n_v,
              SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS p_v
            FROM lineitem GROUP BY 1),
       cum AS (SELECT qty,
               CAST(SUM(n_v) OVER (ORDER BY qty) AS HUGEINT) AS n_l,
               CAST(SUM(p_v) OVER (ORDER BY qty) AS HUGEINT) AS p_l,
               CAST(SUM(n_v) OVER () AS HUGEINT) AS n,
               CAST(SUM(p_v) OVER () AS HUGEINT) AS p
             FROM grid),
       sp AS (SELECT qty, n_l, p_l, n, p, n - n_l AS n_r, p - p_l AS p_r
              FROM cum WHERE n_l < n),
       g AS (SELECT qty, n_l, p_l, n_r, p_r, n,
               (n_l*n_l - p_l*p_l - (n_l-p_l)*(n_l-p_l)) * n_r
               + (n_r*n_r - p_r*p_r - (n_r-p_r)*(n_r-p_r)) * n_l AS num,
               n_l * n_r AS den
             FROM sp),
       r AS (SELECT *, ROW_NUMBER() OVER
               (ORDER BY num * 1000000000000 // den ASC, qty ASC) AS rn
             FROM g)
       SELECT CAST(qty AS BIGINT) AS split_qty,
              CAST(n_l AS BIGINT) AS n_left, CAST(p_l AS BIGINT) AS pos_left,
              CAST(n_r AS BIGINT) AS n_right, CAST(p_r AS BIGINT) AS pos_right,
              CAST(num * 10000 // (den * n) AS BIGINT) AS gini_bp
       FROM r WHERE rn = 1"""

  // ------------------------------------------------------- fe_hash_features

  /** The hashing trick with its collision audit: the (segment,
    * nation) categorical cross — 5·25 = 125 raw categories — is
    * hash-encoded into 16 buckets (bucket = 60-bit md5 of 'seg|nat'
    * mod 16, the engine-portable hash discipline), and the audit
    * reports per bucket how many raw categories collided, the row
    * mass, and the dominant category's share in bp — the dial that
    * tells you whether 16 buckets destroys the feature (dominant share
    * near 10⁴ = collisions are harmless; near 10⁴/n_cats = the bucket
    * is noise). Plan: ONE partial-agg shuffle onto ≤ 125 (bucket,
    * category) rows; everything after is windows over that grid. At
    * 100 TB the category grid, not the fact, bounds every stage. */
  private def feHashFeatures(spark: SparkSession, d: String): DataFrame = {
    val cat = Tables.orders(spark, d)
      .join(Tables.customer(spark, d),
        col("o_custkey") === col("c_custkey"))
      .select(concat(col("c_mktsegment"), lit("|"),
        col("c_nationkey").cast("string")).as("cat"))
      .groupBy("cat").agg(count(lit(1)).as("n"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("cat")), 1, 15), 16, 10).cast("long"),
          lit(16L)))
    cat.groupBy("bucket")
      .agg(count(lit(1)).as("n_cats"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_cat_rows"))
      .select(col("bucket"), col("n_cats"), col("n_rows"),
        expr("max_cat_rows * 10000 div n_rows").as("dominant_share_bp"))
      .orderBy("bucket")
  }

  private val feHashFeaturesSql =
    """WITH cat AS (SELECT c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR)
                      AS cat,
                    COUNT(*) AS n
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1),
       b AS (SELECT ('0x' || substr(md5(cat), 1, 15))::BIGINT % 16 AS bucket,
                    n
             FROM cat)
       SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_cats,
              CAST(SUM(n) AS BIGINT) AS n_rows,
              CAST(MAX(n) * 10000 // SUM(n) AS BIGINT) AS dominant_share_bp
       FROM b GROUP BY 1 ORDER BY 1"""

  override def queries: Seq[Q] = Seq(
    Q("fe_target_encode", feTargetEncode, Some(feTargetEncodeSql)),
    Q("fe_hash_features", feHashFeatures, Some(feHashFeaturesSql)),
    Q("ml_stump", mlStump, Some(mlStumpSql)))
}
