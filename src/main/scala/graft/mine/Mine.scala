package graft.mine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pattern-mining operators over relational data — association rules
  * (market-basket co-occurrence) and the 2-D skyline (Pareto frontier).
  * Both follow the house exactness discipline: integer basis-point
  * statistics (floor division, no float probabilities) so the DuckDB
  * oracle replays every row bit-for-bit.
  */
object Mine {

  /** Association rules over (basket, item) pairs: for every ORDERED item
    * pair (a → b) that co-occurs in at least `minPairCount` baskets,
    * emit the co-occurrence count and the classic rule statistics in
    * integer basis points:
    *
    *   support_bp = ⌊n_ab · 10⁴ / n⌋          (pair frequency)
    *   conf_bp    = ⌊n_ab · 10⁴ / n_a⌋        (P(b | a))
    *   lift_bp    = ⌊n_ab · n · 10⁴ / (n_a · n_b)⌋  (10⁴ = independent)
    *
    * Duplicate (basket, item) rows collapse first, so n_ab counts
    * BASKETS, not line items. The lift numerator n_ab·n·10⁴ is computed
    * in DECIMAL(38,0) before the integral division — three BIGINT
    * factors can exceed 2⁶³ at warehouse scale (n ≈ 10¹⁰ baskets), and
    * Spark's `div` floors decimals exactly, matching DuckDB's HUGEINT
    * `//`.
    *
    * Scale shape: the pair join is a self-join CO-PARTITIONED on the
    * basket key (one shuffle per side, no cross-basket pairs ever
    * materialize), bounded by Σ_b |items_b|² — the per-basket width is
    * the control, not the corpus size. Item supports and pair counts
    * are partial-agg groupBys; the statistics join is |item-pairs| ⋈
    * |items| with the dim-sized per-item support table broadcast. The
    * result is at most |items|² rows — dim-bounded when the item
    * vocabulary is (brands, categories), which is the shape rule mining
    * is for. */
  def associationRules(baskets: DataFrame, basketCol: String,
      itemCol: String, minPairCount: Long = 1L): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val bi = baskets
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .filter(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()
    val n = bi.select(col("__b")).distinct().count()
    val itemN = bi.groupBy(col("__i").as("item")).agg(count(lit(1)).as("n_i"))
    val pairs = bi.join(bi.select(col("__b"), col("__i").as("__j")), Seq("__b"))
      .filter(col("__i") < col("__j"))
      .groupBy(col("__i"), col("__j")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    // each unordered co-occurrence yields both rule directions: the
    // symmetric stats (support, lift) repeat, confidence conditions on
    // the antecedent
    val directed = pairs.select(col("__i").as("antecedent"),
        col("__j").as("consequent"), col("n_ab"))
      .union(pairs.select(col("__j"), col("__i"), col("n_ab")))
    directed
      .join(broadcast(itemN.select(col("item").as("antecedent"),
        col("n_i").as("n_a"))), Seq("antecedent"))
      .join(broadcast(itemN.select(col("item").as("consequent"),
        col("n_i").as("n_b"))), Seq("consequent"))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("n_a"), col("n_b"),
        expr(s"(n_ab * 10000) div ${n}L").as("support_bp"),
        expr("(n_ab * 10000) div n_a").as("conf_bp"),
        expr(s"(CAST(n_ab AS DECIMAL(38,0)) * ${n}L * 10000) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b)").as("lift_bp"))
  }

  /** 2-D skyline (Pareto frontier): the rows not DOMINATED by any other
    * row, where s dominates r iff s.x ≤ r.x AND s.y ≥ r.y with at least
    * one strict (x is minimized, y is maximized). Ties survive: two
    * rows with identical (x, y) never dominate each other, and every
    * row carrying a skyline (x, y) point is returned.
    *
    * The frontier is found by DOUBLE REDUCTION, not an all-pairs test:
    * a skyline row must have y = max(y) among its x-group AND
    * x = min(x) among that y-group (anything else is dominated by the
    * witness of the failed equality), so two partial-agg groupBys
    * shrink the candidate set to ≤ min(|distinct x|, |distinct y|)
    * rows. The strictly-cheaper dominance test then runs as ONE
    * running-max window over that reduced set — x is distinct within
    * it, so a ROWS frame over (x asc) is exactly "all strictly smaller
    * x" — and survivors semi-join back to recover every tied original
    * row. Nothing data-sized is ever sorted globally: the window input
    * is bounded by the smaller attribute cardinality (50 for a
    * quantity-like axis at ANY corpus size), and the semi-join
    * broadcast is the frontier itself. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val f1 = df.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__y"))
    val f2 = f1.groupBy(col("__y")).agg(min(col("__x")).as("__x"))
    val w = Window.orderBy(col("__x").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = f2.withColumn("__pm", max(col("__y")).over(w))
      .filter(col("__pm").isNull || col("__pm") < col("__y"))
      .select(col("__x").as(xCol), col("__y").as(yCol))
    df.join(broadcast(sky), Seq(xCol, yCol), "left_semi")
  }
}
