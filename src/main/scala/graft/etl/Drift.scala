package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-health drift monitors — the checks a production ingest runs
  * over its own daily metrics before letting a batch promote. Both are
  * pure integer arithmetic end-to-end, so the DuckDB oracle replays
  * them exactly (the house rule: monitoring that flakes across engines
  * is worse than no monitoring).
  */
object Drift {

  /** One-sided upper CUSUM (Page 1954) over an ordered integer series —
    * the sequential change-point detector: S_t = max(0, S_{t−1} + x_t −
    * ref − slack), alarm when S_t > h. The recurrence looks inherently
    * sequential, but has the prefix closed form
    * S_t = P_t − min(0, min_{j≤t} P_j) with P_t the running sum of the
    * drifts — two cumulative window aggregates, no loop (the same
    * window-algebra trade as the w8 forward-fill).
    *
    * Scale note: the window is GLOBAL over the series — correct here
    * because the input is the already-aggregated per-period metric
    * (|days| rows, dim-sized), never the raw events. The caller
    * aggregates first; this is the w1_surrogate_key scale boundary,
    * documented rather than hidden.
    *
    * Returns (orderCol, xCol, s, alarm). */
  def cusumUpper(series: DataFrame, orderCol: String, xCol: String,
      ref: Long, slack: Long, h: Long): DataFrame = {
    val w = Window.orderBy(orderCol)
    series
      .withColumn("d", col(xCol).cast("long") - lit(ref) - lit(slack))
      .withColumn("pt", sum(col("d")).over(w))
      .select(col(orderCol), col(xCol),
        (col("pt") - least(lit(0L), min(col("pt")).over(w))).as("s"))
      .withColumn("alarm", (col("s") > lit(h)).cast("int"))
  }

  /** Per-period categorical-distribution drift: the L1 distance (in
    * integer basis points) between each period's category shares and
    * the whole-series shares — Σ_cat |share_period − share_global|,
    * shares as floor(n·10⁴ / total). The integer-bp L1 is the
    * engine-exact stand-in for PSI/KL (whose ln() the exactness rules
    * ban); alarm when the distance exceeds `thresholdBp`.
    *
    * Scale shape: two partial-agg count aggregations ((period, cat) and
    * cat), the category join is broadcast-sized (|categories|), and the
    * per-period reduce is one more partial agg — no windows over data,
    * no driver loops. Returns (periodCol, l1_bp, alarm). */
  def categoryDrift(df: DataFrame, periodCol: String, catCol: String,
      thresholdBp: Long): DataFrame = {
    val perCat = df.groupBy(col(periodCol), col(catCol))
      .agg(count(lit(1)).as("n"))
    val perPeriod = perCat.groupBy(col(periodCol))
      .agg(sum(col("n")).as("tot"))
    val globalCat = perCat.groupBy(col(catCol)).agg(sum(col("n")).as("gn"))
    val globalTot = globalCat.agg(sum(col("gn")).as("gtot"))
    // the |periods|·|categories| grid (dim-sized broadcast cross) keeps
    // the L1 term for categories a period never saw — share 0 vs global
    perPeriod.crossJoin(broadcast(globalCat))
      .join(perCat, Seq(periodCol, catCol), "left")
      .crossJoin(broadcast(globalTot))
      .select(col(periodCol),
        abs(expr("coalesce(n, CAST(0 AS BIGINT)) * 10000 div tot") -
          expr("gn * 10000 div gtot")).as("dv"))
      .groupBy(col(periodCol))
      .agg(sum(col("dv")).as("l1_bp"))
      .withColumn("alarm", (col("l1_bp") > lit(thresholdBp)).cast("int"))
  }

  /** 2×2 A/B chi-square — the experiment gate next to the drift
    * monitors: one row per UNIT (already deduplicated — a unit that
    * converted twice still counts once) with variant ∈ {0, 1} and
    * success ∈ {0, 1}, reduced in ONE conditional-count aggregate to
    * the contingency cells (a, b, c, d) and scored with the closed-form
    * 2×2 statistic
    *
    *   χ² = n·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * in MICROUNITS (⌊χ²·10⁶⌋) — the (O−E)²/E form needs rational
    * expectations, the closed form needs only integer products, so the
    * result is engine-exact. The products run in DECIMAL(38,0):
    * n·(ad−bc)²·10⁶ passes 2⁶³ as soon as cells reach ~10⁴ (exact up
    * to ~10⁹-unit arms; beyond that a test statistic is pointless —
    * everything is significant). `significant` flags χ² ≥ 3.841459
    * (the 0.05 critical value, df = 1). Degenerate margins (an empty
    * arm or all-same outcome) score 0, not an error.
    *
    * Scale shape: the whole operator is one map-side-partial aggregate
    * to a SINGLE row — nothing after the scan depends on data size. */
  def abChiSquare(units: DataFrame, variantCol: String,
      successCol: String): DataFrame =
    units
      .agg(
        sum(when(col(variantCol) === 0 && col(successCol) === 1, 1L)
          .otherwise(0L)).as("a"),
        sum(when(col(variantCol) === 0 && col(successCol) === 0, 1L)
          .otherwise(0L)).as("b"),
        sum(when(col(variantCol) === 1 && col(successCol) === 1, 1L)
          .otherwise(0L)).as("c"),
        sum(when(col(variantCol) === 1 && col(successCol) === 0, 1L)
          .otherwise(0L)).as("d"))
      .select(
        expr("a + b").as("n_a"), expr("c + d").as("n_b"),
        col("a").as("succ_a"), col("c").as("succ_b"),
        expr("CASE WHEN a + b = 0 THEN 0 " +
          "ELSE (a * 10000) div (a + b) END").as("conv_a_bp"),
        expr("CASE WHEN c + d = 0 THEN 0 " +
          "ELSE (c * 10000) div (c + d) END").as("conv_b_bp"),
        expr("""CASE WHEN (a + b) * (c + d) = 0 OR (a + c) * (b + d) = 0
                THEN CAST(0 AS BIGINT)
                ELSE ((CAST(a AS DECIMAL(38,0)) + b + c + d)
                  * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)
                  * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)
                  * 1000000)
                  div ((CAST(a AS DECIMAL(38,0)) + b) * (c + d)
                       * (a + c) * (b + d)) END""").as("chi2_micro"))
      .withColumn("significant", (col("chi2_micro") >= 3841459L).cast("int"))

  /** Per-dimension embedding drift between two vector populations — the
    * monitor an embedding-backed pipeline runs when the encoder or the
    * upstream corpus changes: each float component is fixed-pointed
    * (⌊x·10⁴⌋ — floor, not round: round-half ties are the one step
    * engines disagree on), per-dimension counts and exact integer sums
    * are one posexplode + partial-agg per side (shuffle key = the
    * |dims|-sized dimension id), and the mean gap
    * (Σa·n_b − Σb·n_a)/(n_a·n_b) is a sign-safe DECIMAL(38,0) floor
    * division. Returns one row per dimension:
    * (dim, n_a, n_b, sum_a, sum_b, mdiff_fx). */
  def embeddingDrift(a: DataFrame, b: DataFrame, vecCol: String): DataFrame = {
    def moments(df: DataFrame, nCol: String, sCol: String): DataFrame =
      df.select(posexplode(col(vecCol)).as(Seq("pos", "e")))
        .select((col("pos") + 1).cast("long").as("dim"),
          floor(col("e").cast("double") * 10000).cast("long").as("fx"))
        .groupBy("dim")
        .agg(count(lit(1)).as(nCol), sum(col("fx")).as(sCol))
    moments(a, "n_a", "sum_a").join(moments(b, "n_b", "sum_b"), Seq("dim"))
      .withColumn("num", expr(
        "cast(sum_a as decimal(38,0)) * n_b - cast(sum_b as decimal(38,0)) * n_a"))
      .withColumn("den", expr("cast(n_a as decimal(38,0)) * n_b"))
      .withColumn("mdiff_fx", expr(
        "CASE WHEN num < 0 THEN -((-num) div den) ELSE num div den END"))
      .select("dim", "n_a", "n_b", "sum_a", "sum_b", "mdiff_fx")
  }
}
