package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Integer-exact grouped statistics: closed-form OLS trend slopes and
  * 3-sigma outlier detection, both as pure DECIMAL(38,0) rational
  * arithmetic so the result is bit-identical in any engine (the
  * [[graft.graph.Graph]] / [[graft.sim.KMeans]] fixed-point discipline
  * applied to classical statistics).
  *
  * Why not `regr_slope` / `stddev`: both are float aggregates whose
  * partial-merge order differs across engines/partitionings, so the low
  * bits — and with them threshold decisions — flip. Here every moment is
  * an exact integer sum (mergeable in any order → map-side combine safe
  * at 100 TB), and the only divisions are integer floor divisions applied
  * sign-safely (Spark's `div` truncates toward zero while DuckDB's `//`
  * floors, so negative numerators divide as |num| with the sign re-applied
  * — identical on both engines).
  */
object Stats {

  private val D = DecimalType(38, 0)

  /** Per-group OLS slope of y on x in basis points:
    * slope_bp = 10⁴·(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), floor-divided
    * sign-safely. One groupBy over (x, y, x·y, x²) partial sums — a
    * single shuffle with map-side combine; per-row products stay in
    * BIGINT range (caller guarantees |x·y| < 2⁶³), cross-row sums are
    * DECIMAL(38,0). Returns groupCols + (n, slope_bp); slope_bp is NULL
    * when x is constant within the group (den = 0). */
  def olsSlopeBp(df: DataFrame, groupCols: Seq[String],
      xCol: Column, yCol: Column): DataFrame = {
    val base = df.select(
      groupCols.map(col) ++
        Seq(xCol.cast("long").as("x"), yCol.cast("long").as("y")): _*)
    base.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(D)).as("sx"),
        sum(col("y").cast(D)).as("sy"),
        sum((col("x") * col("y")).cast(D)).as("sxy"),
        sum((col("x") * col("x")).cast(D)).as("sxx"))
      .withColumn("num",
        expr("cast(n as decimal(38,0)) * sxy - sx * sy"))
      .withColumn("den",
        expr("cast(n as decimal(38,0)) * sxx - sx * sx"))
      .withColumn("slope_bp", expr(
        """CASE WHEN den = 0 THEN NULL
                WHEN num < 0 THEN -((10000 * (-num)) div den)
                ELSE (10000 * num) div den END"""))
      .select(groupCols.map(col) ++ Seq(col("n"), col("slope_bp")): _*)
  }

  /** Robust outliers by median absolute deviation: flag rows with
    * |x − median| > k·MAD, where median is the LOWER median (the value at
    * row_number (n+1) div 2 ordered by x — deterministic without
    * interpolation, so pure integers end to end) and MAD is the lower
    * median of |x − median|. Robust where [[sigmaOutliers]] is not: a
    * heavy tail inflates σ and hides its own outliers, but leaves the
    * medians untouched.
    *
    * Shape: two rank-window passes (each one shuffle on the group key)
    * plus two dim-sided joins of the per-group medians (group-cardinality
    * rows — broadcast-sized by construction). Returns the flagged input
    * rows plus (med, mad, dev). */
  def madOutliers(df: DataFrame, groupCols: Seq[String],
      valueCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val gc = groupCols.map(col)
    def lowerMedian(in: DataFrame, vCol: String, outCol: String): DataFrame =
      in.withColumn("rn",
          row_number().over(Window.partitionBy(gc: _*).orderBy(col(vCol))))
        .withColumn("grp_n", count(lit(1)).over(Window.partitionBy(gc: _*)))
        .filter(col("rn") === expr("(grp_n + 1) div 2"))
        .select(gc :+ col(vCol).as(outCol): _*)
    val base = df.withColumn("x", valueCol.cast("long"))
    val med = lowerMedian(base.select(gc :+ col("x"): _*), "x", "med")
    val withD = base.join(broadcast(med), groupCols)
      .withColumn("dev", abs(col("x") - col("med")))
    val mad = lowerMedian(withD.select(gc :+ col("dev"): _*), "dev", "mad")
    withD.join(broadcast(mad), groupCols)
      .filter(col("dev") > lit(k.toLong) * col("mad"))
      .drop("x")
  }

  /** Rows more than `sigmas` POPULATION standard deviations from their
    * group mean, decided exactly in integers: (x−μ)² > k²σ² multiplied
    * through by n² gives (n·x − S)² > k²·(n·Q − S²) with S = Σx,
    * Q = Σx² — no square root, no division, no floats. One window
    * shuffle on the group key (count/sum/sum-of-squares over the same
    * partition — a single exchange); per-row x² stays in BIGINT, the
    * window sums and the comparison run in DECIMAL(38,0). Keeps the
    * input columns of `df`. */
  def sigmaOutliers(df: DataFrame, groupCols: Seq[String],
      valueCol: Column, sigmas: Int): DataFrame = {
    require(sigmas >= 1, s"sigmas must be >= 1, got $sigmas")
    val w = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("x", valueCol.cast("long"))
      .withColumn("grp_n", count(lit(1)).over(w))
      .withColumn("grp_s", sum(col("x").cast(D)).over(w))
      .withColumn("grp_q", sum((col("x") * col("x")).cast(D)).over(w))
      .filter(expr(
        s"""(cast(grp_n as decimal(38,0)) * x - grp_s) *
            (cast(grp_n as decimal(38,0)) * x - grp_s) >
            ${sigmas * sigmas} *
            (cast(grp_n as decimal(38,0)) * grp_q - grp_s * grp_s)"""))
      .drop("x", "grp_n", "grp_s", "grp_q")
  }

  /** Spearman rank correlation of two integer metrics in basis points,
    * one output row (n, sum_d2, rho_bp): ranks are `row_number` ordered
    * by (metric, tiebreakCol) — the deterministic tie-break makes the
    * statistic a defined algorithm both engines replay exactly (true
    * tie-averaged Spearman needs Pearson-on-ranks; with a keyed
    * tie-break the classical ρ = 1 − 6Σd²/(n(n²−1)) closed form stays
    * pure integers). NULL when n ≤ 1.
    *
    * Shape: two rank windows over the input — intended for
    * ALREADY-AGGREGATED entity metrics (per-customer, per-source), so
    * the windowed relation is entity-sized, not corpus-sized. At 100 TB
    * the same statistic over raw rows would sample or
    * range-partition-rank first; this helper is the exact form for the
    * entity tables where exactness is cheap. */
  def spearmanBp(df: DataFrame, xCol: Column, yCol: Column,
      tiebreakCol: Column): DataFrame = {
    val base = df.select(xCol.cast("long").as("x"),
      yCol.cast("long").as("y"), tiebreakCol.as("tb"))
    base
      // row_number is INT — cast to long BEFORE the difference square,
      // which overflows 32 bits as soon as n crosses ~46k (caught by
      // the sf1 stress sweep)
      .withColumn("rx",
        row_number().over(Window.orderBy(col("x"), col("tb"))).cast("long"))
      .withColumn("ry",
        row_number().over(Window.orderBy(col("y"), col("tb"))).cast("long"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(((col("rx") - col("ry")) * (col("rx") - col("ry"))).cast(D))
          .cast("long").as("sum_d2"))
      .select(col("n"), col("sum_d2"),
        when(col("n") <= 1, lit(null))
          .otherwise(lit(10000) -
            graft.util.Exact.idiv(col("sum_d2").cast(D) * 60000,
              col("n").cast(D) * col("n") * col("n") - col("n")))
          .cast("long").as("rho_bp"))
  }

  /** Sample autocorrelation of an ordered series at lags 1..maxLag, in
    * basis points: r_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)² (the biased
    * estimator — denominator over all n), with every term scaled by n²
    * so it stays integer: dev_t = n·x_t − S is an exact integer even
    * when x̄ = S/n is not, num_k = Σ dev_t·dev_{t−k}, den = Σ dev_t².
    * ONE window pass materializes all maxLag lag columns, ONE aggregate
    * produces all numerators + the denominator, `stack` unpivots to
    * maxLag rows (lag, n_pairs, acf_bp). acf_bp is NULL for a constant
    * series (den = 0). The global window is intended for POST-AGG
    * calendar-sized series (the st_runs_test scale contract);
    * DECIMAL(38,0) products leave ~10³× headroom over sf1 daily cents. */
  def acfBp(series: DataFrame, orderCol: Column, valueCol: Column,
      maxLag: Int): DataFrame = {
    val daily = series.select(orderCol.as("ord"),
      valueCol.cast("long").as("x"))
    val tot = daily.agg(count(lit(1)).cast(D).as("n"),
      sum(col("x")).cast(D).as("s"))
    val w = Window.orderBy("ord")
    val lagged = daily.select(
      col("x") +: (1 to maxLag).map(k =>
        lag(col("x"), k).over(w).as(s"x$k")): _*)
    val dev = lagged.crossJoin(tot).select(
      (col("n") * col("x") - col("s")).as("dev") +:
        (1 to maxLag).map(k =>
          (col("n") * col(s"x$k") - col("s")).as(s"d$k")): _*)
    val aggs = sum(col("dev") * col("dev")).as("den") +:
      (1 to maxLag).flatMap(k => Seq(
        sum(col("dev") * col(s"d$k")).as(s"num$k"),
        count(col(s"d$k")).as(s"np$k")))
    dev.agg(aggs.head, aggs.tail: _*)
      .select(expr("stack(" + maxLag + ", " +
        (1 to maxLag).map(k => s"$k, np$k, num$k").mkString(", ") +
        ") as (lag, n_pairs, num)"), col("den"))
      .select(col("lag").cast("long").as("lag"),
        col("n_pairs").cast("long").as("n_pairs"),
        when(col("den") === 0, lit(null))
          .when(col("num") < 0,
            -graft.util.Exact.idiv(lit(10000) * -col("num"), col("den")))
          .otherwise(
            graft.util.Exact.idiv(lit(10000) * col("num"), col("den")))
          .cast("long").as("acf_bp"))
      .orderBy("lag")
  }

  /** Partial autocorrelation by the Durbin–Levinson recursion, in the
    * same 10⁴ fixed point as [[acfBp]] — the second Box–Jenkins
    * identification plot (ACF tails off + PACF cuts off at p ⇒ AR(p)).
    * Input is [[acfBp]]'s output (lag, n_pairs, acf_bp for 1..maxLag);
    * output re-joins it as (lag, acf_bp, pacf_bp).
    *
    * The recursion, with every product floored back to bp by the
    * sign-safe F(a,10⁴) = (a − pmod(a,10⁴)) div 10⁴ (pmod ≥ 0 makes
    * the numerator exactly divisible, so `div` IS the floor for either
    * sign):
    *
    *   φ₁₁ = ρ₁
    *   num_k = ρ_k − F(Σ_j φ_{k−1,j}·ρ_{k−j}),
    *   den_k = 10⁴ − F(Σ_j φ_{k−1,j}·ρ_j)
    *   φ_kk  = F(num_k·10⁴, den_k)     (0 when den_k ≤ 0 — a
    *           non-positive-definite fixed-point corner, flagged by
    *           the sentinel rather than a divide-by-zero)
    *   φ_kj  = φ_{k−1,j} − F(φ_kk·φ_{k−1,k−j})
    *
    * — a DEFINED fixed-point algorithm both engines replay exactly
    * (the oracle is a recursive CTE carrying the φ list). The whole
    * recursion runs over the maxLag-row ACF on ONE row — scale-free
    * past [[acfBp]]'s single fact shuffle. */
  def pacfBp(acf: DataFrame, maxLag: Int): DataFrame = {
    // >= 2: Spark's sequence(1, maxLag − 1) would COUNT DOWN on 1 − 1 = 0
    require(maxLag >= 2, s"maxLag must be >= 2, got $maxLag")
    def fdiv(a: String, b: String) = s"((($a) - pmod($a, $b)) div ($b))"
    val sumNum = s"""aggregate(sequence(1, kk), CAST(0 AS BIGINT),
      (a, j) -> a + element_at(acc.phi, CAST(j AS INT))
                  * element_at(rho, CAST(kk + 1 - j AS INT)))"""
    val sumDen = s"""aggregate(sequence(1, kk), CAST(0 AS BIGINT),
      (a, j) -> a + element_at(acc.phi, CAST(j AS INT))
                  * element_at(rho, CAST(j AS INT)))"""
    val numS = s"element_at(rho, CAST(kk + 1 AS INT)) - ${fdiv(sumNum, "10000")}"
    val denS = s"10000 - ${fdiv(sumDen, "10000")}"
    val pkk = s"""IF(($denS) <= 0, CAST(0 AS BIGINT),
      ${fdiv(s"($numS) * 10000", denS)})"""
    val folded = acf
      .agg(expr(
        "transform(array_sort(collect_list(struct(lag, acf_bp))), " +
          "s -> s.acf_bp)").as("rho"))
      .select(explode(expr(
        s"""aggregate(
              sequence(1, ${maxLag - 1}),
              named_struct(
                'phi', array(element_at(rho, 1)),
                'out', array(named_struct(
                  'lag', CAST(1 AS BIGINT),
                  'pacf_bp', element_at(rho, 1)))),
              (acc, kk) -> named_struct(
                'phi', concat(
                  transform(sequence(1, kk),
                    j -> element_at(acc.phi, CAST(j AS INT))
                         - ${fdiv(
                             s"($pkk) * element_at(acc.phi, CAST(kk + 1 - j AS INT))",
                             "10000")}),
                  array($pkk)),
                'out', concat(acc.out, array(named_struct(
                  'lag', CAST(kk + 1 AS BIGINT), 'pacf_bp', $pkk)))),
              acc -> acc.out)""")))
      .select(col("col.lag").as("lag"), col("col.pacf_bp").as("pacf_bp"))
    acf.select(col("lag"), col("acf_bp"))
      .join(folded, Seq("lag"))
      .orderBy("lag")
  }

  /** Theil–Sen slope in basis points: the LOWER MEDIAN over all
    * C(n, 2) pairwise integer-bp slopes, picked by an exact rank with
    * the (slope, x_a, x_b) total order — no float ever appears, and up
    * to ~29% contaminated points cannot move it (the estimator's
    * breakdown point). Returns ONE row (n_pairs, ts_slope_bp). The
    * theta self-join is O(n²) BY DESIGN — intended for POST-AGG
    * calendar/entity-sized series where n is bounded by construction
    * (the documented PlanAuditSpec exception); x values must be
    * distinct (slopes divide by x_b − x_a). */
  def theilSenBp(series: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val s = series.select(xCol.cast("long").as("x"),
      yCol.cast("long").as("y"))
    val a = s.select(col("x").as("x_a"), col("y").as("y_a"))
    val b = s.select(col("x").as("x_b"), col("y").as("y_b"))
    a.join(b, col("x_a") < col("x_b"))
      .select(col("x_a"), col("x_b"),
        (col("y_b") - col("y_a")).as("dy"),
        (col("x_b") - col("x_a")).as("dx"))
      .select(col("x_a"), col("x_b"),
        when(col("dy") < 0,
          -graft.util.Exact.idiv(lit(10000) * -col("dy"), col("dx")))
          .otherwise(
            graft.util.Exact.idiv(lit(10000) * col("dy"), col("dx")))
          .as("slope_bp"))
      .select(col("slope_bp"),
        row_number().over(Window.orderBy("slope_bp", "x_a", "x_b")).as("rn"),
        count(lit(1)).over(Window.partitionBy()).cast("long").as("n_pairs"))
      .where(col("rn") ===
        graft.util.Exact.idiv(col("n_pairs") + 1, lit(2L)))
      .select(col("n_pairs"), col("slope_bp").as("ts_slope_bp"))
  }
}
