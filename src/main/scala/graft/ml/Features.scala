package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tabular feature-engineering kernels: leave-one-out target encoding
  * and a single Gini decision stump — exact-integer counterparts of
  * the sklearn/category_encoders preprocessing steps, built so both
  * engines reproduce them bit-identically (see
  * [[graft.queries.FeatureQ]] for the oracle-backed uses).
  *
  * Both kernels reduce the fact to a SMALL sufficient statistic first
  * (per-category sums; the per-feature-value class-count histogram) and
  * do all remaining arithmetic there — the XGBoost-histogram shape, so
  * the only fact-sized cost is one partial-agg shuffle at any data
  * volume.
  */
object Features {

  private val D38 = DecimalType(38, 0)

  /** Leave-one-out target encoding: per row, the mean of `targetCol`
    * over the row's `catCol` group EXCLUDING the row itself —
    * loo = (S_g − x_i) // (n_g − 1), the CV-leak-free categorical
    * code (a row's feature never contains its own label). Appends
    * `cat_mean` (plain group mean, floor) and `loo_mean` (NULL for
    * 1-row groups, where no leave-one-out mean exists). Group stats
    * are one partial-agg shuffle onto |categories| rows, broadcast
    * back — the fact is never re-shuffled. Target must be integral
    * (cents). */
  def looEncode(df: DataFrame, catCol: String, targetCol: String): DataFrame = {
    val stats = df.groupBy(col(catCol))
      .agg(sum(col(targetCol)).cast(D38).as("s_g"),
        count(lit(1)).cast(D38).as("n_g"))
    df.join(broadcast(stats), Seq(catCol))
      .withColumn("cat_mean",
        graft.util.Exact.idiv(col("s_g"), col("n_g")).cast("long"))
      .withColumn("loo_mean",
        when(col("n_g") > 1,
          graft.util.Exact.idiv(col("s_g") - col(targetCol),
            col("n_g") - 1))
          .cast("long"))
      .drop("s_g", "n_g")
  }

  /** Best single-threshold split of integral `featureCol` against the
    * 0/1 `labelCol` by Gini-weighted impurity, learned from the
    * per-feature-value class-count histogram (the split t sends
    * feature ≤ t left). With side counts (n, p, q = n − p) the
    * weighted impurity is the exact rational
    *   G(t) = (n_L² − p_L² − q_L²)/n_L + (n_R² − p_R² − q_R²)/n_R
    *        = num/den,  num = A_L·n_R + A_R·n_L,  den = n_L·n_R.
    * Thresholds are ordered by the scaled floor num·10¹² // den
    * (deterministic in any engine; ties → smallest t) and the report
    * carries gini_bp = num·10⁴ // (den·n) = ⌊G/n·10⁴⌋ ∈ [0, 5000].
    * Widths: at n = 10⁷ num ≈ 10²¹, num·10¹² ≈ 10³³ — inside
    * DECIMAL(38,0) with 5 digits headroom; past that drop the
    * ordering scale first. Plan: ONE fact shuffle onto the
    * |distinct feature values| grid; the cumulative table and argmin
    * are windows over that grid (global-window single partition is
    * fine BECAUSE the grid is value-bounded — document the grid size
    * when adopting a high-cardinality feature). */
  def giniStump(df: DataFrame, featureCol: String, labelCol: String): DataFrame = {
    val grid = df
      .select(col(featureCol).cast("long").as("v"),
        col(labelCol).cast("long").as("pos"))
      .groupBy("v")
      .agg(count(lit(1)).as("n_v"), sum(col("pos")).as("p_v"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def a(n: Column, p: Column): Column =
      n * n - p * p - (n - p) * (n - p)
    grid
      .withColumn("n_l", sum(col("n_v")).over(wCum).cast(D38))
      .withColumn("p_l", sum(col("p_v")).over(wCum).cast(D38))
      .withColumn("n", sum(col("n_v")).over(wAll).cast(D38))
      .withColumn("p", sum(col("p_v")).over(wAll).cast(D38))
      .filter(col("n_l") < col("n")) // full-left split has no right side
      .withColumn("n_r", col("n") - col("n_l"))
      .withColumn("p_r", col("p") - col("p_l"))
      .withColumn("num",
        a(col("n_l"), col("p_l")) * col("n_r") +
          a(col("n_r"), col("p_r")) * col("n_l"))
      .withColumn("den", col("n_l") * col("n_r"))
      .withColumn("g_sc",
        graft.util.Exact.idiv(col("num") * lit(1000000000000L), col("den")))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("g_sc").asc, col("v").asc)))
      .filter(col("rn") === 1)
      .select(col("v").cast("long").as("split_value"),
        col("n_l").cast("long").as("n_left"),
        col("p_l").cast("long").as("pos_left"),
        col("n_r").cast("long").as("n_right"),
        col("p_r").cast("long").as("pos_right"),
        graft.util.Exact.idiv(col("num") * lit(10000L),
            col("den") * col("n"))
          .cast("long").as("gini_bp"))
  }
}
