package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-9 recommendation pack: item-item co-occurrence with lift —
  * the classic "users who engaged with X also engaged with Y"
  * neighbor table (the Amazon item-to-item shape), built without any
  * model: per-item neighbor lists ranked by how far above
  * independence the co-engagement sits.
  *
  * Exactness discipline: lift is the integer floor
  * co·N·10⁴ // (c_i·c_j) in DECIMAL(38,0)/HUGEINT — no float ratio
  * ever, bit-identical in both engines at any partitioning.
  *
  * Scale story: the quadratic step (per-user item pairs) is bounded
  * BY CONSTRUCTION with a per-user top-K item cap (deterministic:
  * engagement count desc, item asc) — pairs ≤ |users|·K²/2 at any
  * event volume, the LSH-banding discipline applied to baskets. Item
  * totals and the final ranking live on |items| + |item pairs| rows;
  * the grand user count is a ONE-row aggregate cross-joined in
  * (documented PlanAuditSpec exception).
  */
object RecQ extends QueryPack {

  private val D38 = DecimalType(38, 0)
  private val MaxItemsPerUser = 40
  private val TopNeighbors = 3

  /** Item-item neighbor lists from the events stream: items = the
    * props.k payload of view/click/purchase events; for every item
    * pair co-engaged by the same user, co = distinct co-engaging
    * users, and lift_bp = co·N·10⁴ // (c_i·c_j) where c_i counts each
    * item's engaged users and N the engaged-user universe (computed
    * AFTER the per-user cap, so the algebra matches the data the
    * pairs were actually built from). Output: for each item, its top-3
    * neighbors by (lift desc, co desc, item asc) — the fully
    * deterministic rank. lift_bp > 10⁴ reads "co-engagement above
    * independence". */
  private def recCooc(spark: SparkSession, d: String): DataFrame = {
    val ui = Tables.events(spark, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull)
      .groupBy("user_id", "item").agg(count(lit(1)).as("n_ev"))
    val capped = ui
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("n_ev").desc, col("item").asc)))
      .filter(col("rk") <= MaxItemsPerUser)
      .select("user_id", "item")
    val nUsers = capped.agg(
      countDistinct(col("user_id")).cast(D38).as("n_users"))
    val totals = capped.groupBy("item")
      .agg(count(lit(1)).cast(D38).as("c_i"))
    val pairs = capped.as("a")
      .join(capped.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("i"), col("b.item").as("j"))
      .agg(count(lit(1)).cast(D38).as("co"))
    val sym = pairs.select(col("i").as("item"), col("j").as("nbr"), col("co"))
      .union(pairs.select(col("j").as("item"), col("i").as("nbr"), col("co")))
    sym
      .join(broadcast(totals.withColumnRenamed("item", "ti")),
        col("item") === col("ti"))
      .withColumnRenamed("c_i", "c_item")
      .join(broadcast(totals.withColumnRenamed("item", "tj")
          .withColumnRenamed("c_i", "c_nbr")),
        col("nbr") === col("tj"))
      .crossJoin(broadcast(nUsers))
      .withColumn("lift_bp",
        floor(col("co") * col("n_users") * 10000 /
          (col("c_item") * col("c_nbr"))).cast("long"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("item")
          .orderBy(col("lift_bp").desc, col("co").desc, col("nbr").asc)))
      .filter(col("rk") <= TopNeighbors)
      .select(col("item"), col("nbr"), col("co").cast("long").as("co_users"),
        col("lift_bp"), col("rk").cast("long").as("rk"))
  }

  private val recCoocSql =
    s"""WITH ui AS (SELECT user_id, CAST(props->>'k' AS INT) AS item,
              COUNT(*) AS n_ev
            FROM events
            WHERE event_type IN ('view', 'click', 'purchase')
              AND (props->>'k') IS NOT NULL
            GROUP BY 1, 2),
       capped AS (SELECT user_id, item FROM (
              SELECT user_id, item, ROW_NUMBER() OVER
                (PARTITION BY user_id ORDER BY n_ev DESC, item ASC) AS rk
              FROM ui) WHERE rk <= $MaxItemsPerUser),
       nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS HUGEINT) AS n_users
              FROM capped),
       totals AS (SELECT item, CAST(COUNT(*) AS HUGEINT) AS c_i
                  FROM capped GROUP BY 1),
       pairs AS (SELECT a.item AS i, b.item AS j,
                        CAST(COUNT(*) AS HUGEINT) AS co
                 FROM capped a JOIN capped b
                   ON a.user_id = b.user_id AND a.item < b.item
                 GROUP BY 1, 2),
       sym AS (SELECT i AS item, j AS nbr, co FROM pairs
               UNION ALL
               SELECT j, i, co FROM pairs),
       scored AS (SELECT sym.item AS item, sym.nbr AS nbr, co,
                    CAST(co * n_users * 10000 // (ti.c_i * tj.c_i)
                      AS BIGINT) AS lift_bp
                  FROM sym
                  JOIN totals ti ON sym.item = ti.item
                  JOIN totals tj ON sym.nbr = tj.item
                  CROSS JOIN nu)
       SELECT item, nbr, CAST(co AS BIGINT) AS co_users, lift_bp, rk
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY item
               ORDER BY lift_bp DESC, co DESC, nbr ASC) AS rk
             FROM scored)
       WHERE rk <= $TopNeighbors"""

  override def queries: Seq[Q] = Seq(
    Q("rec_cooc", recCooc, Some(recCoocSql)))
}
