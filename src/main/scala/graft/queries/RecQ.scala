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
        graft.util.Exact.idiv(col("co") * col("n_users") * 10000,
          col("c_item") * col("c_nbr")).cast("long"))
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

  // ------------------------------------------------------------- rec_eval

  /** Split-half stability of the co-occurrence recommender — the
    * measured-not-asserted discipline (`sim_recall_*`) applied to
    * `rec_cooc`: users split in half by md5, the SAME top-3 lift
    * neighbor construction run independently on each half, and the
    * lists compared per item. If lift were noise the halves would
    * agree ≈ 3/(|items|−1) ≈ 3% of the time; agreement far above that
    * floor is the evidence the lists carry signal. On THIS corpus the
    * harness measures ≈ 366 bp ≈ the floor — the testdata's item
    * engagement is uniformly random, so "don't trust these neighbor
    * lists" is the CORRECT verdict, and catching exactly that is what
    * the harness is for (the sim_label_prop chance-floor discipline; a
    * raw co-engagement precision harness saturates at 100% here —
    * every pair co-occurs somewhere — and would hide it). All joins
    * are |items|·k or per-user-capped. */
  private def recEval(spark: SparkSession, d: String): DataFrame = {
    val ui = Tables.events(spark, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull)
      .groupBy("user_id", "item").agg(count(lit(1)).as("n_ev"))
      .withColumn("half",
        pmod(conv(substring(md5(col("user_id").cast("string")), 1, 15),
          16, 10).cast("long"), lit(2L)))
    def capped(half: Int) = ui.filter(col("half") === half)
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("n_ev").desc, col("item").asc)))
      .filter(col("rk") <= MaxItemsPerUser)
      .select("user_id", "item")
    def topk(half: Int): DataFrame = {
      val part = capped(half)
      val nUsers = part.agg(
        countDistinct(col("user_id")).cast(D38).as("n_users"))
      val totals = part.groupBy("item")
        .agg(count(lit(1)).cast(D38).as("c_i"))
      val pairs = part.as("a")
        .join(part.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("i"), col("b.item").as("j"))
        .agg(count(lit(1)).cast(D38).as("co"))
      val sym = pairs
        .select(col("i").as("item"), col("j").as("nbr"), col("co"))
        .union(pairs
          .select(col("j").as("item"), col("i").as("nbr"), col("co")))
      sym
        .join(broadcast(totals.withColumnRenamed("item", "ti")),
          col("item") === col("ti"))
        .withColumnRenamed("c_i", "c_item")
        .join(broadcast(totals.withColumnRenamed("item", "tj")
            .withColumnRenamed("c_i", "c_nbr")),
          col("nbr") === col("tj"))
        .crossJoin(broadcast(nUsers))
        .withColumn("lift_bp",
          graft.util.Exact.idiv(col("co") * col("n_users") * 10000,
            col("c_item") * col("c_nbr")).cast("long"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("item")
            .orderBy(col("lift_bp").desc, col("co").desc, col("nbr").asc)))
        .filter(col("rk") <= TopNeighbors)
        .select("item", "nbr")
    }
    val recsA = topk(0)
    val recsB = topk(1)
    val agree = recsA.join(recsB, Seq("item", "nbr"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("agree"))
    recsA.groupBy("item").agg(count(lit(1)).as("n_recs"))
      .join(agree, Seq("item"), "left")
      .select(col("item"), col("n_recs"),
        coalesce(col("agree"), lit(0L)).as("agree"),
        expr("(coalesce(agree, CAST(0 AS BIGINT)) * 10000) div n_recs")
          .as("agreement_bp"))
      .orderBy("item")
  }

  private val recEvalSql =
    s"""WITH ui AS (SELECT user_id, CAST(props->>'k' AS INT) AS item,
              COUNT(*) AS n_ev,
              ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                % 2 AS half
            FROM events
            WHERE event_type IN ('view', 'click', 'purchase')
              AND (props->>'k') IS NOT NULL
            GROUP BY 1, 2),
       tr0 AS (SELECT user_id, item FROM (
              SELECT user_id, item, ROW_NUMBER() OVER
                (PARTITION BY user_id ORDER BY n_ev DESC, item ASC) AS rk
              FROM ui WHERE half = 0) WHERE rk <= $MaxItemsPerUser),
       nu0 AS (SELECT CAST(COUNT(DISTINCT user_id) AS HUGEINT) AS n_users
              FROM tr0),
       tot0 AS (SELECT item, CAST(COUNT(*) AS HUGEINT) AS c_i
                  FROM tr0 GROUP BY 1),
       p0 AS (SELECT a.item AS i, b.item AS j,
                        CAST(COUNT(*) AS HUGEINT) AS co
                 FROM tr0 a JOIN tr0 b
                   ON a.user_id = b.user_id AND a.item < b.item
                 GROUP BY 1, 2),
       s0 AS (SELECT i AS item, j AS nbr, co FROM p0
               UNION ALL
               SELECT j, i, co FROM p0),
       recs0 AS (SELECT item, nbr FROM (
                SELECT s0.item AS item, s0.nbr AS nbr, co,
                  ROW_NUMBER() OVER (PARTITION BY s0.item
                    ORDER BY CAST(co * n_users * 10000
                      // (ti.c_i * tj.c_i) AS BIGINT) DESC,
                      co DESC, s0.nbr ASC) AS rk
                FROM s0
                JOIN tot0 ti ON s0.item = ti.item
                JOIN tot0 tj ON s0.nbr = tj.item
                CROSS JOIN nu0)
                WHERE rk <= $TopNeighbors),
       tr1 AS (SELECT user_id, item FROM (
              SELECT user_id, item, ROW_NUMBER() OVER
                (PARTITION BY user_id ORDER BY n_ev DESC, item ASC) AS rk
              FROM ui WHERE half = 1) WHERE rk <= $MaxItemsPerUser),
       nu1 AS (SELECT CAST(COUNT(DISTINCT user_id) AS HUGEINT) AS n_users
              FROM tr1),
       tot1 AS (SELECT item, CAST(COUNT(*) AS HUGEINT) AS c_i
                  FROM tr1 GROUP BY 1),
       p1 AS (SELECT a.item AS i, b.item AS j,
                        CAST(COUNT(*) AS HUGEINT) AS co
                 FROM tr1 a JOIN tr1 b
                   ON a.user_id = b.user_id AND a.item < b.item
                 GROUP BY 1, 2),
       s1 AS (SELECT i AS item, j AS nbr, co FROM p1
               UNION ALL
               SELECT j, i, co FROM p1),
       recs1 AS (SELECT item, nbr FROM (
                SELECT s1.item AS item, s1.nbr AS nbr, co,
                  ROW_NUMBER() OVER (PARTITION BY s1.item
                    ORDER BY CAST(co * n_users * 10000
                      // (ti.c_i * tj.c_i) AS BIGINT) DESC,
                      co DESC, s1.nbr ASC) AS rk
                FROM s1
                JOIN tot1 ti ON s1.item = ti.item
                JOIN tot1 tj ON s1.nbr = tj.item
                CROSS JOIN nu1)
                WHERE rk <= $TopNeighbors),
       agr AS (SELECT r0.item, CAST(COUNT(*) AS BIGINT) AS agree
               FROM recs0 r0 JOIN recs1 r1
                 ON r0.item = r1.item AND r0.nbr = r1.nbr
               GROUP BY 1)
       SELECT r.item, CAST(COUNT(*) AS BIGINT) AS n_recs,
              CAST(COALESCE(MAX(a.agree), 0) AS BIGINT) AS agree,
              CAST((COALESCE(MAX(a.agree), 0) * 10000) // COUNT(*)
                AS BIGINT) AS agreement_bp
       FROM recs0 r LEFT JOIN agr a ON r.item = a.item
       GROUP BY 1 ORDER BY 1"""

  override def queries: Seq[Q] = Seq(
    Q("rec_cooc", recCooc, Some(recCoocSql)),
    Q("rec_eval", recEval, Some(recEvalSql)))
}
