package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Sequences
import graft.util.Exact
import graft.util.Exact.idiv

/** Round-9 sequence/join extensions: the Markov steady state over the
  * event-transition matrix, and the bucketed band join — the keyless
  * |x−y| ≤ ε self-join done as an equi-join on value buckets instead
  * of a cartesian.
  */
object Seq2Q extends QueryPack {

  /** Steady-state visit mass of the user event chain: the transition
    * matrix (e_transitions' exact integer form) power-iterated 5
    * rounds ([[Sequences.markovSteady]]) — where the browsing process
    * spends its time in the long run, which event types are
    * transient. Everything after the one transition-count scan is
    * |states|-sized. */
  private def eMarkovSteady(spark: SparkSession, d: String): DataFrame =
    Sequences.markovSteady(
        Sequences.transitionMatrix(Tables.events(spark, d), "user_id",
          Seq("ts", "event_id"), "event_type"),
        rounds = 5)
      .orderBy("state")

  private val eMarkovSteadySql = {
    def round(prev: String, cur: String) =
      s"""i$cur AS (SELECT to_state AS state,
                SUM(($prev.mass * p_bp) // 10000) AS m
              FROM $prev JOIN tr ON $prev.state = tr.from_state
              GROUP BY 1),
       $cur AS (SELECT s.state, CAST(COALESCE(m, 0) AS BIGINT) AS mass
              FROM states s LEFT JOIN i$cur USING (state))"""
    s"""WITH p AS (SELECT user_id, event_type AS from_state,
              LEAD(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS to_state
            FROM events),
       c AS (SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
             FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2),
       t AS (SELECT from_state, CAST(SUM(n) AS BIGINT) AS tot
             FROM c GROUP BY 1),
       tr AS (SELECT c.from_state, c.to_state, n * 10000 // tot AS p_bp
              FROM c JOIN t USING (from_state)),
       states AS (SELECT DISTINCT from_state AS state FROM tr
                  UNION SELECT DISTINCT to_state FROM tr),
       pi0 AS (SELECT state, CAST(1000000 AS BIGINT) AS mass FROM states),
       ${round("pi0", "pi1")},
       ${round("pi1", "pi2")},
       ${round("pi2", "pi3")},
       ${round("pi3", "pi4")},
       ${round("pi4", "pi5")}
       SELECT state, mass FROM pi5 ORDER BY state"""
  }

  /** Bucketed band join: supplier pairs whose account balances sit
    * within $10 of each other — the |x−y| ≤ ε theta self-join
    * re-expressed as an EQUI join so it scales: each left row explodes
    * to its bucket and the two adjacent buckets (ε-wide buckets ⇒ a
    * qualifying pair's buckets differ by at most 1, and each pair
    * matches on exactly ONE exploded key — no dedup needed), the join
    * runs on the bucket key, and the exact band predicate filters
    * inside the co-partition. Balances shift by +10⁵ before the bucket
    * floor so the numerator is never negative (truncate-vs-floor
    * engine divergence). 3×|rows| exploded keys vs an n² cartesian —
    * the standard similarity-band shape at any scale. */
  private def j12BandJoin(spark: SparkSession, d: String): DataFrame = {
    val eps = 1000L // cents
    val s = Tables.supplier(spark, d)
      .select(col("s_suppkey"),
        (Exact.dec2(col("s_acctbal")) * 100).cast("long").as("bal_c"))
    def bucket(c: org.apache.spark.sql.Column) =
      idiv(c + 100000L, lit(eps))
    val a = s.select(col("s_suppkey").as("sk_a"),
        col("bal_c").as("bal_a"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("off"))
      .select(col("sk_a"), col("bal_a"),
        (bucket(col("bal_a")) + col("off")).as("bkt"))
    val b = s.select(col("s_suppkey").as("sk_b"),
      col("bal_c").as("bal_b"), bucket(col("bal_c")).as("bkt"))
    a.join(b, "bkt")
      .filter(abs(col("bal_a") - col("bal_b")) <= eps &&
        col("sk_a") < col("sk_b"))
      .select(col("sk_a"), col("sk_b"), col("bal_a"), col("bal_b"),
        abs(col("bal_a") - col("bal_b")).as("diff_c"))
      .orderBy("sk_a", "sk_b")
  }

  private val j12BandJoinSql =
    """WITH s AS (SELECT s_suppkey,
         CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
       FROM supplier)
       SELECT a.s_suppkey AS sk_a, b.s_suppkey AS sk_b,
              a.bal_c AS bal_a, b.bal_c AS bal_b,
              abs(a.bal_c - b.bal_c) AS diff_c
       FROM s a JOIN s b
         ON a.s_suppkey < b.s_suppkey
        AND abs(a.bal_c - b.bal_c) <= 1000
       ORDER BY sk_a, sk_b"""

  /** Next-event prediction from the transition matrix, with its own
    * in-sample accuracy: per from-state the argmax next state (ties →
    * lexicographically smallest, via struct MIN over (−n, state) — the
    * same deterministic-tie-break trick as the winnowing selection),
    * and hit/total/accuracy-bp counting how often the chain actually
    * took the predicted edge. The model + eval pair in |states|²
    * relations — the Markov family's measured-not-asserted row. */
  private def eMarkovPredict(spark: SparkSession, d: String): DataFrame = {
    val trans = Sequences.transitionMatrix(Tables.events(spark, d),
      "user_id", Seq("ts", "event_id"), "event_type")
    val pred = trans.groupBy("from_state")
      .agg(min(struct((-col("n")).as("nn"), col("to_state").as("ts")))
        .as("m"))
      .select(col("from_state"), col("m.ts").as("predicted"))
    trans.join(pred, "from_state")
      .groupBy("from_state", "predicted")
      .agg(
        sum(when(col("to_state") === col("predicted"), col("n"))
          .otherwise(0L)).cast("long").as("hits"),
        sum("n").cast("long").as("total"))
      .select(col("from_state"), col("predicted"), col("hits"),
        col("total"),
        idiv(col("hits") * 10000, col("total")).as("acc_bp"))
      .orderBy("from_state")
  }

  private val eMarkovPredictSql =
    """WITH p AS (SELECT user_id, event_type AS from_state,
              LEAD(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS to_state
            FROM events),
       c AS (SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
             FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2),
       pred AS (SELECT from_state,
                  MIN({'nn': -n, 'ts': to_state}) AS m
                FROM c GROUP BY 1)
       SELECT c.from_state, pred.m.ts AS predicted,
              CAST(SUM(CASE WHEN c.to_state = pred.m.ts THEN c.n
                            ELSE 0 END) AS BIGINT) AS hits,
              CAST(SUM(c.n) AS BIGINT) AS total,
              CAST((SUM(CASE WHEN c.to_state = pred.m.ts THEN c.n
                             ELSE 0 END) * 10000) // SUM(c.n) AS BIGINT)
                AS acc_bp
       FROM c JOIN pred USING (from_state)
       GROUP BY 1, 2 ORDER BY from_state"""

  /** Top user journeys: the ordered first-3 event types of each
    * (user, day) session, counted and ranked — the Sankey/path-
    * analysis primitive next to the transition matrix (which sees
    * PAIRS; this sees short PREFIXES). One per-(user, day) window
    * (per-key, never global), a conditional-max fold to the path
    * string (deterministic — no collect_list ordering), one path
    * count agg, and a TakeOrderedAndProject top-20 — no full sort. */
  private def ePathsTopk(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, d)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"), col("event_type"))
    val w = Window.partitionBy("user_id", "day")
      .orderBy(col("ts"), col("event_id"))
    val paths = e.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("user_id", "day")
      .agg(concat_ws("->",
        max(when(col("rn") === 1, col("event_type"))),
        max(when(col("rn") === 2, col("event_type"))),
        max(when(col("rn") === 3, col("event_type")))).as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(20)
  }

  private val ePathsTopkSql =
    """WITH f AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type,
              ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                ORDER BY ts, event_id) AS rn
            FROM events),
       p AS (SELECT user_id, day,
               concat_ws('->',
                 MAX(CASE WHEN rn = 1 THEN event_type END),
                 MAX(CASE WHEN rn = 2 THEN event_type END),
                 MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
             FROM f WHERE rn <= 3 GROUP BY 1, 2)
       SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
       FROM p GROUP BY 1
       ORDER BY n_sessions DESC, path ASC LIMIT 20"""

  /** Weekly cohort retention triangle: users grouped by the Monday of
    * their FIRST event week, each later week offset graded by how many
    * of them were still active — the classic retention matrix at week
    * grain (e_cohort's monthly cut, widened to the full triangle).
    * Shape: one per-user min aggregate, one (user, week) distinct,
    * two keyed joins; the triangle itself is |cohorts|·|offsets| ≈ 10⁴
    * rows at any volume. Week offsets divide exactly (both weeks are
    * Monday-truncated, so the day gap is a multiple of 7). */
  private def eRetentionWeeks(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val f = e.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        to_date(date_trunc("week", col("first_ts"))).as("cohort_week"))
    val a = e.select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("w"))
      .distinct()
    val sizes = f.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_n"))
    val tri = a.join(f, Seq("user_id"))
      .withColumn("week_offset",
        expr("datediff(w, cohort_week) div 7"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
    tri.join(sizes, Seq("cohort_week"))
      .withColumn("retention_bp",
        expr("n_active * 10000 div cohort_n"))
      .select("cohort_week", "week_offset", "n_active", "cohort_n",
        "retention_bp")
      .orderBy("cohort_week", "week_offset")
  }

  private val eRetentionWeeksSql =
    """WITH f AS (SELECT user_id,
              CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY 1),
       a AS (SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS w
             FROM events),
       sizes AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_n
                 FROM f GROUP BY 1),
       tri AS (SELECT cohort_week,
                 date_diff('day', cohort_week, w) // 7 AS week_offset,
                 CAST(COUNT(*) AS BIGINT) AS n_active
               FROM a JOIN f USING (user_id)
               GROUP BY 1, 2)
       SELECT tri.cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
              n_active, cohort_n,
              CAST(n_active * 10000 // cohort_n AS BIGINT) AS retention_bp
       FROM tri JOIN sizes USING (cohort_week)
       ORDER BY cohort_week, week_offset"""

  def queries: Seq[Q] = Seq(
    Q("e_markov_steady", eMarkovSteady, Some(eMarkovSteadySql)),
    Q("e_markov_predict", eMarkovPredict, Some(eMarkovPredictSql)),
    Q("e_paths_topk", ePathsTopk, Some(ePathsTopkSql)),
    Q("e_retention_weeks", eRetentionWeeks, Some(eRetentionWeeksSql)),
    Q("j12_band_join", j12BandJoin, Some(j12BandJoinSql)))
}
