package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Sequences

/** Sequence / interval analytics (engine extension; own trailing bench
  * group): the empirical Markov transition matrix of the event stream
  * and a sweep-line concurrency profile of order→ship intervals —
  * the session-flow primitives next to EventsQ's funnel/cohort family.
  * Integer basis-point arithmetic; both oracles replay exactly.
  */
object SeqQ extends QueryPack {

  /** Event-type transition matrix per user ([[Sequences.transitionMatrix]]
    * — one per-user lead() window keyed by (ts, event_id) so the
    * sequence is total and engine-independent, then a (from, to)
    * partial-agg count; the |states|² result is dim-sized at any
    * scale). p_bp = floor(n·10000 / Σn over from_state). */
  private def eTransitions(spark: SparkSession, d: String): DataFrame =
    Sequences.transitionMatrix(Tables.events(spark, d), "user_id",
        Seq("ts", "event_id"), "event_type")
      .orderBy("from_state", "to_state")

  private val eTransitionsSql =
    """WITH p AS (SELECT user_id, event_type AS from_state,
              LEAD(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS to_state
            FROM events),
       c AS (SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
             FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2),
       t AS (SELECT from_state, CAST(SUM(n) AS BIGINT) AS tot
             FROM c GROUP BY 1)
       SELECT c.from_state, c.to_state, c.n, n * 10000 // tot AS p_bp
       FROM c JOIN t USING (from_state) ORDER BY 1, 2"""

  /** Open order-lines in flight per day: each lineitem is active from
    * its order date (exclusive of nothing) until its ship date
    * (exclusive — half-open), swept by [[Sequences.sweepConcurrency]]:
    * the ±1 deltas collapse to one per-day partial agg, and only the
    * calendar-bounded day series (~2.5 k rows at ANY SF) sees the
    * cumulative window. The order⋈lineitem equi-join shuffles on the
    * order key — the standard co-partitioned fact join. */
  private def ivOpenLines(spark: SparkSession, d: String): DataFrame = {
    val iv = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderdate"))
      .join(Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey"))
    Sequences.sweepConcurrency(iv, "o_orderdate", "l_shipdate")
      .orderBy("day")
  }

  private val ivOpenLinesSql =
    """WITH iv AS (SELECT o_orderdate AS s, l_shipdate AS e
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       d AS (SELECT day, CAST(SUM(dd) AS BIGINT) AS delta FROM (
             SELECT CAST(s AS DATE) AS day, 1 AS dd FROM iv
             UNION ALL
             SELECT CAST(e AS DATE), -1 FROM iv) GROUP BY 1)
       SELECT day, delta,
              CAST(SUM(delta) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS active
       FROM d ORDER BY day"""

  /** Per-customer spend trend: 4-tap exponential smoothing
    * ([[Sequences.expSmooth]], weights 8/4/2/1) of the order totals in
    * exact cents, ordered by (o_orderdate, o_orderkey) so the sequence
    * is total and engine-independent. One keyed window per customer —
    * partitions are per-entity, never global — and pure integer
    * arithmetic: the oracle replays the three lags and the floor
    * divide bit-for-bit. */
  private def eEwma(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        (graft.util.Exact.dec2(col("o_totalprice")) * 100)
          .cast("long").as("cents"))
    Sequences.expSmooth(o, "o_custkey", Seq("o_orderdate", "o_orderkey"),
        "cents", taps = 4)
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  private val eEwmaSql =
    """WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS cents
              FROM orders),
       l AS (SELECT o_custkey, o_orderdate, o_orderkey, cents,
               LAG(cents, 1) OVER w AS c1,
               LAG(cents, 2) OVER w AS c2,
               LAG(cents, 3) OVER w AS c3
             FROM o WINDOW w AS (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey))
       SELECT o_custkey, o_orderdate, o_orderkey, cents,
              CAST((8 * cents + COALESCE(4 * c1, 0) + COALESCE(2 * c2, 0)
                    + COALESCE(c3, 0))
                   // (8 + CASE WHEN c1 IS NULL THEN 0 ELSE 4 END
                        + CASE WHEN c2 IS NULL THEN 0 ELSE 2 END
                        + CASE WHEN c3 IS NULL THEN 0 ELSE 1 END)
                   AS BIGINT) AS ewma
       FROM l ORDER BY o_custkey, o_orderdate, o_orderkey"""

  override def queries: Seq[Q] = Seq(
    Q("e_transitions", eTransitions, Some(eTransitionsSql)),
    Q("iv_open_lines", ivOpenLines, Some(ivOpenLinesSql)),
    Q("e_ewma", eEwma, Some(eEwmaSql)))
}
