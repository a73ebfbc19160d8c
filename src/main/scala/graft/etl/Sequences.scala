package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence / interval analytics over event-shaped data — the two
  * session-flow primitives the funnel/cohort/retention family
  * (EventsQ) doesn't cover: the empirical Markov transition matrix of
  * an event stream, and sweep-line interval concurrency. Integer
  * arithmetic end-to-end (basis-point probabilities, not float
  * divides), so the DuckDB oracle replays both exactly.
  */
object Sequences {

  /** Empirical Markov transition matrix: for each entity's event
    * sequence (partitioned by `partCol`, ordered by `orderCols` — pass
    * a tie-breaking id as the trailing order column so the sequence is
    * total and engine-independent), count adjacent (from, to) state
    * pairs and report the transition probability in integer BASIS
    * POINTS: p_bp = n·10000 div Σ n over the from-state (floor — the
    * house integer-divide discipline; rows sum to ≤ 10000 per from).
    *
    * Scale shape: one shuffle on `partCol` for the lead() window
    * (per-entity partitions, never global), then a (from, to)
    * partial-agg count — the transition table is |states|² rows, a
    * dim-sized result at any corpus size. Returns (from_state,
    * to_state, n, p_bp). */
  def transitionMatrix(events: DataFrame, partCol: String,
      orderCols: Seq[String], stateCol: String): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val w = Window.partitionBy(partCol).orderBy(orderCols.map(col): _*)
    val pairs = events
      .select(col(partCol), col(stateCol).as("from_state"),
        lead(col(stateCol), 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
    val counts = pairs.groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    counts
      .join(counts.groupBy("from_state").agg(sum(col("n")).as("tot")),
        "from_state")
      .select(col("from_state"), col("to_state"), col("n"),
        expr("n * 10000 div tot").as("p_bp"))
  }

  /** Steady-state mass of the empirical Markov chain: power iteration
    * over the [[transitionMatrix]] output — π_{t+1}(s) = Σ_from
    * (π_t(from) · p_bp(from→s)) div 10⁴, each term floored before the
    * sum (the Katz discipline), `rounds` rounds from a uniform 10⁶ per
    * state. Mass leaks slightly each round (per-row floors and
    * rows-sum-≤10⁴ truncation) — deterministic, and irrelevant to the
    * RANKING the steady state is for. Every relation here is
    * |states|-sized (the matrix is |states|² by construction), so past
    * the transition count the whole iteration is dim-bounded at any
    * corpus size; lineage still truncates per round out of uniform
    * discipline. Returns (state, mass). */
  def markovSteady(trans: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val tr = trans.select(col("from_state"), col("to_state"), col("p_bp"))
      .localCheckpoint()
    val states = tr.select(col("from_state").as("state"))
      .union(tr.select(col("to_state").as("state")))
      .distinct()
      .localCheckpoint()
    var pi = states.withColumn("mass", lit(1000000L))
    for (_ <- 1 to rounds) {
      val in = pi.withColumnRenamed("state", "from_state")
        .join(tr, "from_state")
        .select(col("to_state").as("state"),
          expr("(mass * p_bp) div 10000").as("m"))
        .groupBy("state").agg(sum(col("m")).as("in_mass"))
      pi = states.join(in, Seq("state"), "left")
        .select(col("state"),
          coalesce(col("in_mass"), lit(0L)).as("mass"))
        .localCheckpoint()
    }
    pi
  }

  /** Sweep-line interval concurrency: how many [start, end) intervals
    * are active at each boundary day — +1 at each start, −1 at each
    * end, then a cumulative sum over the per-day deltas. An interval
    * counts as active from its start day up to but EXCLUDING its end
    * day (the half-open convention; end-day deltas land before the
    * day's reading).
    *
    * Scale shape: the ±1 deltas collapse to ONE partial-agg groupBy on
    * the day — the raw intervals are never sorted or windowed. The
    * cumulative sum runs over the aggregated per-day series only
    * (|distinct days| rows, calendar-bounded — ~2.5 k for seven years
    * at ANY scale factor), the same dim-sized-series boundary
    * [[Drift.cusumUpper]] documents. Returns (day, delta, active)
    * ordered by day. */
  def sweepConcurrency(intervals: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    val deltas = intervals
      .select(to_date(col(startCol)).as("day"), lit(1L).as("d"))
      .union(intervals.select(to_date(col(endCol)).as("day"),
        lit(-1L).as("d")))
      .filter(col("day").isNotNull)
      .groupBy("day").agg(sum(col("d")).as("delta"))
    deltas.withColumn("active",
      sum(col("delta")).over(Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** K-tap exponential smoothing (finite-impulse-response EWMA): per
    * entity, ewma_i = ⌊Σ_{j<K} 2^(K−1−j)·x_{i−j} / Σ present 2^(K−1−j)⌋
    * — halving weights over the last K observations, the denominator
    * summing only the taps that EXIST (so the first rows of a sequence
    * smooth over what's there, and a null value contributes neither
    * numerator nor weight). All integer: the oracle replays the lags
    * and the floor divide bit-for-bit.
    *
    * This is deliberately the TRUNCATED form, not the recursive
    * s_i = (x_i + s_{i−1}) div 2: the recursion's per-step floor makes
    * it inherently sequential per key (a 10⁹-event key would serialize),
    * while the K-tap window is one keyed-partition sort + K lag()
    * reads — embarrassingly parallel, with the dropped tail bounded by
    * 2^−K of the mass. Appends `ewma` to the input columns. */
  def expSmooth(df: DataFrame, partCol: String, orderCols: Seq[String],
      valCol: String, taps: Int): DataFrame = {
    require(taps >= 1 && taps <= 32, s"taps must be in [1, 32], got $taps")
    require(orderCols.nonEmpty, "need at least one order column")
    val w = Window.partitionBy(partCol).orderBy(orderCols.map(col): _*)
    val lags = (0 until taps).map { j =>
      val wt = 1L << (taps - 1 - j)
      val x = lag(col(valCol).cast("long"), j).over(w)
      (coalesce(x * wt, lit(0L)),
        when(x.isNotNull, lit(wt)).otherwise(lit(0L)))
    }
    df.withColumn("num", lags.map(_._1).reduce(_ + _))
      .withColumn("den", lags.map(_._2).reduce(_ + _))
      .withColumn("ewma", expr("num div den"))
      .drop("num", "den")
  }
}
