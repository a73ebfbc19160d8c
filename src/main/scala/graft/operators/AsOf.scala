package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) joins — an operator the reference lacks (its late-data
  * strategy is MERGE-by-key, `src/incrementatl_processing/incremetal_flights
  * .py:10-19`) but any event-time pipeline needs: for each left row, the
  * single right row with the greatest right ts at-or-before (backward) /
  * least at-or-after (forward) the left ts, per key.
  *
  * Spark-first formulation (the "union trick", not a range join):
  * tag both sides, union them on a common schema, and run
  * `last(payload, ignoreNulls)` over a per-key window ordered by
  * (ts, side) with an unbounded-preceding frame; left rows then carry the
  * most recent right payload seen at-or-before them. Cost: ONE hash
  * shuffle of |L|+|R| rows on the key + a per-partition sort — linear,
  * skew-safe (no per-row range scan, no nested loop), and identical in
  * shape to what it costs at 100 TB. A right row at the same ts sorts
  * BEFORE the left row (side 0 < 1), giving inclusive `>=` semantics —
  * matching DuckDB's `ASOF JOIN ON l.ts >= r.ts` exactly (the oracle for
  * the registered queries).
  */
object AsOf {

  /** Backward as-of left join: for each left row, the latest right row
    * with `right.tsCol <= left.tsCol` sharing `keys`. Left rows with no
    * prior right row keep null payloads (left-outer semantics).
    *
    * @param payload   right columns to carry (must not collide with left's)
    * @param tieBreak  right columns ordering duplicates at equal
    *                  (key, ts) — the max wins, making the pick
    *                  deterministic on any partitioning
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame =
    joinImpl(left, right, keys, tsCol, payload, tieBreak, descTs = false)

  /** Forward as-of left join: for each left row, the EARLIEST right row
    * with `right.tsCol >= left.tsCol` sharing `keys` (DuckDB:
    * `ASOF JOIN ON l.ts <= r.ts`). Same cost shape as [[backward]] —
    * the window just runs over descending ts. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame =
    joinImpl(left, right, keys, tsCol, payload, tieBreak, descTs = true)

  /** Nearest as-of left join: for each left row, the right row sharing
    * `keys` whose ts minimizes |right.ts - left.ts|, in EITHER
    * direction; at equal distance (including a right row exactly at the
    * left ts) the BACKWARD candidate wins. Composed from one backward
    * and one forward pass — two (|L|+|R|) hash shuffles on the key and
    * nothing else, so the cost shape is exactly 2× the one-directional
    * joins at any scale. Distances compare in exact epoch micros
    * (never floating seconds), so the pick is deterministic and the
    * oracle can replay it with `epoch_us`. Left rows with no right row
    * on either side keep null payloads. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val bNames = payload.map("__b_" + _) :+ "__b_rts"
    val fNames = payload.map("__f_" + _) :+ "__f_rts"
    def side(prefix: String): DataFrame =
      right.select((keys :+ tsCol).map(col) ++ tieBreak.map(col) ++
        payload.map(p => col(p).as(s"__${prefix}_$p")) :+
        col(tsCol).as(s"__${prefix}_rts"): _*)
    val b = joinImpl(left, side("b"), keys, tsCol, bNames, tieBreak,
      descTs = false)
    val bf = joinImpl(b, side("f"), keys, tsCol, fNames, tieBreak,
      descTs = true)
    val lMic = unix_micros(col(tsCol))
    val pickB = col("__f_rts").isNull ||
      (col("__b_rts").isNotNull &&
        lMic - unix_micros(col("__b_rts")) <=
          unix_micros(col("__f_rts")) - lMic)
    val out = payload.foldLeft(bf) { (df, p) =>
      df.withColumn(p,
        when(pickB, col("__b_" + p)).otherwise(col("__f_" + p)))
    }
    out.drop(bNames ++ fNames: _*)
  }

  private def joinImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String], tieBreak: Seq[String],
      descTs: Boolean): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(payload.intersect(left.columns).isEmpty,
      s"payload columns ${payload.intersect(left.columns).mkString(",")} collide with left side")
    // side 0 = right, 1 = left: at equal ts the right row sorts first, so
    // the left row's frame includes it (inclusive semantics).
    val l = left.withColumn("__ts", col(tsCol)).withColumn("__side", lit(1))
    // tie-break columns are renamed so a same-named left column (e.g. both
    // sides carrying event_id) is never merged with them by unionByName
    val tbNames = tieBreak.indices.map(i => s"__tb$i")
    val r = right.select((keys :+ tsCol).map(col) ++ payload.map(col) ++
        tieBreak.zip(tbNames).map { case (c, n) => col(c).as(n) }: _*)
      .withColumn("__ts", col(tsCol)).withColumn("__side", lit(0))
      .drop(tsCol)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Only __ts flips direction for forward joins. Tie-break columns are
    // ALWAYS ascending: last() picks the final row of the frame, so asc
    // order makes the max tieBreak win at equal (key, ts) in both
    // directions — the documented contract.
    val tsDir = if (descTs) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((Seq(tsDir, col("__side").asc) ++
        tbNames.map(n => col(n).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .drop("__ts", "__side")
      .drop(tbNames: _*)
  }
}

/** Range (interval) joins: pair rows whose timestamps fall within a window
  * of each other. A naive formulation with only a range predicate becomes
  * a nested-loop join; with an equi key Spark sort-merges but still scans
  * every same-key pair. The bucketed formulation here turns the range into
  * an EQUI join on (key, time-bucket): each left row probes its own bucket
  * and the adjacent one, so candidate pairs are bounded by bucket
  * population — the standard scale trick when the window is small relative
  * to the time span.
  */
object RangeJoin {

  /** For each left row, all right rows with the same `keys` and
    * `right.ts ∈ [left.ts - window, left.ts)` (strictly before the left
    * row, within `windowSec` seconds). Output: left columns + payload.
    * Candidates come from an equi join on (keys, bucket) over 2 probed
    * buckets; the exact range predicate filters residuals. */
  def precedingWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String], windowSec: Long): DataFrame = {
    require(payload.intersect(left.columns).isEmpty,
      "payload columns collide with left side")
    val bucket = (c: Column) => floor(unix_timestamp(c) / windowSec)
    // left probes bucket b and b-1 (a right row up to windowSec earlier
    // can live in either); explode keeps it one equi join.
    val l = left
      .withColumn("__b",
        explode(array(bucket(col(tsCol)) - 1, bucket(col(tsCol)))))
      .withColumn("__lts", col(tsCol))
    val r = right.select((keys :+ tsCol).map(col) ++ payload.map(col): _*)
      .withColumn("__b", bucket(col(tsCol)))
      .withColumnRenamed(tsCol, "__rts")
    l.join(r, keys :+ "__b")
      .filter(col("__rts") >= col("__lts") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("__rts") < col("__lts"))
      .drop("__b", "__lts", "__rts")
  }

  /** Mirror of [[precedingWithin]]: all right rows with the same `keys`
    * and `right.ts ∈ (left.ts, left.ts + window]` (strictly after the
    * left row, within `windowSec` seconds). Same bucketed-equi-join cost
    * shape — the left row probes its own bucket and the NEXT one. */
  def followingWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String], windowSec: Long): DataFrame = {
    require(payload.intersect(left.columns).isEmpty,
      "payload columns collide with left side")
    val bucket = (c: Column) => floor(unix_timestamp(c) / windowSec)
    val l = left
      .withColumn("__b",
        explode(array(bucket(col(tsCol)), bucket(col(tsCol)) + 1)))
      .withColumn("__lts", col(tsCol))
    val r = right.select((keys :+ tsCol).map(col) ++ payload.map(col): _*)
      .withColumn("__b", bucket(col(tsCol)))
      .withColumnRenamed(tsCol, "__rts")
    l.join(r, keys :+ "__b")
      .filter(col("__rts") <= col("__lts") + expr(s"INTERVAL $windowSec SECONDS") &&
        col("__rts") > col("__lts"))
      .drop("__b", "__lts", "__rts")
  }
}
