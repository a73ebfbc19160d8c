package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent corpus content fingerprint — the shared kernel
  * behind the batch `pr_content_hash` query and the streaming twin
  * ([[graft.streaming.Relay.contentHashStream]]): each row hashes to
  * the 60-bit prefix of the md5 of its pipe-joined columns, and the
  * table fingerprint is (COUNT, SUM mod 2⁶⁰). SUM is associative and
  * commutative, so partials merge identically under any partitioning,
  * AQE re-plan, or micro-batch arrival order — which is exactly why
  * the streaming aggregation converges to the batch answer bit for bit
  * and why two 100 TB relations can be diffed with one aggregate each
  * and no sort. */
object ContentHash {

  private val Mod = "1152921504606846976" // 2^60

  /** 60-bit md5 row hash of the given columns, pipe-joined. */
  def rowHash(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", cols: _*)), 1, 15), 16, 10)
      .cast("long")

  /** One-row (n_rows, content_hash) fingerprint. Works unchanged on a
    * batch or streaming DataFrame (the agg is a streaming-legal global
    * aggregate in complete/update mode). */
  def fingerprint(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(rowHash(cols.map(col)).cast(DecimalType(38, 0)).as("h"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("h")).as("sh"))
      .select(col("n_rows"),
        expr(s"CAST(sh % $Mod AS BIGINT)").as("content_hash"))
}
