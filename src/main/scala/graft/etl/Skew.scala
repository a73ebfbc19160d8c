package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salting.
  *
  * A hash join on a skewed key sends every row of a hot key to ONE
  * reducer. Salting splits each hot key into `salts` sub-keys: the big
  * side gets a deterministic salt derived from its other columns, the
  * small side is replicated once per salt, and the join runs on
  * (key, salt) — the hot key's rows now spread over `salts` reducers.
  * Results are identical to the unsalted join (spec-asserted).
  *
  * This is the manual fallback; AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin`, on by default in [[graft.Sessions]])
  * covers sort-merge joins automatically — salting remains necessary for
  * aggregations over hot keys and engines/paths AQE doesn't reach.
  */
object Skew {

  /** Deterministic salt in [0, salts) derived from the named columns
    * (NOT the join key — salt must vary within a key). */
  def saltFrom(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")

  /** Inner equi-join `big ⋈ small` on `keys`, salted `salts` ways.
    * `saltSource` columns (from the big side) drive the salt; the small
    * side is exploded ×salts. Column set of the result matches the plain
    * join (salt columns are dropped). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, saltSource: Seq[String]): DataFrame = {
    require(salts >= 1)
    val saltedBig = big.withColumn("__salt",
      saltFrom(salts, saltSource.map(col): _*))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", "inner").drop("__salt")
  }
}
