package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution: finding record pairs whose KEY strings nearly
  * match, without the all-pairs cross join that is quadratic in the
  * table — the blocking problem, solved here with the DELETION
  * NEIGHBORHOOD (the FastSS / symmetric-delete family): every key emits
  * itself plus its |key| single-character-deletion variants, and two
  * keys within Levenshtein distance 1 PROVABLY share a variant —
  *  - substitution at position i: deleting i from both sides yields the
  *    same string;
  *  - insertion/deletion: deleting the inserted character from the
  *    longer side yields the shorter side's identity variant;
  *  - equality: the identity variants collide.
  * So the variant equi-join generates a candidate superset, and the
  * exact `levenshtein` predicate (identical integer metric in Spark and
  * DuckDB) keeps only true matches — generate-bounded-candidates →
  * verify-exactly, the same two-phase shape as the MinHash/LSH and
  * PPJoin dedup paths ([[graft.dedup.Dedup]]).
  *
  * Scale: the work is |rows|·(avg key length) variant rows, one
  * equi-join shuffle on the variant, and per-block candidate pairs —
  * never |rows|². Natural identifier keys block into small groups; a
  * pathological key distribution degrades the BLOCK, not the algorithm,
  * exactly as with LSH bands.
  */
object Link {

  /** All pairs (id_a < id_b) whose `keyCol` values are within
    * Levenshtein distance 1, via deletion-neighborhood blocking.
    * Returns (id_a, id_b, key_a, key_b, dist). */
  def fuzzyPairs(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val base = df
      .select(col(idCol).as("id"), col(keyCol).as("key"))
      .filter(col("key").isNotNull)
    // Variant rows carry (id, variant) ONLY: the key strings would
    // otherwise ride through the variant distinct + both sides of the
    // block join + the candidate distinct (the three widest shuffles
    // here) just to be read once at the final verify — instead the
    // candidate ids re-attach keys from the base relation after
    // candidate dedup. Same candidate set, ~half the shuffle bytes.
    // The re-attach joins carry NO broadcast hint: base is the whole
    // input table, so forcing a broadcast would hit the 8 GB broadcast
    // limit (or OOM the driver) at scale — the planner/AQE broadcasts
    // when base's runtime size allows and shuffles otherwise, and the
    // ids-only shuffle-bytes win holds either way.
    val v = base
      .select(col("id"), col("key"),
        explode(sequence(lit(0), length(col("key")))).as("i"))
      .select(col("id"),
        expr("CASE WHEN i = 0 THEN key " +
          "ELSE concat(substring(key, 1, i - 1), " +
          "substring(key, i + 1, 2147483647)) END").as("variant"))
      // keys with REPEATED characters produce the same variant from
      // several deletion positions ("0001" → "001" three ways); without
      // this dedup every such key joins each block multiple times and
      // the candidate pair set inflates quadratically (zero-padded
      // identifiers: ~7 dup variants → ~49× the pairs, all discarded by
      // the later distinct). One partial-agg distinct here keeps blocks
      // minimal — the candidate SET is unchanged.
      .distinct()
    val cand = v.alias("a")
      .join(v.alias("b"),
        col("a.variant") === col("b.variant") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("key").as("key_a")),
        "id_a")
      .join(base.select(col("id").as("id_b"), col("key").as("key_b")),
        "id_b")
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")))
      .filter(col("dist") <= 1)
      .select("id_a", "id_b", "key_a", "key_b", "dist")
  }
}
