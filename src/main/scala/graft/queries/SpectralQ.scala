package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.Spectral

/** Round-9 spectral-analytics pack: integer power iteration over the
  * embedding Gram matrix ([[graft.sim.Spectral]]) — PCA's first
  * component as an exact, oracle-replayable fixed-point computation,
  * plus the per-label projections that turn it into a 1-D cluster-
  * structure report. The Gram accumulates as ONE d²-long vector-sum
  * partial agg (no row blowup); the iteration itself lives inside the
  * 1-row Gram relation, so past the single scan the whole analysis is
  * constant-sized at any corpus scale. The DuckDB oracle materializes
  * the Gram as a (j,k) table (d²·N unnested pairs — fine at oracle
  * scales) and unrolls the same 3 rounds.
  */
object SpectralQ extends QueryPack {

  private val Dim = 64
  private val Rounds = 3

  private def simPowerDir(spark: SparkSession, d: String): DataFrame =
    Spectral.powerDirection(Tables.embeddings(spark, d), "embedding",
        Dim, Rounds)
      .orderBy("dim")

  /** Shared oracle prefix: quantized vectors, (j,k) Gram, 3 unrolled
    * power rounds ending in v3 (k, val). */
  private val powerSql = {
    def round(prev: String, cur: String) =
      s"""r$cur AS (SELECT g.j, SUM(g.g * $prev.val) AS num
              FROM g JOIN $prev ON g.k = $prev.k GROUP BY 1),
       m$cur AS (SELECT MAX(abs(num)) AS m FROM r$cur),
       $cur AS (SELECT j AS k,
                CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
                     WHEN num < 0 THEN CAST(-(((-num) * 1024) // m) AS BIGINT)
                     ELSE CAST((num * 1024) // m AS BIGINT) END AS val
              FROM r$cur, m$cur)"""
    s"""sv AS (SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS s
       FROM embeddings),
       e2 AS (SELECT vec_id, u.j, u.q
              FROM sv, UNNEST(list_transform(s,
                (x, i) -> {'j': i - 1, 'q': x})) AS r(u)),
       g AS (SELECT a.j AS j, b.j AS k, SUM(a.q * b.q) AS g
             FROM e2 a JOIN e2 b USING (vec_id) GROUP BY 1, 2),
       v0 AS (SELECT j AS k, CAST(1024 AS BIGINT) AS val
              FROM range($Dim) AS t(j)),
       ${round("v0", "v1")},
       ${round("v1", "v2")},
       ${round("v2", "v3")}"""
  }

  private val simPowerDirSql =
    s"""WITH $powerSql
       SELECT CAST(k AS BIGINT) AS dim, val AS v FROM v3 ORDER BY dim"""

  private def simProjLabel(spark: SparkSession, d: String): DataFrame =
    Spectral.labelProjections(Tables.embeddings(spark, d), "embedding",
        "label", Dim, Rounds)
      .orderBy("label")

  private val simProjLabelSql =
    s"""WITH $powerSql,
       v3l AS (SELECT list(val ORDER BY k) AS v FROM v3),
       p AS (SELECT label,
               list_sum(list_transform(s, (x, i) -> x * v[i])) AS p
             FROM sv, v3l)
       SELECT CAST(label AS BIGINT) AS label,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(CASE WHEN SUM(p) < 0 THEN -((-SUM(p)) // COUNT(*))
                        ELSE SUM(p) // COUNT(*) END AS BIGINT) AS mean_proj
       FROM p GROUP BY 1 ORDER BY label"""

  private def simRayleigh(spark: SparkSession, d: String): DataFrame =
    Spectral.rayleighSummary(Tables.embeddings(spark, d), "embedding",
      Dim, Rounds)

  private val simRayleighSql =
    s"""WITH $powerSql,
       gv AS (SELECT g.j, SUM(g.g * v3.val) AS num
              FROM g JOIN v3 ON g.k = v3.k GROUP BY 1),
       nd AS (SELECT
           (SELECT SUM(CAST(v3.val AS HUGEINT) * gv.num)
            FROM v3 JOIN gv ON v3.k = gv.j) AS num,
           (SELECT SUM(CAST(val AS HUGEINT) * val) FROM v3) AS den,
           (SELECT SUM(g) FROM g WHERE j = k) AS trace)
       SELECT CAST(trace AS BIGINT) AS trace,
              CAST(num // den AS BIGINT) AS lambda1,
              CAST((10000 * num) // (den * trace) AS BIGINT) AS share_bp
       FROM nd"""

  def queries: Seq[Q] = Seq(
    Q("sim_power_dir", simPowerDir, Some(simPowerDirSql)),
    Q("sim_proj_label", simProjLabel, Some(simProjLabelSql)),
    Q("sim_rayleigh", simRayleigh, Some(simRayleighSql)))
}
