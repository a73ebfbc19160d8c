package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer power-iteration spectral analytics over an embedding column:
  * the dominant direction of the corpus Gram matrix and the per-label
  * projections onto it — PCA's first component, re-expressed in the
  * house exact-integer discipline so the DuckDB oracle replays every
  * round bit-for-bit.
  *
  * Pipeline: quantize each vector to 2¹⁰ fixed point (coarser than the
  * 2²⁰ ANN convention ON PURPOSE — Gram entries are Σ_rows q_j·q_k and
  * need the headroom: |q|≤2¹⁰ keeps a 10⁹-row Gram inside BIGINT),
  * accumulate the d×d Gram as ONE flattened d²-long vector-sum (the
  * [[graft.plans.VecSum]] partial-agg shape — d² longs per map task
  * through the shuffle, never a row blowup), then run power iteration
  * ENTIRELY inside the 1-row Gram relation: each round is a
  * matrix-vector product and a max-|component| rescale to 2¹⁰, written
  * as array expressions over the d²-array — zero additional scans, no
  * driver-side state. Convergence to the top eigendirection is the
  * classical power-method argument; 3 rounds from the all-ones start is
  * the fixed, oracle-replayable budget (direction sign follows the
  * start vector, deterministic).
  *
  * Per-round rescale divides by max|G·v| sign-safely (Spark `div`
  * truncates toward zero, DuckDB `//` floors — negative components
  * divide as |x| with the sign re-applied). Overflow audit at d = 64:
  * G entries ≤ N·2²⁰ (2³⁴ at sf1), G·v ≤ 64·G·2¹⁰ ≤ 2⁵⁰, rescale
  * multiplies by 2¹⁰ → 2⁶⁰ < 2⁶³. */
object Spectral {

  /** (1-row) flattened d² Gram matrix `g` of the 2¹⁰-quantized vectors,
    * plus the quantized source (vec_id, label, s) for downstream
    * projection. */
  private[sim] def gram(embeddings: DataFrame, vecCol: String)
      : (DataFrame, DataFrame) = {
    val sv = embeddings.withColumn("s",
      expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT))"))
    val g = sv
      .select(expr("flatten(transform(s, a -> transform(s, b -> a * b)))")
        .as("op"))
      .agg(graft.plans.VecSum.sum(col("op")).as("g"))
    (g, sv)
  }

  /** One power round over the 1-row Gram relation: v → rescale(G·v).
    * `dim` is the (static) dimensionality. localCheckpoint between
    * rounds is LOAD-BEARING: without it the optimizer's projection
    * collapse inlines round r's d² element_at tree into every one of
    * round r+1's d² references — a d^(2·rounds) expression blowup that
    * hangs Catalyst long before execution. Checkpointing the 1-row
    * relation (trivial cost) is the same lineage-truncation discipline
    * as the iterative graph ops. */
  private def round(g: DataFrame, vCol: String, out: String, dim: Int)
      : DataFrame =
    g.withColumn("gv", expr(
        s"""transform(sequence(0, ${dim - 1}), j ->
              aggregate(sequence(0, ${dim - 1}), CAST(0 AS BIGINT),
                (acc, k) -> acc + element_at(g, j * $dim + k + 1)
                            * element_at($vCol, k + 1)))"""))
      .withColumn("m", expr("array_max(transform(gv, x -> abs(x)))"))
      .withColumn(out, expr(
        """transform(gv, x -> CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
                                   WHEN x < 0 THEN -(((-x) * 1024) div m)
                                   ELSE (x * 1024) div m END)"""))
      .drop("gv", "m")
      .localCheckpoint()

  /** Dominant direction after `rounds` power iterations: one row per
    * dimension (dim, v) with v in 2¹⁰ fixed point, max-normalized. */
  def powerDirection(embeddings: DataFrame, vecCol: String, dim: Int,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val (g0, _) = gram(embeddings, vecCol)
    var g = g0.withColumn("v0", expr(
      s"transform(sequence(0, ${dim - 1}), j -> CAST(1024 AS BIGINT))"))
    for (r <- 1 to rounds) g = round(g, s"v${r - 1}", s"v$r", dim)
    g.select(posexplode(col(s"v$rounds")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"), col("v"))
  }

  /** Rayleigh-quotient anisotropy summary, one row
    * (trace, lambda1, share_bp): λ₁ ≈ vᵀGv / vᵀv at the power-iterated
    * direction, and its share of trace(G) — the total variance — in
    * basis points. A healthy embedding space spreads variance across
    * components (low share); representation collapse concentrates it
    * (share → 10⁴). This is the "embedding degeneration" audit as one
    * exact scalar: vᵀGv accumulates in DECIMAL(38,0) (products reach
    * 2⁶⁶ past sf1), the divisions floor. */
  def rayleighSummary(embeddings: DataFrame, vecCol: String, dim: Int,
      rounds: Int): DataFrame = {
    val (g0, _) = gram(embeddings, vecCol)
    var g = g0.withColumn("v0", expr(
      s"transform(sequence(0, ${dim - 1}), j -> CAST(1024 AS BIGINT))"))
    for (r <- 1 to rounds) g = round(g, s"v${r - 1}", s"v$r", dim)
    g.withColumn("gv", expr(
        s"""transform(sequence(0, ${dim - 1}), j ->
              aggregate(sequence(0, ${dim - 1}), CAST(0 AS BIGINT),
                (acc, k) -> acc + element_at(g, j * $dim + k + 1)
                            * element_at(v$rounds, k + 1)))"""))
      .withColumn("num", expr(
        s"""aggregate(zip_with(v$rounds, gv, (a, b) -> a * b),
             CAST(0 AS DECIMAL(38,0)),
             (acc, x) -> CAST(acc + x AS DECIMAL(38,0)))"""))
      .withColumn("den", expr(
        s"""aggregate(zip_with(v$rounds, v$rounds, (a, b) -> a * b),
             CAST(0 AS BIGINT), (acc, x) -> acc + x)"""))
      .withColumn("trace", expr(
        s"""aggregate(sequence(0, ${dim - 1}), CAST(0 AS DECIMAL(38,0)),
             (acc, j) -> CAST(acc + element_at(g, j * $dim + j + 1)
               AS DECIMAL(38,0)))"""))
      .select(col("trace").cast("long").as("trace"),
        expr("num div den").cast("long").as("lambda1"),
        expr("(10000 * num) div (den * trace)").cast("long")
          .as("share_bp"))
  }

  /** Per-label mean projection onto the dominant direction: the 1-D
    * spectral view of label structure — labels whose clusters sit at
    * opposite ends of the top component land far apart. One broadcast
    * of the 1-row direction into the scan, one |labels|-row aggregate;
    * mean_proj = Σ⟨s,v⟩ div n per label (floor). */
  def labelProjections(embeddings: DataFrame, vecCol: String,
      labelCol: String, dim: Int, rounds: Int): DataFrame = {
    val (g0, sv) = gram(embeddings, vecCol)
    var g = g0.withColumn("v0", expr(
      s"transform(sequence(0, ${dim - 1}), j -> CAST(1024 AS BIGINT))"))
    for (r <- 1 to rounds) g = round(g, s"v${r - 1}", s"v$r", dim)
    val v = g.select(col(s"v$rounds").as("v"))
    sv.crossJoin(broadcast(v))
      .select(col(labelCol).as("label"), expr(
        """aggregate(zip_with(s, v, (a, b) -> a * b),
                     CAST(0 AS BIGINT), (acc, x) -> acc + x)""").as("p"))
      .groupBy("label")
      .agg(count(lit(1)).cast("long").as("n"),
        sum("p").cast("long").as("proj_sum"))
      .select(col("label").cast("long").as("label"), col("n"),
        expr("""CASE WHEN proj_sum < 0 THEN -((-proj_sum) div n)
                     ELSE proj_sum div n END""").as("mean_proj"))
  }
}
