package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as relational plans — no GraphX/RDD tier.
  *
  * PageRank serves two engine surfaces: ranking hosts in the
  * flow-communication graph (the host-profile tier's "who matters"
  * signal) and ranking domains in a crawl link graph (the Common-Crawl
  * style quality prior a training-data pipeline feeds into curation,
  * next to the LM quality gate).
  *
  * Scale shape: each synchronous iteration is ONE join (ranks × edges on
  * src) and ONE aggregate (contributions by dst) — the standard
  * map-side-combinable shape; the rank frame stays (node, rank) narrow.
  * Iterations are a driver-side loop over lazy plans with a
  * `localCheckpoint` per round to stop the plan (and its lineage)
  * growing linearly with `iters` — the classic iterative-DataFrame trap.
  *
  * All arithmetic is INTEGER nano-units (rank × 10⁹, floor division),
  * the same discipline as the DSIR micro-unit NLL: cross-engine float
  * summation order can flip a rounded last digit, integer floor-div
  * cannot — so the result is value-identical on any engine that
  * replays the formula, and independent of partition order. */
object Graphs {

  /** Damped PageRank by `iters` synchronous iterations over an edge
    * list `(src, dst)` (parallel edges collapse; self-loops count).
    *
    * `r_{t+1}(v) = (1−d)/N + d·Σ_{(u,v)∈E} r_t(u)/outdeg(u)` in
    * nano-units with floor division at each step; dangling-node mass is
    * DROPPED (not redistributed) — the simplest well-defined variant.
    * `damping` is taken in percent (85 = 0.85) to keep the arithmetic
    * integral. Returns (node, rank_u: long nano-units, rank: double). */
  def pageRank(edges: DataFrame, iters: Int = 3,
               dampingPct: Int = 85): DataFrame = {
    require(dampingPct > 0 && dampingPct < 100, "dampingPct in (0, 100)")
    val Unit9 = 1000000000L
    val e = edges.select(col("src"), col("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val baseU = (Unit9 * (100L - dampingPct) / 100L) / n // floor, driver-side
    var ranks = nodes.select(col("node"), lit(Unit9 / n).as("rank_u"))
    var it = 0
    while (it < iters) {
      val contrib = ranks
        .join(outdeg, ranks("node") === outdeg("src"))
        .join(e, "src")
        .select(col("dst").as("node"),
          expr("rank_u div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("in_mass"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(baseU) +
            expr(s"coalesce(in_mass, 0L) * $dampingPct div 100"))
            .as("rank_u"))
        .localCheckpoint(true) // cut lineage: plans must not grow with iters
      it += 1
    }
    e.unpersist(); nodes.unpersist()
    ranks.select(col("node"), col("rank_u"),
      (col("rank_u").cast("double") / 1e9d).as("rank"))
  }
}
