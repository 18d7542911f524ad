package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over edge lists (north-star extension): the
  * document/URL-importance scoring axis of crawl curation — Common Crawl
  * ranks hosts by centrality, and "cited by many well-cited pages" is a
  * quality prior orthogonal to the per-document text signals (X2/X14/X18).
  * Complements [[Dedup.clusters]]' connected components: CC partitions the
  * near-dup graph, centrality RANKS within the retrieval/citation graph.
  */
object Graph {

  /** PageRank with EXACT integer arithmetic: ranks are nano-units of total
    * mass, per-edge contributions are floor divisions `rank div outdeg`,
    * per-node in-sums are integer additions (associative — any shuffle or
    * accumulation order agrees), and the damping update is
    * `base + (85 · insum) div 100`. No doubles anywhere, so a fixed
    * iteration count is bit-reproducible in any engine — the same trick as
    * the micro-quantized Lloyd means (k3/k4), applied to power iteration.
    * (The floor drift loses a few nano per node per hop vs real-valued
    * PageRank — irrelevant for ranking, essential for the value gate.)
    *
    * Semantics: damping 0.85; every node gets base mass 0.15/N; dangling
    * nodes (no out-edges) contribute nothing (their mass decays — the
    * simple deterministic convention, documented rather than redistributed).
    * Nodes absent from the edge list still appear in the output with
    * base-only mass.
    *
    * Shape at 100 TB: one groupBy shuffle on dst per iteration over the
    * EDGE list (contributions partial-aggregate map-side), a broadcast-or-
    * shuffle join back to ranks, fixed iteration count — the standard
    * distributed power-iteration layout; no step holds more than
    * (nodes + edges) rows. The edge list, out-degrees, and node set are
    * PERSISTED once before the loop (edges would otherwise be re-read from
    * source and out-degrees re-aggregated EVERY iteration — fine at 3,
    * ruinous at 30), and each iteration's ranks are eagerly
    * localCheckpoint-ed, the d7 move that keeps the logical plan O(1)
    * per round instead of doubling.
    *
    * `tolNano > 0` adds a convergence stop: iteration ends early once the
    * total absolute rank movement Σ|Δrank_nano| drops to ≤ tolNano (one
    * cheap self-join agg per round — only computed when the stop is
    * enabled, so the default fixed-iteration path runs the exact same
    * jobs as before). With the stop disabled (default) the iteration
    * count is exact, which is what the g1 oracle's SQL replay pins.
    */
  def pageRank(
      edges: DataFrame,
      nodes: DataFrame,
      iterations: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst",
      idCol: String = "id",
      tolNano: Long = 0L): DataFrame =
    pageRankRun(edges, nodes, iterations, srcCol, dstCol, idCol, tolNano)._1

  /** [[pageRank]] plus the number of iterations actually executed — the
    * observable the convergence-stop spec pins (a caller tuning `tolNano`
    * also wants to know whether the budget or the tolerance ended the
    * run).
    */
  def pageRankRun(
      edges: DataFrame,
      nodes: DataFrame,
      iterations: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst",
      idCol: String = "id",
      tolNano: Long = 0L): (DataFrame, Int) = {
    val n0 = nodes.select(col(idCol).as("id"))
    // uniform teleport: every node starts with an even share and receives
    // base mass 0.15 of a share
    powerIterate(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")),
      (n, share) => n
        .withColumn("init_nano", lit(share))
        .withColumn("base_nano", lit((15L * share) / 100L)),
      n0, iterations, tolNano)
  }

  /** Personalized PageRank (G2): teleport mass concentrated on a SEED set —
    * "importance as seen from these nodes", the graph-proximity score
    * behind related-document retrieval, seed-expanded crawl frontiers and
    * graph re-ranking of ANN results (seed = the query's neighbors). Same
    * integer-exact power iteration as [[pageRank]] — only the mass vector
    * changes: seeds start with 1/|S| shares (nano) and are the only nodes
    * receiving teleport mass 0.15/|S|; everyone else accumulates purely
    * through in-links, so rank decays with graph distance from the seeds.
    * Dangling decay matches g1's convention. Identical per-iteration shape
    * and the same fixed-iteration bit-reproducibility.
    */
  def personalizedPageRank(
      edges: DataFrame,
      nodes: DataFrame,
      seeds: Seq[Long],
      iterations: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst",
      idCol: String = "id",
      tolNano: Long = 0L): DataFrame = {
    require(seeds.nonEmpty, "personalized PageRank needs at least one seed")
    val seedShare = 1000000000L / seeds.size
    val seedBase = (15L * seedShare) / 100L
    powerIterate(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")),
      (n, _) => n
        .withColumn("init_nano",
          when(col("id").isin(seeds: _*), seedShare).otherwise(0L))
        .withColumn("base_nano",
          when(col("id").isin(seeds: _*), seedBase).otherwise(0L)),
      nodes.select(col(idCol).as("id")), iterations, tolNano)._1
  }

  /** The shared damped power iteration: `massOf` attaches per-node
    * (init_nano, base_nano) columns given the node set and the even share
    * 10⁹/N; the loop is g1's exact job sequence (persisted inputs, eager
    * per-round checkpoints, optional Σ|Δ| stop).
    */
  private def powerIterate(
      edgesIn: DataFrame,
      massOf: (DataFrame, Long) => DataFrame,
      nodesIn: DataFrame,
      iterations: Int,
      tolNano: Long): (DataFrame, Int) = {
    require(iterations >= 0, "iterations must be non-negative")
    require(tolNano >= 0L, "tolNano must be non-negative")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edgesIn.persist(lvl)
    // FORCE the edge cache before anything branches on e: the first
    // iteration consumes e through two DAG branches (the contribution join
    // and the out-degree aggregate); if both hit an unfilled cache in the
    // same job they RACE and each recomputes the full upstream edge
    // derivation — measured 2x the whole kNN-graph build on g1. One
    // count() fills the cache once; every branch after reads it.
    e.count()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist(lvl)
    val nIds = nodesIn.persist(lvl)
    val nNodes = nIds.count()
    require(nNodes > 0, "pageRank requires at least one node")
    val n = massOf(nIds, 1000000000L / nNodes).persist(lvl)
    var r = n.select(col("id"), col("init_nano").as("rank_nano"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < iterations && !converged) {
      val contrib = e
        .join(r, e("src") === r("id"))
        .join(deg, "src")
        .select(col("dst"), expr("rank_nano div outdeg").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("insum"))
      val next = n.join(contrib, n("id") === contrib("dst"), "left")
        .select(col("id"),
          (col("base_nano") + expr("85L * coalesce(insum, 0L) div 100")).as("rank_nano"))
        .localCheckpoint(true)
      if (tolNano > 0L) {
        val delta = next.as("a").join(r.as("b"), col("a.id") === col("b.id"))
          .agg(sum(abs(col("a.rank_nano") - col("b.rank_nano"))))
          .head().getLong(0)
        converged = delta <= tolNano
      }
      r = next
      iter += 1
    }
    // the result is checkpointed — its lineage no longer references the
    // persisted inputs, so they can be released immediately
    e.unpersist(false); deg.unpersist(false); n.unpersist(false)
    nIds.unpersist(false)
    (r, iter)
  }
}
