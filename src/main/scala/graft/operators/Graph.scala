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
    * (nodes + edges) rows.
    */
  def pageRank(
      edges: DataFrame,
      nodes: DataFrame,
      iterations: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst",
      idCol: String = "id"): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    val n = nodes.select(col(idCol).as("id"))
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // total mass 1.0 in nano-units, split evenly; base = 0.15 of a share
    val nNodes = n.count()
    require(nNodes > 0, "pageRank requires at least one node")
    val share = 1000000000L / nNodes
    val base = (15L * share) / 100L
    val r0 = n.withColumn("rank_nano", lit(share))
    (0 until iterations).foldLeft(r0) { (r, _) =>
      val contrib = e
        .join(r, e("src") === r("id"))
        .join(deg, "src")
        .select(col("dst"), expr("rank_nano div outdeg").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("insum"))
      n.join(contrib, n("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit(base) + expr("85L * coalesce(insum, 0L) div 100")).as("rank_nano"))
    }
  }
}
