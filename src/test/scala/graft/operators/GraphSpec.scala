package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("pageRank: hand graph — sink node accumulates, isolated node keeps base mass") {
    // 1 -> 3, 2 -> 3, 3 -> 1; node 4 isolated (no in- or out-edges)
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val r = Graph.pageRank(edges, nodes, iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val share = 1000000000L / 4
    val base = 15L * share / 100
    // after one hop: 3 receives from 1 and 2 (whole shares), 1 receives
    // from 3, 2 and 4 receive nothing
    assert(r(3L) == base + 85L * (share + share) / 100)
    assert(r(1L) == base + 85L * share / 100)
    assert(r(2L) == base && r(4L) == base)
  }

  test("pageRank: mass conservation when every node has out-edges; determinism") {
    // ring of 6 nodes: every node outdeg 1 — total mass stays 1e9 exactly
    val edges = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("src", "dst")
    val nodes = (0L until 6L).toDF("id")
    val r = Graph.pageRank(edges, nodes, iterations = 3)
    val total = r.agg(sum("rank_nano")).collect()(0).getLong(0)
    // ring: uniform distribution is stationary; floor losses: up to
    // (nodes-1) nano from the initial share division plus <= 1 nano per
    // node per iteration from the 15/85 integer splits
    assert(total <= 1000000000L && total >= 1000000000L - (5L + 6L * 3),
      s"mass drifted: $total")
    val again = Graph.pageRank(edges, nodes, iterations = 3)
    assert(r.exceptAll(again).isEmpty && again.exceptAll(r).isEmpty)
  }

  test("pageRank on the kNN graph: high-indegree nodes outrank zero-indegree nodes") {
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
    val edges = Similarity.knnGraph(emb, k = 5)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
      .cache()
    val nodes = Similarity.asVectors(emb).select("id")
    val ranks = Graph.pageRank(edges, nodes, iterations = 3)
    val withDeg = ranks.join(
      edges.groupBy("dst").agg(count(lit(1)).as("indeg")),
      ranks("id") === col("dst"), "left")
      .select(col("id"), col("rank_nano"), coalesce(col("indeg"), lit(0L)).as("indeg"))
    val avgTop = withDeg.orderBy(col("indeg").desc).limit(20)
      .agg(avg("rank_nano")).collect()(0).getDouble(0)
    val avgZero = withDeg.filter(col("indeg") === 0)
      .agg(avg("rank_nano")).collect()(0).getDouble(0)
    assert(avgTop > avgZero,
      s"centrality uncorrelated with in-degree: top $avgTop vs isolated $avgZero")
  }

  test("pageRank: convergence stop ends a 10-iteration budget early at the stationary point") {
    // ring of 6: uniform mass drifts down ~1 nano/node/iteration (the
    // 15/85 integer floors) until the EXACT integer fixed point, then
    // stops moving entirely — so tolNano=1 stops at the fixed point (a
    // few rounds in) and the remaining budget iterations are provably
    // no-ops, making early-stop ≡ fixed-10 bit-for-bit
    val edges = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("src", "dst")
    val nodes = (0L until 6L).toDF("id")
    val (converged, itersRun) =
      Graph.pageRankRun(edges, nodes, iterations = 10, tolNano = 1L)
    assert(itersRun < 10, s"convergence stop never fired: ran $itersRun/10")
    val fixed10 = Graph.pageRank(edges, nodes, iterations = 10)
    assert(converged.exceptAll(fixed10).isEmpty && fixed10.exceptAll(converged).isEmpty,
      "early-stopped ranks differ from the fixed-10 run at the stationary point")
    // and tolNano = 0 (the g1-oracle configuration) must NOT stop early
    assert(Graph.pageRankRun(edges, nodes, iterations = 10)._2 == 10)
  }

  test("pageRank: out-degree normalization — a hub's mass splits across targets") {
    // hub 1 -> {2, 3}; 2 -> 1; 3 -> 1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val r = Graph.pageRank(edges, nodes, iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val share = 1000000000L / 3
    val base = 15L * share / 100
    // 2 and 3 each get HALF the hub's share; 1 gets both whole shares
    assert(r(2L) == base + 85L * (share / 2) / 100)
    assert(r(2L) == r(3L))
    assert(r(1L) == base + 85L * (share + share) / 100)
  }

  test("personalizedPageRank: mass radiates from seeds, unreachable nodes stay at zero") {
    // chain 1 -> 2 -> 3 -> 4; node 5 points INTO the seed but is unreachable
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val r = Graph.personalizedPageRank(edges, nodes, seeds = Seq(1L), iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // closed-form wave: the initial packet travels the chain undivided
    // (every node has one out-edge) while the seed's steady teleport mass
    // radiates behind it; node 5 (not a seed, no in-links from the seed
    // side) ends at exactly zero
    assert(r(1L) == 150000000L, s"seed must hold exactly the teleport mass, got ${r(1L)}")
    assert(r(2L) == 127500000L && r(3L) == 108375000L,
      s"steady radiation from the seed must decay with distance: $r")
    assert(r(4L) == 614125000L, s"the initial packet should reach node 4 undivided: $r")
    assert(r(5L) == 0L, s"unreachable non-seed must score zero, got ${r(5L)}")
    // determinism
    val again = Graph.personalizedPageRank(edges, nodes, seeds = Seq(1L), iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == again)
  }

  test("personalizedPageRank: multi-seed mass splits evenly and uniform == pageRank when all nodes are seeds") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val ppr = Graph.personalizedPageRank(edges, nodes, seeds = Seq(1L, 2L, 3L), iterations = 3)
    val pr = Graph.pageRank(edges, nodes, iterations = 3)
    assert(ppr.exceptAll(pr).isEmpty && pr.exceptAll(ppr).isEmpty,
      "all-nodes-seeded PPR must equal uniform PageRank")
  }
}
