package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K18: hierarchical graph search — the HNSW layer structure (Malkov &
  * Yashunin 2016) re-expressed as bounded relational rounds, lifting K6's
  * one recall ceiling: its beam starts from LSH bucket collisions, so seed
  * quality is whatever the first `seedBands` hash bands happen to give
  * (K16 measured k2 27/30 vs k6 29/30 — the gap IS the seeding). HNSW's
  * answer is a layer pyramid: geometrically sampled coarser layers, each
  * with its own kNN graph, searched top-down so every layer hands the next
  * one entry points that are ALREADY near the query — no hashing involved.
  *
  *  - LAYERS: level(id) counts leading '0' hex digits of md5(id), capped
  *    at `maxLevel` — the deterministic twin of HNSW's geometric level
  *    draw (P(level ≥ l) = 16^-l), engine-replayable like every other
  *    md5-derived decision in the engine.
  *  - GRAPHS: one kNN graph per expansion layer l ∈ [0, maxLevel):
  *    [[Similarity.knnGraph]] over the members with level ≥ l (`graphK`
  *    out-edges at the base, `graphKUpper` on coarse layers).
  *  - SEARCH: exact-score the WHOLE top layer (corpus·16^-maxLevel rows —
  *    at 100 TB pick maxLevel ≈ log₁₆ n so this is a constant-sized scan,
  *    exactly HNSW's near-singleton top layer), then descend: one beam
  *    round per coarse layer over that layer's graph, then `rounds` K6
  *    rounds over the base graph; every shortlist is the bounded
  *    `graft_topk` aggregate, every expansion a broadcast-beam equi-join
  *    against an edge list — no window, no cartesian, no corpus self-join
  *    at query time.
  *
  * The index is a K13-style persisted artifact ([[build]] →
  * levels/graphs/meta relations; [[searchTopKCosine]] only reads). Layer
  * membership of EXISTING nodes never changes, but a kNN graph's edges are
  * not frozen under insertion (a new node can displace old ones'
  * neighbors), so incremental absorption is a periodic REBUILD — the
  * honest contract for a relational HNSW; SimilaritySpec pins stored ≡
  * inline so rebuild cost is the k5 build, never a search-path concern.
  */
object HierarchicalIndex {

  /** Deterministic level draw: leading-'0' count of md5(id), capped. */
  private def levelCol(maxLevel: Int) =
    expr(
      s"""greatest(0, least($maxLevel,
         |  length(regexp_extract(md5(CAST(id AS STRING)), '^(0*)', 1))))"""
        .stripMargin).as("level")

  /** Fit and persist the pyramid: levels, one kNN graph per expansion
    * layer, and the immutable hyperparameters (the K13 meta discipline).
    */
  def build(
      corpus: DataFrame,
      path: String,
      maxLevel: Int = 1,
      graphK: Int = 16,
      graphKUpper: Int = 8,
      bits: Int = 72,
      bands: Int = 18,
      dim: Int = 64): Unit = {
    require(maxLevel >= 1, "need at least one coarse layer")
    val spark = corpus.sparkSession
    val v = Similarity.asVectors(corpus)
    val levels = v.select(col("id"), levelCol(maxLevel)).localCheckpoint(true)
    levels.write.mode("overwrite").parquet(s"$path/levels")
    for (l <- 0 until maxLevel) {
      val members = levels.filter(col("level") >= l).select("id")
      val kk = if (l == 0) graphK else graphKUpper
      Similarity.knnGraph(
        corpus.join(members, corpus("vec_id") === members("id")).drop("id"),
        kk, bits, bands, dim)
        .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
        .write.mode("overwrite").parquet(s"$path/graph/level=$l")
    }
    import spark.implicits._
    Seq((maxLevel, graphK, graphKUpper, bits, bands, dim))
      .toDF("max_level", "graph_k", "graph_k_upper", "bits", "bands", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Top-k by cosine from the STORED pyramid. */
  def searchTopKCosine(
      spark: SparkSession,
      path: String,
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      entryK: Int = 8,
      beamWidth: Int = 15,
      rounds: Int = 2): DataFrame =
    searchRun(spark, path, embeddings, queryIds, k, entryK, beamWidth,
      rounds)._1

  /** [[searchTopKCosine]] plus the exact-cosine evaluation count
    * (|visited|) — the budget observable the recall-vs-k6 spec pins.
    */
  def searchRun(
      spark: SparkSession,
      path: String,
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      entryK: Int = 8,
      beamWidth: Int = 15,
      rounds: Int = 2): (DataFrame, Long) = {
    graft.functions.GraftFunctions.register(spark)
    val meta = spark.read.parquet(s"$path/meta").head()
    val maxLevel = meta.getAs[Int]("max_level")
    val levels = spark.read.parquet(s"$path/levels")
    def graphAt(l: Int): DataFrame = {
      val out = spark.read.parquet(s"$path/graph/level=$l").select("src", "dst")
      out.unionByName(out.select(col("dst").as("src"), col("src").as("dst")))
    }
    searchLayers(embeddings, queryIds, levels, graphAt, maxLevel, k,
      entryK, beamWidth, rounds)
  }

  /** The same search with layers and graphs derived INLINE (no artifact) —
    * what [[Similarity.annRecall]]'s `hier` leg runs; spec-pinned
    * value-identical to the stored-artifact search (both derivations are
    * pure functions of the corpus).
    */
  def searchInlineRun(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      maxLevel: Int = 1,
      graphK: Int = 16,
      graphKUpper: Int = 8,
      bits: Int = 72,
      bands: Int = 18,
      dim: Int = 64,
      entryK: Int = 8,
      beamWidth: Int = 15,
      rounds: Int = 2): (DataFrame, Long) = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val v = Similarity.asVectors(embeddings)
    val levels = v.select(col("id"), levelCol(maxLevel)).localCheckpoint(true)
    def graphAt(l: Int): DataFrame = {
      val members = levels.filter(col("level") >= l).select("id")
      val kk = if (l == 0) graphK else graphKUpper
      val out = Similarity.knnGraph(
        embeddings.join(members, embeddings("vec_id") === members("id")).drop("id"),
        kk, bits, bands, dim)
        .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
      out.unionByName(out.select(col("dst").as("src"), col("src").as("dst")))
    }
    searchLayers(embeddings, queryIds, levels, graphAt, maxLevel, k,
      entryK, beamWidth, rounds)
  }

  def searchInline(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10): DataFrame = searchInlineRun(embeddings, queryIds, k)._1

  /** Shared layered descent (see object doc for the shape argument). */
  private def searchLayers(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      levels: DataFrame,
      graphAt: Int => DataFrame,
      maxLevel: Int,
      k: Int,
      entryK: Int,
      beamWidth: Int,
      rounds: Int): (DataFrame, Long) = {
    val v = Similarity.asVectors(embeddings)
    val q = broadcast(
      v.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"), col("v").as("qv")))
    def score(cand: DataFrame): DataFrame =
      Similarity.cosineCols(cand.join(v, "id").join(q, "query_id"))
        .select(col("query_id"), col("id"), col("cos"))
    def beamOf(visited: DataFrame, width: Int): DataFrame = visited
      .groupBy("query_id")
      .agg(expr(s"graft_topk(cos, id, $width)").as("tk"))
      .select(col("query_id"), explode(col("tk")).as("e"))
      .select(col("query_id"), col("e.id").as("id"))
    def expandRound(visited: DataFrame, g: DataFrame, width: Int): DataFrame = {
      val beam = beamOf(visited, width)
      val fresh = broadcast(beam).join(g, beam("id") === g("src"))
        .select(col("query_id"), col("dst").as("id"))
        .filter(col("id") =!= col("query_id"))
        .distinct()
        .join(visited.select("query_id", "id"), Seq("query_id", "id"), "left_anti")
      visited.unionByName(score(fresh)).localCheckpoint(true)
    }
    // top layer: exact-score every member (self excluded) — the HNSW
    // entry-point scan, constant-sized by layer geometry
    val top = levels.filter(col("level") >= maxLevel).select("id")
    var visited = score(
      broadcast(q.select("query_id")).crossJoin(top)
        .filter(col("id") =!= col("query_id")))
      .localCheckpoint(true)
    // descend the coarse layers: one bounded round each, narrow beam
    for (l <- (maxLevel - 1) to 1 by -1)
      visited = expandRound(visited, graphAt(l), entryK)
    // base layer: the K6 rounds at full beam width
    for (_ <- 1 to rounds)
      visited = expandRound(visited, graphAt(0), beamWidth)
    (Similarity.rankTopK(visited, k), visited.count())
  }
}
