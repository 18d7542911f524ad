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
  * levels/bands/graphs/meta relations; [[searchTopKCosine]] only reads).
  *
  * INCREMENTAL MAINTENANCE ([[absorb]] — closing the round-12 rebuild-only
  * contract): layer membership of EXISTING nodes never changes (md5
  * levels), and a node's LSH band keys never change (deterministic in its
  * vector) — what insertion can change is per-node top-k edge lists. Both
  * changes are EXACTLY reconstructible from bounded state:
  *
  *  - a NEW node's edges = top-k over its co-bucket partners, derived from
  *    the PERSISTED banding (`bands/level=l`) + the delta's own banding —
  *    bit-identical to what a from-scratch build computes for that row;
  *  - an OLD node's rebuilt edges = top-k(stored edges ∪ edges to its
  *    colliding delta nodes): per-node top-k lists are MERGEABLE under the
  *    (cos desc, id asc) total order — best-k(A ∪ B) ⊆ best-k(A) ∪ B — so
  *    only nodes sharing a bucket with the delta are touched, and each
  *    rewrite reads k stored edges plus its colliders, never its full
  *    candidate history.
  *
  * The one regime where this breaks is a bucket crossing [[Dedup
  * .capBuckets]]'s cap: sub-salting re-partitions the bucket and old
  * candidate sets change non-mergeably. `absorb` therefore CHECKS every
  * touched bucket's post-insert size and REFUSES loudly past the cap —
  * the staleness monitor: an over-cap refusal IS the rebuild trigger, and
  * under the check `absorb(build(C), Δ) ≡ build(C ∪ Δ)` holds exactly
  * (spec-pinned edge-set AND search equality, plus the refusal path).
  *
  * Scale shape per absorb: banding the delta is map-only; collider lookup
  * is one broadcast-semi-join scan of the bands relation (column-pruned;
  * at 100 TB, bucket it like the ClusterIndex members for point reads);
  * edge rewrites touch only pmod(src) graph buckets containing affected
  * or new nodes, committed atomically through the [[graft.core
  * .ManifestTable]] fence (a redelivered absorb batch no-ops).
  */
object HierarchicalIndex {

  /** Graph-relation bucket count (pmod(src)) — the manifest rewrite unit. */
  val GraphBuckets = 32

  /** Scale-adaptive band-key width for layer `l` of the pyramid — the
    * [[Similarity.adaptiveBandBits]] law applied per layer: layer l holds
    * an expected n·16⁻ˡ members (the md5 level draw's geometry), so its
    * width derives from `n >> 4l`, keeping every layer's expected bucket
    * occupancy constant as the corpus grows. This closed the round-15 sf1
    * scale finding: FIXED 4-bit keys put the sf1 base layer at ~1250
    * members/bucket — over [[Dedup.DefaultBucketCap]], so every delete hit
    * a build-salted over-cap bucket and refused after a full detection
    * burn; width 8 (the law at n=20k) restores ~78/bucket and the verbs
    * stay O(neighborhood). An explicit nonzero `bits` pins the width at
    * every layer (the pre-round-16 fixed behavior). Pure in (bits, bands,
    * n, l) — the SQL oracles replay it from count(*) alone, and
    * [[absorb]]/[[searchInlineRun]] re-derive it from the persisted
    * (`bits`, `width_count`) meta so incremental maintenance bands deltas
    * bit-identically to the build.
    */
  private[operators] def layerBits(
      bits: Int, bands: Int, n: Long, l: Int): Int =
    if (bits != 0) bits
    else bands * Similarity.adaptiveBandBits(math.max(1L, n >> (4 * l)))

  /** Deterministic level draw: leading-'0' count of md5(id), capped. */
  private def levelCol(maxLevel: Int) =
    expr(
      s"""greatest(0, least($maxLevel,
         |  length(regexp_extract(md5(CAST(id AS STRING)), '^(0*)', 1))))"""
        .stripMargin).as("level")

  /** Fit and persist the pyramid: levels, the PRE-cap banding per layer
    * (what [[absorb]] derives colliders from), one kNN graph per expansion
    * layer (a [[graft.core.ManifestTable]] bucketed by pmod(src) — the
    * absorb rewrite unit), and the immutable hyperparameters (the K13
    * meta discipline). Build commits as batch 0 of the manifest fence.
    *
    * `bits = 0` (the default) resolves each layer's band-key width
    * ADAPTIVELY via [[layerBits]] from `widthCount` — the corpus size the
    * width law is anchored to. It defaults to the build corpus's own
    * count; a streaming bootstrap whose batch 0 is a FRACTION of the
    * corpus it will eventually absorb (st20) passes the full target count
    * instead, so the streamed pyramid's stored width equals the one a
    * batch build over the whole corpus persists (the numBuckets-at-create
    * discipline of any bucketed table). The resolved law's inputs persist
    * in meta (`bits` raw, `width_count`) and every later verb re-derives
    * the same widths from them — so the exactness contracts of [[absorb]]
    * and [[delete]] are "≡ a rebuild AT THE STORED PARAMS", which at any
    * fixed width is also a rebuild at that corpus size's own width.
    */
  def build(
      corpus: DataFrame,
      path: String,
      maxLevel: Int = 1,
      graphK: Int = 16,
      graphKUpper: Int = 8,
      bits: Int = 0,
      bands: Int = 18,
      dim: Int = 64,
      bucketCap: Int = Dedup.DefaultBucketCap,
      widthCount: Long = 0L): Unit = {
    require(maxLevel >= 1, "need at least one coarse layer")
    val spark = corpus.sparkSession
    val v = Similarity.asVectors(corpus)
    val n = if (widthCount > 0L) widthCount
      else if (bits != 0) 0L // fixed width: the law never consults n
      else v.count()
    val levels = v.select(col("id"), levelCol(maxLevel)).localCheckpoint(true)
    // rebalance before every stored-relation write (guide §6 file sizing):
    // the checkpointed frames carry the session's full task count, so a
    // plain write lands one near-empty file per task — and every SEARCH
    // re-lists and re-opens them all. AQE's rebalance coalesces a small
    // relation to one right-sized file and still splits at the advisory
    // size when a 100 TB build genuinely fills partitions.
    levels.hint("rebalance")
      .write.mode("overwrite").parquet(s"$path/levels/batch=base")
    for (l <- 0 until maxLevel) {
      val members = levels.filter(col("level") >= l).select("id")
      val kk = if (l == 0) graphK else graphKUpper
      val vL = v.join(members, Seq("id")).localCheckpoint(true)
      val banded = Dedup
        .signBands(vL, layerBits(bits, bands, n, l), bands, dim)
        .localCheckpoint(true)
      banded.hint("rebalance")
        .write.mode("overwrite").parquet(s"$path/bands/level=$l/batch=base")
      graft.core.ManifestTable.commit(spark, s"$path/graph/level=$l",
        Similarity.knnGraphFromBanded(Dedup.capBuckets(banded, bucketCap), vL, kk)
          .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
          .withColumn("bucket",
            pmod(col("src"), lit(GraphBuckets)).cast("int")),
        "bucket", batchId = 0L)
    }
    import spark.implicits._
    Seq((maxLevel, graphK, graphKUpper, bits, bands, dim, bucketCap, n))
      .toDF("max_level", "graph_k", "graph_k_upper", "bits", "bands", "dim",
        "bucket_cap", "width_count")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Absorb a delta of NEW vectors into the stored pyramid — O(delta
    * neighborhood), exactly ≡ a from-scratch [[build]] over the union
    * (the object doc's mergeability argument), refusing loudly when a
    * touched LSH bucket would cross the build's `bucketCap` (the rebuild
    * trigger). `corpus` must contain ALL vectors including the delta's
    * (searches take the same frame); `delta` holds the new rows only, ids
    * disjoint from the indexed ones. Exactly-once per `batchId` through
    * the graph manifests' fence (levels/bands appends are scoped
    * overwrites, idempotent by construction); commits run top layer first
    * and level 0 LAST, so the level-0 fence implies the whole absorb
    * landed.
    */
  def absorb(
      spark: SparkSession,
      path: String,
      corpus: DataFrame,
      delta: DataFrame,
      batchId: Long): Unit = {
    require(batchId >= 1, "absorb batch ids start at 1 (build is batch 0)")
    graft.functions.GraftFunctions.register(spark)
    val metaDf = spark.read.parquet(s"$path/meta")
    val meta = metaDf.head()
    val maxLevel = meta.getAs[Int]("max_level")
    val bits = meta.getAs[Int]("bits")
    val nBands = meta.getAs[Int]("bands")
    val dim = meta.getAs[Int]("dim")
    val bucketCap = meta.getAs[Int]("bucket_cap")
    // pre-round-16 artifacts carry no width_count — their bits was always
    // an explicit fixed width, which the law reproduces with n = 0
    val widthCount =
      if (metaDf.schema.fieldNames.contains("width_count"))
        meta.getAs[Long]("width_count") else 0L
    if (graft.core.ManifestTable.lastBatch(
        spark, s"$path/graph/level=0") >= batchId) return // redelivery
    // corpus norms attached ONCE (Similarity.withNorm discipline): the
    // collider/delta scoring joins below otherwise recompute both norms
    // per scored pair; bit-identical cos
    val v = Similarity.withNorm(Similarity.asVectors(corpus))
      .localCheckpoint(true)
    val deltaV = Similarity.asVectors(delta).localCheckpoint(true)
    if (deltaV.isEmpty) return
    val deltaLevels = deltaV.select(col("id"), levelCol(maxLevel))
      .localCheckpoint(true)
    // rebalance before the per-batch appends too (same file-sizing
    // discipline as [[build]]): a per-task fan-out of a small delta is
    // pure listing/open tax on every later search
    deltaLevels.hint("rebalance").write.mode("overwrite")
      .parquet(s"$path/levels/batch=b$batchId")
    spark.catalog.refreshByPath(s"$path/levels")
    for (l <- (maxLevel - 1) to 0 by -1; kkOf = if (l == 0)
        meta.getAs[Int]("graph_k") else meta.getAs[Int]("graph_k_upper")) {
      val membersDelta = deltaLevels.filter(col("level") >= l).select("id")
      if (!membersDelta.isEmpty) {
        val deltaBand = Dedup.signBands(
          deltaV.join(membersDelta, Seq("id")),
          layerBits(bits, nBands, widthCount, l), nBands, dim)
          .localCheckpoint(true)
        deltaBand.hint("rebalance").write.mode("overwrite")
          .parquet(s"$path/bands/level=$l/batch=b$batchId")
        spark.catalog.refreshByPath(s"$path/bands/level=$l")
        // colliders: stored band rows sharing a (band, key) bucket with
        // the delta — one broadcast-semi-join scan of the persisted
        // banding; distinct dedupes the delta's own rows on a retry
        // (the stored relation already holds batch=b<id> then)
        val deltaKeys = deltaBand.select("band", "key").distinct()
          .localCheckpoint(true)
        // deleted nodes mask out of the stored banding ([[delete]]'s
        // tombstones): the absorb's candidate sets — and its cap check —
        // must see SURVIVORS only, so absorb(delete(I, D), Δ) keeps
        // matching a build over (corpus − D) ∪ Δ
        val touched = graft.core.Tombstones.filterLive(
          spark.read.parquet(s"$path/bands/level=$l")
            .select("id", "band", "key"), path, "id")
          .join(broadcast(deltaKeys), Seq("band", "key"))
          .distinct()
          .localCheckpoint(true) // delta-neighborhood-bounded
        // the cap check: a bucket crossing bucketCap re-salts under a
        // rebuild and old candidate sets stop being mergeable — refuse
        // with the rebuild instruction instead of silently degrading
        val over = touched.groupBy("band", "key")
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > bucketCap)
          .limit(1).collect()
        if (over.nonEmpty)
          throw new IllegalStateException(
            s"hierarchical index at $path: bucket (band=${over.head.get(0)}, " +
              s"key=${over.head.get(1)}) holds ${over.head.getLong(2)} " +
              s"members > bucketCap=$bucketCap after this delta — " +
              "incremental absorb is exact only below the cap; REBUILD the " +
              "pyramid for this corpus generation")
        val deltaIds = membersDelta.localCheckpoint(true)
        val oldTouched = touched
          .join(broadcast(deltaIds), Seq("id"), "left_anti")
        // every (affected old node ↔ colliding delta node) pair, scored
        // once, consumed by both rewrite directions
        val colliderPairs = oldTouched.as("o")
          .join(deltaBand.as("d"),
            col("o.band") === col("d.band") && col("o.key") === col("d.key"))
          .select(col("o.id").as("old_id"), col("d.id").as("new_id"))
          .distinct()
        val scoredPairs = Similarity.cosineCols(colliderPairs
          .join(v.select(col("id").as("old_id"), col("v").as("qv"),
            col("nv").as("nq")), "old_id")
          .join(v.select(col("id").as("new_id"), col("v"), col("nv")), "new_id"))
          .select(col("old_id"), col("new_id"), col("cos"))
          .localCheckpoint(true)
        // NEW nodes' edges: top-k over delta×old colliders ∪ delta×delta
        // co-bucket pairs — exactly the union build's candidate set
        val ddPairs = deltaBand.as("x")
          .join(deltaBand.as("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
              col("x.id") =!= col("y.id"))
          .select(col("x.id").as("query_id"), col("y.id").as("id"))
          .distinct()
        val ddScored = Similarity.cosineCols(ddPairs
          .join(v, "id")
          .join(v.select(col("id").as("query_id"), col("v").as("qv"),
            col("nv").as("nq")), "query_id"))
          .select(col("query_id"), col("id"), col("cos"))
        val newScored = scoredPairs
          .select(col("new_id").as("query_id"), col("old_id").as("id"), col("cos"))
          .unionByName(ddScored)
        val newEdges = Similarity.rankTopK(newScored, kkOf)
          .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
        // AFFECTED old nodes: merge stored top-k with collider scores —
        // read ONLY the graph buckets holding affected or new srcs
        val affectedIds = scoredPairs.select(col("old_id").as("id"))
          .distinct().localCheckpoint(true)
        val gRoot = s"$path/graph/level=$l"
        val touchedBuckets = affectedIds
          .select(pmod(col("id"), lit(GraphBuckets)).cast("int").as("b"))
          .unionByName(newEdges
            .select(pmod(col("src"), lit(GraphBuckets)).cast("int").as("b")))
          .distinct().collect().map(_.getInt(0)) // <= GraphBuckets
        val storedTouchedG = graft.core.ManifestTable
          .read(spark, gRoot).get
          .filter(col("bucket").isin(touchedBuckets.map(Integer.valueOf): _*))
          .select("src", "dst").localCheckpoint(true)
        val affStored = storedTouchedG
          .join(broadcast(affectedIds), storedTouchedG("src") === affectedIds("id"))
          .select(col("src"), col("dst"))
        val affStoredScored = Similarity.cosineCols(affStored
          .join(v.select(col("id").as("src"), col("v").as("qv"),
            col("nv").as("nq")), "src")
          .join(v.select(col("id").as("dst"), col("v"), col("nv")), "dst"))
          .select(col("src").as("query_id"), col("dst").as("id"), col("cos"))
        val affNewScored = scoredPairs
          .select(col("old_id").as("query_id"), col("new_id").as("id"), col("cos"))
        val affEdges = Similarity.rankTopK(
          affStoredScored.unionByName(affNewScored), kkOf)
          .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
        // commit: unaffected rows of touched buckets carry in-frame;
        // affected rows replaced; new rows appended — fenced per batch
        val unaffected = storedTouchedG
          .join(broadcast(affectedIds),
            storedTouchedG("src") === affectedIds("id"), "left_anti")
          .select("src", "dst")
        graft.core.ManifestTable.commit(spark, gRoot,
          unaffected.unionByName(affEdges).unionByName(newEdges)
            .withColumn("bucket",
              pmod(col("src"), lit(GraphBuckets)).cast("int")),
          "bucket", batchId)
      }
    }
  }

  /** Row-level DELETE from the stored pyramid (the [[graft.core
    * .Tombstones]] slot for the hierarchical artifact — closing D16's
    * takedown contract for this index family): post-delete searches must
    * equal searches over a pyramid REBUILT from the surviving corpus,
    * exactly. Graphs are rewritten physically; levels/bands rows are
    * tombstone-masked (every read applies the mask; graph rewrites are the
    * physical purge for the edge relation).
    *
    * Exactness argument (the absorb doc's mirror): a from-scratch build
    * derives each node's edges from its co-bucket candidates under
    * [[Dedup.capBuckets]]'s salting, which is a pure function of each
    * bucket's MEMBERSHIP. Deleting D changes membership only in buckets
    * holding a dead node, so:
    *
    *  - a surviving node whose stored top-k contains NO dead neighbor
    *    keeps its edges (removing non-top-k candidates can't promote
    *    anything past rank k);
    *  - an AFFECTED node (stored edge → dead dst) recomputes its top-k
    *    from its full co-bucket candidate set over the masked banding,
    *    salted by [[Dedup.capBuckets]] exactly as the survivor build
    *    would salt it;
    *  - a dead node's own rows (edges, band rows, level row) drop — an
    *    emptied graph bucket drops its manifest lines through the commit's
    *    declared-touched machinery.
    *
    * The one non-mergeable regime, as in [[absorb]]: a DEAD-containing
    * bucket over the cap was sub-salted at build time with a modulus
    * derived from its pre-delete size — a survivor rebuild would re-salt
    * it differently — so `delete` REFUSES loudly there (rebuild trigger).
    * Buckets without dead members keep their exact membership, so their
    * (possibly salted) candidate sets replay bit-identically at any size.
    *
    * `corpus` must be the SURVIVING vectors (post-delete frame — searches
    * take the same frame). Exactly-once per `batchId` through the graph
    * manifests' fence (the tombstone add is idempotent by value); level 0
    * commits LAST, so its fence implies the whole delete landed.
    *
    * Scale shape: O(delete-neighborhood) — dead band rows by broadcast
    * semi-join, affected srcs from the ≤ GraphBuckets graph partitions
    * holding dead-or-co-bucket ids, recompute bounded by the affected
    * nodes' bucket volume (≤ cap per bucket per band); the corpus never
    * self-joins.
    */
  def delete(
      spark: SparkSession,
      path: String,
      corpus: DataFrame,
      deleteIds: DataFrame,
      batchId: Long,
      idCol: String = "id"): Unit = {
    require(batchId >= 1, "delete batch ids start at 1 (build is batch 0)")
    graft.functions.GraftFunctions.register(spark)
    val meta = spark.read.parquet(s"$path/meta").head()
    val maxLevel = meta.getAs[Int]("max_level")
    val bucketCap = meta.getAs[Int]("bucket_cap")
    if (graft.core.ManifestTable.lastBatch(
        spark, s"$path/graph/level=0") >= batchId) return // redelivery
    val dead = deleteIds.select(col(idCol).cast("long").as("id")).distinct()
      .localCheckpoint(true)
    if (dead.isEmpty) return
    // mask FIRST (idempotent by value): a crash before the graph rewrite
    // leaves searches dead-free through the masks; the fence (level 0
    // still below batchId) redelivers the rewrite
    graft.core.Tombstones.add(spark, path, dead, "id", s"d$batchId")
    // corpus norms attached ONCE (Similarity.withNorm discipline): the
    // rewrite's scoring join otherwise recomputes both norms per scored
    // pair; bit-identical cos
    val v = Similarity.withNorm(Similarity.asVectors(corpus))
    // Per-level rewrites OVERLAPPED (optimization guide §2.6): each level
    // reads and commits only its own bands/graph roots, so the upper
    // levels run concurrently on a transient pool and level 0 — the fence
    // whose commit implies the whole delete landed — runs strictly AFTER
    // every upper level succeeded. Crash/failure semantics are unchanged:
    // in the sequential loop a failing level left some upper levels
    // committed and level 0 uncommitted (fence redelivers); the parallel
    // form leaves exactly the same observable states.
    def rewriteLevel(l: Int): Unit = {
      val kk = if (l == 0) meta.getAs[Int]("graph_k")
        else meta.getAs[Int]("graph_k_upper")
      val bandsRaw = spark.read.parquet(s"$path/bands/level=$l")
        .select("id", "band", "key")
      val deadBand = bandsRaw.join(broadcast(dead), Seq("id"))
        .localCheckpoint(true)
      if (!deadBand.isEmpty) {
        val deadL = deadBand.select("id").distinct().localCheckpoint(true)
        val touchedKeys = deadBand.select("band", "key").distinct()
          .localCheckpoint(true)
        // cap regime check on PRE-delete sizes: an over-cap dead bucket
        // was salted with a modulus a survivor rebuild won't reproduce
        val over = bandsRaw
          .join(broadcast(touchedKeys), Seq("band", "key"))
          .groupBy("band", "key").agg(count(lit(1)).as("n"))
          .filter(col("n") > bucketCap)
          .limit(1).collect()
        if (over.nonEmpty)
          throw new IllegalStateException(
            s"hierarchical index at $path: bucket (band=${over.head.get(0)}, " +
              s"key=${over.head.get(1)}) holds ${over.head.getLong(2)} " +
              s"members > bucketCap=$bucketCap and contains a deleted node " +
              "— its build-time sub-salting is not reconstructible after " +
              "removal; REBUILD the pyramid from the surviving corpus")
        val live = graft.core.Tombstones.filterLive(bandsRaw, path, "id")
          .localCheckpoint(true)
        // co-bucket survivors of dead nodes: every possibly-affected src
        val coSurv = live.join(broadcast(touchedKeys), Seq("band", "key"))
          .select("id").distinct()
        val gRoot = s"$path/graph/level=$l"
        val touchedBuckets = coSurv.unionByName(deadL)
          .select(pmod(col("id"), lit(GraphBuckets)).cast("int").as("b"))
          .distinct().collect().map(_.getInt(0)) // <= GraphBuckets
        val storedG = graft.core.ManifestTable.read(spark, gRoot).get
          .filter(col("bucket").isin(touchedBuckets.map(Integer.valueOf): _*))
          .select("src", "dst").localCheckpoint(true)
        // affected = survivors whose stored top-k cites a dead neighbor
        val affected = storedG
          .join(broadcast(deadL), storedG("dst") === deadL("id"))
          .select("src").distinct()
          .join(broadcast(deadL), col("src") === deadL("id"), "left_anti")
          .select(col("src").as("id")).localCheckpoint(true)
        // recompute their top-k over the FULL masked candidate set, salted
        // exactly as a survivor build would ([[Dedup.capBuckets]] is a
        // pure function of bucket membership; only whole buckets enter)
        val affKeys = live.join(broadcast(affected), Seq("id"))
          .select("band", "key").distinct().localCheckpoint(true)
        val affBand = live.join(broadcast(affKeys), Seq("band", "key"))
        val banded = Dedup.capBuckets(affBand, bucketCap)
        val pairs = banded
          .select(col("id").as("query_id"), col("band"), col("key"))
          .join(banded.select(col("id"), col("band"), col("key")),
            Seq("band", "key"))
          .filter(col("id") =!= col("query_id"))
          .select("query_id", "id")
          .distinct()
          .join(broadcast(affected.select(col("id").as("query_id"))),
            Seq("query_id"))
        val scored = Similarity.cosineCols(pairs
          .join(v, "id")
          .join(v.select(col("id").as("query_id"), col("v").as("qv"),
            col("nv").as("nq")), "query_id"))
        val newEdges = Similarity.rankTopK(scored, kk)
          .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
        // commit: unaffected survivors' rows carry in-frame, affected rows
        // replaced, dead srcs dropped — every touched bucket DECLARED so a
        // fully-dead bucket drops its lines
        val unaffected = storedG
          .join(broadcast(deadL), storedG("src") === deadL("id"), "left_anti")
          .join(broadcast(affected), storedG("src") === affected("id"),
            "left_anti")
          .select("src", "dst")
        graft.core.ManifestTable.commit(spark, gRoot,
          unaffected.unionByName(newEdges)
            .withColumn("bucket",
              pmod(col("src"), lit(GraphBuckets)).cast("int")),
          "bucket", batchId,
          touchedValues = touchedBuckets.sorted.map(_.toString).toSeq)
      }
    }
    if (maxLevel >= 2) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(4, maxLevel))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      try
        ((maxLevel - 1) to 1 by -1)
          .map(l => Future(rewriteLevel(l)))
          .foreach(Await.result(_, Duration.Inf))
      finally pool.shutdown()
    }
    rewriteLevel(0) // the fence: commits last, implying the whole delete
  }

  /** OPTIMIZE the stored pyramid's append-side relations: fold the
    * accumulated per-batch `batch=` partitions of `levels` and each
    * layer's `bands` into one consolidated partition
    * ([[graft.core.IndexOptimize]] — ~128 MB files, crash-safe marker,
    * absorb retries stay exactly-once via the graph-manifest fence), and
    * drop [[delete]]-tombstoned rows PHYSICALLY in the same pass, clearing
    * the mask last — after which searches pay zero mask cost again (the
    * graphs are already physically clean; they rewrite in place at
    * [[delete]] and need no fold: a declared-touched commit replaces whole
    * buckets). Same single-writer contract as every other maintenance
    * call: run from the index's own loop, never concurrent with an
    * in-flight absorb/delete.
    *
    * REDEMPTION fence: a [[delete]] masks FIRST and commits its graph
    * rewrite last (level 0 carries the fence), so a crash in between
    * leaves a mask whose rewrite never landed. Absorbing THAT mask here
    * would purge the dead band rows and clear the list — the replayed
    * delete then finds no dead bands, never rewrites the graphs, and the
    * dead edges outlive their mask permanently. The fold therefore checks
    * every recorded delete-batch id against the level-0 fence and, while
    * any is unredeemed, folds the FILE LAYOUT only (mask kept, rows kept):
    * searches stay masked-correct, the redelivered delete still finds its
    * dead bands, and the next post-redemption fold purges as usual
    * (spec-pinned crash sequence in HierarchicalIndexSpec).
    */
  def optimize(
      spark: SparkSession,
      path: String): Seq[graft.core.IndexOptimize.RelOptStats] = {
    val maxLevel = spark.read.parquet(s"$path/meta").head()
      .getAs[Int]("max_level")
    val fence = graft.core.ManifestTable.lastBatch(spark, s"$path/graph/level=0")
    val unredeemed = graft.core.Tombstones.batchIds(spark, path)
      .flatMap(id => "^d(\\d+)$".r.findFirstMatchIn(id).map(_.group(1).toLong))
      .exists(_ > fence)
    graft.core.IndexOptimize.optimize(
      spark, path,
      "levels" +: (0 until maxLevel).map(l => s"bands/level=$l"),
      tombstoneIdCol = if (unredeemed) None else Some("id"))
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
    // deleted nodes mask out of every per-row relation BEFORE candidate
    // selection (the d16 convention): post-[[delete]] the graph is already
    // physically clean, so the masks are no-op pass-throughs; mid-crash
    // (tombstones added, rewrite not yet landed) they keep results
    // dead-free until the fence redelivers the rewrite. The tombstone set
    // is read ONCE per search (it feeds one levels mask + two per graph
    // level — seven lazy reads would re-list and re-scan it each time)
    val tomb = graft.core.Tombstones.read(spark, path)
      .map(_.localCheckpoint(true))
    def mask(df: DataFrame, c: String): DataFrame = tomb match {
      case None => df
      case Some(ts) => df.join(broadcast(ts), df(c) === ts("id"), "left_anti")
    }
    val levels = mask(
      spark.read.parquet(s"$path/levels").select("id", "level"), "id")
    def graphAt(l: Int): DataFrame = {
      val out = mask(mask(
        graft.core.ManifestTable
          .read(spark, s"$path/graph/level=$l")
          .getOrElse(throw new IllegalStateException(
            s"no graph committed at $path/graph/level=$l — build first"))
          .select("src", "dst"), "src"), "dst")
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
      bits: Int = 0,
      bands: Int = 18,
      dim: Int = 64,
      entryK: Int = 8,
      beamWidth: Int = 15,
      rounds: Int = 2): (DataFrame, Long) = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val v = Similarity.asVectors(embeddings)
    // the SAME width law as [[build]] (n anchored to the full corpus, per
    // layer n >> 4l) — NOT knnGraph's own bits=0 resolution, which would
    // consult each layer's actual member count instead
    val n = if (bits != 0) 0L else v.count()
    val levels = v.select(col("id"), levelCol(maxLevel)).localCheckpoint(true)
    def graphAt(l: Int): DataFrame = {
      val members = levels.filter(col("level") >= l).select("id")
      val kk = if (l == 0) graphK else graphKUpper
      val out = Similarity.knnGraph(
        embeddings.join(members, embeddings("vec_id") === members("id")).drop("id"),
        kk, layerBits(bits, bands, n, l), bands, dim)
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
    // norms hoisted above the scoring joins (Similarity.withNorm): one dot
    // per scored candidate instead of three, bit-identical cos
    val v = Similarity.withNorm(Similarity.asVectors(embeddings))
    val q = broadcast(
      v.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"), col("v").as("qv"),
          col("nv").as("nq")))
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
    // base layer: the K6 rounds at full beam width — ONE graph frame
    // reused across rounds (a fresh graphAt(0) per round would re-read
    // the manifest and re-list the bucket files each time)
    val g0 = graphAt(0)
    for (_ <- 1 to rounds)
      visited = expandRound(visited, g0, beamWidth)
    (Similarity.rankTopK(visited, k), visited.count())
  }
}
