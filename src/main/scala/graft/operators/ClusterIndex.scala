package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** ST19: PERSISTED dedup-cluster state with O(delta) incremental
  * maintenance — the missing third leg of the streamed dedup loop. ST11
  * keeps the pair INDEX current per micro-batch, but cluster assignment
  * (D7/D13) was batch-only: every arriving document forced a full CC
  * recompute over all pairs. This object maintains the assignment itself
  * incrementally — distributed union-find split into two relations, both
  * committed through the [[graft.core.ManifestTable]] protocol (atomic
  * multi-bucket rewrites, batch-id fence):
  *
  *  - `members` (id, rep): APPEND-ONLY — one row per document, written once
  *    at its arrival batch with `rep` = its component's min-label AT THAT
  *    TIME, never rewritten. Bucketed by pmod(id), so the per-batch
  *    endpoint-label lookup reads only the buckets containing the delta's
  *    pair endpoints — never a corpus scan.
  *  - `reps` (old_rep, cur_label): the union-find FOREST — one row per
  *    SUPERSEDED label, kept fully path-compressed (every row points
  *    directly at a current component min; the per-batch compression
  *    touches only rows whose target was remapped this batch, found via
  *    pmod(cur_label) bucket pruning). Size is bounded by the number of
  *    merge events, not by corpus size.
  *
  * Per batch, [[mergeBatch]]: delta pairs from the stored MinHash index
  * (O(delta) — [[Dedup.incrementalFromIndex]]), endpoint labels from
  * bucket-pruned members + the reps map, then CC over the CONDENSED graph
  * (nodes = current component labels of the delta's endpoints, edges =
  * delta pairs mapped through labels) — correct because stored labels are
  * component minima (the D7 contract): the min over merged old minima IS
  * the merged component's min, so condensed CC produces exactly the labels
  * batch CC over all pairs would (spec-pinned under ≥2 batch geometries).
  * The condensed graph is delta-neighborhood-sized; nothing in the merge
  * path scales with the corpus.
  *
  * Exactly-once: both relations commit under the manifest's batch-id fence;
  * `members` commits FIRST. Every crash ordering re-converges on retry
  * (argued at [[mergeBatch]]); duplicate delta edges (a retried batch
  * re-deriving pairs already absorbed) are harmless — CC is idempotent in
  * its edge set. Doc ids must be globally unique across batches (the same
  * ingest contract as the pair index).
  *
  * Reference scope: clustering semantics mirror the D7 surface
  * (`backend/main.py` has no dedup; SURVEY §2.5 extension family D).
  */
object ClusterIndex {

  val DefaultBuckets = 32

  private val membersSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("rep", LongType),
    StructField("bucket", IntegerType)))

  private val repsSchema = StructType(Seq(
    StructField("old_rep", LongType),
    StructField("cur_label", LongType),
    StructField("bucket", IntegerType)))

  private def empty(s: SparkSession, schema: StructType): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)

  /** Current cluster assignment — the D7 output contract
    * (id, cluster_id, is_survivor): members resolved through the
    * path-compressed forest in ONE join (no iteration at read time — the
    * per-batch compression is what buys this).
    */
  def labels(spark: SparkSession, root: String): DataFrame = {
    val members = graft.core.ManifestTable.read(spark, s"$root/members")
      .getOrElse(throw new IllegalStateException(
        s"no cluster state at $root — run mergeBatch first"))
      .select("id", "rep")
    val reps = graft.core.ManifestTable.read(spark, s"$root/reps")
      .map(_.select("old_rep", "cur_label"))
      .getOrElse(empty(spark, repsSchema).select("old_rep", "cur_label"))
    members
      .join(reps.withColumnRenamed("old_rep", "rep"), Seq("rep"), "left")
      .select(
        col("id"),
        coalesce(col("cur_label"), col("rep")).as("cluster_id"))
      .withColumn("is_survivor",
        (col("id") === col("cluster_id")).cast("int"))
  }

  /** Absorb one document micro-batch: delta pairs against the stored
    * MinHash index at `index` (which this call also maintains —
    * [[Dedup.appendToIndex]] under the same batch id), then fold the pairs
    * into the persisted cluster state at `root`.
    *
    * Crash/retry matrix (foreachBatch is at-least-once): pair derivation
    * and index absorb are idempotent (scoped-overwrite partitions; a batch
    * already absorbed re-derives the same pairs, and duplicate edges do not
    * change CC). If `members` committed but `reps` did not, the retry's
    * lookups see the old labels (reps unchanged), re-derive the same
    * remap, the members commit no-ops on its fence and the reps commit
    * completes — state converges to exactly the one-crash-free outcome.
    */
  /** Row-level DELETE from the persisted cluster state (D18 — the
    * takedown path for the one stateful artifact U9/D16/D17 didn't reach):
    * post-delete [[labels]] must equal batch CC over the SURVIVING corpus,
    * exactly. Deleting a document can both RELABEL its component (the dead
    * doc was the min id) and SPLIT it (the dead doc was a cut vertex), so
    * affected components re-cluster from real pair evidence:
    *
    *  1. the dead ids tombstone out of the MinHash pair index
    *     ([[Dedup.deleteFromIndex]]) — future [[mergeBatch]] pair
    *     derivations never resurrect a dead endpoint;
    *  2. AFFECTED components (those holding a dead doc) are found from the
    *     dead ids' labels; their labels persist to `_delete/batch=d<id>`
    *     BEFORE any state commit (the crash anchor — see retry matrix);
    *  3. surviving members of affected components re-cluster over
    *     [[Dedup.pairsAmongFromIndex]] (stored bands/sets only — no text,
    *     no corpus scan; pairs BETWEEN an affected component and the rest
    *     of the corpus cannot exist, else they'd be one component) and
    *     their member rows rewrite with rep = new component min, through
    *     the declared-touched manifest commit (dead rows drop, a
    *     fully-dead bucket drops its lines);
    *  4. the forest drops every row pointing at an affected label
    *     (`cur_label` ∈ deadLabels): affected members now hold DIRECT
    *     labels, and a stale row could alias a surviving id that becomes
    *     a label after a split (old_rep = new label) — the one geometry
    *     that would corrupt reads.
    *
    * Invariant preserved for future merges: every member's resolved label
    * is its component's min surviving id, and new labels have no forest
    * rows — exactly the state a from-scratch replay over survivors
    * produces (spec-pinned, relabel + split + cut-vertex geometries).
    *
    * Retry matrix (commit order: _delete staging, members, reps; the REPS
    * fence is the completion marker): crash before staging → full rerun
    * from intact pre-state; after staging → rerun recomputes the same
    * deadLabels (scoped overwrite, idempotent); after members commit →
    * the rerun cannot re-derive deadLabels (dead member rows are gone) so
    * it READS the staged relation, skips the fenced members commit, and
    * completes the forest drop; after reps commit → fence no-op.
    *
    * Scale shape: dead-label lookup is bucket-pruned point reads; the ONE
    * corpus-wide touch is a column-pruned (id, rep) scan of `members` to
    * enumerate affected components — the same cost class as a [[labels]]
    * read; re-clustering is bounded by affected component sizes, the
    * rewrite by their buckets.
    */
  def delete(
      index: String,
      root: String,
      ids: DataFrame,
      batchId: Long,
      nBuckets: Int = DefaultBuckets,
      idCol: String = "doc_id",
      threshold: Double = 0.6): Unit = {
    val s = ids.sparkSession
    val mLast = graft.core.ManifestTable.lastBatch(s, s"$root/members")
    val rLast = graft.core.ManifestTable.lastBatch(s, s"$root/reps")
    require(mLast >= 0, s"no cluster state at $root — run mergeBatch first")
    if (mLast >= batchId && rLast >= batchId) { // redelivery
      sweepDeleteAnchors(s, root)
      return
    }
    val dead = ids.select(col(idCol).cast("long").as("id")).distinct()
      .localCheckpoint(true)
    if (dead.isEmpty) return

    // 1. pair-index tombstones (idempotent by value)
    Dedup.deleteFromIndex(s, index, dead, "id", s"d$batchId")

    val stagePath = s"$root/_delete/batch=d$batchId"
    val repsPrev = graft.core.ManifestTable.read(s, s"$root/reps")
    val repsMap = repsPrev.map(_.select("old_rep", "cur_label"))
      .getOrElse(empty(s, repsSchema).select("old_rep", "cur_label"))
    val stageP = new org.apache.hadoop.fs.Path(stagePath)
    val staged = stageP
      .getFileSystem(s.sparkContext.hadoopConfiguration).exists(stageP)
    val deadLabels: DataFrame = if (mLast >= batchId) {
      // members landed on a previous attempt: the dead rows are gone —
      // the staged relation is the only witness of what was affected.
      // Without a stage, this batch id belonged to an INGEST commit
      // (merge-free batches leave the reps fence behind the members
      // fence) — refuse rather than misread the fences as a retry.
      require(staged,
        s"delete batch $batchId at $root: members fence is at $mLast with " +
          "no staged _delete relation — this batch id was used by an " +
          "ingest; pick one above the members fence")
      s.read.parquet(stagePath).select("label").localCheckpoint(true)
    } else {
      val members = graft.core.ManifestTable.read(s, s"$root/members").get
      // 2. affected labels from the dead ids (bucket-pruned point reads),
      //    staged before any commit
      val deadBuckets = dead
        .select(pmod(col("id"), lit(nBuckets)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0))
      val labs = members
        .filter(col("bucket").isin(deadBuckets.map(Integer.valueOf): _*))
        .join(broadcast(dead), Seq("id"))
        .select(col("rep"))
        .join(repsMap.withColumnRenamed("old_rep", "rep"), Seq("rep"), "left")
        .select(coalesce(col("cur_label"), col("rep")).as("label"))
        .distinct().localCheckpoint(true)
      labs.write.mode("overwrite").parquet(stagePath)
      s.catalog.refreshByPath(s"$root/_delete")
      if (labs.isEmpty) return // nothing indexed: state untouched

      // 3. re-cluster affected components' survivors from the stored index
      val affected = members
        .join(repsMap.withColumnRenamed("old_rep", "rep"), Seq("rep"), "left")
        .select(col("id"), col("bucket"),
          coalesce(col("cur_label"), col("rep")).as("label"))
        .join(broadcast(labs), Seq("label"))
        .localCheckpoint(true)
      val survivors = affected
        .join(broadcast(dead), Seq("id"), "left_anti")
        .localCheckpoint(true)
      val pairs = Dedup.pairsAmongFromIndex(
        s, index, survivors.select("id"), "id", threshold)
        .select("a_id", "b_id")
      val cc = Dedup.clusters(survivors.select("id"), pairs)
        .select(col("id"), col("cluster_id"))
      val newMembers = survivors.select("id")
        .join(cc, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("cluster_id"), col("id")).as("rep"),
          pmod(col("id"), lit(nBuckets)).cast("int").as("bucket"))
      val mBuckets = affected.select("bucket").distinct()
        .collect().map(_.getInt(0))
      val prevInTouched = members
        .filter(col("bucket").isin(mBuckets.map(Integer.valueOf): _*))
        .join(broadcast(affected.select("id")), Seq("id"), "left_anti")
        .select("id", "rep", "bucket")
      graft.core.ManifestTable.commit(
        s, s"$root/members", prevInTouched.unionByName(newMembers),
        "bucket", batchId,
        touchedValues = mBuckets.sorted.map(_.toString).toSeq)
      labs
    }

    // 4. forest drop: every row pointing at an affected label goes (the
    //    rewritten members hold direct labels; keeping a stale row would
    //    alias any survivor that became a label in a split)
    if (repsPrev.isDefined && rLast < batchId) {
      val reps = repsPrev.get.select("old_rep", "cur_label", "bucket")
      val dropping = reps
        .join(broadcast(deadLabels.withColumnRenamed("label", "cur_label")),
          Seq("cur_label"))
      val rBuckets = dropping.select("bucket").distinct()
        .collect().map(_.getInt(0))
      if (rBuckets.nonEmpty) {
        val kept = reps
          .filter(col("bucket").isin(rBuckets.map(Integer.valueOf): _*))
          .join(broadcast(deadLabels.withColumnRenamed("label", "cur_label")),
            Seq("cur_label"), "left_anti")
          .select("old_rep", "cur_label", "bucket")
        graft.core.ManifestTable.commit(
          s, s"$root/reps", kept, "bucket", batchId,
          touchedValues = rBuckets.sorted.map(_.toString).toSeq)
      } else {
        // no forest row points at an affected label — still ADVANCE the
        // reps fence (an empty-touched commit carries every line): a
        // completed delete must satisfy the redelivery fast path, and the
        // anchor sweep below keys off the completed fence
        graft.core.ManifestTable.commit(
          s, s"$root/reps", reps.limit(0), "bucket", batchId)
      }
    }
    sweepDeleteAnchors(s, root)
  }

  /** Retention for the `_delete/batch=d<id>` crash anchors: an anchor is
    * only needed while its delete may still RETRY — i.e. until both the
    * members and reps fences pass its batch id (the same condition the
    * redelivery fast path checks). Anchors STRICTLY below min(fences)
    * can never be read again and sweep here; the latest fenced anchor is
    * deliberately kept as the redelivery witness (a late retry arriving
    * after an operator restored pre-delete state must still find it), so
    * debris is bounded at ONE anchor per artifact instead of one per
    * delete batch forever.
    */
  private def sweepDeleteAnchors(s: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$root/_delete")
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return
    val fence = math.min(
      graft.core.ManifestTable.lastBatch(s, s"$root/members"),
      graft.core.ManifestTable.lastBatch(s, s"$root/reps"))
    var swept = false
    f.listStatus(p).foreach { st =>
      "^batch=d(\\d+)$".r.findFirstMatchIn(st.getPath.getName).foreach { m =>
        if (m.group(1).toLong < fence) {
          f.delete(st.getPath, true); swept = true
        }
      }
    }
    if (swept) s.catalog.refreshByPath(s"$root/_delete")
  }

  def mergeBatch(
      index: String,
      root: String,
      batch: DataFrame,
      batchId: Long,
      nBuckets: Int = DefaultBuckets,
      textCol: String = "text",
      idCol: String = "doc_id",
      threshold: Double = 0.6,
      shingleWords: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val s = batch.sparkSession
    // an empty micro-batch (a file-source tail tick) has nothing to merge,
    // and committing a ZERO-FILE manifest version would leave a state the
    // schema-inferring reader cannot open — skip entirely
    if (batch.isEmpty) return

    // 1. delta pairs BEFORE the index absorb: batch×corpus + batch×batch
    //    (the d9 contract — the union across arrival order is the full
    //    pair set, each pair surfacing when its later endpoint arrives)
    // Hadoop FS, not java.io.File: the index lives on whatever filesystem
    // the ManifestTable commits target — a local-only probe would read
    // false forever on HDFS/object stores and silently degrade every
    // batch to batch×batch pairs, dropping all batch×corpus edges
    val setsPath = new org.apache.hadoop.fs.Path(s"$index/sets")
    val indexed = setsPath
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(setsPath)
    val pairs = (if (indexed)
      Dedup.incrementalFromIndex(s, index, batch, textCol, idCol,
        threshold, shingleWords, numHashes, bands)
    else
      Dedup.minHashNearDup(batch, textCol, idCol,
        threshold, shingleWords, numHashes, bands))
      .select(col("a_id"), col("b_id"))
      .localCheckpoint(true) // delta-neighborhood-bounded

    // 2. index absorb (idempotent per batch id)
    Dedup.appendToIndex(index, batch, s"b$batchId", textCol, idCol,
      shingleWords, numHashes, bands)

    // 3. endpoint labels: members lookup pruned to the endpoints' id
    //    buckets, then the (small) forest applied; an id absent from
    //    members is a batch arrival whose label is itself
    val epIds = pairs.select(col("a_id").as("id"))
      .unionByName(pairs.select(col("b_id").as("id")))
      .distinct().localCheckpoint(true)
    val epBuckets = epIds
      .select(pmod(col("id"), lit(nBuckets)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)) // <= nBuckets
    val membersPrev = graft.core.ManifestTable.read(s, s"$root/members")
    val epMembers = membersPrev match {
      case Some(m) =>
        m.filter(col("bucket").isin(epBuckets.map(Integer.valueOf): _*))
          .join(broadcast(epIds), Seq("id"))
          .select(col("id"), col("rep"))
      case None => empty(s, membersSchema).select("id", "rep")
    }
    val repsPrev = graft.core.ManifestTable.read(s, s"$root/reps")
    val repsMap = repsPrev.map(_.select("old_rep", "cur_label"))
      .getOrElse(empty(s, repsSchema).select("old_rep", "cur_label"))
    val epLabeled = epIds
      .join(epMembers, Seq("id"), "left")
      .select(col("id"), coalesce(col("rep"), col("id")).as("rep"))
      .join(repsMap.withColumnRenamed("old_rep", "rep"), Seq("rep"), "left")
      .select(col("id"), coalesce(col("cur_label"), col("rep")).as("label"))
      .localCheckpoint(true)

    // 4. condensed CC: delta edges mapped through current labels; the min
    //    over merged component minima is the merged minimum, so this small
    //    graph's CC equals full-graph CC restricted to touched components
    val edges = pairs
      .join(epLabeled.select(col("id").as("a_id"), col("label").as("la")), Seq("a_id"))
      .join(epLabeled.select(col("id").as("b_id"), col("label").as("lb")), Seq("b_id"))
      .select(col("la").as("a_id"), col("lb").as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
    val vtx = edges.select(col("a_id").as("id"))
      .unionByName(edges.select(col("b_id").as("id")))
      .distinct()
    val cc = Dedup.clusters(vtx, edges)
      .select(col("id"), col("cluster_id"))
      .localCheckpoint(true)
    val remap = cc.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("old_label"), col("cluster_id").as("new_label"))
      .localCheckpoint(true) // bounded by merge events this batch

    // 5. members commit FIRST (fence order argued in the scaladoc): new
    //    arrivals insert with rep = their condensed label (self if no pair)
    val batchIds = batch.select(col(idCol).cast("long").as("id"))
      .distinct().localCheckpoint(true)
    val newMembers = batchIds
      .join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("rep"),
        pmod(col("id"), lit(nBuckets)).cast("int").as("bucket"))
    val mBuckets = newMembers.select("bucket").distinct()
      .collect().map(_.getInt(0))
    val prevInTouched = membersPrev match {
      case Some(m) =>
        m.filter(col("bucket").isin(mBuckets.map(Integer.valueOf): _*))
          .select("id", "rep", "bucket")
      case None => empty(s, membersSchema)
    }
    graft.core.ManifestTable.commit(
      s, s"$root/members", prevInTouched.unionByName(newMembers),
      "bucket", batchId)

    // 6. reps commit: compress entries whose target was remapped (found by
    //    pmod(cur_label) bucket pruning) and add this batch's supersessions
    //    — EXCLUDING brand-new ids that lost immediately (no member outside
    //    this batch can reference a new id as rep, and this batch's members
    //    already point at the merged label directly)
    val newReps = remap
      .join(batchIds.withColumnRenamed("id", "old_label"), Seq("old_label"), "left_anti")
    val rBuckets = remap
      .select(pmod(col("old_label"), lit(nBuckets)).cast("int").as("b"))
      .unionByName(remap
        .select(pmod(col("new_label"), lit(nBuckets)).cast("int").as("b")))
      .distinct().collect().map(_.getInt(0))
    // remap empty => no supersessions and nothing to compress: skip the
    // commit entirely (the fence tolerates gaps — ids must only ascend)
    if (rBuckets.nonEmpty) {
      val prevR = repsPrev match {
        case Some(r) =>
          r.filter(col("bucket").isin(rBuckets.map(Integer.valueOf): _*))
            .select("old_rep", "cur_label")
        case None => empty(s, repsSchema).select("old_rep", "cur_label")
      }
      val compressed = prevR
        .join(remap.withColumnRenamed("old_label", "cur_label"), Seq("cur_label"), "left")
        .select(col("old_rep"),
          coalesce(col("new_label"), col("cur_label")).as("cur_label"))
      val outReps = compressed
        .unionByName(newReps
          .select(col("old_label").as("old_rep"), col("new_label").as("cur_label")))
        .withColumn("bucket", pmod(col("cur_label"), lit(nBuckets)).cast("int"))
        .localCheckpoint(true)
      // all of this batch's supersessions can be brand-new ids nobody
      // references (their members rows already point at the merged label
      // directly) — an empty forest needs no commit (outReps empty implies
      // prevR was empty too, so the skipped buckets hold no stale lines),
      // and a zero-file manifest version would break the schema-inferring
      // reader. When we DO commit, every rBuckets bucket is DECLARED
      // touched: compression migrates rows to pmod(new cur_label), and a
      // bucket emptied by that migration would otherwise appear in no
      // output row, be derived "untouched", and carry its stale
      // (old_rep, superseded_label) line forward — the multi-stage
      // decreasing-min merge-chain corruption the 3-batch regression spec
      // pins.
      if (!outReps.isEmpty)
        graft.core.ManifestTable.commit(
          s, s"$root/reps", outReps, "bucket", batchId,
          touchedValues = rBuckets.map(_.toString).toSeq)
    }
  }
}
