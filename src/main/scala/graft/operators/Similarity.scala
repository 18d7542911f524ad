package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (LLM-pipeline north star,
  * SURVEY.md §7.4): exact brute-force cosine top-k as the correctness
  * baseline, and an LSH-bucketed approximate variant as the scale path.
  *
  * Scale shapes:
  *  - the query side is always tiny and BROADCAST — scoring is a map-only
  *    pass over the corpus, no shuffle of corpus vectors;
  *  - cosine is computed with higher-order functions (`zip_with` +
  *    `aggregate`) over array<double> — no UDF, stays inside codegen'd
  *    projections except the lambda bodies;
  *  - the final top-k ranks |corpus| x |queries| scored rows in the exact
  *    variant (fine when |queries| is small) but only the LSH candidate set
  *    in [[annTopKCosine]] — that bound is what survives a 100 TB corpus.
  */
object Similarity {

  /** Normalize the raw embeddings table to (id, v: array<double>). */
  def asVectors(embeddings: DataFrame, idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    embeddings.select(
      col(idCol).as("id"),
      expr(s"transform($embCol, x -> CAST(x AS DOUBLE))").as("v"))

  /** Cosine via the native [[graft.functions.DotProduct]] expression —
    * bit-identical to the HOF `aggregate(zip_with(...))` fold (same
    * ascending accumulation) but codegen'd as a primitive loop.
    */
  private[operators] def cosineCols(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // NORM HOISTING (optimization round 21): when the caller has already
    // attached `nv`/`nq` (via [[withNorm]], computed ONCE per vector before
    // the pair join), reuse it — the default recomputes both norms PER
    // SCORED PAIR, which for a pair-generation stage emitting millions of
    // candidate rows triples the dot-product work of the hottest stage.
    // Same expression over the same doubles, so `cos` is bit-identical.
    val withDot = df.withColumn("dot", expr("graft_dot(v, qv)"))
    val withNv =
      if (df.columns.contains("nv")) withDot
      else withDot.withColumn("nv", expr("sqrt(graft_dot(v, v))"))
    val withNq =
      if (df.columns.contains("nq")) withNv
      else withNv.withColumn("nq", expr("sqrt(graft_dot(qv, qv))"))
    withNq.withColumn("cos", col("dot") / (col("nv") * col("nq")))
  }

  /** The corpus-vector frame with its cosine norm attached ONCE per vector
    * — `sqrt(graft_dot(v, v))`, the exact subexpression [[cosineCols]]
    * derives per pair when absent, so hoisting it above a pair join leaves
    * every downstream `cos` bit-identical while cutting the per-pair dot
    * products from three to one.
    */
  private[operators] def withNorm(v: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(v.sparkSession)
    v.withColumn("nv", expr("sqrt(graft_dot(v, v))"))
  }

  /** Explicit width for a band-bucket pair-generation self-join. The
    * exchange feeding such a join carries FEW BYTES (band keys) but its
    * output explodes quadratically per bucket, so byte-based sizing — AQE
    * coalescing, or a localCheckpoint that materialized at one tiny
    * partition — happily schedules millions of candidate pairs onto a
    * single task (measured on k5 at sf0.1: one 3.1 s task emitting 2.7 M
    * pairs while 31 cores idled). Width therefore derives from the ROW
    * count (~`targetRows` band rows per task, their pair fan-out bounded
    * by the bucket cap), clamped to the session's shuffle width so at
    * 100 TB the join simply uses the cluster's own parallelism.
    */
  private[operators] def pairJoinWidth(
      s: org.apache.spark.sql.SparkSession,
      bandRows: Long,
      targetRows: Long = 2048L): Int = {
    val byRows = math.max(1L, (bandRows + targetRows - 1) / targetRows)
    math.min(
      math.max(1, s.sessionState.conf.numShufflePartitions).toLong,
      byRows).toInt
  }

  /** Widen a NARROW source scan to the session's parallelism before a
    * compute-heavy per-row kernel (shingle/minhash, codec decode→hash,
    * dequantize, tokenize): a small table stored as a single-row-group
    * parquet file plans a 1-2 task scan, so the kernel serializes on one
    * core while the rest idle — guide §2.5's unsplittable-input case
    * ("repartition immediately after the read"), measured on the bench
    * tables (e.g. the bm25 tokenize ran 3 × 0.6 s single-task stages).
    * The repartition is CONDITIONAL on the planned split count, so a
    * production-scale scan (splits ≥ parallelism) is untouched — no added
    * exchange at 100 TB, where shuffling the corpus to "spread" it would
    * be exactly the wrong trade. Row-to-partition assignment stays
    * deterministic (sortBeforeRepartition, on by default) and every gated
    * value is partitioning-independent by construction (integer-exact
    * arithmetic; the dual-CPUS verify/bench already vary partitioning).
    *
    * Call ONLY on scan-shaped inputs (scans, unions/projections/filters
    * of scans — no exchange upstream): `.rdd` on an adaptive plan with
    * exchanges would eagerly execute its query stages.
    */
  private[operators] def spreadNarrowScan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Rank scored (query_id, id, cos) rows to per-query top-k via the
    * bounded [[graft.functions.TopKByScore]] aggregate: per-partition
    * k-heaps combine map-side, the shuffle carries one ≤k buffer per
    * (partition, query), and the k winners unfold with `posexplode` — rank
    * = array position. The `row_number()` window this replaces shuffled ALL
    * scored rows into one partition per query and sorted an entire corpus
    * in a single task (the round-6 scale flag on k1); same deterministic
    * (cos desc, id asc) order, no global per-group sort anywhere.
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(scored.sparkSession)
    scored
      .groupBy("query_id")
      .agg(expr(s"graft_topk(cos, id, $k)").as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(
        col("query_id"), col("e.id").as("neighbor_id"),
        round(col("e.score"), 6).as("cosine"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Exact top-k by cosine for each query vector (identified by id): the
    * brute-force baseline every ANN variant is measured against. Ties broken
    * on neighbor id for a deterministic ranking. Scoring is a map-only pass
    * over the corpus (queries broadcast); ranking is the bounded top-k
    * aggregate — no stage ever holds more than k rows per query.
    */
  def topKCosine(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10): DataFrame = {
    // norms hoisted above the scoring join ([[withNorm]]): the brute-force
    // scan scores |corpus| × |queries| pairs, so the per-pair norm recompute
    // tripled the scan's dot products; bit-identical cos
    val vn = withNorm(asVectors(embeddings))
    val q = broadcast(
      vn.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"), col("v").as("qv"),
          col("nv").as("nq")))
    val scored = cosineCols(
      vn.crossJoin(q).filter(col("id") =!= col("query_id")))
    rankTopK(scored, k)
  }

  /** K16: ANN recall evaluation — the index-quality monitor every ANN
    * deployment runs ("measure, don't guess" applied to the index family
    * itself): for each approximate method (K2 hyperplane LSH, K3 IVF,
    * K9 binary quantization) and each query, recall@k against the exact
    * K1 ground truth, in integer micro-units. The operational use: run it
    * on a held-out query sample after every index rebuild/absorption and
    * alert when a method's recall drifts — an index can silently degrade
    * as the corpus distribution shifts (cells overfull, hyperplanes
    * unbalanced) while still returning k plausible ids.
    *
    * Scale shape: each leg is its own already-bounded operator; the
    * fusion is |methods|·|queries|·k rows — nothing new shuffles. Output:
    * (method, query_id, n_hits, recall_micro), one row per method ×
    * query even at zero hits.
    */
  def annRecall(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      hierIndexPath: Option[String] = None,
      ivfIndexPath: Option[String] = None): DataFrame = {
    val exact = topKCosine(embeddings, queryIds, k)
      .select("query_id", "neighbor_id")
    // index-backed legs serve the STORED artifacts when the caller has
    // them (the operational monitor grades the DEPLOYED indexes — and the
    // inline derivations retrain quantizers / rebuild graphs per
    // evaluation); inline is the fallback, spec-pinned value-identical in
    // both cases (deterministic training on the same corpus)
    //
    // Leg CONSTRUCTION overlapped (optimization guide §2.6): each leg's
    // build runs eager driver-bounded phases (quantizer training collects,
    // the pyramid's level descent) whose tiny jobs otherwise serialize —
    // the legs share no state beyond the session (concurrent job
    // submission is the documented Spark usage) and each is deterministic,
    // so building them on a transient 4-thread pool changes wall-clock
    // only; the returned frames and their union order are unchanged.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val legsF = Seq(
      "lsh" -> Future(annTopKCosine(embeddings, queryIds, k)),
      "ivf" -> Future(ivfIndexPath match {
        case Some(p) => VectorIndex.ivfSearch(
          embeddings.sparkSession, p, embeddings, queryIds, k)
        case None => ivfTopKCosine(embeddings, queryIds, k)
      }),
      "binary" -> Future(binaryQuantTopKCosine(embeddings, queryIds, k)),
      "hier" -> Future(hierIndexPath match {
        case Some(p) => HierarchicalIndex.searchTopKCosine(
          embeddings.sparkSession, p, embeddings, queryIds, k)
        case None => HierarchicalIndex.searchInline(embeddings, queryIds, k)
      }))
    val legs =
      try legsF.map { case (n, f) => n -> Await.result(f, Duration.Inf) }
      finally pool.shutdown()
    val u = legs.map { case (n, df) =>
      df.select(lit(n).as("method"), col("query_id"), col("neighbor_id"))
    }.reduce(_.unionByName(_))
    val hits = u.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy("method", "query_id")
      .agg(count(lit(1)).as("n_hits"))
    val methods = embeddings.sparkSession
      .createDataFrame(legs.map(l => Tuple1(l._1))).toDF("method")
    // the axis comes from the queryIds ARGUMENT, not from the exact
    // result: a query absent from embeddings (or with an empty exact
    // top-k) must still surface as a zero-recall row — that's precisely
    // the drift signal the monitor exists to catch
    val queries = embeddings.sparkSession
      .createDataFrame(queryIds.map(Tuple1(_))).toDF("query_id")
    methods.crossJoin(queries)
      .join(hits, Seq("method", "query_id"), "left")
      .select(col("method"), col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall_micro", expr(s"n_hits * 1000000L div $k"))
  }

  /** K12: exact Maximum-Inner-Product Search (MIPS) — the retrieval/
    * recommendation scoring problem, where the answer is argmax ⟨q, x⟩ and
    * vector NORMS matter (a long vector beats a well-aligned short one) —
    * via the norm-augmentation reduction to cosine (Bachrach et al. 2014;
    * Shrivastava & Li 2014 L2-ALSH lineage): append one component
    * `sqrt(M² − |x|²)` to every corpus vector (M = max corpus norm, one
    * bounded aggregate) and `0` to the query. Every augmented corpus
    * vector then has CONSTANT norm M, so augmented-cosine order ≡ raw
    * inner-product order — and the whole cosine stack (LSH/IVF/PQ buckets,
    * K2–K10) answers MIPS unchanged on the augmented vectors. Here the
    * exact leg runs (queries broadcast, map-only scoring, bounded top-k
    * aggregate — the K1 shape), ranking BY the augmented cosine to
    * exercise the reduction for real; the spec pins that this order equals
    * direct-dot order and differs from plain cosine on non-unit norms.
    *
    * `weightExpr` (over `id`) rescales the unit-norm fixture vectors so
    * the corpus has genuinely diverse norms — without it MIPS degenerates
    * to cosine and the reduction is untestable.
    *
    * Output: (query_id, neighbor_id, mips_cos, rank) — one map-only
    * scoring pass, bounded top-k aggregate, no join-back. The reported
    * score is the augmented cosine (monotone in ⟨q, x⟩: the raw inner
    * product is `mips_cos · M · |q|`), rounded like K1's.
    */
  def mipsTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      weightExpr: String = "1.0D + CAST(id % 7 AS DOUBLE)"): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val raw = asVectors(embeddings)
      .withColumn("v", expr(s"transform(v, x -> x * ($weightExpr))"))
    // M²: one bounded aggregate reduced to a scalar (like the centroid/
    // strata collects — never a data collect)
    val m2 = raw.agg(max(expr("graft_dot(v, v)"))).head().getDouble(0)
    // norm hoisted onto the augmented corpus/query sides ([[withNorm]]
    // discipline): the scan scores |corpus| × |queries| pairs
    val aug = withNorm(raw.select(
      col("id"),
      expr(s"array_append(v, sqrt(greatest(0.0D, $m2 - graft_dot(v, v))))")
        .as("v")))
    val q = broadcast(
      raw.filter(col("id").isin(queryIds: _*))
        .select(
          col("id").as("query_id"),
          expr("array_append(v, 0.0D)").as("qv"))
        .withColumn("nq", expr("sqrt(graft_dot(qv, qv))")))
    rankTopK(cosineCols(
        aug.crossJoin(q).filter(col("id") =!= col("query_id"))), k)
      .withColumnRenamed("cosine", "mips_cos")
  }

  /** K12b: APPROXIMATE MIPS — the [[mipsTopK]] augmentation feeding the K2
    * LSH stack unchanged, which is the entire point of the reduction: once
    * every corpus vector has constant norm, inner-product search IS cosine
    * search, and the hyperplane band index (md5-derived signs, engine-
    * replayable) bounds the candidate set exactly as for K2.
    *
    * One asymmetry matters: bucket signatures come from the CONSTANT-NORM
    * augmented corpus vectors (the queries are corpus rows, so they bucket
    * by their corpus-augmented form), but the exact re-rank scores
    * candidates against the 0-APPENDED query — scoring with the query's
    * corpus-augmented form would add a sqrt(M²−|q|²)·sqrt(M²−|x|²)
    * cross-term and corrupt the inner-product order.
    *
    * Same candidate-volume/recall trade as K2 via (bits, bands); scoring is
    * bucket-bounded, never |corpus|.
    */
  def mipsAnnTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      bits: Int = 72,
      bands: Int = 18,
      dim: Int = 64,
      weightExpr: String = "1.0D + CAST(id % 7 AS DOUBLE)"): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val raw = spreadNarrowScan(asVectors(embeddings))
      .withColumn("v", expr(s"transform(v, x -> x * ($weightExpr))"))
    val m2 = raw.agg(max(expr("graft_dot(v, v)"))).head().getDouble(0)
    val aug = raw.select(
      col("id"),
      expr(s"array_append(v, sqrt(greatest(0.0D, $m2 - graft_dot(v, v))))")
        .as("v"))
    val banded = Dedup.signBands(aug, bits, bands, dim + 1)
    val qb = broadcast(
      banded.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"), col("band"), col("key")))
    val cand = banded.join(qb, Seq("band", "key"))
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id").distinct()
    val q0 = broadcast(
      raw.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"), expr("array_append(v, 0.0D)").as("qv"))
        .withColumn("nq", expr("sqrt(graft_dot(qv, qv))")))
    // corpus-side norm hoisted ([[withNorm]] discipline), bit-identical cos
    rankTopK(cosineCols(cand.join(withNorm(aug), "id").join(q0, "query_id")), k)
      .withColumnRenamed("cosine", "mips_cos")
  }

  /** Exact cosine re-rank of (query_id, id) candidate pairs → top-k.
    * Norms hoisted above the candidate join ([[withNorm]]) — one dot per
    * pair, bit-identical cos.
    */
  private[operators] def rerank(cand: DataFrame, v: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val vn = withNorm(v)
    val q = broadcast(
      vn.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"), col("v").as("qv"),
          col("nv").as("nq")))
    rankTopK(cosineCols(cand.join(vn, "id").join(q, "query_id")), k)
  }

  /** One deterministic Lloyd (k-means) iteration over broadcast centroids:
    * assign every vector to its nearest centroid (cosine, max_by tie-break
    * on (cos, cid)), then recompute each centroid as the MEAN of its
    * members. The mean is exactly engine-replayable: each component is
    * floor-quantized to integer micro-units per row, summed (integer
    * addition — associative, so any accumulation order agrees), and divided
    * back as `sum / (n · 10⁶)` — one double division on exact integers.
    * A centroid whose cell went empty keeps its previous position (the
    * standard Lloyd fallback, and the LEFT-join makes it deterministic).
    *
    * Shuffle shape: the per-(cid, dim) partial sums aggregate map-side
    * before one shuffle of ≤ nCentroids·dim rows — centroid training never
    * shuffles corpus vectors, so the iteration cost at 100 TB is the
    * assignment scan, not data movement.
    */
  private def lloydIterate(v: DataFrame, cents: DataFrame): DataFrame = {
    // map-only assignment column: no crossJoin row explosion and no id
    // re-join — each sample row carries its cell straight into the
    // per-(cid, dim) partial sums
    val sums = v
      .select(argmaxCosineCol(v, cents).getField("cid").as("cid"),
        posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("cid", "d")
      .agg(
        sum(expr("CAST(floor(x * 1000000) AS BIGINT)")).as("s"),
        count(lit(1)).as("n"))
    val means = sums.groupBy("cid")
      .agg(expr(
        """transform(
             array_sort(collect_list(struct(d, CAST(s AS DOUBLE) / (n * 1000000.0D) AS m))),
             p -> p.m)""").as("nv"))
    cents.join(means, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("nv"), col("qv")).as("qv"))
  }

  /** Materialize a centroid frame to a local relation (collect + recreate).
    *
    * Bounded by construction (nCentroids × dim doubles — KB, not data), and
    * load-bearing for the iteration: without it each [[lloydIterate]] embeds
    * the previous iteration's whole plan TWICE (assignment + empty-cell
    * fallback join), so the logical plan — and the work re-executed per
    * reference — doubles every iteration. Collecting the tiny centroid
    * state per round is exactly how distributed k-means implementations
    * iterate; the values are micro-quantized integers divided once, so the
    * materialized doubles are bit-stable across engines and runs.
    */
  private[operators] def materializeCentroids(cents: DataFrame): DataFrame = {
    val spark = cents.sparkSession
    val rows = cents.select(col("cid"), col("qv")).collect().toIndexedSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), cents.schema)
  }

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned into
    * `nCentroids` cells by nearest centroid; a query probes only its
    * `nProbe` closest cells and exact-re-ranks their members. The index is
    * the classic ANN scale shape: candidate volume ≈ nProbe/nCentroids of
    * the corpus, assignment is a map-side `max_by` over a broadcast
    * centroid table (no shuffle of corpus vectors, no window).
    *
    * Centroids: seeds are chosen deterministically by md5(id) order
    * (seedless init, reproducible in any engine), then TRAINED with
    * `nIter` Lloyd iterations over a deterministic ~1/8 hash sample of the
    * corpus ([[lloydIterate]] — micro-quantized means, so the trained
    * positions are bit-identical across engines and the whole pipeline
    * stays value-oracle-gated, not rows-only; per-round centroid state is
    * driver-materialized, see [[materializeCentroids]]). Training on a
    * sample is the standard IVF build: only the single final assignment
    * scans the full corpus. SimilaritySpec additionally pins that training
    * does not lose recall vs the untrained (nIter = 0) index.
    */
  def ivfTopKCosine(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nCentroids: Int = 32,
      nProbe: Int = 8,
      nIter: Int = 2): DataFrame = {
    val v = asVectors(embeddings)
    val (assign, qProbes) = ivfCoarse(v, queryIds, nCentroids, nProbe, nIter)
    val cand = broadcast(qProbes).join(assign, "cid")
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"))
      .distinct()
    rerank(cand, v, queryIds, k)
  }

  /** The IVF coarse quantizer, shared by [[ivfTopKCosine]],
    * [[ivfPqTopKCosine]] and [[Dedup.semDedup]]: trains `nCentroids` cosine
    * centroids and returns `(assign, qProbes)` — the full-corpus cell
    * assignment (id, cid, cos — the winning centroid's cosine, which
    * semDedup's keep-the-outlier rule ranks on) and the per-query `nProbe`
    * closest cells (query_id, cid).
    */
  /** Train the IVF coarse quantizer over `v`: deterministic md5-order
    * seeds, `nIter` Lloyd iterations over the ~1/8 hash sample, returned as
    * a driver-materialized (cid, qv) relation — the bounded artifact
    * [[VectorIndex]] persists and [[ivfCoarse]] uses inline.
    *
    * Training sample: md5(id) hex < '2' ≈ 1/8 of the corpus, map-only (no
    * sort/limit) and engine-replayable. k-means needs a REPRESENTATIVE
    * sample, not the full corpus — at 100 TB the training loop must not
    * scan everything nIter times; only the single final assignment does.
    * Seeds are picked over the FULL corpus (orderBy+limit = one TakeOrdered
    * pass, no global sort): on a corpus with ≥ nCentroids·16/2 rows this
    * equals picking from the sample (the smallest md5s all hash below
    * '2'), but on a tiny corpus the sample alone could yield fewer than
    * nCentroids seeds and silently degrade the index.
    */
  private[operators] def ivfCentroids(
      v: DataFrame,
      nCentroids: Int,
      nIter: Int): DataFrame = {
    val vt = v.filter(md5(col("id").cast("string")) < lit("2"))
    val seeds =
      v.orderBy(md5(col("id").cast("string")), col("id"))
        .limit(nCentroids)
        .select(col("id").as("cid"), col("v").as("qv"))
    (0 until nIter).foldLeft(materializeCentroids(seeds)) { (c, _) =>
      // materializeCentroids collects eagerly, so the iteration's baked
      // argmax registration is dead the moment `next` exists — drop it,
      // leaving one live registry entry per trained generation (the final
      // centroids register at their first consuming call), not one per
      // Lloyd iteration
      val next = materializeCentroids(lloydIterate(vt, broadcast(c)))
      dropArgmax(vt, c)
      next
    }
  }

  /** The centroid table as a map-only argmax-cosine COLUMN over `v`: the
    * bounded (cid, qv) relation is collected (nCentroids·dim doubles — the
    * same driver state Lloyd training already materializes) and baked into
    * one native [[graft.functions.ArgmaxCosine]] expression, so nearest-
    * centroid assignment is a codegen'd per-row loop instead of an
    * n·nCentroids row-explosion join + re-aggregation. Value-identical to
    * the former `crossJoin(broadcast) + max_by(struct(cos, cid))`
    * (spec-pinned, same tie-break under the nan-safe double order).
    */
  /** Content key for a baked-array native function registration: md5 over
    * the arrays' raw bits. Same quantizers => same name => the
    * registration is an idempotent overwrite instead of a fresh entry, so
    * the session registry is bounded by the number of DISTINCT quantizer
    * sets (one per trained index generation), not by query count — a
    * per-call unique suffix leaked an entry (and its pinned arrays) per
    * ivfAssign/pqEncode/Lloyd-iteration call in long-lived sessions.
    */
  private def contentKey(cids: Array[Long], matrix: Array[Double]): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(8)
    cids.foreach { c => bb.clear(); bb.putLong(c); digest.update(bb.array()) }
    matrix.foreach { d =>
      bb.clear(); bb.putLong(java.lang.Double.doubleToLongBits(d))
      digest.update(bb.array())
    }
    digest.digest().map("%02x".format(_)).mkString
  }

  /** Collect a centroid frame's (cids, matrix, dim) and register the baked
    * [[graft.functions.ArgmaxCosine]] under its content-keyed name,
    * returning the name — the single registration path, so [[dropArgmax]]
    * can recompute the same key to unregister a dead generation.
    */
  private def registerArgmax(v: DataFrame, cents: DataFrame): String = {
    val rows = cents.select(col("cid"), col("qv")).collect().sortBy(_.getLong(0))
    require(rows.nonEmpty, "centroid table is empty")
    val cids = rows.map(_.getLong(0))
    val dim = rows.head.getSeq[Double](1).length
    val matrix = new Array[Double](rows.length * dim)
    var c = 0
    while (c < rows.length) {
      val q = rows(c).getSeq[Double](1)
      var d = 0
      while (d < dim) { matrix(c * dim + d) = q(d); d += 1 }
      c += 1
    }
    // the expression carries runtime data (the baked matrix), which the
    // SQL surface can't express as literals — a uniquely-named registry
    // builder CLOSING OVER the arrays bridges it through the supported
    // function-registry API (no private Column constructors)
    // register in the CONSUMING frame's session (micro-batch clones
    // resolve functions against their own registry, not the writer's)
    val fn = s"graft_argmax_cos_${contentKey(cids, matrix)}"
    v.sparkSession.sessionState.functionRegistry
      .createOrReplaceTempFunction(fn, { children =>
        require(children.length == 1, s"$fn expects (vector)")
        graft.functions.ArgmaxCosine(children.head, cids, matrix, dim)
      }, "built-in")
    fn
  }

  /** Unregister the argmax entry baked from `cents` (content-keyed, so the
    * name is recomputable from the tiny centroid frame). Called by the
    * Lloyd fold once an iteration's assignment is driver-materialized and
    * the registration is dead — keeping the registry bounded by LIVE index
    * generations, not by one-entry-per-iteration growth.
    */
  private def dropArgmax(v: DataFrame, cents: DataFrame): Unit = {
    val rows = cents.select(col("cid"), col("qv")).collect().sortBy(_.getLong(0))
    if (rows.nonEmpty) {
      val cids = rows.map(_.getLong(0))
      val dim = rows.head.getSeq[Double](1).length
      val matrix = new Array[Double](rows.length * dim)
      var c = 0
      while (c < rows.length) {
        val q = rows(c).getSeq[Double](1)
        var d = 0
        while (d < dim) { matrix(c * dim + d) = q(d); d += 1 }
        c += 1
      }
      v.sparkSession.sessionState.functionRegistry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(
          s"graft_argmax_cos_${contentKey(cids, matrix)}"))
    }
  }

  private def argmaxCosineCol(v: DataFrame, cents: DataFrame): org.apache.spark.sql.Column =
    expr(s"${registerArgmax(v, cents)}(v)")

  /** Nearest-centroid assignment of every vector in `v`: map-only
    * [[argmaxCosineCol]] over the baked centroid table — deterministic
    * tie-break on (cos, cid). `cents` must be (cid, qv).
    */
  private[operators] def ivfAssign(v: DataFrame, cents: DataFrame): DataFrame =
    v.select(col("id"), argmaxCosineCol(v, cents).as("m"))
      .select(col("id"), col("m.cid").as("cid"), col("m.cos").as("cos"))

  /** The per-query probe list: each query's `nProbe` closest centroids by
    * (cos desc, cid asc) — a window over the tiny |queries| × nCentroids
    * frame only.
    */
  private[operators] def ivfQueryProbes(
      v: DataFrame,
      queryIds: Seq[Long],
      cents: DataFrame,
      nProbe: Int): DataFrame =
    cosineCols(
      v.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"), col("v"))
        .crossJoin(broadcast(cents)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("cid"))

  private[operators] def ivfCoarse(
      v: DataFrame,
      queryIds: Seq[Long],
      nCentroids: Int,
      nProbe: Int,
      nIter: Int): (DataFrame, DataFrame) = {
    val cents = broadcast(ivfCentroids(v, nCentroids, nIter))
    (ivfAssign(v, cents), ivfQueryProbes(v, queryIds, cents, nProbe))
  }

  /** Approximate top-k: candidates = corpus vectors sharing at least one
    * random-hyperplane band bucket with the query ([[Dedup.signBands]]), then
    * exact cosine re-rank of candidates only. Recall/candidate-volume trades
    * via (bits, bands): more, narrower bands → higher recall and more
    * candidates. Unlike [[topKCosine]], the ranking input is bounded by the
    * bucket sizes, not |corpus| — the shape that survives scale-out.
    */
  def annTopKCosine(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      bits: Int = 72,
      bands: Int = 18,
      dim: Int = 64): DataFrame = {
    val v = asVectors(embeddings)
    val banded = Dedup.signBands(v, bits, bands, dim)
    val qb = broadcast(
      banded.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"), col("band"), col("key")))
    val cand = banded.join(qb, Seq("band", "key"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"))
      .distinct()
    rerank(cand, v, queryIds, k)
  }

  /** Filtered ANN (k7): approximate top-k cosine among only the corpus
    * vectors satisfying a metadata predicate — "similar documents in
    * language X / with license Y", the bread-and-butter vector-database
    * operation that pure ANN variants (k2/k3/k4/k6) don't express.
    *
    * Strategy: PRE-FILTER. The predicate applies BEFORE banding, so the
    * index pass and the candidate join only ever touch qualifying vectors
    * — correct for any predicate selectivity (never the "over-fetch k′ and
    * hope enough survive the filter" recall cliff of post-filtering), and
    * the candidate volume is bounded by the FILTERED corpus's bucket
    * sizes, a strict subset of k2's. The trade, documented: banding is
    * recomputed under the predicate, so this shape fits ad-hoc filters at
    * query time or per-partition indexes at 100 TB (a production layout
    * partitions the stored index by the common filter columns — lang,
    * source — making the pre-filter a partition-pruned index read).
    * Queries are exempt from the predicate (searching FROM any document
    * INTO the filtered subset).
    */
  def filteredAnnTopKCosine(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      filterExpr: String,
      k: Int = 10,
      bits: Int = 72,
      bands: Int = 18,
      dim: Int = 64): DataFrame = {
    val vAll = asVectors(embeddings)
    val corpus = asVectors(embeddings.filter(expr(filterExpr)))
    val banded = Dedup.signBands(corpus, bits, bands, dim)
    // banding is a pure function of the vector, so banding just the query
    // rows yields the same keys the full-corpus banding would
    val qb = broadcast(
      Dedup.signBands(vAll.filter(col("id").isin(queryIds: _*)), bits, bands, dim)
        .select(col("id").as("query_id"), col("band"), col("key")))
    val cand = banded.join(qb, Seq("band", "key"))
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id")
      .distinct()
    rerank(cand, vAll, queryIds, k)
  }

  /** Binary-quantization ANN top-k (K9) — the 1-bit memory tier of the
    * index family: each vector is compressed to `nBits` hyperplane sign
    * bits PACKED INTO ONE BIGINT (64 dims · 8-byte doubles → 8 bytes, a
    * 64× reduction), queries scan signatures by Hamming distance
    * (XOR + codegen'd `bit_count` — one instruction pair per comparison),
    * and only the `k`·`candMult` Hamming-closest survivors are exact
    * re-ranked. On unit vectors the expected Hamming distance is
    * proportional to the angle (Goemans–Williamson / SimHash bound), so
    * the shortlist is angle-aware despite costing almost nothing.
    *
    * Where it sits in the family: K2 (LSH buckets) prunes by COLLISION —
    * sub-linear candidate generation but recall cliffs when a true
    * neighbor misses every band; this scans ALL signatures (like K4's
    * ADC pass) so nothing is ever missed by hashing bad luck, at 1 bit
    * per plane instead of K4's 4-bit codes. The scan is map-only: the
    * corpus signature relation never shuffles (queries broadcast), and
    * the per-query `graft_topk` heap bounds state at k·candMult — the
    * same no-window, no-global-sort contract as K1/K4.
    *
    * Signatures reuse the d5/k2 hyperplane family ([[graft.functions
    * .HyperplaneSums]]): md5-derived ±1 planes, integer-quantized
    * projection sums — the whole pipeline (planes, bits, Hamming ranking,
    * re-rank) replays bit-identically in the SQL oracle.
    */
  def binaryQuantTopKCosine(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nBits: Int = 64,
      candMult: Int = 10,
      dim: Int = 64): DataFrame = {
    val v = asVectors(embeddings)
    rerank(binaryShortlist(v, queryIds, k * candMult, nBits, dim), v, queryIds, k)
  }

  /** The packed-signature Hamming shortlist shared by [[binaryQuantTopKCosine]]
    * and [[cascadeTopKCosine]]: per query, the `limit` signature-closest
    * corpus ids (hamming asc, id asc — the `graft_topk` total order).
    */
  private[operators] def binaryShortlist(
      v: DataFrame,
      queryIds: Seq[Long],
      limit: Int,
      nBits: Int,
      dim: Int): DataFrame =
    signatureShortlist(
      binarySignatures(v, nBits, dim), v, queryIds, limit, nBits, dim)

  /** Packed 1-bit hyperplane signatures (id, sig) for every vector — the
    * per-vector encoding [[graft.operators.VectorIndex]] persists (64×
    * smaller than raw vectors; hyperplanes are md5-derived, so signatures
    * are a pure deterministic function of the vector and nBits).
    */
  private[operators] def binarySignatures(
      v: DataFrame, nBits: Int, dim: Int): DataFrame = {
    require(nBits > 0 && nBits <= 64, s"signatures pack into one long: nBits=$nBits")
    graft.functions.GraftFunctions.register(v.sparkSession)
    v.filter(col("v").isNotNull && size(col("v")) > 0)
      .select(col("id"), expr(s"graft_hp_sums(v, $nBits, $dim)").as("sums"))
      .select(col("id"), expr(
        s"""aggregate(sequence(0, ${nBits - 1}), 0L,
             (acc, i) -> acc | IF(sums[i] >= 0L, shiftleft(1L, i), 0L))""").as("sig"))
  }

  /** The signature-Hamming shortlist over a (id, sig) relation — corpus
    * signatures may be computed inline ([[binaryShortlist]]) or read from
    * the stored index; query signatures are always computed fresh from the
    * query vectors (a ≤|queries|-row map).
    */
  private[operators] def signatureShortlist(
      sigs: DataFrame,
      v: DataFrame,
      queryIds: Seq[Long],
      limit: Int,
      nBits: Int,
      dim: Int): DataFrame = {
    val qs = broadcast(
      binarySignatures(v.filter(col("id").isin(queryIds: _*)), nBits, dim)
        .select(col("id").as("query_id"), col("sig").as("qsig")))
    sigs.crossJoin(qs)
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        expr("bit_count(sig ^ qsig)").as("hamming"))
      .groupBy("query_id")
      // score = -hamming: graft_topk's (score desc, id asc) order is
      // exactly (hamming asc, id asc) — deterministic shortlist
      .agg(expr(s"graft_topk(CAST(-hamming AS DOUBLE), id, $limit)").as("tk"))
      .select(col("query_id"), explode(col("tk.id")).as("id"))
  }

  /** K17: scalar-quantized ANN (SQ8 — FAISS `ScalarQuantizer` semantics,
    * the 8-bit rung between K9's 1-bit signatures and K4's subspace PQ):
    * per-DIMENSION affine quantization of the corpus to uint8 codes
    * (8× smaller than float32, no codebook training — just a min/max
    * scan), asymmetric scoring (full-precision query against dequantized
    * corpus — the standard SQ trade: query precision is free, corpus
    * memory is not), bounded shortlist, exact re-rank.
    *
    * INTEGER-EXACT everywhere the engines must agree: vectors are
    * floor-micro-quantized to BIGINT first, per-dim (min, max) are exact
    * integer extrema, `code = (vm−min)·255 div range` and
    * `dequant = min + code·range div 255` are non-negative integer
    * divisions (identical in Spark `div` and DuckDB `//`), and the
    * approximate cosine divides exact-bigint-derived doubles in the same
    * fold order as every other gated cosine leg.
    *
    * Shape at 100 TB: the (min, max) scan partial-aggregates to `dim`
    * rows; the 2·dim stats bake into a map-only encode/score expression
    * (driver state bounded by dim — the centroid contract); scoring is a
    * broadcast-query scan; the shortlist is the bounded `graft_topk`
    * heap; only the ≤ k·candMult shortlist reaches exact re-rank.
    */
  def sq8TopKCosine(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      candMult: Int = 10,
      dim: Int = 64): DataFrame = {
    val v = asVectors(embeddings)
    graft.functions.GraftFunctions.register(v.sparkSession)
    val vm = spreadNarrowScan(v)
      .filter(col("v").isNotNull && size(col("v")) > 0)
      .select(col("id"),
        expr("transform(v, x -> CAST(floor(x * 1000000) AS BIGINT))").as("vm"))
    // per-dim exact extrema: map-side partials collapse to `dim` rows
    // before the one tiny shuffle (the centroid-training shape)
    val stats = vm
      .select(posexplode(col("vm")).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("mn"), max("x").as("mx"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(stats.length == dim, s"expected $dim dims, got ${stats.length}")
    val mnLit = stats.map(_._2).mkString("array(", "L,", "L)")
    val rgLit = stats.map(s => s._3 - s._2).mkString("array(", "L,", "L)")
    // dequantized corpus values as doubles (each an exact bigint < 2^53):
    // dq_d = mn_d + ((vm_d - mn_d)·255 div rng_d)·rng_d div 255; a
    // zero-range dim dequantizes to its constant
    val dqExpr =
      s"""transform(sequence(0, ${dim - 1}), d -> CAST(
            IF(element_at($rgLit, d + 1) = 0L, element_at($mnLit, d + 1),
               element_at($mnLit, d + 1) +
               ((vm[d] - element_at($mnLit, d + 1)) * 255L div element_at($rgLit, d + 1))
                 * element_at($rgLit, d + 1) div 255L) AS DOUBLE))"""
    // norm hoisted onto the dequantized corpus/query sides ([[withNorm]]
    // discipline): the shortlist scores |corpus| × |queries| pairs
    val dqv = withNorm(vm.select(col("id"), expr(dqExpr).as("v")))
    val q = broadcast(
      vm.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"),
          expr("transform(vm, x -> CAST(x AS DOUBLE))").as("qv"))
        .withColumn("nq", expr("sqrt(graft_dot(qv, qv))")))
    val shortlist = cosineCols(dqv.crossJoin(q))
      .filter(col("id") =!= col("query_id"))
      .groupBy("query_id")
      .agg(expr(s"graft_topk(cos, id, ${k * candMult})").as("tk"))
      .select(col("query_id"), explode(col("tk.id")).as("id"))
    rerank(shortlist, v, queryIds, k)
  }

  /** Progressive-refinement cascade (K10) — the production ANN serving
    * shape: each stage is cheaper per candidate than the next and feeds it
    * a strictly smaller set, so the expensive scorer only ever sees a few
    * dozen rows.
    *
    *   stage 1  1-bit signatures, XOR+popcount  corpus → k·stage1Mult
    *   stage 2  4-bit PQ codes, integer ADC     → k·stage2Mult
    *   stage 3  exact cosine on raw vectors     → k
    *
    * K9 proved stage 1, K4/K8 proved stage 2's scorer; the cascade is how
    * they actually deploy together (binary pre-filter in RAM, PQ refine,
    * exact re-rank from storage). Every stage keeps the established
    * contracts: map-only broadcast scans, bounded `graft_topk` heaps
    * (deterministic (score, id) total orders), the corpus never shuffles
    * raw vectors.
    */
  def cascadeTopKCosine(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nBits: Int = 64,
      stage1Mult: Int = 20,
      stage2Mult: Int = 5,
      m: Int = 8,
      nCodes: Int = 16,
      pqIter: Int = 2,
      dim: Int = 64): DataFrame = {
    val v = asVectors(embeddings)
    val s1 = binaryShortlist(v, queryIds, k * stage1Mult, nBits, dim)
    val (vn, codebook, codes) = pqCodes(v, m, nCodes, pqIter, dim)
    val subDim = dim / m
    val qd = broadcast(
      subvectors(vn.filter(col("id").isin(queryIds: _*)), m, subDim)
        .withColumnRenamed("id", "query_id")
        .join(codebook, "sub")
        .select(col("query_id"), col("sub"), col("cid").as("code"),
          expr(s"CAST(floor($subL2 * 1000000) AS BIGINT)").as("d_micro")))
    val s2 = s1.join(codes, "id")
      .join(qd, Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("d_micro")).as("adc"))
      .groupBy("query_id")
      .agg(expr(s"graft_topk(CAST(-adc AS DOUBLE), id, ${k * stage2Mult})").as("tk"))
      .select(col("query_id"), explode(col("tk.id")).as("id"))
    rerank(s2, v, queryIds, k)
  }

  /** MMR diversified top-k (K11) — Maximal Marginal Relevance (Carbonell &
    * Goldstein 1998), the re-ranker RAG retrieval stacks run after ANN:
    * greedily pick the candidate maximizing
    * `λ·relevance − (1−λ)·max-similarity-to-already-picked`, so the final
    * k answers are both close to the query AND spread apart (plain top-k
    * happily returns k near-copies of one passage — exactly what D11/X21
    * exist to show corpora are full of).
    *
    * Integer-exact rendering: relevance and pairwise similarities are
    * micro-quantized once, the marginal score is pure integer arithmetic
    * (`λ_micro·rel − (10⁶−λ_micro)·maxsim`, ~10¹² range), and every argmax
    * is `max_by` over (score, −id) — a deterministic total order, so the
    * greedy trajectory replays bit-identically in the SQL oracle (k chained
    * rounds, the k6 fixed-round pattern).
    *
    * Shape: the expensive parts — the K1 relevance shortlist (broadcast
    * map-only corpus scan) and the ≤ shortlist² exact pairwise sims — run
    * distributed; the k greedy argmax rounds then run ON THE DRIVER over
    * the collected integer shortlist state (|queries|·shortlist² longs —
    * parameter-bounded KBs at the defaults, the centroid-collect
    * discipline), replacing ~6 orchestration jobs per round.
    */
  def mmrTopKCosine(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 5,
      lambdaMicro: Long = 700000L,
      shortlist: Int = 20): DataFrame = {
    require(k >= 1 && shortlist >= k, s"need shortlist >= k, got $shortlist < $k")
    require(lambdaMicro >= 0L && lambdaMicro <= 1000000L, "lambda in [0, 1e6]")
    val v = asVectors(embeddings)
    graft.functions.GraftFunctions.register(v.sparkSession)
    val sl = topKCosine(embeddings, queryIds, shortlist)
      .select(col("query_id"), col("neighbor_id").as("id"),
        expr("CAST(round(cosine * 1000000) AS BIGINT)").as("rel_micro"))
      .localCheckpoint(true)
    val sims = sl.as("a")
      .join(sl.as("b"),
        col("a.query_id") === col("b.query_id") && col("a.id") =!= col("b.id"))
      .select(col("a.query_id").as("query_id"),
        col("a.id").as("ca"), col("b.id").as("cb"))
      .join(v.select(col("id").as("ca"), col("v").as("va")), "ca")
      .join(v.select(col("id").as("cb"), col("v").as("vb")), "cb")
      .withColumn("sim", expr(
        "CAST(round(graft_dot(va, vb) / (sqrt(graft_dot(va, va)) * " +
          "sqrt(graft_dot(vb, vb))) * 1000000) AS BIGINT)"))
      .select("query_id", "ca", "cb", "sim")
    // GREEDY ROUNDS ON THE DRIVER (optimization round 21): the k chained
    // argmax rounds operate on |queries|·shortlist relevance rows plus
    // |queries|·shortlist² pairwise sims — parameter-bounded driver state
    // (KBs at the defaults; the centroid-collect discipline, bound stated
    // here), while the distributed round loop paid ~6 tiny jobs + 2
    // broadcast builds PER ROUND (51 jobs measured for k11 at sf0.1, ~85 ms
    // apiece of pure orchestration). The heavy, corpus-sized parts — the
    // brute-force shortlist scan and the exact integer pairwise sims —
    // STAY distributed; only the greedy selection over already-quantized
    // integers moves. The arithmetic below is the SQL form term for term
    // (Long λ·rel − (10⁶−λ)·ms; argmax by (score, −id), i.e. max score
    // with ties to the SMALLER id; a candidate with no sim row to any
    // selected member drops, the inner-join semantics), so the values are
    // bit-identical — oracle-replayed, spec-pinned.
    val relRows = sl.select("query_id", "id", "rel_micro").collect()
    val simRows = sims.select("query_id", "ca", "cb", "sim").collect()
    val relByQ = relRows.groupBy(_.getLong(0))
    val simByQ = simRows.groupBy(_.getLong(0))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Long)]
    relByQ.foreach { case (q, rows) =>
      val rel = rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      val sim = simByQ.getOrElse(q, Array.empty[org.apache.spark.sql.Row])
        .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
      val first = rel.toSeq.maxBy { case (id, rm) => (rm, -id) }
      var selected = List(first._1)
      out += ((q, first._1, 1, first._2))
      var r = 2
      var exhausted = false
      while (r <= k && !exhausted) {
        val cands = rel.iterator
          .filter { case (ca, _) => !selected.contains(ca) }
          .flatMap { case (ca, rm) =>
            val ms = selected.flatMap(cb => sim.get((ca, cb)))
            if (ms.isEmpty) None else Some((ca, rm, ms.max))
          }.toSeq
        if (cands.isEmpty) exhausted = true
        else {
          val (id, rm, _) = cands.maxBy { case (ca, rm, ms) =>
            (lambdaMicro * rm - (1000000L - lambdaMicro) * ms, -ca)
          }
          selected = id :: selected
          out += ((q, id, r, rm))
          r += 1
        }
      }
    }
    val session = embeddings.sparkSession
    import session.implicits._
    out.toSeq.toDF("query_id", "neighbor_id", "mmr_rank", "rel_micro")
  }

  /** kNN-graph build: for EVERY corpus vector, its top-k cosine neighbors
    * among the vectors sharing at least one hyperplane-LSH band bucket —
    * the batch primitive under semantic dedup, embedding clustering and
    * graph-based retrieval indexes (HNSW layers start from exactly this).
    * [[annTopKCosine]] answers a few queries; this ranks ALL n nodes, so
    * candidate generation must stay bucket-bounded: the band self-join
    * yields O(Σ bucket²) slim pairs, never the n² cross product, and the
    * per-node ranking is the bounded `graft_topk` aggregate — no window,
    * no global sort, no stage holding more than k rows per node.
    *
    * Nodes whose buckets contain no other vector emit no rows (isolated
    * graph nodes) — recall/edge-count trades via (bits, bands) exactly as
    * in the query-time ANN.
    */
  /** Scale-adaptive band-key WIDTH (bits per band) for the kNN-graph
    * banding: `clamp(ceil(log2(n / targetOccupancy)), 4, 16)` — keeps
    * EXPECTED BUCKET OCCUPANCY roughly constant as the corpus grows. The
    * round-15 sf1 anchor measured why this matters: fixed 4-bit keys (16
    * buckets/band) put the average bucket at n/16, so candidate volume
    * grows quadratically until every bucket crosses the sub-salt cap and
    * then linearly with a cap-sized constant (k5 3.5 → 375 s at 10×).
    * Width ∝ log n restores the sf0.1 occupancy at any scale. At every
    * gated/spec scale (n ≤ 2048) the clamp resolves to 4 — banding,
    * values, oracles and bench floors are bit-identical to the fixed
    * parameterization there (spec-pinned); the oracle SQL computes the
    * same width from count(*) so the replay stays universal. Capped at
    * 16 (65,536 buckets/band ≈ 8M vectors at occupancy 128; beyond that
    * raise the occupancy target — per-band recall decays with width).
    */
  private[graft] def adaptiveBandBits(
      n: Long, targetOccupancy: Long = 128L): Int = {
    val q = math.max(1L, n).toDouble / targetOccupancy.toDouble
    math.min(16, math.max(4,
      math.ceil(math.log(q) / math.log(2.0)).toInt))
  }

  def knnGraph(
      embeddings: DataFrame,
      k: Int = 5,
      bits: Int = 0,
      bands: Int = 18,
      dim: Int = 64,
      bucketCap: Int = Dedup.DefaultBucketCap): DataFrame = {
    val v = spreadNarrowScan(asVectors(embeddings))
    // bits = 0 (the default) resolves the band-key width ADAPTIVELY from
    // the corpus count — see [[adaptiveBandBits]]; an explicit bits value
    // pins the banding (the pre-round-15 fixed behavior)
    val resolvedBits =
      if (bits == 0) bands * adaptiveBandBits(v.count()) else bits
    // (measured: checkpointing the banding to undo the self-join's subtree
    // duplication saves only ~5% at sf0.1 — the cost is the Σ bucket²
    // candidate volume + distinct, which (bits, bands) tune directly — so
    // the operator stays lazy)
    // Hot-bucket guard ([[Dedup.capBuckets]]): a near-identical cluster of
    // B docs lands in ONE bucket per band and would contribute B² joined
    // rows — the quadratic blow-up kNN-graph builds hit on duplicate-heavy
    // crawls. Sub-salting bounds it at ~B·cap per band; inside a capped
    // bucket each node still sees ≥ min(B, cap)-1 same-cluster candidates,
    // so its top-k neighbors are as good as the uncapped ones whenever
    // cap > k (cosine ties aside).
    knnGraphFromBanded(
      Dedup.capBuckets(
        Dedup.signBands(v, resolvedBits, bands, dim), bucketCap), v, k)
  }

  /** [[knnGraph]]'s pair-generation + scoring + ranking over an ALREADY
    * banded relation — shared with [[HierarchicalIndex]], whose absorb
    * path derives candidates from the PERSISTED banding and must produce
    * bit-identical edges to a from-scratch build.
    */
  private[operators] def knnGraphFromBanded(
      banded: DataFrame, v: DataFrame, k: Int): DataFrame = {
    // checkpoint the capped banding ONCE (the self-join would otherwise
    // evaluate the cap join twice) and spread the pair generation across
    // an explicit row-derived width — see [[pairJoinWidth]]: the join's
    // input bytes are tiny, so byte-based sizing serializes the quadratic
    // pair fan-out onto one task
    val b0 = banded.select("id", "band", "key").localCheckpoint(true)
    val b = b0.repartition(
      pairJoinWidth(b0.sparkSession, b0.count()), col("band"), col("key"))
    val pairs = b.select(col("id").as("query_id"), col("band"), col("key"))
      .join(b.select(col("id"), col("band"), col("key")), Seq("band", "key"))
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id")
      .distinct()
    // norms hoisted above the pair join ([[withNorm]]): one dot per scored
    // pair instead of three, bit-identical cos
    val vn = withNorm(v)
    val scored = cosineCols(pairs
      .join(vn, "id")
      .join(vn.select(col("id").as("query_id"), col("v").as("qv"),
        col("nv").as("nq")), "query_id"))
    rankTopK(scored, k)
  }

  /** Graph-traversal ANN (k6): beam search over the [[knnGraph]] — the
    * query-time consumer of the k5 primitive, and the HNSW/NSW-family idea
    * re-expressed as bounded relational rounds: seed a few entry points
    * cheaply, then repeatedly hop to the NEIGHBORS of the current best
    * candidates, because "near the query" is reachable from "near-ish"
    * through the graph. Graph traversal beats pure bucket probing
    * (k2/k3) at equal exact-distance budget: buckets can only return
    * points that HASH with the query, while the graph walks into a
    * query's true neighborhood even when hashes disagree.
    *
    * Rounds are FIXED (not until-convergence): each round r takes the
    * top-`beamWidth` of everything scored so far (bounded `graft_topk` —
    * no window, no global sort), expands their out-edges, anti-joins away
    * already-visited candidates, and exact-scores only the new ones.
    * After `rounds` expansions the answer is the top-k of the visited
    * set. Fixed rounds keep the whole search a finite relational
    * expression — deterministic, SQL-replayable (the k6 oracle replays
    * seeding, both expansions, and the final rank), and free of
    * driver-side convergence loops.
    *
    * Seeding is LSH, deliberately NARROW: only the first `seedBands` of
    * the [[Dedup.signBands]] bands — a fraction of k2's candidate volume;
    * the graph hops recover (and beat) the recall the missing bands would
    * have bought. SimilaritySpec pins exactly that trade on the provisioned
    * embeddings: fewer exact-cosine evaluations than k2 AND recall at
    * least as high.
    *
    * Scale shape: the beam is |queries|·beamWidth rows (broadcast); each
    * expansion is one equi-join of that tiny beam against the (node →
    * neighbor) edge list — never a corpus self-join; scoring joins only
    * NEW candidate ids against the vector table. Per-round state is
    * localCheckpoint-ed (the d7/g1 lineage bound). The graph itself is the
    * prebuilt index at 100 TB (pass it via `graph`); the default rebuilds
    * it inline so the gated entry exercises the full pipeline.
    */
  def beamSearchTopKCosine(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      beamWidth: Int = 32,
      rounds: Int = 2,
      seedBands: Int = 3,
      graphK: Int = 8,
      bits: Int = 0,
      bands: Int = 18,
      dim: Int = 64,
      graph: Option[DataFrame] = None): DataFrame =
    beamSearchRun(embeddings, queryIds, k, beamWidth, rounds, seedBands,
      graphK, bits, bands, dim, graph)._1

  /** [[beamSearchTopKCosine]] plus the number of exact cosine evaluations
    * performed (|visited|) — the budget observable the recall-vs-k2 spec
    * pins.
    */
  def beamSearchRun(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      beamWidth: Int = 32,
      rounds: Int = 2,
      seedBands: Int = 3,
      graphK: Int = 8,
      bits: Int = 0,
      bands: Int = 18,
      dim: Int = 64,
      graph: Option[DataFrame] = None): (DataFrame, Long) = {
    require(rounds >= 0, "rounds must be non-negative")
    require(beamWidth > 0 && seedBands > 0 && seedBands <= bands,
      "beamWidth and seedBands must be positive (seedBands <= bands)")
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val v = asVectors(embeddings)
    // bits = 0 → adaptive band-key width (see [[adaptiveBandBits]]) for
    // BOTH the inline graph and the LSH seeding, resolved once so the
    // two always share one banding parameterization
    val resolvedBits =
      if (bits == 0) bands * adaptiveBandBits(v.count()) else bits
    // UNDIRECTED adjacency: out-edges plus reversed in-edges. The kNN graph
    // is directed (each node knows ITS k nearest), but search wants "who is
    // near x" in both directions — x's neighbor lists and the nodes that
    // chose x. HNSW keeps back-links for exactly this reason; without them
    // a low-in-degree region is unreachable.
    val out = graph
      .getOrElse(knnGraph(embeddings, graphK, resolvedBits, bands, dim))
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
    val g = out.unionByName(
      out.select(col("dst").as("src"), col("src").as("dst")))
    // norms hoisted above the scoring joins ([[withNorm]]): one dot per
    // scored candidate instead of three, bit-identical cos
    val vn = withNorm(v)
    val q = broadcast(
      vn.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"), col("v").as("qv"),
          col("nv").as("nq")))
    def score(cand: DataFrame): DataFrame =
      cosineCols(cand.join(vn, "id").join(q, "query_id"))
        .select(col("query_id"), col("id"), col("cos"))
    // entry points: bucket collisions in the first seedBands bands only
    val banded = Dedup.signBands(v, resolvedBits, bands, dim)
      .filter(col("band") < seedBands)
    val qb = broadcast(
      banded.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"), col("band"), col("key")))
    val seeds = banded.join(qb, Seq("band", "key"))
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id")
      .distinct()
    var visited = score(seeds).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val beam = visited
        .groupBy("query_id")
        .agg(expr(s"graft_topk(cos, id, $beamWidth)").as("tk"))
        .select(col("query_id"), explode(col("tk")).as("e"))
        .select(col("query_id"), col("e.id").as("id"))
      val fresh = broadcast(beam).join(g, beam("id") === g("src"))
        .select(col("query_id"), col("dst").as("id"))
        .filter(col("id") =!= col("query_id"))
        .distinct()
        .join(visited.select("query_id", "id"), Seq("query_id", "id"), "left_anti")
      visited = visited.unionByName(score(fresh)).localCheckpoint(true)
    }
    (rankTopK(visited, k), visited.count())
  }

  /** Split (id, v) into per-subspace rows (id, sub, sv): sub ∈ [0, m),
    * sv = the subDim-length slice of v starting at sub·subDim.
    */
  private[operators] def subvectors(df: DataFrame, m: Int, subDim: Int): DataFrame =
    df.select(col("id"), expr(
      s"""explode(transform(sequence(0, ${m - 1}),
            s -> struct(s AS sub, slice(v, s * $subDim + 1, $subDim) AS sv)))""").as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"))

  /** Squared-L2 between the row's `sv` and `cv` columns: ascending-index
    * fold, so Spark's HOF evaluation and DuckDB's `list_sum(list_transform)`
    * produce bit-identical doubles (the same portability contract as
    * [[graft.functions.DotProduct]]).
    */
  private[operators] val subL2: String =
    "aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, p) -> acc + p)"

  /** Product quantization (PQ) approximate top-k: vectors are chopped into
    * `m` subspaces; each subspace gets its own `nCodes`-entry codebook
    * (trained Lloyd, like the IVF index); a corpus vector is stored as just
    * its m code ids. A query precomputes an m × nCodes distance lookup
    * table, scores every corpus vector by the INTEGER sum of m table
    * lookups (asymmetric distance, ADC), keeps the `k·candMult` best per
    * query with the bounded [[graft.functions.TopKByScore]] aggregate, and
    * exact-re-ranks only those by true cosine.
    *
    * Why this exists next to IVF/LSH: PQ bounds MEMORY, not just candidate
    * volume — m codes ≈ m bytes per vector vs dim·4 raw (32× here), so the
    * scannable index for a 100 TB embedding corpus fits a cluster's RAM.
    * The scale shape: codebooks are bounded driver state (m·nCodes·subDim
    * doubles — the k3 centroid contract), training scans only the 1/8 hash
    * sample, encoding is one corpus pass whose (id, sub) partial aggregates
    * collapse map-side (the code table is built ONCE, then persisted in a
    * real deployment), and the query-time LUT join broadcasts
    * |queries|·m·nCodes rows — the corpus never shuffles its vectors, and
    * no stage holds more than k·candMult ids per query.
    *
    * Determinism/oracle: subspace distances are ascending-index folds;
    * assignment ties break on the smaller cid (`min_by(cid, struct(d2,
    * cid))`); per-subspace query distances are floor-micro-quantized to
    * BIGINT before the ADC sum, so the sum is associative integer math any
    * engine reproduces — the k4 oracle replays training, encoding, ADC and
    * re-rank in SQL.
    */
  def pqTopKCosine(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      m: Int = 8,
      nCodes: Int = 16,
      nIter: Int = 2,
      candMult: Int = 10,
      dim: Int = 64): DataFrame = {
    val v = asVectors(embeddings)
    val (vn, codebook, codes) = pqCodes(v, m, nCodes, nIter, dim)
    val subDim = dim / m
    // query LUT: micro-quantized distance to EVERY (sub, cid)
    val qd = broadcast(
      subvectors(vn.filter(col("id").isin(queryIds: _*)), m, subDim)
        .withColumnRenamed("id", "query_id")
        .join(codebook, "sub")
        .select(col("query_id"), col("sub"), col("cid").as("code"),
          expr(s"CAST(floor($subL2 * 1000000) AS BIGINT)").as("d_micro")))
    // ADC score: associative integer sum of the m lookups
    val adc = codes.join(qd, Seq("sub", "code"))
      .filter(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("d_micro")).as("adc"))
    // bounded per-query shortlist: smallest ADC first (score = −adc)
    val cand = adc
      .groupBy("query_id")
      .agg(expr(s"graft_topk(CAST(-adc AS DOUBLE), id, ${k * candMult})").as("tk"))
      .select(col("query_id"), explode(col("tk.id")).as("id"))
    rerank(cand, v, queryIds, k)
  }

  /** L2-normalize (id, v) rows — the cosine-metric precondition for PQ:
    * on unit vectors ‖a−b‖² = 2 − 2·cos, so the subspace-decomposed L2 the
    * codebooks quantize is monotone in the cosine the re-rank targets
    * (without this the ADC ordering mixes in vector norms and recall
    * collapses).
    */
  private[operators] def normalizeVectors(v: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(v.sparkSession)
    v.select(col("id"),
      expr("transform(v, x -> x / sqrt(graft_dot(v, v)))").as("v"))
  }

  /** Encode vectors against a FROZEN codebook: chop each L2-normalized
    * vector into its m subspaces and take the nearest code per subspace
    * (min_by on (d2, cid) — the deterministic tie-break shared with
    * training). One map-side pass; the (id, sub) regroup collapses
    * map-side since all m rows of an id originate in the same partition.
    * This is the absorption step of the persisted index ([[VectorIndex]]):
    * new vectors are encoded with the trained quantizer, FAISS `add`
    * semantics.
    */
  private[operators] def pqEncode(
      v: DataFrame,
      codebook: DataFrame,
      m: Int,
      dim: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val subDim = dim / m
    // bake the bounded (sub, cid, cv) relation into one native
    // all-subspaces encode ([[graft.functions.PqNearestCodes]]) — the
    // explode + broadcast-join + min_by re-agg formulation materialized
    // n·m·nCodes subvector-carrying rows; this is one map-only pass
    // emitting m codes per row. Value-identical (spec-pinned): same
    // ascending d² fold, same min_by (d2, cid) nan-safe tie-break.
    val rows = codebook.select(col("sub"), col("cid"), col("cv")).collect()
    val bySub = rows.groupBy(_.getInt(0))
    require((0 until m).forall(bySub.contains), "codebook must cover every subspace")
    val offsets = new Array[Int](m + 1)
    (0 until m).foreach(s => offsets(s + 1) = offsets(s) + bySub(s).length)
    val cids = new Array[Long](rows.length)
    val matrix = new Array[Double](rows.length * subDim)
    var j = 0
    (0 until m).foreach { s =>
      bySub(s).sortBy(_.getLong(1)).foreach { r =>
        cids(j) = r.getLong(1)
        val cv = r.getSeq[Double](2)
        require(cv.length == subDim,
          s"codebook entry of subspace $s has ${cv.length} dims, want $subDim")
        var i = 0
        while (i < subDim) { matrix(j * subDim + i) = cv(i); i += 1 }
        j += 1
      }
    }
    val fn = s"graft_pq_codes_${contentKey(cids, matrix)}"
    v.sparkSession.sessionState.functionRegistry
      .createOrReplaceTempFunction(fn, { children =>
        require(children.length == 1, s"$fn expects (vector)")
        graft.functions.PqNearestCodes(children.head, offsets, cids, matrix, m, subDim)
      }, "built-in")
    normalizeVectors(v)
      .select(col("id"), posexplode(expr(s"$fn(v)")).as(Seq("sub", "code")))
  }

  /** Train the m per-subspace PQ codebooks over `v` (Lloyd on the ~1/8
    * hash sample, md5-order seeds) and return the driver-materialized
    * (sub, cid, cv) relation — the bounded artifact [[VectorIndex]]
    * persists and [[pqCodes]] uses inline.
    */
  private[operators] def pqCodebook(
      v: DataFrame,
      m: Int,
      nCodes: Int,
      nIter: Int,
      dim: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val subDim = dim / m
    graft.functions.GraftFunctions.register(v.sparkSession)
    val vn = normalizeVectors(v)
    val sv = subvectors(vn, m, subDim)
    // training sample + seeds: the k3 conventions (md5 hash sample; seeds
    // by md5 order over the FULL corpus so tiny corpora still seed fully)
    val svt = sv.filter(md5(col("id").cast("string")) < lit("2"))
    val seedIds = v.orderBy(md5(col("id").cast("string")), col("id"))
      .limit(nCodes).select(col("id").as("cid"))
    val seeds = sv.join(broadcast(seedIds), sv("id") === seedIds("cid"))
      .select(col("sub"), col("cid"), col("sv").as("cv"))

    // one Lloyd iteration over every subspace at once (keyed by (sub, cid)):
    // nearest-code assignment, then micro-quantized integer means; empty
    // cells keep their previous centroid via the LEFT join
    def lloydSub(cents: DataFrame): DataFrame = {
      val assign = svt.join(broadcast(cents), "sub")
        .withColumn("d2", expr(subL2))
        .groupBy(col("id"), col("sub"))
        .agg(expr("min_by(cid, struct(d2, cid))").as("cid"))
      val sums = svt.join(assign, Seq("id", "sub"))
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("d", "x")))
        .groupBy("sub", "cid", "d")
        .agg(
          sum(expr("CAST(floor(x * 1000000) AS BIGINT)")).as("s"),
          count(lit(1)).as("n"))
      val means = sums.groupBy("sub", "cid")
        .agg(expr(
          """transform(
               array_sort(collect_list(struct(d, CAST(s AS DOUBLE) / (n * 1000000.0D) AS mv))),
               p -> p.mv)""").as("nv"))
      cents.join(means, Seq("sub", "cid"), "left")
        .select(col("sub"), col("cid"), coalesce(col("nv"), col("cv")).as("cv"))
    }
    // bounded driver state per round: m · nCodes · subDim doubles
    def materialize(cents: DataFrame): DataFrame = {
      val spark = cents.sparkSession
      val rows = cents.select(col("sub"), col("cid"), col("cv")).collect().toIndexedSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), cents.schema)
    }
    (0 until nIter).foldLeft(materialize(seeds))((c, _) =>
      materialize(lloydSub(c)))
  }

  /** The PQ fine quantizer, shared by [[pqTopKCosine]] and
    * [[ivfPqTopKCosine]]: trains the m per-subspace codebooks and encodes
    * the full corpus. Returns `(vn, codebook, codes)` — the L2-normalized
    * vectors, the broadcast (sub, cid, cv) codebook, and the (id, sub, code)
    * corpus encoding.
    */
  private def pqCodes(
      v: DataFrame,
      m: Int,
      nCodes: Int,
      nIter: Int,
      dim: Int): (DataFrame, DataFrame, DataFrame) = {
    val codebook = broadcast(pqCodebook(v, m, nCodes, nIter, dim))
    (normalizeVectors(v), codebook, pqEncode(v, codebook, m, dim))
  }

  /** IVF-PQ approximate top-k (k8): the two index legs composed the way
    * billion-scale ANN systems ship them — an IVF coarse quantizer bounds
    * CANDIDATE VOLUME (a query touches ~nProbe/nCentroids of the corpus)
    * while PQ codes bound MEMORY (m small codes per vector instead of dim·4
    * bytes), and only the ADC-shortlisted survivors are exact-re-ranked.
    * k3 alone still scans raw vectors inside probed cells; k4 alone
    * ADC-scans the WHOLE corpus; the composition does neither.
    *
    * This is the FAISS `IndexIVFPQ` shape with `by_residual=false` (a real,
    * documented configuration): codes quantize the L2-normalized vectors
    * themselves against ONE global codebook rather than per-cell residuals.
    * The trade — residual encoding squeezes more accuracy from the same
    * code budget; a global codebook keeps the query LUT cell-independent
    * (m·nCodes entries total, not per probed cell) and the whole pipeline
    * exactly SQL-replayable. The exact re-rank restores ranking fidelity on
    * the shortlist either way.
    *
    * Scale shape: coarse assignment is a map-side max_by over broadcast
    * centroids (k3's contract), codes are built once in one corpus pass
    * (k4's contract), the candidate restriction is one broadcast equi-join
    * of the ≤|q|·nProbe probe list against the cell assignment, and the ADC
    * sum + `graft_topk` shortlist never hold more than k·candMult ids per
    * query. The corpus never shuffles raw vectors.
    */
  def ivfPqTopKCosine(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nCentroids: Int = 32,
      nProbe: Int = 8,
      ivfIter: Int = 2,
      m: Int = 8,
      nCodes: Int = 16,
      pqIter: Int = 2,
      candMult: Int = 10,
      dim: Int = 64): DataFrame = {
    val v = asVectors(embeddings)
    val (assign, qProbes) = ivfCoarse(v, queryIds, nCentroids, nProbe, ivfIter)
    val (vn, codebook, codes) = pqCodes(v, m, nCodes, pqIter, dim)
    val subDim = dim / m
    // the IVF restriction: candidates = members of the query's probed cells
    val cellCand = broadcast(qProbes).join(assign, "cid")
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"))
    // query LUT (cell-independent, the by_residual=false payoff): one
    // micro-quantized distance per (query, sub, code)
    val qd = broadcast(
      subvectors(vn.filter(col("id").isin(queryIds: _*)), m, subDim)
        .withColumnRenamed("id", "query_id")
        .join(codebook, "sub")
        .select(col("query_id"), col("sub"), col("cid").as("code"),
          expr(s"CAST(floor($subL2 * 1000000) AS BIGINT)").as("d_micro")))
    // ADC over probed-cell members only
    val adc = cellCand.join(codes, "id")
      .join(qd, Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("d_micro")).as("adc"))
    val cand = adc
      .groupBy("query_id")
      .agg(expr(s"graft_topk(CAST(-adc AS DOUBLE), id, ${k * candMult})").as("tk"))
      .select(col("query_id"), explode(col("tk.id")).as("id"))
    rerank(cand, v, queryIds, k)
  }
}
