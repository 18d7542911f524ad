package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  import spark.implicits._

  // (key, ts-second, seq, label)
  private def frame(rows: Seq[(Long, Long, Long, String)]) =
    rows.toDF("user_id", "sec", "event_id", "label")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .select("user_id", "ts", "event_id", "label")

  private def run(left: Seq[(Long, Long, Long, String)],
                  right: Seq[(Long, Long, Long, String)]) =
    Joins.asofJoin(
      frame(left), frame(right),
      keyCol = "user_id", tsCol = "ts", seqCol = "event_id",
      leftCols = Seq("event_id", "user_id", "ts"),
      rightCols = Seq("event_id", "label"),
      rightPrefix = "m_")
      .select(col("event_id"), col("m_event_id"), col("m_label"))
      .collect().map(r =>
        r.getLong(0) ->
          ((if (r.isNullAt(1)) -1L else r.getLong(1),
            if (r.isNullAt(2)) "" else r.getString(2))))
      .toMap

  test("asofJoin: latest right row at or before each left row, per key") {
    val out = run(
      left = Seq((1L, 100L, 10L, "l"), (1L, 200L, 11L, "l"), (2L, 150L, 12L, "l")),
      right = Seq((1L, 50L, 1L, "a"), (1L, 150L, 2L, "b"), (2L, 151L, 3L, "c")))
    assert(out(10L) == ((1L, "a")))   // only ts=50 precedes ts=100
    assert(out(11L) == ((2L, "b")))   // ts=150 is the latest <= 200
    assert(out(12L) == ((-1L, "")))   // right at ts=151 is AFTER the left row
  }

  test("asofJoin: inclusive tie on ts, and same-ts right rows pick max seq") {
    val out = run(
      left = Seq((1L, 100L, 10L, "l")),
      right = Seq((1L, 100L, 1L, "a"), (1L, 100L, 2L, "b"), (1L, 99L, 3L, "c")))
    // equal-ts right rows are visible (inclusive), and seq=2 wins the tie
    assert(out(10L) == ((2L, "b")))
  }

  test("asofJoin: left-outer — keys with no right rows keep nulls") {
    val out = run(
      left = Seq((7L, 100L, 10L, "l")),
      right = Seq((8L, 50L, 1L, "a")))
    assert(out(10L) == ((-1L, "")))
  }

  test("rangeJoin: equals the brute-force theta join, boundary inclusive") {
    val ev = graft.core.Tables.load(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("ts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("ts"))
    val banded = Joins.rangeJoin(p, e, "ts", 60L, Seq("pid"), Seq("eid"), "")
      .select("pid", "eid", "gap_micros")
    val brute = p.as("p").join(e.as("e"),
        abs(unix_micros(col("e.ts")) - unix_micros(col("p.ts"))) <= 60000000L)
      .select(col("pid"), col("eid"),
        (unix_micros(col("e.ts")) - unix_micros(col("p.ts"))).as("gap_micros"))
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty)
    // exact-boundary pair (gap == maxGap) must match: synthetic check
    import spark.implicits._
    val a = Seq((1L, 0L)).toDF("pid", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val b = Seq((2L, 60L), (3L, 61L)).toDF("eid", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = Joins.rangeJoin(a, b, "ts", 60L, Seq("pid"), Seq("eid"), "")
      .select("eid").collect().map(_.getLong(0)).toSet
    assert(out == Set(2L)) // 60s in, 61s out
  }

  test("rangeJoin: plans as a shuffle equi-join on the bucket, not BNLJ") {
    val ev = graft.core.Tables.load(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("ts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("ts"))
    val plan = Joins.rangeJoin(p, e, "ts", 60L, Seq("pid"), Seq("eid"), "")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("upsert: update wins row-wise (incl. nulls), insert added, rest kept") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val updates = Seq((2L, null.asInstanceOf[String], 99.0), (9L, "new", 0.0))
      .toDF("k", "name", "bal")
    val out = Joins.upsert(base, updates, "k")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)).getOrElse("<null>"), r.getDouble(2)))).toMap
    assert(out.size == 4)
    assert(out(1L) == (("a", 10.0)))          // untouched
    assert(out(2L) == (("<null>", 99.0)))     // update's NULL wins
    assert(out(3L) == (("c", 30.0)))          // untouched
    assert(out(9L) == (("new", 0.0)))         // inserted
  }

  test("saltedJoin: identical result to the plain join on skewed data") {
    import spark.implicits._
    // heavy skew: 900 of 1000 left rows share key 1
    val left = (1L to 1000L).map(i => (if (i <= 900) 1L else i, i))
      .toDF("k", "row_id")
    val right = Seq((1L, "hot"), (950L, "cold"), (2L, "unmatched-side"))
      .toDF("k", "label")
    val salted = Joins.saltedJoin(left, right, "k", salts = 8, leftSeedCol = "row_id")
      .select("k", "row_id", "label")
    val plain = left.join(right, "k").select("k", "row_id", "label")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(plain.count() == 901)
    // the hot key genuinely fans out over multiple salts
    val saltsUsed = left.filter(col("k") === 1L)
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8L)))
      .select("__salt").distinct().count()
    assert(saltsUsed > 1)
  }

  test("bucketed tables join with zero shuffle exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS graft_bt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bt_customer")
      val orders = graft.core.Tables.load(spark, sf, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val customer = graft.core.Tables.load(spark, sf, "customer")
        .select("c_custkey", "c_name")
      graft.core.Bucketing.writeBucketed(orders, "graft_bt_orders", "o_custkey", 4)
      graft.core.Bucketing.writeBucketed(customer, "graft_bt_customer", "c_custkey", 4)
      val joined = spark.table("graft_bt_orders")
        .join(spark.table("graft_bt_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bt_customer")
    }
  }

  test("asofJoin: randomized pin vs per-row brute force (deterministic seeds)") {
    import spark.implicits._
    // deterministic pseudo-random fixtures: ts collisions guaranteed by a
    // tiny time domain, several keys, both sides sharing the domain
    for (seed <- Seq(7L, 23L, 91L)) {
      val rnd = new scala.util.Random(seed)
      val left = (1L to 120L).map(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(12).toLong, i, s"l$i"))
      val right = (1L to 80L).map(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(12).toLong, 1000L + i, s"r$i"))
      val out = run(left, right)
      // brute force: per left row, the right rows with (ts < lts) or
      // (ts == lts) [inclusive], max by (ts, seq)
      left.foreach { case (k, lts, lseq, _) =>
        val cands = right.filter(r => r._1 == k && r._2 <= lts)
        val want =
          if (cands.isEmpty) (-1L, "")
          else { val m = cands.maxBy(r => (r._2, r._3)); (m._3, m._4) }
        assert(out(lseq) == want, s"seed=$seed left seq=$lseq")
      }
    }
  }

  test("asofJoin: one shuffle on the key, no cartesian/range residue") {
    val plan = Joins.asofJoin(
      frame(Seq((1L, 100L, 10L, "l"))), frame(Seq((1L, 50L, 1L, "a"))),
      "user_id", "ts", "event_id", Seq("event_id"), Seq("event_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the physical plan is union -> window (sort within key partitions)
    assert(plan.contains("Window"))
  }

  test("scd2Historize: dup collapse, validity ranges, same-ts last-wins, null-safe attrs") {
    import spark.implicits._
    val changes = Seq(
      (1L, 10L, 1L, Some("a")),  // opens a
      (1L, 20L, 2L, Some("a")),  // duplicate delivery -> collapsed
      (1L, 30L, 3L, Some("b")),  // a->b: a closes at 30
      (2L, 10L, 4L, Some("x")),  // same-ts pair: y (higher seq) wins,
      (2L, 10L, 5L, Some("y")),  //   x's zero-width version drops
      (3L, 10L, 6L, None),       // null attr opens a version
      (3L, 20L, 7L, None),       // null <=> null -> collapse
      (3L, 30L, 8L, Some("z"))
    ).toDF("k", "sec", "seq", "attr")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = Joins.scd2Historize(changes, "k", "ts", "seq", Seq("attr"))
      .selectExpr("k", "attr", "unix_seconds(effective_from) AS ef",
        "unix_seconds(effective_to) AS et", "is_current")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("<null>"),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      (1L, "a", 10L, 30L, false), (1L, "b", 30L, -1L, true),
      (2L, "y", 10L, -1L, true),
      (3L, "<null>", 10L, 30L, false), (3L, "z", 30L, -1L, true)))
  }

  test("bloom kernel: no false negatives, FP rate near design point") {
    import graft.functions.GraftBloom
    val numBits = 1 << 14 // 16384 bits for 1000 keys ≈ 16 bits/key
    val words = new Array[Long](numBits / 64)
    (0L until 1000L).foreach(k => GraftBloom.setBits(words, k * 7919L, 7))
    val bytes = GraftBloom.serialize(words, 7)
    // every inserted key answers true — Bloom's hard guarantee
    assert((0L until 1000L).forall(k => GraftBloom.mightContain(bytes, k * 7919L)))
    // non-members: expect ~0.2% FPs at 16 bits/key, k=7; allow generous slack
    val fps = (1L to 20000L).count(k => GraftBloom.mightContain(bytes, -k))
    assert(fps < 200, s"false-positive rate too high: $fps / 20000")
  }

  test("bloomPrunedSemiJoin: identical rows to the plain semi join, even undersized") {
    val orders = graft.core.Tables.load(spark, sf, "orders")
    val lineitem = graft.core.Tables.load(spark, sf, "lineitem")
    val build = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val plain = lineitem.join(
      build, col("l_orderkey") === col("o_orderkey"), "left_semi")
    // a deliberately tiny filter (64 bits for ~hundreds of keys) floods the
    // probe with false positives — the exact join must still remove them all
    for (bits <- Seq(64, 1 << 20)) {
      val pruned = Joins.bloomPrunedSemiJoin(
        lineitem, build, "l_orderkey", "o_orderkey", numBits = bits)
      assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty,
        s"bloom-pruned semi join diverged at numBits=$bits")
    }
  }

  test("bloomPrunedSemiJoin: probe filter sits in the plan before the semi join") {
    val orders = graft.core.Tables.load(spark, sf, "orders")
    val lineitem = graft.core.Tables.load(spark, sf, "lineitem")
    val build = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val plan = Joins.bloomPrunedSemiJoin(
      lineitem, build, "l_orderkey", "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"),
      s"bloom probe missing from the plan:\n$plan")
    assert(plan.contains("LeftSemi"), s"exact semi join missing:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("snapshotDiff: I/U/D classification, null transitions count as U, unchanged silent") {
    import spark.implicits._
    val old = Seq(
      (1L, Some("a"), 10L),  // unchanged
      (2L, Some("b"), 20L),  // value update
      (3L, Some("c"), 30L),  // deleted
      (4L, None: Option[String], 40L), // null -> value (U)
      (5L, Some("e"), 50L))  // value -> null (U)
      .toDF("k", "s", "n")
    val neu = Seq(
      (1L, Some("a"), 10L),
      (2L, Some("B"), 20L),
      (4L, Some("d"), 40L),
      (5L, None: Option[String], 50L),
      (6L, Some("f"), 60L))  // inserted
      .toDF("k", "s", "n")
    val out = Joins.snapshotDiff(old, neu, "k").collect()
      .map(r => r.getLong(1) -> (r.getString(0), Option(r.getString(2)), r.getLong(3))).toMap
    assert(!out.contains(1L), "unchanged row leaked into the changelog")
    assert(out(2L) == (("U", Some("B"), 20L)))
    assert(out(3L) == (("D", Some("c"), 30L)), "delete must carry the old image")
    assert(out(4L) == (("U", Some("d"), 40L)), "null -> value must be an update")
    assert(out(5L) == (("U", None, 50L)), "value -> null must be an update CARRYING the null")
    assert(out(6L) == (("I", Some("f"), 60L)))
    assert(out.size == 5)
  }

  test("snapshotDiff round-trip: applying the changelog through upsert reconstructs v2") {
    import spark.implicits._
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "n")
    val v2 = Seq((1L, "a", 10L), (2L, "B", 21L), (4L, "d", 40L))
      .toDF("k", "s", "n")
    val diff = Joins.snapshotDiff(v1, v2, "k").cache()
    // I/U rows feed the J3 upsert; D keys anti-join away — the changelog
    // plus the old version is exactly the new version
    val applied = Joins.upsert(
      v1, diff.filter(col("op") =!= "D").drop("op"), "k")
      .join(diff.filter(col("op") === "D").select("k"), Seq("k"), "left_anti")
    assert(applied.exceptAll(v2).isEmpty && v2.exceptAll(applied).isEmpty,
      "changelog application does not reconstruct the new snapshot")
  }

  test("intervalCoalesce: chain/touch/nest merge, gaps split, duplicates counted, one sort") {
    import spark.implicits._
    val iv = Seq(
      // key 1: [0,10] chains [5,20], [20,30] touches (closed: merges),
      // [25,28] nests -> ONE island of 4; [40,50] after a gap -> island 2
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L), (1L, 25L, 28L), (1L, 40L, 50L),
      // key 2: exact duplicates share an island and both count
      (2L, 0L, 5L), (2L, 0L, 5L), (2L, 7L, 9L))
      .toDF("key", "start", "end")
    val out = Joins.intervalCoalesce(iv).cache()
    val k1 = out.filter(col("key") === 1).orderBy("island").collect()
    assert(k1.length == 2)
    assert(k1(0).getLong(2) == 0L && k1(0).getLong(3) == 30L && k1(0).getLong(4) == 4L)
    assert(k1(1).getLong(2) == 40L && k1(1).getLong(3) == 50L && k1(1).getLong(4) == 1L)
    val k2 = out.filter(col("key") === 2).orderBy("island").collect()
    assert(k2.length == 2)
    assert(k2(0).getLong(2) == 0L && k2(0).getLong(3) == 5L && k2(0).getLong(4) == 2L)
    assert(k2(1).getLong(2) == 7L && k2(1).getLong(3) == 9L && k2(1).getLong(4) == 1L)
    // islands of a key never overlap and always leave a real gap
    val adj = out.as("a").join(out.as("b"),
        col("a.key") === col("b.key") && col("a.island") + 1 === col("b.island"))
      .filter(col("b.window_start") <= col("a.window_end"))
    assert(adj.count() == 0, "adjacent islands overlap or touch")
    // both window frames ride ONE sort: exactly one Sort operator in the
    // (final) plan — AQE prints Final + Initial sections, slice the first
    val plan = Joins.intervalCoalesce(iv).queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.split("Sort \\[").length - 1 == 1,
      s"island derivation re-sorts per frame:\n$plan")
  }
}
