package graft.core

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class VacuumSpec extends SparkSpec {

  import spark.implicits._

  private def touch(path: String, bytes: Int = 4): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), Array.fill(bytes)(0x42.toByte))
  }

  test("crash-injected staging debris is removed; committed state rows unchanged") {
    val state = tmpDir("graft_vacuum_state") + "/profile"
    // a committed bucketed state table, the st8/st9 shape
    Seq((1L, 10L), (2L, 20L)).toDF("user_id", "value_milli")
      .withColumn("bucket", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.lit(4)).cast("int"))
      .write.partitionBy("bucket").parquet(state)
    val before = spark.read.parquet(state).orderBy("user_id").collect().toSeq

    // crash debris: a dynamic-overwrite staging dir and a committer
    // _temporary tree, both with orphan part files inside
    touch(s"$state/.spark-staging-7af3/bucket=1/part-00000.parquet", 128)
    touch(s"$state/_temporary/0/task_0001/part-00001.parquet", 64)

    val r = Vacuum.vacuum(spark, state)
    assert(r.filesDeleted == 2 && r.bytesDeleted == 192,
      s"expected exactly the 2 injected orphans swept, got $r")
    assert(!Files.exists(Paths.get(s"$state/.spark-staging-7af3")))
    assert(!Files.exists(Paths.get(s"$state/_temporary")))
    val after = spark.read.parquet(state).orderBy("user_id").collect().toSeq
    assert(after == before, "vacuum changed committed state rows")
    // second run is a no-op
    assert(Vacuum.vacuum(spark, state) == Vacuum.VacuumReport(0, 0, 0))
  }

  test("uncommitted batch= partition (no _SUCCESS fence) is swept; committed fences survive") {
    val index = tmpDir("graft_vacuum_index") + "/index"
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "eta theta iota kappa lambda mu")).toDF("doc_id", "text")
    graft.operators.Dedup.writeIndex(docs, index)
    graft.operators.Dedup.appendToIndex(index, docs, "day1")
    // crashed append: a batch dir whose writer died before its _SUCCESS
    touch(s"$index/sets/batch=day2/part-00000.parquet", 256)

    val committedBatches = Seq("base", "day1")
    val r = Vacuum.vacuum(spark, index)
    assert(r.dirsDeleted >= 1 && r.filesDeleted == 1 && r.bytesDeleted == 256,
      s"expected only the fence-less batch dir swept, got $r")
    assert(!Files.exists(Paths.get(s"$index/sets/batch=day2")))
    for (b <- committedBatches) {
      assert(Files.exists(Paths.get(s"$index/sets/batch=$b/_SUCCESS")),
        s"committed batch $b lost its fence")
      assert(Files.exists(Paths.get(s"$index/bands/batch=$b/_SUCCESS")))
    }
    // the surviving index still answers the incremental query
    val delta = Seq((3L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val hits = graft.operators.Dedup.incrementalFromIndex(spark, index, delta)
    assert(hits.count() >= 1, "vacuumed index no longer serves queries")
  }

  test("a plain partitionBy(batch) table with a root-level _SUCCESS is never fence-gated") {
    val root = tmpDir("graft_vacuum_plainbatch") + "/t"
    // standard Spark table partitioned BY a column named batch: the
    // committer writes ONE _SUCCESS at the root; partition dirs have none
    Seq((1L, "b0"), (2L, "b1")).toDF("id", "batch")
      .write.partitionBy("batch").parquet(root)
    assert(Files.exists(Paths.get(s"$root/_SUCCESS")))
    assert(!Files.exists(Paths.get(s"$root/batch=b0/_SUCCESS")))
    val before = spark.read.parquet(root).orderBy("id").collect().toSeq
    val r = Vacuum.vacuum(spark, root)
    assert(r == Vacuum.VacuumReport(0, 0, 0),
      s"vacuum destroyed committed partitions of a plain batch-partitioned table: $r")
    assert(spark.read.parquet(root).orderBy("id").collect().toSeq == before)
  }

  test("grace window protects young debris; dry run reports without deleting") {
    val root = tmpDir("graft_vacuum_grace") + "/t"
    touch(s"$root/_temporary/0/part-00000.parquet", 32)
    // dry run: counted, not deleted
    val dry = Vacuum.vacuum(spark, root, dryRun = true)
    assert(dry.filesDeleted == 1 && dry.bytesDeleted == 32)
    assert(Files.exists(Paths.get(s"$root/_temporary/0/part-00000.parquet")),
      "dry run deleted files")
    // freshly-written debris is inside any reasonable grace window → kept
    val young = Vacuum.vacuum(spark, root, graceMs = 60 * 60 * 1000L)
    assert(young == Vacuum.VacuumReport(0, 0, 0), s"grace window ignored: $young")
    assert(Files.exists(Paths.get(s"$root/_temporary/0/part-00000.parquet")))
    // grace elapsed → swept
    val swept = Vacuum.vacuum(spark, root, graceMs = 0L)
    assert(swept.filesDeleted == 1)
    assert(!Files.exists(Paths.get(s"$root/_temporary")))
  }
}
