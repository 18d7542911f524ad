package graft.sources

import graft.SparkSpec
import graft.core.ManifestTable
import org.apache.spark.sql.functions._

/** COLUMN MAPPING (round 19 — SURVEY §9 #2): RENAME COLUMN is
  * metadata-only (logical ↔ physical indirection in the descriptor; old
  * files keep reading, new writes keep the physical name), DROP COLUMN
  * is a mapping removal (files keep the bytes; reads stop serving it).
  */
class ColumnMappingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse = tmpDir("graft_cmap_wh")

  private def register(name: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", warehouse)
  }

  test("rename lifecycle: metadata-only, spans old and new files, zone maps keep pruning, COW verbs work on the new name") {
    register("gcm1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcm1.m")
    spark.sql("CREATE TABLE gcm1.m.docs (k BIGINT, v STRING, n BIGINT, " +
      "part STRING) USING `graft-manifest` OPTIONS (statsColumns 'n') " +
      "PARTITIONED BY (part)")
    spark.sql("INSERT INTO gcm1.m.docs VALUES " +
      "(1, 'a', 100, 'p0'), (2, 'b', 200, 'p1'), (3, 'c', 300, 'p2')")
    val vBefore =
      ManifestTable.currentVersion(spark, s"$warehouse/m/docs")
    spark.sql("ALTER TABLE gcm1.m.docs RENAME COLUMN n TO chars")
    // metadata-only: NO new manifest version
    assert(ManifestTable.currentVersion(
      spark, s"$warehouse/m/docs") == vBefore)
    // old files read under the new name
    assert(spark.sql("SELECT chars FROM gcm1.m.docs WHERE k = 1")
      .head.getLong(0) == 100L)
    assert(!spark.table("gcm1.m.docs").schema.fieldNames.contains("n"))
    // new writes carry the NEW logical name in the frame; the files keep
    // the physical one — a read then spans both file generations
    spark.sql("INSERT INTO gcm1.m.docs VALUES (4, 'd', 400, 'p3')")
    assert(spark.sql(
      "SELECT sum(chars) FROM gcm1.m.docs").head.getLong(0) == 1000L)
    // the zone map registered under the PHYSICAL name still prunes a
    // filter on the LOGICAL name
    val q = spark.sql("SELECT k FROM gcm1.m.docs WHERE chars >= 400")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(4L))
    val scan = q.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if b.scan.isInstanceOf[GraftManifestScan] =>
        b.scan.asInstanceOf[GraftManifestScan]
    }.head
    assert(scan.chosenFiles.size < scan.totalFiles,
      s"zone pruning must survive the rename: ${scan.chosenFiles}")
    // COW verbs address the new name
    spark.sql("UPDATE gcm1.m.docs SET chars = chars + 1 WHERE k = 2")
    assert(spark.sql("SELECT chars FROM gcm1.m.docs WHERE k = 2")
      .head.getLong(0) == 201L)
    spark.sql("DELETE FROM gcm1.m.docs WHERE chars IN (300)")
    assert(spark.sql("SELECT count(*) FROM gcm1.m.docs")
      .head.getLong(0) == 3L)
    // physical layout: parquet files carry 'n', never 'chars'
    val aFile = ManifestTable.read(spark, s"$warehouse/m/docs")
    assert(aFile.isDefined) // the raw Scala road still serves physical
  }

  test("drop lifecycle: the column disappears, files keep the bytes, re-adding the name is a NEW column (old bytes stay dead — round 20)") {
    register("gcm2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcm2.m")
    spark.sql("CREATE TABLE gcm2.m.t2 (k BIGINT, v STRING, part STRING) " +
      "USING `graft-manifest` PARTITIONED BY (part)")
    spark.sql("INSERT INTO gcm2.m.t2 VALUES (1, 'keep?', 'p0')")
    spark.sql("ALTER TABLE gcm2.m.t2 DROP COLUMN v")
    assert(spark.table("gcm2.m.t2").schema.fieldNames.toSeq ==
      Seq("k", "part"))
    assert(spark.sql("SELECT * FROM gcm2.m.t2").columns.toSeq ==
      Seq("k", "part"))
    // writes no longer carry it
    spark.sql("INSERT INTO gcm2.m.t2 VALUES (2, 'p1')")
    assert(spark.sql("SELECT count(*) FROM gcm2.m.t2").head.getLong(0) == 2L)
    // RE-ADDING the dropped name works and is a NEW column (round 20 —
    // the field-ids move spelled through column mapping): the occupied
    // physical slot stays dead, the new column stores under a fresh
    // generated physical name, so pre-re-add files serve NULL — the old
    // 'keep?' value never resurfaces
    spark.sql("ALTER TABLE gcm2.m.t2 ADD COLUMN v STRING")
    assert(spark.sql("SELECT v FROM gcm2.m.t2 WHERE k = 1")
      .head.isNullAt(0), "the dropped storage must not resurface")
    assert(spark.sql("SELECT v FROM gcm2.m.t2 WHERE k = 2")
      .head.isNullAt(0))
    // new writes serve the new column normally, spanning generations
    spark.sql("INSERT INTO gcm2.m.t2 VALUES (3, 'fresh', 'p2')")
    assert(spark.sql("SELECT v FROM gcm2.m.t2 WHERE k = 3")
      .head.getString(0) == "fresh")
    assert(spark.sql("SELECT count(*) FROM gcm2.m.t2 WHERE v IS NULL")
      .head.getLong(0) == 2L)
    // a second drop -> re-add cycle allocates yet another generation
    spark.sql("ALTER TABLE gcm2.m.t2 DROP COLUMN v")
    spark.sql("ALTER TABLE gcm2.m.t2 ADD COLUMN v STRING")
    assert(spark.sql("SELECT count(*) FROM gcm2.m.t2 WHERE v IS NULL")
      .head.getLong(0) == 3L, "both prior generations' bytes stay dead")
    // a DIFFERENT name still adds fine
    spark.sql("ALTER TABLE gcm2.m.t2 ADD COLUMN v2 STRING")
    assert(spark.sql("SELECT v2 FROM gcm2.m.t2 WHERE k = 1")
      .head.isNullAt(0))
  }

  test("versioned logical schema: time travel reads each version under the names it had THEN") {
    register("gcm4")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcm4.m")
    spark.sql("CREATE TABLE gcm4.m.vs (k BIGINT, n BIGINT, part STRING) " +
      "USING `graft-manifest` PARTITIONED BY (part)")
    spark.sql("INSERT INTO gcm4.m.vs VALUES (1, 10, 'p0')") // v0
    spark.sql("ALTER TABLE gcm4.m.vs RENAME COLUMN n TO m") // snapshot @0
    spark.sql("INSERT INTO gcm4.m.vs VALUES (2, 20, 'p1')") // v1
    spark.sql("ALTER TABLE gcm4.m.vs DROP COLUMN m")        // snapshot @1
    spark.sql("INSERT INTO gcm4.m.vs VALUES (3, 'p2')")     // v2
    // head: no m
    assert(spark.table("gcm4.m.vs").schema.fieldNames.toSeq ==
      Seq("k", "part"))
    // v0 was written under 'n' — AS OF 0 shows 'n' with its values
    val v0 = spark.sql("SELECT * FROM gcm4.m.vs VERSION AS OF 0")
    assert(v0.schema.fieldNames.toSeq == Seq("k", "n", "part"),
      v0.schema.fieldNames.mkString(","))
    assert(v0.select("n").head.getLong(0) == 10L)
    // v1 lived after the rename, before the drop — AS OF 1 shows 'm'
    val v1 = spark.sql("SELECT * FROM gcm4.m.vs VERSION AS OF 1")
    assert(v1.schema.fieldNames.toSeq == Seq("k", "m", "part"),
      v1.schema.fieldNames.mkString(","))
    assert(v1.select("m").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L))
    // the path handle's versionAsOf resolves the same history
    val v0p = spark.read.format("graft-manifest")
      .option("versionAsOf", "0").load(s"$warehouse/m/vs")
    assert(v0p.schema.fieldNames.contains("n") &&
      !v0p.schema.fieldNames.contains("m"))
  }

  test("refusals: partition sources, stats columns, occupied physical names") {
    register("gcm3")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcm3.m")
    spark.sql("CREATE TABLE gcm3.m.t3 (k BIGINT, n BIGINT, part STRING) " +
      "USING `graft-manifest` OPTIONS (statsColumns 'n') " +
      "PARTITIONED BY (part)")
    spark.sql("INSERT INTO gcm3.m.t3 VALUES (1, 10, 'p0')")
    // a partition column is the directory layout
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE gcm3.m.t3 RENAME COLUMN part TO p2")
    }
    assert(e1.getMessage.contains("rewrite job"), e1.getMessage)
    // a registered zone-map column can rename (suffixes key physically)
    spark.sql("ALTER TABLE gcm3.m.t3 RENAME COLUMN n TO m")
    assert(spark.sql("SELECT m FROM gcm3.m.t3").head.getLong(0) == 10L)
    // ... but not DROP (positional suffixes would re-meaning)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gcm3.m.t3 DROP COLUMN m")
    }
    assert(e2.getMessage.contains("zone-map"), e2.getMessage)
    // renaming ANOTHER column onto m's physical name works (round 20):
    // k keeps ITS OWN storage through the mapping — the occupied slot's
    // bytes never resurface under the new name
    spark.sql("ALTER TABLE gcm3.m.t3 RENAME COLUMN k TO n")
    assert(spark.sql("SELECT n FROM gcm3.m.t3").head.getLong(0) == 1L,
      "renamed column must serve its OWN storage, not the occupied slot")
    assert(spark.sql("SELECT m FROM gcm3.m.t3").head.getLong(0) == 10L)
    spark.sql("ALTER TABLE gcm3.m.t3 RENAME COLUMN n TO k") // restore
    // rename BACK to the physical name drops the mapping entry
    spark.sql("ALTER TABLE gcm3.m.t3 RENAME COLUMN m TO n")
    assert(spark.sql("SELECT n FROM gcm3.m.t3").head.getLong(0) == 10L)
  }
}
