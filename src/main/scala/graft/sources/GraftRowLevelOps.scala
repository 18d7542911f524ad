package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{AlwaysTrue, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.ManifestTable

/** SQL ROW-LEVEL VERBS for the graft-manifest format (round 17 — the
  * surface Delta/Iceberg ship and VERDICT r16 ranked the #1 gap):
  *
  * {{{
  *   DELETE FROM t WHERE doc_id IN (4, 11, 25)   -- metadata-routed
  *   DELETE FROM t WHERE n_chars > 100           -- copy-on-write rewrite
  *   UPDATE t SET lang = 'redacted' WHERE ...    -- copy-on-write rewrite
  *   MERGE INTO t USING s ON t.k = s.k
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *            -- copy-on-write rewrite
  * }}}
  *
  * Two planning roads, both onto machinery the format already has:
  *
  *  - **Metadata-routed DELETE** ([[GraftManifestTable]] implements
  *    `SupportsDelete`): a condition that is a conjunction of
  *    equality/IN filters on ONE long/int/string data column maps onto
  *    [[ManifestTable.deleteRows]] — the zone/bloom-pruned, OCC-safe
  *    takedown path (Spark's `OptimizeMetadataOnlyDeleteFromTable`
  *    converts the rewritten plan back once `canDeleteWhere` agrees).
  *    `TRUNCATE TABLE` / an always-true DELETE maps to the truncate
  *    publisher. Everything else falls to the rewrite road.
  *
  *  - **Group-based copy-on-write** (`SupportsRowLevelOperations`,
  *    command DELETE/UPDATE/MERGE): Spark rewrites the statement into a
  *    `ReplaceData` plan — the operation's scan reads the CANDIDATE
  *    files (static zone/bloom/partition pushdown narrows them; Spark's
  *    `RowLevelOperationRuntimeGroupFiltering` then DPP-narrows to the
  *    files actually holding matches through the scan's existing
  *    [[GraftManifestScan.filter]]), the query computes the full
  *    replacement contents (survivors + updated + inserted rows), and
  *    the write swaps exactly the scanned files for the written ones in
  *    one atomic manifest publish ([[ManifestTable.replaceFiles]] —
  *    whole-snapshot OCC, loud abort on any concurrent change).
  *
  * Refusal parity with the Scala verbs, spec-pinned: a pending
  * deferred-delete mask refuses at ANALYSIS time with the same "run
  * optimize first" instruction [[ManifestTable.merge]] gives; a
  * time-traveled handle and an uncommitted table refuse too.
  *
  * Scale shape: the rewrite's cost is bounded by the files the runtime
  * group filter keeps — a key-targeted MERGE over a zone-mapped table
  * opens the candidate files only, exactly the Scala `merge`'s
  * detection discipline, and the replacement write is one partitioned
  * pass over those files' rows.
  */
class GraftRowLevelOperation(
    table: GraftManifestTable,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  /** The ReplaceData scan this operation configured — group-based COW
    * replaces EXACTLY the files that scan chose (runtime narrowing
    * included): Spark builds the scan during optimization, executes the
    * replacement query (which applies any DPP narrowing first), then
    * commits the write; the write reads the final file set here.
    */
  @volatile private[sources] var configuredScan: Option[GraftManifestScan] =
    None

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft-manifest $cmd (copy-on-write)"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftManifestScanBuilder(table,
      onBuildScan = Some(s => configuredScan = Some(s)))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new GraftReplaceWrite(table, info, GraftRowLevelOperation.this)
    }

  /** `_file` anchors the rewrite (and enables runtime group filtering
    * diagnostics): with a metadata attribute present, Spark's writing
    * task projects DATA rows and metadata rows separately before they
    * reach the writer — without one it falls through to raw plan rows
    * that still carry the internal `__row_operation` marker column
    * (Spark 4.1 `ReplaceDataExec.writingTask`, observed round 17).
    */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftManifestSource.FileCol))
}

/** The ReplaceData write: replacement rows land in a commit-private
  * staging dir through the format's ordinary partitioned writer, and the
  * commit atomically swaps the operation's scanned files for them.
  */
class GraftReplaceWrite(
    table: GraftManifestTable,
    info: LogicalWriteInfo,
    op: GraftRowLevelOperation)
    extends Write with BatchWrite
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  private def spark = SparkSession.active

  /** Same clustering + sort discipline as [[GraftWrite]] (round 18): the
    * replacement rows of a COW rewrite span every touched leaf, and an
    * unsorted stream over more leaves than the writer cap degenerates to
    * one file per row.
    */
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution = {
    if (specs.forall(_.isIdentity) || table.viaCatalog)
      org.apache.spark.sql.connector.distributions.Distributions.clustered(
        specs.map(sp =>
          GraftManifestSource.transformExpr(sp, table.logicalName)).toArray)
    else org.apache.spark.sql.connector.distributions.Distributions
      .unspecified()
  }

  override def distributionStrictlyRequired(): Boolean = false

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    specs.map { sp =>
      val expr =
        if (sp.isIdentity || !table.viaCatalog)
          Expressions.column(table.logicalName(sp.sourceCol))
            : org.apache.spark.sql.connector.expressions.Expression
        else GraftManifestSource.transformExpr(sp, table.logicalName)
      Expressions.sort(expr,
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)
    }.toArray
  }

  private val specs: Seq[PartSpec] = {
    require(table.partSpecs.nonEmpty,
      s"graft-manifest ${op.command()}: the table under ${table.root} has " +
        "no live partition columns — row-level SQL verbs need a committed " +
        "table")
    table.partSpecs
  }

  private val writeSchema: StructType = info.schema()
  specs.foreach(sp => require(
    writeSchema.fieldNames.contains(table.logicalName(sp.sourceCol)),
    s"graft-manifest ${op.command()}: the replacement rows must carry " +
      (if (sp.isIdentity) s"the table's partition column '${sp.sourceCol}'"
       else s"'${table.logicalName(sp.sourceCol)}', the source of ${sp.render}")))

  // column mapping: the replacement files carry PHYSICAL names
  private val writeSchemaPhys: StructType = StructType(
    writeSchema.fields.map(f => f.copy(name = table.phys(f.name))).toSeq)

  private val stagingDir = s"${table.root}/_stage-rlo-${info.queryId()}"

  override def toBatch: BatchWrite = this

  override def description(): String =
    s"graft-manifest ${op.command()} root=${table.root}"

  override def createBatchWriterFactory(
      physInfo: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(stagingDir, writeSchemaPhys, specs,
      GraftManifestSource.confProps(spark),
      Option(info.options().get("maxOpenWriters")).map(_.toInt)
        .getOrElse(16))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged: Seq[(String, Path)] = messages.toSeq.flatMap {
      case m: GraftCommitMessage => m.files.toSeq.map {
        case (partName, p) => (partName, new Path(p))
      }
      case null => Nil // a task Spark never launched commits nothing
      case other => throw new IllegalStateException(
        s"unexpected commit message $other")
    }
    val scan = op.configuredScan.getOrElse(throw new IllegalStateException(
      s"graft-manifest ${op.command()}: no scan was configured for this " +
        "row-level operation — cannot determine which files to replace"))
    // a statement whose runtime group filter narrowed to zero files (and
    // therefore wrote nothing) publishes nothing: the table is unchanged,
    // and a no-op version would only churn vacuum retention
    if (scan.chosenFiles.nonEmpty || staged.nonEmpty) {
      ManifestTable.replaceFiles(
        spark, table.root, table.state.version, table.state.lines,
        removedRels = scan.chosenFiles, staged = staged)
    }
    cleanupStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupStaging()

  private def cleanupStaging(): Unit = {
    val sd = new Path(stagingDir)
    val f = sd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(sd, true)
    ()
  }
}

/** The metadata-delete filter translation shared by
  * [[GraftManifestTable.canDeleteWhere]]/`deleteWhere`: a conjunction of
  * EqualTo/In filters all naming ONE long/int/string DATA column
  * (partition columns take the copy-on-write road — their directory-
  * string round-trip belongs to the scan, not the key join), with null
  * elements dropped (SQL: `x IN (..., NULL)` never matches). An
  * always-true condition maps to `Truncate`.
  */
private[sources] object GraftDeleteMapping {

  sealed trait Mapped
  final case class KeyDelete(column: String, values: Set[Any]) extends Mapped
  case object Truncate extends Mapped

  def map(table: GraftManifestTable, filters: Array[Filter]): Option[Mapped] = {
    if (table.versionAsOf.isDefined || !table.tableExists) return None
    if (filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue]))
      return Some(Truncate)
    val perFilter: Seq[Option[(String, Set[Any])]] = filters.toSeq.map {
      case EqualTo(c, v) => Some((c, Set[Any](v)))
      case In(c, vs) => Some((c, vs.toSet))
      case _ => None
    }
    if (perFilter.exists(_.isEmpty)) return None
    val byCol = perFilter.flatten
    val cols = byCol.map(_._1).distinct
    if (cols.size != 1) return None
    // filters name the LOGICAL column; detection keys files' PHYSICAL
    // one (column mapping, round 19)
    val c = table.phys(cols.head)
    if (table.partitionCols.contains(c)) return None
    val dt = table.dataSchema.fields.find(_.name == c).map(_.dataType)
    if (!dt.exists(t => t == LongType || t == IntegerType || t == StringType))
      return None
    // conjunction of IN sets = intersection; nulls never match
    val vals = byCol.map(_._2.filter(_ != null)).reduce(_ intersect _)
    val typedOk = dt.get match {
      case LongType | IntegerType => vals.forall(_.isInstanceOf[Number])
      case _ => vals.forall(_.isInstanceOf[String])
    }
    if (!typedOk) None else Some(KeyDelete(c, vals))
  }

  def run(table: GraftManifestTable, mapped: Mapped): Unit = {
    val spark = SparkSession.active
    mapped match {
      case Truncate =>
        // refusal parity with every other rewrite road: a pending
        // deferred-delete mask must not silently survive the truncate —
        // rows later re-inserted with masked keys would be hidden
        require(!ManifestTable.hasPendingDv(spark, table.root),
          s"deferred deletes pending under ${table.root} — a truncate " +
            "would strand the mask and hide re-inserted keys; run " +
            "optimize (the purge point) first")
        // full-table delete = the truncate publisher (same semantics as
        // mode("overwrite") with no rows; fence auto-bumps like any
        // overwrite)
        ManifestTable.appendStagedFiles(
          spark, table.root, Nil, None, Nil,
          table.dataSchema, truncate = true)
        ()
      case KeyDelete(c, vals) =>
        if (vals.isEmpty) return // x IN () matches nothing: no-op
        import org.apache.spark.sql.Encoders
        val dt = table.dataSchema.fields.find(_.name == c).get.dataType
        val keys = dt match {
          case LongType => spark.createDataset(
            vals.toSeq.map(_.asInstanceOf[Number].longValue()))(
            Encoders.scalaLong).toDF(c)
          case IntegerType => spark.createDataset(
            vals.toSeq.map(_.asInstanceOf[Number].intValue()))(
            Encoders.scalaInt).toDF(c)
          case _ => spark.createDataset(
            vals.toSeq.map(_.asInstanceOf[String]))(Encoders.STRING).toDF(c)
        }
        // deleteRows returns None when nothing matched — correct no-op;
        // its pending-mask refusal propagates loudly to the SQL user
        ManifestTable.deleteRows(spark, table.root, keys, c)
        ()
    }
  }
}
