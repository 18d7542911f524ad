package graft.operators

import graft.api.{ColumnSelection, IngestError, Validation}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** The reference's query surface — SURVEY.md §2.2 (R1–R6).
  *
  * `/root/reference/backend/main.py:176-180` builds one of two SQL strings:
  *   - `SELECT {cols} FROM {table}`                          (scan+project)
  *   - `SELECT {cols} FROM {t0, t1, …} WHERE {condition}`    (comma join)
  * The comma join is a cross product of all listed tables filtered by an
  * arbitrary boolean predicate — an inner theta join; there is no other join
  * kind anywhere in the reference.
  *
  * Spark-first rendering: alias each input with its table name, fold with
  * `crossJoin`, apply `filter(expr(condition))`, then project. Catalyst's
  * join-condition extraction + `ReorderJoin` rewrite cross-then-equality-filter
  * into BroadcastHash/SortMergeJoin automatically, so at scale an equi
  * predicate never executes as a cartesian product. A pure theta predicate
  * (e.g. `a.x < b.y`) plans as BroadcastNestedLoop/Cartesian — which IS the
  * reference's semantics; we keep it and let AQE choose the physical side.
  */
object Exporter {

  /** Resolve a table name to a DataFrame (catalog lookup, parquet dir, …). */
  type Resolver = String => DataFrame

  def buildQuery(sel: ColumnSelection, resolve: Resolver): DataFrame = {
    Validation.requireValidTable(sel.table)
    sel.joinTables.foreach(Validation.requireValidTable)
    require(sel.columns.nonEmpty, "columns requires at least one entry") // min_items=1, main.py:54

    val base = resolve(sel.table).alias(sel.table)
    // The reference builds the comma-join only when BOTH join_tables and
    // join_condition are set (main.py:178-180); otherwise it runs a plain
    // single-table SELECT — mirroring renderSql below. Folding the crossJoin
    // unconditionally would produce an unfiltered cartesian product when the
    // condition is absent.
    val filtered = (sel.joinCondition, sel.joinTables) match {
      case (Some(cond), jts) if jts.nonEmpty =>
        jts.foldLeft(base)((acc, t) => acc.crossJoin(resolve(t).alias(t)))
          .filter(expr(cond))
      case _ => base
    }
    // Alias each projection to the exact requested string: the reference
    // names output columns with the user's own tokens (main.py:193 uses
    // selection.columns as the pandas header), so a qualified request like
    // `customer.c_name` must surface as a column literally named
    // "customer.c_name", not the resolver-stripped "c_name".
    filtered.select(sel.columns.map(c => col(c).alias(c)): _*)
  }

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Export result envelope — main.py:196-202 fields (`status`, `data`,
    * `count`, `query`, `exported_at`; the empty-result envelope at
    * main.py:186-191 carries `message` and no timestamp), plus `path` for the
    * over-cap spill route (the reference has no such route: it materializes
    * every result as one in-memory string, main.py:183-194 — its OOM ceiling).
    */
  final case class ExportResult(
      status: String, data: String, count: Long, query: String, message: String,
      exportedAt: Option[String] = None, path: Option[String] = None)

  /** Results at or under this row count are returned inline as a CSV string
    * (reference envelope parity); larger results take the distributed path.
    */
  val DefaultInlineRowCap = 100000

  /** Full export path with the empty-result short-circuit of main.py:185-191.
    *
    * Single-pass by construction:
    *  - inline route: one `take(cap+1)` materializes the rows; count = the
    *    rows in hand and the CSV string is formatted from them — the query is
    *    never executed a second time;
    *  - over-cap route: one distributed CSV write whose row count is captured
    *    from the SAME execution via `observe` ([[graft.sources.CsvIngest.writeCsvCounted]]);
    *    the full result never transits the driver. BOM-prefixed parts keep
    *    `utf-8-sig` parity per part file.
    */
  def export(
      spark: SparkSession,
      sel: ColumnSelection,
      resolve: Resolver,
      delimiter: String = ",",
      inlineRowCap: Int = DefaultInlineRowCap,
      spillDir: Option[String] = None): ExportResult = {
    val sql = renderSql(sel)
    // main.py:182 — the executed query is logged truncated to 200 chars
    logger.info(s"Executing query: ${sql.take(200)}...")
    try {
      val df = buildQuery(sel, resolve)
      val head = df.take(inlineRowCap + 1)
      if (head.isEmpty) ExportResult("success", "", 0L, sql, "No data found")
      else if (head.length <= inlineRowCap)
        ExportResult(
          "success",
          graft.sources.CsvIngest.rowsToCsvString(df.columns, head, delimiter),
          head.length.toLong, sql, "success", Some(now()))
      else {
        val dir = spillDir.getOrElse(
          graft.core.TempDirs.create("graft_export_"))
        val n = graft.sources.CsvIngest.writeCsvCounted(df, dir, delimiter)
        graft.sources.CsvIngest.bomPrefixParts(dir)
        ExportResult("success", "", n, sql, "success", Some(now()), Some(dir))
      }
    } catch {
      case e: IngestError =>
        logger.error(s"Export error: ${e.getMessage}")
        throw e
      case e: Exception =>
        logger.error(s"Export error: ${e.getMessage}")
        throw IngestError.ExportFailed(e.getMessage)
    }
  }

  /** `datetime.now().isoformat()` parity (main.py:200-201, :293). */
  private def now(): String = java.time.LocalDateTime.now().toString

  /** The SQL string the reference would have built (main.py:176-180) — logged
    * truncated to 200 chars as at main.py:182, and echoed in the envelope.
    */
  def renderSql(sel: ColumnSelection): String = {
    val cols = sel.columns.mkString(", ")
    if (sel.joinTables.nonEmpty && sel.joinCondition.isDefined)
      s"SELECT $cols FROM ${(sel.table +: sel.joinTables).mkString(", ")} WHERE ${sel.joinCondition.get}"
    else
      s"SELECT $cols FROM ${sel.table}"
  }
}
