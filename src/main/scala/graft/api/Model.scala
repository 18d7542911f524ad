package graft.api

/** API-surface parity with the reference's pydantic models and validators.
  *
  * Reference: `/root/reference/backend/main.py:38-62`.
  *  - `ClickHouseConnection` (host/port/database/username/password/secure) with
  *    hostname regex `^[\w\.-]+$` (main.py:46-50) → [[ConnectionConfig]].
  *  - `ColumnSelection` (table/columns min_items=1/join_tables/join_condition)
  *    with identifier regex `^[a-zA-Z_][a-zA-Z0-9_]*$` on table names
  *    (main.py:52-62) → [[ColumnSelection]].
  *
  * Unlike the reference — which splices `columns` and `join_condition` raw into
  * SQL strings (main.py:176-180, a SQL-injection surface) — the rebuild is
  * injection-safe by construction: columns resolve through `df.select` and the
  * condition parses through Catalyst's `expr()` (parse errors are rejected,
  * statement splicing is impossible).
  */
final case class ConnectionConfig(
    host: String,
    port: Int = 8123,
    database: String = "default",
    username: String = "default",
    password: String = "",
    secure: Boolean = false) {
  /** Pool key parity: `host:port:database:username` (main.py:66). */
  def poolKey: String = s"$host:$port:$database:$username"
}

final case class ColumnSelection(
    table: String,
    columns: Seq[String],
    joinTables: Seq[String] = Nil,
    joinCondition: Option[String] = None)

/** Error ADT mirroring the reference's HTTP error envelope (§2.4 of SURVEY.md)
  * with the exact message texts.
  */
sealed abstract class IngestError(val httpStatus: Int, val detail: String)
    extends RuntimeException(detail)
object IngestError {
  /** main.py:48 `Invalid hostname format` (pydantic → 422). */
  final case class InvalidHost(host: String)
      extends IngestError(422, "Invalid hostname format")
  /** main.py:60 `Invalid table name format` (pydantic → 422). */
  final case class InvalidTableName(table: String)
      extends IngestError(422, "Invalid table name format")
  /** main.py:136-139. */
  final case class TableNotFound(table: String)
      extends IngestError(404, s"Table '$table' not found")
  /** main.py:228-231. */
  case object UnsupportedFileType
      extends IngestError(400, "Only CSV files are supported")
  /** main.py:241-245. */
  case object EmptyFile
      extends IngestError(400, "File is empty or invalid format")
  /** main.py:203-208. */
  final case class ExportFailed(cause: String)
      extends IngestError(500, s"Export failed: $cause")
  /** main.py:295-302. */
  final case class ImportFailed(cause: String)
      extends IngestError(500, s"Import failed: $cause")
  /** main.py:330-334. */
  final case class ServiceUnavailable(cause: String)
      extends IngestError(503, s"Service unavailable: $cause")
  /** main.py:114-119 — connect endpoint's catch-all 400. */
  final case class ConnectionFailed(cause: String)
      extends IngestError(400, s"Connection failed: $cause")
  /** main.py:134-139 — get-columns' 404, worded differently from the export
    * path's [[TableNotFound]].
    */
  final case class TableDoesNotExist(table: String)
      extends IngestError(404, s"Table $table does not exist")
  /** main.py:156-161 — get-columns' catch-all 400 (no pydantic guard on the
    * `table` query param in the reference; bad identifiers fail here).
    */
  final case class ColumnsFetchFailed(cause: String)
      extends IngestError(400, s"Failed to get columns: $cause")
}

object Validation {
  /** main.py:46-50 — `^[\w\.-]+$`. */
  private val HostRe = "^[\\w.-]+$".r
  /** main.py:58-62 — C-identifier table names. */
  private val IdentRe = "^[a-zA-Z_][a-zA-Z0-9_]*$".r

  def isValidHost(h: String): Boolean = HostRe.matches(h)
  def isValidIdentifier(t: String): Boolean = IdentRe.matches(t)

  def requireValidHost(h: String): String =
    if (isValidHost(h)) h else throw IngestError.InvalidHost(h)

  def requireValidTable(t: String): String =
    if (isValidIdentifier(t)) t else throw IngestError.InvalidTableName(t)

  /** main.py:227-231 — import accepts only `.csv`/`.txt` (case-insensitive). */
  def isSupportedFilename(name: String): Boolean = {
    val n = name.toLowerCase
    n.endsWith(".csv") || n.endsWith(".txt")
  }
}
