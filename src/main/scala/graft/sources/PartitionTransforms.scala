package graft.sources

import org.apache.spark.sql.types._

import graft.core.ManifestTable

/** HIDDEN-PARTITION TRANSFORMS (round 19 — SURVEY §9 gap #1, the
  * Iceberg flagship shape): a table declares `PARTITIONED BY (days(ts))`
  * or `bucket(16, id)`, the WRITERS derive the directory value from the
  * data column, and the SCAN translates data-column predicates into
  * directory pruning — the user filters `ts`, never names (or sees) a
  * partition column. Contrast with identity partitioning, where the user
  * must materialize, write and filter the partition column themselves.
  *
  * Spec encoding: the descriptor's `partitionCols` list carries either a
  * bare column name (identity — every pre-round-19 descriptor parses
  * unchanged) or a transform spelling `days(col)` / `bucket(n,col)`.
  * Directory LEVEL names are derived (`<col>_day`, `<col>_bucket`) so a
  * transform level can never collide with the data column it derives
  * from — the data column STAYS in the data files (unlike identity
  * partitioning, where the column lives only in the directory name).
  *
  * Semantics (both match Iceberg's public transform spec in spirit,
  * restated here as this engine's own contract):
  *  - `days(ts)`: the UTC calendar day of the instant, rendered ISO
  *    (`ts_day=2024-01-15`). Timestamp columns bucket by their UTC
  *    instant; TIMESTAMP_NTZ and DATE by their literal calendar value.
  *    Rendering is lexicographically ordered, so a day RANGE prunes by
  *    string-free epoch-day comparison ([[PartitionTransforms.dayOf]]).
  *  - `bucket(n, col)`: a 64-bit avalanche hash of the value, floorMod n
  *    (`id_bucket=7`). Strings hash through the manifest's own xx64
  *    ([[ManifestTable.xx64String]]) so one hash family serves blooms
  *    and buckets; integers avalanche through the murmur3 finalizer
  *    (public-domain mixing constants) — a sequential key space spreads
  *    uniformly. Only equality/IN predicates translate (a hash destroys
  *    order); ranges fall back to zone maps.
  *
  * Scale shape: at 100 TB the transform IS the pruning story — a year of
  * events is ~365 day leaves, and a `ts BETWEEN`-week query opens 7 of
  * them without the user knowing the layout exists. The translation is
  * plan-time arithmetic on the filter literals (zero IO), and the verbs
  * stay transform-safe because every rewrite preserves leaf directories
  * by PATH (never re-deriving values — see ManifestTable.deleteRows'
  * read-partition-as-string discipline).
  */
sealed trait PartSpec extends Serializable {
  /** The DATA column the directory value derives from. */
  def sourceCol: String
  /** The directory level name (`col` for identity, `col_day`/`col_bucket`
    * for transforms).
    */
  def levelName: String
  def isIdentity: Boolean = false
  /** The descriptor spelling ([[PartitionTransforms.parse]]'s inverse). */
  def render: String
}

case class IdentitySpec(col: String) extends PartSpec {
  def sourceCol: String = col
  def levelName: String = col
  override def isIdentity: Boolean = true
  def render: String = col
}

case class DaysSpec(col: String) extends PartSpec {
  def sourceCol: String = col
  def levelName: String = s"${col}_day"
  def render: String = s"days($col)"
}

case class BucketSpec(n: Int, col: String) extends PartSpec {
  require(n >= 2, s"bucket($n, $col): need at least 2 buckets")
  def sourceCol: String = col
  def levelName: String = s"${col}_bucket"
  def render: String = s"bucket($n,$col)"
}

object PartitionTransforms {

  private val DaysRe = """days\(\s*([^(),\s]+)\s*\)""".r
  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^(),\s]+)\s*\)""".r

  /** Split a descriptor's comma-joined spec list WITHOUT splitting
    * inside a transform's parentheses (`bucket(16,id)` is one entry).
    */
  def splitSpecs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Parse one descriptor entry: a transform spelling or a bare identity
    * column name (every pre-round-19 descriptor).
    */
  def parse(s: String): PartSpec = s.trim match {
    case DaysRe(c) => DaysSpec(c)
    case BucketRe(n, c) => BucketSpec(n.toInt, c)
    case other =>
      require(!other.contains("(") && !other.contains(")"),
        s"unsupported partition transform '$other' — supported: " +
          "identity column, days(col), bucket(n,col)")
      IdentitySpec(other)
  }

  /** Source-column types a transform accepts (checked at CREATE TABLE —
    * a type the derivation can't interpret must refuse at declaration,
    * not at the first write).
    */
  def validSourceType(spec: PartSpec, dt: DataType): Boolean = spec match {
    case _: DaysSpec =>
      dt == TimestampType || dt == TimestampNTZType || dt == DateType
    case _: BucketSpec =>
      dt == LongType || dt == IntegerType || dt == StringType
    case _: IdentitySpec =>
      dt == StringType || dt == IntegerType || dt == LongType
  }

  /** UTC epoch day of a timestamp column's internal value (micros). */
  def epochDayOfMicros(micros: Long): Long =
    Math.floorDiv(micros, 86400000000L)

  /** ISO rendering of an epoch day — the directory value. */
  def renderDay(epochDay: Long): String =
    java.time.LocalDate.ofEpochDay(epochDay).toString

  /** murmur3's 64-bit finalizer (public-domain avalanche constants):
    * spreads sequential integer keys uniformly across buckets.
    */
  def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  def bucketOfLong(v: Long, n: Int): Int =
    Math.floorMod(fmix64(v), n.toLong).toInt

  def bucketOfString(s: String, n: Int): Int =
    Math.floorMod(fmix64(ManifestTable.xx64String(s)), n.toLong).toInt

  /** Plan-time epoch day of a FILTER literal on a days-transform source
    * column (the literal classes Spark's DSv2 Filter API delivers for
    * timestamp/date columns under both Java-time API settings). None =
    * unrecognized literal shape → the filter simply doesn't narrow
    * (sound superset).
    */
  def filterEpochDay(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(Math.floorDiv(t.getTime, 86400000L))
    case i: java.time.Instant => Some(Math.floorDiv(i.getEpochSecond, 86400L))
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case dt: java.time.LocalDateTime => Some(dt.toLocalDate.toEpochDay)
    case _ => None
  }

  /** Plan-time bucket of a FILTER literal on a bucket-transform source
    * column. None = literal type doesn't match the hashable shapes.
    */
  def filterBucket(v: Any, n: Int): Option[Int] = v match {
    case s: String => Some(bucketOfString(s, n))
    case x: java.lang.Long => Some(bucketOfLong(x.longValue(), n))
    case x: java.lang.Integer => Some(bucketOfLong(x.longValue(), n))
    case x: java.lang.Short => Some(bucketOfLong(x.longValue(), n))
    case x: java.lang.Byte => Some(bucketOfLong(x.longValue(), n))
    case _ => None
  }

  /** Epoch day of an EXCLUSIVE upper bound: `ts < v` reaches at most the
    * day of v — and when v sits exactly ON a day boundary (midnight,
    * zero fraction) that day itself is excluded. The common
    * `ts < DATE+1` spelling of "through end of day" then prunes exactly.
    */
  def filterEpochDayUpperExclusive(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      val ms = t.getTime
      val onBoundary =
        Math.floorMod(ms, 86400000L) == 0L && t.getNanos % 1000000 == 0
      Some(Math.floorDiv(ms, 86400000L) - (if (onBoundary) 1 else 0))
    case i: java.time.Instant =>
      val s = i.getEpochSecond
      val onBoundary = Math.floorMod(s, 86400L) == 0L && i.getNano == 0
      Some(Math.floorDiv(s, 86400L) - (if (onBoundary) 1 else 0))
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay - 1)
    case d: java.time.LocalDate => Some(d.toEpochDay - 1)
    case dt: java.time.LocalDateTime =>
      val onBoundary = dt.toLocalTime == java.time.LocalTime.MIDNIGHT
      Some(dt.toLocalDate.toEpochDay - (if (onBoundary) 1 else 0))
    case _ => None
  }

  /** Parse a directory day value back to its epoch day (range pruning at
    * file-selection time). None keeps the file conservatively.
    */
  def parseDayValue(dirValue: String): Option[Long] =
    scala.util.Try(
      java.time.LocalDate.parse(dirValue).toEpochDay).toOption
}
