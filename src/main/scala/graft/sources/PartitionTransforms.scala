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

case class MonthsSpec(col: String) extends PartSpec {
  def sourceCol: String = col
  def levelName: String = s"${col}_month"
  def render: String = s"months($col)"
}

case class YearsSpec(col: String) extends PartSpec {
  def sourceCol: String = col
  def levelName: String = s"${col}_year"
  def render: String = s"years($col)"
}

case class HoursSpec(col: String) extends PartSpec {
  def sourceCol: String = col
  def levelName: String = s"${col}_hour"
  def render: String = s"hours($col)"
}

/** `truncate(w, col)`: ints floor to a multiple of w (ORDER-PRESERVING —
  * ranges translate); strings cut to their first w chars (prefix order
  * preserved; only equality/IN translate here — a range's endpoints
  * truncate to prefixes whose comparison semantics differ from the
  * value's, so ranges conservatively don't narrow).
  */
case class TruncateSpec(w: Int, col: String) extends PartSpec {
  require(w >= 1, s"truncate($w, $col): width must be >= 1")
  def sourceCol: String = col
  def levelName: String = s"${col}_trunc"
  def render: String = s"truncate($w,$col)"
}

case class BucketSpec(n: Int, col: String) extends PartSpec {
  require(n >= 2, s"bucket($n, $col): need at least 2 buckets")
  def sourceCol: String = col
  def levelName: String = s"${col}_bucket"
  def render: String = s"bucket($n,$col)"
}

object PartitionTransforms {

  private val DaysRe = """days\(\s*([^(),\s]+)\s*\)""".r
  private val MonthsRe = """months\(\s*([^(),\s]+)\s*\)""".r
  private val YearsRe = """years\(\s*([^(),\s]+)\s*\)""".r
  private val HoursRe = """hours\(\s*([^(),\s]+)\s*\)""".r
  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^(),\s]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([^(),\s]+)\s*\)""".r

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
    case MonthsRe(c) => MonthsSpec(c)
    case YearsRe(c) => YearsSpec(c)
    case HoursRe(c) => HoursSpec(c)
    case BucketRe(n, c) => BucketSpec(n.toInt, c)
    case TruncRe(w, c) => TruncateSpec(w.toInt, c)
    case other =>
      require(!other.contains("(") && !other.contains(")"),
        s"unsupported partition transform '$other' — supported: " +
          "identity column, years/months/days/hours(col), bucket(n,col), " +
          "truncate(w,col)")
      IdentitySpec(other)
  }

  /** V2 `Transform` array → PartSpecs — ONE mapping shared by
    * [[GraftCatalog.createTable]] and the bare provider's
    * `GraftManifestSource.getTable` (ADVICE r19: the session-catalog
    * `USING graft-manifest ... PARTITIONED BY (days(ts))` road used to
    * collect only identity transforms, silently creating an
    * UNPARTITIONED table whose first write failed with a misleading
    * "no declared partition column(s)"; now both roads parse the full
    * family or refuse loudly here).
    */
  def fromV2Transforms(
      partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform])
      : Seq[PartSpec] = {
    def litInt(
        t: org.apache.spark.sql.connector.expressions.Transform,
        what: String): Int =
      t.arguments.collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value.isInstanceOf[Number] =>
          l.value.asInstanceOf[Number].intValue
      }.getOrElse(throw new IllegalArgumentException(
        s"${t.name} transform needs a literal $what: $t"))
    def ref(t: org.apache.spark.sql.connector.expressions.Transform) =
      t.references.head.fieldNames.mkString(".")
    partitioning.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        IdentitySpec(ref(t))
      case t if t.name == "days" && t.references.length == 1 =>
        DaysSpec(ref(t))
      case t if t.name == "months" && t.references.length == 1 =>
        MonthsSpec(ref(t))
      case t if t.name == "years" && t.references.length == 1 =>
        YearsSpec(ref(t))
      case t if t.name == "hours" && t.references.length == 1 =>
        HoursSpec(ref(t))
      case t if t.name == "bucket" && t.references.length == 1 =>
        BucketSpec(litInt(t, "bucket count"), ref(t))
      case t if t.name == "truncate" && t.references.length == 1 =>
        TruncateSpec(litInt(t, "width"), ref(t))
      case other => throw new UnsupportedOperationException(
        s"graft-manifest: unsupported partition transform $other — " +
          "supported: identity columns, years/months/days/hours(col), " +
          "bucket(n, col), truncate(w, col)")
    }
  }

  /** Source-column types a transform accepts (checked at CREATE TABLE —
    * a type the derivation can't interpret must refuse at declaration,
    * not at the first write).
    */
  def validSourceType(spec: PartSpec, dt: DataType): Boolean = spec match {
    case _: DaysSpec | _: MonthsSpec | _: YearsSpec =>
      dt == TimestampType || dt == TimestampNTZType || dt == DateType
    case _: HoursSpec =>
      dt == TimestampType || dt == TimestampNTZType // a DATE has no hours
    case _: BucketSpec =>
      dt == LongType || dt == IntegerType || dt == StringType
    case _: TruncateSpec =>
      dt == LongType || dt == IntegerType || dt == StringType
    case _: IdentitySpec =>
      dt == StringType || dt == IntegerType || dt == LongType
  }

  /** TIME-UNIT arithmetic shared by the four calendar transforms: a
    * "unit" is the level's integer ordinal (epoch day/hour, year*12+m-1
    * for months, the year itself for years) — ordered, so range filters
    * translate to unit windows; [[renderUnit]]/[[parseUnitValue]] are the
    * directory spelling and its inverse.
    */
  def unitOfMicros(spec: PartSpec, micros: Long): Long = spec match {
    case _: DaysSpec => Math.floorDiv(micros, 86400000000L)
    case _: HoursSpec => Math.floorDiv(micros, 3600000000L)
    case _: MonthsSpec =>
      val d = java.time.LocalDate.ofEpochDay(
        Math.floorDiv(micros, 86400000000L))
      d.getYear * 12L + d.getMonthValue - 1
    case _: YearsSpec =>
      java.time.LocalDate.ofEpochDay(
        Math.floorDiv(micros, 86400000000L)).getYear.toLong
    case other => throw new IllegalArgumentException(
      s"${other.render} is not a time-unit transform")
  }

  /** The first micro of a unit (the boundary test for exclusive-upper
    * translation).
    */
  def unitStartMicros(spec: PartSpec, u: Long): Long = spec match {
    case _: DaysSpec => u * 86400000000L
    case _: HoursSpec => u * 3600000000L
    case _: MonthsSpec => java.time.LocalDate.of(
      (u / 12).toInt, (u % 12 + 1).toInt, 1).toEpochDay * 86400000000L
    case _: YearsSpec => java.time.LocalDate.of(u.toInt, 1, 1)
      .toEpochDay * 86400000000L
    case other => throw new IllegalArgumentException(
      s"${other.render} is not a time-unit transform")
  }

  /** The directory value of a unit. */
  def renderUnit(spec: PartSpec, u: Long): String = spec match {
    case _: DaysSpec => renderDay(u)
    case _: MonthsSpec => f"${u / 12}%04d-${u % 12 + 1}%02d"
    case _: YearsSpec => f"$u%04d"
    case _: HoursSpec =>
      renderDay(Math.floorDiv(u, 24L)) + f"-${Math.floorMod(u, 24L)}%02d"
    case other => throw new IllegalArgumentException(
      s"${other.render} is not a time-unit transform")
  }

  /** Parse a directory value back to its unit (file-selection range
    * checks). None keeps the file conservatively. Truncate-int levels
    * parse as the (already-floored) long multiple.
    */
  def parseUnitValue(spec: PartSpec, dirValue: String): Option[Long] =
    scala.util.Try(spec match {
      case _: DaysSpec => java.time.LocalDate.parse(dirValue).toEpochDay
      case _: MonthsSpec =>
        val p = dirValue.split('-')
        p(0).toLong * 12 + p(1).toLong - 1
      case _: YearsSpec => dirValue.toLong
      case _: HoursSpec =>
        java.time.LocalDate.parse(dirValue.substring(0, 10)).toEpochDay *
          24 + dirValue.substring(11).toLong
      case _: TruncateSpec => dirValue.toLong
      case other => throw new IllegalArgumentException(other.render)
    }).toOption

  /** The INTERNAL micros of a filter literal on a timestamp/date column
    * (both Java-time API settings; dates pin to UTC midnight; NTZ
    * literals read as their literal calendar value).
    */
  def literalMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay * 86400000000L)
    case d: java.time.LocalDate => Some(d.toEpochDay * 86400000000L)
    case dt: java.time.LocalDateTime =>
      Some(dt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        dt.getNano / 1000L)
    case _ => None
  }

  /** Unit of a filter literal (inclusive-lower: the unit holding it). */
  def filterUnit(spec: PartSpec, v: Any): Option[Long] =
    literalMicros(v).map(unitOfMicros(spec, _))

  /** Unit of an EXCLUSIVE upper bound: `ts < v` reaches at most v's
    * unit — minus one when v sits exactly ON the unit boundary (the
    * `ts < '2024-02-01'` month-end idiom prunes exactly).
    */
  def filterUnitUpperExclusive(spec: PartSpec, v: Any): Option[Long] =
    literalMicros(v).map { m =>
      val u = unitOfMicros(spec, m)
      if (m == unitStartMicros(spec, u)) u - 1 else u
    }

  def truncLong(v: Long, w: Int): Long = Math.floorDiv(v, w) * w

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
}
