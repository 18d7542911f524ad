package graft.core

import java.util.ConcurrentModificationException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CROSS-TABLE TRANSACTIONS (round 20 — SURVEY §9 forward #1, the last
  * open headline): an Iceberg-style CATALOG VERSION POINTER that makes a
  * multi-table commit atomic. Each table's `_manifest/v<N>.json` chain
  * stays independently atomic exactly as before (Delta's scope); this
  * layer adds `_catalog/v<N>.json` under a catalog root — one small file
  * naming, per member table, the manifest version that is CURRENT for
  * transactional readers:
  *
  * {{{
  *   Transactions.transact(spark, catRoot) { txn =>
  *     txn.stage("corpus") { root => ManifestTable.commit(spark, root, df, "lang", 7L) }
  *     txn.stage("index")  { root => ManifestTable.commit(spark, root, idx, "lang", 7L) }
  *   } // ONE pointer publish makes both new versions visible together
  *   val corpus = Transactions.read(spark, catRoot, "corpus") // pinned
  * }}}
  *
  * The commit point is the POINTER publish — the same link(2)/
  * no-overwrite arbiter every manifest version already rides
  * ([[ManifestTable.publishSlot]]). The ordering contract:
  *
  *  1. `stage` runs the work against the member table; the new manifest
  *     versions become durable but transactional readers still resolve
  *     the OLD pointer — a crash between the member publishes and the
  *     pointer publish leaves the old PAIR visible (the staged versions
  *     are dangling, detected and refused loudly at the next stage of
  *     that table; [[rollback]] restores, [[sync]] adopts).
  *  2. The pointer publish is a no-overwrite CAS: a loser re-reads the
  *     winning pointer, and iff NONE of its own members moved, retries
  *     at the next slot (disjoint transactions compose); a member the
  *     winner also moved is a lost update — loud
  *     `ConcurrentModificationException`, recompute against the new
  *     snapshot. Same OCC discipline as the manifest chain.
  *  3. Per-table commits compose: a single-member `transact` IS the
  *     "table commit bumps the pointer" road; [[commitTable]] spells it.
  *
  * Reads resolve through the pointer ([[read]]/[[pinnedVersion]], and
  * the DSv2 options `catalogRoot`/`catalogVersionAsOf` on the
  * `graft-manifest` format): a member table reads AT its pinned version
  * (`ManifestTable.readVersion` — snapshot-isolated over immutable
  * files), a table the pointer does not pin reads latest, exactly as
  * before enrollment. CATALOG-LEVEL TIME TRAVEL falls out: pointer
  * version N names a consistent HISTORICAL pair, so
  * `read(..., catalogVersionAsOf = Some(n))` reproduces any committed
  * multi-table state (within each table's vacuum retention — keep
  * `retention.keepVersions` covering the pointer window you query).
  *
  * What this deliberately does NOT do: writes that bypass `transact`
  * (a path-road `ManifestTable.commit` straight at a member table) are
  * durable in that table's own chain but INVISIBLE to transactional
  * readers until a [[sync]] — the pointer is the source of truth for
  * the group, the same rule Iceberg has (writing data files without the
  * catalog is not a commit). The next `stage` of that table detects the
  * unpointed head and refuses loudly rather than silently deriving a
  * transactional version from un-transacted state.
  *
  * Serialization scope (stated, not guessed): a pin names a manifest
  * CHAIN PREFIX, and every manifest is a complete snapshot — so a pin
  * exposes everything below it. Two LIVE writers racing into the same
  * member between one stage's head check and its work's publish resolve
  * at the manifest chain's own OCC (the later commit composes over the
  * earlier, Delta's rule), and the pointer CAS then refuses whichever
  * transaction's pin lost — but the loser's staged versions remain in
  * the chain and may already sit below the winner's pin (the CME
  * message says so). Strict per-member transaction serialization would
  * need staging OUTSIDE the chain; the stage-time check is a dangling-
  * debris detector for CRASHED transactions, not a lock.
  *
  * Scale shape: the pointer is ONE tiny file naming `(table, version)`
  * pairs — publish cost is O(members), independent of data size; reads
  * add one small-file read to plan time (amortizable by the caller).
  * At 100 TB the corpus + its K13/IVF/BM25 index artifacts publish as
  * one logical step instead of relying on per-artifact fences.
  */
object Transactions {

  /** One pointer version: the catalog-level snapshot. */
  final case class Pointer(
      version: Long, tsMs: Long, pins: Map[String, Long])

  private def catalogDir(root: String) = new Path(root, "_catalog")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val VerRe = """^v(\d+)\.json$""".r

  /** Highest published pointer version, -1 when none. */
  def currentPointerVersion(spark: SparkSession, root: String): Long = {
    val dir = catalogDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return -1L
    f.listStatus(dir).map(_.getPath.getName).collect {
      case VerRe(n) => n.toLong
    }.foldLeft(-1L)(math.max)
  }

  /** Parse one pointer file. Throws when absent (never published, or a
    * time-travel version outside what was ever committed).
    */
  def pointerAt(spark: SparkSession, root: String, version: Long): Pointer = {
    val p = new Path(catalogDir(root), s"v$version.json")
    val f = fs(spark, p)
    require(f.exists(p),
      s"catalog pointer v$version does not exist under $root/_catalog")
    val in = f.open(p)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val ts = "\"ts\":(\\d+)".r.findFirstMatchIn(body)
      .map(_.group(1).toLong).getOrElse(0L)
    val pins = "\"tables\":\\{([^}]*)\\}".r.findFirstMatchIn(body)
      .map(_.group(1)).getOrElse("")
    val entries = "\"([^\"]+)\":(-?\\d+)".r.findAllMatchIn(pins)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    Pointer(version, ts, entries)
  }

  def currentPointer(spark: SparkSession, root: String): Option[Pointer] = {
    val v = currentPointerVersion(spark, root)
    if (v < 0) None else Some(pointerAt(spark, root, v))
  }

  /** Every pointer version, oldest first — the catalog-level history. */
  def history(spark: SparkSession, root: String): Seq[Pointer] = {
    val cur = currentPointerVersion(spark, root)
    (0L to cur).flatMap(v =>
      scala.util.Try(pointerAt(spark, root, v)).toOption)
  }

  /** The manifest version transactional readers should use for `rel`
    * (None = not a member: read latest). With `catalogVersionAsOf`,
    * resolution is against that HISTORICAL pointer and an unpinned
    * table refuses — "what was the pair at catalog v3" must not
    * silently mix in today's data.
    */
  def pinnedVersion(
      spark: SparkSession, root: String, rel: String,
      catalogVersionAsOf: Option[Long] = None): Option[Long] =
    catalogVersionAsOf match {
      case Some(cv) =>
        val p = pointerAt(spark, root, cv)
        Some(p.pins.getOrElse(rel, throw new IllegalArgumentException(
          s"catalog pointer v$cv does not pin '$rel' — the table was " +
            "not a member of that catalog version")))
      case None => currentPointer(spark, root).flatMap(_.pins.get(rel))
    }

  private[graft] def tableRoot(root: String, rel: String): String =
    new Path(root, rel).toString

  /** Member names serialize as JSON keys the pointer's regex parser
    * reads back — the reserved characters refuse at EVERY entry that
    * accepts caller-supplied names (stage AND sync — review, round 20),
    * never corrupt silently.
    */
  private def requireMemberName(rel: String, what: String): Unit =
    require(rel.nonEmpty && !rel.exists(c =>
      c == '"' || c == '{' || c == '}' || c == '\n' || c == '\r'),
      s"$what: member name '$rel' must be non-empty without '\"', " +
        "'{', '}' or newlines (the pointer encoding reserves them)")

  /** Transactional read: a pinned member reads AT its pin, a non-member
    * reads latest (plain [[ManifestTable.read]] semantics — enrollment
    * is opt-in per table).
    */
  def read(
      spark: SparkSession, root: String, rel: String,
      catalogVersionAsOf: Option[Long] = None): DataFrame =
    pinnedVersion(spark, root, rel, catalogVersionAsOf) match {
      case Some(pin) =>
        ManifestTable.readVersion(spark, tableRoot(root, rel), pin)
      case None =>
        ManifestTable.read(spark, tableRoot(root, rel)).getOrElse(
          throw new IllegalArgumentException(
            s"'$rel' has no committed version under $root and no pin"))
    }

  /** The in-flight transaction handle `transact` passes to its body. */
  final class Txn private[Transactions] (
      spark: SparkSession, catalogRoot: String, base: Option[Pointer]) {

    private[Transactions] val staged =
      scala.collection.mutable.LinkedHashMap[String, Long]()

    /** Absolute root of a member table. */
    def root(rel: String): String = tableRoot(catalogRoot, rel)

    /** Run `work` against member table `rel` (any manifest verb — commit,
      * merge, deleteRows, optimize...) and record the resulting head as
      * this transaction's pin for the table. Refuses when the table's
      * head is not the pointer's pin (dangling versions from a crashed
      * transaction, or out-of-band writes — run [[rollback]] or [[sync]]
      * first): a transactional version must derive from transactional
      * state. An UNPINNED table must be brand-new (no committed
      * version) — a table WITH history could be a crashed
      * first-enrollment's debris, which a silent adopt would fold into
      * this transaction; enrolling pre-existing tables is an explicit
      * decision (`enroll = true`, or [[sync]] first).
      */
    def stage[T](rel: String, enroll: Boolean = false)(
        work: String => T): T = {
      requireMemberName(rel, "stage")
      val r = root(rel)
      val head0 = ManifestTable.currentVersion(spark, r)
      staged.get(rel).orElse(base.flatMap(_.pins.get(rel))) match {
        case Some(pin) =>
          if (head0 != pin) throw new ConcurrentModificationException(
            s"transact.stage('$rel'): table head v$head0 != catalog pin " +
              s"v$pin — dangling versions from a crashed transaction or " +
              "out-of-band writes; run Transactions.rollback to restore " +
              "the pinned state or Transactions.sync to adopt the head")
        case None =>
          if (head0 >= 0 && !enroll)
            throw new ConcurrentModificationException(
              s"transact.stage('$rel'): the table has committed versions " +
                s"(head v$head0) but no catalog pin — a crashed " +
                "first-enrollment transaction's debris looks exactly " +
                "like this; pass enroll = true to adopt the existing " +
                "history deliberately, or run Transactions.sync first")
      }
      val out = work(r)
      val head1 = ManifestTable.currentVersion(spark, r)
      require(head1 >= 0,
        s"transact.stage('$rel'): the work left no committed version to pin")
      staged(rel) = head1
      out
    }
  }

  /** Run `body` and publish ONE pointer naming every staged member's new
    * version — the atomic multi-table commit. A body that stages nothing
    * publishes nothing (a read-only transaction is free).
    * `beforePointerPublish` is the crash-injection seam the specs use —
    * a throw there leaves every staged manifest durable but the OLD
    * pointer current.
    */
  def transact[T](
      spark: SparkSession, catalogRoot: String,
      beforePointerPublish: () => Unit = ManifestTable.NoHook)(
      body: Txn => T): T = {
    val base = currentPointer(spark, catalogRoot)
    val txn = new Txn(spark, catalogRoot, base)
    val out = body(txn)
    if (txn.staged.isEmpty) return out
    beforePointerPublish()
    publishPins(spark, catalogRoot, base, _ => txn.staged.toMap,
      requireUnmoved = true)
    out
  }

  /** The single-table composition road: commit through the pointer in
    * one call (stage + bump).
    */
  def commitTable[T](
      spark: SparkSession, catalogRoot: String, rel: String)(
      work: String => T): T =
    transact(spark, catalogRoot)(txn => txn.stage(rel)(work))

  private def renderPointer(
      v: Long, ts: Long, pins: Map[String, Long]): String =
    s"""{"v":$v,"ts":$ts,"tables":{${
      pins.toSeq.sorted.map { case (k, p) => s""""$k":$p""" }
        .mkString(",")}}}"""

  /** CAS loop over the pointer slot — the ONE pointer-publish protocol
    * (review, round 20: sync used to hand-copy it). `newPinsOf` computes
    * the attempt's member pins from the base it publishes against (a
    * fixed map for transact/rollback; a per-attempt head re-read for
    * sync). With `requireUnmoved`, a slot loss re-validates that no OWN
    * member moved between our original base and the winner (the
    * lost-update check); sync passes false (adopt-whatever, re-read).
    */
  private def publishPins(
      spark: SparkSession, catalogRoot: String,
      base0: Option[Pointer],
      newPinsOf: Option[Pointer] => Map[String, Long],
      requireUnmoved: Boolean): Pointer = {
    val firstPins = newPinsOf(base0)
    var base = base0
    var newPins = firstPins
    while (true) {
      val next = base.map(_.version + 1).getOrElse(0L)
      val pins = base.map(_.pins).getOrElse(Map.empty) ++ newPins
      // monotonic stamp, same clamp law as manifest publishes
      val ts = math.max(System.currentTimeMillis(),
        base.map(_.tsMs + 1L).getOrElse(0L))
      if (ManifestTable.publishSlot(spark, catalogDir(catalogRoot),
          s"v$next.json", renderPointer(next, ts, pins)))
        return Pointer(next, ts, pins)
      val w = currentPointer(spark, catalogRoot).getOrElse(
        throw new IllegalStateException(
          s"lost the pointer slot v$next under $catalogRoot but no " +
            "pointer is readable"))
      if (requireUnmoved) firstPins.keys.foreach { rel =>
        if (w.pins.get(rel) != base0.flatMap(_.pins.get(rel)))
          throw new ConcurrentModificationException(
            s"transact: a concurrent transaction moved member '$rel' " +
              s"(pin ${base0.flatMap(_.pins.get(rel))} -> " +
              s"${w.pins.get(rel)}) — this transaction's staged version " +
              "derives from a superseded snapshot; note the staged " +
              "manifest versions remain in the member's chain (a later " +
              "writer may compose over them) — verify before retrying")
      }
      base = Some(w)
      newPins = newPinsOf(base)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Adopt member tables' CURRENT heads into the pointer — the explicit
    * escape hatch for out-of-band writes (and for enrolling existing
    * tables wholesale). Empty `rels` refreshes every already-pinned
    * member. Returns the published pointer version.
    *
    * The head reads happen INSIDE the CAS loop (review, round 20): a
    * head read before a concurrent transaction's pointer publish would
    * otherwise be republished on retry, regressing that member's pin
    * below a committed transaction — each attempt adopts heads read
    * AFTER the base pointer it publishes against, and a pin never moves
    * backwards past the winner's.
    */
  def sync(
      spark: SparkSession, catalogRoot: String,
      rels: Seq[String] = Nil): Long = {
    rels.foreach(requireMemberName(_, "sync"))
    val base0 = currentPointer(spark, catalogRoot)
    def pinsOf(base: Option[Pointer]): Map[String, Long] = {
      val members =
        if (rels.nonEmpty) rels
        else base.map(_.pins.keys.toSeq).getOrElse(Nil)
      require(members.nonEmpty,
        "sync: no members to adopt (no pointer yet and no rels given)")
      members.map { rel =>
        val head = ManifestTable.currentVersion(
          spark, tableRoot(catalogRoot, rel))
        require(head >= 0, s"sync('$rel'): no committed version to adopt")
        rel -> math.max(head,
          base.flatMap(_.pins.get(rel)).getOrElse(-1L))
      }.toMap
    }
    publishPins(spark, catalogRoot, base0, pinsOf,
      requireUnmoved = false).version
  }

  /** Restore a member whose chain ran ahead of the pointer (a crashed
    * transaction's dangling staged versions): publishes a NEW manifest
    * version that is a verbatim copy of the pinned state
    * ([[ManifestTable.restoreVersion]] — metadata-only, files are
    * immutable), then bumps the pointer to the restored version. The
    * dangling versions stay time-travelable until vacuum. Returns the
    * restored manifest version.
    */
  def rollback(
      spark: SparkSession, catalogRoot: String, rel: String): Long = {
    val base = currentPointer(spark, catalogRoot).getOrElse(
      throw new IllegalArgumentException(
        s"rollback('$rel'): no catalog pointer under $catalogRoot"))
    val pin = base.pins.getOrElse(rel, throw new IllegalArgumentException(
      s"rollback('$rel'): not a member of the catalog pointer"))
    val r = tableRoot(catalogRoot, rel)
    val head = ManifestTable.currentVersion(spark, r)
    if (head == pin) return pin // nothing dangling
    require(head > pin,
      s"rollback('$rel'): head v$head is BELOW the pin v$pin — the " +
        "pinned version was vacuumed or the pointer is foreign to this " +
        "table; run sync to adopt the head instead")
    val restored = ManifestTable.restoreVersion(spark, r, pin)
    publishPins(spark, catalogRoot, Some(base), _ => Map(rel -> restored),
      requireUnmoved = true)
    restored
  }
}
