package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based pins for the round-7 curation operators, over arbitrary
  * generated corpora (raw ScalaCheck generators with fixed seeds — no
  * scalatestplus bridge in the offline cache; fully deterministic).
  */
class CurationPropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // small paragraph vocabulary → guaranteed cross-document repeats
  private val paraGen: Gen[String] = Gen.oneOf(
    "alpha beta", "gamma", "shared footer text", "delta epsilon zeta",
    "eta", "theta iota kappa", "", " ")

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n, for {
      k <- Gen.choose(1, 5)
      ps <- Gen.listOfN(k, paraGen)
    } yield ps.mkString("\n\n"))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("property: paragraphDedup invariants on arbitrary corpora") {
    import spark.implicits._
    (1L to 25L).foreach { seed =>
      val corpus = sample(corpusGen, seed)
      val df = corpus.toDF("doc_id", "text")
      val out = Dedup.paragraphDedup(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      // every document survives with its full paragraph count, bounded kept
      val paraCounts = corpus.map { case (id, t) => id -> t.split("\n\n", -1).length }.toMap
      assert(out.map(_._1).sorted == corpus.map(_._1).sorted, s"seed=$seed lost docs")
      out.foreach { case (id, nParas, nKept) =>
        assert(nParas == paraCounts(id), s"seed=$seed doc=$id paragraph count")
        assert(nKept >= 0 && nKept <= nParas, s"seed=$seed doc=$id kept out of range")
      }
      // global invariant: total kept == number of DISTINCT paragraphs
      // (exactly one occurrence of each survives, no more, no fewer)
      val distinctParas = corpus.flatMap(_._2.split("\n\n", -1)).distinct.size
      assert(out.map(_._3).sum == distinctParas,
        s"seed=$seed total kept != distinct paragraphs")
    }
  }

  private val domainRowGen: Gen[(Long, String)] = for {
    d <- Gen.oneOf("a", "b", "c")
  } yield (0L, d) // ids assigned after generation (unique)

  test("property: domainCap keeps exactly min(cap, |domain|) smallest ids per domain") {
    import spark.implicits._
    (1L to 25L).foreach { seed =>
      val rows = sample(Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, domainRowGen)), seed)
        .zipWithIndex.map { case ((_, d), i) => (i.toLong, d) }
      val df = rows.toDF("doc_id", "source")
      val cap = 1 + (seed % 4).toInt
      val kept = TextAnalysis.domainCap(df, cap = cap, payload = Seq.empty)
        .collect().map(r => (r.getString(1), r.getLong(0))).toList
      val want = rows.groupBy(_._2).view
        .mapValues(_.map(_._1).sorted.take(cap).toSet).toMap
      assert(kept.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap == want,
        s"seed=$seed cap=$cap wrong kept set")
    }
  }

  // change streams with few keys, a tiny time domain (guaranteed same-ts
  // collisions) and a tiny attribute alphabet (guaranteed consecutive dups)
  private val changesGen: Gen[List[(Long, Long, Long, String)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 3L)
      ts <- Gen.choose(0L, 6L)
      a <- Gen.oneOf("x", "y", "z")
    } yield (k, ts, a))
  } yield rows.zipWithIndex.map { case ((k, ts, a), i) => (k, ts, i.toLong, a) }

  test("property: scd2Historize equals the per-key brute force on arbitrary change streams") {
    import spark.implicits._
    (1L to 25L).foreach { seed =>
      val rows = sample(changesGen, seed)
      val df = rows.toDF("k", "sec", "seq", "attr")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      val got = Joins.scd2Historize(df, "k", "ts", "seq", Seq("attr"))
        .selectExpr("k", "attr", "unix_seconds(effective_from)",
          "unix_seconds(effective_to)", "is_current")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) Long.MaxValue else r.getLong(3), r.getBoolean(4)))
        .toSet
      // brute force: per key, order by (ts, seq); collapse consecutive
      // duplicates; close each version at the next version's ts; drop
      // zero-width versions
      val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val ordered = rs.sortBy(r => (r._2, r._3))
        val versions = ordered.foldLeft(List.empty[(Long, String)]) {
          case (acc, (_, ts, _, a)) =>
            if (acc.nonEmpty && acc.head._2 == a) acc else (ts, a) :: acc
        }.reverse
        versions.zipAll(versions.drop(1).map(v => Some(v._1)), null, None)
          .collect { case ((ef, a), et) if et.forall(_ != ef) =>
            (k, a, ef, et.getOrElse(Long.MaxValue), et.isEmpty)
          }
      }.toSet
      assert(got == want, s"seed=$seed scd2 diverged from brute force")
    }
  }
}
