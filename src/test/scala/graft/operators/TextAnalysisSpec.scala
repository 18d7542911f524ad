package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("mixtureSampleTemperature: sqrt shares sit between equal-share and proportional; deterministic") {
    import spark.implicits._
    // three domains with strongly skewed sizes
    val corpus = (
      (1 to 200).map(i => (i.toLong, "big", ("w " * 40).trim)) ++
      (201 to 240).map(i => (i.toLong, "mid", ("w " * 40).trim)) ++
      (241 to 248).map(i => (i.toLong, "small", ("w " * 40).trim)))
      .toDF("doc_id", "source", "text")
    val budget = 2000L
    val out = TextAnalysis.mixtureSampleTemperature(corpus, budget).cache()
    // selection is a pure function of the corpus: re-derivation identical
    val again = TextAnalysis.mixtureSampleTemperature(corpus, budget)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // expected per-domain sampled-token mass ∝ sqrt(domain tokens):
    // between equal shares and the natural distribution. With capped
    // rates < 1 the EXPECTED kept tokens per domain = target, so the
    // realized masses must ORDER by domain size while the big:small
    // ratio stays well under the natural 25:1 (sqrt gives 5:1)
    val mass = out.groupBy("source").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mass("big") > mass("mid") && mass("mid") > mass("small"),
      s"temperature shares must still order by size: $mass")
    val ratio = mass("big").toDouble / mass("small")
    assert(ratio < 12.0,
      s"big:small mass ratio $ratio not flattened vs the natural 25:1")
    // every kept doc satisfies the hash rule for its domain rate (spot
    // integrity: no doc kept above rate 1 semantics)
    assert(out.count() > 0 && out.count() < corpus.count())
  }

  test("trainingShards: deterministic shuffle, contiguous per-shard order, atomic manifest commit") {
    val packed = TextAnalysis.packSequences(docs)
    val a = TextAnalysis.trainingShards(packed)
    val b = TextAnalysis.trainingShards(packed)
    // a pure function of the corpus: two derivations are identical
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // every shard's positions are exactly 1..count (a training loader can
    // seek by (shard, pos) with no gaps)
    val bad = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("nd") =!= col("n"))
    assert(bad.isEmpty, "per-shard positions are not contiguous 1..n")
    // the committed artifact reads back exactly and is manifest-versioned
    val root = tmpDir("p8_shards") + "/t"
    TextAnalysis.writeTrainingShards(packed, root)
    assert(graft.core.ManifestTable.currentVersion(spark, root) == 0L)
    val stored = graft.core.ManifestTable.read(spark, root).get
      .select("source", "bin_id", "n_docs", "n_tokens", "shard", "pos")
    assert(stored.exceptAll(a).isEmpty && a.exceptAll(stored).isEmpty)
    // the fence: a re-run with the same batch id is a no-op commit
    TextAnalysis.writeTrainingShards(packed, root)
    assert(graft.core.ManifestTable.currentVersion(spark, root) == 0L)
  }

  test("extractMainContent: hand fixture classifies nav/teaser/body/footer exactly") {
    import spark.implicits._
    val body = "the quick brown fox jumps over a lazy dog near the riverbank today"
    val page = Seq(
      """<div><a href="#">home</a> <a href="#">about</a> <a href="#">contact</a></div>""",
      "<p>read more</p>",
      s"<p>$body</p>",
      """<div><a href="#">terms of use</a> copyright</div>""").mkString("\n")
    val out = TextAnalysis.extractMainContent(
      Seq((1L, page)).toDF("doc_id", "html")).collect()(0)
    assert(out.getAs[Long]("n_blocks") == 4)
    // only the body survives: nav and footer fail all three rules,
    // the teaser fails length + stopwords
    assert(out.getAs[Long]("n_content") == 1)
    assert(out.getAs[String]("kept_text") == body)
    assert(out.getAs[Long]("n_fail_len") == 3)
    assert(out.getAs[Long]("n_fail_link") == 2)
    assert(out.getAs[Long]("n_fail_stop") == 3)

    // a page with NO content block extracts the empty string (md5 of "")
    val none = TextAnalysis.extractMainContent(
      Seq((2L, """<div><a href="#">x</a></div>""")).toDF("doc_id", "html"))
      .collect()(0)
    assert(none.getAs[Long]("n_content") == 0)
    assert(none.getAs[String]("kept_text") == "")
    assert(none.getAs[String]("kept_md5") ==
      "d41d8cd98f00b204e9800998ecf8427e")

    // all-markup block strips to '' — the greatest(len, 1) guard keeps
    // link density defined and the block fails on length, not a crash
    val empty = TextAnalysis.extractMainContent(
      Seq((3L, "<br/>")).toDF("doc_id", "html")).collect()(0)
    assert(empty.getAs[Long]("n_fail_len") == 1)
  }

  test("groupedSplit: every document of a source shares its split; rule matches hashSplit's thresholds") {
    val out = TextAnalysis.groupedSplit(docs).cache()
    assert(out.count() == docs.count())
    // the leakage guarantee: one split per group
    val perSource = out.groupBy("source")
      .agg(countDistinct("split").as("n"))
      .filter(col("n") =!= 1)
    assert(perSource.count() == 0, "a source straddles splits")
    assert(out.filter(!col("split").isin("train", "val", "test")).count() == 0)
    // the split of each source equals hashSplit's decision for that key:
    // same md5-threshold rule, keyed on the group
    val srcAsId = docs.select(col("source").as("doc_id")).distinct()
    val viaHash = TextAnalysis.hashSplit(srcAsId)
      .select(col("doc_id").as("source"), col("split").as("want"))
    val joined = out.select("source", "split").distinct().join(viaHash, "source")
    assert(joined.filter(col("split") =!= col("want")).count() == 0,
      "grouped split diverges from the hashSplit rule on the group key")
  }

  test("textStats: token/char/distinct counts are internally consistent") {
    val out = TextAnalysis.textStats(docs).cache()
    assert(out.count() == docs.count())
    assert(out.filter(col("n_uniq_tokens") > col("n_tokens")).count() == 0)
    assert(out.filter(col("n_tokens") <= 0).count() == 0)
    // avg token length (micro-units) x token count ~ char count minus separators
    val bad = out.filter(
      abs(col("avg_token_len_micro") / lit(1e6) * col("n_tokens") -
        (col("n_chars_actual") - col("n_tokens") + 1)) > 1).count()
    assert(bad == 0)
  }

  test("redactPii: scrubs emails and phones, counts hits, leaves clean text alone") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "write to a.b@test.org or call 555-123-4567 now"),
      (2L, "no contact info here"),
      (3L, "two mails x@y.io z@w.co and 111.222.3333"),
      (4L, "odd but legal: 555-123-4567@corp.example.com here")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(fixture).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1 && out(1L).getLong(2) == 1)
    assert(out(1L).getString(3) == "write to <EMAIL> or call <PHONE> now")
    assert(out(2L).getLong(1) == 0 && out(2L).getLong(2) == 0)
    assert(out(2L).getString(3) == "no contact info here")
    assert(out(3L).getLong(1) == 2 && out(3L).getLong(2) == 1)
    assert(out(3L).getString(3) == "two mails <EMAIL> <EMAIL> and <PHONE>")
    // a phone-shaped substring CONSUMED by the email pass is not a phone
    // redaction: counts must equal the placeholder tokens actually emitted
    assert(out(4L).getLong(1) == 1 && out(4L).getLong(2) == 0)
    assert(out(4L).getString(3) == "odd but legal: <EMAIL> here")
  }

  test("gopherFilter: each rule flags exactly its crafted violator") {
    import spark.implicits._
    val pad = (1 to 60).map(i => s"word$i").mkString(" ") // 60 alpha words
    val fixture = Seq(
      (1L, s"the a $pad"),                                    // clean: all pass
      (2L, "the a tiny doc"),                                 // too few words
      (3L, s"the a $pad # # # # # # # #"),                    // symbol-heavy
      (4L, s"the a $pad ... ... ... ... ... ... ... ..."),    // ellipsis-heavy
      (5L, s"the a $pad 00 11 22 33 44 55 66 77 88 99 00 11 22 33 44 55 66"), // digit-heavy
      (6L, pad + " extra words here again"),                  // no stopwords
      (7L, ("a " * 62).trim)                                  // mean word length 1 < 3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFilter(fixture).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = Seq("f_word_count", "f_word_len", "f_symbols", "f_alpha", "f_stopwords")
      .map(f => f -> out(id).getInt(out(id).fieldIndex(f))).toMap
    assert(out(1L).getInt(out(1L).fieldIndex("keep")) == 1)
    assert(flags(2L)("f_word_count") == 0)
    assert(flags(3L)("f_symbols") == 0 && flags(3L)("f_alpha") == 1)
    assert(flags(4L)("f_symbols") == 0)
    assert(flags(5L)("f_alpha") == 0 && flags(5L)("f_symbols") == 1)
    assert(flags(6L)("f_stopwords") == 0)
    assert(flags(7L)("f_word_len") == 0)
    // every violator is dropped
    (2L to 7L).foreach(id => assert(out(id).getInt(out(id).fieldIndex("keep")) == 0, s"doc $id"))
    // signal sanity on the real corpus: ratios are in micro-range
    val corpus = TextAnalysis.gopherFilter(docs)
    assert(corpus.filter(col("alpha_ratio_micro") > 1000000).count() == 0)
    assert(corpus.filter(col("keep") === 1).count() > 0)
    assert(corpus.filter(col("keep") === 0).count() > 0)
  }

  test("qualityScore: ratios in [0,1], composite consistent") {
    val out = TextAnalysis.qualityScore(docs).cache()
    assert(out.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() == 0)
    assert(out.filter(col("uniq_ratio") <= 0 || col("uniq_ratio") > 1).count() == 0)
    val bad = out.filter(
      abs(col("quality") - (lit(0.5) * col("uniq_ratio") + lit(0.5) * (lit(1) - col("stopword_ratio")))) > 0.0001)
    assert(bad.count() == 0)
  }

  test("languageId: guess set is {en, und} and score drives the guess") {
    val out = TextAnalysis.languageId(docs).cache()
    val guesses = out.select("lang_guess").distinct().collect().map(_.getString(0)).toSet
    assert(guesses.subsetOf(Set("en", "und")))
    assert(out.filter(col("en_score") >= 0.05 && col("lang_guess") =!= "en").count() == 0)
    assert(out.filter(col("en_score") < 0.05 && col("lang_guess") =!= "und").count() == 0)
  }

  test("fingerprint: one 32-hex fingerprint per doc; near-dups share it") {
    val out = TextAnalysis.fingerprint(docs).cache()
    assert(out.count() == docs.count())
    assert(out.filter(!col("fingerprint").rlike("^[0-9a-f]{32}$")).count() == 0)
    // identical docs (if any) must agree; sanity only — near-dups usually
    // share their min-shingle too, but that is probabilistic, not asserted.
    val dupTexts = docs.groupBy("text").count().filter(col("count") > 1).count()
    if (dupTexts > 0) {
      val fpPerText = docs.join(out, "doc_id")
        .groupBy("text").agg(countDistinct("fingerprint").as("nfp"))
      assert(fpPerText.filter(col("nfp") > 1).count() == 0)
    }
  }

  test("tokenCounts: regex tokens >= whitespace tokens on alnum text") {
    val out = TextAnalysis.tokenCounts(docs)
    // pure-word corpus: every whitespace token is >= one regex token
    assert(out.filter(col("bpe_tokens") < col("ws_tokens")).count() == 0)
    import spark.implicits._
    val mixed = Seq((1L, "ab12 cd, e-f")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(mixed).head()
    assert(r.getLong(1) == 3)  // whitespace
    assert(r.getLong(2) == 7)  // ab|12|cd|,|e|-|f
  }

  test("winnow: shared long runs share a fingerprint; short docs yield none") {
    import spark.implicits._
    // two docs sharing a 9-word run (> w+2 = 6) must share >= 1 fingerprint
    val run = "alpha beta gamma delta epsilon zeta eta theta iota"
    val d = Seq(
      (1L, s"x1 y1 $run z1"),
      (2L, s"p2 q2 r2 $run"),
      (3L, "one two three"),      // 1 shingle < w windows -> no fingerprints
      (4L, "solo")                 // no shingles at all
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.winnow(d).cache()
    val shared = fp.filter(col("doc_id") === 1).select("fp")
      .intersect(fp.filter(col("doc_id") === 2).select("fp"))
    assert(shared.count() >= 1, "guaranteed shared fingerprint missing")
    assert(fp.filter(col("doc_id") >= 3).count() == 0)
  }

  test("corpusStats: partitions the corpus exactly") {
    val out = TextAnalysis.corpusStats(docs)
    assert(out.agg(sum("n_docs")).head().getLong(0) == docs.count())
  }

  test("repetition: bounds hold; a literal repeat scores, distinct text doesn't") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c a b c a b c"),     // 7 3-grams, 3 distinct -> rep 4/7
      (2L, "p q r s t u v"),         // all distinct -> rep 0
      (3L, "x y")                    // too short -> 0 ngrams, rep 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((7L, 3L, 4L * 1000000L / 7L)))
    assert(out(2L) == ((5L, 5L, 0L)))
    assert(out(3L) == ((0L, 0L, 0L)))
    val corpus = TextAnalysis.repetition(docs)
    assert(corpus.filter(col("rep_micro") < 0 || col("rep_micro") > 1000000).count() == 0)
    assert(corpus.filter(col("n_distinct_ngrams") > col("n_ngrams")).count() == 0)
  }

  test("hashSplit: labels partition the corpus, stable, ratios near 80/10/10") {
    val out = TextAnalysis.hashSplit(docs).cache()
    assert(out.count() == docs.count())
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    val n = docs.count().toDouble
    assert(counts("train") / n > 0.6 && counts("train") / n < 0.95)
    // determinism: a second evaluation assigns identically
    val again = TextAnalysis.hashSplit(docs)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("packSequences: offsets are contiguous per shard, bins respect budget") {
    val out = TextAnalysis.packSequences(docs, budget = 2048).cache()
    // per shard: offsets start at 0 and sum(n_tokens) == max(start+n_tokens)
    val perShard = out.groupBy("source").agg(
      min("start_offset").as("mn"),
      max(col("start_offset") + col("n_tokens")).as("end"),
      sum("n_tokens").as("tot"))
    assert(perShard.filter(col("mn") =!= 0 || col("end") =!= col("tot")).count() == 0)
    assert(out.filter(col("bin_id") =!= expr("start_offset div 2048")).count() == 0)
  }

  test("p2 contamination: pairs cross the split and share a fingerprint") {
    val out = graft.SparkEntry.queries("p2_contamination")(spark, sf).cache()
    val split = TextAnalysis.hashSplit(docs)
    // every flagged test_doc is in 'test', every train_doc in 'train'
    val sides = out
      .join(split.withColumnRenamed("doc_id", "test_doc")
        .withColumnRenamed("split", "ts"), "test_doc")
      .join(split.withColumnRenamed("doc_id", "train_doc")
        .withColumnRenamed("split", "rs"), "train_doc")
    assert(sides.filter(col("ts") =!= "test" || col("rs") =!= "train").count() == 0)
    // and each pair genuinely shares >= 1 winnow fingerprint
    val fps = TextAnalysis.winnow(docs)
    val shared = out
      .join(fps.withColumnRenamed("doc_id", "test_doc"), "test_doc")
      .join(fps.withColumnRenamed("doc_id", "train_doc")
        .withColumnRenamed("fp", "fp2"), "train_doc")
      .filter(col("fp") === col("fp2"))
      .select("test_doc", "train_doc").distinct()
    assert(out.exceptAll(shared).isEmpty)
  }

  test("p1 pipeline: stages compose consistently (subset chain, exact packing)") {
    val out = graft.SparkEntry.queries("p1_training_pipeline")(spark, sf).cache()
    val d8 = graft.SparkEntry.queries("d8_clean_corpus")(spark, sf)
    // pipeline output ⊆ cleaned corpus, and per-shard offsets are contiguous
    assert(out.count() <= d8.count() && out.count() > 0)
    assert(out.join(d8.select("doc_id"), Seq("doc_id"), "left_anti").count() == 0)
    val perShard = out.groupBy("source").agg(
      min("start_offset").as("mn"),
      max(col("start_offset") + col("n_tokens")).as("end"),
      sum("n_tokens").as("tot"))
    assert(perShard.filter(col("mn") =!= 0 || col("end") =!= col("tot")).count() == 0)
    assert(out.filter(!col("split").isin("train", "val", "test")).count() == 0)
  }

  test("topTermsTfIdf: k rows per lang, ranked by score, rare terms outrank") {
    val out = TextAnalysis.topTermsTfIdf(docs, k = 10).cache()
    val perLang = out.groupBy("lang").count().collect()
    assert(perLang.forall(_.getLong(1) == 10))
    // rank order matches score order within each lang
    val badOrder = out.as("a").join(out.as("b"),
      col("a.lang") === col("b.lang") && (col("a.rank") < col("b.rank")) &&
        (col("a.score_micro") < col("b.score_micro"))).count()
    assert(badOrder == 0)
    // score = tf·1e6 div df (N constant per lang ⇒ rank-equivalent to
    // tf·N/df without its overflow); pin the formula on every output row
    val bad = out.filter(col("score_micro") =!=
      expr("tf * 1000000L div df")).count()
    assert(bad == 0)
  }

  test("domainCap: at most cap docs per domain, smallest ids, no window in the plan") {
    val docs = Tables.load(spark, sf, "documents")
    val out = TextAnalysis.domainCap(docs, cap = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"domain cap must not rank via a window sort:\n$plan")
    val kept = out.collect().map(r => (r.getString(1), r.getLong(0)))
    kept.groupBy(_._1).foreach { case (srcName, rows) =>
      assert(rows.length <= 3, s"$srcName over cap")
    }
    // per domain the kept set is exactly the 3 smallest ids
    val want = docs.collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(3).toSet).toMap
    kept.groupBy(_._1).foreach { case (srcName, rows) =>
      assert(rows.map(_._2).toSet == want(srcName), s"$srcName kept wrong ids")
    }
  }

  test("normalizeText: canonical charset, collapsed spacing, idempotent") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "Hello,   World!!"), (2L, "hello world"),
      (3L, "  A.B;C  d__e  "), (4L, "!!!"), (5L, "MiXeD 42 CaSe")
    ).toDF("doc_id", "text")
    val once = TextAnalysis.normalizeText(fixture)
    val got = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 and 2 collide after normalization — the whole point of the pass
    assert(got(1L) == "hello world" && got(2L) == "hello world")
    assert(got(3L) == "abc de", s"got '${got(3L)}'")
    assert(got(4L) == "", "pure punctuation must normalize to empty")
    assert(got(5L) == "mixed 42 case")
    // idempotent: normalizing the canonical form is the identity
    val twice = TextAnalysis.normalizeText(
      once.select(col("doc_id"), col("normalized").as("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice == got, "normalizeText is not idempotent")
  }

  test("fuzzyDecontamination: perturbed passage fires fuzzy but not exact-13; closed-form count") {
    import spark.implicits._
    // 45-token shared passage; the eval copy edits tokens 7, 20, 33 —
    // the x24 fixture geometry: 8-grams total 38, kill windows
    // [1,7]∪[13,20]∪[26,33] = 23, surviving 15; every 13-gram window
    // spans an edit (brute-force-checked below)
    val train = (1 to 45).map(i => s"qq$i").mkString(" ")
    val eval_ = (1 to 45).map(i => if (i == 7 || i == 20 || i == 33) s"zz$i" else s"qq$i").mkString(" ")
    val fixture = Seq(
      (1L, "train", s"aa1 aa2 aa3 aa4 aa5 aa6 aa7 aa8 $train"),
      (2L, "train", "bb1 bb2 bb3 bb4 bb5 bb6 bb7 bb8 bb9 bb10"),
      (3L, "eval", s"cc1 cc2 cc3 cc4 cc5 cc6 cc7 cc8 $eval_")
    ).toDF("doc_id", "kind", "text")
    val out = TextAnalysis.fuzzyDecontamination(
      fixture, "kind = 'eval'", thresholdMicro = 300000L)
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 3L)
    val r = out.head
    // eval doc: 8 own tokens + 45 passage tokens = 53 -> 46 distinct grams
    assert(r.getLong(1) == 46L, s"n_grams ${r.getLong(1)}")
    assert(r.getLong(2) == 1L, "top contaminating train doc must be doc 1")
    assert(r.getLong(3) == 15L, s"surviving canary grams ${r.getLong(3)}")
    assert(r.getLong(4) == 15L * 1000000L / 46L)
    assert(r.getInt(5) == 1, "containment above threshold must flag")
    // the EXACT 13-gram check on the same geometry sees nothing: every
    // 13-gram of the passage covers an edited position
    val g13 = fixture.selectExpr("doc_id",
      s"explode(${Dedup.wordShingleExpr("text", 13)}) AS g")
    val shared13 = g13.filter(col("doc_id") === 1L).select("g")
      .intersect(g13.filter(col("doc_id") === 3L).select("g"))
    assert(shared13.isEmpty, "exact 13-gram containment must miss this plant")
  }

  test("fuzzyDecontamination: zero-match eval doc gets its zero row, null top id") {
    import spark.implicits._
    val out = TextAnalysis.fuzzyDecontamination(Seq(
      (1L, "train", (1 to 20).map(i => s"t$i").mkString(" ")),
      (2L, "eval", (1 to 20).map(i => s"e$i").mkString(" "))
    ).toDF("doc_id", "kind", "text"), "kind = 'eval'").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 2L && r.getLong(1) == 13L)
    assert(r.isNullAt(2), "no contaminating doc -> null top_train_id")
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L && r.getInt(5) == 0)
  }

  test("decontamination: leaked passage counted, clean test doc at zero") {
    import spark.implicits._
    // md5-split fixture ids: 1 -> train, 3 -> test (verified constants)
    val w13 = (1 to 13).map(i => s"w$i").mkString(" ")          // 13-word passage
    val uniq = (1 to 13).map(i => s"u$i").mkString(" ")         // disjoint 13 words
    val fixture = Seq(
      (1L, s"train prefix words $w13"),  // train doc carries the passage
      (3L, s"$w13 and trailing junk after the leaked passage block")
    ).toDF("doc_id", "text")
    val leaked = TextAnalysis.decontamination(fixture)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(leaked.keySet == Set(3L), "only test docs appear")
    val (n, hit, micro) = leaked(3L)
    assert(hit >= 1, "shared 13-gram not counted as contaminated")
    assert(micro == hit * 1000000L / n, "ratio not derived from the counts")
    // clean variant: disjoint vocabularies -> zero containment
    val clean = TextAnalysis.decontamination(Seq(
      (1L, s"train prefix words $w13"), (3L, s"$uniq completely different tail here")
    ).toDF("doc_id", "text")).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(clean(3L) == 0L, "disjoint test doc must have zero contamination")
  }

  test("p5 composition: packed docs are quality-kept, offsets contiguous per source") {
    val out = graft.SparkEntry.queries("p5_pretraining_mixture")(spark, sf).cache()
    assert(out.count() > 0)
    // every packed doc passed the quality gate on the SAME noisy text
    val noisy = graft.core.Tables.load(spark, sf, "documents")
      .withColumn("text", expr(
        "CASE WHEN doc_id % 7 = 0 THEN concat(text, ' # # # # ... ... ... ...') " +
          "WHEN doc_id % 11 = 0 THEN concat(text, " +
          "' 00 11 22 33 44 55 66 77 88 99 00 11 22 33 44') ELSE text END"))
    val kept = TextAnalysis.gopherFilter(noisy)
      .filter(col("keep") === 1).select("doc_id")
    assert(out.join(kept, Seq("doc_id"), "left_anti").count() == 0,
      "a packed doc failed the quality gate")
    // offsets are contiguous per source over the PACKED subset: each doc's
    // start equals the previous docs' token sum
    val bad = out.withColumn("expected",
      sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .filter(coalesce(col("expected"), lit(0L)) =!= col("start_offset"))
    assert(bad.count() == 0, "pack offsets not contiguous over the sampled subset")
  }

  test("p6 composition: packed docs are selected AND fluent, offsets contiguous") {
    val out = graft.SparkEntry.queries("p6_dsir_pipeline")(spark, sf).cache()
    assert(out.count() > 0)
    // every packed doc is in the DSIR selection
    val selected = TextAnalysis.importanceSelect(docs, "source = 'src0'", budget = 200)
      .select("doc_id")
    assert(out.join(selected, Seq("doc_id"), "left_anti").count() == 0,
      "a packed doc was never selected")
    // ... and passed the fluency gate measured on the selection's own LM
    val fluent = TextAnalysis.bigramQuality(docs.join(selected, "doc_id"))
      .filter(col("lm_micro") >= 36000L).select("doc_id")
    assert(out.join(fluent, Seq("doc_id"), "left_anti").count() == 0,
      "a packed doc failed the fluency gate")
    assert(out.count() < 200, "the fluency gate dropped nothing — degenerate")
    // offsets contiguous per source over the packed subset
    val bad = out.withColumn("expected",
      sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .filter(coalesce(col("expected"), lit(0L)) =!= col("start_offset"))
    assert(bad.count() == 0, "pack offsets not contiguous over the gated subset")
  }

  test("MG summary: over-threshold items always survive; weights are lower bounds") {
    import graft.functions.MGSummary
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 10) {
      // skewed stream: 'hot' is ~40% of 500 items, k = 4 (threshold 125)
      val stream = new scala.util.Random(trial).shuffle(
        (List.fill(200)("hot") ++ List.fill(500)(()).map(_ => s"t${rnd.nextInt(40)}")).take(500))
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // simulate a partial-merge tree: 5 partition summaries merged pairwise
      val parts = stream.grouped(100).map { chunk =>
        val s = new MGSummary(4); chunk.foreach(s.insert(_)); s
      }.toList
      val merged = parts.reduce { (a, b) => a.mergeFrom(b); a }
      val cands = merged.sorted.map(_._1).toSet
      truth.foreach { case (item, c) =>
        if (c * 4 > stream.size)
          assert(cands.contains(item), s"trial=$trial lost heavy item $item ($c)")
      }
      merged.sorted.foreach { case (item, lb) =>
        assert(lb <= truth(item), s"trial=$trial weight overestimates $item")
      }
    }
  }

  test("heavyTokens: equals the exact threshold query; small k still exact after verify") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    for (k <- Seq(8, 64)) {
      val got = TextAnalysis.heavyTokens(docs, k = k)
      val toks = docs.select(explode(split(col("text"), " ")).as("token"))
      val n = toks.count()
      val want = toks.groupBy("token").agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") * k > n)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"k=$k heavy-hitter set diverged from the exact threshold query")
    }
  }

  test("absorbHeavyHitters: adversarial batch splits all yield heavyTokens' exact set; retry idempotent") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val want = TextAnalysis.heavyTokens(docs)
    // three very different batch geometries: near-even halves, a 1-doc
    // sliver + the rest, and ten hash slices — the superset guarantee
    // (some batch sees c_i > n_i/k for every global hitter) is split-
    // independent, so the exact-verified result must be too
    val splits = Seq(
      Seq("doc_id % 2 = 0", "doc_id % 2 = 1"),
      Seq("doc_id = 0", "doc_id != 0"),
      (0 until 10).map(i => s"doc_id % 10 = $i"))
    splits.foreach { preds =>
      val path = tmpDir("hh_summary")
      preds.zipWithIndex.foreach { case (p, i) =>
        TextAnalysis.absorbHeavyHitters(path, docs.filter(expr(p)), s"b$i")
      }
      val got = TextAnalysis.searchHeavyHitters(spark, path, docs)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"split ${preds.length} ways diverged from the one-pass discovery")
    }
    // retried absorb (same batch id) overwrites, never double-counts
    val path = tmpDir("hh_retry")
    TextAnalysis.absorbHeavyHitters(path, docs, "b0")
    TextAnalysis.absorbHeavyHitters(path, docs, "b0")
    val got = TextAnalysis.searchHeavyHitters(spark, path, docs)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // searching at a FINER threshold than the summaries guarantee (k' > k)
    // could silently miss true hitters — must refuse, and a coarser
    // search (k' < k) stays valid (its hitters exceed the stored bound too)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.searchHeavyHitters(spark, path, docs, k = 128)
    }
    assert(e.getMessage.contains("k=64"))
    val coarse = TextAnalysis.searchHeavyHitters(spark, path, docs, k = 8)
    val coarseWant = TextAnalysis.heavyTokens(docs, k = 8)
    assert(coarse.exceptAll(coarseWant).isEmpty &&
      coarseWant.exceptAll(coarse).isEmpty)
  }

  test("collocations: lift equals brute-force ratio; minCount gates; planted pair tops the list") {
    import spark.implicits._
    // 'new york' always adjacent and exclusive (high lift); 'the'
    // promiscuous (low lift); a rare pair below minCount must not appear
    val docs = (
      (1 to 20).map(i => (i.toLong, "new york is the city the people the like")) ++
        Seq((100L, "rare pair rare pair rare pair rare pair"))
      ).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, k = 10, minCount = 5).cache()
    // brute force the same definition
    val bg = docs.select(explode(expr(
      """transform(sequence(1, size(split(text, ' ')) - 1),
           i -> struct(element_at(split(text, ' '), i) AS w1,
                       element_at(split(text, ' '), i + 1) AS w2))""")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val n = bg.count()
    val uni = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val want = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 5)
      .join(uni.select(col("w").as("w1"), col("cnt").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cnt").as("c2")), "w2")
      .select(col("w1"), col("w2"), col("n_pair"),
        expr(s"((n_pair * 1000000L) div c1) * ${n}L div (c2 * 1000L)").as("lift_milli"))
      .orderBy(col("lift_milli").desc, col("n_pair").desc, col("w1"), col("w2"))
      .limit(10)
    assert(out.exceptAll(want).isEmpty && want.exceptAll(out).isEmpty)
    val top = out.orderBy(col("lift_milli").desc).head()
    assert(top.getString(0) == "new" && top.getString(1) == "york",
      s"exclusive adjacent pair must top the lift ranking, got $top")
    assert(out.filter(col("w1") === "rare").count() == 0,
      "a 4-occurrence pair must fall below minCount = 5")
    // 'the x' pairs score below the exclusive pair (promiscuous left part)
    val theLift = out.filter(col("w1") === "the").agg(max("lift_milli")).head().getLong(0)
    assert(theLift < top.getLong(3))
  }

  test("mixtureSample: monotone in budget — a larger budget's sample contains the smaller's") {
    // rates grow with the budget and selection is a fixed per-doc hash
    // against the rate threshold, so samples NEST: growing the token budget
    // only ADDS documents (stable incremental training-set growth — an
    // RNG-based sampler reshuffles everything instead)
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val budgets = Seq(2000L, 8000L, 20000L, 100000L)
    val samples = budgets.map(b =>
      TextAnalysis.mixtureSample(docs, b).select("doc_id"))
    budgets.indices.drop(1).foreach { i =>
      val missing = samples(i - 1).exceptAll(samples(i)).count()
      assert(missing == 0,
        s"budget ${budgets(i - 1)} sample not contained in ${budgets(i)}'s")
    }
    // and strictly grows somewhere across this budget range
    assert(samples.head.count() < samples.last.count())
  }

  test("unigramQuality: common vocabulary outranks rare; pure-OOV doc scores zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "zxq qwv bnm")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramQuality(docs, minCount = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // vocab (>=2 corpus occurrences): the=3, cat=2, sat=2
    assert(out(2L) == ((3L, (3L + 2 + 2) * 1000000L / 3, 0L)))       // all in vocab
    assert(out(1L) == ((6L, (3L + 2 + 2 + 0 + 3 + 0) * 1000000L / 6, 2 * 1000000L / 6)))
    assert(out(3L) == ((3L, 0L, 1000000L)))                          // gibberish: all OOV
    assert(out(2L)._2 > out(1L)._2 && out(1L)._2 > out(3L)._2)
  }

  test("bigramQuality: fluent repetition outranks shuffled same-unigrams text; short docs emit nothing") {
    import spark.implicits._
    // docs 1 and 2 repeat the SAME fluent bigrams; doc 3 has the same
    // UNIGRAM profile as doc 1 but scrambled adjacency — unigram scoring
    // can't separate them, bigram scoring must. doc 4 is too short to score.
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "mat cat on sat the the"),
      (4L, "single")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramQuality(docs, minCount = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!out.contains(4L), "a 1-token doc got a bigram score")
    // vocab (cnt>=2): exactly docs 1/2's five shared pairs (2x each);
    // unigram counts: the=6, cat=3, sat=3, on=3, mat=3
    // doc 1 pairs: (the,cat):2/6, (cat,sat):2/3, (sat,on):2/3, (on,the):2/3, (the,mat):2/6
    val expect1 = (2L * 1000000 / 6 + 2L * 1000000 / 3 + 2L * 1000000 / 3 +
      2L * 1000000 / 3 + 2L * 1000000 / 6) / 5
    assert(out(1L) == ((5L, expect1, 0L)), s"doc 1 got ${out(1L)}")
    assert(out(2L) == out(1L), "identical docs scored differently")
    // scrambled doc: same unigram multiset, but no pair recurs -> all OOV
    assert(out(3L) == ((5L, 0L, 1000000L)), s"shuffled doc got ${out(3L)}")
    assert(out(1L)._2 > out(3L)._2, "bigram score failed to separate fluency from unigram profile")
  }

  test("importanceSelect: exact top-budget by score, target slice enriched, deterministic") {
    val out = TextAnalysis.importanceSelect(docs, "source = 'src0'", budget = 50).cache()
    assert(out.count() == 50)
    // selection is the true top-50: every selected score beats (or ties
    // with a smaller id than) every unselected score
    val all = TextAnalysis.importanceSelect(docs, "source = 'src0'", budget = 100000)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("dsir_micro").desc, col("doc_id"))))
    val expected = all.filter(col("rk") <= 50).select("doc_id")
    assert(out.select("doc_id").exceptAll(expected).isEmpty,
      "graft_topk selection disagrees with the window-ranked truth")
    // the target slice scores what it is measured against: src0 docs are
    // over-represented in the selection relative to their corpus share
    val srcShare = docs.filter("source = 'src0'").count().toDouble / docs.count()
    val selShare = out.join(docs.filter("source = 'src0'").select("doc_id"), "doc_id")
      .count().toDouble / 50
    assert(selShare > srcShare,
      s"target slice not enriched: $selShare of selection vs $srcShare of corpus")
    val again = TextAnalysis.importanceSelect(docs, "source = 'src0'", budget = 50)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("BPE: closed-form merges on a crafted corpus; counts exact; deterministic") {
    import spark.implicits._
    // freq-weighted corpus: "ab" dominates, so (a,b) then (ab,</w>) must be
    // the first merges; ties broken (count desc, left asc, right asc)
    val docs = Seq(
      (1L, "ab ab ab ab cd"),
      (2L, "ab ab cd cd ee"),
      (3L, "ab cd ee")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, merges = 4, vocabWords = 8)
    assert(merges.head == ("a", "b"), s"first merge should be (a,b), got ${merges.head}")
    assert(merges(1) == ("ab", "</w>"), s"second merge should be (ab,</w>), got ${merges(1)}")
    // counts: after (a,b)+(ab,</w>), "ab" is ONE token; "cd"/"ee" depend on
    // the remaining 2 merges — verify against a hand-computed encode
    val counts = TextAnalysis.bpeTokenCounts(docs, merges = 4, vocabWords = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val learned = merges
    def encode(w: String): Int = {
      var s = w.map(_.toString).mkString(" ", "  ", "  </w> ")
      learned.foreach { case (l, r) => s = s.replace(s" $l  $r ", s" $l$r ") }
      s.trim.split("  ").length
    }
    def docCount(text: String): Long =
      text.split(" ").filter(_.nonEmpty).map(encode(_).toLong).sum
    assert(counts == Map(
      1L -> docCount("ab ab ab ab cd"),
      2L -> docCount("ab ab cd cd ee"),
      3L -> docCount("ab cd ee")), s"counts $counts diverge from replay")
    assert(encode("ab") == 1, "dominant word should collapse to one token")
    // determinism on the real corpus: identical merge tables run-to-run
    val corpus = graft.core.Tables.load(spark, sf, "documents")
    val m1 = TextAnalysis.bpeMerges(corpus).collect().toSeq
    val m2 = TextAnalysis.bpeMerges(corpus).collect().toSeq
    assert(m1 == m2, "BPE training is not deterministic")
    assert(m1.size == 32)
    // true counts never exceed the character count + word count (each word
    // adds one </w> and merging only shrinks), and are >= word count
    val joined = TextAnalysis.bpeTokenCounts(corpus)
      .join(corpus.selectExpr("doc_id",
        s"CAST(size(regexp_extract_all(text, '${TextAnalysis.BpePreTokenPattern}', 0)) AS BIGINT) AS nw"),
        "doc_id")
    assert(joined.filter(col("bpe_tokens") < col("nw")).count() == 0,
      "a word encodes to at least one token")
  }

  test("mixtureSample: over-budget keeps the whole corpus; tight budget downsamples; deterministic") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val tokens = docs.selectExpr("doc_id", "source",
      "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens")
    val totalDocs = tokens.count()
    val totalTokens = tokens.agg(sum("n_tokens")).collect()(0).getLong(0)
    val nDomains = tokens.select("source").distinct().count()
    // budget >= n_domains * max(domain total): every rate clips at 1
    val maxDomain = tokens.groupBy("source").agg(sum("n_tokens").as("t"))
      .agg(max("t")).collect()(0).getLong(0)
    val all = TextAnalysis.mixtureSample(docs, maxDomain * nDomains)
    assert(all.count() == totalDocs, "over-budget sample must keep every doc")
    // tight budget (~1/4 of the corpus): the sample must actually shrink,
    // and every domain must still be within its own total
    val tight = TextAnalysis.mixtureSample(docs, math.max(1L, totalTokens / 4))
    val keptTokens = tight.agg(coalesce(sum("n_tokens"), lit(0L)))
      .collect()(0).getLong(0)
    assert(keptTokens < totalTokens, "tight budget failed to downsample")
    // deterministic: a second run selects the identical doc set
    val again = TextAnalysis.mixtureSample(docs, math.max(1L, totalTokens / 4))
    assert(tight.exceptAll(again).isEmpty && again.exceptAll(tight).isEmpty)
  }
}
