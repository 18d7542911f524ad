package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructType}

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.mediaFromDocuments(Tables.load(spark, sf, "documents"))

  test("media table: binary content + typed metadata struct") {
    val schema = media.schema
    assert(schema("content").dataType == BinaryType)
    val meta = schema("meta").dataType.asInstanceOf[StructType]
    assert(meta("orig_lang").dataType == StringType)
    assert(meta("n_bytes").dataType == LongType)
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("mediaFeatures: map-only plan, no shuffle") {
    val feats = Multimodal.mediaFeatures(media)
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"feature extraction shuffled:\n$plan")
    assert(feats.count() == media.count())
  }

  test("frame sampling covers every byte exactly once, in order") {
    val frames = Multimodal.frameSample(media)
    // per-media: frame count = ceil(bytes/256), offsets are the arithmetic
    // sequence, and re-hashing the original slices reproduces frame_md5
    val check = frames
      .join(media.select(col("media_id"), col("content")), "media_id")
      .withColumn("expect_md5",
        expr(s"md5(substring(content, CAST(frame_offset AS INT), ${Multimodal.FrameBytes}))"))
    assert(check.filter(col("frame_md5") =!= col("expect_md5")).count() == 0)
    val counts = frames.groupBy("media_id").count()
      .join(media.select(col("media_id"),
        expr(s"CAST(ceil(octet_length(content) / ${Multimodal.FrameBytes}.0) AS BIGINT)").as("nf")),
        "media_id")
    assert(counts.filter(col("count") =!= col("nf")).count() == 0)
  }

  test("frame sampling of zero-byte media yields zero frames, not sequence(0,-1)") {
    import spark.implicits._
    val empty = Seq((1L, "image", Array.empty[Byte])).toDF("media_id", "kind", "content")
    assert(Multimodal.frameSample(empty).count() == 0)
  }

  test("PNG decode recovers the closed-form dimensions and channel means") {
    val decoded = media
      .withColumn("decoded", Multimodal.decodeImage(Multimodal.encodePngFixture(col("media_id"))))
      .select(col("media_id"), col("decoded.*"))
    assert(decoded.filter(col("width").isNull).count() == 0,
      "every fixture PNG must decode")
    val bad = decoded.filter(
      col("width") =!= expr("4 + media_id % 29") ||
        col("height") =!= expr("4 + (media_id * 7) % 23") ||
        col("channels") =!= 3 ||
        col("meanRMicro") =!=
          expr("(media_id % 200) * 1000000 + (media_id % 29 + 3) * 500000") ||
        col("meanGMicro") =!=
          expr("((media_id * 3) % 200) * 1000000 + ((media_id * 7) % 23 + 3) * 500000") ||
        col("meanBMicro") =!= expr("((media_id * 5) % 256) * 1000000"))
    assert(bad.count() == 0, "decoded properties diverged from the encode-side formulas")
  }

  test("thumbnails: ceil-half dims, means shift by (w2-1)/(h2-1), b constant; garbage quarantines") {
    val thumbs = Multimodal.thumbnails(media)
    assert(thumbs.filter(col("thumb_w").isNull).count() == 0,
      "every fixture thumb must decode")
    val bad = thumbs.filter(
      col("thumb_w") =!= expr("(4 + media_id % 29 + 1) div 2") ||
        col("thumb_h") =!= expr("(4 + (media_id * 7) % 23 + 1) div 2") ||
        col("channels") =!= 3 ||
        col("mean_r_micro") =!=
          expr("(media_id % 200 + (4 + media_id % 29 + 1) div 2 - 1) * 1000000") ||
        col("mean_g_micro") =!=
          expr("((media_id * 3) % 200 + (4 + (media_id * 7) % 23 + 1) div 2 - 1) * 1000000") ||
        col("mean_b_micro") =!= expr("((media_id * 5) % 256) * 1000000"))
    assert(bad.count() == 0, "thumb properties diverged from the closed form")
    // non-image bytes quarantine as null, like decodeImage
    import spark.implicits._
    val junk = Seq(Array[Byte](1, 2, 3)).toDF("b")
      .select(Multimodal.resizeHalf(col("b")).as("t"))
    assert(junk.filter(col("t").isNull).count() == 1)
  }

  test("WAV decode recovers the closed-form format and square-wave statistics") {
    val decoded = Multimodal.wavFeatures(media)
    assert(decoded.filter(col("sample_rate").isNull).count() == 0,
      "every fixture WAV must decode")
    val bad = decoded.filter(
      col("sample_rate") =!= expr("8000 + (media_id % 8) * 1000") ||
        col("channels") =!= 1 || col("bits_per_sample") =!= 16 ||
        col("n_samples") =!= expr("64 + media_id % 192") ||
        col("peak") =!= expr("1000 + media_id % 9000") ||
        col("mean_abs_milli") =!= expr("(1000 + media_id % 9000) * 1000"))
    assert(bad.count() == 0, "decoded audio stats diverged from the encode-side formulas")
  }

  test("WAV decode is a real codec: independently-built WAV parses, garbage quarantines") {
    import spark.implicits._
    // hand-build a 4-sample PCM16LE mono WAV at 8000 Hz, samples 100,-100,100,-100
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val pcm = Array[Short](100, -100, 100, -100)
      .flatMap(s => Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 4L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val rows = Seq(
      (1L, bos.toByteArray),
      (2L, Array.tabulate[Byte](64)(i => (i * 3).toByte)))
      .toDF("id", "bytes")
      .withColumn("decoded", Multimodal.decodeWav(col("bytes")))
    val ok = rows.filter(col("id") === 1).select("decoded.*").head()
    assert(ok.getLong(0) == 8000L && ok.getLong(1) == 1L && ok.getLong(2) == 16L)
    assert(ok.getLong(3) == 4L && ok.getLong(4) == 100L && ok.getLong(5) == 100000L)
    assert(rows.filter(col("id") === 2).select("decoded").head().isNullAt(0),
      "non-audio bytes must decode to null")
  }

  test("decode is a real codec: it reads an independently-built PNG, rejects garbage") {
    import spark.implicits._
    // PNG built directly here (not via encodePngFixture) — proves decodeImage
    // parses actual PNG bytes rather than pattern-matching its own fixture
    val img = new java.awt.image.BufferedImage(
      5, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 5) img.setRGB(x, y, (10 << 16) | (20 << 8) | 30)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = Seq(
      (1L, bos.toByteArray),
      (2L, Array.tabulate[Byte](64)(i => (i * 7).toByte))) // not an image
      .toDF("id", "bytes")
      .withColumn("decoded", Multimodal.decodeImage(col("bytes")))
    val ok = rows.filter(col("id") === 1).select("decoded.*").head()
    assert(ok.getLong(0) == 5L && ok.getLong(1) == 2L && ok.getLong(2) == 3L)
    assert(ok.getLong(3) == 10000000L && ok.getLong(4) == 20000000L && ok.getLong(5) == 30000000L)
    assert(rows.filter(col("id") === 2).select("decoded").head().isNullAt(0),
      "garbage bytes must decode to null, not crash or fake values")
  }

  test("JPEG road (round 18): mixedDecode gates PNG values, JPEG dims/bands, raw null-quarantine; thumbnails resample JPEG bytes") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents").limit(60)
    val out = Multimodal.mixedDecode(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      r.getString(1) match {
        case "png" =>
          assert(r.getLong(5) == 1L)
          assert(r.getLong(2) == 4 + id % 29 && r.getLong(3) == 4 + (id * 7) % 23)
          assert(r.getLong(4) == 3L)
        case "jpeg" =>
          assert(r.getLong(5) == 1L, s"JPEG blob of id=$id must decode")
          assert(r.getLong(2) == 8 + id % 17 && r.getLong(3) == 8 + (id * 5) % 13)
          assert(r.getLong(4) == 3L)
        case "raw" =>
          assert(r.getLong(5) == 0L && r.isNullAt(2) && r.isNullAt(3),
            s"raw bytes of id=$id must quarantine as null")
      }
    }
    assert(Set("png", "jpeg", "raw").subsetOf(
      out.map(_.getString(1)).toSet))
    // the m4 resample chain accepts JPEG INPUT bytes too: decode -> half
    // -> re-encode PNG -> decode (dims gate; JPEG is lossy so means don't)
    val jpegId = out.find(_.getString(1) == "jpeg").get.getLong(0)
    val thumb = Seq(jpegId).toDF("id")
      .withColumn("blob", Multimodal.encodeJpegFixture(col("id")))
      .withColumn("decoded",
        Multimodal.decodeImage(Multimodal.resizeHalf(col("blob"))))
      .select("decoded.width", "decoded.height", "decoded.channels").head()
    assert(thumb.getLong(0) == (8 + jpegId % 17 + 1) / 2 &&
      thumb.getLong(1) == (8 + (jpegId * 5) % 13 + 1) / 2 &&
      thumb.getLong(2) == 3L)
    // an independently-built JPEG (not the fixture) parses too
    val img = new java.awt.image.BufferedImage(
      9, 6, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 6; x <- 0 until 9)
      img.setRGB(x, y, (40 << 16) | (80 << 8) | 120)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val d = Seq((1L, bos.toByteArray)).toDF("id", "bytes")
      .withColumn("decoded", Multimodal.decodeImage(col("bytes")))
      .select("decoded.*").head()
    assert(d.getLong(0) == 9L && d.getLong(1) == 6L && d.getLong(2) == 3L)
  }

  test("audio decimation through the codec: half rate, ceil-half frames, invariant stats; garbage quarantines") {
    import spark.implicits._
    val media = Seq(0L, 5L, 7L, 191L).toDF("media_id")
    val out = Multimodal.audioResample(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    out.foreach { case (id, r) =>
      assert(r.getLong(1) == (8000 + (id % 8) * 1000) / 2, s"rate wrong for $id")
      assert(r.getLong(2) == (64 + id % 192 + 1) / 2, s"frames wrong for $id")
      assert(r.getLong(3) == 1000 + id % 9000, s"peak changed for $id")
      assert(r.getLong(4) == (1000 + id % 9000) * 1000, s"mean|s| changed for $id")
    }
    // the decimated bytes are a REAL WAV: the decoder round-trips them,
    // and garbage in quarantines as null instead of crashing
    val junk = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "b")
      .select(Multimodal.decimateWav(col("b")).as("out"))
    assert(junk.head().isNullAt(0), "garbage must decimate to null")
  }

  test("sceneKeyframes: equals brute-force bitstring transitions; openers flag; partial corruption quarantines whole video") {
    import spark.implicits._
    val frames = spark.range(60).filter(col("id") % 2 === 0)
      .select(col("id").as("video_id"),
        explode(expr("sequence(0, 4)")).as("frame_idx"))
      .select(col("video_id"), col("frame_idx"),
        Multimodal.encodeVideoFrameFixture(
          col("video_id"), col("frame_idx")).as("content"))
    val got = Multimodal.sceneKeyframes(frames).cache()
    // every frame of every video present; every video's frame 0 is a
    // keyframe with null transition
    assert(got.count() == 30L * 5)
    val openers = got.filter(col("frame_idx") === 0)
    assert(openers.count() == 30 &&
      openers.filter(col("is_keyframe") =!= 1 || col("hamming_prev").isNotNull)
        .count() == 0)
    // brute-force truth via independent per-character bitstring compares
    val fp = frames.select(col("video_id"), col("frame_idx"),
      Multimodal.dHash(col("content")).as("h"))
    val brute = fp.as("a").join(fp.as("b"),
        col("a.video_id") === col("b.video_id") &&
          col("a.frame_idx") === col("b.frame_idx") + 1)
      .select(col("a.video_id").as("video_id"),
        col("a.frame_idx").cast("long").as("frame_idx"),
        expr("CAST(size(filter(sequence(1, 64), i -> substring(a.h, i, 1) != substring(b.h, i, 1))) AS BIGINT)")
          .as("hamming_prev"))
      .withColumn("is_keyframe",
        when(col("hamming_prev") > 4, 1).otherwise(0))
    val gotTransitions = got.filter(col("frame_idx") > 0)
    assert(gotTransitions.exceptAll(brute).isEmpty &&
      brute.exceptAll(gotTransitions).isEmpty,
      "lag-window transitions diverge from brute-force compare")
    // partial corruption: one bad frame drops the WHOLE video (a hole
    // would fabricate a transition across the splice), others untouched
    val oneBad = frames.withColumn("content",
      when(col("video_id") === 4 && col("frame_idx") === 2,
        lit(Array[Byte](9, 9))).otherwise(col("content")))
    val q = Multimodal.sceneKeyframes(oneBad)
    assert(q.filter(col("video_id") === 4).count() == 0,
      "partially-corrupt video must quarantine entirely")
    assert(q.count() == got.count() - 5,
      "quarantine must not disturb other videos")
  }

  test("curateKeyframes: equals brute-force keyframe dedup; keep rule is (vid, frame)-minimal") {
    val frames = spark.range(60).filter(col("id") % 2 === 0)
      .select(col("id").as("video_id"),
        explode(expr("sequence(0, 4)")).as("frame_idx"))
      .select(col("video_id"), col("frame_idx"),
        Multimodal.encodeVideoFrameFixture(
          col("video_id"), col("frame_idx")).as("content"))
    val got = Multimodal.curateKeyframes(frames).cache()
    // brute force: keyframes via bitstring lag compare, all-pairs hamming
    val fp = frames.select(col("video_id"), col("frame_idx"),
      Multimodal.dHash(col("content")).as("h"))
    val lagged = fp.as("a").join(fp.as("b"),
        col("a.video_id") === col("b.video_id") &&
          col("a.frame_idx") === col("b.frame_idx") + 1, "left")
      .select(col("a.video_id").as("video_id"),
        col("a.frame_idx").cast("long").as("frame_idx"), col("a.h").as("h"),
        when(col("b.h").isNull, lit(null).cast("int"))
          .otherwise(expr(
            "size(filter(sequence(1, 64), i -> substring(a.h, i, 1) != substring(b.h, i, 1)))"))
          .as("hp"))
    val kf = lagged.filter(col("hp").isNull || col("hp") > 4)
      .withColumn("ord", col("video_id") * 1048576 + col("frame_idx"))
    val pr = kf.as("x").join(kf.as("y"),
        col("x.ord") =!= col("y.ord") &&
          expr("size(filter(sequence(1, 64), i -> substring(x.h, i, 1) != substring(y.h, i, 1))) <= 4"))
      .select(col("x.ord").as("ord"), col("y.ord").as("p"))
    val ag = pr.groupBy("ord")
      .agg(count(lit(1)).as("n_dups"), min("p").as("mp"))
    val want = kf.join(ag, Seq("ord"), "left")
      .select(col("video_id"), col("frame_idx"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        when(col("mp").isNotNull && col("mp") < col("ord"), 0)
          .otherwise(1).as("is_kept"))
    assert(got.count() == want.count() && got.count() >= 30,
      "every video contributes at least its opener")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "banded keyframe dedup diverges from brute force")
    // at least one duplicate group collapses (the planted reposts), and
    // exactly one member per group is kept
    assert(got.filter(col("is_kept") === 0).count() > 0,
      "fixture must produce at least one dropped duplicate keyframe")
  }
}
