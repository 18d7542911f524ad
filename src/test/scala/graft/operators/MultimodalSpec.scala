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

  test("decode stub is deterministic and bounded") {
    val d = Multimodal.decodeStub(media).select("decoded.width", "decoded.height")
    val r = d.agg(
      min("width"), max("width"), min("height"), max("height")).head()
    assert(r.getLong(0) >= 16 && r.getLong(1) < 16 + 1024)
    assert(r.getLong(2) >= 16 && r.getLong(3) < 16 + 1024)
  }
}
