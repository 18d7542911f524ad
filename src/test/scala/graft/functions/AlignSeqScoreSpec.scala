package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AlignSeqScoreSpec extends SparkSpec {

  import spark.implicits._

  test("graft_align_score equals the declarative HOF formulation on random sequences") {
    GraftFunctions.register(spark)
    // deterministic pseudo-random flattened 4-words-per-frame sequences of
    // varying frame counts (3..7), with LOW-WEIGHT words (xxhash64 % 16 as
    // bit patterns) so hamming ≤ 4 hits actually occur
    val df = spark.range(300).select(
      expr("flatten(transform(sequence(0, CAST(id % 5 AS INT) + 2), f -> " +
        "transform(sequence(0, 3), j -> xxhash64(id * 31 + f * 4 + j) % 16)))").as("a"),
      expr("flatten(transform(sequence(0, CAST(id % 4 AS INT) + 2), f -> " +
        "transform(sequence(0, 3), j -> xxhash64(id * 17 + f * 4 + j + CAST(id % 3 = 0 AS INT) * 4) % 16)))").as("b"))
    val frameHamming = (0 until 4)
      .map(j => s"bit_count(element_at(a, (f) * 4 + $j + 1) ^ element_at(b, (f + o) * 4 + $j + 1))")
      .mkString(" + ")
    val checked = df
      .withColumn("scores", expr(
        s"""transform(sequence(-2, 2), o ->
              size(filter(sequence(0, CAST(size(a) div 4 AS INT) - 1), f ->
                f + o >= 0 AND f + o < size(b) div 4 AND $frameHamming <= 4)))"""))
      .withColumn("want_matched", expr("array_max(scores)"))
      .withColumn("want_offset", expr(
        "element_at(filter(sequence(-2, 2), o -> element_at(scores, o + 3) = array_max(scores)), 1)"))
      .withColumn("al", expr("graft_align_score(a, b, 4, 2, 4)"))
    val bad = checked.filter(
      expr("element_at(al, 1)") =!= col("want_offset") ||
        expr("element_at(al, 2)") =!= col("want_matched"))
    assert(bad.count() == 0, "native alignment diverges from HOF formulation")
    // sanity: the fixture must actually exercise non-zero matches
    assert(checked.filter(col("want_matched") > 0).count() > 0)
  }

  test("edge cases: empty sequences, unequal lengths, all-miss ties") {
    GraftFunctions.register(spark)
    val df = Seq(
      // empty vs non-empty: no aligned frames, matched 0, smallest offset
      (Array.empty[Long], Array(1L, 2L, 3L, 4L), -2, 0),
      // identical single frame: matched 1 at offset 0 (offsets -2/-1 score 0)
      (Array(7L, 8L, 9L, 10L), Array(7L, 8L, 9L, 10L), 0, 1),
      // shifted copy: b = [x, a0] -> a frame 0 matches b frame 1 => offset +1
      (Array(7L, 8L, 9L, 10L), Array(99L, 99L, 99L, 99L, 7L, 8L, 9L, 10L), 1, 1),
      // all-miss: hamming far above budget everywhere
      (Array(0L, 0L, 0L, 0L), Array(-1L, -1L, -1L, -1L), -2, 0)
    ).toDF("a", "b", "want_offset", "want_matched")
    val bad = df
      .withColumn("al", expr("graft_align_score(a, b, 4, 2, 4)"))
      .filter(expr("element_at(al, 1)") =!= col("want_offset") ||
        expr("element_at(al, 2)") =!= col("want_matched"))
    assert(bad.count() == 0)
  }

  test("interpreted eval matches the codegen result") {
    val lit = (xs: Array[Long]) =>
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        xs, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    // two 2-frame sequences, b shifted by one frame vs a (A1 vs B1 hamming
    // is 6, above the budget, so only the o=+1 alignment scores)
    val a = Array(3L, 0L, 0L, 0L, 12L, 5L, 0L, 0L)
    val b = Array(9L, 9L, 9L, 9L, 3L, 0L, 0L, 0L)
    val e = AlignSeqScore(lit(a), lit(b), 4, 2, 4)
    val r = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(r.getInt(0) == 1 && r.getInt(1) == 1,
      s"expected offset 1 / matched 1, got ${r.getInt(0)} / ${r.getInt(1)}")
  }
}
