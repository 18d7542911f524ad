package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedIntersectSizeSpec extends SparkSpec {

  import spark.implicits._

  test("graft_isect_size equals size(array_intersect) on sorted distinct arrays") {
    GraftFunctions.register(spark)
    // deterministic pseudo-random sorted distinct long arrays
    val df = spark.range(200).select(
      expr("array_sort(array_distinct(transform(sequence(0, CAST(id % 50 AS INT) + 1), i -> xxhash64(id * 7 + i) % 100)))").as("a"),
      expr("array_sort(array_distinct(transform(sequence(0, CAST(id % 37 AS INT) + 1), i -> xxhash64(id * 13 + i) % 100)))").as("b"))
    val bad = df.filter(
      expr("graft_isect_size(a, b)") =!= size(array_intersect(col("a"), col("b"))))
    assert(bad.count() == 0)
  }

  test("edge cases: empty, disjoint, identical") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array.empty[Long], Array(1L, 2L), 0),
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L), 0),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L), 3),
      (Array(-5L, 0L, 9L), Array(-5L, 9L, 10L), 2)
    ).toDF("a", "b", "want")
    assert(df.filter(expr("graft_isect_size(a, b)") =!= col("want")).count() == 0)
  }

  test("interpreted eval matches the codegen result") {
    val lit = (xs: Array[Long]) =>
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        xs, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    val e = SortedIntersectSize(lit(Array(1L, 5L, 9L, 12L)), lit(Array(0L, 5L, 12L)))
    assert(e.eval(null) == 2)
  }
}
