package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashSignatureSpec extends SparkSpec {

  import spark.implicits._

  test("graft_minhash equals the declarative explode + n-way min formulation") {
    GraftFunctions.register(spark)
    val P = MinHashSignature.P
    val numHashes = 16
    // deterministic pseudo-random shingle-hash sets (can be negative, like
    // xxhash64 output)
    val sets = spark.range(1, 60).select(col("id"),
      expr("array_distinct(transform(sequence(0, CAST(id % 20 AS INT) + 2), i -> xxhash64(id * 31 + i)))")
        .as("sh"))

    val native = sets
      .select(col("id"), posexplode(expr(s"graft_minhash(sh, $numHashes)")).as(Seq("i", "m")))

    val (as, bs) = MinHashSignature.coeffs(numHashes)
    val aggs = (0 until numHashes).map(i =>
      min(expr(s"(${as(i)} * pmod(v, $P) + ${bs(i)}) % $P")).as(s"m$i"))
    val declarative = sets
      .select(col("id"), explode(col("sh")).as("v"))
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), posexplode(array((0 until numHashes).map(i => col(s"m$i")): _*))
        .as(Seq("i", "m")))

    assert(native.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(native).isEmpty)
  }

  test("empty input yields MaxValue sentinels; interpreted == result shape") {
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array.empty[Long],
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    val out = MinHashSignature(lit, 4).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(out.length == 4 && out.forall(_ == Long.MaxValue))
  }
}
