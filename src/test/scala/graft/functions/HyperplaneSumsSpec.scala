package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HyperplaneSumsSpec extends SparkSpec {

  import spark.implicits._

  test("graft_hp_sums equals the declarative explode+join+sum formulation") {
    GraftFunctions.register(spark)
    val bits = 8
    val dim = 5
    val vecs = Seq(
      (1L, Array(0.5, -1.25, 3.0, 0.0, 2.5)),
      (2L, Array(-0.1, 0.1, -0.1, 0.1, -0.1)),
      (3L, Array(1e-9, -1e-9, 0.0, 7.7, -7.7))
    ).toDF("id", "v")

    val native = vecs
      .select(col("id"), posexplode(expr(s"graft_hp_sums(v, $bits, $dim)")).as(Seq("bit", "s")))

    val signs = HyperplaneSums.signs(bits, dim)
    val hpDf = (for { b <- 0 until bits; d <- 0 until dim }
      yield (b, d, signs(b * dim + d))).toDF("bit", "d", "sign")
    val declarative = vecs
      .select(col("id"), posexplode(col("v")).as(Seq("d", "x")))
      .join(hpDf, "d")
      .groupBy("id", "bit")
      .agg(sum(expr("CAST(floor(sign * x * 10000000D) AS BIGINT)")).as("s"))

    assert(native.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(native).isEmpty)
  }

  test("interpreted eval matches the codegen path") {
    val e = HyperplaneSums(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.3, -0.7, 1.1),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      bits = 4, dim = 3)
    val interp = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val signs = HyperplaneSums.signs(4, 3)
    val v = Array(0.3, -0.7, 1.1)
    val want = Array.tabulate(4) { b =>
      (0 until 3).map(d => math.floor(signs(b * 3 + d) * v(d) * 1.0e7).toLong).sum
    }
    assert(interp.sameElements(want))
  }

  test("short vectors contribute only present dims; sign matrix is md5-stable") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val short = Seq((1L, Array(1.0))).toDF("id", "v")
      .select(expr("graft_hp_sums(v, 2, 3)").as("s"))
      .head().getSeq[Long](0)
    val signs = HyperplaneSums.signs(2, 3)
    assert(short == Seq(
      math.floor(signs(0) * 1.0e7).toLong,
      math.floor(signs(3) * 1.0e7).toLong))
    // the documented md5 rule, spot-checked
    val digest = java.security.MessageDigest.getInstance("MD5")
    for (b <- 0 until 2; d <- 0 until 3) {
      val hex = digest.digest(s"${b}_$d".getBytes("UTF-8"))
      val want = if ((hex(0) & 0x80) == 0) 1.0 else -1.0
      assert(signs(b * 3 + d) == want)
    }
  }
}
