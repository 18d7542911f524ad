package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqNearestCodesSpec extends SparkSpec {

  test("pq-nearest-codes equals the explode + broadcast-join + min_by formulation") {
    GraftFunctions.register(spark)
    val m = 4
    val subDim = 4
    val dim = m * subDim
    val nCodes = 5
    val v = spark.range(150).select(
      col("id"),
      expr(s"transform(sequence(1, $dim), i -> " +
        "CAST(pmod(hash(id, i), 101) AS DOUBLE) / 101.0D - 0.5D)").as("v"))
      .cache()
    // codebook keyed like pqCodebook's: cid = seed id (NOT 0..nCodes-1)
    val codebook = spark.range(nCodes).select(
      explode(expr(s"sequence(0, ${m - 1})")).as("sub"),
      (col("id") * 13 + 2).as("cid"),
      expr(s"transform(sequence(1, $subDim), i -> " +
        "CAST(pmod(hash(id * 7, i), 83) AS DOUBLE) / 83.0D - 0.5D)").as("cv"))
      .cache()
    val rows = codebook.collect()
    val bySub = rows.groupBy(_.getInt(0))
    val offsets = new Array[Int](m + 1)
    (0 until m).foreach(s => offsets(s + 1) = offsets(s) + bySub(s).length)
    val cids = new Array[Long](rows.length)
    val matrix = new Array[Double](rows.length * subDim)
    var j = 0
    (0 until m).foreach { s =>
      bySub(s).sortBy(_.getLong(1)).foreach { r =>
        cids(j) = r.getLong(1)
        val cv = r.getSeq[Double](2)
        (0 until subDim).foreach(i => matrix(j * subDim + i) = cv(i))
        j += 1
      }
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "test_pq_codes",
      { children => PqNearestCodes(children.head, offsets, cids, matrix, m, subDim) },
      "built-in")

    val native = v.select(col("id"),
      posexplode(expr("test_pq_codes(v)")).as(Seq("sub", "code")))
    val subv = v.select(col("id"), expr(
      s"""explode(transform(sequence(0, ${m - 1}),
            s -> struct(s AS sub, slice(v, s * $subDim + 1, $subDim) AS sv)))""").as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
    val joined = subv.join(broadcast(codebook), "sub")
      .withColumn("d2",
        expr("aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, p) -> acc + p)"))
      .groupBy(col("id"), col("sub"))
      .agg(expr("min_by(cid, struct(d2, cid))").as("code"))
    assert(native.exceptAll(joined).isEmpty && joined.exceptAll(native).isEmpty,
      "native PQ encode diverged from the join formulation")
  }

  test("tie on d2 prefers the smaller cid (the min_by struct order)") {
    import spark.implicits._
    // one subspace, two identical codes with cids 9 and 3: 3 must win
    val offsets = Array(0, 2)
    val cids = Array(3L, 9L)
    val matrix = Array(1.0, 0.0, 1.0, 0.0)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "test_pq_tie",
      { children => PqNearestCodes(children.head, offsets, cids, matrix, 1, 2) },
      "built-in")
    val out = Seq((1L, Seq(0.2, 0.7))).toDF("id", "v")
      .select(expr("test_pq_tie(v)[0]")).as[Long].head()
    assert(out == 3L, s"tie must resolve to the smaller cid, got $out")
  }
}
