package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArgmaxCosineSpec extends SparkSpec {

  private def register(
      name: String, cids: Array[Long], matrix: Array[Double], dim: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, { children => ArgmaxCosine(children.head, cids, matrix, dim) },
      "built-in")

  test("argmax-cosine equals the crossJoin + max_by(struct(cos, cid)) formulation") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val dim = 8
    // deterministic pseudo-random vectors and centroids
    val v = spark.range(200).select(
      col("id"),
      expr(s"transform(sequence(1, $dim), i -> " +
        "CAST(pmod(hash(id, i), 97) AS DOUBLE) / 97.0D - 0.5D)").as("v"))
      .cache()
    val cents = spark.range(7).select(
      col("id").as("cid"),
      expr(s"transform(sequence(1, $dim), i -> " +
        "CAST(pmod(hash(id * 31, i), 89) AS DOUBLE) / 89.0D - 0.5D)").as("qv"))
    val rows = cents.collect().sortBy(_.getLong(0))
    val cids = rows.map(_.getLong(0))
    val matrix = rows.flatMap(_.getSeq[Double](1)).toArray
    register("test_argmax", cids, matrix, dim)

    val native = v.select(col("id"), expr("test_argmax(v)").as("m"))
      .select(col("id"), col("m.cid").as("cid"), col("m.cos").as("cos"))
    val joined = v.crossJoin(broadcast(cents))
      .withColumn("dot", expr("graft_dot(v, qv)"))
      .withColumn("nv", expr("sqrt(graft_dot(v, v))"))
      .withColumn("nq", expr("sqrt(graft_dot(qv, qv))"))
      .withColumn("cos", col("dot") / (col("nv") * col("nq")))
      .groupBy(col("id"))
      .agg(expr("max_by(named_struct('cid', cid, 'cos', cos), struct(cos, cid))").as("m"))
      .select(col("id"), col("m.cid").as("cid"), col("m.cos").as("cos"))
    // bit-identical, including the double cos (no rounding before compare)
    assert(native.exceptAll(joined).isEmpty && joined.exceptAll(native).isEmpty,
      "native argmax diverged from the join formulation")
  }

  test("tie on cosine prefers the larger cid (the max_by struct order)") {
    import spark.implicits._
    // two identical centroids with different cids: equal cosines, cid 5 wins
    val dim = 4
    val cids = Array(2L, 5L)
    val matrix = Array(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0)
    register("test_argmax_tie", cids, matrix, dim)
    val out = Seq((1L, Seq(0.5, 0.5, 0.0, 0.0)))
      .toDF("id", "v")
      .select(expr("test_argmax_tie(v)").as("m"))
      .select(col("m.cid")).as[Long].head()
    assert(out == 5L, s"tie must resolve to the larger cid, got $out")
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val dim = 4
    val cids = Array(0L, 1L, 2L)
    val matrix = Array(
      1.0, 0.1, -0.2, 0.3,
      -0.5, 0.4, 0.2, -0.1,
      0.0, 0.9, -0.3, 0.7)
    val e = ArgmaxCosine(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(0.3, -0.2, 0.8, 0.1),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false)),
      cids, matrix, dim)
    val interpreted = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    register("test_argmax_cg", cids, matrix, dim)
    val viaPlan = Seq((1L, Seq(0.3, -0.2, 0.8, 0.1))).toDF("id", "v")
      .select(expr("test_argmax_cg(v)").as("m"))
      .select(col("m.cid"), col("m.cos")).head()
    assert(interpreted.getLong(0) == viaPlan.getLong(0))
    assert(interpreted.getDouble(1) == viaPlan.getDouble(1))
  }
}
