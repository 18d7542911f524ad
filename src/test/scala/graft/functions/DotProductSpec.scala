package graft.functions

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {

  test("graft_dot is bit-identical to the HOF aggregate/zip_with fold") {
    GraftFunctions.register(spark)
    val v = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val pairs = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id")).limit(2000)
      .select(col("a.v").as("x"), col("b.v").as("y"))
    val diff = pairs
      .withColumn("native", expr("graft_dot(x, y)"))
      .withColumn("hof",
        expr("aggregate(zip_with(x, y, (p, q) -> p * q), 0D, (acc, t) -> acc + t)"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0, "native and HOF dot products disagree")
  }

  test("graft_dot participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val v = Tables.load(spark, sf, "embeddings")
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val df = v.select(expr("graft_dot(v, v)").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the * prefix marks operators inside a WholeStageCodegen span
    assert("""\*\(\d+\) Project \[graft_dot""".r.findFirstIn(plan).isDefined,
      s"graft_dot projection not codegen'd:\n$plan")
    // and the interpreted path agrees: unit norm vectors → d ≈ 1
    val r = df.agg(min("d"), max("d")).head()
    assert(r.getDouble(0) > 0.99 && r.getDouble(1) < 1.01)
  }

  test("null array input yields null; length mismatch truncates (zip semantics)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1D)) AS a,
        |       graft_dot(array(1D, 2D, 3D), array(10D, 10D)) AS b""".stripMargin).head()
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 30.0)
  }

  test("extension-built sessions resolve graft_dot without imperative registration") {
    // Engine.session wires GraftExtensions; getOrCreate reuses the suite's
    // context but the extension applies to the new session's registry
    val s = graft.core.Engine.session(master = Some("local[2]"))
    assert(s.sql("SELECT graft_dot(array(2D, 3D), array(4D, 5D)) AS d").head().getDouble(0) == 23.0)
  }
}
