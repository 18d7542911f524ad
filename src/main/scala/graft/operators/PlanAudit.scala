package graft.operators

import org.apache.spark.sql.SparkSession

/** One-off plan audit helper: prints the formatted physical plan of selected
  * queries so scan pruning / join strategies can be eyeballed per round.
  * Not part of the library surface; kept for reproducibility of the audit.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    graft.SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"===== $name =====")
        try println(fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
      }
    spark.stop()
  }
}
