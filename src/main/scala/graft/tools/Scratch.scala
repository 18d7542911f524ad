package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway measurement harness for the optimization round: builds one
  * staged artifact under a FIXED path and prints its on-disk file census —
  * the "how many paths does the read-side listing pay" probe. Not part of
  * the engine surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = SparkEntryProbe.k18(spark, sfDir)
    println(s"k18 index at $p")
    val pd = SparkEntryProbe.d17(spark, sfDir)
    println(s"d17 index at $pd")
    // census
    def census(root: String): Unit = {
      import scala.jdk.CollectionConverters._
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
        .iterator().asScala.toList
      val (dirs, fs) = files.partition(p => java.nio.file.Files.isDirectory(p))
      println(s"$root: ${fs.size} files, ${dirs.size} dirs")
      fs.groupBy(f => f.getParent.toString.stripPrefix(root))
        .toSeq.sortBy(-_._2.size).take(20)
        .foreach { case (d, l) => println(f"  ${l.size}%4d files in $d") }
    }
    census(p)
    census(pd)
    spark.stop()
  }
}

object SparkEntryProbe {
  def k18(s: SparkSession, dir: String): String =
    graft.SparkEntry.k18IndexDir(s, dir)
  def d17(s: SparkSession, dir: String): String =
    graft.SparkEntry.d17IndexDir(s, dir)
}
