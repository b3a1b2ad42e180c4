package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named keys into <outDir>/<key>_<tag>.txt
  * — the per-round before/after plan evidence. Usage:
  *   sbt "runMain graft.PlanOne <sfDir> <outDir> <tag> key1 key2 ..." */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val d = args(0); val out = args(1); val tag = args(2)
    val keys = args.drop(3)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(out))
    keys.foreach { name =>
      val full = SparkEntry.queries.keys.find(_.startsWith(name)).getOrElse(name)
      val p = try SparkEntry.queries(full)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      catch { case e: Throwable => s"(plan dump failed: ${e.getMessage})\n" }
      Files.writeString(Paths.get(out, s"${full.takeWhile(_ != '_')}_$tag.txt"), p)
      println(s"[planone] wrote $full -> $tag")
    }
    spark.stop()
  }
}
