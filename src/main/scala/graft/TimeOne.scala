package graft
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      // match Bench/Verify: keep TypedImperativeAggregate buffers on
      // the hash path (sort-based fallback re-sorts the very fan-outs
      // the heap aggregates exist to avoid)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    args(0).split(",").foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, d).write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      println(s"TIMED $name ${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
