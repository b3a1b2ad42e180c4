package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // TypedImperativeAggregate (TopKAgg/MinHashAgg/MisraGriesAgg)
      // runs in ObjectHashAggregate, which falls back to SORT-based
      // aggregation after 128 groups by default — that re-sorts the
      // whole fan-out the heap aggregates exist to avoid. The buffers
      // are tiny (k entries each); let the hash path keep them.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration escape hatch: SPARK_GRAFT_ONLY=d09,t06 runs a
    // subset. The driver never sets it, so its runs stay exhaustive.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Per-query / per-column value echo (md5 of the sorted value set +
    // a few sorted samples), written to echo.json AND printed: when the
    // driver's oracle hash-fails a query that matches the local DuckDB
    // bit-for-bit, this pinpoints WHICH column diverged in the driver's
    // environment (round-7 forensics: 6 hash-fails, zero local repro).
    val echo = new StringBuilder("{")
    var echoFirst = true
    def echoQuery(name: String, dir: String): Unit = try {
      val df = spark.read.parquet(dir)
      val rows = df.limit(20000).collect()
      def m5(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val cols = df.schema.fieldNames
      // binary columns must render as hex — String.valueOf on a byte
      // array is the JVM identity string, different every run, which
      // would read as a phantom divergence in exactly the forensics
      // this echo exists for
      def render(v: Any): String = v match {
        case b: Array[Byte] => b.map("%02x".format(_)).mkString
        case x => String.valueOf(x)
      }
      val parts = cols.zipWithIndex.map { case (c, i) =>
        val vs = rows.map(r => render(r.get(i))).sorted
        val h = m5(vs.mkString("\n")).take(12)
        val sample = vs.take(3).map(v =>
          if (v.length > 24) v.take(24) + ".." else v)
        s"${q(c)}: {${q("h")}: ${q(h)}, ${q("v")}: [${sample.map(q).mkString(",")}]}"
      }
      if (!echoFirst) echo.append(",")
      echoFirst = false
      echo.append(s"${q(name)}: {${parts.mkString(",")}}")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] echo $name failed: ${e.getMessage}")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        echoQuery(name, s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        if (sys.env.contains("SPARK_GRAFT_TRACE")) e.printStackTrace()
      }
    }
    Files.writeString(Paths.get(s"$outDir/echo.json"), echo.append("}").toString)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
