package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.sources.Io

/** Source/sink round-trips under the correctness gate (i01..i02):
  * each query writes a table slice through [[graft.sources.Io]] in a
  * non-parquet format, reads it back schema-explicit, and aggregates —
  * the oracle runs the same aggregate over the original parquet, so a
  * hash match proves the format round-trip is lossless.
  *
  * Scale: the write is one map stage (no shuffle before the sink); the
  * read-back is a fresh scan. Schema-explicit readers skip the
  * inference pass — at 100 TB, inference is a full extra read of the
  * data. The aggregate after read-back is the usual partial-agg +
  * one-exchange shape.
  */
object IoOps {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // i01: CSV round-trip. Strings survive the writer's quoting; the
  // explicit read schema restores the integer types CSV erases.
  def i01(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("graft_i01_")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType)))
    Io.writeCsv(
      Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars"), dir)
    Io.readCsv(s, dir, schema)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("sum_chars"))
      .orderBy("lang", "source")
  }

  val i01Sql: String =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // i02: JSONL round-trip. Doubles print losslessly (shortest
  // round-trip repr) and the quantities are whole numbers, so the
  // read-back sum is exact in either engine.
  def i02(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("graft_i02_")
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType)))
    Io.writeJsonl(
      Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity"), dir)
    Io.readJsonl(s, dir, schema)
      .groupBy("l_linenumber")
      .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
      .orderBy("l_linenumber")
  }

  val i02Sql: String =
    """SELECT l_linenumber, count(*) AS n_items, sum(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // i03: partitioned-layout round-trip — the data-layout decision that
  // matters most at 100 TB. Write documents hive-partitioned by lang
  // (lang=… directories), read back filtering two of five languages:
  // the filter resolves against the directory listing, so the scan
  // never opens the other partitions' files (PartitionFilters in the
  // plan, pinned in PlanSpec; at scale that's a 60% I/O cut here, and
  // a date-partitioned fact table gets the same effect per day).
  // coalesceTo bounds files per partition — a 1000-executor write
  // would otherwise emit one file per task per partition.
  def i03(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("graft_i03_")
    Io.writeParquet(
      Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars"),
      dir, partitionBy = Seq("lang"), coalesceTo = Some(4))
    prunedReadback(s, dir)
  }

  /** The read side of i03, split out so PlanSpec can assert partition
    * pruning on the exact DataFrame the gated query returns. */
  def prunedReadback(s: SparkSession, dir: String): DataFrame =
    Io.readParquet(s, dir)
      .filter(col("lang").isin("en", "zh"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("sum_chars"))
      .orderBy("lang", "source")

  val i03Sql: String =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE lang IN ('en', 'zh')
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // i04: ORC round-trip — the other self-describing columnar format a
  // warehouse ingests from. ORC carries its own schema + types, so no
  // read schema is needed; the gate proves types survive (timestamps
  // become epoch micros, decimal-rounded money) against the parquet
  // original.
  def i04(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("graft_i04_")
    Io.writeOrc(
      Tables.orders(s, d).select("o_orderkey", "o_orderpriority", "o_totalprice"),
      dir)
    Io.readOrc(s, dir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
  }

  val i04Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS sum_price
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "i01_csv_roundtrip" -> (i01 _),
    "i02_jsonl_roundtrip" -> (i02 _),
    "i03_partition_prune" -> (i03 _),
    "i04_orc_roundtrip" -> (i04 _))

  val oracles: Map[String, String] = Map(
    "i01_csv_roundtrip" -> i01Sql,
    "i02_jsonl_roundtrip" -> i02Sql,
    "i03_partition_prune" -> i03Sql,
    "i04_orc_roundtrip" -> i04Sql)
}
