package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface: schema-explicit readers and scale-aware
  * writers for the formats a pipeline ingests and emits.
  *
  * Readers take an explicit schema — at 100 TB, schema inference is a
  * full extra pass over the data; never pay it. Writers expose the two
  * layout decisions that matter at scale: partition columns (pruning)
  * and a target file count (avoiding the many-small-files problem).
  */
object Io {

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Multi-path variant — the manifest-driven read (i16) hands the
    * planner ONLY the files whose stats overlap the predicate. */
  def readParquet(s: SparkSession, paths: Seq[String]): DataFrame =
    s.read.parquet(paths: _*)

  def readCsv(s: SparkSession, path: String, schema: StructType,
    header: Boolean = true, delimiter: String = ","): DataFrame =
    s.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** Partitioned parquet writer. `partitionBy` columns become
    * directories (partition pruning on read); `coalesceTo` bounds the
    * files per partition so a 1000-executor job doesn't emit 32k tiny
    * files. */
  def writeParquet(df: DataFrame, path: String,
    partitionBy: Seq[String] = Nil, coalesceTo: Option[Int] = None,
    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val out = coalesceTo.map(df.coalesce).getOrElse(df)
    val w = out.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def writeJsonl(df: DataFrame, path: String,
    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  def writeOrc(df: DataFrame, path: String,
    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)
}
