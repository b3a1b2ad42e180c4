package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataTypes, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 connector — the extension point where
  * Iceberg/Delta live: the MANIFEST (file → min/max id stats) is
  * consulted at PLANNING time, so files whose id range cannot match
  * the pushed filters never become input partitions (i16 does this
  * skipping by hand inside a query; a production table format does it
  * HERE, invisibly to every query). Implements the full read-side
  * surface: TableProvider → Table → ScanBuilder with
  * SupportsPushDownFilters (id-bound predicates prune at the manifest)
  * and SupportsPushDownRequiredColumns (the reader parses only the
  * projected columns) → Batch planning one partition per surviving
  * file → a line-parsing PartitionReader emitting InternalRows.
  * Storage is deliberately simple (CSV lines `id,cat,cents` + a
  * `manifest` of `file,min,max` lines): the connector mechanics — not
  * a parquet re-implementation — are the point, and the same layout is
  * trivially readable by the DuckDB oracle. Filters are returned as
  * residuals too, so Spark re-verifies rows — pruning can only SKIP
  * work, never change answers.
  */
class ManifestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
    properties: util.Map[String, String]): Table =
    new ManifestTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

object ManifestSource {
  val SCHEMA: StructType = new StructType()
    .add("id", DataTypes.LongType)
    .add("cat", DataTypes.StringType)
    .add("cents", DataTypes.LongType)

  /** files from `<path>/manifest` ("name,min,max" lines) intersecting
    * the pushed id bounds — shared by the planner and the IoSpec pin. */
  def surviving(path: String, filters: Seq[Filter]): Seq[(String, Long, Long)] = {
    var (lo, hi) = (Long.MinValue, Long.MaxValue)
    filters.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v - 1)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v)
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v)
      case _                                 => ()
    }
    val fs = new java.io.File(s"$path/manifest")
    scala.io.Source.fromFile(fs).getLines().filter(_.nonEmpty).map { line =>
      val Array(name, mn, mx) = line.split(",")
      (name, mn.toLong, mx.toLong)
    }.filter { case (_, mn, mx) => mx >= lo && mn <= hi }.toSeq.sortBy(_._1)
  }
}

class ManifestTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_manifest($path)"
  override def schema(): StructType = ManifestSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(path)
}

class ManifestScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ManifestSource.SCHEMA

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    filters // everything stays residual: pruning skips, never answers
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new ManifestScan(path, pushed, required)
}

case class ManifestFilePartition(file: String) extends InputPartition

class ManifestScan(path: String, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-manifest pushed=[${pushed.mkString(", ")}] cols=" +
      required.fieldNames.mkString(",")

  override def planInputPartitions(): Array[InputPartition] =
    ManifestSource.surviving(path, pushed.toSeq)
      .map(f => ManifestFilePartition(s"$path/${f._1}"): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val idx = required.fieldNames.map {
      case "id" => 0
      case "cat" => 1
      case "cents" => 2
    }
    new ManifestReaderFactory(idx)
  }
}

class ManifestReaderFactory(fieldIdx: Array[Int])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val source = scala.io.Source
      .fromFile(p.asInstanceOf[ManifestFilePartition].file)
    val lines = source.getLines().filter(_.nonEmpty)
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          val parts = lines.next().split(",")
          row = InternalRow.fromSeq(fieldIdx.toSeq.map {
            case 0 => parts(0).toLong
            case 1 => UTF8String.fromString(parts(1))
            case 2 => parts(2).toLong
          })
          true
        }
      override def get(): InternalRow = row
      // one reader per input partition: releasing the handle here is
      // what keeps a wide scan from exhausting executor fds
      override def close(): Unit = source.close()
    }
  }
}
