package graft.sources.v2

import graft.corpus.SyntheticImages
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the synthetic image+caption corpus:
  *
  *   spark.read.format("graft-corpus")
  *     .option("rows", 1000000).option("seed", 42).option("partitions", 64)
  *     .load()
  *
  * The reference ships ~15 connectors over external systems none of which
  * exist in this sandbox; this source demonstrates the actual Spark
  * integration point those map onto — `TableProvider` → `Table` →
  * `ScanBuilder` → `Batch` with real splittable input partitions — against
  * the one dataset we can synthesize hermetically. It is not a toy shim:
  *
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): a pruned
  *    `bytes` column is never GENERATED (the corpus rng draws bytes last, so
  *    skipping them is field-exact) — the scan-side analog of parquet
  *    ReadSchema pruning, and the dominant cost of a corpus row;
  *  - **limit pushdown** (`SupportsPushDownLimit`): a global limit shrinks
  *    the planned index range, fully satisfying the limit at the source;
  *  - determinism: partition i covers a contiguous index range and every row
  *    is a pure function of (index, seed), so output is byte-identical at
  *    any parallelism — same contract as `SyntheticImages.generate`.
  */
class CorpusSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-corpus"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CorpusSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = new CorpusTable
}

object CorpusSource {
  val schema: StructType = StructType(Seq(
    StructField("image_id", StringType, nullable = false),
    StructField("bytes", BinaryType),
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("fmt", StringType, nullable = false),
    StructField("caption", StringType),
    StructField("phash", LongType, nullable = false)))
}

private class CorpusTable extends Table with SupportsRead {
  override def name(): String = "graft_corpus"
  override def schema(): StructType = CorpusSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CorpusScanBuilder(
      options.getLong("rows", 1000L),
      options.getLong("seed", 42L),
      options.getInt("partitions", 8))
}

private class CorpusScanBuilder(rows: Long, seed: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownLimit {
  private var required: StructType = CorpusSource.schema
  private var limit: Long = -1L

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  // index-range source: a global limit is satisfied exactly by shrinking the
  // planned range, so the limit is FULLY pushed (Spark drops its own Limit)
  override def pushLimit(n: Int): Boolean = { limit = n.toLong; true }
  override def isPartiallyPushed: Boolean = false

  override def build(): Scan = {
    val effective = if (limit >= 0) math.min(rows, limit) else rows
    new CorpusScan(effective, seed, partitions, required)
  }
}

private class CorpusScan(rows: Long, seed: Long, partitions: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-corpus[rows=$rows, seed=$seed, readSchema=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = math.max(1, math.min(partitions.toLong, math.max(rows, 1L)).toInt)
    val step = math.max(1L, (rows + p - 1) / p)
    (0 until p).iterator
      .map(i => CorpusRange(i * step, math.min((i + 1) * step, rows), seed))
      .filter(r => r.start < r.end)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CorpusReaderFactory(required.fieldNames)
}

private case class CorpusRange(start: Long, end: Long, seed: Long) extends InputPartition

private class CorpusReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[CorpusRange]
    new CorpusPartitionReader(r.start, r.end, r.seed, fields)
  }
}

private class CorpusPartitionReader(start: Long, end: Long, seed: Long, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private val needBytes = fields.contains("bytes")
  private var i = start - 1
  private var current: InternalRow = _

  override def next(): Boolean = {
    i += 1
    if (i >= end) return false
    // bytes generation (the dominant per-row cost) is skipped when pruned
    val row = SyntheticImages.row(i, seed, withBytes = needBytes)
    val values: Array[Any] = fields.map {
      case "image_id" => UTF8String.fromString(row.image_id)
      case "bytes" => row.bytes
      case "w" => row.w
      case "h" => row.h
      case "fmt" => UTF8String.fromString(row.fmt)
      case "caption" => if (row.caption == null) null else UTF8String.fromString(row.caption)
      case "phash" => row.phash
      case other => throw new IllegalArgumentException(s"unknown field $other")
    }
    current = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
