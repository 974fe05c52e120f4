package graft.sources.v2

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Avro container-file source/sink as a DataSource V2 —
  *
  *   df.write.format("graft-avro").save(path)
  *   spark.read.format("graft-avro").load(path)
  *
  * The reference lists avro in its connector matrix (`api/.../Constants
  * .scala`) via the spark-avro module; that module's jar is absent here,
  * but the RAW Avro library (avro-1.12 + avro-mapred's Hadoop `FsInput`)
  * ships with Spark — so the format is implemented directly against it,
  * through the same DSv2 integration points as [[CorpusSource]]:
  *
  *  - read: schema inferred from the first container file's header; one
  *    input partition per file (container blocks are further splittable on
  *    sync markers — the per-file unit keeps this honest and simple; a
  *    100-TB deployment swaps in the block-splitting planInputPartitions,
  *    the rest is unchanged);
  *  - write: one container file per task via the normal BatchWrite
  *    lifecycle (writers produce `part-<pid>-<tid>.avro`, abort deletes its
  *    own file);
  *  - types: flat rows of string/int/long/float/double/boolean/binary,
  *    nullable as `union(null, T)` — the generated-table surface; nested
  *    structures stay on parquet (documented narrowing).
  */
class AvroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroSource.inferFrom(options.get("path"))
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AvroTable(properties.get("path"), schema)
}

object AvroSource {

  private def hadoopConf = org.apache.spark.sql.SparkSession.active
    .sparkContext.hadoopConfiguration

  private[v2] def listAvroFiles(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) return Nil
    val it = fs.listStatus(p).toSeq
    it.filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted
  }

  def inferFrom(path: String): StructType = {
    val files = listAvroFiles(path)
    require(files.nonEmpty, s"no .avro files under $path")
    val in = new org.apache.avro.mapred.FsInput(new Path(files.head), hadoopConf)
    val reader = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try toSpark(reader.getSchema) finally reader.close()
  }

  // ---------- schema mapping ----------

  private[v2] def toSpark(s: Schema): StructType = StructType(
    s.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = unwrap(f.schema())
      StructField(f.name(), t, nullable)
    })

  private def unwrap(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1, s"unsupported union $s (only [null, T])")
      (primitive(nonNull.head), branches.size > nonNull.size)
    case _ => (primitive(s), false)
  }

  private def primitive(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING => StringType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES => BinaryType
    case other => throw new IllegalArgumentException(
      s"unsupported avro type $other (flat primitive rows only — use parquet for nested)")
  }

  private[v2] def toAvro(schema: StructType, record: String): Schema = {
    var fields = SchemaBuilder.record(record).namespace("graft").fields()
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case StringType => Schema.create(Schema.Type.STRING)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"column '${f.name}': unsupported type $other for graft-avro (flat primitives only)")
      }
      // null default is only legal when null is the union's FIRST branch;
      // non-nullable fields get no default at all
      fields =
        if (f.nullable)
          fields.name(f.name)
            .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
            .withDefault(null)
        else fields.name(f.name).`type`(base).noDefault()
    }
    fields.endRecord()
  }
}

private class AvroTable(path: String, schema0: StructType) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_avro($path)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new AvroScan(path, schema0)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // overwrite = rewrite files
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AvroBatchWrite(path, info.schema())
      }
    }
}

private class AvroScan(path: String, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"graft-avro scan of $path"
  override def planInputPartitions(): Array[InputPartition] =
    AvroSource.listAvroFiles(path).map(AvroFilePartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(schema)
}

private case class AvroFilePartition(file: String) extends InputPartition

private class AvroReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(partition.asInstanceOf[AvroFilePartition].file, schema)
}

private class AvroPartitionReader(file: String, schema: StructType)
    extends PartitionReader[InternalRow] {
  private val conf = new org.apache.hadoop.conf.Configuration()
  private val reader = new DataFileReader[GenericRecord](
    new org.apache.avro.mapred.FsInput(new Path(file), conf),
    new GenericDatumReader[GenericRecord]())
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!reader.hasNext) false
    else {
      val rec = reader.next()
      val values = schema.fields.map { f =>
        fromAvro(rec.get(f.name), f.dataType)
      }
      current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
      true
    }

  private def fromAvro(v: Any, t: DataType): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => UTF8String.fromString(u.toString)
    case s: String => UTF8String.fromString(s)
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case other => other // int/long/float/double/boolean box fine
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

// ---------- write side ----------

private class AvroBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AvroWriterFactory(path, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class AvroWriterFactory(path: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(path, schema, partitionId, taskId)
}

private class AvroDataWriter(dir: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val avroSchema = AvroSource.toAvro(schema, "row")
  private val filePath = new Path(dir, f"part-$partitionId%05d-$taskId.avro")
  private val fs = filePath.getFileSystem(new org.apache.hadoop.conf.Configuration())
  private val out = { fs.mkdirs(filePath.getParent); fs.create(filePath, true) }
  private val writer = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, out)
  }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v: Any =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case StringType => row.getUTF8String(i).toString
          case IntegerType => row.getInt(i)
          case LongType => row.getLong(i)
          case FloatType => row.getFloat(i)
          case DoubleType => row.getDouble(i)
          case BooleanType => row.getBoolean(i)
          case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
          case other => throw new IllegalStateException(s"unreachable type $other")
        }
      rec.put(f.name, v)
    }
    writer.append(rec)
  }

  override def commit(): WriterCommitMessage = { writer.close(); AvroCommit(filePath.toString) }
  override def abort(): Unit = { scala.util.Try(writer.close()); fs.delete(filePath, false); () }
  override def close(): Unit = ()
}

private case class AvroCommit(file: String) extends WriterCommitMessage
