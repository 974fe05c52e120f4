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
  *  - types: string/int/long/float/double/boolean/binary, the standard
  *    logical types (date on int, timestamp-micros on long — millis
  *    upconverted on read, decimal on bytes with precision/scale), and
  *    nested records + arrays (recursive, nullable as `union(null, T)` at
  *    every level). Avro maps and multi-branch unions throw loudly —
  *    documented narrowing, use parquet for those.
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

  /** The session's hadoop conf as serializable key-values: executors must
    * see the SAME filesystem settings the driver planned with (s3a
    * credentials/endpoints, fs.defaultFS, kerberos) — a fresh empty
    * Configuration on the task side works only by accident on file: paths.
    */
  private[v2] def confEntries: Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    hadoopConf.iterator().asScala.map(e => e.getKey -> e.getValue).toArray
  }

  private[v2] def rebuild(entries: Array[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

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

  /** Strip the `[null, T]` union wrapper, recursively typing T. */
  private[v2] def unwrap(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1, s"unsupported union $s (only [null, T])")
      (sparkType(nonNull.head), branches.size > nonNull.size)
    case _ => (sparkType(s), false)
  }

  private def sparkType(s: Schema): DataType = s.getLogicalType match {
    case _: org.apache.avro.LogicalTypes.Date => DateType
    case _: org.apache.avro.LogicalTypes.TimestampMicros => TimestampType
    case _: org.apache.avro.LogicalTypes.TimestampMillis => TimestampType
    case d: org.apache.avro.LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
    case _ => s.getType match {
      case Schema.Type.STRING => StringType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG => LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
      case Schema.Type.RECORD => toSpark(s)
      case Schema.Type.ARRAY =>
        val (et, en) = unwrap(s.getElementType)
        ArrayType(et, containsNull = en)
      case other => throw new IllegalArgumentException(
        s"unsupported avro type $other (maps/enums/multi-branch unions — use parquet)")
    }
  }

  /** Spark type → Avro schema, recursive; `path` names nested records
    * uniquely (Avro record names must not collide within one schema). */
  private[v2] def avroType(t: DataType, path: String): Schema = t match {
    case StringType => Schema.create(Schema.Type.STRING)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      org.apache.avro.LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case st: StructType => toAvro(st, path + "_rec")
    case ArrayType(et, containsNull) =>
      Schema.createArray(maybeNullable(avroType(et, path + "_item"), containsNull))
    case other => throw new IllegalArgumentException(
      s"column '$path': unsupported type $other for graft-avro " +
        "(primitives, date/timestamp/decimal, struct, array — use parquet for maps)")
  }

  private def maybeNullable(base: Schema, nullable: Boolean): Schema =
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base

  private[v2] def toAvro(schema: StructType, record: String): Schema = {
    var fields = SchemaBuilder.record(record).namespace("graft").fields()
    schema.fields.foreach { f =>
      val base = avroType(f.dataType, s"${record}_${f.name}")
      // null default is only legal when null is the union's FIRST branch;
      // non-nullable fields get no default at all
      fields =
        if (f.nullable)
          fields.name(f.name).`type`(maybeNullable(base, nullable = true)).withDefault(null)
        else fields.name(f.name).`type`(base).noDefault()
    }
    fields.endRecord()
  }

  /** Can a file field of type `file` be READ as `expected`? Strict equality
    * except where [[fromAvroValue]] genuinely converts: any decimal reads
    * into any decimal (exact rescale, lossy throws loudly), and nested
    * records are compared field-by-field by NAME (a file's record may carry
    * extra fields — same contract as the top level). A plain long where a
    * timestamp was inferred stays incompatible: it would read as a silently
    * wrong timestamp.
    */
  private[v2] def readCompatible(file: DataType, expected: DataType): Boolean =
    (file, expected) match {
      case (_: DecimalType, _: DecimalType) => true
      case (f: StructType, e: StructType) =>
        e.fields.forall(ef => f.fields.find(_.name == ef.name)
          .exists(ff => readCompatible(ff.dataType, ef.dataType)))
      case (ArrayType(f, _), ArrayType(e, _)) => readCompatible(f, e)
      case (f, e) => f == e
    }

  /** Avro runtime value → Catalyst value for `t`, driven by the FILE's
    * schema (`avro`) so millis-vs-micros timestamps and decimal scales
    * convert correctly. Built once per reader, applied per value.
    */
  private[v2] def fromAvroValue(v: Any, avro: Schema, t: DataType): Any = {
    if (v == null) return null
    val a = avro.getType match {
      case Schema.Type.UNION =>
        avro.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      case _ => avro
    }
    (t, a.getLogicalType) match {
      case (TimestampType, _: org.apache.avro.LogicalTypes.TimestampMillis) =>
        v.asInstanceOf[Long] * 1000L
      case (TimestampType, _) => v.asInstanceOf[Long]
      case (DateType, _) => v.asInstanceOf[Int]
      case (d: DecimalType, fd: org.apache.avro.LogicalTypes.Decimal) =>
        val bytes = v match {
          case b: java.nio.ByteBuffer =>
            val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
          case f: org.apache.avro.generic.GenericFixed => f.bytes()
        }
        // unscaled bytes carry the FILE's scale (fd), not the target's: a
        // directory mixing decimal(10,3) and decimal(10,2) files must not
        // silently shift values 10x. Rescale exactly; lossy rescales throw.
        val fileVal = new java.math.BigDecimal(new java.math.BigInteger(bytes), fd.getScale)
        org.apache.spark.sql.types.Decimal(
          fileVal.setScale(d.scale, java.math.RoundingMode.UNNECESSARY), d.precision, d.scale)
      case (st: StructType, _) =>
        val rec = v.asInstanceOf[GenericRecord]
        val vals = st.fields.map { f =>
          // the top-level heterogeneity require only covers top-level names;
          // nested drift must fail with the same loud message, not NPE
          val af = a.getField(f.name)
          if (af == null) throw new IllegalStateException(
            s"avro nested record '${a.getName}' lacks expected field '${f.name}' — " +
              "directory holds heterogeneous schemas (inference uses the first file)")
          fromAvroValue(rec.get(f.name), af.schema(), f.dataType)
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      case (ArrayType(et, _), _) =>
        val coll = v.asInstanceOf[java.util.Collection[Any]].asScala
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          coll.map(e => fromAvroValue(e, a.getElementType, et)).toArray)
      case _ => v match {
        case u: org.apache.avro.util.Utf8 => UTF8String.fromString(u.toString)
        case s: String => UTF8String.fromString(s)
        case b: java.nio.ByteBuffer =>
          val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
        // plain (non-decimal) FIXED maps to BinaryType — unwrap to bytes
        case f: org.apache.avro.generic.GenericFixed => f.bytes()
        case other => other // int/long/float/double/boolean box fine
      }
    }
  }

  /** Catalyst value at ordinal `i` → Avro runtime value, recursive on
    * struct/array; `avro` is the field's (possibly union-wrapped) schema so
    * nested records are constructed against their exact declared schema. */
  private[v2] def toAvroValue(row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int, t: DataType, avro: Schema): Any = {
    if (row.isNullAt(i)) return null
    val a = avro.getType match {
      case Schema.Type.UNION =>
        avro.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      case _ => avro
    }
    t match {
      case StringType => row.getUTF8String(i).toString
      case IntegerType => row.getInt(i)
      case LongType => row.getLong(i)
      case FloatType => row.getFloat(i)
      case DoubleType => row.getDouble(i)
      case BooleanType => row.getBoolean(i)
      case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
      case DateType => row.getInt(i) // days since epoch, both sides
      case TimestampType => row.getLong(i) // micros, both sides
      case d: DecimalType =>
        java.nio.ByteBuffer.wrap(
          row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.unscaledValue().toByteArray)
      case st: StructType =>
        val nested = row.getStruct(i, st.size)
        val rec = new GenericData.Record(a)
        st.fields.zipWithIndex.foreach { case (f, j) =>
          rec.put(f.name, toAvroValue(nested, j, f.dataType, a.getField(f.name).schema()))
        }
        rec
      case ArrayType(et, _) =>
        val arr = row.getArray(i)
        val out = new java.util.ArrayList[Any](arr.numElements())
        (0 until arr.numElements()).foreach { j =>
          out.add(toAvroValue(arr, j, et, a.getElementType))
        }
        out
      case other => throw new IllegalStateException(s"unreachable type $other")
    }
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
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AvroBatchWrite(path, info.schema(), doTruncate)
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
    new AvroReaderFactory(schema, AvroSource.confEntries)
}

private case class AvroFilePartition(file: String) extends InputPartition

private class AvroReaderFactory(schema: StructType, conf: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(partition.asInstanceOf[AvroFilePartition].file, schema, conf)
}

private class AvroPartitionReader(file: String, schema: StructType,
    confEntries: Array[(String, String)]) extends PartitionReader[InternalRow] {
  private val conf = AvroSource.rebuild(confEntries)
  private val reader = new DataFileReader[GenericRecord](
    new org.apache.avro.mapred.FsInput(new Path(file), conf),
    new GenericDatumReader[GenericRecord]())
  // heterogeneous directories must fail loudly, not read nulls or corrupt:
  // GenericData.Record.get returns null for UNKNOWN field names (silently
  // nulled columns), and TYPE drift is worse — a plain long where
  // timestamp-micros was inferred reads as a silently wrong timestamp.
  // Check names AND unwrapped Spark types against the inferred schema.
  locally {
    val fileSchema = reader.getSchema
    val fileFields = fileSchema.getFields.asScala.map(_.name()).toSet
    val missing = schema.fieldNames.filterNot(fileFields.contains)
    require(missing.isEmpty,
      s"avro file $file lacks expected fields ${missing.mkString(",")} — " +
        "directory holds heterogeneous schemas (inference uses the first file)")
    schema.fields.foreach { f =>
      val (fileType, _) = AvroSource.unwrap(fileSchema.getField(f.name).schema())
      require(AvroSource.readCompatible(fileType, f.dataType),
        s"avro file $file: field '${f.name}' is $fileType but the inferred " +
          s"schema (first file) says ${f.dataType} — heterogeneous directory")
    }
  }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!reader.hasNext) false
    else {
      val rec = reader.next()
      val fileSchema = reader.getSchema
      val values = schema.fields.map { f =>
        AvroSource.fromAvroValue(rec.get(f.name), fileSchema.getField(f.name).schema(), f.dataType)
      }
      current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

// ---------- write side ----------

private class AvroBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    if (truncate) {
      // overwrite must CLEAR the destination before tasks write — stale
      // part files have different task ids and would otherwise survive,
      // silently returning old+new rows on the next read. Stale
      // .inprogress remnants (tasks that died mid-write in older jobs) go
      // with them — readers never list them, but they'd pile up forever.
      val p = new Path(path)
      val fs = p.getFileSystem(AvroSource.rebuild(AvroSource.confEntries))
      if (fs.exists(p)) fs.listStatus(p)
        .filter(s => s.isFile && (s.getPath.getName.endsWith(".avro") ||
          s.getPath.getName.endsWith(".inprogress")))
        .foreach(s => fs.delete(s.getPath, false))
    }
    new AvroWriterFactory(path, schema, AvroSource.confEntries)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // a failed JOB must not leave the parts its successful tasks committed
    val fs = new Path(path).getFileSystem(AvroSource.rebuild(AvroSource.confEntries))
    messages.collect { case AvroCommit(file) => fs.delete(new Path(file), false) }
  }
}

private class AvroWriterFactory(path: String, schema: StructType,
    conf: Array[(String, String)]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(path, schema, partitionId, taskId, conf)
}

private class AvroDataWriter(dir: String, schema: StructType,
    partitionId: Int, taskId: Long, confEntries: Array[(String, String)])
    extends DataWriter[InternalRow] {

  private val avroSchema = AvroSource.toAvro(schema, "row")
  // write to an .inprogress name, rename on task COMMIT: a task that dies
  // mid-write leaves only a file the reader's .avro filter never lists —
  // truncated containers are never visible under final names
  private val filePath = new Path(dir, f"part-$partitionId%05d-$taskId.avro")
  private val tmpPath = new Path(dir, filePath.getName + ".inprogress")
  private val fs = filePath.getFileSystem(AvroSource.rebuild(confEntries))
  private val out = { fs.mkdirs(filePath.getParent); fs.create(tmpPath, true) }
  private val writer = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, out)
  }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name,
        AvroSource.toAvroValue(row, i, f.dataType, avroSchema.getField(f.name).schema()))
    }
    writer.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    require(fs.rename(tmpPath, filePath), s"rename $tmpPath -> $filePath failed")
    AvroCommit(filePath.toString)
  }
  override def abort(): Unit = { scala.util.Try(writer.close()); fs.delete(tmpPath, false); () }
  override def close(): Unit = ()
}

private case class AvroCommit(file: String) extends WriterCommitMessage
