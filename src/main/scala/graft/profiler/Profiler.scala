package graft.profiler

import graft.generator._
import graft.rules.{Rule, Rules}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-profiling metadata discovery — the reference's metadata suite
  * (`core/util/MetadataUtil.scala:228-290` computes per-field statistics via
  * ANALYZE + cached plan stats; `determineIfOneOfField` flags low-cardinality
  * fields; `metadata/ExpressionPredictor.scala:100-170` predicts generators
  * from field names), recast Spark-first:
  *
  *  - ONE aggregate pass computes every field's statistics simultaneously
  *    (count/nulls/approx-distinct/min/max/length stats) — no ANALYZE
  *    command, no table cache, no one-job-per-field;
  *  - a second bounded pass collects the value histogram ONLY for fields the
  *    first pass flagged as low-cardinality (each such groupBy is tiny by
  *    construction);
  *  - [[suggestFieldSpecs]] turns profiles into generator [[FieldSpec]]s
  *    (the reference's auto-plan-from-metadata), with name-based prediction
  *    for PII-shaped fields mapped to [[RegexField]] patterns instead of
  *    faker expressions;
  *  - [[suggestRules]] turns profiles into validation [[Rule]]s (notNull /
  *    between / in / lengthBetween) — the reference's generated validations.
  */
object Profiler {

  final case class FieldProfile(
      name: String,
      dataType: DataType,
      rowCount: Long,
      nullCount: Long,
      distinctCount: Long, // approx (HLL) — exact distinct doesn't scale
      min: Option[Double],
      max: Option[Double],
      minLen: Option[Int],
      maxLen: Option[Int],
      topValues: Seq[(String, Long)]) {
    def nullFraction: Double = if (rowCount == 0) 0.0 else nullCount.toDouble / rowCount
    def isLowCardinality: Boolean =
      rowCount > 0 && distinctCount.toDouble / rowCount <= 0.1 && distinctCount <= 50
  }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Profile every leaf-compatible field in one aggregate pass (+ one tiny
    * histogram pass per low-cardinality field, capped at `maxHistograms`).
    */
  def profile(df: DataFrame, maxHistograms: Int = 10): Seq[FieldProfile] = {
    val fields = df.schema.fields.filter(f =>
      isNumeric(f.dataType) || f.dataType == StringType || f.dataType == DateType ||
        f.dataType == TimestampType || f.dataType == BooleanType)
    if (fields.isEmpty) return Nil
    val aggs = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count_if(c.isNull).as(s"${f.name}__nulls"),
        approx_count_distinct(c).as(s"${f.name}__distinct"))
      val range =
        if (isNumeric(f.dataType))
          Seq(min(c).cast("double").as(s"${f.name}__min"), max(c).cast("double").as(s"${f.name}__max"))
        else Nil
      val len =
        if (f.dataType == StringType)
          Seq(min(length(c)).as(s"${f.name}__minlen"), max(length(c)).as(s"${f.name}__maxlen"))
        else Nil
      base ++ range ++ len
    }.toSeq
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def opt[T](name: String): Option[T] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getAs[T](i))
    }
    val rowCount = row.getAs[Long]("__n")
    val base = fields.toSeq.map { f =>
      FieldProfile(f.name, f.dataType, rowCount,
        row.getAs[Long](s"${f.name}__nulls"),
        row.getAs[Long](s"${f.name}__distinct"),
        if (isNumeric(f.dataType)) opt[Double](s"${f.name}__min") else None,
        if (isNumeric(f.dataType)) opt[Double](s"${f.name}__max") else None,
        if (f.dataType == StringType) opt[Int](s"${f.name}__minlen") else None,
        if (f.dataType == StringType) opt[Int](s"${f.name}__maxlen") else None,
        Nil)
    }
    // bounded histogram pass for oneOf candidates only (reference's
    // determineIfOneOfField collects distincts for flagged fields)
    val withHistogram = base.filter(_.isLowCardinality).take(maxHistograms).map(_.name).toSet
    base.map { p =>
      if (withHistogram(p.name)) {
        val top = df.groupBy(col(p.name)).count()
          .where(col(p.name).isNotNull)
          .orderBy(col("count").desc, col(p.name))
          .limit(50).collect()
          .map(r => (String.valueOf(r.get(0)), r.getLong(1))).toSeq
        p.copy(topValues = top)
      } else p
    }
  }

  /** Name-based generator prediction for PII-shaped fields — the reference's
    * `ExpressionPredictor` maps names to faker expressions
    * (`ExpressionPredictor.scala:100-170`); we map the same names to
    * [[RegexField]] patterns our generator produces natively.
    */
  private[profiler] def predictByName(name: String): Option[FieldSpec] = {
    val n = name.toLowerCase.replaceAll("[_-]", "")
    n match {
      case "email" | "emailaddress" =>
        Some(RegexField(name, "[a-z]{5,10}\\.[a-z]{5,10}@(example|test|demo)\\.(com|org|net)"))
      case "phone" | "cellphone" | "mobilephone" | "homephone" | "phonenumber" =>
        Some(RegexField(name, "\\+1 [0-9]{3}-[0-9]{3}-[0-9]{4}"))
      case "ssn" | "socialsecuritynumber" =>
        Some(RegexField(name, "[0-9]{3}-[0-9]{2}-[0-9]{4}"))
      case "uuid" | "guid" =>
        Some(RegexField(name, "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
      case "ipaddress" | "ipv4" | "ip" =>
        Some(RegexField(name, "(10|172|192)\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"))
      case "macaddress" | "macaddr" =>
        Some(RegexField(name,
          "[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}"))
      case _ => None
    }
  }

  /** Generator specs reproducing the profiled shape: oneOf with observed
    * frequencies for low-cardinality fields, ranges for numerics/dates,
    * length-bounded strings otherwise; PII-shaped names get regex patterns.
    */
  def suggestFieldSpecs(profiles: Seq[FieldProfile]): Seq[FieldSpec] =
    profiles.map { p =>
      predictByName(p.name).getOrElse {
        // oneOf only for string fields: the histogram values are strings, and
        // a low-cardinality numeric is still better generated as a range
        if (p.dataType == StringType && p.isLowCardinality && p.topValues.nonEmpty)
          OneOfField(p.name, p.topValues.map { case (v, n) => (v, n.toDouble) })
        else (p.dataType, p.min, p.max) match {
          case (dt, Some(lo), Some(hi)) if dt == LongType || dt == IntegerType ||
              dt == ShortType || dt == ByteType =>
            IntField(p.name, lo.toLong, hi.toLong)
          case (_: NumericType, Some(lo), Some(hi)) => DoubleField(p.name, lo, hi)
          case _ => AlphaNumField(p.name, p.minLen.getOrElse(1).max(1), p.maxLen.getOrElse(20).max(1))
        }
      }
    }

  /** Validation rules the profiled data itself satisfies — the reference's
    * generated validations (`DataSourceMetadata.getGeneratedValidations`).
    */
  def suggestRules(profiles: Seq[FieldProfile]): Seq[Rule] =
    profiles.flatMap { p =>
      val notNull = if (p.nullCount == 0) Seq(Rules.isNotNull(p.name)) else Nil
      val range = (p.min, p.max) match {
        case (Some(lo), Some(hi)) if isNumeric(p.dataType) =>
          Seq(Rules.between(p.name, lo, hi))
        case _ => Nil
      }
      val oneOf =
        if (p.dataType == StringType && p.isLowCardinality && p.topValues.nonEmpty
            && p.nullCount == 0)
          Seq(Rules.in(p.name, p.topValues.map(_._1)))
        else Nil
      val len = (p.minLen, p.maxLen) match {
        case (Some(lo), Some(hi)) => Seq(Rules.lengthBetween(p.name, lo, hi))
        case _ => Nil
      }
      notNull ++ range ++ oneOf ++ len
    }

  /** Dataset-folder discovery — the reference's file metadata source
    * (`core/generator/metadata/datasource/file/FileMetadata.scala`): given
    * a root folder, find every distinct LEAF dataset directory holding
    * files of `format` (each becomes one profile/generation target, named
    * by its path relative to the root). The reference runs a Spark text
    * read + distinct + collect over all file names for this; a recursive
    * HDFS-compatible listing gives the same answer without a job — this
    * is driver-side catalog metadata, not data. Partitioned layouts
    * (`k=v` path segments, `_SUCCESS` markers) collapse to their dataset
    * root, mirroring the reference's getBaseFolderPathways.
    */
  def discoverDatasets(spark: org.apache.spark.sql.SparkSession, root: String,
      format: String = "parquet"): Seq[(String, String)] = {
    val suffix = "." + (if (format == "delta") "parquet" else format)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Nil
    val rootUri = fs.makeQualified(rootPath).toString.stripSuffix("/")
    // same convention as Spark's own FileIndex: `_`/`.`-prefixed path
    // segments are metadata (_delta_log, _temporary, checkpoints), never
    // datasets — walking them would profile commit logs as data
    def isHidden(path: String): Boolean =
      path.stripPrefix(rootUri).split('/')
        .exists(seg => seg.startsWith("_") || seg.startsWith("."))
    val dirs = scala.collection.mutable.SortedSet[String]()
    val it = fs.listFiles(rootPath, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(suffix) && !isHidden(f.getPath.toString))
        dirs += f.getPath.getParent.toString
    }
    dirs.toSeq.map { d =>
      // collapse hive-partitioned subdirs (k=v segments) to the dataset root
      val rel = d.stripPrefix(rootUri).stripPrefix("/")
      val dataset = rel.split('/').takeWhile(seg => !seg.contains('=')).mkString("/")
      val base = if (dataset.isEmpty) rootUri else s"$rootUri/$dataset"
      (if (dataset.isEmpty) rootPath.getName else dataset) -> base
    }.distinct
  }

  /** Folder → profiles in one sweep: discover each dataset under `root`,
    * read it with `format`, and profile — the reference's auto-plan-from-
    * existing-files entry, composable with [[suggestFieldSpecs]] /
    * [[suggestRules]].
    */
  def profileFolder(spark: org.apache.spark.sql.SparkSession, root: String,
      format: String = "parquet"): Seq[(String, Seq[FieldProfile])] =
    discoverDatasets(spark, root, format).map { case (name, path) =>
      name -> profile(spark.read.format(format).load(path))
    }
}
