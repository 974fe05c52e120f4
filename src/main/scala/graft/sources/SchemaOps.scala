package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** Schema-shaping utilities, recast from the reference's field pruning:
  * include/exclude fields + regex patterns (`DataGeneratorFactory.scala:
  * 201-336`) and omit-field drop with nested struct rebuild
  * (`core/util/SchemaUtil.scala:604+` / `DataFrameOmitUtil`). All pure
  * projections — Catalyst column pruning pushes the narrowing into the scan.
  */
object SchemaOps {

  /** Keep only columns matching any include pattern (regex, whole-name). */
  def includeByPattern(df: DataFrame, patterns: Seq[String]): DataFrame = {
    val keep = df.columns.filter(c => patterns.exists(p => c.matches(p)))
    df.select(keep.map(col).toIndexedSeq: _*)
  }

  /** Drop columns matching any exclude pattern (regex, whole-name). */
  def excludeByPattern(df: DataFrame, patterns: Seq[String]): DataFrame = {
    val keep = df.columns.filterNot(c => patterns.exists(p => c.matches(p)))
    df.select(keep.map(col).toIndexedSeq: _*)
  }

  /** Drop a possibly-nested field by dotted path ("a.b.c"), rebuilding the
    * enclosing structs (Spark's drop() only handles top-level columns).
    * Arrays of structs are traversed with transform().
    */
  def dropNested(df: DataFrame, path: String): DataFrame = {
    val parts = path.split("\\.").toSeq
    if (parts.size == 1) return df.drop(path)
    val top = parts.head
    val schema = df.schema(top).dataType
    df.withColumn(top, rebuildWithout(col(top), schema, parts.tail))
  }

  private def rebuildWithout(c: Column, dt: org.apache.spark.sql.types.DataType, rest: Seq[String]): Column =
    dt match {
      case st: StructType if rest.size == 1 =>
        structExcept(c, st, rest.head)
      case st: StructType =>
        val inner = st(rest.head)
        val rebuilt = rebuildWithout(c.getField(rest.head), inner.dataType, rest.tail)
        struct(st.fields.map { f =>
          if (f.name == rest.head) rebuilt.as(f.name) else c.getField(f.name).as(f.name)
        }.toIndexedSeq: _*)
      case ArrayType(et: StructType, _) if rest.size == 1 =>
        transform(c, x => structExcept(x, et, rest.head))
      case ArrayType(et: StructType, _) =>
        transform(c, x => {
          val rebuilt = rebuildWithout(x.getField(rest.head), et(rest.head).dataType, rest.tail)
          struct(et.fields.map { f =>
            if (f.name == rest.head) rebuilt.as(f.name) else x.getField(f.name).as(f.name)
          }.toIndexedSeq: _*)
        })
      case other =>
        throw new IllegalArgumentException(s"cannot drop '${rest.mkString(".")}' inside $other")
    }

  private def structExcept(c: Column, st: StructType, drop: String): Column = {
    val keep = st.fields.filterNot(_.name == drop)
    require(keep.length < st.fields.length, s"field '$drop' not found in ${st.simpleString}")
    struct(keep.map(f => c.getField(f.name).as(f.name)).toIndexedSeq: _*)
  }

  /** Rewrite a possibly-nested field in place by dotted path: the computed-
    * transform rewrite over nested structs / arrays-of-structs
    * (`GeneratorUtil.scala:275-414`). `fn` receives the leaf Column (for a
    * path that ends inside an array-of-structs, the element's field) and its
    * result replaces it, with all enclosing structs rebuilt. Pure projection.
    */
  def transformNested(df: DataFrame, path: String, fn: Column => Column): DataFrame = {
    val parts = path.split("\\.").toSeq
    val top = parts.head
    if (parts.size == 1) return df.withColumn(top, fn(col(top)))
    df.withColumn(top, rebuildWith(col(top), df.schema(top).dataType, parts.tail, fn))
  }

  private def rebuildWith(
      c: Column,
      dt: org.apache.spark.sql.types.DataType,
      rest: Seq[String],
      fn: Column => Column): Column =
    dt match {
      case st: StructType =>
        val inner = st(rest.head)
        val rebuilt =
          if (rest.size == 1) fn(c.getField(rest.head))
          else rebuildWith(c.getField(rest.head), inner.dataType, rest.tail, fn)
        struct(st.fields.map { f =>
          if (f.name == rest.head) rebuilt.as(f.name) else c.getField(f.name).as(f.name)
        }.toIndexedSeq: _*)
      case ArrayType(et: StructType, _) =>
        transform(c, x => rebuildWith(x, et, rest, fn))
      case other =>
        throw new IllegalArgumentException(s"cannot transform '${rest.mkString(".")}' inside $other")
    }

  /** Fields marked omit=true in metadata (the reference attaches options as
    * JSON metadata, `SchemaUtil.scala:585-592`) are dropped before sink.
    */
  def dropOmitted(df: DataFrame): DataFrame = {
    val omitted = df.schema.fields.collect {
      case StructField(name, _, _, m) if m.contains("omit") && m.getBoolean("omit") => name
    }
    if (omitted.isEmpty) df else df.drop(omitted.toIndexedSeq: _*)
  }
}
