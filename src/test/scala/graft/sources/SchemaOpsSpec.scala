package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SchemaOpsSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private def nested = spark.range(3).select(
    col("id"),
    struct(col("id").as("a"), struct((col("id") * 2).as("b"), lit("x").as("c")).as("inner")).as("s"),
    array(struct(col("id").as("k"), lit("v").as("v"))).as("arr"))

  test("include/exclude by pattern") {
    val df = spark.range(1).select(lit(1).as("keep_a"), lit(2).as("keep_b"), lit(3).as("drop_c"))
    assert(SchemaOps.includeByPattern(df, Seq("keep_.*")).columns.toSeq == Seq("keep_a", "keep_b"))
    assert(SchemaOps.excludeByPattern(df, Seq("drop_.*")).columns.toSeq == Seq("keep_a", "keep_b"))
  }

  test("dropNested removes struct fields at any depth") {
    val d1 = SchemaOps.dropNested(nested, "s.a")
    assert(d1.select("s.*").columns.toSeq == Seq("inner"))
    val d2 = SchemaOps.dropNested(nested, "s.inner.c")
    assert(d2.select("s.inner.*").columns.toSeq == Seq("b"))
    // values preserved
    assert(d2.where(col("s.inner.b") =!= col("id") * 2).count() == 0)
  }

  test("dropNested handles arrays of structs") {
    val d = SchemaOps.dropNested(nested, "arr.v")
    val elemType = d.schema("arr").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(elemType.fieldNames.toSeq == Seq("k"))
  }

  test("transformNested rewrites leaves at any depth, structs rebuilt intact") {
    val t1 = SchemaOps.transformNested(nested, "s.inner.b", _ * 10)
    assert(t1.where(col("s.inner.b") =!= col("id") * 20).count() == 0)
    assert(t1.where(col("s.inner.c") =!= "x" || col("s.a") =!= col("id")).count() == 0)
    // top-level and array-of-struct paths
    val t2 = SchemaOps.transformNested(nested, "id", _ + 100)
    assert(t2.agg(min("id")).head().getLong(0) == 100)
    val t3 = SchemaOps.transformNested(nested, "arr.v", c => upper(c))
    assert(t3.select(explode(col("arr"))).where(col("col.v") =!= "V").count() == 0)
    assert(t3.select(explode(col("arr"))).where(col("col.k") =!= col("col.k")).count() == 0)
  }

  test("dropOmitted drops metadata-marked fields") {
    val meta = new org.apache.spark.sql.types.MetadataBuilder().putBoolean("omit", true).build()
    val df = spark.range(2).select(col("id"), lit("h").as("helper", meta))
    assert(SchemaOps.dropOmitted(df).columns.toSeq == Seq("id"))
  }

  test("format roundtrips: parquet, orc, json, csv preserve data") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    val df = spark.range(100).select(
      col("id"), (col("id") * 1.5).as("v"), concat(lit("s"), col("id")).as("s"))
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val path = s"$dir/$fmt"
      val w = df.write.mode("overwrite").format(fmt)
      (if (fmt == "csv") w.option("header", "true") else w).save(path)
      val r = spark.read.format(fmt)
      val back = (if (fmt == "csv") r.option("header", "true").option("inferSchema", "true") else r)
        .load(path)
      assert(back.count() == 100, fmt)
      val total = back.agg(sum(col("v").cast("double"))).head().getDouble(0)
      assert(math.abs(total - 100 * 99 / 2 * 1.5) < 1e-6, fmt)
    }
  }
}
