package graft.sources.v2

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

class AvroSourceSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  test("avro round-trip: write partitioned container files, read back exactly") {
    val dir = Files.createTempDirectory("graft_avro").toString + "/t"
    val df = spark.range(0, 1000, 1, 4).select(
      col("id"),
      concat(lit("name_"), col("id")).as("name"),
      (col("id") * 1.5).as("score"),
      (col("id") % 2 === 0).as("flag"),
      when(col("id") % 10 === 0, lit(null)).otherwise(concat(lit("opt"), col("id"))).as("maybe"),
      encode(concat(lit("payload"), col("id")), "UTF-8").as("blob"))
    df.write.mode("append").format("graft-avro").save(dir)

    // one container file per input partition
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 4)

    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "score", "flag", "maybe", "blob"))
    assert(back.count() == 1000)
    // value-exact: anti-join both directions on every column
    val a = df.withColumn("blob", hex(col("blob")))
    val b = back.withColumn("blob", hex(col("blob")))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // nulls survived the union(null, T) encoding
    assert(back.where(col("maybe").isNull).count() == 100)
    // reads parallelize per file
    assert(back.rdd.getNumPartitions == 4)
  }

  test("mode overwrite truncates; unsupported nested types fail loudly") {
    val dir = Files.createTempDirectory("graft_avro2").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("append").format("graft-avro").save(dir)
    Seq((9L, "z")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").format("graft-avro").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    // overwrite TRUNCATES: stale part files (different task ids) are
    // deleted before the new tasks write — old+new would be corruption
    assert(back.count() == 1)
    assert(back.where(col("id") === 9L).count() == 1)
    // no .inprogress remnants after committed writes
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".inprogress")))
    // maps remain a loud narrowing (use parquet)
    val mapped = Seq((1L, Map("k" -> "v"))).toDF("id", "m")
    val e = intercept[Exception](
      mapped.write.mode("append").format("graft-avro").save(dir + "2"))
    assert(String.valueOf(e.getMessage).contains("unsupported type") ||
      Option(e.getCause).exists(_.getMessage.contains("unsupported type")))
  }

  test("logical types + nesting round-trip: date, timestamp, decimal, struct, array") {
    val dir = Files.createTempDirectory("graft_avro3").toString + "/t"
    val df = spark.range(0, 500, 1, 3).select(
      col("id"),
      date_add(to_date(lit("2024-01-01")), (col("id") % 365).cast("int")).as("d"),
      timestamp_seconds(lit(1700000000L) + col("id") * 61).as("ts"),
      (col("id").cast("decimal(12,2)") / 7).cast("decimal(12,2)").as("dec"),
      struct(
        concat(lit("c"), col("id")).as("city"),
        (col("id") % 100).cast("int").as("zip"),
        when(col("id") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("s"), col("id"))).as("opt")).as("addr"),
      array(col("id"), col("id") * 2, col("id") * 3).as("nums"),
      // array of structs: one level down each way
      array(struct(lit("a").as("k"), col("id").as("v")),
        struct(lit("b").as("k"), (col("id") + 1).as("v"))).as("pairs"))
    df.write.mode("append").format("graft-avro").save(dir)

    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema("d").dataType == org.apache.spark.sql.types.DateType)
    assert(back.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(back.schema("dec").dataType == org.apache.spark.sql.types.DecimalType(12, 2))
    assert(back.count() == 500)
    assert(df.exceptAll(back).isEmpty && back.exceptAll(df).isEmpty)
    // nested nullability survived
    assert(back.where(col("addr.opt").isNull).count() == 100)
    assert(back.select(explode(col("pairs")).as("p")).where(col("p.k") === "b").count() == 500)
    // negative decimals keep sign through the two's-complement bytes
    val neg = spark.range(3).select((col("id").cast("decimal(6,2)") - 10).as("n"))
    neg.write.mode("append").format("graft-avro").save(dir + "_neg")
    val backNeg = spark.read.format("graft-avro").load(dir + "_neg")
    assert(backNeg.agg(min(col("n"))).head().getDecimal(0).toString == "-10.00")
  }

  test("mixed-scale decimal directory rescales exactly; type drift stays loud") {
    val root = Files.createTempDirectory("graft_avro_mix").toString
    // two files with decimal(12,2) and decimal(12,3) — lossless rescale
    spark.range(0, 5).select(col("id").cast("decimal(12,2)").as("v"))
      .coalesce(1).write.mode("append").format("graft-avro").save(s"$root/d")
    spark.range(5, 9).select(col("id").cast("decimal(12,3)").as("v"))
      .coalesce(1).write.mode("append").format("graft-avro").save(s"$root/d3")
    val extra = new java.io.File(s"$root/d3").listFiles()
      .find(_.getName.endsWith(".avro")).get
    java.nio.file.Files.move(extra.toPath,
      java.nio.file.Paths.get(s"$root/d/zz-${extra.getName}"))
    val back = spark.read.format("graft-avro").load(s"$root/d")
    assert(back.count() == 9)
    assert(back.agg(sum(col("v"))).head().getDecimal(0).longValue() == 36) // 0+..+8
    // TYPE drift (long field where string was inferred) still fails loudly
    spark.range(3).selectExpr("cast(id as string) as v").coalesce(1)
      .write.mode("append").format("graft-avro").save(s"$root/s")
    spark.range(3).select(col("id").as("v")).coalesce(1)
      .write.mode("append").format("graft-avro").save(s"$root/l")
    val drift = new java.io.File(s"$root/l").listFiles()
      .find(_.getName.endsWith(".avro")).get
    java.nio.file.Files.move(drift.toPath,
      java.nio.file.Paths.get(s"$root/s/zz-${drift.getName}"))
    val e = intercept[Exception](
      spark.read.format("graft-avro").load(s"$root/s").count())
    assert(String.valueOf(e.getMessage).contains("heterogeneous") ||
      Option(e.getCause).exists(c => String.valueOf(c.getMessage).contains("heterogeneous")))
  }
}
