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
    val nested = Seq((1L, Seq("x"))).toDF("id", "arr")
    val e = intercept[Exception](
      nested.write.mode("append").format("graft-avro").save(dir + "2"))
    assert(String.valueOf(e.getMessage).contains("flat primitives") ||
      Option(e.getCause).exists(_.getMessage.contains("flat primitives")))
  }
}
