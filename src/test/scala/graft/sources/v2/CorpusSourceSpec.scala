package graft.sources.v2

import graft.SparkSuite
import graft.corpus.SyntheticImages
import org.apache.spark.sql.functions._

class CorpusSourceSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private def read(rows: Long, parts: Int = 7) = spark.read.format("graft-corpus")
    .option("rows", rows).option("seed", 42).option("partitions", parts).load()

  test("DSv2 read: schema, count, content identical to the Dataset generator") {
    val df = read(500)
    assert(df.schema == CorpusSource.schema)
    assert(df.count() == 500)
    val viaSource = df.select("image_id", "w", "h", "fmt", "caption", "phash")
      .collect().map(_.toString).sorted
    val viaDataset = SyntheticImages.generate(spark, 500L, 42L)
      .select("image_id", "w", "h", "fmt", "caption", "phash")
      .collect().map(_.toString).sorted
    assert(viaSource.sameElements(viaDataset))
    // bytes content identical too
    val sb = df.select("image_id", "bytes").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    SyntheticImages.generate(spark, 500L, 42L).select("image_id", "bytes").collect()
      .foreach(r => assert(java.util.Arrays.equals(sb(r.getString(0)), r.getAs[Array[Byte]](1))))
  }

  test("column pruning reaches the source: pruned bytes are never generated") {
    val q = read(100).select("caption")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("readSchema=caption"), plan) // Scan.description
    assert(!plan.contains("readSchema=image_id,bytes"), plan)
    assert(q.count() == 100)
  }

  test("limit pushdown shrinks the planned range (fully pushed)") {
    val q = read(1000000, parts = 16).limit(5)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("rows=5,"), plan) // CorpusScan.description reflects the pushed limit
    assert(q.collect().length == 5)
  }

  test("parallelism invariance: 1 vs 13 partitions byte-identical") {
    val a = read(300, parts = 1).drop("bytes").collect().map(_.toString).sorted
    val b = read(300, parts = 13).drop("bytes").collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(read(300, parts = 13).rdd.getNumPartitions == 13)
  }
}
