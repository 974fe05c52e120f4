package graft.streaming

import graft.SparkSuite
import graft.pipeline.{QualityFilter, ScoredImage}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingOpsSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private def scored(id: String, caption: String, w: Int = 100, h: Int = 100) =
    ScoredImage(id, Array[Byte](1, 2), w, h, "png", caption, 0L, "en", 0.9, 100.0)

  test("quality rules run unchanged on a stream (stateless projection)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ScoredImage]
    val annotated = StreamingOps.annotateStream(mem.toDF())
    val q = annotated.writeStream.format("memory").queryName("ann").outputMode("append").start()
    mem.addData(
      scored("a", "a clear photo of a cat on the table"),
      scored("b", null),
      scored("c", "ok ok ok ok ok ok ok ok ok ok ok ok"))
    q.processAllAvailable()
    val out = spark.table("ann").select("image_id", "drop_reason")
      .as[(String, String)].collect().toMap
    q.stop()
    assert(out("a") == null)
    assert(out("b") == "caption_missing")
    assert(out("c") == "caption_repetitive")
  }

  test("watermarked windowed drop counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val base = mem.toDF().toDF("caption", "ts")
      .withColumn("image_id", lit("x"))
      .withColumn("bytes", lit(Array[Byte](1))).withColumn("w", lit(100))
      .withColumn("h", lit(100)).withColumn("fmt", lit("png"))
      .withColumn("phash", lit(0L)).withColumn("lang", lit("en"))
      .withColumn("lang_conf", lit(0.9)).withColumn("ppl", lit(100.0))
    val counts = StreamingOps.windowedDropCounts(
      StreamingOps.annotateStream(base), "ts")
    val q = counts.writeStream.format("memory").queryName("wc").outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:10")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:30")
    val late = java.sql.Timestamp.valueOf("2026-01-01 00:10:00") // advances watermark, closes window
    mem.addData(("a good photo of a cat on a table", t0), (null.asInstanceOf[String], t1))
    q.processAllAvailable()
    mem.addData(("advance the watermark far beyond the first window", late))
    q.processAllAvailable()
    mem.addData(("and once more to emit finalized windows", java.sql.Timestamp.valueOf("2026-01-01 00:20:00")))
    q.processAllAvailable()
    val rows = spark.table("wc").select("reason", "n").as[(String, Long)].collect().toMap
    q.stop()
    assert(rows.get("__kept__").contains(1L))
    assert(rows.get("caption_missing").contains(1L))
  }
}
