package graft.multimodal

import graft.SparkSuite
import graft.corpus.SyntheticImages
import org.apache.spark.sql.functions._

class ImageOpsSpec extends SparkSuite {

  private lazy val corpus = SyntheticImages.generate(spark, 400L, seed = 5L, partitions = 4)

  test("format sniffing (Column) agrees with declared fmt for known formats") {
    val checked = corpus.toDF()
      .withColumn("sniffed", ImageOps.sniffFormat(col("bytes")))
    // synthetic corpus writes real magic numbers for png/jpeg/bmp/webp
    val mism = checked
      .where(col("fmt").isin("png", "jpeg", "bmp", "webp") && col("sniffed") =!= col("fmt"))
      .count()
    assert(mism == 0)
    // junk formats sniff as unknown
    val junk = checked.where(!col("fmt").isin("png", "jpeg", "bmp", "webp"))
    assert(junk.count() > 0)
    assert(junk.where(col("sniffed") =!= "unknown").count() == 0)
  }

  test("batched mapPartitions feature extraction: schema, determinism, corrupt handling") {
    val feats = ImageOps.extractFeatures(spark, corpus, featureDim = 8, batchSize = 32)
    val rows = feats.collect()
    assert(rows.length == 400)
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(r => r.decode_ok))
    // deterministic across partitioning
    val feats2 = ImageOps.extractFeatures(spark,
      SyntheticImages.generate(spark, 400L, seed = 5L, partitions = 11), 8, 32)
      .collect().map(r => r.image_id -> r.features.toSeq).toMap
    rows.foreach(r => assert(feats2(r.image_id) == r.features.toSeq))
  }

  test("frame sampling fan-out shape") {
    val frames = ImageOps.sampleFrames(corpus.toDF(), "bytes", nFrames = 4)
    assert(frames.count() == 400 * 4)
    assert(frames.where(col("frame_bytes").isNull).count() == 0)
  }
}
