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
    val feats = ImageOps.extractFeatures(spark, corpus, featureDim = 8, batchSize = 32,
      codec = new StubCodec(_))
    val rows = feats.collect()
    assert(rows.length == 400)
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(r => r.decode_ok))
    // deterministic across partitioning
    val feats2 = ImageOps.extractFeatures(spark,
      SyntheticImages.generate(spark, 400L, seed = 5L, partitions = 11), 8, 32,
      codec = new StubCodec(_))
      .collect().map(r => r.image_id -> r.features.toSeq).toMap
    rows.foreach(r => assert(feats2(r.image_id) == r.features.toSeq))
  }

  test("real codec: corpus BMPs decode to actual pixels; webp/junk fall back, batch never fails") {
    val rows = ImageOps.extractFeatures(spark, corpus, featureDim = 4, batchSize = 16)
      .collect().map(r => r.image_id -> r).toMap
    val byFmt = corpus.collect().map(r => r.image_id -> r.fmt).toMap
    assert(rows.size == 400)
    byFmt.foreach { case (id, fmt) =>
      val f = rows(id)
      if (fmt == "bmp") assert(f.decode_ok, s"$id: real 2x2 BMP must decode")
      if (fmt == "webp") assert(!f.decode_ok, s"$id: webp has no JDK codec")
      assert(f.features.length == 4)
      // real features are luma means in [0,1]
      if (f.decode_ok) f.features.foreach(v => assert(v >= 0.0f && v <= 1.0f))
    }
    assert(rows.values.count(_.decode_ok) > 50) // ~20% of 400 are BMPs
  }

  test("decodeMeta: real dimensions, pixel ahash, and JPEG re-encode PSNR per row") {
    val meta = ImageOps.decodeMeta(spark, corpus).collect().map(m => m.image_id -> m).toMap
    val byFmt = corpus.collect().map(r => r.image_id -> r.fmt).toMap
    val decoded = meta.values.filter(_.decode_ok)
    assert(decoded.nonEmpty)
    decoded.foreach { m =>
      assert(byFmt(m.image_id) == "bmp")
      assert(m.real_w == 2 && m.real_h == 2) // the corpus BMP is a true 2x2 bitmap
      assert(!m.psnr_reencode_db.isNaN)
    }
    // determinism of the pixel hash across partitionings
    val again = ImageOps.decodeMeta(spark,
      SyntheticImages.generate(spark, 400L, seed = 5L, partitions = 9))
      .collect().map(m => m.image_id -> m.ahash).toMap
    meta.values.foreach(m => assert(again(m.image_id) == m.ahash))
  }

  test("frame sampling fan-out shape") {
    val frames = ImageOps.sampleFrames(corpus.toDF(), "bytes", nFrames = 4)
    assert(frames.count() == 400 * 4)
    assert(frames.where(col("frame_bytes").isNull).count() == 0)
  }

  test("readImageDirectory: a folder of real files becomes input-table rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_imgdir")
    // two real PNGs (decodable) + one non-image file
    Seq(("a.png", 8, 6), ("b.png", 5, 5)).foreach { case (name, w, h) =>
      val d = Pixels.Decoded(w, h, Array.fill(w * h)(0xFF336699))
      java.nio.file.Files.write(dir.resolve(name), Pixels.encodePng(d))
    }
    java.nio.file.Files.write(dir.resolve("notes.txt"), "not an image".getBytes)

    val rows = ImageOps.readImageDirectory(spark, dir.toString)
      .collect().map(r => r.image_id -> r).toMap
    assert(rows.keySet == Set("a.png", "b.png", "notes.txt"))
    assert(rows("a.png").w == 8 && rows("a.png").h == 6 && rows("a.png").fmt == "png")
    assert(rows("b.png").phash != 0L) // pixel-derived ahash present
    assert(rows("notes.txt").w == -1 && rows("notes.txt").fmt == "unknown")

    // source-side narrowing: the glob never reads the txt file
    val pngOnly = ImageOps.readImageDirectory(spark, dir.toString, globFilter = "*.png")
    assert(pngOnly.count() == 2)
  }
}
