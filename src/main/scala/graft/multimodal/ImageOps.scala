package graft.multimodal

import graft.corpus.ImageRow
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images (and by extension audio/video) travel
  * as opaque `binary` columns with typed metadata, exactly as the input_hint
  * schema prescribes. Decode / feature-extraction runs as BATCHED
  * `mapPartitions` over a typed Dataset — the Scala-Spark analog of
  * `mapInPandas` (per-batch amortization of codec setup, bounded memory per
  * batch).
  *
  * Pixel decode is REAL for PNG/JPEG/BMP/GIF via the JDK's own
  * `javax.imageio` ([[Pixels]] — java.desktop ships with the JDK, so "no
  * image libraries in the container" only applies to formats like WEBP).
  * [[RealCodec]] is the default; payloads without a JDK codec fall back to
  * [[StubCodec]]'s deterministic fake with `decode_ok=false`, so a batch
  * never fails on an undecodable row.
  */
object ImageOps {

  /** Real format sniffing from magic numbers (pure Column: no UDF). */
  def sniffFormat(bytes: Column): Column = {
    val hexPrefix = hex(substring(bytes, 1, 4))
    when(hexPrefix.startsWith("89504E47"), "png")
      .when(hexPrefix.startsWith("FFD8FF"), "jpeg")
      .when(hexPrefix.startsWith("424D"), "bmp")
      .when(hexPrefix.startsWith("52494646"), "webp") // RIFF container
      .when(hexPrefix.startsWith("47494638"), "gif")
      .otherwise("unknown")
  }

  /** Declared-format vs magic-number consistency rule (joins the quality
    * rule set for multimodal corpora).
    */
  def formatConsistent(bytes: Column, declaredFmt: Column): Column =
    sniffFormat(bytes) === declaredFmt

  final case class ImageFeatures(
      image_id: String,
      fmt_sniffed: String,
      n_bytes: Int,
      features: Array[Float],
      decode_ok: Boolean)

  /** JVM-side magic-number sniff (twin of the Column [[sniffFormat]]). */
  private[multimodal] def sniff(bytes: Array[Byte]): String =
    if (bytes == null || bytes.length < 4) "unknown"
    else {
      val p = bytes.take(4).map(b => f"${b & 0xff}%02X").mkString
      if (p.startsWith("89504E47")) "png"
      else if (p.startsWith("FFD8FF")) "jpeg"
      else if (p.startsWith("424D")) "bmp"
      else if (p.startsWith("52494646")) "webp"
      else if (p.startsWith("47494638")) "gif"
      else "unknown"
    }

  /** Batched feature extraction: partitions are processed in batches of
    * `batchSize` rows (the mapInPandas batch-shape contract), the codec is
    * instantiated once per partition, and corrupt/undecodable payloads
    * degrade to `decode_ok=false` instead of failing the task. Default
    * codec = [[RealCodec]] (true pixel decode where a JDK codec exists).
    */
  def extractFeatures(
      spark: SparkSession,
      images: Dataset[ImageRow],
      featureDim: Int = 16,
      batchSize: Int = 256,
      codec: Int => BatchCodec = new RealCodec(_)): Dataset[ImageFeatures] = {
    import spark.implicits._
    images.mapPartitions { it =>
      val c = codec(featureDim) // once per partition
      it.grouped(batchSize).flatMap { batch =>
        c.decodeBatch(batch)
      }
    }
  }

  final case class DecodedMeta(
      image_id: String,
      decode_ok: Boolean,
      real_w: Int,
      real_h: Int,
      ahash: Long,
      psnr_reencode_db: Double)

  /** Real decoded-pixel metadata per image: true dimensions, a pixel-derived
    * perceptual average-hash (feeds [[graft.dedup.Dedup.phashNearDup]]), and
    * the PSNR of a lossy (JPEG q=0.85) re-encode round-trip — the north
    * rule's decoded-pixel invariant made measurable per row. Rows without a
    * JDK codec report decode_ok=false.
    */
  def decodeMeta(
      spark: SparkSession,
      images: Dataset[ImageRow],
      batchSize: Int = 256): Dataset[DecodedMeta] = {
    import spark.implicits._
    images.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          Pixels.decode(r.bytes) match {
            case Some(d) =>
              val re = Pixels.decode(Pixels.encodeJpeg(d))
                .map(Pixels.psnrDb(d, _)).getOrElse(Double.NaN)
              DecodedMeta(r.image_id, decode_ok = true, d.w, d.h, Pixels.aHash64(d), re)
            case None =>
              DecodedMeta(r.image_id, decode_ok = false, -1, -1, 0L, Double.NaN)
          }
        }
      }
    }
  }

  /** Ingest a DIRECTORY of image files as the pipeline's input table —
    * Spark's built-in `binaryFile` source (one row per file: path +
    * content, predicate pushdown on path/length/modTime) feeds the same
    * decode batch as [[decodeMeta]], so a folder of real images becomes
    * (image_id, bytes, w, h, fmt, caption, phash) rows ready for
    * [[graft.pipeline.QualityFilter]]. `pathGlobFilter` narrows at the
    * SOURCE (e.g. `*.png`); files without a JDK codec carry w = h = -1 and
    * the quality rules drop them. Captions arrive separately (join on
    * image_id) — a directory has none.
    */
  def readImageDirectory(
      spark: SparkSession,
      path: String,
      globFilter: String = "*"): Dataset[ImageRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", globFilter)
      .load(path)
      .select(
        element_at(split(col("path"), "/"), -1).as("image_id"),
        col("content").as("bytes"))
      .as[(String, Array[Byte])]
      .map { case (id, bytes) =>
        // per-element decode: ImageIO holds no amortizable per-batch state
        // (unlike the feature codecs), so a grouped() wrapper would only
        // buffer image bytes without buying anything
        val fmt = sniff(bytes)
        Pixels.decode(bytes) match {
          case Some(d) =>
            ImageRow(id, bytes, d.w, d.h, fmt, caption = "", Pixels.aHash64(d))
          case None => ImageRow(id, bytes, -1, -1, fmt, caption = "", 0L)
        }
      }
  }

  /** Frame sampling for video-like payloads: deterministic frame offsets
    * from the byte length (stub: frames are byte slices). Demonstrates the
    * explode-based fan-out shape real frame extraction would use.
    */
  def sampleFrames(df: DataFrame, bytesCol: String, nFrames: Int): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_offset",
        (col("frame_idx") * greatest(length(col(bytesCol)), lit(1))) / nFrames)
      .withColumn("frame_bytes",
        substring(col(bytesCol), (col("frame_offset") + 1).cast("int"), lit(8)))
}

/** Per-partition batch codec contract shared by [[RealCodec]] / [[StubCodec]]. */
trait BatchCodec extends Serializable {
  def decodeBatch(batch: Seq[ImageRow]): Seq[ImageOps.ImageFeatures]
}

/** REAL codec: javax.imageio decode ([[Pixels]]) → gray block-mean feature
  * vector from actual pixels. Payloads with no JDK codec (webp, junk) fall
  * back to the deterministic stub features with decode_ok=false.
  */
final class RealCodec(featureDim: Int) extends BatchCodec {
  private val stub = new StubCodec(featureDim)
  private val grid = math.max(1, math.ceil(math.sqrt(featureDim.toDouble)).toInt)

  def decodeBatch(batch: Seq[ImageRow]): Seq[ImageOps.ImageFeatures] =
    batch.map { r =>
      val n = if (r.bytes == null) 0 else r.bytes.length
      Pixels.decode(r.bytes) match {
        case Some(d) =>
          ImageOps.ImageFeatures(r.image_id, ImageOps.sniff(r.bytes), n,
            Pixels.blockMeanFeatures(d, grid).take(featureDim), decode_ok = true)
        case None =>
          stub.decodeBatch(Seq(r)).head.copy(decode_ok = false)
      }
    }
}

/** STUB image codec — deterministic stand-in where NO JDK codec exists
  * (webp; see [[RealCodec]]). Produces a fake "pixel feature" vector as a
  * pure hash-derived function of the payload bytes, so tests are
  * reproducible and parallelism-invariant.
  */
final class StubCodec(featureDim: Int) extends BatchCodec {

  /** Deterministic fake decode: feature j = scaled hash of (payload, j). */
  private[multimodal] def decode(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.length < 2) throw new IllegalArgumentException("corrupt payload")
    val h0 = graft.dedup.XxHash.hashBytes(bytes, 42L)
    Array.tabulate(featureDim) { j =>
      val h = graft.dedup.XxHash.hashBytes(Array(
        (h0 >>> 56).toByte, (h0 >>> 48).toByte, (h0 >>> 40).toByte, (h0 >>> 32).toByte,
        (h0 >>> 24).toByte, (h0 >>> 16).toByte, (h0 >>> 8).toByte, h0.toByte, j.toByte), 7L)
      ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
  }

  def decodeBatch(batch: Seq[ImageRow]): Seq[ImageOps.ImageFeatures] =
    batch.map { r =>
      val sniffed = ImageOps.sniff(r.bytes)
      try ImageOps.ImageFeatures(r.image_id, sniffed,
        if (r.bytes == null) 0 else r.bytes.length, decode(r.bytes), decode_ok = true)
      catch {
        case _: IllegalArgumentException =>
          ImageOps.ImageFeatures(r.image_id, sniffed,
            if (r.bytes == null) 0 else r.bytes.length,
            new Array[Float](featureDim), decode_ok = false)
      }
    }
}
