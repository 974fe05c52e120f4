package graft.multimodal

import graft.corpus.ImageRow
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images (and by extension audio/video) travel
  * as opaque `binary` columns with typed metadata, exactly as the input_hint
  * schema prescribes. Decode / feature-extraction runs as BATCHED
  * `mapPartitions` over a typed Dataset — the Scala-Spark analog of
  * `mapInPandas` (per-batch amortization of codec setup, bounded memory per
  * batch) — with the actual pixel decode STUBBED: no image codecs ship in
  * this environment, so [[StubCodec.decode]] produces a deterministic fake
  * pixel tensor derived from the byte payload. The Spark-side plumbing —
  * schema, batching, partitioning, null/corrupt handling — is real and
  * tested; swapping the stub for javax.imageio/ffmpeg is a one-function
  * change.
  */
object ImageOps {

  /** Real format sniffing from magic numbers (pure Column: no UDF). */
  def sniffFormat(bytes: Column): Column = {
    val hexPrefix = hex(substring(bytes, 1, 4))
    when(hexPrefix.startsWith("89504E47"), "png")
      .when(hexPrefix.startsWith("FFD8FF"), "jpeg")
      .when(hexPrefix.startsWith("424D"), "bmp")
      .when(hexPrefix.startsWith("52494646"), "webp") // RIFF container
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

  /** Batched feature extraction: partitions are processed in batches of
    * `batchSize` rows (the mapInPandas batch-shape contract), the codec is
    * instantiated once per partition, and corrupt payloads degrade to
    * `decode_ok=false` instead of failing the task.
    */
  def extractFeatures(
      spark: SparkSession,
      images: Dataset[ImageRow],
      featureDim: Int = 16,
      batchSize: Int = 256): Dataset[ImageFeatures] = {
    import spark.implicits._
    images.mapPartitions { it =>
      val codec = new StubCodec(featureDim) // once per partition
      it.grouped(batchSize).flatMap { batch =>
        codec.decodeBatch(batch)
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

/** STUB image codec — deterministic stand-in for a real decoder (no image
  * libraries in this container; see module doc). Produces a fake "pixel
  * feature" vector as a pure hash-derived function of the payload bytes, so
  * tests are reproducible and parallelism-invariant. A real deployment
  * replaces `decode` with an actual codec; everything around it stays.
  */
final class StubCodec(featureDim: Int) extends Serializable {

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
      val sniffed =
        if (r.bytes != null && r.bytes.length >= 4) {
          val p = r.bytes.take(4).map(b => f"${b & 0xff}%02X").mkString
          if (p.startsWith("89504E47")) "png"
          else if (p.startsWith("FFD8FF")) "jpeg"
          else if (p.startsWith("424D")) "bmp"
          else if (p.startsWith("52494646")) "webp"
          else "unknown"
        } else "unknown"
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
