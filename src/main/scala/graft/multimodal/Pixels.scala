package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL pixel operations over the JDK's built-in `javax.imageio`
  * (java.desktop module — part of any standard JDK 17; no external image
  * libraries needed, so "no codecs in the container" stops being a
  * constraint for PNG/JPEG/BMP/GIF). WEBP has no JDK codec and still goes
  * through the deterministic stub path.
  *
  * Everything here is executor-side compute for the batched mapPartitions
  * plumbing in [[ImageOps]]: decode, resize, block-mean features, a real
  * perceptual average-hash, and the north rule's PSNR metric
  * ("decoded-pixel allclose, PSNR ≥ 40 dB for lossy formats").
  */
object Pixels {

  // ImageIO must never touch a display; set before the first toolkit load
  System.setProperty("java.awt.headless", "true")

  final case class Decoded(w: Int, h: Int, argb: Array[Int])

  /** Decode via ImageIO; None when no JDK codec matches (webp, corrupt). */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 4) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else Some(Decoded(img.getWidth, img.getHeight,
        img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)))
    } catch { case _: Exception => None }
  }

  private def toImage(d: Decoded): BufferedImage = {
    val img = new BufferedImage(d.w, d.h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, d.w, d.h, d.argb, 0, d.w)
    img
  }

  def encodePng(d: Decoded): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(toImage(d), "png", bos)
    bos.toByteArray
  }

  def encodeJpeg(d: Decoded, quality: Float = 0.85f): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val out = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.write(null, new javax.imageio.IIOImage(toImage(d), null, null), params)
    } finally { out.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Area-averaging resize (deterministic, no Graphics2D rendering-hint
    * variance): output pixel = mean of its source box.
    */
  def resize(d: Decoded, w: Int, h: Int): Decoded = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val sy0 = y * d.h / h
      val sy1 = math.max(sy0 + 1, (y + 1) * d.h / h)
      var x = 0
      while (x < w) {
        val sx0 = x * d.w / w
        val sx1 = math.max(sx0 + 1, (x + 1) * d.w / w)
        var r = 0L; var g = 0L; var b = 0L; var n = 0
        var sy = sy0
        while (sy < sy1) {
          var sx = sx0
          while (sx < sx1) {
            val p = d.argb(sy * d.w + sx)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff; n += 1
            sx += 1
          }
          sy += 1
        }
        out(y * w + x) = 0xff000000 | (((r / n).toInt & 0xff) << 16) |
          (((g / n).toInt & 0xff) << 8) | ((b / n).toInt & 0xff)
        x += 1
      }
      y += 1
    }
    Decoded(w, h, out)
  }

  private def luma(p: Int): Double =
    0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)

  /** REAL perceptual average-hash: resize to 8×8 (area means), bit b set iff
    * cell luma > mean luma. Near-identical images → small hamming distance;
    * feeds [[graft.dedup.Dedup.phashNearDup]] with a pixel-derived hash.
    */
  def aHash64(d: Decoded): Long = {
    val small = resize(d, 8, 8)
    val lum = small.argb.map(luma)
    val mean = lum.sum / 64.0
    var h = 0L
    var i = 0
    while (i < 64) { if (lum(i) > mean) h |= (1L << i); i += 1 }
    h
  }

  /** Gray block-mean feature vector in [0,1] (dim = gridSize²). */
  def blockMeanFeatures(d: Decoded, gridSize: Int): Array[Float] = {
    val small = resize(d, gridSize, gridSize)
    small.argb.map(p => (luma(p) / 255.0).toFloat)
  }

  /** PSNR in dB over RGB channels; Double.PositiveInfinity when identical.
    * The north rule's lossy-format invariant is psnrDb >= 40.
    */
  def psnrDb(a: Decoded, b: Decoded): Double = {
    require(a.w == b.w && a.h == b.h, s"psnr: size mismatch ${a.w}x${a.h} vs ${b.w}x${b.h}")
    var se = 0.0
    var i = 0
    while (i < a.argb.length) {
      val p = a.argb(i); val q = b.argb(i)
      val dr = ((p >> 16) & 0xff) - ((q >> 16) & 0xff)
      val dg = ((p >> 8) & 0xff) - ((q >> 8) & 0xff)
      val db = (p & 0xff) - (q & 0xff)
      se += dr * dr + dg * dg + db * db
      i += 1
    }
    val mse = se / (a.argb.length * 3.0)
    if (mse == 0.0) Double.PositiveInfinity else 10.0 * math.log10(255.0 * 255.0 / mse)
  }
}
