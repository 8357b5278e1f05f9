package graft.sources

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Pure-JDK PNG render path (S9 sink + T17 overlay) — javax.imageio ships
  * with the JVM, no dependency.
  *
  * Reference: `pipeline/data_predictor.py:363-414` `save_example_slices`
  * (normalize → ×255 → uint8 → PIL save, per slice) and
  * `visualization/utils.py:6-36` (class-colored label blend over the
  * grayscale image). Runs inside executors over (H,W) slice buffers —
  * render is per-record, embarrassingly parallel.
  */
object Png {

  /** S9: min-max normalize to [0,255] uint8 grayscale, encode PNG. A flat
    * slice (max == min) renders all-black, like the reference's
    * divide-guarded normalize. */
  def grayPng(data: Array[Float], h: Int, w: Int): Array[Byte] = {
    require(data.length == h * w, s"slice buffer ${data.length} != $h x $w")
    var mn = Float.MaxValue; var mx = Float.MinValue
    var i = 0
    while (i < data.length) {
      val v = data(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 1
    }
    val scale = if (mx > mn) 255f / (mx - mn) else 0f
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    i = 0
    while (i < data.length) {
      val g = math.round((data(i) - mn) * scale).max(0).min(255)
      raster.setSample(i % w, i / w, 0, g)
      i += 1
    }
    toBytes(img)
  }

  /** T17 class palette (background transparent, then distinct hues — the
    * reference uses a fixed matplotlib-style color cycle). */
  private val palette: Array[(Int, Int, Int)] = Array(
    (0, 0, 0), (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
    (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230))

  /** T17: alpha-blend class-colored label voxels over the normalized
    * grayscale image; class 0 stays pure grayscale. */
  def overlayPng(image: Array[Float], label: Array[Float], h: Int, w: Int,
                 alpha: Float = 0.4f): Array[Byte] = {
    require(image.length == h * w && label.length == h * w, "image/label/shape mismatch")
    var mn = Float.MaxValue; var mx = Float.MinValue
    var i = 0
    while (i < image.length) {
      val v = image(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 1
    }
    val scale = if (mx > mn) 255f / (mx - mn) else 0f
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    i = 0
    while (i < image.length) {
      val g = math.round((image(i) - mn) * scale).max(0).min(255)
      val cls = math.round(label(i)).max(0)
      val (r, gg, b) =
        if (cls == 0) (g, g, g)
        else {
          val (pr, pg, pb) = palette(cls % palette.length)
          (math.round(g * (1 - alpha) + pr * alpha).min(255),
            math.round(g * (1 - alpha) + pg * alpha).min(255),
            math.round(g * (1 - alpha) + pb * alpha).min(255))
        }
      img.setRGB(i % w, i / w, (r << 16) | (gg << 8) | b)
      i += 1
    }
    toBytes(img)
  }

  private def toBytes(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
