package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload with typed metadata — the multimodal column convention: media travels as
  * `binary`, structure lives in columns.
  */
final case class MediaRow(
    id: Long,
    kind: String, // image | audio | video
    payload: Array[Byte],
    meta: Map[String, String])

/** Decoded-frame record (the batch shape a real decoder would emit). */
final case class Frame(
    id: Long,
    frameIdx: Int,
    width: Int,
    height: Int,
    channels: Int,
    pixels: Array[Byte])

/** Multimodal plumbing for training-data pipelines.
  *
  * IMAGE decode is REAL: `javax.imageio` ships in the JDK (PNG/BMP/JPEG/GIF), so image payloads
  * are actually decoded to RGB pixel frames. AUDIO/VIDEO decoders remain STUBS (their codecs are
  * not in this container) implemented as deterministic pseudo-decodes, so the Spark-side contract
  * stays real and testable for every kind: schemas, `mapPartitions` batching (one decoder init
  * per partition, the JVM analog of a Pandas `mapInPandas` UDF), partition sizing, and the
  * feature-extraction shapes downstream ops consume. Corrupt/undecodable image payloads emit no
  * frame (at 10^12-row scale corrupt media is routine; a throwing decoder would kill the stage).
  */
object Multimodal {

  /** Decode one image payload to an RGB [[Frame]] (frameIdx 0). None on undecodable bytes. */
  def decodeImageBytes(id: Long, bytes: Array[Byte]): Option[Frame] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y) // sRGB int — lossless for PNG/BMP sources
            val o = (y * w + x) * 3
            px(o) = ((rgb >> 16) & 0xff).toByte
            px(o + 1) = ((rgb >> 8) & 0xff).toByte
            px(o + 2) = (rgb & 0xff).toByte
            x += 1
          }
          y += 1
        }
        Some(Frame(id, 0, w, h, 3, px))
      }
    } catch { case _: Exception => None }

  /** Encode an RGB pixel buffer as PNG bytes (lossless — decode(encode(px)) == px). */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"expected ${w * h * 3} RGB bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        val rgbInt = ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff)
        img.setRGB(x, y, rgbInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Frame decoder, routed by `kind`:
    *  - `image` → REAL javax.imageio decode, one RGB frame per payload (undecodable → 0 frames);
    *  - `audio`/`video` → STUB pseudo-decode, `frameCount` deterministic frames per payload.
    */
  def decodeFrames(ds: Dataset[MediaRow], frameCount: Int = 4): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decoder init (once, not per row): no disk-backed ImageIO scratch cache —
      // executor-local tmp on a busy node is a straggler source, and frames fit in memory
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap {
        case m if m.kind == "image" => decodeImageBytes(m.id, m.payload).iterator
        case m => // audio/video pseudo-decode (STUB, codecs absent here)
          val w = 8 + math.floorMod(m.payload.length, 8)
          val h = 8
          (0 until frameCount).iterator.map { i =>
            val px = Array.tabulate(w * h * 3)(j =>
              (m.payload(math.floorMod(i * 31 + j, math.max(1, m.payload.length))) ^ i).toByte)
            Frame(m.id, i, w, h, 3, px)
          }
      }
    }
  }

  /** Nearest-neighbor resize over the RGB pixel buffer — real on decoded image frames,
    * partition-parallel.
    */
  def resize(frames: Dataset[Frame], outW: Int, outH: Int): Dataset[Frame] = {
    import frames.sparkSession.implicits._
    frames.map { f =>
      val px = Array.tabulate(outW * outH * f.channels) { j =>
        val c = j % f.channels
        val xy = j / f.channels
        val sx = (xy % outW) * f.width / outW
        val sy = (xy / outW) * f.height / outH
        f.pixels((sy * f.width + sx) * f.channels + c)
      }
      Frame(f.id, f.frameIdx, outW, outH, f.channels, px)
    }
  }

  /** Frame sampling: keep every `stride`-th frame (pure column op, no decode). */
  def sampleFrames(frames: Dataset[Frame], stride: Int): Dataset[Frame] =
    frames.filter(f => f.frameIdx % stride == 0)

  /** Feature extraction: per-frame byte-histogram as a fixed-width Float vector — the
    * `Array[Float]` embedding shape the Similarity ops consume (real pixels in, real features
    * out for images; a learned featurizer would slot in behind the same signature).
    */
  def features(frames: Dataset[Frame], dims: Int = 16): DataFrame = {
    import frames.sparkSession.implicits._
    frames.map { f =>
      val v = new Array[Float](dims)
      var j = 0
      while (j < f.pixels.length) { v(math.floorMod(f.pixels(j), dims)) += 1.0f; j += 1 }
      val n = math.max(1, f.pixels.length).toFloat
      (f.id, f.frameIdx, v.map(_ / n))
    }.toDF("id", "frame_idx", "vec")
  }

  /** Wrap any (id, binary) DataFrame into MediaRows. */
  def fromBinary(df: DataFrame, kind: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, b) => MediaRow(id, kind, b, Map("bytes" -> b.length.toString)) }
  }
}
