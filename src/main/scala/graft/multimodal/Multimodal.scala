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

/** Decoded audio: 16-bit signed PCM samples (interleaved when multi-channel). */
final case class AudioClip(id: Long, sampleRate: Int, channels: Int, samples: Array[Short])

/** Multimodal plumbing for training-data pipelines.
  *
  * ALL three decode paths are REAL: IMAGE via `javax.imageio` (PNG/BMP/JPEG/GIF), AUDIO via
  * `javax.sound.sampled` (WAV/AU/AIFF PCM), and VIDEO via the in-repo RIFF/AVI container codec
  * below — uncompressed 24-bpp DIB frames (`00db`, lossless) and MJPEG frames (`00dc`, each a
  * JPEG decoded through `javax.imageio`). AVI is the RIFF video sibling of PCM WAV: same
  * container family, uncompressed sample payloads, so parsing it needs no out-of-JDK codec.
  * Inter-frame-compressed codecs (H.264 etc.) have no JDK decoder and are out of scope; such
  * payloads fall under the corrupt/undecodable rule. The Spark-side contract is identical for
  * every kind: schemas, `mapPartitions` batching (one decoder init per partition, the JVM
  * analog of a Pandas `mapInPandas` UDF), partition sizing, and the feature-extraction shapes
  * downstream ops consume. Corrupt/undecodable payloads emit no frame (at 10^12-row scale
  * corrupt media is routine; a throwing decoder would kill the stage).
  */
object Multimodal {

  /** sRGB int raster → packed RGB bytes — the one pixel-extraction loop every decode path
    * (image, AVI `..dc`) shares.
    */
  private def imageToRgb(img: java.awt.image.BufferedImage): (Int, Int, Array[Byte]) = {
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
    (w, h, px)
  }

  /** Packed RGB bytes → sRGB raster — shared by every encode path (PNG, AVI MJPEG). */
  private def rgbToImage(w: Int, h: Int, rgb: Array[Byte]): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Decode one image payload to an RGB [[Frame]] (frameIdx 0). None on undecodable bytes. */
  def decodeImageBytes(id: Long, bytes: Array[Byte]): Option[Frame] =
    decodeImageBytes(id, bytes, 0, bytes.length)

  /** Range variant — lets the AVI walk hand a `..dc` frame over without copying it first. */
  private def decodeImageBytes(id: Long, bytes: Array[Byte], off: Int, len: Int): Option[Frame] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes, off, len))
      if (img == null) None
      else {
        val (w, h, px) = imageToRgb(img)
        Some(Frame(id, 0, w, h, 3, px))
      }
    } catch { case _: Exception => None }

  /** Encode an RGB pixel buffer as PNG bytes (lossless — decode(encode(px)) == px). */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"expected ${w * h * 3} RGB bytes, got ${rgb.length}")
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgbToImage(w, h, rgb), "png", out)
    out.toByteArray
  }

  /** Decode one audio payload (WAV/AU/AIFF — any format `javax.sound.sampled` recognizes) to
    * 16-bit signed PCM, preserving sample rate and channel count (non-16-bit / big-endian /
    * float sources are converted through the JDK's codec chain). None on undecodable bytes.
    */
  def decodeWavBytes(id: Long, bytes: Array[Byte]): Option[AudioClip] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val base = in.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        base.getSampleRate, 16, base.getChannels, base.getChannels * 2, base.getSampleRate,
        /* bigEndian = */ false)
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
      val raw = pcm.readAllBytes()
      val samples = new Array[Short](raw.length / 2)
      var i = 0
      while (i < samples.length) {
        samples(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
        i += 1
      }
      Some(AudioClip(id, target.getSampleRate.toInt, target.getChannels, samples))
    } catch { case _: Exception => None }

  /** Encode 16-bit PCM samples as a WAV payload (lossless — decodeWav(encodeWav(s)) == s). */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.length % channels == 0, "sample count must be a multiple of channels")
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, channels,
      /* signed = */ true, /* bigEndian = */ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, (samples.length / channels).toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  // ---- RIFF/AVI video codec (pure JDK, mirrors the WAV path: RIFF container, raw samples) ----

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** One RIFF chunk: fourcc + little-endian size + data (+ pad byte when the size is odd). */
  private def aviChunk(fourcc: String, data: Array[Byte]): Array[Byte] =
    fourcc.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
      (if ((data.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])

  private def aviList(listType: String, contents: Array[Byte]): Array[Byte] =
    aviChunk("LIST", listType.getBytes("US-ASCII") ++ contents)

  /** Encode RGB frames as an AVI payload. `codec = "raw"` writes uncompressed 24-bpp DIB
    * (`00db`) frames — bottom-up BGR rows padded to 4 bytes, LOSSLESS:
    * `decodeAvi(encodeAvi(frames)) == frames`. `codec = "mjpeg"` writes each frame as a JPEG
    * (`00dc`, `javax.imageio` — lossy, so roundtrip preserves dimensions and frame count but
    * not exact bytes). Every frame must be `w*h*3` RGB bytes.
    */
  def encodeAvi(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]], codec: String = "raw"): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0, s"bad AVI geometry: ${w}x$h @ $fps")
    require(codec == "raw" || codec == "mjpeg", s"unsupported AVI codec: $codec")
    frames.foreach(f => require(f.length == w * h * 3, s"expected ${w * h * 3} RGB bytes, got ${f.length}"))
    val mjpeg = codec == "mjpeg"
    val rowSize = (w * 3 + 3) & ~3
    val dibBytes = rowSize * h
    val payloads = frames.map { rgb =>
      if (mjpeg) {
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(rgbToImage(w, h, rgb), "jpg", out)
        out.toByteArray
      } else {
        val b = new Array[Byte](dibBytes)
        var y = 0
        while (y < h) {
          val dstRow = (h - 1 - y) * rowSize // bottom-up
          var x = 0
          while (x < w) {
            val src = (y * w + x) * 3
            val dst = dstRow + x * 3
            b(dst) = rgb(src + 2) // BGR order
            b(dst + 1) = rgb(src + 1)
            b(dst + 2) = rgb(src)
            x += 1
          }
          y += 1
        }
        b
      }
    }
    val bufSize = if (payloads.isEmpty) dibBytes else payloads.map(_.length).max
    val handler = if (mjpeg) "MJPG" else "DIB "
    val biCompression = if (mjpeg) 0x47504a4d /* 'MJPG' LE */ else 0
    val avih = aviChunk("avih", Array.concat(
      le32(1000000 / fps), le32(bufSize * fps), le32(0), le32(0),
      le32(frames.length), le32(0), le32(1), le32(bufSize),
      le32(w), le32(h), le32(0), le32(0), le32(0), le32(0)))
    val strh = aviChunk("strh", Array.concat(
      "vids".getBytes("US-ASCII"), handler.getBytes("US-ASCII"),
      le32(0), le32(0), le32(0), le32(1), le32(fps), le32(0),
      le32(frames.length), le32(bufSize), le32(-1), le32(0),
      Array[Byte](0, 0, 0, 0, (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
        (h & 0xff).toByte, ((h >> 8) & 0xff).toByte))) // rcFrame = (0, 0, w, h)
    val strf = aviChunk("strf", Array.concat(
      le32(40), le32(w), le32(h),
      Array[Byte](1, 0, 24, 0), // biPlanes = 1, biBitCount = 24
      le32(biCompression), le32(dibBytes), le32(0), le32(0), le32(0), le32(0)))
    val hdrl = aviList("hdrl", avih ++ aviList("strl", strh ++ strf))
    val movi = aviList("movi",
      Array.concat(payloads.map(p => aviChunk(if (mjpeg) "00dc" else "00db", p)): _*))
    val contents = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(contents.length) ++ contents
  }

  /** Decode an AVI payload to RGB [[Frame]]s: a RIFF chunk walk that reads the `vids` stream's
    * BITMAPINFOHEADER for geometry, then converts each `..db` chunk (uncompressed bottom-up or
    * top-down 24-bpp DIB) directly and hands each `..dc` chunk (per-frame compressed, e.g.
    * MJPEG) to `javax.imageio`. Undecodable/corrupt payloads — including inter-frame codecs the
    * JDK cannot decode — return no frames rather than throwing (decodable frames found before
    * a torn tail are kept).
    */
  def decodeAviBytes(id: Long, bytes: Array[Byte]): Seq[Frame] = {
    // frames lives OUTSIDE the try: a mid-stream exception (bit-rotted JPEG chunk, hostile
    // declared size) keeps everything decoded before it, per the contract above.
    val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
    try {
      if (bytes.length >= 12 && new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "AVI ") {
        val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fourcc(off: Int) = new String(bytes, off, 4, "US-ASCII")
        var w = 0; var hSigned = 0; var bpp = 0; var lastStrhVids = false
        def walk(start: Int, end: Int, depth: Int): Unit = {
          // depth cap: a real AVI nests RIFF→hdrl/movi→strl (~3 levels); a hostile payload of
          // thousands of nested 12-byte LIST headers would otherwise StackOverflowError — an
          // Error the catch below (deliberately Exception-only) does not swallow
          if (depth > 16) return
          var off = start
          var ok = true
          while (ok && off + 8 <= end) {
            val cc = fourcc(off)
            val sz = bb.getInt(off + 4)
            // long arithmetic throughout: a hostile sz near Int.MaxValue must not wrap the
            // torn-leaf check or the chunk advance into a negative offset
            val next = off.toLong + 8 + sz + (sz & 1)
            if (sz < 0) ok = false
            else if (cc == "RIFF" || cc == "LIST") {
              // tolerate a truncated list (torn tail): decode the whole children it still holds
              if (sz >= 4 && off + 12 <= end)
                walk(off + 12, math.min(off.toLong + 8 + sz, end.toLong).toInt, depth + 1)
              if (next > end) ok = false else off = next.toInt
            } else if (off.toLong + 8 + sz > end) ok = false // torn leaf chunk: keep frames so far
            else {
              cc match {
                case "strh" if sz >= 4 => lastStrhVids = fourcc(off + 8) == "vids"
                case "strf" if lastStrhVids && sz >= 40 =>
                  w = bb.getInt(off + 12); hSigned = bb.getInt(off + 16)
                  bpp = bb.getShort(off + 22) & 0xffff
                case c if c.endsWith("db") && w > 0 && bpp == 24 =>
                  val h = math.abs(hSigned) // Int.MinValue stays negative → rejected below
                  val rowSizeL = (w.toLong * 3 + 3) & ~3L
                  // h > 0 rejects the degenerate biHeight=0 header that would otherwise emit an
                  // empty Frame and crash downstream resize. Guard ORDER matters: w.toLong*h is
                  // ≤ 2^62 (no wrap), and once area ≤ Int.MaxValue/3 holds, rowSizeL*h ≤
                  // 3·area + 6·h ≤ ~6.4e9 — so neither product can overflow Long the way
                  // rowSizeL*h alone would for w,h near 2^31
                  if (h > 0 && w.toLong * h <= Int.MaxValue / 3 && rowSizeL * h <= sz) {
                    val rowSize = rowSizeL.toInt
                    val px = new Array[Byte](w * h * 3)
                    var y = 0
                    while (y < h) {
                      val srcRow = off + 8 + (if (hSigned > 0) h - 1 - y else y) * rowSize
                      var x = 0
                      while (x < w) {
                        val dst = (y * w + x) * 3
                        px(dst) = bytes(srcRow + x * 3 + 2) // BGR → RGB
                        px(dst + 1) = bytes(srcRow + x * 3 + 1)
                        px(dst + 2) = bytes(srcRow + x * 3)
                        x += 1
                      }
                      y += 1
                    }
                    frames += Frame(id, frames.size, w, h, 3, px)
                  }
                case c if c.endsWith("dc") && sz > 0 =>
                  // the range variant guards each compressed frame individually (one rotten JPEG
                  // chunk is skipped, not fatal to the frames around it) without copying it
                  decodeImageBytes(id, bytes, off + 8, sz)
                    .foreach(f => frames += f.copy(frameIdx = frames.size))
                case _ => () // unknown chunk (idx1, junk, audio stream): skip
              }
              if (next > end) ok = false else off = next.toInt // chunks are word-aligned
            }
          }
        }
        walk(12, bytes.length, 0)
      }
    } catch { case _: Exception => () } // torn mid-walk: keep the frames decoded so far
    frames.toSeq
  }

  /** Frame decoder, routed by `kind`:
    *  - `image` → REAL javax.imageio decode, one RGB frame per payload (undecodable → 0 frames);
    *  - `audio` → REAL javax.sound.sampled decode to 16-bit PCM, windowed into up to
    *    `frameCount` equal sample windows: width = window length in samples, height = 1,
    *    channels = audio channels, pixels = little-endian PCM bytes (undecodable → 0 frames);
    *  - `video` → REAL RIFF/AVI decode ([[decodeAviBytes]]: uncompressed-DIB and MJPEG
    *    streams), one RGB frame per container frame — `frameCount` does not apply (use
    *    [[sampleFrames]] for stride sampling); undecodable/non-AVI payloads → 0 frames.
    */
  def decodeFrames(ds: Dataset[MediaRow], frameCount: Int = 4): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decoder init (once, not per row): no disk-backed ImageIO scratch cache —
      // executor-local tmp on a busy node is a straggler source, and frames fit in memory
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap {
        case m if m.kind == "image" => decodeImageBytes(m.id, m.payload).iterator
        case m if m.kind == "audio" =>
          decodeWavBytes(m.id, m.payload).iterator.flatMap { clip =>
            // window in whole AUDIO FRAMES (one sample per channel), never splitting an
            // interleaved channel group: width = frames per window, so the Frame contract
            // pixels.length == width × height × channels × 2 holds like it does for images
            val ch = math.max(1, clip.channels)
            val audioFrames = clip.samples.length / ch
            val perWindow = math.max(1, (audioFrames + frameCount - 1) / math.max(1, frameCount))
            // trim to whole channel groups FIRST: a malformed stream whose PCM byte count isn't
            // frame-aligned would otherwise give the last window a length not divisible by ch,
            // breaking the pixels.length == width*height*channels*2 contract
            val aligned =
              if (clip.samples.length == audioFrames * ch) clip.samples
              else clip.samples.take(audioFrames * ch)
            aligned.grouped(perWindow * ch).zipWithIndex.map { case (w, i) =>
              val b = new Array[Byte](w.length * 2)
              var j = 0
              while (j < w.length) {
                b(2 * j) = (w(j) & 0xff).toByte
                b(2 * j + 1) = ((w(j) >> 8) & 0xff).toByte
                j += 1
              }
              Frame(m.id, i, w.length / ch, 1, clip.channels, b)
            }
          }
        case m => decodeAviBytes(m.id, m.payload).iterator // real RIFF/AVI (DIB + MJPEG)
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
