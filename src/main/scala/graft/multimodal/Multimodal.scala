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

/** Multimodal plumbing for training-data pipelines. The DECODERS ARE STUBS — image/audio codecs
  * are not in this container — implemented as deterministic pseudo-decodes so the Spark-side
  * contract is real and testable: schemas, `mapPartitions` batching (one decoder init per
  * partition, the JVM analog of a Pandas `mapInPandas` UDF), partition sizing, and the
  * feature-extraction shapes downstream ops consume.
  */
object Multimodal {

  /** STUB decoder: deterministic bytes → "frames". A real impl would initialize a codec per
    * partition and stream frames; the iterator/batch shape here is exactly that contract.
    */
  def decodeFrames(ds: Dataset[MediaRow], frameCount: Int = 4): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition "decoder init" happens here (once, not per row)
      rows.flatMap { m =>
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

  /** STUB resize: nearest-neighbor over the fake pixel buffer — correct output shape and
    * deterministic content, real partition-parallel structure.
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

  /** Feature extraction STUB: per-frame byte-histogram moments as a fixed-width Float vector —
    * the `Array[Float]` embedding shape the Similarity ops consume.
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
