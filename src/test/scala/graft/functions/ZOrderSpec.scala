package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {

  /** Naive bit-by-bit interleave, the definitional oracle. */
  private def naiveInterleave(x: Int, y: Int): Long = {
    var z = 0L
    for (i <- 0 until 32) {
      z |= ((x.toLong >> i) & 1L) << (2 * i)
      z |= ((y.toLong >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave matches the naive definition") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val x = rnd.nextInt(Int.MaxValue)
      val y = rnd.nextInt(Int.MaxValue)
      assert(ZOrder.interleave(x, y) === naiveInterleave(x, y))
    }
    assert(ZOrder.interleave(0, 0) === 0L)
    assert(ZOrder.interleave(1, 0) === 1L)
    assert(ZOrder.interleave(0, 1) === 2L)
  }

  test("z-order is monotone in each coordinate holding the other fixed") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val x = rnd.nextInt(1 << 20); val y = rnd.nextInt(1 << 20); val d = 1 + rnd.nextInt(100)
      assert(ZOrder.interleave(x, y) < ZOrder.interleave(x + d, y))
      assert(ZOrder.interleave(x, y) < ZOrder.interleave(x, y + d))
    }
  }

  test("hilbert is a bijection on the 16x16 grid") {
    val ds = for { x <- 0 until 16; y <- 0 until 16 } yield ZOrder.hilbert(4, x, y)
    assert(ds.toSet.size === 256)
    assert(ds.min === 0L)
    assert(ds.max === 255L)
  }

  test("hilbert consecutive indices are grid-adjacent (locality property)") {
    val byD = (for { x <- 0 until 32; y <- 0 until 32 } yield (ZOrder.hilbert(5, x, y), (x, y)))
      .sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1)
    }
  }

  test("expressions evaluate inside a DataFrame and match the scala functions") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((3, 5), (0, 0), (1023, 4095), (65535, 1)).toDF("x", "y")
      .select(col("x"), col("y"),
        curve.zorderKey(col("x"), col("y")).as("z"),
        curve.hilbertKey(col("x"), col("y"), 16).as("h"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === ZOrder.interleave(r.getInt(0), r.getInt(1)))
      assert(r.getLong(3) === ZOrder.hilbert(16, r.getInt(0), r.getInt(1)))
    }
  }
}
