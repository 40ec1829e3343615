package graft.planner

import org.scalatest.funsuite.AnyFunSuite

class GridConfigSpec extends AnyFunSuite {

  test("border replication covers exactly the nodes owning anchors whose window covers the cell") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 500) {
      val w = 1 + rnd.nextInt(4)
      val cfg = GridConfig(sourceBuckets = 64, nodeSide = math.max(w, 1 + rnd.nextInt(16)), regionW = w)
      val x = rnd.nextInt(64); val y = rnd.nextInt(200)
      val got = cfg.nodesForCell(x, y).toSet
      val want = (for {
        ax <- math.max(0, x - w + 1) to x
        ay <- math.max(0, y - w + 1) to y
      } yield cfg.nodeOf(ax, ay)).toSet
      assert(got === want, s"w=$w nodeSide=${cfg.nodeSide} cell=($x,$y)")
      assert(got.size <= 4)
    }
  }

  test("anchorBounds is the inverse of nodeOf") {
    val cfg = GridConfig(sourceBuckets = 64, nodeSide = 8, regionW = 2)
    for (x <- 0 until 64; y <- 0 until 64) {
      val n = cfg.nodeOf(x, y)
      val (ax0, ax1, ay0, ay1) = cfg.anchorBounds(n)
      assert(x >= ax0 && x <= ax1 && y >= ay0 && y <= ay1)
    }
  }

  test("sourceBucket matches Spark's xxhash64 pmod") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cfg = GridConfig(sourceBuckets = 64)
    val srcs = (0 until 50).map(i => s"src$i")
    val fromSpark = srcs.toDF("s")
      .select(pmod(xxhash64(col("s")), lit(64L)).cast("int")).as[Int].collect()
    assert(fromSpark.toSeq === srcs.map(cfg.sourceBucket))
  }
}
