package graft.planner

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Pluggable per-cell score aggregate (the reference's ScoreFunction extension point) reproduces
  * brute force under arbitrary custom aggregates.
  */
class BrsPlannerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rowsDF(rnd: scala.util.Random, n: Int, extent: Int) = {
    import spark.implicits._
    (1 to n).map { _ =>
      (rnd.nextInt(extent), rnd.nextInt(extent), 1 + rnd.nextInt(9), s"k${rnd.nextInt(5)}")
    }.toDF("x", "y", "v", "kw")
  }

  test("custom cell scores (sum, log-sum, distinct) match brute force") {
    val rnd = new scala.util.Random(11)
    val cfg = GridConfig(sourceBuckets = 16, nodeSide = 4, regionW = 2)
    val scores: Seq[(String, CellScore, org.apache.spark.sql.DataFrame => Seq[Cell])] = Seq(
      ("sum", CellScore.sum("v"),
        df => df.groupBy("x", "y").agg(sum("v").cast("double").as("s"))
          .collect().map(r => Cell(r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq),
      // custom non-built-in aggregate; integer-valued in double, so both summation orders agree
      // exactly (a transcendental like log1p makes greedy near-ties order-dependent)
      ("weighted", CellScore.of(sum(col("v") * col("v") + lit(1)).cast("double")),
        df => df.groupBy("x", "y").agg(sum(col("v") * col("v") + lit(1)).cast("double").as("s"))
          .collect().map(r => Cell(r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq),
      ("distinct-kw", CellScore.countDistinct("kw"),
        df => df.groupBy("x", "y").agg(countDistinct("kw").cast("double").as("s"))
          .collect().map(r => Cell(r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq))
    for (trial <- 1 to 8; (name, score, oracleCells) <- scores) {
      val df = rowsDF(rnd, 40 + rnd.nextInt(200), extent = 12)
      val got = BrsPlanner.topRegions(df, "x", "y", cfg, k = 4, score = score)
      val want = RegionKernel.bruteForceTopK(oracleCells(df), w = 2, k = 4, overlapAllowed = false)
      // FP-summation order differs between the distributed agg and the local oracle → compare
      // anchors exactly, scores to 1e-9
      assert(got.map(r => (r.x, r.y)) === want.map(r => (r.x, r.y)), s"trial=$trial score=$name")
      got.zip(want).foreach { case (g, w2) =>
        assert(math.abs(g.score - w2.score) < 1e-9, s"trial=$trial score=$name") }
    }
  }
}
