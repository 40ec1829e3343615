package graft.planner

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** The reference's documented extension point (`/root/reference/src/main/scala/SDL/score/
  * ScoreFunction.java:8-10`, README.md:13): a pluggable aggregate mapping a cell's rows to its
  * score. The region score is the SUM of cell scores over the w×w window — additivity (monotone
  * in the cell set) is exactly what the kernel's prefix sums and the merge's maxMin completeness
  * bound require, so any aggregate expression plugs in without touching either.
  */
trait CellScore extends Serializable {
  /** Aggregate expression evaluated per grid cell (the rows grouped into that cell). */
  def expr: Column
}

object CellScore {
  /** ScoreFunctionCount (`score/ScoreFunctionCount.java`). */
  val count: CellScore = new CellScore { def expr: Column = F.count(F.lit(1)).cast("double") }
  /** ScoreFunctionTotalScore (`score/ScoreFunctionTotalScore.java`). */
  def sum(c: String): CellScore = new CellScore { def expr: Column = F.sum(F.col(c)).cast("double") }
  /** The reference's stubbed distinct-keywords score. */
  def countDistinct(c: String): CellScore =
    new CellScore { def expr: Column = F.countDistinct(F.col(c)).cast("double") }
  /** Any custom aggregate — the user-extensible hook. */
  def of(c: Column): CellScore = new CellScore { def expr: Column = c }
}

/** User-facing discrete planner entry: rows → per-cell pluggable aggregate → distributed
  * border-replicated top-k regions.
  */
object BrsPlanner {

  def topRegions(
      df: DataFrame,
      xCol: String,
      yCol: String,
      cfg: GridConfig,
      k: Int,
      score: CellScore = CellScore.count,
      overlapAllowed: Boolean = false,
      sigma: Option[Double] = None): Vector[Region] = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .groupBy(F.col(xCol).cast("int").as("x"), F.col(yCol).cast("int").as("y"))
      .agg(score.expr.cast("double").as("s"))
      .as[(Int, Int, Double)].map { case (x, y, s) => Cell(x, y, s) }
    GridTopK.solve(spark, cells, cfg, k, overlapAllowed, sigma)
  }
}
