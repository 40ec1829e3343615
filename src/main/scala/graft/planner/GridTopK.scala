package graft.planner

import org.apache.spark.sql.{Dataset, SparkSession}

/** Spark-backed distributed top-k regions over an arbitrary cell Dataset: border replication →
  * per-node kernel (`flatMapGroups`-style) → completeness-thresholded merge, multi-round on K′.
  * This is the whole reference pipeline (algo 0/2 family,
  * `/root/reference/src/main/scala/SDL/distrib/NstepAlgo.scala:23-57`) as one reusable function.
  */
object GridTopK {

  def solve(
      spark: SparkSession,
      cells: Dataset[Cell],
      cfg: GridConfig,
      k: Int,
      overlapAllowed: Boolean,
      sigma: Option[Double] = None): Vector[Region] = {
    import spark.implicits._
    val keyed = cells
      .flatMap(c => cfg.nodesForCell(c.x, c.y).map(n => (n, c)))
      .persist()
    try {
      def runRound(kPrime: Int): Seq[NodeResult] =
        keyed.groupByKey(_._1)
          .mapGroups { (node, it) =>
            val (ax0, ax1, ay0, ay1) = cfg.anchorBounds(node)
            RegionKernel.localTopK(it.map(_._2).toSeq, ax0, ax1, ay0, ay1, cfg.regionW, kPrime)
          }
          .collect().toSeq
      DistributedTopK.solve(runRound, k, overlapAllowed, sigma = sigma)
    } finally { keyed.unpersist(); () }
  }
}
