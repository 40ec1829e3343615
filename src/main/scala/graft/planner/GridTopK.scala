package graft.planner

import org.apache.spark.sql.{Dataset, SparkSession}

/** Spark-backed distributed top-k regions over an arbitrary cell Dataset: border replication →
  * per-node kernel (`flatMapGroups`-style) → completeness-thresholded merge, multi-round on K′.
  * This is the whole reference pipeline (algo 0/2 family,
  * `/root/reference/src/main/scala/SDL/distrib/NstepAlgo.scala:23-57`) as one reusable function.
  */
object GridTopK {

  /** Replicated-cell count above which per-node results are folded on executors before the
    * collect — shared by [[solve]] and the incremental planner's runNodes gates.
    */
  val PreMergeMinRows: Long = 200000L

  /** @param preMergeMinRows replicated-cell count above which per-node results are folded into
    *   one partial per Spark partition on EXECUTORS before the collect ([[RegionKernel
    *   .preMerge]], reference P7) — node count grows with `ntokBins × sourceBuckets / nodeSide²`
    *   and a 10^8-cell planner grid must not funnel #nodes × K′ candidates through the driver.
    *   Row count is the gate (a cheap count on the already-persisted relation, and a sound
    *   proxy: driver payload ≤ replicated rows); small grids keep the direct collect.
    */
  def solve(
      spark: SparkSession,
      cells: Dataset[Cell],
      cfg: GridConfig,
      k: Int,
      overlapAllowed: Boolean,
      sigma: Option[Double] = None,
      preMergeMinRows: Long = PreMergeMinRows): Vector[Region] = {
    import spark.implicits._
    val keyed = cells
      .flatMap(c => cfg.nodesForCell(c.x, c.y).map(n => (n, c)))
      .persist()
    try {
      val usePremerge = keyed.count() > preMergeMinRows // also materializes the cache once
      def runRound(kPrime: Int): Seq[NodeResult] = {
        val perNode = keyed.groupByKey(_._1)
          .mapGroups { (node, it) =>
            val (ax0, ax1, ay0, ay1) = cfg.anchorBounds(node)
            RegionKernel.localTopK(it.map(_._2).toSeq, ax0, ax1, ay0, ay1, cfg.regionW, kPrime)
          }
        if (usePremerge) {
          // keep what one node would keep (K′, bounded so the Int.MaxValue fallback round
          // can't size an executor buffer by it)
          val m = math.min(math.max(kPrime, k), 1 << 20)
          perNode.mapPartitions(rs => Iterator.single(RegionKernel.preMerge(rs, m)))
            .collect().toSeq
        } else perNode.collect().toSeq
      }
      DistributedTopK.solve(runRound, k, overlapAllowed, sigma = sigma)
    } finally { keyed.unpersist(); () }
  }
}
