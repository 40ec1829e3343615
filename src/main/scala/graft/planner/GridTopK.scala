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

  /** Replicated-cell count at or below which the whole top-k runs ON THE DRIVER after one
    * collect (guide §2.4: remove shuffles outright). The planner's input is metadata (one cell
    * per file / grid bucket), so small problems — every bench-scale plan, and most steady-state
    * maintenance cycles — were paying 3+ Spark jobs (persist, count, groupByKey shuffle per K′
    * round) of pure scheduling overhead for a few hundred rows. 2^16 Cells ≈ 2 MB of driver
    * heap; bigger inputs keep the distributed path unchanged.
    */
  val DriverLocalMaxRows: Long = 1L << 16

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
      val n = keyed.count() // also materializes the cache once
      if (n <= DriverLocalMaxRows) {
        // ONE collect, then every K′ round is plain driver arithmetic — zero further jobs
        return solveKeyedLocal(keyed.collect(), cfg, k, overlapAllowed, sigma)
      }
      val usePremerge = n > preMergeMinRows
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

  /** The driver-local small-problem path shared by [[solve]] and the metadata planner
    * ([[graft.ops.MaintenancePlanner.topRegions]]): identical K′-round/merge algebra
    * ([[DistributedTopK.solve]]), with per-node kernels as plain loops over the already-resident
    * replicated cells.
    */
  def solveKeyedLocal(
      keyed: Iterable[(Int, Cell)],
      cfg: GridConfig,
      k: Int,
      overlapAllowed: Boolean,
      sigma: Option[Double] = None): Vector[Region] = {
    val byNode = keyed.groupBy(_._1)
    def localRound(kPrime: Int): Seq[NodeResult] = byNode.iterator.map { case (node, cs) =>
      val (ax0, ax1, ay0, ay1) = cfg.anchorBounds(node)
      RegionKernel.localTopK(cs.iterator.map(_._2).toSeq, ax0, ax1, ay0, ay1,
        cfg.regionW, kPrime)
    }.toSeq
    DistributedTopK.solve(localRound, k, overlapAllowed, sigma = sigma)
  }
}
