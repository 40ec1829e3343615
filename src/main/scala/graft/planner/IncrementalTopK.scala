package graft.planner

/** Cached per-node kernel results carried between maintenance cycles.
  * @param kPrime      the K′ the cached results were computed at (exhausted nodes are valid for
  *                    any K′; truncated ones only up to this)
  * @param baseVersion table version the cache reflects
  */
final case class PlannerState(kPrime: Int, baseVersion: Long, nodes: Map[Int, NodeResult])

/** Incremental distributed top-k — the reference's partial-recompute optimization (algo 6,
  * `/root/reference/src/main/scala/SDL/distrib/OnestepAlgoReduceHybridOpt.scala:22-90`): per-node
  * results are cached across cycles; only nodes whose cells changed (files added/removed) are
  * re-run, the rest reuse cached candidates (the reference's `filter ∪ union` on untouched
  * partitions, F5/P8).
  */
object IncrementalTopK {

  /** @param runNodes (nodesToCompute, kPrime) → fresh results for exactly those nodes — OR,
    *                  when the runner pre-merged on executors (driver-funnel gate), partials
    *                  under SYNTHETIC ids outside `allNodes`: a partial is a valid NodeResult
    *                  in the merge algebra ([[RegionKernel.preMerge]]) but cannot be attributed
    *                  to one node, so it is never cached — within rounds or across cycles
    * @param allNodes    every node with ≥1 occupied cell in the CURRENT state
    * @param dirty       nodes whose cell contents changed since `prev` was computed
    * @param baseVersion version the NEW state will reflect
    * @return (winners, state to cache for the next cycle)
    */
  def solve(
      runNodes: (Set[Int], Int) => Map[Int, NodeResult],
      allNodes: Set[Int],
      dirty: Set[Int],
      prev: Option[PlannerState],
      baseVersion: Long,
      k: Int,
      overlapAllowed: Boolean,
      sigma: Option[Double] = None,
      maxRounds: Int = 8): (Vector[Region], PlannerState) = {

    val prevNodes = prev.map(_.nodes).getOrElse(Map.empty)
    var kPrime = math.max(math.max(k, 4), prev.map(_.kPrime).getOrElse(0))
    // reusable cached results: clean nodes that still exist, computed at a K′ we won't exceed in
    // round 1 — truncated (non-exhausted) caches are only valid if their kPrime matches ours
    def reusable(kp: Int): Map[Int, NodeResult] =
      prevNodes.filter { case (n, r) =>
        allNodes.contains(n) && !dirty.contains(n) && (r.exhausted || prev.exists(_.kPrime >= kp))
      }

    var cache = reusable(kPrime)
    var toRun = allNodes.diff(cache.keySet)
    var state = Map.empty[Int, NodeResult]
    var round = 0
    var answer = Vector.empty[Region]
    var done = false
    while (!done && round < maxRounds) {
      val fresh = if (toRun.nonEmpty) runNodes(toRun, kPrime) else Map.empty[Int, NodeResult]
      state = cache ++ fresh
      val (acc, complete) = RegionKernel.mergeTopK(state.values.toSeq, k, overlapAllowed, sigma)
      answer = acc
      done = complete
      if (!done) {
        kPrime *= 4
        // higher K′ invalidates every truncated result, cached or fresh; pre-merged partials
        // (synthetic ids ∉ allNodes) are transient — carrying one into the next round while
        // re-running its source nodes would double-count their candidates
        cache = state.filter { case (n, r) => r.exhausted && allNodes.contains(n) }
        toRun = allNodes.diff(cache.keySet)
        round += 1
      }
    }
    if (!done) {
      val fresh = runNodes(allNodes.diff(cache.keySet), Int.MaxValue)
      state = cache ++ fresh
      answer = RegionKernel.mergeTopK(state.values.toSeq, k, overlapAllowed, sigma)._1
      kPrime = Int.MaxValue
    }
    // synthetic (pre-merged) entries are not per-node facts — persisting them would let a later
    // cycle treat a fold of many nodes as one node's cache; those nodes simply recompute next time
    (answer, PlannerState(kPrime, baseVersion, state.filter(e => allNodes.contains(e._1))))
  }
}
