package graft.planner

import org.scalatest.funsuite.AnyFunSuite

/** Incremental (cached, dirty-node-only) planning must equal full replanning after arbitrary
  * mutations — the reference algo-6 partial-recompute semantics, property-tested.
  */
class IncrementalTopKSpec extends AnyFunSuite {

  private def nodesRunner(cells: Seq[Cell], cfg: GridConfig): (Set[Int], Int) => Map[Int, NodeResult] =
    (nodes, kPrime) =>
      cells.flatMap(c => cfg.nodesForCell(c.x, c.y).filter(nodes.contains).map(n => (n, c)))
        .groupBy(_._1).map { case (node, cs) =>
          val (ax0, ax1, ay0, ay1) = cfg.anchorBounds(node)
          node -> RegionKernel.localTopK(cs.map(_._2), ax0, ax1, ay0, ay1, cfg.regionW, kPrime)
        }

  private def allNodes(cells: Seq[Cell], cfg: GridConfig): Set[Int] =
    cells.flatMap(c => cfg.nodesForCell(c.x, c.y)).toSet

  test("incremental == full replan across random mutation sequences") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 60) {
      val cfg = GridConfig(sourceBuckets = 64, nodeSide = 4 + rnd.nextInt(8), regionW = 1 + rnd.nextInt(2) * 1 + 1)
      val k = 1 + rnd.nextInt(6)
      var cells = Vector.fill(30 + rnd.nextInt(60))(
        Cell(rnd.nextInt(40), rnd.nextInt(40), 1.0 + rnd.nextInt(9)))
      var prev: Option[PlannerState] = None
      var version = 0L
      for (step <- 1 to 4) {
        // mutate: add some cells, remove some — dirty nodes = nodes of both
        val added = Vector.fill(rnd.nextInt(15))(Cell(rnd.nextInt(40), rnd.nextInt(40), 1.0 + rnd.nextInt(9)))
        val removed = if (cells.nonEmpty) cells.take(rnd.nextInt(math.min(8, cells.size))) else Vector.empty
        cells = cells.drop(removed.size) ++ added
        version += 1
        val dirty = allNodes(added ++ removed, cfg)

        val (inc, newState) = IncrementalTopK.solve(
          nodesRunner(cells, cfg), allNodes(cells, cfg), dirty, prev, version, k,
          overlapAllowed = false)
        val (full, _) = IncrementalTopK.solve(
          nodesRunner(cells, cfg), allNodes(cells, cfg), allNodes(cells, cfg), None, version, k,
          overlapAllowed = false)
        val brute = RegionKernel.bruteForceTopK(cells, cfg.regionW, k, overlapAllowed = false)
        assert(inc === full, s"trial=$trial step=$step (inc vs full)")
        assert(inc === brute, s"trial=$trial step=$step (inc vs brute)")
        prev = Some(newState)
      }
    }
  }
}
