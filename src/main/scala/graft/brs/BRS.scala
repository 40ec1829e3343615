package graft.brs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Node geometry for continuous BRS: eps-sized cells, nodeSide×nodeSide cells per planner node.
  * Long-packed node ids; border replication to the ≤4 nodes whose anchors can cover a point —
  * the continuous twin of the discrete [[graft.planner.GridConfig]] (reference
  * `GridIndexer.getNodeIndex`, `/root/reference/src/main/scala/SDL/distrib/GridIndexer.scala:21-35`).
  */
final case class GeoGrid(minX: Double, minY: Double, eps: Double, nodeSide: Int) {
  def cellX(x: Double): Int = math.max(0, ((x - minX) / eps).toInt)
  def cellY(y: Double): Int = math.max(0, ((y - minY) / eps).toInt)
  def nodeOfCell(cx: Int, cy: Int): Long =
    ((cx / nodeSide).toLong << 32) | ((cy / nodeSide).toLong & 0xffffffffL)
  def nodesForPoint(x: Double, y: Double): Seq[Long] = {
    val cx = cellX(x); val cy = cellY(y)
    (for {
      ax <- Seq(math.max(0, cx - 1), cx).distinct
      ay <- Seq(math.max(0, cy - 1), cy).distinct
    } yield nodeOfCell(ax, ay)).distinct
  }
  /** Owned anchor box of a node: [ax0, ax1) × [ay0, ay1) in coordinate space. */
  def anchorBox(node: Long): (Double, Double, Double, Double) = {
    val bx = (node >> 32).toInt
    val by = (node & 0xffffffffL).toInt
    val side = nodeSide * eps
    (minX + bx * side, minX + (bx + 1) * side, minY + by * side, minY + (by + 1) * side)
  }
}

/** The reference's end-to-end query (`/root/reference/src/main/scala/SDL/main/Run.scala:22-189`)
  * as one library call: filters → bbox → border-replicated shuffle → exact per-node kernel →
  * thresholded merge → ranked centers.
  */
object BRS {

  /** @param keywordFilters (column, accepted-values) pairs; a row passes when its `;`-separated
    *                       column intersects the accepted list (reference F2, `Run.scala:73-87`)
    * @param distinct       non-overlapping winners (the reference's dist=true)
    * @return rank, center_lon, center_lat, score — the reference's output shape (S4)
    */
  def bestRegions(
      df: DataFrame,
      eps: Double,
      k: Int,
      lonCol: String = "lon",
      latCol: String = "lat",
      scoreCol: Option[String] = None,
      keywordFilters: Seq[(String, Seq[String])] = Nil,
      distinct: Boolean = true,
      nodeSide: Int = 8,
      maxRounds: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    var rows = df.filter(col(lonCol).isNotNull && col(latCol).isNotNull)
    keywordFilters.foreach { case (c, kws) =>
      rows = rows.filter(arrays_overlap(split(col(c), ";"), array(kws.map(lit): _*)))
    }
    val w: Column = scoreCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    scoreCol.foreach(c => rows = rows.filter(col(c).isNotNull))
    val pts = rows.select(col(lonCol).cast("double"), col(latCol).cast("double"), w)
      .as[(Double, Double, Double)].map { case (x, y, s) => Pt(x, y, s) }

    val bbox = pts.agg(min("x"), min("y"), count(lit(1))).head()
    if (bbox.getLong(2) == 0L)
      return Seq.empty[(Int, Double, Double, Double)]
        .toDF("rank", "center_lon", "center_lat", "score")
    val grid = GeoGrid(bbox.getDouble(0), bbox.getDouble(1), eps, nodeSide)

    val keyed = pts.flatMap(p => grid.nodesForPoint(p.x, p.y).map(n => (n, p)))
      .toDF("node", "pt").persist()
    try {
      // STREAMING per-node kernel: repartition by node + secondary sort on x, then one pass with
      // an eps-strip window — per-task memory is O(strip), not O(node) (r01 materialized whole
      // nodes: the reference's documented hot-node OOM). Nodes whose previous round was EXHAUSTED
      // already emitted every candidate — their results are valid at any K′ and are not re-run.
      def runRound(kPrime: Int, cached: Map[Long, GeoNodeResult]): Map[Long, GeoNodeResult] = {
        val skip = spark.sparkContext.broadcast(cached.keySet)
        val fresh = keyed
          .as[(Long, Pt)]
          .filter(kv => !skip.value.contains(kv._1))
          .toDF("node", "pt")
          .repartition(col("node"))
          .sortWithinPartitions(col("node"), col("pt.x"))
          .as[(Long, Pt)]
          .mapPartitions { it =>
            val buf = it.buffered
            new Iterator[(Long, GeoNodeResult)] {
              def hasNext: Boolean = buf.hasNext
              def next(): (Long, GeoNodeResult) = {
                val node = buf.head._1
                val run = new Iterator[Pt] {
                  def hasNext: Boolean = buf.hasNext && buf.head._1 == node
                  def next(): Pt = buf.next()._2
                }
                val (ax0, ax1, ay0, ay1) = grid.anchorBox(node)
                val r = GeoBrsKernel.localTopKStreaming(run, eps, kPrime, ax0, ax1, ay0, ay1)
                while (run.hasNext) run.next() // kernel drains, but never trust an invariant twice
                (node, r)
              }
            }
          }
          .collect().toMap
        cached ++ fresh
      }

      var kPrime = math.max(k, 4)
      var round = 0
      var answer = Vector.empty[GeoRegion]
      var done = false
      var cache = Map.empty[Long, GeoNodeResult]
      while (!done && round < maxRounds) {
        val results = runRound(kPrime, cache)
        val (acc, complete) = GeoBrsKernel.mergeTopK(results.values.toSeq, k, overlapAllowed = !distinct)
        answer = acc; done = complete
        cache = results.filter(_._2.exhausted) // complete at any K′ — carried to the next round
        kPrime *= 4; round += 1
      }
      if (!done)
        answer = GeoBrsKernel.mergeTopK(
          runRound(Int.MaxValue, cache).values.toSeq, k, overlapAllowed = !distinct)._1

      answer.zipWithIndex.map { case (r, i) =>
        (i + 1, r.centerX, r.centerY, r.score)
      }.toDF("rank", "center_lon", "center_lat", "score")
    } finally { keyed.unpersist(); () }
  }

  /** Render a [[bestRegions]] result in the reference's exact REST/S4 output shape — the cached
    * answer format in `/root/reference/executable/buffer.tmp`:
    * `[\n{\n"rank":1,\n"center":[lon,lat],\n"score":25\n},…]` (integral scores unadorned).
    * The reference's input tables live in a remote Proteus DB (credentials scrubbed from
    * conf.txt), so its golden answers can't be re-derived — the output CONTRACT is what we pin.
    */
  def renderJson(df: DataFrame): String = {
    val rows = df.orderBy(col("rank")).collect()
    rows.map { r =>
      val sc = r.getAs[Double]("score")
      val s = if (sc == math.floor(sc) && !sc.isInfinite) sc.toLong.toString else sc.toString
      "{\n\"rank\":" + r.getAs[Int]("rank") +
        ",\n\"center\":[" + r.getAs[Double]("center_lon") + "," + r.getAs[Double]("center_lat") +
        "],\n\"score\":" + s + "\n}"
    }.mkString("[\n", ",\n", "\n]")
  }
}
