package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.planner._
import graft.table.FileMeta

/** A planned maintenance task: one winning grid region and the live files it claims. */
final case class PlannedTask(taskId: Int, region: Region, filePaths: Seq[String], score: Double)

/** The BRS-planner: positions every live data file on the (sourceBucket × ntokBin) grid, scores
  * cells by fragmentation, and finds the top-k non-overlapping w×w regions with the reference's
  * partition-parallel protocol — border replication (`Generic.poiToKeyValue`,
  * `/root/reference/src/main/scala/SDL/Generic.scala:28-37`) + per-node kernel after `groupByKey`
  * (`/root/reference/src/main/scala/SDL/distrib/OnestepAlgoReduce.scala:23-48`) + completeness-
  * thresholded merge — re-expressed as typed Dataset ops.
  *
  * Scale note: the planner's input is MANIFEST METADATA (one row per data file), not data rows.
  * At 10^12 sequences / ~10^7 files the cell dataset is ~10^7 rows — a trivially distributed
  * aggregation — while the data itself is never touched until a task executes. This inversion
  * (planner on metadata, executor on data) is what makes the design hold at 100 TB.
  */
object MaintenancePlanner {

  /** Weight of the MoR delete-ratio term in [[fragScore]]: a fully-deleted file scores 2.0 on
    * pressure alone — above the default act threshold (1.0) by itself, because outstanding
    * deletes tax EVERY read with an anti-join until materialized, which small files don't.
    */
  val DeleteWeight = 2.0

  /** Fragmentation score of a file: how much would rewriting it help?
    *  - small-file penalty: linear in how far below the target record count it is
    *  - clustering penalty: +0.5 when the file spans >1 grid cell (its min/max stats are loose →
    *    it defeats manifest pruning), +1 when its source set overflowed (unknown layout)
    *  - delete pressure: [[DeleteWeight]] × the estimated fraction of rows hidden by pending MoR
    *    deletes ([[DeletePressure]]) — rewriting materializes them ([[Rewrite.compactFiles]]
    *    reads delete-aware), restoring the no-join read fast path
    */
  def fragScore(
      f: FileMeta,
      cfg: GridConfig,
      targetRecords: Long,
      pressure: FileMeta => Double = DeletePressure.Zero): Double = {
    val small = math.max(0.0, 1.0 - f.records.toDouble / targetRecords)
    val span = cellsOf(f, cfg).size
    val spanPenalty = if (f.sources.isEmpty) 1.0 else if (span > 1) 0.5 else 0.0
    small + spanPenalty + DeleteWeight * pressure(f)
  }

  /** Grid cells covered by a file, from its manifest stats. Files with overflowed source stats
    * cover the full bucket axis (they are maximally unclustered).
    */
  def cellsOf(f: FileMeta, cfg: GridConfig): Seq[(Int, Int)] = {
    val xs =
      if (f.sources.nonEmpty) f.sources.map(cfg.sourceBucket).distinct
      else 0 until cfg.sourceBuckets
    val ys = cfg.ntokBin(f.minNtok) to cfg.ntokBin(f.maxNtok)
    for { x <- xs; y <- ys } yield (x, y)
  }

  /** A file is a POINT on the grid — its centroid cell — carrying its full fragScore, exactly the
    * reference's POI model (a point with a weight, `/root/reference/src/main/scala/SDL/POI.java:9-35`).
    * Smearing the weight across every spanned cell would dilute fully-unclustered files (thousands
    * of cells) below any threshold; concentrating it keeps the region score monotone additive
    * (`ScoreFunctionTotalScore.java:10-16` precondition) AND proportional to "files fixed by
    * rewriting this region".
    */
  def centroidCell(f: FileMeta, cfg: GridConfig): (Int, Int) = {
    val x =
      if (f.sources.nonEmpty) cfg.sourceBucket(f.sources(f.sources.size / 2))
      else math.floorMod(f.path.hashCode, cfg.sourceBuckets) // unknown layout: deterministic scatter
    val y = cfg.ntokBin((f.minNtok.toLong + f.maxNtok).toInt / 2)
    (x, y)
  }

  def fileCells(
      f: FileMeta,
      cfg: GridConfig,
      targetRecords: Long,
      pressure: FileMeta => Double = DeletePressure.Zero): Seq[Cell] = {
    val s = fragScore(f, cfg, targetRecords, pressure)
    if (s <= 0) Nil
    else {
      val (x, y) = centroidCell(f, cfg)
      Seq(Cell(x, y, s))
    }
  }

  /** Distributed exact top-k regions over the file-metadata grid. */
  def topRegions(
      spark: SparkSession,
      metas: Seq[FileMeta],
      cfg: GridConfig,
      k: Int,
      targetRecords: Long,
      overlapAllowed: Boolean = false,
      pressure: FileMeta => Double = DeletePressure.Zero): Vector[Region] = {
    import spark.implicits._
    if (metas.isEmpty) return Vector.empty
    // metadata is already driver-resident here: small manifests (every steady-state cycle at
    // bench scale, and most cycles anywhere below ~10^4 files) solve with ZERO Spark jobs —
    // identical round/merge algebra via the shared local path (guide §2.4, remove the shuffle)
    if (metas.size <= GridTopK.DriverLocalMaxRows) {
      val keyed = metas.flatMap(f => fileCells(f, cfg, targetRecords, pressure))
        .flatMap(c => cfg.nodesForCell(c.x, c.y).map(n => (n, c)))
      if (keyed.isEmpty) return Vector.empty
      return GridTopK.solveKeyedLocal(keyed, cfg, k, overlapAllowed)
    }
    // file metadata → weighted cell points, then the shared distributed-top-k pipeline
    val cells: Dataset[Cell] = spark.createDataset(metas)
      .flatMap(f => fileCells(f, cfg, targetRecords, pressure))
    GridTopK.solve(spark, cells, cfg, k, overlapAllowed)
  }

  /** Winning regions → file-disjoint tasks. Files are claimed by centroid cell, and winning
    * regions are pairwise non-overlapping (the planner's distinct mode), so no file is ever
    * claimed twice — the file-level analog of the reference's safe/unsafe disjointness protocol
    * (`/root/reference/src/main/scala/SDL/DependencyGraph.scala:36-142`).
    */
  def claimTasks(
      winners: Seq[Region],
      metas: Seq[FileMeta],
      cfg: GridConfig,
      targetRecords: Long,
      pressure: FileMeta => Double = DeletePressure.Zero): Seq[PlannedTask] = {
    val withCentroid = metas.map(f => (f, centroidCell(f, cfg)))
    val claimed = scala.collection.mutable.HashSet.empty[String]
    winners.zipWithIndex.flatMap { case (r, i) =>
      val fs = withCentroid.collect {
        case (f, (x, y)) if x >= r.x && x <= r.x + r.w - 1 && y >= r.y && y <= r.y + r.w - 1 &&
          !claimed.contains(f.path) => f
      }
      // usefulness gate (termination): execute only when the rewrite can actually improve layout —
      // fewer output files than inputs (merge win), or a spanning file big enough to split into ≥2
      // tighter files. Without this the planner re-flags converged-but-small files forever.
      val total = fs.map(_.records).sum
      val outFiles = math.max(1L, (total + targetRecords - 1) / targetRecords)
      // files the engine itself wrote curve-sorted are as tight as their size allows — only a
      // file-count win can improve them; external (unclustered) spanning files also justify a
      // splitting re-cluster when there is enough data for ≥2 output files
      // delete-laden files are useful to rewrite regardless of layout win: the rewrite applies
      // their pending MoR deletes (terminating — rewritten files outlive every delete sequence,
      // so their pressure is 0 next cycle)
      val useful = outFiles < fs.size ||
        (fs.exists(f => !f.clustered && cellsOf(f, cfg).size > 1) && total >= 2 * targetRecords) ||
        fs.exists(f => pressure(f) > 0)
      if (useful) {
        fs.foreach(f => claimed += f.path)
        Some(PlannedTask(i, r, fs.map(_.path), r.score))
      } else None
    }
  }

  def planCompaction(
      spark: SparkSession,
      metas: Seq[FileMeta],
      cfg: GridConfig,
      k: Int,
      threshold: Double,
      targetRecords: Long,
      pressure: FileMeta => Double = DeletePressure.Zero): Seq[PlannedTask] = {
    val winners = topRegions(spark, metas, cfg, k, targetRecords, overlapAllowed = false, pressure)
      .filter(_.score >= threshold)
    claimTasks(winners, metas, cfg, targetRecords, pressure)
  }

  /** Incremental plan (reference algo 6, partial recompute): per-node kernel results are cached in
    * [[PlannerState]]; only nodes whose cells changed since the cached base version are re-run
    * (exact manifest diff between the two snapshots). Exactly equivalent to a full replan — clean
    * nodes' inputs are unchanged and the kernel is deterministic.
    */
  def planIncremental(
      spark: SparkSession,
      table: graft.table.SeqTable,
      cfg: GridConfig,
      k: Int,
      threshold: Double,
      targetRecords: Long,
      prev: Option[PlannerState],
      onRun: (Set[Int], Int) => Unit = (_, _) => (),
      pressure: FileMeta => Double = DeletePressure.Zero,
      preMergeMinRows: Long = GridTopK.PreMergeMinRows): (Seq[PlannedTask], PlannerState) = {
    import spark.implicits._
    val version = table.currentVersion()
    val metas = table.liveFiles()

    def nodesOf(fs: Seq[FileMeta]): Set[Int] =
      fs.flatMap(f => fileCells(f, cfg, targetRecords, pressure))
        .flatMap(c => cfg.nodesForCell(c.x, c.y)).toSet

    val allNodes = nodesOf(metas)
    // dirty = nodes touched by files added OR removed since the cached base (exact manifest diff;
    // falls back to all-dirty when the base snapshot has been expired), PLUS — when the pending
    // MoR delete set changed — nodes of files whose delete pressure changed with it (their cached
    // scores were computed under the OLD pressure; file membership alone can't see this)
    val dirty: Set[Int] = prev match {
      case Some(st) if table.snapshotVersions().contains(st.baseVersion) =>
        val baseSnap = table.snapshot(st.baseVersion)
        val prevLive = table.liveFiles(baseSnap)
        val nowPaths = metas.map(_.path).toSet
        val prevPaths = prevLive.map(_.path).toSet
        val delDirty: Set[Int] =
          if (baseSnap.deleteManifests == table.currentSnapshot().deleteManifests) Set.empty
          else {
            val basePressure = DeletePressure.of(spark, table, baseSnap)
            nodesOf(metas.filter(f => pressure(f) > 0 || basePressure(f) > 0))
          }
        nodesOf(metas.filterNot(f => prevPaths.contains(f.path))) ++
          nodesOf(prevLive.filterNot(f => nowPaths.contains(f.path))) ++ delDirty
      case _ => allNodes
    }

    // replicated-cell total for the runNodes driver-funnel gate: each file is one centroid cell
    // replicated to ≤4 nodes — O(F) driver arithmetic, no job (this variant holds metas anyway)
    val totalReplicated: Long = metas.iterator.map(f =>
      fileCells(f, cfg, targetRecords, pressure).iterator
        .map(c => cfg.nodesForCell(c.x, c.y).size.toLong).sum).sum

    val cells = spark.createDataset(metas)
      .flatMap(f => fileCells(f, cfg, targetRecords, pressure)).persist()
    try {
      def runNodes(nodes: Set[Int], kPrime: Int): Map[Int, NodeResult] =
        if (nodes.isEmpty) Map.empty
        else {
          onRun(nodes, kPrime) // observability hook: which nodes actually recompute (specs/q35)
          runNodesOn(spark, cells, cfg, nodes, kPrime, k,
            totalReplicated, allNodes.size, preMergeMinRows)
        }

      val (winners, newState) = IncrementalTopK.solve(
        runNodes, allNodes, dirty, prev, version, k, overlapAllowed = false)
      (claimTasks(winners.filter(_.score >= threshold), metas, cfg, targetRecords, pressure),
        newState)
    } finally { cells.unpersist(); () }
  }

  /** Fully-distributed plan over a manifest Dataset — the 10^12-scale path: cell scoring, region
    * search AND file claiming all run on executors; only the winning regions (k rows) and their
    * claimed file lists (task-sized) ever reach the driver. Winners are non-overlapping and each
    * file has ONE centroid cell, so claims are disjoint without driver-side dedup.
    */
  def planCompactionDistributed(
      spark: SparkSession,
      metas: Dataset[FileMeta],
      cfg: GridConfig,
      k: Int,
      threshold: Double,
      targetRecords: Long,
      pressure: FileMeta => Double = DeletePressure.Zero): Seq[PlannedTask] = {
    import spark.implicits._
    val cells = metas.flatMap(f => fileCells(f, cfg, targetRecords, pressure))
    val winners = GridTopK.solve(spark, cells, cfg, k, overlapAllowed = false)
      .filter(_.score >= threshold)
    claimTasksDistributed(spark, metas, winners, cfg, targetRecords, pressure)
  }

  /** Distributed file claiming for a winner set: each file maps to at most one winner (centroid
    * cells are unique and winners non-overlapping), so only the claimed files — task-sized —
    * reach the driver, where the usefulness gate runs per task.
    */
  def claimTasksDistributed(
      spark: SparkSession,
      metas: Dataset[FileMeta],
      winners: Seq[Region],
      cfg: GridConfig,
      targetRecords: Long,
      pressure: FileMeta => Double = DeletePressure.Zero): Seq[PlannedTask] = {
    import spark.implicits._
    if (winners.isEmpty) return Nil
    val wb = spark.sparkContext.broadcast(winners.zipWithIndex.toIndexedSeq)
    val claims = metas.flatMap { f =>
      val (x, y) = centroidCell(f, cfg)
      wb.value.collectFirst {
        case (r, i) if x >= r.x && x <= r.x + r.w - 1 && y >= r.y && y <= r.y + r.w - 1 =>
          (i, f)
      }
    }.collect()
    val byTask = claims.groupBy(_._1)
    winners.zipWithIndex.flatMap { case (r, i) =>
      val fs = byTask.getOrElse(i, Array.empty).map(_._2).toSeq.sortBy(_.path)
      val total = fs.map(_.records).sum
      val outFiles = math.max(1L, (total + targetRecords - 1) / targetRecords)
      val useful = outFiles < fs.size ||
        (fs.exists(f => !f.clustered && cellsOf(f, cfg).size > 1) && total >= 2 * targetRecords) ||
        fs.exists(f => pressure(f) > 0)
      if (useful) Some(PlannedTask(i, r, fs.map(_.path), r.score)) else None
    }
  }

  /** [[planIncremental]] with the manifest staying on executors end-to-end: the current and
    * cached-base manifests meet in path anti-joins to find dirtied nodes, kernels run over the
    * distributed cell Dataset, and claims come back task-sized via [[claimTasksDistributed]].
    * Only node-id sets (bounded by planner-grid geometry, not file count) and winning tasks
    * ever reach the driver — the 10^7-file incremental path.
    */
  def planIncrementalDistributed(
      spark: SparkSession,
      table: graft.table.SeqTable,
      cfg: GridConfig,
      k: Int,
      threshold: Double,
      targetRecords: Long,
      prev: Option[PlannerState],
      onRun: (Set[Int], Int) => Unit = (_, _) => (),
      pressure: FileMeta => Double = DeletePressure.Zero,
      preMergeMinRows: Long = GridTopK.PreMergeMinRows): (Seq[PlannedTask], PlannerState) = {
    import spark.implicits._
    val version = table.currentVersion()
    val metas = graft.table.SeqIO.fileMetaDS(spark, table, narrow = true)

    def nodesOfDS(fs: Dataset[FileMeta]): Set[Int] =
      fs.flatMap(f => fileCells(f, cfg, targetRecords, pressure)
        .flatMap(c => cfg.nodesForCell(c.x, c.y)))
        .distinct().collect().toSet

    val cells = metas.flatMap(f => fileCells(f, cfg, targetRecords, pressure)).persist()
    try {
      // one aggregation yields allNodes AND the replicated-cell total (the runNodes gate input);
      // driver payload = #nodes rows, bounded by planner-grid geometry, never file count
      val nodeCounts = cells.flatMap(c => cfg.nodesForCell(c.x, c.y))
        .groupByKey(identity).count().collect()
      val allNodes = nodeCounts.iterator.map(_._1).toSet
      val totalReplicated = nodeCounts.iterator.map(_._2).sum
      val dirty: Set[Int] = prev match {
        case Some(st) if table.snapshotVersions().contains(st.baseVersion) =>
          val baseSnap = table.snapshot(st.baseVersion)
          val prevDS = graft.table.SeqIO.fileMetaDSOf(spark, table, baseSnap, narrow = true)
          val added = metas.join(prevDS.select("path"), Seq("path"), "left_anti").as[FileMeta]
          val removed = prevDS.join(metas.select("path"), Seq("path"), "left_anti").as[FileMeta]
          // pressure-dirty mirrors the driver variant: cached node scores under the OLD delete
          // set are stale wherever either side's pressure is nonzero
          val delDirty: Set[Int] =
            if (baseSnap.deleteManifests == table.currentSnapshot().deleteManifests) Set.empty
            else {
              val basePressure = DeletePressure.of(spark, table, baseSnap)
              nodesOfDS(metas.filter(f => pressure(f) > 0 || basePressure(f) > 0))
            }
          nodesOfDS(added) ++ nodesOfDS(removed) ++ delDirty
        case _ => allNodes
      }

      def runNodes(nodes: Set[Int], kPrime: Int): Map[Int, NodeResult] =
        if (nodes.isEmpty) Map.empty
        else {
          onRun(nodes, kPrime)
          runNodesOn(spark, cells, cfg, nodes, kPrime, k,
            totalReplicated, allNodes.size, preMergeMinRows)
        }

      val (winners, newState) = IncrementalTopK.solve(
        runNodes, allNodes, dirty, prev, version, k, overlapAllowed = false)
      (claimTasksDistributed(spark, metas, winners.filter(_.score >= threshold), cfg,
        targetRecords, pressure), newState)
    } finally { cells.unpersist(); () }
  }

  /** Shared per-node kernel runner of both incremental variants, with the SAME driver-funnel
    * insurance as [[GridTopK.solve]]: when the estimated driver payload of this call — the
    * requested nodes' replicated-cell share, capped by #nodes × K′ candidates — exceeds
    * `preMergeMinRows`, per-node results are folded into one partial per Spark partition on
    * EXECUTORS ([[RegionKernel.preMerge]]) and returned under synthetic NEGATIVE ids, bounding
    * the collect at #partitions × K′ instead of #dirtyNodes × K′ (a churn-heavy commit, or a
    * planner-state reset where dirty == allNodes, at a 10^8-cell grid). Partials are valid
    * NodeResults in the merge algebra but are never cached ([[IncrementalTopK.solve]] treats
    * ids ∉ allNodes as transient) — steady-state small-dirty cycles stay below the gate and
    * keep exact per-node caching.
    */
  private def runNodesOn(
      spark: SparkSession,
      cells: Dataset[Cell],
      cfg: GridConfig,
      nodes: Set[Int],
      kPrime: Int,
      k: Int,
      totalReplicated: Long,
      nAllNodes: Int,
      preMergeMinRows: Long): Map[Int, NodeResult] = {
    import spark.implicits._
    val perNode = cells
      .flatMap(c => cfg.nodesForCell(c.x, c.y).filter(nodes.contains).map(n => (n, c)))
      .groupByKey(_._1)
      .mapGroups { (node, it) =>
        val (ax0, ax1, ay0, ay1) = cfg.anchorBounds(node)
        node -> RegionKernel.localTopK(it.map(_._2).toSeq, ax0, ax1, ay0, ay1, cfg.regionW, kPrime)
      }
    val replicatedShare =
      if (nAllNodes == 0) 0L else totalReplicated * nodes.size / nAllNodes
    val payloadBound =
      math.min(replicatedShare, nodes.size.toLong * math.min(kPrime.toLong, 1L << 20))
    if (payloadBound > preMergeMinRows) {
      val m = math.min(math.max(kPrime, k), 1 << 20) // the GridTopK bound: keep what a node keeps
      perNode.mapPartitions { rs =>
        if (rs.isEmpty) Iterator.empty
        else Iterator.single((-(org.apache.spark.TaskContext.getPartitionId() + 1),
          RegionKernel.preMerge(rs.map(_._2), m)))
      }.collect().toMap
    } else perNode.collect().toMap
  }
}
