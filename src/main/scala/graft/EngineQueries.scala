package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.SeqGen
import graft.ops._
import graft.planner.GridConfig
import graft.state.Checkpoint
import graft.table.{SeqIO, SeqTable}

/** Engine-lifecycle queries for the driver harness: each synthesizes a deterministic tokenized-
  * sequence table (FIXTURES.md §1; no external data), runs a maintenance operator end-to-end, and
  * returns a one-row metrics DataFrame incl. hard correctness bits (anti-join mismatch counts),
  * so the rows-only check still observes real invariants.
  */
object EngineQueries {

  private def cfg = GridConfig()

  private def sfOf(dir: String): Double =
    "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.01)

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-$tag-").toString + "/tbl"

  /** rows for engine queries, scaled gently with sf */
  private def rowsFor(dir: String): Long = math.max(5000L, (sfOf(dir) * 2e6).toLong.min(200000L))

  /** Both-ways anti-join mismatch count on (doc_id, tokens) — the byte-identity invariant. */
  private def mismatches(a: DataFrame, b: DataFrame): Long = {
    val l = a.select(col("doc_id"), col("tokens"))
    val r = b.select(col("doc_id"), col("tokens"))
    l.join(r, Seq("doc_id", "tokens"), "left_anti").count() +
      r.join(l, Seq("doc_id", "tokens"), "left_anti").count()
  }

  def compactionCycle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = rowsFor(dir)
    val nFiles = (rows / 250).toInt.max(20)
    val root = fresh("compact")
    val (table, metas) = SeqGen.fragmentedTable(s, root, rows, nFiles)
    val before = SeqIO.read(s, table).persist()
    val opts = MaintenanceOptions(k = 16, targetRecordsPerFile = math.max(1000L, rows / 25))
    val ckpt = new Checkpoint(s"$root/state")
    var cycles = 0
    var rewritten = 0L
    var go = true
    while (go && cycles < 12) {
      val r = MaintenanceRunner.runCycle(s, table, cfg, opts, ckpt)
      cycles += 1; rewritten += r.recordsRewritten; go = r.tasksExecuted > 0
    }
    val after = SeqIO.read(s, table)
    val bad = mismatches(before, after)
    val out = Seq((rows, metas.size.toLong, table.liveFiles().size.toLong, cycles.toLong,
      rewritten, bad)).toDF(
      "rows", "files_before", "files_after", "cycles", "records_rewritten", "antijoin_mismatches")
    before.unpersist()
    out
  }

  def mergeInto(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = rowsFor(dir)
    val root = fresh("merge")
    val (table, _) = SeqGen.fragmentedTable(s, root, rows, (rows / 500).toInt.max(10))
    val before = SeqIO.read(s, table).persist()
    val changes = SeqGen.changeSet(s, rows, changes = rows / 10, deletes = rows / 50).persist()
    val mr = MergeInto.merge(s, table, changes, cfg, math.max(1000L, rows / 25))
    val after = SeqIO.read(s, table).persist()

    // semantic check: expected = (target \ deletedKeys \ updatedKeys) ∪ upserts
    val upserts = changes.filter(col("_op") =!= "D")
    val expected = before.join(changes.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(upserts.select("doc_id", "tokens", "n_tok", "source"))
    val bad = mismatches(expected, after)
    val out = Seq((rows, changes.count(), mr.filesRewritten.toLong, mr.attempts.toLong,
      after.count(), bad)).toDF(
      "rows", "changes", "files_rewritten", "attempts", "rows_after", "antijoin_mismatches")
    before.unpersist(); changes.unpersist(); after.unpersist()
    out
  }

  def snapshotExpiry(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = fresh("expire")
    val table = SeqTable.create(root)
    // five appends → five snapshots, then one compacting rewrite, then expire to the last 2
    (1 to 5).foreach { i =>
      val metas = SeqIO.writeFiles(s, table, SeqGen.table(s, 500, parts = 2)
        .withColumn("doc_id", concat(lit(s"b$i-"), col("doc_id"))))
      table.commit("append", metas, Set.empty)
    }
    val all = table.liveFiles()
    Rewrite.compactFiles(s, table, all, cfg, 10000L)
    val versionsBefore = table.snapshotVersions().size.toLong
    val dataFilesOnDiskBefore = Files.list(table.dataDir).count()
    val (expired, deleted) = table.expireSnapshots(keepLast = 1)
    val dataFilesOnDiskAfter = Files.list(table.dataDir).count()
    val readable = SeqIO.read(s, table).count() // current snapshot still fully readable
    Seq((versionsBefore, table.snapshotVersions().size.toLong, expired.size.toLong,
      deleted.size.toLong, dataFilesOnDiskBefore, dataFilesOnDiskAfter, readable)).toDF(
      "versions_before", "versions_after", "snapshots_expired", "data_files_deleted",
      "disk_files_before", "disk_files_after", "rows_readable")
  }

  def mergeMor(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = rowsFor(dir)
    val root = fresh("mor")
    val (table, _) = SeqGen.fragmentedTable(s, root, rows, (rows / 500).toInt.max(10))
    val before = SeqIO.read(s, table).persist()
    val changes = SeqGen.changeSet(s, rows, changes = rows / 10, deletes = rows / 50).persist()
    val mr = MergeInto.merge(s, table, changes, cfg, math.max(1000L, rows / 25), mor = true)
    val after = SeqIO.read(s, table).persist()
    val upserts = changes.filter(col("_op") =!= "D")
    val expected = before.join(changes.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(upserts.select("doc_id", "tokens", "n_tok", "source"))
    val bad = mismatches(expected, after)
    // then materialize and re-check: physical == logical
    graft.ops.MaterializeDeletes.run(s, table, cfg, math.max(1000L, rows / 25))
    val bad2 = mismatches(expected, SeqIO.read(s, table))
    val out = Seq((rows, changes.count(), mr.filesRewritten.toLong, after.count(),
      bad, bad2, table.currentSnapshot().deleteManifests.size.toLong)).toDF(
      "rows", "changes", "files_rewritten", "rows_after",
      "mor_mismatches", "materialized_mismatches", "delete_manifests_left")
    before.unpersist(); changes.unpersist(); after.unpersist()
    out
  }

  def dedupTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = fresh("dedup")
    val table = SeqTable.create(root)
    // base rows + deliberate exact duplicates of every 10th row under new doc_ids
    val base = SeqGen.table(s, 3000, parts = 8)
    val dupes = base.filter(xxhash64(col("doc_id")) % 10 === 0)
      .withColumn("doc_id", concat(lit("dup-"), col("doc_id")))
    val metas = SeqIO.writeFiles(s, table, base.unionByName(dupes).repartition(12, col("doc_id")))
    table.commit("append", metas, Set.empty)
    val before = SeqIO.read(s, table).count()
    val (deleted, _) = graft.ops.DedupTable.dedupExact(s, table, cfg, 1000)
    val after = SeqIO.read(s, table)
    val distinctPayloads = after.select(xxhash64(col("tokens")), col("n_tok")).distinct().count()
    Seq((before, deleted, after.count(), distinctPayloads)).toDF(
      "rows_before", "deleted", "rows_after", "distinct_payloads")
  }

  def scanPruning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = rowsFor(dir)
    val root = fresh("prune")
    val (table, _) = SeqGen.fragmentedTable(s, root, rows, (rows / 250).toInt.max(20))
    val (_, before) = SeqIO.scanPruned(s, table, Some("src0"), Some(256), Some(1024))
    // global re-cluster: rewrite everything curve-sorted (what the planner converges to)
    Rewrite.compactFiles(s, table, table.liveFiles(), cfg, math.max(500L, rows / 50))
    val (df, after) = SeqIO.scanPruned(s, table, Some("src0"), Some(256), Some(1024))
    val matched = df.count()
    Seq((before.filesScanned.toLong, before.totalFiles.toLong, after.filesScanned.toLong,
      after.totalFiles.toLong, matched)).toDF(
      "files_scanned_before", "files_before", "files_scanned_after", "files_after", "rows_matched")
  }
}
