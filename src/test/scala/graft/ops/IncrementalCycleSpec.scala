package graft.ops

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.fixtures.SeqGen
import graft.planner.GridConfig
import graft.sources.Ingest
import graft.state.Checkpoint
import graft.table.{SeqIO, SeqTable}

class IncrementalCycleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val cfg = GridConfig()

  test("incremental cycles plan the same work as full replanning and converge") {
    val root = Files.createTempDirectory("inc-cycle-").toString + "/t"
    val (table, _) = SeqGen.fragmentedTable(spark, root, 5000, 40)
    val opts = MaintenanceOptions(k = 12, targetRecordsPerFile = 500, incremental = true)
    val ckpt = new Checkpoint(s"$root/state")

    var go = true
    var cycles = 0
    while (go && cycles < 12) {
      val r = MaintenanceRunner.runCycle(spark, table, cfg, opts, ckpt)
      go = r.tasksExecuted > 0; cycles += 1
    }
    assert(cycles < 12)
    assert(ckpt.loadPlannerState().nonEmpty)
    assert(SeqIO.read(spark, table).count() === 5000)

    // new data arrives → only its nodes are dirty; the incremental plan must match a full replan
    Ingest.append(spark, table,
      SeqGen.table(spark, 1500, parts = 6)
        .withColumn("doc_id", org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("new-"),
          org.apache.spark.sql.functions.col("doc_id"))))
    val (incTasks, _) = MaintenancePlanner.planIncremental(
      spark, table, cfg, opts.k, opts.threshold, opts.targetRecordsPerFile,
      ckpt.loadPlannerState())
    val fullTasks = MaintenancePlanner.planCompaction(
      spark, table.liveFiles(), cfg, opts.k, opts.threshold, opts.targetRecordsPerFile)
    assert(incTasks.map(_.region) === fullTasks.map(_.region))
    assert(incTasks.map(_.filePaths.toSet) === fullTasks.map(_.filePaths.toSet))

    // and running the incremental cycle applies it, preserving all rows
    var go2 = true
    var c2 = 0
    while (go2 && c2 < 12) {
      val r = MaintenanceRunner.runCycle(spark, table, cfg, opts, ckpt)
      go2 = r.tasksExecuted > 0; c2 += 1
    }
    assert(SeqIO.read(spark, table).count() === 6500)
  }

  test("the cycle materializes MoR deletes by itself: pressure-weighted planning rewrites " +
      "laden files and housekeeping retires the obsolete manifests (no caller-invoked " +
      "MaterializeDeletes)") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("inc-mor-").toString + "/t"
    val (table, _) = SeqGen.fragmentedTable(spark, root, 3000, 12)
    val opts = MaintenanceOptions(k = 12, targetRecordsPerFile = 500, incremental = true)
    val ckpt = new Checkpoint(s"$root/state")
    var c = 0
    while (MaintenanceRunner.runCycle(spark, table, cfg, opts, ckpt).tasksExecuted > 0 && c < 12)
      c += 1
    assert(c < 12)

    // heavy MoR delete set: manifests land, nothing is rewritten, reads go delete-aware
    val changes = SeqGen.changeSet(spark, 3000, changes = 100, deletes = 2000).persist()
    MergeInto.merge(spark, table, changes, cfg, 500, mor = true)
    assert(table.currentSnapshot().deleteManifests.nonEmpty)
    val logical = SeqIO.read(spark, table).persist()
    val expected = logical.count()
    val delKeys = changes.filter(col("_op") === "D").select("doc_id").persist()

    // the CYCLE alone must materialize: pressure routes the laden files into the top-k, the
    // delete-aware task rewrite applies the deletes, housekeeping drops the obsolete manifests
    var c2 = 0
    var executedAny = 0
    var go = true
    while (go && c2 < 12) {
      val r = MaintenanceRunner.runCycle(spark, table, cfg, opts, ckpt)
      executedAny += r.tasksExecuted
      go = r.tasksExecuted > 0 || table.currentSnapshot().deleteManifests.nonEmpty
      c2 += 1
    }
    assert(c2 < 12, "cycles must converge after materializing the deletes")
    assert(executedAny > 0, "the planner must have scheduled the delete-laden files")
    assert(table.currentSnapshot().deleteManifests.isEmpty,
      "obsolete delete manifests must be retired by the cycle's housekeeping")
    val physical = SeqIO.read(spark, table)
    assert(physical.count() === expected)
    assert(physical.join(delKeys, Seq("doc_id"), "left_semi").count() === 0,
      "deleted keys must stay gone after materialization")
    logical.unpersist(); changes.unpersist(); delKeys.unpersist()
  }
}
