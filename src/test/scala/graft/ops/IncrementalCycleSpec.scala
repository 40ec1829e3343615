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
}
