package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.fixtures.SeqGen
import graft.planner.GridConfig
import graft.table.SeqIO

/** The fully-distributed manifest-Dataset planner must plan exactly what the driver-side planner
  * plans (same tasks, same files) — the 10^12-scale path is semantics-identical.
  */
class PlannerParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("planCompactionDistributed == planCompaction") {
    val root = java.nio.file.Files.createTempDirectory("parity-").toString + "/t"
    val (table, metas) = SeqGen.fragmentedTable(spark, root, 6000, 50)
    val cfg = GridConfig()
    val a = MaintenancePlanner.planCompaction(spark, metas, cfg, 8, 1.0, 600)
    val b = MaintenancePlanner.planCompactionDistributed(
      spark, SeqIO.fileMetaDS(spark, table), cfg, 8, 1.0, 600)
    assert(a.map(_.region) === b.map(_.region))
    assert(a.map(_.filePaths.toSet) === b.map(_.filePaths.toSet))
  }
}
