package graft.ops

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.fixtures.SeqGen
import graft.planner.GridConfig
import graft.table.{SeqIO, SeqTable}

class DmlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val cfg = GridConfig()

  private def fresh(tag: String): (SeqTable, Long) = {
    val root = Files.createTempDirectory(s"dml-$tag-").toString + "/t"
    val (t, _) = SeqGen.fragmentedTable(spark, root, 2000, 10)
    (t, 2000L)
  }

  test("deleteWhere removes exactly the predicate rows, transactionally") {
    val (table, n) = fresh("del")
    val cond = col("n_tok") < 512
    val want = SeqIO.read(spark, table).filter(!cond).count()
    val victims = n - want
    assert(victims > 0 && want > 0, "predicate must split the table")
    Dml.deleteWhere(spark, table, cond, cfg, 1000)
    val after = SeqIO.read(spark, table)
    assert(after.count() === want)
    assert(after.filter(cond).count() === 0, "a predicate row survived the delete")
  }

  test("updateWhere rewrites only the matched rows and keeps n_tok = size(tokens)") {
    val (table, n) = fresh("upd")
    val cond = col("source") === "src1"
    val matched = SeqIO.read(spark, table).filter(cond).count()
    assert(matched > 0 && matched < n)
    val beforeUnmatched = SeqIO.read(spark, table).filter(!cond)
      .agg(expr("bit_xor(xxhash64(doc_id, tokens))")).head.getLong(0)
    Dml.updateWhere(spark, table, cond,
      Map("tokens" -> slice(col("tokens"), 1, 8), "source" -> lit("redacted")),
      cfg, 1000)
    val after = SeqIO.read(spark, table)
    assert(after.count() === n, "update must not change row count")
    assert(after.filter(col("source") === "redacted").count() === matched)
    assert(after.filter(col("source") === "src1").count() === 0)
    assert(after.filter(col("n_tok") =!= size(col("tokens"))).count() === 0,
      "n_tok must stay derived from tokens")
    assert(after.filter(col("source") === "redacted")
      .filter(size(col("tokens")) > 8).count() === 0)
    val afterUnmatched = after.filter(!(col("source") === "redacted"))
      .agg(expr("bit_xor(xxhash64(doc_id, tokens))")).head.getLong(0)
    assert(afterUnmatched === beforeUnmatched, "unmatched rows must be byte-identical")
  }

  test("updateWhere refuses the merge key and derived columns") {
    val (table, _) = fresh("guard")
    intercept[IllegalArgumentException](
      Dml.updateWhere(spark, table, lit(true), Map("doc_id" -> lit("x")), cfg, 1000))
    intercept[IllegalArgumentException](
      Dml.updateWhere(spark, table, lit(true), Map("n_tok" -> lit(1)), cfg, 1000))
  }

  test("MoR deleteWhere leaves files untouched; changelog shows exactly the victims") {
    val (table, _) = fresh("mor")
    val v1 = table.currentVersion()
    val cond = col("n_tok") >= 4000
    val victims = SeqIO.read(spark, table).filter(cond).count()
    assert(victims > 0)
    val r = Dml.deleteWhere(spark, table, cond, cfg, 1000, mor = true)
    assert(r.filesRewritten === 0, "MoR delete must not rewrite files")
    assert(SeqIO.read(spark, table).filter(cond).count() === 0)
    val diff = SeqIO.tableDiff(spark, table, v1, table.currentVersion())
    assert(diff.filter(col("change_type") === "I").count() === 0)
    assert(diff.filter(col("change_type") === "D").count() === victims)
  }
}
