package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.ops.Rewrite
import graft.planner.GridConfig

/** Plan-quality audit: prints formatted physical plans for the hot paths so pushdown, pruning and
  * whole-stage-codegen spans can be eyeballed per round (builder tooling, not part of the API).
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")

    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    show("grid_cell_agg")(SparkEntry.queries("q01_grid_cell_agg")(spark, dir))
    show("zorder_key")(SparkEntry.queries("q21_zorder_key")(spark, dir))
    show("pruned scan with residual filter")(
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("source") === "src0" && col("n_chars").between(100, 300))
        .select("doc_id", "n_chars"))
    show("clustered rewrite shape")(
      Rewrite.withCurveKey(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("string").as("doc_id"),
          col("text"), col("n_chars").cast("int").as("n_tok"), col("source")),
        GridConfig())
        .repartitionByRange(4, col("_ck"), col("doc_id"))
        .sortWithinPartitions(col("_ck"), col("doc_id")))
    show("merge join shape")(SparkEntry.queries("q20_merge_upsert_semantics")(spark, dir))
    spark.stop()
  }
}
