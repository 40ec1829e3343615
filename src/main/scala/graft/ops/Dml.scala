package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.planner.GridConfig
import graft.table.{SeqIO, SeqTable}

/** Predicate DML — `DELETE FROM … WHERE` and `UPDATE … SET … WHERE` as first-class engine ops
  * (the Iceberg/Delta row-level DML surface, public design), routed through the transactional
  * [[MergeInto]] path so they inherit its whole machinery: manifest range + per-file Bloom
  * pruning, COW/MoR auto-routing by affected share, conflict-retry rebase, snapshot isolation.
  *
  * The affected-row scan pushes the predicate into the parquet scan (Catalyst pushdown); the
  * merge's own manifest pruning then bounds the rewrite to files that may hold affected keys —
  * a sparse predicate touches only its files, a dense one auto-routes to merge-on-read.
  *
  * Isolation: the predicate is evaluated against the snapshot current AT CALL TIME (snapshot
  * isolation, the Iceberg/Delta DML contract) — rows appended concurrently are not
  * retro-matched, and a concurrent rewrite of an affected file surfaces as
  * `CommitConflictException` through the merge path's validation rather than silently losing
  * either write.
  */
object Dml {

  /** DELETE FROM table WHERE `cond`. Returns the merge result (files rewritten / snapshot).
    * `mor` forces merge-on-read (delete manifests only, no rewrite); default auto-routes.
    */
  def deleteWhere(spark: SparkSession, table: SeqTable, cond: Column, cfg: GridConfig,
      targetRecordsPerFile: Long, mor: Boolean = false): MergeResult = {
    val victims = SeqIO.read(spark, table).filter(cond)
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
      .withColumn("_op", lit("D"))
    MergeInto.merge(spark, table, victims, cfg, targetRecordsPerFile,
      mor = mor, auto = !mor)
  }

  /** UPDATE table SET col = expr, … WHERE `cond`. `set` maps column name → new-value expression
    * (evaluated against the current row); only `tokens` and `source` are updatable — `doc_id`
    * is the merge key and `n_tok` is derived (recomputed when `tokens` changes, the schema
    * invariant n_tok == size(tokens)).
    */
  def updateWhere(spark: SparkSession, table: SeqTable, cond: Column, set: Map[String, Column],
      cfg: GridConfig, targetRecordsPerFile: Long, mor: Boolean = false): MergeResult = {
    val bad = set.keySet -- Set("tokens", "source")
    require(bad.isEmpty, s"updateWhere: non-updatable columns ${bad.mkString(", ")} " +
      "(doc_id is the merge key; n_tok is derived from tokens)")
    val upd0 = SeqIO.read(spark, table).filter(cond)
    val withSet = set.foldLeft(upd0) { case (df, (name, expr)) => df.withColumn(name, expr) }
    val upserts = withSet
      .withColumn("n_tok", size(col("tokens")))
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
      .withColumn("_op", lit("U"))
    MergeInto.merge(spark, table, upserts, cfg, targetRecordsPerFile,
      mor = mor, auto = !mor)
  }
}
