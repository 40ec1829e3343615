package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.planner.GridConfig
import graft.table.{SeqIO, SeqTable}

/** Table-level deduplication as a maintenance operation: detect duplicate sequences and remove
  * them through the transactional MERGE INTO delete path (one atomic snapshot, full lineage).
  *
  * Exact mode keys on the token payload itself (`xxhash64(tokens)` + length — collision-checked by
  * grouping on the hash AND n_tok); the winner per group is the smallest doc_id, everything else
  * is deleted. One shuffle on the content hash; the payload never moves (hash computed at scan).
  */
object DedupTable {

  /** Duplicate doc_ids to remove (exact content duplicates, keep-min-doc_id policy). */
  def exactDuplicates(spark: SparkSession, table: SeqTable): DataFrame = {
    SeqIO.read(spark, table)
      .select(col("doc_id"), xxhash64(col("tokens")).as("h"), col("n_tok"))
      .groupBy(col("h"), col("n_tok"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(slice(col("ids"), 2, Int.MaxValue)).as("doc_id")) // all but the min survive → delete
  }

  /** Run the dedup: returns (#deleted, merge result). No-op commit is skipped. */
  def dedupExact(spark: SparkSession, table: SeqTable, cfg: GridConfig,
      targetRecordsPerFile: Long): (Long, Option[MergeResult]) = {
    val dupes = exactDuplicates(spark, table).persist()
    val n = dupes.count()
    val res =
      if (n == 0) None
      else {
        val deletes = dupes
          .withColumn("tokens", array().cast("array<int>"))
          .withColumn("n_tok", lit(0))
          .withColumn("source", lit(""))
          .withColumn("_op", lit("D"))
        Some(MergeInto.merge(spark, table, deletes, cfg, targetRecordsPerFile))
      }
    dupes.unpersist()
    (n, res)
  }
}
