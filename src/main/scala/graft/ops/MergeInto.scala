package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.planner.GridConfig
import graft.table.{SeqIO, SeqTable, Snapshot}

final case class MergeResult(
    snapshot: Snapshot,
    filesRewritten: Int,
    attempts: Int)

/** Copy-on-write MERGE INTO with optimistic snapshot-isolation.
  *
  * Semantics (per change row, keyed on `doc_id`; optional `_op` column, default upsert):
  *  - `_op = 'D'`  → delete the target row if present
  *  - otherwise    → update the target row, or insert when absent
  *
  * Physical plan, scale-first:
  *  1. **prune**: only data files whose manifest [minDocId, maxDocId] range can contain a change
  *     key are touched — a broadcast range-join of change keys against file stats;
  *  2. **map-only update path**: the pruned target subset joins the broadcast change set and is
  *     rewritten partition-for-partition — NO shuffle, no range sampling; the curve-sorted layout
  *     of the affected files carries over to their replacements. (When the change set is too big
  *     to broadcast, the join falls back to shuffle but the write still avoids re-sampling.)
  *  3. **insert path**: change rows matching no target row are written as a small separate
  *     curve-clustered file set;
  *  4. one atomic commit swaps affected → rewritten ∪ inserts.
  *
  * Isolation: the commit validates that no concurrent commit rewrote our affected files; on
  * conflict the ENTIRE merge replans against the new snapshot (bounded retries). Two merges on
  * disjoint files commit concurrently; overlapping merges serialize — one wins, one replans.
  * The reference has no transactional machinery; this replaces its single-writer REST queue
  * (`/root/reference/src/main/scala/SDL/main/main.java:169-248`).
  */
object MergeInto {

  def merge(
      spark: SparkSession,
      table: SeqTable,
      changes: DataFrame,
      cfg: GridConfig,
      targetRecordsPerFile: Long,
      maxAttempts: Int = 5,
      broadcastChanges: Boolean = true): MergeResult = {
    val hasOp = changes.columns.contains("_op")
    val ch = (if (hasOp) changes else changes.withColumn("_op", lit("U")))
      .select(
        col("doc_id").as("c_doc_id"), col("tokens").as("c_tokens"),
        col("n_tok").as("c_n_tok"), col("source").as("c_source"), col("_op"))
      .persist()
    try {
      val keys = ch.select(col("c_doc_id")).distinct().persist()
      val nKeys = keys.count() // materialize once; reused every attempt
      var attempt = 0
      while (true) {
        attempt += 1
        val snap = table.currentSnapshot()
        val live = table.liveFiles(snap)

        // 1. manifest pruning: files whose doc_id range may contain a change key
        import spark.implicits._
        val fileRanges = spark.createDataset(live.map(f => (f.path, f.minDocId, f.maxDocId)))
          .toDF("path", "min_doc", "max_doc")
        val affectedPaths = fileRanges
          .join(broadcast(keys), col("c_doc_id").between(col("min_doc"), col("max_doc")))
          .select("path").distinct().as[String].collect().toSet
        val affected = live.filter(f => affectedPaths.contains(f.path))

        // 2. COW update of the affected rows: broadcast-join the changes (no shuffle of the
        // target payload for the join), then ONE hash shuffle keyed on the source file to restore
        // file granularity — the parquet reader coalesces/splits files per partition, so
        // "partition = file" cannot be assumed. No range sampling, no double computation.
        val target = SeqIO.readFiles(spark, table, affected)
        val chSide = if (broadcastChanges) broadcast(ch) else ch
        val updated = target.withColumn("_file", input_file_name())
          .join(chSide, col("doc_id") === col("c_doc_id"), "left_outer")
          .filter(col("_op").isNull || col("_op") =!= "D") // deletes drop out
          .select(
            col("doc_id"),
            coalesce(col("c_tokens"), col("tokens")).as("tokens"),
            coalesce(col("c_n_tok"), col("n_tok")).as("n_tok"),
            coalesce(col("c_source"), col("source")).as("source"),
            col("_file"))
        val rewritten =
          if (affected.isEmpty) Nil
          else {
            val regrouped = Rewrite.withCurveKey(updated, cfg)
              .repartition(math.max(1, affected.size), col("_file"))
              .sortWithinPartitions(col("_ck"), col("doc_id"))
              .drop("_ck", "_file")
            SeqIO.writeFiles(spark, table, regrouped, clustered = affected.forall(_.clustered))
          }

        // 3. inserts: change keys present in NO target file (pruning ⇒ checking affected suffices)
        val inserts = ch.filter(col("_op") =!= "D")
          .join(target.select(col("doc_id")), col("c_doc_id") === col("doc_id"), "left_anti")
          .select(col("c_doc_id").as("doc_id"), col("c_tokens").as("tokens"),
            col("c_n_tok").as("n_tok"), col("c_source").as("source"))
        val insertedFiles = Rewrite.clusteredWrite(
          spark, table, inserts, cfg, targetRecordsPerFile, nKeys)

        // 4. atomic swap; on conflict, drop our orphan files and replan from the new head
        try {
          val s = table.commit("merge", rewritten ++ insertedFiles, affectedPaths,
            Map("merge-attempt" -> attempt.toString))
          return MergeResult(s, affected.size, attempt)
        } catch {
          case e: table.CommitConflictException =>
            (rewritten ++ insertedFiles).foreach(f =>
              java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(table.absolutePath(f))))
            if (attempt >= maxAttempts) throw e
        }
      }
      throw new IllegalStateException("unreachable")
    } finally { ch.unpersist(); () }
  }
}
