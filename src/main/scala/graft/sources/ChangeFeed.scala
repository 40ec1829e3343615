package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.MergeInto
import graft.planner.GridConfig
import graft.table.{SeqIO, SeqTable}

/** CDC-as-source: a replayable micro-batch consumer over a table's net row-level changelog
  * ([[SeqIO.tableDiff]]) — the downstream-training-pipeline loop ("give me everything that
  * changed since my checkpoint, exactly once") the changelog read alone leaves to the caller.
  *
  * Exactly-once comes from the TRANSACTIONAL-SINK pattern (the streaming-ingest high-water-mark
  * discipline, `Ingest.stream`): the consumer's offset — the last source version it has applied —
  * lives in the TARGET table's properties and advances in the SAME atomic commit that applies the
  * batch ([[MergeInto.merge]]'s propertyUpdates). A crash between reading the changelog and
  * committing leaves the offset untouched (the replay redelivers and applies once); a crash after
  * the commit leaves nothing to redeliver. There is no window in which the batch is applied but
  * the offset not advanced, or vice versa.
  *
  * Retention contract: the SOURCE must retain snapshots back to each consumer's offset
  * ([[SeqIO.tableDiff]] fails loudly on expired endpoints) — keep `expireSnapshots(keepLast)`
  * ahead of the slowest consumer, same as Iceberg CDC.
  */
object ChangeFeed {

  def offsetKey(consumerId: String): String = s"cdc.offset.$consumerId"

  /** The consumer's recorded offset in `target` (source version it has fully applied). */
  def offsetOf(target: SeqTable, consumerId: String): Long =
    target.currentSnapshot().properties.get(offsetKey(consumerId)).map(_.toLong).getOrElse(0L)

  /** One consumption step: read the source changelog `(offset, head]`, apply it to `target` as a
    * MERGE (net D rows delete, net I rows upsert — an update's D+I pair lands as one row
    * replacement), and advance the offset IN THE SAME COMMIT. Returns the consumed range, or
    * None when the consumer is already at the head.
    *
    * Re-running after any crash is safe (see object scaladoc). Running concurrently with the
    * same id is SERIALIZED by an offset equality fence: both racers plan against the offset
    * they read, the first commit wins and advances it, and the loser's commit fails loudly at
    * rebase (a plain retry re-polls from the new offset). Without the fence, racers that read
    * different source heads could commit the offset BACKWARDS.
    */
  def consumeInto(spark: SparkSession, source: SeqTable, target: SeqTable, consumerId: String,
      cfg: GridConfig = GridConfig(), targetRecordsPerFile: Long = 100000L,
      mor: Boolean = false): Option[(Long, Long)] = {
    val key = offsetKey(consumerId)
    val rawOffset = target.currentSnapshot().properties.get(key)
    val from = rawOffset.map(_.toLong).getOrElse(0L)
    val head = source.currentVersion()
    if (head <= from) return None
    val batch = SeqIO.tableDiff(spark, source, from, head)
      .withColumn("_op", when(col("change_type") === "D", lit("D")).otherwise(lit("U")))
      .drop("change_type")
    // equality-fence the offset against the value this batch was planned on: two concurrent
    // consumers with one id that read DIFFERENT source heads would otherwise both apply, and
    // the slower one's commit would move the offset BACKWARDS (serving a reverted mirror until
    // the next poll). The loser now fails loudly at its rebase and simply re-polls.
    MergeInto.merge(spark, target, batch, cfg, targetRecordsPerFile, mor = mor,
      propertyUpdates = Map(key -> head.toString),
      requirePropertyEquals = Map(key -> rawOffset))
    Some((from, head))
  }

  /** At-least-once generic form for non-transactional sinks: deliver `(offset, head]` to
    * `process`, then advance the offset on the target bookkeeping table with a plain property
    * commit. A crash between `process` and the advance REDELIVERS the batch on replay — the
    * process step must be idempotent (or use [[consumeInto]], where sink and offset share one
    * commit). Offsets still live on `target` so several consumers can share one source.
    */
  def consume(spark: SparkSession, source: SeqTable, target: SeqTable, consumerId: String)(
      process: DataFrame => Unit): Option[(Long, Long)] = {
    val from = offsetOf(target, consumerId)
    val head = source.currentVersion()
    if (head <= from) return None
    process(SeqIO.tableDiff(spark, source, from, head))
    target.commit("cdc-advance", Nil, Set.empty,
      Map("cdc-consumer" -> consumerId, "cdc-from" -> from.toString, "cdc-to" -> head.toString),
      propertyUpdates = Map(offsetKey(consumerId) -> head.toString))
    Some((from, head))
  }
}
