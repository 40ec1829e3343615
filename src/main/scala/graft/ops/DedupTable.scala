package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.planner.GridConfig
import graft.table.{SeqIO, SeqTable}

/** Table-level deduplication as a maintenance operation: detect duplicate sequences and remove
  * them through the transactional MERGE INTO delete path (one atomic snapshot, full lineage).
  *
  * Exact mode is a two-phase plan so it is BOTH payload-exact and cheap at 10^12 rows:
  *  1. candidate pass — shuffle only (doc_id, hash, n_tok); rows whose (hash, n_tok) group has a
  *     single member (the overwhelming majority) never move their token payload at all;
  *  2. verify pass — candidate rows re-grouped by the TOKEN PAYLOAD itself. Deleting on hash
  *     equality alone would silently destroy a distinct document on a 64-bit collision — a
  *     birthday-bound certainty at 10^12 rows, unacceptable for a destructive op.
  * The winner per payload group is the smallest doc_id, everything else is deleted.
  */
object DedupTable {

  /** Duplicate doc_ids to remove (exact content duplicates, keep-min-doc_id policy).
    * @param hashBits width of the candidate hash (< 64 forces collisions — test hook proving
    *                 colliding-but-distinct payloads survive)
    */
  def exactDuplicates(spark: SparkSession, table: SeqTable, hashBits: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = SeqIO.read(spark, table)
    val h =
      if (hashBits >= 64) xxhash64(col("tokens"))
      else pmod(xxhash64(col("tokens")), lit(1L << hashBits))
    val candIds = rows
      .select(col("doc_id"), h.as("h"), col("n_tok"))
      .withColumn("_gn", count(lit(1)).over(Window.partitionBy(col("h"), col("n_tok"))))
      .filter(col("_gn") > 1)
      .select(col("doc_id"))
    rows.join(candIds, Seq("doc_id"), "left_semi") // payload moves only for candidate rows
      .groupBy(col("n_tok"), col("tokens"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(slice(col("ids"), 2, Int.MaxValue)).as("doc_id")) // all but the min survive → delete
  }

  /** Run the dedup: returns (#deleted, merge result). No-op commit is skipped. */
  def dedupExact(spark: SparkSession, table: SeqTable, cfg: GridConfig,
      targetRecordsPerFile: Long, hashBits: Int = 64): (Long, Option[MergeResult]) =
    deleteIds(spark, table, cfg, targetRecordsPerFile, exactDuplicates(spark, table, hashBits))

  /** NEAR-duplicate doc_ids to remove: MinHash-LSH pairs over the TOKEN STREAM (each sequence
    * rendered as its space-joined token ids — numeric "words", so the shared shingle/signature
    * path applies unchanged), resolved to clusters by [[graft.functions.Dedup.dupClusters]],
    * keep-min-doc_id policy. The near twin of [[exactDuplicates]]: catches sequences that share
    * most of their token n-grams (truncated/extended/slightly-edited copies) that byte-exact
    * hashing can never see.
    */
  def nearDuplicates(spark: SparkSession, table: SeqTable, k: Int = 32, bands: Int = 8,
      shingleN: Int = 3, minJaccardX1e4: Long = 6000L, maxBucket: Int = 1024,
      portable: Boolean = false): DataFrame = {
    val rows = SeqIO.read(spark, table)
      .select(col("doc_id").as("id"), concat_ws(" ", col("tokens")).as("text"))
    val (pairs, release) = graft.functions.Dedup.minhashLshPairsWithHandle(
      rows, k, bands, shingleN, minJaccardX1e4, maxBucket, portable)
    val clusters = graft.functions.Dedup.dupClusters(pairs) // materializes during its iterations
    release()
    // the victim set is tiny; checkpoint it and free the label blocks NOW — leaving them to the
    // caller leaked one label snapshot per dedup cycle in a long-lived driver
    val victims = clusters.filter(col("id") =!= col("cluster")).select(col("id").as("doc_id"))
      .localCheckpoint(true)
    clusters.unpersist()
    victims
  }

  /** Run the near-dedup (see [[nearDuplicates]]): returns (#deleted, merge result). */
  def dedupNear(spark: SparkSession, table: SeqTable, cfg: GridConfig,
      targetRecordsPerFile: Long, k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      minJaccardX1e4: Long = 6000L, portable: Boolean = false): (Long, Option[MergeResult]) =
    deleteIds(spark, table, cfg, targetRecordsPerFile,
      nearDuplicates(spark, table, k, bands, shingleN, minJaccardX1e4, portable = portable))

  /** Apply a (doc_id) victim set through the transactional MERGE delete path. */
  private def deleteIds(spark: SparkSession, table: SeqTable, cfg: GridConfig,
      targetRecordsPerFile: Long, ids: DataFrame): (Long, Option[MergeResult]) = {
    val dupes = ids.persist()
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
