package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.curve
import graft.planner.GridConfig
import graft.table.{FileMeta, SeqIO, SeqTable}

/** Space-filling-curve clustered write — the physical layout engine behind compaction, re-cluster
  * and MERGE INTO.
  *
  * Layout: key = zorder/hilbert interleave of (pmod(xxhash64(source), B), n_tok / binWidth) —
  * both factors codegen'd Catalyst expressions, so the whole rewrite stays inside whole-stage
  * codegen. Rows are range-partitioned on (curveKey, doc_id): the secondary key is the **salt** —
  * a hot curve key (one dominant `source`, the reference grid's unhandled skew case,
  * `/root/reference/src/main/scala/SDL/distrib/GridIndexer.scala` fixed sqrt grid) gets split across
  * as many range partitions as its row share demands, so no single executor owns a hot source.
  */
object Rewrite {

  /** Attach the clustering key column. */
  def withCurveKey(df: DataFrame, cfg: GridConfig, hilbert: Boolean = false): DataFrame = {
    val x = pmod(xxhash64(col("source")), lit(cfg.sourceBuckets.toLong)).cast("int")
    val y = (col("n_tok") / lit(cfg.ntokBinWidth)).cast("int")
    val key = if (hilbert) curve.hilbertKey(x, y) else curve.zorderKey(x, y)
    df.withColumn("_ck", key)
  }

  /** Cluster `df` and write it as ~`totalRecords / targetRecordsPerFile` files. Returns the
    * manifest entries (not yet committed).
    *
    * Layouts:
    *  - curve (default): range-partition + sort on (curveKey, doc_id) — tight (source, n_tok)
    *    stats per file → scan pruning; doc_id is the skew salt. Merge pruning on doc_id cannot
    *    work here: every file spans nearly the whole key domain.
    *  - docMajor: range-partition + sort on doc_id — tight [minDocId, maxDocId] per file → a
    *    sparse MERGE INTO touches only the files actually holding its keys. The Iceberg-style
    *    sort-order choice for merge-heavy tables (scan pruning on (source, n_tok) is what you
    *    give up; with ~10^3 rows-per-key-density change sets no per-file structure can prune, so
    *    this is the ONLY layout under which sparse COW merges stay sub-linear).
    */
  def clusteredWrite(
      spark: SparkSession,
      table: SeqTable,
      df: DataFrame,
      cfg: GridConfig,
      targetRecordsPerFile: Long,
      totalRecords: Long,
      hilbert: Boolean = false,
      docMajor: Boolean = false): Seq[FileMeta] = {
    val nFiles = math.max(1L, (totalRecords + targetRecordsPerFile - 1) / targetRecordsPerFile).toInt
    val clustered =
      if (docMajor)
        df.repartitionByRange(nFiles, col("doc_id")).sortWithinPartitions(col("doc_id"))
      else
        withCurveKey(df, cfg, hilbert)
          .repartitionByRange(nFiles, col("_ck"), col("doc_id")) // doc_id = skew salt
          .sortWithinPartitions(col("_ck"), col("doc_id"))
          .drop("_ck")
    SeqIO.writeFiles(spark, table, clustered, clustered = true)
  }

  /** Compact+re-cluster an explicit file set into right-sized curve-sorted files and commit.
    * Copy-on-write: the input rows are rewritten byte-identically (same doc_id→tokens mapping),
    * only layout changes.
    */
  def compactFiles(
      spark: SparkSession,
      table: SeqTable,
      files: Seq[FileMeta],
      cfg: GridConfig,
      targetRecordsPerFile: Long,
      summary: Map[String, String] = Map.empty,
      hilbert: Boolean = false,
      maxAttempts: Int = 3): graft.table.Snapshot = {
    var attempt = 0
    while (true) {
      attempt += 1
      // apply outstanding merge-on-read deletes while rewriting — a raw rewrite would resurrect
      // deleted rows (new files outlive the deletes' sequence numbers). The commit validates that
      // no NEW delete manifest appeared since this plan (same resurrection hazard, concurrent
      // flavor) — on conflict we re-read and re-apply the newer deletes.
      val snap = table.currentSnapshot()
      val df = SeqIO.readWithDeletes(spark, table, snap, files)
      val total = files.map(_.records).sum
      val added = clusteredWrite(spark, table, df, cfg, targetRecordsPerFile, total, hilbert)
      try {
        return table.commit("compact", added, files.map(_.path).toSet,
          summary ++ Map("records" -> total.toString),
          plannedDeleteManifests = Some(snap.deleteManifests.toSet))
      } catch {
        case e: table.CommitConflictException =>
          added.foreach(f => java.nio.file.Files.deleteIfExists(
            java.nio.file.Paths.get(table.absolutePath(f))))
          if (attempt >= maxAttempts) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
