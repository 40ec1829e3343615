package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.planner.GridConfig
import graft.table.{SeqIO, SeqTable, Snapshot}

/** Maintenance op that turns outstanding merge-on-read equality deletes back into a clean
  * copy-on-write state: rewrite (with deletes applied) exactly the files that could still contain
  * a deleted key — pruned by manifest doc_id ranges + sequence numbers — then drop every delete
  * manifest in the same atomic commit. After it runs, reads take the no-join fast path again.
  */
object MaterializeDeletes {

  def run(
      spark: SparkSession,
      table: SeqTable,
      cfg: GridConfig,
      targetRecordsPerFile: Long,
      maxAttempts: Int = 3): Option[Snapshot] = {
    var attempt = 0
    while (true) {
      attempt += 1
      val snap = table.currentSnapshot()
      if (snap.deleteManifests.isEmpty) return None
      import spark.implicits._

      val live = table.liveFiles(snap)
      val dels = SeqIO.deletesDF(spark, table, snap)
        .select(col("_del_key").as("key"), col("_del_seq").as("seq"))

      // candidates: files old enough for some delete to apply AND whose key range can contain it
      val fileRanges = spark.createDataset(live.map(f => (f.path, f.minDocId, f.maxDocId, f.addedAt)))
        .toDF("path", "min_doc", "max_doc", "added")
      val candidatePaths = fileRanges
        .join(broadcast(dels),
          col("key").between(col("min_doc"), col("max_doc")) && col("seq") > col("added"))
        .select("path").distinct().as[String].collect().toSet
      val candidates = live.filter(f => candidatePaths.contains(f.path))

      val added =
        if (candidates.isEmpty) Nil
        else {
          val df = SeqIO.readWithDeletes(spark, table, snap, candidates)
          Rewrite.clusteredWrite(spark, table, df, cfg, targetRecordsPerFile,
            candidates.map(_.records).sum)
        }
      try {
        // the planned-manifest validation conflicts if a concurrent MoR merge added deletes since
        // our plan (our rewritten files would escape them; dropping only OUR planned manifests
        // would still leave the new one half-applied) — replan with them included
        return Some(table.commit("materialize-deletes", added, candidatePaths,
          Map("delete-manifests-dropped" -> snap.deleteManifests.size.toString),
          removedDeleteManifests = snap.deleteManifests.toSet,
          plannedDeleteManifests = Some(snap.deleteManifests.toSet)))
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
