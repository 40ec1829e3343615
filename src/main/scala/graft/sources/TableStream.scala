package graft.sources

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.table.{SeqIO, SeqTable}

/** `spark.readStream.format("graft")` — the engine's table as a native Structured Streaming
  * source, so a downstream training-data pipeline composes the changelog with Spark's own
  * streaming machinery (watermarks, windowed aggregation, `foreachBatch`, checkpoint recovery)
  * instead of hand-rolling a poll loop around [[ChangeFeed]].
  *
  * Offsets ARE table versions: `getOffset` is the table head, and batch `(start, end]` maps to
  * the commit range `(startVersion, endVersion]` — exactly-once delivery falls out of Spark's
  * offset log (a restarted query replays the last uncommitted range; version-ranged reads are
  * deterministic). Two modes:
  *
  *   - `mode=appends` (default): the append changelog ([[SeqIO.readAppendedBetween]]) — rows in
  *     the order commits appended them, with ONLY append-family commits contributing (Iceberg's
  *     incremental append scan): compaction moves rows it already delivered, and merge/DML
  *     rewrites are invisible here — use `mode=cdc` when upserts must surface. The
  *     streaming-ingest shape: "every sequence ever appended, once".
  *   - `mode=cdc`: the NET row-level diff of the range ([[SeqIO.tableDiff]]) with a leading
  *     `change_type` (`D`/`I`) column — deletes and updates surface, a mirror consumer applies
  *     each micro-batch as a MERGE (cf. [[ChangeFeed.consumeInto]]).
  *
  * `startingVersion` = number (default 0 — full history) | `latest` (only commits after the
  * FIRST start; the resolved version is pinned under the query's own metadata dir so restarts
  * from the checkpoint keep the original meaning). `maxVersionsPerTrigger` = N caps each
  * micro-batch at N commits (best-effort, Delta's maxFilesPerTrigger contract) — the backfill
  * of a huge table streams as bounded batches instead of one. The schema is pinned at stream
  * start (Spark
  * streams are fixed-schema): columns added to the table mid-stream are dropped until restart,
  * dropped ones null-fill — Delta's contract.
  *
  * Retention: version-ranged reads need their endpoint snapshots retained; `expireSnapshots`
  * past a stream's checkpointed offset fails the next batch LOUDLY (missing snapshot), never
  * silently skips — keep expiry behind the slowest consumer, same as Iceberg CDC.
  *
  * Scale: each micro-batch is the engine's own vectorized-parquet range read (the distributed
  * metadata diff above 100k files for cdc mode) — the source adds no per-row driver work; the
  * only driver state is one Long offset.
  */
class GraftSourceProvider extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {
  import GraftTableSource._

  override def shortName(): String = "graft"

  /** `df.writeStream.format("graft").option("path", dir)` — the table as a native streaming
    * SINK: each micro-batch appends through the engine's exactly-once discipline (batch-id
    * high-water mark advanced in the SAME commit as the batch's files — [[Ingest
    * .StreamBatcher]], the `Ingest.stream` machinery behind the standard sink API). The target
    * table is created on first use. Multiple queries writing ONE table must set distinct
    * `queryTag` options (the HWM is per-tag). Append output mode only — updates route through
    * MERGE/[[ChangeFeed]], not a streaming sink.
    */
  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft sink supports Append output mode only, got $outputMode")
    val dir = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft sink: option 'path' (the table directory) is required"))
    val table =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "metadata"))) new SeqTable(dir)
      else SeqTable.create(dir)
    val tag = parameters.getOrElse("querytag", parameters.getOrElse("queryTag", "sink"))
    new GraftTableSink(table, s"stream-batch-$tag")
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), streamSchema(tableOf(parameters), modeOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val table = tableOf(parameters)
    val mode = modeOf(parameters)
    val starting = parameters.get("startingversion").orElse(parameters.get("startingVersion")) match {
      case Some("latest") => resolveLatestOnce(sqlContext.sparkSession, metadataPath, table)
      case Some(v) => v.toLong
      case None => 0L
    }
    val maxVersions = parameters.get("maxversionspertrigger")
      .orElse(parameters.get("maxVersionsPerTrigger")).map(_.toLong)
    require(maxVersions.forall(_ > 0), "graft source: maxVersionsPerTrigger must be > 0")
    new GraftTableSource(sqlContext.sparkSession, table, mode, starting,
      streamSchema(table, mode), maxVersions, Some(metadataPath))
  }

  /** `startingVersion=latest` means "commits after the FIRST start of this query" — createSource
    * runs again on every restart, so the resolved head is pinned as a file in the query's own
    * source-metadata dir (the offset log's sibling; Spark hands each source this path for
    * exactly this). A crash between resolve and pin just re-resolves — the pin only fixes the
    * skip-history point; delivery exactly-once is the offset log's job.
    */
  private def resolveLatestOnce(spark: SparkSession, metadataPath: String,
      table: SeqTable): Long = {
    val p = new org.apache.hadoop.fs.Path(metadataPath, "graft-starting-version")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim.toLong
      finally in.close()
    } else {
      val v = table.currentVersion()
      fs.mkdirs(p.getParent)
      val out = fs.create(p, false) // no-overwrite: a concurrent first-start loses cleanly
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      v
    }
  }
}

object GraftTableSource {
  val ModeAppends = "appends"
  val ModeCdc = "cdc"

  private[sources] def tableOf(parameters: Map[String, String]): SeqTable = {
    val dir = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source: option 'path' (the table directory) is required"))
    new SeqTable(dir)
  }

  private[sources] def modeOf(parameters: Map[String, String]): String = {
    val m = parameters.getOrElse("mode", ModeAppends).toLowerCase
    require(m == ModeAppends || m == ModeCdc, s"graft source: mode must be appends|cdc, got $m")
    m
  }

  /** cdc batches lead with change_type; both modes then carry the table schema at stream start. */
  private[sources] def streamSchema(table: SeqTable, mode: String): StructType = {
    val base = table.currentSchema()
    if (mode == ModeCdc) StructType(StructField("change_type", StringType, nullable = false) +: base.fields)
    else base
  }
}

class GraftTableSource(spark: SparkSession, table: SeqTable, mode: String,
    startingVersion: Long, pinned: StructType,
    maxVersionsPerTrigger: Option[Long] = None,
    metadataPath: Option[String] = None) extends Source {
  import GraftTableSource._

  override def schema: StructType = pinned

  /** Offsets round-trip through Spark's offset log as JSON — after a restart they arrive as
    * SerializedOffset, so parse the json form rather than matching on LongOffset.
    */
  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  /** Rate-limit floor: the highest version this source has handed to a batch. Advanced by
    * getBatch (including the recovery replay, whose START is the offset log's truth — so a
    * restart can never re-deliver below the checkpoint even though this field starts cold).
    *
    * With maxVersionsPerTrigger set, a COLD floor after restart is not merely a throughput
    * hiccup — it can wedge the stream forever: getOffset offers startingVersion+m, which can sit
    * BELOW the checkpointed committed offset c; Spark runs the degenerate (c, s+m] batch once
    * and COMMITS offset s+m (regressing its own log), and after a second restart
    * offered == committed == s+m so no batch ever runs again — the floor only advances inside
    * getBatch. So the delivered high-water mark is PERSISTED under the query's own
    * source-metadata dir (the `startingVersion=latest` pin's sibling) on every getBatch and the
    * floor is seeded from it here: a restarted source never offers below what it already
    * delivered. Best-effort durability is enough — losing the file only reintroduces the
    * (recoverable-by-one-more-restart-free) cold-floor window, never duplicate delivery, which
    * stays the offset log's + getBatch clamp's job.
    */
  @volatile private var floor: Long = math.max(startingVersion, readPersistedFloor())

  private def floorPath: Option[org.apache.hadoop.fs.Path] =
    metadataPath.map(p => new org.apache.hadoop.fs.Path(p, "graft-floor"))

  private def readPersistedFloor(): Long = floorPath match {
    case None => Long.MinValue
    case Some(p) =>
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Long.MinValue
      else {
        val in = fs.open(p)
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim.toLong
        finally in.close()
      }
  }

  private def persistFloor(v: Long): Unit = floorPath.foreach { p =>
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, s".graft-floor.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // write-new + delete-old + rename: HDFS-style rename refuses to overwrite, so the old pin is
    // removed first — a crash in the gap just loses the pin (cold-floor window re-opens; never
    // duplicate delivery, which stays the offset log's + getBatch clamp's job)
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
    ()
  }

  override def getOffset: Option[Offset] = {
    val head = table.currentVersion() // re-reads the version pointer: no driver-side staleness
    // maxVersionsPerTrigger caps each micro-batch at N COMMITS past the floor — batch 0 of a
    // 10^12-row table must be a sequence of bounded batches, not one giant one. Best-effort
    // (Delta's maxFilesPerTrigger contract): right after a restart the cold floor can make
    // this offer an offset below (then, once re-anchored, above) the checkpointed one for a
    // batch or two — getBatch's floor clamp keeps delivery exactly-once through that.
    val capped = maxVersionsPerTrigger.map(m => math.min(head, floor + m)).getOrElse(head)
    if (capped <= math.max(startingVersion, floor)) None else Some(LongOffset(capped))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from0 = start.map(versionOf).getOrElse(startingVersion)
    val to = versionOf(end)
    // Never deliver below the floor. After a restart with the cap on, the cold floor makes
    // getOffset offer an offset BELOW the checkpointed one (Spark's log holds the committed
    // offset, this source doesn't); Spark runs (committed, low] — empty here, and the floor
    // absorbs `committed` from the start argument — and a later (low, head] request must not
    // re-deliver the (low, committed] prefix this stream already consumed. Clamping the start
    // to the floor makes that redelivery structurally impossible; the recovery replay of the
    // last uncommitted batch is unaffected (it runs first, while the floor is still cold).
    val from = math.max(from0, math.min(floor, to))
    val advanced = math.max(floor, math.max(from0, to))
    if (advanced > floor) { floor = advanced; persistFloor(advanced) }
    val raw = mode match {
      case ModeAppends =>
        if (from >= to) SeqIO.readAppendedBetween(spark, table, to, to) // empty, schema-correct
        else SeqIO.readAppendedBetween(spark, table, from, to)
      case ModeCdc => SeqIO.tableDiff(spark, table, math.min(from, to), to)
    }
    // conform to the pinned stream schema: mid-stream add-column → dropped until restart;
    // mid-stream drop-column → null-filled; mid-stream RENAME → the raw batch speaks the NEW
    // name while the pin holds the OLD one, so each pinned field resolves through the batch-end
    // schema's former-name history ([[graft.table.SeqSchema.formerNames]]) to its current
    // physical name — a bare name match would silently null-fill the column until restart
    val endSchema = table.schemaOf(table.snapshot(to))
    val cols = pinned.fields.toSeq.map { f =>
      val physical = endSchema.fields
        .find(g => g.name.equalsIgnoreCase(f.name) ||
          graft.table.SeqSchema.formerNames(g).exists(_.equalsIgnoreCase(f.name)))
        .map(_.name).getOrElse(f.name)
      if (raw.columns.contains(physical)) col(physical).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    GraftSqlBridge.asStreamingDataFrame(raw.select(cols: _*))
  }

  override def commit(end: Offset): Unit = () // retention is the table's expiry policy, not ours

  override def stop(): Unit = ()
}

/** The V1 sink behind `writeStream.format("graft")` — see [[GraftSourceProvider.createSink]].
  * `addBatch` receives the micro-batch under its INCREMENTAL streaming plan, which batch
  * actions reject; it is re-wrapped as a plain batch DataFrame (the standard V1-sink pattern)
  * and appended through the exactly-once [[Ingest.StreamBatcher]].
  */
class GraftTableSink(table: SeqTable, hwmKey: String) extends Sink {
  private val batcher = new Ingest.StreamBatcher(table, hwmKey)
  override def addBatch(batchId: Long, data: DataFrame): Unit =
    batcher(GraftSqlBridge.asBatchDataFrame(data), batchId)
  override def toString: String = s"GraftTableSink(${table.root})"
}
