package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Rewrite
import graft.planner.GridConfig
import graft.table.{SeqIO, SeqTable, Snapshot}

/** Batch + streaming ingestion into a [[SeqTable]] — the engine's source connectors, replacing the
  * reference's JDBC→CSV cache pipeline (`/root/reference/src/main/scala/SDL/main/main.java:19-46`,
  * `Run.scala:67-68`) with committed snapshot appends.
  */
object Ingest {

  /** Normalize an arbitrary DataFrame to the table schema (default: the base sequence schema):
    * requires doc_id/tokens/source; derives n_tok when missing; casts token elements to int; a
    * string tokens column (the reference's `;`-delimited convention, from CSV or JDBC) is split
    * first. Evolved columns the input doesn't carry null-fill (nullable by construction).
    */
  def conform(df0: DataFrame,
      schema: org.apache.spark.sql.types.StructType = graft.table.SeqSchema.schema): DataFrame = {
    val df = df0.toDF(df0.columns.map(_.toLowerCase): _*) // JDBC dialects (derby…) uppercase names
    // the null-fill below is for EVOLVED columns only — the base columns are the engine's row
    // identity and payload (doc_id merge key, tokens, source); a batch missing one must fail
    // loudly here, not append rows with null merge keys that no merge/delete can ever target
    // (and whose null doc_id would corrupt per-file doc_id stats). n_tok alone derives.
    val requiredBase = graft.table.SeqSchema.schema.fieldNames
      .filterNot(_.equalsIgnoreCase("n_tok")).map(_.toLowerCase)
    val missingBase = requiredBase.filterNot(df.columns.contains)
    require(missingBase.isEmpty,
      s"input batch missing required base column(s): ${missingBase.mkString(", ")}")
    val split0 =
      if (df.schema("tokens").dataType == org.apache.spark.sql.types.StringType)
        df.withColumn("tokens", split(col("tokens"), ";"))
      else df
    val withNtok =
      if (split0.columns.contains("n_tok")) split0
      else split0.withColumn("n_tok", size(col("tokens")))
    val present = withNtok.columns.toSet // lowercased above
    // a producer still writing a RENAMED column's old name must fail loudly: conform would
    // otherwise silently drop its values and null-fill the current name (rename is metadata-only
    // for the TABLE's files; incoming batches must speak the current schema)
    graft.table.SeqSchema.requireNoStaleNames(schema, present, "input batch")
    withNtok.select(schema.fields.toSeq.map { f =>
      (if (present.contains(f.name.toLowerCase)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
  }

  /** Append a batch, curve-clustered on write (cheap insurance: appends arrive pre-sorted, so the
    * planner rarely needs to touch them again).
    */
  def appendClustered(spark: SparkSession, table: SeqTable, df: DataFrame, cfg: GridConfig,
      targetRecordsPerFile: Long): Snapshot = {
    val conformed = conform(df, table.currentSchema())
    val n = conformed.count()
    val metas = Rewrite.clusteredWrite(spark, table, conformed, cfg, targetRecordsPerFile, n)
    table.commit("append", metas, Set.empty, Map("records" -> n.toString))
  }

  /** Plain (unclustered) append — fastest path, leaves layout work to the maintenance planner. */
  def append(spark: SparkSession, table: SeqTable, df: DataFrame): Snapshot = {
    val metas = SeqIO.writeFiles(spark, table, conform(df, table.currentSchema()))
    table.commit("append", metas, Set.empty)
  }

  /** Append onto a BRANCH ([[SeqTable.createBranch]]): same write + conform, the commit lands on
    * the branch's own CAS chain — main readers never see it until [[SeqTable.fastForward]].
    */
  def appendToBranch(spark: SparkSession, table: SeqTable, name: String,
      df: DataFrame): Snapshot = {
    val metas = SeqIO.writeFiles(spark, table, conform(df, table.currentSchema()))
    table.commit("append", metas, Set.empty, ref = name)
  }

  /** WRITE-AUDIT-PUBLISH append: materialize the batch and STAGE it ([[SeqTable.stageCommit]])
    * without touching the version chain — invisible to every reader until
    * `table.publishStaged(id)` adopts it (exactly once), or reclaimed by
    * `table.discardStaged(id)` when the audit rejects it. Audit reads via [[SeqIO.readStaged]].
    * Returns the stage id.
    */
  def appendStaged(spark: SparkSession, table: SeqTable, df: DataFrame): String = {
    val metas = SeqIO.writeFiles(spark, table, conform(df, table.currentSchema()))
    table.stageCommit("append", metas)
  }

  /** CSV ingest: `doc_id,tokens,source` with tokens as `;`-delimited ints — the reference's
    * delimited-string-as-array convention (`/root/reference/src/main/scala/SDL/main/Run.scala:71-76`).
    */
  def fromCsv(spark: SparkSession, table: SeqTable, path: String): Snapshot = {
    val raw = spark.read.option("header", "true").csv(path)
    append(spark, table, raw
      .withColumn("tokens", split(col("tokens"), ";").cast("array<int>")))
  }

  def fromParquet(spark: SparkSession, table: SeqTable, path: String): Snapshot =
    append(spark, table, spark.read.parquet(path))

  /** JDBC ingest — the reference's actual source (`/root/reference/src/main/scala/SDL/main/
    * main.java:19-46` pulls Proteus tables over JDBC into its CSV cache). Partitioned reads are
    * the caller's choice via `options` (partitionColumn/lowerBound/upperBound/numPartitions).
    */
  def fromJdbc(spark: SparkSession, table: SeqTable, url: String, dbtable: String,
      options: Map[String, String] = Map.empty): Snapshot = {
    val props = new java.util.Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    append(spark, table, spark.read.jdbc(url, dbtable, props))
  }

  def fromJson(spark: SparkSession, table: SeqTable, path: String): Snapshot =
    append(spark, table, spark.read.json(path))

  /** Structured-streaming ingestion: every micro-batch becomes one atomic snapshot commit
    * (transactional streaming append — readers never see a partial batch).
    *
    * IDEMPOTENT across micro-batch replay: a crash between `table.commit` and Spark's offset
    * commit redelivers the same batchId on restart. Each commit stamps its batch id (keyed by a
    * per-checkpoint tag, so several streams can share one table) into the TABLE PROPERTIES — the
    * same atomic write as the data, and carried forward by every later commit — so the high-water
    * mark survives snapshot EXPIRY (recovering it from per-snapshot summaries did not: expire the
    * stream-append snapshots between a crash and the restart and the batch would re-append,
    * duplicating rows). Replayed batches at or below the recovered mark are skipped.
    */
  /** One exactly-once micro-batch appender (shared by [[stream]] and the
    * `writeStream.format("graft")` sink, [[GraftTableSink]]): batch ids at or below the
    * recovered high-water mark are SKIPPED (replay after crash), fresh ones commit their files
    * with the HWM advanced in the SAME atomic commit — there is no window in which rows are
    * visible but the batch is replayable, or vice versa. The HWM lives in table PROPERTIES
    * (carried forward by every commit, durable across snapshot expiry).
    */
  private[sources] final class StreamBatcher(table: SeqTable, key: String) {
    private val hwm = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    private val recovered = new java.util.concurrent.atomic.AtomicBoolean(false)
    def apply(batch: DataFrame, batchId: Long): Unit = {
      if (recovered.compareAndSet(false, true)) {
        // head properties first (durable across expiry); legacy summaries as a fallback for
        // tables written before properties existed
        val fromProps = table.currentSnapshot().properties.get(key).map(_.toLong)
        val fromSummaries = table.snapshotVersions().map(table.snapshot)
          .flatMap(_.summary.get(key)).map(_.toLong)
        hwm.set((fromProps.toSeq ++ fromSummaries).foldLeft(Long.MinValue)(math.max))
      }
      if (batchId > hwm.get && !batch.isEmpty) {
        val metas = SeqIO.writeFiles(batch.sparkSession, table,
          conform(batch, table.currentSchema()))
        table.commit("stream-append", metas, Set.empty,
          Map("batch-id" -> batchId.toString),
          propertyUpdates = Map(key -> batchId.toString))
        hwm.set(batchId)
        ()
      }
    }
  }

  def stream(spark: SparkSession, table: SeqTable, source: DataFrame,
      checkpointDir: String): StreamingQuery = {
    val tag = Integer.toHexString(checkpointDir.hashCode)
    val batcher = new StreamBatcher(table, s"stream-batch-$tag")
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) => batcher(batch, batchId) }
      .start()
  }

  /** Result export sink (reference S4/S5 stdout/WKT analog): write any result DataFrame as
    * parquet or CSV.
    *
    * CSV with `singleFile = true` (the default, a convenience for small result sets — one file,
    * one header) serializes the WHOLE export through a single task; for a large export pass
    * `singleFile = false` to keep the write parallel (one header per part file, the standard
    * Spark CSV layout — every part is independently parseable with `header=true`).
    */
  def export(df: DataFrame, path: String, format: String = "parquet",
      singleFile: Boolean = true): Unit = format match {
    case "csv" =>
      val out = if (singleFile) df.coalesce(1) else df
      out.write.mode("overwrite").option("header", "true").csv(path)
    case _ => df.write.mode("overwrite").parquet(path)
  }
}
