package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (SURVEY.md §5). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // 256-row columnar batches: a 4096-row batch over ~6k-token array rows is a ~100MB humongous
    // G1 allocation per task; 32 concurrent tasks fragment the old gen and every later full-table
    // decode degenerates into GC (measured: survivor-rewrite 1224 CPU-s -> 220 CPU-s)
    .config("spark.sql.parquet.columnarReaderBatchSize", "256")
    .config("spark.driver.host", "localhost")
    .getOrCreate()
}
