package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.functions.ZOrder

class GraftExtensionsSpec extends AnyFunSuite {

  test("zorder_key / hilbert_key are callable from SQL via SparkSessionExtensions") {
    // an isolated session so the extension injection is actually exercised (getOrCreate would
    // otherwise return the shared test session without extensions)
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions (not the static conf): the shared test SparkContext already exists, and
    // spark.sql.extensions is read from the context's static conf at session build time
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql("SELECT zorder_key(3, 5) AS z, hilbert_key(3, 5) AS h").head
      assert(r.getLong(0) === ZOrder.interleave(3, 5))
      assert(r.getLong(1) === ZOrder.hilbert(16, 3, 5))
      // inside a real query over data
      val n = spark.range(100)
        .selectExpr("zorder_key(cast(id % 8 AS int), cast(id / 8 AS int)) AS z")
        .distinct().count()
      assert(n === 100)
    } finally {
      // do not stop(): SparkContext is shared process-wide with the other suites
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
