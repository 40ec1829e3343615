package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{HilbertKey, ZOrderKey}

/** Session extension registering the engine's Catalyst expressions as SQL functions:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * spark.sql("SELECT zorder_key(3, 5), hilbert_key(3, 5)")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[ZOrderKey].getName, null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("zorder_key"),
      info("zorder_key", "zorder_key(x INT, y INT) - Morton-interleaved 64-bit curve key"),
      (args: Seq[Expression]) => ZOrderKey(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("hilbert_key"),
      info("hilbert_key", "hilbert_key(x INT, y INT) - Hilbert curve key (order 16)"),
      (args: Seq[Expression]) => HilbertKey(args(0), args(1), 16)))
  }
}
