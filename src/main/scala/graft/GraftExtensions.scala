package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.expressions.Literal
import graft.functions.{AffineMinhashSig, CosineSim, HilbertKey, HyperplaneSketchAll,
  SimhashFromMd5, ZOrderKey}

/** Session extension registering the engine's Catalyst expressions as SQL functions:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * spark.sql("SELECT zorder_key(3, 5), cosine_sim(a.vec, b.vec)")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[ZOrderKey].getName, null, name, usage, "", "", "", "", "", "", "scala_udf")

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$fn expects a literal INT, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("zorder_key"),
      info("zorder_key", "zorder_key(x INT, y INT) - Morton-interleaved 64-bit curve key"),
      (args: Seq[Expression]) => ZOrderKey(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("hilbert_key"),
      info("hilbert_key", "hilbert_key(x INT, y INT) - Hilbert curve key (order 16)"),
      (args: Seq[Expression]) => HilbertKey(args(0), args(1), 16)))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a ARRAY<FLOAT|DOUBLE>, b) - fused single-pass cosine"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(h48s ARRAY<BIGINT>, k INT) - affine MinHash signature"),
      (args: Seq[Expression]) => AffineMinhashSig(args(0), intArg(args(1), "minhash_sig"))))
    e.injectFunction((
      FunctionIdentifier("simhash_md5"),
      info("simhash_md5", "simhash_md5(digests ARRAY<STRING>) - 64-bit SimHash of md5 digests"),
      (args: Seq[Expression]) => SimhashFromMd5(args(0))))
    e.injectFunction((
      FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets",
        "lsh_buckets(vec ARRAY<FLOAT|DOUBLE>, planes INT, tables INT, dims INT) - per-table hyperplane buckets"),
      (args: Seq[Expression]) => HyperplaneSketchAll(args(0),
        intArg(args(2), "lsh_buckets"), intArg(args(1), "lsh_buckets"),
        intArg(args(3), "lsh_buckets"))))
  }
}
