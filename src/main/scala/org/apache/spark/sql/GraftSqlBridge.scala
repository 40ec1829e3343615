package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor for `private[sql]` Column↔Expression plumbing (Spark 4 moved Column onto
  * ColumnNode; `classic.ExpressionUtils` is the sanctioned internal bridge). Lives in the
  * org.apache.spark.sql package purely for visibility — no Spark code is modified.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-wrap a batch DataFrame as a STREAMING one (`isStreaming = true`) — what a V1
    * `execution.streaming.Source.getBatch` must return (MicroBatchExecution asserts it).
    * `internalCreateDataFrame` is `private[sql]`; this is the same wrapping FileStreamSource
    * applies to its own per-batch scans. The inner plan is captured lazily (`toRdd` plans but
    * does not execute), so the micro-batch still runs as one whole-stage-codegen'd Spark job.
    */
  def asStreamingDataFrame(df: Dataset[Row]): Dataset[Row] = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    c.sparkSession.internalCreateDataFrame(c.queryExecution.toRdd, c.schema, isStreaming = true)
  }

  /** The inverse for a V1 `Sink.addBatch` input: the DataFrame Spark hands a sink carries the
    * micro-batch's INCREMENTAL (streaming) plan, on which batch actions like `df.write` are
    * rejected — re-wrap its rows as a plain batch DataFrame (the standard V1-sink pattern).
    */
  def asBatchDataFrame(df: Dataset[Row]): Dataset[Row] = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    c.queryExecution.logical match {
      // a bare [[asStreamingDataFrame]] wrapper (e.g. a Source.getBatch result inspected
      // outside a running query): flip the leaf back — its own QueryExecution would refuse
      // any batch action (checkForBatch) before toRdd could even plan
      case l: execution.LogicalRDD if l.isStreaming =>
        classic.Dataset.ofRows(c.sparkSession,
          l.copy(isStreaming = false)(c.sparkSession, None, None))
      case _ =>
        c.sparkSession.internalCreateDataFrame(c.queryExecution.toRdd, c.schema,
          isStreaming = false)
    }
  }

  /** One recognized comparison conjunct of a predicate: `attr <op> literal`, attribute-first
    * (literal-first inputs arrive flipped). `op` ∈ {=, >, >=, <, <=}.
    */
  final case class Comparison(op: String, attr: String, value: Any)

  /** The top-level AND conjuncts of a predicate Column that are simple attribute-vs-literal
    * comparisons — the shape manifest pruning can use. Unrecognized conjuncts are dropped
    * (sound for pruning: fewer hints only widen the scan; the caller re-applies the full
    * predicate). Lives here because Spark 4's ColumnNode classes are `private[sql]`.
    */
  def comparisonConjuncts(c: Column): Seq[Comparison] = {
    import org.apache.spark.sql.internal.{ColumnNode, Literal, UnresolvedAttribute, UnresolvedFunction}
    def conjuncts(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: UnresolvedFunction if f.functionName.equalsIgnoreCase("and") =>
        f.arguments.flatMap(conjuncts)
      case other => Seq(other)
    }
    val flip = Map(">=" -> "<=", "<=" -> ">=", ">" -> "<", "<" -> ">", "=" -> "=")
    conjuncts(c.node).flatMap {
      case f: UnresolvedFunction if flip.contains(f.functionName) && f.arguments.size == 2 =>
        (f.arguments.head, f.arguments(1)) match {
          case (a: UnresolvedAttribute, l: Literal) =>
            a.nameParts.lastOption.map(n => Comparison(f.functionName, n.toLowerCase, l.value))
          case (l: Literal, a: UnresolvedAttribute) =>
            a.nameParts.lastOption.map(n =>
              Comparison(flip(f.functionName), n.toLowerCase, l.value))
          case _ => None
        }
      case _ => None
    }
  }
}
