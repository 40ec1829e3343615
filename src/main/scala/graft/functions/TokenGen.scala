package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Single-pass synthetic token-stream kernel for the fixture generator.
  *
  * The Column formulation — `transform(sequence(1, count), i => pmod(hash(id, i), 50304))` — is
  * the same interpreted-HOF trap as the minhash signature ([[Minhash]]): `ArrayTransform` is
  * CodegenFallback, so every element pays a boxed, interpreted evaluation of the lambda
  * (measured at bench scale: ~5 s of m_ingest's ~9 s is pure generation, ~25 ns/element for
  * what is one murmur3 round + a pmod). This kernel emits the identical values in one unboxed
  * loop — the loop-invariant `hashLong(id, 42)` prefix is hoisted, each element is one
  * `hashInt` + pmod — and materializes straight into an UnsafeArrayData (no per-element boxing,
  * no intermediate `sequence` array).
  *
  * Bit-exact contract (SeqGenParitySpec): `hash(id, i)` = murmur3 seed 42, long child then int
  * child; `pmod(h, m)` = `((h % m) + m) % m`; `sequence(1, c)` counts DOWN when `c < 1`
  * (Spark's default-step rule), which the kernel reproduces so any tokensScale input matches.
  */
object TokenGen {

  val Modulo: Int = 50304

  def stream(id: Long, count: Int): ArrayData = {
    val seed = Murmur3_x86_32.hashLong(id, 42)
    val desc = count < 1
    val len = if (desc) 1 - count + 1 else count
    val out = new Array[Int](len)
    var i = 0
    while (i < len) {
      val v = if (desc) 1 - i else i + 1
      val h = Murmur3_x86_32.hashInt(v, seed)
      var r = h % Modulo
      if (r < 0) r += Modulo
      out(i) = r
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Codegen'd Catalyst expression: `token_stream(id: long, count: int): array<int>` — the fixture
  * generator's payload column (see [[TokenGen]] for why this is an expression, not Columns).
  */
case class TokenStream(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a bigint id, got ${left.dataType.catalogString}")
    else if (right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an int count, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_stream"
  override protected def nullSafeEval(id: Any, count: Any): Any =
    TokenGen.stream(id.asInstanceOf[Long], count.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, c) => s"graft.functions.TokenGen.stream($id, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TokenStream =
    copy(left = l, right = r)
}
