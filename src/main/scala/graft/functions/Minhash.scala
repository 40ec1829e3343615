package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Single-pass MinHash signature kernel.
  *
  * The Column formulation — `array((0 until k).map(i => array_min(transform(h48s, affine_i))))` —
  * is a performance trap at the other end of the pipeline from the r03 shingle fix:
  * higher-order functions (`transform`/`array_min` lambdas) do NOT participate in whole-stage
  * codegen; each of the k passes walks the shingle array through interpreted, boxed evaluation
  * and allocates an intermediate array. Measured at sf0.1: the 32-pass signature was ~4 s of
  * q09's ~5 s warm runtime — ~430 ns per (shingle, permutation) op. This kernel computes all k
  * running minima in ONE unboxed pass (plain JVM loops, ~2 ns/op), invoked from a codegen'd
  * Catalyst expression so rows never leave the generated pipeline.
  */
object Minhash {

  private val MaxK = 4096
  // affine family tables, shared with the SQL-portable definition in [[Dedup]]
  private lazy val As: Array[Long] = Array.tabulate(MaxK)(Dedup.affineA)
  private lazy val Bs: Array[Long] = Array.tabulate(MaxK)(Dedup.affineB)

  /** sig[i] = min over non-null h of (h·a_i + b_i) mod 2^48 — identical semantics to
    * `array_min(transform(h48s, h => (h * affineA(i) + affineB(i)) % AffineMod))` per i,
    * including null-element skipping and the all-null/empty → null-elements edge.
    */
  def affineSignature(md48s: ArrayData, k: Int): ArrayData = {
    require(k <= MaxK, s"minhash k=$k exceeds $MaxK")
    val n = md48s.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var seen = false
    var j = 0
    while (j < n) {
      if (!md48s.isNullAt(j)) {
        seen = true
        val h = md48s.getLong(j)
        var i = 0
        while (i < k) {
          val v = (h * As(i) + Bs(i)) % Dedup.AffineMod
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!seen) new GenericArrayData(new Array[Any](k)) // nulls, as array_min over empty yields
    else new GenericArrayData(sig)
  }
}

/** Codegen'd Catalyst expression: `affine_minhash_sig(h48s: array<long>): array<long>` (length k).
  * On the q09/near-dup hot path — see [[Minhash]] for why this is an expression, not Columns.
  */
case class AffineMinhashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "affine_minhash_sig"
  override protected def nullSafeEval(arr: Any): Any =
    Minhash.affineSignature(arr.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Minhash.affineSignature($c, $k)")
  override protected def withNewChildInternal(c: Expression): AffineMinhashSig = copy(child = c)
}
