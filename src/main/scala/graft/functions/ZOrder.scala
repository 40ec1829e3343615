package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Space-filling-curve key math for re-clustering.
  *
  * The reference engine positions each point on a 2-D eps-grid
  * (`/root/reference/src/main/scala/SDL/definitions/GridIndexer.scala:15-19`); our engine positions each
  * row/file on the `(sourceBucket, ntokBin)` grid and orders rewrites along a space-filling curve so
  * that min/max file stats become tight 2-D bounding boxes → manifest pruning works on BOTH columns.
  *
  * Pure static methods so generated code (codegen) can call them directly.
  */
object ZOrder {

  /** Spread the lower 32 bits of x to the even bit positions of a 64-bit word. */
  def spread(x: Long): Long = {
    var v = x & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton / Z-order interleave of two non-negative 32-bit ints: x gets even bits, y odd bits. */
  def interleave(x: Int, y: Int): Long =
    spread(x.toLong) | (spread(y.toLong) << 1)

  /** Hilbert curve index of cell (x, y) on a 2^order × 2^order grid.
    * Iterative rotate-and-accumulate form of the public-domain conversion algorithm
    * (Hamilton, "Compact Hilbert Indices"; commonly published as `xy2d`).
    */
  def hilbert(order: Int, xIn: Int, yIn: Int): Long = {
    var rx = 0
    var ry = 0
    var d = 0L
    var x = xIn
    var y = yIn
    var s = 1 << (order - 1)
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      // rotate quadrant
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Codegen'd Catalyst expression: `zorder_key(x: int, y: int): long`.
  * Stays inside whole-stage codegen — used as the sort/range-partition key of every rewrite, so it
  * is on the 100-TB hot path.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave(x.asInstanceOf[Int], y.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrder.interleave($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrderKey =
    copy(left = l, right = r)
}

/** Codegen'd Catalyst expression: `hilbert_key(x: int, y: int): long` at a fixed curve order. */
case class HilbertKey(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.hilbert(order, x.asInstanceOf[Int], y.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrder.hilbert($order, $x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertKey =
    copy(left = l, right = r)
}

/** Column-API entry points. */
object curve {
  def zorderKey(x: Column, y: Column): Column =
    GraftSqlBridge.column(ZOrderKey(GraftSqlBridge.expression(x), GraftSqlBridge.expression(y)))
  def hilbertKey(x: Column, y: Column, order: Int = 16): Column =
    GraftSqlBridge.column(
      HilbertKey(GraftSqlBridge.expression(x), GraftSqlBridge.expression(y), order))
}
