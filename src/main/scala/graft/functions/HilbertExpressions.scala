package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `hilbert_xy2d(x, y)` — Hilbert-curve index of a 2-D cell, as a
  * native codegen'd expression (SQL-registered next to `simhash64`
  * etc.). Inputs are 16-bit quantized coordinates (the q125
  * `quantize16` discipline); output is the distance along the
  * 2^16 × 2^16 Hilbert curve, a LongType ready for
  * `repartitionByRange` + `sortWithinPartitions`.
  *
  * Why a second curve next to Morton (ZOrderQueries.zvalue): both give
  * per-file hyper-rectangle locality, but Morton takes long diagonal
  * JUMPS between quadrant boundaries — consecutive z-values can be
  * grid-distant, so a file's covered region can be two disconnected
  * tiles and its min/max box wider than its row count warrants. The
  * Hilbert curve is fully adjacency-preserving (consecutive d are
  * always grid neighbors — HilbertCurveSpec proves it exhaustively),
  * so every contiguous d-range is one CONNECTED region: per-file
  * bounding boxes tighten, which is the entire currency of min-max
  * pruning. The cost is that d is no longer a bit-interleave but the
  * standard quadrant-rotation walk (Hamilton 2006 compact Hilbert
  * indices; the classic Wikipedia xy2d form) — 16 iterations of
  * branch-light integer ops, still one codegen-fused column.
  */
case class HilbertXY2D(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"hilbert_xy2d: expected (bigint, bigint) quantized coords, got $other")
    }

  /** Order of the curve: 16-bit coordinates, 32-bit distances. */
  val Order = 16

  /** Hot loop shared by eval and codegen (one virtual call per row). */
  def hilbertOf(x0: Long, y0: Long): Long = HilbertXY2D.xy2d(Order, x0, y0)

  override def nullSafeEval(a: Any, b: Any): Any =
    hilbertOf(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hilbert", this, classOf[HilbertXY2D].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.hilbertOf($a, $b);")
  }

  override def prettyName: String = "hilbert_xy2d"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertXY2D =
    copy(left = newLeft, right = newRight)
}

object HilbertXY2D {
  /** Order-parametric xy2d so the spec can exhaustively prove bijection
    * + adjacency on a small curve; production sits at order 16.
    */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << order) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the quadrant so the child curve is oriented correctly
      if (ry == 0L) {
        if (rx == 1L) {
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
