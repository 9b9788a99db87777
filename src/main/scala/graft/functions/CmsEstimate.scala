package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch, key)` — probe a serialized Count-Min sketch
  * for a key's frequency estimate, as a native scalar expression.
  *
  * Spark ships the BUILD side in SQL (`count_min_sketch(col, eps,
  * conf, seed)` aggregates to a binary blob) but no PROBE side: the
  * only way to read an estimate is `CountMinSketch.readFrom` on the
  * driver (q96 does exactly that; the reference's one-key point get is
  * main.go:268). This closes the loop — the estimate join stays a
  * distributed plan: sketch frame (1 row per group) × key frame, no
  * collect, no UDF.
  *
  * Deserializing per probe would swamp the probe cost, so the decoded
  * sketch is cached per (thread, byte-array identity): the common
  * plan probes MANY keys against ONE broadcast sketch blob, where the
  * array reference is stable within a partition.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType | ShortType | ByteType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"cms_estimate: expected (binary sketch, integral key), got $other")
    }

  @transient private lazy val cache =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  /** Hot path shared by eval and codegen. */
  def estimate(bytesAny: Any, keyAny: Any): Long = {
    val bytes = bytesAny.asInstanceOf[Array[Byte]]
    val cached = cache.get()
    val sketch =
      if (cached != null && (cached._1 eq bytes)) cached._2
      else {
        val s = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
        cache.set((bytes, s))
        s
      }
    sketch.estimateCount(keyAny.asInstanceOf[Number].longValue())
  }

  override def nullSafeEval(a: Any, b: Any): Any = estimate(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEst", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.estimate($a, $b);")
  }

  override def prettyName: String = "cms_estimate"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
