package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array as ONE compact codegen expression.
  *
  * Why an expression and not the explode + 64-conditional-sums agg
  * spelling (DedupQueries.q42's original form): that plan explodes the
  * corpus to one row per token occurrence and shuffles it through a
  * 64-column hash aggregate; this expression computes the same bit
  * votes in a single pass over each row's token array — a narrow
  * projection with NO shuffle, which is the difference between a
  * corpus-wide exchange and a map-only stage at 100 TB.
  *
  * Per-token hashing goes through Spark's own [[XxHash64Function]] with
  * the default seed (42), so the result is bit-identical to
  * `xxhash64(token)`-based vote aggregation: one +1/−1 vote per token
  * OCCURRENCE (term-frequency weighting), bit b of the output set iff
  * its vote sum is positive.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected array<string>, got $other")
    }
  }

  /** Hot loop shared by eval and codegen (one virtual call per row). */
  def simhashOf(a: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = XxHash64Function.hash(a.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = simhashOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.simhashOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object TextFunctions {
  /** SimHash64 of a tokenized (array<string>) column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
