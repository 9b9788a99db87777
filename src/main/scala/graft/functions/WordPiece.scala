package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece segmentation (Wu et al. 2016; the BERT tokenizer's
  * encode step) as a native codegen expression: GREEDY
  * LONGEST-MATCH-FIRST — the longest vocab piece prefixing the
  * remaining word is taken; continuation pieces carry the `##` mark
  * and live in their own namespace; a position with no match makes
  * the WHOLE word `[UNK]` (the all-or-nothing rule that
  * distinguishes WordPiece from BPE's merge replay (q140) and
  * UnigramLM's Viterbi (q202) — the tokenizer-family leg the repo
  * lacked).
  *
  * The vocab is a constructor literal (broadcast-sized, like the IVF
  * centroid literals): two hash sets (first-position / continuation)
  * built once per instance, greedy loop bounded by max piece length —
  * one in-row virtual call, whole-stage codegen, no shuffle.
  */
case class WordPieceTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected string, got $other")
  }

  @transient private lazy val firstPieces: Set[String] =
    vocab.filterNot(_.startsWith("##")).toSet
  @transient private lazy val contPieces: Set[String] =
    vocab.filter(_.startsWith("##")).map(_.substring(2)).toSet
  @transient private lazy val maxLen: Int = {
    val lens = firstPieces.map(_.length) ++ contPieces.map(_.length)
    if (lens.isEmpty) 1 else lens.max
  }

  def piecesOf(u: UTF8String): GenericArrayData = {
    val w = u.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var pos = 0
    var stuck = w.isEmpty
    while (pos < w.length && !stuck) {
      val inSet = if (pos == 0) firstPieces else contPieces
      var len = math.min(maxLen, w.length - pos)
      var found = -1
      while (len >= 1 && found < 0) {
        if (inSet.contains(w.substring(pos, pos + len))) found = len
        else len -= 1
      }
      if (found < 0) stuck = true
      else {
        val p = w.substring(pos, pos + found)
        out += UTF8String.fromString(if (pos == 0) p else "##" + p)
        pos += found
      }
    }
    if (stuck) new GenericArrayData(Array[Any](UTF8String.fromString("[UNK]")))
    else new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(v: Any): Any = piecesOf(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPiece", this,
      classOf[WordPieceTokens].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.piecesOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordPieceTokens = copy(child = newChild)
}

object WordPieceTokens {
  def apply(c: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(WordPieceTokens(ColumnBridge.expression(c), vocab))
}
