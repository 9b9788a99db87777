package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `deflate_len(bytes)` — the DEFLATE-compressed length of a binary
  * value at a fixed level, as a native scalar expression. The
  * compressed/raw length ratio is the classic model-free degeneracy
  * signal of data-curation pipelines (highly repetitive or templated
  * text compresses far below prose; near-random noise refuses to
  * compress) — the compression-side complement of the explicit
  * repetition metrics (q126) and the bigram LM score (q202), catching
  * repetition patterns neither n-gram window sees.
  *
  * Determinism: fixed level, default strategy, raw (nowrap) stream —
  * DEFLATE output is a pure function of (input, settings,
  * implementation), and the gate consuming it (q269) pins relative
  * ORDER and range contracts rather than hashing raw lengths, so it is
  * robust even across zlib implementations.
  *
  * Scale shape: per-row scalar work inside the scan's own partitions —
  * no shuffle, no state; the Deflater is reused per thread (reset
  * between rows) because allocation, not compression, dominates at
  * short document lengths.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_len: expected binary, got $other")
  }

  @transient private lazy val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(DeflateLen.Level, true)
  }

  def compressedLen(bytesAny: Any): Long = {
    val bytes = bytesAny.asInstanceOf[Array[Byte]]
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override def nullSafeEval(a: Any): Any = compressedLen(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateLen", this, classOf[DeflateLen].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compressedLen($a);")
  }

  override def prettyName: String = "deflate_len"
  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  /** zlib default-compression level: the curation-filter convention —
    * ratios are compared against each other, so any fixed level works;
    * 6 is the speed/ratio default every zlib user gets.
    */
  val Level = 6
}
