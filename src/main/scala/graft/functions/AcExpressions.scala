package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** AHO–CORASICK multi-pattern scanning (Aho–Corasick CACM'75) as a
  * codegen expression: ALL occurrence counts of a FIXED pattern set in
  * one pass over each row's text — the blocklist / PII-lexicon /
  * contamination-marker scan a curation pipeline runs over every
  * document. The naive spelling is k `replace`/`regexp` passes per row
  * (k corpus scans at 100 TB); the automaton is built ONCE per
  * operator instance (driver-side, pattern-set-bounded) and each row
  * costs O(|text| + matches) regardless of k.
  *
  * Matches are counted at EVERY position (overlapping included) — for
  * BORDERLESS patterns (no proper prefix that is also a suffix)
  * occurrences cannot overlap themselves, so the count provably equals
  * the non-overlapping `replace`-based count, which is what the DuckDB
  * oracle computes; the spec pins the overlapping case ("aa" in
  * "aaa" = 2) directly.
  */
object AhoCorasick {

  /** Immutable automaton: flat arrays, binary-searched transitions. */
  final class Automaton(
      val charStart: Array[Int], // node → start index into chars/next
      val chars: Array[Char], // sorted outgoing labels per node
      val next: Array[Int], // target node per label
      val fail: Array[Int],
      val outStart: Array[Int], // node → start index into outPat
      val outPat: Array[Int], // pattern indices ending at node (incl. via fail)
      val nPatterns: Int) extends Serializable {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (true) {
        val lo = charStart(s); val hi = charStart(s + 1)
        var l = lo; var r = hi - 1
        while (l <= r) {
          val m = (l + r) >>> 1
          if (chars(m) == c) return next(m)
          else if (chars(m) < c) l = m + 1
          else r = m - 1
        }
        if (s == 0) return 0
        s = fail(s)
      }
      0
    }

    /** Per-pattern ALL-occurrence counts over `text`. */
    def countAll(text: UTF8String): Array[Long] = {
      val counts = new Array[Long](nPatterns)
      val str = text.toString
      var state = 0
      var i = 0
      val n = str.length
      while (i < n) {
        state = step(state, str.charAt(i))
        var o = outStart(state)
        val oEnd = outStart(state + 1)
        while (o < oEnd) { counts(outPat(o)) += 1; o += 1 }
        i += 1
      }
      counts
    }
  }

  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty))
    // mutable trie
    val goto = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = goto(s).getOrElseUpdate(c, {
          goto += scala.collection.mutable.TreeMap.empty[Char, Int]
          ends += Nil
          goto.size - 1
        })
      }
      ends(s) = pi :: ends(s)
    }
    val nNodes = goto.size
    val fail = new Array[Int](nNodes)
    val out = Array.fill(nNodes)(List.empty[Int])
    (0 until nNodes).foreach(s => out(s) = ends(s))
    // BFS fail links; out inherits the fail target's out
    val queue = scala.collection.mutable.Queue.empty[Int]
    goto(0).values.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      goto(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !goto(f).contains(c)) f = fail(f)
        fail(v) = if (goto(f).contains(c) && goto(f)(c) != v) goto(f)(c) else 0
        out(v) = out(v) ++ out(fail(v))
        queue += v
      }
    }
    // flatten
    val charStart = new Array[Int](nNodes + 1)
    val outStart = new Array[Int](nNodes + 1)
    (0 until nNodes).foreach { s =>
      charStart(s + 1) = charStart(s) + goto(s).size
      outStart(s + 1) = outStart(s) + out(s).size
    }
    val chars = new Array[Char](charStart(nNodes))
    val next = new Array[Int](charStart(nNodes))
    val outPat = new Array[Int](outStart(nNodes))
    (0 until nNodes).foreach { s =>
      var i = charStart(s)
      goto(s).foreach { case (c, v) => chars(i) = c; next(i) = v; i += 1 }
      var o = outStart(s)
      out(s).foreach { pi => outPat(o) = pi; o += 1 }
    }
    new Automaton(charStart, chars, next, fail, outStart, outPat,
      patterns.size)
  }
}

/** `ac_match_counts(text)` — array of ALL-occurrence counts, one per
  * pattern, in pattern order. Codegen calls the shared hot loop via
  * an object reference (the [[SimHash64]] discipline).
  */
case class AcMatchCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected string, got $other")
    }

  @transient private lazy val automaton = AhoCorasick.build(patterns)

  /** Hot loop shared by eval and codegen. */
  def countsOf(s: UTF8String): ArrayData =
    new GenericArrayData(automaton.countAll(s))

  override def nullSafeEval(v: Any): Any = countsOf(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("acScan", this, classOf[AcMatchCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : AcMatchCounts = copy(child = newChild)
}

object AcMatchCounts {
  def apply(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AcMatchCounts(ColumnBridge.expression(text), patterns))
}
