package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Porter stemmer (M. F. Porter 1980, "An algorithm for suffix
  * stripping", Program 14(3)) — implemented from the paper's rule
  * tables: words are viewed as [C](VC)^m[V], each of the five steps
  * strips or rewrites the LONGEST matching suffix whose measure/shape
  * condition holds on the remaining stem. 'y' is a consonant at
  * position 0 and after a vowel, a vowel after a consonant (the
  * paper's cons() definition). Everything is pure per-word character
  * arithmetic — no tables beyond the rule lists, no allocation except
  * the output buffer — so the expression stays inside whole-stage
  * codegen as a single virtual call per row.
  */
object PorterStemmer {

  def stem(word: String): String = {
    val w = word.toLowerCase
    if (w.length <= 2) return w
    // +1 headroom: rewrite rules can grow past the matched suffix by
    // at most one char (e.g. hop→hope via the *o rule)
    val b = new Array[Char](w.length + 1)
    w.getChars(0, w.length, b, 0)
    val s = new Stemmer(b, w.length - 1)
    s.step1ab(); s.step1c(); s.step2(); s.step3(); s.step4(); s.step5()
    new String(s.b, 0, s.k + 1)
  }

  private final class Stemmer(val b: Array[Char], var k: Int) {
    /** end of the candidate stem (set by ends()) */
    private var j: Int = 0

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** the measure m of b[0..j]: number of VC sequences */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1 // optional leading C run
      if (i > j) return 0
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1 // vowel run
        if (i > j) return n
        i += 1; n += 1 // ...ended by a consonant: one VC
        while (i <= j && cons(i)) i += 1 // consonant run
        if (i > j) return n
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = (0 to j).exists(i => !cons(i))

    private def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** consonant-vowel-consonant ending at i, last consonant not
      * w/x/y — the *o condition */
    private def cvc(i: Int): Boolean =
      i >= 2 && cons(i) && !cons(i - 1) && cons(i - 2) &&
        b(i) != 'w' && b(i) != 'x' && b(i) != 'y'

    private def ends(s: String): Boolean = {
      val len = s.length
      if (len > k + 1) return false
      var i = 0
      while (i < len) {
        if (b(k - len + 1 + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - len
      true
    }

    private def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    private def r(s: String): Unit = if (m() > 0) setTo(s)

    /** step 1ab: plurals and -ed/-ing */
    def step1ab(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          val c = b(k)
          if (c != 'l' && c != 's' && c != 'z') k -= 1
        } else {
          j = k
          if (m() == 1 && cvc(k)) setTo("e")
        }
      }
    }

    /** step 1c: y→i when the stem has a vowel */
    def step1c(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** step 2: double/triple suffixes → simpler form, m>0 */
    def step2(): Unit = if (k >= 1) (b(k - 1): @annotation.switch) match {
      case 'a' =>
        if (ends("ational")) r("ate")
        else if (ends("tional")) r("tion")
      case 'c' =>
        if (ends("enci")) r("ence")
        else if (ends("anci")) r("ance")
      case 'e' =>
        if (ends("izer")) r("ize")
      case 'l' =>
        if (ends("bli")) r("ble") // the paper's noted DEPARTURE: abli→able
        else if (ends("alli")) r("al")
        else if (ends("entli")) r("ent")
        else if (ends("eli")) r("e")
        else if (ends("ousli")) r("ous")
      case 'o' =>
        if (ends("ization")) r("ize")
        else if (ends("ation")) r("ate")
        else if (ends("ator")) r("ate")
      case 's' =>
        if (ends("alism")) r("al")
        else if (ends("iveness")) r("ive")
        else if (ends("fulness")) r("ful")
        else if (ends("ousness")) r("ous")
      case 't' =>
        if (ends("aliti")) r("al")
        else if (ends("iviti")) r("ive")
        else if (ends("biliti")) r("ble")
      case 'g' =>
        if (ends("logi")) r("log") // the paper's second noted departure
      case _ =>
    }

    /** step 3: -ic-, -full, -ness etc., m>0 */
    def step3(): Unit = (b(k): @annotation.switch) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ =>
    }

    /** step 4: strip the residual suffix when m>1 */
    def step4(): Unit = {
      if (k < 1) return
      val matched = (b(k - 1): @annotation.switch) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) ||
          ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    /** step 5: final -e and -ll tidy-up */
    def step5(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      j = k
      if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1
    }
  }
}

/** `porter_stem(str)` as a native codegen expression — stemming is the
  * classic normalization step between tokenization (q48) and term
  * statistics (q76 TF-IDF, q364 BM25): collapse inflected forms to one
  * index term. In-row, allocation-light, no shuffle: the 100 TB shape
  * is a narrow map-only projection, same as [[SimHash64]].
  */
case class PorterStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected string, got $other")
  }

  def stemOf(u: UTF8String): UTF8String =
    UTF8String.fromString(PorterStemmer.stem(u.toString))

  override def nullSafeEval(v: Any): Any = stemOf(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("porterStem", this, classOf[PorterStem].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.stemOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PorterStem =
    copy(child = newChild)
}
