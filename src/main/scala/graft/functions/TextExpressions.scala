package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
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

/** Per-row VALUE-COUNT map of a string array: `["a","b","a"]` →
  * `{"a":2,"b":1}` — the in-row form of `explode + groupBy(count)`.
  * The point is the plan shape it unlocks: per-document term counting
  * (q146's trigram profile, TF for BM25-style scoring) becomes a
  * NARROW PROJECTION — one pass over each row's array, map-only —
  * where the explode-then-aggregate spelling shuffles one row per
  * token OCCURRENCE through a corpus-wide hash aggregate. Downstream
  * consumers explode THIS map, which is already occurrence-deduped
  * (one row per distinct token per doc), so the exchange that remains
  * carries the smaller distinct frame (the [[SimHash64]] argument, one
  * level up the aggregation tree).
  *
  * Keys keep FIRST-OCCURRENCE order (LinkedHashMap), so the map's
  * serialized form is deterministic for a given array — required for
  * checkpoint/cache stability, irrelevant to consumers that aggregate.
  */
case class CountValues(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.MapType(
    StringType, LongType, valueContainsNull = false)

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

  /** Hot loop shared by eval and codegen. */
  def countOf(a: ArrayData): org.apache.spark.sql.catalyst.util.MapData = {
    val m = new java.util.LinkedHashMap[
      org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val k = a.getUTF8String(i)
        val prev = m.get(k)
        m.put(k, if (prev == null) 1L else prev + 1L)
      }
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
  }

  override def nullSafeEval(v: Any): Any = countOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countValues", this, classOf[CountValues].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountValues =
    copy(child = newChild)
}

/** Jaro-Winkler similarity as a codegen'd binary expression — a scalar
  * string-similarity function Spark has no builtin for (`levenshtein`
  * is the only edit metric in functions._), while DuckDB ships it
  * natively — which makes this the rare CUSTOM expression whose output
  * doubles can be hash-compared bit-for-bit against an independent
  * engine (q197).
  *
  * Semantics mirror DuckDB's vendored RapidFuzz implementation exactly,
  * including floating-point operation ORDER (so results are
  * bit-identical, not merely close): match window
  * `max(len)/2 - 1`; transpositions halved by integer division;
  * `sim = ((m/l1 + m/l2) + (m-t)/m) / 3` accumulated left-to-right;
  * Winkler boost `sim += prefix * 0.1 * (1 - sim)` only when
  * `sim > 0.7`, common prefix capped at 4; zero matches or an empty
  * side → 0.0 (DuckDB returns 0.0 for `('','')`, not the textbook 1.0
  * — pinned in JaroWinklerSpec). Operates on UTF-8 BYTES, matching
  * DuckDB's byte-wise loop — identical for ASCII; multi-byte
  * codepoints compare per byte in both engines.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"expected (string, string), got " +
          s"(${left.dataType}, ${right.dataType})")
  }

  /** Hot loop shared by eval and codegen. O(len1·len2) worst case like
    * every Jaro implementation; the per-row flag arrays are the only
    * allocation. */
  def jaroWinklerOf(l: org.apache.spark.unsafe.types.UTF8String,
                    r: org.apache.spark.unsafe.types.UTF8String): Double = {
    val a = l.getBytes
    val b = r.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aFlags = new Array[Boolean](la)
    val bFlags = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bFlags(j) && a(i) == b(j)) {
          aFlags(i) = true; bFlags(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk both flagged subsequences in order
    var transpositions = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aFlags(i)) {
        while (!bFlags(j)) j += 1
        if (a(i) != b(j)) transpositions += 1
        j += 1
      }
      i += 1
    }
    val t = transpositions / 2
    val m = matches.toDouble
    // accumulate in RapidFuzz's order for bit-identity with DuckDB
    var sim = 0.0
    sim += m / la.toDouble
    sim += m / lb.toDouble
    sim += (m - t.toDouble) / m
    sim = sim / 3.0
    if (sim > 0.7) {
      var prefix = 0
      val maxPrefix = math.min(math.min(la, lb), 4)
      while (prefix < maxPrefix && a(prefix) == b(prefix)) prefix += 1
      sim += prefix.toDouble * 0.1 * (1.0 - sim)
    }
    sim
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    jaroWinklerOf(l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaroWinkler", this, classOf[JaroWinkler].getName)
    nullSafeCodeGen(ctx, ev,
      (l, r) => s"${ev.value} = $ref.jaroWinklerOf($l, $r);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC normalization as a codegen'd unary expression — the
  * canonicalization pass exact dedup and fingerprinting silently assume
  * (q124 normalizes case/whitespace; THIS normalizes codepoints): the
  * same visible text can arrive precomposed (U+00E9 'é') or decomposed
  * (U+0065 U+0301 'e'+combining acute) from different crawlers/OCR
  * pipelines, and every byte-keyed operator downstream — sha2 dedup
  * (q40), shingle hashing (q41), content-addressed ingest (q131) —
  * treats them as distinct documents. Spark has no normalization
  * builtin; DuckDB ships `nfc_normalize`, which makes the output
  * directly hash-comparable cross-engine (q197's rationale).
  *
  * Semantics: `java.text.Normalizer.normalize(s, NFC)` — the Unicode
  * canonical-composition algorithm, stable across JVM versions for
  * assigned codepoints (both engines implement UAX #15 over the same
  * Unicode data). The `isNormalized` fast path skips allocation for
  * already-NFC text, which is ~all of a real corpus — the expression is
  * a no-op-speed guard, not a per-row rewrite.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected string, got $other")
    }
  }

  def nfcOf(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(v: Any): Any =
    nfcOf(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNorm", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.nfcOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextFunctions {
  /** SimHash64 of a tokenized (array<string>) column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** Unicode NFC normalization of a string column. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** Jaro-Winkler similarity of two string columns (DuckDB-bit-exact). */
  def jaroWinkler(l: Column, r: Column): Column =
    ColumnBridge.column(
      JaroWinkler(ColumnBridge.expression(l), ColumnBridge.expression(r)))

  /** Value-count map of a string-array column (in-row explode+count). */
  def countValues(c: Column): Column =
    ColumnBridge.column(CountValues(ColumnBridge.expression(c)))

  /** Porter stem of a string column (native codegen expression). */
  def porterStem(c: Column): Column =
    ColumnBridge.column(PorterStem(ColumnBridge.expression(c)))
}
