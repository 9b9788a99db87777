package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable streaming-quantile sketch state: the uniform-capacity
  * variant of KLL (Karnin–Lang–Liberty 2016; the merge rule is the
  * Agarwal-et-al "Mergeable Summaries" equi-sized scheme, which KLL
  * refines with shrinking capacities). Level i holds values of weight
  * 2^i; a level reaching capacity k sorts itself and promotes every
  * other element (alternating offset from a deterministic xorshift
  * stream) to level i+1 — total weight is preserved exactly because an
  * odd leftover stays at its level. Retained size is O(k·log(n/k))
  * regardless of n, which is the whole point: at 100 TB the shuffle
  * ships one ~k·log-sized state per group, never the value
  * distribution, and merge order does not change the error bound.
  */
final class KllState(val k: Int) extends Serializable {
  /** xorshift64 state driving compaction offsets — seeded by a constant
    * so a given (data, partitioning) replays identically.
    */
  var seed: Long = 0x9E3779B97F4A7C15L
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
  /** Exact count of updates folded in (Σ retained weights). */
  var n: Long = 0L

  private def nextBit(): Int = {
    var x = seed
    x ^= x << 13; x ^= x >>> 7; x ^= x << 17
    seed = x
    (x & 1L).toInt
  }

  private def levelAt(i: Int): mutable.ArrayBuffer[Double] = {
    while (levels.length <= i) levels += mutable.ArrayBuffer.empty[Double]
    levels(i)
  }

  /** Sort level l, promote ⌊m/2⌋ alternating elements to level l+1,
    * keep an odd leftover (the minimum) in place — weight-exact.
    */
  private def compact(l: Int): Unit = {
    val buf = levels(l)
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    val odd = sorted.length % 2 == 1
    val start = if (odd) 1 else 0 // index 0 (min) stays behind when odd
    val off = nextBit()
    val up = levelAt(l + 1)
    var i = start + off
    while (i < sorted.length) { up += sorted(i); i += 2 }
    buf.clear()
    if (odd) buf += sorted(0)
    if (up.length >= k) compact(l + 1)
  }

  def update(v: Double): Unit = {
    n += 1L
    val l0 = levels(0)
    l0 += v
    if (l0.length >= k) compact(0)
  }

  def merge(other: KllState): Unit = {
    n += other.n
    seed ^= java.lang.Long.rotateLeft(other.seed, 17)
    var i = 0
    while (i < other.levels.length) {
      if (other.levels(i).nonEmpty) levelAt(i) ++= other.levels(i)
      i += 1
    }
    i = 0
    while (i < levels.length) { // cascade handles spill into new levels
      if (levels(i).length >= k) compact(i)
      i += 1
    }
  }

  /** Estimated quantiles at fractions j/nq for j = 0..nq. */
  def quantiles(nq: Int): Array[Double] = {
    if (n == 0L) return Array.empty[Double]
    var m = 0
    var i = 0
    while (i < levels.length) { m += levels(i).length; i += 1 }
    val vals = new Array[Double](m)
    val wts = new Array[Long](m)
    var p = 0
    i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach { v => vals(p) = v; wts(p) = w; p += 1 }
      i += 1
    }
    // sort (value, weight) pairs by value
    val idx = Array.range(0, m).sortBy(vals(_))
    val totalW = wts.sum
    Array.tabulate(nq + 1) { j =>
      val target = math.max(1L, math.ceil(totalW.toDouble * j / nq).toLong)
      var cum = 0L
      var r = 0
      var out = vals(idx(m - 1))
      var found = false
      while (r < m && !found) {
        cum += wts(idx(r))
        if (cum >= target) { out = vals(idx(r)); found = true }
        r += 1
      }
      out
    }
  }

  def serialized: Array[Byte] = {
    var m = 0
    levels.foreach(m += _.length)
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 4 + levels.length * 4 + m * 8)
    bb.putInt(k).putLong(seed).putLong(n).putInt(levels.length)
    levels.foreach { lv =>
      bb.putInt(lv.length)
      lv.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object KllState {
  def deserialize(bytes: Array[Byte]): KllState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new KllState(bb.getInt)
    st.seed = bb.getLong
    st.n = bb.getLong
    val nl = bb.getInt
    st.levels.clear()
    var i = 0
    while (i < nl) {
      val len = bb.getInt
      val lv = new mutable.ArrayBuffer[Double](len)
      var j = 0
      while (j < len) { lv += bb.getDouble; j += 1 }
      st.levels += lv
      i += 1
    }
    if (st.levels.isEmpty) st.levels += mutable.ArrayBuffer.empty[Double]
    st
  }
}

/** `kll_quantiles(col, k, nq)` — grouped streaming quantiles as a native
  * Catalyst [[TypedImperativeAggregate]]: returns the nq+1 estimated
  * quantile values at fractions 0, 1/nq, …, 1. Spark's own
  * `approx_percentile` ships GK inside; this adds the KLL-family
  * sketch with the mergeable-summaries contract the q220 gate checks
  * against exact ranks — and, unlike GK, a state whose size is a pure
  * function of (k, log n), the property that bounds shuffle bytes per
  * group at any scale. Null inputs are skipped; an all-null group
  * evaluates to NULL.
  */
case class KllQuantiles(
    child: Expression,
    k: Int,
    nq: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState]
  with UnaryLike[Expression] {

  require(k >= 8, s"kll_quantiles: k must be >= 8, got $k")
  require(nq >= 1, s"kll_quantiles: nq must be >= 1, got $nq")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"kll_quantiles: expected a numeric column, got $other")
  }

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Number].doubleValue())
    buf
  }

  override def merge(buf: KllState, other: KllState): KllState = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllState): Any =
    if (buf.n == 0L) null
    else new GenericArrayData(buf.quantiles(nq))

  override def serialize(buf: KllState): Array[Byte] = buf.serialized

  override def deserialize(bytes: Array[Byte]): KllState =
    KllState.deserialize(bytes)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"

  override def withNewMutableAggBufferOffset(o: Int): KllQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}
