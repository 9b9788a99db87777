package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries top-k frequency summary as a native Catalyst
  * [[TypedImperativeAggregate]] — the grouped heavy-hitters aggregate
  * Spark lacks (`df.stat.freqItems`/`countMinSketch` are whole-frame
  * driver helpers, not SQL aggregates; q96 had to probe its CMS on the
  * driver). `mg_topk(col, k)` runs per GROUP with full partial
  * aggregation: per-partition summaries build map-side and merge by
  * the Agarwal-et-al mergeable-summaries rule, so the shuffle carries
  * k counters per group instead of the group's value distribution —
  * the entire point at 100 TB.
  *
  * Guarantees (the q215 gate checks both on real data):
  *   - for every emitted key: 0 ≤ true_count − est ≤ N/(k+1)
  *     (MG only undercounts, by at most N/(k+1) after any merge tree)
  *   - every key with true_count > N/(k+1) is present in the summary
  *     (absence would imply error > N/(k+1))
  *
  * The summary CONTENT (which sub-threshold keys survive, residual
  * counter values) legitimately varies with partitioning/merge order;
  * only the bounds are contractual, so the oracle row is the (n, ok)
  * gate convention, never a hash of the raw summary.
  *
  * State is a plain Long→Long map serialized as length-prefixed pairs;
  * update is O(1) amortized (the decrement-all path runs at most once
  * per k updates), merge is O(k log k) for the (k+1)-th-largest cut.
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"mg_topk: k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"mg_topk: expected an integral key, got $other")
  }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long],
      input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Number].longValue() // int/long keys both accepted
      if (buf.contains(key)) buf(key) += 1L
      else if (buf.size < k) buf(key) = 1L
      else {
        // classic MG: a new key meeting a full summary decrements every
        // counter; zeros vacate slots
        val dead = mutable.ArrayBuffer.empty[Long]
        buf.foreachEntry { (kk, vv) =>
          if (vv == 1L) dead += kk else buf(kk) = vv - 1L
        }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (kk, vv) =>
      buf(kk) = buf.getOrElse(kk, 0L) + vv
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from all, drop <= 0 —
      // the merge rule that preserves the N/(k+1) error bound
      val cut = buf.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[Long]
      buf.foreachEntry { (kk, vv) =>
        if (vv <= cut) dead += kk else buf(kk) = vv - cut
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val entries = buf.toArray.sortBy { case (kk, vv) => (-vv, kk) }
    new GenericArrayData(entries.map { case (kk, vv) =>
      InternalRow(kk, vv)
    })
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry { (kk, vv) => bb.putLong(kk); bb.putLong(vv) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf(bb.getLong) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "mg_topk"

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
}
