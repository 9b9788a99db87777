package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic per-group k-sample as a native Catalyst
  * [[TypedImperativeAggregate]] — the ONE-PASS, mergeable form of the
  * grouped exact-k sample (q116 spells it as a full window sort; this
  * aggregate ships k ids per group through the shuffle instead of the
  * group's row set, the difference that matters at 100 TB).
  *
  * `reservoir_sample(id, k)` keeps the k ids with the SMALLEST
  * (md5-priority, id) pair — "bottom-k by a uniform hash", the
  * classical reservoir sample derandomized the repo's way (q95/q200
  * md5 convention): the result is a pure FUNCTION of the group's id
  * set, independent of row order, partitioning, and merge-tree shape
  * (bottom-k is a semilattice: min-k(A ∪ B) = min-k(min-k(A) ∪
  * min-k(B))), which is exactly what makes it both mergeable AND
  * hash-comparable against a DuckDB ROW_NUMBER oracle — where a
  * true-RNG reservoir could only ever be gate-checked.
  *
  * Priority = first 60 bits of md5(decimal id), compared numerically —
  * identical to comparing the 15-char hex prefix lexicographically,
  * which is what the oracle SQL does.
  *
  * State: a size-k max-heap of (priority, id); update is O(log k)
  * against the heap root, merge folds the smaller summary in. Serde is
  * length-prefixed pairs.
  */
case class ReservoirSample(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
  with UnaryLike[Expression] {

  require(k >= 1, s"reservoir_sample: k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"reservoir_sample: expected an integral id, got $other")
  }

  // max-heap on (priority, id): the root is the first element to evict
  private implicit val ord: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)]

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val v = child.eval(input)
    if (v != null) offer(buf, ReservoirSample.priority(
      v.asInstanceOf[Number].longValue()), v.asInstanceOf[Number].longValue())
    buf
  }

  private def offer(buf: mutable.PriorityQueue[(Long, Long)],
      p: Long, id: Long): Unit = {
    if (buf.size < k) buf.enqueue((p, id))
    else if (ord.lt((p, id), buf.head)) { buf.dequeue(); buf.enqueue((p, id)) }
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)])
      : mutable.PriorityQueue[(Long, Long)] = {
    other.foreach { case (p, id) => offer(buf, p, id) }
    buf
  }

  /** Sample ids in ascending (priority, id) order — deterministic. */
  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted.map(_._2))

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)])
      : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (p, id) => bb.putLong(p); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "reservoir_sample"

  override def withNewMutableAggBufferOffset(o: Int): ReservoirSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReservoirSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression)
      : ReservoirSample = copy(child = newChild)
}

object ReservoirSample {
  /** First 60 bits of md5(decimal id) — numerically equal in order to
    * the 15-char lowercase-hex prefix compared as a string, the
    * engine-portable spelling the oracle uses.
    */
  def priority(id: Long): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes(StandardCharsets.US_ASCII))
    var p = 0L
    var i = 0
    while (i < 7) { p = (p << 8) | (h(i) & 0xffL); i += 1 }
    (p << 4) | ((h(7) >> 4) & 0xfL)
  }
}
