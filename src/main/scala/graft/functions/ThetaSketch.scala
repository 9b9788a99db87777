package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Theta-sketch distinct-counting with native SET OPERATIONS — the
  * capability step past HLL: q122/q170's HLL sketches union losslessly
  * but can only INTERSECT via inclusion–exclusion, whose error grows
  * with |A∪B| (catastrophic for small overlaps of big sets). A theta
  * sketch is a uniform hash SAMPLE of the distinct keys below a
  * threshold θ, so intersection/difference are first-class: intersect
  * the retained sets, scale by θ — error tracks the RESULT's size, not
  * the inputs'. The KSLL/CMS/MG family here covers quantiles,
  * frequency, and heavy hitters; this adds composable cardinality
  * algebra (Dasgupta et al., "Theta Sketch Framework").
  *
  * `theta_sketch(col, lgK)` aggregates to a serialized compact sketch
  * (datasketches-java wire format — interoperable with every
  * datasketches binding); `theta_estimate(sk)` and
  * `theta_intersect_est(a, b)` read estimates back as scalars, so the
  * whole algebra stays inside a distributed plan: sketch frames are
  * one row per group, intersections are row-level expression calls,
  * no driver round-trip (the CmsEstimate probe-side discipline).
  *
  * Scale shape: the aggregate is ObjectHashAggregate with full
  * partial aggregation — each partition ships one ≤2^lgK-entry state;
  * union merges are associative+commutative, so merge order (and AQE
  * re-planning) cannot change the result beyond the sketch's own
  * documented equivalence class. Below 2^lgK distinct keys the sketch
  * is in EXACT mode and every estimate is the true count.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"theta_sketch: lgK in [4,26], got $lgK")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch: expected an integral or string column, got $other")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => buf.update(v.toString)
      case _ => buf.update(v.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch"

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `theta_estimate(sketch)` — distinct-count estimate of a serialized
  * theta sketch.
  */
case class ThetaEstimate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate: expected a binary sketch, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    Sketches.heapifySketch(Memory.wrap(a.asInstanceOf[Array[Byte]]))
      .getEstimate

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""org.apache.datasketches.theta.Sketches.heapifySketch(
         |org.apache.datasketches.memory.Memory.wrap($c)).getEstimate()"""
        .stripMargin.replace("\n", ""))

  override def prettyName: String = "theta_estimate"
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_intersect_est(a, b)` — estimated |A ∩ B| of two serialized
  * theta sketches, the set operation HLL fundamentally lacks.
  */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect_est: expected two binary sketches, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(
      Sketches.heapifySketch(Memory.wrap(a.asInstanceOf[Array[Byte]])),
      Sketches.heapifySketch(Memory.wrap(b.asInstanceOf[Array[Byte]])))
      .getEstimate
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"""org.apache.datasketches.theta.SetOperation.builder()
         |.buildIntersection().intersect(
         |org.apache.datasketches.theta.Sketches.heapifySketch(
         |org.apache.datasketches.memory.Memory.wrap($a)),
         |org.apache.datasketches.theta.Sketches.heapifySketch(
         |org.apache.datasketches.memory.Memory.wrap($b))).getEstimate()"""
        .stripMargin.replace("\n", ""))

  override def prettyName: String = "theta_intersect_est"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}
