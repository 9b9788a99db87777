package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused float32 dot product as a native Catalyst expression with
  * whole-stage codegen (SURVEY.md §2.b "custom Expression" path): the
  * hot loop of brute-force cosine similarity over `Array[Float]`
  * embedding columns.
  *
  * Why not `zip_with` + `aggregate`: those build an intermediate array
  * per row and evaluate a lambda per element through HigherOrderFunction
  * plumbing; this expression compiles to a tight primitive loop inside
  * the generated code, keeping the 4M-pair × 64-dim similarity join in
  * one WholeStageCodegen span. Accumulation is sequential left-to-right
  * in double — deterministic, and bit-identical to the oracle's
  * index-ordered SUM.
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(FloatType, containsNull = false) ||
        left.dataType == ArrayType(FloatType, containsNull = true)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"expected array<float>, got ${left.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF32 =
    copy(left = newLeft, right = newRight)
}

/** Quantized dot product: each float is mapped to floor(x·2^20) — an
  * EXACT IEEE operation (power-of-two scaling never rounds) — and the
  * products accumulate in int64. The result is bit-identical in any
  * engine regardless of summation order, which plain double accumulation
  * is not (the oracle's SUM associates differently at the ulp level).
  * Quantization error ~1e-5 on unit-scale cosine — the documented
  * contract for oracle-checked similarity scores. Max safe dim·|x|²:
  * 64·(32·2^20)² ≪ 2^63.
  */
case class DotProductQ20(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(x.getFloat(i).toDouble * 1048576.0).toLong *
        math.floor(y.getFloat(i).toDouble * 1048576.0).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) java.lang.Math.floor((double) $a.getFloat($i) * 1048576.0)
         |        * (long) java.lang.Math.floor((double) $b.getFloat($i) * 1048576.0);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductQ20 =
    copy(left = newLeft, right = newRight)
}

/** Sign-random-projection LSH bucket id as ONE compact expression: the
  * vector is projected onto `numPlanes` seeded ±1 hyperplanes and the
  * sign bits form the bucket (bucket space 2^numPlanes).
  *
  * Why an expression and not a composed column tree: the naive spelling
  * (numPlanes × dim `element_at` terms) is a ~P·D-node expression tree —
  * at 12×64 that is the 1.7 MiB broadcast-task-binary / codegen-blowup
  * case. This compiles to a single method call over the unsafe array
  * data with a tight primitive loop.
  *
  * Plane components are ±1 derived from a splitmix64-style hash of
  * (seed, plane·dim+i): deterministic on every executor with zero state
  * shipped, identical across runs — the property the recall and
  * determinism specs pin down.
  */
case class SrpBucket(child: Expression, numPlanes: Int, seed: Int)
    extends UnaryExpression {

  require(numPlanes > 0 && numPlanes <= 62, "numPlanes must be in [1,62]")

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == ArrayType(FloatType, containsNull = false) ||
        child.dataType == ArrayType(FloatType, containsNull = true)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"expected array<float>, got ${child.dataType}")
    }
  }

  // per-JVM plane cache, rebuilt lazily after deserialization (tiny:
  // numPlanes·dim doubles). Published as ONE immutable (dim, planes)
  // pair so a concurrent interpreted eval (shared plan, driver-side
  // eval) can never observe the dim of one build with the planes of
  // another — final-field semantics make the pair safe to read without
  // synchronization even under a racy publish (worst case: two threads
  // build identical arrays).
  @transient private var planeCache: (Int, Array[Double]) = _

  private def mix(x: Long): Long = {
    var z = x + seed.toLong * 0x9E3779B97F4A7C15L + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def planesFor(dim: Int): Array[Double] = {
    val cached = planeCache
    if (cached != null && cached._1 == dim) return cached._2
    val arr = new Array[Double](numPlanes * dim)
    var p = 0
    while (p < numPlanes) {
      var i = 0
      while (i < dim) {
        arr(p * dim + i) = if (mix(p.toLong * dim + i) < 0) -1.0 else 1.0
        i += 1
      }
      p += 1
    }
    planeCache = (dim, arr)
    arr
  }

  /** Hot loop shared by eval and codegen (one virtual call per row). */
  def bucketOf(a: ArrayData): Long = {
    val dim = a.numElements()
    val pl = planesFor(dim)
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      val off = p * dim
      var i = 0
      while (i < dim) {
        acc += a.getFloat(i).toDouble * pl(off + i)
        i += 1
      }
      if (acc >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override def nullSafeEval(v: Any): Any = bucketOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpBucket", this, classOf[SrpBucket].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.bucketOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

object VectorFunctions {
  /** Dot product of two float-array columns, as double. */
  def dot_f32(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductF32(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm of a float-array column. */
  def norm_f32(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(dot_f32(a, a))
  }

  /** Quantized (2^20) dot product as int64 — engine-order-independent. */
  def dot_q20(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductQ20(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Quantized L2 norm (double of the exact int64 self-dot). */
  def norm_q20(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(dot_q20(a, a).cast(DoubleType))
  }

  /** Cosine similarity given precomputed norms (preferred: compute each
    * side's norm once, not per pair).
    */
  def cosine(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)

  /** Sign-random-projection LSH bucket of a float-array column. */
  def srp_bucket(v: Column, numPlanes: Int, seed: Int): Column =
    ColumnBridge.column(SrpBucket(
      ColumnBridge.expression(v), numPlanes, seed))
}
