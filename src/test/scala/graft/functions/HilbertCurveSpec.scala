package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Curve-math contracts for `hilbert_xy2d` (q222's index column). */
class HilbertCurveSpec extends AnyFunSuite with SparkSpec {

  test("order-6 curve is a bijection onto 0..4095") {
    val n = 64
    val ds = for (x <- 0 until n; y <- 0 until n)
      yield HilbertXY2D.xy2d(6, x.toLong, y.toLong)
    assert(ds.toSet === (0L until (n.toLong * n)).toSet)
  }

  test("consecutive curve positions are always grid neighbors (Morton is not)") {
    val n = 64
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertXY2D.xy2d(6, x.toLong, y.toLong) -> (x, y)).toMap
    val jumps = (1 until n * n).map { d =>
      val (x1, y1) = byD(d.toLong - 1)
      val (x2, y2) = byD(d.toLong)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }
    assert(jumps.forall(_ === 1), s"max Hilbert jump ${jumps.max}")
    // contrast: Morton interleave on the same grid takes long jumps
    def morton(x: Int, y: Int): Long = {
      var m = 0L
      (0 until 6).foreach { b =>
        m |= ((x >> b) & 1).toLong << (2 * b)
        m |= ((y >> b) & 1).toLong << (2 * b + 1)
      }
      m
    }
    val byM = (for (x <- 0 until n; y <- 0 until n)
      yield morton(x, y) -> (x, y)).toMap
    val mortonMax = (1 until n * n).map { d =>
      val (x1, y1) = byM(d.toLong - 1)
      val (x2, y2) = byM(d.toLong)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(mortonMax > 1, "expected Morton to take non-neighbor jumps")
  }

  test("order-16 production curve stays injective on a coordinate sample") {
    val pts = for (x <- 0 until 256; y <- 0 until 256)
      yield (x.toLong * 257, y.toLong * 253) // spread across the 2^16 grid
    val ds = pts.map { case (x, y) => HilbertXY2D.xy2d(16, x, y) }
    assert(ds.toSet.size === pts.size)
  }

  test("SQL function matches the direct computation through codegen") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = spark.range(2000)
      .select($"id", (($"id" * 7919L) % 65536L).as("x"),
        (($"id" * 104729L) % 65536L).as("y"))
      .selectExpr("x", "y", "hilbert_xy2d(x, y) AS d")
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (x, y, d) =>
      assert(d === HilbertXY2D.xy2d(16, x, y), s"mismatch at ($x, $y)")
    }
  }
}
