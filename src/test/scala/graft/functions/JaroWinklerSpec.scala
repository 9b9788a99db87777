package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[JaroWinkler]] to DuckDB's jaro_winkler_similarity outputs,
  * probed live from DuckDB 2026-08 (exact doubles, not rounded) — the
  * textbook cases plus the edge semantics DuckDB chose: empty inputs
  * → 0.0 (not 1.0), window-0 adjacent transposition ('ab','ba') → 0.0,
  * prefix boost capped at 4, boost only above 0.7. The q197 oracle row
  * then re-checks thousands of fixture pairs bit-for-bit per round.
  */
class JaroWinklerSpec extends SparkSpec {

  private val pinned: Seq[(String, String, Double)] = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("abcdwxyz", "abcdwxyzzz", 0.96),
    ("ab", "a", 0.8500000000000001),
    ("aaaaaaaaaaaaaaaaaaaa", "aaaaaaaaaaaaaaaaaaab", 0.98),
    ("a", "a", 1.0),
    ("a", "b", 0.0),
    ("ab", "ba", 0.0),
    ("x", "", 0.0),
    ("", "", 0.0),
    ("0123456789", "0123456789", 1.0),
  )

  test("matches DuckDB bit-for-bit on pinned cases (interpreted + codegen)") {
    import spark.implicits._
    val df = pinned.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .withColumn("jw", TextFunctions.jaroWinkler($"a", $"b"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getDouble(2)))
    got.zip(pinned).foreach { case ((a, b, jw), (_, _, want)) =>
      assert(jw == want,
        s"jaro_winkler('$a','$b') = $jw, DuckDB says $want")
    }
    // interpreted path must agree with the codegen'd one
    pinned.foreach { case (a, b, want) =>
      val e = JaroWinkler(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(a)),
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(b)))
      assert(e.eval(null) == want, s"interpreted eval diverged on ('$a','$b')")
    }
  }

  test("registered as a SQL function via extensions") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw")
      .collect()(0).getDouble(0)
    assert(r == 0.9611111111111111)
  }

  test("null propagates") {
    import spark.implicits._
    val df = Seq(("a", Option.empty[String])).toDF("a", "b")
      .withColumn("jw", TextFunctions.jaroWinkler($"a", $"b"))
    assert(df.collect()(0).isNullAt(2))
  }
}
