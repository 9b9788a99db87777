package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** deflate_len: repetitive text compresses below high-entropy text,
  * determinism across calls, empty input, null propagation, and SQL
  * registration.
  */
class DeflateLenSpec extends SparkSpec {
  import spark.implicits._

  private def len(sqlExpr: String): Long = {
    GraftFunctions.register(spark)
    spark.range(1).select(expr(sqlExpr).cast("long")).first().getLong(0)
  }

  test("repetitive text compresses far below high-entropy text") {
    val rep = len("deflate_len(encode(repeat('abcd', 300), 'UTF-8'))")
    val rnd = len("deflate_len(encode(concat_ws('', sha2('a', 256), " +
      "sha2('b', 256), sha2('c', 256), sha2('d', 256)), 'UTF-8'))")
    assert(rep > 0 && rnd > 0)
    assert(rep * 4 < rnd, s"repetitive $rep not << entropic $rnd")
  }

  test("deterministic and monotone-ish: same input, same length") {
    val a = len("deflate_len(encode('the quick brown fox', 'UTF-8'))")
    val b = len("deflate_len(encode('the quick brown fox', 'UTF-8'))")
    assert(a == b && a > 0)
  }

  test("empty input yields the fixed empty-stream length; null propagates") {
    val e = len("deflate_len(encode('', 'UTF-8'))")
    assert(e >= 0 && e <= 8, s"empty deflate len $e out of range")
    val row = spark.range(1)
      .select(expr("deflate_len(CAST(NULL AS BINARY))")).first()
    assert(row.isNullAt(0))
  }

  test("column API and batch evaluation over many rows") {
    GraftFunctions.register(spark)
    val n = spark.range(500)
      .select(expr("deflate_len(encode(repeat(CAST(id AS STRING), 50), 'UTF-8'))")
        .as("l"))
      .filter($"l" > 0).count()
    assert(n == 500L)
  }
}
