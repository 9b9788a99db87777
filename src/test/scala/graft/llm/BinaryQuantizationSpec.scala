package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the 1-bit Hamming ANN path (q232): the sign pack is
  * bit-exact on known vectors, Hamming candidates find an identical
  * twin at distance 0, and the recall gate passes on the real fixture.
  */
class BinaryQuantizationSpec extends SparkSpec {
  import spark.implicits._

  private def vec(bits: Set[Int]): Array[Float] =
    Array.tabulate(64)(i => if (bits(i)) 1.0f else -1.0f)

  test("sign pack is bit-exact: dims >0 set exactly their bit") {
    val df = Seq(
      (1L, vec(Set(0))),          // expect sig = 1
      (2L, vec(Set(63))),         // expect sig = Long.MinValue (bit 63)
      (3L, vec(Set(0, 1, 2, 3))), // expect 15
      (4L, vec(Set.empty[Int]))   // expect 0
    ).toDF("vec_id", "embedding")
    val sigs = df.select($"vec_id",
      expr("""aggregate(transform(embedding, (x, i) ->
             | IF(x > CAST(0.0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
             | CAST(0 AS BIGINT), (acc, b) -> acc | b)""".stripMargin)
        .as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == 1L)
    assert(sigs(2L) == Long.MinValue)
    assert(sigs(3L) == 15L)
    assert(sigs(4L) == 0L)
  }

  test("identical twin is found with hamming 0 and cosine 1") {
    // a corpus of well-separated vectors + one exact duplicate pair
    val base = (0 until 32).map { k =>
      (k.toLong, vec((0 until 64).filter(i => (i * 31 + k * 7) % 5 == 0).toSet + k % 64))
    }
    val dup = Seq((100L, base.head._2))
    val df = (base ++ dup).toDF("vec_id", "embedding")
    val top = BinaryQuantization.binaryAnn(df)
      .filter($"qid" === 100L).collect()
    assert(top.length == 1)
    assert(top.head.getAs[Long]("nid") == 0L,
      s"identical twin must be the top answer, got ${top.head}")
    assert(math.abs(top.head.getAs[Double]("cos_sim") - 1.0) < 1e-9)
  }

  test("q232 recall gate passes on the sf0.001 fixture") {
    val row = BinaryQuantization
      .q232BinaryHammingRecall(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("n_queries") > 0)
    assert(row.getAs[Boolean]("ok"),
      "binary-Hamming twin recall below floor on fixture")
  }
}
