package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixed-point goldens for the integer PageRank operator.
  *
  * Star graph c–{l1,l2,l3}: deg(c)=3, deg(l)=1, all ranks start at
  * 1,000,000. Tracing r'(u) = 150000 + (850000·Σ (r div deg)) div 1e6
  * by hand for three iterations:
  *   iter1: c → 150000+(850000·3000000) div 1e6 = 2700000;
  *          l → 150000+(850000·333333) div 1e6 = 433333
  *   iter2: c → 150000+(850000·(3·433333)) div 1e6 = 1254999
  *          l → 150000+(850000·(2700000 div 3)) div 1e6 = 915000
  *   iter3: c → 150000+(850000·(3·915000)) div 1e6 = 2483250
  *          l → 150000+(850000·(1254999 div 3)) div 1e6 = 505583
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("star graph matches the hand-traced fixed-point ranks") {
    val half = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val got = PageRank.ranks(half, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 2483250L)
    assert(got(1L) == 505583L && got(2L) == 505583L && got(3L) == 505583L)
  }

  test("symmetric ring gives equal ranks that stay at the fixed point") {
    // 4-cycle: every node has degree 2 and identical neighborhoods, so
    // ranks remain equal; with equal ranks r, update is
    // 150000 + (850000 * (2*(r div 2))) div 1e6 — starting from 1e6 the
    // value converges toward 1e6 from below and all nodes agree.
    val half = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("u", "v")
    val got = PageRank.ranks(half, iterations = 3)
      .collect().map(r => r.getLong(1)).toSet
    assert(got.size == 1, s"ring ranks diverged: $got")
  }

  test("higher-degree hub outranks leaves on the bipartite co-purchase shape") {
    // two "customers" both buying from one "supplier" hub plus one
    // exclusive supplier each: hub has degree 2 + leaves degree 1/2
    val half = Seq((1L, 100L), (2L, 100L), (1L, 101L), (2L, 102L))
      .toDF("u", "v")
    val got = PageRank.ranks(half, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(100L) > got(101L) && got(100L) > got(102L))
  }
}
