package graft.sources

import graft.SparkSpec

/** The HRW contract: removing shard k−1 moves exactly that shard's
  * docs and nothing else — the minimal-disruption property naive
  * `hash mod k` lacks.
  */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("q382: only the removed shard's docs move; every shard occupied") {
    val rows = Sharding.q382Rendezvous(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq ==
      (0L until Sharding.NumShards.toLong))
    rows.foreach { case (shard, n, moved) =>
      assert(n > 0L, s"shard $shard empty — hash badly skewed")
      if (shard == Sharding.NumShards - 1L)
        assert(moved == n, "removed shard must fully re-home")
      else assert(moved == 0L, s"shard $shard leaked $moved moves")
    }
  }
}
