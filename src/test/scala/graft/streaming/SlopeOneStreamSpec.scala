package graft.streaming

import graft.SparkSpec

/** The IVM contract for the streaming Slope One census: per-batch
  * deltas over new keys, updated keys, and both-new pairs keep the
  * maintained census identical to a from-scratch recompute.
  */
class SlopeOneStreamSpec extends SparkSpec {

  test("delta maintenance equals recompute across new keys, rating " +
      "updates, and both-new pairs; hand dev values hold") {
    import spark.implicits._
    val state = new SlopeOneStream.DevState(spark)
    // batch 1: c1 rates items 1 and 2 (both-new pair inside one batch)
    state.applyBatch(Seq((1L, 1L, 2L), (1L, 2L, 4L)).toDF("c", "p", "r"))
    // batch 2: c2 rates both; c1 UPDATES item 1 (+3, additive)
    state.applyBatch(Seq((2L, 1L, 3L), (2L, 2L, 5L), (1L, 1L, 3L))
      .toDF("c", "p", "r"))
    val (nRatings, nPairs, ok) = SlopeOneStream.verifyAgainstRecompute(state)
    assert(ok, "maintained census diverged from recompute")
    assert(nRatings == 4L && nPairs == 2L)
    // dev(2, 1): c1 -> 4 - 5 = -1, c2 -> 5 - 3 = 2 -> dsum = 1, n = 2
    val devs = state.devs.collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(devs((2L, 1L)) == ((2L, 1L)), s"devs = $devs")
    assert(devs((1L, 2L)) == ((2L, -1L)))
    // batch 3: an update touching only c1 must leave c2's
    // contribution intact
    state.applyBatch(Seq((1L, 3L, 7L)).toDF("c", "p", "r"))
    val (_, _, ok3) = SlopeOneStream.verifyAgainstRecompute(state)
    assert(ok3)
  }
}
