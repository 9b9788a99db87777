package graft.relational

import graft.SparkSpec

/** The integer absorption solve against closed forms: a 50/50 single
  * channel reads exactly 500000 micro, a two-hop chain multiplies
  * branch probabilities, removal of a mandatory channel kills all
  * conversion, and the fixture gate is green at sf0.001.
  */
class MarkovAttributionSpec extends SparkSpec {

  test("single channel 50/50 chain: p = 1/2 exactly") {
    val t = Seq(("START", "a", 10L), ("a", "CONV", 5L), ("a", "NULL", 5L))
    assert(JourneyQueries.absorptionMicro(t, None) == 500000L)
    assert(JourneyQueries.absorptionMicro(t, Some("a")) == 0L)
  }

  test("two-hop chain multiplies: START->a->b->CONV with 1/2 each = 1/4") {
    val t = Seq(("START", "a", 4L),
      ("a", "b", 2L), ("a", "NULL", 2L),
      ("b", "CONV", 1L), ("b", "NULL", 1L))
    assert(JourneyQueries.absorptionMicro(t, None) == 250000L)
    // removing either hop kills conversion entirely
    assert(JourneyQueries.absorptionMicro(t, Some("a")) == 0L)
    assert(JourneyQueries.absorptionMicro(t, Some("b")) == 0L)
  }

  test("self-loop geometric series converges: a->a 1/2, a->CONV 1/2 = 1") {
    // p_a = (1/2)p_a + 1/2 -> p_a = 1; integer fixpoint approaches
    // from below, 60 iterations reach 10^6 - eps at micro resolution
    val t = Seq(("START", "a", 1L), ("a", "a", 1L), ("a", "CONV", 1L))
    val p = JourneyQueries.absorptionMicro(t, None)
    assert(p >= 999999L && p <= 1000000L, s"geometric fixpoint read $p")
  }

  test("q363 gate green at sf0.001; matrix rows carry a single ok") {
    val df = JourneyQueries.q363MarkovAttribution(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)), "ok fold is false")
    // START out-edges must exist and every from-state is non-absorbing
    val froms = rows.map(_.getString(0)).toSet
    assert(froms.contains("START") && !froms.contains("CONV"))
  }
}
