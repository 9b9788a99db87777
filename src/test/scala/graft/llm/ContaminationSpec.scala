package graft.llm

import graft.SparkSpec

/** Contracts for q212: the eval side must broadcast (benchmark suites
  * are corpus-size-invariant, so the corpus never shuffles into a
  * sort-merge join against itself), and the distributed result must
  * match a brute-force single-machine recomputation exactly.
  */
class ContaminationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("eval shingle set joins as a broadcast, not a sort-merge join") {
    val df = Contamination.q212Contamination(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      s"eval side did not broadcast:\n$physical")
  }

  test("matches a brute-force recomputation on the fixture") {
    import spark.implicits._
    def grams(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val d = graft.core.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val evalSet: Map[String, Set[Long]] = d.filter(_._1 % 97 == 0)
      .flatMap { case (id, t) => grams(t).map(g => (g, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = d.filter(_._1 % 97 != 0).flatMap { case (id, t) =>
      val hit = grams(t).filter(evalSet.contains)
      if (hit.isEmpty) None
      else Some((id, hit.size.toLong, hit.flatMap(evalSet).size.toLong))
    }.sortBy { case (id, h, _) => (-h, id) }
    val real = Contamination.q212Contamination(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(brute.nonEmpty, "fixture produced no contaminated docs — test is vacuous")
    assert(real == brute.toSeq)
  }
}
