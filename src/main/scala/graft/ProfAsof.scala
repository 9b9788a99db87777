package graft

import org.apache.spark.sql.functions._

/** Throwaway profiler: native as-of merge join vs the union+window
  * composition on a synthetic join-dominated workload (the q31 fixture
  * is dedup-dominated, so it cannot separate the two).
  */
object ProfAsof {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("prof-asof")
    import spark.implicits._
    val nL = 2000000L
    val nR = 1000000L
    val keys = 100000L
    val left = spark.range(nL).select(
      $"id".as("lid"), ($"id" % keys).as("k"),
      (($"id" * 7919L) % 1000000L).as("t"),
      ($"id" * 3L).as("lpay1"), ($"id" + 17L).as("lpay2"))
      .localCheckpoint()
    val right = spark.range(nR).select(
      $"id".as("rid"), ($"id" % keys).as("k"),
      (($"id" * 104729L) % 1000000L).as("rt"),
      ($"id" * 5L).as("rpay1"), concat(lit("p"), $"id").as("rpay2"),
      ($"id" % 97L).as("rpay3"),
      concat(lit("long-payload-a-"), $"id").as("rpay4"),
      concat(lit("long-payload-b-"), $"id").as("rpay5"),
      concat(lit("long-payload-c-"), $"id").as("rpay6"),
      concat(lit("long-payload-d-"), $"id").as("rpay7"),
      concat(lit("long-payload-e-"), $"id").as("rpay8"))
      .dropDuplicates("k", "rt")
      .localCheckpoint()
    def time(tag: String)(f: => Long): Unit = {
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$tag run$i: $dt%.3f s ($n rows)")
      }
    }
    time("composition") {
      graft.operators.AsOfJoin.backward(left, right, Seq("k"), "t", "rt").count()
    }
    time("native") {
      graft.plans.AsOfMergeJoin.backward(left, right, Seq("k"), "t", "rt").count()
    }
    spark.stop()
  }
}
