package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

/** Dev probe: rounds-to-fixpoint of the iterated neighbor-H-index
  * coreness (sizes q520's oracle unroll constant) + the coreness
  * histogram.
  */
object ProfCore {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("prof-core",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    import spark.implicits._
    args.foreach { dir =>
      val e0 = PlanBridge.checkpointResetStats(KTruss.ktEdges(spark, dir))
      var cur = PlanBridge.checkpointResetStats(
        e0.groupBy($"u".as("v")).agg(count(lit(1)).as("c")))
      var prevSum = cur.agg(sum($"c")).as[Long].head()
      println(s"[core] $dir nodes=${cur.count()} sumDeg=$prevSum")
      var stable = false
      var r = 0
      while (!stable && r < 64) {
        r += 1
        cur = PlanBridge.checkpointResetStats(
          e0.join(cur.select($"v".as("w"), $"c".as("cw")), $"w" === $"v")
            .drop($"v")
            .groupBy($"u".as("v"))
            .agg(sort_array(collect_list($"cw"), asc = false).as("a"))
            .select($"v", Coreness.hIndex($"a").as("c")))
        val sumC = cur.agg(sum($"c")).as[Long].head()
        stable = sumC == prevSum
        prevSum = sumC
        println(s"[core] $dir round=$r sumC=$sumC")
      }
      val hist = cur.groupBy($"c").agg(count(lit(1)).as("n"))
        .orderBy($"c").as[(Long, Long)].collect()
      println(s"[core] $dir rounds=$r hist=${hist.mkString(",")}")
    }
    spark.stop()
  }
}
