package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

/** Dev probe: per-level peel rounds + surviving-edge counts for the
  * trussness decomposition (sizes the q515 oracle unroll constants).
  */
object ProfTruss {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("prof-truss",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    import spark.implicits._
    args.foreach { dir =>
      var e = PlanBridge.checkpointResetStats(KTruss.ktEdges(spark, dir))
      var n = e.count()
      println(s"[truss] $dir edges=$n")
      var k = 3
      while (n > 0L && k <= KTruss.KtMaxK) {
        var prev = n
        var rounds = 0
        var stable = false
        while (!stable) {
          rounds += 1
          val a = e.select($"u".as("au"), $"v".as("aw"))
          val b = e.select($"u".as("bu"), $"v".as("bw"))
          e = PlanBridge.checkpointResetStats(
            e.join(a, $"au" === $"u" && $"aw" =!= $"v")
              .join(b, $"bu" === $"v" && $"bw" === $"aw")
              .groupBy($"u", $"v").agg(count(lit(1)).as("sup"))
              .filter($"sup" >= k - 2).select($"u", $"v"))
          val m = e.count()
          stable = m == prev
          prev = m
        }
        n = prev
        println(s"[truss] $dir k=$k rounds=$rounds surviving=$n")
        k += 1
      }
    }
    spark.stop()
  }
}
