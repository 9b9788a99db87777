package graft

import org.apache.spark.sql.functions._

/** Throwaway profiler: Spark's default two-level distinct-count plan
  * vs the [[graft.plans.DistinctToBitmap]] bitmap rewrite, on a
  * rows-per-distinct-heavy synthetic (the regime the rewrite targets:
  * the dedup level's input is the full row stream).
  */
object ProfDistinct {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("prof-distinct")
    import spark.implicits._
    val n = 20000000L
    val keys = 500000L
    val groups = 32L
    val df = spark.range(n).select(
      ($"id" % groups).as("g"),
      (($"id" * 7919L) % keys).cast("int").as("uid"))
      .localCheckpoint()
    def time(tag: String)(f: => Long): Unit =
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$tag run$i: $dt%.3f s ($r)")
      }
    def query(): Long = df.groupBy($"g")
      .agg(countDistinct($"uid").as("d")).agg(sum($"d")).first().getLong(0)
    time("default")(query())
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.DistinctToBitmap
    time("bitmap")(query())
    spark.stop()
  }
}
