package graft
import org.apache.spark.sql.SparkSession
/** One-off probe: NN-Descent convergence trajectory (q450 design) —
  * rounds to hit the δ update-count termination and the final recall,
  * per SF (BASELINE.md appendix material).
  */
object ProfNnd {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val maxRounds = if (args.length > 1) args(1).toInt
      else graft.operators.Dbscan.NndMaxRounds
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (n, nExact, rounds, recall, converged) =
      graft.operators.Dbscan.nndConverge(spark, dir, maxRounds)
    val dt = (System.nanoTime() - t0) / 1e9
    println(s"PROFNND dir=$dir n=$n nExact=$nExact rounds=$rounds " +
      s"recall=$recall converged=$converged sec=$dt")
    spark.stop()
  }
}
