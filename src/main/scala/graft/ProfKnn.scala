package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** One-off scale probe: q345's grid-kNN with a parameterized radius,
  * to measure the eps knob against fixture density (BASELINE.md §sf1).
  */
object ProfKnn {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val eps = args(1).toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def run(): Long = {
      val pts = graft.core.Tables.embeddings(spark, dir)
        .select($"vec_id",
          expr(s"CAST(FLOOR(1000 * embedding[0]) AS BIGINT)").as("x"),
          expr(s"CAST(FLOOR(1000 * embedding[1]) AS BIGINT)").as("y"))
        .localCheckpoint()
      val withCell = pts.withColumn("cx", expr(s"x div $eps"))
        .withColumn("cy", expr(s"y div $eps"))
      val probe = withCell.select($"vec_id".as("a"), $"x".as("ax"), $"y".as("ay"),
          explode(expr("transform(sequence(-1, 1), dx -> dx)")).as("dx"), $"cx", $"cy")
        .select($"a", $"ax", $"ay", ($"cx" + $"dx").as("jx"),
          explode(expr("transform(sequence(-1, 1), dy -> dy)")).as("dy"), $"cy")
        .select($"a", $"ax", $"ay", $"jx", ($"cy" + $"dy").as("jy"))
      val cand = probe.join(withCell.select($"vec_id".as("b"), $"x".as("bx"),
          $"y".as("by"), $"cx".as("jx"), $"cy".as("jy")), Seq("jx", "jy"))
        .filter($"a" =!= $"b")
        .withColumn("d2", ($"ax"-$"bx")*($"ax"-$"bx") + ($"ay"-$"by")*($"ay"-$"by"))
        .filter($"d2" <= eps * eps).select($"a", $"b", $"d2")
      graft.plans.TopK.perGroup(cand, Seq("a"), Seq("d2" -> true, "b" -> true), 5).count()
    }
    run() // warm-up
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); val n = run(); (System.nanoTime()-t0)/1e9
    }.sorted
    println(s"PROFKNN dir=$dir eps=$eps median=${ts(1)}")
    spark.stop()
  }
}
