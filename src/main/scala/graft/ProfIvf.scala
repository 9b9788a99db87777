package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q81 IVF path — not part of the library. */
object ProfIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.llm.VectorSearch
    val e0 = graft.core.Tables.embeddings(spark, dir)
    (1 to 3).foreach { rep =>
      println(s"=== rep $rep")
      val n = t("count")(e0.count())
      val cells = VectorSearch.ivfCellCount(n)
      println(s"[prof] n=$n cells=$cells")
      val cb = t("fitCodebook")(VectorSearch.fitCodebook(
        e0.select($"vec_id", $"embedding"), cells))
      val e = e0.select($"vec_id", $"embedding",
        graft.functions.VectorFunctions.norm_q20($"embedding").as("norm"))
      val ranked = t("ivfRanked+checkpoint")(
        VectorSearch.ivfRanked(e, cb, VectorSearch.IvfProbes).localCheckpoint())
      t("ranked.count")(ranked.count())
      t("full ivfAnn")(VectorSearch.ivfAnn(e0).count())
    }
    spark.stop()
  }
}
