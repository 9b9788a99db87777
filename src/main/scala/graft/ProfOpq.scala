package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** One-off probe: PQ vs OPQ corpus distortion (q453 design). */
object ProfOpq {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.llm.{Opq, ProductQuantization => PQ}
    val e = graft.core.Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val norm = PQ.normalized(e).localCheckpoint()
    val sample = norm.orderBy(xxhash64($"vec_id"), $"vec_id")
      .limit(PQ.PqSampleSize).select($"embedding").as[Array[Double]].collect()
    val m = PQ.SubspaceCount; val k = PQ.CodebookSize
    val sd = sample(0).length / m
    val cbPq = (0 until m).flatMap { sub =>
      PQ.fitSubspace(sample.map(v => v.slice(sub * sd, (sub + 1) * sd)), k)
        .zipWithIndex.map { case (c, code) => (sub, code, c) } }
    val t0 = System.nanoTime()
    val (r, cbOpq) = Opq.fitOpq(sample, m, k)
    val fitSec = (System.nanoTime() - t0) / 1e9
    val rot = Opq.rotate(norm, r).localCheckpoint()
    val (n1, pq) = Opq.distortionMicro(norm, cbPq)
    val (n2, opq) = Opq.distortionMicro(rot, cbOpq)
    println(s"PROFOPQ dir=$dir n=$n1/$n2 pqMicro=$pq opqMicro=$opq ratio=${opq.toDouble/pq} fitSec=$fitSec")
    spark.stop()
  }
}
