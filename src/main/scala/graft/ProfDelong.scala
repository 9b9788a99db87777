package graft

import org.apache.spark.sql.SparkSession

/** Measurement probe for the q434 DeLong constants (the ProfIvf
  * convention — prints the full stat tuple per SF; not part of the
  * driver surface).
  */
object ProfDelong {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    dirs.foreach { dir =>
      val (m, n, aucA, aucB, zAbs, idA, idB, varOk) =
        graft.llm.DelongAuc.delongStats(spark, dir)
      println(s"[delong] $dir m=$m n=$n aucNB=${aucA}u aucLR=${aucB}u " +
        s"|z|=${zAbs}u idNB=$idA idLR=$idB varOk=$varOk")
      val (nq, recalls) = graft.llm.VectorSearch.probeCurveRecalls(spark, dir)
      println(s"[probecurve] $dir nq=$nq " +
        recalls.map { case (p, t, g) => s"p$p=twin:$t/gen:$g" }.mkString(" "))
      val (nn, nEx, seedR, afterR) = graft.operators.Dbscan.nndStats(spark, dir)
      println(s"[nnd] $dir n=$nn exact_edges=$nEx seed=${seedR}permille " +
        s"after=${afterR}permille")
      Seq(2, 3).foreach { rr =>
        val (_, _, _, a) = graft.operators.Dbscan.nndStats(spark, dir, rr)
        println(s"[nnd] $dir rounds=$rr after=${a}permille")
      }
    }
    spark.stop()
  }
}
