package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling main: q559 Borůvka unroll-constant measurement —
  * prints (rounds, max halving steps, mst edges, wall secs) per SF so
  * the MstMaxRounds/MstMaxHalve scaladoc numbers are MEASURED, not
  * guessed (the q522 rule).
  */
object ProfMst {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    dirs.foreach { dir =>
      val t0 = System.nanoTime()
      val n = graft.operators.BoruvkaMst
        .q559BoruvkaMst(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[profmst] $dir rounds=${graft.operators.BoruvkaMst.lastRounds}" +
        f" maxHalve=${graft.operators.BoruvkaMst.lastMaxHalve}" +
        f" edges=$n secs=$secs%.1f")
    }
    spark.stop()
  }
}
