package graft
import org.apache.spark.sql.SparkSession
object ProfCalib {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val t = graft.llm.Calibration.stats(spark, sf)
      println(s"CALIB $sf -> nTest=${t._1} nPos=${t._2} bins=${t._3} sumN=${t._4} brier=${t._5} base=${t._6} ece=${t._7}")
      val c = graft.llm.Calibration.calibratedStats(spark, sf)
      println(s"CALCAL $sf -> nCal=${c._1} nTest=${c._2} rawBrier=${c._3} calBrier=${c._4} rawEce=${c._5} calEce=${c._6}")
    }
    spark.stop()
  }
}
