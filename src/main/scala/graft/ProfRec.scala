package graft
import org.apache.spark.sql.SparkSession
/** One-off probe: does this Spark build support WITH RECURSIVE? */
object ProfRec {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val out = spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM t WHERE n < 5)
          |SELECT SUM(n) AS s FROM t""".stripMargin).head()
      println(s"PROFREC ok sum=${out.get(0)}")
    } catch {
      case e: Throwable => println(s"PROFREC unsupported: ${e.getMessage.take(200)}")
    }
    spark.stop()
  }
}
