package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Each query runs twice — the first run absorbs JVM /
  * codegen warm-up and is discarded, the second (warm) time is reported.
  * Failures are NOT swallowed into fast times: a failed query reports its
  * elapsed time AND appears in the `failed` list, and flips rc-style
  * `ok` to false in the JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] query failed: ${e.getMessage}")
            false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val (t1, ok1) = once(fn)
        val (t2, ok2) = if (ok1) once(fn) else (t1, false)
        (name, t2, ok1 && ok2)
    }
    // a failed query reports null (not its cold elapsed time) and is
    // excluded from total, so the aggregate stays a pure warm-time sum
    val qs = results.map { case (k, v, ok) =>
      s"\"" + k + "\":" + (if (ok) v.toString else "null")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"ok":${failed == "[]"},"sf":"$sfDir"}""")
    spark.stop()
  }
}
