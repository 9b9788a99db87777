package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 optimization scratch profiler: times sub-stages of the
  * bench's slowest entries in isolation (noop-sink discipline, guide
  * §1.4) so the expensive stage is identified before anything is
  * changed. Usage: runMain graft.ProfOpt <sfDir> <probe>
  */
object ProfOpt {
  def t(label: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[profopt] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val probe = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    probe match {
      case "q361" =>
        val T = graft.core.Tables
        val names = T.customer(s, dir).select($"c_custkey", $"c_name")
        def keys = names.select($"c_custkey", $"c_name",
          explode(expr(
            """array_distinct(concat(array(c_name),
              |  transform(sequence(1, length(c_name)),
              |    i -> concat(substr(c_name, 1, i - 1),
              |                substr(c_name, i + 1, length(c_name))))))"""
              .stripMargin)).as("k"))
        t("keys explode")(keys)
        val kcount = keys.groupBy($"k").agg(count(lit(1)).as("n"))
        println("[profopt] key buckets: " + kcount.agg(
          count(lit(1)), max($"n"), sum($"n" * $"n")).head())
        def cand = keys.as("a").join(keys.as("b"),
            $"a.k" === $"b.k" && $"a.c_custkey" < $"b.c_custkey")
          .select($"a.c_custkey".as("cust1"), $"a.c_name".as("n1"),
            $"b.c_custkey".as("cust2"), $"b.c_name".as("n2"))
        t("join (no distinct)")(cand)
        println("[profopt] cand rows pre-distinct: " + cand.count())
        t("join + distinct")(cand.distinct())
        println("[profopt] cand rows distinct: " + cand.distinct().count())
        t("full q361")(SparkEntry.queries("q361_deletion_join")(s, dir))
      case _ => println(s"unknown probe $probe")
    }
    s.stop()
  }
}
