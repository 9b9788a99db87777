package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for in-flight gate debugging (the ProfIvf/ProfAsof
  * convention — not part of the driver surface).
  */
object ProfDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.core.{Tables => T}

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val li = time("li ckpt")(T.lineitem(spark, dir)
      .join(T.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("cust"), $"l_partkey".as("part"),
        $"o_orderdate", $"l_orderkey", $"l_linenumber").localCheckpoint())
    val wLast = org.apache.spark.sql.expressions.Window
      .partitionBy($"cust")
      .orderBy($"o_orderdate".desc, $"l_orderkey".desc, $"l_linenumber".desc,
        $"part".desc)
    val test = li.withColumn("rn", row_number().over(wLast))
      .filter($"rn" === 1).select($"cust", $"part".as("test_part"))
    val cp = time("cp distinct")(li.select($"cust", $"part").distinct().localCheckpoint())
    val train = time("train")(cp.join(test, "cust")
      .filter($"part" =!= $"test_part")
      .select($"cust", $"part").localCheckpoint())
    println("[prof] train rows " + train.count())
    val co = time("co pairs")(train.as("a").join(train.as("b"),
        $"a.cust" === $"b.cust" && $"a.part" < $"b.part")
      .groupBy($"a.part".as("p1"), $"b.part".as("p2"))
      .agg(count(lit(1)).as("c"))
      .filter($"c" >= 2)
      .localCheckpoint())
    println("[prof] co rows " + co.count())
    val undFull = co.select($"p1".as("item"), $"p2".as("cand"), $"c")
      .unionByName(co.select($"p2".as("item"), $"p1".as("cand"), $"c"))
    val und = time("knn cap")(graft.plans.TopK.perGroup(undFull, Seq("item"),
      Seq("c" -> false, "cand" -> true), 16).localCheckpoint())
    println("[prof] und rows " + und.count())
    val scores = time("scores")(train.join(und, $"part" === $"item")
      .groupBy($"cust", $"cand").agg(sum($"c").as("score"))
      .join(train.select($"cust", $"part".as("cand")),
        Seq("cust", "cand"), "left_anti").localCheckpoint())
    println("[prof] scores rows " + scores.count())
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy($"cust").orderBy($"score".desc, $"cand".asc)
    val top = time("topk heap")(graft.plans.TopK.perGroup(scores, Seq("cust"),
      Seq("score" -> false, "cand" -> true), 10).localCheckpoint())
    println("[prof] top rows " + top.count())
    locally {
      import org.apache.spark.sql.expressions.Window
      val df = spark.sql("SELECT CAST(l_returnflag = 'R' AS LONG) AS y, CAST(FLOOR(1000 * l_tax) AS BIGINT) AS f FROM parquet.`" + dir + "/lineitem.parquet`")
      val b = df.agg(min($"f").as("lo"), max($"f").as("hi")).head()
      val lo = b.getLong(0); val hi = b.getLong(1)
      println(s"[prof] tax lo=$lo hi=$hi")
      val binned = df.select($"y", expr(s"CAST((f - $lo) * 32 div (${hi - lo + 1}) AS BIGINT)").as("bin"))
      val hist = binned.groupBy($"bin").agg(count(lit(1)).as("n"), sum($"y").as("p")).orderBy($"bin")
      hist.show(40)
    }
    spark.stop()
  }
}
