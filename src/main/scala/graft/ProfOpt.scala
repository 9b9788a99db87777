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
      case "q329" =>
        val fn = SparkEntry.queries("q329_bradley_terry")
        fn(s, dir).count() // warm
        for (i <- 1 to 2) t(s"q329 aqe-on run$i")(fn(s, dir))
        s.conf.set("spark.sql.adaptive.enabled", "false")
        for (i <- 1 to 2) t(s"q329 aqe-off run$i")(fn(s, dir))
        s.conf.set("spark.sql.adaptive.enabled", "true")
      case "q434" =>
        t("warm nb")(graft.llm.NaiveBayes.classScores(s, dir))
        t("nb classScores")(graft.llm.NaiveBayes.classScores(s, dir))
        t("lr fitEval.scored")(graft.llm.LogisticRegression.fitEval(s, dir).scored)
        t("pairedScores")(graft.llm.DelongAuc.pairedScores(s, dir))
        t("full q434")(SparkEntry.queries("q434_delong_paired_auc")(s, dir))
      case "q312b" =>
        // warm the session, then time the CURRENT q312 three times
        val fn = SparkEntry.queries("q312_recsys_holdout")
        fn(s, dir).count()
        for (i <- 1 to 3) t(s"full q312 run$i")(fn(s, dir))
        // stage split of the current shape, warm
        val T = graft.core.Tables
        def tt(label: String)(body: => Unit): Unit = {
          val t0 = System.nanoTime()
          body
          println(f"[profopt] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        }
        var li: DataFrame = null
        tt("li join+repart+checkpoint") {
          li = T.lineitem(s, dir)
            .join(T.orders(s, dir), $"l_orderkey" === $"o_orderkey")
            .select($"o_custkey".as("cust"), $"l_partkey".as("part"),
              $"o_orderdate", $"l_orderkey", $"l_linenumber")
            .repartition($"cust")
            .localCheckpoint()
        }
        val wLast = org.apache.spark.sql.expressions.Window
          .partitionBy($"cust")
          .orderBy($"o_orderdate".desc, $"l_orderkey".desc,
            $"l_linenumber".desc, $"part".desc)
        val test = li.withColumn("rn", row_number().over(wLast))
          .filter($"rn" === 1).select($"cust", $"part".as("test_part"))
        val cp = li.select($"cust", $"part").distinct()
        var train: DataFrame = null
        tt("train build+checkpoint") {
          train = cp.join(test, "cust")
            .filter($"part" =!= $"test_part")
            .select($"cust", $"part")
            .localCheckpoint()
        }
        var co: DataFrame = null
        tt("co pairs+checkpoint") {
          co = train.as("a").join(train.as("b"),
              $"a.cust" === $"b.cust" && $"a.part" < $"b.part")
            .groupBy($"a.part".as("p1"), $"b.part".as("p2"))
            .agg(count(lit(1)).as("c"))
            .filter($"c" >= graft.relational.TableStatsQueries.RhSupportMin)
            .localCheckpoint()
        }
        val undFull = co.select($"p1".as("item"), $"p2".as("cand"), $"c")
          .unionByName(co.select($"p2".as("item"), $"p1".as("cand"), $"c"))
        tt("und+scores+topk+verdict") {
          val und = graft.plans.TopK.perGroup(undFull, Seq("item"),
            Seq("c" -> false, "cand" -> true),
            graft.relational.TableStatsQueries.RhNeighbors)
          val scores = train.join(broadcast(und), $"part" === $"item")
            .groupBy($"cust", $"cand").agg(sum($"c").as("score"))
            .join(broadcast(train.select($"cust", $"part".as("cand"))),
              Seq("cust", "cand"), "left_anti")
          val top = graft.plans.TopK.perGroup(scores, Seq("cust"),
            Seq("score" -> false, "cand" -> true),
            graft.relational.TableStatsQueries.RhTopK)
          val evald = train.select($"cust").distinct()
          val hits = top.join(test, "cust")
            .filter($"cand" === $"test_part")
            .select($"cust").distinct()
          evald.agg(count(lit(1)).as("n_eval"))
            .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
            .write.format("noop").mode("overwrite").save()
        }
      case "q312" =>
        val T = graft.core.Tables
        def tt(label: String)(body: => Unit): Unit = {
          val t0 = System.nanoTime()
          body
          println(f"[profopt] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        }
        var li: DataFrame = null
        tt("li join+checkpoint") {
          li = T.lineitem(s, dir)
            .join(T.orders(s, dir), $"l_orderkey" === $"o_orderkey")
            .select($"o_custkey".as("cust"), $"l_partkey".as("part"),
              $"o_orderdate", $"l_orderkey", $"l_linenumber")
            .localCheckpoint()
        }
        val wLast = org.apache.spark.sql.expressions.Window
          .partitionBy($"cust")
          .orderBy($"o_orderdate".desc, $"l_orderkey".desc,
            $"l_linenumber".desc, $"part".desc)
        val test = li.withColumn("rn", row_number().over(wLast))
          .filter($"rn" === 1).select($"cust", $"part".as("test_part"))
        val cp = li.select($"cust", $"part").distinct()
        var train: DataFrame = null
        tt("train build+checkpoint") {
          train = cp.join(test, "cust")
            .filter($"part" =!= $"test_part")
            .select($"cust", $"part")
            .localCheckpoint()
        }
        var co: DataFrame = null
        tt("co pairs+checkpoint") {
          co = train.as("a").join(train.as("b"),
              $"a.cust" === $"b.cust" && $"a.part" < $"b.part")
            .groupBy($"a.part".as("p1"), $"b.part".as("p2"))
            .agg(count(lit(1)).as("c"))
            .filter($"c" >= graft.relational.TableStatsQueries.RhSupportMin)
            .localCheckpoint()
        }
        println("[profopt] co rows: " + co.count())
        val undFull = co.select($"p1".as("item"), $"p2".as("cand"), $"c")
          .unionByName(co.select($"p2".as("item"), $"p1".as("cand"), $"c"))
        var und: DataFrame = null
        tt("topk und") {
          und = graft.plans.TopK.perGroup(undFull, Seq("item"),
            Seq("c" -> false, "cand" -> true),
            graft.relational.TableStatsQueries.RhNeighbors).localCheckpoint()
        }
        var scores: DataFrame = null
        tt("scores+anti") {
          scores = train.join(und, $"part" === $"item")
            .groupBy($"cust", $"cand").agg(sum($"c").as("score"))
            .join(train.select($"cust", $"part".as("cand")),
              Seq("cust", "cand"), "left_anti").localCheckpoint()
        }
        println("[profopt] scores rows: " + scores.count())
        tt("rest") {
          val top = graft.plans.TopK.perGroup(scores, Seq("cust"),
            Seq("score" -> false, "cand" -> true),
            graft.relational.TableStatsQueries.RhTopK)
          val evald = train.select($"cust").distinct()
          val hits = top.join(test, "cust")
            .filter($"cand" === $"test_part")
            .select($"cust").distinct()
          evald.agg(count(lit(1)).as("n_eval"))
            .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
            .write.format("noop").mode("overwrite").save()
        }
        var scores2: DataFrame = null
        tt("scores2 cust-partitioned+broadcast und") {
          scores2 = train.repartition($"cust").join(broadcast(und),
              $"part" === $"item")
            .groupBy($"cust", $"cand").agg(sum($"c").as("score"))
            .join(broadcast(train.select($"cust", $"part".as("cand"))),
              Seq("cust", "cand"), "left_anti").localCheckpoint()
        }
        println("[profopt] scores2 rows: " + scores2.count())
        tt("rest2") {
          val top = graft.plans.TopK.perGroup(scores2, Seq("cust"),
            Seq("score" -> false, "cand" -> true),
            graft.relational.TableStatsQueries.RhTopK)
          val evald = train.select($"cust").distinct()
          val hits = top.join(test, "cust")
            .filter($"cand" === $"test_part")
            .select($"cust").distinct()
          evald.agg(count(lit(1)).as("n_eval"))
            .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
            .write.format("noop").mode("overwrite").save()
        }
        t("full q312")(SparkEntry.queries("q312_recsys_holdout")(s, dir))
      case _ => println(s"unknown probe $probe")
    }
    s.stop()
  }
}
