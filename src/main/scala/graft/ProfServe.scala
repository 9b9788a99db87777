package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** One-off probe: per-phase timing of q456's build + serve. */
object ProfServe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"PROFSERVE $tag ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val (pts, working, _, converged, n) =
      t("build")(graft.operators.Dbscan.nndConvergeGraph(spark, dir))
    val graph = t("graph") {
      val und = working.select($"a", $"b")
        .unionByName(working.select($"b".as("a"), $"a".as("b")))
        .distinct()
      val g = graft.plans.TopK.perGroup(
        und
          .join(pts.select($"vec_id".as("a"), $"x".as("ax"), $"y".as("ay")), "a")
          .join(pts.select($"vec_id".as("b"), $"x".as("bx"), $"y".as("by")), "b")
          .select($"a", $"b",
            (($"ax" - $"bx") * ($"ax" - $"bx") +
              ($"ay" - $"by") * ($"ay" - $"by")).as("d2")),
        Seq("a"), Seq("d2" -> true, "b" -> true),
        graft.operators.GraphServe.MaxDegree)
        .select($"a", $"b").localCheckpoint()
      g.count(); g
    }
    val queries = pts.orderBy($"vec_id").limit(graft.operators.GraphServe.QueryCount)
      .select($"vec_id".as("qid"), $"x".as("qx"), $"y".as("qy"))
      .localCheckpoint()
    def withDist(cand: org.apache.spark.sql.DataFrame) = cand
      .join(pts.select($"vec_id".as("node"), $"x", $"y"), "node")
      .join(broadcast(queries), "qid")
      .filter($"node" =!= $"qid")
      .select($"qid", $"node",
        (($"x" - $"qx") * ($"x" - $"qx") +
          (($"y" - $"qy") * ($"y" - $"qy"))).as("d2"))
    val truth = t("truth") {
      val tr = graft.plans.TopK.perGroup(
        withDist(pts.select($"vec_id".as("node"))
          .crossJoin(broadcast(queries.select($"qid")))),
        Seq("qid"), Seq("d2" -> true, "node" -> true), 1)
      tr.count(); tr
    }
    val entries = pts.select($"vec_id".as("node"))
      .orderBy(xxhash64($"node"), $"node")
      .limit(graft.operators.GraphServe.Entries)
    var beam = t("beam0")(graft.plans.TopK.perGroup(
      withDist(queries.select($"qid").crossJoin(broadcast(entries))),
      Seq("qid"), Seq("d2" -> true, "node" -> true),
      graft.operators.GraphServe.Beam).localCheckpoint())
    var h = 0
    while (h < graft.operators.GraphServe.Hops) {
      beam = t(s"hop$h") {
        val expanded = beam.select($"qid", $"node".as("a"))
          .join(graph, "a").select($"qid", $"b".as("node"))
        val all = withDist(expanded)
          .unionByName(beam.select($"qid", $"node", $"d2"))
          .groupBy($"qid", $"node").agg(min($"d2").as("d2"))
        graft.plans.TopK.perGroup(all, Seq("qid"),
          Seq("d2" -> true, "node" -> true),
          graft.operators.GraphServe.Beam).localCheckpoint()
      }
      println(s"PROFSERVE hop$h planlen=" +
        beam.queryExecution.optimizedPlan.toString.length +
        " blocks=" + spark.sparkContext.getPersistentRDDs.size)
      h += 1
    }
    spark.stop()
  }
}
