package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** One-off probe: Louvain refinement trajectory from LPA and from
  * singletons on the gear co-purchase graph (q452 design).
  */
object ProfLouvain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val gl = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .filter($"p_name".like("%gear%"))
      .select($"l_orderkey", $"l_partkey")
    val edges = gl.as("a").join(gl.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" &&
          $"a.l_partkey" =!= $"b.l_partkey")
      .select($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
      .distinct().localCheckpoint()
    val twoM = edges.count()
    val lpa = graft.operators.LabelPropagation.propagate(edges)
    val (l1, s1, e1, a1) = graft.operators.Louvain.refine(edges, lpa, rounds)
    println(s"PROFLOUVAIN dir=$dir twoM=$twoM fromLPA start=$s1 end=$e1 accepted=$a1")
    val single = edges.select($"u".as("node")).distinct()
      .withColumn("label", $"node")
    val (l2, s2, e2, a2) = graft.operators.Louvain.refine(edges, single, rounds)
    println(s"PROFLOUVAIN dir=$dir twoM=$twoM fromSingle start=$s2 end=$e2 accepted=$a2 (lpaQ=$s1)")
    spark.stop()
  }
}
