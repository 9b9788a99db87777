package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for in-flight gate debugging (the ProfIvf/ProfAsof
  * convention — not part of the driver surface).
  */
object ProfDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val pred = graft.llm.NaiveBayes.predictions(spark, dir)
    println("[prof] NB confusion:")
    pred.groupBy($"true_lang", $"pred_lang").count()
      .orderBy($"true_lang", $"pred_lang").show(50)
    val acc = pred.agg(
      sum(when($"pred_lang" === $"true_lang", 1L).otherwise(0L)).as("c"),
      count(lit(1)).as("n")).head()
    println(s"[prof] NB acc = ${acc.getLong(0)}/${acc.getLong(1)}")

    val f = graft.llm.LogisticRegression.fitEval(spark, dir)
    println(s"[prof] LR losses = ${f.losses.mkString(", ")}")
    println(s"[prof] LR acc = ${f.accPermille} descent=${f.descentOk} finite=${f.finiteOk} bias=${f.bias}")
    spark.stop()
  }
}
