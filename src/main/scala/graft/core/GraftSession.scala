package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table-loading helpers shared by every graft module.
  *
  * Design note (scale): all queries take the data directory as a parameter
  * and read parquet through `spark.read.parquet`, so on a real cluster the
  * same code reads from HDFS/S3 with Hive-style partition discovery,
  * vectorized parquet scan, predicate pushdown, and column pruning — none
  * of that is re-implemented here.
  */
object GraftSession {
  /** Local session sized for the container (local[32], 128 GiB). On a real
    * cluster the builder is replaced by spark-submit conf; nothing else in
    * the library changes.
    */
  def local(appName: String = "graft", cores: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Parquet table loader over a scale-factor directory. */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * generations (which Spark's vectorized reader rejects — read nanos as
    * long and floor-divide to micros, the same truncation DuckDB applies
    * casting TIMESTAMP_NS → TIMESTAMP) and as plain TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) in others (Spark reads TIMESTAMP_NTZ — cast
    * to session-TZ TimestampType, identical instant under the UTC session
    * this library pins). Normalizing here keeps every consumer and every
    * oracle SQL (`CAST(ts AS TIMESTAMP)`) agnostic to the generation.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
