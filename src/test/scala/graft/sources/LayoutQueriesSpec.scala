package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compaction (q113's operator) under a target small enough to force
  * the MULTI-file-per-partition path — the per-partition byte budget
  * must shape the output layout, and the rewrite must be
  * content-identical.
  */
class LayoutQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def parquetSizesByPart(root: String): Map[String, (Int, Long)] = {
    val it = Files.walk(java.nio.file.Paths.get(root)).iterator()
    scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
      .filter(_.toString.endsWith(".parquet")).toList
      .groupBy(_.getParent.getFileName.toString)
      .map { case (k, v) => k -> (v.size, v.map(Files.size).sum) }
  }

  test("bloom layout embeds filters; a plain write does not (negative control)") {
    val dir = "/root/testdata/sf0.001"
    val plain = Files.createTempDirectory("plain-orders").toString
    graft.core.Tables.orders(spark, dir).repartition(2)
      .write.mode("overwrite").parquet(plain)
    assert(!LayoutQueries.bloomPresent(spark, plain, LayoutQueries.BloomCol),
      "plain parquet write unexpectedly carries bloom filters")
    val out = LayoutQueries.q128BloomLookup(spark, dir).collect()
    assert(out.nonEmpty, "probe key missing from fixture")
    assert(out.forall(_.getAs[Boolean]("bloom_ok")))
    assert(out.forall(_.getAs[Long]("o_orderkey") == LayoutQueries.BloomProbeKey))
  }

  test("compact honors the per-partition byte budget and preserves content") {
    val target = 64L * 1024
    val src = Files.createTempDirectory("frag-src").toString
    val dst = Files.createTempDirectory("compact-dst").toString
    // two partitions, one much larger than the other — the large one
    // must exceed the byte target so the multi-file path engages
    val df = spark.range(0, 30000)
      .select(($"id" % 2).cast("string").as("part"),
        $"id", (rand(7) * 100).as("v"))
      .filter($"part" === "0" || $"id" < 6000)
    df.withColumn("salt", pmod($"id", lit(6)))
      .repartition($"part", $"salt")
      .write.mode("overwrite").partitionBy("part").parquet(src)
    val before = spark.read.parquet(src)
      .select($"id", $"v", $"part".cast("string").as("part"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toSet
    val srcSizes = parquetSizesByPart(src)
    assert(srcSizes.values.exists(_._2 > target),
      s"fixture too small to exercise the multi-file path: $srcSizes")
    LayoutQueries.compact(spark, src, dst, "part",
      Seq("id"), targetBytes = target)
    // contract: ceil(srcPartitionBytes / target) files per partition —
    // the big partition splits, the small one compacts to one file
    val dstSizes = parquetSizesByPart(dst)
    srcSizes.foreach { case (part, (_, bytes)) =>
      val want = math.max(1, math.ceil(bytes.toDouble / target).toInt)
      val got = dstSizes.get(part).map(_._1).getOrElse(0)
      assert(got == want,
        s"$part: $bytes bytes at target $target → want $want files, " +
          s"got $got ($dstSizes)")
    }
    assert(dstSizes.values.exists(_._1 > 1),
      s"multi-file path never engaged: $dstSizes — shrink the target")
    val after = spark.read.parquet(dst)
      .select($"id", $"v", $"part".cast("string").as("part"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toSet
    assert(after == before, "compaction changed the table content")
  }
}
