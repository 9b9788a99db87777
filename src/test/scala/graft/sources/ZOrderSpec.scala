package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order clustering: bit-level correctness of the Morton interleave,
  * the footer-stats locality contract against both an unclustered and a
  * single-column-sorted layout, and content preservation.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("spread16/zvalue match a reference bit interleave") {
    def refSpread(x: Long): Long =
      (0 until 16).map(i => ((x >> i) & 1L) << (2 * i)).sum
    val samples = Seq(0L, 1L, 2L, 3L, 0xFFL, 0xFFFFL, 0xA5A5L, 12345L)
    val got = samples.toDF("x")
      .select(ZOrderQueries.spread16($"x").as("s"))
      .as[Long].collect().toSeq
    assert(got == samples.map(refSpread))
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFL, 0L),
      (0L, 0xFFFFL), (0x1234L, 0xABCDL))
    val z = pairs.toDF("a", "b")
      .select(ZOrderQueries.zvalue($"a", $"b").as("z"))
      .as[Long].collect().toSeq
    assert(z == pairs.map { case (a, b) =>
      refSpread(a) | (refSpread(b) << 1)
    })
    // morton keys of axis extremes: interleave is a bijection on 32 bits
    assert(z.toSet.size == pairs.size)
  }

  test("z-ordered layout shrinks per-file footer ranges on BOTH dims; " +
    "linear sort only on its own") {
    val n = 200000L
    // two independent-ish dims with full spread
    val df = spark.range(0, n).select(
      (pmod(xxhash64($"id"), lit(10000))).as("a"),
      (pmod(xxhash64($"id" + 7), lit(10000))).as("b"),
      $"id".as("payload"))
    val zDir = Files.createTempDirectory("z-layout").toString
    val sortDir = Files.createTempDirectory("sort-layout").toString
    val scatterDir = Files.createTempDirectory("scatter-layout").toString
    val files = 16
    ZOrderQueries.zorderWrite(df, "a", "b", zDir, files)
    df.repartitionByRange(files, $"a").sortWithinPartitions($"a")
      .write.mode("overwrite").parquet(sortDir)
    df.repartition(files)
      .write.mode("overwrite").parquet(scatterDir)
    def mean(root: String, c: String) =
      ZOrderQueries.meanFooterRange(spark, root, c)
    val global = 9999.0
    // scatter: every file covers ~the full range on both dims
    assert(mean(scatterDir, "a") > 0.9 * global)
    assert(mean(scatterDir, "b") > 0.9 * global)
    // linear sort: tight on a, full-width on b — the gap z-order closes
    assert(mean(sortDir, "a") < 0.2 * global)
    assert(mean(sortDir, "b") > 0.9 * global)
    // z-order: BOTH dims tighten (16 files ⇒ ~1/4 of global each; allow
    // slack for tile-boundary files)
    assert(mean(zDir, "a") < 0.5 * global,
      s"z files not clustered on a: ${mean(zDir, "a")}")
    assert(mean(zDir, "b") < 0.5 * global,
      s"z files not clustered on b: ${mean(zDir, "b")}")
    // content preserved: clustering is a pure permutation
    val before = df.select($"a", $"b", $"payload").collect().toSet
    val after = spark.read.parquet(zDir)
      .select($"a", $"b", $"payload").collect().toSet
    assert(after == before)
  }

  test("q125 plan pushes the band filter and the row passes its gates") {
    val out = ZOrderQueries.q125ZOrderCluster(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("clustered_ok")),
      "footer locality gate failed at sf0.001")
  }
}
