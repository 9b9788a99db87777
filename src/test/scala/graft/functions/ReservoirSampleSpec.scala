package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReservoirSampleSpec extends SparkSpec {
  import spark.implicits._

  private def sample(ids: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    GraftFunctions.register(spark)
    ids.toDF("id").repartition(parts)
      .agg(expr(s"reservoir_sample(id, $k)"))
      .as[Seq[Long]].head()
  }

  test("priority matches the 15-hex-char md5 prefix order") {
    // reference: parse the prefix with BigInt — must equal the bit-fiddled form
    (0L to 200L).foreach { id =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("US-ASCII"))
        .map(b => f"$b%02x").mkString.take(15)
      assert(ReservoirSample.priority(id) === BigInt(hex, 16).toLong,
        s"id $id")
    }
  }

  test("result is the exact bottom-k and independent of partitioning") {
    val ids = (1L to 500L)
    val expected = ids.sortBy(id => (ReservoirSample.priority(id), id)).take(7)
    assert(sample(ids, 7, parts = 1) === expected)
    assert(sample(ids, 7, parts = 13) === expected) // different merge tree
    assert(sample(scala.util.Random.shuffle(ids.toVector), 7, parts = 5)
      === expected) // different row order
  }

  test("groups smaller than k return every id") {
    assert(sample(Seq(42L, 7L, 99L), 10, parts = 2).sorted === Seq(7L, 42L, 99L))
  }

  test("nulls are skipped") {
    GraftFunctions.register(spark)
    val out = Seq(Some(1L), None, Some(2L), None).toDF("id")
      .agg(expr("reservoir_sample(id, 10)")).as[Seq[Long]].head()
    assert(out.sorted === Seq(1L, 2L))
  }
}
