package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NfcNormalize expression: reference parity with java.text.Normalizer,
  * idempotence, ASCII passthrough, null handling, SQL ≡ Column API.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val decomposedCafe = "café"   // e + combining acute
  private val precomposedCafe = "café"   // é as one codepoint

  test("composes decomposed sequences to the precomposed form") {
    val out = Seq((1L, decomposedCafe), (2L, precomposedCafe),
        (3L, "plain ascii"), (4L, "naïve mixed é"))
      .toDF("id", "s")
      .select($"id", TextFunctions.nfcNormalize($"s").as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == precomposedCafe, "decomposed must compose")
    assert(out(2L) == precomposedCafe, "precomposed must be unchanged")
    assert(out(3L) == "plain ascii")
    assert(out(4L) == java.text.Normalizer.normalize(
      "naïve mixed é", java.text.Normalizer.Form.NFC))
  }

  test("idempotent and null-safe") {
    val once = Seq(Tuple1(decomposedCafe)).toDF("s")
      .select(TextFunctions.nfcNormalize($"s").as("n"))
    val twice = once.select(TextFunctions.nfcNormalize($"n").as("n"))
    assert(once.as[String].head() == twice.as[String].head())
    val withNull = Seq[Option[String]](None, Some(decomposedCafe))
      .toDF("s").select(TextFunctions.nfcNormalize($"s").as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(withNull.count(_.isEmpty) == 1)
  }

  test("SQL function form matches the Column API") {
    GraftFunctions.register(spark)
    Seq((1L, decomposedCafe), (2L, "abc"))
      .toDF("id", "s").createOrReplaceTempView("nfc_in")
    val viaSql = spark.sql(
      "SELECT id, nfc_normalize(s) AS n FROM nfc_in ORDER BY id")
      .as[(Long, String)].collect().toSeq
    val viaCol = Seq((1L, decomposedCafe), (2L, "abc")).toDF("id", "s")
      .select($"id", TextFunctions.nfcNormalize($"s").as("n"))
      .orderBy($"id").as[(Long, String)].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("dedup collapse: NFC variants of one text hash-dedupe together") {
    val docs = Seq((1L, decomposedCafe), (2L, precomposedCafe))
      .toDF("doc_id", "text")
    val distinctRaw = docs.select(sha2($"text", 256)).distinct().count()
    val distinctNfc = docs
      .select(sha2(TextFunctions.nfcNormalize($"text"), 256))
      .distinct().count()
    assert(distinctRaw == 2L && distinctNfc == 1L)
  }
}
