package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WordPiece greedy segmentation: the algorithm's decision points on
  * hand cases, the full designed-vocab truth table, all-or-nothing
  * UNK, and lossless round-trip of every segmented fixture word.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def seg(w: String, vocab: Seq[String] = WordPieceQuery.Vocab)
      : Seq[String] = {
    val df = Seq(w).toDF("w")
      .select(graft.functions.WordPieceTokens($"w", vocab).as("p"))
    df.as[Seq[String]].head()
  }

  test("greedy longest-match-first at both positions; UNK is all-or-nothing") {
    // position 0: 'ag' beats 'a'
    assert(seg("agg") == Seq("ag", "##g"))
    // continuation: '##ter' beats '##t', '##ge' beats '##g'
    assert(seg("filter") == Seq("fil", "##ter"))
    assert(seg("merge") == Seq("mer", "##ge"))
    // '##ery' keeps 'query' from dead-ending after '##er'
    assert(seg("query") == Seq("qu", "##ery"))
    // a mid-word dead-end poisons the WHOLE word, not a suffix
    assert(seg("aggz") == Seq("[UNK]"))
    assert(seg("zzz") == Seq("[UNK]"))
    assert(seg("") == Seq("[UNK]"))
  }

  test("designed-vocab truth table holds and round-trips losslessly") {
    WordPieceQuery.Truth.foreach { case (w, pieces) =>
      val got = seg(w)
      assert(got.mkString(" ") == pieces, s"word $w")
      // de-tokenize: strip ## marks, concatenate -> the original word
      assert(got.map(_.stripPrefix("##")).mkString == w)
    }
  }
}
