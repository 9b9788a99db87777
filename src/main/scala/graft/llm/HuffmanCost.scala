package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** HUFFMAN ENTROPY-CODING COST of the token stream (Huffman 1952) —
  * the corpus-compression estimate next to the lexical-stats family
  * (q129 rare-token LM, q354 Zipf slope, q415 Hill tail): "what would
  * this corpus cost, entropy-coded at the token level" prices storage
  * and detects degenerate token distributions (a collapsing vocabulary
  * compresses suspiciously well).
  *
  * Shape: the corpus collapses to the VOCAB-BOUNDED unigram census in
  * one partial agg; the Huffman tree builds driver-side on that
  * model-sized frame (the q363/q394 collected-model precedent) with
  * DETERMINISTIC tie-breaking — nodes merge by (weight, creation
  * order) over an input sorted by (cnt, term) — so code lengths are
  * reproducible; lengths broadcast back and the total bit cost is one
  * distributed Σ cnt·len.
  *
  * Gates (in-engine, the index-gate convention):
  *   - KRAFT EQUALITY: a Huffman tree is full, so Σ 2^(Lmax−len) must
  *     equal 2^Lmax EXACTLY (BIGINT; guarded Lmax ≤ 62);
  *   - Shannon OPTIMALITY band: H ≤ avg_len < H+1 bits/token, H from
  *     driver-side logs on exact counts;
  *   - compression sanity: total_bits strictly below the fixed-width
  *     cost n·⌈log₂ V⌉.
  * The oracle pins (n_tokens, n_symbols, ok) — code lengths are not
  * SQL-derivable, the weak-pin convention for index internals.
  */
object HuffmanCost {

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic Huffman code lengths for (term, cnt) pairs:
    * two-queue O(n) merge over the count-sorted census, ties by queue
    * discipline (leaves before internals at equal weight).
    */
  def codeLengths(census: Seq[(String, Long)]): Map[String, Int] = {
    require(census.nonEmpty)
    if (census.sizeIs == 1) return Map(census.head._1 -> 1)
    // node = (weight, members)
    val leaves = scala.collection.mutable.Queue(
      census.sortBy { case (t, c) => (c, t) }
        .map { case (t, c) => (c, List(t)) }: _*)
    val internals =
      scala.collection.mutable.Queue.empty[(Long, List[String])]
    val depth = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    def pop(): (Long, List[String]) =
      if (internals.isEmpty) leaves.dequeue()
      else if (leaves.isEmpty) internals.dequeue()
      // strict < : at equal weight prefer the LEAF queue (deterministic)
      else if (internals.head._1 < leaves.head._1) internals.dequeue()
      else leaves.dequeue()
    while (leaves.nonEmpty || internals.size > 1) {
      val (wa, ma) = pop()
      val (wb, mb) = pop()
      (ma ++ mb).foreach(t => depth(t) += 1)
      internals.enqueue((wa + wb, ma ++ mb))
    }
    depth.toMap
  }

  /** (n_tokens, n_symbols, total_bits, kraft_ok, entropy_ok,
    * beats_fixed) — public for the spec.
    */
  def huffmanStats(s: SparkSession, dir: String)
      : (Long, Long, Long, Boolean, Boolean, Boolean) = {
    import s.implicits._
    val census = T.documents(s, dir)
      .select(explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val model = census.as[(String, Long)].collect().toSeq
    val lens = codeLengths(model)
    val n = model.map(_._2).sum
    val v = model.size.toLong
    // distributed cost: lengths broadcast back, one Σ cnt·len
    val lenDf = lens.toSeq.toDF("term", "len")
    val totalBits = census.join(broadcast(lenDf), "term")
      .agg(sum($"cnt" * $"len")).as[Long].head()
    // Kraft equality on exact integers
    val lmax = lens.values.max
    require(lmax <= 62, s"Huffman depth $lmax exceeds the int64 guard")
    val kraft = lens.values.map(l => 1L << (lmax - l)).sum == (1L << lmax)
    // Shannon band from exact counts (driver logs, in-engine gate only)
    val h = model.map { case (_, c) =>
      c.toDouble * math.log(n.toDouble / c.toDouble)
    }.sum / math.log(2.0)
    val avgOk = totalBits.toDouble >= h - 1e-6 &&
      totalBits.toDouble < h + n.toDouble
    val fixedBits = n * (64 - java.lang.Long.numberOfLeadingZeros(v - 1))
    (n, v, totalBits, kraft, avgOk, totalBits < fixedBits)
  }

  val q493HuffmanCost: Q = (s, dir) => {
    import s.implicits._
    val (n, v, _, kraft, entropy, beats) = huffmanStats(s, dir)
    Seq((n, v, kraft && entropy && beats)).toDF(
      "n_tokens", "n_symbols", "ok")
  }

  val q493Sql: String =
    """WITH toks AS (
      |  SELECT UNNEST(string_split(text, ' ')) AS term FROM documents)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(DISTINCT term) AS BIGINT) AS n_symbols,
      |  TRUE AS ok
      |FROM toks WHERE term <> ''""".stripMargin

  val queries: Map[String, Q] = Map(
    "q493_huffman_cost" -> q493HuffmanCost)
  val oracleSql: Map[String, String] = Map(
    "q493_huffman_cost" -> q493Sql)
}
