package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property tests for the engine-internal dedup signatures (no DuckDB
  * oracle: xxhash64 is engine-specific): planted near-duplicates must be
  * caught, clearly-distinct docs must not collide, and signatures must
  * be deterministic across runs.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 ≈ doc 2 (one word changed out of 30), doc 3 unrelated
  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon " +
      "phi chi psi omega one two three four five six"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon " +
      "phi chi psi omega one two three four five SEVEN"),
    (3L, "completely different words about cooking pasta with tomato " +
      "sauce and basil leaves in a big red pot on the stove tonight " +
      "while singing loud songs from old radio shows forever")
  ).toDF("doc_id", "text")

  test("minhash LSH catches planted near-dups, not distinct docs") {
    val cands = DedupQueries.minhashCandidates(spark, docs)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)), "near-dup pair (1,2) missed")
    assert(!cands.contains((1L, 3L)) && !cands.contains((2L, 3L)),
      "distinct docs flagged as candidates")
  }

  test("simhash: near-dups within small hamming distance, distinct far") {
    val sims = (1 to 2).map { _ =>
      DedupQueries.q42Simhash(spark, "/root/testdata/sf0.001")
        .limit(5).as[(Long, Long)].collect().toSeq
    }
    assert(sims(0) == sims(1), "simhash not deterministic across runs")

    val planted = docs.select($"doc_id", explode(split($"text", " ")).as("w"))
      .withColumn("h", xxhash64($"w"))
    // reuse the query logic on the planted frame via temp swap
    val byDoc = {
      val bitVotes = (0 until 64).map(b =>
        sum(when(shiftright($"h", b).bitwiseAND(1) === 1, 1)
          .otherwise(-1)).as(s"b$b"))
      val voted = planted.groupBy($"doc_id")
        .agg(bitVotes.head, bitVotes.tail: _*)
      val sim = (0 until 64).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b))
      voted.select($"doc_id", sim.as("s")).as[(Long, Long)]
        .collect().toMap
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(byDoc(1L), byDoc(2L)) <= 12,
      s"near-dups too far: ${ham(byDoc(1L), byDoc(2L))}")
    assert(ham(byDoc(1L), byDoc(3L)) > 12,
      s"distinct docs too close: ${ham(byDoc(1L), byDoc(3L))}")
  }

  test("SimHash64 expression is bit-identical to the vote-aggregate spelling") {
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaExpr = DedupQueries.q42Simhash(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect().toMap
    val tok = corpus
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .withColumn("h", xxhash64($"w"))
    val bitVotes = (0 until 64).map(b =>
      sum(when(shiftright($"h", b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$b"))
    val voted = tok.groupBy($"doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val sim = (0 until 64).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    val viaAgg = voted.select($"doc_id", sim.as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(viaExpr == viaAgg, "codegen SimHash64 diverged from the agg spelling")
  }

  test("stop-shingle df cap bounds hot-shingle pair explosion") {
    implicit val s = spark
    // 20 docs sharing ONE hot shingle ("the quick brown"), otherwise
    // pairwise-distinct: the uncapped inverted index materializes all
    // C(20,2)=190 pairs from that single posting list.
    val hot = (1 to 20).map { i =>
      (i.toLong, s"the quick brown u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f")
    }.toDF("doc_id", "text")
    val uncapped = DedupQueries
      .ngramJaccardPairs(hot, minJaccard = 0.0, dfCap = 1000).count()
    assert(uncapped == 190L, s"expected full 190-pair explosion, got $uncapped")
    // df cap below the hot shingle's frequency drops it from the
    // universe: no shared shingles remain, zero pairs materialize.
    val capped = DedupQueries
      .ngramJaccardPairs(hot, minJaccard = 0.0, dfCap = 5).count()
    assert(capped == 0L, s"hot shingle not dropped: $capped pairs")
  }

  test("near-duplicate pipeline: LSH candidates verified by exact jaccard") {
    val nd = DedupQueries.nearDuplicates(spark, docs, minJaccard = 0.5)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(nd == Set((1L, 2L)),
      s"expected exactly the planted near-dup pair, got $nd")
  }

  test("simhash banding finds hamming-close pairs, rejects far ones") {
    val base = 0x0123456789ABCDEFL
    val sims = Seq(
      (1L, base),
      (2L, base ^ 1L), // hamming 1 → candidate via 3 untouched bands
      (3L, base ^ ((1L << 1) | (1L << 21) | (1L << 41) | (1L << 61))),
      // ^ one flip in EVERY band → no band collides with doc 1 (hamming
      //   4) or doc 2 (hamming 5: bits 0,1,21,41,61)
      (4L, 0x7777777777777777L)) // far from everything
      .toDF("doc_id", "simhash")
    val cands = DedupQueries.simhashCandidates(spark, sims, maxHamming = 3)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(cands == Set((1L, 2L)), s"banded candidates wrong: $cands")
  }

  test("exact jaccard verifies the minhash candidate") {
    val tri = docs.select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
        .as("tg")).distinct()
    val sizes = tri.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter12 = tri.as("a").join(tri.as("b"),
        $"a.tg" === $"b.tg" && $"a.doc_id" === 1 && $"b.doc_id" === 2)
      .count()
    val n = sizes.as[(Long, Long)].collect().toMap
    val jac = inter12.toDouble / (n(1L) + n(2L) - inter12)
    assert(jac > 0.8, s"planted pair jaccard $jac should be high")
  }

  test("prefix-filter join is lossless vs the exact all-pairs recompute") {
    implicit val sp = spark
    // Varied-length corpus: planted near-dup pair (1,2), a planted
    // SHORTER echo (4 ≈ 5, different length regime), and unrelated docs.
    val corpus = (docs.as[(Long, String)].collect().toSeq ++ Seq(
      (4L, "red orange yellow green blue indigo violet pink brown black " +
        "white gray silver gold bronze copper iron steel tin lead"),
      (5L, "red orange yellow green blue indigo violet pink brown black " +
        "white gray silver gold bronze copper iron steel tin ZINC"),
      (6L, "six entirely unrelated tokens forming nothing alike at all " +
        "in this sentence about quiet mountain lakes under winter stars")))
      .toDF("doc_id", "text")
    val viaPrefix = DedupQueries.prefixFilterPairs(corpus, 7, 10)
      .select($"doc1", $"doc2", $"inter").as[(Long, Long, Long)]
      .collect().toSet
    // exact all-pairs over the same shingle universe (no df cap)
    val viaExact = DedupQueries.ngramJaccardPairs(corpus, 0.7, Int.MaxValue)
      .select($"doc1", $"doc2", $"inter").as[(Long, Long, Long)]
      .collect().toSet
    assert(viaExact.map(p => (p._1, p._2)).contains((1L, 2L)),
      "fixture broken: planted pair not a true near-dup")
    assert(viaPrefix == viaExact,
      s"prefix filter diverged: prefix=$viaPrefix exact=$viaExact")
  }

  test("prefix length formula: whole set at n=1, ~0.3n+1 at larger n") {
    // p = n - ceil(0.7 n) + 1 via integer arithmetic (7n+9) div 10
    def p(n: Int) = n - (7 * n + 9) / 10 + 1
    assert(p(1) == 1 && p(2) == 1 && p(10) == 4 && p(100) == 31)
    // never longer than the set, always at least 1
    (1 to 200).foreach(n => assert(p(n) >= 1 && p(n) <= n))
  }

  test("lcsTokens: classic cases, reordering, symmetry, bounds") {
    def t(x: String) = x.split(" ").toSeq
    val lcs = DedupQueries.lcsTokens _
    assert(lcs(t("a b c d"), t("b q c d z")) == 3L) // b c d
    assert(lcs(t("a b c"), t("x y z")) == 0L)
    assert(lcs(t("a b c"), t("a b c")) == 3L)
    assert(lcs(Seq.empty, t("a b")) == 0L)
    // REORDERED duplication — the case q344's consecutive-run metric
    // under-reports: paragraph swap keeps LCS at the larger block
    val p1 = t("one two three four five six seven eight")
    val swapped = t("five six seven eight one two three four")
    assert(lcs(p1, swapped) == 4L, "LCS should keep the larger block")
    // symmetry + bounds
    val a = t("the quick brown fox jumps over the lazy dog")
    val b = t("a quick fox leaps over a lazy dog today")
    assert(lcs(a, b) == lcs(b, a))
    assert(lcs(a, b) <= math.min(a.length, b.length))
  }

  test("CWS sketches: identical weights collide everywhere, disjoint never") {
    import spark.implicits._
    // two docs with IDENTICAL token censuses (wJ = 1 → every seed
    // collides: the sample is a pure function of the shared census),
    // one disjoint doc (wJ = 0 → no seed can collide: samples are
    // drawn from disjoint token sets)
    val tc = Seq(
      (1L, "alpha", 3L), (1L, "beta", 1L), (1L, "gamma", 2L),
      (2L, "alpha", 3L), (2L, "beta", 1L), (2L, "gamma", 2L),
      (3L, "delta", 4L), (3L, "epsilon", 2L))
      .toDF("doc_id", "tok", "c")
    val sk = DedupQueries.cwsSketch(tc)
      .as[(Long, Int, String, Long)].collect()
      .groupBy(_._1).map { case (d, rows) =>
        d -> rows.map(r => r._2 -> ((r._3, r._4))).toMap
      }
    assert(sk(1L).size == DedupQueries.CwsSeeds)
    assert(sk(1L) == sk(2L), "wJ=1 pair must collide on every seed")
    (0 until DedupQueries.CwsSeeds).foreach { s0 =>
      assert(sk(1L)(s0) != sk(3L)(s0), s"disjoint docs collided on seed $s0")
    }
    // determinism across evaluations
    val again = DedupQueries.cwsSketch(tc)
      .as[(Long, Int, String, Long)].collect()
      .groupBy(_._1).map { case (d, rows) =>
        d -> rows.map(r => r._2 -> ((r._3, r._4))).toMap
      }
    assert(again == sk)
  }

  test("smith-waterman: local block beats scattered overlap; gaps pay") {
    def t(x: String) = x.split(" ").toSeq
    val sw = DedupQueries.swTokens _
    // identical: every token matches, score 2n
    assert(sw(t("a b c d"), t("a b c d")) == 8L)
    // disjoint: floor at 0
    assert(sw(t("a b c"), t("x y z")) == 0L)
    // LOCAL vs SCATTERED: same 4 shared tokens — the contiguous block
    // scores 8, the scattered version pays a mismatch (-1) between
    // every match so the best local region scores less
    val block = sw(t("x a b c d y"), t("p a b c d q"))
    val scattered = sw(t("a x b x c x d"), t("a y b y c y d"))
    assert(block == 8L, s"block $block")
    assert(scattered < block, s"scattered $scattered !< block $block")
    assert(scattered == 2L + 3L * (2L - 1L), // 4 matches, 3 mismatch gaps
      s"scattered $scattered")
    // one gap: aligning 'a b c' vs 'a b x c' pays a single -1
    assert(sw(t("a b c"), t("a b x c")) == 2L + 2L + 2L - 1L)
  }
}
