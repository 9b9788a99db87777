package graft.llm

import graft.SparkSpec

/** Unigram tokenizer training: Viterbi DP correctness (best path,
  * longer-tie rule, coverage failure), EM on a planted corpus (the
  * repeated bigram must dominate), LL monotonicity, and determinism.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("segment picks the maximum-likelihood path") {
    val logp = Map(
      "a" -> math.log(0.1), "b" -> math.log(0.1),
      "ab" -> math.log(0.5), "ba" -> math.log(0.2))
    // 'abab': [ab, ab] (log .5+.5) beats [a, ba, b] and char path
    assert(UnigramLm.segment("abab", logp).toSeq == Seq("ab", "ab"))
    // 'aba': [ab, a] (.5*.1) beats [a, ba] (.1*.2)
    assert(UnigramLm.segment("aba", logp).toSeq == Seq("ab", "a"))
  }

  test("exact ties prefer the longer last piece") {
    // p(ab) == p(a)*p(b) exactly in log space: log(.25) = log(.5)+log(.5)
    val logp = Map(
      "a" -> math.log(0.5), "b" -> math.log(0.5), "ab" -> math.log(0.25))
    assert(UnigramLm.segment("ab", logp).toSeq == Seq("ab"))
  }

  test("uncoverable words return null; segmentScore is -inf") {
    val logp = Map("a" -> math.log(0.5))
    assert(UnigramLm.segment("ax", logp) == null)
    assert(UnigramLm.segmentScore("ax", logp).isNegInfinity)
    assert(UnigramLm.segmentScore("aa", logp) == 2 * math.log(0.5))
  }

  test("planted corpus: the repeated bigram dominates and LL is monotone") {
    // 'zq' appears inside every word; singles pad the alphabet
    val docs = Seq.fill(40)("zqzq zqzqzq kw")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (vocab, ll, nWords) = UnigramLm.train(docs, targetVocab = 8)
    assert(nWords == 3, s"distinct words $nWords != 3")
    assert(ll.size == UnigramLm.EmIters)
    assert(ll.zip(ll.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"LL curve not monotone: $ll")
    val probs = vocab.toMap
    // 'zq' (or a longer zq-run) must outweigh the bare singles
    val zqMass = probs.filter { case (p, _) => p.contains("zq") }.values.sum
    assert(zqMass > probs.getOrElse("z", 0.0) + probs.getOrElse("q", 0.0),
      s"planted piece mass $zqMass too low in $vocab")
    // all single chars retained
    assert(Seq("z", "q", "k", "w").forall(probs.contains), vocab.toString)
  }

  test("determinism: same corpus, same vocab and curve") {
    val docs = Seq.tabulate(30)(i => (i.toLong, s"foo bar baz qux n$i"))
      .toDF("doc_id", "text")
    val r1 = UnigramLm.train(docs, targetVocab = 16)
    val r2 = UnigramLm.train(docs, targetVocab = 16)
    assert(r1._1 == r2._1)
    assert(r1._2 == r2._2)
  }
}
