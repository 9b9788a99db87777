package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Porter stemmer: the 1980 paper's own step examples plus its two
  * worked full-pipeline words, idempotence over the fixture corpus,
  * codegen/eval agreement, and short-word/edge behavior.
  */
class PorterStemSpec extends SparkSpec {
  import spark.implicits._

  /** (word, stem) pairs from the rule examples in Porter 1980 —
    * single-suffix words whose later steps provably don't fire —
    * plus the paper's worked examples GENERALIZATIONS/OSCILLATORS.
    */
  val PaperPairs: Seq[(String, String)] = Seq(
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file", "happy" -> "happi", "sky" -> "sky",
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc", "hesitanci" -> "hesit",
    "digitizer" -> "digit", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    "triplicate" -> "triplic", "formative" -> "form",
    "formalize" -> "formal", "electriciti" -> "electr",
    // the paper's step-3 row shows electrical→electric, but the FULL
    // pipeline continues: step 4 strips -ic at m>1 (same for the
    // worked example generalizations→...→gener)
    "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "communism" -> "commun",
    "activate" -> "activ", "angulariti" -> "angular",
    "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler", "probate" -> "probat", "rate" -> "rate",
    "cease" -> "ceas", "controll" -> "control", "roll" -> "roll",
    "generalizations" -> "gener", "oscillators" -> "oscil")

  test("the paper's example pairs stem exactly") {
    val bad = PaperPairs.filter { case (w, e) => PorterStemmer.stem(w) != e }
      .map { case (w, e) => s"$w -> ${PorterStemmer.stem(w)} (want $e)" }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("idempotent and case-folding; short words pass through") {
    PaperPairs.foreach { case (_, s0) =>
      assert(PorterStemmer.stem(s0) == PorterStemmer.stem(PorterStemmer.stem(s0)))
    }
    assert(PorterStemmer.stem("CARESSES") == "caress")
    assert(PorterStemmer.stem("a") == "a")
    assert(PorterStemmer.stem("is") == "is")
    assert(PorterStemmer.stem("") == "")
  }

  test("expression path equals the driver function on corpus tokens") {
    val toks = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "").distinct()
    val viaExpr = toks
      .select($"tok", TextFunctions.porterStem($"tok").as("st"))
      .as[(String, String)].collect()
    assert(viaExpr.nonEmpty)
    viaExpr.foreach { case (t, st) =>
      assert(st == PorterStemmer.stem(t), s"token $t")
      assert(PorterStemmer.stem(st) == st ||
        // y→i / e-handling can re-fire on a bare stem that ends i/e —
        // idempotence holds for every stem observed on this corpus;
        // flag any counterexample loudly
        false, s"non-idempotent: $t -> $st -> ${PorterStemmer.stem(st)}")
    }
  }
}
