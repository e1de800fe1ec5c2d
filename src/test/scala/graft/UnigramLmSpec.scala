package graft

import graft.operators.UnigramLm

/** [[UnigramLm]] against a fully hand-computed 3-word example (every
  * score, DP cell, and tie traced by hand below) plus structural
  * invariants of the trained census.
  *
  * Hand example: words "ab"×2, "abc"×1, "b"×3 (freq-weighted).
  * Seed counts: a=3, b=6, c=1, ab=3, bc=1; total=14.
  * lp = floor(1e6·ln(cnt)): a=1098612, b=1791759, c=0, ab=1098612,
  * bc=0; t=floor(1e6·ln 14)=2639057.
  * Round 1 Viterbi: "ab" → tie between [a,b] and [ab]
  * (−2387743 < −1540445? no: [ab]=-1540445 beats [a,b]=-2387743) →
  * ["ab"]; "abc": dp2=-1540445 via "ab", then char path −4179502
  * EQUALS gram path −4179502 → tie prefers "bc" → ["a","bc"];
  * "b" → ["b"]. M1 census: ab=2, a=1, bc=1, b=3 (c unused).
  * Round 2 base: chars a=1, b=3, c=max(0,1)=1; grams ab=2, bc=1;
  * total=8, t2=2079441; lp2: a=0, b=1098612, c=0, ab=693147, bc=0.
  * Round 2 Viterbi: "ab" → ["ab"] (−1386294 beats −3060270);
  * "abc" → char path −3465735 BEATS gram path −4158882 → ["ab","c"]
  * (the segmentation CHANGED across EM rounds — the re-estimation is
  * observable); "b" → ["b"].
  * Final census: ab=3, b=3, c=1.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("lpScaled matches the documented integer-log contract") {
    UnigramLm.lpScaled(1L) shouldBe 0L
    UnigramLm.lpScaled(3L) shouldBe 1098612L
    UnigramLm.lpScaled(6L) shouldBe 1791759L
    UnigramLm.lpScaled(14L) shouldBe 2639057L
    UnigramLm.lpScaled(8L) shouldBe 2079441L
  }

  test("segment: hand-traced Viterbi incl. the 2-char tie preference") {
    val lp = Map("a" -> 1098612L, "b" -> 1791759L, "c" -> 0L,
      "ab" -> 1098612L, "bc" -> 0L)
    val t = 2639057L
    UnigramLm.segment("ab", lp.get, t) shouldBe Seq("ab")
    // char path and gram path tie at position 3 → "bc" wins
    UnigramLm.segment("abc", lp.get, t) shouldBe Seq("a", "bc")
    UnigramLm.segment("b", lp.get, t) shouldBe Seq("b")
    // a pruned gram is simply unavailable (round-2 regime)
    val lp2 = Map("a" -> 0L, "b" -> 1098612L, "c" -> 0L,
      "ab" -> 693147L, "bc" -> 0L)
    UnigramLm.segment("abc", lp2.get, 2079441L) shouldBe Seq("ab", "c")
  }

  test("train: the 3-word corpus lands on the hand-computed census") {
    val wf = Seq(("ab", 2L), ("abc", 1L), ("b", 3L)).toDF("word", "freq")
    val got = UnigramLm.train(wf).as[(String, Long)].collect().toMap
    got shouldBe Map("ab" -> 3L, "b" -> 3L, "c" -> 1L)
  }

  test("encode: the 3-word corpus segments under the FINAL model") {
    // Final census ab=3, b=3, c=1; coverage prune re-adds a at
    // max(0,1)=1 → basis a=1, b=3, c=1, ab=3; total=8, t=2079441;
    // lp: a=0, b=1098612, c=0, ab=1098612.
    // "ab" → [ab] (−980829 beats −4158882); "b" → [b];
    // "abc" → dp2 via ab = −980829, char path −3060270 vs gram path
    // "bc" unavailable (pruned) → ["ab","c"].
    val wf = Seq(("ab", 2L), ("abc", 1L), ("b", 3L)).toDF("word", "freq")
    val (chars, census) = UnigramLm.trainCensus(wf)
    // the passable census equals train()'s live frame by construction
    census shouldBe Map("ab" -> 3L, "b" -> 3L, "c" -> 1L)
    chars.toSet shouldBe Set("a", "b", "c")
    val got = UnigramLm.encode(wf, UnigramLm.deploy(chars, census))
      .as[(String, Long, String, Long)]
      .collect().map(r => r._1 -> ((r._3, r._4))).toMap
    got shouldBe Map(
      "ab" -> (("ab", 1L)), "abc" -> (("ab c", 2L)), "b" -> (("b", 1L)))
  }

  test("encode on testdata: segmentations tile words; pieces are census pieces") {
    val d = "/root/testdata/sf0.001"
    val wf = Tables.tbl(spark, d, "documents")
      .selectExpr("explode(split(text, ' ')) AS word")
      .where("word <> '' AND length(word) <= 8")
      .groupBy("word").count().withColumnRenamed("count", "freq")
    val (chars, census) = UnigramLm.trainCensus(wf)
    val enc = UnigramLm.encode(wf, UnigramLm.deploy(chars, census))
      .as[(String, Long, String, Long)].collect()
    enc should not be empty
    enc.foreach { case (w, _, e, n) =>
      val ps = e.split(" ").toSeq
      ps.length.toLong shouldBe n
      ps.mkString shouldBe w // pieces tile the word exactly, in order
      ps.foreach(p => p.length should (be >= 1 and be <= 2))
    }
  }

  test("entry census (memoized passable artifact) equals the live train() frame") {
    // r12: the gate entries share ONE training execution via a
    // dataVer-keyed memo; this pins that the memoized census the entry
    // emits is row-identical to the distributed train() frame
    val d = "/root/testdata/sf0.001"
    val wf = Tables.tbl(spark, d, "documents")
      .selectExpr("explode(split(text, ' ')) AS word")
      .where("word <> '' AND length(word) <= 8")
      .groupBy("word").count().withColumnRenamed("count", "freq")
    val live = UnigramLm.train(wf).as[(String, Long)].collect().toMap
    val entry = QueriesPipeline.txUnigramLm.fn(spark, d)
      .as[(String, Long)].collect().toMap
    entry shouldBe live
  }

  test("trained census on testdata: mass conservation and coverage") {
    val d = "/root/testdata/sf0.001"
    val wf = Tables.tbl(spark, d, "documents")
      .selectExpr("explode(split(text, ' ')) AS word")
      .where("word <> '' AND length(word) <= 8")
      .groupBy("word").count().withColumnRenamed("count", "freq")
    val words = wf.as[(String, Long)].collect()
    val census = UnigramLm.train(wf).as[(String, Long)].collect()
    census should not be empty
    // every piece is a 1-2 char substring of some word
    census.foreach { case (p, c) =>
      p.length should (be >= 1 and be <= 2)
      c should be > 0L
      words.exists(_._1.contains(p)) shouldBe true
    }
    // mass conservation: total pieces' char-length weighted by count
    // equals the corpus char mass (segmentations tile words exactly)
    val charMass = words.map { case (w, f) => w.length * f }.sum
    census.map { case (p, c) => p.length * c }.sum shouldBe charMass
  }
}
