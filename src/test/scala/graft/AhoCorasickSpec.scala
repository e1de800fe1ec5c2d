package graft

import graft.operators.AhoCorasick

/** The AC automaton vs a naive all-positions scan: overlapping
  * matches, shared-prefix patterns, fail-link output inheritance
  * (a match of "big table" must also fire the "big" output through
  * the suffix link), and a randomized cross-check. */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def naive(text: String, pats: Seq[String]): Array[Long] =
    pats.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }.toArray

  test("overlapping matches count every start: 'ana' in 'banana' = 2") {
    val ac = AhoCorasick.build(Seq("ana"))
    ac.countAll("banana").toSeq shouldBe Seq(2L)
  }

  test("suffix-link output: a longer pattern's hit fires the embedded one") {
    val ac = AhoCorasick.build(Seq("big", "big table", "table"))
    // "big table" hits: big(1), big table(1), table(1)
    ac.countAll("a big table here").toSeq shouldBe Seq(1L, 1L, 1L)
    // interior embedding through the FAIL path, not just prefixes:
    // "ig t" shares no prefix with any pattern root
    val ac2 = AhoCorasick.build(Seq("htable", "tab"))
    ac2.countAll("a htable").toSeq shouldBe Seq(1L, 1L)
  }

  test("null and no-match texts return zero counts") {
    val ac = AhoCorasick.build(Seq("xyz"))
    ac.countAll(null).toSeq shouldBe Seq(0L)
    ac.countAll("abc").toSeq shouldBe Seq(0L)
  }

  test("randomized cross-check vs the naive scanner") {
    val rnd = new scala.util.Random(99)
    val alphabet = "abc "
    val pats = Seq("ab", "abc", "ca b", "b", "aa", "c ab")
    val ac = AhoCorasick.build(pats)
    for (_ <- 1 to 200) {
      val text = Seq.fill(rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      withClue(s"text='$text'") {
        ac.countAll(text).toSeq shouldBe naive(text, pats).toSeq
      }
    }
  }

  test("blocklist frame annotation: hits, distinct patterns, sorted matched list") {
    val df = Seq((1L, "the big big table"), (2L, "nothing here")).toDF("id", "t")
    val got = AhoCorasick.blocklist(df, "t", Seq("big", "big table", "zz"))
      .select("id", "n_hits", "n_patterns", "matched", "blocked")
      .as[(Long, Long, Long, String, Boolean)].collect().sortBy(_._1).toSeq
    got shouldBe Seq(
      (1L, 3L, 2L, "big,big table", true), // big×2 + big table×1
      (2L, 0L, 0L, "", false))
  }
}
