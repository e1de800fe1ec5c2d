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

  test("nested-suffix pattern set (a, aa, ..., a^n): linear build, exact counts") {
    // the r12 closure-copy build was O(n^2) memory on exactly this set;
    // the fail-output-link build is linear and must count identically:
    // a^k occurs (L - k + 1) times in a^L
    val n = 600
    val ac = AhoCorasick.build((1 to n).map("a" * _))
    val L = 2000
    val got = ac.countAll("a" * L)
    (1 to n).foreach { k => got(k - 1) shouldBe (L - k + 1).toLong }
  }

  test("sharded blocklist is bit-identical to unsharded on randomized inputs") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd "
    val pats = Seq("ab", "abc", "ca b", "b", "aa", "c ab", "dd", "a d",
      "bc", "cab", "d", "ab ab")
    val rows = (1L to 40L).map { i =>
      (i, Seq.fill(rnd.nextInt(80))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = rows.toDF("id", "t")
    def run(shard: Int) =
      AhoCorasick.blocklist(df, "t", pats, shardSize = shard)
        .select("id", "n_hits", "n_patterns", "matched", "blocked")
        .as[(Long, Long, Long, String, Boolean)].collect().sortBy(_._1).toSeq
    val whole = run(pats.length)
    run(1) shouldBe whole   // one automaton per pattern
    run(5) shouldBe whole   // uneven split (5,5,2)
  }

  test("blocklist rejects a duplicate pattern even when the copies land in different shards") {
    // r13 ADVICE: per-shard build() can't see a cross-shard duplicate —
    // validation must run over the whole list before sharding, or the
    // duplicate double-counts and breaks sharded≡unsharded
    val df = Seq((1L, "abc")).toDF("id", "t")
    val dup = Seq("ab", "cd", "ab") // shardSize=2 puts the copies in shards 0 and 1
    val e = intercept[IllegalArgumentException] {
      AhoCorasick.blocklist(df, "t", dup, shardSize = 2)
    }
    e.getMessage should include("duplicate")
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
