package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** The BPE merge loop against the literature's canonical example and
  * the overlap/boundary edge cases the regex rewrite must get right. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learn: the Sennrich corpus merges es, est, lo in order") {
    // {low:5, lower:2, newest:6, widest:3} — the worked example from
    // the paper: es (9) wins round 1 (ties with st broken lexically),
    // then est (9), then lo (7).
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val (merges, syms) = Bpe.learn(wf, 3)
    merges shouldBe Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val out = syms.select(col("word"), col("syms")).as[(String, String)]
      .collect().toMap
    out("newest") shouldBe "n e w est"
    out("widest") shouldBe "w i d est"
    out("low") shouldBe "lo w"
    out("lower") shouldBe "lo w e r"
  }

  test("pairCounts: overlaps count per occurrence; merge rewrites greedily left-to-right") {
    val wf = Seq(("aaa", 2L)).toDF("word", "freq")
    val syms = Bpe.initSymbols(wf)
    val pc = Bpe.pairCounts(syms).as[(String, String, Long)].collect().toSeq
    pc shouldBe Seq(("a", "a", 4L)) // 2 positions x freq 2
    Bpe.applyMerge(syms, "a", "a").select(col("syms")).as[String]
      .collect().head shouldBe "aa a" // greedy: no overlapping re-match
  }

  test("applyMerge: boundary-anchored — 'ab' symbol is not split-merged, regex metachars safe") {
    // after a first (a,b) merge exists as symbol "ab", merging (b,a)
    // must not touch "ab a b"'s interior "ab a" boundary pair wrongly:
    // only the exact symbols b,a as WHOLE tokens merge
    val df = Seq(("x", 1L)).toDF("word", "freq")
      .withColumn("syms", lit("ab a b a"))
    Bpe.applyMerge(df, "b", "a").select(col("syms")).as[String]
      .collect().head shouldBe "ab a ba"
    // metacharacter symbols must be treated literally
    val dot = Seq(("y", 1L)).toDF("word", "freq")
      .withColumn("syms", lit(". x ."))
    Bpe.applyMerge(dot, ".", "x").select(col("syms")).as[String]
      .collect().head shouldBe ".x ."
  }

  test("learn: stops when nothing is left to merge") {
    val wf = Seq(("ab", 1L)).toDF("word", "freq")
    val (merges, syms) = Bpe.learn(wf, 10)
    merges shouldBe Seq(("a", "b"))
    syms.select(col("syms")).as[String].collect().head shouldBe "ab"
  }
}
