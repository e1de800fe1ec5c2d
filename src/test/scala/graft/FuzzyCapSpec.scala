package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The FastSS fuzzy self-join's enforced volume bound (r9 verdict #5):
  * heavy deletion keys are dropped from blocking, so one
  * mass-duplication bomb can't go quadratic — and on gate-shaped data
  * the cap must be IDLE (the j_fuzzy_edit oracle is the exact cross
  * join; a binding cap would fail the hash). */
class FuzzyCapSpec extends SparkSpec {

  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)], cap: Long) =
    Dedup.fuzzyEditPairs(rows.toDF("id", "s"), cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq

  test("editDistanceLe1 matches the builtin levenshtein(a, b, 1) pair-for-pair") {
    // the r18 verify swap rides this equivalence: every (0, 1, −1/null)
    // outcome must match the thresholded builtin, including repeated
    // chars (ambiguous delete sites), edits at both ends, transposition
    // (ED 2), empty strings, and astral code points (UTF-16 surrogate
    // pairs, where a char-based scan would miscount)
    val vals = Seq("", "a", "ab", "abc", "abcd", "abXd", "aXcd", "Xbcd",
      "abcX", "acd", "bcd", "abd", "abcde", "aabc", "aaab", "aaaa", "aacc",
      "acbd", "badc", "ab😀cd", "abcd😀", "ab😁cd")
    val df = vals.flatMap(x => vals.map(y => (x, y))).toDF("a", "b")
    val got = df.select(
        expr("levenshtein(a, b, 1)").as("lev"),
        Dedup.editDistanceLe1Udf(col("a"), col("b")).as("ed1"))
      .collect()
    got.foreach { r =>
      val lev = if (r.isNullAt(0)) -999 else r.getInt(0)
      withClue(r.toString) { r.getInt(1) shouldBe lev }
    }
  }

  test("null text rows drop at the key explode instead of crashing (r12)") {
    // the pre-UDF expression spelling dropped null-text rows (explode
    // of a null array); the JVM-loop UDF must preserve that contract
    val rows = Seq((1L, "abcdef"), (2L, "abcXef"), (3L, null.asInstanceOf[String]))
    val got = pairs(rows, cap = 64)
    got shouldBe Seq((1L, 2L, 1L))
  }

  test("finds substitution / insertion / deletion neighbors, rejects ED 2") {
    val got = pairs(Seq(
      1L -> "abcd", // vs 2: substitution; vs 3: deletion; vs 4: ED 2
      2L -> "abXd", // vs 3: deletion of the X
      3L -> "abd",
      4L -> "aXYd", // ED 2 from everything present
      5L -> "abcd" // exact dup of 1 (ED 0)
    ), cap = 64)
    got shouldBe Seq((1L, 2L, 1L), (1L, 3L, 1L), (1L, 5L, 0L),
      (2L, 3L, 1L), (2L, 5L, 1L), (3L, 5L, 1L))
  }

  test("cap idle on gate-shaped data: padded-id names stay under 64 per key") {
    // the j_fuzzy_edit shape: fixed prefix + zero-padded sequential id.
    // Every deletion key's frequency is bounded by the ~10 strings one
    // digit substitution can reach, far below the 64 cap — capped and
    // uncapped runs must agree exactly.
    val names = (1 to 300).map(i => (i.toLong, f"Customer#$i%09d"))
    pairs(names, cap = 64) shouldBe pairs(names, cap = Long.MaxValue)
  }

  test("cap binds on a planted mass-duplication bomb and drops only its pairs") {
    // 100 strings sharing every deletion key (all identical) — the
    // quadratic bomb. With cap 64 the bomb's keys all exceed the cap,
    // so its 4950 pairs vanish; the disjoint well-behaved pair (with
    // keys shared by 2 strings only) must survive untouched.
    val bomb = (1 to 100).map(i => (i.toLong, "zzzzzzzz"))
    val good = Seq(1000L -> "abcdef", 1001L -> "abcXef")
    val got = pairs(bomb ++ good, cap = 64)
    got shouldBe Seq((1000L, 1001L, 1L))
  }

  test("companion audit: one call returns pairs AND the capped-key census (r12)") {
    // the library-surface contract (VERDICT r11 #6): a caller must see
    // the recall trade from the SAME call that joined, not by knowing
    // to run fuzzyCapAudit separately. Hand census of the bomb corpus:
    // "zzzzzzzz" dedups to 2 keys {zzzzzzzz, zzzzzzz} at kf=100 each;
    // "abcdef"/"abcXef" carry 7 keys each sharing only "abcef" (kf=2)
    // -> 15 keys total, 2 past cap 64 carrying 200 key rows, max 100.
    val df = ((1 to 100).map(i => (i.toLong, "zzzzzzzz")) ++
      Seq(1000L -> "abcdef", 1001L -> "abcXef")).toDF("id", "s")
    val (p, audit) = Dedup.fuzzyEditPairsAudited(df, 64)
    p.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq shouldBe Seq((1000L, 1001L, 1L))
    val a = audit.collect().head
    (a.getLong(0), a.getLong(1), a.getLong(2), a.getLong(3)) shouldBe
      ((15L, 2L, 200L, 100L))
    // and the standalone audit (the gate entry's surface) is the same
    // frame by construction
    Dedup.fuzzyCapAudit(df, 64).collect().head.toSeq shouldBe a.toSeq
  }
}
