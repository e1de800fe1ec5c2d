package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** dd_incremental_minhash's recall argument, measured into ENFORCED
  * invariants (VERDICT r16 #5 / r16 ADVICE). Writing this spec
  * CORRECTED the record: the docstring's "0.19–0.55 distance band is
  * empty" claim is FALSE on sf0.1 — the corpus contains natural cross
  * near-dups (an ' inc42' delta doc vs an UNRELATED base doc) at
  * dist 0.200–0.273, i.e. genuine truth pairs below the 0.4 oracle
  * cut but past the designed-plant profile. The entry has been green
  * because the fixed (9,2) hash family CATCHES those pairs — a
  * deterministic fact of family × corpus, not a margin guarantee —
  * so the load-bearing invariant asserted here is the catch itself:
  *
  *  1. every truth pair (exact 3-shingle Jaccard dist ≤ 0.4, the
  *     oracle's own relation, full delta×base sweep) shares ≥ 1
  *     (b=9, r=2) band key under [[Dedup.bandKeys]] — the exact keys
  *     the plan buckets on; a corpus regen that breaks banding recall
  *     fails HERE, at the assumption, not at the parity diff (the fix
  *     is then re-banding, never a threshold nudge — MEMORY rule);
  *  2. the designed ' inc42' dups all sit at dist ≤ 0.19 (the plant
  *     profile, measured max 0.111 at sf0.1);
  *  3. the designed reversal pairs all sit at dist ≥ 0.55 (kept-side
  *     profile, measured min 0.875);
  *  4. no truth pair drifts past dist 0.35 (sentinel: measured max
  *     0.273 at sf0.1; approaching the 0.4 cut erodes the banding
  *     catch probability a fresh family would have, so drift warns
  *     before it bites).
  *
  * Corpora: sf0.01 (the driver-gate corpus), sf0.1 (whose head-5000
  * IS the rehearsal corpus at every rehearsal SF, per
  * minhashBaseDocs), and sf0.001 (the spec-iteration corpus).
  * Shingling and banding are the operator's own functions; the
  * Jaccard quotient mirrors Dedup.jaccardSim (identical integer set
  * sizes → identical value).
  */
class MinhashMarginSpec extends SparkSpec {

  private def marginSweep(d: String): Unit = {
    import spark.implicits._
    val base = QueriesPipeline.minhashBaseDocs(spark, d)
    val baseArr = base.as[(Long, String)].collect()
      .map { case (id, t) => (id, t, Dedup.shingleSet(t).toSet) }
    val bc = spark.sparkContext.broadcast(baseArr)
    val delta = base.where(col("id") % 7 === 0)
      .select((col("id") + 400000L).as("id"),
        concat(col("text"), lit(" inc42")).as("text"))
      .unionByName(base.where(col("id") % 7 === 3)
        .select((col("id") + 500000L).as("id"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text")))
    // per delta doc: every truth pair (dist ≤ 0.4) with its banding
    // verdict, plus the designed-pair profile extremes
    val rows = delta.as[(Long, String)].mapPartitions { it =>
      val bs = bc.value
      it.map { case (did, text) =>
        val sd = Dedup.shingleSet(text).toSet
        lazy val kd = Dedup.bandKeys(text, 9, 2).toSet
        var incMax = 0.0
        var revMin = 1.0
        val truth = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Boolean)]
        var i = 0
        while (i < bs.length) {
          val (bid, btext, sb) = bs(i)
          var inter = 0
          val (small, big) = if (sd.size < sb.size) (sd, sb) else (sb, sd)
          small.foreach(x => if (big.contains(x)) inter += 1)
          val union = sd.size + sb.size - inter
          val dist = if (union == 0) 1.0 else 1.0 - inter.toDouble / union
          if (dist <= 0.4) {
            val caught = Dedup.bandKeys(btext, 9, 2).exists(kd.contains)
            truth += ((bid, dist, caught))
          }
          if (did == bid + 400000L && dist > incMax) incMax = dist
          if (did == bid + 500000L && dist < revMin) revMin = dist
          i += 1
        }
        (did, truth.toSeq, incMax, revMin)
      }
    }.collect()
    bc.destroy()
    rows.length should be > 0

    val truthPairs = rows.flatMap(r => r._2.map(t => (r._1, t._1, t._2, t._3)))
    truthPairs.length should be > 0
    val missed = truthPairs.filterNot(_._4)
    withClue(s"$d: truth pairs the (9,2) banding does NOT catch — the " +
      "recall argument no longer holds on this corpus; RE-BAND, never " +
      "nudge the threshold (MEMORY rule). Missed (delta, base, dist): " +
      missed.take(10).mkString(", ") + " : ") {
      missed shouldBe empty
    }
    val maxTruthDist = truthPairs.map(_._3).max
    withClue(s"$d: a truth pair drifted past dist 0.35 toward the 0.4 " +
      s"cut (measured historical max 0.273): ") {
      maxTruthDist should be <= 0.35
    }
    val incPairs = rows.filter(_._1 < 500000L)
    incPairs.length should be > 0
    withClue(s"$d: a designed ' inc42' dup drifted past dist 0.19: ") {
      incPairs.map(_._3).max should be <= 0.19
    }
    val revPairs = rows.filter(_._1 >= 500000L)
    revPairs.length should be > 0
    withClue(s"$d: a designed reversal pair fell below dist 0.55: ") {
      revPairs.map(_._4).min should be >= 0.55
    }
  }

  test("(9,2) banding catches every truth pair on every gate-binding corpus") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"))
      marginSweep(d)
  }
}
