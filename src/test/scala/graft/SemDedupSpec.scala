package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** SemDeDup keep/remove decisions on a hand-built two-cluster fixture:
  * the keep-the-outlier rule (farthest-from-centroid member of a
  * duplicate group survives), cross-cluster blindness (near-identical
  * vectors in different clusters are both kept — the paper's accepted
  * recall trade), and transitive removal through the upper-triangular
  * rank order. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("clustersFor: k ∝ N above the floor; rank seeds survive sparse id domains") {
    // the sizing rule (VERDICT r17 #2): expected cluster size ~target
    assert(Similarity.clustersFor(100) == 8)
    assert(Similarity.clustersFor(4096) == 8)           // 4096/512 = 8 exactly
    assert(Similarity.clustersFor(4097) == 9)
    assert(Similarity.clustersFor(600000) == 1172)      // the sf30 corpus
    assert(Similarity.clustersFor(600000, 250) == 2400)
    // rank-based seeding: ids NOT dense below k (the rehearsal
    // fixtures' block-spaced domain) — `vec_id < k` would under-seed
    val sparse = df((0L until 12L).map(i =>
      (i * 1000000L + 3L, Seq.tabulate(4)(j => (i + j).toFloat))))
    val cents = Similarity.kmeansLloydTrain(sparse, k = 10, iters = 1)
    assert(cents.count() == 10)
    assert(cents.agg(max("cid")).head().getLong(0) == 9000003L) // 10 lowest ids
  }

  test("duplicate group keeps the farthest-from-centroid member only") {
    // centroids: vec 0 at (1,0), vec 1 at (-1,0) (k=2 pinned seeds).
    // cluster of centroid 0 gets a near-dup pair: vecs 10 and 11 point
    // the same way, 11 sits farther from the centroid → 11 is kept,
    // 10 removed. vec 12 is angularly far from both → kept.
    val rows = Seq(
      0L -> Seq(1.0f, 0.0f),
      1L -> Seq(-1.0f, 0.0f),
      10L -> Seq(2.0f, 0.2f), // cos(10,11) ≈ 1, nearer centroid than 11
      11L -> Seq(4.0f, 0.4f),
      12L -> Seq(0.1f, 3.0f)) // cos to 10/11 ≈ 0.17 — below any sane tau
    val got = Similarity.semDedup(df(rows), k = 2, tau = 0.9)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    got(11L) shouldBe true
    got(10L) shouldBe false
    got(12L) shouldBe true
    got(1L) shouldBe true // alone in its cluster
  }

  test("near-identical vectors split across clusters are both kept") {
    // 20 and 21 are near-identical but land in different clusters
    // (opposite centroids): SemDeDup never compares across clusters.
    val rows = Seq(
      0L -> Seq(1.0f, 0.0f),
      1L -> Seq(-1.0f, 0.0f),
      20L -> Seq(0.05f, 2.0f), // d2 to c0 < d2 to c1
      21L -> Seq(-0.05f, 2.0f)) // d2 to c1 < d2 to c0
    val r = Similarity.semDedup(df(rows), k = 2, tau = 0.9)
    val kept = r.select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    kept(20L) shouldBe true
    kept(21L) shouldBe true
    val clusters = r.select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    clusters(20L) should not be clusters(21L)
  }

  test("clusterCap: overflow tail passes through kept, audit counts it (r12)") {
    // centroid 0's cluster holds 5 colinear near-dups; cap 3 retains
    // the 3 farthest (40..42 by keep-priority), dedups among them
    // (only 42 survives), and passes 43/44 — the two NEAREST the
    // centroid — through kept=true untouched. Uncapped, 43/44 would
    // be removed: the cap's miss direction is keep-too-much, and the
    // audit makes the trade a number.
    val rows = Seq(
      0L -> Seq(1.0f, 0.0f),
      1L -> Seq(-1.0f, 0.0f),
      40L -> Seq(6.0f, 0.0f),
      41L -> Seq(5.0f, 0.0f),
      42L -> Seq(4.0f, 0.0f),
      43L -> Seq(3.0f, 0.0f),
      44L -> Seq(2.0f, 0.0f))
    val (res, audit) = Similarity.semDedupAudited(df(rows), k = 2,
      tau = 0.9, clusterCap = 3)
    val got = res.where(col("vec_id") >= 40)
      .select("vec_id", "kept", "passed_through")
      .as[(Long, Boolean, Boolean)].collect()
      .map { case (id, kt, pt) => id -> ((kt, pt)) }.toMap
    got(40L) shouldBe ((true, false)) // highest keep-priority exemplar
    got(41L) shouldBe ((false, false))
    got(42L) shouldBe ((false, false))
    got(43L) shouldBe ((true, true)) // evicted: kept, flagged
    got(44L) shouldBe ((true, true))
    val a = audit.where(col("cluster") === 0)
      .select("n_members", "n_passed_through")
      .as[(Long, Long)].collect().head
    // 6 members (centroid 0 itself + five planted); 3 past the cap:
    // 43, 44 AND vec 0 — the centroid sits at d2=0, the lowest
    // keep-priority of all
    a shouldBe ((6L, 3L))
    // uncapped control: the tail members are genuine dups and removed
    val un = Similarity.semDedup(df(rows), k = 2, tau = 0.9)
      .where(col("vec_id").isin(43L, 44L))
      .select("kept").as[Boolean].collect()
    un.toSeq shouldBe Seq(false, false)
  }

  test("a 3-dup chain removes everything but the single outlier") {
    // three colinear vectors in centroid 0's cluster: only the farthest
    // survives; both nearer ones pair with it above tau.
    val rows = Seq(
      0L -> Seq(1.0f, 0.0f),
      1L -> Seq(-1.0f, 0.0f),
      30L -> Seq(2.0f, 0.0f),
      31L -> Seq(3.0f, 0.0f),
      32L -> Seq(5.0f, 0.0f))
    val got = Similarity.semDedup(df(rows), k = 2, tau = 0.9)
      .where(col("vec_id") >= 30)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    got shouldBe Map(30L -> false, 31L -> false, 32L -> true)
  }
}
