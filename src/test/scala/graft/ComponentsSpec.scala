package graft

import graft.operators.Components
import org.apache.spark.sql.DataFrame

/** [[Components.connectedComponents]] against a driver-side union-find
  * ground truth. The path-graph case matters most: naive min-label
  * propagation needs O(diameter) rounds, so a long chain is exactly the
  * shape that catches a wrong convergence check. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def groundTruth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // find() roots at the minimum because unions always point max → min
    verts.map(v => v -> find(v)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap

  test("chain of 12 converges to one min-rooted component") {
    val edges = (0L until 11L).map(i => (i, i + 1))
    val got = run(edges)
    got shouldBe (0L to 11L).map(_ -> 0L).toMap
  }

  test("disjoint cliques, a chain, and duplicate/reversed/self edges") {
    val clique = for { a <- 10L to 13L; b <- 10L to 13L if a < b } yield (a, b)
    val edges = clique ++
      Seq((2L, 1L), (1L, 2L), (3L, 3L), (2L, 5L), (5L, 7L)) ++
      Seq((20L, 21L))
    val got = run(edges)
    val truth = groundTruth(edges.filter(e => e._1 != e._2))
    got shouldBe truth
    got(13L) shouldBe 10L
    got(7L) shouldBe 1L
    got(21L) shouldBe 20L
    got.get(3L) shouldBe None // self-loop only ⇒ isolated, not emitted
  }

  test("pseudo-random graph matches union-find ground truth") {
    // LCG-derived edges over 60 vertices — deterministic, no RNG APIs
    val edges = (1 to 80).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      ((h % 60), ((h / 61) % 60))
    }.filter(e => e._1 != e._2)
    run(edges) shouldBe groundTruth(edges)
  }

  test("empty edge list yields empty result") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("u", "v")
    Components.connectedComponents(empty).count() shouldBe 0L
  }

  test("observe-fused convergence probe equals a direct aggregate (r11)") {
    // the probe rides the pin's materializing job; its values must
    // match what the former separate count+checksum aggregate computed
    import org.apache.spark.sql.functions._
    val df = Seq((3L, 1L), (5L, 2L), (9L, 4L)).toDF("u", "v")
    val (pinned, (n, chk)) = Components.pinWithChecksum(df)
    val want = df.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v"))), lit(0L)))
      .as[(Long, Long)].head()
    (n, chk) shouldBe want
    pinned.as[(Long, Long)].collect().sorted shouldBe
      Seq((3L, 1L), (5L, 2L), (9L, 4L))
    // empty frame: count 0, checksum coalesces to 0 — the regime the
    // convergence loop's first round can hit on a self-loop-only input
    val empty = spark.emptyDataset[(Long, Long)].toDF("u", "v")
    val (_, probe0) = Components.pinWithChecksum(empty)
    probe0 shouldBe ((0L, 0L))
  }
}
