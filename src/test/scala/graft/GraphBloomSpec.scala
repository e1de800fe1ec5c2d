package graft

import graft.operators.{Bloom, HeavyHitters, PageRank}
import org.apache.spark.sql.functions._

/** Closed-form / property coverage for the r7 scale-path operators:
  * fixed-point PageRank (independent driver-side reference loop),
  * Bloom pruning (no false negatives, fpr bound, scan-stage-only
  * probe), and the Misra–Gries heavy-hitter guarantee. */
class GraphBloomSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  // ------------------------------------------------------------ PageRank
  test("pagerank: symmetric 2-cycle is a fixed point at exactly Scale") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = PageRank.pageRank(edges, 5).as[(Long, Long)].collect().toMap
    r shouldBe Map(1L -> Scale, 2L -> Scale)
  }

  /** Driver-side reference: the same scaled-integer recurrence written
    * as plain Map arithmetic — an independent implementation path (no
    * DataFrames), so a Spark-side plan bug can't cancel out. */
  private def referenceRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var rank = nodes.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val csum = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => rank(s) / outdeg(s) }.sum
      }
      rank = nodes.map(n => n -> (150000000000L + 85L * csum.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  test("pagerank: bidirected 3-star matches the driver-side reference loop") {
    val es = Seq((1L, 3L), (2L, 3L), (3L, 1L), (3L, 2L))
    val got = PageRank.pageRank(es.toDF("src", "dst"), 5).as[(Long, Long)].collect().toMap
    got shouldBe referenceRanks(es, 5)
    // hub authority: the star center outranks both leaves
    got(3L) should be > got(1L)
    got(1L) shouldBe got(2L) // symmetric leaves tie exactly
  }

  test("pagerank: asymmetric 5-node graph matches reference after each of 1..6 iters") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 4L), (5L, 1L), (1L, 5L), (2L, 5L))
    for (k <- 1 to 6) {
      val got = PageRank.pageRank(es.toDF("src", "dst"), k).as[(Long, Long)].collect().toMap
      withClue(s"iters=$k") { got shouldBe referenceRanks(es, k) }
    }
  }

  // ------------------------------------------------------------- Bloom
  private val M = 1L << 17
  private val NH = 3

  test("bloom: no false negatives — every build key passes the probe") {
    val keys = (0L until 500L).map(i => i * 7919L).toDF("bk")
    val bloom = Bloom.buildBloom(keys, "bk", M, NH)
    val pass = keys.toDF("k").crossJoin(broadcast(bloom))
      .where(Bloom.mightContain("k", "bloom", M, NH)).count()
    pass shouldBe 500L
  }

  test("bloom: false-positive rate stays near the analytic bound") {
    val build = (0L until 500L).toDF("bk")
    val bloom = Bloom.buildBloom(build, "bk", M, NH)
    // 10k non-member probes; analytic fpr at n=500,m=2^17,k=3 is ~2e-6,
    // so even 20 passes would signal a broken hash/bit layout
    val fp = (10000L until 20000L).toDF("k").crossJoin(broadcast(bloom))
      .where(Bloom.mightContain("k", "bloom", M, NH)).count()
    fp.toInt should be < 20
  }

  test("bloom probe is scan-stage only: no shuffle before the membership filter") {
    val build = (0L until 100L).toDF("bk")
    val bloom = Bloom.buildBloom(build, "bk", M, NH)
    val probed = (0L until 1000L).toDF("k").crossJoin(broadcast(bloom))
      .where(Bloom.mightContain("k", "bloom", M, NH))
    val p = probed.queryExecution.executedPlan.toString
    withClue(p) {
      // the bloom build aggregates (its own tiny exchanges) but the
      // PROBE side must see only a BroadcastExchange — the filter runs
      // inside the probe's scan stage, which is the whole 100 TB point
      "- Exchange hashpartitioning".r.findAllIn(p).size should be <= 2 // build-side only
      p should include("BroadcastNestedLoopJoin") // 1-row broadcast attach
    }
  }

  // --------------------------------------------------------------- BFS
  test("bfs: hop bound truncates a path graph exactly at maxHops") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val d = operators.Bfs.hopDistances(edges, seeds, 2).as[(Long, Int)].collect().toMap
    d shouldBe Map(1L -> 0, 2L -> 1, 3L -> 2) // 4, 5 beyond the horizon: absent
  }

  test("bfs: diamond + detour settles on the MIN distance per node") {
    // 1→2→4 and 1→3→4 (dist 2) beat the 1→5→6→4 detour (dist 3)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (5L, 6L), (6L, 4L)).toDF("src", "dst")
    val d = operators.Bfs.hopDistances(edges, Seq(1L).toDF("node"), 4)
      .as[(Long, Int)].collect().toMap
    d shouldBe Map(1L -> 0, 2L -> 1, 3L -> 1, 5L -> 1, 4L -> 2, 6L -> 2)
  }

  test("bfs: matches a driver-side frontier BFS on a cyclic graph, multi-seed") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 3L),
      (5L, 6L), (6L, 5L), (7L, 7L), (4L, 7L))
    val seeds = Seq(1L, 5L)
    // reference: textbook frontier expansion over an adjacency map
    val adj = es.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    var ref = seeds.map(_ -> 0).toMap
    var frontier = seeds.toSet
    for (hop <- 1 to 3) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(ref.contains)
      ref ++= frontier.map(_ -> hop)
    }
    val got = operators.Bfs.hopDistances(es.toDF("src", "dst"), seeds.toDF("node"), 3)
      .as[(Long, Int)].collect().toMap
    got shouldBe ref
  }

  // -------------------------------------------- co-purchase / EWMA gates
  test("gr_triangles: degree-ordered count equals the naive canonical join at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val Seq((nE, nW, nT, ppm)) = QueriesGraph.grTriangles.fn(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // independent path: same strong-edge set, but triangles via the
    // naive id-canonical 3-way join (no orientation) in raw SQL
    val a = Tables.tbl(spark, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val ep = a.select(col("ok"), col("p").as("u"))
      .join(a.select(col("ok"), col("p").as("v")), Seq("ok"))
      .where(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= 2).select("u", "v")
    ep.createOrReplaceTempView("spec_ep")
    val naive = spark.sql("""SELECT count(*) FROM spec_ep e1
      JOIN spec_ep e2 ON e2.u = e1.u AND e2.v > e1.v
      JOIN spec_ep e3 ON e3.u = e1.v AND e3.v = e2.v""").head().getLong(0)
    nT shouldBe naive
    nT should be > 0L // the fixture graph actually has triangles
    nE shouldBe ep.count()
    ppm shouldBe 3 * nT * 1000000L / nW
  }

  test("gr_copurchase_lift: internal lift arithmetic is consistent at sf0.001") {
    val rows = QueriesGraph.grCopurchase.fn(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    rows should have size 20
    rows.foreach { case (p1, p2, nPair, nP1, nP2, nOrders, liftPpm) =>
      p1 should be < p2
      nPair should be <= math.min(nP1, nP2)
      liftPpm shouldBe nPair * nOrders * 1000000L / (nP1 * nP2)
    }
    // top-20 is ordered by (n_pair desc, p1, p2)
    val keys = rows.map { case (p1, p2, nPair, _, _, _, _) => (-nPair, p1, p2) }
    keys shouldBe keys.sorted
  }

  test("w_ewma_decay: matches a driver-side fold over each customer's history") {
    val d = "/root/testdata/sf0.001"
    val hist = Tables.tbl(spark, d, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("string"),
        col("o_orderkey"), col("o_totalprice").cast("double"))
      .as[(Long, String, Long, Double)].collect()
      .groupBy(_._1).map { case (c, xs) =>
        c -> xs.sortBy { case (_, dt, ok, _) => (dt, ok) }.map(_._4)
      }
    // reference: last-row truncated dyadic EWMA, same add order
    val want = hist.map { case (c, xs) =>
      val taps = xs.takeRight(8).reverse // x_n, x_{n-1}, ...
      c -> taps.zipWithIndex.map { case (x, k) => x / (1L << (k + 1)) }
        .reduceLeft(_ + _)
    }
    val got = QueriesAggWindow.wEwma.fn(spark, d)
      .as[(Long, Double)].collect().toMap
    got.keySet shouldBe want.keySet
    got.foreach { case (c, v) => v shouldBe want(c) } // bit-exact, no tolerance
  }

  // ------------------------------------------------------------- HLL
  test("g_hll_mergeable: merged ≈ direct estimate, both ≤5% of exact, gate true") {
    // r11 gate correction: merged and direct estimates are only
    // bit-identical while sketches stay in exact (SET) mode; past the
    // estimation boundary the union's HLL_8 gadget drifts them ~1%.
    // The entry now hashes (y, q, n_exact, quality_ok) — assert the
    // gate true at BOTH spec scale (exact regime) and driver scale
    // sf0.01 (estimation regime, where the old bit-equal gate was
    // silently false).
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = QueriesAggWindow.gHllMergeable.fn(spark, d)
        .as[(Int, Int, Long, Boolean)].collect().toSeq
      rows should not be empty
      rows.foreach { case (y, q, nExact, ok) =>
        withClue(s"($d $y Q$q) ") {
          nExact should be > 0L
          ok shouldBe true
        }
      }
    }
  }

  test("hll union over partitioned slices is estimate-identical in the exact regime") {
    // independent of the fixture: 3 disjoint slices with overlap.
    // 700 distinct stays in DataSketches SET (coupon) mode at lgK=12,
    // where merge-then-estimate IS bit-exact; the g_hll_mergeable gate
    // covers the post-promotion regime with a tolerance instead.
    val xs = (0L until 3000L).map(i => (i % 3, i % 700)).toDF("slice", "v")
    val direct = xs.agg(hll_sketch_estimate(hll_sketch_agg(col("v")))).head().getLong(0)
    val merged = xs.groupBy("slice").agg(hll_sketch_agg(col("v")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    merged shouldBe direct
  }

  // ------------------------------------------------------- Misra–Gries
  test("mg pass: retains every term above n/(k+1) on an adversarial stream") {
    // 300 "hot" among 700 singletons, k=5: hot count 300 > 1000/6
    val stream = Iterator.tabulate(1000)(i => if (i % 10 < 3) "hot" else s"u$i")
    val (cands, n) = HeavyHitters.mgPass(stream, 5)
    n shouldBe 1000L
    cands should contain("hot")
    cands.size should be <= 5
  }

  test("mg candidates are a superset of true heavy hitters (pigeonhole over partitions)") {
    val k = 20
    // deterministic zipf-ish stream: term id = lcg % 50 biased by square
    val data = (0 until 20000).map { i =>
      val x = (i * 2654435761L) & 0x7fffffff
      s"t${(x % 50) * (x % 50) / 50}" // quadratic skew → few frequent terms
    }
    val trueCounts = data.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = data.size.toLong
    val heavy = trueCounts.collect { case (t, c) if c * k > n => t }.toSet
    heavy should not be empty
    // simulate 8 partitions
    val cands = data.grouped(2500).flatMap(p => HeavyHitters.mgPass(p.iterator, k)._1).toSet
    heavy.subsetOf(cands) shouldBe true
  }

  // ------------------------------------------------------- SpaceSaving
  test("spacesaving: exact when capacity covers cardinality; bounded overestimates under eviction") {
    import graft.operators.HeavyHitters._
    val stream = (0 until 5000).map { i =>
      val x = (i * 2654435761L) & 0x7fffffff
      s"v${(x % 40) * (x % 40) / 40}" // quadratic skew, ~40 distinct
    }
    val truth = stream.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    // capacity 64 > 40 distinct → exact counts, zero error
    val exact = ssUpdate(ssEmpty, stream.iterator, 64)
    exact.total shouldBe 5000L
    exact.errs.forall(_ == 0L) shouldBe true
    exact.keys.zip(exact.cnts).foreach { case (k, c) => c shouldBe truth(k) }
    // capacity 8 < distinct → every counter overestimates by ≤ its err,
    // and every item with true count > min(cnts) is retained
    val tight = ssUpdate(ssEmpty, stream.iterator, 8)
    tight.keys.size shouldBe 8
    tight.total shouldBe 5000L
    tight.keys.indices.foreach { i =>
      val t = truth(tight.keys(i))
      tight.cnts(i) should be >= t
      (tight.cnts(i) - tight.errs(i)) should be <= t
    }
    val minCnt = tight.cnts.min
    truth.collect { case (k, c) if c > minCnt => k }
      .foreach(k => tight.keys should contain(k))
    // batch-split state folding equals one pass (the streaming property)
    val (a, b) = stream.splitAt(2500)
    val folded = ssUpdate(ssUpdate(ssEmpty, a.iterator, 64), b.iterator, 64)
    folded shouldBe exact
  }

  test("spacesaving topK ordering is (count desc, key asc)") {
    import graft.operators.HeavyHitters._
    val st = ssUpdate(ssEmpty,
      Iterator("b", "a", "a", "c", "b", "d"), 16)
    ssTopK(st, 3).map(t => (t._1, t._2)) shouldBe
      Seq(("a", 2L), ("b", 2L), ("c", 1L))
  }

  test("tx_heavy_hitters entry equals the naive exact plan at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val got = QueriesPipeline.txHeavyHitters.fn(spark, d)
      .select("word", "cnt").as[(String, Long)].collect().toSeq
    val words = Tables.tbl(spark, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
    val n = words.count()
    val want = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 200 > n).orderBy("w")
      .as[(String, Long)].collect().toSeq
    got shouldBe want
    got should not be empty
  }
}
