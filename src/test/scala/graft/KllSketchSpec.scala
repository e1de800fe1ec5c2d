package graft

import graft.operators.KllSketch
import graft.operators.KllSketch.KllState

/** [[KllSketch]] invariants: exactness under K, count preservation
  * through compaction and merge, and the rank-error bound both straight
  * and under chunked merges (the property the g_quantile_sketch gate
  * relies on). Values come from the Lcg so runs are reproducible. */
class KllSketchSpec extends SparkSpec {

  private val Qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.95)

  private def lcgStream(n: Int): Seq[Double] = {
    var x = 42L
    (0 until n).map { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L)
      // top 32 bits, positive, as a double — a scattered but
      // deterministic value stream
      ((x >>> 33).toDouble)
    }
  }

  private def build(vs: Seq[Double]): KllState =
    vs.foldLeft(KllSketch.empty)(KllSketch.insert)

  private def rankError(vs: Seq[Double], st: KllState): Double = {
    val sorted = vs.sorted
    val ests = KllSketch.quantiles(st, Qs)
    Qs.zip(ests).map { case (q, e) =>
      val rank = sorted.count(_ <= e).toDouble / sorted.size
      math.abs(rank - q)
    }.max
  }

  test("n <= K is exact (all weight-1): lower-quantile convention") {
    val vs = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    val st = build(vs)
    KllSketch.quantiles(st, Seq(0.0, 0.5, 1.0)) shouldBe Seq(1.0, 5.0, 9.0)
    st.count shouldBe 5L
  }

  test("count survives compaction cascades and merges") {
    val n = 20000
    val st = build(lcgStream(n))
    st.count shouldBe n.toLong
    val halves = lcgStream(n).grouped(n / 2).map(build).toSeq
    KllSketch.merge(halves(0), halves(1)).count shouldBe n.toLong
  }

  test("rank error stays under 2% at n = 50k (single stream)") {
    val vs = lcgStream(50000)
    val err = rankError(vs, build(vs))
    withClue(s"max rank error $err") { assert(err <= 0.02) }
  }

  test("rank error stays under 2% after merging 16 chunked sketches") {
    val vs = lcgStream(50000)
    val parts = vs.grouped(vs.size / 16 + 1).map(build).toSeq
    val merged = parts.reduce(KllSketch.merge)
    merged.count shouldBe vs.size.toLong
    val err = rankError(vs, merged)
    withClue(s"max rank error $err") { assert(err <= 0.02) }
  }

  test("merge is order-insensitive up to the bound (reversed fold)") {
    val vs = lcgStream(30000)
    val parts = vs.grouped(2000).map(build).toSeq
    val a = parts.reduce(KllSketch.merge)
    val errRev = rankError(vs, parts.reverse.reduce(KllSketch.merge))
    val errFwd = rankError(vs, a)
    assert(errFwd <= 0.02 && errRev <= 0.02)
  }

  test("empty state answers NaN, zero count") {
    val st = KllSketch.empty
    st.count shouldBe 0L
    assert(KllSketch.quantiles(st, Seq(0.5)).head.isNaN)
  }

  test("MergeAgg rolls shard sketches up through Spark's agg path, same bound") {
    // the distributed day -> month rollup: sketch per shard, then a
    // typed MERGE aggregation over the state frame — facts touched once
    import spark.implicits._
    import KllSketch.stateEncoder
    val vs = lcgStream(20000)
    val sharded = vs.zipWithIndex.map { case (v, i) => (i % 8, v) }
      .toDF("shard", "v").as[(Int, Double)]
    val sk = new KllSketch.SketchAgg[(Int, Double)](_._2)
    val states = sharded.groupByKey(_._1).agg(sk.toColumn)
    val mg = new KllSketch.MergeAgg[(Int, KllState)](_._2)
    val rolled = states.select(mg.toColumn).collect().head
    rolled.count shouldBe vs.size.toLong
    val err = rankError(vs, rolled)
    withClue(s"max rank error $err") { assert(err <= 0.02) }
  }
}
