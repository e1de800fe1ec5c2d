package graft

import graft.operators.{Dedup, MultiModal, Similarity}
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._

/** Unit fixtures for the training-data-pipeline operators: shingles,
  * Jaccard, SimHash, MinHash recall, multimodal stub plumbing. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles3: n-2 shingles, short docs -> empty (no descending sequence)") {
    val df = Seq(("a b c d e"), ("x y"), ("")).toDF("t")
    val got = df.select(functions.size(Dedup.shingles3(col("t")))).as[Int].collect()
    got.toSeq shouldBe Seq(3, 0, 0)
    val sh = df.select(Dedup.shingles3(col("t"))).collect()(0).getSeq[String](0)
    sh shouldBe Seq("a b c", "b c d", "c d e")
  }

  test("shingleStats3Udf: set sizes match the Column-expression twin on adversarial texts") {
    // the r18 dd_containment rewrite rides this equivalence: the UDF's
    // (|A|, |B|, |A∩B|) must match the staged HOF spelling exactly,
    // including split-with-empties semantics (double/trailing spaces),
    // <3-word empty sets, and duplicate shingles collapsing
    val texts = Seq("a b c d e", "x y", "", "a  b c", "a b c ",
      "a b a b a b a b", "q q q", "lone", "a b c d e f g h a b c d")
    val pairs = texts.flatMap(t => Seq((t, t + " qq17 qq18 qq19"), (t, "z " + t)))
    val df = pairs.toDF("x", "y")
    val expr = df.select(
      functions.size(array_distinct(Dedup.shingles3(col("x")))).as("na"),
      functions.size(array_distinct(Dedup.shingles3(col("y")))).as("nb"),
      functions.size(array_intersect(array_distinct(Dedup.shingles3(col("x"))),
        array_distinct(Dedup.shingles3(col("y"))))).as("ni"),
      functions.size(array_union(array_distinct(Dedup.shingles3(col("x"))),
        array_distinct(Dedup.shingles3(col("y"))))).as("nu"))
      .as[(Int, Int, Int, Int)].collect().toSeq
    val viaUdf = df.select(Dedup.shingleStats3Udf(col("x"), col("y")).as("st"))
      .select(col("st._1"), col("st._2"), col("st._3"),
        col("st._1") + col("st._2") - col("st._3"))
      .as[(Int, Int, Int, Int)].collect().toSeq
    viaUdf shouldBe expr
  }

  test("jaccard3: identical -> 1, disjoint -> 0, known overlap") {
    val df = Seq(("a b c d", "a b c d"), ("a b c", "x y z"),
      ("a b c d", "a b c e")).toDF("x", "y")
    val got = df.select(round(Dedup.jaccard3(col("x"), col("y")), 6)).as[Double].collect()
    got(0) shouldBe 1.0
    got(1) shouldBe 0.0
    // shingles: {abc,bcd} vs {abc,bce} -> 1/3
    approx(got(2), 1.0 / 3, 1e-6)
  }

  test("containment3: asymmetric; substring side -> 1; empty side -> 0") {
    val df = Seq(
      ("a b c d", "a b c d e f"), // every {abc,bcd} shingle survives
      ("a b c d e f", "a b c d"), // reverse dilutes: 2 of 4
      ("a b", "a b c d")          // <3 words: empty set contains nothing
    ).toDF("x", "y")
    val got = df.select(
      round(Dedup.containment3(col("x"), col("y")), 6).as("fwd"),
      round(Dedup.jaccard3(col("x"), col("y")), 6).as("jac"))
      .as[(Double, Double)].collect()
    got(0)._1 shouldBe 1.0
    got(0)._2 should be < 1.0 // Jaccard dilutes where containment is exact
    approx(got(1)._1, 0.5, 1e-6)
    got(2)._1 shouldBe 0.0
  }

  test("simHash64: identical texts identical hash; near texts near") {
    val df = Seq(("t1", "the quick brown fox jumps over the lazy dog"),
      ("t2", "the quick brown fox jumps over the lazy dog"),
      ("t3", "the quick brown fox jumps over the lazy cat"),
      ("t4", "completely different words entirely unrelated content here")).toDF("id", "t")
    val h = df.select(col("id"), Dedup.simHash64(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    h("t1") shouldBe h("t2")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    ham(h("t1"), h("t3")) should be < 16
    ham(h("t1"), h("t4")) should be > ham(h("t1"), h("t3"))
  }

  test("simHashPairs: equals brute-force band∧hamming truth; pigeonhole-complete for hamming<=3") {
    // The dd_simhash gate pins only the planted hamming-0 slice (its
    // post-filter keeps provable pairs); this fixture keeps the
    // hamming-1..8 verify branch and band-collision behavior covered.
    // Docs share a 16-token base bag with tiny per-doc variations, so
    // pairwise signatures land across small hamming distances.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi"
    val texts = (0 until 24).map(i => (i.toLong, s"$base extra$i spice${i % 5}"))
    val docs = texts.toDF("id", "text")
    val sigs = docs.select(col("id"), Dedup.simHash64(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    def bandEq(a: Long, b: Long) = (0 until 4).exists(k =>
      ((a >>> (k * 16)) & 0xffffL) == ((b >>> (k * 16)) & 0xffffL))
    val ids = sigs.keys.toSeq.sorted
    // ground truth of what the banded join MUST emit: pairs sharing at
    // least one 16-bit band whose full hamming distance is <= max
    val expected = (for {
      i <- ids; j <- ids if i < j
      if bandEq(sigs(i), sigs(j)) && ham(sigs(i), sigs(j)) <= 8
    } yield (i, j)).toSet
    val got = Dedup.simHashPairs(docs, maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    got shouldBe expected
    // Manku's pigeonhole: <=3 flipped bits cannot touch all 4 bands, so
    // every hamming<=3 pair is guaranteed found regardless of hash family
    val close = (for { i <- ids; j <- ids if i < j
      if ham(sigs(i), sigs(j)) <= 3 } yield (i, j)).toSet
    close.subsetOf(got) shouldBe true
    // the fixture genuinely exercises the 1..8 verify range, not just 0
    val hams = got.map { case (a, b) => ham(sigs(a), sigs(b)) }
    hams.count(h => h >= 1 && h <= 8) should be > 0
    hams.size should be > 2
  }

  test("minHashPairs: planted near-dup pair is recalled, banded plan") {
    val base = (0L until 30L).map(i => (i, s"tok$i alpha beta gamma delta epsilon zeta eta theta iota word$i"))
    val docs = (base :+ (100L, base(5)._2 + " extra")).toDF("id", "text")
    val pairs = Dedup.minHashPairs(docs, threshold = 0.5)
    val plan = pairs.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    got should contain((5L, 100L))
  }

  test("hammingBandPairs: pigeonhole catch at hamming<=3, banded plan, exact verify filter") {
    val hashes = Seq((1L, 0x0123456789abcdefL),
      (2L, 0x0123456789abcdefL ^ 7L), // hamming 3 vs id 1 (one band untouched)
      (3L, 0x7777000011112222L)).toDF("id", "ph")
    val pairs = Dedup.hammingBandPairs(hashes, maxHamming = 6)
    pairs.queryExecution.executedPlan.toString should not include "CartesianProduct"
    pairs.select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet shouldBe Set((1L, 2L, 3L))
  }

  test("hammingBandPairsFramed: temporal alignment keys, frame-count gate, summed verify") {
    // id 1 vs 2: identical 2-frame signatures except 3 bits on frame 0
    //   → caught (frame 1's bands untouched; frame 0 pigeonhole too)
    // id 3: id 1's frame hashes in SWAPPED order → temporal
    //   misalignment; no same-frame band collides and the aligned
    //   hamming is huge either way → absent
    // id 4: frame 0 identical to id 1's (band collision guaranteed)
    //   but 3 frames → the equal-frame-count gate drops the candidate
    val f0 = 0x0123456789abcdefL; val f1 = 0x7777000011112222L
    val framed = Seq(
      (1L, 2L, 0L, f0), (1L, 2L, 1L, f1),
      (2L, 2L, 0L, f0 ^ 7L), (2L, 2L, 1L, f1),
      (3L, 2L, 0L, f1), (3L, 2L, 1L, f0),
      (4L, 3L, 0L, f0), (4L, 3L, 1L, f1), (4L, 3L, 2L, 0L))
      .toDF("id", "nf", "f", "ph")
    val pairs = Dedup.hammingBandPairsFramed(framed, maxHamming = 6)
    pairs.queryExecution.executedPlan.toString should not include "CartesianProduct"
    pairs.select("id_a", "id_b", "n_frames", "hamming").as[(Long, Long, Long, Long)]
      .collect().toSet shouldBe Set((1L, 2L, 2L, 3L))
  }

  test("minHashPairsAgainst: delta×base only — no base-base, no delta-delta pairs") {
    val base = (0L until 30L).map(i =>
      (i, s"tok$i alpha beta gamma delta epsilon zeta eta theta iota word$i"))
    // ids 7/8 are near-identical INSIDE the base: a symmetric dedup
    // would pair them; the asymmetric probe must not re-dedup the base
    val baseDf = (base.filterNot(_._1 == 7L) :+ (7L, base(8)._2 + " extra"))
      .toDF("id", "text")
    // delta: 100 = near-dup of base 5; 101/102 = identical to each
    // other (a delta-delta pair a symmetric op would emit) but alien
    // to every base doc
    val deltaDf = Seq(
      (100L, base(5)._2 + " extra"),
      (101L, "omega psi chi phi upsilon tau sigma rho pi omicron"),
      (102L, "omega psi chi phi upsilon tau sigma rho pi omicron"))
      .toDF("id", "text")
    val pairs = Dedup.minHashPairsAgainst(deltaDf, baseDf, threshold = 0.5)
    pairs.queryExecution.executedPlan.toString should not include "CartesianProduct"
    val got = pairs.select("delta_id", "base_id").as[(Long, Long)].collect().toSet
    got should contain((100L, 5L))
    all(got.map(_._1)) should be >= 100L // every pair probes delta→base
    all(got.map(_._2)) should be < 100L // never base-base or delta-delta
    got.map(_._1) should not contain 101L // alien delta docs match nothing
  }

  test("pl_data_quality: ledger semantics — ok ≡ zero violations, tight range trips") {
    // The entry's value rests on the fixture exercising BOTH branches:
    // the deliberately-tight quantity range (1..45 vs TPC-H's 1..50)
    // trips nonzero, and lineitem's composite key is GENUINELY dirty
    // in the synthetic fixture (the checker's own first run found it),
    // while the structurally-sound constraints sit at exactly zero.
    // ok must equal violations==0 row-by-row (a checker that
    // green-lights a nonzero count is worse than none).
    val rows = QueriesPipeline.plDataQuality.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("check_name"),
        r.getAs[Long]("violations"), r.getAs[Boolean]("ok")))
    rows.length shouldBe 8
    rows.foreach { case (name, v, ok) =>
      withClue(name) { ok shouldBe (v == 0L) }
    }
    val byName = rows.map(r => r._1 -> r._2).toMap
    byName("range_quantity_1_45") should be > 0L
    byName("unique_orderkey_linenumber") should be > 0L // found fixture dirt
    byName("unique_orders_orderkey") shouldBe 0L // the clean PK branch
    byName("fk_orderkey_in_orders") shouldBe 0L
    byName("completeness_shipdate") shouldBe 0L
  }

  test("pl_corpus_drift: ledger balances and every planted shift source is live") {
    val rows = QueriesPipeline.plCorpusDrift.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_v1"),
        r.getAs[Long]("n_v2"), r.getAs[Long]("shift_ppm")))
    // shares are floor-ppm of the same totals the counts roll up to —
    // the ledger must balance: Σn per side equals the version censuses
    // pl_corpus_diff derives from the identical v1/v2 rules
    val (t1, t2) = (rows.map(_._2).sum, rows.map(_._3).sum)
    t2 should not be t1 // removals (%13) vs additions (%10==9) differ
    // the report is non-degenerate: mass moved in BOTH directions
    // (a broken bucket key would park everything in one bucket,
    // a broken v2 derivation would zero every shift)
    rows.count(_._4 > 0) should be >= 1
    rows.count(_._4 < 0) should be >= 1
    // floor-ppm shares sum to ≤ 1e6 per side, within one ulp per bucket
    val s1 = rows.map(r => r._2 * 1000000L / t1).sum
    (1000000L - s1) should be < rows.length.toLong
  }

  test("minhash recall audit: exact miss census pinned (the banding loss is deterministic)") {
    // dd_minhash_recall_audit's entry gate is a >=0.93 floor; the
    // EXACT caught/truth counts live here (the QualityClassifierSpec
    // division of labor), so a subtle banding change — one lost band
    // costs ~2% recall, inside the gate floor — fails by name. Pinned
    // from the r16 calibration run (fixed hash family, head-sampled
    // corpus => fully deterministic): sf0.001 caught 126 of 131.
    val d = "/root/testdata/sf0.001"
    val row = QueriesPipeline.ddMinhashRecall.fn(spark, d).collect()(0)
    row.getAs[Long]("n_planted") shouldBe 167L
    row.getAs[Long]("n_truth") shouldBe 131L
    row.getAs[Boolean]("recall_ok") shouldBe true
    // the un-aggregated caught count (not in the hashed row — the
    // oracle can't replay the hash family — so pin it here)
    val base = QueriesPipeline.minhashBaseDocs(spark, d)
    val kTok = (lit(3) + (col("id") % 8) * lit(5)).cast("int")
    val vtext = concat(col("text"),
      array_join(transform(sequence(lit(1), kTok),
        j => concat(lit(" zq"), col("id").cast("string"),
          lit("x"), j.cast("string"))), ""))
    val corpus = base.unionByName(base.where(col("id") % 3 === 0)
      .select((col("id") + 200000L).as("id"), vtext.as("text")))
    val caught = Dedup.minHashPairs(corpus, threshold = 0.4)
      .where(col("id_b") === col("id_a") + 200000L && col("id_a") % 3 === 0)
      .count()
    caught shouldBe 126L
  }

  test("jaccard3 properties: symmetric, in [0,1], self-similarity 1 (seeded sweep)") {
    val rnd = new scala.util.Random(31)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def doc() = Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val pairs = Seq.fill(25)((doc(), doc()))
    val df = pairs.toDF("x", "y")
    val rows = df.select(
      Dedup.jaccard3(col("x"), col("y")).as("xy"),
      Dedup.jaccard3(col("y"), col("x")).as("yx"),
      Dedup.jaccard3(col("x"), col("x")).as("xx")).collect()
    rows.foreach { r =>
      r.getDouble(0) shouldBe r.getDouble(1) // symmetric
      r.getDouble(0) should (be >= 0.0 and be <= 1.0)
      r.getDouble(2) shouldBe 1.0 // self-similarity
    }
  }

  test("multimodal codecs round-trip through Spark columns") {
    val df = Seq(5L, 17L).toDF("doc_id")
    val r = df
      .select(col("doc_id"),
        MultiModal.decodeBmpUdf(
          MultiModal.encodeBmpUdf(col("doc_id"), lit(5), lit(3))).as("bmp"),
        MultiModal.decodeWavUdf(
          MultiModal.encodeWavUdf(col("doc_id"), lit(8000), lit(7))).as("wav"),
        MultiModal.decodeY4mUdf(
          MultiModal.encodeY4mUdf(col("doc_id"), lit(4), lit(3), lit(5)),
          lit(2)).as("vid"))
      .orderBy("doc_id").collect()
    for (row <- r) {
      val id = row.getLong(0)
      val bmp = row.getStruct(1)
      bmp.getInt(0) shouldBe 5 // width
      bmp.getInt(1) shouldBe 3 // height
      bmp.getInt(2) shouldBe 24 // bpp
      bmp.getLong(3) shouldBe (0 until 15).map(p => (id + p) % 256).sum
      val wav = row.getStruct(2)
      wav.getInt(0) shouldBe 8000
      wav.getInt(1) shouldBe 1
      wav.getInt(2) shouldBe 16
      wav.getInt(3) shouldBe 7
      wav.getLong(4) shouldBe (0 until 7).map(i => (id * 31 + i * 7) % 2003 - 1001).sum
      // y4m 4x3, 5 frames, every 2nd sampled -> frames 0, 2, 4
      val vid = row.getStruct(3)
      vid.getInt(0) shouldBe 4  // width
      vid.getInt(1) shouldBe 3  // height
      vid.getInt(2) shouldBe 25 // fps num
      vid.getInt(3) shouldBe 1  // fps den
      vid.getInt(4) shouldBe 5  // ALL frames counted, not just sampled
      vid.getSeq[Long](5) shouldBe Seq(0, 2, 4).map(f =>
        (0 until 12).map(p => (id * 11 + f * 17 + p) % 256).sum)
    }
  }

  test("bruteTopK: probe ranks itself first with cosine 1") {
    val emb = Seq((0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.bruteTopK(emb, 0, 3)
      .as[(Long, Double)].collect()
    got(0) shouldBe ((0L, 1.0))
    got(1)._1 shouldBe 1L
    got(2)._1 shouldBe 2L
  }

  test("ivfTopK: pruned cell search still returns the exact top-k on clustered data") {
    // two well-separated blobs of 20 vectors each; the probe's blob
    // holds its true top-5, so cutting the OTHER blob's cells away
    // (nProbe=1 of nLists=2) must not change the answer — the IVF
    // contract: pruning shifts cost, never correctness, when neighbor
    // structure exists. Brute force over the same corpus is the truth.
    val rnd = new scala.util.Random(11)
    def blob(center: Double, baseId: Long) = (0 until 20).map { i =>
      (baseId + i, Seq.fill(8)((center + rnd.nextGaussian() * 0.05).toFloat))
    }
    val emb = (blob(0.0, 0L) ++ blob(10.0, 100L)).toDF("vec_id", "embedding")
    val ivf = Similarity.ivfTopK(emb, probeId = 0, k = 5, nLists = 2, nProbe = 1)
      .as[(Long, Double)].collect().toSeq
    // brute-force L2 truth, same rounding/tie rules
    val all = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val pv = all.find(_._1 == 0L).get._2
    val brute = all.map { case (id, v) =>
      (id, BigDecimal(math.sqrt(v.zip(pv).map { case (a, b) => (a - b) * (a - b) }.sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(t => (t._2, t._1)).take(5).toSeq
    ivf shouldBe brute
    // and every hit comes from the probe's blob — the far cells were pruned
    ivf.map(_._1).forall(_ < 100L) shouldBe true
  }

  test("line dedup: earliest occurrence wins, partial trim, full-doc elimination") {
    // 12-word "lines" (the entry's segmentation); ids avoid %7==0 so
    // dupCorpus plants nothing on top of the crafted cases
    def line(p: String) = (1 to 12).map(i => s"$p$i").mkString(" ")
    val (la, lb, lz) = (line("a"), line("b"), line("z"))
    val dir = "target/tmp/spec_linededup_sem"
    Seq(
      (1L, s"$la ${line("x")}"),  // keeps both lines
      (2L, s"$la $lb"),           // la lost to doc 1 — partial trim
      (3L, s"$la ${line("x")}"),  // exact copy of doc 1 — vanishes
      (4L, s"$lz $lz")            // within-doc dup — first occurrence kept
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesPipeline.plLineDedup.fn(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    got shouldBe Seq(
      (1L, s"$la ${line("x")}", 2L, 2L),
      (2L, lb, 1L, 2L),
      (4L, lz, 1L, 2L))
  }

  test("collocations: degenerate docs (empty/1-word/null/spaces) don't crash the bigram builder") {
    // r12 guard: size(ws) < 2 must yield NO bigrams — unguarded,
    // sequence(1, size-1) turns DESCENDING and element_at(ws, 0)
    // throws INVALID_INDEX_OF_ZERO even with ANSI off (the
    // ArrayOps/shingles3 hazard); DuckDB's end-exclusive range just
    // emits nothing, so the guard is also the oracle's semantic
    val dir = "target/tmp/spec_colloc_guard"
    Seq(
      (1L, "a b tail1"), (2L, "a b tail2"), (3L, "a b tail3"),
      (4L, ""), (5L, "lone"), (6L, "   "), (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesPipeline.txCollocations.fn(spark, dir)
      .select("x", "y", "c_xy", "c_x", "c_y").as[(String, String, Long, Long, Long)]
      .collect().toSeq
    // only (a,b) clears the c_xy >= 3 floor; marginals count the full
    // census (a→b ×3, b→tailN ×3 ⇒ c_y(b)=3 from a only, c_x(b)=3)
    got shouldBe Seq(("a", "b", 3L, 3L, 3L))
  }

  test("chunk overlap: stride-24/window-32 covers every word, ragged tail kept") {
    val dir = "target/tmp/spec_chunk_sem"
    val w50 = (1 to 50).map(i => s"w$i")
    Seq((1L, w50.mkString(" ")), (2L, (1 to 10).map(i => s"s$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesPipeline.plChunkOverlap.fn(spark, dir)
      .as[(Long, Long, String, Int)].collect().toSeq
    got shouldBe Seq(
      (1L, 0L, w50.take(32).mkString(" "), 32),
      (1L, 1L, w50.slice(24, 50).mkString(" "), 26),
      (1L, 2L, w50.slice(48, 50).mkString(" "), 2),
      (2L, 0L, (1 to 10).map(i => s"s$i").mkString(" "), 10))
  }

  test("substring dup: first occurrence wins, short-doc clip, within-doc repeat") {
    // ids avoid %7==0 and %11==0 so the entry's planted variants stay out
    val dir = "target/tmp/spec_subdup_sem"
    val a16 = (1 to 16).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, a16 + " w17"),                      // 2 grams, both unique
      (2L, a16),                               // = doc 1's first gram → dup
      (3L, (1 to 10).map(i => s"s$i").mkString(" ")), // short: one whole-doc gram
      (4L, (1 to 10).map(i => s"s$i").mkString(" ")), // short dup of doc 3
      (5L, s"$a16 $a16")  // pos 1 dups doc 1's gram (cross-doc), pos 17 dups pos 1 (within-doc)
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesPipeline.plSubstringDup.fn(spark, dir)
      .as[(Long, Long, Long, Double, Int)].collect().toSeq
    got shouldBe Seq(
      (1L, 2L, 0L, 0.0, 1),
      (2L, 1L, 1L, 1.0, 0),
      (3L, 1L, 0L, 0.0, 1),
      (4L, 1L, 1L, 1.0, 0),
      (5L, 17L, 2L, BigDecimal(2.0 / 17).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, 1))
  }

  test("suffix dedup: span removal covers dup grams, keeps first, spares short docs") {
    // ids avoid %7==0 and %11==0 so the entry's planted variants stay out
    val dir = "target/tmp/spec_sufdedup_sem"
    val a16 = (1 to 16).map(i => s"w$i").mkString(" ")
    val b20 = (1 to 20).map(i => s"b$i").mkString(" ")
    Seq(
      (1L, s"u1 u2 $b20"),       // first occurrence of b-span: kept whole
      (2L, s"v1 v2 v3 $b20"),    // later b-span: its 5 interior gram starts
                                 //  (len 23, prefix 3: starts 4..8 all-b)
                                 //  cover positions 4..23; v-prefix kept
      (3L, a16),                 // 16 tokens, unique: kept
      (4L, a16),                 // exact dup of doc 3: fully removed
      (5L, "s1 s2 s3 s1 s2 s3")  // < 16 tokens: no grams, untouched
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesPipeline.plSuffixDedup.fn(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSeq
    got shouldBe Seq(
      (1L, 22L, 0L, s"u1 u2 $b20"),
      (2L, 23L, 20L, "v1 v2 v3"),
      (3L, 16L, 0L, a16),
      (4L, 16L, 16L, ""),
      (5L, 6L, 0L, "s1 s2 s3 s1 s2 s3"))
  }

  test("weighted sample: driver-side A-ES replay and weight-proportional bias") {
    // 400 docs: even ids carry 40 tokens, odd ids 2 — under A-ES the
    // top-200 must overrepresent the heavy class. Exact expected set =
    // a driver replay of the integer key recurrence (Lcg fold, scaled
    // ln difference, exact floorDiv).
    val dir = "target/tmp/spec_wsample_sem"
    (0L until 400L).map { i =>
      val n = if (i % 2 == 0) 40 else 2
      (i, (1 to n).map(j => s"t${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def floorLn(x: Long): Long = math.floor(1000000.0 * math.log(x.toDouble)).toLong
    val expected = (0L until 400L).map { id =>
      val w = if (id % 2 == 0) 40L else 2L
      val k2 = graft.functions.Lcg.key(id) % (1L << 20)
      val lnu = floorLn(k2 + 1) - floorLn(1L << 20)
      val a = lnu * 1000000L
      (id, w, Math.floorDiv(a, w))
    }.sortBy { case (id, _, k) => (-k, id) }.take(200)
    val got = QueriesPipeline.plWeightedSample.fn(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    got shouldBe expected
    // weight bias: heavy docs hold a clear majority of the sample
    got.count(_._2 == 40L) should be > 120
  }

  test("stratified sample: per-stratum quota = global A-ES order restricted to the stratum") {
    // same fixture shape as the global sampler, plus a 2-language
    // split; each language's winners must be exactly the top-40 of the
    // SAME driver-replayed key order restricted to that language.
    val dir = "target/tmp/spec_ssample_sem"
    (0L until 300L).map { i =>
      val n = if (i % 2 == 0) 40 else 2
      val lang = if (i % 3 == 0) "en" else "zh"
      (i, lang, (1 to n).map(j => s"t${i}_$j").mkString(" "))
    }.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def floorLn(x: Long): Long = math.floor(1000000.0 * math.log(x.toDouble)).toLong
    val keys = (0L until 300L).map { id =>
      val w = if (id % 2 == 0) 40L else 2L
      val lang = if (id % 3 == 0) "en" else "zh"
      val k2 = graft.functions.Lcg.key(id) % (1L << 20)
      val lnu = floorLn(k2 + 1) - floorLn(1L << 20)
      (id, lang, w, Math.floorDiv(lnu * 1000000L, w))
    }
    val expected = keys.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy { case (id, _, _, k) => (-k, id) }.take(40).zipWithIndex
        .map { case ((id, lang, w, k), i) => (id, lang, w, k, i + 1L) }
    }.sortBy { case (id, lang, _, _, rk) => (lang, rk) }
    val got = QueriesPipeline.plStratifiedSample.fn(spark, dir)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    got shouldBe expected
    got.groupBy(_._2).view.mapValues(_.size).toMap shouldBe
      Map("en" -> 40, "zh" -> 40)
  }

  test("perplexity filter: closed-form familiarity, tertile buckets, head+middle kept") {
    // corpus bigram counts: aa=5 (3 from doc 1, 2 from doc 2), ab=1,
    // bb=3 → fam1=(5+5+5)/3=5.0, fam2=(5+5+1)/3=3.666667, fam3=3.0.
    // exact tertiles of {3.0, 3.666667, 5.0} (rank p·(n−1)): t1≈3.444,
    // t2≈4.111 → buckets tail / middle / head, tail cut.
    val dir = "target/tmp/spec_ppl_sem"
    Seq((1L, "aaaa"), (2L, "aaab"), (3L, "bbbb")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueriesPipeline.plPerplexityFilter.fn(spark, dir)
      .as[(Long, Double, String, Int)].collect().toSeq
    got.map(_._1) shouldBe Seq(1L, 2L, 3L)
    approx(got(0)._2, 5.0, 1e-9)
    approx(got(1)._2, 3.666667, 1e-9)
    approx(got(2)._2, 3.0, 1e-9)
    got.map(_._3) shouldBe Seq("head", "middle", "tail")
    got.map(_._4) shouldBe Seq(1, 1, 0)
  }
}
