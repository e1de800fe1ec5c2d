package graft

import org.apache.spark.sql.functions._

/** The data-derived key-lift contract (r14 sf1.0 rehearsal): entries
  * that plant "new" rows above the key domain must stay INJECTIVE at
  * every corpus size — a constant lift collides the moment real keys
  * grow past it, and the collision tie-breaks are engine-dependent
  * (the exact divergence the rehearsal measured). These tests run the
  * live entries against a synthetic customer table whose custkeys
  * CROSS the shipped +1e6/+2e6 constants, the regime the rehearsal
  * fixture created, so the contract can't silently regress between
  * rehearsals. */
class KeyLiftSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic dir whose custkeys span 0..2.5e6 — past BOTH shipped
    * lift constants. Multiples of 7/10/13/21/97 exist on each side of
    * the old collision lines, so every planted slice is non-empty. */
  private lazy val bigDomainDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("keylift").toFile
    val keys = (0L to 200L) ++ (999900L to 1000100L) ++ (2499900L to 2500000L)
    keys.toSeq.map(k => (k, s"Customer#$k", (k % 977).toDouble / 7.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
      .write.mode("overwrite").parquet(s"${dir.getPath}/customer.parquet")
    dir.getPath
  }

  test("o_upsert: planted inserts stay injective when keys cross 1e6") {
    val out = QueriesAggWindow.oUpsert.fn(spark, bigDomainDir).cache()
    val n = out.count()
    val distinctKeys = out.select("custkey").distinct().count()
    // injectivity: the merge emits exactly one row per key — a constant
    // +1e6 lift would land planted inserts on the 999900..1000100 block
    // and emit duplicate keys
    distinctKeys shouldBe n
    // the plant really fired: lifted keys sit ABOVE the whole domain
    val maxBase = 2500000L
    val lifted = out.where(col("custkey") > maxBase).count()
    lifted should be > 0L
    out.unpersist()
  }

  test("o_cdc_apply: insert log rows stay injective when keys cross 2e6") {
    val out = QueriesAggWindow.oCdcApply.fn(spark, bigDomainDir).cache()
    out.select("key").distinct().count() shouldBe out.count()
    out.where(col("key") > 2500000L).count() should be > 0L
    out.unpersist()
  }

  test("tableMax memoizes per dataVer and retargets on regen") {
    val dir = java.nio.file.Files.createTempDirectory("tmax").toFile
    Seq((5L, "a"), (17L, "b")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"${dir.getPath}/customer.parquet")
    Tables.tableMax(spark, dir.getPath, "customer", "c_custkey") shouldBe 17L
    // regen with a bigger key and a bumped mtime: the memo must
    // retarget (the dataVer discipline), not serve the stale max
    Seq((5L, "a"), (4321L, "c")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"${dir.getPath}/customer.parquet")
    val f = new java.io.File(dir, "customer.parquet")
    f.setLastModified(f.lastModified() + 5000) shouldBe true
    Tables.tableMax(spark, dir.getPath, "customer", "c_custkey") shouldBe 4321L
  }

  test("pl_incremental_ingest: the two increment lifts are disjoint at every SF (mod-10 proof holds on a crossing domain)") {
    // the +200000 (fresh, ids ≡ 9 mod 10) and +300000 (re-crawl, ids
    // ≢ 9 mod 10) lifts collide only if some base id ≡ 9 mod 10 —
    // excluded by construction. Exercise it on a doc_id domain that
    // CROSSES both constants (the regime a rehearsal fixture creates),
    // with texts unique per id so every fresh doc must be admitted.
    val dir = java.nio.file.Files.createTempDirectory("incr").toFile
    val ids = (0L to 50L) ++ (199990L to 200010L) ++ (299990L to 300010L)
    ids.toSeq.map(i => (i, s"doc text $i", "en", s"src${i % 3}", 10L + i % 5))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"${dir.getPath}/documents.parquet")
    val out = QueriesPipeline.plIncrementalIngest.fn(spark, dir.getPath).cache()
    // injectivity: one output row per new_id
    out.select("new_id").distinct().count() shouldBe out.count()
    // exactness: every fresh doc admitted (unique texts), every
    // re-crawl refused — the output is exactly the lifted fresh slice
    val freshIds = ids.filter(_ % 10 == 9).map(_ + 200000L).sorted
    out.orderBy("new_id").select("new_id").collect().map(_.getLong(0))
      .toSeq shouldBe freshIds
    out.unpersist()
  }
}
