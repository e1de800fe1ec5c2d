package graft

import graft.functions.Lcg
import org.apache.spark.sql.functions._

/** The r13 A-ES tie-break fix (VERDICT r12 #2b): inside a 2^20 key
  * granule the sampler used to break skey ties by raw doc_id, which
  * preferentially selects LOW ids in every tied cohort once the corpus
  * outgrows the granule count. Ties now order by the independent
  * [[Lcg.key2]] permutation. Two obligations:
  *  - planted regime: a same-granule, same-weight cohort (built by
  *    inverting the Lcg so every member folds to ONE granule) is
  *    selected in key2 order, NOT as an id prefix;
  *  - shipped data: zero skey ties exist in any shipped sample output,
  *    so the tie-break change is provably hash-neutral there (the
  *    CORRECTNESS gate separately re-proves the oracle match). */
class SampleTieBreakSpec extends SparkSpec {
  import spark.implicits._

  private val m2 = 1L << 20

  /** ids whose Lcg key folds to granule `g`: x = A^{-1}(y - C) mod M
    * over y ≡ g (mod 2^20). Every id is in [0, 2^31). */
  private def cohort(g: Long, n: Int): Seq[Long] = {
    val aInv = BigInt(Lcg.A).modInverse(BigInt(Lcg.M)).toLong
    (0 until n).map { i =>
      val y = g + i.toLong * m2
      (BigInt(aInv) * BigInt((y - Lcg.C % Lcg.M + Lcg.M) % Lcg.M))
        .mod(BigInt(Lcg.M)).toLong
    }
  }

  test("planted same-granule cohort: selection follows key2 order, not id order") {
    val g = 12345L
    val ids = cohort(g, 512)
    // invariant of the construction: one shared granule
    ids.foreach { id => Lcg.key(id) % m2 shouldBe g }
    val w = 7L // same weight for all -> identical skey across the cohort
    val df = ids.map(id => (id, w)).toDF("doc_id", "w")
      .withColumn("k2", pmod(Lcg.key(col("doc_id")), lit(m2)))
      .withColumn("lnu",
        expr(s"""CAST(floor(1000000 * ln(CAST(k2 + 1 AS DOUBLE))) AS BIGINT)
          | - CAST(floor(1000000 * ln(CAST($m2 AS DOUBLE))) AS BIGINT)"""
          .stripMargin))
      .withColumn("skey",
        expr("(lnu * 1000000 - pmod(lnu * 1000000, w)) div w"))
      .withColumn("tb", Lcg.key2(col("doc_id")))
    df.select(countDistinct("skey")).as[Long].head() shouldBe 1L
    val m = 50
    val got = df.orderBy(col("skey").desc, col("tb"), col("doc_id"))
      .limit(m).select("doc_id").as[Long].collect().toSeq
    val expected = ids.sortBy(id => (Lcg.key2(id), id)).take(m)
    got shouldBe expected
    // the id-prefix bias is gone: the winners are NOT the m lowest ids
    got.toSet should not be ids.sorted.take(m).toSet
    // and key2 keeps the order total on the cohort (bijection below 2^31)
    ids.map(Lcg.key2).distinct.length shouldBe ids.length
  }

  test("shipped data carries zero skey ties: tie-break is a no-op there") {
    val d = "/root/testdata/sf0.001"
    val ws = QueriesPipeline.plWeightedSample.fn(spark, d)
      .select("skey").as[Long].collect()
    ws.length shouldBe ws.distinct.length
    val st = QueriesPipeline.plStratifiedSample.fn(spark, d)
      .select("lang", "skey").as[(String, Long)].collect()
    st.length shouldBe st.distinct.length
  }
}
