package graft

import org.apache.spark.sql.functions._

/** Rule-level pins for the URL canonicalization family: each
  * normalization rule asserted on a concrete synthesized URL (the
  * entry-level oracle proves Spark==DuckDB; this spec proves both
  * equal the INTENDED canonicalization), plus the collapse structure
  * pl_host_dedup's dedup semantics ride on. */
class UrlCanonSpec extends SparkSpec {

  private lazy val byId: Map[Long, (String, String)] =
    SparkEntry.queries("pl_url_canonical")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("url"), r.getAs[String]("url_canon"))).toMap

  test("each canonicalization rule fires as intended") {
    // doc 0: upper scheme-default port :80 stripped, utm_ dropped, frag dropped
    byId(0L) shouldBe ("http://example-0.com:80/page/0?utm_source=feed&ref=0#sec-0",
      "http://example-0.com/page/0?ref=0")
    // doc 1: scheme+host case folded, :8080 KEPT, trailing slash stripped,
    // utm_campaign dropped but ref kept
    byId(1L) shouldBe ("HTTP://EXAMPLE-0.COM:8080/page/0/?ref=0&utm_campaign=x",
      "http://example-0.com:8080/page/0?ref=0")
    // doc 2: www. stripped, query params SORTED
    byId(2L) shouldBe ("https://WWW.example-0.com/page/0?b=2&a=1",
      "https://example-0.com/page/0?a=1&b=2")
    // doc 10: https default :443 stripped (spelled only for https-class raws)
    byId(10L)._1 should include (":443")
    byId(10L)._2 should not include ":443"
    // doc 4: bare URL is already canonical apart from case
    byId(4L) shouldBe ("http://EXAMPLE-1.COM/page/1",
      "http://example-1.com/page/1")
  }

  test("variant quads collapse: 500 docs -> 350 canonical URLs, max group 2") {
    val canon = SparkEntry.queries("pl_url_canonical")(spark,
      "/root/testdata/sf0.001")
    val groups = canon.groupBy("url_canon").count()
    groups.count() shouldBe 350L
    groups.agg(max(col("count"))).collect()(0).getLong(0) shouldBe 2L
    // host dedup reports exactly that structure
    val h = SparkEntry.queries("pl_host_dedup")(spark, "/root/testdata/sf0.001")
      .agg(sum("n_docs"), sum("n_urls"), sum("n_dropped")).collect()(0)
    (h.getLong(0), h.getLong(1), h.getLong(2)) shouldBe ((500L, 350L, 150L))
  }

  test("keep-best per canonical URL: longest doc wins, id tie-break, packed-key roundtrip") {
    // recompute kept ids independently of the packed-BIGINT spelling
    val canon = SparkEntry.queries("pl_url_canonical")(spark,
      "/root/testdata/sf0.001")
      .join(Tables.tbl(spark, "/root/testdata/sf0.001", "documents")
        .select(col("doc_id"), col("n_chars")), "doc_id")
    val expected = canon.collect()
      .groupBy(_.getAs[String]("url_canon"))
      .map { case (_, rows) =>
        rows.map(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
          .minBy { case (nc, id) => (-nc, id) }._2
      }.sum
    val got = SparkEntry.queries("pl_host_dedup")(spark,
      "/root/testdata/sf0.001")
      .agg(sum("kept_id_sum")).collect()(0).getLong(0)
    got shouldBe expected
  }
}
