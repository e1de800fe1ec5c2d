package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Hand-computed cases for the as-of join's edge semantics — the parts
  * the j_asof oracle exercises only if the data happens to: the `>=`
  * tie, the no-preceding-row null, and payload-null match atomicity. */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  private def run(probe: Seq[(Long, Long, String)],
      build: Seq[(Long, Long, java.lang.Double)]) = {
    val p = probe.toDF("k", "t", "tag")
    val b = build.toDF("k", "t", "v")
    AsOf.asofJoin(p, b, "k", "t")
      .select(col("k"), col("t"), col("tag"), col("asof.t").as("bt"),
        col("asof.v").as("bv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getLong(3).asInstanceOf[Any],
        if (r.isNullAt(4)) null else r.getDouble(4).asInstanceOf[Any]))
      .sortBy(x => (x._1, x._2)).toSeq
  }

  test("most recent at-or-before row matches; equal time ties match (>= semantics)") {
    val got = run(
      probe = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 25L, "c")),
      build = Seq((1L, 10L, 1.0: java.lang.Double), (1L, 20L, 2.0: java.lang.Double)))
    got shouldBe Seq(
      (1L, 10L, "a", 10L, 1.0), // tie: build at the same instant matches
      (1L, 20L, "b", 20L, 2.0),
      (1L, 25L, "c", 20L, 2.0)) // strictly-later probe takes the latest earlier build
  }

  test("probe before any build row gets a null asof struct") {
    val got = run(
      probe = Seq((1L, 5L, "early"), (2L, 99L, "other-key")),
      build = Seq((1L, 10L, 1.0: java.lang.Double)))
    got shouldBe Seq(
      (1L, 5L, "early", null, null),
      (2L, 99L, "other-key", null, null)) // keys never mix
  }

  private def runFwd(probe: Seq[(Long, Long, String)],
      build: Seq[(Long, Long, java.lang.Double)]) = {
    val p = probe.toDF("k", "t", "tag")
    val b = build.toDF("k", "t", "v")
    AsOf.asofJoinForward(p, b, "k", "t")
      .select(col("k"), col("t"), col("tag"), col("asof.t").as("bt"),
        col("asof.v").as("bv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getLong(3).asInstanceOf[Any],
        if (r.isNullAt(4)) null else r.getDouble(4).asInstanceOf[Any]))
      .sortBy(x => (x._1, x._2)).toSeq
  }

  test("forward: earliest at-or-after row matches; equal time ties match (<= semantics)") {
    val got = runFwd(
      probe = Seq((1L, 10L, "a"), (1L, 15L, "b"), (1L, 21L, "c")),
      build = Seq((1L, 10L, 1.0: java.lang.Double), (1L, 20L, 2.0: java.lang.Double)))
    got shouldBe Seq(
      (1L, 10L, "a", 10L, 1.0), // tie: build at the same instant matches
      (1L, 15L, "b", 20L, 2.0), // takes the NEXT build, not the previous
      (1L, 21L, "c", null, null)) // probe after every build → null
  }

  test("a build row with a null payload FIELD still matches (struct atomicity)") {
    // a column-wise last(ignoreNulls) would skip the null field and
    // resurrect the older build row's value — the struct must not
    val got = run(
      probe = Seq((1L, 30L, "p")),
      build = Seq((1L, 10L, 7.0: java.lang.Double), (1L, 20L, null: java.lang.Double)))
    got shouldBe Seq((1L, 30L, "p", 20L, null))
  }
}
