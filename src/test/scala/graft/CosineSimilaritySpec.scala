package graft

import graft.functions.ArrayOps
import org.apache.spark.sql.functions._

/** The native cosine_sim Catalyst expression: registration through
  * SparkSessionExtensions, SQL + Column usage, bitwise parity with the
  * builtin-combo ArrayOps.cosine, and the null/edge contract. */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("registered via extensions: usable from SQL") {
    val got = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").as[Double].head()
    got shouldBe 1.0
  }

  test("bitwise parity with ArrayOps.cosine on seeded random vectors") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val cmp = df.select(
      call_function("cosine_sim", col("a"), col("b")).as("native"),
      ArrayOps.cosine(col("a"), col("b")).as("combo"))
    // bitwise: the fused loop folds each accumulator in the same order
    cmp.where(col("native") =!= col("combo")).count() shouldBe 0L
  }

  test("null contract: null input, length mismatch, null element, zero norm") {
    val got = spark.sql(
      """SELECT
        | cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS null_in,
        | cosine_sim(array(1.0d, 2.0d), array(1.0d)) AS len_mismatch,
        | cosine_sim(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS null_elem,
        | cosine_sim(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS zero_norm""".stripMargin).head()
    (0 until 4).foreach(i => got.isNullAt(i) shouldBe true)
  }

  test("expression survives whole-stage codegen (no fallback result drift)") {
    // force both paths: codegen on (default) vs interpreted eval via
    // spark.sql.codegen.wholeStage=false on a cloned frame
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0))).toDF("a", "b")
    val on = df.select(call_function("cosine_sim", col("a"), col("b"))).as[Double].head()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(call_function("cosine_sim", col("a"), col("b"))).as[Double].head()
      on shouldBe off
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    on shouldBe (10.0 / (math.sqrt(14.0) * math.sqrt(14.0))) +- 1e-15
  }

  test("registration-boundary coercion: numeric (non-double) arrays from SQL") {
    // int-array literals — the spelling a SQL user actually types
    spark.sql("SELECT cosine_sim(array(1, 0), array(1, 1)) AS c")
      .as[Double].head() shouldBe (1.0 / math.sqrt(2.0)) +- 1e-15
    spark.sql("SELECT array_stats(array(1, 2, 3)).sum AS s")
      .as[Double].head() shouldBe 6.0
    spark.sql("SELECT minmax_norm(array(1, 2, 3)) AS m")
      .as[Seq[Double]].head() shouldBe Seq(0.0, 0.5, 1.0)
    // float arrays (the embeddings-at-rest type) coerce too
    spark.sql("SELECT array_stats(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT))).mean AS s")
      .as[Double].head() shouldBe 1.5
    // non-numeric arrays still rejected by the strict expression
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT array_stats(array('a', 'b'))").collect()
    }
  }
}
