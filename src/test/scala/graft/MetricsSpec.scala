package graft

import org.apache.spark.sql.functions._

/** G4/G11 metric fixtures (FIXTURES.md §3): closed-form log-loss, clip
  * behavior, accuracy, and builtin-combo vs Aggregator parity. */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("log-loss closed form: y=[1,0], p=[0.9,0.1] -> -(ln .9 + ln .9)/2") {
    val df = Seq((1.0, 0.9), (0.0, 0.1)).toDF("y", "p")
    val got = df.agg(Metrics.logLoss(col("y"), col("p"))).as[Double].head()
    approx(got, -(math.log(0.9) + math.log(0.9)) / 2)
  }

  test("log-loss clips p to [eps, 1-eps] — no infinities on p=0/1") {
    val df = Seq((1.0, 0.0), (0.0, 1.0)).toDF("y", "p")
    val got = df.agg(Metrics.logLoss(col("y"), col("p"))).as[Double].head()
    got.isInfinity shouldBe false
    approx(got, -math.log(Metrics.Eps), 1e-3)
  }

  test("Aggregator matches builtin-combo log-loss") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(100)((if (rnd.nextBoolean()) 1.0 else 0.0, rnd.nextDouble()))
    val df = rows.toDF("y", "p")
    val combo = df.agg(Metrics.logLoss(col("y"), col("p"))).as[Double].head()
    val agg = df.as[(Double, Double)]
      .select(Metrics.LogLossAggregator.toColumn).head()
    approx(combo, agg, 1e-12)
  }

  test("accuracy at threshold 0.5") {
    val df = Seq((1.0, 0.9), (1.0, 0.2), (0.0, 0.4), (0.0, 0.7)).toDF("y", "p")
    df.agg(Metrics.accuracy(col("y"), col("p"))).as[Double].head() shouldBe 0.5
  }
}
