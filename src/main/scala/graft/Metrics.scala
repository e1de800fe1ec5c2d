package graft

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY.md G4/G11: evaluation metrics.
  *
  * Log-loss matches sklearn.metrics.log_loss (main.py:307-308): mean of
  * -(y·ln p̂ + (1-y)·ln(1-p̂)) with p̂ clipped to [eps, 1-eps], eps=1e-15.
  */
object Metrics {
  val Eps = 1e-15

  def clipProb(p: Column): Column =
    greatest(lit(Eps), least(lit(1.0 - Eps), p))

  /** Per-row log-loss term — codegen'd builtin combo. */
  def logLossTerm(y: Column, p: Column): Column = {
    val pc = clipProb(p)
    -(y * log(pc) + (lit(1.0) - y) * log(lit(1.0) - pc))
  }

  /** Aggregate log-loss as a builtin combo (preferred in plans). */
  def logLoss(y: Column, p: Column): Column = avg(logLossTerm(y, p))

  /** G11 accuracy at threshold 0.5. */
  def accuracy(y: Column, p: Column): Column =
    avg(when((p >= 0.5) === (y >= 0.5), 1.0).otherwise(0.0))

  /** Showcase typed Aggregator surface (SURVEY.md §2.10) — identical math
    * to [[logLoss]]; registrable via spark.udf.register("log_loss", udaf(...)). */
  object LogLossAggregator extends Aggregator[(Double, Double), (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: (Double, Double)): (Double, Long) = {
      val (y, p) = a
      val pc = math.max(Eps, math.min(1.0 - Eps, p))
      (b._1 - (y * math.log(pc) + (1 - y) * math.log(1 - pc)), b._2 + 1)
    }
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) = (x._1 + y._1, x._2 + y._2)
    def finish(b: (Double, Long)): Double = if (b._2 == 0) 0.0 else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
