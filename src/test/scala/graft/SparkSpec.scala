package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** One shared local session for the whole test run (suites run
  * sequentially in the forked JVM; spinning a session per suite would
  * dominate test time). Config mirrors Verify.scala so tests see the
  * same semantics the correctness gate sees. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "target/tmp/test-warehouse")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Base trait: session + helpers for single-column expression checks. */
trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  /** Evaluate a Column expression over a one-row DataFrame holding `arr`
    * in column "a"; returns the single result value. */
  def evalOnArray(arr: Seq[Double], c: Column => Column): Any = {
    val df = Seq(Tuple1(arr)).toDF("a")
    df.select(c(df("a")).as("r")).collect()(0).get(0)
  }

  def evalOnArrays(a: Seq[Double], b: Seq[Double], c: (Column, Column) => Column): Any = {
    val df = Seq((a, b)).toDF("a", "b")
    df.select(c(df("a"), df("b")).as("r")).collect()(0).get(0)
  }

  def asDoubles(v: Any): Seq[Double] = v match {
    // Spark hands back mutable.ArraySeq, which is not the 2.13 immutable
    // Seq alias — match the collection root and convert.
    case s: scala.collection.Seq[_] =>
      s.toSeq.map(x => x.asInstanceOf[Number].doubleValue())
    case other => fail(s"expected array result, got $other")
  }

  def approx(a: Double, b: Double, eps: Double = 1e-9): Unit =
    math.abs(a - b) should be < eps
}
