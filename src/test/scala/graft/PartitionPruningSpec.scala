package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partition-layout mechanics for the 100 TB story: a date-partitioned
  * parquet write must prune to the matching directories at read time
  * (PartitionFilters in the scan, not a post-scan filter). */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write + filter prunes partitions in the scan") {
    val dir = Files.createTempDirectory("part").toFile.getAbsolutePath + "/orders_by_year"
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("y", year(col("o_orderdate")))
    ord.write.partitionBy("y").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("y") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    withClue(plan) {
      plan should include("PartitionFilters")
      // the partition predicate must be in the scan's PartitionFilters,
      // not evaluated as a row-level Filter afterwards
      "PartitionFilters: \\[[^\\]]*1995".r.findFirstIn(plan) should not be empty
    }
    // result parity with an unpartitioned filter
    val expected = ord.filter(col("y") === 1995).count()
    pruned.count() shouldBe expected
    expected should be > 0L

    // only the y=1995 directory is listed as input
    val inputs = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator.filter(_.contains("Location")))
    val files = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("y="))
    files.length should be > 1 // several year partitions exist on disk
  }
}
