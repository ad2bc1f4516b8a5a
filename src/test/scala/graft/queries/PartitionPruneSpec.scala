package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Partition pruning executed, not asserted: a date-partitioned
  * events table queried for one day must read ONLY that day's
  * directory — the layout discipline that turns a 100 TB time-range
  * scan into a per-day scan. The physical plan must carry the
  * predicate as a PartitionFilter (not a post-scan filter), and the
  * scan's input files must all come from the selected partition. */
class PartitionPruneSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("a day-partitioned store prunes to the queried day at plan " +
      "time (PartitionFilters carries the predicate)") {
    val dir = Files.createTempDirectory("events-bydate").toFile
      .getAbsolutePath + "/events"
    Tables(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val days = spark.read.parquet(dir).select(col("day")).distinct()
      .orderBy(col("day")).collect().map(_.getDate(0))
    assert(days.length > 1, "fixture must span multiple days")
    val pick = days(days.length / 2)

    val q = spark.read.parquet(dir)
      .filter(col("day") === lit(pick))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString

    // the day predicate is a PARTITION filter — evaluated against
    // directory names at planning, never against row data
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("day"),
      s"day must prune as a partition filter:\n$plan")
    // and the scan actually selected exactly ONE partition directory
    // out of the many on disk, with its files scoped to that day
    val scans = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    scans.foreach { f =>
      assert(f.selectedPartitions.partitionCount === 1,
        s"scan must prune to 1 of ${days.length} day partitions, " +
          s"got ${f.selectedPartitions.partitionCount}")
      val paths = f.selectedPartitions.toPartitionArray
        .map(_.filePath.toString)
      assert(paths.nonEmpty && paths.forall(_.contains(s"day=$pick")),
        s"scan must touch only day=$pick: ${paths.take(3).mkString(",")}")
    }
    // correctness: equals the unpartitioned filter
    val expect = Tables(spark, "/root/testdata/sf0.001", "events")
      .filter(to_date(col("ts")) === lit(pick))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    assert(q.collect().map(_.toSeq).toSet ===
      expect.collect().map(_.toSeq).toSet)
  }
}
