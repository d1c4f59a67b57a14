package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The write-time layout contracts: bucketed joins run exchange-free and
  * partition filters prune directories at planning time.
  */
class StorageLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join with no exchange on either side") {
    val work = Files.createTempDirectory("bucketed").toFile
    try {
      val facts = (0L until 1000L).map(i => (i % 50, i, s"f$i"))
        .toDF("key", "fact_id", "payload")
      val dims = (0L until 50L).map(i => (i, s"d$i")).toDF("key", "dim")
      StorageLayout.writeBucketed(facts, "bk_facts",
        s"${work.getAbsolutePath}/facts", "key", 4)
      StorageLayout.writeBucketed(dims, "bk_dims",
        s"${work.getAbsolutePath}/dims", "key", 4)
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        // force the big-big join shape (broadcast would mask the exchange)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = spark.table("bk_facts").join(spark.table("bk_dims"), "key")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
        assert(joined.count() == 1000L)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_facts")
      spark.sql("DROP TABLE IF EXISTS bk_dims")
      org.apache.commons.io.FileUtils.deleteQuietly(work)
    }
  }

  test("a filter on the partition key prunes directories, not just rows") {
    val work = Files.createTempDirectory("partitioned").toFile
    try {
      val events = (0L until 1000L).map(i =>
        (i, Seq("click", "view", "purchase", "error")(i.toInt % 4), i * 1.5))
        .toDF("event_id", "event_type", "value")
      val path = s"${work.getAbsolutePath}/events"
      StorageLayout.writePartitioned(events, path, "event_type")
      val q = spark.read.parquet(path).filter($"event_type" === "click")
      val scan = q.queryExecution.executedPlan.toString
      // the predicate must appear as a PARTITION filter (planning-time
      // directory pruning), not only as a post-scan data filter
      assert(scan.contains("PartitionFilters") &&
        scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
          .contains("event_type"), scan)
      assert(q.count() == 250L)
      // and the scan really touched only the one directory
      val files = q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }
      val allFiles = spark.read.parquet(path).queryExecution.executedPlan
        .collectLeaves().collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.totalNumberOfFiles
        }
      assert(files.get < allFiles.get, s"read ${files.get} of ${allFiles.get} files")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(work)
  }
}
