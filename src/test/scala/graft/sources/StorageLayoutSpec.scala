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

  test("the driver q_bucketed_join path joins the REAL tables exchange-free") {
    val work = Files.createTempDirectory("bucketed_driver").toFile
    val run = java.util.UUID.randomUUID().toString.take(8)
    val (ot, ct) = (s"spec_bk_orders_$run", s"spec_bk_cust_$run")
    try {
      StorageLayout.writeBucketed(
        Tables.orders(spark, sf0001).select($"o_custkey", $"o_totalprice"),
        ot, s"${work.getAbsolutePath}/o", "o_custkey", graft.operators.BucketedJoin.Buckets)
      StorageLayout.writeBucketed(
        Tables.customer(spark, sf0001).select($"c_custkey", $"c_mktsegment"),
        ct, s"${work.getAbsolutePath}/c", "c_custkey", graft.operators.BucketedJoin.Buckets)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = graft.operators.BucketedJoin.joinBucketed(spark, ot, ct)
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
        assert(joined.count() == Tables.orders(spark, sf0001).count())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ot")
      spark.sql(s"DROP TABLE IF EXISTS $ct")
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

  test("zValue interleaves bits (driver-model agreement) and orders locally") {
    def model(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L), (12345L, 54321L))
    val got = rows.toDF("a", "b")
      .select(StorageLayout.zValue($"a", $"b").as("z")).as[Long].collect().toSeq
    assert(got == rows.map { case (a, b) => model(a, b, 16) })
  }

  test("zValue is non-negative for IntegerType inputs with bit 15 set (no int sign-bit leak)") {
    // bit 15 of b maps to position 31 — in int arithmetic that is the sign
    // bit; the long widening must happen BEFORE the shift
    val got = Seq((40000, 40000), (0, 32768), (65535, 65535))
      .toDF("a", "b")
      .select(StorageLayout.zValue($"a", $"b").as("z")).as[Long].collect().toSeq
    assert(got.forall(_ >= 0L), got.toString)
    def model(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    assert(got == Seq(model(40000, 40000), model(0, 32768), model(65535, 65535)))
  }

  test("n-dim zValue round-robin interleave matches the driver model and bounds its width") {
    def model(vals: Seq[Long], bits: Int): Long =
      (for { i <- 0 until bits; j <- vals.indices } yield
        ((vals(j) >> i) & 1L) << (i * vals.length + j)).sum
    val rows = Seq((0L, 0L, 0L), (1L, 2L, 4L), (7L, 7L, 7L), (15L, 0L, 9L), (1048575L, 524288L, 262144L))
    val got = rows.toDF("a", "b", "c")
      .select(StorageLayout.zValue(Seq($"a", $"b", $"c"), 20).as("z"))
      .as[Long].collect().toSeq
    assert(got == rows.map { case (a, b, c) => model(Seq(a, b, c), 20) })
    assert(got.forall(_ >= 0L))
    // the 2-arg form is the n=2 instance of the same layout
    val two = Seq((3L, 5L)).toDF("a", "b")
      .select(StorageLayout.zValue(Seq($"a", $"b"), 16).as("z")).as[Long].head()
    assert(two == model(Seq(3L, 5L), 16))
    // widths that overflow a long's 63 value bits are rejected at plan time
    intercept[IllegalArgumentException] {
      StorageLayout.zValue(Seq($"a", $"b", $"c"), 22)
    }
    intercept[IllegalArgumentException] { StorageLayout.zValue(Seq($"a"), 16) }
  }

  test("3-dim z-order: a 3-dim box predicate overlaps fewer file envelopes than a linear sort") {
    val work = Files.createTempDirectory("zorder3").toFile
    try {
      // 16 x 16 x 16 grid, one row per cell
      val grid = (for (x <- 0L until 16L; y <- 0L until 16L; z <- 0L until 16L)
        yield (x, y, z)).toDF("x", "y", "z")
      val zPath = s"${work.getAbsolutePath}/z3"
      val linPath = s"${work.getAbsolutePath}/lin3"
      StorageLayout.writeZOrdered(grid, zPath, Seq("x", "y", "z"), files = 64, bits = 4)
      // linear baseline: lexicographic (x, y, z) — only 16 distinct x values,
      // so ranging on x alone could fill at most 16 files
      grid.repartitionByRange(64, $"x", $"y", $"z")
        .sortWithinPartitions($"x", $"y", $"z")
        .write.mode("overwrite").parquet(linPath)
      def overlapping(path: String): (Long, Long) = {
        val stats = spark.read.parquet(path)
          .select(input_file_name().as("f"), $"x", $"y", $"z")
          .groupBy($"f")
          .agg(min($"x").as("xmin"), max($"x").as("xmax"),
            min($"y").as("ymin"), max($"y").as("ymax"),
            min($"z").as("zmin"), max($"z").as("zmax"))
        val total = stats.count()
        // an 8x8x8 box = 1/8 of the grid
        val hit = stats.filter($"xmax" >= 4 && $"xmin" <= 11 &&
          $"ymax" >= 4 && $"ymin" <= 11 && $"zmax" >= 4 && $"zmin" <= 11).count()
        (hit, total)
      }
      val (zHit, zTotal) = overlapping(zPath)
      val (linHit, linTotal) = overlapping(linPath)
      assert(zTotal == 64 && linTotal == 64)
      // linear-by-x files each span all of (y, z): pruning is x-only. The
      // z-ordered files cover 3-dim sub-boxes, so the box touches fewer.
      assert(zHit < linHit, s"z=$zHit lin=$linHit")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(work)
  }

  test("z-order clustering: a 2-dim box predicate overlaps far fewer file envelopes than a linear sort") {
    val work = Files.createTempDirectory("zorder").toFile
    try {
      // 64 x 64 grid, one row per cell — both dims uniform
      val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
        .toDF("x", "y")
      val zPath = s"${work.getAbsolutePath}/z"
      val linPath = s"${work.getAbsolutePath}/lin"
      StorageLayout.writeZOrdered(grid, zPath, "x", "y", files = 64, bits = 6)
      // linear baseline: same file count, sorted by x only
      grid.repartitionByRange(64, $"x").sortWithinPartitions($"x")
        .write.mode("overwrite").parquet(linPath)

      // per-file (min,max) envelopes on both dims — what file/row-group
      // min-max skipping consumes
      def overlapping(path: String, box: (Long, Long, Long, Long)): (Long, Long) = {
        val (x0, x1, y0, y1) = box
        val stats = spark.read.parquet(path)
          .select(input_file_name().as("f"), $"x", $"y")
          .groupBy($"f")
          .agg(min($"x").as("xmin"), max($"x").as("xmax"),
            min($"y").as("ymin"), max($"y").as("ymax"))
        val total = stats.count()
        val hit = stats.filter($"xmax" >= x0 && $"xmin" <= x1 &&
          $"ymax" >= y0 && $"ymin" <= y1).count()
        (hit, total)
      }
      // a 16x16 box = 1/16 of the grid
      val box = (8L, 23L, 8L, 23L)
      val (zHit, zTotal) = overlapping(zPath, box)
      val (linHit, linTotal) = overlapping(linPath, box)
      assert(zTotal == 64 && linTotal == 64)
      // linear-by-x: every file spans all of y, so pruning is x-only (the
      // box's 1/4 x-range = ~16 of 64 slab files); z-order files cover
      // 8x8 hyper-rectangles, so the 16x16 box touches ~2x2 of them
      assert(zHit < linHit, s"z=$zHit lin=$linHit")
      assert(zHit <= linHit / 2, s"z=$zHit not even 2x better than lin=$linHit")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(work)
  }
}
