package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order layout: the Morton code arithmetic and the write-side
  * clustering (range partition + within-partition sort) it feeds.
  */
class LayoutSpec extends AnyFunSuite with SparkSuite {

  test("morton code interleaves bits (known values)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 3L),
      (65535L, 0L), (0L, 65535L), (65535L, 65535L), (21845L, 0L))
      .toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y")).as("z"))
    // z(x,y): x on even bits, y on odd bits
    assert(df.as[Long].collect().toSeq === Seq(
      0L, 1L, 2L, 3L, 15L,
      0x55555555L, 0xAAAAAAAAL, 0xFFFFFFFFL, 0x11111111L))
  }

  test("quadrant locality: z-ranges of small tiles stay compact") {
    import spark.implicits._
    // all 16x16 points of the (x<16, y<16) tile fall below every point
    // of the (x>=16 or y>=16) region's interleaved high bits
    val pts = (for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorder2(col("x"), col("y")).as("z"))
    val loTileMax = pts.filter(col("x") < 16 && col("y") < 16)
      .agg(max("z")).head.getLong(0)
    val hiMin = pts.filter(col("x") >= 16 && col("y") >= 16)
      .agg(min("z")).head.getLong(0)
    assert(loTileMax < hiMin)
    assert(loTileMax === 255L) // 16x16 tile occupies exactly [0, 255]
  }

  test("clusterByZ parquet: a 2-D predicate skips row groups outside its " +
      "z-range (scan-side proof of the Layout claim)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_zskip").toString
    try {
      // `day` as a real DATE column so the predicate pushes to the parquet
      // footer stats (a cast(ts) predicate would not)
      val ev = Tables.events(spark, sf).withColumn("day", to_date(col("ts")))
      val z = Layout.zorder2(
        col("user_id").bitwiseAND(lit(0xFFFFL)),
        datediff(col("day"), to_date(lit("1970-01-01")))
          .cast("long").bitwiseAND(lit(0xFFFFL)))
      Layout.clusterByZ(ev, z, 16).write.mode("overwrite")
        .parquet(s"$dir/zorder")
      // control: identical rows and file count, hash-scattered — every
      // file spans the full (user_id, day) range, so min/max footers can
      // skip nothing and the scan must surface every row
      ev.withColumn("zval", z).repartition(16, col("event_id"))
        .write.mode("overwrite").parquet(s"$dir/shuffled")

      // rows the scan SURFACES (post row-group/page pruning, pre Filter)
      // vs rows the query returns — the gap is what the layout skipped
      def run(path: String): (Long, Long, String) = {
        val df = spark.read.parquet(path)
          .filter(col("user_id") < 4 &&
            col("day") < lit("2024-01-09").cast("date"))
        val matched = df.collect().length.toLong
        val scan = df.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }.head
        (matched, scan.metrics("numOutputRows").value, scan.toString)
      }
      val total = ev.count()
      val (nZ, scannedZ, planZ) = run(s"$dir/zorder")
      val (nS, scannedS, _) = run(s"$dir/shuffled")
      // same answer from both layouts, and the predicate actually selects
      assert(nZ === nS)
      assert(nZ > 0 && nZ < total)
      // both predicate dimensions reached the footer stats
      assert(planZ.contains("LessThan(user_id,4)"), planZ)
      assert(planZ.contains("LessThan(day,"), planZ)
      // the scattered layout surfaces everything; the z-clustered one
      // skips whole files (bound is deliberately loose — skip granularity
      // is one file, so the exact ratio moves with the file count)
      assert(scannedS === total, s"control scan surfaced $scannedS/$total")
      assert(scannedZ * 5 <= scannedS * 3,
        s"z-layout scan surfaced $scannedZ vs control $scannedS")
    } finally { // don't leak two parquet datasets per test run into /tmp
      // deepest-first walk, materialized and stream closed before any
      // delete happens (deleting under an open directory stream — and
      // leaking its fd — is what the old Files.list recursion did)
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      val paths =
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.toList
        finally walk.close()
      paths.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("clusterByZ: range partitioning, sorted partitions, disjoint ranges") {
    val ev = Tables.events(spark, sf)
    val z = Layout.zorder2(
      col("user_id").bitwiseAND(lit(0xFFFFL)),
      datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
        .cast("long").bitwiseAND(lit(0xFFFFL)))
    val clustered = Layout.clusterByZ(ev, z, 8)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") ||
      plan.contains("RangePartitioning") || plan.contains("RANGE"), plan)
    // each partition's [min,max] z-range must not overlap any other's,
    // and rows inside a partition must already be in z order
    val ranges = clustered.select("zval").rdd
      .mapPartitionsWithIndex { (i, it) =>
        val zs = it.map(_.getLong(0)).toArray
        if (zs.isEmpty) Iterator.empty
        else Iterator((i, zs.head, zs.last, zs.sameElements(zs.sorted)))
      }.collect().sortBy(_._2)
    assert(ranges.nonEmpty)
    assert(ranges.forall(_._4), "rows not sorted within a partition")
    ranges.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
