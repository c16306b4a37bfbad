package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rank.rangeRanked / Rank.ntileFromRank (Core.scala) — the scale-safe
  * replacements for per-group single-task rank windows in the exact
  * percentile/ntile family. The property the whole construction rests
  * on: ranks computed from range shards + monotonically_increasing_id
  * offsets must equal `row_number().over(partitionBy(g).orderBy(...))`
  * exactly, for any grouping/tie structure — including the contiguity
  * of the id's low bits within a partition, which is an implementation
  * detail of MonotonicallyIncreasingID this test pins.
  */
class RangeRankSpec extends AnyFunSuite with SparkSuite {

  private def frame(rows: Seq[(String, Long, Long)]) = {
    val sp = spark
    import sp.implicits._
    // partitioning chosen adversarially: many input partitions, so the
    // range exchange actually redistributes
    rows.toDF("g", "v", "id").repartition(7)
  }

  private def collected(df: org.apache.spark.sql.DataFrame) =
    df.select(col("g"), col("id"), col("rn").cast("long"),
        col("n").cast("long"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

  private def windowForm(rows: Seq[(String, Long, Long)]) = {
    val w = Window.partitionBy("g").orderBy("v", "id")
    collected(frame(rows)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g"))))
  }

  // target the SCALE regime explicitly: the public rangeRanked would
  // dispatch these tiny frames to the window form (r12 two-regime
  // dispatch) and the property gate would compare window against itself
  private def rangeForm(rows: Seq[(String, Long, Long)]) =
    collected(Rank.rangeSharded(frame(rows), "g", Seq("v", "id")))

  test("property: rangeRanked equals the window form on random frames") {
    import org.scalacheck.Gen
    val rowGen = for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(0L, 5L) // narrow: force cross-partition ties
    } yield (g, v)
    val gen = Gen.chooseNum(1, 120).flatMap(k => Gen.listOfN(k, rowGen))
    (0 until 5).foreach { i =>
      val rows = gen.pureApply(org.scalacheck.Gen.Parameters.default,
          org.scalacheck.rng.Seed(0xaa9cL + i))
        .zipWithIndex.map { case ((g, v), idx) => (g, v, idx.toLong) }
      assert(rangeForm(rows) === windowForm(rows), s"seed offset $i")
    }
  }

  test("empty and single-row groups") {
    assert(rangeForm(Nil) === Map.empty)
    val one = Seq(("a", 1L, 0L), ("b", 9L, 1L))
    assert(rangeForm(one) === windowForm(one))
  }

  test("NULL group ranks as its own group, not silently dropped") {
    // the join inside rangeRanked is null-safe on the group key —
    // a plain equi-join would lose these rows where the window form
    // keeps them as a partition of their own
    val rows = Seq(("a", 1L, 0L), (null, 5L, 1L), (null, 2L, 2L),
      ("a", 3L, 3L))
    assert(rangeForm(rows) === windowForm(rows))
    assert(rangeForm(rows).size === 4)
  }

  test("property: ntileFromRank equals the built-in ntile") {
    val sp = spark
    import sp.implicits._
    // every (n, k) regime: n < k, n = k, n not divisible by k, n >> k
    for (n <- Seq(1, 3, 10, 17, 64); k <- Seq(2, 10)) {
      val df = (1 to n).map(i => (1, i.toLong)).toDF("g", "id")
      val w = Window.partitionBy("g").orderBy("id")
      val got = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
        .withColumn("builtin", ntile(k).over(w).cast("long"))
        .withColumn("closed",
          Rank.ntileFromRank(k, col("rn"), col("n")))
        .select("id", "builtin", "closed").collect()
      got.foreach { r =>
        assert(r.getLong(1) === r.getLong(2), s"n=$n k=$k id=${r.getLong(0)}")
      }
    }
  }

  test("two-regime dispatch: window under the threshold, regimes agree") {
    // a tiny input must dispatch to the window form — no range
    // repartition anywhere in its plan
    val tiny = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
    assert(tiny.queryExecution.optimizedPlan.stats.sizeInBytes
      <= Rank.WindowRegimeMaxBytes)
    val viaDispatch = Rank.rangeRanked(tiny, "l_returnflag",
      Seq("l_extendedprice"))
    assert(!viaDispatch.queryExecution.executedPlan.toString
      .contains("rangepartitioning"))
    // and both regimes produce identical (rn, n) on the same data
    val rows = Seq(("a", 1L, 0L), ("a", 1L, 1L), ("b", 5L, 2L),
      ("a", 0L, 3L), (null, 2L, 4L))
    val win = collected(
      Rank.windowRanked(frame(rows), "g", Seq("v", "id")))
    assert(rangeForm(rows) === win)
  }

  test("rangeSharded refuses to run with exchange reuse disabled") {
    val s = spark.newSession()
    s.conf.set("spark.sql.exchange.reuse", "false")
    val df = s.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val e = intercept[IllegalArgumentException] {
      Rank.rangeSharded(df, "l_returnflag", Seq("l_extendedprice"))
    }
    assert(e.getMessage.contains("exchange.reuse"))
  }

  test("plan: no per-group rank window on the big path, exchange reused") {
    val ranked = Rank.rangeSharded(
      spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_returnflag"), col("l_extendedprice")),
      "l_returnflag", Seq("l_extendedprice"))
    ranked.collect() // materialize so AQE finalizes the plan
    // final adaptive plan only (the "Initial Plan" tail re-prints the
    // pre-reuse shape and would double-count exchanges)
    val p = ranked.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the ONE full-row exchange is the range repartition, defined once
    // (the ReusedExchange line re-prints the reused node's description,
    // so count defining lines only)
    assert(p.linesIterator.count(l => l.contains("Exchange rangepartitioning")
      && !l.contains("ReusedExchange")) === 1, p)
    // …and the slices branch REUSES it instead of rescanning the source
    assert(p.contains("ReusedExchange"), p)
    // the per-row rank is pure arithmetic off monotonically_increasing_
    // id — NO row_number window anywhere (the single-task-per-group
    // shape this machinery exists to kill); the only Window nodes ride
    // on the tiny (_pid, group) slices aggregate (sum over _cnt)
    assert(!p.contains("row_number"), p)
    p.linesIterator.filter(_.contains("windowspecdefinition")).foreach {
      l => assert(l.contains("_cnt"), l)
    }
  }
}
