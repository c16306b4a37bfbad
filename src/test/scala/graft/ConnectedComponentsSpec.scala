package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Direct tests of the min-label-propagation CC loop behind
  * q_dedup_clusters. The oracle-checked corpus only produces cliquish
  * clusters (fixpoint at round 0), so the multi-round path — the
  * paired-sum convergence witness actually iterating — needs graphs the
  * corpus doesn't exhibit.
  */
class ConnectedComponentsSpec extends AnyFunSuite with SparkSuite {

  private def cc(pairs: Seq[(Long, Long)],
      doubling: Boolean = false): Map[Long, Long] = {
    import spark.implicits._
    val edges = pairs.toDF("a_id", "b_id").repartition(1).persist()
    try {
      val labels = TextOps.connectedComponents(spark, edges,
        Some(doubling))
      // returned frame is a self-contained localCheckpoint (contract):
      // its blocks are GC-released once this reference drops
      labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally edges.unpersist()
  }

  test("path graph (diameter 5) converges to the global min label") {
    // forces several propagation rounds: init labels are each node's
    // 1-hop min, so node 5 takes 5 rounds to learn about node 0
    val labels = cc(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(labels === (0L to 5L).map(_ -> 0L).toMap)
  }

  test("pointer-doubling flag: diameter-5 path reaches the same labels") {
    // VERDICT r09 #5: the O(log d) variant must agree with the default
    // O(d) propagation on a graph that actually iterates — a path of
    // diameter 5 needs several rounds either way, and the doubling hop
    // (lbl ← min(lbl, lbl(lbl))) is exercised on every one of them
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val expect = (0L to 5L).map(_ -> 0L).toMap
    assert(cc(path, doubling = true) === expect)
    assert(cc(path, doubling = true) === cc(path))
  }

  test("pointer-doubling flag: disjoint components stay separate") {
    val labels = cc(Seq(
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L),
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L)), doubling = true)
    assert(labels === Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L, 34L -> 30L))
  }

  test("disjoint components keep separate canonical ids") {
    val labels = cc(Seq(
      (10L, 11L), (11L, 12L), (10L, 12L), // clique
      (20L, 21L),                         // pair
      (30L, 31L), (31L, 32L)))            // path
    assert(labels === Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L))
  }

  test("empty edge list yields an empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("edge checkpoint blocks are freed; result survives clearCache") {
    // ADVICE r08: the pinned edge list must not accumulate storage
    // blocks across reps — exactly ONE persistent RDD may outlive the
    // call (the returned frame's own label-sized checkpoint), and the
    // result must stay readable after a cache clear (self-contained)
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (5L, 6L))
      .toDF("a_id", "b_id").repartition(1)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val labels = TextOps.connectedComponents(spark, edges)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size === 1, s"leaked persistent RDDs: $added")
    spark.catalog.clearCache()
    assert(labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 5L))
  }

  test("property: random graphs match a driver-side union-find") {
    // the fused Observation witness is this round's semantic change —
    // exercise it on random multi-component graphs (self-loops, dup
    // edges, chains) against an independent union-find oracle. Seeded:
    // a failure must reproduce on re-run. Spark jobs per sample are
    // expensive, so a handful of samples like PropertiesSpec.
    import org.scalacheck.Gen
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 11L)
      b <- Gen.chooseNum(0L, 11L)
    } yield (a, b)
    val graphGen = Gen.listOfN(10, edgeGen)
    (0 until 6).foreach { i =>
      val pairs = graphGen.pureApply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(0xccccL + i))
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
      }
      // canonical = min reachable id: route every root to the min of
      // its component members
      val members = parent.keys.toSeq.groupBy(find)
      val expect = members.flatMap { case (_, ms) =>
        val m = ms.min; ms.map(_ -> m)
      }
      assert(cc(pairs) === expect, s"seed offset $i pairs=$pairs")
    }
  }

  test("data-derived regime (r17): above the edge threshold the loop " +
      "parallelizes and labels match the small regime exactly") {
    import spark.implicits._
    // the regime decision is pure and spec-checkable
    assert(TextOps.ccPlan(50L) === ((true, 1)))
    assert(TextOps.ccPlan(TextOps.CcSmallGraphMaxEdges) === ((true, 1)))
    assert(TextOps.ccPlan(900L, smallMax = 100L) === ((false, 2)))
    assert(TextOps.ccPlan(10000000L) === ((false, 20)))
    assert(TextOps.ccPlan(1000L * 1000L * 1000L * 10L)._2 === 4096)
    // three 300-edge chains: diameter large enough that the large
    // regime's pointer-doubling default matters, small enough to run
    val pairs = (0 until 3).flatMap { c =>
      val base = c * 10000L
      (0L until 300L).map(i => (base + i, base + i + 1))
    }
    val edges = pairs.toDF("a_id", "b_id")
    val large = TextOps.connectedComponents(spark, edges,
      smallGraphMaxEdges = 100L)
    assert(large.rdd.getNumPartitions > 1,
      s"large regime ran on ${large.rdd.getNumPartitions} partition(s)")
    val largeMap = large.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical labels from the single-partition regime (doubling
    // pinned on both sides so the comparison is regime-only)
    val smallMap = TextOps.connectedComponents(spark, edges,
        pointerDoubling = Some(true),
        smallGraphMaxEdges = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(largeMap === smallMap)
    val expect = (0 until 3).flatMap { c =>
      val base = c * 10000L
      (0L to 300L).map(i => (base + i) -> base)
    }.toMap
    assert(largeMap === expect)
  }

  test("loop-scoped conf is restored on the session") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    val codegen = spark.conf.get("spark.sql.codegen.wholeStage")
    cc(Seq((1L, 2L)))
    assert(spark.conf.get("spark.sql.adaptive.enabled") === aqe)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === parts)
    assert(spark.conf.get("spark.sql.codegen.wholeStage") === codegen)
  }
}
