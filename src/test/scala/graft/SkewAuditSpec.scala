package graft

import graft.operators.Skew
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPT-IN skew audit (r19, VERDICT r18 #3): q_salted_agg and the AQE
  * skew-join path are oracle-green on UNIFORM TPC-H-shaped testdata —
  * this audit exercises them on an ADVERSARIAL hot-key corpus (one key
  * owns half the rows — the "one giant tenant" of optimization guide
  * §2.5) and proves the two load-bearing claims:
  *   1. the salted two-phase aggregate is VALUE-identical to the naive
  *      aggregate on skewed data (the only claim a result gate can
  *      make — for algebraic sums Spark's map-side partial aggregation
  *      already collapses a hot key to one row per map task, so
  *      salting is insurance for partial-agg-ineffective shapes, not a
  *      local-mode speedup; the audit PRINTS both times rather than
  *      asserting an inequality that machine load would flake);
  *   2. AQE's skew-join handling actually fires on a skewed
  *      sort-merge join at thresholds scaled to the fixture (the
  *      executed plan carries the skew-split AQEShuffleRead) and
  *      leaves the join result identical to the unsplit run.
  * The fixture is GENERATED deterministically in Spark (no RNG, no
  * files): key 0 takes every even id (~50% of rows), odd ids spread
  * over ~100k keys via xxhash64 — guide §2.5's deterministic-synthetic-
  * key discipline. Values are integer-valued doubles (≤ 96), so sums
  * are exact in any accumulation order and naive-vs-salted equality is
  * bit-testable. Run with GRAFT_SCALE_AUDIT=1; under plain `sbt test`
  * the suite cancels (multi-million-row shuffles don't belong in every
  * CI pass).
  */
class SkewAuditSpec extends AnyFunSuite with SparkSuite {

  private val N = 4000000L

  /** ~50% of rows on key 0, the rest ~uniform over 100k keys. */
  private def skewed(n: Long): DataFrame =
    spark.range(n).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(100000L))).as("k"),
      (col("id") % 97).cast("double").as("v"),
      // a fat HIGH-ENTROPY payload so the hot partition is skewed in
      // (compressed) BYTES, not just rows — AQE's split decision is
      // byte-based and shuffle blocks are lz4-compressed, so a
      // low-entropy payload would compress under the skew threshold
      md5(col("id").cast("string")).as("payload"))

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  test("salted two-phase aggregation equals the naive aggregate on a " +
      "hot-key corpus (audit — prints seconds, gates value equality)") {
    assume(sys.env.contains("GRAFT_SCALE_AUDIT"),
      "opt-in audit: set GRAFT_SCALE_AUDIT=1")
    val df = skewed(N).select("k", "v")
    def naive() = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
    def salted() = Skew.saltedAgg(df, Seq("k"), salts = 8,
      Seq("sum_v" -> col("v")))
    def collectMap(r: DataFrame) = r.collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    // value gate: identical (k → (n, sum)) maps — exact, because v is
    // an integer-valued double far below 2^53
    val nv = collectMap(naive().select("k", "n", "sum_v"))
    val sv = collectMap(salted().select("k", "n", "sum_v"))
    assert(nv.size === sv.size)
    assert(nv === sv)
    // the hot key really is ≥ half the corpus (every even id, plus the
    // ~N/2/100k odd ids whose hash lands on 0)
    assert(nv(0L)._1 >= N / 2)
    // timing evidence for SCALE_SF1.md (min-of-3, interleaved)
    def noop(d: DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    val (ns, ss) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to 3).foreach { _ =>
      ns += timed(noop(naive()))._2
      ss += timed(noop(salted()))._2
    }
    info(f"SKEW-AUDIT agg: naive min ${ns.result().min}%.2f s, " +
      f"salted min ${ss.result().min}%.2f s over $N rows, hot key = 50%%")
  }

  test("AQE splits the skewed sort-merge join partition and the result " +
      "is identical to the unsplit run (audit)") {
    assume(sys.env.contains("GRAFT_SCALE_AUDIT"),
      "opt-in audit: set GRAFT_SCALE_AUDIT=1")
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> conf.getOption(k))
    try {
      // the shared test session runs 4 shuffle partitions — at 4 the
      // hot partition is under the 5× skewedPartitionFactor against the
      // median; 32 partitions give the cluster-shaped skew profile
      // (hot ≈ 20× median) the detector is built for
      conf.set("spark.sql.shuffle.partitions", "32")
      // force the shuffle join (the dim would broadcast at 100k rows)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // scale the skew thresholds to the fixture: the hot partition is
      // ~10^2 MB against a ~MB median — split target a few MB
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "4m")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      val fact = skewed(N)
      val sp2 = spark
      import sp2.implicits._
      val dim = (0L until 100000L).toDF("k")
        .withColumn("attr", pmod(col("k"), lit(7)))
      // the aggregate reads the payload so column pruning cannot drop
      // it below the join — the fact side must shuffle the fat rows
      def joined() = fact.join(dim, "k")
        .groupBy("attr").agg(count(lit(1)).as("n"),
          sum(length(col("payload"))).as("bytes"))
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val (plain, tOff) = timed(joined().collect().sortBy(_.getLong(0)))
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val q = joined()
      val (split, tOn) = timed(q.collect().sortBy(_.getLong(0)))
      assert(plain.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        split.map(r => (r.getLong(0), r.getLong(1))).toSeq)
      // the executed (final adaptive) plan must carry the skew split
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skewed"),
        s"no skew-split AQEShuffleRead in the final plan:\n$plan")
      info(f"SKEW-AUDIT join: skewJoin off ${tOff}%.2f s, " +
        f"on ${tOn}%.2f s ($N-row fact, 50%% hot key, SMJ forced)")
    } finally saved.foreach { case (k, v) =>
      v match {
        case Some(x) => conf.set(k, x)
        case None => conf.unset(k)
      }
    }
  }
}
