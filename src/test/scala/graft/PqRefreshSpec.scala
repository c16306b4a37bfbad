package graft

import graft.operators.{PqIndex, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ codebook refresh (VERDICT r12 #4): append under a frozen
  * codebook is correct but degrades SILENTLY as the ingest
  * distribution drifts away from the training corpus. The library now
  * ships the two missing pieces — a drift gauge
  * ([[PqIndex.quantizationError]]: mean ADC-vs-exact self-pair gap,
  * i.e. reconstruction distortion) and a retrain-and-swap maintenance
  * op ([[PqIndex.refresh]], riding the atomic swapIndexTables dance
  * under the shared build lock).
  */
class PqRefreshSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()

  /** Training population: small integer coordinates in [-11, 11]. */
  private def popA: DataFrame = {
    val sp = spark
    import sp.implicits._
    (0L until 60L).map { id =>
      (id, Some((0 until 64).map(j =>
        (((id * 31 + j * 17 + id * j) % 23) - 11).toDouble)),
        "a")
    }.toDF("vec_id", "embedding", "label")
  }

  /** Drifted population: same shape scaled + shifted far outside A's
    * coordinate range, so A-trained codewords reconstruct it poorly.
    */
  private def popB: DataFrame = {
    val sp = spark
    import sp.implicits._
    (100L until 140L).map { id =>
      (id, Some((0 until 64).map(j =>
        ((((id * 13 + j * 29) % 17) - 8) * 7 + 40).toDouble)),
        "b")
    }.toDF("vec_id", "embedding", "label")
  }

  private def drop(tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("drift raises the error gauge; refresh lowers it and equals a rebuild") {
    val t = s"pqr_p$pid"
    val t2 = s"pqr_scratch_p$pid"
    val all = Seq(t, s"${t}_cb", s"${t}_cb_compact", s"${t}_compact",
      s"${t}_old", s"${t}_cb_old", t2, s"${t2}_cb")
    drop(all: _*)
    try {
      PqIndex.write(popA, t, m = 8, subDim = 8, ks = 8)
      val e0 = PqIndex.quantizationError(spark, t, popA)
      assert(e0 >= 0.0 && e0 < 1.0, s"e0=$e0")
      // drifted batch appended under the FROZEN codebook: the gauge
      // must move — this is the signal a user refreshes on
      PqIndex.append(popB, t)
      val union = popA.unionByName(popB)
      val e1 = PqIndex.quantizationError(spark, t, union)
      assert(e1 > e0, s"drift did not register: e0=$e0 e1=$e1")

      PqIndex.refresh(union, t)
      val e2 = PqIndex.quantizationError(spark, t, union)
      assert(e2 < e1, s"refresh did not help: e1=$e1 e2=$e2")

      // deterministic training ⇒ a refreshed index is BIT-IDENTICAL
      // to a from-scratch build over the same corpus — codebook,
      // codes, and probe
      PqIndex.write(union, t2, m = 8, subDim = 8, ks = 8)
      def cbRows(x: String) = spark.table(s"${x}_cb").collect()
        .map(r => ((r.getInt(0), r.getInt(1)),
          (r.getSeq[Double](2).toSeq, r.getDouble(3)))).toMap
      assert(cbRows(t) === cbRows(t2))
      def codeRows(x: String) = spark.table(x).collect()
        .map(r => (r.getLong(0), (r.getDouble(1),
          r.getSeq[Int](2).toSeq))).toMap
      assert(codeRows(t) === codeRows(t2))
      val q = popA.filter(col("vec_id") < 3)
        .select(col("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      def probe(x: String) = PqIndex.topK(spark, x, q, k = 3).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(probe(t) === probe(t2))
      assert(probe(t).nonEmpty)
      // no maintenance leftovers under any of the swap names
      Seq(s"${t}_cb_compact", s"${t}_compact", s"${t}_old",
        s"${t}_cb_old").foreach(x =>
        assert(!spark.catalog.tableExists(x), x))
    } finally drop(all: _*)
  }

  test("a crashed refresh heals: stale tmps are rebuilt, mid-swap recovers") {
    val t = s"pqr_crash_p$pid"
    val all = Seq(t, s"${t}_cb", s"${t}_cb_compact", s"${t}_compact",
      s"${t}_old", s"${t}_cb_old")
    drop(all: _*)
    try {
      val union = popA.unionByName(popB)
      PqIndex.write(popA, t, m = 8, subDim = 8, ks = 8)
      PqIndex.append(popB, t)
      // crash state 1: died after training the replacement codebook —
      // stale tmp tables must not poison the re-run
      spark.table(s"${t}_cb").write
        .saveAsTable(s"${t}_cb_compact")
      PqIndex.refresh(union, t)
      assert(!spark.catalog.tableExists(s"${t}_cb_compact"))
      val healthy = PqIndex.quantizationError(spark, t, union)
      // crash state 2: died between the codes-swap renames — the codes
      // table name unbound, the fresh copy stranded under _compact;
      // the next refresh's recoverSwap must restore it
      spark.sql(s"ALTER TABLE $t RENAME TO ${t}_compact")
      PqIndex.refresh(union, t)
      assert(spark.catalog.tableExists(t))
      // tolerance, not ===: the gauge is an avg over doubles, whose
      // partition-combine order varies run to run
      assert(math.abs(PqIndex.quantizationError(spark, t, union) - healthy)
        < 1e-9)
    } finally drop(all: _*)
  }
}
