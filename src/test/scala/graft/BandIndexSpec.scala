package graft

import graft.operators.{TextOps, TrainingData}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stored bucketed band index (VERDICT r08 #3): writeBandIndex
  * materializes the corpus's (band_key, old_id, old_toks) rows bucketed
  * on the join key, so the incremental new-vs-corpus join shuffles ONLY
  * the new batch — the corpus side is a plain bucketed scan with no
  * Exchange. Results must equal q_dedup_incremental's self-contained
  * recompute form exactly (same pairs, same jaccard doubles).
  */
class BandIndexSpec extends AnyFunSuite with SparkSuite {

  private val table = "band_idx_spec"
  private val bound = TrainingData.TrainBoundary
  private def bucket = TrainingData.hashPrefixOf(col("doc_id"), 2)
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def pairs(df: DataFrame): Seq[(Long, Long, Double)] =
    df.select("new_id", "old_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case other => other
  }

  test("index join matches q_dedup_incremental exactly") {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      TextOps.writeBandIndex(docs.filter(bucket < bound), table)
      val viaIndex = pairs(TextOps.nearDupsAgainstIndex(
        docs.filter(bucket >= bound), spark.table(table)))
      val selfContained =
        pairs(SparkEntry.queries("q_dedup_incremental")(spark, sf))
      assert(viaIndex === selfContained)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("append-built index equals a from-scratch build (r12)") {
    val t2 = table + "_app"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS $t2")
    try {
      val old = docs.filter(bucket < bound)
      TextOps.writeBandIndex(old, table)
      // grown by two parity-split appends — band rows are doc-local, so
      // append-only maintenance must lose/alter nothing
      TextOps.appendBandIndex(
        old.filter(pmod(col("doc_id"), lit(2)) === 0), t2)
      TextOps.appendBandIndex(
        old.filter(pmod(col("doc_id"), lit(2)) === 1), t2)
      def rows(t: String) = spark.table(t)
        .select(col("band_key"), col("old_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(rows(t2) === rows(table))
      // and the probe through the appended index yields the identical
      // pair set
      val nw = docs.filter(bucket >= bound)
      assert(pairs(TextOps.nearDupsAgainstIndex(nw, spark.table(t2))) ===
        pairs(TextOps.nearDupsAgainstIndex(nw, spark.table(table))))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS $t2")
    }
  }

  test("stored-index join shuffles only the new batch") {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    TextOps.writeBandIndex(docs.filter(bucket < bound), table)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      // force the sort-merge path (at 100 TB neither side broadcasts) so
      // the bucketed layout, not a small-side broadcast, is what saves
      // the corpus shuffle
      spark.conf.set(key, "-1")
      val out = TextOps.nearDupsAgainstIndex(
        docs.filter(bucket >= bound), spark.table(table))
      val root = unwrap(out.queryExecution.executedPlan)
      val smj = root.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, root.toString)
      val j = smj.head
      def scansIndex(side: SparkPlan) = side.toString.contains(table)
      def shuffles(side: SparkPlan) =
        side.collect { case e: ShuffleExchangeExec => e }.size
      val (corpusSide, batchSide) =
        if (scansIndex(j.left)) (j.left, j.right) else (j.right, j.left)
      assert(scansIndex(corpusSide), root.toString)
      // the whole point: index side reads its buckets, zero Exchange
      assert(shuffles(corpusSide) === 0, corpusSide.toString)
      // the new batch side repartitions itself to the bucket count
      assert(shuffles(batchSide) === 1, batchSide.toString)
      // and the scan really is bucketed (bucket pruning metadata present)
      assert(corpusSide.toString.contains("SelectedBucketsCount"),
        corpusSide.toString)
    } finally {
      spark.conf.set(key, old)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
