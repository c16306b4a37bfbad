package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew resilience: when one join key dominates, AQE must detect the skew
  * at runtime and split the hot partition (SortMergeJoin(skew=true)) —
  * the mechanism that keeps a 100 TB join from serializing on one
  * executor. Verified on a deliberately skewed parquet layout with
  * production-shape thresholds scaled to fixture size; Skew.saltedAgg
  * (q_salted_agg) covers the aggregation-side equivalent.
  */
class SkewJoinSpec extends AnyFunSuite with SparkSuite {

  test("AQE splits the skewed partition at join time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    // 90% of fact rows share key 0; the rest spread over 1000 keys
    spark.range(0, 300000L)
      .select(when(col("id") % 10 < 9, 0L).otherwise(col("id") % 1000L)
        .as("k"),
        concat(lit("payload_payload_payload_"), col("id")).as("pay"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(0, 1000L).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("label"))
      .write.mode("overwrite").parquet(s"$dir/dim")

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k))
    try {
      // forbid broadcast so the join is sort-merge, and scale the skew
      // thresholds down to fixture size (production keeps the defaults)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "100KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
      val joined = fact.join(dim, "k")
      // execute THIS plan (count() would build its own QueryExecution and
      // the inspected adaptive plan would never run)
      assert(joined.queryExecution.toRdd.count() === 300000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
      assert(finalPlan.contains("skew=true"), finalPlan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
