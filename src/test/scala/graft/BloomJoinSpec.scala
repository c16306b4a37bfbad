package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning: when a selective dim filter cannot
  * prune partitions (the fact layout is not partitioned by the join key),
  * Spark can still inject a bloom filter built from the filtered dim into
  * the fact scan, dropping non-joining rows BEFORE the shuffle — the
  * row-level analog of DPP and the difference between shuffling 100 TB
  * and shuffling the 1% that joins. Thresholds scaled to fixture size.
  */
class BloomJoinSpec extends AnyFunSuite with SparkSuite {

  test("selective dim join injects a runtime bloom filter on the fact side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/fact")
    Tables(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/dim")

    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "1KB")
      // forbid broadcast so the join shuffles — the case bloom pruning
      // exists for
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim,
        fact("l_orderkey") === dim("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("might_contain"), optimized)
      // and it returns the same rows as the unfiltered-scan join
      val expected = spark.read.parquet(s"$dir/fact").join(
        spark.read.parquet(s"$dir/dim")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
      assert(expected > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
