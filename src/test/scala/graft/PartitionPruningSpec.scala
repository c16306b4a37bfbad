package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-layout gates: at 100 TB the physical layout (date-partitioned
  * directories) must let the planner skip data, both statically (literal
  * predicates → PartitionFilters, untouched partitions never read) and
  * dynamically (a filtered dim join pruning fact partitions at runtime —
  * DPP). Verified on a real partitioned parquet tree written from the
  * harness tables.
  */
class PartitionPruningSpec extends AnyFunSuite with SparkSuite {

  private lazy val layout: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_part").toString
    Tables(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year")
      .parquet(s"$dir/orders_by_year")
    dir
  }

  test("static pruning: a year predicate reaches PartitionFilters") {
    val df = spark.read.parquet(s"$layout/orders_by_year")
      .filter(col("o_year") === 1997)
      .select("o_orderkey", "o_totalprice")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_year"), plan)
    // the scan must touch exactly the one matching directory
    val scanned = df.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }.sum
    assert(scanned === 1, s"scanned $scanned partitions, expected 1")
    assert(df.count() > 0)
  }

  test("dynamic partition pruning: dim filter prunes fact partitions") {
    val sp = spark
    import sp.implicits._
    val fact = spark.read.parquet(s"$layout/orders_by_year")
    val years = fact.select("o_year").distinct().as[Int].collect().sorted
    assert(years.length > 1, "fixture must span multiple years")
    // a tiny dim keeps only one year; the fact predicate exists only at
    // runtime, so skipping must come from DPP. The dim must be a file
    // source: a local relation constant-folds its filter away and DPP's
    // selectivity check never sees it.
    years.map(y => (y, if (y == years.head) "keep" else "drop"))
      .toSeq.toDF("d_year", "d_label")
      .write.mode("overwrite").parquet(s"$layout/dim_year")
    val dim = spark.read.parquet(s"$layout/dim_year")
    val joined = fact.join(dim,
        fact("o_year") === dim("d_year") && dim("d_label") === "keep")
      .groupBy("o_year").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
    assert(joined.count() === 1)
  }
}
