package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing (SURVEY.md §4 / README 100 TB design):
  * both sides bucketed on the join key → the sort-merge join needs no
  * Exchange at all. This is the pre-partitioning strategy for repeated
  * big-big joins at scale (dims are broadcast instead; see Joins.scala).
  */
class BucketingSpec extends AnyFunSuite with SparkSuite {

  // per-pid names: concurrently-forked suite lanes (build.sbt r20)
  // share /tmp/graft_warehouse, so fixed names would collide across JVMs
  private val pid = ProcessHandle.current().pid()
  private val bOrders = s"b_orders_p$pid"
  private val bCustomer = s"b_customer_p$pid"

  test("bucketed tables join without a shuffle") {
    spark.sql(s"DROP TABLE IF EXISTS $bOrders")
    spark.sql(s"DROP TABLE IF EXISTS $bCustomer")
    Tables(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable(bOrders)
    Tables(spark, sf, "customer")
      .write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable(bCustomer)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must pick sort-merge — the case
      // bucketing is for (two fact-sized sides)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(bOrders)
        .join(spark.table(bCustomer),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the join itself is exchange-free; only the final aggregate
      // repartitions
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"), joinPart)
      // and the result is right
      val n = joined.agg(sum("n")).first().getLong(0)
      assert(n === Tables(spark, sf, "orders").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $bOrders")
      spark.sql(s"DROP TABLE IF EXISTS $bCustomer")
    }
  }
}
