package graft
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("q_sql_report", "q_sessionize")) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.toString.take(3000))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
