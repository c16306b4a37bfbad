package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // local-iteration filter: comma-separated query names (unset → all)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: absorb JVM/codegen/session start-up so the first measured
    // query isn't charged ~4s of one-time cost
    Tables(spark, sfDir, "lineitem").count()
    Tables.events(spark, sfDir).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop write: full materialization of every column — count() would
        // let column pruning skip payload columns on pure scans/projections
        val dt =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          // a failed query must report the -1 sentinel, not its
          // time-to-failure masquerading as a fast success
          catch { case _: Throwable => -1.0 }
        // release per-query persisted intermediates (outside the timing)
        spark.catalog.clearCache()
        name -> dt
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures (-1 sentinels) are excluded from the total instead of
    // subtracting a second each; they stay visible per-query
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFail = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$nFail,"sf":"$sfDir"}""")
    spark.stop()
  }
}
