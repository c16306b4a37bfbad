package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Scratch interleaved A/B for the Rank regime crossover re-check
  * (r20, VERDICT r19 #3): window regime vs range-sharded regime on the
  * q_ntile / q_percentile inputs at sf0.1. Deleted after measurement;
  * numbers recorded in OPTIMIZATION_r20.md.
  */
object ABRankScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ntileOver(ranked: DataFrame): DataFrame = ranked
      .withColumn("decile", Rank.ntileFromRank(10, col("rn"), col("n")))
      .groupBy("l_returnflag", "decile")
      .agg(count(lit(1)).as("n"), min("l_extendedprice").as("lo"),
        max("l_extendedprice").as("hi"))
    def in4 = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
    def winNtile = ntileOver(Rank.windowRanked(in4, "l_returnflag",
      Seq("l_extendedprice", "l_orderkey", "l_linenumber")))
    def rngNtile = ntileOver(Rank.rangeSharded(in4, "l_returnflag",
      Seq("l_extendedprice", "l_orderkey", "l_linenumber")))

    def in2 = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    def pctlOver(ranked: DataFrame): DataFrame = {
      val v = col("l_extendedprice")
      ranked.filter(Pctl.boundary(Seq(0.5, 0.9), col("rn"), col("n")))
        .groupBy("l_returnflag")
        .agg(max(col("n")).as("n"),
          Det.rnd(Pctl.interp(0.5, col("rn"), col("n"), v), 4).as("p50"),
          Det.rnd(Pctl.interp(0.9, col("rn"), col("n"), v), 4).as("p90"))
        .select("l_returnflag", "p50", "p90", "n")
    }
    def winPctl = pctlOver(Rank.windowRanked(in2, "l_returnflag",
      Seq("l_extendedprice")))
    def rngPctl = pctlOver(Rank.rangeSharded(in2, "l_returnflag",
      Seq("l_extendedprice")))

    def run(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for ((label, a, b) <- Seq(
        ("ntile", () => winNtile, () => rngNtile),
        ("pctl", () => winPctl, () => rngPctl))) {
      require(a().exceptAll(b()).isEmpty && b().exceptAll(a()).isEmpty,
        s"$label regimes disagree")
      run(a()); run(b()) // warm
      val (as, bs) = (Array.fill(reps)(0.0), Array.fill(reps)(0.0))
      (0 until reps).foreach { i => as(i) = run(a()); bs(i) = run(b()) }
      println(f"AB rank:$label window=${as.min}%.3f range=${bs.min}%.3f " +
        f"(all w=${as.map(x => f"$x%.3f").mkString(",")} " +
        f"r=${bs.map(x => f"$x%.3f").mkString(",")})")
    }
    spark.stop()
  }
}
