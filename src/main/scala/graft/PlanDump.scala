package graft

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for a list of queries to individual files —
  * the optimization-round evidence format (`plans/rNN/<query>_<suffix>.txt`).
  * Unlike [[Explain]] (one EXPLAINS.md over the fixed headline list), this
  * takes the query list and output naming from the command line so a
  * before/after pair can be generated from two checkouts of the tree.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...|all>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names: Seq[String] =
      if (args.length < 4 || args(3) == "all")
        SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val qs = SparkEntry.queries
    names.foreach { name =>
      val txt =
        try qs(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      spark.catalog.clearCache()
    }
    println(s"wrote ${names.size} plans to $outDir (suffix $suffix)")
    spark.stop()
  }
}
