package graft

import java.nio.file.{Files, Paths}

/** Dump the whole-stage-codegen source for a query (r20) — the evidence
  * format for per-stage expression claims (e.g. "subexpression
  * elimination dedups the repeated split(trim(text))"): the generated
  * Java shows exactly how many times an expression is evaluated per row,
  * which `explain` cannot.
  *
  * Usage: runMain graft.CodegenDump <sfDir> <outFile> <query>
  */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outFile, name) = (args(0), args(1), args(2))
    require(SparkEntry.queries.contains(name), s"unknown query: $name")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // AQE wraps the tree in AdaptiveSparkPlanExec, which hides the
    // codegen subtrees from codegenString until execution; whole-stage
    // codegen structure (and subexpression elimination within it) does
    // not depend on AQE, so dump the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val txt = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    Files.writeString(Paths.get(outFile), txt)
    println(s"wrote $outFile (${txt.length} chars)")
    spark.stop()
  }
}
