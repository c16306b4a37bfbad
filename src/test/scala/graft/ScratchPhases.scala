package graft

import graft.operators.Quality.Rule._
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

object ScratchPhases {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    Tables(spark, d, "lineitem").count() // warmup
    val rules = Seq(
      OneOf("lang", Seq("en", "fr", "es", "de")),
      InRange("n_chars", 50, 400))
    val base = s"scratch_ph_p${ProcessHandle.current().pid()}"
    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"PHASE $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val feed = java.nio.file.Files.createTempDirectory("ph_feed")
    val feedDir = feed.resolve("documents.parquet")
    java.nio.file.Files.createDirectory(feedDir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(d, "documents.parquet"),
      feedDir.resolve("part-0.parquet"))
    t("ingest") {
      StreamingOps.streamingDocumentIngest(spark, feed.toString, base,
        admission = rules)
    }
    t("remediate") {
      StreamingOps.remediateDocumentQuarantine(spark, base,
        df => df.withColumn("lang",
          when(col("lang").isin("en", "fr", "es", "de"),
            col("lang")).otherwise(lit("en"))),
        rules).collect()
    }
    t("gate-only") {
      val docs = Tables(spark, d, "documents")
      val (adm, ann) = StreamingOps.admitBatch(spark, docs, rules,
        1.0, base + "2", 0L, "scratch")
      adm.count(); ann.foreach(_.unpersist())
    }
  }
}
