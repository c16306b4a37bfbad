package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface (SURVEY.md §2.10). The reference has no
  * streaming — its "incremental" mode is a directory re-scan + upsert — so
  * this is the extension path: the same events schema consumed as a file
  * stream with watermarked event-time windows.
  *
  * Scale: file-stream source partitions by file; the windowed aggregate is
  * the standard partial-agg + state-store shape; the 1-hour watermark
  * bounds state.
  */
object StreamingOps {

  /** Tumbling 1-hour counts over a parquet-backed stream of events,
    * drained synchronously into a memory sink (for tests/demo; swap the
    * sink for kafka/parquet in production).
    */
  def tumblingCounts(spark: SparkSession, sfDir: String,
      queryName: String = "stream_tumbling"): DataFrame = {
    // schema must be known up front for streaming reads; ts arrives as
    // raw nanos (see Tables.events) and is truncated identically.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = Tables.events(spark, sfDir).schema
      .fields.foldLeft(new org.apache.spark.sql.types.StructType()) {
        (st, f) => if (f.name == "ts")
          st.add("ts", org.apache.spark.sql.types.LongType)
        else st.add(f)
      }
    // the file-stream source requires a directory; select the single
    // events file out of the sf dir with a glob filter
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
