package graft

import graft.operators.Multimodal
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalStreamingSpec extends AnyFunSuite with SparkSuite {

  test("multimodal: payload bytes decode to bounded features") {
    val df = Multimodal.decodeFeatures(
      Multimodal.withPayload(
        Tables(spark, sf, "documents").select("doc_id", "text")), "payload")
    val bad = df.filter(col("features.brightness") < 0.0 ||
      col("features.brightness") > 1.0 ||
      col("features.n_bytes") =!= 16).count()
    assert(bad === 0)
  }

  test("multimodal: frame sampling slices payload windows") {
    val df = Multimodal.sampleFrames(
      Multimodal.withPayload(
        Tables(spark, sf, "documents").select("doc_id", "text")),
      "payload", frameLen = 4, step = 4)
    // 16-byte payload, 4-byte frames, stride 4 → starts 1,5,9,13
    val counts = df.select(size(col("frames")).as("n"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(counts === Seq(4))
  }

  test("multimodal: resize decimates payload bytes deterministically") {
    val df = Multimodal.resize(
      Multimodal.withPayload(
        Tables(spark, sf, "documents").select("doc_id", "text")),
      "payload", factor = 4)
    // 16-byte payload, keep every 4th byte → 4 bytes
    val lens = df.select(length(col("resized")).as("n"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(lens === Seq(4))
    // deterministic: resized bytes are a subsequence of the payload
    val r = df.select(col("payload"), col("resized")).first()
    val (p, z) = (r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1))
    assert(z.toSeq === p.zipWithIndex.collect {
      case (b, i) if i % 4 == 0 => b
    }.toSeq)
  }

  test("stateful streaming sessionize matches batch minus open sessions") {
    val streamed = StreamingOps.streamingSessionize(spark, sf)
    val batch = SparkEntry.queries("q_sessionize")(spark, sf)
    // the stream's open tail session per user never closes in a bounded
    // replay → streamed = batch minus each user's last session
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session_id").as("last_id"))
    val batchClosed = batch.join(lastPerUser, Seq("user_id"))
      .filter(col("session_id") =!= col("last_id"))
    assert(streamed.count() === batchClosed.count())
    val joined = streamed.join(batchClosed,
      streamed("user_id") === batchClosed("user_id") &&
        streamed("session_id") === batchClosed("session_id") &&
        streamed("n_events") === batchClosed("n_events"))
    assert(joined.count() === batchClosed.count())
  }

  test("streaming incremental upsert converges to batch keep-last dedup") {
    val base = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val src = s"$base/src"
    val tgt = s"$base/target"
    // two source files → two candidate micro-batches; second updates keys
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
    ev.filter(col("event_id") < 500)
      .write.parquet(s"$src/p1")
    ev.filter(col("event_id") >= 300)
      .withColumn("value", col("value") + 1000.0)
      .write.parquet(s"$src/p2")
    val one = spark.read.parquet(s"$src/p1", s"$src/p2")
    StreamingOps.incrementalUpsert(spark, s"$src/*", tgt,
      Seq("event_id"), "value")
    val target = spark.read.parquet(tgt)
    // every key exactly once, and the max-value (updated) row won
    assert(target.count() === one.select("event_id").distinct().count())
    val expected = one.groupBy("event_id")
      .agg(max("value").as("value"))
    val mismatch = target.join(expected, Seq("event_id"))
      .filter(target("value") =!= expected("value")).count()
    assert(mismatch === 0)
  }

  test("incremental upsert heals a mid-swap crash without losing the target") {
    val base = java.nio.file.Files.createTempDirectory("graft_inc2").toString
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
    ev.filter(col("event_id") < 100).write.parquet(s"$base/src1/p1")
    StreamingOps.incrementalUpsert(spark, s"$base/src1/*", s"$base/target",
      Seq("event_id"), "value")
    val before = spark.read.parquet(s"$base/target").count()
    assert(before > 0)
    // simulate a crash between the two swap renames: the target is gone
    // and _old holds the only complete copy
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$base/target"),
      new org.apache.hadoop.fs.Path(s"$base/target_old")))
    // next run ingests a disjoint batch; recovery must restore _old
    // BEFORE merging — without it this run would silently drop every
    // previously upserted row
    ev.filter(col("event_id") >= 500 && col("event_id") < 550)
      .write.parquet(s"$base/src2/p2")
    StreamingOps.incrementalUpsert(spark, s"$base/src2/*", s"$base/target",
      Seq("event_id"), "value")
    val after = spark.read.parquet(s"$base/target")
    assert(after.filter(col("event_id") < 100).count() === before)
    assert(after.filter(col("event_id") >= 500).count() > 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/target_old")))
  }

  test("streaming tumbling window equals its batch twin") {
    val streamed = StreamingOps.tumblingCounts(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("stream-stream interval join equals its batch twin") {
    val streamed = StreamingOps.clickAttribution(spark, sf)
    val batch = StreamingOps.clickAttributionBatch(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("transformWithState per-user stats equal the batch aggregate") {
    val streamed = StreamingOps.userStatsTws(spark, sf)
    // bounded replay, Append mode: keep each user's LAST emitted row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    val last = streamed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), min("us").as("first_us"),
        max("us").as("last_us"))
    assert(last.count() > 0)
    assert(last.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(last).count() === 0)
  }

  test("streaming as-of enrichment equals the batch q_asof result") {
    val streamed = StreamingOps.streamingAsOf(spark, sf)
      .selectExpr("purchase_id", "user_id",
        "timestamp_micros(purchase_ts_us) AS purchase_ts",
        "prev_click_id", "timestamp_micros(prev_click_ts_us) AS prev_click_ts")
    val batch = SparkEntry.queries("q_asof")(spark, sf)
    val s = streamed.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = batch.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(s.length === b.length)
    assert(s.toSeq === b.toSeq)
  }

  test("watermarked streaming dedup: unique event ids, none lost") {
    val streamed = StreamingOps.streamingDedup(spark, sf)
    val n = streamed.count()
    // the fixture's event_ids are already unique, so the watermarked
    // dedup must pass everything through exactly once
    assert(n === Tables.events(spark, sf).count())
    assert(streamed.select("event_id").distinct().count() === n)
  }

  test("streaming chunking equals batch q_chunk exactly (stateless op)") {
    val streamed = StreamingOps.streamingChunk(spark, sf)
    val batch = SparkEntry.queries("q_chunk")(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "chunk_id", "chunk_text", "n_chunk_toks")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val (s1, b1) = (rows(streamed), rows(batch))
    assert(s1.nonEmpty)
    assert(s1 === b1)
  }

  test("streaming curation gate equals the batch gate exactly") {
    // the stateless prefix of q_curate (lang 'en' + quality 'good',
    // ONE shared definition) over a stream must keep/drop exactly the
    // rows the batch form does
    val streamed = StreamingOps.streamingCurateGate(spark, sf)
    val batch = graft.operators.TrainingData
      .curateGate(Tables(spark, sf, "documents"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_tok").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val (s1, b1) = (rows(streamed), rows(batch))
    assert(s1.nonEmpty)
    assert(s1 === b1)
    // and the gate genuinely filters on this corpus
    assert(s1.size.toLong < Tables(spark, sf, "documents").count())
  }

  test("streaming near-dedup equals batch q_dedup_incremental exactly") {
    // stream-static band join vs the batch twin: same signatures (one
    // shared definition), same verify — the PAIR SET and the exact
    // jaccard doubles must match. Run BOTH static-side modes: the
    // STORED bucketed index (production shape, VERDICT r08 #4 — the
    // micro-batch join reads a plain bucketed scan, no corpus re-hash)
    // and the inline ad-hoc recompute.
    val bound = graft.operators.TrainingData.TrainBoundary
    val bucket = graft.operators.TrainingData
      .hashPrefixOf(org.apache.spark.sql.functions.col("doc_id"), 2)
    spark.sql("DROP TABLE IF EXISTS stream_band_idx")
    try {
      graft.operators.TextOps.writeBandIndex(
        spark.read.parquet(s"$sf/documents.parquet").filter(bucket < bound),
        "stream_band_idx")
      val viaIndex = StreamingOps.streamingNearDedup(spark, sf,
        queryName = "stream_neardedup_idx",
        indexTable = Some("stream_band_idx"))
      val inline = StreamingOps.streamingNearDedup(spark, sf)
      val batch = SparkEntry.queries("q_dedup_incremental")(spark, sf)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("new_id", "old_id", "jaccard").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .sortBy(t => (t._1, t._2)).toSeq
      val b1 = rows(batch)
      // q_dedup_incremental is legitimately empty when no planted
      // near-dup pair straddles the train/new split (QueriesSpec's
      // mayBeEmpty contract) — parity must hold either way, but flag a
      // regenerated fixture that makes it vacuous as canceled, not red
      assume(b1.nonEmpty,
        "fixture has no cross-split near-dups; parity test vacuous")
      assert(rows(viaIndex) === b1)
      assert(rows(inline) === b1)
    } finally spark.sql("DROP TABLE IF EXISTS stream_band_idx")
  }

  test("streaming corpus ingest (filter+dedup+split) equals batch twin") {
    val streamed = StreamingOps.corpusIngest(spark, sf)
    val batch = StreamingOps.corpusIngestBatch(spark, sf)
    assert(streamed.count() > 0)
    // compare on the deterministic surface (hash + split) — dup-group
    // representative doc_ids could differ between first-seen (stream)
    // and arbitrary (batch) if the corpus ever contains exact dups.
    // (collected comparison: exceptAll over a memory-sink table plus a
    // dropDuplicates plan trips an INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
    // rewrite bug in Spark 4.1; the fixture is 50 docs)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("content_hash", "split", "n_toks").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(key(streamed) === key(batch))
    // split fractions are sane even on the tiny fixture
    val frac = streamed.filter(col("split") === "train").count().toDouble /
      streamed.count()
    assert(frac > 0.6 && frac < 0.95, frac)
  }
}
