package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

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
    // raw nanos (see Tables.events) and is truncated identically. The
    // file-stream source requires a directory; eventsStream selects the
    // single events file out of the sf dir with a glob filter.
    val stream = eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"))
    drainToMemory(stream, queryName, mode = "complete")
  }

  /** Incremental merge as a stream (the reference's "incremental" mode —
    * directory re-scan + ON CONFLICT upsert, ETL_OMS_OPERATIONNEL.py — as
    * a true streaming foreachBatch): each micro-batch is keep-last
    * deduplicated and merged last-write-wins into a parquet target.
    * Read-modify-write per batch here; on a lakehouse table this becomes
    * MERGE INTO with the identical batch expression.
    */
  def incrementalUpsert(spark: SparkSession, srcDir: String,
      targetDir: String, keyCols: Seq[String],
      orderCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val schema = spark.read.parquet(srcDir).schema
    // one file per micro-batch so the cross-batch merge path really runs
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val tgt = new org.apache.hadoop.fs.Path(targetDir)
        val old = new org.apache.hadoop.fs.Path(targetDir + "_old")
        // rename/delete return false instead of throwing (e.g. dest
        // exists, cross-filesystem move) — a silently failed promotion
        // would mark the batch committed while the target is stale or
        // missing, so every step must be checked
        def must(ok: Boolean, step: String): Unit =
          if (!ok) throw new java.io.IOException(
            s"incrementalUpsert swap failed at: $step")
        // crash recovery FIRST: a crash between the two swap renames
        // below leaves the target missing and _old holding the ONLY
        // complete copy — without this restore, the batch would merge
        // against nothing and the swap would then delete the backup
        // (silent loss of every prior upsert)
        if (!fs.exists(tgt) && fs.exists(old))
          must(fs.rename(old, tgt), s"restore $old -> $tgt")
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(orderCol).desc)
        val dedup = batch
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
        val hasTarget = fs.exists(tgt) && fs.listStatus(tgt).nonEmpty
        val merged =
          if (!hasTarget) dedup
          else {
            val existing = spark.read.parquet(targetDir)
            val union = existing.withColumn("_src", lit(0))
              .unionByName(dedup.withColumn("_src", lit(1)))
            // cross-batch rule: the INCOMING row wins (the reference's
            // sequential ON CONFLICT DO UPDATE — latest statement wins,
            // regardless of orderCol). orderCol orders only WITHIN a
            // batch (dedup above); here it is a defensive tiebreak that
            // never fires while dedup/prior merges leave one row per
            // key per side.
            val mw = Window.partitionBy(keyCols.map(col): _*)
              .orderBy(col("_src").desc, col(orderCol).desc)
            union.withColumn("_rn", row_number().over(mw))
              .filter(col("_rn") === 1).drop("_rn", "_src")
          }
        // write-then-swap: the merge plan reads targetDir, so write the
        // new version beside it and promote via two renames — at every
        // instant a complete copy exists on disk (a crash between the
        // renames is healed by the restore step above), unlike
        // delete-then-rename which has a window with no target at all.
        // A lakehouse table format replaces this with transaction logs;
        // directory renames are the file-system stand-in and are NOT
        // multi-writer safe.
        val tmp = targetDir + "_next"
        merged.write.mode("overwrite").parquet(tmp)
        must(fs.delete(old, true) || !fs.exists(old), s"delete $old")
        if (fs.exists(tgt)) must(fs.rename(tgt, old), s"rename $tgt -> $old")
        must(fs.rename(new org.apache.hadoop.fs.Path(tmp), tgt),
          s"rename $tmp -> $tgt")
        must(fs.delete(old, true) || !fs.exists(old), s"delete $old")
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** RAW events file schema as the batch reader sees it — ts may be
    * LONG (legacy nanos files under nanosAsLong) or TIMESTAMP_NTZ
    * (native-µs files); see Tables.events for the two flavors.
    */
  private def eventsSchema(spark: SparkSession,
      sfDir: String): org.apache.spark.sql.types.StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").schema
  }

  /** Raw events file stream plus the µs-since-epoch extraction expr
    * matching the file's ts flavor — every stateful events op keys its
    * state on `ts_us`, identically for both layouts.
    */
  private def eventsStreamWithTs(spark: SparkSession,
      sfDir: String): (DataFrame, String) = {
    val schema = eventsSchema(spark, sfDir)
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    (raw, Tables.tsMicrosExpr(schema("ts").dataType) + " AS ts_us")
  }

  private def eventsStream(spark: SparkSession, sfDir: String): DataFrame =
    // one source recipe: reuse eventsStreamWithTs's raw stream so the
    // glob/schema invariants live in exactly one place
    Tables.normalizeTs(eventsStreamWithTs(spark, sfDir)._1)

  /** File-streamed documents corpus — the one source recipe shared by
    * every corpus-streaming op (schema pre-read; the file-stream source
    * needs a directory, so the single file is glob-selected).
    */
  private def docsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
  }

  /** Drain a bounded stream (AvailableNow) into a memory sink and return
    * the materialized table — the test/demo sink every op here shares;
    * production swaps this one call site for parquet/kafka.
    */
  private def drainToMemory(df: DataFrame, queryName: String,
      mode: String = "append"): DataFrame = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(queryName)
  }

  /** Stream-stream interval join: each purchase matched to same-user
    * clicks at most one hour earlier. Both sides watermarked so the join
    * state is bounded (clicks can be dropped once no purchase within the
    * interval + watermark can still arrive) — the canonical attribution
    * join at 100 TB/day event rates.
    */
  def clickAttribution(spark: SparkSession, sfDir: String,
      queryName: String = "stream_attrib"): DataFrame = {
    val clicks = eventsStream(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val purchases = eventsStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = purchases.join(clicks,
      expr("c_user = p_user AND " +
        "click_ts >= purchase_ts - INTERVAL 1 HOUR AND " +
        "click_ts <= purchase_ts"))
      .select("purchase_id", "p_user", "purchase_ts", "click_id",
        "click_ts")
    drainToMemory(joined, queryName)
  }

  /** Batch twin of [[clickAttribution]] for equivalence testing. */
  def clickAttributionBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    purchases.join(clicks,
      expr("c_user = p_user AND " +
        "click_ts >= purchase_ts - INTERVAL 1 HOUR AND " +
        "click_ts <= purchase_ts"))
      .select("purchase_id", "p_user", "purchase_ts", "click_id",
        "click_ts")
  }

  /** Watermarked streaming dedup on the event id: state is bounded by the
    * watermark instead of growing with the whole stream history — the
    * at-least-once-source dedup shape.
    */
  def streamingDedup(spark: SparkSession, sfDir: String,
      queryName: String = "stream_dedup"): DataFrame = {
    drainToMemory(eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "event_type", "ts"), queryName)
  }

  /** Streaming corpus ingest: the training-data prep ops composed as ONE
    * continuous pipeline — token-count quality floor, exact dedup on the
    * content hash, deterministic md5 train/val/test split — over a
    * file-streamed document corpus. Dedup keeps the first-seen copy
    * (arrival-order state); the split is hash-deterministic, so the
    * OUTPUT SET equals the batch twin whenever the corpus has no exact
    * duplicates (and equals it up to dup-group representative choice
    * otherwise). Append mode, one stateful operator; in production the
    * memory sink becomes parquet/kafka and the dedup switches to
    * dropDuplicatesWithinWatermark to bound state by ingest time.
    */
  def corpusIngest(spark: SparkSession, sfDir: String,
      queryName: String = "stream_corpus"): DataFrame =
    drainToMemory(corpusPrep(docsStream(spark, sfDir)), queryName)

  /** Batch twin of [[corpusIngest]] — identical transforms on a static
    * read, for the parity gate.
    */
  def corpusIngestBatch(spark: SparkSession, sfDir: String): DataFrame =
    corpusPrep(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** Streaming incremental near-dedup — the stream-static twin of batch
    * q_dedup_incremental (the continuous-ingest dedup gate): new
    * documents arrive as a file stream and are checked for
    * near-duplicates against the static corpus's MinHash band index.
    *
    * Shape, the part that matters at scale: the STATIC side is exactly
    * the stored index a production deployment maintains at ingest —
    * (band_key, old_id, toks) rows, band1 ∪ band2 — and the STREAM side
    * computes its signatures per arriving doc with the same stateless
    * expressions batch uses (TextOps.sigWithToks, one shared
    * definition), explodes to its two band keys, and stream-static
    * equi-joins on band_key. Exact token-Jaccard verifies collisions
    * only; a streaming dropDuplicates on (new_id, old_id) collapses
    * pairs that collide on both bands (state = emitted pair ids — at
    * real scale bound it with dropDuplicatesWithinWatermark on an
    * ingest-time column). Append mode end to end.
    *
    * `indexTable`: the name of a STORED bucketed band index written by
    * TextOps.writeBandIndex — the production shape: each micro-batch's
    * stream-static join reads the index as a plain bucketed scan
    * instead of re-hashing the whole corpus per batch, and bucketing on
    * band_key keeps the corpus side exchange-free (VERDICT r08 #4).
    * With None the index is computed inline from the static corpus
    * read — ad-hoc mode for a corpus without a maintained index; same
    * results, corpus re-hashed per micro-batch.
    *
    * The signature/key/verify logic is TextOps.nearDupsAgainstIndex —
    * ONE definition shared with the batch path, so stream and batch
    * cannot drift (exact parity gated in MultimodalStreamingSpec).
    */
  def streamingNearDedup(spark: SparkSession, sfDir: String,
      queryName: String = "stream_neardedup",
      indexTable: Option[String] = None): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val bound = graft.operators.TrainingData.TrainBoundary
    val bucket = graft.operators.TrainingData
      .hashPrefixOf(col("doc_id"), 2)
    val corpusIdx = indexTable.map(spark.table).getOrElse(
      graft.operators.TextOps.bandIndexRows(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .filter(bucket < bound), "old_id", "old_toks"))
    val newDocs = docsStream(spark, sfDir).filter(bucket >= bound)
    drainToMemory(
      graft.operators.TextOps.nearDupsAgainstIndex(newDocs, corpusIdx),
      queryName)
  }

  /** Context-window chunking over a file-streamed corpus — the SAME
    * transform as batch q_chunk (TrainingData.chunk, one shared
    * definition), which is stateless/per-row and therefore streams in
    * append mode with no watermark and EXACT output parity with the
    * batch result. This is the continuous-ingest form of the prep step:
    * new corpus files land, their chunks append.
    */
  def streamingChunk(spark: SparkSession, sfDir: String,
      queryName: String = "stream_chunks"): DataFrame =
    drainToMemory(
      graft.operators.TrainingData.chunk(docsStream(spark, sfDir)),
      queryName)

  /** Streaming CURATION GATE — the stateless prefix of the q_curate
    * pipeline (TrainingData.curateGate: language class 'en' AND
    * quality class 'good', ONE definition with batch) applied to
    * arriving documents: per-row, no corpus statistics, so it streams
    * in append mode with exact batch parity. This is the continuous
    * ingest-time filter of a corpus pipeline — documents that fail the
    * gate never reach storage; the STATEFUL stages (exact dedup,
    * decontamination, packing) run batch-side over the gated store
    * (or via the stored band index for online near-dedup —
    * [[streamingNearDedup]]).
    */
  def streamingCurateGate(spark: SparkSession, sfDir: String,
      queryName: String = "stream_curate_gate"): DataFrame =
    drainToMemory(
      graft.operators.TrainingData.curateGate(docsStream(spark, sfDir)),
      queryName)

  /** Streaming BM25 probe — the online-serving twin of batch q_bm25:
    * queries arrive as a file stream (`queriesDir`, rows of (q_id,
    * qtext)) and probe the STATIC inverted index over the corpus
    * (TextOps.bm25Index — the stored table, bucketed on token so the
    * corpus side of every micro-batch's join is exchange-free). The
    * stream side explodes query terms statelessly;
    * the stream-static equi-join touches only the arriving queries'
    * postings; scoring aggregates per (q_id, doc_id) in complete mode.
    * The op emits scored candidates — the top-k cut belongs to the
    * consumer (a ranking service dedupes/cuts per query downstream).
    * Term weight and score are TextOps.bm25Score — ONE definition with
    * batch, so stream and batch scoring cannot drift (exact parity
    * gated in RetrievalSpec).
    *
    * MAINTENANCE CAVEAT (r14, shared by every append-mode serving
    * twin — [[streamingAnn]], [[streamingIvf]]): the stored index is
    * the STATIC side of a stream-static join, resolved once when the
    * streaming plan binds — a maintenance swap (compact/vacuum/
    * refresh) mid-stream invalidates that snapshot and a per-batch
    * retry cannot re-bind it; restart the serving stream after
    * family maintenance. The MICRO-BATCH twins ([[streamingBq]]/
    * [[streamingPq]]/[[streamingSq]]) re-plan every batch under
    * retryingProbe and ride through maintenance without a restart —
    * prefer them when the family self-maintains mid-stream. */
  def streamingBm25(spark: SparkSession, sfDir: String, queriesDir: String,
      queryName: String = "stream_bm25"): DataFrame = {
    val postings = graft.operators.TextOps.bm25Index(spark, sfDir)
    val schema = spark.read.parquet(queriesDir).schema
    val queryTerms = spark.readStream.schema(schema).parquet(queriesDir)
      .select(col("q_id"), explode(split(col("qtext"), " ")).as("token"))
    drainToMemory(
      graft.operators.TextOps.bm25Score(queryTerms, postings),
      queryName, mode = "complete")
  }

  /** Streaming ANN probe — the online-serving twin of the stored-index
    * dense retrieval (VERDICT r11 #4; streamingBm25 is the lexical
    * template): query VECTORS arrive as a file stream (`queriesDir`,
    * rows of (q_id, embedding)) and probe the STATIC stored band index
    * over the corpus (AnnIndex.annIndex — band postings bucketed on
    * band_key, payload bucketed on vec_id, so the corpus side of every
    * micro-batch's stream-static joins is a bucketed scan). Arriving
    * vectors are canonicalized + banded statelessly with the index's
    * build config; candidates dedup on (q_id, vec_id) (streaming
    * state — at scale bound it with dropDuplicatesWithinWatermark);
    * exact sentinel-cosine rescoring emits scored candidates in append
    * mode — the top-k cut belongs to the consumer, exactly like
    * streamingBm25. The whole probe is AnnIndex.scoreExternal — ONE
    * definition with batch, so stream and batch scoring cannot drift
    * (exact parity gated in AnnIndexSpec).
    */
  def streamingAnn(spark: SparkSession, sfDir: String, queriesDir: String,
      queryName: String = "stream_ann"): DataFrame = {
    val table = graft.operators.AnnIndex.annIndex(spark, sfDir)
    val schema = spark.read.parquet(queriesDir).schema
    val queries = spark.readStream.schema(schema).parquet(queriesDir)
    drainToMemory(
      graft.operators.AnnIndex.scoreExternal(queries, spark, table),
      queryName)
  }

  /** Streaming IVF probe — the online-serving twin of the stored IVF
    * index (the [[streamingAnn]] shape for the cell-pruned family):
    * query vectors arrive as a file stream and probe the STATIC
    * bucketed cells table. Cell routing must be STATELESS on a stream
    * (window functions are illegal on the streaming side), so the
    * probe is [[graft.operators.IvfIndex.scoreExternalCandidates]] —
    * per-query centroid ranking as a sorted literal-struct array,
    * nprobe cells exploded, one stream-static equi-join against the
    * bucketed scan. Emits ALL scored candidates of the probed cells;
    * the top-k cut belongs to the consumer. Batch parity with
    * scoreExternal is spec-gated (ExternalProbeSpec).
    */
  def streamingIvf(spark: SparkSession, sfDir: String,
      queriesDir: String, nprobe: Int = 1,
      queryName: String = "stream_ivf"): DataFrame = {
    val table = graft.operators.IvfIndex.ivfIndex(spark, sfDir)
    val schema = spark.read.parquet(queriesDir).schema
    val queries = spark.readStream.schema(schema).parquet(queriesDir)
    drainToMemory(
      graft.operators.IvfIndex.scoreExternalCandidates(queries, spark,
        table, nprobe),
      queryName)
  }

  /** MICRO-BATCH streaming probe — the serving path for probe shapes
    * whose batch form needs windows or aggregations (top-k cuts,
    * rerank windows), which an append-mode streaming plan forbids:
    * run the BATCH probe per micro-batch under foreachBatch and
    * append its results to a per-process results table. The
    * one-definition-with-batch guarantee is trivial here — the probe
    * IS the batch function — at the cost of per-batch materialization
    * instead of incremental emission (the right trade for top-k
    * serving, where each query's answer is complete within its own
    * batch). Ephemeral checkpoint: probe streams are stateless and
    * re-proberable, so nothing needs replay protection. Each batch's
    * probe runs under [[graft.operators.TextOps.retryingProbe]] over
    * `retryTables` (r14): a micro-batch racing a maintenance swap of
    * its family — exactly the composition the self-maintaining
    * ingest hooks introduce — re-plans instead of killing the serving
    * stream.
    */
  private def microBatchProbe(spark: SparkSession, queriesDir: String,
      outTable: String,
      probe: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame,
      retryTables: Seq[String] = Nil): DataFrame = {
    graft.operators.TextOps.clearOrphanLocation(spark, outTable)
    spark.sql(s"DROP TABLE IF EXISTS $outTable")
    val schema = spark.read.parquet(queriesDir).schema
    val ck = java.nio.file.Files
      .createTempDirectory("graft_probe_ck").toString
    val q = spark.readStream.schema(schema).parquet(queriesDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        // consistentProbe (not plain retryingProbe): the swap's silent
        // failure mode — an empty listing inside the rename window —
        // throws nothing, so only the fingerprint validation catches
        // it. The frame comes back MATERIALIZED; the append below
        // runs OUTSIDE the retry scope, so a validation retry can
        // never double-write a batch's results.
        graft.operators.TextOps.consistentProbe(batch.sparkSession,
            retryTables) { probe(batch.toDF()) }
          .write.mode("append").saveAsTable(outTable)
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the checkpoint is ephemeral BY DESIGN (probes are stateless and
    // re-proberable) — reclaim it rather than leaking a temp dir per
    // probe call
    val ckPath = new org.apache.hadoop.fs.Path(ck)
    ckPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(ckPath, true)
    spark.table(outTable)
  }

  /** Streaming BQ probe: query vectors arrive as a file stream; each
    * micro-batch runs [[graft.operators.BqIndex.scoreExternal]] —
    * Hamming top-C + exact rerank against the memoized corpus index —
    * and appends its top-k to the results table. */
  def streamingBq(spark: SparkSession, sfDir: String,
      queriesDir: String, k: Int = 10,
      outTable: String = "stream_bq_out"): DataFrame = {
    val sig = graft.operators.BqIndex.bqIndex(spark, sfDir)
    val ann = graft.operators.AnnIndex.annIndex(spark, sfDir)
    microBatchProbe(spark, queriesDir, outTable,
      b => graft.operators.BqIndex.scoreExternal(b, b.sparkSession,
        sig, ann + "_vec", k),
      retryTables = Seq(sig, ann + "_vec"))
  }

  /** Streaming PQ probe: per micro-batch ADC top-k against the
    * memoized codes table under the stored codebook. */
  def streamingPq(spark: SparkSession, sfDir: String,
      queriesDir: String, k: Int = 10,
      outTable: String = "stream_pq_out"): DataFrame = {
    val table = graft.operators.PqIndex.pqIndex(spark, sfDir)
    microBatchProbe(spark, queriesDir, outTable, b => {
      val s = b.sparkSession
      graft.functions.VectorFunctions.register(s)
      // PqIndex.topK's query contract is (vec_id, v) exact vectors;
      // adapt the external (q_id, embedding) shape through the same
      // checked prep every external probe uses
      val dim = s.table(table + "_cb")
        .agg(org.apache.spark.sql.functions.max(
          size(col("c")) * col("sub"))).collect()(0).getInt(0)
      val q = graft.operators.Ann.prepExternal(b, dim)
        .select(col("q_id").as("vec_id"), col("qv").as("v"))
      graft.operators.PqIndex.topK(s, table, q, k)
    }, retryTables = Seq(table, table + "_cb"))
  }

  /** Streaming SQ8 probe: per micro-batch exact-query scan of the
    * memoized dequantized codes. */
  def streamingSq(spark: SparkSession, sfDir: String,
      queriesDir: String, k: Int = 10,
      outTable: String = "stream_sq_out"): DataFrame = {
    val table = graft.operators.SqIndex.sqIndex(spark, sfDir)
    microBatchProbe(spark, queriesDir, outTable,
      b => graft.operators.SqIndex.scoreExternal(b, b.sparkSession,
        table, k),
      retryTables = Seq(table))
  }

  /** Streaming ANN INDEX INGEST — the online half of the vector
    * maintenance story [[streamingAnn]] serves from (the
    * streamingBm25Ingest twin): embedding vectors arrive as a file
    * stream and each micro-batch APPENDS its band postings + payload
    * rows to the stored index (AnnIndex.append under foreachBatch —
    * ONE maintenance definition with batch, so stream-built and
    * batch-built indexes cannot drift; probe parity gated in
    * AnnIndexSpec). Band/payload rows are doc-local, so nothing stored
    * is ever rewritten — per-batch cost O(batch), the 100 TB ingest
    * contract. Same replay ledger (a re-delivered batch id would
    * duplicate every band row and double the probe's candidate
    * payloads) and same STABLE warehouse checkpoint as the BM25
    * ingest: later invocations see only genuinely new files. Table
    * names must be per-process unique (clearOrphanLocation contract).
    *
    * Atomicity caveat, WIDER here than for BM25: a batch touches TWO
    * tables (band postings, then payload) before the ledger commits,
    * so a crash after the first append replays into duplicated band
    * rows, and a crash between the appends leaves candidates whose
    * payload join silently drops them until the replay lands. Exactly
    * the window the BM25 ingest documents — closing it needs a
    * transactional table format; until then treat a crashed ingest as
    * requiring an index rebuild.
    */
  def streamingAnnIngest(spark: SparkSession, sfDir: String,
      table: String,
      nBands: Int = graft.operators.AnnIndex.NBands,
      bits: Int = graft.operators.AnnIndex.Bits,
      dim: Int = graft.operators.AnnIndex.Dim,
      payloadCols: Seq[String] = Nil): Unit =
    // the `_cfg` pin is a first-class member: losing it (or ingesting
    // into a pre-config-pin index) resets the whole family rather
    // than letting the first append re-pin against surviving data
    vectorIngest(spark, sfDir, table,
      Seq(table, table + "_vec", table + "_cfg"),
      (batch, t) => graft.operators.AnnIndex.append(batch, t,
        nBands = nBands, bits = bits, dim = dim,
        payloadCols = payloadCols))

  /** Streaming PQ INDEX INGEST — the online maintenance leg of
    * [[graft.operators.PqIndex]]: vectors arrive as a file stream and
    * each micro-batch is ENCODED with the stored codebook and appended
    * to the bucketed codes table (PqIndex.append under foreachBatch —
    * one encode definition with batch, so stream- and batch-grown
    * codes cannot drift; gated in AnnIndexSpec). The codebook must
    * pre-exist ([[graft.operators.PqIndex.trainCodebook]] on a seed
    * corpus — append never retrains, the frozen-quantizer contract),
    * and is never touched by ingest, so a PQ batch is ONE table append
    * — a narrower crash window than the two-table ANN ingest above.
    * Same replay ledger + stable warehouse checkpoint as every ingest
    * in this file.
    */
  def streamingPqIngest(spark: SparkSession, sfDir: String,
      table: String): Unit = {
    require(spark.catalog.tableExists(table + "_cb"),
      s"streamingPqIngest: no stored codebook ${table}_cb — train with " +
        "PqIndex.trainCodebook first (ingest never retrains)")
    vectorIngest(spark, sfDir, table, Seq(table),
      (batch, t) => graft.operators.PqIndex.append(batch, t))
  }

  /** Streaming IVF INDEX INGEST — the online maintenance leg of
    * [[graft.operators.IvfIndex]]: arriving vectors are assigned with
    * the STORED quantizer (frozen centroids — ingest never retrains,
    * same contract as PQ above; refuses without one) and appended to
    * the bucketed cells table. One-table batches, doc-local rows,
    * replay ledger + stable checkpoint from the shared loop;
    * stream-vs-batch assignment parity gated in AnnIndexSpec.
    */
  def streamingIvfIngest(spark: SparkSession, sfDir: String,
      table: String): Unit = {
    require(spark.catalog.tableExists(table + "_cent"),
      s"streamingIvfIngest: no stored quantizer ${table}_cent — build " +
        "with IvfIndex.write first (ingest never retrains)")
    vectorIngest(spark, sfDir, table, Seq(table),
      (batch, t) => graft.operators.IvfIndex.append(batch, t))
  }

  /** Streaming SQ8 INDEX INGEST — the online maintenance leg of
    * [[graft.operators.SqIndex]]: arriving vectors are int8-quantized
    * with their own per-vector scale and appended to the bucketed
    * codes table. Like BQ, the representation is doc-local AND
    * stateless (nothing to pre-train, nothing to freeze), so
    * stream-grown ≡ batch-built by construction (spec-gated). Replay
    * ledger + stable checkpoint from the shared loop.
    */
  def streamingSqIngest(spark: SparkSession, sfDir: String,
      table: String,
      dim: Int = graft.operators.AnnIndex.Dim): Unit =
    vectorIngest(spark, sfDir, table, Seq(table, table + "_cfg"),
      (batch, t) => graft.operators.SqIndex.append(batch, t, dim))

  /** Streaming BQ INDEX INGEST — the online maintenance leg of
    * [[graft.operators.BqIndex]]: arriving vectors collapse to their
    * sign-bit signatures and append to the bucketed table. Signatures
    * are doc-local AND stateless (no codebook, no corpus statistics —
    * nothing to freeze), so this is the simplest possible ingest: one
    * table, nothing to pre-train, stream-grown ≡ batch-built by
    * construction (still spec-gated). Replay ledger + stable
    * checkpoint from the shared loop.
    */
  def streamingBqIngest(spark: SparkSession, sfDir: String,
      table: String,
      dim: Int = graft.operators.AnnIndex.Dim): Unit =
    vectorIngest(spark, sfDir, table, Seq(table, table + "_cfg"),
      (batch, t) => graft.operators.BqIndex.append(batch, t, dim))

  /** ONE-CALL DOCUMENT INGEST (VERDICT r12 #7 — "a batch arrived"
    * should be one call, not four): a single file-streamed loop over
    * arriving documents that, per micro-batch and behind ONE ledger,
    *   1. applies the curation gate (TrainingData.curateGate — the
    *      stateless lang+quality filter, one definition with batch);
    *   2. EXACT-DEDUPS against everything already ingested: one
    *      md5(text) hash row per stored doc lives in the bucketed
    *      `<base>_hashes` table, the batch dedups internally
    *      (keep-lowest-doc_id, the q_curate rule) and anti-joins the
    *      store — O(batch) probe against a bucketed scan, never a
    *      corpus rescan, and a redelivered or re-staged document can
    *      never index twice;
    *   3. appends the surviving docs' band rows to `<base>_band`
    *      (near-dup index) and their postings to `<base>_bm25` +
    *      `<base>_bm25_stats` — the same appendBandIndex /
    *      appendBm25Postings definitions batch maintenance uses, so
    *      unified and independent maintenance cannot drift (parity
    *      gated in UnifiedIngestSpec);
    *   4. appends the hash rows, closing the dedup loop.
    * LEGAL HOLDS are filtered FIRST — before the hash dedup, not just
    * inside the member appends (which re-filter as a backstop): a held
    * document must leave NO trace, including the `_hashes` row. If the
    * hash row landed, a deliberately cleared registry (the documented
    * un-hold: drop the table) followed by a re-delivery would be
    * silently skipped as "already ingested" — content lost with no
    * record. Contrast the DELETE contract, where keeping the hash row
    * is the point (a redelivered copy of deleted content must not
    * re-index). Filtered against BOTH member registries; stamp them
    * together with [[holdDocuments]].
    * Atomicity caveat scales with the table count (the
    * streamingAnnIngest note): a crash mid-batch can leave a partial
    * family until the ledger replays; a transactional format closes
    * it. Tables follow the per-process-unique-name contract.
    */
  def streamingDocumentIngest(spark: SparkSession, sfDir: String,
      base: String,
      maintain: Option[graft.operators.TextOps.MaintenancePolicy] =
        None,
      admission: Seq[graft.operators.Quality.Rule] = Nil,
      maxQuarantineRate: Double = 1.0): Unit = {
    require(maxQuarantineRate >= 0.0 && maxQuarantineRate <= 1.0,
      "streamingDocumentIngest: maxQuarantineRate must be in [0, 1]")
    import org.apache.spark.sql.expressions.Window
    val bandT = s"${base}_band"
    val bm25T = s"${base}_bm25"
    val statsT = s"${base}_bm25_stats"
    val hashT = s"${base}_hashes"
    // NOTE: quarantine/admission are deliberately NOT in `refresh` —
    // that list doubles as the reset-membership gate, and pruning an
    // AUDIT sink must never reset the family (they are re-derivable;
    // their caller-session caches refresh explicitly below)
    ledgeredIngest(spark, s"$sfDir/documents.parquet", base,
      refresh = Seq(bandT, bm25T, statsT, hashT),
      append = (batch, _, bid) => {
        val s = batch.sparkSession
        val unheld = graft.operators.TextOps.exceptHeld(
          graft.operators.TextOps.exceptHeld(batch.toDF(), s,
            bm25T + "_hold", "doc_id"),
          s, bandT + "_hold", "doc_id")
        // EXPLICIT admission gate (r17): the declared Quality rules run
        // before the built-in curate gate — every rejected row lands in
        // `<base>_quarantine` NAMED with the rules it failed, and the
        // per-rule counts land in `<base>_admission`, both partitioned
        // by batch id and overwritten per partition, so a ledger replay
        // re-derives its own slice instead of duplicating it (rules are
        // deterministic; the audit trail is idempotent like the index).
        // Audit sinks, not index state: the group backup/snapshot verbs
        // deliberately exclude them (a replay regenerates them).
        val (admitted, annOpt) = admitBatch(s, unheld, admission,
          maxQuarantineRate, base, bid, "streamingDocumentIngest",
          source = Some(batch.toDF()))
        val novel = ingestDoorTrim(s, admitted, hashT)
        try {
          graft.operators.TextOps.appendBandIndex(novel, bandT)
          graft.operators.TextOps.appendBm25Postings(novel, bm25T, statsT)
          appendHashRows(s, novel, hashT)
        } finally {
          novel.unpersist()
          annOpt.foreach(_.unpersist())
          ()
        }
      },
      // the BM25 member carries the family's only corpus stats — the
      // band/hash members are doc-local and self-healing under a
      // tombstone-surviving reset, but the rebuilt stats must be
      // recomputed over the tombstone-filtered postings (ADVICE r13).
      // The sibling CDC upsert stream resets WITH the members
      // (ADVICE r14): the replayed originals are dead under the
      // surviving upsert barriers by design, and only a full CDC
      // replay restores the superseding content.
      onReset = s => {
        graft.operators.TextOps.markBm25ResetReconcile(s, bm25T)
        resetSiblingCdcStream(s, s"${base}_ups")
        // the audit sinks drop with the members: a reset replay may
        // re-batch the files differently (all-in-one batch 0), and a
        // lingering higher-numbered partition from the previous life
        // would read as duplicated audit rows. Re-derivable by design.
        dropAdmissionSinks(s, base)
      },
      afterReplay = s => graft.operators.TextOps
        .reconcileBm25Tombstones(s, bm25T, statsT),
      // per-batch self-maintenance when a policy rides along (r14):
      // the ingest loop compacts/vacuums its own families as their
      // gauges trip, no separate maintenance scheduler required.
      // UNATTENDED folds run under FoldGuard.Anchor (r17): a refusal
      // would crash the batch, and nobody is there to answer it —
      // anchoring keeps both the stream AND any pinned manifest
      // snapshots serving (the operator-facing verbs keep Refuse)
      afterBatch = s => maintain.foreach { p =>
        graft.operators.TextOps.maintainBm25(s, bm25T, p,
          graft.operators.TextOps.FoldGuard.Anchor)
        graft.operators.TextOps.maintainBand(s, bandT, p,
          graft.operators.TextOps.FoldGuard.Anchor)
        ()
      })
    // the hook may have compacted/vacuumed the tombstone lists in the
    // batch session — refresh the caller's view of them too, and of
    // the admission audit sinks (a replay dynamically OVERWRITES their
    // batch partitions; a stale caller listing would read dropped
    // part files)
    (Seq(s"${bm25T}_del", s"${bandT}_del") ++
        (if (admission.nonEmpty)
          Seq(s"${base}_quarantine", s"${base}_admission") else Nil))
      .foreach(t => if (spark.catalog.tableExists(t))
        spark.catalog.refreshTable(t))
  }

  /** ONE-CALL DOCUMENT DELETE — the removal twin of
    * [[streamingDocumentIngest]]: one call tombstones the ids across
    * the family it maintains (band index + BM25 postings, with the
    * exact stats subtraction). The `_hashes` dedup rows are KEPT
    * deliberately: deletion is terminal per id/content (the ingest
    * contract), so a redelivered copy of a deleted document must
    * still be recognized and skipped, not re-indexed.
    */
  def deleteDocuments(spark: SparkSession, base: String,
      ids: org.apache.spark.sql.DataFrame): Unit = {
    graft.operators.TextOps.deleteBandDocs(spark, s"${base}_band", ids)
    graft.operators.TextOps.deleteBm25Docs(spark, s"${base}_bm25",
      s"${base}_bm25_stats", ids)
  }

  /** ONE-CALL DOCUMENT HOLD — the legal-hold twin of
    * [[deleteDocuments]]: stamp the id set into BOTH member
    * registries (`<base>_band_hold`, `<base>_bm25_hold`) so the
    * unified ingest's top-of-loop gate and every member-level
    * append/upsert entry agree. Holds gate INGEST; pair with
    * [[deleteDocuments]] to remove already-indexed content, then
    * vacuum freely — the hold survives the fold. */
  def holdDocuments(spark: SparkSession, base: String,
      ids: org.apache.spark.sql.DataFrame): Unit = {
    graft.operators.TextOps.holdBandDocs(spark, s"${base}_band", ids)
    graft.operators.TextOps.holdBm25Docs(spark, s"${base}_bm25", ids)
    // the hold contract is NO TRACE — and the quarantine audit sinks
    // hold rejected rows' FULL CONTENT. A document quarantined on
    // arrival and legally held afterwards would otherwise keep its
    // text in `<base>_quarantine` for the sink's whole retention
    // (r18). Scrub the held ids from both document-side sinks; the
    // `_admission` METRICS keep their counts (numbers, not content —
    // history stays truthful). Replays stay scrubbed: every gated
    // write path hold-filters BEFORE the gate, so a re-derived slice
    // can never re-admit held content into the audit trail.
    Seq(s"${base}_quarantine", s"${base}_ups_quarantine").foreach { t =>
      scrubQuarantine(spark, t, ids, "doc_id"); ()
    }
  }

  /** Fold both document-index tombstone lists into the stored files. */
  def vacuumDocuments(spark: SparkSession, base: String,
      guard: graft.operators.TextOps.FoldGuard =
        graft.operators.TextOps.FoldGuard.Refuse): Unit = {
    graft.operators.TextOps.vacuumBandIndex(spark, s"${base}_band",
      guard)
    graft.operators.TextOps.vacuumIndex(spark, s"${base}_bm25_del",
      Seq(s"${base}_bm25"), "doc_id", guard)
  }

  /** ONE-CALL VECTOR DELETE — the removal twin of
    * [[streamingAllIndexIngest]]: tombstone the vec_ids across every
    * family the unified ingest maintains. */
  def deleteVectors(spark: SparkSession, base: String,
      ids: org.apache.spark.sql.DataFrame): Unit = {
    graft.operators.AnnIndex.delete(spark, s"${base}_ann", ids)
    graft.operators.BqIndex.delete(spark, s"${base}_bq", ids)
    graft.operators.SqIndex.delete(spark, s"${base}_sq", ids)
    graft.operators.PqIndex.delete(spark, s"${base}_pq", ids)
    graft.operators.IvfIndex.delete(spark, s"${base}_ivf", ids)
  }

  /** ONE-CALL VECTOR HOLD — the legal-hold twin of [[deleteVectors]]:
    * stamp the id set into every family's registry so a held vec_id
    * can never (re-)enter any of the five indexes the unified ingest
    * maintains. */
  def holdVectors(spark: SparkSession, base: String,
      ids: org.apache.spark.sql.DataFrame): Unit = {
    graft.operators.AnnIndex.hold(spark, s"${base}_ann", ids)
    graft.operators.BqIndex.hold(spark, s"${base}_bq", ids)
    graft.operators.SqIndex.hold(spark, s"${base}_sq", ids)
    graft.operators.PqIndex.hold(spark, s"${base}_pq", ids)
    graft.operators.IvfIndex.hold(spark, s"${base}_ivf", ids)
    // no-trace scrub of the vector-side quarantine sinks — the
    // holdDocuments rationale: a quarantined embedding is content too
    Seq(s"${base}_quarantine", s"${base}_vups_quarantine").foreach { t =>
      scrubQuarantine(spark, t, ids, "vec_id"); ()
    }
  }

  /** Fold every vector family's tombstones into the stored files. */
  def vacuumVectors(spark: SparkSession, base: String,
      guard: graft.operators.TextOps.FoldGuard =
        graft.operators.TextOps.FoldGuard.Refuse): Unit = {
    graft.operators.AnnIndex.vacuum(spark, s"${base}_ann", guard)
    graft.operators.BqIndex.vacuum(spark, s"${base}_bq", guard)
    graft.operators.SqIndex.vacuum(spark, s"${base}_sq", guard)
    graft.operators.PqIndex.vacuum(spark, s"${base}_pq", guard)
    graft.operators.IvfIndex.vacuum(spark, s"${base}_ivf", guard)
  }

  // ---- point-in-time backup/restore for stream-fed families (r15) --

  /** The three replay streams a unified DOCUMENT family owes state
    * to: the corpus ingest itself, its CDC upsert twin, its CDC
    * delete twin. Each owns `<name>_ledger` + the `<name>_ck`
    * checkpoint directory. */
  private def docStreams(base: String): Seq[String] =
    Seq(base, s"${base}_ups", s"${base}_dels")

  /** Vector twin of [[docStreams]]. */
  private def vecStreams(base: String): Seq[String] =
    Seq(base, s"${base}_vups", s"${base}_vdels")

  private val vecFamilies = Seq("_ann", "_bq", "_sq", "_pq", "_ivf")

  private def ckDir(spark: SparkSession, name: String) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      name.toLowerCase + "_ck")

  /** Snapshot a stream's checkpoint DIRECTORY to `<ck>_bak_<tag>` —
    * the piece TableOps-level backup can't cover. Checkpoint and
    * ledger are a PAIR ([[ledgeredIngest]]'s reset rationale), so the
    * stream-level verbs always snapshot/restore them together. */
  private[graft] def backupCk(spark: SparkSession, name: String,
      tag: String): Option[String] = {
    val src = ckDir(spark, name)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = src.getFileSystem(conf)
    val dst = new org.apache.hadoop.fs.Path(src.getParent,
      s"${src.getName}_bak_$tag")
    if (fs.exists(src)) {
      // stage the copy, promote by rename (ADVICE r15 #3 applied to
      // the backup side too): a crash mid-copy must never leave a
      // PARTIAL directory under the `_bak_<tag>` name a later restore
      // would trust as complete. The staging dir is swept on re-run
      // and never read by restore.
      val tmp = new org.apache.hadoop.fs.Path(src.getParent,
        s"${src.getName}_bak_${tag}_staging")
      if (fs.exists(tmp)) { fs.delete(tmp, true); () }
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, tmp, false, conf)
      if (fs.exists(dst)) { fs.delete(dst, true); () }
      require(fs.rename(tmp, dst),
        s"backupCk: rename $tmp -> $dst failed")
      Some(dst.toString)
    } else {
      if (fs.exists(dst)) { fs.delete(dst, true); () }
      None
    }
  }

  /** Converge a stream's checkpoint directory to its snapshot:
    * overwrite from the backup copy, or delete it when it has no copy
    * (the stream did not exist at snapshot time — with ledger gone
    * too, a delete/upsert stream replays everything, which is its
    * documented idempotent recovery). */
  private[graft] def restoreCk(spark: SparkSession, name: String,
      tag: String): Option[String] = {
    val live = ckDir(spark, name)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = live.getFileSystem(conf)
    val bak = new org.apache.hadoop.fs.Path(live.getParent,
      s"${live.getName}_bak_$tag")
    val hadLive = fs.exists(live)
    if (fs.exists(bak)) {
      // stage the copy NEXT TO the live directory, then promote by
      // rename (ADVICE r15 #3): the old delete-live-then-copy order
      // left a crash window the LENGTH OF THE COPY with no checkpoint
      // at all — for a vector family (no content-hash dedup) the next
      // stream invocation would replay every source file against the
      // restored members, silently duplicating rows. Now the
      // checkpoint-less window is one delete + one rename, and a
      // crash inside it still converges by re-running the restore
      // (the stale staging dir is swept first).
      val tmp = new org.apache.hadoop.fs.Path(live.getParent,
        s"${live.getName}_restoretmp")
      if (fs.exists(tmp)) { fs.delete(tmp, true); () }
      org.apache.hadoop.fs.FileUtil.copy(fs, bak, fs, tmp, false, conf)
      if (fs.exists(live)) { fs.delete(live, true); () }
      require(fs.rename(tmp, live),
        s"restoreCk: rename $tmp -> $live failed")
      Some(s"restored ck $name")
    } else if (hadLive) {
      fs.delete(live, true)
      Some(s"dropped ck $name (absent at snapshot)")
    } else None
  }

  /** POINT-IN-TIME BACKUP of a unified document family — the
    * stream-aware composition of [[graft.operators.TextOps.backupIndex]]:
    * both member families (band + BM25, every existing sibling), the
    * shared `_hashes` exact-dedup store, and each replay stream's
    * ledger TABLE + checkpoint DIRECTORY as a pair. With the
    * checkpoints inside the snapshot, [[restoreDocuments]] +
    * re-invoking the three streams replays EXACTLY the files that
    * arrived after the snapshot — no duplicate appends (pre-snapshot
    * files stay consumed in the restored checkpoint), no lost CDC
    * (post-snapshot upserts/deletes re-deliver) — converging to the
    * state a never-crashed family would hold. Run it like fsck:
    * between stream invocations (AvailableNow streams terminate per
    * call, so "quiesced" is the natural state) under the build lock.
    * The `_hold` registries stay OUTSIDE ([[graft.operators.TextOps.BackupSiblings]]).
    */
  def backupDocuments(spark: SparkSession, base: String,
      tag: String = "bak", baseTag: Option[String] = None)
      : Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      graft.operators.TextOps.requireTag("backupDocuments", tag)
      require(spark.catalog.tableExists(s"${base}_bm25") ||
        spark.catalog.tableExists(s"${base}_band"),
        s"backupDocuments: no document family at base $base")
      // DIFFERENTIAL group take (r17): each member family diffs
      // against its own family marker under the base group tag; the
      // tiny state tables and checkpoint trees always copy in full
      // (they ARE the deltas). A family present now but absent from
      // the base group takes a full copy.
      baseTag.foreach { b =>
        graft.operators.TextOps.requireTag("backupDocuments(baseTag)",
          b)
        require(spark.catalog.tableExists(s"${base}_dbakok_$b"),
          s"backupDocuments: no committed base group $base/$b to " +
            "diff against")
      }
      // group commit marker (r16, the backupIndex discipline one
      // level up): retired FIRST, written LAST, required by
      // restoreDocuments — a crash anywhere in between leaves a
      // marker-less group restore refuses, never a mix of this
      // tag's fresh copies and a previous take's stale ones
      val marker = s"${base}_dbakok_$tag"
      dropGroupMarker(spark, marker)
      val famBases = Seq(s"${base}_band", s"${base}_bm25")
        .filter(spark.catalog.tableExists)
      val fams = famBases
        .flatMap(f => graft.operators.TextOps.backupIndex(spark, f,
          tag, baseTag.filter(b =>
            spark.catalog.tableExists(s"${f}_bakok_$b"))))
      val state = (s"${base}_hashes" +:
          docStreams(base).map(_ + "_ledger"))
        .flatMap(graft.operators.TextOps.backupTable(spark, _, tag))
      val cks = docStreams(base).flatMap(backupCk(spark, _, tag))
      writeGroupMarker(spark, marker, famBases, tag, state, cks)
      fams ++ state ++ cks :+ marker
    }

  private def dropGroupMarker(spark: SparkSession,
      marker: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $marker")
    graft.operators.TextOps.clearOrphanLocation(spark, marker)
  }

  // ---- stream-level retention (r16): the unified twins of      --
  // ---- listBackups/dropBackup/listSnapshots/dropSnapshot/      --
  // ---- pruneSnapshots — without these, every snapshot cadence  --
  // ---- tag accumulates group markers, member manifests, meta   --
  // ---- copies, ledger copies, and checkpoint backup trees      --
  // ---- FOREVER at the unified level                            --

  /** Drop a unified family's `<tag>` COPY backup group: group marker
    * FIRST (a half-dropped group is a set restore already refuses),
    * then per-family copy sets, state-table copies, and checkpoint
    * backup directories. */
  private def dropStreamBackup(spark: SparkSession, base: String,
      marker: String, fams: Seq[String], tables: Seq[String],
      streams: Seq[String], tag: String): Unit =
    graft.operators.TextOps.withBuildLock(spark) {
      graft.operators.TextOps.requireTag("dropStreamBackup", tag)
      // differential dependents refuse BEFORE the marker drop (r17):
      // the family-level dropBackup would refuse anyway, but after
      // the group marker was gone — leaving a crashed-group state a
      // re-take must clean up. Check first, mutate after.
      val deps = fams.flatMap(f =>
        graft.operators.TextOps.dependentBackups(spark, f, tag))
        .distinct.sorted
      require(deps.isEmpty,
        s"dropStreamBackup: $base/$tag is the differential base of " +
          s"live tag(s) ${deps.mkString(", ")} — drop the " +
          "dependents first")
      dropGroupMarker(spark, marker)
      fams.foreach(graft.operators.TextOps.dropBackup(spark, _, tag))
      tables.foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS ${t}_bak_$tag")
        graft.operators.TextOps.clearOrphanLocation(spark,
          s"${t}_bak_$tag")
      }
      streams.foreach { n =>
        val d = ckDir(spark, n)
        val fs = d.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        // the `_staging` tree too (ADVICE r16 #2): a backupCk that
        // crashed mid-copy leaves it, and only the next backupCk
        // under the SAME tag would sweep it — retiring the tag after
        // a crash must not leak the staging tree forever
        Seq(s"${d.getName}_bak_$tag", s"${d.getName}_bak_${tag}_staging")
          .foreach { name =>
            val p = new org.apache.hadoop.fs.Path(d.getParent, name)
            if (fs.exists(p)) { fs.delete(p, true); () }
          }
      }
    }

  /** [[dropStreamBackup]] for a document base. */
  def dropDocumentsBackup(spark: SparkSession, base: String,
      tag: String = "bak"): Unit =
    dropStreamBackup(spark, base, s"${base}_dbakok_$tag",
      Seq(s"${base}_band", s"${base}_bm25"),
      s"${base}_hashes" +: docStreams(base).map(_ + "_ledger"),
      docStreams(base), tag)

  /** [[dropStreamBackup]] for a vector base. */
  def dropVectorsBackup(spark: SparkSession, base: String,
      tag: String = "bak"): Unit =
    dropStreamBackup(spark, base, s"${base}_vbakok_$tag",
      vecFamilies.map(base + _),
      vecStreams(base).map(_ + "_ledger"),
      vecStreams(base), tag)

  /** COMMITTED copy-backup tags of a unified family, by its group
    * markers (the listBackups convention one level up: a listed tag
    * is restorable; a crashed group's marker-less copies do not
    * list). */
  private def listStreamBackups(spark: SparkSession,
      markerPrefix: String): Seq[String] = {
    val p = markerPrefix.toLowerCase
    spark.sessionState.catalog
      .listTables("default", s"$p*").map(_.table)
      .map(_.stripPrefix(p)).sorted
  }

  def listDocumentsBackups(spark: SparkSession,
      base: String): Seq[String] =
    listStreamBackups(spark, s"${base}_dbakok_")

  def listVectorsBackups(spark: SparkSession,
      base: String): Seq[String] =
    listStreamBackups(spark, s"${base}_vbakok_")

  /** Drop a unified family's `<tag>` MANIFEST snapshot: the stream
    * manifest (the group's commit marker) FIRST, then each member
    * family's manifest + meta copies. */
  private def dropStreamSnapshot(spark: SparkSession, base: String,
      fams: Seq[String], tag: String): Unit =
    graft.operators.TextOps.withBuildLock(spark) {
      dropGroupMarker(spark, s"${base}_mf_$tag")
      fams.foreach(
        graft.operators.TextOps.dropSnapshot(spark, _, tag))
    }

  def dropDocumentsSnapshot(spark: SparkSession, base: String,
      tag: String = "snap"): Unit =
    dropStreamSnapshot(spark, base,
      Seq(s"${base}_band", s"${base}_bm25"), tag)

  def dropVectorsSnapshot(spark: SparkSession, base: String,
      tag: String = "snap"): Unit =
    dropStreamSnapshot(spark, base, vecFamilies.map(base + _), tag)

  /** Repeatable-read serving epoch over a unified DOCUMENT group —
    * [[graft.operators.TextOps.withIndexEpoch]] lifted to the group:
    * one O(metadata) group snapshot pins EVERY member family (band +
    * bm25) at the same instant, `f` serves any number of as-of probes
    * against the tag, the tag retires on the way out. This is the
    * cross-FAMILY consistency a retrieval stack needs: a RAG request
    * that scores bm25 AND near-dups AND rerank must see one corpus
    * state, not whatever each family's last micro-batch left — and
    * the per-batch self-maintenance hooks fold under Anchor, so an
    * epoch taken mid-stream keeps serving across them.
    */
  def withDocumentsEpoch[T](spark: SparkSession, base: String)
      (f: String => T): T = {
    val tag = graft.operators.TextOps.epochTag()
    snapshotDocuments(spark, base, tag)
    try graft.operators.TextOps.withEpochLease(spark, tag)(f(tag))
    finally dropDocumentsSnapshot(spark, base, tag)
  }

  /** [[withDocumentsEpoch]] for a unified vector base: pins every
    * existing compression rung (ann/ivf/pq/bq/sq) under one tag, so a
    * multi-rung probe (IVF route → PQ rerank → exact payload) reads
    * one corpus state end-to-end.
    */
  def withVectorsEpoch[T](spark: SparkSession, base: String)
      (f: String => T): T = {
    val tag = graft.operators.TextOps.epochTag()
    snapshotVectors(spark, base, tag)
    try graft.operators.TextOps.withEpochLease(spark, tag)(f(tag))
    finally dropVectorsSnapshot(spark, base, tag)
  }

  /** [[graft.operators.TextOps.storageBreakdown]] lifted to a unified
    * DOCUMENT group: every member family's full breakdown, plus the
    * group-only storage the family gauge cannot see — live state
    * tables (hash store, ledgers), live checkpoint trees, their
    * per-committed-tag backup copies, the tiny group markers/stream
    * manifests (`group-meta`), and `debris` for marker-less or
    * crashed-staging copies. One frame answers "what is this group
    * costing, and which verb reclaims what".
    */
  def storageBreakdownDocuments(spark: SparkSession,
      base: String): org.apache.spark.sql.DataFrame =
    groupStorageBreakdown(spark, base,
      fams = Seq(s"${base}_band", s"${base}_bm25"),
      tables = s"${base}_hashes" +: docStreams(base).map(_ + "_ledger"),
      streams = docStreams(base),
      committed = listDocumentsBackups(spark, base),
      markerPrefix = s"${base}_dbakok_")

  /** [[storageBreakdownDocuments]] for a unified vector base. */
  def storageBreakdownVectors(spark: SparkSession,
      base: String): org.apache.spark.sql.DataFrame =
    groupStorageBreakdown(spark, base,
      fams = vecFamilies.map(base + _),
      tables = vecStreams(base).map(_ + "_ledger"),
      streams = vecStreams(base),
      committed = listVectorsBackups(spark, base),
      markerPrefix = s"${base}_vbakok_")

  private def groupStorageBreakdown(spark: SparkSession, base: String,
      fams: Seq[String], tables: Seq[String], streams: Seq[String],
      committed: Seq[String], markerPrefix: String)
      : org.apache.spark.sql.DataFrame = {
    import graft.operators.TextOps
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, Long, Long)]
    def add(component: String, tag: String, member: String,
        files: Seq[(String, Long)]): Unit =
      if (files.nonEmpty)
        rows += ((component, tag, member, files.size.toLong,
          files.map(_._2).sum))
    // live state tables + their committed copies + marker-less debris
    val committedSet = committed.toSet
    tables.filter(spark.catalog.tableExists).foreach { t =>
      add("state", "", t, TextOps.listDataFiles(spark, t))
    }
    tables.foreach { t =>
      val prefix = s"${t.toLowerCase}_bak_"
      spark.sessionState.catalog.listTables("default", s"$prefix*")
        .map(_.table).sorted.foreach { c =>
          val tag = c.stripPrefix(prefix)
          add(if (committedSet.contains(tag)) "state-backup"
              else "debris",
            tag, c, TextOps.listDataFiles(spark, c))
        }
    }
    // live checkpoint trees + their backup/staging dirs
    streams.foreach { n =>
      val ck = ckDir(spark, n)
      add("checkpoint", "", ck.getName,
        TextOps.listFilesUnder(spark, ck))
      val fs = ck.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(ck.getParent)) {
        fs.listStatus(ck.getParent).toSeq
          .filter(_.getPath.getName.startsWith(s"${ck.getName}_bak_"))
          .sortBy(_.getPath.getName).foreach { st =>
            val nm = st.getPath.getName
            val tag = nm.stripPrefix(s"${ck.getName}_bak_")
            val comp =
              if (tag.endsWith("_staging")) "debris"
              else if (committedSet.contains(tag)) "ck-backup"
              else "debris"
            add(comp, tag, nm,
              TextOps.listFilesUnder(spark, st.getPath))
          }
      }
    }
    // admission audit sinks (documents groups): re-derivable trails,
    // outside backups by design — but they are bytes the group owns,
    // so the gauge names them with their own reclaim verb
    Seq(s"${base}_quarantine", s"${base}_admission",
      s"${base}_ups_quarantine", s"${base}_ups_admission",
      s"${base}_vups_quarantine", s"${base}_vups_admission")
      .filter(spark.catalog.tableExists)
      .foreach(t => add("audit", "", t,
        TextOps.listDataFiles(spark, t)))
    // the tiny group-level meta: commit markers + stream manifests
    val metaTables =
      committed.map(t => s"$markerPrefix$t".toLowerCase) ++
        spark.sessionState.catalog
          .listTables("default", s"${base.toLowerCase}_mf_*")
          .map(_.table)
    metaTables.filter(spark.catalog.tableExists).foreach(t =>
      add("group-meta", "", t, TextOps.listDataFiles(spark, t)))
    val sp = spark
    import sp.implicits._
    val groupRows = rows.toSeq
      .toDF("component", "tag", "member", "files", "bytes")
    fams.filter(spark.catalog.tableExists)
      .map(TextOps.storageBreakdown(spark, _))
      .foldLeft(groupRows)(_ unionAll _)
      .orderBy("component", "tag", "member")
  }

  /** A unified family's manifest snapshots, NEWEST FIRST — the
    * stream manifest IS the group's tag record, so this is
    * [[graft.operators.TextOps.listSnapshots]] on the base name. */
  def listDocumentsSnapshots(spark: SparkSession,
      base: String): Seq[(String, Long)] =
    graft.operators.TextOps.listSnapshots(spark, base)

  def listVectorsSnapshots(spark: SparkSession,
      base: String): Seq[(String, Long)] =
    graft.operators.TextOps.listSnapshots(spark, base)

  /** RETENTION for a unified family's manifest snapshots: keep the
    * newest `keep`, drop the rest (group manifest, member manifests,
    * meta copies). */
  def pruneDocumentsSnapshots(spark: SparkSession, base: String,
      keep: Int): Seq[String] =
    pruneStreamSnapshots(spark, base,
      Seq(s"${base}_band", s"${base}_bm25"), keep)

  def pruneVectorsSnapshots(spark: SparkSession, base: String,
      keep: Int): Seq[String] =
    pruneStreamSnapshots(spark, base, vecFamilies.map(base + _), keep)

  private def pruneStreamSnapshots(spark: SparkSession, base: String,
      fams: Seq[String], keep: Int): Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      require(keep >= 1, "pruneStreamSnapshots: keep must be >= 1")
      graft.operators.TextOps.listSnapshots(spark, base)
        .drop(keep).map { case (tag, _) =>
          dropStreamSnapshot(spark, base, fams, tag)
          s"dropped snapshot $tag"
        }
    }

  /** AGE-BASED retention twins (r17, VERDICT item 6) — the
    * stream-level siblings of
    * [[graft.operators.TextOps.pruneSnapshotsOlderThan]] /
    * [[graft.operators.TextOps.pruneBackupsOlderThan]]. Ages come
    * from the group manifest / group marker mtimes (the commit-time
    * clock — both are written last); `nowMs` is injectable for
    * determinism. Group backups are always FULL per-family sets, so
    * no differential-dependent check applies at this level — but the
    * per-family [[graft.operators.TextOps.dropBackup]] underneath
    * still refuses if an out-of-band differential borrows from a
    * group tag. */
  def pruneDocumentsSnapshotsOlderThan(spark: SparkSession,
      base: String, olderThanMs: Long,
      nowMs: Long = System.currentTimeMillis()): Seq[String] =
    pruneStreamSnapshotsOlderThan(spark, base,
      Seq(s"${base}_band", s"${base}_bm25"), olderThanMs, nowMs)

  def pruneVectorsSnapshotsOlderThan(spark: SparkSession,
      base: String, olderThanMs: Long,
      nowMs: Long = System.currentTimeMillis()): Seq[String] =
    pruneStreamSnapshotsOlderThan(spark, base,
      vecFamilies.map(base + _), olderThanMs, nowMs)

  private def pruneStreamSnapshotsOlderThan(spark: SparkSession,
      base: String, fams: Seq[String], olderThanMs: Long,
      nowMs: Long): Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      require(olderThanMs >= 0,
        "pruneStreamSnapshotsOlderThan: olderThanMs must be >= 0")
      graft.operators.TextOps.listSnapshots(spark, base)
        .filter { case (_, mtime) => mtime < nowMs - olderThanMs }
        .map { case (tag, _) =>
          dropStreamSnapshot(spark, base, fams, tag)
          s"dropped snapshot $tag"
        }
    }

  /** COMMITTED stream-level backup tags with group-marker mtimes,
    * newest first. */
  private def streamBackupsWithAge(spark: SparkSession,
      markerPrefix: String): Seq[(String, Long)] = {
    val p = markerPrefix.toLowerCase
    spark.sessionState.catalog
      .listTables("default", s"$p*").map(_.table)
      .map { n =>
        val loc = graft.operators.TextOps.tableLocation(spark, n)
        val fs = loc.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        (n.stripPrefix(p), fs.getFileStatus(loc).getModificationTime)
      }
      .sortBy(-_._2)
  }

  def listDocumentsBackupsWithAge(spark: SparkSession,
      base: String): Seq[(String, Long)] =
    streamBackupsWithAge(spark, s"${base}_dbakok_")

  def listVectorsBackupsWithAge(spark: SparkSession,
      base: String): Seq[(String, Long)] =
    streamBackupsWithAge(spark, s"${base}_vbakok_")

  /** Drop each stream-level group tag — EXCEPT a tag whose family
    * copies other live tags still borrow from (a differential base
    * outliving its window is kept with a note; newest-first order
    * clears a fully retired chain in one pass — the family-level
    * pruneBackupTags contract one level up). */
  private def pruneStreamBackupTags(spark: SparkSession,
      fams: Seq[String], tags: Seq[String],
      dropOne: String => Unit): Seq[String] =
    tags.map { tag =>
      val deps = fams.flatMap(f =>
        graft.operators.TextOps.dependentBackups(spark, f, tag))
        .distinct.sorted
      if (deps.nonEmpty)
        s"kept backup $tag: differential base of live tag(s) " +
          deps.mkString(",")
      else {
        dropOne(tag)
        s"dropped backup $tag"
      }
    }

  /** RETENTION for stream-level copy backups: keep the newest
    * `keep` committed group tags. */
  def pruneDocumentsBackups(spark: SparkSession, base: String,
      keep: Int): Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      require(keep >= 1, "pruneDocumentsBackups: keep must be >= 1")
      pruneStreamBackupTags(spark,
        Seq(s"${base}_band", s"${base}_bm25"),
        listDocumentsBackupsWithAge(spark, base).drop(keep).map(_._1),
        dropDocumentsBackup(spark, base, _))
    }

  def pruneVectorsBackups(spark: SparkSession, base: String,
      keep: Int): Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      require(keep >= 1, "pruneVectorsBackups: keep must be >= 1")
      pruneStreamBackupTags(spark, vecFamilies.map(base + _),
        listVectorsBackupsWithAge(spark, base).drop(keep).map(_._1),
        dropVectorsBackup(spark, base, _))
    }

  def pruneDocumentsBackupsOlderThan(spark: SparkSession,
      base: String, olderThanMs: Long,
      nowMs: Long = System.currentTimeMillis()): Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      require(olderThanMs >= 0,
        "pruneDocumentsBackupsOlderThan: olderThanMs must be >= 0")
      pruneStreamBackupTags(spark,
        Seq(s"${base}_band", s"${base}_bm25"),
        listDocumentsBackupsWithAge(spark, base)
          .filter { case (_, mtime) => mtime < nowMs - olderThanMs }
          .map(_._1),
        dropDocumentsBackup(spark, base, _))
    }

  def pruneVectorsBackupsOlderThan(spark: SparkSession,
      base: String, olderThanMs: Long,
      nowMs: Long = System.currentTimeMillis()): Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      require(olderThanMs >= 0,
        "pruneVectorsBackupsOlderThan: olderThanMs must be >= 0")
      pruneStreamBackupTags(spark, vecFamilies.map(base + _),
        listVectorsBackupsWithAge(spark, base)
          .filter { case (_, mtime) => mtime < nowMs - olderThanMs }
          .map(_._1),
        dropVectorsBackup(spark, base, _))
    }

  /** The src-INSENSITIVE content fingerprint of a family's backup
    * commit marker: sha-256 over its sorted (member, path, len) rows.
    * Invariant under [[graft.operators.TextOps.promoteBackup]] (which
    * only clears the src column), changed by any out-of-band family
    * re-take under the same tag — exactly the drift the GROUP marker
    * must catch (a family restore point newer than the ledgers and
    * checkpoints taken with it would replay the wrong window). */
  private def famFingerprint(spark: SparkSession,
      familyMarker: String): (String, Long) = {
    val rows = graft.operators.TextOps
      .readBackupMarker(spark, familyMarker)
      .map { case (m, p, l, _, _) => s"$m|${p.getOrElse("")}|$l" }
      .sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(rows.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    (hex, rows.size.toLong)
  }

  /** Commit a stream-level backup group, LAST: one row per DATA FILE
    * of every state-table copy and checkpoint backup directory
    * ((kind, name, path, len); null-path sentinel for an empty
    * entry), so the marker doubles as the group's integrity
    * manifest — the checkpoint trees especially are many small
    * loss-prone files, and a restore from a damaged copy would
    * silently replay the wrong window. Member FAMILIES are recorded
    * as one `fam` row each — (kind=fam, name=family base,
    * path=[[famFingerprint]], len=marker rows) — because their file
    * identity belongs to the family-level audit (which understands
    * differential borrows and promote materialization); the
    * fingerprint pins the family marker's restore-point CONTENT
    * while staying invariant under
    * [[graft.operators.TextOps.promoteBackup]]. */
  private def writeGroupMarker(spark: SparkSession, marker: String,
      famBases: Seq[String], tag: String,
      tables: Seq[String], cks: Seq[String]): Unit = {
    // state-table and checkpoint rows carry each file's md5 (r17):
    // unlike the family members (hashed while copying), these hash
    // here with one extra read — of copies that are small BY DESIGN
    // (ledgers, hash store, checkpoint logs), so the take stays
    // cheap and the deep audit covers the whole group, not just the
    // families
    def fileRows(kind: String, name: String,
        loc: org.apache.hadoop.fs.Path, files: Seq[(String, Long)]) =
      if (files.isEmpty)
        Seq((kind, name, null: String, 0L, null: String))
      else files.map { case (p, l) => (kind, name, p, l,
        graft.operators.TextOps.hashDataFile(spark, loc, p)) }
    val rows =
      famBases.map { f =>
        val (hex, n) = famFingerprint(spark, s"${f}_bakok_$tag")
        ("fam", f, hex, n, null: String)
      } ++
      tables.flatMap(t => fileRows("table", t,
        graft.operators.TextOps.tableLocation(spark, t),
        graft.operators.TextOps.listDataFiles(spark, t))) ++
      cks.flatMap { p =>
        val root = new org.apache.hadoop.fs.Path(p)
        fileRows("ck", p, root,
          graft.operators.TextOps.listFilesUnder(spark, root))
      }
    val sp = spark
    import sp.implicits._
    rows.toDF("kind", "name", "path", "len", "sha").coalesce(1)
      .write.mode("overwrite").saveAsTable(marker)
  }

  /** READ-ONLY audit of a stream-level copy backup group: the group
    * marker must exist, every state-table copy / checkpoint backup
    * directory it records must still hold EXACTLY the files it
    * committed with ((name, len) identity), every member family it
    * records must still carry a family marker whose
    * [[famFingerprint]] matches the committed one (src-insensitive,
    * so a promote keeps the group green while an out-of-band family
    * re-take under the tag is named), and no unrecorded copy may sit
    * under the tag among the expected names — the ones the restore
    * verbs would resurrect as live members (ADVICE r16 #1). Legacy
    * (pre-fingerprint) group markers that recorded family copies as
    * raw `table` rows keep auditing on raw file identity. All
    * O(metadata). Nil = the group restores as taken. */
  private def checkGroupBackup(spark: SparkSession, marker: String,
      anyCopy: Boolean, tag: String,
      expectedFams: Seq[String] = Nil,
      expectedTables: Seq[String] = Nil,
      expectedCks: Seq[String] = Nil,
      deep: Boolean = false): Seq[String] = {
    if (!spark.catalog.tableExists(marker))
      return Seq(
        if (anyCopy) s"copies exist but no group marker $marker — " +
          "the backup crashed mid-group (or predates the marker, " +
          "r16); re-take it"
        else s"no backup (no group marker $marker)")
    val mdf = spark.table(marker)
    val hasSha = mdf.columns.contains("sha")
    val rawSha = mdf.collect()
      .map(r => ((r.getString(0), r.getString(1)),
        Option(r.getString(2)), r.getLong(3),
        if (hasSha) Option(r.getString(4)) else None))
    val raw = rawSha.map { case (k, p, l, _) => (k, p, l) }
    val fams = raw.collect { case (("fam", f), Some(hex), n) =>
      (f, hex, n) }.toSeq
    val recorded = raw.filterNot(_._1._1 == "fam")
      .groupBy(_._1)
      .map { case (k, rows) =>
        k -> rows.flatMap(r => r._2.map(p => (p, r._3))).toSet
      }
    val recordedNames = recorded.keySet
      .map { case (kind, n) => (kind, n.toLowerCase) } ++
      fams.map { case (f, _, _) => ("fam", f.toLowerCase) }
    // a family is covered when recorded as a fingerprint row (new) or
    // when its base copy appears as a raw table row (legacy marker)
    def famCovered(f: String): Boolean =
      recordedNames(("fam", f.toLowerCase)) ||
        recordedNames(("table", s"${f}_bak_$tag".toLowerCase))
    val famProblems = fams.sortBy(_._1).flatMap { case (f, hex, n) =>
      val fm = s"${f}_bakok_$tag"
      if (!spark.catalog.tableExists(fm))
        Seq(s"$f: family recorded in the group marker but its " +
          s"backup marker $fm is missing")
      else {
        val (nowHex, nowN) = famFingerprint(spark, fm)
        if (nowHex == hex) Nil
        else Seq(s"$f: family backup marker content changed since " +
          s"the group take ($nowN rows now vs $n committed) — " +
          "an out-of-band family re-take under the tag? The group's " +
          "ledgers and checkpoints no longer pair with it; re-take " +
          "the group")
      }
    }
    val famExtras = expectedFams.filterNot(famCovered).flatMap { f =>
      (f +: graft.operators.TextOps.BackupSiblings.map(f + _))
        .map(m => s"${m}_bak_$tag")
        .filter(spark.catalog.tableExists)
        .map(c => s"$c: copy exists but its family is not in the " +
          "group marker (restore would resurrect it as a member) — " +
          "re-take the backup")
    }
    val tableExtras = expectedTables
      .filter(t => spark.catalog.tableExists(t) &&
        !recordedNames(("table", t.toLowerCase)))
      .map(t => s"$t: copy exists but is not in the group marker " +
        "(restore would resurrect it as a member) — re-take the " +
        "backup")
    val ckExtras = expectedCks.filter { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(path) && !recordedNames(("ck", p.toLowerCase))
    }.map(p => s"$p: checkpoint backup exists but is not in the " +
      "group marker (restore would resurrect it) — re-take the " +
      "backup")
    // DEEP pass (opt-in, r17): re-hash every recorded state-table /
    // checkpoint file against its take-time md5 — same-length bit
    // rot inside a committed copy is invisible to the (name, len)
    // identity above. Family members deep-audit via the per-family
    // chain audit the public twins append; a pre-hash (legacy) row
    // is NAMED unverifiable, never silently skipped.
    val deepProblems =
      if (!deep) Nil
      else {
        val gathered = rawSha.toSeq.filterNot(_._1._1 == "fam")
          .collect { case ((kind, n), Some(p), _, sha) =>
            (kind, n, p, sha) }
          .sortBy(r => (r._2, r._3))
          .flatMap { case (kind, n, p, sha) =>
            val root: Option[org.apache.hadoop.fs.Path] = kind match {
              case "table" =>
                if (spark.catalog.tableExists(n))
                  Some(graft.operators.TextOps
                    .tableLocation(spark, n))
                else None
              case _ =>
                val path = new org.apache.hadoop.fs.Path(n)
                if (path.getFileSystem(
                    spark.sparkContext.hadoopConfiguration)
                    .exists(path))
                  Some(path)
                else None
            }
            root.toSeq.flatMap { loc =>
              sha match {
                case None => Seq(Left(s"$n: $p has no recorded " +
                  "content hash (pre-hash group marker) — deep " +
                  "audit cannot verify it; re-take the backup"))
                case Some(h) =>
                  val fs = loc.getFileSystem(
                    spark.sparkContext.hadoopConfiguration)
                  if (!fs.exists(
                      new org.apache.hadoop.fs.Path(loc, p)))
                    Nil // missing = the shallow pass's finding
                  else Seq(Right((n, p, loc.toString, h)))
              }
            }
          }
        // one distributed re-hash job ([[graft.operators.TextOps
        // .hashFilesDistributed]] — the at-scale deep-read path)
        val got = graft.operators.TextOps.hashFilesDistributed(spark,
          gathered.collect { case Right((_, p, loc, _)) => (loc, p) })
        gathered.flatMap {
          case Left(msg) => Seq(msg)
          case Right((n, p, loc, h)) =>
            if (got((loc, p)) == h) Nil
            else Seq(s"$n: $p content mismatch (recorded md5 $h, " +
              s"found ${got((loc, p))} — bit rot or tamper at " +
              "unchanged length); re-take the backup")
        }
      }
    deepProblems ++ famProblems ++
    recorded.toSeq.sortBy(_._1).flatMap { case ((kind, n), files) =>
      val now: Option[Set[(String, Long)]] = kind match {
        case "table" =>
          if (spark.catalog.tableExists(n))
            Some(graft.operators.TextOps.listDataFiles(spark, n).toSet)
          else None
        case _ =>
          val path = new org.apache.hadoop.fs.Path(n)
          val fs = path.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          if (fs.exists(path))
            Some(graft.operators.TextOps
              .listFilesUnder(spark, path).toSet)
          else None
      }
      now match {
        case None =>
          Seq(s"$n: recorded in the group marker but missing")
        case Some(cur) =>
          (files -- cur).toSeq.sorted.map { case (p, l) =>
            s"$n: committed file $p ($l bytes) lost or changed " +
              "since the backup"
          } ++
          (cur -- files).toSeq.sorted.map { case (p, _) =>
            s"$n: file $p not in the group marker (written into " +
              "the copy after commit?)"
          }
      }
    } ++ famExtras ++ tableExtras ++ ckExtras
  }

  /** The copy names a document-group restore would resurrect —
    * [[checkGroupBackup]]'s extras universe: the state-table copies
    * and the checkpoint backup dirs (member-family copies are
    * checked via their `fam` rows + the family-level audit). */
  private def expectedGroupCopies(spark: SparkSession,
      tables: Seq[String], streams: Seq[String],
      tag: String): (Seq[String], Seq[String]) = {
    val tbls = tables.map(t => s"${t}_bak_$tag")
    val cks = streams.map { n =>
      val d = ckDir(spark, n)
      new org.apache.hadoop.fs.Path(d.getParent,
        s"${d.getName}_bak_$tag").toString
    }
    (tbls, cks)
  }

  /** [[checkGroupBackup]] for a unified document base. `deep` adds
    * the opt-in O(bytes) content re-hash, group rows AND member
    * families (the family-level `checkBackup(deep)` contract). */
  def checkDocumentsBackup(spark: SparkSession, base: String,
      tag: String = "bak", deep: Boolean = false): Seq[String] = {
    graft.operators.TextOps.requireTag("checkDocumentsBackup", tag)
    val (tbls, cks) = expectedGroupCopies(spark,
      s"${base}_hashes" +: docStreams(base).map(_ + "_ledger"),
      docStreams(base), tag)
    checkGroupBackup(spark, s"${base}_dbakok_$tag",
      anyCopy = Seq(s"${base}_bm25", s"${base}_band")
        .exists(f => spark.catalog.tableExists(s"${f}_bak_$tag")),
      tag = tag,
      expectedFams = Seq(s"${base}_band", s"${base}_bm25"),
      expectedTables = tbls, expectedCks = cks, deep = deep) ++
      // per-family chain audit (r17): a differential family copy's
      // BORROWED files live in base tags' copies the group marker
      // never recorded — the family-level audit covers them
      Seq(s"${base}_band", s"${base}_bm25")
        .filter(f => spark.catalog.tableExists(s"${f}_bakok_$tag"))
        .flatMap(f => graft.operators.TextOps.checkBackup(spark, f,
          tag, deep))
  }

  /** [[checkGroupBackup]] for a unified vector base (`deep` as in
    * [[checkDocumentsBackup]]). */
  def checkVectorsBackup(spark: SparkSession, base: String,
      tag: String = "bak", deep: Boolean = false): Seq[String] = {
    graft.operators.TextOps.requireTag("checkVectorsBackup", tag)
    val (tbls, cks) = expectedGroupCopies(spark,
      vecStreams(base).map(_ + "_ledger"),
      vecStreams(base), tag)
    checkGroupBackup(spark, s"${base}_vbakok_$tag",
      anyCopy = vecFamilies.exists(f =>
        spark.catalog.tableExists(s"$base${f}_bak_$tag")),
      tag = tag,
      expectedFams = vecFamilies.map(base + _),
      expectedTables = tbls, expectedCks = cks, deep = deep) ++
      // per-family chain audit (r17): see checkDocumentsBackup
      vecFamilies.map(base + _)
        .filter(f => spark.catalog.tableExists(s"${f}_bakok_$tag"))
        .flatMap(f => graft.operators.TextOps.checkBackup(spark, f,
          tag, deep))
  }

  /** RESTORE a unified document family to its `<tag>` snapshot —
    * members, hash store, ledgers and checkpoints together (see
    * [[backupDocuments]] for why re-invoking the streams afterwards
    * converges on the never-crashed state). Members, ledgers or
    * checkpoints created AFTER the snapshot are dropped; the `_hold`
    * registries are never touched. Refuses before mutating anything
    * without the snapshot. */
  def restoreDocuments(spark: SparkSession, base: String,
      tag: String = "bak"): Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      val anyCopy = spark.catalog.tableExists(s"${base}_bm25_bak_$tag") ||
        spark.catalog.tableExists(s"${base}_band_bak_$tag")
      require(spark.catalog.tableExists(s"${base}_dbakok_$tag") ||
          !anyCopy,
        s"restoreDocuments: backup $base/$tag has copies but no " +
          "group marker — the backup crashed mid-group (or predates " +
          "the marker, r16); re-take it")
      require(anyCopy,
        s"restoreDocuments: no backup for base $base tag $tag — " +
          "refusing to touch the live family without its snapshot")
      // the full audit incl. the extras pass: an out-of-band copy
      // under the tag would be resurrected as a member by the
      // restoreTable sweep below
      val audit = checkDocumentsBackup(spark, base, tag)
      require(audit.isEmpty,
        s"restoreDocuments: backup $base/$tag failed its integrity " +
          s"audit — ${audit.take(5).mkString("; ")}" +
          (if (audit.size > 5) s" (+${audit.size - 5} more)" else "") +
          " — re-take the backup")
      // family members restore through the marker-aware family verb
      // (r17): a differential family copy resolves its borrowed
      // files across the base tags' copies; a family with no marker
      // under the tag did not exist at snapshot — its live members
      // drop (the restoreTable absence contract, kept verbatim)
      val members = Seq(s"${base}_band", s"${base}_bm25").flatMap { f =>
        if (spark.catalog.tableExists(s"${f}_bakok_$tag"))
          graft.operators.TextOps.restoreIndex(spark, f, tag)
        else
          (f +: graft.operators.TextOps.BackupSiblings.map(f + _))
            .flatMap(graft.operators.TextOps
              .restoreTable(spark, _, tag))
      }
      val state = (s"${base}_hashes" +:
          docStreams(base).map(_ + "_ledger"))
        .flatMap(graft.operators.TextOps.restoreTable(spark, _, tag))
      val cks = docStreams(base).flatMap(restoreCk(spark, _, tag))
      members ++ state ++ cks
    }

  /** POINT-IN-TIME BACKUP of a unified vector family: every existing
    * member family (ANN band+payload, BQ, SQ8, PQ incl. codebook, IVF
    * incl. centroids — [[graft.operators.TextOps.BackupSiblings]]
    * covers the trained artifacts) plus the ingest/CDC ledgers and
    * checkpoints as pairs. Same replay-convergence contract as
    * [[backupDocuments]] — and for vectors the checkpoint-in-snapshot
    * design is what makes restore SAFE at all: vector appends have no
    * content-hash dedup, so a full replay against restored members
    * would duplicate rows; the restored checkpoint replays only
    * post-snapshot files. */
  def backupVectors(spark: SparkSession, base: String,
      tag: String = "bak", baseTag: Option[String] = None)
      : Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      graft.operators.TextOps.requireTag("backupVectors", tag)
      val fams = vecFamilies.map(base + _)
        .filter(spark.catalog.tableExists)
      require(fams.nonEmpty,
        s"backupVectors: no vector family at base $base")
      // differential group take (r17): see backupDocuments
      baseTag.foreach { b =>
        graft.operators.TextOps.requireTag("backupVectors(baseTag)", b)
        require(spark.catalog.tableExists(s"${base}_vbakok_$b"),
          s"backupVectors: no committed base group $base/$b to " +
            "diff against")
      }
      // group marker: retired first, written last (see
      // backupDocuments)
      val marker = s"${base}_vbakok_$tag"
      dropGroupMarker(spark, marker)
      val members =
        fams.flatMap(f => graft.operators.TextOps.backupIndex(spark,
          f, tag, baseTag.filter(b =>
            spark.catalog.tableExists(s"${f}_bakok_$b"))))
      val state = vecStreams(base).map(_ + "_ledger")
        .flatMap(graft.operators.TextOps.backupTable(spark, _, tag))
      val cks = vecStreams(base).flatMap(backupCk(spark, _, tag))
      writeGroupMarker(spark, marker, fams, tag, state, cks)
      members ++ state ++ cks :+ marker
    }

  /** RESTORE a unified vector family to its `<tag>` snapshot; the
    * vector twin of [[restoreDocuments]]. */
  def restoreVectors(spark: SparkSession, base: String,
      tag: String = "bak"): Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      val anyCopy = vecFamilies.exists(f =>
        spark.catalog.tableExists(s"$base${f}_bak_$tag"))
      require(spark.catalog.tableExists(s"${base}_vbakok_$tag") ||
          !anyCopy,
        s"restoreVectors: backup $base/$tag has copies but no group " +
          "marker — the backup crashed mid-group (or predates the " +
          "marker, r16); re-take it")
      require(anyCopy,
        s"restoreVectors: no backup for base $base tag $tag — " +
          "refusing to touch the live family without its snapshot")
      // full audit incl. the extras pass (see restoreDocuments)
      val audit = checkVectorsBackup(spark, base, tag)
      require(audit.isEmpty,
        s"restoreVectors: backup $base/$tag failed its integrity " +
          s"audit — ${audit.take(5).mkString("; ")}" +
          (if (audit.size > 5) s" (+${audit.size - 5} more)" else "") +
          " — re-take the backup")
      // marker-aware family restore (r17): see restoreDocuments
      val members = vecFamilies.map(base + _).flatMap { f =>
        if (spark.catalog.tableExists(s"${f}_bakok_$tag"))
          graft.operators.TextOps.restoreIndex(spark, f, tag)
        else
          (f +: graft.operators.TextOps.BackupSiblings.map(f + _))
            .flatMap(graft.operators.TextOps
              .restoreTable(spark, _, tag))
      }
      val state = vecStreams(base).map(_ + "_ledger")
        .flatMap(graft.operators.TextOps.restoreTable(spark, _, tag))
      val cks = vecStreams(base).flatMap(restoreCk(spark, _, tag))
      members ++ state ++ cks
    }

  /** PROMOTE a unified family's differential group to self-contained:
    * [[graft.operators.TextOps.promoteBackup]] for every member
    * family committed under the tag. State-table copies and
    * checkpoint trees were already taken in full (they ARE the
    * deltas), so nothing else moves; the group marker's family rows
    * are src-insensitive fingerprints ([[famFingerprint]]), so it
    * stays valid as-is — no group rewrite, no crash window at this
    * level, and the group audit is green at EVERY point of a promote
    * (finished or crashed mid-way). Afterwards the
    * group's base tag drops clean ([[dropDocumentsBackup]] /
    * [[dropVectorsBackup]] stop refusing) and the stream-level
    * pruners stop holding it back. */
  private def promoteStreamBackup(spark: SparkSession, verb: String,
      marker: String, fams: Seq[String], tag: String): Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      graft.operators.TextOps.requireTag(verb, tag)
      require(spark.catalog.tableExists(marker),
        s"$verb: no committed backup group marker $marker — " +
          "a crashed group re-takes, it does not promote")
      fams.filter(f =>
          spark.catalog.tableExists(s"${f}_bakok_$tag"))
        .flatMap(f =>
          graft.operators.TextOps.promoteBackup(spark, f, tag))
    }

  /** [[promoteStreamBackup]] for a document base. */
  def promoteDocuments(spark: SparkSession, base: String,
      tag: String = "bak"): Seq[String] =
    promoteStreamBackup(spark, "promoteDocuments",
      s"${base}_dbakok_$tag", Seq(s"${base}_band", s"${base}_bm25"),
      tag)

  /** [[promoteStreamBackup]] for a vector base. */
  def promoteVectors(spark: SparkSession, base: String,
      tag: String = "bak"): Seq[String] =
    promoteStreamBackup(spark, "promoteVectors",
      s"${base}_vbakok_$tag", vecFamilies.map(base + _), tag)

  /** [[graft.operators.TextOps.restoreIndexAs]] lifted to a unified
    * group — the drill / branch twin of the in-place group restore:
    * build SCRATCH member families at `asBase` from the committed
    * `<tag>` group backup, live group and backup untouched. SERVING
    * side only, by design: the member families restore (differential
    * chains resolved, per-family integrity audited, clobber refused
    * per member by the family verb); the hash store, replay ledgers,
    * and checkpoint trees do NOT ride along — a branch serves
    * probes, it does not ingest, and resuming streams under a
    * different base is not a meaningful operation
    * ([[restoreDocuments]] is the recovery verb). Group-committed
    * sets only: the group marker is required, so a crashed group
    * take cannot be drilled into a frankenstein branch. */
  private def restoreStreamFamilyAs(spark: SparkSession, base: String,
      tag: String, asBase: String, sufs: Seq[String], marker: String,
      what: String): Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      graft.operators.TextOps.requireTag(what, tag)
      require(asBase != base,
        s"$what: asBase must differ from the live base (use the " +
          "in-place group restore to converge)")
      require(spark.catalog.tableExists(marker),
        s"$what: no committed group backup $base/$tag (marker " +
          s"$marker absent) — nothing to drill")
      val present = sufs.map(base + _).filter(f =>
        spark.catalog.tableExists(s"${f}_bakok_$tag"))
      require(present.nonEmpty,
        s"$what: group $base/$tag records no member-family backups")
      present.flatMap { f =>
        graft.operators.TextOps.restoreIndexAs(spark, f, tag,
          asBase + f.stripPrefix(base))
      }
    }

  /** [[restoreStreamFamilyAs]] for a document base. */
  def restoreDocumentsAs(spark: SparkSession, base: String,
      tag: String, asBase: String): Seq[String] =
    restoreStreamFamilyAs(spark, base, tag, asBase,
      Seq("_band", "_bm25"), s"${base}_dbakok_$tag",
      "restoreDocumentsAs")

  /** [[restoreStreamFamilyAs]] for a vector base. */
  def restoreVectorsAs(spark: SparkSession, base: String,
      tag: String, asBase: String): Seq[String] =
    restoreStreamFamilyAs(spark, base, tag, asBase, vecFamilies,
      s"${base}_vbakok_$tag", "restoreVectorsAs")

  // ---- O(metadata) stream-level snapshots (r15): manifest twins --
  // ---- of backupDocuments/backupVectors for append windows      --

  /** The stream-state manifest rows for a set of append-only tables
    * (hash store, replay ledgers) and checkpoint DIRECTORIES: entry
    * name → (relative path, length), null-path sentinel for a
    * present-but-empty entry. Written to `<base>_mf_<tag>`. */
  private def writeStreamManifest(spark: SparkSession, mf: String,
      tables: Seq[String], streams: Seq[String]): Seq[String] = {
    val tblRows = tables.filter(spark.catalog.tableExists).flatMap { m =>
      val files = graft.operators.TextOps.listDataFiles(spark, m)
      if (files.isEmpty) Seq((m, null: String, 0L))
      else files.map { case (p, l) => (m, p, l) }
    }
    val ckRows = streams.flatMap { n =>
      val dir = ckDir(spark, n)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(dir)) Seq.empty
      else {
        val files = graft.operators.TextOps.listFilesUnder(spark, dir)
        if (files.isEmpty) Seq((dir.getName, null: String, 0L))
        else files.map { case (p, l) => (dir.getName, p, l) }
      }
    }
    val rows = tblRows ++ ckRows
    spark.sql(s"DROP TABLE IF EXISTS $mf")
    graft.operators.TextOps.clearOrphanLocation(spark, mf)
    val sp = spark
    import sp.implicits._
    rows.toDF("member", "path", "len").coalesce(1).write.saveAsTable(mf)
    Seq(s"manifest $mf: ${rows.count(_._2 != null)} stream-state " +
      s"files across ${rows.map(_._1).distinct.size} entries")
  }

  /** `locate` for stream-state manifest entries: a `<stream>_ck`
    * entry resolves to the checkpoint directory, anything else to
    * its table location. */
  private def streamLocate(spark: SparkSession, streams: Seq[String])
      : String => Option[org.apache.hadoop.fs.Path] = {
    val cks = streams.map(n => ckDir(spark, n).getName -> n).toMap
    m => cks.get(m) match {
      case Some(n) =>
        val d = ckDir(spark, n)
        val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(d)) Some(d) else None
      case None => graft.operators.TextOps.locateTable(spark)(m)
    }
  }

  private def snapshotStreamFamily(spark: SparkSession, base: String,
      tag: String, fams: Seq[String], tables: Seq[String],
      streams: Seq[String], what: String): Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      graft.operators.TextOps.requireTag(what, tag)
      val present = fams.filter(spark.catalog.tableExists)
      require(present.nonEmpty, s"$what: no family at base $base")
      // the stream manifest is the GROUP's commit marker (required by
      // the restore, written last) — retire it before re-snapshotting
      // the member families, so a crashed re-take never leaves the
      // previous group manifest over fresh member snapshots (r16)
      dropGroupMarker(spark, s"${base}_mf_$tag")
      present.flatMap(
        graft.operators.TextOps.snapshotIndex(spark, _, tag)) ++
        writeStreamManifest(spark, s"${base}_mf_$tag", tables, streams)
    }

  private def restoreStreamFamilySnapshot(spark: SparkSession,
      base: String, tag: String, fams: Seq[String],
      tables: Seq[String], streams: Seq[String],
      what: String): Seq[String] =
    graft.operators.TextOps.withBuildLock(spark) {
      graft.operators.TextOps.requireTag(what, tag)
      val mfT = s"${base}_mf_$tag"
      require(spark.catalog.tableExists(mfT),
        s"$what: no stream manifest $mfT — refusing to touch the " +
          "live family without its snapshot")
      val snapped = fams.filter(f =>
        spark.catalog.tableExists(s"${f}_mf_$tag"))
      require(snapped.nonEmpty,
        s"$what: no member-family manifests under tag $tag")
      // GLOBAL phase 1 — every member family AND the stream state
      // validate before anything mutates, so a refusal can never
      // leave a half-restored group (family A pruned, family B's
      // compaction refused)
      val loc = streamLocate(spark, streams)
      val sm = graft.operators.TextOps.readManifest(spark, mfT)
      val problems = snapped.flatMap(f =>
        graft.operators.TextOps.manifestProblems(spark,
          graft.operators.TextOps.readManifest(spark, s"${f}_mf_$tag"),
          graft.operators.TextOps.locateTable(spark))) ++
        graft.operators.TextOps.manifestProblems(spark, sm, loc)
      require(problems.isEmpty,
        s"$what: history was rewritten since the snapshot — " +
          s"${problems.take(5).mkString("; ")}" +
          (if (problems.size > 5) s" (+${problems.size - 5} more)"
          else "") + " — file pruning cannot converge; use the " +
          "copy-based stream backup/restore pair")
      // phase 2 — member families (their own validation re-passes),
      // then the stream state: prune manifest entries, remove
      // entries born after the snapshot (ledger + checkpoint rewind
      // as a PAIR, the ledgeredIngest contract)
      val famOut = snapped.flatMap(
        graft.operators.TextOps.restoreSnapshot(spark, _, tag))
      val pruned = graft.operators.TextOps.pruneToManifest(spark, sm,
        loc, m => if (spark.catalog.tableExists(m))
          spark.catalog.refreshTable(m))
      val droppedT = tables.filterNot(sm.contains)
        .filter(spark.catalog.tableExists).map { m =>
          spark.sql(s"DROP TABLE $m")
          s"dropped $m (absent at snapshot)"
        }
      val droppedCk = streams.map(n => ckDir(spark, n))
        .filter(d => !sm.contains(d.getName))
        .filter(d => d.getFileSystem(
          spark.sparkContext.hadoopConfiguration).exists(d))
        .map { d =>
          d.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(d, true)
          s"deleted ck ${d.getName} (absent at snapshot)"
        }
      // a whole member FAMILY born after the snapshot (no manifest
      // under this tag) converges by dropping — same absence
      // contract as a member table, one level up
      val droppedFams = fams.filterNot(snapped.contains).flatMap(f =>
        (f +: graft.operators.TextOps.BackupSiblings.map(f + _))
          .filter(spark.catalog.tableExists)
          .map { m =>
            spark.sql(s"DROP TABLE $m")
            s"dropped $m (family absent at snapshot)"
          })
      famOut ++ pruned ++ droppedT ++ droppedCk ++ droppedFams
    }

  /** O(METADATA) SNAPSHOT of a unified document family — the
    * manifest twin of [[backupDocuments]] for append-dominated
    * windows: member families via
    * [[graft.operators.TextOps.snapshotIndex]] (file manifests +
    * O(1) copies of the rewritten-in-place stats/config members),
    * PLUS a stream-state manifest over the hash store, the replay
    * ledgers, and the checkpoint DIRECTORIES — ledger and checkpoint
    * snapshot as a pair, so [[restoreDocumentsSnapshot]] keeps the
    * replay-exactness contract the copy-based twins prove
    * (StreamRestoreSpec): re-invoking the streams after a restore
    * replays exactly the post-snapshot files. Checkpoint logs are
    * write-once per batch, so they manifest like data files; a
    * stream-log compaction (like a member compaction) makes the
    * manifest unrestorable and the restore refuses to the copy-based
    * pair. */
  def snapshotDocuments(spark: SparkSession, base: String,
      tag: String = "snap"): Seq[String] =
    snapshotStreamFamily(spark, base, tag,
      fams = Seq(s"${base}_band", s"${base}_bm25"),
      tables = s"${base}_hashes" +: docStreams(base).map(_ + "_ledger"),
      streams = docStreams(base), what = "snapshotDocuments")

  /** Converge a unified document family to its `<tag>` manifest
    * snapshot — all member families and the stream state validate
    * BEFORE anything mutates (no half-restored groups), then prune.
    * Refuses to the copy-based pair when history was rewritten. */
  def restoreDocumentsSnapshot(spark: SparkSession, base: String,
      tag: String = "snap"): Seq[String] =
    restoreStreamFamilySnapshot(spark, base, tag,
      fams = Seq(s"${base}_band", s"${base}_bm25"),
      tables = s"${base}_hashes" +: docStreams(base).map(_ + "_ledger"),
      streams = docStreams(base), what = "restoreDocumentsSnapshot")

  /** READ-ONLY restorability audit of a stream-level snapshot — the
    * unified twin of [[graft.operators.TextOps.checkSnapshot]]: every
    * member family's file manifest + meta copies, plus the
    * stream-state manifest (hash store, ledgers, checkpoints). Run it
    * on the snapshot cadence; a maintenance fold or a stream-log
    * compaction flips a family to non-restorable, which should be
    * discovered NOW, not on recovery day. Nil = restores clean. */
  def checkDocumentsSnapshot(spark: SparkSession, base: String,
      tag: String = "snap"): Seq[String] =
    streamSnapshotProblems(spark, base, tag,
      Seq(s"${base}_band", s"${base}_bm25"), docStreams(base))

  /** [[checkDocumentsSnapshot]] for a unified vector base. */
  def checkVectorsSnapshot(spark: SparkSession, base: String,
      tag: String = "snap"): Seq[String] =
    streamSnapshotProblems(spark, base, tag,
      vecFamilies.map(base + _), vecStreams(base))

  private def streamSnapshotProblems(spark: SparkSession, base: String,
      tag: String, fams: Seq[String],
      streams: Seq[String]): Seq[String] = {
    val mfT = s"${base}_mf_$tag"
    if (!spark.catalog.tableExists(mfT))
      return Seq(s"no stream manifest $mfT")
    val snapped = fams.filter(f =>
      spark.catalog.tableExists(s"${f}_mf_$tag"))
    val header =
      if (snapped.isEmpty)
        Seq(s"no member-family manifests under tag $tag")
      else Seq.empty[String]
    header ++
      snapped.flatMap(f =>
        graft.operators.TextOps.checkSnapshot(spark, f, tag)) ++
      graft.operators.TextOps.manifestProblems(spark,
        graft.operators.TextOps.readManifest(spark, mfT),
        streamLocate(spark, streams))
  }

  /** [[snapshotDocuments]] for a unified vector base: every existing
    * member family + the vector streams' ledgers and checkpoints. */
  def snapshotVectors(spark: SparkSession, base: String,
      tag: String = "snap"): Seq[String] =
    snapshotStreamFamily(spark, base, tag,
      fams = vecFamilies.map(base + _),
      tables = vecStreams(base).map(_ + "_ledger"),
      streams = vecStreams(base), what = "snapshotVectors")

  /** [[restoreDocumentsSnapshot]] for a unified vector base. */
  def restoreVectorsSnapshot(spark: SparkSession, base: String,
      tag: String = "snap"): Seq[String] =
    restoreStreamFamilySnapshot(spark, base, tag,
      fams = vecFamilies.map(base + _),
      tables = vecStreams(base).map(_ + "_ledger"),
      streams = vecStreams(base), what = "restoreVectorsSnapshot")

  // ---- one-call observe/audit/heal twins (r15): the unified verb --
  // ---- table is TOTAL - ingest/upsert/delete/vacuum/hold/backup/ --
  // ---- restore all had one-call twins; these close the last rows --

  /** One-call [[graft.operators.TextOps.describeBm25]]/`describeBand`
    * over a unified document family: member-family name → status. */
  def describeDocuments(spark: SparkSession,
      base: String): Map[String, graft.operators.TextOps.IndexStatus] =
    Map(
      s"${base}_band" ->
        graft.operators.TextOps.describeBand(spark, s"${base}_band"),
      s"${base}_bm25" ->
        graft.operators.TextOps.describeBm25(spark, s"${base}_bm25"))

  /** One-call cadence advisory over a unified document family: each
    * member's `due()` prefixed with its family, PLUS the
    * admission-drift advisory — a rule whose latest-batch violation
    * rate broke out of its own trailing baseline ([[admissionDrift]])
    * is upstream trouble the maintenance cadence should surface
    * without a separate dashboard, and it belongs HERE because the
    * response is operational (inspect the quarantine, fix the feed)
    * before the poisoned-feed valve ever trips. Nil = nothing due.
    */
  def dueDocuments(spark: SparkSession, base: String,
      policy: graft.operators.TextOps.MaintenancePolicy =
        graft.operators.TextOps.MaintenancePolicy()): Seq[String] = {
    val members = describeDocuments(spark, base).toSeq.sortBy(_._1)
      .flatMap { case (m, st) => st.due(policy).map(v => s"$m: $v") }
    members ++ driftAdvisories(spark, base,
      Seq(s"${base}_admission" -> s"${base}_quarantine",
        s"${base}_ups_admission" -> s"${base}_ups_quarantine")) ++
      backlogAdvisories(spark,
        Seq(s"${base}_quarantine", s"${base}_ups_quarantine"))
  }

  /** [[dueDocuments]] for a unified vector base — the vector gate's
    * histories (unified ingest + the `_vups` CDC stream). */
  def dueVectors(spark: SparkSession, base: String,
      policy: graft.operators.TextOps.MaintenancePolicy =
        graft.operators.TextOps.MaintenancePolicy()): Seq[String] =
    describeVectors(spark, base).toSeq.sortBy(_._1)
      .flatMap { case (m, st) => st.due(policy).map(v => s"$m: $v") } ++
      driftAdvisories(spark, base,
        Seq(s"${base}_admission" -> s"${base}_quarantine",
          s"${base}_vups_admission" -> s"${base}_vups_quarantine")) ++
      backlogAdvisories(spark,
        Seq(s"${base}_quarantine", s"${base}_vups_quarantine"))

  /** Quarantine-backlog advisories for the due() cadence (r18):
    * quarantined rows are evidence, but rows that SIT there are also
    * unworked remediation — the cadence check names the backlog and
    * the verb that clears it, the same way fold/compaction debt is
    * named with its verb. Empty or absent sinks are silent. */
  private def backlogAdvisories(spark: SparkSession,
      sinks: Seq[String]): Seq[String] =
    sinks.filter(spark.catalog.tableExists).flatMap { q =>
      val agg = spark.table(q)
        .agg(count(lit(1)), countDistinct(col("_batch"))).head
      if (agg.getLong(0) == 0L) Nil
      else Seq(s"remediate-quarantine:$q rows=${agg.getLong(0)} " +
        s"batches=${agg.getLong(1)}")
    }

  /** The admission-drift advisories for a set of (admission sink,
    * quarantine sink) histories — separate ledgers keep separate
    * batch-id spaces and therefore separate baselines. */
  private def driftAdvisories(spark: SparkSession, base: String,
      sinks: Seq[(String, String)]): Seq[String] =
    sinks.filter { case (a, _) => spark.catalog.tableExists(a) }
      .flatMap { case (a, q) =>
        val d = admissionDrift(spark, base, sink = Some(a))
        val latest = d.agg(max("batch")).head
        if (latest.isNullAt(0)) Nil
        else d.where(col("batch") === latest.getLong(0) &&
            col("drifted"))
          .select("rule", "rate").collect().toSeq
          .map(r => f"admission-drift:${r.getString(0)} " +
            f"rate=${r.getDouble(1)}%.3f — latest batch broke its " +
            s"trailing baseline; inspect $q before the valve trips")
      }

  /** One-call structural audit over a unified document family —
    * violations prefixed with the member family, Nil = healthy. */
  def fsckDocuments(spark: SparkSession, base: String): Seq[String] =
    graft.operators.TextOps.fsckBand(spark, s"${base}_band")
      .map(v => s"${base}_band: $v") ++
      graft.operators.TextOps.fsckBm25(spark, s"${base}_bm25",
        s"${base}_bm25_stats").map(v => s"${base}_bm25: $v")

  /** One-call repair over a unified document family: each member
    * family's idempotent fsck-mapped heal pass, in the ingest loop's
    * member order. Same contract as the per-family verbs — a clean
    * family is a no-op, an unhealable violation refuses loudly. */
  def repairDocuments(spark: SparkSession, base: String): Seq[String] =
    graft.operators.TextOps.repairBand(spark, s"${base}_band")
      .map(v => s"${base}_band: $v") ++
      graft.operators.TextOps.repairBm25(spark, s"${base}_bm25",
        s"${base}_bm25_stats").map(v => s"${base}_bm25: $v")

  /** One-call maintenance pass over a unified document family. */
  def maintainDocuments(spark: SparkSession, base: String,
      policy: graft.operators.TextOps.MaintenancePolicy =
        graft.operators.TextOps.MaintenancePolicy(),
      guard: graft.operators.TextOps.FoldGuard =
        graft.operators.TextOps.FoldGuard.Refuse): Seq[String] =
    graft.operators.TextOps.maintainBand(spark, s"${base}_band",
        policy, guard)
      .map(v => s"${base}_band: $v") ++
      graft.operators.TextOps.maintainBm25(spark, s"${base}_bm25",
        policy, guard).map(v => s"${base}_bm25: $v")

  /** One-call `describe` over every EXISTING member family of a
    * unified vector base (a family absent from this deployment is
    * skipped, matching the backup verbs). Drift gauges stay off —
    * they are O(index); ask the per-family describe when needed. */
  def describeVectors(spark: SparkSession,
      base: String): Map[String, graft.operators.TextOps.IndexStatus] = {
    val fams: Seq[(String, () => graft.operators.TextOps.IndexStatus)] =
      Seq(
        s"${base}_ann" -> (() =>
          graft.operators.AnnIndex.describe(spark, s"${base}_ann")),
        s"${base}_bq" -> (() =>
          graft.operators.BqIndex.describe(spark, s"${base}_bq")),
        s"${base}_sq" -> (() =>
          graft.operators.SqIndex.describe(spark, s"${base}_sq")),
        s"${base}_pq" -> (() =>
          graft.operators.PqIndex.describe(spark, s"${base}_pq")),
        s"${base}_ivf" -> (() =>
          graft.operators.IvfIndex.describe(spark, s"${base}_ivf")))
    fams.filter(f => spark.catalog.tableExists(f._1))
      .map { case (t, d) => t -> d() }.toMap
  }

  /** One-call structural audit over every existing member family of
    * a unified vector base — prefixed violations, Nil = healthy. */
  def fsckVectors(spark: SparkSession, base: String): Seq[String] =
    Seq(
      s"${base}_ann" -> (() =>
        graft.operators.AnnIndex.fsck(spark, s"${base}_ann")),
      s"${base}_bq" -> (() =>
        graft.operators.BqIndex.fsck(spark, s"${base}_bq")),
      s"${base}_sq" -> (() =>
        graft.operators.SqIndex.fsck(spark, s"${base}_sq")),
      s"${base}_pq" -> (() =>
        graft.operators.PqIndex.fsck(spark, s"${base}_pq")),
      s"${base}_ivf" -> (() =>
        graft.operators.IvfIndex.fsck(spark, s"${base}_ivf")))
      .filter(f => spark.catalog.tableExists(f._1))
      .flatMap { case (t, f) => f().map(v => s"$t: $v") }

  /** One-call repair over every existing member family of a unified
    * vector base. */
  def repairVectors(spark: SparkSession, base: String): Seq[String] =
    Seq(
      s"${base}_ann" -> (() =>
        graft.operators.AnnIndex.repair(spark, s"${base}_ann")),
      s"${base}_bq" -> (() =>
        graft.operators.BqIndex.repair(spark, s"${base}_bq")),
      s"${base}_sq" -> (() =>
        graft.operators.SqIndex.repair(spark, s"${base}_sq")),
      s"${base}_pq" -> (() =>
        graft.operators.PqIndex.repair(spark, s"${base}_pq")),
      s"${base}_ivf" -> (() =>
        graft.operators.IvfIndex.repair(spark, s"${base}_ivf")))
      .filter(f => spark.catalog.tableExists(f._1))
      .flatMap { case (t, f) => f().map(v => s"$t: $v") }

  /** One-call maintenance pass over every existing member family of
    * a unified vector base. `refreshWith` supplies the corpus for the
    * quantizer families' opt-in drift leg (the runbook's scheduling
    * note: without it, drift is never gauged — by design). */
  def maintainVectors(spark: SparkSession, base: String,
      policy: graft.operators.TextOps.MaintenancePolicy =
        graft.operators.TextOps.MaintenancePolicy(),
      refreshWith: Option[org.apache.spark.sql.DataFrame] = None,
      guard: graft.operators.TextOps.FoldGuard =
        graft.operators.TextOps.FoldGuard.Refuse)
      : Seq[String] =
    Seq(
      s"${base}_ann" -> (() => graft.operators.AnnIndex.maintain(
        spark, s"${base}_ann", policy, guard)),
      s"${base}_bq" -> (() => graft.operators.BqIndex.maintain(
        spark, s"${base}_bq", policy, guard)),
      s"${base}_sq" -> (() => graft.operators.SqIndex.maintain(
        spark, s"${base}_sq", policy, guard)),
      s"${base}_pq" -> (() => graft.operators.PqIndex.maintain(
        spark, s"${base}_pq", policy, refreshWith, guard)),
      s"${base}_ivf" -> (() => graft.operators.IvfIndex.maintain(
        spark, s"${base}_ivf", policy, refreshWith, guard)))
      .filter(f => spark.catalog.tableExists(f._1))
      .flatMap { case (t, f) => f().map(v => s"$t: $v") }

  /** STREAMING DELETES — the CDC shape: deletion requests arrive as a
    * file stream of (doc_id) rows and each micro-batch drives
    * [[deleteDocuments]] behind the shared replay ledger (its own
    * `<base>_dels` ledger/checkpoint, untouched by ingests and
    * vacuums, so a vacuum dropping the tombstone lists never resets
    * this stream into replaying old deletions). Tombstoning is
    * idempotent and intersects the live index, so even a replayed
    * batch cannot double-subtract stats. The caller-session relation
    * caches of the touched lists refresh on return.
    */
  def streamingDocumentDeletes(spark: SparkSession, path: String,
      base: String): Unit = {
    resetDeleteLedgerIfCheckpointLost(spark, s"${base}_dels")
    ledgeredIngest(spark, path, s"${base}_dels", refresh = Seq(),
      (batch, _, _) => deleteDocuments(batch.sparkSession, base,
        batch.toDF()))
    Seq(s"${base}_band_del", s"${base}_bm25_del", s"${base}_bm25_stats")
      .foreach(t => if (spark.catalog.tableExists(t))
        spark.catalog.refreshTable(t))
  }

  /** [[streamingDocumentDeletes]] for the vector families: a file
    * stream of (vec_id) rows drives [[deleteVectors]] per batch. */
  def streamingVectorDeletes(spark: SparkSession, path: String,
      base: String): Unit = {
    resetDeleteLedgerIfCheckpointLost(spark, s"${base}_vdels")
    ledgeredIngest(spark, path, s"${base}_vdels", refresh = Seq(),
      (batch, _, _) => deleteVectors(batch.sparkSession, base,
        batch.toDF()))
    Seq("_ann_del", "_bq_del", "_sq_del", "_pq_del", "_ivf_del")
      .map(base + _)
      .foreach(t => if (spark.catalog.tableExists(t))
        spark.catalog.refreshTable(t))
  }

  /** STREAMING UPSERTS — the CDC refresh shape (VERDICT r13 #1's
    * streaming twin): re-crawled documents arrive as a file stream of
    * full document rows and each micro-batch drives
    * [[graft.operators.TextOps.upsertBm25Docs]] +
    * [[graft.operators.TextOps.upsertBandDocs]] behind its own replay
    * ledger (`<base>_ups`) — ONE upsert definition with batch, so
    * CDC-refreshed and batch-refreshed indexes cannot drift
    * (UpsertSpec gates probe parity). maxFilesPerTrigger=1 makes each
    * arriving file its own batch in listing order, so a later file's
    * version of an id supersedes an earlier file's (each batch takes
    * a fresh generation barrier); WITHIN one file the CDC-compacted
    * contract applies — at most one version per id. On a checkpoint
    * loss the ledger resets and everything replays: upserts converge
    * by content (each replayed batch re-supersedes at a higher
    * barrier), the delete-stream recovery argument in generation
    * form. The dedup `_hashes` table is deliberately untouched — ids,
    * not content hashes, drive an upsert, and hash-recognition of
    * previously seen content must survive the refresh.
    */
  def streamingDocumentUpserts(spark: SparkSession, path: String,
      base: String,
      maintain: Option[graft.operators.TextOps.MaintenancePolicy] =
        None,
      admission: Seq[graft.operators.Quality.Rule] = Nil,
      maxQuarantineRate: Double = 1.0): Unit = {
    require(maxQuarantineRate >= 0.0 && maxQuarantineRate <= 1.0,
      "streamingDocumentUpserts: maxQuarantineRate must be in [0, 1]")
    resetDeleteLedgerIfCheckpointLost(spark, s"${base}_ups")
    ledgeredIngest(spark, path, s"${base}_ups", refresh = Seq(),
      (batch, _, bid) => {
        val s = batch.sparkSession
        // holds gate BEFORE the admission gate (r18): the member
        // upserts re-filter held ids as a backstop, but a held doc
        // that VIOLATES a rule would land its full text in the
        // quarantine sink — a trace the hold contract forbids
        val unheld = graft.operators.TextOps.exceptHeld(
          graft.operators.TextOps.exceptHeld(batch.toDF(), s,
            s"${base}_bm25_hold", "doc_id"),
          s, s"${base}_band_hold", "doc_id")
        // the CDC stream takes the SAME admission gate as ingest — an
        // upsert rewrites content, so gating ingest alone leaves a
        // side door for unvetted text; sinks are stream-scoped
        // (`<base>_ups_quarantine`) because upsert batch ids live in
        // their own ledger and must not collide with ingest slices
        val (vetted, annOpt) = admitBatch(s, unheld, admission,
          maxQuarantineRate, s"${base}_ups", bid,
          "streamingDocumentUpserts", source = Some(batch.toDF()))
        val b = vetted.persist()
        try {
          graft.operators.TextOps.upsertBm25Docs(s, s"${base}_bm25",
            s"${base}_bm25_stats", b)
          graft.operators.TextOps.upsertBandDocs(s, s"${base}_band", b)
        } finally {
          b.unpersist()
          annOpt.foreach(_.unpersist())
          ()
        }
      },
      maxFilesPerTrigger = Some(1),
      // an upsert cadence accrues the SAME debt as ingest+delete (a
      // barrier entry and one `_del` file per batch) — the long-running
      // CDC stream self-maintains exactly like the ingest loops
      // (FoldGuard.Anchor: unattended, see the ingest hook)
      afterBatch = s => maintain.foreach { p =>
        graft.operators.TextOps.maintainBm25(s, s"${base}_bm25", p,
          graft.operators.TextOps.FoldGuard.Anchor)
        graft.operators.TextOps.maintainBand(s, s"${base}_band", p,
          graft.operators.TextOps.FoldGuard.Anchor)
        ()
      })
    (Seq(s"${base}_band", s"${base}_band_del", s"${base}_bm25",
      s"${base}_bm25_del", s"${base}_bm25_stats") ++
        (if (admission.nonEmpty)
          Seq(s"${base}_ups_quarantine", s"${base}_ups_admission")
        else Nil))
      .foreach(t => if (spark.catalog.tableExists(t))
        spark.catalog.refreshTable(t))
  }

  /** [[streamingDocumentUpserts]] for the vector families: a file
    * stream of (vec_id, embedding) rows re-embeds across every index
    * the unified ingest maintains, per batch, behind one ledger. */
  def streamingVectorUpserts(spark: SparkSession, path: String,
      base: String,
      nBands: Int = graft.operators.AnnIndex.NBands,
      bits: Int = graft.operators.AnnIndex.Bits,
      dim: Int = graft.operators.AnnIndex.Dim,
      maintain: Option[graft.operators.TextOps.MaintenancePolicy] =
        None,
      admission: Seq[graft.operators.Quality.Rule] = Nil,
      maxQuarantineRate: Double = 1.0): Unit = {
    require(maxQuarantineRate >= 0.0 && maxQuarantineRate <= 1.0,
      "streamingVectorUpserts: maxQuarantineRate must be in [0, 1]")
    resetDeleteLedgerIfCheckpointLost(spark, s"${base}_vups")
    ledgeredIngest(spark, path, s"${base}_vups", refresh = Seq(),
      (batch, _, bid) => {
        val s = batch.sparkSession
        // holds gate BEFORE the admission gate (r18, the
        // streamingDocumentUpserts rationale) — any family registry
        // vetoes (holdVectors stamps all five together)
        val unheld = vecFamilies.foldLeft(batch.toDF())((d, fam) =>
          graft.operators.TextOps.exceptHeld(d, s,
            s"$base${fam}_hold", "vec_id"))
        // the vector CDC side of the gate (stream-scoped sinks — see
        // streamingDocumentUpserts)
        val (vetted, annOpt) = admitBatch(s, unheld, admission,
          maxQuarantineRate, s"${base}_vups", bid,
          "streamingVectorUpserts", source = Some(batch.toDF()))
        val b = vetted.persist()
        try {
          graft.operators.AnnIndex.upsert(b, s"${base}_ann", nBands,
            bits, dim)
          graft.operators.BqIndex.upsert(b, s"${base}_bq", dim)
          graft.operators.SqIndex.upsert(b, s"${base}_sq", dim)
          graft.operators.PqIndex.upsert(b, s"${base}_pq")
          graft.operators.IvfIndex.upsert(b, s"${base}_ivf")
        } finally {
          b.unpersist()
          annOpt.foreach(_.unpersist())
          ()
        }
      },
      maxFilesPerTrigger = Some(1),
      // metadata-cheap self-maintenance per batch, the ingest-loop
      // hook's vector side (drift gauges stay in operator passes;
      // FoldGuard.Anchor: unattended, see the document ingest hook)
      afterBatch = s => maintain.foreach { p =>
        val anchor = graft.operators.TextOps.FoldGuard.Anchor
        graft.operators.AnnIndex.maintain(s, s"${base}_ann", p,
          anchor)
        graft.operators.BqIndex.maintain(s, s"${base}_bq", p, anchor)
        graft.operators.SqIndex.maintain(s, s"${base}_sq", p, anchor)
        graft.operators.TextOps.maintainIndex(s, Seq(s"${base}_pq"),
          s"${base}_pq_del", "vec_id", p, guard = anchor)
        graft.operators.TextOps.maintainIndex(s, Seq(s"${base}_ivf"),
          s"${base}_ivf_del", "vec_id", p, guard = anchor)
        ()
      })
    Seq("_ann", "_ann_vec", "_ann_del", "_bq", "_bq_del", "_sq",
      "_sq_del", "_pq", "_pq_del", "_ivf", "_ivf_del")
      .map(base + _)
      .foreach(t => if (spark.catalog.tableExists(t))
        spark.catalog.refreshTable(t))
  }

  /** Checkpoint/ledger PAIRING for the delete streams (review r13):
    * a lost checkpoint with a surviving ledger silently skips every
    * new deletion — batch ids restart at 0, the old ledger marks 0
    * applied, and AvailableNow bundles ALL files (old + new) into
    * that one skipped batch. Deletions are content-level idempotent
    * (tombstone anti-join, WAL txn token), so the safe move on a
    * checkpoint loss is dropping the ledger and REPLAYING everything
    * — re-deleting an already-deleted id is exactly a no-op. (The
    * INGEST loops cannot do this: replaying appends would duplicate
    * stored rows, which is why their recovery is the member-loss
    * reset instead.)
    */
  private def resetDeleteLedgerIfCheckpointLost(spark: SparkSession,
      table: String): Unit = {
    val ck = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase + "_ck")
    val fs = ck.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ledger = table + "_ledger"
    if (!fs.exists(ck) && spark.catalog.tableExists(ledger)) {
      spark.sql(s"DROP TABLE $ledger")
      graft.operators.TextOps.clearOrphanLocation(spark, ledger)
      dropAdmissionSinks(spark, table)
    }
  }

  /** Drop a stream's admission audit sinks — a ledger reset restarts
    * batch ids at 0 and a replay may re-batch the files, so slices
    * from the previous life would read as duplicated audit rows.
    * Re-derivable by design. */
  private def dropAdmissionSinks(spark: SparkSession,
      prefix: String): Unit =
    Seq(s"${prefix}_quarantine", s"${prefix}_admission").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.operators.TextOps.clearOrphanLocation(spark, t)
    }

  /** Drop a SIBLING CDC stream's ledger + checkpoint so its files
    * replay on the next invocation (ADVICE r14): when an ingest
    * loop's member-loss reset fires, it drops the members and replays
    * the ORIGINAL corpus at gen 0 — but the upsert twin's `_ups`
    * ledger and checkpoint would survive, so the CDC files that
    * superseded those originals would never replay. The replacement
    * rows are gone with the dropped member while the replayed gen-0
    * originals stay dead under the surviving finite barriers — the
    * upserted documents would vanish entirely. Upserts converge by
    * content (each replayed batch re-supersedes at a fresh barrier),
    * so a full CDC replay is exactly the delete-stream recovery
    * argument in generation form: safe, idempotent, and the only
    * state that restores the superseded content. The delete twin
    * needs no such reset (its tombstones survive in `_del`).
    */
  private def resetSiblingCdcStream(spark: SparkSession,
      table: String): Unit = {
    val ck = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase + "_ck")
    val fs = ck.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(ck)) { fs.delete(ck, true); () }
    val ledger = table + "_ledger"
    spark.sql(s"DROP TABLE IF EXISTS $ledger")
    graft.operators.TextOps.clearOrphanLocation(spark, ledger)
    dropAdmissionSinks(spark, table)
  }

  /** ONE-CALL VECTOR INGEST (VERDICT r12 #7, the vector twin): a
    * single file-streamed loop that maintains EVERY stored vector
    * index — ANN band postings + payload, BQ signatures, SQ8 codes,
    * PQ codes, IVF cells — per micro-batch behind ONE ledger, through
    * the same per-family append definitions batch maintenance uses
    * (parity gated in UnifiedIngestSpec). The trained artifacts must
    * pre-exist for the frozen-quantizer families (PQ codebook, IVF
    * centroids — ingest never retrains; refused loudly otherwise);
    * ANN banding config comes from the explicit parameters on first
    * ingest and is pinned in `_cfg` thereafter.
    */
  def streamingAllIndexIngest(spark: SparkSession, sfDir: String,
      base: String,
      nBands: Int = graft.operators.AnnIndex.NBands,
      bits: Int = graft.operators.AnnIndex.Bits,
      dim: Int = graft.operators.AnnIndex.Dim,
      maintain: Option[graft.operators.TextOps.MaintenancePolicy] =
        None,
      admission: Seq[graft.operators.Quality.Rule] = Nil,
      maxQuarantineRate: Double = 1.0): Unit = {
    require(maxQuarantineRate >= 0.0 && maxQuarantineRate <= 1.0,
      "streamingAllIndexIngest: maxQuarantineRate must be in [0, 1]")
    val annT = s"${base}_ann"
    val bqT = s"${base}_bq"
    val sqT = s"${base}_sq"
    val pqT = s"${base}_pq"
    val ivfT = s"${base}_ivf"
    require(spark.catalog.tableExists(pqT + "_cb"),
      s"streamingAllIndexIngest: no stored codebook ${pqT}_cb — train " +
        "with PqIndex.trainCodebook first (ingest never retrains)")
    require(spark.catalog.tableExists(ivfT + "_cent"),
      s"streamingAllIndexIngest: no stored quantizer ${ivfT}_cent — " +
        "build with IvfIndex.write first (ingest never retrains)")
    ledgeredIngest(spark, s"$sfDir/embeddings.parquet", base,
      refresh = Seq(annT, annT + "_vec", annT + "_cfg",
        bqT, bqT + "_cfg", sqT, sqT + "_cfg", pqT, ivfT),
      append = (batch, _, bid) => {
        val s = batch.sparkSession
        // holds gate BEFORE the admission gate (r18) — the member
        // appends re-filter as a backstop, but a held vec_id failing
        // a rule must not leave its embedding in the quarantine sink
        val unheld = vecFamilies.foldLeft(batch.toDF())((d, fam) =>
          graft.operators.TextOps.exceptHeld(d, s,
            s"$base${fam}_hold", "vec_id"))
        // the vector gate: a single NaN/Inf or zero-norm embedding
        // poisons every cosine/ADC score it touches — admission rules
        // (FiniteArray / NormInRange / custom) quarantine it with the
        // same sinks+valve contract as the document gate
        val (vetted, annOpt) = admitBatch(s, unheld, admission,
          maxQuarantineRate, base, bid, "streamingAllIndexIngest",
          source = Some(batch.toDF()))
        val b = vetted.persist()
        try {
          graft.operators.AnnIndex.append(b, annT, nBands, bits, dim)
          graft.operators.BqIndex.append(b, bqT, dim)
          graft.operators.SqIndex.append(b, sqT, dim)
          graft.operators.PqIndex.append(b, pqT)
          graft.operators.IvfIndex.append(b, ivfT)
        } finally {
          b.unpersist()
          annOpt.foreach(_.unpersist())
          ()
        }
      },
      // member-loss reset also replays the sibling CDC upsert stream
      // (ADVICE r14 — the streamingDocumentIngest rationale); the
      // audit sinks drop with it (batch ids restart on replay)
      onReset = s => {
        resetSiblingCdcStream(s, s"${base}_vups")
        dropAdmissionSinks(s, base)
      },
      // per-batch self-maintenance across all five families (the
      // streamingDocumentIngest hook, vector side). Only the
      // METADATA-CHEAP legs run per batch — the drift gauges are
      // O(index) reconstruction jobs, and drift-triggered refresh
      // belongs to an operator pass with the training corpus in hand
      // (IvfIndex/PqIndex.maintain with refreshWith), not to every
      // arriving micro-batch. FoldGuard.Anchor: unattended (see the
      // document ingest hook).
      afterBatch = s => maintain.foreach { p =>
        val anchor = graft.operators.TextOps.FoldGuard.Anchor
        graft.operators.AnnIndex.maintain(s, annT, p, anchor)
        graft.operators.BqIndex.maintain(s, bqT, p, anchor)
        graft.operators.SqIndex.maintain(s, sqT, p, anchor)
        graft.operators.TextOps.maintainIndex(s, Seq(pqT),
          pqT + "_del", "vec_id", p, guard = anchor)
        graft.operators.TextOps.maintainIndex(s, Seq(ivfT),
          ivfT + "_del", "vec_id", p, guard = anchor)
        ()
      })
    // refresh the caller's view of lists the hook may have rewritten
    Seq(annT, bqT, sqT, pqT, ivfT).map(_ + "_del")
      .foreach(t => if (spark.catalog.tableExists(t))
        spark.catalog.refreshTable(t))
  }

  /** The shared vector-ingest loop (ANN bands, PQ codes): file-stream
    * the corpus, append each micro-batch through `append` behind the
    * batch-id replay ledger, stable warehouse checkpoint at
    * `<table>_ck` (orphan-cleaned when the table is gone), refresh
    * `refresh` for the caller's session. */
  private def vectorIngest(spark: SparkSession, sfDir: String,
      table: String, refresh: Seq[String],
      append: (org.apache.spark.sql.DataFrame, String) => Unit): Unit =
    ledgeredIngest(spark, s"$sfDir/embeddings.parquet", table, refresh,
      (b, t, _) => append(b, t))

  /** RETENTION for the admission audit sinks: keep the NEWEST
    * `keepBatches` batch partitions of `<base>_quarantine` and
    * `<base>_admission`, delete the older partition directories
    * (batch ids are monotone within a ledger life, so newest = highest
    * id). The sinks are re-derivable audit trails, not index state —
    * pruning them never touches the family and never triggers a reset
    * (they are deliberately outside the reset-membership list).
    * Runs under the cross-process build lock (r18): a prune racing a
    * [[scrubQuarantine]] overwrite of the same partition could
    * resurrect the pruned rows from the scrub's checkpointed remnant.
    */
  def pruneAdmissionAudit(spark: SparkSession, base: String,
      keepBatches: Int): Seq[String] = {
    require(keepBatches >= 1,
      "pruneAdmissionAudit: keepBatches must be >= 1")
    graft.operators.TextOps.withBuildLock(spark) {
    Seq(s"${base}_quarantine", s"${base}_admission",
      s"${base}_ups_quarantine", s"${base}_ups_admission",
      s"${base}_vups_quarantine", s"${base}_vups_admission")
      .filter(spark.catalog.tableExists).flatMap { t =>
        val loc = graft.operators.TextOps.tableLocation(spark, t)
        val fs = loc.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val parts = fs.listStatus(loc).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("_batch="))
          .sortBy(st => -st.getPath.getName
            .stripPrefix("_batch=").toLong)
        val victims = parts.drop(keepBatches)
        victims.foreach(st => fs.delete(st.getPath, true))
        if (victims.nonEmpty) spark.catalog.refreshTable(t)
        victims.map(st => s"dropped $t/${st.getPath.getName}")
      }
    }
  }

  /** AGE twin of [[pruneAdmissionAudit]] (r18 — retention is bounded
    * by count AND age everywhere else in the engine: backups and
    * snapshots prune by both, the audit sinks only pruned by count):
    * drop every `_batch` partition of the six admission sinks whose
    * newest file is older than `maxAgeMs`, never touching the family
    * and never triggering a reset (the sinks are re-derivable audit
    * trails, outside the reset-membership list by design). Age is the
    * partition's max file mtime — batch ids order WITHIN a ledger
    * life but carry no clock, and a replay re-stamps its slice's
    * files, which is correct: re-derived evidence is NEW evidence.
    * Locked like its count twin.
    */
  def pruneAdmissionAuditOlderThan(spark: SparkSession, base: String,
      maxAgeMs: Long,
      nowMs: Long = System.currentTimeMillis()): Seq[String] = {
    require(maxAgeMs >= 0L,
      "pruneAdmissionAuditOlderThan: maxAgeMs must be >= 0")
    graft.operators.TextOps.withBuildLock(spark) {
    Seq(s"${base}_quarantine", s"${base}_admission",
      s"${base}_ups_quarantine", s"${base}_ups_admission",
      s"${base}_vups_quarantine", s"${base}_vups_admission")
      .filter(spark.catalog.tableExists).flatMap { t =>
        val loc = graft.operators.TextOps.tableLocation(spark, t)
        val fs = loc.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        def newestMtime(p: org.apache.hadoop.fs.Path): Long = {
          val kids = fs.listStatus(p)
          val own = kids.filter(_.isFile).map(_.getModificationTime)
          val sub = kids.filter(_.isDirectory).map(s =>
            newestMtime(s.getPath))
          (own ++ sub :+ 0L).max
        }
        val victims = fs.listStatus(loc).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("_batch="))
          .filter(st => nowMs - newestMtime(st.getPath) > maxAgeMs)
        victims.foreach(st => fs.delete(st.getPath, true))
        if (victims.nonEmpty) spark.catalog.refreshTable(t)
        victims.map(st => s"dropped $t/${st.getPath.getName} (age)")
      }
    }
  }

  /** Remove every row matching `ids` (on `idCol`) from a
    * batch-partitioned quarantine sink, rewriting ONLY the touched
    * `_batch` partitions (dynamic partition overwrite — the
    * writeBatchSlice discipline) and deleting partitions the scrub
    * left empty as directories (a dynamic overwrite cannot see them —
    * the pruneAdmissionAudit mechanism). Absent table, absent id
    * column (a doc-side scrub against a vector-side sink), or no
    * matches are all no-ops. Returns the touched batch ids.
    *
    * The remnant frame reads the table it rewrites — it materializes
    * through an eager localCheckpoint BEFORE the overwrite (the
    * consistentProbe discipline), so the insert plans from cached
    * rows, not from the files it is replacing.
    *
    * Runs under the cross-process build lock (r18): a scrub is a
    * read-modify-write of whole partitions, so two concurrent scrubs
    * of one sink (a hold stamped from two sessions, or a hold racing
    * a remediation) would last-writer-win and RESURRECT the other's
    * scrubbed rows — for a hold that is a no-trace contract breach,
    * not mere staleness. The lock is reentrant, so locked callers
    * (the hold verbs' members, remediation's upserts) compose.
    */
  private[graft] def scrubQuarantine(s: SparkSession, table: String,
      ids: org.apache.spark.sql.DataFrame, idCol: String): Seq[Long] =
    if (!s.catalog.tableExists(table)) Nil
    else graft.operators.TextOps.withBuildLock(s) {
      val q = s.table(table)
      if (!q.columns.contains(idCol)) Nil
      else {
        val key = ids.select(col(idCol)).distinct()
        val touched = q.join(key, Seq(idCol), "left_semi")
          .select(col("_batch")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        if (touched.isEmpty) Nil
        else {
          val remaining = q.where(col("_batch").isin(touched: _*))
            .join(key, Seq(idCol), "left_anti")
            .localCheckpoint(true)
          try {
            val still = remaining.select(col("_batch")).distinct()
              .collect().map(_.getLong(0)).toSet
            if (still.nonEmpty) {
              // partition column LAST for the position-based insertInto
              val ordered =
                q.columns.filterNot(_ == "_batch") :+ "_batch"
              val out = remaining.select(ordered.map(col): _*)
              val mode = "spark.sql.sources.partitionOverwriteMode"
              val prev = s.conf.getOption(mode)
              s.conf.set(mode, "dynamic")
              try out.write.mode("overwrite").insertInto(table)
              finally prev match {
                case Some(v) => s.conf.set(mode, v)
                case None => s.conf.unset(mode)
              }
            }
            val emptied = touched.filterNot(still)
            if (emptied.nonEmpty) {
              val loc = graft.operators.TextOps.tableLocation(s, table)
              val fs = loc.getFileSystem(
                s.sparkContext.hadoopConfiguration)
              emptied.foreach { b =>
                fs.delete(
                  new org.apache.hadoop.fs.Path(loc, s"_batch=$b"),
                  true)
                ()
              }
            }
            s.catalog.refreshTable(table)
          } finally {
            // through the LogicalRDD — Dataset.unpersist silently
            // no-ops on localCheckpoint blocks (late r18)
            graft.operators.TextOps.unpersistCheckpoint(remaining)
            ()
          }
          touched
        }
      }
    }

  /** The document ingest door's own TRIMMINGS — ONE definition shared
    * by [[streamingDocumentIngest]]'s batch body and the ingest-side
    * heal in [[remediateDocumentQuarantine]] (late r18, review: two
    * near-verbatim copies would silently desync exactly the parity
    * the remediation contract promises). Curation gate, in-batch
    * keep-lowest exact dedup on content hash, and the `hashT`
    * anti-join (content already indexed under another id stays
    * deduped). Returns the PERSISTED novel frame carrying
    * `content_hash` — the caller unpersists, and pairs it with
    * [[appendHashRows]] so a future redelivery of the same content
    * is recognized, not re-indexed.
    */
  private def ingestDoorTrim(s: SparkSession,
      batch: org.apache.spark.sql.DataFrame, hashT: String)
      : org.apache.spark.sql.DataFrame = {
    val gated = graft.operators.TrainingData.curateGate(batch)
      .withColumn("content_hash", md5(col("text")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("content_hash").orderBy(col("doc_id"))
    val inBatch = gated.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    (if (s.catalog.tableExists(hashT))
      inBatch.join(s.table(hashT), Seq("content_hash"), "left_anti")
    else inBatch).persist()
  }

  /** The hash-store append paired with [[ingestDoorTrim]]. */
  private def appendHashRows(s: SparkSession,
      novel: org.apache.spark.sql.DataFrame, hashT: String): Unit = {
    graft.operators.TextOps.clearOrphanLocation(s, hashT)
    novel.select(col("content_hash"), col("doc_id"))
      .write.mode("append")
      .bucketBy(8, "content_hash").sortBy("content_hash")
      .saveAsTable(hashT)
  }

  /** QUARANTINE REMEDIATION — the verb that closes the admission
    * lifecycle (r18): rejected rows sit in `<sink>_quarantine` with
    * their reasons; re-delivering the source batch is the STREAM's
    * recovery, but a fixable defect (a mislabeled language, a
    * truncatable overflow, a re-embeddable vector) deserves an
    * operator verb that heals IN PLACE. This core:
    *
    *   1. scopes the HEALED ID SET (optionally to ids appearing in
    *      `batches`) and picks ONE representative per id over the
    *      WHOLE sink — highest `_batch` wins, the CDC last-writer
    *      discipline, even when the latest rejected delivery sits in
    *      an out-of-scope batch (the scrub in step 5 is table-wide,
    *      so a scope-local pick would heal a stale version AND
    *      destroy the newer version's evidence). The representative
    *      set satisfies the at-most-one-version-per-id contract every
    *      upsert verb requires;
    *   2. drops held ids (defense in depth — the hold verbs scrub
    *      them from quarantine, but a hold stamped between read and
    *      fix must still win);
    *   3. applies the caller's `fix` and re-runs the SAME admission
    *      rules. No valve here: remediation is operator-attended, and
    *      "most rows still fail" is an ANSWER (the summary), not a
    *      poisoned feed. A fix that drops the id column — or MERGES
    *      ids into duplicates (the upsert verbs take at most one
    *      version per id) — is refused before anything mutates;
    *   4. hands rows that now PASS to `ingest` (the caller wires the
    *      family's own upsert verbs — supersede-by-id, so a heal can
    *      never double-index an id that entered by another door, and
    *      a TERMINALLY deleted id stays deleted: the member upserts
    *      drop it, the delete contract outranks the heal);
    *   5. scrubs healed ids from the sink TABLE-WIDE (their older
    *      quarantined copies are superseded evidence) and returns a
    *      per-batch summary (batch, quarantined, healed, remaining).
    *
    * Re-running with the same fix CONVERGES: healed rows are gone
    * from the sink, the upserts re-supersede by content, the summary
    * reports zeros. A ledger REPLAY of the original stream re-derives
    * its quarantine slices from the feed — the original rejects
    * reappear (the audit reflects what the feed delivered), and
    * re-running the remediation converges again (the ingest side's
    * hash gate and the upsert barriers make the re-heal a no-op).
    */
  private def remediateCore(s: SparkSession, sinkPrefix: String,
      idCol: String, holds: Seq[String],
      fix: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      admission: Seq[graft.operators.Quality.Rule],
      batches: Option[Seq[Long]],
      ingest: org.apache.spark.sql.DataFrame => Unit)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sp = s
    import sp.implicits._
    val qT = s"${sinkPrefix}_quarantine"
    def summary(rows: Seq[(Long, Long, Long, Long)])
        : org.apache.spark.sql.DataFrame =
      rows.toDF("batch", "quarantined", "healed", "remaining")
        .orderBy("batch")
    if (!s.catalog.tableExists(qT)) return summary(Nil)
    val q0 = s.table(qT)
    // `batches` scopes WHICH ids to heal; the representative VERSION
    // per id is picked over the WHOLE sink (late r18, review): the
    // scrub is table-wide, so picking the rep from the scoped slice
    // alone would heal a STALE version whenever the id's latest
    // rejected delivery sits in an out-of-scope batch — and then
    // destroy that newer version's evidence. LWW must hold across
    // the scope boundary.
    val pool = batches
      .map { bs =>
        val ids = q0.where(col("_batch").isin(bs: _*))
          .select(col(idCol).as("_scoped_id")).distinct()
        // null-safe (<=>): a NULL-id row (a NotNull violation whose
        // fix backfills the id) is one entity to the rep window, and
        // the unscoped path heals it — a plain equi-semi-join would
        // silently drop it from a SCOPED heal (late r18, review #2)
        q0.join(ids, col(idCol) <=> col("_scoped_id"), "left_semi")
      }
      .getOrElse(q0)
    // per-batch counts over the WHOLE sink (bounded by audit
    // retention): healed ids scrub table-wide, so out-of-scope
    // batches can shrink too and the summary must price them
    val before = q0.groupBy("_batch").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (before.isEmpty) return summary(Nil)
    val dataCols = q0.columns
      .filterNot(c => c == "violations" || c == "_batch")
    val w = Window.partitionBy(idCol)
      .orderBy(col("_batch").desc, col("violations"))
    val reps0 = pool
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(dataCols.map(col).toIndexedSeq: _*)
    val reps = holds.foldLeft(reps0)((d, h) =>
      graft.operators.TextOps.exceptHeld(d, s, h, idCol))
    val fixed = fix(reps)
    require(fixed.columns.contains(idCol),
      s"remediate($sinkPrefix): fix must preserve the '$idCol' column")
    val ann = graft.operators.Quality.annotate(fixed, admission)
      .persist()
    try {
      val healed = ann.where(size(col("violations")) === 0)
        .drop("violations")
      // the representative pick guarantees at-most-one-version-per-id
      // GOING IN, but the fix runs after it — a fix that MERGES ids
      // (canonicalization remapping two quarantined ids to one)
      // re-creates duplicates, and the family upsert verbs would
      // silently index BOTH versions live under one id (tombstone and
      // append share the batch's generation, so neither copy
      // supersedes the other — scores double-count). Refuse loudly
      // BEFORE anything mutates, the fix-must-preserve-idCol posture:
      // which merged version wins is fix semantics, so the fix must
      // collapse to one row itself. One aggregation over the
      // persisted quarantine-sized frame.
      val dups = healed.groupBy(col(idCol))
        .agg(count(lit(1)).as("_n")).where(col("_n") > 1)
        .select(col(idCol)).orderBy(col(idCol))
        .limit(5).collect().map(_.get(0))
      require(dups.isEmpty,
        s"remediate($sinkPrefix): fix produced duplicate '$idCol' " +
          s"values (e.g. ${dups.mkString(", ")}) — the upsert verbs " +
          "take at most one version per id; a fix that merges ids " +
          "must collapse them to one row itself (nothing was " +
          "indexed or scrubbed)")
      ingest(healed)
      scrubQuarantine(s, qT,
        healed.select(col(idCol)).distinct(), idCol)
    } finally {
      ann.unpersist()
      ()
    }
    s.catalog.refreshTable(qT)
    val after =
      if (s.catalog.tableExists(qT))
        s.table(qT).groupBy("_batch").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      else Map.empty[Long, Long]
    val scopedBatches = batches.map(_.toSet).getOrElse(before.keySet)
    val rows = before.keysIterator
      .filter(b => scopedBatches(b) ||
        after.getOrElse(b, 0L) != before(b))
      .map { b =>
        val a = after.getOrElse(b, 0L)
        (b, before(b), before(b) - a, a)
      }
      .toSeq.sortBy(_._1)
    summary(rows)
  }

  /** [[remediateCore]] for a unified DOCUMENT family: heal the ingest
    * sink (`cdc = false`, `<base>_quarantine`) or the CDC upsert sink
    * (`cdc = true`, `<base>_ups_quarantine`). Healed rows enter
    * through [[graft.operators.TextOps.upsertBm25Docs]] /
    * [[graft.operators.TextOps.upsertBandDocs]] — supersede-by-id, so
    * the heal is safe even when the id later entered by another door
    * (plain append would double-index it), and a terminal tombstone
    * still outranks it. INGEST-side heals additionally take the
    * ingest door's own trimmings, for parity with what a clean
    * delivery would have faced: the curation gate, the in-batch
    * keep-lowest exact dedup, the `<base>_hashes` anti-join (content
    * already indexed under another id stays deduped), and the healed
    * novelty's hash rows land so a future redelivery of the SAME
    * fixed content is recognized, not re-indexed. A curation- or
    * dedup-dropped heal still LEAVES quarantine — exactly as a clean
    * delivery of it would never have entered. CDC-side heals take the
    * row as-is (that stream never curates: an upsert is an
    * operator-directed rewrite) and leave `_hashes` alone (ids, not
    * hashes, drive an upsert).
    */
  def remediateDocumentQuarantine(spark: SparkSession, base: String,
      fix: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      admission: Seq[graft.operators.Quality.Rule],
      cdc: Boolean = false,
      batches: Option[Seq[Long]] = None)
      : org.apache.spark.sql.DataFrame = {
    val bandT = s"${base}_band"
    val bm25T = s"${base}_bm25"
    val statsT = s"${base}_bm25_stats"
    val hashT = s"${base}_hashes"
    val sink = if (cdc) s"${base}_ups" else base
    val out = remediateCore(spark, sink, "doc_id",
      Seq(s"${bm25T}_hold", s"${bandT}_hold"), fix, admission, batches,
      healed => {
        val s = healed.sparkSession
        // ONE definition of the ingest door's trimmings (shared with
        // streamingDocumentIngest, late r18 review) — what a healed
        // row faces can never drift from what a clean delivery faces
        val entry =
          if (cdc) healed.persist()
          else ingestDoorTrim(s, healed, hashT)
        try {
          graft.operators.TextOps.upsertBm25Docs(s, bm25T, statsT,
            entry.drop("content_hash"))
          graft.operators.TextOps.upsertBandDocs(s, bandT,
            entry.drop("content_hash"))
          if (!cdc) appendHashRows(s, entry, hashT)
        } finally {
          entry.unpersist()
          ()
        }
      })
    Seq(bandT, s"${bandT}_del", bm25T, s"${bm25T}_del", statsT, hashT)
      .foreach(t => if (spark.catalog.tableExists(t))
        spark.catalog.refreshTable(t))
    out
  }

  /** [[remediateCore]] for a unified VECTOR group: heal the unified
    * ingest sink (`cdc = false`, `<base>_quarantine`) or the vector
    * CDC sink (`cdc = true`, `<base>_vups_quarantine`). Healed
    * embeddings re-enter through every family's own upsert — the
    * [[streamingVectorUpserts]] fan-out — so all five indexes agree
    * on the healed content at their own barriers.
    */
  def remediateVectorQuarantine(spark: SparkSession, base: String,
      fix: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      admission: Seq[graft.operators.Quality.Rule],
      cdc: Boolean = false,
      nBands: Int = graft.operators.AnnIndex.NBands,
      bits: Int = graft.operators.AnnIndex.Bits,
      dim: Int = graft.operators.AnnIndex.Dim,
      batches: Option[Seq[Long]] = None)
      : org.apache.spark.sql.DataFrame = {
    val sink = if (cdc) s"${base}_vups" else base
    val out = remediateCore(spark, sink, "vec_id",
      vecFamilies.map(f => s"$base${f}_hold"), fix, admission, batches,
      healed => {
        val s = healed.sparkSession
        val b = healed.persist()
        try {
          graft.operators.AnnIndex.upsert(b, s"${base}_ann", nBands,
            bits, dim)
          graft.operators.BqIndex.upsert(b, s"${base}_bq", dim)
          graft.operators.SqIndex.upsert(b, s"${base}_sq", dim)
          graft.operators.PqIndex.upsert(b, s"${base}_pq")
          graft.operators.IvfIndex.upsert(b, s"${base}_ivf")
        } finally {
          b.unpersist()
          ()
        }
      })
    (Seq("_ann", "_ann_vec", "_ann_del", "_bq", "_bq_del", "_sq",
      "_sq_del", "_pq", "_pq_del", "_ivf", "_ivf_del").map(base + _))
      .foreach(t => if (spark.catalog.tableExists(t))
        spark.catalog.refreshTable(t))
    out
  }

  /** DRIFT GAUGE over the admission history — the poisoned-feed valve
    * is binary and per-batch; this sees trouble COMING: per-rule
    * violation rates across the batch history, with each batch's rate
    * compared to the rule's OWN trailing baseline (mean + k·std over
    * the `window` prior batches). A rule whose latest rate breaks out
    * flags `drifted` — upstream schema drift, an encoding change, a
    * new source mixing in — batches before the wholesale refusal
    * would fire. Pure DataFrame ops over `<base>_admission` (window
    * per rule over batch order — rules are few, batches bounded by
    * retention; nothing concentrates). Returns (rule, batch, rate,
    * base_mean, base_std, drifted), newest first; rows with no prior
    * baseline (first `minPrior` batches per rule) never flag.
    */
  def admissionDrift(spark: SparkSession, base: String,
      window: Int = 8, k: Double = 3.0, minPrior: Int = 3,
      minStd: Double = 0.01, sink: Option[String] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = sink.getOrElse(s"${base}_admission")
    require(spark.catalog.tableExists(t),
      s"admissionDrift: no admission history $t — ingest with " +
        "admission rules first")
    val w = Window.partitionBy("rule").orderBy(col("_batch"))
      .rowsBetween(-window, -1)
    spark.table(t)
      .withColumn("rate",
        col("violations").cast("double") /
          greatest(col("total").cast("double"), lit(1.0)))
      .withColumn("base_mean", avg("rate").over(w))
      // std floored at minStd: a dead-flat baseline (all-identical
      // rates, std 0) must not flag on an epsilon uptick — the
      // breakout has to clear a minimum absolute band. A rule that
      // NEVER fired before still flags once its rate exceeds k*minStd.
      .withColumn("base_std",
        greatest(coalesce(stddev_samp(col("rate")).over(w), lit(0.0)),
          lit(minStd)))
      .withColumn("n_prior", count(lit(1)).over(w))
      .withColumn("drifted",
        col("n_prior") >= minPrior &&
          col("rate") > col("base_mean") + lit(k) * col("base_std"))
      .select(col("rule"), col("_batch").as("batch"), col("rate"),
        col("base_mean"), col("base_std"), col("drifted"))
      .orderBy(col("batch").desc, col("rule"))
  }

  /** THE admission gate applied to one micro-batch — shared by the
    * ingest loop and the CDC upsert stream (an upsert rewrites
    * content, so quality gates on ingest alone leave a side door):
    * write the quarantine and per-rule metrics slices under
    * `<sinkPrefix>_quarantine` / `<sinkPrefix>_admission` (idempotent
    * per batch id), enforce the wholesale-refusal valve, return the
    * admitted rows plus the persisted annotated frame for the caller
    * to unpersist after its appends land.
    */
  private[graft] def admitBatch(s: SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      admission: Seq[graft.operators.Quality.Rule],
      maxQuarantineRate: Double, sinkPrefix: String, bid: Long,
      what: String,
      source: Option[org.apache.spark.sql.DataFrame] = None)
      : (org.apache.spark.sql.DataFrame,
        Option[org.apache.spark.sql.DataFrame]) = {
    if (admission.isEmpty) return (batch, None)
    // FOOTER drift (r18): the file-stream reader PINS a schema and
    // silently coerces drifted files before any rule can see the
    // break (missing columns read null, rogue columns vanish, some
    // retypes read null) — so on the streaming path a SchemaMatches
    // rule also inspects the batch's source parquet FOOTERS against
    // its expectation. Footer-only reads, a handful of files per
    // micro-batch. Any drift marks the WHOLE batch (feed-level
    // breaks have no per-row blame — the batch-surface semantics),
    // with the per-column names riding the quarantine and metrics
    // sinks like every other rule.
    // files come from `source` when the caller pre-filtered the batch
    // (exceptHeld's anti join can leave input_file_name() blank past
    // its exchange — the footer check must not silently skip there)
    val footerProblems: Seq[String] = admission.collectFirst {
      case sm: graft.operators.Quality.Rule.SchemaMatches => sm
    }.toSeq.flatMap { sm =>
      val files = source.getOrElse(batch)
        .select(input_file_name().as("f")).distinct()
        .collect().map(_.getString(0)).filter(_.nonEmpty).sorted
      // threshold-dispatched (late r18): a handful of files reads
      // driver-side, a backfill batch's tens of thousands fan out as
      // one Spark job — Quality.footerSchemas
      graft.operators.Quality.footerSchemas(s, files.toSeq)
        .flatMap(a => graft.operators.Quality.schemaProblems(a, sm))
        .distinct.sorted
    }
    val ann0 = graft.operators.Quality.annotate(batch, admission)
    val ann = (if (footerProblems.isEmpty) ann0
      else ann0.withColumn("violations",
        array_sort(array_union(col("violations"),
          typedLit("schema" +: footerProblems)))))
      .persist()
    val bad = ann.where(size(col("violations")) > 0)
      .withColumn("violations", concat_ws(",", col("violations")))
      .withColumn("_batch", lit(bid))
    writeBatchSlice(s, s"${sinkPrefix}_quarantine", bad)
    val metrics0 = graft.operators.Quality
      .metricsOfAnnotated(ann, admission)
    val metrics =
      if (footerProblems.isEmpty) metrics0
      else {
        // add one row per FOOTER-ONLY drifted column, counting every
        // batch row. Footer-only: when the PINNED batch schema is
        // itself drifted (a stream started — or re-invoked, the
        // ledgeredIngest re-infers — over an already-broken feed),
        // metricsOfAnnotated already emits that column's row from the
        // batch schema; unioning the footer copy unconditionally
        // would double the rule's row in the _admission slice and
        // double-count it in every gauge aggregating by rule (late
        // r18, review).
        val batchNames = admission.collectFirst {
          case sm: graft.operators.Quality.Rule.SchemaMatches =>
            val actual = org.apache.spark.sql.types.StructType(
              ann.schema.fields.filterNot(_.name == "violations"))
            graft.operators.Quality.schemaProblems(actual, sm).toSet
        }.getOrElse(Set.empty[String])
        val footerOnly = footerProblems.filterNot(batchNames)
        val sp2 = s
        import sp2.implicits._
        val total = ann.count()
        if (footerOnly.isEmpty) metrics0
        else metrics0.unionByName(footerOnly
            .map(p => (p, total, total))
            .toDF("rule", "total", "violations"))
          .orderBy("rule")
      }
    writeBatchSlice(s, s"${sinkPrefix}_admission",
      metrics.withColumn("_batch", lit(bid)))
    // SUM over zero rows is NULL — an EMPTY gated batch (reachable
    // when exceptHeld excludes every row of a micro-batch) must not
    // NPE here, and a replay of the same batch would hit it again
    // deterministically (r18, ADVICE)
    val counts = ann.agg(count(lit(1)).as("n"),
      coalesce(sum(when(size(col("violations")) > 0, 1L)
        .otherwise(0L)), lit(0L)).as("b")).head
    val (n, badN) = (counts.getLong(0), counts.getLong(1))
    if (n > 0 && badN > maxQuarantineRate * n) {
      // the refusal path never reaches the caller's finally — drop
      // the cached batch HERE or every refused invocation/replay pins
      // another copy in the block manager for the session's lifetime
      // (r18, ADVICE)
      ann.unpersist()
      throw new IllegalStateException(
        s"$what: batch $bid quarantined $badN/$n rows (> " +
          s"${maxQuarantineRate * 100}% threshold) — feed looks " +
          s"poisoned; evidence in ${sinkPrefix}_quarantine/" +
          s"_batch=$bid and ${sinkPrefix}_admission; fix upstream " +
          "and re-invoke (the ledger did not commit this batch)")
    }
    (ann.where(size(col("violations")) === 0).drop("violations"),
      Some(ann))
  }

  /** Idempotent per-batch audit-sink append: the frame (carrying a
    * `_batch` column) lands as ONE partition of `table`, and a REPLAY
    * of the same batch id dynamically overwrites exactly its own
    * partition — the audit trail converges under ledger replay the
    * same way the index does, instead of duplicating rows. Used by the
    * admission gate's quarantine and metrics sinks.
    *
    * Locked (r18, the [[scrubQuarantine]] rationale): a slice write
    * racing a scrub of the same partition is two read-modify-writes
    * of one directory — serialize them or the loser's evidence is
    * silently clobbered. Reentrant, so the surrounding batch's member
    * verbs (which take the same lock) compose.
    *
    * Wait, don't fail (r19, ADVICE #4): the lock's session-wide
    * 30 s acquire timeout is sized for interactive maintenance verbs,
    * where failing fast beats convoying — but HERE the caller is a
    * streaming micro-batch, and a timeout fails the whole query while
    * a long wait merely delays one batch. A maintenance verb holding
    * the lock for minutes (backupIndex raw-copies O(bytes)) must
    * stall this write, not kill the stream, so the slice write
    * stretches its outermost acquire to
    * `graft.buildLock.streamTimeoutMs` (default 5 min) — scoped to
    * this call, leaving every interactive verb on the fast-fail
    * default.
    */
  private def writeBatchSlice(s: SparkSession, table: String,
      df: org.apache.spark.sql.DataFrame): Unit =
      graft.operators.TextOps.withBuildLock(s,
        waitMsOverride = Some(
          s.conf.getOption("graft.buildLock.streamTimeoutMs")
            .map(_.toLong).getOrElse(300000L))) {
    // partition column must be LAST for position-based insertInto
    val ordered = df.columns.filterNot(_ == "_batch") :+ "_batch"
    val out0 = df.select(ordered.map(col): _*)
    if (!s.catalog.tableExists(table)) {
      graft.operators.TextOps.clearOrphanLocation(s, table)
      out0.write.partitionBy("_batch").saveAsTable(table)
    } else {
      // the audit table's shape is pinned by its FIRST batch; a
      // later slice whose feed drifted (r18 — exactly what
      // Rule.SchemaMatches quarantines) aligns BY NAME into that
      // shape: columns the slice lost write null, columns it gained
      // are named in `violations` (schema:extra:c) but not stored —
      // a drifted batch is refused wholesale by the valve anyway,
      // with the source files intact upstream. Without this, the
      // first drifted slice would fail the position-based insert and
      // take the stream down with it.
      val target = s.table(table).schema
      val out = out0.select(target.fields.map { f =>
        if (out0.columns.contains(f.name))
          col(f.name).cast(f.dataType).alias(f.name)
        else lit(null).cast(f.dataType).alias(f.name)
      }.toIndexedSeq: _*)
      // session-conf scoped, NOT a writer option: insertInto resolves
      // the overwrite mode from spark.sql.sources.partitionOverwriteMode
      // (a writer-level option is silently ignored here, which would
      // turn this into a STATIC overwrite wiping every other batch's
      // partition — caught by AdmissionSpec's retention leg)
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "dynamic")
      try out.write.mode("overwrite").insertInto(table)
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  /** THE ledgered ingest loop — shared by the vector-index ingests and
    * [[streamingBm25Ingest]] (review r12: two hand-rolled copies of
    * the replay machinery is exactly the one-definition-or-drift
    * failure the loop exists to prevent): file-stream the source,
    * apply each micro-batch through `append` behind the batch-id
    * replay ledger, stable warehouse checkpoint at `<table>_ck`
    * (orphan-cleaned with its paired ledger when the table is gone),
    * then refresh `refresh` for the caller's session — the batch
    * writes ran in the micro-batch's CLONED session, whose relation
    * cache is separate, and a stale listing would miss appended files
    * (or fail on an overwritten stats table's vanished part file). */
  private def ledgeredIngest(spark: SparkSession, path: String,
      table: String, refresh: Seq[String],
      append: (org.apache.spark.sql.DataFrame, String, Long) => Unit,
      onReset: SparkSession => Unit = _ => (),
      afterReplay: SparkSession => Unit = _ => (),
      maxFilesPerTrigger: Option[Int] = None,
      afterBatch: SparkSession => Unit = _ => ()): Unit = {
    val schema = spark.read.parquet(path).schema
    val ledger = table + "_ledger"
    graft.operators.TextOps.clearOrphanLocation(spark, ledger)
    val ck = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase + "_ck")
    val fs = ck.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // reset keys on ANY member table missing, not just the primary
    // (ADVICE r12): for a multi-table ingest (bm25's stats twin, ANN's
    // payload twin), losing only the sibling while postings + ledger
    // survive would otherwise skip every batch as already-applied and
    // never rebuild the lost member. The reset drops EVERY member, not
    // just the missing one: with the checkpoint gone the source replays
    // all files, and replaying into a surviving append table would
    // duplicate its rows (or double-fold the stats twin)
    if (refresh.exists(t => !spark.catalog.tableExists(t))) {
      if (fs.exists(ck)) { fs.delete(ck, true); () }
      // checkpoint and ledger are a PAIR: with the checkpoint reset,
      // batch ids restart at 0, and a surviving ledger from the
      // dropped table's previous life would mark every redelivered id
      // as already applied — the ingest would return success having
      // appended nothing (the silent-skip failure the r11
      // stable-checkpoint fix was about, reintroduced through the
      // table-drop path)
      (refresh :+ ledger).foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        graft.operators.TextOps.clearOrphanLocation(spark, t)
      }
      // the family's TOMBSTONE siblings (`_del`, `_del_stage`) are
      // deliberately NOT in the drop list — deletion is terminal per
      // id, so tombstones must survive a reset. The family-specific
      // hook records whatever reconciliation the replay will owe them
      // (ADVICE r13: for stats-bearing families, the replay re-counts
      // tombstoned docs and the stats must be recomputed afterwards)
      onReset(spark)
    }
    // AvailableNow honors the source rate limit: with a cap the run
    // still drains everything, split into ordered per-file batches —
    // the upsert streams use 1 so version order = file order
    val src = maxFilesPerTrigger.foldLeft(
        spark.readStream.schema(schema))(
      (r, n) => r.option("maxFilesPerTrigger", n))
    val q = src.parquet(path).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val applied = s.catalog.tableExists(ledger) &&
          !s.table(ledger).filter(col("batch_id") === batchId).isEmpty
        if (!applied) {
          append(batch.toDF(), table, batchId)
          val sp = s
          import sp.implicits._
          Seq(batchId).toDF("batch_id")
            .write.mode("append").saveAsTable(ledger)
          // the maintenance hook (r14, VERDICT item 4): families wire
          // their policy pass here so an ingest loop self-maintains —
          // gauges are metadata-cheap and ops run only when tripped.
          // AFTER the ledger commit: a maintenance swap must never
          // make a completed append look unapplied on replay.
          afterBatch(s)
        }
      }
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // replay complete — settle any reset-owed reconciliation BEFORE
    // the caller-session cache refresh (it may rewrite a member)
    afterReplay(spark)
    refresh.foreach { t =>
      if (spark.catalog.tableExists(t)) spark.catalog.refreshTable(t)
    }
  }

  /** Streaming BM25 INDEX INGEST — the online half of the maintenance
    * story streamingBm25 serves from: documents arrive as a file
    * stream and each micro-batch APPENDS its doc-local postings to the
    * bucketed incremental index + folds its counts into the 1-row
    * stats table (TextOps.appendBm25Postings under foreachBatch — ONE
    * maintenance definition with batch, so stream-built and
    * batch-built indexes cannot drift; exact probe parity against
    * batch q_bm25 is gated in RetrievalSpec). Nothing already stored
    * is ever rewritten — per-batch cost is O(batch), never a corpus
    * re-scan, which is the whole 100 TB ingest contract.
    *
    * REPLAY GUARD: foreachBatch is at-least-once — a driver restart
    * redelivers batch ids, and a blind re-append would double every
    * posting and stats count. A `<table>_ledger` table records applied
    * batch ids; a redelivered id is skipped. The ledger write follows
    * the append non-atomically, so a crash exactly between them still
    * duplicates on replay — closing that last window needs a
    * transactional table format (the same caveat as upsertDirectory's
    * rename note above); one ingest stream per table, as the batch-id
    * namespace is per-query.
    *
    * STABLE CHECKPOINT (ADVICE r11): the checkpoint lives in the
    * warehouse at `<table>_ck`, derived from the table name — a fresh
    * temp checkpoint per invocation would restart batch ids at 0 every
    * run, making the ledger treat ANY later invocation on the same
    * table as a replay and silently drop genuinely NEW documents. With
    * the stable location, the checkpoint's file log also remembers
    * which source files are already ingested, so a re-invocation
    * processes only new arrivals (new batch ids, ledger passes) — the
    * incremental-ingest contract. The table name must be per-process
    * unique (TextOps.clearOrphanLocation's contract); pid-tokenized
    * names are reclaimed with their tables by the dead-pid sweep.
    */
  def streamingBm25Ingest(spark: SparkSession, sfDir: String,
      table: String, statsTable: String): Unit =
    // point the source AT the table path, not at sfDir + glob: the
    // corpus ships both as a single documents.parquet FILE (testdata)
    // and as a directory of part files (anything Spark wrote), and a
    // leaf-name glob filter would see no files in the directory layout
    ledgeredIngest(spark, s"$sfDir/documents.parquet", table,
      refresh = Seq(table, statsTable),
      append = (batch, t, _) => graft.operators.TextOps
        .appendBm25Postings(batch, t, statsTable),
      // tombstones survive a member-loss reset; the replay re-ingests
      // tombstoned docs, so the rebuilt stats are recomputed over the
      // tombstone-filtered postings once the replay lands (ADVICE r13)
      onReset = s => graft.operators.TextOps
        .markBm25ResetReconcile(s, table),
      afterReplay = s => graft.operators.TextOps
        .reconcileBm25Tombstones(s, table, statsTable))

  private def corpusPrep(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_toks", size(split(trim(col("text")), "\\s+")))
      .filter(col("n_toks") >= 5)
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicates("content_hash")
      // the one shared split definition — batch and streaming must
      // assign identically or resume/backfill mixes training sets
      .withColumn("split",
        graft.operators.TrainingData.splitCol(col("doc_id")))
      .select("doc_id", "split", "n_toks", "content_hash")

  case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  case class UserStats(n: Long, min_us: Long, max_us: Long)
  case class UserStatsOut(user_id: Long, n_events: Long, first_us: Long,
      last_us: Long)

  /** Spark 4 `transformWithState` (the arbitrary-state successor to
    * flatMapGroupsWithState): per-user lifetime event stats held in a
    * typed ValueState, merged batch over batch. Emits each key's updated
    * stats per micro-batch; on a bounded replay the LAST row per key
    * equals the batch aggregate.
    */
  class UserStatsProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, Ev, UserStatsOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
    @transient private var st: ValueState[UserStats] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserStats]("stats",
        org.apache.spark.sql.Encoders.product[UserStats], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserStatsOut] = {
      var n = 0L
      var mn = Long.MaxValue
      var mx = Long.MinValue
      rows.foreach { e =>
        n += 1
        if (e.ts_us < mn) mn = e.ts_us
        if (e.ts_us > mx) mx = e.ts_us
      }
      val merged =
        if (st.exists()) {
          val p = st.get()
          UserStats(p.n + n, math.min(p.min_us, mn), math.max(p.max_us, mx))
        } else UserStats(n, mn, mx)
      st.update(merged)
      Iterator.single(
        UserStatsOut(key, merged.n, merged.min_us, merged.max_us))
    }
  }

  /** Run the transformWithState processor over the events file stream
    * (RocksDB state store — required by the transformWithState operator).
    */
  def userStatsTws(spark: SparkSession, sfDir: String,
      queryName: String = "stream_tws"): DataFrame = {
    val sp = spark
    import sp.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (raw, tsUs) = eventsStreamWithTs(spark, sfDir)
      drainToMemory(raw
        .selectExpr("user_id", tsUs, "event_id")
        .as[Ev]
        .groupByKey(_.user_id)
        .transformWithState(new UserStatsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
        .toDF(), queryName)
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
  case class EvT(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)
  case class ClickSt(ts_us: Long, event_id: Long)
  case class AsOfOut(purchase_id: Long, user_id: Long, purchase_ts_us: Long,
      prev_click_id: Option[Long], prev_click_ts_us: Option[Long])

  /** Streaming as-of enrichment: each purchase carries the latest prior
    * click of the same user — the streaming twin of q_asof / the native
    * AsOfJoin. State per user is ONE row (the most recent click), not a
    * buffer, so memory is O(keys) regardless of stream length. Rows are
    * event-time-sorted within each micro-batch; across batches the
    * file-replay source preserves order, while a genuinely out-of-order
    * production source would need a small watermark-bounded reorder
    * buffer in front (the usual as-of stream caveat).
    */
  class AsOfProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, EvT, AsOfOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
    @transient private var lastClick: ValueState[ClickSt] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      lastClick = getHandle.getValueState[ClickSt]("lastClick",
        org.apache.spark.sql.Encoders.product[ClickSt], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EvT],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[AsOfOut] = {
      val out = scala.collection.mutable.ListBuffer[AsOfOut]()
      // buffers and heap-sorts ONE KEY's slice of the micro-batch: fine
      // under AvailableNow replay, but a hot key in a large trigger
      // interval concentrates its whole batch on this executor's heap —
      // production would bound the trigger (or pre-sort via a
      // watermark-bounded reorder buffer) before this operator.
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        if (e.event_type == "click") lastClick.update(ClickSt(e.ts_us, e.event_id))
        else if (e.event_type == "purchase") {
          val p = if (lastClick.exists()) Some(lastClick.get()) else None
          out += AsOfOut(e.event_id, key, e.ts_us,
            p.map(_.event_id), p.map(_.ts_us))
        }
      }
      out.iterator
    }
  }

  /** Run the streaming as-of over the events file stream (RocksDB store,
    * required by transformWithState).
    */
  def streamingAsOf(spark: SparkSession, sfDir: String,
      queryName: String = "stream_asof"): DataFrame = {
    val sp = spark
    import sp.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (raw, tsUs) = eventsStreamWithTs(spark, sfDir)
      drainToMemory(raw
        .filter(col("event_type").isin("click", "purchase"))
        .selectExpr("user_id", tsUs, "event_id", "event_type")
        .as[EvT]
        .groupByKey(_.user_id)
        .transformWithState(new AsOfProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
        .toDF(), queryName)
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  case class SessState(sessionIdx: Long, start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /** Custom streaming state: gap-based sessionization via
    * flatMapGroupsWithState (KeyValueGroupedDataset — SURVEY.md §2.10
    * extension surface). Completed sessions emit when a gap closes them;
    * the open tail session stays in state (it would emit on timeout in a
    * live stream), so a bounded replay yields exactly the batch sessions
    * minus each user's last.
    */
  def streamingSessionize(spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30,
      queryName: String = "stream_sessions"): DataFrame = {
    val sp = spark
    import sp.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val fn = (userId: Long, it: Iterator[Ev], state: GroupState[SessState]) => {
      // events within a micro-batch arrive unordered per group
      val evs = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val out = scala.collection.mutable.ListBuffer[SessionOut]()
      var st = state.getOption.getOrElse(SessState(0, -1L, -1L, 0L))
      evs.foreach { e =>
        if (st.start < 0) st = SessState(st.sessionIdx + 1, e.ts_us, e.ts_us, 1)
        else if (e.ts_us - st.end > gapUs) {
          out += SessionOut(userId, st.sessionIdx, st.n, st.start, st.end)
          st = SessState(st.sessionIdx + 1, e.ts_us, e.ts_us, 1)
        } else st = st.copy(end = e.ts_us, n = st.n + 1)
      }
      state.update(st)
      out.iterator
    }
    val (raw, tsUs) = eventsStreamWithTs(spark, sfDir)
    drainToMemory(raw
      .selectExpr("user_id", tsUs, "event_id")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(fn)
      .toDF(), queryName)
  }
}
