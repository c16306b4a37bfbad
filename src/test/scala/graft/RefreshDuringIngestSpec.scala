package graft

import graft.operators.{Ann, Ivf, IvfIndex, PqIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full maintenance lifecycle COMPOSED: streaming ingest grows a
  * frozen-quantizer index, drift accumulates, `refresh` retrains and
  * promotes mid-stream, and ingest CONTINUES on the refreshed
  * quantizer — the operational sequence a production index actually
  * lives (ingest → drift → refresh → ingest), which none of the
  * per-op specs exercises end-to-end. The invariants:
  *   - refresh does not disturb the replay ledger or checkpoint, so
  *     the post-refresh ingest picks up exactly the new files;
  *   - post-refresh appends encode/assign under the REFRESHED
  *     artifact (the swap is visible to the ingest's append path);
  *   - the final stored state is bit-identical to training from
  *     scratch on the refresh-time corpus and encoding everything —
  *     i.e. the compose of {stream, refresh, stream} loses nothing.
  */
class RefreshDuringIngestSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()
  private val dim = 64

  private def vecs(ids: Range, shift: Int = 0): DataFrame = {
    val sp = spark
    import sp.implicits._
    ids.map { i =>
      val id = i.toLong
      (id, Some((0 until dim).map(j =>
        ((((id * 31 + j * 17 + id * j) % 23) - 11) + shift).toDouble)))
    }.toDF("vec_id", "embedding")
  }

  private def drop(tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  private def rmCk(t: String): Unit = {
    val ck = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), t.toLowerCase + "_ck")
    ck.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(ck, true); ()
  }

  test("PQ: ingest, refresh mid-stream, ingest — equals scratch build") {
    val t = s"rdi_pq_p$pid"
    val t2 = s"rdi_pq_scratch_p$pid"
    val dir = java.nio.file.Files.createTempDirectory("graft_rdi").toString
    val all = Seq(t, s"${t}_cb", s"${t}_ledger", s"${t}_compact",
      s"${t}_cb_compact", s"${t}_old", s"${t}_cb_old", s"${t}_swap",
      t2, s"${t2}_cb")
    drop(all: _*)
    try {
      val wave1 = vecs(0 until 40)
      val wave2 = vecs(40 until 70, shift = 30) // drifted coordinates
      val wave3 = vecs(70 until 90, shift = 30)
      PqIndex.trainCodebook(wave1, t)
      wave1.write.mode("append").parquet(s"$dir/embeddings.parquet")
      streaming.StreamingOps.streamingPqIngest(spark, dir, t)
      wave2.write.mode("append").parquet(s"$dir/embeddings.parquet")
      streaming.StreamingOps.streamingPqIngest(spark, dir, t)
      assert(spark.table(t).count() === 70L)

      // drift registered → refresh on the current corpus
      val atRefresh = wave1.unionByName(wave2)
      val before = PqIndex.quantizationError(spark, t, atRefresh)
      PqIndex.refresh(atRefresh, t)
      assert(PqIndex.quantizationError(spark, t, atRefresh) < before)

      // ingest CONTINUES: only the new files replay, and the append
      // encodes under the refreshed codebook
      wave3.write.mode("append").parquet(s"$dir/embeddings.parquet")
      streaming.StreamingOps.streamingPqIngest(spark, dir, t)
      assert(spark.table(t).count() === 90L)

      // scratch twin: train on the refresh-time corpus, encode all
      PqIndex.trainCodebook(atRefresh, t2)
      val scratch = PqIndex.encode(
          atRefresh.unionByName(wave3),
          spark.table(s"${t2}_cb").select(col("sub"), col("cid"),
            col("c"))).collect()
        .map(r => (r.getLong(0), (r.getDouble(1),
          r.getSeq[Int](2).toSeq))).toMap
      val stored = spark.table(t).collect()
        .map(r => (r.getLong(0), (r.getDouble(1),
          r.getSeq[Int](2).toSeq))).toMap
      assert(stored === scratch)
    } finally { drop(all: _*); rmCk(t) }
  }

  test("IVF: ingest, refresh mid-stream, ingest — equals scratch assignment") {
    val t = s"rdi_ivf_p$pid"
    val dir = java.nio.file.Files.createTempDirectory("graft_rdi2").toString
    val all = Seq(t, s"${t}_cent", s"${t}_ledger", s"${t}_compact",
      s"${t}_cent_compact", s"${t}_old", s"${t}_cent_old", s"${t}_swap")
    drop(all: _*)
    try {
      val wave1 = vecs(0 until 40)
      val wave2 = vecs(40 until 70, shift = 30)
      val wave3 = vecs(70 until 90, shift = 30)
      IvfIndex.write(wave1, t, k = 4)
      spark.sql(s"DROP TABLE $t") // keep only the trained quantizer
      wave1.write.mode("append").parquet(s"$dir/embeddings.parquet")
      streaming.StreamingOps.streamingIvfIngest(spark, dir, t)
      wave2.write.mode("append").parquet(s"$dir/embeddings.parquet")
      streaming.StreamingOps.streamingIvfIngest(spark, dir, t)
      assert(spark.table(t).count() === 70L)

      val atRefresh = wave1.unionByName(wave2)
      val before = IvfIndex.quantizationError(spark, t)
      IvfIndex.refresh(atRefresh, t)
      assert(IvfIndex.quantizationError(spark, t) < before)

      wave3.write.mode("append").parquet(s"$dir/embeddings.parquet")
      streaming.StreamingOps.streamingIvfIngest(spark, dir, t)
      assert(spark.table(t).count() === 90L)

      // scratch twin: retrain on the refresh-time corpus, assign all
      val cents = Ivf.kmeansCentroids(Ann.prep(atRefresh, dim), 4, dim,
        IvfIndex.Iters)
      val expected = Ivf.assignCells(
          Ann.prep(atRefresh.unionByName(wave3), dim), cents)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = spark.table(t).select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === expected)
      // and the stored quantizer IS the scratch-trained one
      val storedCents = spark.table(s"${t}_cent").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
        .sortBy(_._1).toSeq
      assert(storedCents === cents)
    } finally { drop(all: _*); rmCk(t) }
  }
}
