package graft

import graft.operators.{Ann, AnnIndex, BqIndex, IvfIndex, Ivf, PqIndex, SqIndex, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dim=64 pin, lifted (VERDICT r12 top next-round item): every
  * stored vector-index family driven at dim 128 AND dim 768 — the
  * widths real embedding models ship (384-4096) — through
  * write / append / probe, with the degenerate rows (NULL embedding,
  * exact-zero vector) the 64-dim harness gates riding along. The
  * 64-dim oracles stay untouched: these fixtures are synthetic
  * corpora, deterministic (no RNG), ids dense from 0 (the quantizer
  * seed contract).
  *
  * What each family's wide-dim gate proves:
  *   - AnnIndex: stored-probe ≡ inline Ann.topK at the same banding
  *     (one shared definition, any width); config pinned in _cfg so a
  *     mixed-width append fails loudly.
  *   - IvfIndex: append assigns with the stored centroids, whose
  *     LENGTH now carries dim (the quantizer is the config store).
  *   - PqIndex: the (m, subDim) grid derives from the stored codebook
  *     (m·subDim = dim), so subDim=96 at 768 probes with the same
  *     machinery as 8 at 64.
  *   - BqIndex: ⌈dim/64⌉ signature words, graft_hamming summing
  *     per-word popcounts — checked against a plain-Scala repack.
  *   - SqIndex: codes are whatever length the vector is; append-exact.
  */
class WideDimSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()

  /** Deterministic corpus: ids dense from 0; vec_id 7 = NULL
    * embedding, vec_id 11 = exact zero vector (the degenerate pair
    * DegenerateHarnessSpec drives at dim 64); small integer-valued
    * coordinates so cosines are well-conditioned.
    */
  private def corpus(dim: Int, n: Int = 96, idOffset: Long = 0L): DataFrame = {
    val sp = spark
    import sp.implicits._
    (0L until n.toLong).map { i =>
      val id = i + idOffset
      val emb: Option[Seq[Double]] =
        if (id == 7L) None
        else if (id == 11L) Some(Seq.fill(dim)(0.0))
        else Some((0 until dim).map(j =>
          (((id * 31 + j * 17 + id * j) % 23) - 11).toDouble))
      (id, emb, s"l${id % 5}")
    }.toDF("vec_id", "embedding", "label")
  }

  private def drop(tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  for (dim <- Seq(128, 768)) {

    test(s"dim $dim: stored ANN probe equals inline banding; config pinned") {
      val t = s"wd_ann_${dim}_p$pid"
      val t2 = s"${t}_app"
      val all = Seq(t, s"${t}_vec", s"${t}_cfg",
        t2, s"${t2}_vec", s"${t2}_cfg")
      drop(all: _*)
      try {
        val emb = corpus(dim)
        AnnIndex.write(emb, t, nBands = 4, bits = 2, dim = dim,
          payloadCols = Seq("label"))
        assert(TextOps.readIndexConfig(spark, t) ===
          Some(Map("dim" -> dim, "nbands" -> 4, "bits" -> 2,
            "planemod" -> Ann.planeModulus(8, dim))))
        def rows(df: DataFrame) = df.collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        val stored = rows(AnnIndex.topK(spark, t, _ < 13, k = 3))
        val inline = rows(Ann.topK(emb, _ < 13, 3, nBands = 4, bits = 2,
          dim = dim))
        assert(stored === inline)
        assert(stored.nonEmpty)
        // degenerate queries (NULL → canon zero, exact zero) score the
        // sentinel on every candidate — identically to the 64-dim harness
        assert(stored.collect { case ((q, _), s) if q == 7L || q == 11L => s }
          .forall(_ === -1.0))
        // append-grown ≡ from-scratch at this width
        AnnIndex.append(emb.filter(pmod(col("vec_id"), lit(2)) === 0), t2,
          nBands = 4, bits = 2, dim = dim, payloadCols = Seq("label"))
        AnnIndex.append(emb.filter(pmod(col("vec_id"), lit(2)) === 1), t2,
          nBands = 4, bits = 2, dim = dim, payloadCols = Seq("label"))
        def bandRows(x: String) = spark.table(x).collect()
          .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
        assert(bandRows(t2) === bandRows(t))
        // a mixed-config append must fail loudly at the ingest site
        val e = intercept[IllegalArgumentException] {
          AnnIndex.append(corpus(64), t2, nBands = 4, bits = 2, dim = 64,
            payloadCols = Seq("label"))
        }
        assert(e.getMessage.contains("dim"), e.getMessage)
        // external-query serving reads the STORED config — no banding
        // parameters repeated at the call site
        val queries = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding"))
        val ext = AnnIndex.scoreExternal(queries, spark, t)
        val exact = Ann.prep(emb, dim)
          .select(col("vec_id").as("cid2"), col("v").as("cv"),
            col("nrm").as("cn"))
        val mismatch = ext.join(exact, col("vec_id") === col("cid2"))
          .join(Ann.prep(emb, dim).select(col("vec_id").as("qid2"),
            col("v").as("qv2"), col("nrm").as("qn2")),
            col("q_id") === col("qid2"))
          .withColumn("want", when(col("cn") > 0d && col("qn2") > 0d,
            graft.Det.rnd(expr("graft_dot(cv, qv2)") / (col("cn") * col("qn2")), 6))
            .otherwise(lit(-1.0)))
          .filter(!(col("sim") <=> col("want"))).count()
        assert(mismatch === 0L)
        assert(ext.count() > 0)
      } finally drop(all: _*)
    }

    test(s"dim $dim: IVF append assigns with stored centroids of that width") {
      val t = s"wd_ivf_${dim}_p$pid"
      val all = Seq(t, s"${t}_cent")
      drop(all: _*)
      try {
        val emb = corpus(dim)
        IvfIndex.write(emb, t, k = 4, dim = dim)
        // probe returns neighbors; degenerate queries score the sentinel
        val probed = IvfIndex.topK(spark, t, _ < 13, k = 3).collect()
        assert(probed.nonEmpty)
        assert(probed.filter(r => r.getLong(0) == 7L || r.getLong(0) == 11L)
          .forall(_.getDouble(3) === -1.0))
        // new vectors appended under the STORED quantizer — dim comes
        // from the centroid length, no width parameter to get wrong
        val batch = corpus(dim, n = 10, idOffset = 200L)
        IvfIndex.append(batch, t)
        val cents = spark.table(s"${t}_cent").collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
          .sortBy(_._1).toSeq
        assert(cents.head._2.length === dim)
        val expected = Ivf.assignCells(Ann.prep(batch, dim), cents)
          .select("vec_id", "cell").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        val got = spark.table(t).filter(col("vec_id") >= 200L)
          .select("vec_id", "cell").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got === expected)
      } finally drop(all: _*)
    }

    test(s"dim $dim: PQ grid derives from the codebook (subDim = dim/8)") {
      val t = s"wd_pq_${dim}_p$pid"
      val all = Seq(t, s"${t}_cb")
      drop(all: _*)
      try {
        val emb = corpus(dim)
        PqIndex.write(emb, t, m = 8, subDim = dim / 8, ks = 8)
        val cb = spark.table(s"${t}_cb")
        assert(cb.agg(max(size(col("c")))).collect()(0).getInt(0) === dim / 8)
        // probe with exact canon queries; k rows per query, degenerate
        // candidates never displace real neighbors (stored-norm guard)
        val q = emb.filter(col("vec_id") < 3)
          .select(col("vec_id"),
            expr(s"coalesce(CAST(embedding AS ARRAY<DOUBLE>), " +
              s"array_repeat(CAST(0 AS DOUBLE), $dim))").as("v"))
        val topk = PqIndex.topK(spark, t, q, k = 3).collect()
        assert(topk.length === 9)
        val degSims = topk.filter(r =>
          r.getLong(1) == 7L || r.getLong(1) == 11L).map(_.getDouble(2))
        assert(degSims.forall(_ === -1.0))
        // append under the frozen stored codebook ≡ direct encode
        val batch = corpus(dim, n = 8, idOffset = 300L)
        PqIndex.append(batch, t)
        val direct = PqIndex.encode(batch,
            cb.select(col("sub"), col("cid"), col("c"))).collect()
          .map(r => (r.getLong(0), r.getSeq[Int](2).toSeq)).toMap
        val stored = spark.table(t).filter(col("vec_id") >= 300L)
          .select("vec_id", "codes").collect()
          .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).toMap
        assert(stored === direct)
        assert(stored.nonEmpty)
      } finally drop(all: _*)
    }

    test(s"dim $dim: BQ packs ceil(dim/64) words; hamming sums popcounts") {
      val t = s"wd_bq_${dim}_p$pid"
      val tv = s"wd_bqv_${dim}_p$pid"
      val all = Seq(t, s"${t}_cfg", tv, s"${tv}_vec", s"${tv}_cfg")
      drop(all: _*)
      try {
        val emb = corpus(dim)
        BqIndex.write(emb, t, dim = dim)
        val nWords = (dim + 63) / 64
        val sigs = spark.table(t).collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
        assert(sigs.values.forall(_.size === nWords))
        // plain-Scala repack of the canon vectors must agree word-for-word
        val vecs = Ann.prep(emb, dim).select("vec_id", "v").collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
        def pack(v: Array[Double]): Seq[Long] = {
          val w = new Array[Long](nWords)
          v.zipWithIndex.foreach { case (x, i) =>
            if (x > 0) w(i >> 6) |= 1L << (i & 63)
          }
          w.toSeq
        }
        vecs.foreach { case (id, v) =>
          assert(sigs(id) === pack(v), s"vec $id")
        }
        // NULL/zero vectors → all-zero words
        assert(sigs(7L).forall(_ === 0L) && sigs(11L).forall(_ === 0L))
        // full probe through a payload table of the same width
        AnnIndex.write(emb, tv, nBands = 4, bits = 2, dim = dim)
        val topk = BqIndex.topK(spark, t, s"${tv}_vec", _ < 3, k = 3)
          .collect()
        assert(topk.length === 9)
        // ham ground truth on a spot pair from the packed words
        topk.take(3).foreach { r =>
          val (a, b) = (r.getLong(0), r.getLong(1))
          val expected = sigs(a).zip(sigs(b))
            .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
          assert(r.getInt(2) === expected, s"pair ($a, $b)")
        }
        // width is pinned: a 64-wide append must refuse
        val e = intercept[IllegalArgumentException] {
          BqIndex.append(corpus(64), t, dim = 64)
        }
        assert(e.getMessage.contains("dim"), e.getMessage)
      } finally drop(all: _*)
    }

    test(s"dim $dim: SQ codes are vector-length; append-exact") {
      val t = s"wd_sq_${dim}_p$pid"
      val t2 = s"${t}_app"
      val all = Seq(t, s"${t}_cfg", t2, s"${t2}_cfg")
      drop(all: _*)
      try {
        val emb = corpus(dim)
        SqIndex.write(emb, t, dim = dim)
        val rows0 = spark.table(t).collect()
          .map(r => (r.getLong(0), r.getDouble(1),
            r.getSeq[Byte](2).toSeq)).sortBy(_._1).toSeq
        assert(rows0.forall(_._3.size === dim))
        SqIndex.append(emb.filter(pmod(col("vec_id"), lit(2)) === 0), t2,
          dim = dim)
        SqIndex.append(emb.filter(pmod(col("vec_id"), lit(2)) === 1), t2,
          dim = dim)
        val rows2 = spark.table(t2).collect()
          .map(r => (r.getLong(0), r.getDouble(1),
            r.getSeq[Byte](2).toSeq)).sortBy(_._1).toSeq
        assert(rows2 === rows0)
        val topk = SqIndex.topK(spark, t, _ < 13, k = 3).collect()
        assert(topk.nonEmpty)
        assert(topk.filter(r => r.getLong(0) == 7L || r.getLong(0) == 11L)
          .forall(_.getDouble(2) === -1.0))
        // the dim pin: a mixed-width append must fail loudly — codes
        // reconstructing to a different length would NULL every
        // cross-width dot and silently vanish candidates
        val narrower = corpus(if (dim == 128) 64 else 128, n = 4,
          idOffset = 500L)
        val ex = intercept[IllegalArgumentException] {
          SqIndex.append(narrower, t,
            dim = if (dim == 128) 64 else 128)
        }
        assert(ex.getMessage.contains("built with dim"))
        // and the DATA-level guard (review r13): a batch whose
        // declared dim matches the pin but whose rows are a different
        // width must fail in the ingest scan itself, not store rows
        // whose cross-width dots NULL out at probe time
        val liar = intercept[Exception] {
          SqIndex.append(narrower, t, dim = dim)
        }
        def rootMsgs(e: Throwable): Seq[String] =
          Option(e).toSeq.flatMap(x =>
            Option(x.getMessage).toSeq ++ rootMsgs(x.getCause))
        assert(rootMsgs(liar).exists(_.contains("width mismatch")),
          rootMsgs(liar).mkString(" | "))
      } finally drop(all: _*)
    }
  }

  test("dim 128: streaming ANN + BQ ingest build the same index as batch") {
    val dim = 128
    val ta = s"wd_sann_p$pid"
    val tb = s"wd_sbq_p$pid"
    val dir = java.nio.file.Files.createTempDirectory("graft_wd").toString
    val all = Seq(ta, s"${ta}_vec", s"${ta}_cfg", s"${ta}_ledger",
      tb, s"${tb}_cfg", s"${tb}_ledger",
      s"${ta}_batch", s"${ta}_batch_vec", s"${ta}_batch_cfg",
      s"${tb}_batch", s"${tb}_batch_cfg")
    drop(all: _*)
    try {
      val emb = corpus(dim)
      def stageHalf(m: Int): Unit =
        emb.filter(pmod(col("vec_id"), lit(2)) === m)
          .select("vec_id", "embedding")
          .write.mode("append").parquet(s"$dir/embeddings.parquet")
      stageHalf(0)
      streaming.StreamingOps.streamingAnnIngest(spark, dir, ta,
        nBands = 4, bits = 2, dim = dim)
      streaming.StreamingOps.streamingBqIngest(spark, dir, tb, dim = dim)
      stageHalf(1)
      streaming.StreamingOps.streamingAnnIngest(spark, dir, ta,
        nBands = 4, bits = 2, dim = dim)
      streaming.StreamingOps.streamingBqIngest(spark, dir, tb, dim = dim)
      val full = spark.read.parquet(s"$dir/embeddings.parquet")
      AnnIndex.write(full, s"${ta}_batch", nBands = 4, bits = 2, dim = dim)
      BqIndex.write(full, s"${tb}_batch", dim = dim)
      def bandRows(x: String) = spark.table(x).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(bandRows(ta) === bandRows(s"${ta}_batch"))
      def sigRows(x: String) = spark.table(x).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).sortBy(_._1)
        .toSeq
      assert(sigRows(tb) === sigRows(s"${tb}_batch"))
      assert(sigRows(tb).size === emb.count())
    } finally {
      drop(all: _*)
      Seq(ta, tb).foreach { t =>
        val ck = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), t.toLowerCase + "_ck")
        ck.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(ck, true)
      }
    }
  }

  test("dim 128: external probes serve at the stored width (no caller dim)") {
    val dim = 128
    val ti = s"wd_exti_p$pid"
    val tb = s"wd_extb_p$pid"
    val ta = s"wd_exta_p$pid"
    val tq = s"wd_extq_p$pid"
    val all = Seq(ti, s"${ti}_cent", tb, s"${tb}_cfg",
      ta, s"${ta}_vec", s"${ta}_cfg", tq, s"${tq}_cfg")
    drop(all: _*)
    try {
      val emb = corpus(dim)
      IvfIndex.write(emb, ti, k = 4, dim = dim)
      BqIndex.write(emb, tb, dim = dim)
      AnnIndex.write(emb, ta, dim = dim)
      SqIndex.write(emb, tq, dim = dim)
      // external copies of members 1 and 2 — every probe derives the
      // width from the STORED artifact (centroids / _cfg), no dim
      // parameter passed anywhere
      val copies = emb.filter(col("vec_id").isin(1L, 2L))
        .select((col("vec_id") + 1000L).as("q_id"), col("embedding"))
      val ivf = IvfIndex.scoreExternal(copies, spark, ti, k = 2,
        nprobe = 2).collect()
      assert(ivf.nonEmpty)
      assert(ivf.filter(r => r.getLong(1) == r.getLong(0) - 1000L)
        .forall(_.getDouble(3) > 0.999))
      val ivfc = IvfIndex.scoreExternalCandidates(copies, spark, ti,
        nprobe = 2).collect()
      assert(ivfc.nonEmpty)
      val bq = BqIndex.scoreExternal(copies, spark, tb, s"${ta}_vec",
        k = 2).collect()
      assert(bq.exists(r =>
        r.getLong(1) == r.getLong(0) - 1000L && r.getInt(2) == 0))
      val sqr = SqIndex.scoreExternal(copies, spark, tq, k = 2)
        .collect()
      assert(sqr.filter(r => r.getLong(1) == r.getLong(0) - 1000L)
        .forall(_.getDouble(2) > 0.999))
    } finally drop(all: _*)
  }

  test("dim 128: streaming SQ + PQ + IVF ingest match batch at that width") {
    val dim = 128
    val ts = s"wd_ssq_p$pid"
    val tp = s"wd_spq_p$pid"
    val ti = s"wd_sivf_p$pid"
    val dir = java.nio.file.Files.createTempDirectory("graft_wds").toString
    val all = Seq(ts, s"${ts}_cfg", s"${ts}_ledger",
      s"${ts}_batch", s"${ts}_batch_cfg",
      tp, s"${tp}_cb", s"${tp}_ledger",
      ti, s"${ti}_cent", s"${ti}_ledger")
    drop(all: _*)
    try {
      val emb = corpus(dim)
      // the frozen-quantizer families train BEFORE ingest (ingest
      // never retrains) — PQ's grid and IVF's width both derive from
      // the stored artifact, so no dim parameter reaches the stream
      PqIndex.trainCodebook(emb, tp, m = 8, subDim = dim / 8, ks = 8)
      val cents = Ivf.kmeansCentroids(Ann.prep(emb, dim), 4, dim,
        IvfIndex.Iters)
      val sp = spark
      import sp.implicits._
      cents.toDF("cell", "c").write.saveAsTable(s"${ti}_cent")
      def stageHalf(m: Int): Unit =
        emb.filter(pmod(col("vec_id"), lit(2)) === m)
          .select("vec_id", "embedding")
          .write.mode("append").parquet(s"$dir/embeddings.parquet")
      def ingestAll(): Unit = {
        streaming.StreamingOps.streamingSqIngest(spark, dir, ts, dim = dim)
        streaming.StreamingOps.streamingPqIngest(spark, dir, tp)
        streaming.StreamingOps.streamingIvfIngest(spark, dir, ti)
      }
      stageHalf(0); ingestAll()
      stageHalf(1); ingestAll()
      val full = spark.read.parquet(s"$dir/embeddings.parquet")
      // SQ: doc-local codes — stream-grown ≡ batch-built
      SqIndex.write(full, s"${ts}_batch", dim = dim)
      def sqRows(x: String) = spark.table(x).collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          r.getSeq[Byte](2).toSeq)).sortBy(_._1).toSeq
      assert(sqRows(ts) === sqRows(s"${ts}_batch"))
      assert(sqRows(ts).size === emb.count())
      // PQ: stream-grown codes ≡ a direct encode under the stored
      // codebook (the never-retrains gate at this width)
      val direct = PqIndex.encode(full,
          spark.table(s"${tp}_cb").select(col("sub"), col("cid"),
            col("c"))).collect()
        .map(r => (r.getLong(0), r.getSeq[Int](2).toSeq)).toMap
      val streamed = spark.table(tp)
        .select(col("vec_id"), col("codes")).collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).toMap
      assert(streamed === direct)
      // IVF: stream-grown assignments ≡ assignCells under the stored
      // centroids, whose length IS the width
      val expected = Ivf.assignCells(Ann.prep(full, dim), cents)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = spark.table(ti).select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === expected)
      assert(got.size === emb.count())
    } finally {
      drop(all: _*)
      Seq(ts, tp, ti).foreach { t =>
        val ck = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), t.toLowerCase + "_ck")
        ck.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(ck, true)
      }
    }
  }
}
