package graft

import graft.operators.{AnnIndex, BqIndex, IvfIndex, SqIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EXTERNAL-QUERY SERVING for the compressed families (r13): the
  * production probe shape is a query that is NOT a corpus member —
  * AnnIndex.scoreExternal (and streamingAnn) had it, PqIndex.topK
  * takes arbitrary query vectors, but IVF / BQ / SQ probes could only
  * ask on behalf of stored ids. The gate for each new scoreExternal:
  * an external query whose embedding is the EXACT copy of member m's
  * must return m's member-probe neighbor set PLUS m itself (external
  * queries are never self-excluded), scored identically — one probe
  * pipeline, two entry points.
  */
class ExternalProbeSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()
  private def emb = Tables(spark, sf, "embeddings")

  private def drop(tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  /** External (q_id, embedding) copies of members 1 and 2. */
  private def copies: DataFrame =
    emb.filter(col("vec_id").isin(1L, 2L))
      .select((col("vec_id") + 1000L).as("q_id"), col("embedding"))

  test("IVF scoreExternal: a member-copy query sees the member's cell") {
    val t = s"ext_ivf_p$pid"
    drop(t, s"${t}_cent")
    try {
      IvfIndex.write(emb, t)
      val member = IvfIndex.topKMultiProbe(spark, t, _.isin(1L, 2L),
          k = 1000, nprobe = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ext = IvfIndex.scoreExternal(copies, spark, t,
          k = 1000, nprobe = 2).collect()
        .map(r => (r.getLong(0) - 1000L, r.getLong(1))).toSet
      // external = member + the self-match the member probe excludes
      assert(ext === member ++ Set((1L, 1L), (2L, 2L)))
      // and the self-match ranks as a near-1 cosine
      val self = IvfIndex.scoreExternal(copies, spark, t,
          k = 1, nprobe = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      assert(self.forall { case (q, v, sim) =>
        v == q - 1000L && sim > 0.999 })
    } finally drop(t, s"${t}_cent")
  }

  test("IVF stateless candidates equal scoreExternal pre-cut; stream equals batch") {
    val t = s"ext_ivfc_p$pid"
    drop(t, s"${t}_cent")
    val qdir = java.nio.file.Files.createTempDirectory("graft_extq")
      .toString
    try {
      IvfIndex.write(emb, t)
      // batch parity: the stateless literal-struct routing must pick
      // the same cells and scores as the windowed scoreExternal with
      // the cut disabled (k >= corpus)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          (r.getInt(2), r.getDouble(3)))).toMap
      val stateless = rows(IvfIndex.scoreExternalCandidates(
        copies, spark, t, nprobe = 2))
      val windowed = rows(IvfIndex.scoreExternal(
        copies, spark, t, k = 1000000, nprobe = 2))
      assert(stateless === windowed)
      assert(stateless.nonEmpty)
      // streaming parity: the same queries through the file-streamed
      // twin produce the identical candidate set
      copies.write.parquet(s"$qdir/queries.parquet")
      // the streaming twin probes the memoized corpus index — build
      // parity against IT, not the test-local table
      val memo = IvfIndex.ivfIndex(spark, sf)
      val streamed = rows(streaming.StreamingOps.streamingIvf(
        spark, sf, s"$qdir/queries.parquet", nprobe = 2,
        queryName = s"ext_ivf_stream_p$pid"))
      val batch = rows(IvfIndex.scoreExternalCandidates(
        copies, spark, memo, nprobe = 2))
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally drop(t, s"${t}_cent")
  }

  test("BQ scoreExternal: member-copy query at Hamming zero to itself") {
    val t = s"ext_bq_p$pid"
    val av = s"ext_bqv_p$pid"
    drop(t, s"${t}_cfg", av, s"${av}_vec", s"${av}_cfg")
    try {
      BqIndex.write(emb, t)
      AnnIndex.write(emb, av)
      val ext = BqIndex.scoreExternal(copies, spark, t, s"${av}_vec",
          k = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3)))
      assert(ext.nonEmpty)
      // the member copy itself is in the rerank set at ham 0, sim ≈ 1
      val selves = ext.filter { case (q, v, _, _) => v == q - 1000L }
      assert(selves.size === 2, ext.mkString(","))
      assert(selves.forall { case (_, _, ham, sim) =>
        ham == 0 && sim > 0.999 })
      // member probe for the same ids, shifted to the external id
      // space, is the external result minus the self-matches
      val member = BqIndex.topK(spark, t, s"${av}_vec", _.isin(1L, 2L),
          k = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val extPairs = ext.map { case (q, v, _, _) => (q - 1000L, v) }
        .toSet
      assert(member.subsetOf(extPairs ++ member), "sanity")
      // every member neighbor the external top-k kept is scored
      // identically (same candidate machinery)
      assert((extPairs -- Set((1L, 1L), (2L, 2L)))
        .subsetOf(member ++ Set((1L, 2L), (2L, 1L))))
    } finally drop(t, s"${t}_cfg", av, s"${av}_vec", s"${av}_cfg")
  }

  test("micro-batch streaming probes (BQ/PQ/SQ) equal their batch forms") {
    val qdir = java.nio.file.Files.createTempDirectory("graft_mbq")
      .toString
    val outs = Seq(s"mb_bq_p$pid", s"mb_pq_p$pid", s"mb_sq_p$pid")
    drop(outs: _*)
    try {
      copies.write.parquet(s"$qdir/queries.parquet")
      val staticQ = spark.read.parquet(s"$qdir/queries.parquet")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          r.getDouble(r.length - 1))).toMap

      val sig = graft.operators.BqIndex.bqIndex(spark, sf)
      val ann = graft.operators.AnnIndex.annIndex(spark, sf)
      val bqStream = rows(streaming.StreamingOps.streamingBq(
        spark, sf, s"$qdir/queries.parquet", k = 4,
        outTable = s"mb_bq_p$pid"))
      assert(bqStream === rows(graft.operators.BqIndex.scoreExternal(
        staticQ, spark, sig, ann + "_vec", k = 4)))
      assert(bqStream.nonEmpty)

      val pq = graft.operators.PqIndex.pqIndex(spark, sf)
      val pqStream = rows(streaming.StreamingOps.streamingPq(
        spark, sf, s"$qdir/queries.parquet", k = 4,
        outTable = s"mb_pq_p$pid"))
      val pqQ = graft.operators.Ann.prepExternal(staticQ, 64)
        .select(col("q_id").as("vec_id"), col("qv").as("v"))
      assert(pqStream === rows(graft.operators.PqIndex.topK(
        spark, pq, pqQ, k = 4)))
      assert(pqStream.nonEmpty)

      val sq = graft.operators.SqIndex.sqIndex(spark, sf)
      val sqStream = rows(streaming.StreamingOps.streamingSq(
        spark, sf, s"$qdir/queries.parquet", k = 4,
        outTable = s"mb_sq_p$pid"))
      assert(sqStream === rows(graft.operators.SqIndex.scoreExternal(
        staticQ, spark, sq, k = 4)))
      assert(sqStream.nonEmpty)
    } finally drop(outs: _*)
  }

  test("degenerate external queries (NULL/empty/zero) score the sentinel") {
    val t = s"ext_deg_p$pid"
    val av = s"ext_degv_p$pid"
    val sq = s"ext_degsq_p$pid"
    val all = Seq(t, s"${t}_cent", av, s"${av}_vec", s"${av}_cfg",
      sq, s"${sq}_cfg")
    drop(all: _*)
    try {
      val sp = spark
      import sp.implicits._
      IvfIndex.write(emb, t)
      AnnIndex.write(emb, av)
      BqIndex.write(emb, sq)
      val deg: org.apache.spark.sql.DataFrame = Seq(
        (9001L, None: Option[Seq[Double]]),
        (9002L, Some(Seq.empty[Double])),
        (9003L, Some(Seq.fill(64)(0.0))))
        .toDF("q_id", "embedding")
      // no crashes, and every returned similarity is the -1 sentinel
      // (a zero-norm query matches nothing meaningfully)
      val ivf = IvfIndex.scoreExternal(deg, spark, t, k = 2, nprobe = 2)
        .collect()
      assert(ivf.forall(_.getDouble(3) === -1.0), ivf.mkString(","))
      val bq = BqIndex.scoreExternal(deg, spark, sq, s"${av}_vec", k = 2)
        .collect()
      assert(bq.forall(_.getDouble(3) === -1.0), bq.mkString(","))
      val ann = AnnIndex.scoreExternal(deg, spark, av).collect()
      assert(ann.forall(_.getDouble(2) === -1.0), ann.mkString(","))
    } finally drop(all: _*)
  }

  test("wrong-width external queries fail loudly in every family") {
    val t = s"ext_width_p$pid"
    val av = s"ext_widthv_p$pid"
    val sq = s"ext_widthsq_p$pid"
    val all = Seq(t, s"${t}_cent", av, s"${av}_vec", s"${av}_cfg",
      sq, s"${sq}_cfg")
    drop(all: _*)
    try {
      val sp = spark
      import sp.implicits._
      IvfIndex.write(emb, t)
      AnnIndex.write(emb, av) // payload for the BQ rerank leg
      BqIndex.write(emb, sq)
      SqIndex.write(emb, sq + "x")
      val wide = Seq((5000L, (0 until 128).map(_.toDouble)))
        .toDF("q_id", "embedding")
      def msgs(e: Throwable): Seq[String] =
        Option(e).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      // external queries are user input that never passed an ingest
      // scan: a wrong-width vector must raise, not NULL every
      // dot/Hamming and return k rows of garbage (review r13)
      Seq(
        () => IvfIndex.scoreExternal(wide, spark, t, k = 3).collect(),
        () => IvfIndex.scoreExternalCandidates(wide, spark, t).collect(),
        () => BqIndex.scoreExternal(wide, spark, sq, s"${av}_vec",
          k = 3).collect(),
        () => SqIndex.scoreExternal(wide, spark, sq + "x", k = 3)
          .collect()
      ).foreach { f =>
        val e = intercept[Exception](f())
        assert(msgs(e).exists(_.contains("width mismatch")),
          msgs(e).mkString(" | "))
      }
    } finally drop(all :+ (sq + "x") :+ (sq + "x_cfg"): _*)
  }

  test("SQ scoreExternal: member-copy equals member probe plus self") {
    val t = s"ext_sq_p$pid"
    drop(t, s"${t}_cfg")
    try {
      SqIndex.write(emb, t)
      val member = SqIndex.topK(spark, t, _.isin(1L, 2L), k = 5)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val ext = SqIndex.scoreExternal(copies, spark, t, k = 6)
        .collect()
        .map(r => ((r.getLong(0) - 1000L, r.getLong(1)),
          r.getDouble(2))).toMap
      // the external top-6 is the member top-5 plus the self-match
      // (the query's own quantized row outranks or ties everything).
      // NEIGHBOR SETS match; sims differ slightly by design — the
      // member probe quantizes the query side too (it reads the
      // stored codes), while the external probe scores the EXACT
      // query vector against the dequantized corpus (no query-side
      // quantization loss)
      val nonSelf = ext.filter { case ((q, v), _) => v != q }
      assert(nonSelf.keySet === member.keySet)
      nonSelf.foreach { case (k2, sim) =>
        assert(math.abs(sim - member(k2)) < 0.01, s"$k2: $sim") }
      val selfSims = ext.collect { case ((q, v), sim) if v == q => sim }
      assert(selfSims.size === 2)
      assert(selfSims.forall(_ > 0.999))
    } finally drop(t, s"${t}_cfg")
  }
}
