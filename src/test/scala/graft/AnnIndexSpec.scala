package graft

import graft.operators.{Ann, AnnIndex, IvfIndex, Ivf}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stored embedding ANN band index + IVF quantizer (VERDICT r11
  * #1/#2) — the Bm25IndexSpec twin for the vector side: band postings
  * bucketed on band_key and payload bucketed on vec_id mean a retrieval
  * probe joins stored buckets with NO Exchange on the corpus side, and
  * the stored probes are bit-identical to the inline recompute forms
  * they replaced.
  */
class AnnIndexSpec extends AnyFunSuite with SparkSuite {

  private val table = "ann_idx_spec"
  private def emb = Tables(spark, sf, "embeddings")

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case other => other
  }
  private def shuffles(side: SparkPlan) =
    side.collect { case e: ShuffleExchangeExec => e }.size

  test("stored band-postings probe: zero Exchange under forced SMJ") {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_vec")
    // conf-isolated session (suites plan in parallel); shares the catalog
    val s = spark.newSession()
    graft.functions.VectorFunctions.register(s)
    try {
      AnnIndex.write(emb, table)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the un-hinted large-batch serving shape: query band keys vs the
      // full postings, both read from the SAME bucketed table — under
      // forced sort-merge NEITHER side may shuffle (both are bucketed
      // scans on the join key)
      val bands = s.table(table)
      val qb = bands.filter(col("vec_id") < 10)
        .select(col("band_key").as("q_band_key"),
          col("vec_id").as("q_id"))
      val cand = bands.join(qb,
        col("band_key") === col("q_band_key") &&
          col("vec_id") =!= col("q_id"))
      val root = unwrap(cand.queryExecution.executedPlan)
      val smj = root.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, root.toString)
      assert(shuffles(smj.head.left) === 0, smj.head.left.toString)
      assert(shuffles(smj.head.right) === 0, smj.head.right.toString)
      assert(root.toString.contains("SelectedBucketsCount"), root.toString)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_vec")
    }
  }

  test("stored payload fetch: vec-side bucketed join has zero Exchange") {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_vec")
    val s = spark.newSession()
    graft.functions.VectorFunctions.register(s)
    try {
      AnnIndex.write(emb, table)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // candidate rescoring shape: an id list (shuffles itself) joined
      // to the bucketed payload table — the corpus side must not move
      val sp = s
      import sp.implicits._
      val cand = Seq(0L, 3L, 7L).toDF("vec_id")
      val out = s.table(table + "_vec").join(cand, "vec_id")
      val root = unwrap(out.queryExecution.executedPlan)
      val smj = root.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, root.toString)
      val j = smj.head
      val (vecSide, candSide) =
        if (j.left.toString.contains(s"${table}_vec"))
          (j.left, j.right) else (j.right, j.left)
      assert(vecSide.toString.contains(s"${table}_vec"), root.toString)
      assert(shuffles(vecSide) === 0, vecSide.toString)
      assert(shuffles(candSide) === 1, candSide.toString)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_vec")
    }
  }

  test("stored probe is bit-identical to the inline Ann.topK") {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_vec")
    try {
      AnnIndex.write(emb, table)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => ((r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")),
          r.getAs[Double]("sim"))).toMap
      val stored = rows(AnnIndex.topK(spark, table, _ < 10, k = 3))
      val inline = rows(Ann.topK(emb, _ < 10, k = 3,
        nBands = AnnIndex.NBands, bits = AnnIndex.Bits))
      assert(stored === inline)
      assert(stored.nonEmpty)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_vec")
    }
  }

  test("stored IVF probe: zero corpus Exchange; equals inline kmeans") {
    val t = "ivf_idx_spec"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS ${t}_cent")
    val s = spark.newSession()
    graft.functions.VectorFunctions.register(s)
    try {
      IvfIndex.write(emb, t)
      // equivalence with the pre-r12 inline retrain (one shared
      // training definition — kmeansCentroids — so this should be
      // bit-exact, including cell ids)
      val e = Ann.prep(emb).persist()
      val inlineCells = Ivf.kmeansCells(e, IvfIndex.K, CosSim64,
        IvfIndex.Iters)
        .select("vec_id", "cell").collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
      val storedCells = spark.table(t).select("vec_id", "cell").collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
      e.unpersist()
      assert(storedCells === inlineCells)
      // probe plan: the cells side must be a bucketed scan, no Exchange
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cells = s.table(t)
      val q = cells.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("cell").as("q_cell"))
      val joined = cells.join(q, col("cell") === col("q_cell") &&
        col("vec_id") =!= col("q_id"))
      val root = unwrap(joined.queryExecution.executedPlan)
      val smj = root.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, root.toString)
      assert(shuffles(smj.head.left) === 0, smj.head.left.toString)
      assert(shuffles(smj.head.right) === 0, smj.head.right.toString)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_cent")
    }
  }

  // the 64-wide corpus dim without reaching into CosSim's privacy
  private val CosSim64 = 64

  test("streamingAnn: streamed scored candidates equal the batch probe") {
    // external queries in their own id namespace: copies of corpus
    // vectors (plus one zero vector for the sentinel path), staged as a
    // parquet dir for the file-stream source
    val qdir = java.nio.file.Files.createTempDirectory("graft_annq")
      .toString
    val sp = spark
    import sp.implicits._
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 5).collect()
      .map(r => (r.getLong(0) + 10000L,
        r.getSeq[Float](1)))
    val staged = corpus.toSeq :+ ((20000L, Seq.empty[Float]))
    staged.toDF("q_id", "embedding")
      .write.mode("overwrite").parquet(qdir)
    val out = streaming.StreamingOps.streamingAnn(spark, sf, qdir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    // batch twin: the SAME shared probe over a static read
    val table = graft.operators.AnnIndex.annIndex(spark, sf)
    val batch = graft.operators.AnnIndex.scoreExternal(
      spark.read.parquet(qdir), spark, table)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(out === batch)
    assert(out.nonEmpty)
    // semantic anchor: a query that IS corpus vector k must surface
    // (q, k) at sentinel-aware self-similarity 1.0 (band keys collide
    // on every band for identical vectors)
    corpus.foreach { case (qid, v) =>
      val self = (qid, qid - 10000L)
      if (v.exists(_ != 0f)) assert(out.get(self).contains(1.0), self)
    }
  }

  test("q_simsearch_banded answers from a second session in the same JVM") {
    assert(SparkEntry.queries("q_simsearch_banded")(spark, sf).count() > 0)
    val s2 = spark.newSession()
    graft.functions.VectorFunctions.register(s2)
    assert(SparkEntry.queries("q_simsearch_banded")(s2, sf).count() > 0)
    assert(SparkEntry.queries("q_simsearch_ivf")(s2, sf).count() > 0)
  }
}
