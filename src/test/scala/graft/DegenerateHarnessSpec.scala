package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r09 #3 / r10 #6: the degenerate-embedding fixture, wired into
  * the STANDARD harness automatically. scripts/degenerate_fixture.py
  * stays as driver-side tooling for the full DuckDB-oracle parity run;
  * this spec rebuilds the same fixture in-process — the real sf0.001
  * harness tables with one all-zero and one NULL embedding appended
  * (ids max+1, max+2) — and drives every similarity/embed query over it,
  * so the zero-norm/NULL path can never silently rot between rounds.
  *
  * Invariants pinned here (the cross-engine halves live in CosSim and
  * are oracle-checked by the driver on the un-doctored corpus):
  *   - every retrieval query still RUNS and returns rows;
  *   - no NULL cosine ever escapes (the sentinel exists so x/0.0's
  *     engine-divergent NULL cannot reach a ranking);
  *   - a degenerate candidate can only ever carry the sentinel -1.0;
  *   - brute-force top-k is IDENTICAL with and without the degenerate
  *     rows (sentinel rows can never displace a well-formed neighbor
  *     when ≥k well-formed candidates exist);
  *   - the outlier cut leads with exactly the degenerate rows, and
  *     nearest-centroid assignment gives them the sentinel.
  */
class DegenerateHarnessSpec extends AnyFunSuite with SparkSuite {

  private lazy val fixture: (String, Long, Long) = {
    val d = java.nio.file.Files.createTempDirectory("graft_degen").toString
    for (f <- new java.io.File(sf).listFiles
         if f.getName.endsWith(".parquet")
           && f.getName != "embeddings.parquet")
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(d, f.getName))
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val maxid = emb.agg(max("vec_id")).head.getLong(0)
    val lab0 = emb.orderBy("vec_id").select("label").head.getInt(0)
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val sp = spark
    import sp.implicits._
    val degen = Seq(
      (maxid + 1, Option(Seq.fill(dim)(0f)), lab0),
      (maxid + 2, Option.empty[Seq[Float]], lab0))
      .toDF("vec_id", "embedding", "label")
    emb.unionByName(degen)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    (d, maxid + 1, maxid + 2)
  }
  private def dir = fixture._1
  private def degenIds = Set(fixture._2, fixture._3)

  // (query, candidate-id column, sim column) for the retrieval family
  private val retrieval = Seq(
    ("q_simsearch", "vec_id", "sim"),
    ("q_simsearch_lsh", "vec_id", "sim"),
    ("q_simsearch_banded", "vec_id", "sim"),
    ("q_simsearch_ivf", "vec_id", "sim"),
    ("q_rag_retrieve", "vec_id", "sim"),
    // PQ: the stored-norm guard (toCodeRows) exists exactly for this
    // invariant — a degenerate vector's RECONSTRUCTION is a nonzero
    // codeword, so without it ADC would score it above the sentinel
    ("q_pq", "vec_id", "sim"),
    ("q_ivfpq", "vec_id", "sim"),
    // BQ: degenerate vectors pack to sig 0 (no coordinate > 0) and can
    // enter the Hamming top-C, but the exact rerank hands them the
    // sentinel — they can never displace a well-formed neighbor
    ("q_bq", "vec_id", "sim"),
    ("q_embed_dedup", "b_id", "sim"))

  test("retrieval family runs green; degenerate candidates only at the sentinel") {
    retrieval.foreach { case (name, candCol, simCol) =>
      val rows = SparkEntry.queries(name)(spark, dir)
        .select(col(candCol).cast("long"), col(simCol)).collect()
      assert(rows.nonEmpty, s"$name returned no rows on the fixture")
      rows.foreach { r =>
        assert(!r.isNullAt(1), s"$name: NULL sim escaped for ${r.get(0)}")
        if (degenIds.contains(r.getLong(0)))
          assert(r.getDouble(1) === -1.0,
            s"$name: degenerate ${r.getLong(0)} above the sentinel")
      }
    }
  }

  test("brute-force top-k unchanged by appending degenerate rows") {
    def topk(d: String) = SparkEntry.queries("q_simsearch")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, -t._3, t._2)).toSeq
    assert(topk(dir) === topk(sf))
  }

  test("q_embed_outliers leads with exactly the degenerate rows at -1") {
    val out = SparkEntry.queries("q_embed_outliers")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.take(2).map(_._1).toSet === degenIds)
    assert(out.take(2).forall(_._2 === -1.0))
    out.drop(2).foreach { case (id, cos) =>
      assert(cos > -1.0, s"vec $id unexpectedly at the sentinel") }
  }

  test("q_embed_assign gives degenerate rows the sentinel cosine") {
    val rows = SparkEntry.queries("q_embed_assign")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    degenIds.foreach { id => assert(rows(id) === -1.0, s"vec $id") }
    // every vector assigned exactly once — derived from the corpus, not
    // a hard-coded row count, so fixture regeneration can't break it
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.size.toLong === total)
  }

  test("q_pq: degenerate originals at the sentinel in the FULL scored set") {
    // the top-5 cut hides sentinel rows, so probe with k > corpus to
    // force every candidate out — the stored-norm guard must pin the
    // zero/NULL originals at exactly -1.0 even though their PQ
    // reconstructions are nonzero codewords with legitimate cosines
    import graft.operators.PqIndex
    val qdf = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 1)
      .select(col("vec_id"),
        coalesce(col("embedding").cast("array<double>"),
          typedlit(Seq.fill(64)(0.0))).as("v"))
    val all = PqIndex.topK(spark, PqIndex.pqIndex(spark, dir), qdf,
      k = 10000)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    degenIds.foreach { id =>
      assert(all(id) === -1.0, s"vec $id above the sentinel") }
    assert(all.size > degenIds.size)
  }

  test("q_semdd keeps degenerate rows (sentinel sims never dedup)") {
    val kept = SparkEntry.queries("q_semdd")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    degenIds.foreach(id => assert(kept.contains(id), s"vec $id dropped"))
  }

  test("q_embed_centroid stays finite with the zero row folded in") {
    val rows = SparkEntry.queries("q_embed_centroid")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(2) && !r.getDouble(2).isNaN, r.toString) }
  }
}
