package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zero-norm / NULL embeddings in the centroid-cosine cuts (ADVICE r08):
  * a zero vector is precisely the garbage embedding q_embed_outliers /
  * q_embed_assign exist to surface, so instead of a silent exclusion (or
  * an engine-divergent NULL from x/0.0) such rows score the sentinel
  * cos_sim -1.0 — the cosine floor — and deterministically lead the
  * outlier ranking in both engines. The synthetic fixture stages its own
  * embeddings.parquet so the degenerate rows exist regardless of what
  * the generated testdata contains.
  */
class ZeroNormEmbeddingSpec extends AnyFunSuite with SparkSuite {

  // labels 0 and 1 each get 3 well-formed orthant vectors (nonzero
  // centroid); vec 100 is all-zero under label 0, vec 101 is NULL under
  // label 1. Both centroids stay nonzero with the zero row folded in.
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_zeronorm").toString
    val sp = spark
    import sp.implicits._
    val good = (0 until 6).map { i =>
      val base = Array.fill(4)(0f)
      base(i % 2) = 1f + i
      base(2 + i % 2) = 2f
      (i.toLong, Option(base.toSeq), i % 2)
    }
    val degenerate = Seq(
      (100L, Option(Seq(0f, 0f, 0f, 0f)), 0),
      (101L, Option.empty[Seq[Float]], 1))
    (good ++ degenerate).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("q_embed_outliers: zero-norm and NULL vectors lead with cos_sim -1") {
    val out = SparkEntry.queries("q_embed_outliers")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // ascending cos_sim cut: the two degenerate rows rank first, tie
    // broken by vec_id, both at exactly the sentinel
    assert(out.take(2).toSeq === Seq((100L, -1.0), (101L, -1.0)))
    out.drop(2).foreach { case (id, cos) =>
      assert(cos > -1.0, s"vec $id unexpectedly at the sentinel")
    }
  }

  test("q_simsearch: degenerate corpus rows rank last, never crack top-k") {
    // NULL embeddings canonicalize to the zero vector (CosSim.canon)
    // and zero-norm rows score the sentinel -1.0, so with enough
    // well-formed candidates (here 5 per query, all sims >= 0) the
    // degenerate rows can never enter a top-5 cut. Cross-engine parity
    // on this class is checked end-to-end by scripts/degenerate_fixture
    // .py + check_oracle.py (9/9 similarity/embed queries green on a
    // corpus with both degenerate kinds).
    val out = SparkEntry.queries("q_simsearch")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out.nonEmpty)
    assert(!out.exists(t => t._2 == 100L || t._2 == 101L), out)
    out.foreach { case (q, c, sim) =>
      assert(sim > -1.0, s"well-formed pair ($q,$c) at the sentinel") }
  }

  test("q_embed_assign: zero-norm vector assigns to the lowest label") {
    val rows = SparkEntry.queries("q_embed_assign")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // all cosines tie at -1.0 → argmax tie-break takes the smallest
    // candidate label, deterministically in both engines
    assert(rows(100L) === ((0, -1.0, true)))
    assert(rows(101L) === ((0, -1.0, false)))
    assert(rows.size === 8)
  }
}
