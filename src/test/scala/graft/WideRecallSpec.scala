package graft

import graft.functions.VectorFunctions
import graft.operators.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AnnRecallSpec's ≥ 0.9 gate extended to the wide dims (r14, VERDICT
  * item 3): the WideDimSpec fixtures proved the machinery RUNS at dim
  * 128 and 768; this proves the banding still FINDS the neighbors
  * there. A width-scaling hazard is built into the plane family:
  * w(p, i) is periodic in i with period 29 (the modulus), so every
  * plane acts on the 29-bucket folded sums of the vector — at dim 768
  * the 16 planes all live in a 29-dimensional projection. The gate
  * holds because LSH recall depends on the angle between a query and
  * its neighbors, which the folded projection preserves for any
  * corpus whose neighbor structure is not adversarially concentrated
  * in the fold's kernel; the spec pins that this stays true for a
  * deterministic weakly-clustered fixture (the hard LSH case — see
  * AnnRecallSpec). If a future corpus defeats the fold, the
  * documented scaling rule applies: raise the modulus to a prime
  * > max(nBands·bits, dim) with (37 + 11i) % modulus != 0 for
  * i < dim, which restores genuine per-coordinate independence.
  */
class WideRecallSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()

  /** The WideDimSpec deterministic corpus, minus the degenerate pair
    * (NULL / zero vectors score the sentinel everywhere — recall over
    * them measures tiebreaks, not banding). */
  private def corpus(dim: Int, n: Int = 96): DataFrame = {
    val sp = spark
    import sp.implicits._
    (0L until n.toLong)
      .filter(id => id != 7L && id != 11L)
      .map { id =>
        (id, (0 until dim).map(j =>
          (((id * 31 + j * 17 + id * j) % 23) - 11).toDouble))
      }.toDF("vec_id", "embedding")
  }

  /** Deterministic CLUSTERED corpus for the IVF leg — cell routing
    * only helps when neighbor structure co-locates, so its recall
    * gate needs a corpus with genuine clusters: 4 well-separated
    * centers (coordinate magnitude ~27) plus small per-id noise
    * (~0.6), cluster = id % 4. Same-cluster vectors are nearly
    * parallel; cross-cluster angles are large. */
  private def clustered(dim: Int, nClusters: Int = 4,
      per: Int = 24): DataFrame = {
    val sp = spark
    import sp.implicits._
    (0L until (nClusters * per).toLong).map { id =>
      val c = (id % nClusters).toInt
      (id, (0 until dim).map { j =>
        (((c * 37 + j * 13) % 19) - 9) * 3.0 +
          (((id * 31 + j * 17 + id * j) % 7) - 3) * 0.2
      })
    }.toDF("vec_id", "embedding")
  }

  /** Brute-force ground truth with the library's exact sentinel
    * cosine (Det-rounded, zero-norm → -1, id tiebreaks). */
  private def bruteTopK(emb: DataFrame, dim: Int,
      isQ: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    val e = Ann.prep(emb, dim)
    val q = e.filter(isQ(col("vec_id")))
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val sim = when(col("nrm") > lit(0d) && col("qn") > lit(0d),
      Det.rnd(expr("graft_dot(v, qv)") / (col("nrm") * col("qn")), 6))
      .otherwise(lit(-1.0d))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", sim)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "vec_id")
  }

  for (dim <- Seq(128, 768)) {
    test(s"dim $dim: banded ANN (8x2) recall >= 0.9 vs brute force, real pruning") {
      VectorFunctions.register(spark)
      val emb = corpus(dim)
      val nCorpus = emb.count()
      val k = 5
      val isQ: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        _ < 10L
      val nQueries = 9L // ids 0-9 minus the excluded degenerate 7

      val brute = bruteTopK(emb, dim, isQ, k)

      val ann = Ann.topK(emb, isQ, k = k, nBands = 8, bits = 2,
        dim = dim).select(col("q_id"), col("vec_id"))

      val nTruth = brute.count()
      assert(nTruth === nQueries * k)
      val hits = brute.join(ann, Seq("q_id", "vec_id"), "left_semi")
        .count()
      val recall = hits.toDouble / nTruth
      assert(recall >= 0.9, s"dim $dim recall $recall = $hits/$nTruth")

      // banding must still PRUNE — recall 1.0 via candidates ≈ all
      // pairs would be a vacuous gate
      val nCand = Ann.candidates(Ann.prep(emb, dim), isQ,
        nBands = 8, bits = 2, dim = dim).count()
      val frac = nCand.toDouble / (nQueries * (nCorpus - 1))
      assert(frac < 0.95, s"dim $dim candidate fraction $frac")
      assert(nCand > 0)
    }
  }

  for (dim <- Seq(128, 768)) {
    test(s"dim $dim: IVF (k=4, nprobe=2) recall >= 0.9 vs brute force " +
        "on a clustered corpus") {
      VectorFunctions.register(spark)
      val t = s"wr_ivf_${dim}_p$pid"
      val all = Seq(t, s"${t}_cent", s"${t}_del")
      all.foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
      try {
        val emb = clustered(dim)
        val k = 5
        val isQ: org.apache.spark.sql.Column =>
          org.apache.spark.sql.Column = _ < 8L // 2 queries per cluster
        graft.operators.IvfIndex.write(emb, t, k = 4, dim = dim)
        val brute = bruteTopK(emb, dim, isQ, k)
        val nTruth = brute.count()
        assert(nTruth === 8L * k)
        val got = graft.operators.IvfIndex
          .topKMultiProbe(spark, t, isQ, k = k, nprobe = 2)
          .select("q_id", "vec_id")
        val hits = brute.join(got, Seq("q_id", "vec_id"), "left_semi")
          .count()
        val recall = hits.toDouble / nTruth
        assert(recall >= 0.9, s"dim $dim IVF recall $recall")
        // the quantizer genuinely separates the corpus: no empty cells
        // and no single cell swallowing everything (which would make
        // the recall gate vacuous — routing would never prune)
        val cellSizes = spark.table(t).groupBy("cell").count()
          .collect().map(_.getLong(1))
        assert(cellSizes.length === 4, cellSizes.mkString(","))
        assert(cellSizes.max < emb.count(), "one cell holds the corpus")
      } finally all.foreach(x =>
        spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
  }
}
