package graft

import graft.operators.{Ann, AnnIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPT-IN banding-cost audit (r15): the derived plane modulus
  * (Ann.planeModulus — 97 at dim 64 vs the old fixed 29) eliminates
  * the i-period fold and the p-root bias, which CHANGES the bucket
  * distribution and therefore the candidate-set size the banded
  * probes score. The r15 idle benches show q_simsearch_banded at
  * ~0.31-0.34 s vs r14's 0.244 — this audit quantifies WHY, printing
  * the per-band bucket stats and the candidate-pair counts under
  * both moduli for the standard sf0.1 probe shape, so the trade
  * (recall floors at 0.9 across dims 64/128/768 incl. the
  * fold-defeating corpus, vs a modestly larger candidate set) is
  * measured rather than guessed. Run with GRAFT_SCALE_AUDIT=1.
  */
class BandCandidateAuditSpec extends AnyFunSuite with SparkSuite {

  test("candidate-pair counts under fixed-29 vs derived modulus " +
      "(audit — prints, gates only sanity)") {
    assume(sys.env.contains("GRAFT_SCALE_AUDIT"),
      "opt-in audit: set GRAFT_SCALE_AUDIT=1")
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables(spark, "/root/testdata/sf0.1", "embeddings")
    val dim = AnnIndex.Dim
    val derived = Ann.planeModulus(AnnIndex.NBands * AnnIndex.Bits, dim)
    val prep = Ann.prep(emb, dim).persist()
    try {
      val results = Seq("fixed29" -> 29, s"derived$derived" -> derived)
        .map { case (label, m) =>
          val banded = prep.select(col("vec_id"),
            posexplode(Ann.bandKeys(col("v"), AnnIndex.NBands,
              AnnIndex.Bits, dim, m)).as(Seq("band", "key")))
          val buckets = banded.groupBy("band", "key").count()
          val stats = buckets.agg(
            count(lit(1)).as("n_buckets"),
            max("count").as("max_bucket"),
            avg("count").as("avg_bucket")).collect()(0)
          // the standard member-probe shape: queries = vec_id < 30,
          // candidates = distinct (q, corpus) colliding on >= 1 band
          val q = banded.filter(col("vec_id") < 30)
            .withColumnRenamed("vec_id", "q_id")
          val cand = banded.join(q, Seq("band", "key"))
            .filter(col("vec_id") =!= col("q_id"))
            .select("q_id", "vec_id").distinct().count()
          println(f"BAND_AUDIT $label%12s buckets=${stats.getLong(0)}%6d " +
            f"max=${stats.getLong(1)}%6d avg=${stats.getDouble(2)}%8.1f " +
            f"candidates=$cand%8d")
          (label, cand)
        }
      // sanity only: both moduli must produce a non-degenerate banding
      results.foreach { case (l, c) => assert(c > 0, l) }
    } finally { prep.unpersist(); () }
  }
}
