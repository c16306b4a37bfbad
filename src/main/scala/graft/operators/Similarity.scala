package graft.operators

import graft.{Det, QDef, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (SURVEY.md §2.11 X3).
  *
  * Dot products / norms are higher-order-function folds over
  * `array<double>` — sequential left folds, bit-identical to DuckDB's
  * list_dot_product loop, and they stay inside whole-stage codegen
  * (no UDF). Similarities are floor-rounded (Det) before ranking so the
  * top-k cut is stable across engines.
  *
  * Scale: the brute-force query side is a broadcast of k query vectors —
  * fine for point lookups against any corpus size (scan stays
  * partition-parallel, one TakeOrdered per query). The label-blocked pair
  * search is the IVF-style path: pairs only form inside a block, so cost
  * is Σ|block|², not |corpus|². For open-ended 100 TB ANN, add
  * random-hyperplane LSH bucketing as the blocking key (same join shape).
  */
object Similarity {

  // graft_dot is the custom codegen DotProduct expression
  // (graft.functions.DotProduct) — same left-to-right accumulation as the
  // aggregate/zip_with fold and DuckDB's loop, minus the per-row zipped
  // array allocation.
  private val dotAB = "graft_dot(v, qv)"
  private val norm = "sqrt(graft_dot(v, v))"

  val defs: Seq[QDef] = Seq(

    // X3: brute-force top-5 cosine neighbors for query vectors vec_id<10.
    QDef("q_simsearch",
      (s, d) => {
        VectorFunctions.register(s)
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", expr(norm))
          .persist() // norms computed once, reused by query + candidate side
        val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn")).filter(col("q_id") < 10)
        val sim = Det.rnd(expr(dotAB) / (col("nrm") * col("qn")), 6)
        val w = Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("vec_id").asc)
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("sim", sim)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("q_id", "vec_id", "sim")
      },
      Some("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
        "FROM embeddings), " +
        "p AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id, " +
        s"${Det.rndSql("list_dot_product(c.v, q.v) / " +
          "(sqrt(list_dot_product(c.v, c.v)) * " +
          "sqrt(list_dot_product(q.v, q.v)))", 6)} AS sim " +
        "FROM e c, e q WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) " +
        "SELECT q_id, vec_id, sim FROM (SELECT *, row_number() OVER (" +
        "PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn FROM p) " +
        "WHERE rn <= 5")),

    // X3: LSH-bucketed ANN — 4 random-hyperplane sign bits (deterministic
    // integer-weight planes, identical in both engines) bucket the corpus;
    // each query searches only its own bucket. This is the 100 TB scale
    // path: per-bucket cost instead of a full scan per query, same
    // equi-join shape as any LSH blocking. Recall is approximate by
    // construction (bucket-boundary neighbors are missed).
    QDef("q_simsearch_lsh",
      (s, d) => {
        VectorFunctions.register(s)
        def plane(p: Int) =
          s"transform(sequence(0, 63), i -> double((31 * $p + 17 * i) % 7 - 3))"
        def bit(p: Int) =
          s"IF(graft_dot(v, ${plane(p)}) >= 0D, '1', '0')"
        val bucket = (1 to 4).map(bit).mkString("concat(", ", ", ")")
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", expr(norm))
          .withColumn("bucket", expr(bucket))
          .persist()
        val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("bucket").as("q_bucket"))
          .filter(col("q_id") < 10)
        val sim = Det.rnd(expr(dotAB) / (col("nrm") * col("qn")), 6)
        val w = Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("vec_id").asc)
        e.join(broadcast(q), col("bucket") === col("q_bucket") &&
            col("vec_id") =!= col("q_id"))
          .withColumn("sim", sim)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("q_id", "vec_id", "bucket", "sim")
      },
      Some {
        def plane(p: Int) =
          s"[CAST((31 * $p + 17 * i) % 7 - 3 AS DOUBLE) " +
            "for i in generate_series(0, 63)]"
        def bit(p: Int) =
          s"CASE WHEN list_dot_product(v, ${plane(p)}) >= 0 " +
            "THEN '1' ELSE '0' END"
        val bucket = (1 to 4).map(bit).mkString(" || ")
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, " +
          s"$bucket AS bucket FROM embeddings), " +
          "p AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id, c.bucket, " +
          s"${Det.rndSql("list_dot_product(c.v, q.v) / " +
            "(sqrt(list_dot_product(c.v, c.v)) * " +
            "sqrt(list_dot_product(q.v, q.v)))", 6)} AS sim " +
          "FROM e c JOIN e q ON c.bucket = q.bucket " +
          "AND q.vec_id < 10 AND c.vec_id <> q.vec_id) " +
          "SELECT q_id, vec_id, bucket, sim FROM (SELECT *, " +
          "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) " +
          "AS rn FROM p) WHERE rn <= 3"
      }),

    // X3/X4: embedding near-dup pairs, blocked by label (IVF-style coarse
    // partition) — pair cost is per-block, not corpus². May legitimately
    // return few/no rows when no near-dups exist.
    QDef("q_embed_dedup",
      (s, d) => {
        VectorFunctions.register(s)
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", expr(norm))
          .persist() // norms computed once, reused by both pair sides
        val a = e.select(col("vec_id").as("a_id"), col("label"),
          col("v").as("qv"), col("nrm").as("qn"))
        val b = e.select(col("vec_id").as("b_id"),
          col("label").as("b_label"), col("v"), col("nrm"))
        val sim = Det.rnd(expr(dotAB) / (col("nrm") * col("qn")), 6)
        b.join(a, col("label") === col("b_label") &&
            col("a_id") < col("b_id"))
          .withColumn("sim", sim)
          .filter(col("sim") > 0.4)
          .select("a_id", "b_id", "label", "sim")
      },
      Some("WITH e AS (SELECT vec_id, label, " +
        "CAST(embedding AS DOUBLE[]) AS v FROM embeddings) " +
        "SELECT a_id, b_id, label, sim FROM (" +
        "SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label, " +
        s"${Det.rndSql("list_dot_product(b.v, a.v) / " +
          "(sqrt(list_dot_product(b.v, b.v)) * " +
          "sqrt(list_dot_product(a.v, a.v)))", 6)} AS sim " +
        "FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id) " +
        "WHERE sim > 0.4"))
  )
}
