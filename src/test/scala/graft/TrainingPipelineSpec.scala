package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end corpus-prep composition: the training-data operators used
  * the way a real ingest would chain them — quality floor, exact dedup,
  * deterministic split, context chunking — as ONE lazy DataFrame program.
  * Beyond each operator's own oracle, this gates the composition
  * properties: row conservation across stages, determinism across runs,
  * and a bounded shuffle count in the fused plan (the narrow stages must
  * not add exchanges).
  */
class TrainingPipelineSpec extends AnyFunSuite with SparkSuite {

  private val sf01 = "/root/testdata/sf0.01"

  private def pipeline() = {
    val docs = Tables(spark, sf01, "documents")
      .withColumn("n_toks", size(split(trim(col("text")), "\\s+")))
      .filter(col("n_toks") >= 5) // quality floor
    // exact dedup, keep lowest doc_id per content hash — one shuffle
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val deduped = docs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    // deterministic split, then chunk only the train partition
    val train = deduped
      .withColumn("split",
        graft.operators.TrainingData.splitCol(col("doc_id")))
      .filter(col("split") === "train")
    operators.TrainingData.chunk(train)
  }

  test("composed prep pipeline: conservation, determinism, one shuffle") {
    val chunks = pipeline()
    val out = chunks.collect()
    assert(out.nonEmpty)

    // conservation: chunked doc set == train partition of the deduped,
    // quality-floored corpus (chunk drops no doc — short ones yield one
    // clamped chunk)
    val expectDocs = {
      val docs = Tables(spark, sf01, "documents")
        .withColumn("n_toks", size(split(trim(col("text")), "\\s+")))
        .filter(col("n_toks") >= 5)
        .groupBy(md5(col("text")).as("fp"))
        .agg(min("doc_id").as("doc_id"))
        .withColumn("split",
          graft.operators.TrainingData.splitCol(col("doc_id")))
        .filter(col("split") === "train")
      docs.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(out.map(_.getLong(0)).toSet === expectDocs)

    // determinism: a second full evaluation produces identical chunks
    val again = pipeline().collect()
    assert(out.map(_.toSeq).sortBy(_.toString()) ===
      again.map(_.toSeq).sortBy(_.toString()))

    // plan economy: the whole prep is ONE exchange (the dedup window);
    // quality filter, split, and chunking are narrow and fuse around it.
    // A fresh plan — after an action, AdaptiveSparkPlan.toString prints
    // Final AND Initial sections and every node counts twice.
    val plan = pipeline().queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
