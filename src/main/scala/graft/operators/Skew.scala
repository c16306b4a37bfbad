package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §4, 100 TB design).
  *
  * AQE's skew-join split handles most runtime skew; salting is the
  * explicit fallback when one grouping key dominates. Scope honestly
  * stated: this helper implements the two-phase pattern for SUM/COUNT
  * only (phase 1 aggregates on (key, salt), phase 2 re-sums partials
  * per key) — other algebraic aggregates need their own partial/combine
  * pair and are NOT expressible through this API (naively passing e.g.
  * an avg column would sum averages). For hash-aggregable sums, Spark's
  * own map-side partial aggregation already collapses a hot key to one
  * row per map partition, so the explicit form matters when partial
  * aggregation is ineffective — high-cardinality accumulator state or
  * partial-agg-disabled plans — and otherwise stands as the documented
  * pattern q_salted_agg oracles.
  */
object Skew {

  /** Two-phase salted sum/count aggregation. `sums` are columns to sum,
    * result columns keep their names; a row count comes along as `n`.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      sums: Seq[(String, Column)]): DataFrame = {
    // reject result names that would collide with the internal aliases:
    // a sum named "n" or "salt" once produced duplicate phase-1 columns
    // ("_n"/"_salt") and an AMBIGUOUS_REFERENCE at analysis
    require(sums.forall { case (n, _) =>
      n != "n" && n != "salt" && !n.startsWith("_") },
      "saltedAgg result names must not be 'n'/'salt' or start with '_'")
    val salted = df.withColumn("_salt",
      pmod(crc32(concat_ws("\u0000", keys.map(col): _*)) +
        spark_partition_id(), lit(salts)))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_n"),
        sums.map { case (name, c) => sum(c).as(s"_$name") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum("_n").as("n"),
        sums.map { case (name, _) => sum(s"_$name").as(name) }: _*)
  }
}
