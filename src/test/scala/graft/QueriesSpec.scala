package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run and return rows at sf0.001, plus
  * semantic spot checks lifted from the reference (SURVEY.md §5.2).
  */
class QueriesSpec extends AnyFunSuite with SparkSuite {

  // near-dup searches legitimately return 0 rows on a corpus without
  // planted near-duplicates; they must still run without error.
  private val mayBeEmpty =
    Set("q_dedup_near", "q_embed_dedup", "q_ngram_jaccard",
      "q_dedup_clusters", "q_dedup_incremental")

  test("all registered queries run and return rows") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, sf).count()
          if (n > 0 || mayBeEmpty(name)) None else Some(s"$name: 0 rows")
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("every oracle key has a query") {
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_delta: first row per user has delta 0 (ETL_OMS.py:71 fillna)") {
    val df = SparkEntry.queries("q_delta")(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val firsts = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("delta") =!= 0.0).count() === 0)
  }

  test("q_gapfill: contiguous per-user days, no null fills, gaps flagged") {
    val df = SparkEntry.queries("q_gapfill")(spark, sf)
    // every user's calendar is dense: row count == span days
    val spans = df.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        (datediff(max("day"), min("day")) + 1).as("span"))
    assert(spans.filter(col("n") =!= col("span")).count() === 0)
    // the first day per user is observed (span starts at an observation),
    // so forward fill leaves no nulls
    assert(df.filter(col("v_fill").isNull).count() === 0)
    // gap rows exist at sf0.001 and carry the previous day's value
    assert(df.filter(col("is_gap")).count() > 0)
  }

  test("q_dedup_keeplast: one row per (user_id, event_type)") {
    val df = SparkEntry.queries("q_dedup_keeplast")(spark, sf)
    assert(df.count() ===
      df.select("user_id", "event_type").distinct().count())
  }

  test("q_surrogate_ids: dense ids starting at 1, ordered by name") {
    val rows = SparkEntry.queries("q_surrogate_ids")(spark, sf)
      .orderBy("id_pays").collect()
    assert(rows.map(_.getInt(1)).toSeq === (1 to rows.length))
    val names = rows.map(_.getString(0)).toSeq
    assert(names === names.sorted)
  }

  test("q_classify falls back to 'other' (Inconnue semantics)") {
    val df = SparkEntry.queries("q_classify")(spark, sf)
    val cats = df.select("category").distinct().collect()
      .map(_.getString(0)).toSet
    assert(cats.subsetOf(
      Set("promotional", "economy", "standard", "other")))
  }
}
