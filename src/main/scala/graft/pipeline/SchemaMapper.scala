package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** The reference's one distinctive front-end: synonym-driven schema
  * normalization for heterogeneous inputs (SURVEY.md §1.2).
  *
  * Pure driver-side metadata manipulation over `df.columns` — a rename is
  * free in Catalyst (no shuffle, no scan change), so this never touches
  * the data path regardless of scale.
  */
object SchemaMapper {

  /** Header canonicalization: lower + non-alphanumeric runs → `_`
    * (normalize_column_name, reference ETL_OMS.py:38-39).
    */
  def normalize(name: String): String =
    name.trim.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")

  /** First-matching-synonym-wins rename (apply_flexible_mapping,
    * reference ETL_OMS.py:41-57): for each input column in order, the
    * first standard column whose synonym list contains the normalized
    * header claims it; a standard column is claimed at most once (later
    * duplicates pass through unchanged instead of colliding).
    */
  def renameMap(cols: Seq[String],
      synonyms: Seq[(String, Seq[String])]): Map[String, String] = {
    val claimed = scala.collection.mutable.Set[String]()
    cols.flatMap { c =>
      val n = normalize(c)
      synonyms.collectFirst {
        case (std, syns) if !claimed(std) && (syns.contains(n) || std == n) =>
          claimed += std
          c -> std
      }
    }.toMap
  }

  /** Apply the synonym mapping as metadata-only renames. */
  def applyMapping(df: DataFrame,
      synonyms: Seq[(String, Seq[String])]): DataFrame =
    df.withColumnsRenamed(renameMap(df.columns.toSeq, synonyms))

  /** Materialize absent standard columns with typed null defaults
    * (reference ETL_OMS.py:65-67, ETL_OMS_OPERATIONNEL.py:89-93).
    */
  def ensureColumns(df: DataFrame, wanted: Seq[(String, DataType)]): DataFrame =
    wanted.foldLeft(df) { case (acc, (name, t)) =>
      if (acc.columns.contains(name)) acc
      else acc.withColumn(name, lit(null).cast(t))
    }
}
