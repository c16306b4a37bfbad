package graft.pipeline

import org.apache.spark.sql.DataFrame

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
    // Locale.ROOT: a Turkish-locale JVM lowercases 'I' to dotless ı,
    // which the [^a-z0-9] class then strips — same rule as Bench.fmt
    name.trim.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")

  /** First-matching-synonym-wins rename (apply_flexible_mapping,
    * reference ETL_OMS.py:41-57). The reference iterates the synonym
    * table: for each standard column, the FIRST candidate (in
    * candidate-list order) present among the normalized headers claims
    * that input column, then `break` — so candidate priority, not header
    * order, decides (e.g. `country_region` beats `province_state` for
    * `country`). Each input column is claimed at most once, and a rename
    * is dropped if it would collide with a distinct surviving column of
    * the same (case-insensitive) name.
    */
  def renameMap(cols: Seq[String],
      synonyms: Seq[(String, Seq[String])]): Map[String, String] = {
    // like the reference's dict comprehension, a later duplicate
    // normalized header wins the slot
    val normalizedCols: Map[String, String] =
      cols.map(c => normalize(c) -> c).toMap
    val claimed = scala.collection.mutable.Set[String]()
    val mapping = scala.collection.mutable.LinkedHashMap[String, String]()
    synonyms.foreach { case (std, syns) =>
      val candidates = if (syns.contains(std)) syns else syns :+ std
      candidates.iterator
        .flatMap(normalizedCols.get)
        .find(c => !claimed(c))
        .foreach { c =>
          claimed += c
          if (c != std) mapping(c) = std
        }
    }
    // hardening beyond the reference (which would emit duplicate
    // columns): never rename onto a name another surviving column holds.
    // Two passes of care: (1) two sources claiming case-equal targets
    // keep only the first (synonym order); (2) the survivor filter runs
    // to a FIXPOINT — dropping a rename makes its source column survive
    // under its own name, which can invalidate a further rename
    // targeting that name (chained synonym tables).
    val seenStd = scala.collection.mutable.Set[String]()
    var m: Map[String, String] = mapping.iterator.filter { case (_, std) =>
      seenStd.add(std.toLowerCase(java.util.Locale.ROOT))
    }.toMap
    var changed = true
    while (changed) {
      val next = m.filter { case (c, std) =>
        !cols.exists(other => other != c && !m.contains(other) &&
          other.equalsIgnoreCase(std))
      }
      changed = next.size != m.size
      m = next
    }
    m
  }

  /** Apply the synonym mapping as metadata-only renames. */
  def applyMapping(df: DataFrame,
      synonyms: Seq[(String, Seq[String])]): DataFrame =
    df.withColumnsRenamed(renameMap(df.columns.toSeq, synonyms))
}
