package graft.operators

import graft.{QDef, Tables}
import graft.pipeline.SchemaMapper
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reshaping and merge/upsert operators — the reference pipeline's
  * signature moves (SURVEY.md §2.6, §2.9): melt (ETL_OMS.py:76-81), pivot
  * (ETL_OMS_V2.py:25-36), last-write-wins upsert (ON CONFLICT DO UPDATE,
  * ETL_OMS_OPERATIONNEL.py:202-211), conditional dim enrichment
  * (ETL_OMS_OPERATIONNEL.py:320-352), synonym rename front-end, directory
  * ingestion with filename lineage (ETL_OMS_OPERATIONNEL.py:242-248), and
  * the batch twin of a tumbling event-time window.
  */
object Reshape {

  /** Integer-cents sum (see graft.Det): order-independent, engine-exact,
    * and decimal(38,0)-accumulated — a double accumulator is only exact
    * below 2^53, which a 100 TB revenue sum crosses.
    */
  private def centsSum(c: org.apache.spark.sql.Column) =
    graft.Det.exactSum(c, 2)

  val defs: Seq[QDef] = Seq(

    // R1: melt wide → long (df.melt, ETL_OMS.py:76-81) via built-in
    // unpivot — an Expand node, no shuffle.
    QDef("q_melt",
      (s, d) => Tables(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value"),
      Some("SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, " +
        "l_quantity AS value FROM lineitem UNION ALL " +
        "SELECT l_orderkey, l_linenumber, 'l_extendedprice', " +
        "l_extendedprice FROM lineitem UNION ALL " +
        "SELECT l_orderkey, l_linenumber, 'l_discount', l_discount " +
        "FROM lineitem UNION ALL " +
        "SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem")),

    // A5/R2: pivot long → wide with explicit value list (skips the extra
    // distinct-values job and fixes column order) + fillna(0)
    // (ETL_OMS_V2.py:25-36).
    QDef("q_pivot",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .pivot("event_type", types)
          .agg(centsSum(col("value")))
          .na.fill(0.0, types)
      },
      Some {
        val cols = Seq("click", "error", "purchase", "signup", "view")
          .map(t => "coalesce(CAST(sum(CASE WHEN event_type = '" + t +
            "' THEN CAST(floor(value * 100 + 0.5) AS HUGEINT) END) " +
            "AS DOUBLE) / 100, 0) AS " + t)
          .mkString(", ")
        s"SELECT CAST(ts AS DATE) AS day, $cols FROM events " +
          "GROUP BY CAST(ts AS DATE)"
      }),

    // U2/S8: last-write-wins upsert as union + keep-first window — the
    // DataFrame shape of ON CONFLICT (id) DO UPDATE
    // (ETL_OMS_OPERATIONNEL.py:202-211). Incoming batch: purchases with
    // doubled value.
    QDef("q_upsert",
      (s, d) => {
        val cols = Seq("event_id", "user_id", "ts", "event_type", "value")
        val base = Tables.events(s, d)
          .select(cols.map(col): _*).withColumn("src", lit(0))
        val updates = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"), (col("value") * lit(2.0)).as("value"))
          .withColumn("src", lit(1))
        val w = Window.partitionBy("event_id").orderBy(col("src").desc)
        base.unionByName(updates)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(cols.map(col): _*)
      },
      Some("SELECT event_id, user_id, ts, event_type, value FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY event_id " +
        "ORDER BY src DESC) AS rn FROM (" +
        "SELECT event_id, user_id, ts, event_type, value, 0 AS src " +
        "FROM events UNION ALL " +
        "SELECT event_id, user_id, ts, event_type, value * 2.0 AS value, " +
        "1 AS src FROM events WHERE event_type = 'purchase')) WHERE rn = 1")),

    // U3/F13: conditional dim enrichment — fill only missing values,
    // first observation (lowest key) wins
    // (ETL_OMS_OPERATIONNEL.py:320-323,337-352).
    QDef("q_dim_update",
      (s, d) => {
        val dim = Tables(s, d, "nation").withColumn("note",
          when(col("n_nationkey") % 2 === 0,
            concat(lit("note_"), col("n_nationkey"))))
        val w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
        val obs = Tables(s, d, "customer")
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("c_nationkey"), col("c_name").as("obs_note"))
        dim.join(broadcast(obs),
            dim("n_nationkey") === obs("c_nationkey"), "left")
          .select(col("n_nationkey"), col("n_name"),
            coalesce(col("note"), col("obs_note")).as("note"))
      },
      Some("SELECT n_nationkey, n_name, coalesce(CASE WHEN " +
        "n_nationkey % 2 = 0 THEN 'note_' || CAST(n_nationkey AS VARCHAR) " +
        "END, obs_note) AS note FROM nation LEFT JOIN (" +
        "SELECT c_nationkey, c_name AS obs_note FROM (" +
        "SELECT c_nationkey, c_name, row_number() OVER (" +
        "PARTITION BY c_nationkey ORDER BY c_custkey) AS rn FROM customer) " +
        "WHERE rn = 1) o ON n_nationkey = c_nationkey")),

    // S4/F11: directory ingestion with per-file lineage — filename-derived
    // dataset tag (detect_maladie on filename,
    // ETL_OMS_OPERATIONNEL.py:76-81,242-248).
    QDef("q_multifile",
      (s, d) => Tables.events(s, d)
        .withColumn("fname", input_file_name())
        // anchor the capture to a whole path SEGMENT named *.parquet —
        // leftmost match picks the dataset DIRECTORY for the standard
        // multi-file layout (events.parquet/part-...snappy.parquet),
        // where a bare "([a-z]+)\.parquet" would capture the codec
        .select(regexp_extract(col("fname"),
          "([^/]+)\\.parquet(/|$)", 1).as("dataset"))
        .groupBy("dataset").agg(count(lit(1)).as("n")),
      Some("SELECT 'events' AS dataset, count(*) AS n FROM events")),

    // batch twin of a tumbling event-time window (Structured Streaming's
    // groupBy(window(ts, "1 hour")) — SURVEY.md §2.10).
    QDef("q_tumbling",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), centsSum(col("value")).as("sumv"))
        .select(col("window.start").as("hour_start"), col("event_type"),
          col("n"), col("sumv")),
      Some("SELECT date_trunc('hour', ts) AS hour_start, event_type, " +
        s"count(*) AS n, ${graft.Det.exactSumSql("value", 2)} AS sumv " +
        "FROM events GROUP BY date_trunc('hour', ts), event_type")),

    // Time-series gap fill + forward fill (pandas reindex(date_range)
    // + ffill — the daily-epidemic-series densification the reference's
    // cumulative→delta derivation implicitly assumes): per-user daily
    // sums, the missing days of each user's [min_day, max_day] span
    // materialized via sequence+explode, value carried forward with
    // last(ignoreNulls). Scale shape: the calendar explode is bounded
    // by span length (not |events|), the daily rollup is one
    // partial-aggregated shuffle, and the fill is one window pass on
    // the same user key — two shuffles total, nothing quadratic.
    QDef("q_gapfill",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(centsSum(col("value")).as("v"))
        val cal = daily.groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"))).as("day"))
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cal.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            last(col("v"), ignoreNulls = true).over(w).as("v_fill"),
            col("v").isNull.as("is_gap"))
      },
      Some("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, " +
        s"${graft.Det.exactSumSql("value", 2)} AS v " +
        "FROM events GROUP BY user_id, CAST(ts AS DATE)), " +
        "cal AS (SELECT user_id, CAST(unnest(generate_series(" +
        "CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), " +
        "INTERVAL 1 DAY)) AS DATE) AS day FROM (" +
        "SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily " +
        "GROUP BY user_id)) " +
        "SELECT cal.user_id, cal.day, " +
        "last_value(daily.v IGNORE NULLS) OVER (" +
        "PARTITION BY cal.user_id ORDER BY cal.day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill, " +
        "(daily.v IS NULL) AS is_gap " +
        "FROM cal LEFT JOIN daily " +
        "ON cal.user_id = daily.user_id AND cal.day = daily.day")),

    // P1/P2: synonym-driven schema normalization front-end
    // (apply_flexible_mapping, ETL_OMS.py:41-57) — messy headers mapped
    // back to standard names, metadata-only.
    QDef("q_rename",
      (s, d) => {
        val messy = Tables.events(s, d).withColumnsRenamed(Map(
          "event_id" -> "Event ID", "user_id" -> "USER-Id",
          "value" -> " Value ", "event_type" -> "Event.Type"))
        val synonyms = Seq(
          "event_id" -> Seq("event_id", "id"),
          "user_id" -> Seq("user_id", "uid", "user"),
          "event_type" -> Seq("event_type", "type"),
          "value" -> Seq("value", "val", "amount"))
        SchemaMapper.applyMapping(messy, synonyms)
          .select("event_id", "user_id", "event_type", "value")
      },
      Some("SELECT event_id, user_id, event_type, value FROM events"))
  )
}
