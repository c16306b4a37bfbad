package graft.operators

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.functions._

/** Relational basics: scans, projections, filters, sorts, set ops, scalar
  * functions (SURVEY.md §2.1, §2.2, §2.7, §2.8).
  *
  * Reference semantics come from /root/reference ETL_OMS*.py — e.g. the
  * fixed projection (ETL_OMS_FINAL.py:71), null-drop after lenient parse
  * (ETL_OMS.py:61-62), date range predicate (ETL_OMS_OPERATIONNEL.py:108),
  * keyword classification (ETL_OMS_OPERATIONNEL.py:76-81), dict-map lookup
  * with default (ETL_OMS.py:23-30,83) — re-expressed as declarative Column
  * plans so Catalyst pushes filters/projections into the parquet scan.
  */
object Relational {

  val defs: Seq[QDef] = Seq(

    // S1/P3: scan with projection + predicate; both reach the parquet
    // reader (PushedFilters / ReadSchema in .explain).
    QDef("q_scan",
      (s, d) => Tables(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(col("l_quantity") > 25),
      Some("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "WHERE l_quantity > 25")),

    // custom DataSource V2 source (graft.sources.SyntheticDocsProvider):
    // partition-planned deterministic generation with column pruning and
    // doc_id range pushdown. No DuckDB oracle (the source is not a file);
    // determinism + pruning + pushdown are gated in DataSourceV2Spec.
    QDef("q_synth_source",
      (s, _) => s.read.format("graft_docs")
        .option("rows", 10000).option("numPartitions", 8).load()
        .filter(col("doc_id") >= 1000)
        .groupBy("lang").agg(count(lit(1)).as("n"),
          sum("n_chars").as("sum_chars")),
      None),

    // P3/P4: fixed projection + computed + literal column
    // (ETL_OMS_FINAL.py:58,71).
    QDef("q_project",
      (s, d) => Tables(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        Det.rnd(col("o_totalprice") * lit(0.9), 2).as("discounted"),
        lit("graft").as("tag")),
      Some("SELECT o_orderkey, o_orderstatus, " +
        s"${Det.rndSql("o_totalprice * 0.9", 2)} AS discounted, " +
        "'graft' AS tag FROM orders")),

    // P6/P8/P9: materialize nulls (coerce-style) then drop them
    // (ETL_OMS.py:61-62 dropna after to_datetime coerce).
    QDef("q_filter_null",
      (s, d) => Tables(s, d, "lineitem")
        .withColumn("disc_nz",
          when(col("l_discount") =!= 0.0, col("l_discount")))
        .na.drop(Seq("disc_nz"))
        .select("l_orderkey", "l_linenumber", "disc_nz"),
      Some("SELECT l_orderkey, l_linenumber, l_discount AS disc_nz " +
        "FROM lineitem WHERE l_discount IS NOT NULL AND l_discount <> 0.0")),

    // P7: range predicate on date (ETL_OMS_OPERATIONNEL.py:108).
    QDef("q_filter_range",
      (s, d) => Tables(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
      Some("SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice " +
        "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01'")),

    // O1: multi-key sort (ETL_OMS.py:69).
    QDef("q_sort",
      (s, d) => Tables(s, d, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy(col("c_mktsegment").asc, col("c_acctbal").desc,
          col("c_custkey").asc),
      Some("SELECT c_custkey, c_mktsegment, c_acctbal FROM customer " +
        "ORDER BY c_mktsegment, c_acctbal DESC, c_custkey")),

    // O2+: top-k — Spark plans TakeOrderedAndProject (no global sort).
    QDef("q_topk",
      (s, d) => Tables(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")),

    // O3: union accumulation (ETL_OMS_OPERATIONNEL.py:236,331).
    QDef("q_union",
      (s, d) => {
        val o = Tables(s, d, "orders")
        val a = o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_totalprice"),
            lit("finished").as("src"))
        val b = o.filter(col("o_totalprice") > 400000)
          .select(col("o_orderkey"), col("o_totalprice"),
            lit("big").as("src"))
        a.unionByName(b)
      },
      Some("SELECT o_orderkey, o_totalprice, 'finished' AS src FROM orders " +
        "WHERE o_orderstatus = 'F' UNION ALL " +
        "SELECT o_orderkey, o_totalprice, 'big' AS src FROM orders " +
        "WHERE o_totalprice > 400000")),

    // set op: INTERSECT (distinct semantics on both engines).
    QDef("q_intersect",
      (s, d) => {
        val o = Tables(s, d, "orders")
        o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
          .intersect(
            o.filter(year(col("o_orderdate")) === 1996).select("o_custkey"))
      },
      Some("SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995 " +
        "INTERSECT " +
        "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996")),

    // set op: EXCEPT — customers who ordered in 1995 but not in 1996.
    QDef("q_except",
      (s, d) => {
        val o = Tables(s, d, "orders")
        o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
          .except(
            o.filter(year(col("o_orderdate")) === 1996).select("o_custkey"))
      },
      Some("SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995 " +
        "EXCEPT " +
        "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996")),

    // A2: distinct (ETL_OMS_FINAL.py:75 drop_duplicates).
    QDef("q_distinct",
      (s, d) => Tables(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // A7: count reporting (ETL_OMS_OPERATIONNEL.py:220-221).
    QDef("q_count",
      (s, d) => Tables(s, d, "orders")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n")),
      Some("SELECT o_orderstatus, count(*) AS n FROM orders " +
        "GROUP BY o_orderstatus")),

    // F5/F9: numeric coerce-to-null + NA→0 (ETL_OMS_OPERATIONNEL.py:123,
    // 326-329). try_cast so semantics hold even under ANSI sessions.
    // c_mktsegment NEVER parses as a number, so every row used to pay
    // the TRY-failure exception — the Det.tryCastNumSql pre-gate (r19)
    // nulls those without entering the throwing path; name_num's input
    // is almost always numeric, so it keeps the bare try_cast (a gate
    // there would only add a regex to the success path).
    QDef("q_cast",
      (s, d) => Tables(s, d, "customer").select(
        col("c_custkey"),
        coalesce(expr(Det.tryCastNumSql("c_mktsegment", "int")), lit(0))
          .as("seg_num"),
        col("c_acctbal").cast("long").as("bal_trunc"),
        expr("try_cast(substring(c_name, 10, 9) AS bigint)").as("name_num")),
      Some("SELECT c_custkey, " +
        "coalesce(TRY_CAST(c_mktsegment AS INTEGER), 0) AS seg_num, " +
        "CAST(trunc(c_acctbal) AS BIGINT) AS bal_trunc, " +
        "TRY_CAST(substr(c_name, 10, 9) AS BIGINT) AS name_num " +
        "FROM customer")),

    // F6/F7: arithmetic + rounding (ETL_OMS_OPERATIONNEL.py:121-148
    // per-capita conversion / 6dp rounding). Same op order on both sides
    // ⇒ bit-identical doubles before the round.
    QDef("q_math",
      (s, d) => Tables(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        Det.rnd(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax")), 2).as("charge"),
        Det.rnd(col("l_discount") * lit(100), 6).as("disc_pct"),
        Det.rnd(sqrt(col("l_quantity")), 6).as("qty_sqrt")),
      Some("SELECT l_orderkey, l_linenumber, " +
        s"${Det.rndSql("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)", 2)} AS charge, " +
        s"${Det.rndSql("l_discount * 100", 6)} AS disc_pct, " +
        s"${Det.rndSql("sqrt(l_quantity)", 6)} AS qty_sqrt FROM lineitem")),

    // F10: lower/trim/regexp_replace (ETL_OMS.py:38-39 canonicalization,
    // applied as data functions). DuckDB regexp_replace needs the 'g' flag
    // to match Spark's replace-all.
    QDef("q_strings",
      (s, d) => Tables(s, d, "part").select(
        col("p_partkey"),
        lower(trim(col("p_type"))).as("type_lc"),
        regexp_replace(lower(col("p_brand")), "[^a-z0-9]+", "_")
          .as("brand_canon"),
        concat_ws("|", col("p_type"), col("p_brand")).as("joined"),
        length(col("p_name")).as("name_len"),
        upper(substring(col("p_name"), 1, 3)).as("prefix")),
      Some("SELECT p_partkey, lower(trim(p_type)) AS type_lc, " +
        "regexp_replace(lower(p_brand), '[^a-z0-9]+', '_', 'g') AS brand_canon, " +
        "concat_ws('|', p_type, p_brand) AS joined, " +
        "CAST(length(p_name) AS INTEGER) AS name_len, " +
        "upper(substr(p_name, 1, 3)) AS prefix FROM part")),

    // F1-F3: date functions — truncation, parts, diff, parse round-trip
    // (ETL_OMS.py:61, ETL_OMS_OPERATIONNEL.py:100-106,331).
    QDef("q_dates",
      (s, d) => Tables(s, d, "orders").select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("odate"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate")))
          .as("days_to_2002"),
        to_date(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd")
          .as("roundtrip")),
      Some("SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate, " +
        "CAST(year(o_orderdate) AS INT) AS yr, " +
        "CAST(month(o_orderdate) AS INT) AS mo, " +
        "CAST(day(o_orderdate) AS INT) AS dom, " +
        "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start, " +
        "CAST(DATE '2002-01-01' - CAST(o_orderdate AS DATE) AS INT) " +
        "AS days_to_2002, " +
        "CAST(o_orderdate AS DATE) AS roundtrip FROM orders")),

    // F12: dict-map lookup with default (ETL_OMS.py:23-30,83 indicator →
    // unit map). typedLit map + element_at stays in codegen; a 4-row
    // broadcast-join dim would also work but is overkill for a constant map.
    QDef("q_maplookup",
      (s, d) => {
        val m = typedLit(Map(
          "click" -> "ui", "view" -> "ui",
          "purchase" -> "commerce", "signup" -> "account"))
        // try_element_at: missing keys yield null (not an ANSI error), so
        // the coalesce default works under any session mode
        Tables(s, d, "events").select(
          col("event_id"), col("event_type"),
          coalesce(try_element_at(m, col("event_type")), lit("unknown"))
            .as("unit"))
      },
      Some("SELECT event_id, event_type, CASE event_type " +
        "WHEN 'click' THEN 'ui' WHEN 'view' THEN 'ui' " +
        "WHEN 'purchase' THEN 'commerce' WHEN 'signup' THEN 'account' " +
        "ELSE 'unknown' END AS unit FROM events")),

    // ordered string aggregation (listagg / string_agg).
    QDef("q_string_agg",
      (s, d) => {
        Tables(s, d, "nation").createOrReplaceTempView("v_nation")
        // analysis resolves the view into the plan eagerly; the
        // finally-drop keeps the name out of the session catalog
        try s.sql("SELECT n_regionkey, " +
          "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations " +
          "FROM v_nation GROUP BY n_regionkey")
        finally s.catalog.dropTempView("v_nation")
      },
      Some("SELECT n_regionkey, " +
        "string_agg(n_name, ',' ORDER BY n_name) AS nations " +
        "FROM nation GROUP BY n_regionkey")),

    // 3-valued logic: null-safe equality, NULLIF/IFNULL, null ordering.
    QDef("q_null_semantics",
      (s, d) => Tables(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_discount"), lit(0.0)).as("disc_nz"),
        (nullif(col("l_discount"), lit(0.0)) <=> lit(null))
          .as("disc_is_zeroish"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0))
          .as("disc_or_sentinel"),
        (col("l_discount") > 0.05).and(lit(null).cast("boolean"))
          .as("and_with_null")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "nullif(l_discount, 0.0) AS disc_nz, " +
        "nullif(l_discount, 0.0) IS NOT DISTINCT FROM NULL " +
        "AS disc_is_zeroish, " +
        "coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_sentinel, " +
        "(l_discount > 0.05) AND CAST(NULL AS BOOLEAN) AS and_with_null " +
        "FROM lineitem")),

    // SQL front end: the same engine through spark.sql over temp views —
    // Catalyst's parser/analyzer on the user-facing path (the reference
    // has no SQL surface at all; this is table stakes for a query engine).
    QDef("q_sql_report",
      (s, d) => {
        // registrations INSIDE the try: if the customer read throws, the
        // already-registered v_orders must still be dropped
        // (dropTempView on a never-registered name is a no-op, not an
        // error, so the finally is safe either way)
        try {
          Tables(s, d, "orders").createOrReplaceTempView("v_orders")
          Tables(s, d, "customer").createOrReplaceTempView("v_customer")
          s.sql("SELECT c_mktsegment, CAST(year(o_orderdate) AS INT) AS yr, " +
            "count(*) AS n, " +
            // decimal(38,0) cents accumulator (the Det.exactSum shape,
            // emitted as SQL text): a bare sum(floor(...)) would sum
            // BIGINT here but DOUBLE in DuckDB — asymmetric accumulators
            // that diverge past 2^53. The cents enter through BIGINT
            // (r19, Det.exactSum reasoning: double→decimal is a
            // Double.toString per row; per-row cents ~10^7 are far
            // inside the long range at any scale)
            "CAST(sum(CAST(CAST(floor(o_totalprice * 100 + 0.5) " +
            "AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100 AS revenue " +
            "FROM v_orders JOIN v_customer ON o_custkey = c_custkey " +
            "GROUP BY c_mktsegment, year(o_orderdate)")
        } finally {
          s.catalog.dropTempView("v_orders")
          s.catalog.dropTempView("v_customer")
        }
      },
      Some("SELECT c_mktsegment, CAST(year(o_orderdate) AS INT) AS yr, " +
        "count(*) AS n, " +
        s"${graft.Det.exactSumSql("o_totalprice", 2)} AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment, year(o_orderdate)")),

    // correlated scalar subquery — Catalyst decorrelates it into an
    // aggregate + join (DecorrelateInnerQuery; the reference has no
    // subquery machinery at all).
    QDef("q_subquery_corr",
      (s, d) => {
        // the threshold is Det.rnd-rounded on BOTH sides: a raw double
        // avg's low bits are accumulation-order-dependent, and a
        // customer sitting between the two engines' averages would flip
        // in and out of the result set
        val thresh = graft.Det.rndSql("avg(c_acctbal)", 4)
        Tables(s, d, "customer").createOrReplaceTempView("v_customer")
        try s.sql("SELECT c_custkey, c_name, c_acctbal FROM v_customer c1 " +
          s"WHERE c_acctbal > (SELECT $thresh FROM v_customer c2 " +
          "WHERE c2.c_mktsegment = c1.c_mktsegment)")
        finally s.catalog.dropTempView("v_customer")
      },
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer c1 " +
        s"WHERE c_acctbal > (SELECT ${graft.Det.rndSql("avg(c_acctbal)", 4)}" +
        " FROM customer c2 " +
        "WHERE c2.c_mktsegment = c1.c_mktsegment)")),

    // error-tolerant arithmetic/casts: try_divide nulls on zero divisors,
    // try_cast nulls on malformed input — the pandas errors="coerce"
    // posture as first-class SQL functions (both engines side-step the
    // ANSI error path identically).
    // the failing-cast branch is deliberately SPARSE (l_linenumber = 7,
    // a few % of rows), and (r19) even those rows avoid Spark's
    // throwing TRY-failure path via Det.tryCastNumSql's regex pre-gate
    // (~9 µs per failing row measured — the gate cut this query from
    // 1.13 s to ~0.3 s at sf0.1). The ELSE branch skips the
    // long→string→int round-trip: try_cast(CAST(x AS STRING) AS INT)
    // and try_cast(x AS INT) agree for EVERY bigint (canonical digit
    // strings parse back exactly; out-of-int-range longs null on both
    // paths) — equality with the original expression is gated in
    // TryCastGateSpec.
    QDef("q_try_arith",
      (s, d) => Tables(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(l_quantity, l_linenumber - 1)").as("qd"),
        expr("CASE WHEN l_linenumber = 7 " +
          s"THEN ${Det.tryCastNumSql("l_returnflag", "INT")} " +
          "ELSE try_cast(l_linenumber AS INT) END").as("mixed_int"),
        expr("try_cast(l_orderkey AS INT)").as("ok_int")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "CASE WHEN l_linenumber - 1 = 0 THEN NULL " +
        "ELSE l_quantity / (l_linenumber - 1) END AS qd, " +
        "TRY_CAST(CASE WHEN l_linenumber = 7 THEN l_returnflag " +
        "ELSE CAST(l_linenumber AS VARCHAR) END AS INT) AS mixed_int, " +
        "TRY_CAST(l_orderkey AS INT) AS ok_int FROM lineitem")),

    // array-function surface over tokenized text: slice, sort, membership,
    // position (joined back to strings so the compare stays scalar).
    // array_position is 1-based with 0-absent in Spark; DuckDB
    // list_position is NULL-absent → coalesce to align.
    QDef("q_array_ops",
      (s, d) => Tables(s, d, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"),
          array_join(slice(col("toks"), 1, 3), ",").as("first3"),
          array_join(array_sort(col("toks")), ",").as("sorted_toks"),
          array_contains(col("toks"), "the").as("has_the"),
          array_position(col("toks"), "the").as("pos_the")),
      Some("SELECT doc_id, " +
        "array_to_string(toks[1:3], ',') AS first3, " +
        "array_to_string(list_sort(toks), ',') AS sorted_toks, " +
        "list_contains(toks, 'the') AS has_the, " +
        "CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) " +
        "AS pos_the FROM (SELECT doc_id, " +
        "string_split_regex(trim(text), '\\s+') AS toks FROM documents)")),

    // F11: keyword classification contains-chain, first match wins
    // (detect_maladie, ETL_OMS_OPERATIONNEL.py:76-81; 'Inconnue' fallback).
    QDef("q_classify",
      (s, d) => Tables(s, d, "part").select(
        col("p_partkey"), col("p_type"),
        when(lower(col("p_type")).contains("promo"), "promotional")
          .when(lower(col("p_type")).contains("econo"), "economy")
          .when(lower(col("p_type")).contains("standard"), "standard")
          .otherwise("other").as("category")),
      Some("SELECT p_partkey, p_type, CASE " +
        "WHEN lower(p_type) LIKE '%promo%' THEN 'promotional' " +
        "WHEN lower(p_type) LIKE '%econo%' THEN 'economy' " +
        "WHEN lower(p_type) LIKE '%standard%' THEN 'standard' " +
        "ELSE 'other' END AS category FROM part"))
  )
}
