package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered operator query: a Spark implementation over the harness
  * tables plus (when SQL-expressible) a DuckDB oracle that must hash-match.
  *
  * Determinism discipline (SURVEY.md §5.1): no `first()` without a windowed
  * order, explicit tiebreaks inside every `row_number`, `round` on double
  * aggregates, identical column aliases on both sides.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Readers for the harness tables (TESTDATA.md / FIXTURES.md §A). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case n        => spark.read.parquet(s"$sfDir/$n.parquet")
    }

  /** `events.parquet` has shipped in two generator flavors: parquet
    * TIMESTAMP(NANOS) — which Spark has no native type for, so it reads
    * as raw nanos LONG under `nanosAsLong` and truncates to micros
    * (integer `div`, no double loss at ~1.7e18 — exactly DuckDB's ns→µs
    * coercion) — and, from the 2026-08-13 regeneration on, native
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which reads as
    * TIMESTAMP_NTZ and only needs the cast to session-zone (UTC)
    * TimestampType to keep downstream semantics and the DuckDB oracle
    * (naive µs on its side) identical. Dispatch on the read schema so
    * both layouts work.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Normalize a raw events frame's `ts` (either flavor — see [[events]])
    * to µs-precision session-zone TimestampType, in place.
    */
  private[graft] def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }

  /** SQL expression extracting µs-since-epoch as LONG from a raw events
    * `ts` of the given read type — the streaming ops key state on this.
    */
  private[graft] def tsMicrosExpr(
      dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.LongType => "ts div 1000"
    case _ => "unix_micros(CAST(ts AS TIMESTAMP))"
  }
}

/** Cross-engine numeric determinism helpers (SURVEY.md §5.1).
  *
  * `Spark round()` (BigDecimal HALF_UP on the exact binary value) and
  * DuckDB `round()` (multiply-then-std::round) disagree near .xx5
  * boundaries, and floating-point sums depend on accumulation order. Both
  * are fixed by doing the arithmetic identically on both sides:
  *   - rnd: floor(x*10^n + 0.5)/10^n — same double ops in both engines.
  *   - exactSum: sum integer "cents" floor(x*10^n + 0.5) — integers sum
  *     exactly in ANY order, so partial-aggregation order, partitioning,
  *     and engine differences cannot change the result. The cents are
  *     summed as decimal(38,0) (DuckDB: HUGEINT), NOT double: a double
  *     accumulator is only exact below 2^53, which a 100 TB
  *     sum(l_extendedprice * 10^4) would cross. The single
  *     decimal→double cast after the sum rounds to nearest-even in both
  *     engines (Java BigDecimal.doubleValue / C++ int128→double).
  * Each helper has a *Sql twin that emits the same shape for the DuckDB
  * oracle; keep them in sync.
  */
object Det {
  import org.apache.spark.sql.Column

  def rnd(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }
  def rndSql(e: String, n: Int): String = {
    val p = BigInt(10).pow(n)
    s"floor(($e) * $p + 0.5) / $p"
  }

  def exactSum(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    sum(floor(c * lit(p) + lit(0.5)).cast("decimal(38,0)")).cast("double") /
      lit(p)
  }
  def exactSumSql(e: String, n: Int): String = {
    val p = BigInt(10).pow(n)
    s"CAST(sum(CAST(floor(($e) * $p + 0.5) AS HUGEINT)) AS DOUBLE) / $p"
  }
}

/** Boundary-rank percentile interpolation — THE one definition shared by
  * q_percentile, q_approx_percentile and q_winsorize (each previously
  * carried its own copy of this subtle formula; a fix to one would have
  * silently missed the others). Both engines use the (n-1)p linear
  * interpolation: 0-based target h = (n-1)p, value = v[floor(h)] +
  * (v[floor(h)+1] - v[floor(h)]) * frac(h) over the group-sorted column.
  *
  * Inputs are a pre-ranked frame: `rn` = row_number over the
  * group-by-value window (unique tiebreaks required for determinism),
  * `n` = count over the group. `interp` is an AGGREGATE expression
  * (evaluate under groupBy); `boundary` is the pre-aggregation filter
  * keeping only the ≤2 rows per p that the interpolation can touch —
  * optional (interp is correct without it) but it keeps the aggregate's
  * input at k rows per group instead of all of them. The *Sql twins emit
  * the identical arithmetic for the DuckDB oracle.
  */
object Pctl {
  import org.apache.spark.sql.Column

  def lo(p: Double, n: Column): Column =
    floor((n - 1) * lit(p)).cast("long") + 1

  private def vAt(p: Double, off: Int, rn: Column, n: Column,
      v: Column): Column = max(when(rn === lo(p, n) + off, v))

  def interp(p: Double, rn: Column, n: Column, v: Column): Column = {
    val hA = (max(n) - 1) * lit(p)
    val frac = hA - floor(hA)
    val v0 = vAt(p, 0, rn, n, v)
    v0 + (coalesce(vAt(p, 1, rn, n, v), v0) - v0) * frac
  }

  def boundary(ps: Seq[Double], rn: Column, n: Column): Column =
    ps.map(p => rn === lo(p, n) || rn === lo(p, n) + 1).reduce(_ || _)

  def loSql(p: Double, n: String = "n"): String =
    s"CAST(floor(($n - 1) * $p) AS BIGINT) + 1"

  private def vAtSql(p: Double, off: Int, rn: String, n: String,
      v: String): String =
    s"max(CASE WHEN $rn = ${loSql(p, n)} + $off THEN $v END)"

  def interpSql(p: Double, rn: String = "rn", n: String = "n",
      v: String = "value"): String = {
    val hA = s"((max($n) - 1) * $p)"
    val frac = s"($hA - floor($hA))"
    val v0 = vAtSql(p, 0, rn, n, v)
    s"($v0 + (coalesce(${vAtSql(p, 1, rn, n, v)}, $v0) - $v0) * $frac)"
  }

  def boundarySql(ps: Seq[Double], rn: String = "rn",
      n: String = "n"): String =
    ps.map(p => s"$rn = ${loSql(p, n)} OR $rn = ${loSql(p, n)} + 1")
      .mkString(" OR ")
}

/** Session defaults shared by Verify/Bench/tests: UTC (oracle date parity),
  * ANSI off (the reference's pandas `errors="coerce"` null-on-failure
  * semantics — SURVEY.md §2.7 F1/F5), shuffle partitions sized for local
  * mode, nanosAsLong for the events table.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
}
