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

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * has no native type for (PARQUET_TYPE_ILLEGAL on a plain read). Read the
    * raw nanos as long and truncate to micros — integer `div` so no double
    * precision loss at ~1.7e18 — which is exactly DuckDB's ns→us coercion,
    * keeping the oracle comparable.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
