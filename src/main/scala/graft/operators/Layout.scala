package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan
  * locality. At 100 TB the dominant cost of a selective query is how
  * many files its predicates can SKIP via parquet min/max footers; a
  * single-column sort only serves one predicate dimension. Z-order
  * (Morton) interleaving maps k dimensions onto one linear key whose
  * ranges stay compact in every dimension, so range-partitioning by the
  * z-value gives every interleaved dimension useful file-level min/max
  * bounds — the same layout technique lakehouse table formats expose as
  * `OPTIMIZE ... ZORDER BY`.
  *
  * The bit-interleave is pure 64-bit integer shift/mask arithmetic —
  * identical in Spark and DuckDB, hence fully oracle-checkable, and
  * codegen-friendly (no UDF: every step is a builtin bitwise Column op).
  */
object Layout {

  /** Spread the low 16 bits of `c` onto even bit positions (0,2,4,…30)
    * — the classic Morton magic-mask ladder, all BIGINT ops.
    */
  def mortonSpread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit coordinates. */
  def zorder2(x: Column, y: Column): Column =
    mortonSpread16(x).bitwiseOR(shiftleft(mortonSpread16(y), 1))

  /** The same spread ladder as DuckDB SQL text (kept in lockstep with
    * mortonSpread16 — the oracle must do the identical integer ops).
    */
  def mortonSpread16Sql(e: String): String = {
    val x0 = s"(($e) & 65535)"
    val x1 = s"(($x0 | ($x0 << 8)) & 16711935)"
    val x2 = s"(($x1 | ($x1 << 4)) & 252645135)"
    val x3 = s"(($x2 | ($x2 << 2)) & 858993459)"
    s"(($x3 | ($x3 << 1)) & 1431655765)"
  }

  def zorder2Sql(x: String, y: String): String =
    s"(${mortonSpread16Sql(x)} | (${mortonSpread16Sql(y)} << 1))"

  /** Physically cluster `df` by a z-value: range-partition (so files
    * hold contiguous z-ranges → tight per-file min/max on every
    * interleaved dimension) and sort within partitions (so row groups
    * inside each file stay skippable too). This is the write-side half
    * of the story; q_zorder checks the arithmetic.
    */
  def clusterByZ(df: DataFrame, z: Column, numPartitions: Int): DataFrame =
    df.withColumn("zval", z)
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))

  val defs: Seq[QDef] = Seq(

    // Morton/Z-order key over (user, day): the two dimensions a typical
    // event-log query filters on. Embarrassingly parallel bit math —
    // zero shuffles; the clustering write built on it is exercised in
    // LayoutSpec (range partitioning + within-partition order + disjoint
    // per-partition z-ranges).
    QDef("q_zorder",
      (s, d) => {
        val ev = Tables.events(s, d)
        val day = datediff(col("ts").cast("date"),
          to_date(lit("1970-01-01"))).cast("long")
        val x = col("user_id").bitwiseAND(lit(0xFFFFL))
        val y = day.bitwiseAND(lit(0xFFFFL))
        ev.select(col("event_id"), x.as("zx"), y.as("zy"),
          zorder2(x, y).as("zval"))
      },
      Some {
        val day = "datediff('day', DATE '1970-01-01', CAST(ts AS DATE))"
        val x = "(user_id & 65535)"
        val y = s"(($day) & 65535)"
        s"SELECT event_id, $x AS zx, $y AS zy, " +
          s"${zorder2Sql(x, y)} AS zval FROM events"
      }),
  )
}
