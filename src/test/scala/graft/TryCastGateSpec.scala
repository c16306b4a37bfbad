package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r19 optimization gates for Det.tryCastNumSql — the regex pre-gate
  * that keeps `try_cast(<string> AS <integral>)` off Spark's throwing
  * TRY-failure path (~9 µs per failing row measured at sf0.1; the gate
  * cut q_try_arith from 1.13 s to ~0.3 s).
  *
  * Correctness rests on ONE containment: gate-accept ⊇ try_cast-accept.
  * Rows the gate rejects return NULL — exactly what try_cast returns
  * for them IF the containment holds; rows the gate accepts still run
  * the real try_cast, so they cannot drift by construction. The legs
  * here verify the containment over an adversarial matrix plus random
  * fuzz, and the full rewritten q_try_arith expression against the
  * original formulation row-for-row.
  */
class TryCastGateSpec extends AnyFunSuite with SparkSuite {

  /** Adversarial strings: signs, whitespace flavors (ASCII + unicode,
    * which try_cast REJECTS and the gate must too — or at least never
    * accept-where-try-rejects matters only one way: the gate may
    * reject anything, but must accept everything try_cast accepts),
    * overflow, fractions, exponents, junk, unicode digits.
    */
  private val matrix = Seq(
    "A", "N", "R", "12", " 12 ", "+5", "-5", "1.5", "2147483648",
    "-2147483648", "2147483647", "", " ", "0x1A", "1e3", "\t7\n",
    "- 5", "007", ".", "12.", ".5", "+", "-", "12a", "a12", "1_000",
    "١٢", "  +0042  ", "9999999999999999999999", "12.9", "-12.5",
    "1,000", "Infinity", "-Infinity", "NaN", "nan", " 7",
    "7 ", " 7", "7", "5", "5", "+-3",
    "--3", "3-", "e3", "3e", "3e+", "0", "-0", "+0", "00000000000",
    "3d", "3D", "3f", "3F", "3L", "3.0", "3.000", "0.999999")

  private def fuzz: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val alphabet = " +-.0123456789eEdDfFaZ\t "
    (1 to 2000).map { _ =>
      val n = rnd.nextInt(8)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
  }

  test("gate containment: every string try_cast accepts passes the gate") {
    val df = spark.createDataFrame(
      (matrix ++ fuzz).map(Tuple1(_))).toDF("s")
    val viol = df.select(col("s"),
        expr("try_cast(s AS INT)").as("t"),
        regexp_like(col("s"), lit(Det.TryCastNumGate)).as("g"))
      .where(col("t").isNotNull && !col("g"))
      .collect()
    assert(viol.isEmpty,
      "gate rejected strings try_cast accepts: " + viol.mkString(", "))
  }

  test("gated expression equals bare try_cast on every input") {
    val df = spark.createDataFrame(
      ((matrix ++ fuzz).map(Option(_)) :+ (None: Option[String]))
        .map(Tuple1(_))).toDF("s")
    val cmp = df.select(
        expr("try_cast(s AS INT)").as("bare"),
        expr(Det.tryCastNumSql("s", "INT")).as("gated"))
      .where(!(col("bare") <=> col("gated")))
      .collect()
    assert(cmp.isEmpty, "gate changed try_cast semantics: " +
      cmp.mkString(", "))
  }

  test("q_try_arith rewrite equals the original formulation row-for-row") {
    val li = Tables(spark, sf, "lineitem")
    val original = li.select(
      col("l_orderkey"), col("l_linenumber"),
      expr("try_divide(l_quantity, l_linenumber - 1)").as("qd"),
      expr("try_cast(CASE WHEN l_linenumber = 7 THEN l_returnflag " +
        "ELSE CAST(l_linenumber AS STRING) END AS INT)").as("mixed_int"),
      expr("try_cast(l_orderkey AS INT)").as("ok_int"))
    val rewritten = SparkEntry.queries("q_try_arith")(spark, sf)
    assert(rewritten.schema == original.schema,
      s"schema drift: ${rewritten.schema} vs ${original.schema}")
    assert(rewritten.exceptAll(original).isEmpty &&
      original.exceptAll(rewritten).isEmpty)
  }

  test("try_cast(CAST(x AS STRING) AS INT) == try_cast(x AS INT) for longs") {
    // the ELSE-branch rewrite in q_try_arith: canonical digit strings
    // parse back exactly; out-of-int-range longs null on both paths
    val vals = Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L, 7L,
      Int.MaxValue.toLong, Int.MaxValue + 1L, Int.MinValue.toLong,
      Int.MinValue - 1L, 999999999999L)
    val df = spark.createDataFrame(vals.map(Tuple1(_))).toDF("x")
    val cmp = df.select(
        expr("try_cast(CAST(x AS STRING) AS INT)").as("viaStr"),
        expr("try_cast(x AS INT)").as("direct"))
      .where(!(col("viaStr") <=> col("direct")))
      .collect()
    assert(cmp.isEmpty, cmp.mkString(", "))
  }
}
