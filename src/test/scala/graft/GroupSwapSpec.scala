package graft

import graft.operators.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** Group index-table swap (the refresh ops' "the PAIR isn't atomic"
  * caveat, closed): [[TextOps.swapIndexTableGroup]] promotes a SET of
  * replacement tables behind an intent marker — rename-all-out, then
  * rename-all-in, then drop backups + marker — and
  * [[TextOps.recoverGroupSwap]] replays whatever phase each member
  * crashed in. The invariant under test: from EVERY crash point the
  * recovery converges to the ALL-NEW group — never a mixed old/new
  * pair (which is exactly what a crash between PqIndex.refresh's two
  * single-table swaps used to serve: new codewords scoring old
  * codes).
  */
class GroupSwapSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()

  private def drop(tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  /** Stage: members a,b bound to OLD contents, replacements under
    * `_compact` with NEW contents. Returns (base, a, b, aTmp, bTmp).
    */
  private def stage(tag: String): (String, String, String, String, String) = {
    val base = s"gswap_${tag}_p$pid"
    val a = base + "_cb"
    val b = base
    val aTmp = a + "_compact"
    val bTmp = b + "_compact"
    val sp = spark
    import sp.implicits._
    Seq("old").toDF("v").write.mode("overwrite").saveAsTable(a)
    Seq("old").toDF("v").write.mode("overwrite").saveAsTable(b)
    Seq("new").toDF("v").write.mode("overwrite").saveAsTable(aTmp)
    Seq("new").toDF("v").write.mode("overwrite").saveAsTable(bTmp)
    (base, a, b, aTmp, bTmp)
  }

  private def contents(t: String): String =
    spark.table(t).collect()(0).getString(0)

  /** The marker swapIndexTableGroup writes in phase 0, written the
    * same way so crash-state tests can stage it directly. */
  private def writeMarker(base: String, pairs: Seq[(String, String)]): Unit = {
    val sp = spark
    import sp.implicits._
    pairs.toDF("member", "tmp").coalesce(1)
      .write.mode("overwrite").saveAsTable(base + "_swap")
  }

  private def assertAllNew(base: String, a: String, b: String): Unit = {
    TextOps.recoverGroupSwap(spark, base)
    assert(contents(a) === "new", s"$a not promoted")
    assert(contents(b) === "new", s"$b not promoted")
    Seq(base + "_swap", a + "_old", b + "_old",
      a + "_compact", b + "_compact").foreach(t =>
      assert(!spark.catalog.tableExists(t), s"leftover $t"))
  }

  test("happy path: group swap promotes all members, no leftovers") {
    val (base, a, b, aTmp, bTmp) = stage("ok")
    try {
      TextOps.swapIndexTableGroup(spark, base, Seq(a -> aTmp, b -> bTmp))
      assert(contents(a) === "new")
      assert(contents(b) === "new")
      Seq(base + "_swap", a + "_old", b + "_old", aTmp, bTmp)
        .foreach(t => assert(!spark.catalog.tableExists(t), t))
    } finally drop(a, b, aTmp, bTmp, base + "_swap",
      a + "_old", b + "_old")
  }

  test("crash after marker, before any rename → all-new") {
    val (base, a, b, aTmp, bTmp) = stage("c0")
    try {
      writeMarker(base, Seq(a -> aTmp, b -> bTmp))
      assertAllNew(base, a, b)
    } finally drop(a, b, aTmp, bTmp, base + "_swap",
      a + "_old", b + "_old")
  }

  test("crash after first member renamed out → all-new") {
    val (base, a, b, aTmp, bTmp) = stage("c1")
    try {
      writeMarker(base, Seq(a -> aTmp, b -> bTmp))
      spark.sql(s"ALTER TABLE $a RENAME TO ${a}_old")
      assertAllNew(base, a, b)
    } finally drop(a, b, aTmp, bTmp, base + "_swap",
      a + "_old", b + "_old")
  }

  test("crash after both renamed out → all-new") {
    val (base, a, b, aTmp, bTmp) = stage("c2")
    try {
      writeMarker(base, Seq(a -> aTmp, b -> bTmp))
      spark.sql(s"ALTER TABLE $a RENAME TO ${a}_old")
      spark.sql(s"ALTER TABLE $b RENAME TO ${b}_old")
      assertAllNew(base, a, b)
    } finally drop(a, b, aTmp, bTmp, base + "_swap",
      a + "_old", b + "_old")
  }

  test("crash after first member renamed in (the old mixed-pair window) → all-new") {
    val (base, a, b, aTmp, bTmp) = stage("c3")
    try {
      writeMarker(base, Seq(a -> aTmp, b -> bTmp))
      spark.sql(s"ALTER TABLE $a RENAME TO ${a}_old")
      spark.sql(s"ALTER TABLE $b RENAME TO ${b}_old")
      spark.sql(s"ALTER TABLE $aTmp RENAME TO $a")
      // this is the exact state the two-single-swaps design served
      // queries from: a new, b old — recovery must finish the job
      assertAllNew(base, a, b)
    } finally drop(a, b, aTmp, bTmp, base + "_swap",
      a + "_old", b + "_old")
  }

  test("crash after both renamed in, backups pending → all-new") {
    val (base, a, b, aTmp, bTmp) = stage("c4")
    try {
      writeMarker(base, Seq(a -> aTmp, b -> bTmp))
      spark.sql(s"ALTER TABLE $a RENAME TO ${a}_old")
      spark.sql(s"ALTER TABLE $b RENAME TO ${b}_old")
      spark.sql(s"ALTER TABLE $aTmp RENAME TO $a")
      spark.sql(s"ALTER TABLE $bTmp RENAME TO $b")
      assertAllNew(base, a, b)
    } finally drop(a, b, aTmp, bTmp, base + "_swap",
      a + "_old", b + "_old")
  }

  test("crash after one backup dropped, marker pending → all-new") {
    val (base, a, b, aTmp, bTmp) = stage("c5")
    try {
      writeMarker(base, Seq(a -> aTmp, b -> bTmp))
      spark.sql(s"ALTER TABLE $a RENAME TO ${a}_old")
      spark.sql(s"ALTER TABLE $b RENAME TO ${b}_old")
      spark.sql(s"ALTER TABLE $aTmp RENAME TO $a")
      spark.sql(s"ALTER TABLE $bTmp RENAME TO $b")
      spark.sql(s"DROP TABLE ${a}_old")
      assertAllNew(base, a, b)
    } finally drop(a, b, aTmp, bTmp, base + "_swap",
      a + "_old", b + "_old")
  }

  test("recoverGroupSwap is a no-op without a marker") {
    val (base, a, b, aTmp, bTmp) = stage("noop")
    try {
      TextOps.recoverGroupSwap(spark, base)
      assert(contents(a) === "old")
      assert(contents(b) === "old")
      assert(spark.catalog.tableExists(aTmp))
      assert(spark.catalog.tableExists(bTmp))
    } finally drop(a, b, aTmp, bTmp, base + "_swap",
      a + "_old", b + "_old")
  }
}
