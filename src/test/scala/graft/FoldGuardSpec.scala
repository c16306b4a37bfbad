package graft

import graft.operators.TextOps
import graft.operators.TextOps.FoldGuard
import org.scalatest.funsuite.AnyFunSuite

/** FOLD-AWARE SNAPSHOTS (r17, VERDICT item 1): a manifest snapshot
  * pins live FILE NAMES, and a compact/vacuum/rebuild rewrites them —
  * before r17 the refusal only fired at readSnapshot/restoreSnapshot
  * time, AFTER the anchor window was gone. Now every fold checks the
  * live `_mf_*` manifests FIRST and either refuses naming the pinned
  * tags (default), proceeds knowingly (Orphan — checkSnapshot names
  * exactly the retired tags), or copies the pinned files into a
  * per-tag fold anchor first (Anchor — the snapshot keeps serving
  * through readSnapshot/checkSnapshot/restoreSnapshot). due()/
  * describe() surface the conflict on the cadence check.
  */
class FoldGuardSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()

  private def drop(tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  private def famAll(t: String): Seq[String] =
    (t +: TextOps.BackupSiblings.map(t + _)) ++
      Seq(s"${t}_mf_s1", s"${t}_mf_s2", s"${t}_compact", s"${t}_old") ++
      TextOps.SnapshotCopySiblings.flatMap(sf =>
        Seq(s"$t${sf}_bak_mfs1", s"$t${sf}_bak_mfs2"))

  private def mkFam(t: String, n: Long = 12L): Unit = {
    val sp = spark
    import sp.implicits._
    TextOps.appendBm25Postings(
      (1L to n).map(i => i -> s"spark shuffle join token$i data")
        .toDF("doc_id", "text"), t, s"${t}_stats")
  }

  private def append(t: String, ids: Seq[Long]): Unit = {
    val sp = spark
    import sp.implicits._
    TextOps.appendBm25Postings(
      ids.map(i => i -> s"spark shuffle join token$i data")
        .toDF("doc_id", "text"), t, s"${t}_stats")
  }

  private def postings(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, String)] =
    df.selectExpr("doc_id", "token").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("a fold over a pinned snapshot REFUSES by default, naming " +
      "the tags; due() surfaces the conflict first") {
    val t = s"fg_refuse_p$pid"
    val all = famAll(t)
    drop(all: _*)
    try {
      mkFam(t)
      TextOps.snapshotIndex(spark, t, "s1")
      append(t, Seq(13L, 14L))
      val e = intercept[IllegalStateException] {
        TextOps.compactIndex(spark, t)
      }
      assert(e.getMessage.contains(s"$t/s1"), e.getMessage)
      assert(e.getMessage.contains("orphan"), e.getMessage)
      // the snapshot still serves — the fold never started
      assert(TextOps.checkSnapshot(spark, t, "s1") === Nil)
      // the cadence check names the conflict without running anything:
      // force compaction due via a zero threshold
      val st = TextOps.describeBm25(spark, t)
      assert(st.pinnedSnapshots === Seq(s"$t/s1"), st.pinnedSnapshots)
      val due = st.due(TextOps.MaintenancePolicy(filesPerBucketMax = 0.0))
      assert(due.exists(_.startsWith("fold-orphans-snapshots:")),
        due.toString)
      assert(due.exists(_.contains(s"$t/s1")), due.toString)
      // maintain under the same policy refuses like the direct fold
      val e2 = intercept[IllegalStateException] {
        TextOps.maintainBm25(spark, t,
          TextOps.MaintenancePolicy(filesPerBucketMax = 0.0))
      }
      assert(e2.getMessage.contains(s"$t/s1"), e2.getMessage)
    } finally drop(all: _*)
  }

  test("FoldGuard.Orphan proceeds; checkSnapshot then reports " +
      "exactly the retired tags") {
    val t = s"fg_orphan_p$pid"
    val all = famAll(t)
    drop(all: _*)
    try {
      mkFam(t)
      TextOps.snapshotIndex(spark, t, "s1")
      append(t, Seq(13L, 14L))
      TextOps.compactIndex(spark, t, FoldGuard.Orphan)
      // s1 is honestly unreadable now...
      val v = TextOps.checkSnapshot(spark, t, "s1")
      assert(v.exists(_.contains("not anchored")), v.toString)
      intercept[IllegalArgumentException] {
        TextOps.readSnapshot(spark, t, "s1")
      }
      // ...and a snapshot taken AFTER the fold is clean — the damage
      // is exactly the pre-fold tag
      TextOps.snapshotIndex(spark, t, "s2")
      assert(TextOps.checkSnapshot(spark, t, "s2") === Nil)
    } finally drop(all: _*)
  }

  test("FoldGuard.Anchor keeps the snapshot serving across compact " +
      "AND vacuum (tombstone-list drop included): readSnapshot, " +
      "checkSnapshot and restoreSnapshot all still converge") {
    val t = s"fg_anchor_p$pid"
    val all = famAll(t)
    drop(all: _*)
    try {
      val sp = spark
      import sp.implicits._
      mkFam(t)
      // a tombstone so the snapshot manifests a `_del` member too
      TextOps.deleteBm25Docs(spark, t, s"${t}_stats",
        Seq(3L).toDF("doc_id"))
      TextOps.snapshotIndex(spark, t, "s1")
      val want = postings(TextOps.readSnapshot(spark, t, "s1"))
      val wantDel = TextOps.readSnapshot(spark, t, "s1", "_del").count()
      assert(wantDel > 0)
      append(t, Seq(21L, 22L))
      // compact rewrites the postings files; vacuum folds the
      // tombstones into the members and DROPS the `_del` table
      TextOps.compactIndex(spark, t, FoldGuard.Anchor)
      TextOps.vacuumIndex(spark, s"${t}_del", Seq(t), "doc_id",
        FoldGuard.Anchor)
      assert(!spark.catalog.tableExists(s"${t}_del"))
      // the snapshot still serves — postings from the anchor, the
      // dropped tombstone list from its anchored files
      assert(TextOps.checkSnapshot(spark, t, "s1") === Nil)
      assert(postings(TextOps.readSnapshot(spark, t, "s1")) === want)
      assert(TextOps.readSnapshot(spark, t, "s1", "_del").count() ===
        wantDel)
      // and the restore converges bit-exact: anchored postings come
      // back under their manifested names, the dropped `_del` member
      // is recreated from the anchor
      val out = TextOps.restoreSnapshot(spark, t, "s1")
      assert(out.exists(_.contains("fold anchor")), out.toString)
      assert(postings(spark.table(t)) === want)
      assert(spark.catalog.tableExists(s"${t}_del"))
      assert(spark.table(s"${t}_del").count() === wantDel)
      // the anchor byte debt is observable (the unattended-Anchor
      // retention signal)...
      val anchors = TextOps.listAnchors(spark, t)
      assert(anchors.exists { case (tag, m, b) =>
        tag == "s1" && m == t && b > 0 }, anchors.toString)
      // ...and dropping the snapshot sweeps its anchors
      TextOps.dropSnapshot(spark, t, "s1")
      val a = TextOps.anchorDir(spark, t, "s1")
      val fs = a.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(a))
      assert(TextOps.listAnchors(spark, t).isEmpty)
    } finally drop(all: _*)
  }

  test("an anchored fold then a SECOND fold: the anchor keeps the " +
      "old tag serving while unpinned folds run free") {
    val t = s"fg_twice_p$pid"
    val all = famAll(t)
    drop(all: _*)
    try {
      mkFam(t)
      TextOps.snapshotIndex(spark, t, "s1")
      val want = postings(TextOps.readSnapshot(spark, t, "s1"))
      TextOps.compactIndex(spark, t, FoldGuard.Anchor)
      // after the anchored fold the tag no longer pins LIVE files, so
      // the next fold needs no guard decision at all
      append(t, Seq(31L))
      TextOps.compactIndex(spark, t)
      assert(postings(TextOps.readSnapshot(spark, t, "s1")) === want)
      assert(TextOps.checkSnapshot(spark, t, "s1") === Nil)
    } finally drop(all: _*)
  }
}
