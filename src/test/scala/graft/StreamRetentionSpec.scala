package graft

import graft.operators.{AnnIndex, TextOps}
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** STREAM-LEVEL RETENTION (r16): the unified backup/snapshot verbs
  * had no list/drop/prune twins — on the documented tight snapshot
  * cadence every tag accumulated its group marker, member manifests,
  * meta copies, ledger copies and checkpoint backup trees FOREVER.
  * Gated here: listing shows committed tags newest-first, dropping a
  * tag removes every artifact it owns (marker first — a half-dropped
  * group already refuses to restore), pruning keeps the newest N,
  * and the surviving tag still restores.
  */
class StreamRetentionSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()

  private def drop(tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  private def docArtifacts(base: String): Seq[String] = {
    val t = s"${base}_bm25"
    Seq(t, s"${t}_stats", s"${t}_del") ++
      Seq("s1", "s2", "t1", "t2").flatMap { tag =>
        Seq(s"${base}_mf_$tag", s"${t}_mf_$tag",
          s"${base}_dbakok_$tag", s"${t}_bakok_$tag") ++
          (t +: TextOps.BackupSiblings.map(t + _)).flatMap(m =>
            Seq(s"${m}_bak_$tag", s"${m}_bak_mf$tag"))
      }
  }

  test("documents: snapshots list newest-first, prune keeps the " +
      "newest, the survivor still restores") {
    val base = s"srt_doc_p$pid"
    val t = s"${base}_bm25"
    drop(docArtifacts(base): _*)
    try {
      val sp = spark
      import sp.implicits._
      TextOps.appendBm25Postings(
        Seq(1L -> "spark join window", 2L -> "hash scan merge")
          .toDF("doc_id", "text"), t, s"${t}_stats")
      StreamingOps.snapshotDocuments(spark, base, "s1")
      Thread.sleep(1200L) // mtime ordering granularity
      TextOps.appendBm25Postings(
        Seq(3L -> "window fast data").toDF("doc_id", "text"),
        t, s"${t}_stats")
      StreamingOps.snapshotDocuments(spark, base, "s2")
      val tags = StreamingOps.listDocumentsSnapshots(spark, base)
        .map(_._1)
      assert(tags === Seq("s2", "s1"), tags.toString)
      val pruned = StreamingOps
        .pruneDocumentsSnapshots(spark, base, keep = 1)
      assert(pruned === Seq("dropped snapshot s1"), pruned.toString)
      assert(!spark.catalog.tableExists(s"${base}_mf_s1"))
      assert(!spark.catalog.tableExists(s"${t}_mf_s1"))
      assert(StreamingOps.listDocumentsSnapshots(spark, base)
        .map(_._1) === Seq("s2"))
      // the survivor still restores (and restores the s2 content)
      TextOps.appendBm25Postings(
        Seq(9L -> "post snapshot junk").toDF("doc_id", "text"),
        t, s"${t}_stats")
      StreamingOps.restoreDocumentsSnapshot(spark, base, "s2")
      assert(spark.table(s"${t}_stats")
        .select("n_docs").head().getLong(0) === 3L)
    } finally drop(docArtifacts(base): _*)
  }

  test("documents: committed backup tags list; dropping one removes " +
      "marker + copies; the other still restores") {
    val base = s"srt_bak_p$pid"
    val t = s"${base}_bm25"
    drop(docArtifacts(base): _*)
    try {
      val sp = spark
      import sp.implicits._
      TextOps.appendBm25Postings(
        Seq(1L -> "spark join window").toDF("doc_id", "text"),
        t, s"${t}_stats")
      StreamingOps.backupDocuments(spark, base, "t1")
      TextOps.appendBm25Postings(
        Seq(2L -> "hash scan merge").toDF("doc_id", "text"),
        t, s"${t}_stats")
      StreamingOps.backupDocuments(spark, base, "t2")
      assert(StreamingOps.listDocumentsBackups(spark, base)
        === Seq("t1", "t2"))
      StreamingOps.dropDocumentsBackup(spark, base, "t1")
      assert(StreamingOps.listDocumentsBackups(spark, base)
        === Seq("t2"))
      assert(!spark.catalog.tableExists(s"${base}_dbakok_t1"))
      assert(!spark.catalog.tableExists(s"${t}_bak_t1"))
      assert(!spark.catalog.tableExists(s"${t}_stats_bak_t1"))
      StreamingOps.restoreDocuments(spark, base, "t2")
      assert(spark.table(s"${t}_stats")
        .select("n_docs").head().getLong(0) === 2L)
    } finally drop(docArtifacts(base): _*)
  }

  test("vectors: backup tags list and drop cleanly") {
    val base = s"srt_vec_p$pid"
    val t = s"${base}_ann"
    val all = Seq(t, s"${t}_vec", s"${t}_cfg", s"${t}_del") ++
      (t +: TextOps.BackupSiblings.map(t + _))
        .map(m => s"${m}_bak_t1") ++
      Seq(s"${base}_vbakok_t1", s"${t}_bakok_t1")
    drop(all: _*)
    try {
      AnnIndex.write(Tables(spark, sf, "embeddings"), t,
        nBands = 4, bits = 2)
      StreamingOps.backupVectors(spark, base, "t1")
      assert(StreamingOps.listVectorsBackups(spark, base)
        === Seq("t1"))
      assert(StreamingOps.checkVectorsBackup(spark, base, "t1")
        === Nil)
      StreamingOps.dropVectorsBackup(spark, base, "t1")
      assert(StreamingOps.listVectorsBackups(spark, base) === Nil)
      assert(!spark.catalog.tableExists(s"${t}_bak_t1") &&
        !spark.catalog.tableExists(s"${t}_vec_bak_t1") &&
        !spark.catalog.tableExists(s"${base}_vbakok_t1"))
    } finally drop(all: _*)
  }
}
