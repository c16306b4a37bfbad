package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** CHECKPOINT SNAPSHOT STAGING (ADVICE r15 #3): backupCk/restoreCk
  * move checkpoint DIRECTORIES by staged-copy + rename, never
  * delete-then-copy, so a crash mid-copy can no longer leave
  *   - a checkpoint-LESS live directory for the length of a copy
  *     (restore side — the next vector-stream invocation would have
  *     replayed every source file and silently duplicated rows), or
  *   - a PARTIAL directory under the `_bak_<tag>` name a later
  *     restore would trust as a complete snapshot (backup side).
  * Gated here at the primitive level (the end-to-end restore ≡
  * never-crashed gates live in StreamRestoreSpec/StreamSnapshotSpec):
  * staging dirs from a simulated crash are swept on re-run, promoted
  * dirs are byte-complete, and the no-live / no-backup edges keep
  * their r15 semantics.
  */
class CkStagingSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()
  private def fs = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def wh = spark.conf.get("spark.sql.warehouse.dir")

  private def p(parts: String*): Path =
    new Path((wh +: parts).mkString("/"))

  private def write(path: Path, body: String): Unit = {
    val out = fs.create(path, true)
    out.write(body.getBytes("UTF-8")); out.close()
  }

  private def read(path: Path): String = {
    val in = fs.open(path)
    val b = new Array[Byte](fs.getFileStatus(path).getLen.toInt)
    in.readFully(b); in.close(); new String(b, "UTF-8")
  }

  private def ls(dir: Path): Set[String] =
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).map(_.getPath.getName).toSet

  test("backup stages then promotes; restore stages then promotes; " +
      "stale staging dirs from a crash are swept") {
    val name = s"cks_p$pid"
    val ck = p(s"${name}_ck")
    val bak = p(s"${name}_ck_bak_t1")
    val all = Seq(ck, bak, p(s"${name}_ck_bak_t1_staging"),
      p(s"${name}_ck_restoretmp"))
    all.foreach(d => fs.delete(d, true))
    try {
      write(new Path(ck, "offsets/0"), "v1")
      write(new Path(ck, "commits/0"), "c1")
      assert(streaming.StreamingOps.backupCk(spark, name, "t1")
        .contains(bak.toString))
      assert(read(new Path(bak, "offsets/0")) === "v1")
      // no staging leftovers after a clean run
      assert(!fs.exists(p(s"${name}_ck_bak_t1_staging")))

      // live moves on past the snapshot
      write(new Path(ck, "offsets/0"), "v2")
      write(new Path(ck, "offsets/1"), "v3")
      // simulate a crashed earlier restore AND a crashed earlier
      // backup: both staging dirs hold garbage that must be swept,
      // never promoted or merged
      write(new Path(p(s"${name}_ck_restoretmp"), "offsets/9"), "junk")
      write(new Path(p(s"${name}_ck_bak_t1_staging"), "offsets/9"),
        "junk")
      assert(streaming.StreamingOps.restoreCk(spark, name, "t1")
        === Some(s"restored ck $name"))
      assert(read(new Path(ck, "offsets/0")) === "v1")
      assert(ls(new Path(ck, "offsets")) === Set("0"))
      assert(!fs.exists(p(s"${name}_ck_restoretmp")))
      // the backup survives a restore (restore is repeatable)
      assert(fs.exists(bak))

      // re-taking the backup sweeps ITS stale staging too
      assert(streaming.StreamingOps.backupCk(spark, name, "t1")
        .isDefined)
      assert(!fs.exists(p(s"${name}_ck_bak_t1_staging")))
      assert(ls(new Path(bak, "offsets")) === Set("0"))
    } finally all.foreach(d => fs.delete(d, true))
  }

  test("edge semantics hold: no backup drops live; neither is a " +
      "no-op; no live clears a stale backup") {
    val name = s"cke_p$pid"
    val ck = p(s"${name}_ck")
    val bak = p(s"${name}_ck_bak_t1")
    Seq(ck, bak).foreach(d => fs.delete(d, true))
    try {
      write(new Path(ck, "offsets/0"), "v1")
      assert(streaming.StreamingOps.restoreCk(spark, name, "t1")
        === Some(s"dropped ck $name (absent at snapshot)"))
      assert(!fs.exists(ck))
      assert(streaming.StreamingOps.restoreCk(spark, name, "t1")
        === None)
      // a stale backup with NO live checkpoint: re-taking the
      // snapshot records the absence by clearing the copy
      write(new Path(bak, "offsets/0"), "stale")
      assert(streaming.StreamingOps.backupCk(spark, name, "t1")
        === None)
      assert(!fs.exists(bak))
    } finally Seq(ck, bak).foreach(d => fs.delete(d, true))
  }
}
