package graft

import scala.util.Random

import graft.operators.TextOps
import graft.operators.TextOps.FoldGuard
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MODEL-BASED LIFECYCLE TEST — the lifecycle verbs are each proven in
  * their own suites; this suite proves they stay correct under
  * COMPOSITION. A seeded random walk drives the bm25 family through
  * append / upsert / delete / anchored compact / anchored vacuum /
  * snapshot / full+differential backup / copy-restore, while a trivial
  * in-memory shadow model (doc_id → text) tracks what the corpus
  * SHOULD be. After every step the live id set must equal the model's;
  * after every restore — and at the end — the live index must SCORE
  * identically to a fresh index built from the model in one shot
  * (stream-grown ≡ batch-built, generalized to the whole verb
  * algebra), and fsck + the backup/snapshot audits must stay Nil.
  * Any sequencing bug between the verbs (a stale stats row after
  * restore-then-delete, a tombstone surviving a vacuum-then-backup,
  * an anchor left dangling by restore) surfaces as a model divergence
  * with the full verb trace in the failure message.
  */
class LifecycleModelSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()

  private def drop(tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  private def text(id: Long, v: Int): String =
    s"alpha beta token$id word${id % 7} rev$v common spark"

  test("a seeded 30-step random verb walk never diverges from the " +
      "shadow model (ids every step; scores + audits after restores " +
      "and at the end)") {
    val t = s"lm_bm25_p$pid"
    val ref = s"lm_ref_p$pid"
    def famOf(x: String) =
      (x +: TextOps.BackupSiblings.map(x + _)) ++
        Seq(s"${x}_compact", s"${x}_old", s"${x}_stats")
    // generous cleanup: every tag this walk can mint
    val tags = (0 until 30).flatMap(i => Seq(s"s$i", s"b$i"))
    val all = famOf(t) ++ famOf(ref) ++
      tags.flatMap(tg => Seq(s"${t}_mf_$tg", s"${t}_bakok_$tg",
        s"${t}_bak_$tg", s"${t}_stats_bak_$tg", s"${t}_del_bak_$tg",
        s"${t}_del_stage_bak_$tg") ++
        TextOps.SnapshotCopySiblings.map(sf0 => s"$t${sf0}_bak_mf$tg"))
    drop(all: _*)
    val sp = spark
    import sp.implicits._

    val rng = new Random(42L)
    val model = scala.collection.mutable.Map.empty[Long, String]
    var nextId = 1L
    var rev = 0
    val snapTags = scala.collection.mutable.ArrayBuffer.empty[String]
    val bakTags = scala.collection.mutable.ArrayBuffer.empty[String]
    val trace = scala.collection.mutable.ArrayBuffer.empty[String]

    def df(m: Seq[(Long, String)]) = m.toDF("doc_id", "text")
    val qt = Seq((1, "alpha"), (1, "token3"), (2, "word2"), (2, "common"))
      .toDF("q_id", "token")

    def liveIds: Set[Long] = {
      val (p, _) = TextOps.liveBm25(spark, t, s"${t}_stats")
      p.select("doc_id").distinct().as[Long].collect().toSet
    }
    def scores(tbl: String): Map[(Int, Long), Double] = {
      val (p, s) = TextOps.liveBm25(spark, tbl, s"${tbl}_stats")
      TextOps.bm25ScoreIncr(qt, p, s).collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getDouble(2))).toMap
    }
    def ctx = s"after [${trace.mkString(" -> ")}]"
    def checkIds(): Unit =
      assert(liveIds === model.keySet.toSet, ctx)
    def checkScores(): Unit = {
      drop(famOf(ref): _*)
      if (model.nonEmpty) {
        TextOps.appendBm25Postings(df(model.toSeq), ref, s"${ref}_stats")
        val (got, want) = (scores(t), scores(ref))
        assert(got.keySet === want.keySet, ctx)
        got.foreach { case (k, v) =>
          assert(math.abs(v - want(k)) < 1e-9, s"$k: $v vs ${want(k)} $ctx")
        }
        drop(famOf(ref): _*)
      }
    }
    def checkAudits(): Unit = {
      assert(TextOps.fsckBm25(spark, t, s"${t}_stats") === Nil, ctx)
      bakTags.foreach(tg =>
        assert(TextOps.checkBackup(spark, t, tg) === Nil, s"bak $tg $ctx"))
      snapTags.foreach(tg =>
        assert(TextOps.checkSnapshot(spark, t, tg) === Nil,
          s"snap $tg $ctx"))
    }

    // seed corpus
    val seed = (1L to 12L).map { i => i -> text(i, 0) }
    nextId = 13L
    TextOps.appendBm25Postings(df(seed), t, s"${t}_stats")
    model ++= seed

    try {
      (0 until 30).foreach { step =>
        rng.nextInt(10) match {
          case 0 => // append fresh docs
            val n = 1 + rng.nextInt(4)
            val batch = (0 until n).map { _ =>
              val id = nextId; nextId += 1; id -> text(id, 0)
            }
            trace += s"append(${batch.map(_._1).mkString(",")})"
            TextOps.appendBm25Postings(df(batch), t, s"${t}_stats")
            model ++= batch
          case 1 => // upsert: rewrite some existing + maybe one new
            rev += 1
            val existing = rng.shuffle(model.keys.toSeq)
              .take(1 + rng.nextInt(3))
            val fresh =
              if (rng.nextBoolean()) { val id = nextId; nextId += 1
                Seq(id -> text(id, rev)) } else Nil
            val batch = existing.map(id => id -> text(id, rev)) ++ fresh
            trace += s"upsert(${batch.map(_._1).mkString(",")})"
            TextOps.upsertBm25Docs(spark, t, s"${t}_stats", df(batch))
            model ++= batch
          case 2 => // delete some existing (and one never-present id)
            val victims = rng.shuffle(model.keys.toSeq)
              .take(1 + rng.nextInt(3)) :+ (nextId + 1000L)
            trace += s"delete(${victims.mkString(",")})"
            TextOps.deleteBm25Docs(spark, t, s"${t}_stats",
              victims.toDF("doc_id"))
            victims.foreach(model.remove)
          case 3 =>
            trace += "compact"
            TextOps.compactIndex(spark, t, FoldGuard.Anchor)
          case 4 =>
            trace += "vacuum"
            TextOps.vacuumIndex(spark, s"${t}_del", Seq(t), "doc_id",
              FoldGuard.Anchor)
          case 5 =>
            val tg = s"s$step"
            trace += s"snapshot($tg)"
            TextOps.snapshotIndex(spark, t, tg)
            snapTags += tg
          case 6 => // backup — differential on the newest tag half the time
            val tg = s"b$step"
            val base =
              if (bakTags.nonEmpty && rng.nextBoolean())
                Some(bakTags.last) else None
            trace += s"backup($tg, base=$base)"
            TextOps.backupIndex(spark, t, tg, base)
            bakTags += tg
          case 7 if bakTags.nonEmpty => // copy-restore a random tag
            val tg = bakTags(rng.nextInt(bakTags.size))
            trace += s"restore($tg)"
            // a copy-restore rewrites live file names: every manifest
            // snapshot stops restoring — retire them in system+model
            // (the FoldGuard story covers folds; restore is the
            // documented copy-path fallback that supersedes them)
            snapTags.foreach(TextOps.dropSnapshot(spark, t, _))
            snapTags.clear()
            TextOps.restoreIndex(spark, t, tg)
            model.clear()
            model ++= modelAt(tg)
            checkScores()
          case 8 if bakTags.nonEmpty => // chain lifecycle: promote,
            // then retire a base nobody borrows from (keep >=1 tag)
            val tg = bakTags.last
            trace += s"promote($tg)"
            TextOps.promoteBackup(spark, t, tg)
            val free = bakTags.filter(x =>
              TextOps.dependentBackups(spark, t, x).isEmpty)
            if (free.size > 1) {
              val victim = free.head
              trace += s"dropBackup($victim)"
              TextOps.dropBackup(spark, t, victim)
              bakTags -= victim
            }
          case 9 if snapTags.size > 2 =>
            trace += "pruneSnapshots(2)"
            TextOps.pruneSnapshots(spark, t, 2)
            val live = TextOps.listSnapshots(spark, t).map(_._1).toSet
            snapTags.filterInPlace(live.contains)
          case _ =>
            trace += "noop"
        }
        // record what each backup/snapshot SHOULD restore to
        if (trace.last.startsWith("backup(") ||
            trace.last.startsWith("snapshot("))
          remember(trace.last, model.toMap)
        checkIds()
      }
      checkScores()
      checkAudits()
      // end-of-walk restore drill: every still-committed backup tag
      // restores to exactly its recorded model
      bakTags.toSeq.takeRight(2).foreach { tg =>
        trace += s"drill($tg)"
        snapTags.foreach(TextOps.dropSnapshot(spark, t, _))
        snapTags.clear()
        TextOps.restoreIndex(spark, t, tg)
        model.clear(); model ++= modelAt(tg)
        checkIds(); checkScores()
      }
      assert(TextOps.fsckBm25(spark, t, s"${t}_stats") === Nil, ctx)
    } finally drop(all: _*)
  }

  // tag → the model state its backup/snapshot captured
  private val memo =
    scala.collection.mutable.Map.empty[String, Map[Long, String]]
  private def remember(traceEntry: String, m: Map[Long, String]): Unit = {
    val tg = traceEntry.substring(traceEntry.indexOf('(') + 1)
      .takeWhile(c => c != ',' && c != ')')
    memo(tg) = m
  }
  private def modelAt(tag: String): Map[Long, String] = memo(tag)
}
