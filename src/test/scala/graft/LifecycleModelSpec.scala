package graft

import org.scalatest.funsuite.AnyFunSuite

/** MODEL-BASED LIFECYCLE TEST — the lifecycle verbs are each proven in
  * their own suites; this suite proves they stay correct under
  * COMPOSITION. The seeded random walk itself lives in
  * [[LifecycleWalk]] (extracted r18 so TwoProcessWalkSpec can run the
  * SAME walk in a real forked JVM): append / upsert / delete /
  * anchored compact / anchored vacuum / snapshot / full+differential
  * backup / copy-restore / promote / prune / epoch, with an in-memory
  * shadow model (doc_id → text) tracking what the corpus SHOULD be.
  * After every step the live id set must equal the model's; after
  * every restore — and at the end — the live index must SCORE
  * identically to a fresh index built from the model in one shot
  * (stream-grown ≡ batch-built, generalized to the whole verb
  * algebra), and fsck + the backup/snapshot audits must stay Nil.
  * Any sequencing bug between the verbs surfaces as a model
  * divergence with the full verb trace in the failure message.
  */
class LifecycleModelSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()

  test("a seeded 30-step random verb walk never diverges from the " +
      "shadow model (ids every step; scores + audits after restores " +
      "and at the end)") {
    val t = s"lm_bm25_p$pid"
    val all = LifecycleWalk.allTables(t, 30)
    all.foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    try {
      val trace = LifecycleWalk.run(spark, t, 42L, 30)
      assert(trace.size >= 30, trace.mkString(" -> "))
      // the walk must have exercised a healthy verb spread — a seed
      // that degenerated to noops would prove nothing
      assert(trace.count(_.startsWith("append")) > 0, trace)
      assert(trace.exists(_.startsWith("snapshot")), trace)
      assert(trace.exists(_.startsWith("backup")), trace)
    } finally all.foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }
}
