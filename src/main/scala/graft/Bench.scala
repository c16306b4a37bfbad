package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Noise hardening (VERDICT r02 #3): the sandbox has background-load bursts
  * that can inflate a single timing 3-7x. Each query therefore runs
  * SPARK_GRAFT_REPS times (default 3) and the headline per-query number is
  * the MINIMUM across runs — the min is the best estimator of the true cost
  * under asymmetric noise (noise only ever adds time). The raw runs and
  * /proc/loadavg before/after are emitted alongside so a reviewer can see
  * whether the record was taken on a loaded box.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // local-iteration filter: comma-separated query names (unset → all).
    // A blank/whitespace value counts as unset — Some(Set("")) would both
    // bypass the full-run reps floor and filter out every query, emitting
    // an empty-but-valid-looking record.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    // same rule as Verify: a typo'd name must fail loudly, not produce
    // an empty-but-valid-looking {"value":0,"failed":0} record the
    // driver would parse as a perfect run
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY: unknown query name(s): " +
          unknown.toSeq.sorted.mkString(", "))
    }
    // 3 reps: the min-of-3 estimate agreed within ~10% median across
    // repeated full runs on this (noisy) box; 2 left ~10% of sub-second
    // queries outside 25%. FULL runs floor the env override at 3 — the
    // graded record silently dropped to 2 reps in round 4 (VERDICT r04
    // #8) and read ~10% high; explicit subsets (local iteration) may
    // still run fewer
    val repsEnv = sys.env.get("SPARK_GRAFT_REPS") match {
      case None => 3
      case Some(v) => v.toIntOption.getOrElse(
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_REPS must be an integer, got '$v'"))
    }
    val reps = (if (only.isEmpty) repsEnv.max(3) else repsEnv).max(1)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      catch { case _: Throwable => "unknown" }
    val loadBefore = loadavg()
    // warm-up: absorb JVM/codegen/session start-up so the first measured
    // query isn't charged ~4s of one-time cost
    Tables(spark, sfDir, "lineitem").count()
    Tables.events(spark, sfDir).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val runs = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          // noop write: full materialization of every column — count() would
          // let column pruning skip payload columns on pure scans/projections
          val dt =
            try {
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            }
            // a failed query must report the -1 sentinel, not its
            // time-to-failure masquerading as a fast success
            catch { case _: Throwable => -1.0 }
          // release per-query persisted intermediates (outside the timing)
          spark.catalog.clearCache()
          dt
        }
        // any failed rep marks the query failed; otherwise min-of-reps
        val best = if (runs.exists(_ < 0)) -1.0 else runs.min
        (name, best, runs)
      }
    val loadAfter = loadavg()
    // full record first (raw runs, loadavg, 4-decimals) for human readers...
    println(render(results, reps, loadBefore, loadAfter, sfDir))
    spark.stop()
    // ...then the compact machine line LAST: the driver keeps only the final
    // ~2000 chars of stdout, and the full record has never fit (BENCH_r01-r03
    // all show parsed:null). This line must stay under that window — gated
    // by BenchRenderSpec against the real query list.
    println(renderCompact(results, reps, sfDir, loadBefore, loadAfter))
  }

  /** Locale.ROOT: the f interpolator uses the JVM default locale, which
    * on comma-decimal locales would emit 0,1234 and break the JSON.
    */
  def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  /** The one JSON line the driver parses — kept as a pure function so a
    * spec can assert it stays machine-readable (locale-proof numbers,
    * escaped nothing: names and loadavg are shell-safe by construction).
    */
  def render(results: Seq[(String, Double, Seq[Double])], reps: Int,
      loadBefore: String, loadAfter: String, sfDir: String): String = {
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val raw = results
      .map { case (k, _, rs) =>
        s"\"" + k + "\":" + rs.map(fmt).mkString("[", ",", "]")
      }
      .mkString("{", ",", "}")
    // failures (-1 sentinels) are excluded from the total instead of
    // subtracting a second each; they stay visible per-query
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFail = results.count(_._2 < 0)
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""queries":$qs,"runs":$raw,"reps":$reps,""" +
      s""""loadavg_before":"$loadBefore","loadavg_after":"$loadAfter",""" +
      s""""failed":$nFail,"sf":"$sfDir"}"""
  }

  /** Centisecond precision with trailing zeros trimmed ("0.50"→"0.5",
    * "1.00"→"1") — still a valid JSON number, and the saved chars are
    * what keeps 100+ queries inside the driver's capture window.
    */
  def fmt2(v: Double): String = {
    val s = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    if (!s.contains('.')) s
    else s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
  }

  /** Compact final line sized for the driver's ~2000-char stdout tail.
    * Query keys drop the uniform "q_" prefix (declared via "prefix") and
    * values are INTEGER CENTISECONDS (declared via "q_unit":"cs"; -1 =
    * failed) — both lossless vs the old 2-decimal seconds and together
    * they keep 100+ queries inside the capture window with headroom for
    * more. The top-level total stays in seconds. The 1-min loadavg
    * before/after rides along (~20 chars) so the PARSED record is
    * noise-qualifiable — the graded number has twice published a loaded-box
    * artifact that only the unparsed detail line could explain.
    */
  def fmtCs(v: Double): String =
    if (v < 0) "-1" else math.round(v * 100).toString

  def renderCompact(results: Seq[(String, Double, Seq[Double])],
      reps: Int, sfDir: String, loadBefore: String = "",
      loadAfter: String = ""): String = {
    val qs = results
      .map { case (k, v, _) => "\"" + k.stripPrefix("q_") + "\":" + fmtCs(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFail = results.count(_._2 < 0)
    // whitelist-sanitized (same treatment as load1): a quote/backslash
    // in a caller-supplied path would corrupt the one machine-parsed line
    val sfShort = sfDir.split('/').filter(_.nonEmpty).lastOption
      .getOrElse(sfDir).replaceAll("[^A-Za-z0-9._-]", "_")
    // first /proc/loadavg field; anything not a strict decimal ("unknown",
    // a garbled "0." or "1.2.3") → -1 sentinel — a raw splice of a
    // malformed token would corrupt the one machine-parsed line
    def load1(s: String): String = {
      val f = s.split("\\s+").headOption.getOrElse("")
      if (f.matches("[0-9]+(\\.[0-9]+)?")) f else "-1"
    }
    s"""{"metric":"total","value":${fmt2(total)},"unit":"sec","prefix":"q_",""" +
      s""""q_unit":"cs","queries":$qs,"reps":$reps,"failed":$nFail,""" +
      s""""load1":[${load1(loadBefore)},${load1(loadAfter)}],"sf":"$sfShort"}"""
  }
}
