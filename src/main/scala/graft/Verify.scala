package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names (fast local
    // iteration). Blank/whitespace counts as unset — Some(Set("")) would
    // select zero queries yet still write the subset oracle file.
    val only: Option[Set[String]] =
      if (args.length > 2)
        Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
          .filter(_.nonEmpty)
      else None
    // a typo'd subset name must fail loudly HERE: an unmatched name
    // would select nothing yet still write an (empty) subset oracle
    // file, and check_oracle.py would report 0/0 pass — a green gate
    // that verified nothing
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // testdata drift guard (VERDICT r11 #7): record every table's RAW
    // physical schema up front — the r11 events TIMESTAMP(NANOS)→µs
    // regeneration cost most of a round to diagnose; with this line a
    // generator drift shows up in the first seconds of the verify log.
    // Read WITHOUT Tables' normalization so the file's true flavor
    // (e.g. ts:bigint nanos vs ts:timestamp_ntz) is what prints.
    Tables.names.foreach { n =>
      val flavor =
        try spark.read.parquet(s"$sfDir/$n.parquet").schema.fields
          .map(f => s"${f.name}:${f.dataType.simpleString}")
          .mkString(",")
        catch { case e: Throwable => s"UNREADABLE: ${e.getMessage}" }
      println(s"[verify] physical-schema $n: $flavor")
    }
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // some queries persist intermediates (LSH signatures, norms);
      // release them so 70 queries don't accumulate dead cache blocks
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // a subset run must not masquerade as full verification output: if
    // outDir already holds results for queries OUTSIDE the subset, a
    // full-coverage oracle_sql.json there would silently lose them in a
    // later driver compare — subset runs therefore write to
    // oracle_sql_subset.json (check_oracle.py falls back to it)
    val oracleFile =
      if (only.isEmpty) "oracle_sql.json" else "oracle_sql_subset.json"
    // a FULL run must also remove any stale subset file, or a later
    // compare against this directory would prefer the narrow (old) one
    if (only.isEmpty)
      Files.deleteIfExists(Paths.get(s"$outDir/oracle_sql_subset.json"))
    Files.writeString(Paths.get(s"$outDir/$oracleFile"), json)
    spark.stop()
  }
}
