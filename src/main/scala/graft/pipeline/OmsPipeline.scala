package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Full-pipeline parity with the reference ETL (SURVEY.md §3): ingest
  * heterogeneous epidemic CSV/JSON, normalize schemas, derive daily deltas
  * from cumulative counters, reshape long/wide, build the star schema, and
  * merge with last-write-wins semantics.
  *
  * Where the reference is row-at-a-time pandas (iterrows dim lookups,
  * two-pass re-extraction), this is declarative: broadcast joins for dim
  * lookups, one cached standardized frame, window functions for deltas.
  * All per-country derivations shuffle once on `country`; dims are
  * dimension-sized and broadcast.
  *
  * Order-dependence fixes (SURVEY.md §7.4.2): the reference's diff-without-
  * sort and index+1 ids rely on input file order; here deltas order by
  * (date) explicitly and surrogate ids are assigned by name sort order —
  * the golden-parity test compares under id remapping.
  */
object OmsPipeline {

  /** Standard synonym table (reference ETL_OMS.py:12-21 =
    * ETL_OMS_FINAL.py:12-21). Order matters: first match wins.
    */
  val standardColumnMap: Seq[(String, Seq[String])] = Seq(
    "country" -> Seq("location", "country", "Country/Region", "Country",
      "nation", "region"),
    "date" -> Seq("date", "Date", "date_reported", "date_of_observation",
      "report_date", "observation_date"),
    "confirmed" -> Seq("confirmed", "total_cases", "ConfirmedCases",
      "TotalCases", "case_count", "cases", "cases_total"),
    "deaths" -> Seq("deaths", "total_deaths", "Deaths", "Fatalities",
      "TotalDeaths", "dead", "deathcount"),
    "recovered" -> Seq("recovered", "Recoveries", "Recovered",
      "total_recovered"),
    "active" -> Seq("active", "ActiveCases", "currently_active", "Active",
      "ongoing_cases"),
    "new_cases" -> Seq("new_cases", "Daily confirmed", "NewCases",
      "daily_confirmed", "cases_new", "confirmed_today"),
    "new_deaths" -> Seq("new_deaths", "Daily deaths", "NewDeaths",
      "daily_deaths", "new_deaths_smoothed", "deaths_today")
  ).map { case (k, v) => k -> v.map(SchemaMapper.normalize) }

  /** v5 synonym table with geo columns
    * (reference ETL_OMS_OPERATIONNEL.py:36-47).
    */
  val v5ColumnSynonyms: Seq[(String, Seq[String])] = Seq(
    "country" -> Seq("country", "location", "region", "country_region",
      "province_state", "country/region", "countries", "country name",
      "nation"),
    "date" -> Seq("date", "observation_date", "report_date"),
    "confirmed" -> Seq("confirmed", "total_cases", "cases"),
    "deaths" -> Seq("deaths", "total_deaths", "fatalities"),
    "recovered" -> Seq("recovered", "total_recoveries", "recoveries"),
    "active" -> Seq("active", "active_cases"),
    "new_cases" -> Seq("new_cases", "daily_confirmed", "cases_new",
      "new_cases_smoothed"),
    "new_deaths" -> Seq("new_deaths", "daily_deaths", "new_deaths_smoothed"),
    "latitude" -> Seq("lat", "latitude"),
    "longitude" -> Seq("long", "longitude")
  ).map { case (k, v) => k -> v.map(SchemaMapper.normalize) }

  val measureCols: Seq[String] =
    Seq("confirmed", "deaths", "recovered", "active", "new_cases",
      "new_deaths")

  /** Filename → disease, first keyword match, else "Inconnue"
    * (reference ETL_OMS_OPERATIONNEL.py:19-23,76-81).
    */
  val maladiesMapping: Seq[(String, String)] = Seq(
    "covid" -> "COVID-19", "coronavirus" -> "COVID-19",
    "covid19" -> "COVID-19", "monkeypox" -> "Monkeypox",
    "mpox" -> "Monkeypox", "ebola" -> "Ebola Virus Disease")

  def detectMaladie(fileName: String): String = {
    val n = fileName.toLowerCase
    maladiesMapping.collectFirst { case (k, v) if n.contains(k) => v }
      .getOrElse("Inconnue")
  }

  /** Extension-dispatch source (reference ETL_OMS.py:32-36). */
  def extract(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".json"))
      spark.read.option("multiLine", true).json(path)
    else
      spark.read.option("header", true).option("inferSchema", true).csv(path)

  /** EP1/EP2 transform (reference ETL_OMS_FINAL.py:50-71): synonym
    * mapping, lenient date coerce + null-drop, pandemic literal, measure
    * completion, conditional delta derivation, fixed projection.
    * A frame with no mappable country raises, like ETL_OMS_FINAL.py:53-54.
    */
  def standardize(raw: DataFrame, pandemicName: String): DataFrame = {
    val mapped = SchemaMapper.applyMapping(raw, standardColumnMap)
    // country is load-bearing downstream (delta windows partition on it,
    // the projection selects it), so a missing mapping always raises
    // here with a clear message — like ETL_OMS_FINAL.py:53-54
    if (!mapped.columns.contains("country"))
      throw new IllegalArgumentException(
        "column 'country' missing after mapping")
    // lenient multi-format parse, null on failure — pandas
    // to_datetime(errors="coerce") accepts ISO and US-style dates
    // (covid_global_3.csv uses M/d/yy); the coalesce chain mirrors the
    // v5 strict-then-lenient fallback (ETL_OMS_OPERATIONNEL.py:100-106).
    val parseDate = expr("coalesce(" +
      "try_to_timestamp(string(date)), " +
      "try_to_timestamp(string(date), 'M/d/yy'), " +
      "try_to_timestamp(string(date), 'M/d/yyyy'))")
    val withDate =
      (if (mapped.columns.contains("date"))
        mapped.withColumn("date", parseDate)
      else mapped.withColumn("date", lit(null).cast("timestamp")))
        .na.drop(Seq("date"))
        .withColumn("pandemic", lit(pandemicName))
    val complete = measureCols.foldLeft(withDate) { (df, c) =>
      if (df.columns.contains(c)) df.withColumn(c, col(c).cast(DoubleType))
      else df.withColumn(c, lit(null).cast(DoubleType))
    }
    val derived = deriveDeltas(complete)
    derived.select(("country" +: "date" +: measureCols :+ "pandemic")
      .map(col): _*)
  }

  /** Conditional per-country delta derivation (reference
    * ETL_OMS_FINAL.py:64-68): only when the delta column is entirely
    * null does the cumulative diff kick in. The gate is branch-free: a
    * 1-row global aggregate broadcast-cross-joined onto the frame, so the
    * whole derivation stays one lazy plan — no driver actions, nothing to
    * cache, and at 100× file counts no serialized job launches. The diff
    * is a window lag ordered by date (the reference relies on file
    * order — a latent bug SURVEY.md §7.4.2 resolves with the explicit
    * sort).
    */
  def deriveDeltas(df: DataFrame,
      treatZeroAsMissing: Boolean = false): DataFrame = {
    // duplicate (country, date) rows (multi-file or province-level
    // inputs) need a value tiebreak or lag() is partition-order
    // dependent; cumulative columns give a deterministic total order up
    // to fully-identical rows (whose lag is then identical anyway)
    val wTie = Window.partitionBy("country")
      .orderBy(col("date"), col("confirmed"), col("deaths"))
    // v3/v4 gate: column entirely null (ETL_OMS_FINAL.py:64); v5 gate:
    // entirely zero (ETL_OMS_OPERATIONNEL.py:141) — unified as "no
    // meaningful value present"
    def meaningful(c: String): org.apache.spark.sql.Column =
      if (treatZeroAsMissing) count(when(col(c) =!= 0.0, 1))
      else count(col(c))
    val gates = df.agg(meaningful("new_cases").as("__nc_present"),
      meaningful("new_deaths").as("__nd_present"))
    def diffed(cum: String): org.apache.spark.sql.Column =
      coalesce(col(cum) - lag(cum, 1).over(wTie), lit(0.0))
    df.crossJoin(broadcast(gates))
      .withColumn("new_cases", when(col("__nc_present") === 0L,
        diffed("confirmed")).otherwise(col("new_cases")))
      .withColumn("new_deaths", when(col("__nd_present") === 0L,
        diffed("deaths")).otherwise(col("new_deaths")))
      .drop("__nc_present", "__nd_present")
  }

  /** v4 typed-default completion (reference
    * ETL_OMS_FINAL_Upgraded.py:71-80): absent country → "Unknown", absent
    * date → now(), absent measures → 0.
    */
  def completeWithDefaults(df: DataFrame): DataFrame = {
    val wanted = Seq("country", "date") ++ measureCols
    wanted.foldLeft(df) { (acc, c) =>
      if (acc.columns.contains(c)) acc
      else c match {
        case "country" => acc.withColumn(c, lit("Unknown"))
        case "date"    => acc.withColumn(c, current_timestamp())
        case _         => acc.withColumn(c, lit(0).cast(DoubleType))
      }
    }
  }

  /** v5 per-capita → absolute conversion (reference
    * ETL_OMS_OPERATIONNEL.py:121-138): columns selected by name substring,
    * rate * population / unit, rounded and cast to int — the reference's
    * `.round().astype(int)`. The target routing reproduces the
    * reference's own asymmetric rule verbatim
    * (ETL_OMS_OPERATIONNEL.py:122-138): per-100k rates go to `deaths`
    * only when named `excess_deaths` (so a `deaths_per_100k` column
    * lands in `confirmed` — reference semantics under reproduction, not
    * a routing bug), per-million rates go to `deaths` for any
    * deaths-named column. `population` is injectable — the reference's
    * lookup returns None in practice (dead code preserved as a no-op
    * default).
    */
  def convertPerCapita(df: DataFrame,
      population: Option[Double] = None): DataFrame =
    population.fold(df) { pop =>
      df.columns.foldLeft(df) { (acc, c) =>
        val per100k = c.contains("per_100_000") || c.contains("per_100k")
        val perMillion = c.contains("per_million")
        if (!per100k && !perMillion) acc
        else {
          val unit = if (per100k) 100000.0 else 1000000.0
          val target =
            if (per100k && c.contains("excess_deaths")) "deaths"
            else if (perMillion && c.contains("deaths")) "deaths"
            else "confirmed"
          acc.withColumn(target,
            round(col(c).cast(DoubleType) * pop / unit).cast("int"))
        }
      }
    }

  /** v5 geo cleanup (reference ETL_OMS_OPERATIONNEL.py:147-148):
    * coerce-to-null numeric + 6dp rounding on coordinates.
    */
  def cleanCoordinates(df: DataFrame): DataFrame =
    Seq("latitude", "longitude").foldLeft(df) { (acc, c) =>
      if (!acc.columns.contains(c)) acc
      else acc.withColumn(c, round(col(c).cast(DoubleType), 6))
    }

  /** Indicator → unit map (reference ETL_OMS.py:23-30). */
  val indicatorUnits: Map[String, String] = Map(
    "confirmed" -> "cases", "deaths" -> "deaths", "recovered" -> "patients",
    "active" -> "patients", "new_cases" -> "cases", "new_deaths" -> "deaths")

  /** EP1 long format (reference ETL_OMS.py:76-85): melt + unit lookup +
    * null-value drop.
    */
  def toLongFormat(standardized: DataFrame): DataFrame = {
    val unitMap = typedLit(indicatorUnits)
    standardized
      .unpivot(Array(col("country"), col("date"), col("pandemic")),
        measureCols.map(col).toArray, "indicator", "value")
      .withColumn("unit",
        coalesce(element_at(unitMap, col("indicator")), lit("unknown")))
      .na.drop(Seq("value", "date"))
  }

  /** EP4/V2 wide pivot for visualization (reference ETL_OMS_V2.py:25-36).
    * `min` stands in for pandas' order-sensitive `first` (deterministic;
    * values are unique per group here anyway).
    */
  def toWideFormat(longDf: DataFrame): DataFrame =
    longDf.groupBy("date", "country", "pandemic")
      .pivot("indicator", measureCols)
      .agg(min("value"))
      .na.fill(0.0, measureCols)

  final case class StarSchema(pays: DataFrame, region: DataFrame,
      maladie: DataFrame, statistique: DataFrame)

  /** EP2 star schema (reference ETL_OMS_FINAL.py:74-100). Surrogate ids
    * are ordinal over name sort order (the reference uses first-appearance
    * index+1, which depends on input order); region mirrors pays 1:1 as in
    * the reference.
    */
  def starSchema(standardized: DataFrame, pandemicName: String,
      spark: SparkSession): StarSchema = {
    val sp = spark
    import sp.implicits._
    val pays = standardized.select("country").distinct()
      .withColumn("id_pays", row_number().over(Window.orderBy("country")))
    // region mirrors pays 1:1 (ETL_OMS_FINAL.py:78-81) but is computed as
    // its own frame (fresh attribute ids) so the composite-key join below
    // is not a self join on shared attributes.
    val region = standardized.select(col("country").as("nom_region"))
      .distinct()
      .withColumn("id_region", row_number().over(Window.orderBy("nom_region")))
      .withColumn("id_pays", col("id_region"))
      .select("id_region", "nom_region", "id_pays")
    val maladie = Seq((1, pandemicName)).toDF("id_maladie", "nom_maladie")
    val withPays = standardized.join(broadcast(pays), Seq("country"))
    val fact = withPays
      .join(broadcast(region),
        withPays("id_pays") === region("id_pays") &&
          withPays("country") === region("nom_region"))
      .withColumn("id_maladie", lit(1))
      .select(col("id_maladie"), region("id_region"), col("date"),
        col("new_deaths").as("nouveau_mort"),
        col("new_cases").as("nouveau_cas"),
        col("deaths").as("total_mort"))
    StarSchema(pays.select("country", "id_pays"), region, maladie, fact)
  }

  /** v5 pre-load dedup-agg (reference ETL_OMS_OPERATIONNEL.py:160-166):
    * collapse duplicate (id_region, date) rows. `min` replaces the
    * order-sensitive `first` on id_maladie (single disease per run makes
    * them equivalent).
    */
  def dedupAgg(fact: DataFrame): DataFrame =
    fact.groupBy("id_region", "date").agg(
      min("id_maladie").as("id_maladie"),
      sum("nouveau_mort").as("nouveau_mort"),
      sum("nouveau_cas").as("nouveau_cas"),
      max("total_mort").as("total_mort"))

  /** U2 fact upsert: last-write-wins on (id_region, date), incoming beats
    * existing (reference ON CONFLICT DO UPDATE,
    * ETL_OMS_OPERATIONNEL.py:202-211).
    */
  def upsertFact(existing: DataFrame, incoming: DataFrame): DataFrame = {
    // tiebreak beyond src_priority: if one BATCH carries duplicate
    // (id_region, date) rows, ordering by priority alone would let the
    // survivor flip with partition-internal arrival order across
    // reruns/retries — order by every payload column too, so the choice
    // is a pure function of row content (the reference's sequential
    // ON CONFLICT loop is order-deterministic; a set-based merge must
    // buy determinism from the data instead)
    val payload = existing.columns.toSeq
      .filterNot(Set("id_region", "date").contains)
    val w = Window.partitionBy("id_region", "date")
      .orderBy(col("src_priority").desc +: payload.map(col(_).desc): _*)
    existing.withColumn("src_priority", lit(0))
      .unionByName(incoming.withColumn("src_priority", lit(1)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("src_priority", "rn")
  }

  /** U1 dim upsert: insert-if-absent with stable ids for existing rows
    * (reference get-or-insert, ETL_OMS_OPERATIONNEL.py:263-284). New names
    * get ids after the current max, ordered by name.
    */
  def upsertDim(dim: DataFrame, names: DataFrame, nameCol: String,
      idCol: String): DataFrame = {
    val newNames = names.select(nameCol).distinct()
      .join(dim, Seq(nameCol), "left_anti")
    val maxId = dim.agg(coalesce(max(col(idCol)), lit(0))).first()
      .getAs[Number](0).intValue()
    val fresh = newNames.withColumn(idCol,
      (row_number().over(Window.orderBy(nameCol)) + maxId))
    dim.select(nameCol, idCol).unionByName(fresh.select(nameCol, idCol))
  }

  /** S5/S6 sinks (reference ETL_OMS_FINAL.py:103-108): CSV with header +
    * JSON records per table. coalesce(1) mirrors the reference's
    * single-file output; drop it for parallel many-file writes at scale.
    * The JSON table is the pandas `orient="records"` single-array shape
    * (see [[saveTableJsonArray]]), not Spark's JSON-lines.
    */
  def saveTable(df: DataFrame, outDir: String, name: String): Unit = {
    df.coalesce(1).write.mode("overwrite")
      .option("header", true).csv(s"$outDir/$name.csv")
    saveTableJsonArray(df, outDir, name)
  }

  /** S6 shape parity: pandas `to_json(orient="records")` emits ONE JSON
    * array per table (golden `Résultat de l'ETL/Monkeypox/Pays.json`),
    * where Spark's native sink emits JSON-lines. The rows are written
    * distributed (Spark JSON-lines), then stream-concatenated into the
    * array file on the driver — line at a time, constant memory. Reads
    * back with `spark.read.option("multiLine", true).json(...)`.
    */
  def saveTableJsonArray(df: DataFrame, outDir: String,
      name: String): Unit = {
    import org.apache.hadoop.fs.Path
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val tmpPath = new Path(outDir, s".${name}_jsonl_tmp")
    // Hadoop FS, not java.io.File: the out dir may be hdfs://, s3a://
    // etc., where a local listFiles() would return null and this sink
    // would silently emit an empty array
    val fs = tmpPath.getFileSystem(hconf)
    // pandas emits explicit nulls; Spark's writer drops null fields by
    // default, which would change record shapes vs the golden output
    df.coalesce(1).write.mode("overwrite")
      .option("ignoreNullFields", false).json(tmpPath.toString)
    // listStatus THROWS if the temp dir is missing/unlistable — a failed
    // write must surface, never degrade to "[]" (an empty frame still
    // legitimately yields zero part lines)
    val parts = fs.listStatus(tmpPath)
      .filter(_.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    // concat into a HIDDEN temp target and rename into place at the end:
    // a mid-concat failure must never leave a truncated <name>.json that
    // a later multiLine reader would take for valid output
    val target = new Path(outDir, s"$name.json")
    val targetTmp = new Path(outDir, s".$name.json.tmp")
    var ok = false
    try {
      val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(targetTmp, true), java.nio.charset.StandardCharsets.UTF_8))
      try {
        w.write("[")
        var first = true
        parts.foreach { p =>
          val src = new java.io.BufferedReader(new java.io.InputStreamReader(
            fs.open(p.getPath), java.nio.charset.StandardCharsets.UTF_8))
          try {
            var line = src.readLine()
            while (line != null) {
              if (line.nonEmpty) {
                if (!first) w.write(",")
                w.write(line)
                first = false
              }
              line = src.readLine()
            }
          } finally src.close()
        }
        w.write("]")
      } finally w.close()
      if (fs.exists(target) && !fs.delete(target, false))
        throw new java.io.IOException(s"could not replace $target")
      if (!fs.rename(targetTmp, target))
        throw new java.io.IOException(s"rename $targetTmp -> $target failed")
      ok = true
    } finally {
      // always sweep the temps (a failed run must not leak the hidden
      // jsonl dir or a half-written tmp target); on the failure path the
      // sweep is best-effort so the primary error propagates, on success
      // a failed temp-dir delete surfaces as a real leak
      try {
        fs.delete(targetTmp, false)
        fs.delete(tmpPath, true)
        ()
      } catch { case e: Exception => if (ok) throw e }
    }
  }

  def saveStar(star: StarSchema, outDir: String): Unit = {
    saveTable(star.pays, outDir, "Pays")
    saveTable(star.region, outDir, "Region")
    saveTable(star.maladie, outDir, "Maladie")
    saveTable(star.statistique, outDir, "Statistique")
  }

  /** Multi-disease star schema for directory runs: like [[starSchema]]
    * but the maladie dim spans every disease observed (ids by name order)
    * and each fact row is keyed to its own disease through a broadcast
    * lookup — the set-based form of the reference's dim-cache probes.
    */
  def starSchemaMulti(standardized: DataFrame,
      spark: SparkSession): StarSchema = {
    val pays = standardized.select("country").distinct()
      .withColumn("id_pays", row_number().over(Window.orderBy("country")))
    val region = standardized.select(col("country").as("nom_region"))
      .distinct()
      .withColumn("id_region", row_number().over(Window.orderBy("nom_region")))
      .withColumn("id_pays", col("id_region"))
      .select("id_region", "nom_region", "id_pays")
    val maladie = standardized.select(col("pandemic").as("nom_maladie"))
      .distinct()
      .withColumn("id_maladie",
        row_number().over(Window.orderBy("nom_maladie")))
    val withPays = standardized.join(broadcast(pays), Seq("country"))
    val fact = withPays
      .join(broadcast(region),
        withPays("id_pays") === region("id_pays") &&
          withPays("country") === region("nom_region"))
      .join(broadcast(maladie),
        withPays("pandemic") === maladie("nom_maladie"))
      .select(maladie("id_maladie"), region("id_region"), col("date"),
        col("new_deaths").as("nouveau_mort"),
        col("new_cases").as("nouveau_cas"),
        col("deaths").as("total_mort"))
    StarSchema(pays.select("country", "id_pays"), region,
      maladie.select("id_maladie", "nom_maladie"), fact)
  }

  /** v5 per-file standardization (reference
    * ETL_OMS_OPERATIONNEL.py:95-150): v5 synonym map, null completion,
    * strict-then-lenient dates, >=2019 filter, per-capita hook, all-zero
    * delta gate, 6dp coordinate cleanup.
    */
  def standardizeOperational(raw: DataFrame, disease: String,
      population: Option[Double] = None): DataFrame = {
    val mapped = SchemaMapper.applyMapping(raw, v5ColumnSynonyms)
    val complete = (measureCols ++ Seq("latitude", "longitude"))
      .foldLeft(mapped) { (df, c) =>
        if (df.columns.contains(c)) df.withColumn(c, col(c).cast(DoubleType))
        else df.withColumn(c, lit(null).cast(DoubleType))
      }
    val parseDate = expr("coalesce(" +
      "try_to_timestamp(string(date), 'yyyy-MM-dd'), " +
      "try_to_timestamp(string(date)), " +
      "try_to_timestamp(string(date), 'M/d/yy'), " +
      "try_to_timestamp(string(date), 'M/d/yyyy'))")
    val dated = complete.withColumn("date", parseDate)
      .na.drop(Seq("date"))
      .filter(col("date") >= lit("2019-01-01").cast("timestamp"))
    val converted = cleanCoordinates(convertPerCapita(dated, population))
      .withColumn("pandemic", lit(disease))
    deriveDeltas(converted, treatZeroAsMissing = true)
      .select(("country" +: "date" +: measureCols :+ "latitude" :+
        "longitude" :+ "pandemic").map(col): _*)
  }

  /** EP3/v5 whole-directory run (reference ETL_OMS_OPERATIONNEL.py:218-369)
    * in one pass: per-file standardize (heterogeneous headers force
    * per-file plans; the frames then union), skip-and-count for unmappable
    * files (ETL_OMS_OPERATIONNEL.py:250-253), single cached frame instead
    * of the reference's two-pass re-extraction. `regionGeo` carries the
    * U3 first-observation-wins lat/long enrichment
    * (ETL_OMS_OPERATIONNEL.py:320-352) as a broadcast join instead of a
    * generated CASE-WHEN UPDATE.
    */
  final case class OperationalResult(processed: Seq[String],
      skipped: Seq[String], star: StarSchema, regionGeo: DataFrame,
      private val cached: DataFrame) {
    /** Release the run's cached union frame once the star/geo outputs
      * have been written — long-lived sessions otherwise accumulate dead
      * cache blocks.
      */
    def release(): Unit = { cached.unpersist(); () }

    /** Test hook: the cached frame's storage level — NONE after
      * [[release]]. Parallel-suite-safe, unlike counting the
      * JVM-global getPersistentRDDs. */
    private[graft] def cachedStorageLevel
        : org.apache.spark.storage.StorageLevel = cached.storageLevel
  }

  /** Repeatable-read run (r18, VERDICT #7): the pipeline's storage
    * layer is RAW FILES, so its epoch discipline is the directory
    * twin of [[graft.operators.TextOps.consistentProbe]] — fingerprint
    * the listed files (len + mtime) at entry, EAGERLY materialize the
    * cached union (closing the read window), re-fingerprint, and
    * REPLAN from scratch when any input changed mid-read. A feed that
    * rewrites a landing file between the schema-inferring extract and
    * the first action used to be able to serve a silently mixed run
    * (half old file, half new); now the run either reads one
    * consistent directory state or retries onto the next one — the
    * repeatable-read verb on the reference's own workload. Bounded
    * retries; a feed churning faster than the pipeline can read it
    * fails loudly. `onUnionBuilt` is the race-injection test hook
    * (fires inside the read window, before materialization).
    */
  def runOperational(spark: SparkSession, dir: String,
      attempts: Int = 3,
      onUnionBuilt: () => Unit = () => ()): OperationalResult = {
    val r = runOperationalOnce(spark, dir, onUnionBuilt)
    r match {
      case Right(res) => res
      case Left(changed) =>
        require(attempts > 1,
          s"runOperational: input files kept changing mid-read " +
            s"(${changed.take(3).mkString(", ")}) — the feed is " +
            "churning faster than the pipeline can read it; quiesce " +
            "it or raise attempts")
        runOperational(spark, dir, attempts - 1, onUnionBuilt)
    }
  }

  /** One attempt: Right(result) on a consistent read, Left(changed
    * paths) when the directory moved underneath it. */
  private def runOperationalOnce(spark: SparkSession, dir: String,
      onUnionBuilt: () => Unit)
      : Either[Seq[String], OperationalResult] = {
    // Hadoop FS, not java.io.File — the ingest dir may be hdfs://,
    // s3a:// etc. (same rule saveTableJsonArray follows for its out dir)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val hfs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(dirPath) || !hfs.getFileStatus(dirPath).isDirectory)
      throw new IllegalArgumentException(s"not a directory: $dir")
    // (len, mtime) straight from the listing — re-statting each path
    // would both double the RPCs and CRASH (FileNotFoundException)
    // on a file deleted between the list and the stat, exactly the
    // churn this read exists to survive; a vanished file must surface
    // as a fingerprint CHANGE, not an error (late r18, review)
    def fingerprint(): Map[String, (Long, Long)] =
      hfs.listStatus(dirPath)
        .filter(st => st.getPath.getName.endsWith(".csv") ||
          st.getPath.getName.endsWith(".json"))
        .map(st => st.getPath.toString ->
          (st.getLen, st.getModificationTime))
        .toMap
    val before = fingerprint()
    val files = before.keys.toSeq.sorted
    // a vanished file must surface as a REPLAN anywhere in the read
    // window — the schema-inferring extracts do eager driver-side
    // I/O too, so the guard covers them, not just the cache
    // materialization (late r18, review #2: the first fix only
    // wrapped all.count(), and a file deleted during the per-file
    // extract loop still crashed)
    def vanished(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16)
        .exists(c => c.isInstanceOf[java.io.FileNotFoundException] ||
          (c.isInstanceOf[org.apache.spark.sql.AnalysisException] &&
            Option(c.getMessage).exists(m =>
              m.contains("PATH_NOT_FOUND") ||
                m.contains("does not exist"))))
    var cached: org.apache.spark.sql.DataFrame = null
    val loaded =
      try {
        val results = files.map { path =>
          val raw = extract(spark, path)
          val mapped = SchemaMapper.applyMapping(raw, v5ColumnSynonyms)
          val ok = mapped.columns.contains("country") &&
            mapped.columns.contains("date")
          (path, ok,
            if (ok) Some(standardizeOperational(raw, detectMaladie(path)))
            else None)
        }
        val frames = results.flatMap(_._3)
        cached = frames.reduceOption(_.unionByName(_))
          .getOrElse(
            throw new IllegalStateException("no mappable files"))
          .cache()
        onUnionBuilt()
        // materialize NOW — every downstream pass serves from the
        // cache, so the consistency the re-fingerprint proves covers
        // them all
        cached.count()
        Right(results)
      } catch {
        case t: Throwable if vanished(t) =>
          if (cached != null) cached.unpersist()
          Left(Seq(s"file vanished mid-read: ${t.getMessage}"))
        case t: Throwable =>
          // any OTHER failure after .cache() — onUnionBuilt throwing,
          // count() dying for a non-vanish reason — must not pin the
          // cached blocks for the session's lifetime (r19, ADVICE #3);
          // release before propagating, and never let a failed
          // unpersist mask the real error
          if (cached != null) {
            try cached.unpersist()
            catch { case scala.util.control.NonFatal(_) => () }
          }
          throw t
      }
    val results = loaded match {
      case Left(changed) => return Left(changed)
      case Right(r) => r
    }
    val processed = results.collect { case (p, true, _) => p }
    val skipped = results.collect { case (p, false, _) => p }
    val all = cached
    val after = fingerprint()
    val changed = files.filter(p => !after.get(p).contains(before(p)))
    if (changed.nonEmpty) {
      all.unpersist()
      return Left(changed)
    }
    // disease dimension spans all diseases seen this run, facts keyed to
    // their own disease (reference dim-cache lookups,
    // ETL_OMS_OPERATIONNEL.py:229-234)
    val star = starSchemaMulti(all, spark)
    // U3: first observation (earliest date; coordinate tiebreak for
    // duplicate dates) with both coordinates wins
    val w = Window.partitionBy("country")
      .orderBy(col("date"), col("latitude"), col("longitude"))
    val firstObs = all
      .filter(col("latitude").isNotNull && col("longitude").isNotNull)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("country").as("nom_region"),
        col("latitude").as("obs_lat"), col("longitude").as("obs_long"))
    val regionGeo = star.region
      .join(broadcast(firstObs), Seq("nom_region"), "left")
      .select(col("id_region"), col("nom_region"), col("id_pays"),
        col("obs_lat").as("latitude"), col("obs_long").as("longitude"))
    Right(OperationalResult(processed, skipped, star, regionGeo, all))
  }
}
