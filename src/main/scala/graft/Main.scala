package graft

import graft.pipeline.OmsPipeline
import org.apache.spark.sql.SparkSession

/** Command-line entry points mirroring the reference's argparse surface
  * (ETL_OMS.py:102-115 `--file`/`--pandemic_name`;
  * ETL_OMS_OPERATIONNEL.py:218-369 directory mode):
  *
  *   graft.Main --file <csv|json> --pandemic_name <name> --out <dir>
  *     single-file run → EP1 long-format result (Resultat.csv/json) plus
  *     the EP2 star tables (Pays/Region/Maladie/Statistique .csv/.json)
  *     under <out>/<name>/, like the reference's "Résultat de l'ETL" tree.
  *
  *   graft.Main --dir <path> --out <dir>
  *     EP3/v5 whole-directory run: per-file standardization with
  *     skip-and-count, multi-disease star schema, geo-enriched regions
  *     under <out>/Operational/.
  */
object Main {

  final case class Args(file: Option[String] = None,
      pandemicName: String = "pandemic",
      dir: Option[String] = None,
      out: String = "Resultat_ETL")

  def parse(argv: Seq[String]): Args = {
    @annotation.tailrec
    def go(rest: List[String], acc: Args): Args = rest match {
      case "--file" :: v :: t          => go(t, acc.copy(file = Some(v)))
      case "--pandemic_name" :: v :: t => go(t, acc.copy(pandemicName = v))
      case "--dir" :: v :: t           => go(t, acc.copy(dir = Some(v)))
      case "--out" :: v :: t           => go(t, acc.copy(out = v))
      case Nil                         => acc
      // a recognized flag with its value missing (end of argv) must not
      // be misreported as unknown
      case flag :: Nil if Set("--file", "--pandemic_name", "--dir",
          "--out").contains(flag) =>
        throw new IllegalArgumentException(s"missing value for $flag")
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown argument: $other")
    }
    go(argv.toList, Args())
  }

  /** Session-injected body (testable without building a session). */
  def run(spark: SparkSession, args: Args): Unit = args match {
    case Args(Some(file), name, None, out) =>
      val standardized =
        OmsPipeline.standardize(OmsPipeline.extract(spark, file), name)
      val outDir = s"$out/$name"
      // EP1: long-format result (reference result_path_csv/json)
      OmsPipeline.saveTable(
        OmsPipeline.toLongFormat(standardized), outDir, "Resultat")
      // EP2: star schema tables
      OmsPipeline.saveStar(
        OmsPipeline.starSchema(standardized, name, spark), outDir)
      println(s"wrote EP1+EP2 outputs to $outDir")
    case Args(None, _, Some(dir), out) =>
      val res = OmsPipeline.runOperational(spark, dir)
      val outDir = s"$out/Operational"
      OmsPipeline.saveStar(res.star, outDir)
      OmsPipeline.saveTable(res.regionGeo, outDir, "RegionGeo")
      res.release()
      println(s"processed=${res.processed.size} " +
        s"skipped=${res.skipped.size} -> $outDir")
    case _ =>
      throw new IllegalArgumentException(
        "usage: graft.Main (--file <path> --pandemic_name <name> | " +
          "--dir <path>) [--out <dir>]")
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toIndexedSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args)
    finally spark.stop()
  }
}
