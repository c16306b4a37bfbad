package graft

import graft.pipeline.OmsPipeline
import org.scalatest.funsuite.AnyFunSuite

/** S5/S6 sink coverage: star-schema tables written as CSV+JSON and read
  * back intact.
  */
class SinksSpec extends AnyFunSuite with SparkSuite {

  test("star schema writes CSV and JSON, round-trips row counts") {
    val out = java.nio.file.Files.createTempDirectory("graft_sinks")
      .toString
    val std = OmsPipeline.standardize(
      OmsPipeline.extract(spark,
        "/root/reference/DATASETS/covid_country_wise_latest.csv"),
      "COVID-19")
    // this file has no date column → pandas drops nothing only in v4
    // (now() fill); EP2 semantics drop all rows. Use a dated file instead
    // if empty.
    val source = if (std.isEmpty)
      OmsPipeline.standardize(OmsPipeline.extract(spark,
        "/root/reference/DATASETS/covid_global_3.csv"), "COVID-19")
    else std
    val star = OmsPipeline.starSchema(source, "COVID-19", spark)
    OmsPipeline.saveStar(star, out)
    val paysBack = spark.read.option("header", true).csv(s"$out/Pays.csv")
    val statBack = spark.read.json(s"$out/Statistique.json")
    assert(paysBack.count() === star.pays.count())
    assert(statBack.count() === star.statistique.count())
    assert(paysBack.columns.toSet === Set("country", "id_pays"))
  }
}
