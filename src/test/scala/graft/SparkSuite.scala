package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite (lazy). */
trait SparkSuite { self: AnyFunSuite =>
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", "4").getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}
