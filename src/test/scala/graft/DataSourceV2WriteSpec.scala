package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_jsonl DSv2 sink: two-phase commit (stage → rename-on-commit),
  * append/overwrite modes, and abort hygiene.
  */
class DataSourceV2WriteSpec extends AnyFunSuite with SparkSuite {

  private def files(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .map(_.getName).sorted

  test("append write round-trips values, leaves only part-*.jsonl files") {
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val src = Tables(spark, sf, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    src.write.format("graft_jsonl").option("path", out).mode("append").save()
    val names = files(out)
    assert(names.nonEmpty && names.forall(n =>
      n.startsWith("part-") && n.endsWith(".jsonl")), names)
    val back = spark.read.json(out)
    assert(back.count() === src.count())
    // value-level: keys and a string column survive
    val pairs = back.select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val exp = src.select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pairs === exp)
  }

  test("overwrite truncates previous part files at commit") {
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val a = Tables(spark, sf, "region").select("r_regionkey", "r_name")
    a.write.format("graft_jsonl").option("path", out).mode("append").save()
    a.write.format("graft_jsonl").option("path", out).mode("append").save()
    assert(spark.read.json(out).count() === a.count() * 2)
    a.limit(2).write.format("graft_jsonl").option("path", out)
      .mode("overwrite").save()
    assert(spark.read.json(out).count() === 2)
  }

  test("special characters and nulls survive the JSON encoding") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val src = Seq((1L, "a\"b\\c\nd\te"), (2L, null))
      .toDF("id", "s")
    src.write.format("graft_jsonl").option("path", out).mode("append").save()
    val back = spark.read.json(out).orderBy("id")
      .select("id", "s").collect()
    assert(back(0).getString(1) === "a\"b\\c\nd\te")
    assert(back(1).isNullAt(1))
  }

  test("unsupported column type fails at planning with a clear error") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val e = intercept[Exception] {
      Seq((1L, Array(1.0f, 2.0f))).toDF("id", "vec")
        .write.format("graft_jsonl").option("path", out)
        .mode("append").save()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(c => Option(c.getMessage).exists(
        _.contains("graft_jsonl cannot write column 'vec'"))), e.toString)
    // nothing staged, nothing visible
    assert(files(out).isEmpty)
  }

  test("failed job aborts cleanly: no staged or part files remain") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val boom = udf((i: Long) =>
      if (i > 2) throw new RuntimeException("boom") else i)
    val e = intercept[Exception] {
      spark.range(0, 100, 1, 4)
        .select(boom(col("id")).as("id"))
        .write.format("graft_jsonl").option("path", out)
        .mode("append").save()
    }
    assert(e != null)
    assert(files(out).isEmpty, files(out))
  }
}
