package graft
import org.apache.spark.sql.SparkSession

/** Emulates the driver's t1 smoke: a default-config session (ANSI on, no
  * nanos conf) calling SparkEntry.entry — the entry path must self-arm
  * everything it needs (Tables.events sets nanosAsLong at runtime).
  */
object SmokeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n ansi=" +
      spark.conf.get("spark.sql.ansi.enabled"))
    assert(n > 0)
    spark.stop()
  }
}
