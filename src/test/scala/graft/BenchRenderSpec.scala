package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON line is parsed by the driver — it must stay valid JSON
  * under any JVM default locale (a comma-decimal locale once broke the
  * f-interpolated numbers) and under failure sentinels.
  */
class BenchRenderSpec extends AnyFunSuite {

  private val results = Seq(
    ("q_a", 0.1234, Seq(0.5678, 0.1234)),
    ("q_fail", -1.0, Seq(-1.0, -1.0)))

  test("render emits dot-decimal JSON regardless of default locale") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.FRANCE)
      val line = Bench.render(results, 2, "0.5 0.4 0.3 1/2 3",
        "0.6 0.5 0.4 1/2 3", "/tmp/sf")
      assert(!line.contains("0,1234"), line)
      assert(line.contains("\"q_a\":0.1234"), line)
      assert(line.contains("[0.5678,0.1234]"), line)
      // failed sentinel stays visible, excluded from the total
      assert(line.contains("\"failed\":1"), line)
      assert(line.contains("\"value\":0.1234"), line)
      // structurally valid: balanced braces/brackets, parseable shape
      assert(line.count(_ == '{') === line.count(_ == '}'), line)
      assert(line.count(_ == '[') === line.count(_ == ']'), line)
    } finally java.util.Locale.setDefault(prev)
  }
}
