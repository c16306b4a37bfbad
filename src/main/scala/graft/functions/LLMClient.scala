package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StringType

/** The reference's LLM-pipeline extension surface (llm_client.py:6-41):
  * an abstract `ask(prompt) -> str` client plus a concrete local pipeline.
  *
  * Spark mapping: `mapPartitions` with one client per partition — the same
  * amortize-the-model-load motive as the reference constructing its
  * pipeline once (llm_client.py:13-34). The client is created inside the
  * partition lambda (on the executor), never serialized from the driver.
  *
  * No network/model in the harness ⇒ a deterministic stub ships as the
  * default so downstream queries stay oracle-testable.
  */
trait LLMClient extends Serializable {
  def ask(prompt: String): String
}

/** Deterministic stand-in: "summarize" = first 8 whitespace tokens.
  * Mirrors llm_client.py:36-37 shape (prompt in, text out). Tokenizes via
  * TextHashing.tokens (Spark-SQL-exact space-only trim) so the DuckDB
  * oracle's `trim` + regex split sees identical tokens — Java String.trim
  * would also strip tabs/controls and diverge on edge whitespace.
  */
class StubLLMClient extends LLMClient {
  override def ask(prompt: String): String =
    TextHashing.tokens(prompt).take(8).mkString(" ")
}

object LlmOps {
  /** Append `outCol` = client(ask) over `textCol`, batched per partition.
    * `mkClient` runs on the executor once per partition.
    */
  def withCompletion(df: DataFrame, textCol: String, outCol: String,
      mkClient: () => LLMClient = () => new StubLLMClient): DataFrame = {
    val schema = df.schema.add(outCol, StringType)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      val client = mkClient()
      it.map { r =>
        val text = if (r.isNullAt(idx)) null else r.getString(idx)
        val out = if (text == null) null else client.ask(text)
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(schema))
  }
}
