package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY.md §2.11): media as opaque `binary` payloads
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decode` is a STUB — a
  * deterministic fake that reads real bytes and emits a features struct.
  * Everything around it is real Spark plumbing: binary column handling,
  * struct schemas, mapPartitions batch shape (decoder state initialized
  * once per partition, like a codec context), and byte-slice frame
  * sampling. Swap `StubDecoder` for a JNI/codec call and nothing else
  * changes.
  *
  * Scale: payloads travel with the row (no driver collection); decode is
  * narrow (no shuffle); real deployments would store payloads in parquet
  * binary columns or object-store refs exactly like this.
  */
object Multimodal {

  /** Deterministic stand-in for an image/audio decoder. */
  class StubDecoder {
    def decode(bytes: Array[Byte]): (Int, String, Double) = {
      val magic = bytes.take(2).map("%02X".format(_)).mkString
      val brightness = if (bytes.isEmpty) 0.0
        else bytes.map(b => (b & 0xff).toDouble).sum / (bytes.length * 255.0)
      (bytes.length, magic, brightness)
    }
  }

  /** Attach a fake 16-byte payload derived from text (md5 bytes) — the
    * documents table standing in for a media corpus.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", unhex(md5(col("text"))))
      .withColumn("media_type", lit("application/x-fake"))

  /** Per-partition decode: one decoder per partition, features appended
    * as a struct column. A null payload (e.g. null text upstream of
    * unhex(md5(...))) yields a null features struct instead of an NPE.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val featSchema = StructType(Seq(
      StructField("n_bytes", IntegerType, false),
      StructField("magic", StringType, false),
      StructField("brightness", DoubleType, false)))
    val schema = df.schema.add("features", featSchema, nullable = true)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      val dec = new StubDecoder
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val feats =
          if (bytes == null) null
          else {
            val (n, magic, bright) = dec.decode(bytes)
            Row(n, magic, bright)
          }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(Encoders.row(schema))
  }

  /** "Resize": deterministic payload downsample — keep every `factor`-th
    * byte (the media-codec resize is a STUB like decode; the Spark-side
    * shape — binary in, smaller binary out, narrow op — is the real
    * plumbing a codec would slot into).
    */
  def resize(df: DataFrame, payloadCol: String, factor: Int): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val schema = df.schema.add("resized",
      org.apache.spark.sql.types.BinaryType)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val out =
          if (bytes == null) null
          else bytes.zipWithIndex.collect {
            case (b, i) if i % factor == 0 => b
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(schema))
  }

  /** Frame sampling: every `step`-th byte window as a "frame". Payloads
    * shorter than one frame yield an empty list (sequence(1, 0, step)
    * would throw on illegal boundaries).
    */
  def sampleFrames(df: DataFrame, payloadCol: String, frameLen: Int,
      step: Int): DataFrame =
    df.withColumn("frames", expr(
      s"IF(octet_length($payloadCol) < $frameLen, " +
        "cast(array() as array<binary>), " +
        s"transform(sequence(1, octet_length($payloadCol) - " +
        s"$frameLen + 1, $step), i -> substring($payloadCol, i, " +
        s"$frameLen)))"))

  val defs: Seq[QDef] = Seq(
    // binary payload plumbing end-to-end: attach → mapPartitions decode →
    // typed feature projection. Oracle checks the byte-level outputs that
    // ANSI SQL can reach (length + magic); brightness is covered by
    // MultimodalSpec.
    QDef("q_multimodal",
      (s, d) => decodeFeatures(
        withPayload(Tables(s, d, "documents").select("doc_id", "text")),
        "payload")
        .select(col("doc_id"), col("features.n_bytes").as("n_bytes"),
          col("features.magic").as("magic")),
      // null text → null payload → null features struct on the Spark
      // side, so n_bytes must be text-conditional here too (a bare
      // constant 16 would diverge the moment the corpus holds a null)
      Some("SELECT doc_id, " +
        "CASE WHEN text IS NULL THEN NULL ELSE 16 END AS n_bytes, " +
        "upper(substr(md5(text), 1, 4)) AS magic FROM documents"))
  )
}
