package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the training-data pipeline operators — the
  * properties a dataset-prep user relies on, beyond the oracle's
  * value-equality check.
  */
class TrainingDataSpec extends AnyFunSuite with SparkSuite {

  private val sf01 = "/root/testdata/sf0.01"

  test("q_sample_split: ~80/10/10, deterministic across runs") {
    val run = SparkEntry.queries("q_sample_split")(spark, sf01)
    val counts = run.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    assert(counts("train") / total > 0.7 && counts("train") / total < 0.9,
      counts)
    assert(counts("val") / total > 0.04 && counts("val") / total < 0.16,
      counts)
    assert(counts("test") / total > 0.04 && counts("test") / total < 0.16,
      counts)
    // hash-determinism: a second evaluation assigns identically
    val again = SparkEntry.queries("q_sample_split")(spark, sf01)
    assert(run.exceptAll(again).isEmpty && again.exceptAll(run).isEmpty)
  }

  test("q_pack: packs partition the corpus tokens, ids contiguous from 0") {
    val packs = SparkEntry.queries("q_pack")(spark, sf01)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    val docs = Tables(spark, sf01, "documents")
      .select(substring(md5(col("doc_id").cast("string")), 1, 1)
        .as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .groupBy("shard").agg(sum("n").as("total"), count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val maxDoc = Tables(spark, sf01, "documents")
      .select(max(size(split(trim(col("text")), "\\s+"))))
      .first().getInt(0)
    packs.groupBy(_._1).foreach { case (shard, ps) =>
      // token + doc conservation per shard
      assert(ps.map(_._4).sum === docs(shard)._1, shard)
      assert(ps.map(_._3).sum === docs(shard)._2, shard)
      // pack ids dense 0..n-1 — guaranteed only when no single doc can
      // straddle more than one full budget (a >2048-token doc skips a
      // pack id by construction)
      if (maxDoc < 2048)
        assert(ps.map(_._2).sorted.toSeq === (0 until ps.size).toSeq,
          shard)
    }
  }

  test("q_redact: no emails or 4+ digit runs survive") {
    val clean = SparkEntry.queries("q_redact")(spark, sf01)
    assert(clean.filter(col("clean").rlike("@")).count() === 0)
    assert(clean.filter(col("clean").rlike("[0-9]{4,}")).count() === 0)
    // the synthesized PII really was there and really was replaced
    assert(clean.filter(col("clean").contains("<EMAIL>")).count() ===
      clean.count())
  }

  test("q_contamination: only non-benchmark docs, with real overlap") {
    val c = SparkEntry.queries("q_contamination")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(c.nonEmpty)
    assert(c.forall(_._1 >= 5), c.take(5).toSeq)
    assert(c.forall(_._2 >= 1), c.take(5).toSeq)
  }

  test("q_chunk: chunks cover every token; overlap reconstructs the doc") {
    val chunks = SparkEntry.queries("q_chunk")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3)))
    val docToks = Tables(spark, sf01, "documents")
      .select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(chunks.map(_._1).toSet === docToks.keySet) // every doc chunked
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk ids dense from 0
      assert(sorted.map(_._2).toSeq === (0 until cs.length), id)
      // stitching chunks at stride 24 reconstructs the token stream:
      // chunk i contributes tokens [i*24, i*24 + len_i)
      val toks = docToks(id)
      sorted.foreach { case (_, cid, text, n) =>
        val expect = toks.slice(cid * 24, cid * 24 + 32)
        assert(text === expect.mkString(" "), s"$id/$cid")
        assert(n === expect.length, s"$id/$cid")
      }
      // coverage: the last chunk reaches the final token
      val (_, lastId, _, lastN) = sorted.last
      assert(lastId * 24 + lastN === toks.length, id)
    }
  }

  test("q_shuffle_global: pos is a bijection onto 1..n, md5-ordered") {
    val rows = SparkEntry.queries("q_shuffle_global")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length
    assert(rows.map(_._2).sorted.toSeq === (1L to n.toLong)) // bijection
    // the order really is the md5 order (what a global sort would give)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String = md.digest(id.toString.getBytes)
      .map("%02x".format(_)).mkString
    val expected = rows.map(_._1).sortBy(id => (h(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    rows.foreach { case (id, pos) => assert(pos === expected(id), id) }
  }

  test("q_weighted_sample: inclusion is monotone in weight") {
    // sequential-Poisson priority = w/u with u fixed per doc_id, so
    // raising only the sampled docs' weights can never evict them and
    // lowering only the unsampled docs' weights can never admit them
    import graft.operators.TrainingData
    val docs = Tables(spark, sf, "documents").select("doc_id", "n_chars")
    def topK(d: org.apache.spark.sql.DataFrame, k: Int): Set[Long] =
      d.select(col("doc_id"),
          TrainingData.samplePriority(col("w"), col("doc_id")).as("p"))
        .orderBy(col("p").desc, col("doc_id")).limit(k)
        .collect().map(_.getLong(0)).toSet
    val k = 10
    val sample = topK(docs.withColumn("w", col("n_chars").cast("double")), k)
    assert(sample.size === k)
    val up = docs.withColumn("w",
      when(col("doc_id").isInCollection(sample), col("n_chars") * 10.0)
        .otherwise(col("n_chars").cast("double")))
    assert(topK(up, k) === sample)
    val down = docs.withColumn("w",
      when(col("doc_id").isInCollection(sample),
        col("n_chars").cast("double"))
        .otherwise(col("n_chars") / 10.0))
    assert(topK(down, k) === sample)
  }

  test("q_weighted_sample: result invariant under input order/partitioning") {
    // the sample is a pure function of (doc_id, weight) content — row
    // order and physical layout must not leak through the top-k cut
    import graft.operators.TrainingData
    val base = SparkEntry.queries("q_weighted_sample")(spark, sf01)
      .collect().map(_.toSeq).toSeq
    val shuffled = Tables(spark, sf01, "documents")
      .repartition(13, col("n_chars"))
      .sortWithinPartitions(col("doc_id").desc)
      .select(col("doc_id"), col("n_chars"),
        TrainingData.samplePriority(col("n_chars"), col("doc_id"))
          .as("priority"))
      .orderBy(col("priority").desc, col("doc_id")).limit(25)
      .collect().map(_.toSeq).toSeq
    assert(base.size === 25)
    assert(shuffled === base)
  }

  test("q_weighted_sample: priorities bit-identical to a driver reference") {
    // the exactness claim behind the oracle: u = (hex32(md5)+0.5)/2^32
    // is an exact dyadic double and w/u is one correctly-rounded IEEE
    // division, so an independent driver-side recompute must match to
    // the last bit, not within a tolerance
    import graft.operators.TrainingData
    val rows = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"),
        TrainingData.samplePriority(col("n_chars"), col("doc_id")).as("p"))
      .collect()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = r.get(1).asInstanceOf[Number].doubleValue()
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.take(8), 16) + 0.5) /
        4294967296.0
      assert(r.getDouble(2) === w / u, s"doc $id")
    }
  }

  test("q_mixture: kept <= total, even sources thinner than odd") {
    val m = SparkEntry.queries("q_mixture")(spark, sf01)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(m.forall { case (_, total, kept) => kept <= total })
    val (even, odd) = m.partition(t =>
      t._1.replaceAll("[^0-9]", "").toInt % 2 == 0)
    val evenRate = even.map(_._3).sum.toDouble / even.map(_._2).sum
    val oddRate = odd.map(_._3).sum.toDouble / odd.map(_._2).sum
    assert(evenRate < oddRate, s"even=$evenRate odd=$oddRate")
    // thresholds 0x40/0xc0 of 256: expect ~25% / ~75%
    assert(evenRate > 0.1 && evenRate < 0.4, evenRate)
    assert(oddRate > 0.6 && oddRate < 0.9, oddRate)
  }
}
