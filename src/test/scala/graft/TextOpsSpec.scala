package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextOps

/** Brute-force Scala oracles for the text operators (sf0.001). */
class TextOpsSpec extends SparkSpec {

  private val P = TextFunctions.P

  private def hashScala(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)

  private lazy val docs = Tables.load(spark, sfDir, "documents")
  private lazy val sample: Seq[(Long, String)] =
    docs.select("doc_id", "text").limit(50).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("charHash matches the Scala fold") {
    val got = docs.limit(50)
      .select(col("doc_id"), TextFunctions.charHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample.foreach { case (id, text) => assert(got(id) === hashScala(text)) }
  }

  test("tokenCounts matches split length") {
    val got = TextOps.tokenCounts(docs.limit(50), "text")
      .select("doc_id", "n_ws_tokens", "n_re_tokens")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    sample.foreach { case (id, text) =>
      assert(got(id)._1 === text.split(" ").length.toLong)
      assert(got(id)._2 === "[a-z0-9]+".r.findAllIn(text).length.toLong)
    }
  }

  test("qualityScore fields are in range and consistent") {
    val rows = TextOps.qualityScore(docs, "text")
      .select("doc_id", "n_tokens", "avg_token_len", "stopword_ratio", "quality_score")
      .collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      val (n, avg, stop, q) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(n > 0)
      assert(avg > 0.0)
      assert(stop >= 0.0 && stop <= 1.0)
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("langId is a deterministic argmax over marker counts") {
    val rows = TextOps.langId(docs.limit(50), "text")
      .select(col("doc_id") +: TextOps.langMarkers.map { case (l, _) => col(s"s_$l") } :+
        col("pred_lang"): _*)
      .collect()
    val langs = TextOps.langMarkers.map(_._1)
    rows.foreach { r =>
      val scores = langs.indices.map(i => r.getLong(i + 1))
      val pred = r.getString(langs.size + 1)
      val best = scores.max
      // first language (in marker order) achieving the max must win
      assert(pred === langs(scores.indexOf(best)))
    }
  }

  test("langIdNgram scores are non-overlapping substring counts with argmax") {
    val rows = TextOps.langIdNgram(docs.limit(30), "text")
      .select(col("doc_id") +: TextOps.langNgramProfiles.map { case (l, _) => col(s"n_$l") } :+
        col("pred_lang_ngram"): _*)
      .collect()
    val langs = TextOps.langNgramProfiles.map(_._1)
    val texts = sample.take(30).toMap
    def countOcc(text: String, pat: String): Long = {
      var i = 0; var n = 0L
      while ({ i = text.indexOf(pat, i); i >= 0 }) { n += 1; i += pat.length }
      n
    }
    rows.foreach { r =>
      val id = r.getLong(0)
      val scores = langs.indices.map(i => r.getLong(i + 1))
      TextOps.langNgramProfiles.zipWithIndex.foreach { case ((_, grams), i) =>
        assert(scores(i) === grams.map(g => countOcc(texts(id), g)).sum)
      }
      assert(r.getString(langs.size + 1) === langs(scores.indexOf(scores.max)))
    }
  }

  test("fingerprint: equal texts hash equal, doc_hash matches Scala fold") {
    val fp = TextOps.fingerprint(docs.limit(50), "text")
      .select("doc_id", "doc_hash", "n_kgrams", "min_kgram_hash").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    sample.foreach { case (id, text) =>
      val (dh, nk, mk) = fp(id)
      assert(dh === hashScala(text))
      val toks = text.split(" ")
      val grams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      assert(nk === grams.length.toLong)
      assert(mk === (if (grams.isEmpty) -1L else grams.map(hashScala).min))
    }
  }

  test("minhash signature component equals Scala min over token codes") {
    val sig = docs.limit(20)
      .select(col("doc_id"),
        TextFunctions.minhashSig(TextFunctions.tokenCodes(col("text")), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val params = TextFunctions.mhParams(16)
    sample.take(20).foreach { case (id, text) =>
      val codes = text.split(" ").map(hashScala)
      val expect = params.map { case (a, b) => codes.map(c => (c * a + b) % P).min }
      assert(sig(id) === expect)
    }
  }
}
