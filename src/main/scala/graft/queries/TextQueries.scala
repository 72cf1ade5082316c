package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.{bigramsSql, charHashSql, tokensSql}
import graft.operators.TextOps

/** SURVEY §2.3 — text-analysis operators over the documents table, each
  * with a full DuckDB oracle (the hash-based ones rely on TextFunctions'
  * portable polynomial hash being expressed identically on both sides).
  */
object TextQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "documents")

  val defs: Seq[Q] = Seq(

    // Token counting: whitespace tokens + BPE-ish regex token runs.
    Q("q_token_count",
      (s, d) => TextOps.tokenCounts(docs(s, d), "text")
        .select(col("doc_id"), col("n_ws_tokens"), col("n_re_tokens"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, " +
        s"CAST(len(${tokensSql("text")}) AS BIGINT) AS n_ws_tokens, " +
        "CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_re_tokens " +
        "FROM documents ORDER BY doc_id")),

    // Quality scoring: length/stopword ratios + combined [0,1] score.
    Q("q_quality_score",
      (s, d) => TextOps.qualityScore(docs(s, d), "text")
        .select(col("doc_id"), col("n_tokens"), col("avg_token_len"),
          col("stopword_ratio"), col("quality_score"))
        .orderBy("doc_id"),
      Some("WITH t AS (SELECT doc_id, " +
        s"CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tok, " +
        s"CAST(len(list_filter(${tokensSql("text")}, t -> (t = 'the' OR t = 'a'))) AS BIGINT) AS n_stop, " +
        "CAST(length(text) AS BIGINT) AS n_ch FROM documents) " +
        "SELECT doc_id, n_tok AS n_tokens, " +
        "round((n_ch - (n_tok - 1)) / n_tok, 6) AS avg_token_len, " +
        "round(n_stop / n_tok, 6) AS stopword_ratio, " +
        "round(least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) * (1.0 - (n_stop / n_tok)), 6) AS quality_score " +
        "FROM t ORDER BY doc_id")),

    // Language-ID: marker-word count per language, deterministic argmax.
    Q("q_lang_id",
      (s, d) => TextOps.langId(docs(s, d), "text")
        .select(col("doc_id") +:
          TextOps.langMarkers.map { case (l, _) => col(s"s_$l") } :+
          col("pred_lang"): _*)
        .orderBy("doc_id"),
      Some {
        val scores = TextOps.langMarkers.map { case (lang, words) =>
          s"CAST(${TextOps.markerCountSql(tokensSql("text"), words)} AS BIGINT) AS s_$lang"
        }.mkString(", ")
        val scoreCols = TextOps.langMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")
        s"WITH s AS (SELECT doc_id, $scores FROM documents) " +
          s"SELECT doc_id, $scoreCols, ${TextOps.langIdArgmaxSql} AS pred_lang " +
          "FROM s ORDER BY doc_id"
      }),

    // Language-ID via char-n-gram profiles (the tokenization-free variant).
    Q("q_lang_id_ngram",
      (s, d) => TextOps.langIdNgram(docs(s, d), "text")
        .select(col("doc_id") +:
          TextOps.langNgramProfiles.map { case (l, _) => col(s"n_$l") } :+
          col("pred_lang_ngram"): _*)
        .orderBy("doc_id"),
      Some {
        val (scores, argmax) = TextOps.langIdNgramSql("text")
        s"WITH s AS (SELECT doc_id, $scores FROM documents) " +
          s"SELECT doc_id, ${TextOps.langNgramProfiles.map(p => s"n_${p._1}").mkString(", ")}, " +
          s"$argmax AS pred_lang_ngram FROM s ORDER BY doc_id"
      }),

    // Rolling-hash fingerprint: doc hash + winnowed bigram-shingle hash.
    Q("q_fingerprint",
      (s, d) => TextOps.fingerprint(docs(s, d), "text")
        .select(col("doc_id"), col("doc_hash"), col("n_kgrams"), col("min_kgram_hash"))
        .orderBy("doc_id"),
      Some {
        val grams = bigramsSql(tokensSql("text"))
        s"SELECT doc_id, ${charHashSql("text")} AS doc_hash, " +
          s"CAST(len($grams) AS BIGINT) AS n_kgrams, " +
          s"COALESCE(list_min(list_transform($grams, g -> ${charHashSql("g")})), -1) AS min_kgram_hash " +
          "FROM documents ORDER BY doc_id"
      })
  )
}
