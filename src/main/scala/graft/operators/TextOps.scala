package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text-analysis operators for the training-data pipeline (SURVEY §2.3):
  * token counting, quality scoring, language-ID, fingerprinting. All pure
  * column expression trees — narrow, zero-shuffle, whole-stage-codegen'd —
  * so at 100 TB each is a single scan stage over the documents table.
  */
object TextOps {

  /** Stopword set shared by qualityScore and the 'en' langId markers. */
  val stopwords: Seq[String] = Seq("the", "a")

  /** Marker-word table for the language-ID heuristic. The listed order is
    * the deterministic argmax tie-break preference. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "es" -> Seq("data", "row"),
    "fr" -> Seq("table", "query"),
    "de" -> Seq("spark", "batch"),
    "zh" -> Seq("vector", "stream"))

  private def memberPred(t: Column, words: Seq[String]): Column =
    words.map(w => t === w).reduceLeft(_ || _)

  private def memberPredSql(t: String, words: Seq[String]): String =
    words.map(w => s"$t = '$w'").mkString("(", " OR ", ")")

  /** Count of tokens matching any of `words`. */
  def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => memberPred(t, words)))

  def markerCountSql(toks: String, words: Seq[String]): String =
    s"len(list_filter($toks, t -> ${memberPredSql("t", words)}))"

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (alnum runs — the lowercase-word analogue of a byte-level BPE
    * pre-tokenizer split). */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_ws_tokens", size(TextFunctions.tokens(col(textCol))).cast("long"))
      .withColumn("n_re_tokens", regexp_count(col(textCol), lit("[a-z0-9]+")).cast("long"))

  /** Document quality scoring: token count, mean token length, stopword
    * ratio, and a combined [0,1] score — length-normalized and
    * stopword-penalized. Pure arithmetic over exact ints, so the rounded
    * doubles hash-match any engine computing the same tree. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val nTok = size(toks).cast("long")
    val nStop = markerCount(toks, stopwords).cast("long")
    val avgLen = (length(col(textCol)).cast("long") - (nTok - 1L)) / nTok
    val stopRatio = nStop / nTok
    df.withColumn("n_tokens", nTok)
      .withColumn("avg_token_len", round(avgLen, 6))
      .withColumn("stopword_ratio", round(stopRatio, 6))
      .withColumn("quality_score",
        round(least(nTok / 100.0, lit(1.0)) * (lit(1.0) - stopRatio), 6))
  }

  /** Language-ID: marker-word count per language, deterministic argmax
    * (first language in `langMarkers` order wins ties). */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val scored = langMarkers.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"s_$lang", markerCount(toks, words).cast("long"))
    }
    val langs = langMarkers.map(_._1)
    val pred = langs.zipWithIndex.init.foldRight(lit(langs.last): Column) {
      case ((lang, i), fallback) =>
        val beatsRest = langs.drop(i + 1)
          .map(other => col(s"s_$lang") >= col(s"s_$other"))
          .reduceLeft(_ && _)
        when(beatsRest, lang).otherwise(fallback)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** DuckDB SQL for the identical argmax chain over s_<lang> columns. */
  def langIdArgmaxSql: String = {
    val langs = langMarkers.map(_._1)
    val cases = langs.zipWithIndex.init.map { case (lang, i) =>
      val beatsRest = langs.drop(i + 1)
        .map(other => s"s_$lang >= s_$other").mkString(" AND ")
      s"WHEN $beatsRest THEN '$lang'"
    }
    s"CASE ${cases.mkString(" ")} ELSE '${langs.last}' END"
  }

  /** Character-bigram profiles for the n-gram language-ID variant: counts
    * of language-characteristic char bigrams (same deterministic argmax
    * tie-break order as langMarkers). */
  val langNgramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "ng"),
    "es" -> Seq("os", "la", "ci"),
    "fr" -> Seq("le", "qu", "ou"),
    "de" -> Seq("ch", "ei", "sc"),
    "zh" -> Seq("zh", "ng", "sh"))

  /** Language-ID via character n-gram profiles: per language, the total
    * non-overlapping occurrence count of its profile bigrams; deterministic
    * argmax. The streaming-friendly sibling of langId (no tokenization —
    * pure regexp counts, fully codegen'd). */
  def langIdNgram(df: DataFrame, textCol: String): DataFrame = {
    val scored = langNgramProfiles.foldLeft(df) { case (d, (lang, grams)) =>
      d.withColumn(s"n_$lang",
        grams.map(g => regexp_count(col(textCol), lit(g)).cast("long"))
          .reduceLeft(_ + _))
    }
    val langs = langNgramProfiles.map(_._1)
    val pred = langs.zipWithIndex.init.foldRight(lit(langs.last): Column) {
      case ((lang, i), fallback) =>
        val beatsRest = langs.drop(i + 1)
          .map(other => col(s"n_$lang") >= col(s"n_$other"))
          .reduceLeft(_ && _)
        when(beatsRest, lang).otherwise(fallback)
    }
    scored.withColumn("pred_lang_ngram", pred)
  }

  /** DuckDB SQL: per-language profile count + the identical argmax. */
  def langIdNgramSql(textExpr: String): (String, String) = {
    val scores = langNgramProfiles.map { case (lang, grams) =>
      grams.map(g => s"CAST(len(regexp_extract_all($textExpr, '$g')) AS BIGINT)")
        .mkString("(", " + ", s") AS n_$lang")
    }.mkString(", ")
    val langs = langNgramProfiles.map(_._1)
    val cases = langs.zipWithIndex.init.map { case (lang, i) =>
      val beatsRest = langs.drop(i + 1)
        .map(other => s"n_$lang >= n_$other").mkString(" AND ")
      s"WHEN $beatsRest THEN '$lang'"
    }
    (scores, s"CASE ${cases.mkString(" ")} ELSE '${langs.last}' END")
  }

  /** Rolling-hash document fingerprint (winnowing-style): the full-document
    * polynomial hash plus the min/count over bigram-shingle hashes — the
    * k-gram fingerprint set collapsed to its winnowed representative. */
  def fingerprint(df: DataFrame, textCol: String): DataFrame = {
    val grams = TextFunctions.bigrams(TextFunctions.tokens(col(textCol)))
    // gram hashes materialize once; size/min then read the array column
    df.withColumn("_gram_hashes", transform(grams, g => TextFunctions.charHash(g)))
      .withColumn("doc_hash", TextFunctions.charHash(col(textCol)))
      .withColumn("n_kgrams", size(col("_gram_hashes")).cast("long"))
      .withColumn("min_kgram_hash", coalesce(array_min(col("_gram_hashes")), lit(-1L)))
      .drop("_gram_hashes")
  }
}
