package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextOps

/** Brute-force Scala oracles for the text operators (sf0.001). */
class TextOpsSpec extends SparkSpec {

  test("invertedIndex: exact doc_freq, postings = k smallest doc ids sorted") {
    val k = 5
    val got = TextOps.invertedIndex(docs, "doc_id", "text", maxPostings = k)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // brute-force model from the raw table
    val model = docs.select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).distinct.map(_ -> r.getLong(0)))
      .groupBy(_._1)
      .map { case (term, pairs) =>
        val ids = pairs.map(_._2).distinct.sorted
        term -> (ids.length.toLong, ids.take(k).mkString(","))
      }
    assert(got === model)
  }

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

  test("decontaminate matches brute-force n-gram overlap and broadcasts the benchmark") {
    val all = docs.limit(200)
    val bench = all.filter(col("doc_id") % 10 === 0)
    val corpus = all.filter(col("doc_id") % 10 =!= 0)
    val got = TextOps.decontaminate(corpus, bench, "doc_id", "text", n = 3)
    // brute force over gram STRINGS
    def grams(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val benchGrams = bench.select("text").collect()
      .flatMap(r => grams(r.getString(0))).toSet
    val expect = corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> (grams(r.getString(1)) & benchGrams).size)
      .filter(_._2 > 0).toMap
    val gotMap = got.collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(gotMap === expect)
    assert(gotMap.nonEmpty, "fixture slice should contain contamination")
    // the benchmark side must broadcast (map-side probe, no corpus shuffle)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
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

  test("repetitionRatio matches brute-force duplicate fractions") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a b"),        // 3 tokens 2 distinct; grams {a a, a b} all distinct
      (2L, "x x x x"),      // 4/1; grams {x x}*3 -> 3 grams 1 distinct
      (3L, "solo"),         // 1 token, 0 grams -> gram ratio 0.0
      (4L, "p q r")).toDF("doc_id", "text")
    val got = TextOps.repetitionRatio(df, "text")
      .select("doc_id", "n_tokens", "n_distinct_tokens", "dup_token_ratio",
        "n_grams", "n_distinct_grams", "dup_gram_ratio")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .toMap
    assert(got(1L) === ((3L, 2L, 0.333333, 2L, 2L, 0.0)))
    assert(got(2L) === ((4L, 1L, 0.75, 3L, 1L, 0.666667)))
    assert(got(3L) === ((1L, 1L, 0.0, 0L, 0L, 0.0)))
    assert(got(4L) === ((3L, 3L, 0.0, 2L, 2L, 0.0)))
  }

  test("tfidfTopTerms matches brute-force tf-idf on a small corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "cat cat dog"), (2L, "dog bird"), (3L, "cat fish fish fish"))
    val df = corpus.toDF("doc_id", "text")
    val n = corpus.size
    val tf = corpus.flatMap { case (id, t) =>
      t.split(" ").groupBy(identity).map { case (w, g) => (id, w, g.length.toLong) }
    }
    val dfreq = tf.groupBy(_._2).map { case (w, g) => w -> g.map(_._1).distinct.size.toLong }
    val scored = tf.map { case (id, w, f) =>
      val idf = math.log((n + 1).toDouble / (dfreq(w) + 1))
      (id, w, f, dfreq(w), BigDecimal(f * idf).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val expect = scored.groupBy(_._1).flatMap { case (id, g) =>
      g.sortBy(x => (-x._5, x._2)).take(3).zipWithIndex
        .map { case ((_, w, f, dfq, s), i) => (id, i + 1, w, f, dfq, s) }
    }.toSet
    val got = TextOps.tfidfTopTerms(df, "doc_id", "text", k = 3)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSet
    assert(got === expect)
  }

  test("packSequences conserves docs/tokens and respects the budget rule") {
    val budget = 256
    val packed = TextOps.packSequences(docs, "doc_id", "text", budget, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalDocs = docs.count()
    val totalToks = docs
      .agg(sum(size(TextFunctions.tokens(col("text"))).cast("long"))).head.getLong(0)
    assert(packed.map(_._3).sum === totalDocs)
    assert(packed.map(_._4).sum === totalToks)
    // deterministic: a second run packs identically
    val again = TextOps.packSequences(docs, "doc_id", "text", budget, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.toSet === again.toSet)
    // every sequence except a bucket's LAST ends at-or-past the boundary
    // (first-fit never closes a sequence early)
    packed.groupBy(_._1).foreach { case (_, seqs) =>
      val byId = seqs.sortBy(_._2)
      var cum = 0L
      byId.init.zip(byId.tail).foreach { case ((_, sid, _, ntok), _) =>
        cum += ntok
        assert(cum >= (sid + 1) * budget,
          s"sequence $sid closed below budget: cum=$cum")
      }
    }
  }

  test("stratified sampling keeps exactly the hash-selected rows per stratum") {
    val pct = Map("en" -> 20, "de" -> 50, "fr" -> 80)
    val got = operators.Sampling.stratified(docs, "doc_id", "lang", pct, 100)
      .select("doc_id", "lang", "sample_bucket")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expect = docs.select("doc_id", "lang").collect().flatMap { r =>
      val (id, lang) = (r.getLong(0), r.getString(1))
      val bucket = hashScala(id.toString) % 100
      if (bucket < pct.getOrElse(lang, 100)) Some((id, lang, bucket)) else None
    }.toSet
    assert(got === expect)
    assert(got.nonEmpty && got.size < docs.count())
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

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25TopDocs matches brute-force BM25 over the real corpus") {
    val terms = Seq("join", "vector", "zzz_absent")
    val k = 5
    val (k1, b) = (1.2, 0.75)
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val n = rows.length.toLong
    val avgdl = rows.map(_._2.length.toLong).sum.toDouble / n
    val expect = terms.flatMap { term =>
      val hits = rows.flatMap { case (id, toks) =>
        val tf = toks.count(_ == term).toLong
        if (tf > 0) Some((id, tf, toks.length.toLong)) else None
      }
      val dfq = hits.length.toLong
      val idf = math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
      hits.map { case (id, tf, len) =>
        val score = round6(
          idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * len / avgdl)))
        (term, id, tf, len, dfq, score)
      }.sortBy(x => (-x._6, x._2)).take(k).zipWithIndex
        .map { case ((t, id, tf, len, dfq, s), i) => (t, i + 1, id, tf, len, dfq, s) }
    }.toSet
    val got = TextOps.bm25TopDocs(docs, "doc_id", "text", terms, k, k1, b)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .toSet
    assert(expect.nonEmpty && got === expect)
  }

  test("blockDedup: first occurrence wins, reassembly preserves block order") {
    import spark.implicits._
    // doc 1: unique; doc 2 repeats doc 1's first block then adds its own;
    // doc 3 is doc 2 verbatim (loses everything); block size 2 tokens
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "a b x y")).toDF("doc_id", "text")
    val got = TextOps.blockDedup(df, "doc_id", "text", blockTokens = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got === Set(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "x y"),
      (3L, 2L, 0L, "")))
  }

  test("blockDedup conserves distinct blocks over the real corpus") {
    val out = TextOps.blockDedup(docs, "doc_id", "text", blockTokens = 32).collect()
    assert(out.length === docs.count())
    // every distinct block text survives exactly once
    val distinctBlocks = docs.select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).grouped(32).map(_.mkString(" ")))
      .distinct.length.toLong
    assert(out.map(_.getLong(2)).sum === distinctBlocks)
  }

  test("unigramNll matches the ordered-fold Scala model over the real corpus") {
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val vocab = rows.flatMap(_._2).groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val total = vocab.values.sum
    val expect = rows.map { case (id, toks) =>
      val tf = toks.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
      // the SAME fold the engines run: terms in ascending order, one
      // left-to-right double accumulation
      val nll = tf.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (t, f)) =>
        acc + -math.log(vocab(t).toDouble / total) * f
      }
      val nTok = toks.length.toLong
      (id, nTok, round6(nll / nTok))
    }.toSet
    val got = TextOps.unigramNll(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expect)
  }

  test("bigramNll matches the interpolated ordered-fold Scala model") {
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val allPairs = rows.flatMap { case (_, t) => t.zip(t.tail) }
    val cab = allPairs.groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    val hist = cab.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val uni = rows.flatMap(_._2).groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val total = uni.values.sum
    val expect = rows.filter(_._2.length >= 2).map { case (id, toks) =>
      val tf = toks.zip(toks.tail).groupBy(identity)
        .map { case (p, g) => p -> g.length.toLong }
      val nll = tf.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, ((a, b), f)) =>
        val p = 0.75 * (cab((a, b)).toDouble / hist(a).toDouble) +
          0.25 * (uni(b).toDouble / total.toDouble)
        acc + -math.log(p) * f
      }
      val nBi = (toks.length - 1).toLong
      (id, nBi, round6(nll / nBi))
    }.toSet
    val got = TextOps.bigramNll(docs, "doc_id", "text", lambda = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expect)
  }

  /** Driver winnowing model — same hash, window-min, rightmost ties. */
  private def winnowModel(ds: Seq[(Long, String)], w: Int,
                          minShared: Int, maxDf: Int): Map[(Long, Long), Long] = {
    val P = 1000000007L
    def chash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31L + c.toLong) % P)
    val fps = ds.map { case (id, text) =>
      val t = text.split(" ", -1)
      val hs = t.zip(t.tail).map { case (a, b) => chash(s"$a $b") }
      val sel = (0 to hs.length - w).map { i =>
        val win = hs.slice(i, i + w).zipWithIndex
        win.minBy { case (h, j) => (h, -(i + j)) }._1
      }
      id -> sel.toSet
    }.toMap
    val df = fps.values.flatten.groupBy(identity).map { case (h, o) => h -> o.size }
    val kept = fps.map { case (id, s) => id -> s.filter(df(_) <= maxDf) }
    (for {
      (a, sa) <- kept.toSeq; (b, sb) <- kept.toSeq if a < b
      n = (sa intersect sb).size.toLong if n >= minShared
    } yield (a, b) -> n).toMap
  }

  test("winnowPairs: MOSS guarantee, model parity, df cap (r15)") {
    import spark.implicits._
    // docs 1/2 share an 8-token run (7 bigrams > w+1=5 -> MUST pair);
    // doc 3 is disjoint; docs 4/5 share only the universal token pair
    val fix = Seq(
      (1L, "zq xw vv uu tt ss rr qq aa bb"),
      (2L, "mm nn zq xw vv uu tt ss rr qq"),
      (3L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k0"),
      (4L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 pa"),
      (5L, "p1 p2 y3 y4 y5 y6 y7 y8 y9 ya"))
    val got = TextOps.winnowPairs(fix.toDF("doc_id", "text"), "doc_id", "text",
        w = 4, minShared = 2, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === winnowModel(fix, w = 4, minShared = 2, maxDf = 64))
    assert(got.contains((1L, 2L)), "the shared >= w+1-shingle run must collide")
    assert(!got.keys.exists { case (a, b) => a == 3L || b == 3L })
    // a fingerprint shared by every doc is boilerplate: maxDf drops it
    val boiler = (1L to 10L).map(i => (i, s"common pair w$i x$i y$i z$i a$i b$i"))
    val capped = TextOps.winnowPairs(boiler.toDF("doc_id", "text"),
        "doc_id", "text", w = 4, minShared = 1, maxDf = 5)
      .collect()
    assert(capped.isEmpty, "df-capped universal fingerprint must not pair")
    // real corpus: operator equals the driver model end to end
    val corpus = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val gotC = TextOps.winnowPairs(docs, "doc_id", "text",
        w = 4, minShared = 2, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotC === winnowModel(corpus, w = 4, minShared = 2, maxDf = 64))
  }

  test("kneserNeyNll matches the discount+continuation Scala model (r15)") {
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val allPairs = rows.flatMap { case (_, t) => t.zip(t.tail) }
    val cab = allPairs.groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    val hist = cab.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    // following-type count per history, continuation-type count per word,
    // global bigram-type total — the KN statistics
    val n1f = cab.groupBy(_._1._1).map { case (a, m) => a -> m.size.toLong }
    val n1b = cab.groupBy(_._1._2).map { case (b, m) => b -> m.size.toLong }
    val tTypes = cab.size.toLong
    val expect = rows.filter(_._2.length >= 2).map { case (id, toks) =>
      val tf = toks.zip(toks.tail).groupBy(identity)
        .map { case (p, g) => p -> g.length.toLong }
      val nll = tf.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, ((a, b), f)) =>
        val p = (math.max(cab((a, b)).toDouble - 0.75, 0.0) / hist(a).toDouble) +
          ((0.75 * n1f(a).toDouble / hist(a).toDouble) *
            (n1b(b).toDouble / tTypes.toDouble))
        acc + -math.log(p) * f
      }
      val nBi = (toks.length - 1).toLong
      (id, nBi, round6(nll / nBi))
    }.toSet
    val got = TextOps.kneserNeyNll(docs, "doc_id", "text", discount = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expect)
  }

  test("kneserNeyNll: continuation backoff penalizes single-history tokens (r15)") {
    import spark.implicits._
    // "york" appears 4 times but ALWAYS after "new" (one continuation
    // type); "cat" appears 4 times after 4 different histories. In the
    // probe doc both are scored after the unseen-pairing history "the":
    // raw-frequency interpolation can't tell them apart, KN must prefer
    // the many-history token.
    val train = Seq(
      (1L, "new york new york"),
      (2L, "new york big apple"),
      (3L, "a cat b cat"),
      (4L, "c cat d cat"),
      (5L, "the york the cat"))
      .toDF("doc_id", "text")
    val out = TextOps.kneserNeyNll(train, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // per-bigram check via the model pieces: P("york"|"the") uses
    // n1b(york)=2 histories vs P("cat"|"the") n1b(cat)=5 — the doc-level
    // assertion needs the pair-level property, so recompute directly
    val pairs = Seq("new york new york", "new york big apple",
      "a cat b cat", "c cat d cat", "the york the cat")
      .flatMap { t => val ts = t.split(" "); ts.zip(ts.tail) }
    val cab = pairs.groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    val n1b = cab.groupBy(_._1._2).map { case (b, m) => b -> m.size.toLong }
    assert(n1b("cat") > n1b("york"),
      "fixture must give cat more continuation types")
    assert(out.contains(5L))
  }

  test("charEntropy: closed-form cases and the [0, log2(37)] band") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaaa"),          // one symbol -> 0 bits
      (2L, "ab"),            // two equiprobable -> 1 bit
      (3L, "!!!"),           // normalizes to empty -> 0 by convention
      (4L, "abcd abcd")).toDF("doc_id", "text")
    val got = TextOps.charEntropy(df, "text")
      .select("doc_id", "n_chars", "entropy_bits")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) === ((4L, 0.0)))
    assert(got(2L) === ((2L, 1.0)))
    assert(got(3L) === ((0L, 0.0)))
    // "abcd abcd": 9 chars, counts {a,b,c,d:2, space:1}
    val e4 = {
      val terms = Seq(2, 2, 2, 2, 1).map { c =>
        val p = c.toDouble / 9; -(p * math.log(p))
      }
      round6(terms.sum / math.log(2.0))
    }
    assert(got(4L)._2 === e4)
    val corpus = TextOps.charEntropy(docs, "text")
      .select("entropy_bits").collect().map(_.getDouble(0))
    val bound = math.log(37.0) / math.log(2.0)
    assert(corpus.forall(e => e >= 0.0 && e <= bound))
  }

  test("featureHash matches the Scala bucket model") {
    val P = 1000000007L
    def ch(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
    val got = TextOps.featureHash(docs, "doc_id", "text", nBuckets = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    docs.select("doc_id", "text").collect().take(50).foreach { r =>
      val exp = Array.fill(16)(0L)
      r.getString(1).split(" ").foreach(t => exp((ch(t) % 16).toInt) += 1)
      assert(got(r.getLong(0)) === exp.toSeq, s"doc ${r.getLong(0)}")
      assert(got(r.getLong(0)).sum === r.getString(1).split(" ").length.toLong)
    }
  }

  test("zipfFit == ordered-fold least-squares Scala model; slope negative, r2 in (0,1]") {
    val topV = 200
    val counts = docs.select("text").collect()
      .flatMap(_.getString(0).split(" "))
      .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }.toSeq
    val top = counts.sortBy { case (t, c) => (-c, t) }.take(topV)
    val xy = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble))
    }
    // the exact ordered folds the engines run
    def foldSum(f: ((Double, Double)) => Double) = xy.map(f).foldLeft(0.0)(_ + _)
    val n = xy.size.toDouble
    val (sx, sy) = (foldSum(_._1), foldSum(_._2))
    val sxy = foldSum { case (x, y) => x * y }
    val sxx = foldSum { case (x, _) => x * x }
    val syy = foldSum { case (_, y) => y * y }
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    val slope = num / den
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextOps.zipfFit(docs, "text", topV).head
    assert(got.getLong(0) === xy.size.toLong)
    assert(got.getDouble(1) === r6(slope))
    assert(got.getDouble(2) === r6((sy - slope * sx) / n))
    assert(got.getDouble(3) === r6((num * num) / (den * deny)))
    assert(got.getDouble(1) < 0.0, "rank-frequency slope must be negative")
    assert(got.getDouble(3) > 0.0 && got.getDouble(3) <= 1.0)
  }

  test("weightedSample == Efraimidis-Spirakis Scala model; heavy docs overrepresented") {
    val P = 1000000007L
    def ch(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
    val rows = docs.select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val model = rows.filter(_._3 > 0).map { case (id, lang, w) =>
      val u = (ch(s"ws:$id").toDouble + 1.0) / (P + 1).toDouble
      (lang, id, w, -math.log(u) / w.toDouble)
    }.groupBy(_._1).flatMap { case (lang, grp) =>
      grp.sortBy { case (_, id, _, key) => (key, id) }.take(10)
        .zipWithIndex.map { case ((_, id, w, key), i) => (lang, i + 1, id, w, key) }
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = graft.operators.Sampling
      .weightedSample(docs, "doc_id", "lang", "n_chars", k = 10)
      .select("lang", "rn", "doc_id", "n_chars", "es_key")
      .orderBy("lang", "rn").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.length === model.length)
    got.zip(model).foreach { case ((gl, gr, gi, gw, gk), (ml, mr, mi, mw, mk)) =>
      assert((gl, gr, gi, gw) === ((ml, mr, mi, mw)))
      assert(math.abs(gk - mk) < 1e-12)
    }
    // inclusion probability ∝ weight: the sampled mean char mass must
    // exceed the corpus mean (deterministic corpus — stable assert)
    val sampledMean = got.map(_._4).sum.toDouble / got.length
    val corpusMean = rows.map(_._3).sum.toDouble / rows.length
    assert(sampledMean > corpusMean,
      s"weighted sample should favor heavy docs: $sampledMean <= $corpusMean")
  }

  test("adjacentPairsExpr is safe for empty and single-token docs (guard inside the expr)") {
    import spark.implicits._
    // Spark's sequence(1, size - 1) is DESCENDING [1, 0] at size = 1 and
    // element_at(_t, 0) throws — the guard must live IN the expression,
    // not in callers' pre-filters
    val df = Seq(Seq.empty[String], Seq("one"), Seq("two", "tokens"),
        Seq("now", "three", "tokens")).toDF("_t")
      .select(org.apache.spark.sql.functions.col("_t"),
        org.apache.spark.sql.functions.expr(
          graft.functions.TextFunctions.adjacentPairsExpr).as("pairs"))
    val got = df.collect()
      .map(r => r.getSeq[String](0).size -> r.getSeq[org.apache.spark.sql.Row](1).map(
        p => (p.getString(0), p.getString(1))))
      .toMap
    assert(got(0) === Seq())
    assert(got(1) === Seq())
    assert(got(2) === Seq(("two", "tokens")))
    assert(got(3) === Seq(("now", "three"), ("three", "tokens")))
  }

  test("collocations ranks by exact lift with deterministic tie-breaks") {
    import spark.implicits._
    val texts = Seq((0L, "a b a b c d"), (1L, "a b x y"), (2L, "b c a b z"))
    val got = TextOps.collocations(texts.toDF("doc_id", "text"),
        "doc_id", "text", minCount = 2, k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val toks = texts.map(_._2.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val n = uni.values.sum.toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = toks.flatMap(t => t.zip(t.tail))
      .groupBy(identity).map { case (bg, g) => bg -> g.size.toLong }
      .filter(_._2 >= 2).toSeq
      .map { case ((a, b), cab) =>
        (a, b, cab, uni(a), uni(b), r6(cab.toDouble * n / (uni(a).toDouble * uni(b).toDouble)))
      }
      .sortBy { case (a, b, _, _, _, l) => (-l, a, b) }
      .take(5)
    assert(got.toSeq === exp)
  }

  test("urlCanonicalize: closed-form variant collapse") {
    import spark.implicits._
    val cases = Seq(
      "HTTPS://WWW.Src0.Example.com/Page/5?utm_source=feed#sec"
        -> "src0.example.com/page/5",
      "http://src0.example.com/Page/5" -> "src0.example.com/page/5",
      "https://x.com/p?utm_a=1&utm_b=2" -> "x.com/p",
      "https://x.com/p?utm_m=1&page=2&utm_c=x" -> "x.com/p?page=2",
      "https://x.com/p?page=2&utm_campaign=x#frag" -> "x.com/p?page=2",
      "http://example.com/a/" -> "example.com/a",
      "example.com/plain" -> "example.com/plain",
      // utm BETWEEN two real params must not leave a '&&' behind
      "https://a.com/p?x=1&utm_source=s&y=2" -> "a.com/p?x=1&y=2",
      // a param NAME merely containing "utm_" is not a tracking param
      "https://a.com/p?xutm_foo=1&y=2" -> "a.com/p?xutm_foo=1&y=2",
      // several adjacent utm params collapse without separator debris
      "https://a.com/p?a=1&utm_x=1&utm_y=2&b=2" -> "a.com/p?a=1&b=2")
    val got = TextOps.urlCanonicalize(
      cases.map(_._1).toDF("url"), "url")
      .select("canonical_url").collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
    // the three scheme/tracking variants of one page collapse to one key
    assert(got.take(2).distinct.length === 1)
  }

  test("hashSplit == tagged-hash band Scala model; all bands populated") {
    val splits = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val got = graft.operators.Sampling.hashSplit(docs, "doc_id", splits)
      .select("doc_id", "split_bucket", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val model = got.map { case (id, _, _) =>
      val b = hashScala(s"sp:$id") % 100
      val name = if (b < 90) "train" else if (b < 95) "val" else "test"
      (id, b, name)
    }
    assert(got.toSeq === model.toSeq)
    assert(got.map(_._3).distinct.sorted.toSeq === Seq("test", "train", "val"),
      "500-doc corpus should populate every band")
    // bands partition: every row appears exactly once
    assert(got.length === docs.count())
  }

  test("boilerplate == distinct-shingle doc-frequency Scala model") {
    val (n, k) = (5, 20)
    val perDoc = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSet)
    val model = perDoc.flatMap(_._2.toSeq)
      .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
      .filter(_._2 >= 2L)
      .toSeq.sortBy { case (g, c) => (-c, g) }.take(k)
    val got = TextOps.boilerplate(docs, "doc_id", "text", n, k).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === model)
    assert(got.nonEmpty, "test corpus should contain shared shingles")
  }

  test("shardPlan == single-fold exclusive-prefix model; shards contiguous and budget-bounded") {
    val budget = 50000L
    val rows = docs.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    val model = rows.map { case (id, wt) =>
      val s = cum / budget; cum += wt; (id, wt, s)
    }
    val got = TextOps.shardPlan(docs, "doc_id", "n_chars", budget)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === model.toSeq)
    // shard ids are contiguous non-decreasing and more than one shard exists
    assert(got.map(_._3).sliding(2).forall(p => p.length < 2 || p(1) >= p(0)))
    assert(got.map(_._3).distinct.length > 1)
  }

  test("bpeMerges == weighted char-pair Scala model") {
    val k = 20
    val words = docs.select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
      .filter(_._1.length >= 2)
    val model = words.toSeq
      .flatMap { case (w, c) => w.sliding(2).map(_ -> c) }
      .groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(k)
    val got = TextOps.bpeMerges(docs, "text", k).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === model)
  }

  test("klDrift == smoothed top-V + tail-bucket Scala model; KL >= 0") {
    val (topV, alpha) = (50, 0.5)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = docs.select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toSeq
    val allToks = rows.flatMap { case (s, t) => t.split(" ", -1).map(s -> _) }
    val cnt = allToks.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    val top = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(topV)
    val vn = top.size
    val topc = top.map(_._2).sum
    val bign = cnt.values.sum
    val gCnt = allToks.groupBy(identity).map { case ((s, t), g) => (s, t) -> g.size.toLong }
    val gTot = allToks.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val model = gTot.toSeq.sortBy(_._1).map { case (src, n) =>
      val cells = top.map { case (t, c) => (gCnt.getOrElse((src, t), 0L), c) }
      val gtopc = cells.map(_._1).sum
      val all = cells :+ ((n - gtopc, bign - topc))
      val vp1 = (vn + 1).toDouble
      // ordered fold by rank — the exact engine reduction
      val kl = all.foldLeft(0.0) { case (acc, (gc, c)) =>
        val p = (gc.toDouble + alpha) / (n.toDouble + alpha * vp1)
        val q = (c.toDouble + alpha) / (bign.toDouble + alpha * vp1)
        acc + p * math.log(p / q)
      }
      (src, n, r6(kl))
    }
    val got = TextOps.klDrift(docs, "source", "text", topV, alpha)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === model)
    assert(got.forall(_._3 >= 0.0), "smoothed KL must be non-negative")
  }

  test("substrDupFraction == brute-force shared-shingle Scala model") {
    val n = 5
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val perDoc = raw.map { case (id, t) =>
      id -> t.split(" ", -1).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSet
    }
    val docsWith = perDoc.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, ps) => g -> ps.map(_._2).distinct.size }
    val model = perDoc.map { case (id, gs) =>
      val nd = gs.count(g => docsWith(g) >= 2).toLong
      (id, gs.size.toLong, nd,
        r6(nd.toDouble / math.max(gs.size.toLong, 1L)))
    }.sortBy(_._1)
    val got = TextOps.substrDupFraction(docs, "doc_id", "text", n)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === model)
    assert(model.exists(_._3 > 0L),
      "test corpus should contain at least one cross-doc duplicated shingle")
  }

  test("bpeTrain == Scala BPE-loop model on real words; merges chain across rounds") {
    // exact model of the recurrence: greedy left-to-right non-overlapping
    // merge of the argmax pair, recount, repeat
    def mergeList(syms: List[String], a: String, b: String): List[String] =
      syms match {
        case x :: y :: rest if x == a && y == b => (a + b) :: mergeList(rest, a, b)
        case x :: rest => x :: mergeList(rest, a, b)
        case Nil => Nil
      }
    def model(words: Map[List[String], Long], iters: Int): Seq[(Long, String, String, Long)] = {
      var vocab = words
      (1 to iters).map { it =>
        val counts = vocab.toSeq.flatMap { case (syms, wc) =>
          syms.zip(syms.tail).map(p => p -> wc)
        }.groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sum }
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        vocab = vocab.groupBy { case (syms, _) => mergeList(syms, a, b) }
          .map { case (k, v) => k -> v.values.sum }
        (it.toLong, a, b, n)
      }
    }
    val words = docs.select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (w, o) => w.toList.map(_.toString) -> o.size.toLong }
    val expect = model(words, 3)
    val got = TextOps.bpeTrain(docs, "text", iters = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === expect)
    // the learned table must actually chain: a later round's pair uses a
    // merged symbol, or at minimum rounds differ
    assert(expect.map(e => (e._2, e._3)).distinct.size === 3)
  }

  test("bpeTrain sentinels block cross-symbol merges and allow back-to-back sites") {
    import spark.implicits._
    // corpus: "abab" x3 -> round 1 merges (a,b) twice per word;
    // "cab" x2 must NOT merge its (ca-boundary) 'a','b' after round 1
    // created symbol "ab" — wait: 'c','a','b' DOES contain pair (a,b);
    // the boundary case guarded here is pattern "a b" not matching
    // inside "ca  b" once 'c a' merged into 'ca'. Build that directly:
    val df = (Seq.fill(3)("abab") ++ Seq.fill(2)("cab")).toDF("text")
    val got = TextOps.bpeTrain(df, "text", iters = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (a,b) occurs 2x3 (abab) + 1x2 (cab) = 8 — argmax
    assert(got(0) === ((1L, "a", "b", 8L)))
    // round 2 vocabulary: "abab" -> [ab, ab] x3, "cab" -> [c, ab] x2:
    // pairs (ab,ab)=3, (c,ab)=2 -> argmax (ab,ab); the 'c  ab' boundary
    // must not have produced any phantom (a,b) or (ca,b) pair
    assert(got(1) === ((2L, "ab", "ab", 3L)))
  }

  test("bpeEncode prices docs with chained merges; train->encode consistent (r8)") {
    import spark.implicits._
    // hand corpus: "the" = t h e -> (t,h) -> th e -> (th,e) -> the: ONE
    // token after the chained merges; "tin" = t i n -> (i,n) merges ->
    // t in: TWO tokens; "zq" matches nothing: 2 tokens
    val df = Seq((1L, "the the tin"), (2L, "zq the")).toDF("doc_id", "text")
    val got = TextOps.bpeEncode(df, "doc_id", "text", TextOps.demoMerges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((3L, 1L + 1L + 2L)), // the(1) + the(1) + tin(2)
      2L -> ((2L, 2L + 1L))))     // zq(2) + the(1)
    // encode with bpeTrain's LEARNED table: per-doc token count equals
    // the driver model applying the same greedy merge chain
    def mergeList(syms: List[String], a: String, b: String): List[String] =
      syms match {
        case x :: y :: rest if x == a && y == b => (a + b) :: mergeList(rest, a, b)
        case x :: rest => x :: mergeList(rest, a, b)
        case Nil => Nil
      }
    val learned = TextOps.bpeTrain(docs, "text", iters = 3)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val gotReal = TextOps.bpeEncode(docs, "doc_id", "text", learned)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val model = docs.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).split(" ", -1)
      r.getLong(0) -> toks.map { w =>
        learned.foldLeft(w.toList.map(_.toString)) {
          case (syms, (a, b)) => mergeList(syms, a, b)
        }.length.toLong
      }.sum
    }.toMap
    assert(gotReal === model)
  }

  test("sourceOverlap: zero-overlap pairs reinstated, null sources excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c", "s1"), (2L, "b c d", "s2"),
      (3L, "x y", "s3"), // disjoint from s1/s2: inter 0 must still appear
      (4L, "q r", null.asInstanceOf[String])) // null source: excluded
      .toDF("doc_id", "text", "source")
    val got = TextOps.sourceOverlap(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map(
      ("s1", "s2") -> ((3L, 3L, 2L, 4L)),
      ("s1", "s3") -> ((3L, 2L, 0L, 5L)),
      ("s2", "s3") -> ((3L, 2L, 0L, 5L))))
  }

  test("sourceOverlap bitmask histogram == brute-force pairwise model on real documents") {
    val rows = docs.select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val member = rows.groupBy(_._1).map { case (s, ts) =>
      s -> ts.flatMap(_._2.split(" ", -1)).toSet
    }
    val srcs = member.keys.toSeq.sorted
    val expect = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      (a, b) = (srcs(i), srcs(j))
      inter = (member(a) intersect member(b)).size.toLong
    } yield (a, b) ->
      ((member(a).size.toLong, member(b).size.toLong, inter,
        member(a).size + member(b).size - inter))).toMap
    val got = TextOps.sourceOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === expect)
  }
}
