package graft

import org.apache.spark.sql.functions._

import graft.operators.LateInteraction

/** MaxSim / MRL rerank / hard-negative mining vs driver-side brute-force
  * models (sf0.001 embeddings, 500 vectors → 125 four-token docs). */
class LateInteractionSpec extends SparkSpec {

  private val TokensPerDoc = 4
  private val K = 5

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
  private lazy val toks = LateInteraction.tokenFrame(emb, TokensPerDoc)

  /** Same strict left-fold cosine as VectorFunctions, in Scala. */
  private def cosScala(a: Seq[Float], b: Seq[Float]): Double = {
    def fold(xs: Seq[Double]) = xs.foldLeft(0.0)(_ + _)
    val dot = fold(a.zip(b).map { case (x, y) => x.toDouble * y.toDouble })
    val na = math.sqrt(fold(a.map(x => x.toDouble * x.toDouble)))
    val nb = math.sqrt(fold(b.map(x => x.toDouble * x.toDouble)))
    dot / (na * nb)
  }

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val vecs: Map[Long, Seq[Float]] =
    emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

  private lazy val labels: Map[Long, Int] =
    emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  /** doc -> tok -> vec, from the same id grouping as tokenFrame. */
  private lazy val docs: Map[Long, Map[Long, Seq[Float]]] =
    vecs.toSeq.groupBy(_._1 / TokensPerDoc).map { case (d, vs) =>
      d -> vs.map { case (id, v) => (id % TokensPerDoc) -> v }.toMap
    }

  /** MaxSim with the plan's exact fold shape: per-query-token max over doc
    * tokens, summed left-to-right over token index. */
  private def maxSimScore(q: Long, c: Long): Double =
    (0L until TokensPerDoc.toLong).map { t =>
      docs(c).values.map(cv => cosScala(docs(q)(t), cv)).max
    }.foldLeft(0.0)(_ + _)

  private def bruteMaxSim(q: Long, k: Int): Seq[(Long, Double)] =
    docs.keys.filter(_ != q).map(c => (c, maxSimScore(q, c))).toSeq
      .sortBy { case (id, sc) => (-sc, id) }.take(k)

  test("maxSim matches the brute-force late-interaction model") {
    val got = LateInteraction.maxSim(toks, toks.filter(col("doc") < 3),
        K, TokensPerDoc)
      .orderBy("qdoc", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      }
    (0L until 3L).foreach { q =>
      val want = bruteMaxSim(q, K).map { case (id, sc) => (id, r6(sc)) }
      assert(got(q) === want, s"query doc $q")
    }
  }

  test("maxSimRerank equals the modeled two-stage pipeline") {
    val tokenTopN = 10
    // stage 1 model: per (qdoc, qtok), top-n candidate TOKENS by
    // (-cos, cdoc, ctok); their docs are the candidates
    def candDocs(q: Long): Set[Long] =
      (0L until TokensPerDoc.toLong).flatMap { t =>
        (for {
          (c, ct) <- docs.toSeq if c != q
          (ck, cv) <- ct.toSeq
        } yield (c, ck, cosScala(docs(q)(t), cv)))
          .sortBy { case (c, ck, sc) => (-sc, c, ck) }
          .take(tokenTopN).map(_._1)
      }.toSet
    val got = LateInteraction.maxSimRerank(toks, toks.filter(col("doc") < 3),
        K, tokenTopN, TokensPerDoc)
      .orderBy("qdoc", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      }
    (0L until 3L).foreach { q =>
      val cands = candDocs(q)
      val want = cands.toSeq.map(c => (c, maxSimScore(q, c)))
        .sortBy { case (id, sc) => (-sc, id) }.take(K)
        .map { case (id, sc) => (id, r6(sc)) }
      assert(got(q) === want, s"query doc $q")
      // every reranked doc came from the candidate stage
      assert(got(q).map(_._1).toSet.subsetOf(cands))
    }
  }

  test("maxSimRerank keeps useful recall against exact maxSim") {
    val got = LateInteraction.maxSimRerank(toks, toks.filter(col("doc") < 3),
        K, tokenTopN = 10, tokensPerDoc = TokensPerDoc)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recalls = (0L until 3L).map { q =>
      val truth = bruteMaxSim(q, K).map(_._1).toSet
      got.getOrElse(q, Set.empty).count(truth).toDouble / K
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean rerank recall $mean")
  }

  test("mrlRerank equals the modeled coarse-then-exact pipeline") {
    val (coarseK, prefix) = (20, 16)
    val q5 = (0L until 5L)
    val got = LateInteraction.mrlRerank(emb, emb.filter(col("vec_id") < 5),
        K, coarseK, prefix)
      .orderBy("qid", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1))
          .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
      }
    q5.foreach { q =>
      val coarse = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cosScala(vecs(q).take(prefix), v.take(prefix))) }
        .sortBy { case (id, c) => (-c, id) }.take(coarseK)
      val want = coarse.map { case (id, cp) => (id, cosScala(vecs(q), vecs(id)), cp) }
        .sortBy { case (id, c, _) => (-c, id) }.take(K)
        .map { case (id, c, cp) => (id, r6(c), r6(cp)) }
      assert(got(q) === want, s"query $q")
    }
  }

  test("hardNegatives mines other-label top-k with the positive-ceiling margin") {
    val got = LateInteraction.hardNegatives(emb, emb.filter(col("vec_id") < 8), K)
      .orderBy("qid", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1))
          .map(r => (r.getLong(2), r.getInt(3), r.getDouble(4), r.getDouble(5))).toSeq
      }
    (0L until 8L).foreach { q =>
      val ql = labels(q)
      val scored = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, labels(id), cosScala(vecs(q), v)) }
      val posBest = scored.filter(_._2 == ql).map(_._3).max
      val want = scored.filter(_._2 != ql)
        .sortBy { case (id, _, c) => (-c, id) }.take(K)
        .map { case (id, l, c) => (id, l, r6(c), r6(posBest - c)) }
      assert(got(q) === want, s"query $q")
      // no negative shares the query's label
      assert(got(q).forall(_._2 != ql))
    }
  }

  test("oversized query batches drop the broadcast plan on every face, " +
      "results identical (r18)") {
    // the ivfProbeIndex oversized-batch template: force the fallback with
    // maxBroadcastRows=1 (every real batch is oversized), assert the
    // gated plan carries NO broadcast hint and returns the broadcast
    // plan's rows bit-for-bit
    def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    def rows(df: org.apache.spark.sql.DataFrame) = {
      val cs = df.columns
      df.orderBy(cs(0), cs(1)).collect().map(_.toSeq).toSeq
    }
    val qt = toks.filter(col("doc") < 3)
    val q5 = emb.filter(col("vec_id") < 5)
    val faces: Seq[(String, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = Seq(
      ("maxSim",
        LateInteraction.maxSim(toks, qt, K, TokensPerDoc),
        LateInteraction.maxSim(toks, qt, K, TokensPerDoc, maxBroadcastRows = 1)),
      ("maxSimRerank",
        LateInteraction.maxSimRerank(toks, qt, K, 10, TokensPerDoc),
        LateInteraction.maxSimRerank(toks, qt, K, 10, TokensPerDoc,
          maxBroadcastRows = 1)),
      ("mrlRerank",
        LateInteraction.mrlRerank(emb, q5, K, 20, 16),
        LateInteraction.mrlRerank(emb, q5, K, 20, 16, maxBroadcastRows = 1)),
      ("hardNegatives",
        LateInteraction.hardNegatives(emb, q5, K),
        LateInteraction.hardNegatives(emb, q5, K, maxBroadcastRows = 1)))
    faces.foreach { case (name, small, large) =>
      assert(hinted(small), s"$name: small batches keep the broadcast plan")
      assert(!hinted(large),
        s"$name: an oversized batch must not carry a broadcast hint")
      assert(rows(large) === rows(small),
        s"$name: the block-join plan must return the broadcast plan's rows")
    }
  }
}
