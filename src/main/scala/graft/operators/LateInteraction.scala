package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Second-stage retrieval operators over the embeddings table (SURVEY §2.3):
  *
  *  - MaxSim (late-interaction / ColBERT-style) scoring of multi-vector
  *    documents: score(q, d) = Σ over query tokens of max over doc tokens
  *    of cosine. The exact form scores every (query token, doc token) pair
  *    once; the rerank form generates candidate docs from per-TOKEN top-n
  *    retrieval (the actual ColBERT serving shape) and pays full MaxSim
  *    only for survivors.
  *  - Matryoshka (MRL) rerank: coarse top-N on a PREFIX of the embedding
  *    dims (prefix-trained embeddings keep most of the signal in the low
  *    dims), exact full-dim rerank of the N survivors — a 4× bandwidth/
  *    FLOP cut on the scan stage for free when embeddings are MRL-trained.
  *  - Contrastive hard-negative mining: per query, the top-k most similar
  *    vectors with a DIFFERENT label, plus the margin against the hardest
  *    same-label positive — the pair-mining pass behind every contrastive
  *    embedding fine-tune.
  *
  * Determinism contract (shared with Similarity): cosines fold in strict
  * left-to-right order via the native DotFold kernel, per-group maxima and
  * the fixed left-associated Σ over per-token maxima are order-insensitive
  * over exact doubles, and every ranking tie-breaks on the id — so all
  * outputs hash-match the DuckDB oracles bit-for-bit.
  *
  * Scale shape: query batches ride a COUNT-GATED broadcast
  * ([[LateInteraction.MaxQueryBroadcastRows]]; past the budget every face
  * switches to the block-replicated equi-join — see
  * [[LateInteraction.allPairs]]); candidates are
  * scanned once, narrowly; reductions run through TopK.perGroupTopK (salted
  * two-stage — no single-task windows). The brute-force coarse stages here
  * are the audit forms; at 100 TB the coarse candidates come from the
  * persisted IVF index (Similarity.ivfTopK / writeIvfIndex) instead, and
  * everything downstream of the candidate frame is unchanged.
  */
object LateInteraction {

  /** Row budget under which a face's query frame rides a broadcast.
    * Every exact face here is all-pairs BY SEMANTICS (the audit forms of
    * the two-stage retrievers), and r17-and-earlier expressed that as
    * `candidates.crossJoin(broadcast(queries))` unconditionally — the
    * maxSim-family twin of the PQ faces' unguarded driver collect: a
    * corpus-sized query frame dies building the broadcast relation
    * before the first task runs. 64k query rows ≈ a few hundred MB of
    * float vectors at any dims this engine serves — comfortably inside
    * an executor; past it [[allPairs]] switches to the block-replicated
    * equi-join, which expresses the identical pair frame with bounded
    * per-task memory and no broadcast at all. */
  val MaxQueryBroadcastRows: Long = 1L << 16

  /** All-pairs (candidate × query) frame with a bounded-memory plan.
    * Under `maxRows` query rows: one candidate scan against a broadcast
    * query relation (zero shuffle — the small-batch serving plan).
    * Above: queries hash into ⌈nQ/maxRows⌉ blocks on `qBlockKey`,
    * candidates replicate once per block (a narrow explode, no driver
    * round-trip), and the pair frame materializes through an ordinary
    * shuffle hash join whose build side is one query block — ≤ maxRows
    * rows by construction. Same rows out either way (the join strategy
    * never touches values); the replication factor IS the all-pairs
    * cost, just paid through the shuffle instead of executor-resident
    * copies of the whole query set. Same count-gate stance as
    * ivfProbeIndex / pqAdcTopK (r17/r18). */
  private def allPairs(c: DataFrame, q: DataFrame, qBlockKey: Column,
                       nQ: Long, maxRows: Long): DataFrame =
    if (nQ <= maxRows) c.crossJoin(broadcast(q))
    else {
      val nBlocks = math.max(2L, (nQ + maxRows - 1) / maxRows).toInt
      val qb = q.withColumn("_qblock", pmod(hash(qBlockKey), lit(nBlocks)))
      c.withColumn("_qblock",
          explode(sequence(lit(0), lit(nBlocks - 1))))
        .join(qb, Seq("_qblock"))
        .drop("_qblock")
    }

  /** Broadcast hint for the KEYED query-side joins of the same faces,
    * under the same budget: an equi-join degrades gracefully to a
    * shuffle join when unhinted, so over budget the hint just drops. */
  private def qHint(nQ: Long, maxRows: Long): DataFrame => DataFrame =
    if (nQ <= maxRows) broadcast else identity

  /** (doc, tok, vec) token frame from a single-vector frame: consecutive
    * groups of `tokensPerDoc` ids form one multi-vector document — the
    * deterministic stand-in for a real per-token encoder output. */
  def tokenFrame(emb: DataFrame, tokensPerDoc: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.select(
      (col(idCol) / tokensPerDoc).cast("long").as("doc"),
      (col(idCol) % tokensPerDoc).as("tok"),
      col(vecCol).as("vec"))

  /** Per-(qdoc, cdoc) MaxSim from a (qdoc, cdoc, qtok, tcos) token-cosine
    * frame: one map-side-combined aggregation computing all per-token
    * maxima, summed in a FIXED left-associated tree (never an unordered
    * float sum), then salted top-k per query doc. */
  private def scoreAndRank(tokCos: DataFrame, k: Int, tokensPerDoc: Int): DataFrame = {
    val perTok: Seq[Column] =
      (0 until tokensPerDoc).map(t => max(when(col("qtok") === t, col("tcos"))))
    val scored = tokCos.groupBy(col("qdoc"), col("cdoc"))
      .agg(perTok.reduceLeft(_ + _).as("score"))
    TopK.perGroupTopK(scored,
        groupCols = Seq(col("qdoc")),
        order = Seq(col("score").desc, col("cdoc")),
        k = k, salt = col("cdoc"), rankCol = "rank")
      .select(col("qdoc"), col("rank"), col("cdoc"),
        round(col("score"), 6).as("maxsim"))
  }

  private def qSide(queries: DataFrame): DataFrame =
    queries.select(col("doc").as("qdoc"), col("tok").as("qtok"), col("vec").as("qvec"))
  private def cSide(cand: DataFrame): DataFrame =
    cand.select(col("doc").as("cdoc"), col("tok").as("ctok"), col("vec").as("cvec"))

  /** Exact late-interaction scoring: every (query token, candidate token)
    * cosine once — the MaxSim correctness baseline (the analogue of
    * cosineTopK for multi-vector docs). */
  def maxSim(cand: DataFrame, queries: DataFrame, k: Int, tokensPerDoc: Int,
             maxBroadcastRows: Long = MaxQueryBroadcastRows): DataFrame = {
    val q = qSide(queries)
    val tokCos = allPairs(cSide(cand), q, col("qdoc"), q.count(), maxBroadcastRows)
      .filter(col("cdoc") =!= col("qdoc"))
      .select(col("qdoc"), col("cdoc"), col("qtok"),
        VectorFunctions.cosine(col("qvec"), col("cvec")).as("tcos"))
    scoreAndRank(tokCos, k, tokensPerDoc)
  }

  /** ColBERT serving shape: stage 1 retrieves top-`tokenTopN` candidate
    * TOKENS per query token (brute-force here as the audit form; the IVF
    * token index at scale) and their docs become the candidate set; stage 2
    * pays full MaxSim only for candidate (qdoc, cdoc) pairs — cost bounded
    * by |pairs| · tokensPerDoc², never |Q docs| · |corpus docs|. */
  def maxSimRerank(cand: DataFrame, queries: DataFrame, k: Int,
                   tokenTopN: Int, tokensPerDoc: Int,
                   maxBroadcastRows: Long = MaxQueryBroadcastRows): DataFrame = {
    val q = qSide(queries)
    val c = cSide(cand)
    val nQ = q.count()
    val tokCos = allPairs(c, q, col("qdoc"), nQ, maxBroadcastRows)
      .filter(col("cdoc") =!= col("qdoc"))
      .select(col("qdoc"), col("qtok"), col("cdoc"), col("ctok"),
        VectorFunctions.cosine(col("qvec"), col("cvec")).as("tcos"))
    val pairs = TopK.perGroupTopK(tokCos,
        groupCols = Seq(col("qdoc"), col("qtok")),
        order = Seq(col("tcos").desc, col("cdoc"), col("ctok")),
        k = tokenTopN, salt = col("cdoc"))
      .select("qdoc", "cdoc").distinct()
    // survivors only: re-join the token frames pair-wise (tokensPerDoc^2
    // rows per pair) instead of reusing the full token-cosine frame — at
    // scale the full frame is exactly what must never materialize.
    val pairCos = pairs.join(c, Seq("cdoc"))
      .join(qHint(nQ, maxBroadcastRows)(q), Seq("qdoc"))
      .select(col("qdoc"), col("cdoc"), col("qtok"),
        VectorFunctions.cosine(col("qvec"), col("cvec")).as("tcos"))
    scoreAndRank(pairCos, k, tokensPerDoc)
  }

  /** Matryoshka two-stage ANN: coarse cosine over the first `prefixDims`
    * dims (a prefix slice — the scan stage reads/multiplies prefixDims/dims
    * of the data), exact full-dim rerank of the `coarseK` survivors. Both
    * ranks tie-break on id; the output carries both scores so the rerank
    * lift is auditable per row. */
  def mrlRerank(candidates: DataFrame, queries: DataFrame, k: Int,
                coarseK: Int, prefixDims: Int,
                idCol: String = "vec_id", vecCol: String = "embedding",
                maxBroadcastRows: Long = MaxQueryBroadcastRows): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = candidates.select(col(idCol).as("vec_id"), col(vecCol).as("cvec"))
    val nQ = q.count()
    val coarse = allPairs(c, q, col("qid"), nQ, maxBroadcastRows)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorFunctions.cosine(
          slice(col("qvec"), 1, prefixDims),
          slice(col("cvec"), 1, prefixDims)).as("cos_prefix"))
    val keep = TopK.perGroupTopK(coarse,
        groupCols = Seq(col("qid")),
        order = Seq(col("cos_prefix").desc, col("vec_id")),
        k = coarseK, salt = col("vec_id"))
      .select("qid", "vec_id", "cos_prefix")
    val rer = keep.join(c, Seq("vec_id"))
      .join(qHint(nQ, maxBroadcastRows)(q), Seq("qid"))
      .withColumn("cos_sim", VectorFunctions.cosine(col("qvec"), col("cvec")))
    TopK.perGroupTopK(rer,
        groupCols = Seq(col("qid")),
        order = Seq(col("cos_sim").desc, col("vec_id")),
        k = k, salt = col("vec_id"), rankCol = "rank")
      .select(col("qid"), col("rank"), col("vec_id"),
        round(col("cos_sim"), 6).as("cos_sim"),
        round(col("cos_prefix"), 6).as("cos_prefix"))
  }

  /** Contrastive hard-negative mining: per query, the top-k most-similar
    * OTHER-label vectors (the hard negatives), each with its margin below
    * the hardest same-label positive (`pos_best - neg_cos`; negative
    * margin = a negative outscoring every positive — the highest-value
    * training pairs). Two narrow passes over the candidates (positives'
    * ceiling + negatives' top-k); query batch broadcast in both. */
  def hardNegatives(emb: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label",
                    maxBroadcastRows: Long = MaxQueryBroadcastRows): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      col(labelCol).as("qlabel"))
    val c = emb.select(col(idCol).as("vec_id"), col(vecCol).as("cvec"),
      col(labelCol).as("clabel"))
    val scored = allPairs(c, q, col("qid"), q.count(), maxBroadcastRows)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("vec_id"), col("clabel"),
        VectorFunctions.cosine(col("qvec"), col("cvec")).as("cos"))
    val pos = scored.filter(col("clabel") === col("qlabel"))
      .groupBy("qid").agg(max(col("cos")).as("pos_best"))
    val negs = TopK.perGroupTopK(scored.filter(col("clabel") =!= col("qlabel")),
        groupCols = Seq(col("qid")),
        order = Seq(col("cos").desc, col("vec_id")),
        k = k, salt = col("vec_id"), rankCol = "rank")
    negs.join(pos, Seq("qid"), "left_outer")
      .select(col("qid"), col("rank"), col("vec_id").as("neg_id"),
        col("clabel").as("neg_label"),
        round(col("cos"), 6).as("neg_cos"),
        round(col("pos_best") - col("cos"), 6).as("margin"))
  }
}
