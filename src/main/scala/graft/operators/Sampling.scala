package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic sampling operators for training-data mixing (SURVEY
  * §2.3). No RNG anywhere: sampling decisions are pure functions of the
  * row's id, so a 100 TB down-mix is reproducible run-to-run, engine-to-
  * engine (the DuckDB oracle computes the identical hash), and stable
  * under retries/speculative execution — properties `DataFrame.sample`
  * (seeded per-partition RNG, partitioning-dependent) cannot give.
  */
object Sampling {

  /** Hash-stratified sampling: keep a row iff
    * `charHash(id) mod 100 < pct(stratum)`, with per-stratum percentages
    * (e.g. downweight an over-represented language). Narrow, zero-shuffle,
    * scan-stage only; the pct map is a plan-time literal CASE, not a join.
    * Adds the `sample_bucket` column (0-99) so the kept rows are auditable.
    */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 pct: Map[String, Int], defaultPct: Int): DataFrame = {
    val bucket = pmod(TextFunctions.charHash(col(idCol).cast("string")), lit(100L))
    val rate = pct.foldLeft(lit(defaultPct.toLong)) { case (fb, (s, p)) =>
      when(col(strataCol) === s, lit(p.toLong)).otherwise(fb)
    }
    df.withColumn("sample_bucket", bucket)
      .filter(col("sample_bucket") < rate)
  }

  /** Per-group quota sampling ("domain cap"): keep at most `k` rows per
    * group, chosen in deterministic PSEUDO-RANDOM order — rows ranked
    * within their group by (charHash(id), id) and cut at k. The hash
    * order makes the kept set a uniform-ish, reproducible sample rather
    * than an id-ordered prefix (which would bias toward old rows), and
    * the id tiebreak makes the rank total. This is the standard
    * "cap any one domain's share of the training mix" operator.
    *
    * Scale shape: delegates to the salted two-stage TopK — per-partition
    * top-k on (group, salt) first, so a 100 TB group never funnels
    * through one window task; only ≤ salts×k rows per group reach the
    * final per-group window. Returns the input columns + `rn` (1-based
    * pick rank within the group). */
  def perGroupCap(df: DataFrame, idCol: String, groupCol: String,
                  k: Int, salts: Int = 32): DataFrame = {
    val h = TextFunctions.charHash(col(idCol).cast("string"))
    // salt on the hash, not the raw id: a STRING id under pmod would
    // throw under ANSI (Spark 4's default) or null out the salt — which
    // would put each group's whole row set in one stage-1 partition,
    // exactly the funnel the salted TopK exists to avoid
    TopK.perGroupTopK(df, Seq(col(groupCol)),
      order = Seq(h.asc, col(idCol).asc), k = k,
      salt = h, salts = salts)
  }

  /** Deterministic weighted sampling WITHOUT replacement (the
    * Efraimidis–Spirakis exponential-sort reservoir, Inf. Process. Lett.
    * 2006): per group, keep the `k` rows minimizing
    * `es_key = -ln(u) / w` — equivalent to drawing without replacement
    * with inclusion probability proportional to weight. This is the
    * token-budget mixing primitive: weight = token/char count samples
    * documents proportional to their mass, so the kept set approximates
    * a token-budget draw rather than a doc-count draw.
    *
    * No RNG: u derives from the portable polynomial hash of the row id
    * (u = (charHash("ws:"+id)+1)/(P+1) ∈ (0,1]), so the sample is
    * reproducible run-to-run and engine-to-engine — -ln and the divide
    * are single IEEE ops on identical doubles, which is what lets the
    * declared query hash-verify the sampled set AND its keys against
    * DuckDB. Rows with weight <= 0 are excluded (they have no sampling
    * mass; -ln(u)/0 would be inf/NaN).
    *
    * Scale shape: same salted two-stage TopK as [[perGroupCap]] — a hot
    * group pre-reduces to salts×k rows before the per-group window, and
    * the key computation itself is a narrow scan-stage projection. */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
                     weightCol: String, k: Int, salts: Int = 32): DataFrame = {
    val h = TextFunctions.charHash(
      concat(lit("ws:"), col(idCol).cast("string")))
    val u = (h.cast("double") + lit(1.0)) / lit((TextFunctions.P + 1).toDouble)
    val key = negate(log(u)) / col(weightCol).cast("double")
    TopK.perGroupTopK(
      df.filter(col(weightCol) > 0).withColumn("es_key", key),
      Seq(col(groupCol)),
      order = Seq(col("es_key").asc, col(idCol).asc), k = k,
      salt = h, salts = salts)
  }

  /** DuckDB side of [[weightedSample]]'s key: the identical hash → u →
    * -ln(u)/w chain (single IEEE ops, same order). */
  def weightedKeySql(idExpr: String, weightExpr: String): String = {
    val h = TextFunctions.charHashSql(s"('ws:' || CAST($idExpr AS VARCHAR))")
    val u = s"((CAST($h AS DOUBLE) + 1.0) / ${(TextFunctions.P + 1).toDouble})"
    s"((-ln($u)) / CAST($weightExpr AS DOUBLE))"
  }

  /** Deterministic train/val/test split: every row lands in exactly one
    * named band of `splits` (percent slices summing to 100) by its
    * id-hash bucket — the membership a training run must be able to
    * RECONSTRUCT later (contamination audits, eval refresh), which rules
    * out RNG splits. The hash is salted with a fixed "sp:" tag so split
    * membership is independent of [[stratified]]'s keep-decision buckets
    * (same id hashed untagged) — otherwise "sampled at < 50%" would
    * correlate with "lands in train". Narrow, zero-shuffle, scan-stage
    * CASE over a plan-time band table: at 100 TB this is a free column.
    * Ids must be non-null: a null id hashes to null and the band CASE
    * falls through to the LAST band — deterministic but almost never
    * intended; filter or coalesce ids upstream. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      "split percentages must sum to 100")
    val bucket = pmod(
      TextFunctions.charHash(concat(lit("sp:"), col(idCol).cast("string"))),
      lit(100L))
    val edges = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val assign = splits.zip(edges).init.foldRight(
      lit(splits.last._1): org.apache.spark.sql.Column) {
      case (((name, _), edge), fb) => when(bucket < edge, name).otherwise(fb)
    }
    df.withColumn("split_bucket", bucket).withColumn("split", assign)
  }

  /** DuckDB side of [[hashSplit]]: (bucketExpr, caseExpr) over the same
    * tagged hash and cumulative band edges. */
  def hashSplitSql(idExpr: String,
                   splits: Seq[(String, Int)]): (String, String) = {
    val bucket =
      s"(${TextFunctions.charHashSql(s"('sp:' || CAST($idExpr AS VARCHAR))")} % 100)"
    val edges = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val whens = splits.zip(edges).init
      .map { case ((name, _), edge) => s"WHEN $bucket < $edge THEN '$name'" }
      .mkString(" ")
    (bucket, s"CASE $whens ELSE '${splits.last._1}' END")
  }

  /** DuckDB side of `stratified`'s keep-predicate pieces: (bucketExpr,
    * rateExpr) over the same hash and CASE tree. */
  def stratifiedSql(idExpr: String, strataExpr: String,
                    pct: Map[String, Int], defaultPct: Int): (String, String) = {
    val bucket = s"${TextFunctions.charHashSql(s"CAST($idExpr AS VARCHAR)")} % 100"
    val cases = pct.toSeq.reverse
      .map { case (s, p) => s"WHEN $strataExpr = '${s.replace("'", "''")}' THEN $p" }
      .mkString(" ")
    (bucket, s"CASE $cases ELSE $defaultPct END")
  }

  /** Rendezvous (highest-random-weight) shard assignment, Thaler &
    * Ravishankar 1996 — CONSISTENT sharding: each id goes to the shard
    * with the highest mixed weight, so growing n → n+1 shards moves
    * EXACTLY the ids whose new-shard weight wins (≈1/(n+1) of them) and
    * every move lands ON the new shard — no resharding storm, unlike
    * `id % n` where nearly every id moves. The audit columns carry both
    * assignments + the moved flag so the migration bill is a groupBy
    * away.
    *
    * Weight: `((id mod P)·2654435761 + (s+1)·972663749) mod P` — Knuth
    * multiplicative mixing, id pre-reduced so the product stays in
    * exact long range for any BIGINT id. argmax = first position of the
    * max (ties to the smallest shard, deterministic on both engines).
    * Zero-shuffle narrow scan: the weight vector is a plan-time
    * n-length array per row; at 100 TB this is a free column. */
  def rendezvousShards(df: DataFrame, idCol: String,
                       n: Int, nNew: Int): DataFrame = {
    require(n >= 1 && nNew >= 1, "shard counts must be >= 1")
    def shardCol(k: Int) = {
      val ws = s"transform(sequence(0, ${k - 1}), s -> " +
        s"((`$idCol` % 1000000007L) * 2654435761L + (s + 1) * 972663749L) % 1000000007L)"
      expr(s"CAST(array_position($ws, array_max($ws)) - 1 AS BIGINT)")
    }
    df.select(col(idCol), shardCol(n).as("shard_old"),
        shardCol(nNew).as("shard_new"))
      .withColumn("moved", col("shard_old") =!= col("shard_new"))
  }

  /** DuckDB oracle for [[rendezvousShards]] — identical mix and
    * first-position argmax. */
  def rendezvousShardsSql(table: String, idExpr: String,
                          n: Int, nNew: Int): String = {
    def shardExpr(k: Int) = {
      val ws = s"list_transform(range(0, $k), s -> " +
        s"(($idExpr % 1000000007) * 2654435761 + (s + 1) * 972663749) % 1000000007)"
      s"CAST(list_position($ws, list_max($ws)) - 1 AS BIGINT)"
    }
    s"SELECT $idExpr, ${shardExpr(n)} AS shard_old, " +
      s"${shardExpr(nNew)} AS shard_new, " +
      s"(${shardExpr(n)} <> ${shardExpr(nNew)}) AS moved FROM $table"
  }
}
