package graft.queries

/** SURVEY §2.3 — training-data pipeline operators. Populated in batches;
  * see TextQueries/DedupQueries/SimilarityQueries. */
object PipelineQueries {
  val defs: Seq[Q] = Seq.empty
}
