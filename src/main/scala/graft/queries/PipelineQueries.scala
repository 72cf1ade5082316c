package graft.queries

/** SURVEY §2.3 — training-data pipeline operators: text analysis, dedup,
  * similarity search, multimodal plumbing. */
object PipelineQueries {
  val defs: Seq[Q] =
    TextQueries.defs ++ DedupQueries.defs ++ SimilarityQueries.defs
}
