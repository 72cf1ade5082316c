package graft.operators

/** Internal helper-column naming (ADVICE r5): operators that inject
  * scratch columns (`_salt`, rank counters) must not clobber a user column
  * that happens to share the name — `withColumn` silently replaces, and
  * the operator would then salt/rank/drop the USER's data. Every injected
  * name is drawn fresh against the input schema instead.
  */
private[graft] object Cols {

  /** `base` if absent from `existing`, else the first `base1`, `base2`, …
    * that is. Comparison is exact (Spark resolves our generated names
    * case-sensitively because we only ever reference them verbatim). */
  def fresh(base: String, existing: Iterable[String]): String = {
    val taken = existing.toSet
    Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(n => !taken(n))
      .get
  }
}
