package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.suite.{Constraint, FieldConstraint, Relevance, SuiteLoader}

/** Structural severity (round-3 VERDICT item 4): the ranking must be
  * sensible for ANY suite — schema-path depth first, anyOf/oneOf
  * demoted within a depth — with no per-suite hardcoded table.
  */
class RelevanceSpec extends AnyFunSuite {
  import Constraint._

  private def sev(id: String, c: Constraint = Always(true)): Int =
    Relevance.severity(FieldConstraint(id, id.takeWhile(_ != '.'), c))

  test("deeper schema paths outrank shallower ones (reference: -len(path) first)") {
    assert(sev("tokens.items.minimum") > sev("tokens.minItems"))
    assert(sev("allOf[0].doc_id.minLength") > sev("doc_id.minLength"))
  }

  test("anyOf/oneOf-derived constraints are demoted within their depth (WEAK_MATCHES)") {
    assert(sev("n_tok.oneOf.bands") < sev("n_tok.not.exclMin513"))
    assert(sev("source.anyOf", AnyOf(Seq(Always(true)))) < sev("source.enum"))
    // but depth still dominates: a deep weak match beats a shallow strong one
    assert(sev("n_tok.oneOf.bands") > sev("source.enum"))
  }

  test("a top-level AnyOf/OneOf constraint is weak even if its id has no combinator segment") {
    assert(sev("source.mix", AnyOf(Seq(Always(true)))) < sev("source.mix", MinLength(1)))
    assert(sev("source.mix", OneOf(Seq(Always(true)))) < sev("source.mix", MinLength(1)))
  }

  test("duplicate-id '#N' suffixes do not change the depth") {
    assert(sev("doc_id.minLength#1") === sev("doc_id.minLength"))
  }

  test("a non-north-star suite loaded from JSON ranks sensibly end to end") {
    val s = SuiteLoader.parseSuiteDocument(
      """{"properties": {"a": {"minimum": 0}},
         "allOf": [{"properties": {"b": {"items": {"maximum": 9}}}}]}""")
    val m = Relevance.severityMap(s)
    // deeper allOf-branch items constraint outranks the top-level bound
    assert(m("allOf[0].b.items") > m("a.minimum"))
    // every constraint gets a positive severity — nothing defaults to 0
    assert(m.values.forall(_ > 0))
  }

  test("north-star map is fully structural (every id covered, no zeros)") {
    val m = Relevance.severityMap(graft.suite.NorthStar.suite)
    assert(m.keySet === graft.suite.NorthStar.suite.constraints.map(_.id).toSet)
    assert(m.values.forall(_ > 0))
    // depth ordering inside the real suite: element-level beats array-level
    assert(m("tokens.items.minimum") > m("tokens.uniqueItems"))
  }
}
