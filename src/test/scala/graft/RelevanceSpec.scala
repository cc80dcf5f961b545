package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.suite.{Constraint, FieldConstraint, Relevance, SuiteLoader}

/** Structural severity (round-3 VERDICT item 4): the ranking must be
  * sensible for ANY suite with no per-suite hardcoded table, and must
  * match the REFERENCE's empirically-verified best_match ordering —
  * SHALLOWER instance paths win (required beats a field keyword beats
  * an element keyword), anyOf/oneOf demoted within a depth.
  */
class RelevanceSpec extends AnyFunSuite {
  import Constraint._

  private def sev(id: String, c: Constraint): Int =
    Relevance.severity(FieldConstraint(id, id.takeWhile(_ != '.'), c))

  test("shallower instance paths outrank deeper ones (reference best_match, verified live)") {
    // required (error path []) > field keyword (path [f]) > element
    // keyword (path [f, i]) — the ordering best_match produced on the
    // live reference for {required-missing, type-on-field, items-min}
    assert(sev("doc_id.required", Required()) > sev("doc_id.minLength", MinLength(5)))
    assert(sev("tokens.minItems", MinItems(1)) > sev("tokens.items.minimum", Items(Minimum(0))))
    assert(sev("minProperties", PresentCount(1, 4, Seq("a"))) > sev("a.minimum", Minimum(0)))
  }

  test("anyOf/oneOf-derived constraints are demoted within their depth (WEAK_MATCHES)") {
    assert(sev("n_tok.oneOf.bands", OneOf(Seq(Maximum(1)))) < sev("n_tok.maximum", Maximum(1)))
    assert(sev("source.anyOf", AnyOf(Seq(Always(true)))) < sev("source.enum", Enum(Seq("web"))))
    // depth still dominates: a shallow weak match beats a deeper strong
    // one (reference tuple order: -len(path) first, weak second)
    assert(sev("source.anyOf", AnyOf(Seq(Always(true)))) > sev("tokens.items.minimum", Items(Minimum(0))))
  }

  test("a top-level AnyOf/OneOf constraint is weak even if its id has no combinator segment") {
    assert(sev("source.mix", AnyOf(Seq(Always(true)))) < sev("source.mix", MinLength(1)))
    assert(sev("source.mix", OneOf(Seq(Always(true)))) < sev("source.mix", MinLength(1)))
  }

  test("duplicate-id '#N' suffixes do not change the ranking") {
    assert(sev("doc_id.minLength#1", MinLength(5)) === sev("doc_id.minLength", MinLength(5)))
  }

  test("WhenPresent wrappers rank by their inner constraint") {
    assert(sev("a.dependentSchemas", WhenPresent("a", Required())) ===
      sev("a.required", Required()))
  }

  test("a non-north-star suite loaded from JSON ranks sensibly end to end") {
    val s = SuiteLoader.parseSuiteDocument(
      """{"required": ["a"],
         "properties": {"a": {"minimum": 0}},
         "allOf": [{"properties": {"b": {"items": {"maximum": 9}}}}]}""")
    val m = Relevance.severityMap(s)
    // required > field bound > element bound, whatever the suite
    assert(m("a.required") > m("a.minimum"))
    assert(m("a.minimum") > m("allOf[0].b.items"))
    // every constraint gets a positive severity — nothing defaults to 0
    assert(m.values.forall(_ > 0))
  }

  test("north-star map is fully structural and reference-ordered") {
    val m = Relevance.severityMap(graft.suite.NorthStar.suite)
    assert(m.keySet === graft.suite.NorthStar.suite.constraints.map(_.id).toSet)
    assert(m.values.forall(_ > 0))
    // the reference ordering the old hardcoded table encoded: required
    // on top, element-level items bounds at the bottom
    assert(m("doc_id.required") > m("source.enum"))
    assert(m("source.enum") > m("tokens.items.minimum"))
    assert(m("tokens.uniqueItems") > m("tokens.items.minimum"))
  }
}
