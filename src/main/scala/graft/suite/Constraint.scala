package graft.suite

/** Constraint ADT — the engine's "schema as data".
  *
  * The reference keeps a per-draft VALIDATORS dict keyed by keyword and
  * compiles a schema once into (fn, keyword, value) triples
  * (PJS:validators.py:293-297, 812-857). We mirror that: a suite is data
  * (this ADT, loadable from JSON), compiled once on the driver into
  * Catalyst Column expression trees (see [[graft.compilex.ConstraintCompiler]]),
  * then executed columnar/codegen'd — never row-at-a-time interpretation.
  *
  * Keyword semantics cites (stand-in reference, SURVEY.md §0):
  *  - type        PJS:_keywords.py:282-287
  *  - enum        PJS:_keywords.py:269-271
  *  - const       PJS:_keywords.py:85-87
  *  - minimum/maximum            PJS:_keywords.py:149-164
  *  - exclusiveMinimum/Maximum   PJS:_keywords.py:127-146
  *  - multipleOf  PJS:_keywords.py:167-191
  *  - minLength/maxLength        PJS:_keywords.py:231-240
  *  - pattern     PJS:_keywords.py:215-220
  *  - minItems/maxItems          PJS:_keywords.py:194-203
  *  - uniqueItems PJS:_keywords.py:206-212 (deep equality: _utils.py:156-181)
  *  - required    PJS:_keywords.py:304-309
  *  - dependentRequired          PJS:_keywords.py:243-254
  *  - items (2020-12, per-element subschema)  PJS:_keywords.py:59-82
  *  - contains/minContains/maxContains        PJS:_keywords.py:90-124
  *  - allOf/anyOf/oneOf/not      PJS:_keywords.py:332-379
  *  - if/then/else               PJS:_keywords.py:382-389
  *  - $ref (intra-suite, compile-time inlined) PJS:_keywords.py:274-275,
  *    resolution REF:_core.py:653-698
  */
sealed trait Constraint extends Product with Serializable

object Constraint {
  /** Open extension point (≙ `extend(validator, {keyword: fn})`,
    * PJS:validators.py:516-598): user keywords subclass this and register
    * a compiler via ConstraintCompiler.extensions.
    */
  trait Custom extends Constraint

  /** Boolean schema: `true` accepts everything, `false` rejects everything
    * (PJS:validators.py:290-291,369-379).
    */
  final case class Always(pass: Boolean) extends Constraint

  // ---- scalar assertions -------------------------------------------------
  /** JSON `type`: for a relational engine this is a null / conformance
    * check; the static part is enforced by the table schema at load.
    */
  final case class TypeIs(jsonType: String) extends Constraint
  final case class Enum(values: Seq[Any]) extends Constraint
  final case class Const(value: Any) extends Constraint
  final case class Minimum(bound: Double, exclusive: Boolean = false) extends Constraint
  final case class Maximum(bound: Double, exclusive: Boolean = false) extends Constraint
  final case class MultipleOf(k: Double) extends Constraint
  final case class MinLength(n: Int) extends Constraint
  final case class MaxLength(n: Int) extends Constraint
  final case class Pattern(regex: String) extends Constraint
  final case class Required() extends Constraint

  /** `format` (PJS:_format.py:234-542): opt-in named string formats.
    * v1 registry: date, date-time, uuid, ipv4, email, hostname, uri —
    * each compiled to a Column predicate (to_date / rlike), no UDFs.
    * Like the reference, unknown format names are accepted as no-ops
    * when assertion is disabled (PJS:_keywords.py:223-228).
    */
  final case class Format(name: String) extends Constraint

  /** `prefixItems` (2020-12 positional subschemas, PJS:_keywords.py:439-449):
    * constraint i applies to element i when present; shorter arrays pass
    * vacuously for missing positions.
    */
  final case class PrefixItems(cs: Seq[Constraint]) extends Constraint

  // ---- array assertions --------------------------------------------------
  final case class MinItems(n: Int) extends Constraint
  final case class MaxItems(n: Int) extends Constraint
  final case class UniqueItems() extends Constraint
  /** 2020-12 `items`: subschema applied to every element. The hot operator:
    * the reference pays ~75x per-element interpretive descent
    * (BASELINE.md); we compile to a codegen'd `forall`.
    */
  final case class Items(element: Constraint) extends Constraint
  /** 2020-12 `items` WITH sibling `prefixItems`: applies only to elements
    * past the first `offset` positions (PJS:_keywords.py:59-82 reads
    * `prefixItems` length and starts `items` there). Produced by the
    * loader when both keywords are present.
    */
  final case class ItemsFrom(offset: Int, element: Constraint) extends Constraint
  /** `contains` with `minContains`/`maxContains` bounds. */
  final case class Contains(element: Constraint, min: Int = 1, max: Int = Int.MaxValue) extends Constraint
  /** `unevaluatedItems` under conditionally-evaluated sibling context
    * (anyOf/oneOf branch validity, if-validity, $dynamicRef targets) —
    * the LINEAR encoding of find_evaluated_item_indexes_by_schema
    * (PJS:_keywords.py:54-82; legacy tracker identical): the effective
    * evaluated prefix is max(basePrefix, each gated prefix whose
    * row-level gate holds); an element past it must match an ACTIVE
    * contains or the uI subschema; an active `everything` contributor
    * makes the check vacuous. Prefix-max, contains-union and
    * everything-OR are pointwise-independent across active
    * contributors, so this is verdict-identical to enumerating the 2^k
    * activation subsets — at linear compiled size (no contributor cap).
    */
  final case class UnevaluatedItems(
      basePrefix: Int,
      gatedPrefixes: Seq[(Constraint, Int)],
      gatedEverything: Seq[Constraint],
      baseContains: Seq[Constraint],
      gatedContains: Seq[(Constraint, Constraint)],
      element: Constraint) extends Constraint

  // ---- combinators -------------------------------------------------------
  final case class AllOf(cs: Seq[Constraint]) extends Constraint
  final case class AnyOf(cs: Seq[Constraint]) extends Constraint
  final case class OneOf(cs: Seq[Constraint]) extends Constraint
  final case class Not(c: Constraint) extends Constraint
  final case class IfThenElse(cond: Constraint, thenC: Option[Constraint], elseC: Option[Constraint]) extends Constraint

  // ---- cross-field / referential ----------------------------------------
  /** Cross-field equality: this column must equal `size()` of another
    * (array) column — the n_tok == size(tokens) invariant of the north
    * star. Generalization of `const` against a computed value.
    */
  final case class EqSizeOf(arrayField: String) extends Constraint
  /** Cross-field equality against a string column's code-point length:
    * the declared-length invariant for text columns (documents table's
    * n_chars == length(text)), sibling of [[EqSizeOf]] for arrays.
    */
  final case class EqLengthOf(strField: String) extends Constraint
  /** `dependentRequired`: if this field is non-null, `fields` must be. */
  final case class DependentRequired(fields: Seq[String]) extends Constraint
  /** `minProperties`/`maxProperties` (PJS:_keywords.py:312-329) under
    * the absent≙null convention: the number of PRESENT keys on a row is
    * the count of its non-null columns, bounded inclusively. Produced by
    * the suite loader from the document level with the declared column
    * list.
    */
  final case class PresentCount(min: Int, max: Int, cols: Seq[String]) extends Constraint
  /** `dependentSchemas` implication (PJS:_keywords.py:257-266): the inner
    * constraint (on this FieldConstraint's own field) applies only when
    * the `trigger` column is present (non-null). Produced by the suite
    * loader from document-level `dependentSchemas: {trigger: subschema}`.
    */
  final case class WhenPresent(trigger: String, inner: Constraint) extends Constraint
  /** Cross-field presence predicate: passes iff the NAMED column is
    * non-null, regardless of the anchor field. Used as an evaluation
    * gate for conditionally-evaluated keys under unevaluatedProperties
    * (find_evaluated_property_keys_by_schema's dependentSchemas arm
    * recurses only when the trigger key is in the instance —
    * PJS:_utils.py:318-325).
    */
  final case class FieldPresent(name: String) extends Constraint
  /** Re-anchors `inner` onto the NAMED field, regardless of which field
    * the enclosing FieldConstraint targets. Used for anyOf/oneOf
    * branch-validity gates under unevaluatedProperties: the tracker adds
    * a branch's keys iff the row validates against the branch
    * (PJS:_utils.py:327-334), and the branch constrains its own field,
    * not the unevaluated column the gate guards.
    */
  final case class OnField(field: String, inner: Constraint) extends Constraint
  /** Intra-suite $ref: resolved (inlined) at suite-compile time, exactly
    * like the reference's subschema cache (PJS:validators.py:1070-1095).
    * An unresolved name raises at compile, mirroring
    * referencing.exceptions.Unresolvable (REF:_core.py:658-686).
    */
  final case class Ref(name: String) extends Constraint
}

/** A named constraint on one field of the table. `id` becomes the
  * violation `constraint_id` (≙ ValidationError.validator +
  * .json_path, PJS:exceptions.py:55-91).
  */
final case class FieldConstraint(id: String, field: String, constraint: Constraint)

/** A constraint suite: the engine's "schema document". `defs` is the
  * $defs/$ref registry (compile-time inlined); `constraints` the active
  * assertions.
  */
final case class Suite(
    name: String,
    constraints: Seq[FieldConstraint],
    defs: Map[String, Constraint] = Map.empty
) {
  /** Resolve all Ref nodes by inlining from `defs`, cycle-checked —
    * mirror of the reference resolver walk (REF:_core.py:653-698) done
    * once at compile time so runtime has zero lookups. Memoized: every
    * compile entry point (failCounts / withVerdicts / violations /
    * checksColumn) reads it, and the inlining rewrite is pure — a def
    * re-ran the whole tree rewrite on every call (round-4 review).
    */
  lazy val resolved: Suite = {
    import Constraint._
    def inline(c: Constraint, seen: Set[String]): Constraint = c match {
      case Ref(n) =>
        if (seen.contains(n)) throw new IllegalArgumentException(s"$$ref cycle at '$n'")
        val target = defs.getOrElse(n, throw new IllegalArgumentException(s"unresolvable $$ref '$n'"))
        inline(target, seen + n)
      case Items(e)          => Items(inline(e, seen))
      case ItemsFrom(k, e)   => ItemsFrom(k, inline(e, seen))
      case UnevaluatedItems(b, gp, ge, bc, gc, u) =>
        UnevaluatedItems(b, gp.map { case (g, p) => (inline(g, seen), p) },
          ge.map(inline(_, seen)), bc.map(inline(_, seen)),
          gc.map { case (g, c) => (inline(g, seen), inline(c, seen)) }, inline(u, seen))
      case PrefixItems(cs)   => PrefixItems(cs.map(inline(_, seen)))
      case Contains(e, a, b) => Contains(inline(e, seen), a, b)
      case AllOf(cs)         => AllOf(cs.map(inline(_, seen)))
      case AnyOf(cs)         => AnyOf(cs.map(inline(_, seen)))
      case OneOf(cs)         => OneOf(cs.map(inline(_, seen)))
      case Not(x)            => Not(inline(x, seen))
      case IfThenElse(i, t, e) =>
        IfThenElse(inline(i, seen), t.map(inline(_, seen)), e.map(inline(_, seen)))
      case WhenPresent(t, c) => WhenPresent(t, inline(c, seen))
      case OnField(nm, c)    => OnField(nm, inline(c, seen))
      case other => other
    }
    copy(constraints = constraints.map(fc => fc.copy(constraint = inline(fc.constraint, Set.empty))))
  }

  /** Strict-schema mode — the relational reading of `propertyNames` /
    * `additionalProperties: false` (PJS:_keywords.py:28-56): every table
    * column must be declared, every constrained field must exist.
    * Compile-time (driver-side), mirroring how the reference resolves
    * these keywords against a fixed key set.
    */
  def checkSchema(tableColumns: Seq[String], declared: Seq[String]): Either[String, Unit] = {
    val undeclared = tableColumns.filterNot(declared.contains)
    val missing = constraints.map(_.field).distinct
      .filterNot(f => tableColumns.contains(f) || f.startsWith("__"))
    if (undeclared.nonEmpty) Left(s"additionalProperties: undeclared columns $undeclared")
    else if (missing.nonEmpty) Left(s"required properties absent from table: $missing")
    else Right(())
  }
}
