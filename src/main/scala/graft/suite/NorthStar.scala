package graft.suite

import graft.suite.Constraint._
import graft.gen.TokenData

/** The north-star constraint suite (BASELINE.json north_star): the
  * reference's keyword set {type, enum, minimum/maximum, minLength,
  * uniqueItems, required, $ref} reinterpreted as column constraints over
  * the token table. Constraint ids match FIXTURES.md's violation table.
  */
object NorthStar {
  val suite: Suite = Suite(
    name = "north-star-v1",
    constraints = Seq(
      FieldConstraint("doc_id.required", "doc_id", Required()),
      FieldConstraint("doc_id.minLength", "doc_id", MinLength(5)),
      FieldConstraint("tokens.minItems", "tokens", MinItems(1)),
      FieldConstraint("tokens.uniqueItems", "tokens", UniqueItems()),
      // per-element bounds via $ref into defs — exercises compile-time
      // ref inlining (PJS:validators.py:1070-1095 analogue)
      FieldConstraint("tokens.items.minimum", "tokens", Items(Ref("token_min"))),
      FieldConstraint("tokens.items.maximum", "tokens", Items(Ref("token_max"))),
      FieldConstraint("n_tok.eq.size", "n_tok", EqSizeOf("tokens")),
      FieldConstraint("source.enum", "source", Enum(TokenData.SOURCES))
    ),
    defs = Map(
      "token_min" -> Minimum(0),
      "token_max" -> Maximum(TokenData.VOCAB - 1)
    )
  )
}
