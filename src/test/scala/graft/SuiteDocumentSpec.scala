package graft

import org.apache.spark.sql.functions._
import graft.compilex.ConstraintCompiler
import graft.suite.{NorthStar, SuiteLoader}

/** The suite-as-JSON-document path (schema-as-data end to end): the
  * north-star suite authored as a real JSON Schema document must give
  * row-for-row identical verdicts to the ADT-built NorthStar.suite.
  */
class SuiteDocumentSpec extends SparkSpec {

  private lazy val jsonSuite = SuiteLoader.parseSuiteDocument(
    scala.io.Source.fromResource("suites/north_star.json")(scala.io.Codec.UTF8).mkString)

  test("document parses to per-keyword constraints with granular ids") {
    val ids = jsonSuite.constraints.map(_.id).toSet
    assert(ids === Set(
      "doc_id.required", "doc_id.minLength",
      "tokens.minItems", "tokens.uniqueItems", "tokens.items",
      "n_tok.x-eqSizeOf", "source.enum"))
  }

  test("JSON-document suite gives row-identical verdicts to the ADT suite") {
    val df = graft.gen.TokenData.tokenTable(spark, 8000L, parallelism = 4)
    // evaluate BOTH suites on the same rows in one frame (doc_id is not
    // unique by design — the generator injects duplicates — so a
    // join-on-key compare would pair different rows)
    val a = ConstraintCompiler.withVerdicts(df, NorthStar.suite, Set("tokens"))
      .withColumnRenamed("row_valid", "a_valid")
      .select((df.columns.map(col) :+ col("a_valid")): _*)
    val both = ConstraintCompiler.withVerdicts(a, jsonSuite, Set("tokens"))
    assert(both.filter(col("a_valid") =!= col("row_valid")).count() === 0L)
    val invalid = both.filter(!col("row_valid")).count()
    assert(invalid > 0L) // the generator injects violations
  }

  test("uP inside a $ref target inside a combinator branch sees the target's own marks") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    // Reference semantics: the anyOf branch applies T; T's properties
    // evaluate key 'a', so T's own unevaluatedProperties: false rejects
    // only a PRESENT 'b'. A mark-routing bug that buffers branch marks
    // past the ref target's frame resolves T's uP against an empty
    // evaluated set and wrongly fails rows whose 'a' is present+valid.
    val s = SuiteLoader.parseSuiteDocument(
      """{"anyOf": [{"$ref": "#/$defs/T"}],
         "$defs": {"T": {"properties": {"a": {"minLength": 1}},
                         "unevaluatedProperties": false}}}""",
      Nil, Seq("a", "b"))
    val schema = StructType(Seq(StructField("a", StringType), StructField("b", StringType)))
    val df = spark.createDataFrame(Seq(
      Row("x", null), // a evaluated by T.properties; b absent -> valid
      Row("x", "y"),  // b present and unevaluated -> T fails -> anyOf fails
      Row(null, null) // nothing present -> valid
    ).asJava, schema)
    val got = ConstraintCompiler.withVerdicts(df, s)
      .select("row_valid").collect().map(_.getBoolean(0)).toSeq
    assert(got === Seq(true, false, true), s"verdicts: $got")
  }

  test("boolean combinator branches participate in oneOf counting") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    // oneOf with an always-true branch: row valid iff the OTHER branch
    // fails (exactly one must hold) — the reference validates this form
    val s = SuiteLoader.parseSuiteDocument(
      """{"oneOf": [{"properties": {"a": {"minLength": 3}}, "required": ["a"]}, true]}""",
      Nil, Seq("a"))
    val schema = StructType(Seq(StructField("a", StringType)))
    val df = spark.createDataFrame(Seq(
      Row("abc"), // first branch holds AND true holds -> two -> invalid
      Row("x")    // only the true branch holds -> exactly one -> valid
    ).asJava, schema)
    val got = ConstraintCompiler.withVerdicts(df, s)
      .select("row_valid").collect().map(_.getBoolean(0)).toSeq
    assert(got === Seq(false, true), s"verdicts: $got")
  }

  test("multipleOf 0 raises at load instead of silently passing everything") {
    val e = intercept[IllegalArgumentException](SuiteLoader.parseSuiteDocument(
      """{"properties": {"n_tok": {"multipleOf": 0}}}"""))
    assert(e.getMessage.contains("multipleOf"))
  }

  test("ref '#/' resolves the empty-named member per RFC 6901, not the root") {
    // with no ""-member the ref is unresolvable (the reference raises
    // too); resolving it to the ROOT would inline the whole document
    // (usually a spurious circular-ref report) instead
    val e = intercept[IllegalArgumentException](SuiteLoader.parseSuiteDocument(
      """{"properties": {"doc_id": {"$ref": "#/"}}}"""))
    assert(e.getMessage.contains("unresolvable"), e.getMessage)
  }

  test("zero-constraint suite: failCounts and violations degrade to empty, not crash") {
    val s = SuiteLoader.parseSuiteDocument(
      """{"additionalProperties": true}""", Nil, Seq("doc_id"))
    assert(s.constraints.isEmpty)
    val df = graft.gen.TokenData.tokenTable(spark, 100L, parallelism = 2)
    val fc = ConstraintCompiler.failCounts(df, s)
    assert(fc.columns.toSeq === Seq("constraint_id", "fails", "n_rows") && fc.count() === 0L)
    assert(ConstraintCompiler.violations(df, s).count() === 0L)
  }

  test("engine extension keyword x-eqLengthOf parses and compiles") {
    val s = SuiteLoader.parseSuiteDocument(
      """{"properties": {"n_chars": {"x-eqLengthOf": "text"}}}""")
    assert(s.constraints.map(_.id) === Seq("n_chars.x-eqLengthOf"))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("text", StringType), StructField("n_chars", IntegerType)))
    val df = spark.createDataFrame(Seq(Row("abc", 3), Row("abc", 7)).asJava, schema)
    val fails = ConstraintCompiler.failCounts(df, s).head()
    assert(fails.getLong(1) === 1L)
  }

  test("boolean field subschema: false rejects all rows, true accepts") {
    val s = SuiteLoader.parseSuiteDocument(
      """{"properties": {"source": false}}""")
    val df = graft.gen.TokenData.tokenTable(spark, 100L, parallelism = 1)
    val fails = ConstraintCompiler.failCounts(df, s).head()
    assert(fails.getLong(1) === 100L)
  }

  test("unevaluated* static-subset guards RAISE on data-dependent shapes (round-3 review fixes)") {
    // a $ref sibling carrying prefixItems now FEEDS the evaluated-index
    // walk (r4b — was a raise): the target's prefix offsets uI
    val s = SuiteLoader.parseSuiteDocument(
      """{"properties": {"arr": {"$ref": "#/$defs/a", "unevaluatedItems": false}},
         "$defs": {"a": {"prefixItems": [{"type": "integer"}]}}}""")
    assert(s.constraints.find(_.id == "arr.unevaluatedItems").get.constraint ===
      graft.suite.Constraint.ItemsFrom(1, graft.suite.Constraint.Always(false)))
    // an anyOf sibling compiles to the LINEAR UnevaluatedItems node
    // (r4d — was an IfThenElse 2^k expansion): valid branch -> its
    // prefix counts as evaluated at runtime via the gated prefix max
    val s2 = SuiteLoader.parseSuiteDocument(
      """{"properties": {"arr": {"anyOf": [{"prefixItems": [{"type": "integer"}]}],
         "unevaluatedItems": false}}}""")
    val ui = s2.constraints.find(_.id == "arr.unevaluatedItems").get.constraint
    assert(ui.isInstanceOf[graft.suite.Constraint.UnevaluatedItems], ui.toString)
    // the old 2^k cap (3) is gone: 4 conditional contributors compile
    // to one linear node with all four gated prefixes
    val s3 = SuiteLoader.parseSuiteDocument(
      """{"properties": {"arr": {
         "anyOf": [{"prefixItems": [{}]}, {"prefixItems": [{}, {}]}],
         "oneOf": [{"prefixItems": [{}]}, {"prefixItems": [{}, {}, {}]}],
         "unevaluatedItems": false}}}""")
    s3.constraints.find(_.id == "arr.unevaluatedItems").get.constraint match {
      case graft.suite.Constraint.UnevaluatedItems(0, gp, ge, bc, gc, _) =>
        assert(gp.map(_._2).sorted === Seq(1, 1, 2, 3) && ge.isEmpty && bc.isEmpty && gc.isEmpty)
      case other => fail(s"expected the linear node, got $other")
    }
  }

  test("unevaluatedProperties inside a $ref target gets its OWN annotation frame (r4 — was a raise)") {
    import graft.suite.Constraint._
    // the round-3 ADVICE example: uP:false in the target must NOT see
    // the referrer's properties — every column is unevaluated in the
    // target's frame, so each present column fails (golden-pinned too)
    val s1 = SuiteLoader.parseSuiteDocument(
      """{"$ref": "#/$defs/s", "properties": {"a": {"minimum": 0}},
         "$defs": {"s": {"unevaluatedProperties": false}}}""",
      Nil, Seq("a", "b"))
    assert(s1.constraints.map(_.id).toSet ===
      Set("a.minimum", "a.unevaluatedProperties", "b.unevaluatedProperties"))
    assert(s1.constraints.find(_.id == "a.unevaluatedProperties").get.constraint ===
      WhenPresent("a", Always(false)))
    // two uPs in DIFFERENT frames (root + target) are both asserted now:
    // the target's schema-form uP lands on both columns (its frame saw
    // nothing evaluated), the root's false on neither (the referrer's
    // properties plus the inner uP's cascade cover everything)
    val s2 = SuiteLoader.parseSuiteDocument(
      """{"$ref": "#/$defs/base", "unevaluatedProperties": false,
         "properties": {"a": {"minimum": 0}},
         "$defs": {"base": {"unevaluatedProperties": {"minLength": 2}}}}""",
      Nil, Seq("a", "b"))
    assert(s2.constraints.map(_.id).sorted ===
      Seq("a.minimum", "unevaluatedProperties.a.minLength", "unevaluatedProperties.b.minLength"))
  }

  test("$dynamicRef static subset: re-binding and recursion RAISE; single-anchor resolves") {
    // two $dynamicAnchor declarations of the same name = re-binding is
    // possible → compile-time inlining cannot represent it
    intercept[IllegalArgumentException](
      SuiteLoader.parseSchema(
        """{"$defs": {"a": {"$dynamicAnchor": "n", "minimum": 0},
                      "b": {"$dynamicAnchor": "n", "maximum": 1}},
           "$dynamicRef": "#n"}"""))
    // self-recursive dynamic ref (the tree-schema idiom) hits the same
    // cycle guard as a recursive $ref
    intercept[IllegalArgumentException](
      SuiteLoader.parseSchema(
        """{"$dynamicAnchor": "node", "$dynamicRef": "#node"}"""))
    // the static single-anchor case inlines like $ref
    val c = SuiteLoader.parseSchema(
      """{"$defs": {"lim": {"$dynamicAnchor": "lim", "minimum": 0}},
         "$dynamicRef": "#lim"}""")
    assert(c === graft.suite.Constraint.Minimum(0))
    // initial resolution is LOCAL (2020-12 §8.2.3.2): a registry
    // resource's $dynamicAnchor must not shadow the ref's own
    // resource's plain $anchor (bookending → ordinary $ref semantics)…
    val far = """{"$id": "https://example/far", "$dynamicAnchor": "str3", "minimum": 99}"""
    val c2 = SuiteLoader.parseSchema(
      """{"$defs": {"s": {"$anchor": "str3", "minLength": 3}}, "$dynamicRef": "#str3"}""",
      Seq(far))
    assert(c2 === graft.suite.Constraint.MinLength(3))
    // …and a name with NO local resolution is unresolvable even when a
    // foreign resource declares it (the reference raises Unresolvable;
    // inlining the foreign schema would be silent wrong validation)
    val farN = """{"$id": "https://example/farn", "$dynamicAnchor": "nope", "minimum": 1}"""
    intercept[IllegalArgumentException](
      SuiteLoader.parseSchema("""{"$dynamicRef": "#nope"}""", Seq(farN)))
  }

  test("$recursiveRef full resolution: outward walk re-binds; recursion and off-dialect RAISE") {
    val D = "https://json-schema.org/draft/2019-09/schema"
    // non-rebinding registry case: '#' = the resource root
    val rec = s"""{"$$id": "https://example/rec", "$$schema": "$D",
                   "minimum": 0, "$$defs": {"p": {"$$recursiveRef": "#"}}}"""
    val c = SuiteLoader.parseSchema(
      s"""{"$$schema": "$D", "$$ref": "https://example/rec#/$$defs/p"}""", Seq(rec))
    assert(c === graft.suite.Constraint.Minimum(0))
    // ANONYMOUS anchored entry: never enters the dynamic scope
    // (REF:_core.py:717-725 pushes only non-empty base URIs), so the
    // walk stops at the resource root — resolves, no re-binding
    val recA = s"""{"$$id": "https://example/reca", "$$schema": "$D", "$$recursiveAnchor": true,
                    "minimum": 0, "$$defs": {"p": {"$$recursiveRef": "#"}}}"""
    val cAnon = SuiteLoader.parseSchema(
      s"""{"$$schema": "$D", "$$recursiveAnchor": true,
           "$$ref": "https://example/reca#/$$defs/p"}""", Seq(recA))
    assert(cAnon === graft.suite.Constraint.Minimum(0))
    // GENUINE re-binding (both roots $id'd + anchored): the walk lands
    // on the outer root — resolvable when the outer root's constraint
    // does not re-enter the ref chain (entered reca via a $defs branch)
    val recOuter = s"""{"$$id": "https://example/reco", "$$schema": "$D",
                        "$$recursiveAnchor": true, "maximum": 77,
                        "$$defs": {"via": {"$$ref": "https://example/reca#/$$defs/p"}}}"""
    val cRebind = SuiteLoader.parseSchema(
      s"""{"$$schema": "$D", "$$ref": "https://example/reco#/$$defs/via"}""",
      Seq(recOuter, recA))
    assert(cRebind === graft.suite.Constraint.Maximum(77))
    // …but re-binding to an outer root that transitively re-reaches the
    // $recursiveRef is infinite inlining → cycle guard RAISES
    intercept[IllegalArgumentException](
      SuiteLoader.parseSchema(
        s"""{"$$id": "https://example/rece", "$$schema": "$D", "$$recursiveAnchor": true,
             "$$ref": "https://example/reca#/$$defs/p"}""", Seq(recA)))
    // …but an UNANCHORED target root never starts the walk: the same
    // anchored entry root is then irrelevant (REF:jsonschema.py:631-633)
    val cNoWalk = SuiteLoader.parseSchema(
      s"""{"$$schema": "$D", "$$recursiveAnchor": true,
           "$$ref": "https://example/rec#/$$defs/p"}""", Seq(rec))
    assert(cNoWalk === graft.suite.Constraint.Minimum(0))
    // self-recursion at the entry root hits the cycle guard
    intercept[IllegalArgumentException](
      SuiteLoader.parseSchema(s"""{"$$schema": "$D", "$$recursiveRef": "#"}"""))
    // only '#' is legal (2019-09 §8.2.4.2.1)
    intercept[IllegalArgumentException](
      SuiteLoader.parseSchema(s"""{"$$schema": "$D", "$$recursiveRef": "#/$$defs/p"}"""))
    // a nested $id re-bases '#' — outside the static subset → RAISE
    val recNested = s"""{"$$id": "https://example/recn", "$$schema": "$D", "minimum": 0,
                         "$$defs": {"inner": {"$$id": "https://example/inner"},
                                    "p": {"$$recursiveRef": "#"}}}"""
    intercept[IllegalArgumentException](
      SuiteLoader.parseSchema(
        s"""{"$$schema": "$D", "$$ref": "https://example/recn#/$$defs/p"}""", Seq(recNested)))
    // 2019-09-only vocabulary: the reference IGNORES it under 2020-12
    // and under draft-7 → raising instead of diverging either way
    intercept[IllegalArgumentException](
      SuiteLoader.parseSchema("""{"$recursiveRef": "#"}"""))
    intercept[IllegalArgumentException](
      SuiteLoader.parseSchema(
        """{"$schema": "http://json-schema.org/draft-07/schema#", "$recursiveRef": "#"}"""))
  }

  test("legacy keyword forms RAISE under modern dialects instead of silently weakening") {
    // 2020-12 (no $schema): additionalItems and boolean exclusiveMinimum
    // are pre-2020 forms — loading them must error, not no-op
    intercept[IllegalArgumentException](
      SuiteLoader.parseSchema("""{"items": {"minimum": 0}, "additionalItems": false}"""))
    intercept[IllegalArgumentException](
      SuiteLoader.parseSchema("""{"minimum": 5, "exclusiveMinimum": true}"""))
    // 2019-09: dependencies was split; the combined form must not load
    intercept[UnsupportedOperationException](
      SuiteLoader.parseSuiteDocument(
        """{"$schema": "https://json-schema.org/draft/2019-09/schema",
           "dependencies": {"a": ["b"]}}"""))
  }

  test("v_doc_conditional suite compiles to the oracle's exact constraint ids") {
    // the DuckDB oracle for v_doc_conditional hardcodes these generated
    // ids — loader id drift must fail HERE, not as a driver hash mismatch
    assert(ValidationQueries.DocConditionalSuite.constraints.map(_.id) ===
      Seq("allOf[0].if", "source.oneOf", "n_tok.anyOf", "source.not",
        "if", "doc_id.minLength", "tokens.minItems", "n_tok.minimum",
        "source.unevaluatedProperties"))
  }

  test("v_dynamic_refs suite compiles to the oracle's exact ids AND winning constraints") {
    import graft.suite.Constraint._
    val cs = ValidationQueries.DynamicRefsSuite.constraints
    assert(cs.map(_.id) ===
      Seq("n_tok.$ref", "doc_id.$ref", "source.$ref", "tokens.$ref", "tokens.maxItems"))
    // each resolved constraint pins WHICH resource won the walk — a
    // wrong winner changes the constraint, failing here rather than as
    // a driver hash mismatch
    assert(cs(0).constraint === AllOf(Seq(Maximum(400), Minimum(0)))) // entry re-binds over lib default
    assert(cs(1).constraint === MinLength(4))                         // bookend: no re-binding
    assert(cs(2).constraint === Pattern("^(web|wiki|books|code|forums)$")) // recursiveRef outward walk
    assert(cs(3).constraint === MaxItems(300))                        // anonymous entry invisible
    assert(cs(4).constraint === MaxItems(512))                        // doc-level re-binding
  }

  test("later-draft keywords RAISE under earlier dialects (vocabulary gate)") {
    // draft-4 has no numeric exclusive bounds and no const — the
    // reference IGNORES them there, so compiling them would make the
    // engine strictly wrong (false violations; found by legacy fuzzing)
    intercept[IllegalArgumentException](SuiteLoader.parseSchema(
      """{"$schema": "http://json-schema.org/draft-04/schema#", "exclusiveMaximum": 0}"""))
    intercept[IllegalArgumentException](SuiteLoader.parseSchema(
      """{"$schema": "http://json-schema.org/draft-04/schema#", "const": 5}"""))
    // contains arrived in draft-6; if/then/else in draft-7;
    // prefixItems in 2020-12
    intercept[IllegalArgumentException](SuiteLoader.parseSchema(
      """{"$schema": "http://json-schema.org/draft-04/schema#", "contains": {"minimum": 1}}"""))
    intercept[IllegalArgumentException](SuiteLoader.parseSchema(
      """{"$schema": "http://json-schema.org/draft-06/schema#",
         "if": {"minimum": 0}, "then": {"maximum": 9}}"""))
    intercept[IllegalArgumentException](SuiteLoader.parseSchema(
      """{"$schema": "http://json-schema.org/draft-07/schema#",
         "prefixItems": [{"minimum": 0}]}"""))
    // doc level: dependentRequired is 2019-09+ (draft-7 spells it
    // `dependencies`)
    intercept[IllegalArgumentException](SuiteLoader.parseSuiteDocument(
      """{"$schema": "http://json-schema.org/draft-07/schema#",
         "dependentRequired": {"a": ["b"]}}"""))
  }
}
