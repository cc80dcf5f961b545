package graft.suite

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._
import graft.suite.Constraint._

/** JSON-Schema-subset → Constraint ADT loader.
  *
  * The engine's analogue of the reference's schema compile
  * (PJS:validators.py:282-304): a schema is data (JSON), parsed once on
  * the driver into the ADT, `$defs`/`$ref` resolved by compile-time
  * inlining (PJS:validators.py:1070-1095). Unknown keywords are ignored
  * exactly like the reference ignores non-assertion keywords; an
  * unresolvable `$ref` raises, mirroring
  * referencing.exceptions.Unresolvable (REF:_core.py:658-686).
  *
  * Boolean schemas: `true` → always-pass, `false` → always-fail
  * (PJS:validators.py:290-291,369-379).
  */
object SuiteLoader {
  private val mapper = new ObjectMapper()

  /** Parse one JSON Schema (subset) document into a Constraint. */
  def parseSchema(json: String): Constraint = toConstraint(mapper.readTree(json))

  /** Parse a whole SUITE document — a JSON Schema object whose
    * `properties` map the table's columns (≙ the reference's root-schema
    * entry, PJS:validators.py:1265-1332): each keyword inside a field's
    * subschema becomes one named FieldConstraint (`<field>.<keyword>`)
    * so violations stay per-keyword granular, exactly like the
    * reference's per-keyword ValidationError.validator. Top-level
    * `required` and `dependentRequired` are object-level keywords over
    * the column set; `$defs` provides the `$ref` registry (inlined at
    * parse, document scope).
    */
  def parseSuiteDocument(json: String): Suite = {
    val n = mapper.readTree(json)
    require(n.isObject, "suite document must be a JSON object")
    val name = Option(n.get("$id")).map(_.asText()).getOrElse("anonymous-suite")
    val scope: Map[String, JsonNode] =
      Option(n.get("$defs")).map(d => d.properties().asScala.map(e => e.getKey -> e.getValue).toMap)
        .getOrElse(Map.empty)
    val cs = scala.collection.mutable.ArrayBuffer.empty[FieldConstraint]

    Option(n.get("required")).foreach(_.asScala.foreach(f =>
      cs += FieldConstraint(s"${f.asText()}.required", f.asText(), Constraint.Required())))
    Option(n.get("dependentRequired")).foreach(_.properties().asScala.foreach { e =>
      cs += FieldConstraint(s"${e.getKey}.dependentRequired", e.getKey,
        Constraint.DependentRequired(e.getValue.asScala.map(_.asText()).toSeq))
    })

    // keywords that are consumed by a sibling anchor keyword, never alone
    val anchored = Set("minContains", "maxContains", "then", "else", "$defs")
    Option(n.get("properties")).foreach(_.properties().asScala.foreach { p =>
      val (field, sub) = (p.getKey, p.getValue)
      require(sub.isObject || sub.isBoolean, s"field '$field' subschema must be object or boolean")
      if (sub.isBoolean) {
        cs += FieldConstraint(s"$field.schema", field, Constraint.Always(sub.asBoolean()))
      } else {
        sub.properties().asScala.foreach { e =>
          val k = e.getKey
          if (!anchored.contains(k)) {
            // single-keyword slice, carrying the anchored siblings +
            // document $defs scope along
            val slice = mapper.createObjectNode()
            slice.set[JsonNode](k, e.getValue)
            val carry = Map(
              "contains" -> Seq("minContains", "maxContains"),
              "if"       -> Seq("then", "else"),
              "items"    -> Seq("prefixItems"))
            carry.getOrElse(k, Nil)
              .foreach(s => Option(sub.get(s)).foreach(slice.set[JsonNode](s, _)))
            val c = toConstraint(slice, scope)
            // the prefixItems slice inside an items-slice is only there
            // to offset items; it emits its own constraint from its own
            // keyword iteration, so drop it from the items slice result
            val cleaned = c match {
              case Constraint.AllOf(xs) if k == "items" =>
                xs.find(_.isInstanceOf[Constraint.ItemsFrom]).getOrElse(c)
              case other => other
            }
            cs += FieldConstraint(s"$field.$k", field, cleaned)
          }
        }
      }
    })
    Suite(name, cs.toSeq)
  }

  def toConstraint(n: JsonNode): Constraint = toConstraint(n, Map.empty)

  private def anyVal(n: JsonNode): Any =
    if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isTextual) n.asText()
    else if (n.isNull) null
    else throw new IllegalArgumentException(s"unsupported constant: $n")

  /** `scope` carries the lexically-enclosing $defs registry down the
    * tree (document scope), like the reference resolver's dynamic scope
    * stack collapsed to the static case (REF:_core.py:653-698).
    */
  private def toConstraint(n: JsonNode, scope: Map[String, JsonNode]): Constraint = {
    if (n.isBoolean) return Always(n.asBoolean())
    require(n.isObject, s"schema must be object or boolean, got $n")
    val cs = scala.collection.mutable.ArrayBuffer.empty[Constraint]
    val defs: Map[String, JsonNode] = scope ++
      Option(n.get("$defs")).map(d => d.properties().asScala.map(e => e.getKey -> e.getValue).toMap)
        .getOrElse(Map.empty)

    def resolveRef(ref: String): Constraint = {
      val name = ref.stripPrefix("#/$defs/")
      val target = defs.getOrElse(name,
        throw new IllegalArgumentException(s"unresolvable $$ref '$ref'"))
      toConstraint(target, defs)
    }

    n.properties().asScala.foreach { e =>
      val (k, v) = (e.getKey, e.getValue)
      k match {
        case "type" =>
          val ts = if (v.isArray) v.asScala.map(_.asText()).toSeq else Seq(v.asText())
          cs += (if (ts.length == 1) TypeIs(ts.head) else AnyOf(ts.map(TypeIs(_))))
        case "enum"  => cs += Enum(v.asScala.map(anyVal).toSeq)
        case "const" => cs += Const(anyVal(v))
        case "minimum" => cs += Minimum(v.asDouble())
        case "maximum" => cs += Maximum(v.asDouble())
        case "exclusiveMinimum" => cs += Minimum(v.asDouble(), exclusive = true)
        case "exclusiveMaximum" => cs += Maximum(v.asDouble(), exclusive = true)
        case "multipleOf" => cs += MultipleOf(v.asDouble())
        case "minLength" => cs += MinLength(v.asInt())
        case "maxLength" => cs += MaxLength(v.asInt())
        case "pattern" => cs += Pattern(v.asText())
        case "format" => cs += Format(v.asText())
        case "prefixItems" => cs += PrefixItems(v.asScala.map(toConstraint(_, defs)).toSeq)
        case "minItems" => cs += MinItems(v.asInt())
        case "maxItems" => cs += MaxItems(v.asInt())
        case "uniqueItems" => if (v.asBoolean()) cs += UniqueItems()
        case "items" =>
          // 2020-12: with sibling prefixItems, items starts after the
          // prefix positions (PJS:_keywords.py:59-82)
          val prefixLen = Option(n.get("prefixItems")).map(_.size()).getOrElse(0)
          cs += (if (prefixLen == 0) Items(toConstraint(v, defs))
                 else ItemsFrom(prefixLen, toConstraint(v, defs)))
        case "contains" =>
          val mn = Option(n.get("minContains")).map(_.asInt()).getOrElse(1)
          val mx = Option(n.get("maxContains")).map(_.asInt()).getOrElse(Int.MaxValue)
          cs += Contains(toConstraint(v, defs), mn, mx)
        case "allOf" => cs += AllOf(v.asScala.map(toConstraint(_, defs)).toSeq)
        case "anyOf" => cs += AnyOf(v.asScala.map(toConstraint(_, defs)).toSeq)
        case "oneOf" => cs += OneOf(v.asScala.map(toConstraint(_, defs)).toSeq)
        case "not" => cs += Not(toConstraint(v, defs))
        case "if" =>
          cs += IfThenElse(
            toConstraint(v, defs),
            Option(n.get("then")).map(toConstraint(_, defs)),
            Option(n.get("else")).map(toConstraint(_, defs)))
        case "$ref" => cs += resolveRef(v.asText())
        // engine extension keywords (x- prefix, the JSON Schema custom-
        // keyword convention): cross-field invariants with no pure-JSON-
        // Schema analogue (≙ extend(validator, ...), PJS:validators.py:516)
        case "x-eqSizeOf"   => cs += EqSizeOf(v.asText())
        case "x-eqLengthOf" => cs += EqLengthOf(v.asText())
        // non-assertion / unsupported keywords are ignored, like the
        // reference ignores annotations (title, description, ...)
        case _ => ()
      }
    }
    cs.toList match {
      case Nil      => Always(true)
      case c :: Nil => c
      case many     => AllOf(many)
    }
  }
}
