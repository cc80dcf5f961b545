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
