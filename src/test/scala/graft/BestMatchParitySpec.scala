package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._
import graft.suite.{Relevance, SuiteLoader}
import graft.compilex.ConstraintCompiler

/** Best-violation parity with the live reference (round-4 VERDICT item
  * 6): golden/bestmatch_pins.json holds adversarial (suite document,
  * instance) pairs — each with ≥2 failing constraints — whose
  * `best_match` pick was computed AND verified against the live
  * reference by tools/gen_bestmatch_pins.py (the script exits non-zero
  * on any disagreement, so a committed pin IS the reference's answer).
  *
  * Here the ENGINE answers the same question: parse the suite, compile
  * every constraint, evaluate on the one-row instance, and pick the
  * failing constraint that [[Relevance.severityMap]] ranks highest
  * (ties → constraint_id ascending, exactly the ORDER BY
  * [[graft.ValidationQueries.bestViolation]] uses). The pick must be
  * the pin's `engine_id` — i.e. the same violation the reference's
  * best_match surfaces, component by component of its relevance tuple
  * (depth, path ordering, weak demotion, _matches_type).
  */
class BestMatchParitySpec extends SparkSpec {
  private val mapper = new ObjectMapper()
  private val pins = mapper.readTree(
    scala.io.Source.fromResource("golden/bestmatch_pins.json")(scala.io.Codec.UTF8).mkString)

  private def sparkType(ct: String): DataType = ct match {
    case "int"        => IntegerType
    case "string"     => StringType
    case "array<int>" => ArrayType(IntegerType, containsNull = false)
    case other        => fail(s"unsupported pin ctype $other")
  }

  private def toValue(n: com.fasterxml.jackson.databind.JsonNode, ct: String): Any =
    if (n == null || n.isNull) null
    else ct match {
      case "int"        => n.asInt()
      case "string"     => n.asText()
      case "array<int>" => n.asScala.map(_.asInt()).toSeq
    }

  pins.asScala.foreach { pin =>
    val desc = pin.get("description").asText()
    test(s"best-match parity: $desc") {
      val columns = pin.get("columns").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toSeq
      val suite = SuiteLoader.parseSuiteDocument(
        pin.get("schema").toString, Nil, columns.map(_._1))
      val schema = StructType(columns.map { case (f, ct) =>
        StructField(f, sparkType(ct), nullable = true) })
      val data = pin.get("data")
      val row = Row.fromSeq(columns.map { case (f, ct) => toValue(data.get(f), ct) })
      val df = spark.createDataFrame(Seq(row).asJava, schema)

      val ids = suite.resolved.constraints.map(_.id)
      val passes = suite.resolved.constraints.map(fc =>
        ConstraintCompiler.compile(fc).pass)
      val got = df.select(passes: _*).collect().head
      val failing = ids.zipWithIndex.collect {
        case (id, i) if !got.getBoolean(i) => id
      }
      assert(failing.size >= 2,
        s"pin must be adversarial (>=2 failing constraints), got $failing")

      val sev = Relevance.severityMap(suite)
      val pick = failing.minBy(id => (-sev(id), id)) // severity desc, id asc
      assert(pick === pin.get("engine_id").asText(),
        s"\nengine best pick != reference best_match pick" +
          s"\n  failing: ${failing.map(id => s"$id(sev=${sev(id)})").mkString(", ")}" +
          s"\n  reference: ${pin.get("ref_validator").asText()} at ${pin.get("ref_path")}")

      // FULL order parity (round-5): when the pin carries engine_order
      // (every failing error maps to an engine id and every reference
      // relevance tuple is pairwise distinct), the engine's whole
      // severity-DESC ranking must reproduce the reference's
      // sorted(errors, key=relevance, reverse=True) — i.e. by_relevance,
      // the ordering v_top_violations exposes.
      val orderNode = pin.get("engine_order")
      if (orderNode != null && !orderNode.isNull) {
        val want = orderNode.asScala.map(_.asText()).toSeq
        val got = failing.sortBy(id => (-sev(id), id))
        assert(got === want,
          s"\nengine severity ORDER != reference by_relevance order" +
            s"\n  engine:    ${got.map(id => s"$id(sev=${sev(id)})").mkString(", ")}" +
            s"\n  reference: ${want.mkString(", ")}")
      }
    }
  }
}
