package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._
import graft.compilex.ConstraintCompiler
import graft.suite.{FieldConstraint, SuiteLoader}

/** The north-star parity sentence, literally (BASELINE.json):
  * "per-partition pass/fail parity with reference on JSON Schema Test
  * Suite cases mapped to column constraints."
  *
  * Mapping: every int-typed golden corpus group becomes one PARTITION of
  * a single table (partition key = group id); each group's constraint
  * compiles per partition; the per-partition verdict (all rows valid?)
  * must equal the reference verdict (all the group's cases valid?) —
  * the corpus itself is reference-verified by
  * tools/check_golden_vs_reference.py, so this closes engine ==
  * reference at PARTITION granularity, not just row granularity.
  */
class PartitionParitySpec extends SparkSpec {
  private val mapper = new ObjectMapper()

  test("per-partition pass/fail parity over golden-corpus partitions") {
    val corpus = mapper.readTree(
      scala.io.Source.fromResource("golden/cases.json")(scala.io.Codec.UTF8).mkString)
    // groups whose instances are plain ints (one shared column type ->
    // one table); others are covered per-row in GoldenSuiteSpec
    val intGroups = corpus.asScala.filter(g => g.get("ctype").asText() == "int").toSeq
    assert(intGroups.size >= 8, s"expected a healthy int-group subset, got ${intGroups.size}")

    val schema = StructType(Seq(
      StructField("part", StringType, nullable = false),
      StructField("v", IntegerType, nullable = true),
      StructField("expected", BooleanType, nullable = false)))
    val rows = intGroups.flatMap { g =>
      val part = g.get("description").asText()
      g.get("tests").asScala.map { t =>
        val d = t.get("data")
        Row(part, if (d == null || d.isNull) null else d.asInt(), t.get("valid").asBoolean())
      }
    }
    val df = spark.createDataFrame(rows.asJava, schema)

    // expected per-partition verdict straight from the (reference-
    // verified) corpus flags
    val expected = intGroups.map { g =>
      g.get("description").asText() -> g.get("tests").asScala.forall(_.get("valid").asBoolean())
    }.toMap

    // group-scoped resource registry (multi-resource $id golden groups)
    def parse(g: com.fasterxml.jackson.databind.JsonNode) =
      SuiteLoader.parseSchema(g.get("schema").toString,
        Option(g.get("resources")).map(_.asScala.map(_.toString).toSeq).getOrElse(Nil))

    // engine: compile each partition's constraint, evaluate only that
    // partition (partition-pruned filter), aggregate to one verdict
    intGroups.foreach { g =>
      val part = g.get("description").asText()
      val compiled = ConstraintCompiler.compile(FieldConstraint(part, "v", parse(g)))
      val verdict = df.filter(col("part") === part)
        .agg(min(compiled.pass.cast("int"))).head().getInt(0) == 1
      assert(verdict === expected(part),
        s"partition '$part': engine verdict $verdict != reference ${expected(part)}")
    }

    // and the row-level fail SET matches the corpus flags inside each
    // partition (verdict parity can't hide offsetting errors)
    intGroups.foreach { g =>
      val part = g.get("description").asText()
      val compiled = ConstraintCompiler.compile(FieldConstraint(part, "v", parse(g)))
      val bad = df.filter(col("part") === part)
        .select(col("expected"), compiled.pass.as("got"))
        .filter(col("expected") =!= col("got")).count()
      assert(bad === 0L, s"partition '$part' has $bad row-level mismatches")
    }
  }
}
