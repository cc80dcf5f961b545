package graft

import org.apache.spark.sql.functions._
import graft.gen.TokenData
import graft.suite.SuiteLoader
import graft.compilex.ConstraintCompiler

/** Pins the README "Using the library" snippet verbatim-ish: the
  * public three-face API over a loader-parsed document must run and
  * agree with itself on a real table.
  */
class QuickstartSpec extends SparkSpec {

  test("README quickstart: load document, three faces agree") {
    val suite = SuiteLoader.parseSuiteDocument(
      """{"$schema": "https://json-schema.org/draft/2020-12/schema",
          "type": "object", "required": ["doc_id"],
          "properties": {
            "doc_id": {"type": "string", "minLength": 5},
            "tokens": {"type": "array", "minItems": 1, "uniqueItems": true,
                       "items": {"type": "integer", "minimum": 0, "maximum": 262143}},
            "n_tok":  {"type": "integer", "minimum": 0}}}""",
      resources = Nil, tableColumns = Seq("doc_id", "tokens", "n_tok", "source"))
    val df = TokenData.tokenTable(spark, 3000, 4).cache()

    val fails = ConstraintCompiler.failCounts(df, suite)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val verdicts = ConstraintCompiler.withVerdicts(df, suite)
    val nBadRows = verdicts.filter(!col("row_valid")).count()
    val violations = ConstraintCompiler.violations(df, suite)

    // faces agree: total fail count == violation rows; every fail-count
    // key appears among violation constraint_ids
    assert(fails.values.sum === violations.count())
    val vids = violations.select("constraint_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(fails.filter(_._2 > 0).keySet === vids)
    // the generator injects minLength/minItems/uniqueItems/items-bound
    // violations -> some invalid rows, fewer than all
    assert(nBadRows > 0 && nBadRows < df.count())
    // violations carry the debugging fields
    val v0 = violations.head()
    assert(v0.schema.fieldNames.toSet.intersect(
      Set("json_path", "schema_path", "message")).size === 3)
  }
}
