package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.suite.{Suite, SuiteLoader}

/** PROFILE → SUITE bootstrap: derive a candidate constraint suite from
  * the observed data and emit it as a loadable 2020-12 JSON Schema
  * document — the job a team runs when pointing the validator at an
  * unknown table (the same bootstrap direction as Deequ's constraint
  * suggestion). The document round-trips through the REAL loader
  * (SuiteLoader.parseSuiteDocument), so the suggestion is guaranteed
  * to compile — and, by construction from observed bounds, the
  * profiled data passes its own suggestion (SuggestJobSpec pins both,
  * plus rejection of out-of-band rows).
  *
  * One aggregation pass derives every signal (the same single-scan
  * shape as ValidationQueries.suggestSuite); the JSON assembly is a
  * driver-side reshape of that 1-row result.
  */
object SuggestJob {

  /** The 1-row profile frame: bounds, length band, null presence, enum
    * set. SHARED with [[graft.ValidationQueries.suggestSuite]] (the
    * DuckDB-oracled v_suggest_suite query), so the emitted document and
    * the oracled signals cannot drift apart (round-4 review: the two
    * used to carry verbatim copies of this aggregation).
    */
  private[graft] def profile(df: DataFrame): DataFrame =
    df.agg(
      sum(col("doc_id").isNull.cast("long")).as("dnull"),
      min(length(col("doc_id"))).as("dminlen"),
      max(length(col("doc_id"))).as("dmaxlen"),
      min(col("n_tok")).as("nmin"),
      max(col("n_tok")).as("nmax"),
      min(size(col("tokens"))).as("szmin"),
      max(size(col("tokens"))).as("szmax"),
      min(array_min(col("tokens"))).as("emin"),
      max(array_max(col("tokens"))).as("emax"),
      countDistinct(col("source")).as("ndistinct"),
      array_join(array_sort(collect_set(col("source"))), ",").as("srcs"))

  /** Minimal JSON string escaping for observed values embedded in the
    * suggestion document (quote, backslash, control chars). A source
    * value containing a literal ',' still splits into separate enum
    * entries (the profile carries the set comma-joined for the oracled
    * string surface) — documented, not silent: the round-trip load
    * plus the self-validation fail counts surface it immediately.
    */
  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c            => c.toString
    }

  /** Suggested suite as a 2020-12 JSON Schema document over the
    * north-star token-table shape. `enumMax`: emit `enum` only when the
    * observed distinct set is at most this large (else fall back to a
    * bare type check, like every suggestion engine does for
    * high-cardinality keys).
    */
  def suggestJson(df: DataFrame, enumMax: Int = 10): String = {
    val p = profile(df).head()
    if (p.isNullAt(p.fieldIndex("dminlen")))
      throw new IllegalArgumentException(
        "cannot suggest a suite from an empty table: no observed bounds to profile")
    def L(n: String): Long = p.getAs[Number](n).longValue()
    val srcs = p.getAs[String]("srcs").split(',').toSeq.filter(_.nonEmpty)
    val sourceSchema =
      if (L("ndistinct") <= enumMax)
        srcs.map(s => "\"" + jsonEscape(s) + "\"").mkString("{\"enum\": [", ", ", "]}")
      else "{\"type\": \"string\"}"
    val required = if (L("dnull") == 0) "\"required\": [\"doc_id\"]," else ""
    s"""{
       |  "$$schema": "https://json-schema.org/draft/2020-12/schema",
       |  "$$id": "https://graft.example/suggested",
       |  "type": "object",
       |  $required
       |  "properties": {
       |    "doc_id": {"type": "string", "minLength": ${L("dminlen")}, "maxLength": ${L("dmaxlen")}},
       |    "n_tok": {"type": "integer", "minimum": ${L("nmin")}, "maximum": ${L("nmax")}},
       |    "tokens": {"type": "array", "minItems": ${L("szmin")}, "maxItems": ${L("szmax")},
       |               "items": {"type": "integer", "minimum": ${L("emin")}, "maximum": ${L("emax")}}},
       |    "source": $sourceSchema
       |  }
       |}""".stripMargin
  }

  /** Suggest + load through the real document loader. */
  def suggest(df: DataFrame, columns: Seq[String] = Seq("doc_id", "tokens", "n_tok", "source")): (String, Suite) = {
    val json = suggestJson(df)
    (json, SuiteLoader.parseSuiteDocument(json, Nil, columns))
  }

  /** spark-submit main: <tablePath> <outFile> — writes the suggested
    * schema document and prints the per-constraint fail counts of the
    * table against its own suggestion (all zero unless the table
    * changed under the profiler's feet).
    */
  def main(args: Array[String]): Unit = {
    val Array(tablePath, outFile) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(tablePath)
    val (json, suite) = suggest(df)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(s"[suggest] wrote ${suite.constraints.length} constraints to $outFile")
    graft.compilex.ConstraintCompiler.failCounts(df, suite).show(50, truncate = false)
    spark.stop()
  }
}
