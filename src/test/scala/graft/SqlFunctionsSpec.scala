package graft

import graft.functions.GraftFunctions

/** The SQL face: every custom expression callable from spark.sql after
  * GraftFunctions.register (same builder list GraftExtensions injects
  * via spark.sql.extensions on spark-submit).
  */
class SqlFunctionsSpec extends SparkSpec {

  GraftFunctions.register(spark)

  test("token_stats from SQL") {
    val r = spark.sql(
      "SELECT token_stats(array(3, 1, 2, 2)) AS ts").select("ts.tmin", "ts.tmax", "ts.dups", "ts.n").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) === ((1, 3, 1, 4)))
  }

  test("kll_agg + kll_quantiles + kll_summary from SQL, with explicit k") {
    val r = spark.sql(
      """SELECT kll_summary(s).n AS n,
        |       kll_quantiles(s, array(0.5D))[0] AS p50
        |FROM (SELECT kll_agg(v, 400) AS s
        |      FROM VALUES (1.0),(2.0),(3.0),(4.0),(5.0) AS t(v))""".stripMargin).head()
    assert(r.getLong(0) === 5L)
    assert(r.getDouble(1) === 3.0)
  }

  test("tdigest_agg + tdigest_cdf + tdigest_summary from SQL") {
    val r = spark.sql(
      """SELECT tdigest_summary(s).min AS mn, tdigest_summary(s).max AS mx,
        |       tdigest_cdf(s, array(2.5D))[0] AS cdf
        |FROM (SELECT tdigest_agg(v) AS s
        |      FROM VALUES (1.0),(2.0),(3.0),(4.0) AS t(v))""".stripMargin).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 4.0)
    assert(r.getDouble(2) === 0.5)
  }

  test("aggregates work with GROUP BY from SQL") {
    val rows = spark.sql(
      """SELECT g, kll_summary(kll_agg(v)).n AS n
        |FROM VALUES ('a', 1.0), ('a', 2.0), ('b', 3.0) AS t(g, v)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("a", 2L), ("b", 1L)))
  }

  test("cosine_sim from SQL matches the composed HOF formula bit-for-bit") {
    val rows = spark.sql(
      """SELECT cosine_sim(a, b) AS fused,
        |  aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0D, (acc, x) -> acc + x) /
        |  (sqrt(aggregate(transform(a, x -> double(x) * double(x)), 0.0D, (acc, x) -> acc + x)) *
        |   sqrt(aggregate(transform(b, x -> double(x) * double(x)), 0.0D, (acc, x) -> acc + x))) AS hof
        |FROM VALUES
        |  (array(1.0F, 2.0F, 3.0F), array(3.0F, 1.0F, 2.0F)),
        |  (array(0.5F, -0.25F), array(-0.125F, 0.75F)),
        |  (array(1e-8F, 2e8F, 3.3F), array(7.7F, 1e-9F, -2e8F)) AS t(a, b)""".stripMargin).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("regex_valid from SQL (incl. non-compiling and null input)") {
    val r = spark.sql(
      "SELECT regex_valid('a(b|c)*'), regex_valid('('), regex_valid(CAST(NULL AS STRING))").head()
    assert(r.getBoolean(0))
    assert(!r.getBoolean(1))
    assert(r.isNullAt(2))
  }

  test("nfc_normalize from SQL: composes, is idempotent, keeps ASCII identical, null-propagates") {
    val r = spark.sql(
      """SELECT nfc_normalize('éclair') AS composed,
        |       nfc_normalize(nfc_normalize('éclair')) AS twice,
        |       nfc_normalize('plain ascii') AS ascii,
        |       nfc_normalize(CAST(NULL AS STRING)) AS n""".stripMargin).head()
    assert(r.getString(0) === "éclair")        // e + U+0301 -> é
    assert(r.getString(1) === r.getString(0))       // idempotent
    assert(r.getString(2) === "plain ascii")        // ASCII fast path
    assert(r.isNullAt(3))
  }

  test("nfc_normalize matches java.text.Normalizer on mixed inputs (codegen path)") {
    val inputs = Seq(
      "Ångström",    // Å + ö from combining marks
      "Ångström",      // already composed — quick-check path
      "ｶﾀｶﾅ half-width stays",   // compatibility chars NFC must NOT fold
      "mixed é and é forms", "")
    import spark.implicits._
    val got = inputs.toDF("s")
      .selectExpr("nfc_normalize(s) AS n").as[String].collect().toSeq
    val want = inputs.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got === want)
  }

  test("char_entropy from SQL: textbook values, empty = 0, null propagates") {
    val r = spark.sql(
      """SELECT round(char_entropy('aab'), 6) AS h1,
        |       char_entropy('abcd') AS h2,
        |       char_entropy('aaaa') AS h3,
        |       char_entropy('') AS h4,
        |       char_entropy(CAST(NULL AS STRING)) AS h5""".stripMargin).head()
    assert(r.getDouble(0) === 0.918296) // -(2/3·log2(2/3) + 1/3·log2(1/3))
    assert(r.getDouble(1) === 2.0)      // 4 distinct of 4
    assert(r.getDouble(2) === 0.0)      // degenerate repetition
    assert(r.getDouble(3) === 0.0)
    assert(r.isNullAt(4))
  }

  test("char_entropy counts code points, not UTF-16 units") {
    // 😀 is a surrogate pair: "😀😀" is ONE symbol repeated -> 0 bits;
    // "😀a" is two equiprobable symbols -> 1 bit
    val r = spark.sql("SELECT char_entropy('😀😀') AS a, char_entropy('😀a') AS b").head()
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 1.0)
  }

  test("GraftExtensions injects the same surface without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // builder-list smoke: no throw
  }
}
