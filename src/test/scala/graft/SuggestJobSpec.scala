package graft

import org.apache.spark.sql.functions._
import graft.gen.TokenData
import graft.run.SuggestJob
import graft.compilex.ConstraintCompiler

/** The profile→suite loop at the JOB level: the suggested JSON Schema
  * document must load through the real SuiteLoader, the profiled data
  * must pass its own suggestion, and rows outside the observed band
  * must fail it.
  */
class SuggestJobSpec extends SparkSpec {

  test("suggestion round-trips the loader; data passes; out-of-band rows fail") {
    val df = TokenData.tokenTable(spark, 3000, 4).cache()
    val (json, suite) = SuggestJob.suggest(df)
    assert(json.contains("\"$schema\": \"https://json-schema.org/draft/2020-12/schema\""))
    assert(suite.constraints.nonEmpty)
    val bad = ConstraintCompiler.failCounts(df, suite)
      .filter(col("fails") > 0).collect()
    assert(bad.isEmpty, s"data must pass its own suggestion: ${bad.mkString(",")}")

    // push one column past each observed bound -> that constraint fires
    val maxNtok = df.agg(max("n_tok")).head().getInt(0)
    val overNtok = df.limit(5).withColumn("n_tok", lit(maxNtok + 1))
    val f1 = ConstraintCompiler.failCounts(overNtok, suite)
      .filter(col("fails") > 0).collect().map(_.getString(0))
    assert(f1.exists(_.contains("n_tok")), f1.mkString(","))

    val badSrc = df.limit(5).withColumn("source", lit("not-a-source"))
    val f2 = ConstraintCompiler.failCounts(badSrc, suite)
      .filter(col("fails") > 0).collect().map(_.getString(0))
    assert(f2.exists(_.contains("source")), f2.mkString(","))

    // enum fallback: force a tiny enumMax -> bare string type instead
    val jsonNoEnum = SuggestJob.suggestJson(df, enumMax = 2)
    assert(jsonNoEnum.contains("\"source\": {\"type\": \"string\"}"))
  }

  test("empty table: clear error, not an NPE; quoted source values stay valid JSON") {
    import spark.implicits._
    val empty = TokenData.tokenTable(spark, 100, 2).filter(lit(false))
    val e = intercept[IllegalArgumentException](SuggestJob.suggestJson(empty))
    assert(e.getMessage.contains("empty table"))

    // a source value carrying a quote and a backslash must emit a
    // parseable document whose enum round-trips the loader verbatim
    val tricky = Seq(
      ("d1", Seq(1, 2), 2, """he said "hi"\now"""),
      ("d2", Seq(3, 4), 2, "plain")
    ).toDF("doc_id", "tokens", "n_tok", "source")
    val (json, suite) = SuggestJob.suggest(tricky)
    assert(json.contains("\\\"hi\\\""), json)
    val enumC = suite.constraints.find(_.id.startsWith("source")).get
    val fails = ConstraintCompiler.failCounts(tricky, suite)
      .filter(col("fails") > 0).collect()
    assert(fails.isEmpty,
      s"quoted enum value must validate its own row via ${enumC.id}: ${fails.mkString(",")}")
  }

  test("degraded profiles: empty token arrays, null columns, comma-carrying source") {
    import spark.implicits._
    // all-empty tokens (no element bounds) + a source value carrying a
    // literal comma (unrepresentable on the comma-joined enum surface)
    val df = Seq(
      ("d1", Seq.empty[Int], 0, "news,web"),
      ("d2", Seq.empty[Int], 0, "news,web")
    ).toDF("doc_id", "tokens", "n_tok", "source")
    val (json, suite) = SuggestJob.suggest(df)
    assert(!json.contains("\"items\""), s"no element bounds without elements: $json")
    assert(json.contains("\"source\": {\"type\": \"string\"}"),
      s"comma-carrying source must fall back to the type check: $json")
    val fails = ConstraintCompiler.failCounts(df, suite)
      .filter(col("fails") > 0).collect()
    assert(fails.isEmpty, s"degraded suggestion must still self-validate: ${fails.mkString(",")}")

    // all-null doc_id: no length band, not required, still loadable
    val nulls = Seq((Option.empty[String], Seq(1), 1, "s"),
      (Option.empty[String], Seq(2), 1, "s"))
      .toDF("doc_id", "tokens", "n_tok", "source")
    val (json2, suite2) = SuggestJob.suggest(nulls)
    assert(!json2.contains("minLength") && !json2.contains("required"), json2)
    assert(json2.contains("\"doc_id\": {\"type\": [\"string\", \"null\"]}"),
      s"observed nulls must be admitted via a type union: $json2")
    val fails2 = ConstraintCompiler.failCounts(nulls, suite2)
      .filter(col("fails") > 0).collect()
    assert(fails2.isEmpty, fails2.mkString(","))
  }

  test("suggest loop is total and self-consistent on seeded random degraded tables") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260818L)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(40)
      val rows = (0 until n).map { i =>
        val docId = if (rnd.nextInt(4) == 0) None else Some(s"doc-$trial-$i")
        val toks =
          if (rnd.nextInt(5) == 0) None
          else Some(Seq.fill(rnd.nextInt(6))(rnd.nextInt(1000) - 100))
        val nTok = if (rnd.nextInt(5) == 0) None else Some(toks.map(_.size).getOrElse(0))
        val src = rnd.nextInt(4) match {
          case 0 => None
          case 1 => Some("plain")
          case 2 => Some("""with "quote" and \slash""")
          case _ => Some("a,b comma")
        }
        (docId, toks, nTok, src)
      }
      val df = rows.toDF("doc_id", "tokens", "n_tok", "source")
      // totality: any non-empty table yields a loadable suite…
      val (json, suite) = SuggestJob.suggest(df)
      assert(suite.constraints.nonEmpty || json.nonEmpty)
      // …and the profiled data passes its own suggestion
      val fails = ConstraintCompiler.failCounts(df, suite)
        .filter(col("fails") > 0).collect()
      assert(fails.isEmpty,
        s"trial $trial (n=$n): self-validation failed ${fails.mkString(",")}\n$json")
    }
  }

  test("full loop: curate -> suggest -> validate runs clean end to end") {
    val out = java.nio.file.Files.createTempDirectory("graft_loop").toString
    // 1. curate the raw docs into the north-star token-table shape
    graft.run.CurateJob.run(spark, "/root/testdata/sf0.001", s"$out/c")
    val curated = spark.read.parquet(s"$out/c/curated")
    assert(curated.count() > 0)
    // 2. bootstrap a suite from the curated corpus itself
    val (_, suite) = SuggestJob.suggest(curated, curated.columns.toSeq)
    // 3. the full per-partition validation job under that suite:
    //    curated data passes its own observed-bounds suggestion
    graft.run.ValidateJob.run(spark, s"$out/c/curated", s"$out/v", s"$out/ckpt",
      suite = suite)
    val verdicts = spark.read.parquet(s"$out/v/verdicts").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
    assert(verdicts.nonEmpty)
    assert(verdicts.forall(_._3), s"curated corpus must pass its own suggested suite: " +
      verdicts.filterNot(_._3).mkString(","))
    assert(verdicts.map(_._2).sum === 0L)
  }
}
