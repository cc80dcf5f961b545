package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingValidate
import graft.suite.NorthStar

/** The SAME compiled constraint suite under Structured Streaming:
  * verdict windows, violation stream, watermarked dedup.
  */
class StreamingSpec extends SparkSpec {

  private def ts(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("verdict stream: windowed per-source counts match the batch semantics") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Seq[Int], Int, String, Timestamp)]
    val df = mem.toDF().toDF("doc_id", "tokens", "n_tok", "source", "ingest_ts")
    val q = StreamingValidate.verdictStream(df, NorthStar.suite, Set("tokens"),
      "ingest_ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("verdicts").outputMode("complete").start()
    try {
      mem.addData(
        ("doc-1", Seq(1, 2, 3), 3, "web", ts(0)),       // valid
        ("doc-2", Seq(-5, 2), 2, "web", ts(1)),         // items.minimum
        ("doc-3", Seq(1, 2), 7, "books", ts(2)),        // n_tok.eq.size
        ("doc-4", Seq(4, 5), 2, "spam", ts(6)))         // source.enum
      q.processAllAvailable()
      val rows = spark.sql("SELECT source, rows, violations FROM verdicts").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(("web", 2L, 1L), ("books", 1L, 1L), ("spam", 1L, 1L)))
    } finally q.stop()
  }

  test("violation stream is stateless append and emits constraint ids") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Seq[Int], Int, String)]
    val df = mem.toDF().toDF("doc_id", "tokens", "n_tok", "source")
    val q = StreamingValidate.violationStream(df, NorthStar.suite, Set("tokens"))
      .writeStream.format("memory").queryName("viols").outputMode("append").start()
    try {
      mem.addData(("doc-9", Seq(300000, 1), 2, "web"))
      q.processAllAvailable()
      val v = spark.sql("SELECT constraint_id, observed FROM viols").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(v == Set(("tokens.items.maximum", "300000")))
    } finally q.stop()
  }

  test("running verdict via mapGroupsWithState accumulates across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Seq[Int], Int, String)]
    val df = mem.toDF().toDF("doc_id", "tokens", "n_tok", "source")
    val q = StreamingValidate.runningVerdictStream(df, NorthStar.suite, Set("tokens"))
      .writeStream.format("memory").queryName("running").outputMode("update").start()
    try {
      mem.addData(("doc-1", Seq(1, 2, 3), 3, "web"), ("doc-2", Seq(-5, 2), 2, "web"))
      q.processAllAvailable()
      mem.addData(("doc-3", Seq(7, 8), 2, "web"), ("doc-4", Seq(1, 2), 9, "books"))
      q.processAllAvailable()
      // update mode: take the LAST emitted state per source
      val last = spark.sql("SELECT source, rows, violations FROM running").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).map { case (s, vs) =>
          (s, vs.map(_._2).maxBy(_._1)) // rows grow monotonically
        }
      assert(last("web") === ((3L, 1L)))   // 3 rows total, 1 violation, across 2 batches
      assert(last("books") === ((1L, 1L))) // n_tok mismatch
    } finally q.stop()
  }

  test("watermarked dedup drops in-horizon duplicate doc_ids") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val df = mem.toDF().toDF("doc_id", "ingest_ts")
    val q = StreamingValidate.dedupStream(df, "ingest_ts", "30 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      mem.addData(("a", ts(0)), ("b", ts(1)), ("a", ts(2)))
      q.processAllAvailable()
      mem.addData(("a", ts(3)), ("c", ts(4)))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup").collect().map(_.getString(0)).sorted
      assert(ids.toSeq == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("drift stream: per-window PSI matches the batch formula") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // baseline: 50/50 web/books
    val snapshot = Seq(("source_mix", "web", 50L), ("source_mix", "books", 50L))
      .toDF("kind", "key", "cnt")
    val mem = MemoryStream[(String, Timestamp)]
    val df = mem.toDF().toDF("source", "ingest_ts")
    val q = StreamingValidate.driftStream(df, snapshot, "ingest_ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("drift").outputMode("complete").start()
    try {
      // window 1 (10:00-10:05): 3 web / 1 books — skewed vs 50/50
      // window 2 (10:05-10:10): 1 web / 1 books — matches baseline
      // window 3 (10:10-10:15): 1 web / 3 spam — source NOT in baseline
      mem.addData(("web", ts(0)), ("web", ts(1)), ("web", ts(2)), ("books", ts(3)),
        ("web", ts(6)), ("books", ts(7)),
        ("web", ts(11)), ("spam", ts(12)), ("spam", ts(13)), ("spam", ts(14)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT rows, psi FROM drift ORDER BY window.start").collect()
      assert(rows.length == 3)
      val eps = 1e-6
      def psiOf(shares: Seq[(Double, Double)]) = // (p, q) pairs, eps-floored
        BigDecimal(shares.map { case (p, q) =>
          val pf = math.max(p, eps); val qf = math.max(q, eps)
          (pf - qf) * math.log(pf / qf)
        }.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows(0).getLong(0) == 4L)
      assert(rows(0).getDouble(1) == psiOf(Seq((0.25, 0.5), (0.75, 0.5))))
      assert(rows(1).getLong(0) == 2L)
      assert(rows(1).getDouble(1) == psiOf(Seq((0.5, 0.5), (0.5, 0.5))))
      // unknown source dominates, exactly like the batch full_outer term
      assert(rows(2).getLong(0) == 4L)
      assert(rows(2).getDouble(1) ==
        psiOf(Seq((0.25, 0.5), (0.0, 0.5), (0.75, eps))))
    } finally q.stop()
  }

  test("drift stream: NULL source counts as unknown-source drift, not silently dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val snapshot = Seq(("source_mix", "web", 50L), ("source_mix", "books", 50L))
      .toDF("kind", "key", "cnt")
    val mem = MemoryStream[(String, Timestamp)]
    val df = mem.toDF().toDF("source", "ingest_ts")
    val q = StreamingValidate.driftStream(df, snapshot, "ingest_ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("driftnull").outputMode("complete").start()
    try {
      // one window: 1 web / 1 books / 2 NULL — `!isin` is SQL NULL on
      // null source, which used to route these rows to otherwise(0):
      // counted in `rows` but absent from every share (round-2 ADVICE)
      mem.addData(("web", ts(0)), ("books", ts(1)),
        (null.asInstanceOf[String], ts(2)), (null.asInstanceOf[String], ts(3)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT rows, psi FROM driftnull").collect()
      assert(rows.length == 1 && rows(0).getLong(0) == 4L)
      val eps = 1e-6
      val expected = BigDecimal(Seq((0.25, 0.5), (0.25, 0.5), (0.5, eps)).map { case (p, q0) =>
        val pf = math.max(p, eps); val qf = math.max(q0, eps)
        (pf - qf) * math.log(pf / qf)
      }.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows(0).getDouble(1) == expected,
        s"null-source rows must land in the unknown-source PSI term, got ${rows(0).getDouble(1)} want $expected")
    } finally q.stop()
  }

  test("funnel stream: stateless row-local filter keeps only quality survivors") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    val q = StreamingValidate.funnelStream(df)
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    try {
      val pass = ("doc-pass",
        // 30 distinct words incl. a stopword -> all four stages pass
        ("the " + (1 to 29).map(i => s"w$i").mkString(" ")))
      val failShort = ("doc-short", "too few words here")
      val failRep = ("doc-rep", ("the " + Seq.fill(29)("spam").mkString(" ")))
      mem.addData(pass, failShort, failRep)
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM funnel").collect().map(_.getString(0)).toSeq
      assert(kept == Seq("doc-pass"), kept.mkString(","))
    } finally q.stop()
  }

  test("file-source stream: dropped parquet files validate incrementally, each exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_landing").toString
    val t1 = graft.gen.TokenData.tokenTable(spark, 1000, 2)
    t1.write.mode("overwrite").parquet(dir)
    val expected1 = graft.compilex.ConstraintCompiler
      .violations(spark.read.parquet(dir), NorthStar.suite, fusedIntArrays = Set("tokens"))
      .count()
    val q = StreamingValidate.fileStreamViolations(spark, dir,
        spark.read.parquet(dir).schema, NorthStar.suite, Set("tokens"))
      .writeStream.format("memory").queryName("landing").outputMode("append").start()
    try {
      q.processAllAvailable()
      val n1 = spark.sql("SELECT count(*) FROM landing").head().getLong(0)
      assert(n1 === expected1, s"first drop: $n1 vs $expected1")
      // second drop: MORE files land; only their violations are added
      val t2 = graft.gen.TokenData.tokenTable(spark, 2000, 2)
        .filter(org.apache.spark.sql.functions.col("doc_id").isNotNull)
      val expected2 = graft.compilex.ConstraintCompiler
        .violations(t2, NorthStar.suite, fusedIntArrays = Set("tokens")).count()
      t2.write.mode("append").parquet(dir)
      q.processAllAvailable()
      val n2 = spark.sql("SELECT count(*) FROM landing").head().getLong(0)
      assert(n2 === expected1 + expected2, s"after second drop: $n2 vs ${expected1 + expected2}")
    } finally q.stop()
  }

  test("driver-gate streaming query: violationsStreamed row set == batch v_violations") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.ValidationQueries.violationsStreamed(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = graft.ValidationQueries.violations(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty, "streamed violations must be non-empty at sf0.001")
    assert(streamed === batch,
      "AvailableNow file-stream must reproduce the exact batch violation row set")
  }

  test("session stream: native session windows merge gap-bridged events across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    val q = StreamingValidate.sessionStream(df, "ts", "30 minutes", "2 hours")
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    try {
      // user 1: events at 10:00 and 10:20 (same session), 11:30 (new);
      // user 2: one event. The 10:20 arrives in a LATER batch — the
      // session must still merge.
      mem.addData((1L, ts(0), 1.0), (2L, ts(5), 5.0))
      q.processAllAvailable()
      mem.addData((1L, ts(20), 2.0))
      q.processAllAvailable()
      mem.addData((1L, Timestamp.valueOf("2026-01-01 11:30:00"), 4.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n_events, sum_value FROM sessions ORDER BY user_id, n_events DESC")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows === Seq((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 5.0)),
        rows.mkString(","))
    } finally q.stop()
  }

  test("pii stream: stateless detection counts + redaction per micro-batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String, String)]
    val df = mem.toDF().toDF("doc_id", "source", "text")
    val q = StreamingValidate.piiRedactStream(df)
      .writeStream.format("memory").queryName("pii").outputMode("append").start()
    try {
      mem.addData(
        ("doc-e", "web", "write to alice@example.com or bob@test.org now"),
        ("doc-i", "web", "server at 192.168.0.17 timed out"),
        ("doc-p", "web", "call 555-0188 today"),
        ("doc-clean", "web", "no sensitive content here"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, n_email, n_ip, n_phone, redacted FROM pii")
        .collect().map(r => r.getString(0) ->
          ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
      assert(rows("doc-e") === ((2, 0, 0, "write to <EMAIL> or <EMAIL> now")))
      assert(rows("doc-i") === ((0, 1, 0, "server at <IP> timed out")))
      assert(rows("doc-p") === ((0, 0, 1, "call <PHONE> today")))
      assert(rows("doc-clean") === ((0, 0, 0, "no sensitive content here")))
    } finally q.stop()
  }

  test("decontam stream: stream-static broadcast join flags only n-gram-sharing docs") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bench = Seq(benchText).toDF("text")
      .select(org.apache.spark.sql.functions.explode(
        graft.pipeline.TextOps.wordNgramHashes(org.apache.spark.sql.functions.col("text"), 8)).as("ng"))
      .distinct()
    val mem = MemoryStream[(String, String, String)]
    val df = mem.toDF().toDF("doc_id", "source", "text")
    val q = StreamingValidate.decontamStream(df, bench)
      .writeStream.format("memory").queryName("decontam").outputMode("append").start()
    try {
      mem.addData(
        // contains bench 8-gram "beta...iota" verbatim -> 2 hits (positions 1,2 of its own 9 words)
        ("doc-hit", "web", "beta gamma delta epsilon zeta eta theta iota kappa"),
        ("doc-clean", "web", "one two three four five six seven eight nine ten"),
        ("doc-short", "web", "alpha beta gamma"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, ng FROM decontam").collect()
      assert(rows.map(_.getString(0)).toSet == Set("doc-hit"), rows.mkString(","))
      assert(rows.length == 2, s"expected the two overlapping 8-gram positions, got ${rows.length}")
    } finally q.stop()
  }
}
