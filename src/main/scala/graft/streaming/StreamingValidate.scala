package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.compilex.ConstraintCompiler
import graft.suite.Suite

/** Running per-source tallies carried as mapGroupsWithState state. */
final case class RunningVerdict(source: String, rows: Long, violations: Long) {
  def pass: Boolean = violations == 0L
}

/** Structured Streaming face of the engine. The reference is strictly
  * one-shot batch (PJS:cli.py:230-292, SURVEY.md §2.10); the engine's
  * constraint compiler is sink-agnostic by construction — the SAME
  * compiled Column predicates run unchanged under `readStream`, because
  * every row constraint is stateless/row-local (narrow, no shuffle).
  * State only enters through the windowed aggregation (watermarked) and
  * streaming dedup.
  */
object StreamingValidate {

  /** Per-(window, source) verdict aggregation over a stream of token
    * rows carrying an ingest timestamp. Watermark bounds the state; late
    * rows beyond it are dropped (documented engine semantics).
    */
  def verdictStream(stream: DataFrame, suite: Suite, fusedIntArrays: Set[String],
                    tsCol: String, watermark: String, windowLen: String): DataFrame =
    ConstraintCompiler.withVerdicts(stream, suite, fusedIntArrays)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("source"))
      .agg(
        count(lit(1)).as("rows"),
        sum(when(!col("row_valid"), 1L).otherwise(0L)).as("violations"))

  /** Streaming violation stream: the iter_errors analogue, incremental.
    * Stateless — safe for append-mode sinks at any scale.
    */
  def violationStream(stream: DataFrame, suite: Suite, fusedIntArrays: Set[String]): DataFrame =
    ConstraintCompiler.violations(stream, suite, fusedIntArrays = fusedIntArrays)

  /** Streaming doc_id uniqueness: watermarked dedup — the streaming
    * face of the salted-agg uniqueness check (exact within the
    * watermark horizon). dropDuplicatesWithinWatermark is load-bearing:
    * plain dropDuplicates("doc_id") only evicts state when the
    * event-time column is part of the key, so a forever-stream would
    * grow one state entry per unique doc_id unboundedly (round-4
    * review); the WithinWatermark variant expires entries as the
    * watermark passes them.
    */
  def dedupStream(stream: DataFrame, tsCol: String, watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("doc_id")

  /** Per-window source-mix PSI vs a baseline snapshot — the streaming
    * face of [[graft.checks.Drift.psiSourceMix]]. The snapshot's
    * per-source shares are collected ONCE on the driver (it is a
    * #sources-row frame) and folded into the aggregation as literals,
    * so each window costs exactly ONE stateful aggregation: per-source
    * conditional counts plus the ε-smoothed PSI arithmetic in the same
    * select — no chained streaming aggs, no join against the stream.
    * Baseline keys define the mix universe; a source absent from the
    * baseline is already a referential violation and is counted in
    * `rows` but not in any share (mirroring the batch ε-floor).
    */
  def driftStream(stream: DataFrame, snapshot: DataFrame, tsCol: String,
                  watermark: String, windowLen: String, eps: Double = 1e-6): DataFrame = {
    val base = snapshot.filter(col("kind") === "source_mix")
      .select(col("key"), col("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    require(base.nonEmpty, "driftStream: snapshot has no source_mix rows — wrong path or kind?")
    val total = base.map(_._2).sum.toDouble
    require(total > 0, "driftStream: snapshot source_mix counts sum to zero")
    val shares = base.map { case (k, c) => k -> (c / total) }.sortBy(_._1)
    // count columns aliased by INDEX, not by value: a source name with a
    // '.' or '`' in it would break col() resolution (dots parse as
    // struct-field access)
    val counts = shares.zipWithIndex.map { case ((s, _), i) =>
      sum(when(col("source") === s, 1L).otherwise(0L)).as(s"__n_$i")
    // NULL source: `!isin(...)` is SQL NULL on null input, which would
    // silently route null-source rows to otherwise(0) — diluting every p
    // term instead of registering as unknown-source drift (round-2
    // ADVICE, low). coalesce-to-true counts them toward __n_other,
    // matching the stated "absent from baseline" semantics.
    } :+ sum(when(coalesce(!col("source").isin(shares.map(_._1): _*), lit(true)), 1L)
      .otherwise(0L)).as("__n_other")
    val agg = stream.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("rows"), counts: _*)
    val knownTerms = shares.zipWithIndex.map { case ((_, q), i) =>
      val p = greatest(col(s"__n_$i").cast("double") / col("rows"), lit(eps))
      val ql = greatest(lit(q), lit(eps))
      (p - ql) * log(p / ql)
    }
    // sources ABSENT from the baseline get the batch full_outer's
    // dominant (p-eps)*ln(p/eps) contribution as one lumped term (the
    // new-source drift signal must not vanish; batch emits one term per
    // unknown source, the stream lumps them — equal when one unknown
    // source appears, a lower bound when several do). When no unknown
    // rows arrive, p floors to eps and the term is exactly zero.
    val pOther = greatest(col("__n_other").cast("double") / col("rows"), lit(eps))
    val psi = (knownTerms :+ (pOther - lit(eps)) * log(pOther / lit(eps))).reduce(_ + _)
    agg.select(col("window"), col("rows"), round(psi, 6).as("psi"))
  }

  /** Streaming DECONTAMINATION: the in-flight face of the batch
    * d_decontam ledger — each arriving document's word-8-gram hashes
    * are checked against the STATIC benchmark n-gram dimension via a
    * stream-static broadcast join (the supported stream-static inner
    * join; the static side is tiny by construction, so nothing of the
    * stream ever shuffles). Stateless — append-safe at any scale; one
    * output row per contaminated (doc, n-gram) occurrence, the
    * violation-stream shape a curation pipeline quarantines on.
    */
  def decontamStream(stream: DataFrame, benchNgrams: DataFrame): DataFrame =
    stream.select(col("doc_id"), col("source"),
        explode(graft.pipeline.TextOps.wordNgramHashes(col("text"), 8)).as("ng"))
      // distinct BEFORE the join: an n-gram present in several benchmark
      // docs must still flag a stream position exactly once — without it
      // duplicate static rows multiply the output
      .join(broadcast(benchNgrams.select(col("ng")).distinct()), Seq("ng"))
      .select(col("doc_id"), col("source"), col("ng"))

  /** Streaming quality-funnel filter: the in-flight face of
    * d_filter_funnel's final stage — a stateless row-local predicate
    * (length floor, stopword floor, dup-word/dup-bigram ceilings), so
    * it composes with any sink mode and shuffles nothing.
    */
  def funnelStream(stream: DataFrame): DataFrame =
    stream.filter(graft.PipelineQueries.funnelKeepCol)

  /** CONTINUOUS LANDING-ZONE VALIDATION: the compiled suite over a
    * FILE-SOURCE stream — parquet files dropped into the directory are
    * picked up and validated incrementally (maxFilesPerTrigger bounds
    * each micro-batch's IO), emitting the same violation rows as the
    * batch path. The streaming complement of ValidateJob's file-lineage
    * restart: one watches a landing zone, the other recovers a batch
    * table; both validate each file exactly once. Stateless.
    */
  def fileStreamViolations(spark: org.apache.spark.sql.SparkSession, dir: String,
                           schema: org.apache.spark.sql.types.StructType,
                           suite: Suite, fusedIntArrays: Set[String],
                           maxFilesPerTrigger: Int = 16): DataFrame =
    ConstraintCompiler.violations(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(dir),
      suite, fusedIntArrays = fusedIntArrays)

  /** Streaming SESSIONIZATION: native session windows (gap-based, the
    * in-flight face of the batch q_sessionize lag+cumsum idiom) — one
    * stateful aggregation whose state is pruned by the watermark, so a
    * forever-stream holds only open sessions plus the late-data
    * horizon. Spark merges windows that the gap bridges ACROSS
    * micro-batches — the part a hand-rolled mapGroupsWithState gets
    * wrong first.
    */
  def sessionStream(stream: DataFrame, tsCol: String, gap: String,
                    watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming PII REDACTION: the in-flight face of the batch d_pii
    * ledger — per-row regex detection counts plus the globally-redacted
    * text, all in one stateless codegen'd projection (map-only: no
    * state, no shuffle, composes with any output mode). The shape a
    * privacy-scrubbing ingest stage writes onward instead of the raw
    * text.
    */
  def piiRedactStream(stream: DataFrame): DataFrame = {
    import graft.PipelineQueries.{EmailRe, Ipv4Re, PhoneRe}
    // the same redaction chain as the batch ledger — shared definition,
    // so batch checksum and streamed text stay byte-for-byte equal
    val red = graft.PipelineQueries.redactCol(col("text"))
    stream.select(col("doc_id"), col("source"),
      regexp_count(col("text"), lit(EmailRe)).as("n_email"),
      regexp_count(col("text"), lit(Ipv4Re)).as("n_ip"),
      regexp_count(col("text"), lit(PhoneRe)).as("n_phone"),
      red.as("redacted"))
  }

  /** Lifetime running verdict per source via custom state
    * (mapGroupsWithState): each micro-batch folds its rows into the
    * per-source state and emits the updated totals — the streaming
    * equivalent of the batch per-partition verdict table, but
    * incremental across batches. State is one small record per source
    * (bounded by source cardinality, not row count).
    */
  def runningVerdictStream(stream: DataFrame, suite: Suite,
                           fusedIntArrays: Set[String]): Dataset[RunningVerdict] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val verdicts = ConstraintCompiler.withVerdicts(stream, suite, fusedIntArrays)
      .select(col("source"), col("row_valid")).as[(String, Boolean)]
    verdicts.groupByKey(_._1)
      .mapGroupsWithState[RunningVerdict, RunningVerdict](GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(String, Boolean)], state: GroupState[RunningVerdict]) =>
          var n = 0L; var bad = 0L
          rows.foreach { case (_, ok) => n += 1; if (!ok) bad += 1 }
          val prev = state.getOption.getOrElse(RunningVerdict(src, 0L, 0L))
          val next = RunningVerdict(src, prev.rows + n, prev.violations + bad)
          state.update(next)
          next
      }
  }
}
