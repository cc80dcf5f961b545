package graft.checks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Global key-uniqueness check — `uniqueItems` semantics
  * (PJS:_utils.py:156-181) lifted from one array to a 10^12-row key
  * column, per BASELINE.json north_star: "checks uniqueness of doc_id
  * with salted aggregate + HLL pre-filter".
  *
  * Scale design:
  *  1. HLL pre-filter: `approx_count_distinct(key)` vs `count(*)` in one
  *     partial+final agg (no shuffle of raw rows — HLL++ sketches merge).
  *     FAST-FAIL SIGNAL ONLY: an estimate far below the row count proves
  *     duplicates exist (alert/abort early); a near-equal estimate
  *     certifies NOTHING — at rsd=0.01 the sketch noise (~1%) can hide
  *     up to ~1% duplicate keys. Certification always requires phase 2.
  *  2. Exact phase (only when needed): two-phase salted aggregation —
  *     first `groupBy(salt, key)` (salt = hash(key) mod S spreads any
  *     hot key ranges across S*P reducers), then re-agg by key. For a
  *     true key column the first phase's map-side combine already
  *     collapses almost everything; the salt bounds the worst case where
  *     one key value repeats billions of times (which would otherwise
  *     pin one reducer).
  */
object Uniqueness {

  final case class HllVerdict(rows: Long, approxDistinct: Long, mayHaveDups: Boolean)

  /** Phase 1: sketch-only pre-filter. rsd=0.01 → ~1% relative error.
    * `mayHaveDups = true` is a definite early-warning; `false` means
    * only "no duplicates VISIBLE above the sketch noise" — callers must
    * still run [[duplicateKeys]] to certify (round-1 ADVICE, high).
    */
  def hllPrefilter(df: DataFrame, key: String, rsd: Double = 0.01): HllVerdict = {
    val r = df.agg(
      count(lit(1)).as("rows"),
      approx_count_distinct(col(key), rsd).as("ad")).head()
    val rows = r.getLong(0); val ad = r.getLong(1)
    // duplicates LIKELY iff the estimate sits below the row count by
    // MORE than sketch noise (3·rsd). A tighter 0.1%-of-rows disjunct
    // used to sit here — inside the sketch's ~1% error band, so it
    // fired on perfectly clean tables about half the time (round-4
    // review); `true` must stay a definite early-warning.
    HllVerdict(rows, ad, ad < (rows * (1 - 3 * rsd)).toLong)
  }

  /** Phase 2: exact duplicate keys via salted two-phase aggregation.
    * Returns (key, dup_count) for keys appearing more than once.
    *
    * The salt derives from the INPUT PARTITION, not from the key: a
    * salt that is a function of the grouping key sends every instance
    * of a hot key to the same reducer anyway — a no-op spread plus an
    * extra shuffle (round-4 review). Partition-derived salt splits a
    * billion-repeat key across up to `salt` reducers in phase 1; phase
    * 2 then combines ≤ salt pre-aggregated rows per key. Counts are
    * exact regardless of partition layout.
    */
  def duplicateKeys(df: DataFrame, key: String, salt: Int = 64): DataFrame = {
    df.select(col(key))
      .groupBy(pmod(spark_partition_id().cast("long"), lit(salt.toLong)).as("_salt"), col(key))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(key))
      .agg(sum("_c").as("dup_count"))
      .filter(col("dup_count") > 1)
  }

  /** Full violation rows for duplicated keys: join dup keys (small —
    * broadcast) back to the table. The join side with duplicates is tiny
    * relative to the table, so Catalyst/AQE picks broadcast; we force it.
    */
  def duplicateRows(df: DataFrame, key: String, salt: Int = 64): DataFrame = {
    val dups = duplicateKeys(df, key, salt)
    df.join(broadcast(dups), Seq(key), "inner")
  }
}
