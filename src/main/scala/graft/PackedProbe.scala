package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compilex.ConstraintCompiler
import graft.functions.TokenStats
import graft.suite.NorthStar
import graft.gen.TokenData

/** A/B probe: the full north-star suite over the `array<int>` layout vs
  * a PACKED-BINARY layout (tokens as one int32-LE BinaryType blob per
  * row).
  *
  * Motivation (BASELINE.md decomposition): ~57% of full-suite scan time
  * is parquet `array<int>` decode — parquet reassembles rep/def levels
  * into per-element UnsafeArrayData. The packed layout stores the same
  * tokens as ONE byte_array per row: decode is a length-prefixed memcpy,
  * and `token_stats_packed` computes the identical fused profile
  * straight from the bytes. Every fused constraint compiles unchanged
  * against the pre-materialized profile column (ConstraintCompiler
  * .withProfiles skips fields whose __prof_ column exists), so the
  * packed layout is a drop-in for the suite hot path — the trade is
  * losing per-element SQL access (explode/forall need an unpack step),
  * which the north-star suite never uses.
  *
  * Prints one JSON line: throughput on both layouts, speedup, on-disk
  * bytes, and a verdict-equality check (both layouts must agree on
  * rows + violations — a probe that only times would hide a wrong
  * result).
  */
object PackedProbe {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def dirBytes(p: String): Long = {
    val d = new java.io.File(p)
    if (!d.isDirectory) 0L
    else d.listFiles().filter(_.isFile).map(_.length()).sum
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-packed-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val arrayPath = s"${TokenData.dataRoot}/scaling/token_seqs"
    if (!new java.io.File(s"$arrayPath/_SUCCESS").exists())
      TokenData.writeTokens(TokenData.tokenTable(spark, 4000000L), arrayPath)
    val packedPath = s"${TokenData.dataRoot}/scaling_packed/token_seqs"
    if (!new java.io.File(s"$packedPath/_SUCCESS").exists())
      spark.read.parquet(arrayPath)
        .select(col("doc_id"), TokenStats.pack_ints(col("tokens")).as("tokens_bin"),
          col("n_tok"), col("source"))
        .write.mode("overwrite")
        .option("parquet.writer.version", "v2")
        .parquet(packedPath)

    def aggOf(df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("r"), sum(when(!col("row_valid"), 1L).otherwise(0L)).as("v"))

    val arrayJob = aggOf(ConstraintCompiler.withVerdicts(
      spark.read.parquet(arrayPath), NorthStar.suite, Set("tokens")))
    val packedJob = aggOf(ConstraintCompiler.withVerdicts(
      spark.read.parquet(packedPath)
        .withColumn(ConstraintCompiler.profCol("tokens"),
          TokenStats.token_stats_packed(col("tokens_bin"))),
      NorthStar.suite, Set("tokens")))

    // correctness first: both layouts must agree exactly
    val (ar, pr) = (arrayJob.head(), packedJob.head())
    val agree = ar.getLong(0) == pr.getLong(0) && ar.getLong(1) == pr.getLong(1)
    require(agree, s"layouts disagree: array=(${ar.getLong(0)},${ar.getLong(1)}) packed=(${pr.getLong(0)},${pr.getLong(1)})")

    // alternating rounds, min per layout (host phantom-load discipline)
    val rounds = (1 to 3).map { r =>
      if (r % 2 == 1) (time(arrayJob.head()), time(packedJob.head()))
      else { val p = time(packedJob.head()); val a = time(arrayJob.head()); (a, p) }
    }
    val ta = rounds.map(_._1).min
    val tp = rounds.map(_._2).min
    val rows = ar.getLong(0)
    val json =
      s"""{"probe":"packed_layout","rows":$rows,"verdicts_agree":$agree,""" +
      s""""rows_per_sec_array":${(rows / ta).toLong},"rows_per_sec_packed":${(rows / tp).toLong},""" +
      f""""speedup":${ta / tp}%.2f,"bytes_array":${dirBytes(arrayPath)},"bytes_packed":${dirBytes(packedPath)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("packed_probe.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
