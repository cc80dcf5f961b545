package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compilex.ConstraintCompiler
import graft.suite.NorthStar
import graft.gen.TokenData

/** One-off experiment harness: which parquet layout + reader config
  * decodes the token table fastest? BENCH notes identify array<int>
  * parquet decode (not constraint evaluation) as the full-suite
  * bottleneck past ~12 cores, so the headline rows/s is won or lost
  * here. Variants:
  *   - writer: parquet v1 (PLAIN/RLE+snappy) vs v2 (DELTA_BINARY_PACKED ints)
  *   - codec: snappy / lz4 / zstd / uncompressed
  *   - reader: columnarReaderBatchSize 4096 (default) vs 16384
  *   - split: maxPartitionBytes 128m (default) vs 64m (more waves/core)
  * Prints one line per (variant, config): min-of-3 exec seconds + rows/s.
  */
object DecodeProbe {

  private def session(cpus: Int, batch: Int, maxPart: String): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("decode-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.columnarReaderBatchSize", batch)
      .config("spark.sql.files.maxPartitionBytes", maxPart)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def fullSuite(spark: SparkSession, path: String): DataFrame =
    ConstraintCompiler.withVerdicts(spark.read.parquet(path), NorthStar.suite, Set("tokens"))
      .agg(count(lit(1)).as("r"), sum(when(!col("row_valid"), 1L).otherwise(0L)).as("v"))

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val root = s"${TokenData.dataRoot}/probe"

    // ---- write variants once ----
    val variants: Seq[(String, Map[String, String])] = Seq(
      "v1_snappy" -> Map("compression" -> "snappy"),
      "v2_snappy" -> Map("compression" -> "snappy", "parquet.writer.version" -> "v2"),
      "v1_lz4" -> Map("compression" -> "lz4"),
      "v1_zstd" -> Map("compression" -> "zstd"),
      "v2_none" -> Map("compression" -> "uncompressed", "parquet.writer.version" -> "v2")
    )
    var spark = session(32, 4096, "128m")
    variants.foreach { case (name, opts) =>
      val out = s"$root/$name"
      if (!new java.io.File(s"$out/_SUCCESS").exists()) {
        var w = TokenData.tokenTable(spark, nRows).write.mode("overwrite")
        opts.foreach { case (k, v) => w = w.option(k, v) }
        w.parquet(out)
      }
      val bytes = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      println(f"WROTE $name%-10s ${bytes / 1e6}%8.1f MB")
    }

    // ---- measure ----
    def run(tag: String, path: String, batch: Int, maxPart: String): Unit = {
      spark = session(32, batch, maxPart)
      val df = fullSuite(spark, path)
      df.head() // warm: codegen + page cache
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.head(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"PROBE $tag%-34s ${secs}%7.3f s  ${(nRows / secs / 1e6)}%6.2f M rows/s")
    }

    variants.foreach { case (name, _) => run(s"$name batch=4096 part=128m", s"$root/$name", 4096, "128m") }
    variants.foreach { case (name, _) => run(s"$name batch=16384 part=128m", s"$root/$name", 16384, "128m") }
    run("v1_snappy batch=4096 part=32m", s"$root/v1_snappy", 4096, "32m")
    run("v1_snappy batch=8192 part=64m", s"$root/v1_snappy", 8192, "64m")
    spark.stop()
  }
}
