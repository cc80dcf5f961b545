package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compilex.ConstraintCompiler
import graft.suite.NorthStar
import graft.gen.TokenData

/** Controlled A/B microbenchmark of the full-suite hot path.
  * Usage: runMain graft.Microbench [sfDir] [cpus] [reps]
  */
object Microbench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = TokenData.ensure(spark, sfDir)

    def run(fused: Set[String]): Double = {
      val df = ConstraintCompiler.withVerdicts(spark.read.parquet(path), NorthStar.suite, fused)
        .agg(count(lit(1)), sum(when(!col("row_valid"), 1L).otherwise(0L)))
      val t0 = System.nanoTime(); df.head(); (System.nanoTime() - t0) / 1e9
    }
    // JIT + page-cache warmup; ALTERNATE configs per round (the host
    // shows phantom load spikes lasting seconds — alternation + min
    // keeps a spike from biasing one config)
    run(Set("tokens")); run(Set.empty)
    val pairs = (1 to reps).map(_ => (run(Set("tokens")), run(Set.empty)))
    pairs.zipWithIndex.foreach { case ((f, p), i) => println(f"  rep$i fused=$f%.2fs plain=$p%.2fs") }
    val fusedT = pairs.map(_._1).min
    val plainT = pairs.map(_._2).min
    val rows = TokenData.rowsFor(new java.io.File(sfDir).getName)
    println(f"MICROBENCH rows=$rows fused=${fusedT}%.2fs (${rows / fusedT}%.0f rows/s) " +
      f"plain=${plainT}%.2fs (${rows / plainT}%.0f rows/s) speedup=${plainT / fusedT}%.2fx")
    spark.stop()
  }
}
