package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compilex.ConstraintCompiler
import graft.suite.NorthStar
import graft.gen.TokenData

/** Standalone N-vs-4N scaling probe for the full-suite validation job.
  * Usage: runMain graft.ScalingProbe [rows] [nFiles] [rounds]
  */
object ScalingProbe {
  private def newSession(cpus: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(128)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val fused: Set[String] = if (args.lift(3).contains("plain")) Set.empty else Set("tokens")
    val path = s"${TokenData.dataRoot}/scaling_${rows}_$nFiles/token_seqs"
    var spark = newSession(32)
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      TokenData.writeTokens(TokenData.tokenTable(spark, rows, nFiles), path)

    def measure(p: Int): Double = {
      spark = newSession(p)
      val df = ConstraintCompiler.withVerdicts(spark.read.parquet(path), NorthStar.suite, fused)
        .agg(count(lit(1)).as("r"), sum(when(!col("row_valid"), 1L).otherwise(0L)).as("v"))
      df.head() // warm
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); df.head(); (System.nanoTime() - t0) / 1e9
      }.min
    }
    val res = (1 to rounds).map { r =>
      val t8 = measure(8); val t32 = measure(32)
      println(f"  round$r p8=${t8}%.2fs p32=${t32}%.2fs")
      (t8, t32)
    }
    val t8 = res.map(_._1).min; val t32 = res.map(_._2).min
    println(f"SCALING rows=$rows files=$nFiles p8=${rows / t8}%.0f rows/s p32=${rows / t32}%.0f rows/s eff=${(t8 / t32) / 4.0}%.3f")
    spark.stop()
  }
}
