package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.compilex.ConstraintCompiler
import graft.suite.NorthStar
import graft.gen.TokenData

/** One-off: decompose full-suite scan time into (no-array scan) vs
  * (array decode) vs (decode + all constraints). Alternating rounds.
  */
object DecompProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = s"${TokenData.dataRoot}/scaling_4000000_128/token_seqs"
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      TokenData.writeTokens(TokenData.tokenTable(spark, 4000000L, 128), path)
    val df = spark.read.parquet(path)

    val jobs = Seq(
      "scan-no-arrays (doc_id only)" ->
        df.select("doc_id").agg(count(col("doc_id"))),
      "decode-arrays (sum size)" ->
        df.agg(sum(size(col("tokens")))),
      "decode+token_stats only" ->
        df.select(graft.functions.TokenStats.token_stats(col("tokens")).as("s"))
          .agg(sum(col("s.n")), min(col("s.tmin")), max(col("s.tmax")), sum(col("s.dups"))),
      "decode+full suite (8 constraints)" ->
        ConstraintCompiler.withVerdicts(df, NorthStar.suite, Set("tokens"))
          .agg(count(lit(1)), sum(when(!col("row_valid"), 1L).otherwise(0L))))

    jobs.foreach(_._2.head()) // warm
    val best = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    (1 to 4).foreach { r =>
      val order = if (r % 2 == 1) jobs else jobs.reverse
      order.foreach { case (tag, q) =>
        val t0 = System.nanoTime(); q.head(); val s = (System.nanoTime() - t0) / 1e9
        if (s < best(tag)) best(tag) = s
      }
    }
    jobs.foreach { case (tag, _) =>
      println(f"DECOMP $tag%-36s ${best(tag)}%6.2f s  ${4000000 / best(tag) / 1e6}%5.2f M rows/s")
    }
    spark.stop()
  }
}
