package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.compilex.ConstraintCompiler
import graft.suite.NorthStar
import graft.gen.TokenData

/** One-off: does 16m vs 128m maxPartitionBytes matter at p32 and p8 on
  * the 128-file v2 scaling dataset? Alternating rounds, min.
  */
object SplitProbe {
  def session(cpus: Int, maxPart: String): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", maxPart)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val path = s"${TokenData.dataRoot}/scaling_4000000_128/token_seqs"
    val configs = Seq(("p32_32m", 32, "32m"), ("p32_64m", 32, "64m"), ("p32_128m", 32, "128m"),
      ("p8_64m", 8, "64m"), ("p8_128m", 8, "128m"))
    val best = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    (1 to 4).foreach { r =>
      val order = if (r % 2 == 1) configs else configs.reverse
      order.foreach { case (tag, cpus, mp) =>
        val spark = session(cpus, mp)
        val df = ConstraintCompiler.withVerdicts(spark.read.parquet(path), NorthStar.suite, Set("tokens"))
          .agg(count(lit(1)), sum(when(!col("row_valid"), 1L).otherwise(0L)))
        df.head() // warm
        val t0 = System.nanoTime(); df.head(); val s = (System.nanoTime() - t0) / 1e9
        if (s < best(tag)) best(tag) = s
        println(f"SPLIT round$r $tag%-10s $s%6.2f s")
      }
    }
    configs.foreach { case (tag, _, _) => println(f"SPLITBEST $tag%-10s ${best(tag)}%6.2f s ${4000000 / best(tag) / 1e6}%5.2f M rows/s") }
  }
}
