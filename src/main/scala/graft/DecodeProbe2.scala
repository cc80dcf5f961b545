package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compilex.ConstraintCompiler
import graft.suite.NorthStar
import graft.gen.TokenData

/** Phase-2 probe: combine the phase-1 winners (parquet v2 writer +
  * smaller splits), alternating configs per round so time-varying host
  * load can't bias one config. min-of-rounds per config.
  */
object DecodeProbe2 {

  private def session(cpus: Int, batch: Int, maxPart: String): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("decode-probe2")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.columnarReaderBatchSize", batch)
      .config("spark.sql.files.maxPartitionBytes", maxPart)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val root = s"${TokenData.dataRoot}/probe"

    val configs: Seq[(String, String, Int, String)] = Seq(
      ("v1_128", s"$root/v1_snappy", 4096, "128m"),
      ("v1_32", s"$root/v1_snappy", 4096, "32m"),
      ("v2_128", s"$root/v2_snappy", 4096, "128m"),
      ("v2_64", s"$root/v2_snappy", 4096, "64m"),
      ("v2_32", s"$root/v2_snappy", 4096, "32m"),
      ("v2_16", s"$root/v2_snappy", 4096, "16m"),
      ("v2_32_b8k", s"$root/v2_snappy", 8192, "32m"),
      ("v2n_32", s"$root/v2_none", 4096, "32m")
    )

    val best = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    (1 to 4).foreach { r =>
      val order = if (r % 2 == 1) configs else configs.reverse
      order.foreach { case (tag, path, batch, maxPart) =>
        val spark = session(32, batch, maxPart)
        val df = ConstraintCompiler.withVerdicts(spark.read.parquet(path), NorthStar.suite, Set("tokens"))
          .agg(count(lit(1)).as("r"), sum(when(!col("row_valid"), 1L).otherwise(0L)).as("v"))
        df.head()
        val s = { val t0 = System.nanoTime(); df.head(); (System.nanoTime() - t0) / 1e9 }
        if (s < best(tag)) best(tag) = s
        println(f"ROUND$r $tag%-10s $s%7.3f s")
      }
    }
    configs.foreach { case (tag, _, _, _) =>
      println(f"BEST $tag%-10s ${best(tag)}%7.3f s  ${nRows / best(tag) / 1e6}%6.2f M rows/s")
    }
  }
}
