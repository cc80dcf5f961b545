package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.compilex.ConstraintCompiler
import graft.gen.TokenData

/** One-off: alternating head-to-head of contains implementations and
  * failCounts-vs-explode on the noisy host (min over rounds).
  */
object MatrixProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = TokenData.read(spark, "/root/testdata/sf0.1")
    df.count()

    val fExists = df.agg(sum(when(!exists(col("tokens"), e => e <= lit(63)), 1L).otherwise(0L)))
    val fFilter = df.agg(sum(when(!(size(filter(col("tokens"), e => e <= lit(63))) >= lit(1)), 1L).otherwise(0L)))
    val fAggr = df.agg(sum(when(!(aggregate(col("tokens"), lit(false),
      (acc, e) => acc || (e <= lit(63)))), 1L).otherwise(0L)))
    val fCounts = ConstraintCompiler.failCounts(df, ValidationQueries.KeywordMatrix)
    val fExplode = df.select(explode(ConstraintCompiler.checksColumn(ValidationQueries.KeywordMatrix)).as("c"))
      .groupBy(col("c.cid")).agg(sum(when(!col("c.pass"), 1L).otherwise(0L)), count(lit(1)))

    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    val jobs = Seq(
      "contains-exists" -> (() => { fExists.head(); () }),
      "contains-filter" -> (() => { fFilter.head(); () }),
      "contains-aggregate" -> (() => { fAggr.head(); () }),
      "matrix-failCounts" -> (() => noop(ConstraintCompiler.failCounts(df, ValidationQueries.KeywordMatrix))),
      "matrix-explode" -> (() => noop(df.select(explode(ConstraintCompiler.checksColumn(ValidationQueries.KeywordMatrix)).as("c"))
        .groupBy(col("c.cid")).agg(sum(when(!col("c.pass"), 1L).otherwise(0L)), count(lit(1))))))

    val best = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    jobs.foreach(_._2()) // warm all plans
    (1 to 4).foreach { r =>
      val order = if (r % 2 == 1) jobs else jobs.reverse
      order.foreach { case (tag, f) =>
        val t0 = System.nanoTime(); f(); val s = (System.nanoTime() - t0) / 1e9
        if (s < best(tag)) best(tag) = s
      }
    }
    jobs.foreach { case (tag, _) => println(f"MATRIX ${tag}%-20s ${best(tag)}%7.3f s") }
    spark.stop()
  }
}
