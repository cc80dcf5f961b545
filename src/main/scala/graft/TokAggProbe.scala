package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off probe: where does the 264M-instance wordcount aggregation
  * spend its time — the Generate (explode), the partial hash agg keyed
  * (source string, token int), or the exchange? Times each stage shape
  * with the noop sink. Results feed OPTIMIZATION_r06.md.
  */
object TokAggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val toks = graft.gen.TokenData.read(spark, sfDir)
    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-40s min=${ts.min}%7.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val ex = toks.select(col("source"), explode(col("tokens")).as("token"))
    time("explode only")(ex)
    time("explode+count global")(ex.agg(count(lit(1))))
    time("explode+groupBy(token)")(ex.groupBy("token").count())
    time("explode+groupBy(source,token)")(ex.groupBy("source", "token").count())
    time("explode+groupBy(source,token) 2phase")(
      ex.groupBy("source", "token").count()
        .groupBy("source").agg(sum("count")))
    // per-row pre-count: sort each row's array then count runs? instead:
    // aggregate token histogram via per-row HOF into (token, cnt_in_row)?
    time("explode tokens only, groupBy(token)")(
      toks.select(explode(col("tokens")).as("token")).groupBy("token").count())

    // variant: int-only composite keys
    time("agg by (xxhash64(source), token)")(
      ex.groupBy(xxhash64(col("source")).as("sid"), col("token")).count())
    val srcMap = Seq("web","books","code","wiki","forums").zipWithIndex
    val sidExpr = srcMap.foldLeft(lit(-1)){ case (acc,(s0,i)) => when(col("source")===s0, lit(i)).otherwise(acc) }
    time("agg by (when-chain sid, token)")(
      toks.select(sidExpr.as("sid"), explode(col("tokens")).as("token")).groupBy("sid","token").count())
    time("agg by single long key sid*2^20+token")(
      toks.select(sidExpr.as("sid"), explode(col("tokens")).as("token"))
        .groupBy((col("sid").cast("long")*lit(1048576L)+col("token")).as("k")).count())
    spark.stop()
  }
}
