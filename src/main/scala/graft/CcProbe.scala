package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: round count and per-phase wall time of the
  * ConnectedComponents chain behind d_dup_clusters / d_dedup_keep* /
  * d_curate_ledger at a given sf.
  */
object CcProbe {
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
    (1 to 3).foreach { rep =>
      var t0 = System.nanoTime()
      def lap(name: String): Unit = {
        println(f"[$rep] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f")
        t0 = System.nanoTime()
      }
      val pairs = PipelineQueries.lshPairs(spark, sfDir).filter(col("is_dup"))
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
      val n = pairs.count()
      lap(s"lshPairs dup edges (n=$n)")
      val comp = graft.pipeline.ConnectedComponents.components(pairs)
      comp.write.format("noop").mode("overwrite").save()
      lap("components")
    }
    spark.stop()
  }
}
