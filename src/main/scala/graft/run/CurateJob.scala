package graft.run

import org.apache.spark.sql.SparkSession

/** spark-submit main for the END-TO-END curation pipeline: documents →
  * benchmark-slice exclusion → quality funnel → decontamination →
  * dedup canonicalization → tokenization, writing the curated corpus
  * in the north-star token-table shape plus the per-source survival
  * ledger. The composed semantics are DuckDB-oracled as the
  * d_curate_ledger driver-gate query; this main is the operational
  * wrapper a pipeline actually launches.
  *
  *   spark-submit --class graft.run.CurateJob ... <sfDir> <outDir>
  */
object CurateJob {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft_curate")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir)
    spark.stop()
  }

  /** Writes `outDir/ledger` (single-file JSON, per-source counts) and
    * `outDir/curated` (parquet, partitioned by source — the layout the
    * validation engine's partition loop consumes downstream).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    // the expensive intermediates — LSH + connected-components dedup
    // and the decontamination n-gram join — feed BOTH writes; persist
    // the doc_id frames (tiny next to the corpus, spillable) so each
    // pipeline runs once, not once per output (round-4 review)
    val contam = graft.PipelineQueries.contamDocIds(spark, sfDir).persist()
    val dropped = graft.PipelineQueries.droppedDocIds(spark, sfDir).persist()
    try {
      graft.PipelineQueries.curateLedgerWith(spark, sfDir, contam, dropped)
        .coalesce(1).write.mode("overwrite").json(s"$outDir/ledger")
      graft.PipelineQueries.curatedTokensWith(spark, sfDir, contam, dropped)
        .write.mode("overwrite").partitionBy("source").parquet(s"$outDir/curated")
    } finally {
      contam.unpersist()
      dropped.unpersist()
    }
    val kept = spark.read.parquet(s"$outDir/curated").count()
    println(s"[curate] $sfDir -> $outDir: $kept curated sequences")
  }
}
