package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline.TextOps._

/** One-off probe: decompose the 5k-doc pipeline queries' 3-5 s floor —
  * which fragment (scan+project, explode, window, join, rollup) carries
  * the time, and how much is per-job fixed overhead.
  */
object DocFragProbe {
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
    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-44s min=${ts.min}%7.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    time("docs scan+repartition")(docs)
    time("docs noRepartition")(spark.read.parquet(s"$sfDir/documents.parquet"))
    val base = docs.select(col("doc_id"), col("source"),
      array_distinct(wordNgramHashes(col("text"), 8)).as("ng"))
    time("base ngram projection")(base)
    val ex = base.select(col("doc_id"), col("source"), explode(col("ng")).as("ng"))
    time("ex explode")(ex)
    time("ex + window count")(
      ex.withColumn("ndocs", count(lit(1)).over(Window.partitionBy(col("ng")))))
    time("full d_dup_ngrams")(PipelineQueries.dupNgrams(spark, sfDir))
    // shingle side (the LSH substrate)

    // explode-cost hypothesis tests
    val baseCk = base.localCheckpoint(true)
    time("ex from checkpointed base")(
      baseCk.select(col("doc_id"), col("source"), explode(col("ng")).as("ng")))
    time("ex via repartition barrier")(
      base.repartition(32).select(col("doc_id"), col("source"), explode(col("ng")).as("ng")))
    val w8 = split(col("text"), " ")
    val ngInline = when(size(w8) >= 8,
      transform(sequence(lit(1), size(w8) - 7), i => md5(concat_ws(" ", slice(w8, i, lit(8))))))
      .otherwise(array().cast("array<string>"))
    time("explode WITHOUT array_distinct")(
      docs.select(col("doc_id"), col("source"), explode(ngInline).as("ng")))
    time("posexplode variant")(
      base.select(col("doc_id"), posexplode(col("ng"))))

    time("explode(array_distinct(split))")(
      docs.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t")))
    time("explode(sort_array(ngchain))")(
      docs.select(col("doc_id"), explode(sort_array(ngInline)).as("ng")))
    time("explode dedup-after via groupBy")(
      docs.select(col("doc_id"), col("source"), explode(ngInline).as("ng"))
        .groupBy(col("doc_id"), col("source"), col("ng")).agg(count(lit(1))))
    time("observe barrier then explode")(
      base.observe("b1", count(lit(1)))
        .select(col("doc_id"), col("source"), explode(col("ng")).as("ng")))
    time("shingleHashes projection")(
      docs.select(col("doc_id"), shingleHashes(col("text")).as("sh")))
    time("lshLong narrow sigs")(
      docs.select(col("doc_id"), shingleHashes(col("text")).as("_sh"))
        .select((col("doc_id") +: (0 until 4).map(b =>
          concat_ws("_", minhash(col("_sh"), 2 * b), minhash(col("_sh"), 2 * b + 1)).as(s"band$b"))): _*))
    time("full d_lsh_pairs")(PipelineQueries.lshPairs(spark, sfDir))

    // decontam decomposition
    {
      import graft.pipeline.TextOps._
      def ngBase = docs.select(col("doc_id"), col("source"),
        (substring(md5(col("doc_id").cast("string")), 1, 1) === "0").as("is_bench"),
        wordNgramHashes(col("text"), 8).as("ng"))
      time("ngBase projection")(ngBase)
      time("benchNg distinct")(ngBase.filter(col("is_bench")).select(explode(col("ng")).as("ng")).distinct())
      val t0 = System.nanoTime()
      val b = ngBase.filter(col("is_bench")).select(explode(col("ng")).as("ng")).distinct().localCheckpoint(true)
      val c = b.count()
      println(f"benchNg localCheckpoint+count wall=${(System.nanoTime()-t0)/1e9}%.3f (n=$c)")
      val trainNg = ngBase.filter(!col("is_bench")).select(col("doc_id"), col("source"), explode(col("ng")).as("ng"))
      time("trainNg join broadcast(b) + 2agg")(
        trainNg.join(broadcast(b), Seq("ng")).groupBy(col("doc_id"), col("source")).agg(count(lit(1)).as("hits"))
          .groupBy(col("source")).agg(count(lit(1)), sum(col("hits"))))

      val ngBaseB = ngBase.observe("ngbase_b", count(lit(1)))
      val trainNgB = ngBaseB.filter(!col("is_bench")).select(col("doc_id"), col("source"), explode(col("ng")).as("ng"))
      time("BARRIER trainNg join broadcast(b)+2agg")(
        trainNgB.join(broadcast(b), Seq("ng")).groupBy(col("doc_id"), col("source")).agg(count(lit(1)).as("hits"))
          .groupBy(col("source")).agg(count(lit(1)), sum(col("hits"))))
      time("trainNg only")(trainNg)
      time("trainNg BARRIER only")(trainNgB)
      time("checked rollup")(ngBase.filter(!col("is_bench")).groupBy(col("source")).agg(count(lit(1))))
    }
    time("full d_decontam")(PipelineQueries.decontam(spark, sfDir))
    spark.stop()
  }
}
