package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.run.ValidateJob
import graft.io.PartitionedParquetIO
import graft.gen.TokenData
import graft.suite.NorthStar

/** End-to-end ValidateJob: full run, resume-skips-completed, identical
  * final output; partition pruning reaches the scan.
  */
class ValidateJobSpec extends SparkSpec {

  private def tmp(name: String) = s"/tmp/graft-vj-${name}-${System.nanoTime()}"

  test("partitioned write + partition filter prunes at scan level") {
    val io = new PartitionedParquetIO("source")
    val path = tmp("io")
    io.write(TokenData.tokenTable(spark, 3000, 4), path)
    val pruned = io.readPartitions(spark, path, "source", Seq("wiki"))
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("source"),
      s"expected partition filters in scan:\n$plan")
    assert(pruned.select("source").distinct().collect().map(_.getString(0)).toSet == Set("wiki"))
  }

  test("validate run writes verdicts + violations; resume skips completed partitions") {
    val table = tmp("table"); val out1 = tmp("out1"); val ckpt = tmp("ckpt")
    new PartitionedParquetIO("source").write(TokenData.tokenTable(spark, 4000, 4), table)

    ValidateJob.run(spark, table, out1, ckpt)
    val verdicts = spark.read.parquet(s"$out1/verdicts")
    val parts = verdicts.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(parts.map(_._1).toSet.contains("spam"))
    assert(parts.forall(!_._4), "every partition has injected violations")
    assert(parts.map(_._2).sum == 4000)

    // manifest complete
    val hash = ValidateJob.suiteHash(NorthStar.suite)
    val done = ValidateJob.completed(ckpt, hash)
    assert(done == parts.map(_._1).toSet)

    // resume: second run with same checkpoint must skip all partitions
    // (manifest gains no new lines) and still produce the verdict table
    val linesBefore = Files.readAllLines(Paths.get(ckpt, "manifest.jsonl")).size()
    val out2 = tmp("out2")
    ValidateJob.run(spark, table, out2, ckpt)
    val linesAfter = Files.readAllLines(Paths.get(ckpt, "manifest.jsonl")).size()
    assert(linesAfter == linesBefore, "resume must not revalidate completed partitions")
    val v2 = spark.read.parquet(s"$out2/verdicts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(v2 == parts.toSet, "resumed output must equal original")
  }

  test("suite change invalidates checkpoint (hash mismatch forces revalidation)") {
    val table = tmp("t2"); val out = tmp("o3"); val ckpt = tmp("c2")
    new PartitionedParquetIO("source").write(TokenData.tokenTable(spark, 1000, 2), table)
    ValidateJob.run(spark, table, out, ckpt)
    val otherSuite = NorthStar.suite.copy(name = "other",
      constraints = NorthStar.suite.constraints.take(2))
    assert(ValidateJob.completed(ckpt, ValidateJob.suiteHash(otherSuite)).isEmpty)
  }
}
