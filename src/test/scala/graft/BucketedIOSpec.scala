package graft

import org.apache.spark.sql.functions._
import graft.gen.TokenData
import graft.io.BucketedIO

/** The bucketed-layout seam: pre-shuffling at write time must make
  * later key-joins and key-aggregations Exchange-free — the layout
  * decision that amortizes one shuffle across every downstream join at
  * 100 TB scale.
  */
class BucketedIOSpec extends SparkSpec {

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-located join of two same-bucketed tables runs with ZERO Exchange") {
    val t = TokenData.tokenTable(spark, 3000, 4)
    BucketedIO.writeBucketed(t.select("doc_id", "n_tok"), "bk_fact", "doc_id", 8)
    BucketedIO.writeBucketed(
      t.select(col("doc_id"), col("source")).dropDuplicates("doc_id"),
      "bk_dim", "doc_id", 8)
    try withNoBroadcast {
      val j = BucketedIO.colocatedJoin(spark, "bk_fact", "bk_dim", "doc_id")
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed equi-join must be shuffle-free:\n$plan")
      // and it still computes the right thing
      val viaJoin = j.count()
      val expected = t.select("doc_id").count()
      assert(viaJoin === expected)

      // CONTRAST: the same join from raw (unbucketed) frames shuffles
      val raw = t.select("doc_id", "n_tok")
        .join(t.select(col("doc_id"), col("source")).dropDuplicates("doc_id"), Seq("doc_id"))
      assert(raw.queryExecution.executedPlan.toString().contains("Exchange"),
        "control: the unbucketed join should need an Exchange")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_fact")
      spark.sql("DROP TABLE IF EXISTS bk_dim")
    }
  }

  test("aggregation on the bucket key is Exchange-free and exact") {
    val t = TokenData.tokenTable(spark, 2000, 4)
    BucketedIO.writeBucketed(t.select("doc_id", "n_tok"), "bk_agg", "doc_id", 8)
    try {
      val a = BucketedIO.colocatedAgg(spark, "bk_agg", "doc_id",
        "count(1)" -> "n", "sum(n_tok)" -> "sum_ntok")
      val plan = a.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"agg on the bucket key must be shuffle-free:\n$plan")
      val got = a.agg(sum("n"), sum("sum_ntok")).head()
      val exp = t.agg(count(lit(1)), sum("n_tok")).head()
      assert(got.getLong(0) === exp.getLong(0) && got.getLong(1) === exp.getLong(1))
    } finally spark.sql("DROP TABLE IF EXISTS bk_agg")
  }
}
