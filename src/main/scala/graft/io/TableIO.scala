package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table IO seam (SURVEY.md §1.3): the engine's partition semantics are
  * written against this trait, with Hive-style partitioned Parquet as
  * the default implementation. An Iceberg implementation is a drop-in
  * when the runtime jar is present (none ships in /opt/spark/jars —
  * verified); partition pruning and per-partition verdict semantics are
  * identical for both layouts.
  */
trait TableIO {
  def write(df: DataFrame, path: String): Unit
  def read(spark: SparkSession, path: String): DataFrame
  /** Read only the given partitions — MUST prune at scan level. */
  def readPartitions(spark: SparkSession, path: String, partCol: String, parts: Seq[String]): DataFrame
}

/** Default: parquet partitioned by the partition column (dir-per-value).
  * A filter on the partition column prunes entire directories before any
  * IO (PartitionFilters in the scan node — asserted in ValidateJobSpec).
  */
class PartitionedParquetIO(partCol: String = "source") extends TableIO {
  override def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)

  override def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Note: the FILTER column is the `partCol` argument (per the trait
    * contract — callers may prune on any column); the constructor's
    * `partCol` governs only the write layout. The Hive null-partition
    * sentinel selects the NULL slice via isNull — a bare isin never
    * matches NULL, which would silently return zero rows for the one
    * partition value the rest of the engine round-trips (round-4
    * review).
    */
  override def readPartitions(spark: SparkSession, path: String, partCol: String, parts: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val sentinel = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    val (nulls, vals) = parts.partition(_ == sentinel)
    val base = if (vals.nonEmpty) col(partCol).isin(vals: _*) else org.apache.spark.sql.functions.lit(false)
    val pred = if (nulls.nonEmpty) base || col(partCol).isNull else base
    spark.read.parquet(path).filter(pred)
  }
}

/** BUCKETED tables: pre-shuffle ONCE at write time on the join/agg key.
  * Spark's bucketBy stores the hash-partitioning in the catalog, so
  * every later equi-join or aggregation on that key between tables
  * bucketed the same way runs with NO Exchange — at 100 TB the
  * write-once shuffle amortizes across every downstream join (the dim
  * table too big to broadcast joins the fact table co-located). The
  * catalog-table requirement is Spark's: bucket metadata lives in the
  * catalog, not the parquet footer, which is why this seam is
  * saveAsTable-based while PartitionedParquetIO is path-based.
  */
object BucketedIO {
  /** Write `df` as a bucketed catalog table: `buckets` hash buckets on
    * `key`, sorted within buckets (enables in-bucket merge joins
    * without an extra Sort when Spark can use it).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Equi-join of two same-bucketed tables: shuffle-free by layout.
    * BucketedIOSpec asserts the plan carries ZERO Exchange nodes.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Aggregation on the bucket key of a bucketed table: the partial/
    * final agg pair collapses to one stage with no Exchange because
    * rows are already hash-partitioned by the key.
    */
  def colocatedAgg(spark: SparkSession, table: String, key: String,
                   aggs: (String, String)*): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val head = expr(s"${aggs.head._1} as ${aggs.head._2}")
    val tail = aggs.tail.map(a => expr(s"${a._1} as ${a._2}"))
    spark.table(table).groupBy(key).agg(head, tail: _*)
  }
}
