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
  * IO (PartitionFilters in the scan node — asserted in TableIOSpec).
  */
class PartitionedParquetIO(partCol: String = "source") extends TableIO {
  override def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)

  override def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  override def readPartitions(spark: SparkSession, path: String, partCol: String, parts: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(path).filter(col(partCol).isin(parts: _*))
  }
}
