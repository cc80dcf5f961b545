package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by domain objects:
  *  - [[ValidationQueries]]: the north-star constraint engine over the
  *    deterministic token table (BASELINE.json).
  */
object SparkEntry {
  /** Flagship: full north-star suite verdict-by-partition on the sf0.001
    * token table (driver smoke-checks rows > 0).
    */
  def entry(spark: SparkSession): DataFrame =
    ValidationQueries.verdictBySource(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ValidationQueries.queries ++ RelationalQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ValidationQueries.oracles ++ RelationalQueries.oracles ++ PipelineQueries.oracles
}
