package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.Queries (engine: compression + compressed-domain
  * predicates) and graft.PipelineQueries (training-data pipeline ops).
  */
object SparkEntry {
  /** Flagship: the hero contains-pattern (the reference's `%special%`,
    * /root/reference/README.md:39) evaluated on compressed chunks at sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.containsTokens(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + the pipeline and
    * relational coverage suites. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.engineQueries ++ PipelineQueries.queries ++ RelationalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ PipelineQueries.oracles ++ RelationalQueries.oracles
}
