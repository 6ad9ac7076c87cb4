package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
import graft.functions.{ScalarQueries, SemiStructuredQueries}
import graft.streaming.StreamQueries
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join lineitem⋈orders⋈customer⋈nation⋈region → revenue by region.
    */
  def entry(spark: SparkSession): DataFrame =
    JoinQueries.queries("join_star_multiway")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ScanQueries.queries ++ FilterQueries.queries ++ JoinQueries.queries ++
      AggQueries.queries ++ WindowQueries.queries ++ SortSetQueries.queries ++
      ScalarQueries.queries ++ SemiStructuredQueries.queries ++
      TextQueries.queries ++ SimQueries.queries ++ StreamQueries.queries ++
      PipelineQueries.queries ++ ReshapeQueries.queries ++
      CurationQueries.queries ++ AnalyticsQueries.queries ++
      EtlQueries.queries ++ GraphQueries.queries ++ TpchQueries.queries ++
      StatQueries.queries ++ GeoQueries.queries ++ LakehouseQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ScanQueries.oracle ++ FilterQueries.oracle ++ JoinQueries.oracle ++
      AggQueries.oracle ++ WindowQueries.oracle ++ SortSetQueries.oracle ++
      ScalarQueries.oracle ++ SemiStructuredQueries.oracle ++
      TextQueries.oracle ++ SimQueries.oracle ++ StreamQueries.oracle ++
      PipelineQueries.oracle ++ ReshapeQueries.oracle ++
      CurationQueries.oracle ++ AnalyticsQueries.oracle ++
      EtlQueries.oracle ++ GraphQueries.oracle ++ TpchQueries.oracle ++
      StatQueries.oracle ++ GeoQueries.oracle ++ LakehouseQueries.oracle
}
