package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.CoreQueries
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The "rosbag info" aggregation (reference rosbag_example.cpp:37-73)
    * re-expressed over the events stream table.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.all("q03_group_agg")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ graft.queries.LlmQueries.all ++
      graft.queries.ExtraQueries.all ++ graft.queries.ContainerQueries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ graft.queries.LlmQueries.oracle ++
      graft.queries.ExtraQueries.oracle ++ graft.queries.ContainerQueries.oracle
}
