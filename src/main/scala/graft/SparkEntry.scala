package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.engine.{Queries, Queries2, Queries3, Queries4, Queries5,
  Queries6}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the as-of (point-in-time)
    * join, the engine's centerpiece (north_rule). */
  def entry(spark: SparkSession): DataFrame =
    Queries.q2AsofJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ Queries2.all ++ Queries3.all ++ Queries4.all ++
      Queries5.all ++ Queries6.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracle ++ Queries2.oracle ++ Queries3.oracle ++
      Queries4.oracle ++ Queries5.oracle ++ Queries6.oracle
}
