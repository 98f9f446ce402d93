package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for 10^12-row tables (the Iceberg-partitioning design,
  * expressed with Spark bucketed tables in this sandbox):
  *
  *   - bucket by entity (doc_id) so every PIT/as-of/sessionize/summary
  *     operator's ClusteredDistribution(entity) is ALREADY satisfied by
  *     the scan — zero exchanges end-to-end (asserted in TableLayoutSpec);
  *   - sort within buckets by (entity, ts) so only a cheap within-partition
  *     sort (often elided) remains;
  *   - at Iceberg this is `bucket(N, doc_id)` partition transform +
  *     sorted data files + min/max pruning on ts for time-range filters
  *     (the reference's extent trimming, SURVEY.md §4.1, comes free).
  */
object TableLayout {

  /** Write a DataFrame as a bucketed+sorted table (catalog table; the
    * bucket metadata is what lets scans report HashPartitioning). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      entityCol: String, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, entityCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Entity-clustered layout for plain-path writes (no catalog): range
    * partition by entity then sort within partitions — what a 1000-executor
    * job writes so downstream PIT work co-locates. */
  def repartitionForEntityOps(df: DataFrame, entityCol: String,
      tsCol: String, partitions: Int): DataFrame =
    df.repartition(partitions, col(entityCol))
      .sortWithinPartitions(col(entityCol), col(tsCol))
}
