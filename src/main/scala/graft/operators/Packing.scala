package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay the corpus out as one deterministic token
  * stream (ordered by `orderCol`) and assign each doc to the training
  * bin of capacity `binSize` where its first token lands — the packing
  * step that turns variable-length documents into fixed-length training
  * sequences. Docs are not split; a doc straddling a boundary belongs to
  * its start bin (greedy contiguous packing).
  *
  * Scale design: the global running sum is a TWO-STAGE prefix sum, not a
  * single-partition window — (1) range-partition by `orderCol` and take
  * per-partition running sums, (2) collect ONE row per partition to the
  * driver, prefix-sum those, broadcast back as offsets. The corpus is
  * touched by exactly one range exchange; the driver handles #partitions
  * rows. (A global `Window.orderBy` would move 10^12 rows through one
  * task.) The result is invariant to where repartitionByRange draws its
  * sampled split points: only the total order matters.
  */
object Packing {

  def packGreedy(
      df: DataFrame,
      orderCol: String,
      lenCol: String,
      binSize: Long,
      partitions: Int = 0): DataFrame = {
    require(binSize > 0)
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // stage 1: range-partition on the order key; pid is computed BELOW the
    // window exchange (spark_partition_id is non-deterministic, so
    // Catalyst cannot reorder it above), i.e. while data is still
    // range-partitioned
    val ranged = df.repartitionByRange(n, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    val local = ranged.withColumn("__lsum",
      sum(col(lenCol).cast("long")).over(wLocal))
    // stage 2: one row per partition -> driver prefix sum -> broadcast
    val partTotals = local.groupBy(col("__pid"))
      .agg(max(col("__lsum")).as("__ptotal"))
      .orderBy(col("__pid"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val offsets = partTotals.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (pid, tot)) => (pid, acc + tot)
    }.sliding(2).map { case Array((_, prev), (pid, _)) => (pid, prev) }
      .toSeq
    val offsetDf = spark.createDataFrame(offsets).toDF("__pid", "__offset")
    // stage 3: global start offset of each doc; bin = floor(start/binSize)
    local.join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("pack_start",
        col("__lsum") + col("__offset") - col(lenCol).cast("long"))
      .withColumn("pack_bin", floor(col("pack_start") / binSize))
      .drop("__pid", "__lsum", "__offset")
  }
}
