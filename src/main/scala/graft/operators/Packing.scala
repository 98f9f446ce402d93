package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing: lay the corpus out as one deterministic token
  * stream (ordered by `orderCol`, which must be a UNIQUE key — ties have
  * no defined stream order) and assign each doc to the training bin of
  * capacity `binSize` where its first token lands — the packing step
  * that turns variable-length documents into fixed-length training
  * sequences. Docs are not split; a doc straddling a boundary belongs to
  * its start bin (greedy contiguous packing).
  *
  * Scale design — a distributed prefix sum with exactly ONE corpus
  * exchange:
  *   1. range-partition by `orderCol`, sort within partitions, compute
  *      the per-partition running sum in ONE imperative pass
  *      (mapPartitions — the genuine per-partition-state case; a window
  *      would add a second full-corpus hash exchange on the partition
  *      id), then MATERIALIZE (Checkpointing.materialize). Materializing is
  *      load-bearing for correctness, not just speed: repartitionByRange
  *      re-samples split points per job, so without it the offsets job
  *      and the output job could disagree on partition boundaries and
  *      broadcast offsets would be applied to the wrong partitions.
  *   2. aggregate ONE row per partition (sum of lengths), prefix-sum
  *      those on the driver, broadcast back as per-partition offsets.
  * The result is invariant to where the range sampler draws its split
  * points: only the total order matters.
  */
object Packing {

  def packGreedy(
      df: DataFrame,
      orderCol: String,
      lenCol: String,
      binSize: Long,
      partitions: Int = 0): DataFrame =
    packGreedy(df, Seq(orderCol), lenCol, binSize, partitions)

  /** Multi-column order variant: the stream order is the lexicographic
    * order of `orderCols` (the COMBINED key must be unique — e.g. a
    * pseudo-random hash column tie-broken by the doc id, the epoch
    * shuffle's layout). Same one-exchange prefix-sum machinery. */
  def packGreedy(
      df: DataFrame,
      orderCols: Seq[String],
      lenCol: String,
      binSize: Long,
      partitions: Int): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    require(orderCols.nonEmpty, "at least one order column required")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt

    val ranged = df.repartitionByRange(n, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val outSchema = ranged.schema.add("__lsum", LongType, nullable = false)
    val lenIdx = ranged.schema.fieldIndex(lenCol)
    // one imperative pass per partition: running sum in stream order
    // pin partition boundaries for BOTH jobs below; reliable checkpoint
    // when spark.graft.checkpointDir is set (the boundary pinning is
    // load-bearing for CORRECTNESS, so on a preemptible cluster it must
    // survive executor loss — see Checkpointing)
    val local = Checkpointing.materialize(ranged.mapPartitions { it =>
      var acc = 0L
      it.map { r =>
        val raw = r.get(lenIdx)
        require(raw != null, s"null $lenCol (doc lengths must be non-null)")
        val len = raw.asInstanceOf[Number].longValue()
        require(len >= 0, s"negative $lenCol: $len (doc lengths must be >= 0)")
        acc += len
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(Encoders.row(outSchema)))

    // one row per partition -> driver prefix sum -> broadcast offsets
    val partTotals = local.groupBy(col("__pid"))
      .agg(sum(col(lenCol).cast("long")).as("__ptotal"))
      .orderBy(col("__pid"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    if (partTotals.isEmpty) // empty corpus -> empty result, same schema
      return local.withColumn("pack_start", lit(0L))
        .withColumn("pack_bin", lit(0L))
        .drop("__pid", "__lsum")
    val prefix = partTotals.map(_._2).scanLeft(0L)(_ + _).init
    val offsetDf = spark.createDataFrame(
      partTotals.map(_._1).zip(prefix).toSeq).toDF("__pid", "__offset")

    local.join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("pack_start",
        col("__lsum") + col("__offset") - col(lenCol).cast("long"))
      // integer division (`div`), not floor(double /): double quotients
      // misbin near boundaries once offsets exceed 2^53 / for binSizes
      // that are inexact in binary FP
      .withColumn("pack_bin", expr(s"pack_start div ${binSize}L"))
      .drop("__pid", "__lsum", "__offset")
  }
}
