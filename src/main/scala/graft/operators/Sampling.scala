package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data pipelines.
  *
  * Why not `df.sample()` / `TABLESAMPLE` / `rand(seed) < p`: those are
  * partition-order-dependent (Bernoulli over the iterator) and a task
  * RETRY or repartition silently changes the selected set — the
  * SPARK-23207 class of nondeterminism, fatal for resumable runs where
  * a re-executed partition must pick the same rows. Hash selection is a
  * pure function of (key, salt): stable under retries, repartitioning,
  * AND engine (the exact-int64 mix family is reproducible in the DuckDB
  * oracle, q55). Changing `salt` draws an independent sample.
  *
  * Rate resolution is 1/M (M = 1000003); selection uses
  * mix(mix(key + salt)) < floor(rate·M) — same double-mix as the LSH
  * plane family (one round has sequential correlation). Map-only: a
  * pushable filter, no shuffle, no state.
  */
object Sampling {

  private val M = 1000003L

  /** One exact-int64 mix round as a Column (all intermediates < 2^63:
    * t < M ⇒ (t² mod M)·2654435761 < 2.7e15). */
  private def mix(t: Column): Column =
    pmod((t * t % M) * 2654435761L + lit(40503L) * t + 1299721L, lit(M))

  /** mix(mix(key + salt)) in [0, M) — the selection hash. */
  def selectionHash(key: Column, salt: Long): Column =
    mix(mix(pmod(key.cast("long") + salt, lit(M))))

  /** The integer cut for a rate (floor(rate·M)) — shared with oracles. */
  def cutFor(rate: Double): Long = math.floor(rate * M).toLong

  /** Keep ~rate of rows, deterministically by key hash. */
  def byHash(df: DataFrame, keyCol: String, rate: Double,
      salt: Long = 0L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate out of [0, 1]")
    df.where(selectionHash(col(keyCol), salt) < cutFor(rate))
  }

  /** Stratified variant: per-stratum rates (e.g. up-sample curated
    * sources, down-sample crawl), default for unlisted strata. The rate
    * table is a broadcast lookup — the corpus is filtered map-side,
    * never shuffled. */
  def stratifiedByHash(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: Long = 0L): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val spark = df.sparkSession
    val rateTable = spark.createDataFrame(rates.toSeq.map { case (s, r) =>
      (s, cutFor(r)) }).toDF("__stratum", "__cut")
    df.join(broadcast(rateTable),
        col(strataCol).cast("string") === col("__stratum"), "left")
      .withColumn("__cut", coalesce(col("__cut"), lit(cutFor(defaultRate))))
      .where(selectionHash(col(keyCol), salt) < col("__cut"))
      .drop("__stratum", "__cut")
  }
}
