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
  * Rate resolution is 1/M (M = 1000003); selection compares the
  * two-limb salted hash (see [[selectionHash]]) against floor(rate·M) —
  * same exact-int64 mix family as the LSH planes (one round has
  * sequential correlation, hence two). Map-only: a pushable filter, no
  * shuffle, no state. Keys must be non-negative integral ids; NULL
  * keys are never selected at ANY rate (enforce presence upstream).
  */
object Sampling {

  private val M = graft.functions.ExactMix.M

  /** One exact-int64 mix round as a Column (ExactMix — the shared
    * three-face definition, so the oracle text cannot drift). */
  private def mix(t: Column): Column = graft.functions.ExactMix.mixCol(t)

  /** Selection hash in [0, M): the key is folded through TWO mod-M limbs
    * (lo = key mod M, hi = ⌊key/M⌋ mod M) with the salt mixed into the
    * low limb FIRST —
    *
    *   h = mix( (hi + mix((lo + salt) mod M)) mod M )
    *
    * Folding only `key mod M` would make keys congruent mod M (~10⁶)
    * receive identical decisions under EVERY salt — a periodic,
    * salt-immune pattern fatal on sequential ids at corpus scale. The
    * two-limb fold distinguishes keys up to M² ≈ 10¹², and which pairs
    * collide depends on the salt (the inner mix is keyed by it). Keys
    * must be NON-NEGATIVE integral ids; NULL keys are never selected
    * (hash of NULL is NULL) — enforce key presence upstream. */
  def selectionHash(key: Column, salt: Long): Column = {
    val k = key.cast("long")
    val lo = pmod(k, lit(M))
    // (k - lo) is exactly divisible by M, so integral `div` == floor for
    // every sign — the rebucketTs negative-ts lesson
    val hi = pmod(call_function("div", k - lo, lit(M)), lit(M))
    mix(pmod(hi + mix(pmod(lo + salt, lit(M))), lit(M)))
  }

  /** The integer cut for a rate (floor(rate·M)) — shared with oracles. */
  def cutFor(rate: Double): Long = math.floor(rate * M).toLong

  /** Runtime enforcement of the non-negative-key contract: the engine's
    * pmod/floor-div hash DOES produce a value for a negative key, but the
    * oracle CTEs use plain `%`/`//` — a negative id would silently select
    * DIFFERENT rows across the two faces. Fail loudly instead. */
  private[operators] def nonNegative(keyCol: String): Column = {
    val k = col(keyCol).cast("long")
    when(k < 0, raise_error(concat(
      lit(s"graft.Sampling: negative key in column '$keyCol' ("), k.cast("string"),
      lit(") — deterministic hash sampling requires non-negative integral ids"))))
      .otherwise(k)
  }

  /** DuckDB CTE chain computing the selection hash as column `h` —
    * generated HERE, next to the Scala definition, so engine and oracle
    * cannot silently desynchronize (the QueryUtil one-definition rule).
    * Assumes non-negative keys (plain `%`/`//`, like the engine's
    * contract). `passCols` are carried through each stage. */
  def selectionHashCtes(src: String, keySql: String, salt: Long,
      passCols: String): String = {
    val mixSql = graft.functions.ExactMix.mixSql("t")
    s"""s0 AS (SELECT $passCols, (($keySql) % $M + $salt) % $M AS t,
              (($keySql) // $M) % $M AS hi FROM $src),
       s1 AS (SELECT $passCols, hi, $mixSql AS t FROM s0),
       s2 AS (SELECT $passCols, (hi + t) % $M AS t FROM s1),
       s3 AS (SELECT $passCols, $mixSql AS h FROM s2)"""
  }

  /** Keep ~rate of rows, deterministically by key hash. */
  def byHash(df: DataFrame, keyCol: String, rate: Double,
      salt: Long = 0L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate out of [0, 1]")
    df.where(selectionHash(nonNegative(keyCol), salt) < cutFor(rate))
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
      .where(selectionHash(nonNegative(keyCol), salt) < col("__cut"))
      .drop("__stratum", "__cut")
  }

  /** Deterministic EPOCH SHUFFLE: a global pseudo-random training order
    * and fixed-size batch assignment as a PURE function of (key, epoch).
    *
    * Why not `orderBy(rand(seed))`: rand is partition-order-dependent —
    * the same SPARK-23207 retry trap `byHash` documents — and a
    * `row_number()` window over a global order funnels the corpus
    * through ONE partition. Here the order key is the exact-int64
    * selection hash (tie-broken by the unique key itself), and the
    * zero-based global position comes from [[Packing.packGreedy]]'s
    * distributed prefix sum with unit lengths: one range exchange, one
    * imperative per-partition pass, one row per partition to the
    * driver. Re-running any task, changing the partition count, or
    * resuming after a failure yields byte-identical (position, batch)
    * assignments, and each epoch draws an independent permutation —
    * exactly what a resumable multi-epoch data loader needs.
    *
    * Output adds `epoch_pos` (0-based position in the epoch's stream)
    * and `batch` (= epoch_pos div batchSize). Keys must be unique,
    * non-negative integral ids (enforced at runtime like `byHash`).
    */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Long,
      batchSize: Long): DataFrame = {
    require(batchSize > 0, s"batchSize $batchSize must be positive")
    // fail-loudly convention (ADVICE r5): the output columns must not
    // silently overwrite pre-existing input columns
    val clash = Seq("epoch_pos", "batch").filter(df.columns.contains)
    require(clash.isEmpty,
      s"epochShuffle output columns already exist in the input: ${clash.mkString(", ")}")
    val withH = df
      .withColumn("__h", selectionHash(nonNegative(keyCol), epoch))
      .withColumn("__one", lit(1L))
    Packing.packGreedy(withH, Seq("__h", keyCol), "__one", batchSize,
        partitions = 0)
      .withColumnRenamed("pack_start", "epoch_pos")
      .withColumnRenamed("pack_bin", "batch")
      .drop("__h", "__one")
  }
}
