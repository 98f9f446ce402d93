package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.SequenceRow

/** Deterministic synthetic token-table generator (the engine's stand-in for
  * the reference's test audio, e.g. tests/audio/20sec-silence.wav and the
  * vamp-test-plugin's fixed input — see FIXTURES.md §1).
  *
  * Design constraints:
  *   - Schema exactly per BASELINE.json input_hint:
  *     (doc_id string, tokens array<int32>, n_tok int32, source string).
  *   - Fully distributed: built from spark.range — no driver-side data,
  *     scales to any SF by changing nDocs.
  *   - Splittable PRNG: every token is xxhash64(seed, doc index, position),
  *     so any row is reproducible in isolation and the table is
  *     byte-identical at any parallelism (local[8] == local[32]) —
  *     required by the BASELINE.md scaling protocol.
  *   - Skew built in: a configurable fraction of "hot" docs get hotFactor×
  *     the token count (north_rule: hot doc_id skew must be handled).
  *
  * Special docs (FIXTURES.md §1, mirroring the reference's fixed fixtures):
  *   doc index 0 = "silence" (constant token 0, analog of 20sec-silence.wav),
  *   doc index 1 = "3 clicks" (3 isolated marker tokens in constant background),
  *   doc index 2 = "6 clicks" (longer, 6 markers),
  *   doc index 3 = hot-skew doc (n_tok = hotFactor × maxLen).
  */
object SequenceGen {

  val ClickToken = 999999 // marker token, outside normal vocab

  def generate(
      spark: SparkSession,
      nDocs: Long,
      minLen: Int = 64,
      maxLen: Int = 512,
      vocab: Int = 50000,
      seed: Long = 42L,
      hotFraction: Double = 0.001,
      hotFactor: Int = 16,
      nSources: Int = 4): Dataset[SequenceRow] = {
    import spark.implicits._
    require(nDocs >= 4, "need at least the 4 special docs")
    val spread = math.max(1, maxLen - minLen)

    val base = spark.range(nDocs).toDF("i")
      .withColumn("doc_id", format_string("doc_%010d", $"i"))
      .withColumn("h", abs(xxhash64(lit(seed), $"i")))
      // hot docs: deterministic pseudo-random subset + doc index 3 always
      .withColumn("is_hot",
        ($"i" === 3) || (pmod($"h", lit(1000000L)) < lit((hotFraction * 1000000).toLong)))
      .withColumn("base_len", (lit(minLen) + pmod($"h", lit(spread.toLong))).cast("int"))
      .withColumn("n_tok",
        when($"i" === 0, lit(maxLen))                     // silence doc: fixed length
          .when($"i" === 1, lit(maxLen))                  // 3 clicks
          .when($"i" === 2, lit(2 * maxLen))              // 6 clicks, longer
          .when($"is_hot", least(lit(Int.MaxValue.toLong), $"base_len".cast("long") * hotFactor).cast("int"))
          .otherwise($"base_len"))
      .withColumn("source", format_string("src%d", pmod($"h", lit(nSources.toLong))))

    // Token at position p of doc i:
    //   silence doc   -> 0
    //   clicks docs   -> ClickToken at evenly spaced positions, else 7
    //   normal docs   -> xxhash64(seed, i, p) mod vocab
    def tok(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when($"i" === 0, lit(0))
        .when($"i" === 1,
          when(p % lit(maxLen / 3) === lit(maxLen / 6), lit(ClickToken)).otherwise(lit(7)))
        .when($"i" === 2,
          when(p % lit(2 * maxLen / 6) === lit(maxLen / 6), lit(ClickToken)).otherwise(lit(7)))
        .otherwise(pmod(abs(xxhash64(lit(seed), $"i", p)), lit(vocab.toLong)).cast("int"))

    base
      .withColumn("tokens", transform(sequence(lit(0), $"n_tok" - 1), p => tok(p)))
      .select($"doc_id", $"tokens", $"n_tok", $"source")
      .as[SequenceRow]
  }

  /** A derived feature timeline + query table for point-in-time tests
    * (FIXTURES.md §1): per doc, nFeat feature events at deterministic
    * pseudo-random ts, and nQ query timestamps. All ts are integer nanos. */
  def featureTimeline(spark: SparkSession, nDocs: Long, nFeat: Int,
      seed: Long = 42L, horizonNs: Long = 10_000_000_000L): DataFrame = {
    import spark.implicits._
    spark.range(nDocs).toDF("i")
      .withColumn("doc_id", format_string("doc_%010d", $"i"))
      .withColumn("k", explode(sequence(lit(0), lit(nFeat - 1))))
      .withColumn("ts", pmod(abs(xxhash64(lit(seed), $"i", $"k", lit("f"))), lit(horizonNs)))
      .withColumn("v", (pmod(abs(xxhash64(lit(seed + 1), $"i", $"k")), lit(1000L)) / 1000.0))
      .select($"doc_id", $"ts", $"v")
      // dedupe equal ts within a doc (keep max v) so the timeline is a function of ts
      .groupBy($"doc_id", $"ts").agg(max($"v").as("v"))
  }

  def queryTimeline(spark: SparkSession, nDocs: Long, nQ: Int,
      seed: Long = 43L, horizonNs: Long = 10_000_000_000L): DataFrame = {
    import spark.implicits._
    spark.range(nDocs).toDF("i")
      .withColumn("doc_id", format_string("doc_%010d", $"i"))
      .withColumn("k", explode(sequence(lit(0), lit(nQ - 1))))
      .withColumn("ts", pmod(abs(xxhash64(lit(seed), $"i", $"k", lit("q"))), lit(horizonNs)))
      .select($"doc_id", $"ts")
      .distinct()
  }
}
