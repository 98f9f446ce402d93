package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multiplex: align N sequences position-by-position into one N-channel
  * sequence — the reference's MultiplexedReader zip-join
  * (/root/reference/runner/MultiplexedReader.cpp:29-47,57-89): length =
  * max of inputs, shorter inputs padded with "silence" (0), one channel
  * per source.
  *
  * Array-local implementation: since a sequence is one row's array, the
  * N-way zip is a single projection after an equi-join of the N doc rows —
  * no explode, no per-position shuffle.
  */
object Multiplex {

  /** Multiplex the token arrays of N docs (selected by id) into one row:
    * channels: array<array<int>> where channel i is docIds(i)'s tokens
    * padded with `pad` to the max length. */
  def multiplex(
      sequences: DataFrame, // (doc_id, tokens, n_tok, source)
      docIds: Seq[String],
      pad: Int = 0): DataFrame = {
    require(docIds.nonEmpty)
    // ONE aggregation (an N-way join chain makes the optimizer blow up at
    // ~20 channels): collect (doc_id -> tokens) into a map, order channels
    // by the requested docIds, pad each to the max length.
    // dropDuplicates first: the same doc selected twice (e.g. unioned
    // input dirs) would otherwise hit DUPLICATE_MAP_KEY at runtime.
    val m = sequences.where(col("doc_id").isin(docIds: _*))
      .dropDuplicates("doc_id")
      .groupBy()
      .agg(
        map_from_arrays(collect_list(col("doc_id")),
          collect_list(col("tokens"))).as("__m"),
        max(col("n_tok")).as("n_tok"))
      // empty selection: global agg still emits one all-null row; the old
      // join form returned zero rows — keep that contract
      .where(col("n_tok").isNotNull)
    val ordered = transform(array(docIds.map(lit): _*),
      id => element_at(col("__m"), id))
    m.withColumn("channels",
        transform(ordered, ch =>
          // guard: sequence(1, 0) would generate a DESCENDING range in Spark
          when(size(ch) < col("n_tok"),
            concat(ch, transform(sequence(lit(1), col("n_tok") - size(ch)),
              _ => lit(pad))))
            .otherwise(ch)))
      // a requested doc_id absent from the input is a caller error: fail
      // with a message, not a null channel silently zeroing the mixdown
      .where(coalesce(assert_true(
        !exists(col("channels"), ch => ch.isNull),
        lit(s"multiplex: a requested doc_id is missing from the input " +
          s"(requested: ${docIds.take(8).mkString(",")}${if (docIds.size > 8) ",…" else ""})")),
        lit(true)))
      // the first source provides the nominal output name (reference
      // MultiplexedReader.cpp:22 via FeatureExtractionManager.cpp:700)
      .select(lit(docIds.head).as("doc_id"), col("n_tok"),
        col("channels"))
  }

  /** Positional full-outer alignment of two event tables on (pos), one
    * value column per side, missing positions 0-padded — the relational
    * form of the zip-join for row-per-position data (J1). */
  def alignByPosition(
      a: DataFrame, // (pos, value)
      b: DataFrame,
      valueA: String = "value_a",
      valueB: String = "value_b"): DataFrame = {
    a.select(col("pos"), col("value").as(valueA))
      .join(b.select(col("pos"), col("value").as(valueB)), Seq("pos"), "full_outer")
      .withColumn(valueA, coalesce(col(valueA), lit(0.0)))
      .withColumn(valueB, coalesce(col(valueB), lit(0.0)))
  }

  /** Channel mixdown projection (P1, FeatureExtractionManager.cpp:914-939):
    * target 1 channel = per-position mean across channels; target N =
    * pad with 0-channels / truncate. Array-local over a channels column
    * (array<array<int>>), no shuffle. */
  def mixdown(df: DataFrame, channelsCol: String, targetChannels: Int = 1): DataFrame = {
    if (targetChannels == 1) {
      val n = size(col(channelsCol))
      df.withColumn("mixed",
        transform(
          sequence(lit(0), size(element_at(col(channelsCol), 1)) - 1),
          p => aggregate(col(channelsCol), lit(0.0),
            (acc, ch) => acc + element_at(ch, p + 1).cast("double")) /
            n.cast("double")))
    } else {
      // pad with zero-channels or truncate to targetChannels
      val zeroCh = transform(
        sequence(lit(1), size(element_at(col(channelsCol), 1))), _ => lit(0))
      val padded = when(size(col(channelsCol)) >= targetChannels,
        slice(col(channelsCol), 1, targetChannels))
        .otherwise(concat(col(channelsCol),
          transform(sequence(lit(1), lit(targetChannels) - size(col(channelsCol))),
            _ => zeroCh)))
      df.withColumn(channelsCol, padded)
    }
  }

  /** Peak normalisation (reference `-n`, runner/main.cpp:774-776): scale a
    * value array so its absolute max is 1.0 (no-op on all-zero input,
    * mirroring golden tests/test-audioformat/expected/norm-on.csv).
    *
    * The peak is materialized as its own column BEFORE the per-element
    * lambda: interpreted expression eval has no common-subexpression
    * elimination, so an expensive expression captured inside a HOF lambda
    * re-evaluates once per array element (measured 16x blowup here). */
  def peakNormalize(df: DataFrame, valuesCol: String): DataFrame = {
    df.withColumn("__peak",
      array_max(transform(col(valuesCol), v => abs(v.cast("double")))))
      .withColumn(valuesCol,
        when(col("__peak") > 0,
          transform(col(valuesCol), v => v.cast("double") / col("__peak")))
          .otherwise(transform(col(valuesCol), v => v.cast("double"))))
      .drop("__peak")
  }
}
