package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JAMS-style JSON writer (K3 in SURVEY.md §2.1; reference
  * /root/reference/runner/JAMSFeatureWriter.cpp:102-326): one JSON document
  * per (doc, transform) with file_metadata + an annotation whose data array
  * holds {time, duration, value, label} observations. NaN/Inf feature
  * values become the strings "NaN"/"Inf" (JAMSFeatureWriter.cpp:177-181 —
  * JSON has no literals for them).
  *
  * Emitted as JSONL (one document per line) — the cluster-friendly layout;
  * a driver-side pretty print is trivial for small outputs.
  */
object JsonSink {

  /** minimal JSON string escaping for label text. */
  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")

  /** features: (doc_id, transform_id, ts, duration, values, label).
    * Observations are assembled as raw JSON fragments so NaN/Inf become
    * STRINGS while finite values stay numbers (mixed-type arrays are not
    * expressible through to_json). */
  def toJams(features: DataFrame): DataFrame = {
    val valueArr = concat(lit("["),
      array_join(transform(col("values"), v =>
        when(isnan(v), lit("\"NaN\""))
          .when(v === Double.PositiveInfinity, lit("\"Inf\""))
          .when(v === Double.NegativeInfinity, lit("\"-Inf\""))
          .otherwise(v.cast("string"))), ","),
      lit("]"))
    val obs = concat(
      lit("{\"time\":"), (col("ts").cast("double") / 1e9).cast("string"),
      lit(",\"duration\":"),
      (coalesce(col("duration"), lit(0L)).cast("double") / 1e9).cast("string"),
      lit(",\"value\":"), valueArr,
      lit(",\"label\":\""), esc(col("label")), lit("\"}"))
    features
      .groupBy(col("doc_id"), col("transform_id"))
      .agg(sort_array(collect_list(struct(col("ts"), obs.as("o")))).as("rows"))
      .select(col("doc_id"), col("transform_id"),
        concat(
          lit("{\"file_metadata\":{\"identifiers\":{\"file\":\""),
          esc(col("doc_id")),
          lit("\"}},\"annotations\":[{\"annotation_metadata\":{\"annotator\":\""),
          esc(col("transform_id")),
          lit("\"},\"data\":["),
          array_join(transform(col("rows"), r => r("o")), ","),
          lit("]}]}")).as("jams"))
  }

  def writeJsonl(features: DataFrame, path: String): Unit =
    toJams(features).select("jams")
      .coalesce(1).write.mode("overwrite").text(path)
}
