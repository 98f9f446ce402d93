package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Debug XML sink (K7): <feature>/<summary> elements like the reference's
  * DefaultFeatureWriter (/root/reference/runner/DefaultFeatureWriter.cpp:27-80). */
object XmlSink {

  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** features: (doc_id, transform_id, ts, duration, values, label) ->
    * one xml element string per row. */
  def toXmlRows(features: DataFrame): DataFrame = {
    val secs = (c: Column) => CsvSink.secs9(c)
    features.withColumn("xml", concat(
      lit("<feature><timestamp>"), secs(col("ts")), lit("</timestamp>"),
      when(col("duration").isNotNull,
        concat(lit("<duration>"), secs(col("duration")), lit("</duration>")))
        .otherwise(lit("")),
      when(size(col("values")) > 0,
        concat(lit("<values>"),
          array_join(transform(col("values"), v => v.cast("string")), " "),
          lit("</values>"))).otherwise(lit("")),
      when(length(col("label")) > 0,
        concat(lit("<label>"), esc(col("label")), lit("</label>")))
        .otherwise(lit("")),
      lit("</feature>")))
  }
}
