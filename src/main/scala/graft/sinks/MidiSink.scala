package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Scalars

/** MIDI-notes projection (K4 in SURVEY.md §2.1; reference
  * /root/reference/runner/MIDIFeatureWriter.cpp:66-181): features become
  * notes where value[0] is the pitch — converted from Hz when the output's
  * unit is "Hz" (`:99-101,124-126`) — value[1] (if present, in 0..1) the
  * velocity, and transforms map to channels (≤16, `:108-116`). The engine
  * keeps this a projection to a notes table; actual .mid byte encoding is
  * out of scope (the reference's own AudioDB writer also skips summaries).
  */
object MidiSink {

  /** features: (doc_id, transform_id, ts, duration, values, label) ->
    * (doc_id, transform_id, channel, ts, duration, pitch, velocity). */
  def toNotes(features: DataFrame, unitIsHz: Boolean): DataFrame = {
    val raw = element_at(col("values"), 1).cast("double")
    val pitch =
      if (unitIsHz) Scalars.hzToMidi(raw)
      else round(raw).cast("int")
    // velocity: value[1] in 0..1 scaled to 0..127; default 100 like typical
    // note-on handling when absent
    val velocity = when(size(col("values")) >= 2,
      round(element_at(col("values"), 2).cast("double") * 127).cast("int"))
      .otherwise(lit(100))
    // channel: dense id per transform (reference: one channel per
    // transform, ≤16)
    val channel = (abs(hash(col("transform_id"))) % 16).cast("int")
    features.where(size(col("values")) >= 1)
      .select(col("doc_id"), col("transform_id"), channel.as("channel"),
        col("ts"), col("duration"), pitch.as("pitch"), velocity.as("velocity"))
  }
}
