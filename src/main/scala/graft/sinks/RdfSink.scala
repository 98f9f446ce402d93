package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.TransformSpec

/** RDF/Turtle feature writer (K6) mirroring the reference RDF writer's
  * graph shape (runner/FeatureWriterFactory.cpp:21,48-49; golden
  * /root/reference/tests/test-summaries/expected/summaries-from-rdf.n3):
  *
  *   :transform_<id>  vamp:plugin/output/step_size/... ; a vamp:Transform.
  *   <file://doc>     mo:encodes :signal_<doc> ; a mo:AudioFile.
  *   :signal_<doc>    mo:time [ tl:onTimeLine :signal_timeline_<doc> ].
  *   :event_<doc>_<n> event:time [ tl:at "PT…S"^^xsd:duration ;
  *                    tl:onTimeLine … ] ; vamp:computed_by :transform_<id>.
  *
  * Node ids are deterministic per (doc, transform, row) — NOT a global
  * driver counter like the reference's: ids are arbitrary in RDF (its own
  * test canonicalises with rapper before comparing), and per-partition
  * numbering keeps the formatting fully distributed. The emitted graph
  * round-trips through TransformSpecs.parseN3 (the reference round-trip
  * test shape, tests/test-summaries/test-summaries.sh:75-86).
  */
object RdfSink {

  private val prefixes =
    """@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
      |@prefix mo: <http://purl.org/ontology/mo/> .
      |@prefix af: <http://purl.org/ontology/af/> .
      |@prefix event: <http://purl.org/NET/c4dm/event.owl#> .
      |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
      |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
      |@prefix tl: <http://purl.org/NET/c4dm/timeline.owl#> .
      |@prefix vamp: <http://purl.org/ontology/vamp/> .
      |@prefix graft: <http://graft-engine.org/plugins/> .
      |@prefix : <#> .
      |""".stripMargin

  private def sane(c: Column): Column =
    graft.functions.Scalars.sanitizeId(c)

  private def pt(ns: Column): Column =
    concat(lit("\"PT"), CsvSink.secs9(ns), lit("S\"^^xsd:duration"))

  /** Driver-side transform blocks (tiny; one per spec). */
  def transformBlocks(specs: Seq[TransformSpec]): String =
    specs.map { s =>
      val plugin = s.plugin // registry name doubles as a graft:-prefixed QName
      val params = s.parameters.toSeq.sortBy(_._1).map { case (k, v) =>
        s"""    vamp:parameter_binding [ vamp:parameter [ vamp:identifier "$k" ]; vamp:value "$v" ] ;"""
      }
      (Seq(s":transform_${s.id}") ++
        Seq(s"    vamp:plugin $plugin ;",
          s"    vamp:output ${plugin}_output_${s.output} ;") ++
        (if (s.stepSize > 0) Seq(s"""    vamp:step_size "${s.stepSize}"^^xsd:int ;""") else Nil) ++
        (if (s.blockSize > 0) Seq(s"""    vamp:block_size "${s.blockSize}"^^xsd:int ;""") else Nil) ++
        (if (s.sampleRate > 0) Seq(s"""    vamp:sample_rate "${s.sampleRate}"^^xsd:float ;""") else Nil) ++
        params ++
        s.summaryType.map(t => s"""    vamp:summary_type "${t.name}" ;""").toSeq ++
        Seq("    a vamp:Transform .")).mkString("\n")
    }.mkString("\n\n")

  /** Distributed formatting: one Turtle block per feature row, plus one
    * signal/timeline block per doc (emitted with the doc's first row).
    * Returns (doc_id, transform_id, ts, line) for the one-file merger. */
  def formatFeatures(features: DataFrame): DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("transform_id"), col("ts"))
    val wEvt = Window.partitionBy(col("doc_id"), col("transform_id"))
      .orderBy(col("ts"))
    val doc = sane(col("doc_id"))
    val signalBlock = concat(
      lit("<file://"), col("doc_id"), lit(">\n    mo:encodes :signal_"), doc,
      lit(" ;\n    a mo:AudioFile .\n\n:signal_"), doc,
      lit("\n    mo:time [\n        tl:onTimeLine :signal_timeline_"), doc,
      lit(" ;\n        a tl:Interval\n    ] ;\n    a mo:Signal .\n\n:signal_timeline_"),
      doc, lit("\n    a tl:Timeline .\n\n"))
    val timeBnode = concat(
      lit("    event:time [\n        tl:at "), pt(col("ts")),
      when(col("duration").isNotNull,
        concat(lit(" ;\n        tl:duration "), pt(col("duration")),
          lit(";\n        tl:onTimeLine :signal_timeline_"), doc,
          lit(" ;\n        a tl:Interval\n    ] ;\n")))
        .otherwise(concat(lit(" ;\n        tl:onTimeLine :signal_timeline_"),
          doc, lit(" ;\n        a tl:Instant\n    ] ;\n"))))
    val g = CsvSink.gFormat(6)
    val valueLine = when(size(col("values")) > 0,
      concat(lit("    rdf:value \""),
        array_join(transform(col("values"), v => g(v)), " "),
        lit("\" ;\n"))).otherwise(lit(""))
    val labelLine = when(length(col("label")) > 0,
      concat(lit("    rdfs:label \""), col("label"), lit("\" ;\n")))
      .otherwise(lit(""))
    val eventBlock = concat(
      lit(":event_"), doc, lit("_"), sane(col("transform_id")), lit("_"),
      row_number().over(wEvt).cast("string"), lit("\n"),
      timeBnode, valueLine, labelLine,
      lit("    vamp:computed_by :transform_"), col("transform_id"),
      lit(" ;\n    a af:Feature .\n"))
    features
      .withColumn("line",
        concat(when(row_number().over(wDoc) === 1, signalBlock).otherwise(lit("")),
          eventBlock))
      .select(col("doc_id"), col("transform_id"), col("ts"), col("line"))
  }

  /** One Turtle document: prefixes + transform blocks (driver-side) +
    * distributed signal/event blocks merged via the one-file writer. */
  def writeTurtle(features: DataFrame, specs: Seq[TransformSpec],
      path: String, opts: CsvSink.Options): Unit = {
    val header = features.sparkSession
      .createDataFrame(Seq(("", "", -1L, prefixes + "\n" + transformBlocks(specs) + "\n")))
      .toDF("doc_id", "transform_id", "ts", "line")
    CsvSink.writeOneFile(header.unionByName(formatFeatures(features)), path, opts)
  }
}
