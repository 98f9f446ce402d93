package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{SummaryType, TransformSpec}
import graft.summaries.{Summaries, VectorSummaries}

/** Plan builder: compiles a batch of TransformSpecs over a sequences table
  * into ONE Spark DAG, reproducing the reference's two design-time
  * optimizations (SURVEY.md §4.1) natively:
  *
  *   1. Shared scan, multi-consumer: all transforms of a batch read the
  *      sequences table once.
  *   2. Plugin-instance sharing ("a vital optimisation",
  *      /root/reference/runner/FeatureExtractionManager.cpp:227-258):
  *      transforms equal up to output/summary share ONE extraction pass.
  *      Catalyst does not CSE across union branches, so we do what the
  *      reference does: key extraction on spec.sharingKey, run each
  *      extractor once, then fan the rows out to transforms with a
  *      broadcast join against the tiny (output -> transform) spec table —
  *      a map-side operation, not a second pass.
  *
  * Output: feature rows
  *   (doc_id, transform_id, output, ts, duration, values, label)
  * ordered deterministically at sink time (reference ordered-plugin rule,
  * FeatureExtractionManager.h:100-108).
  */
object Engine {

  val registry: Map[String, FeatureExtractor] =
    Seq(HistogramExtractor, EnergyExtractor, RegionsExtractor, ClicksExtractor,
      ChangepointsExtractor, SpectrumExtractor)
      .map(e => e.name -> e).toMap

  /** Enumerate available extractors (the reference's --list,
    * runner/main.cpp:437-453). */
  def list: Seq[String] =
    registry.values.toSeq.sortBy(_.name).flatMap(e =>
      e.outputs.map(o => s"${e.name}:${o.identifier}"))

  /** Run a batch of transforms; one DAG, shared extraction passes. */
  def run(sequences: DataFrame, specs: Seq[TransformSpec]): DataFrame = {
    require(specs.nonEmpty, "no transforms")
    val spark = sequences.sparkSession
    val bySharing = specs.groupBy(_.sharingKey).toSeq
      // deterministic plan order (reference ordered-transform rule)
      .sortBy(_._2.map(_.id).min)

    val parts = bySharing.map { case (key, group) =>
      val ex = registry.getOrElse(key.plugin,
        throw new IllegalArgumentException(
          s"unknown plugin: ${key.plugin} (available: ${registry.keys.mkString(", ")})"))
      val rows = ex.extract(sequences, group.head)
      // fan out to the transforms sharing this pass: tiny broadcast join on
      // output, then the per-transform time-range filter (P2).
      val consumers = group.map { spec =>
        val out = if (spec.output.nonEmpty) spec.output
          else ex.outputs.head.identifier
        require(ex.outputs.exists(_.identifier == out),
          s"plugin ${ex.name} has no output '$out'")
        val endNs = if (spec.duration > 0) spec.start + spec.duration else Long.MaxValue
        (spec.id, out, spec.start, endNs)
      }
      val specTable = spark.createDataFrame(consumers)
        .toDF("transform_id", "output", "start_ns", "end_ns")
      // LITERAL pre-filter on the consumed outputs: extractors emit ALL
      // their outputs in one union, and the broadcast spec join drops the
      // unconsumed ones only at RUNTIME — the literal isin folds to false
      // inside dead union branches, so Catalyst prunes them at plan time
      // (a single-output transform no longer pays the other outputs'
      // extraction work). The join below makes it semantically a no-op.
      val consumed = consumers.map(_._2).distinct
      rows.where(col("output").isin(consumed: _*))
        .join(broadcast(specTable), Seq("output"))
        .where(col("ts") >= col("start_ns") && col("ts") < col("end_ns"))
        .select(col("doc_id"), col("transform_id"), col("output"),
          col("ts"), col("duration"), col("values"), col("label"))
    }
    parts.reduce(_.unionByName(_))
  }

  /** Continuous-time summaries for the specs that request one
    * (vamp:summary_type), over feature rows from [[run]]. Vector-aware
    * (per-bin reducers) in one shuffle; optional fixed segment boundaries
    * (ns) for `--segments` semantics. Summary row layout mirrors
    * FIXTURES.md §4:
    * (doc_id, transform_id, seg_start_ns, seg_duration_ns, summary_name,
    *  values: array<double>, label). */
  def summarize(
      features: DataFrame,
      specs: Seq[TransformSpec],
      boundaries: Seq[Long] = Nil,
      inputEnds: Option[DataFrame] = None): DataFrame = {
    val spark = features.sparkSession
    val wanted = specs.flatMap(s => s.summaryType.map(t => s.id -> t)).distinct
    require(wanted.nonEmpty, "no transform requests a summary")
    // the broadcast typeTable JOIN below fans out per matching row:
    // one transform id carrying TWO different summary types would emit
    // each group twice under conflicting names — reject it loudly
    // (duplicate (id, type) entries are deduped above; the reference's
    // transform model binds at most one summary_type per transform)
    require(wanted.map(_._1).distinct.size == wanted.size,
      "duplicate transform id with conflicting summary types: " +
        wanted.groupBy(_._1).filter(_._2.size > 1).keys.mkString(", "))
    val byType = wanted.groupBy(_._2).view.mapValues(_.map(_._1)).toMap

    // Optional (doc_id, transform_id, input_end_ns): the reference rule
    // says the FINAL durationless feature extends to the END OF THE
    // INPUT; without it the last span is 0 (and a single-feature doc
    // would summarize to null). The CLI derives it from n_tok; callers
    // that only have the feature table get the last-ending-output rule.
    val featForSpans = inputEnds match {
      case Some(ie) => features.join(ie, Seq("doc_id", "transform_id"), "left")
      case None => features
    }
    val spanned0 = Summaries.withSpans(
      featForSpans, "doc_id", Some("transform_id"), "ts", Some("duration"),
      inputEnd = inputEnds.map(_ => col("input_end_ns")))
      .drop("input_end_ns")
    val spanned = if (boundaries.nonEmpty)
      Summaries.withSegment(spanned0, "ts", boundaries)
    else spanned0.withColumn("seg_start", lit(0L))

    val groupCols = Seq("doc_id", "transform_id", "seg_start")
    // Aggregate ONLY the requested reducers: a mean/count request must
    // not pay the median/mode value-map aggregator's state + merges.
    val wide = VectorSummaries.summarizeVector(
      spanned.where(size(col("values")) > 0), groupCols, "values",
      types = byType.keySet)
      .join(
        spanned.groupBy(groupCols.map(col): _*)
          .agg(max(col("w_end")).as("seg_end")),
        groupCols)

    // One pass, no per-type fan-out: each transform requests at most one
    // summary type, so route rows through a broadcast (transform_id ->
    // summary) lookup and select the value array with ONE CASE over the
    // requested types. The vector Aggregator then executes exactly once
    // per group — the reference's one-pass multi-summary ("a vital
    // optimisation", FeatureExtractionManager.cpp:229-232, 998-1011). The
    // previous union-branch shape shared the shuffle write (ReuseExchange)
    // but re-ran the reduce-side Aggregator merge once per requested type:
    // a 9-type request paid ~9x reduce CPU.
    def valueOf(t: SummaryType): Column = t match {
      case SummaryType.Count => array(col("count").cast("double"))
      case SummaryType.Min => transform(col("min"), _.cast("double"))
      case SummaryType.Max => transform(col("max"), _.cast("double"))
      case SummaryType.Sum => col("sum")
      case SummaryType.Mean => col("mean")
      case SummaryType.Median => transform(col("median"), _.cast("double"))
      case SummaryType.Mode => transform(col("mode"), _.cast("double"))
      case SummaryType.Variance => col("variance")
      case SummaryType.Sd => col("sd")
    }
    val typeTable = spark.createDataFrame(
      wanted.map { case (id, t) => (id, t.name, t.label) })
      .toDF("transform_id", "summary_name", "label")
    val branches = byType.keySet.toSeq.sortBy(_.name)
    val valueCol = branches.tail
      .foldLeft(when(col("summary_name") === branches.head.name, valueOf(branches.head))) {
        (acc, t) => acc.when(col("summary_name") === t.name, valueOf(t))
      }
    wide.join(broadcast(typeTable), Seq("transform_id"))
      .select(col("doc_id"), col("transform_id"),
        col("seg_start").as("seg_start_ns"),
        (col("seg_end") - col("seg_start")).as("seg_duration_ns"),
        col("summary_name"),
        valueCol.as("values"),
        col("label"))
  }
}
