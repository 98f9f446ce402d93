package graft.sinks

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CSV feature/summary writer reproducing the reference's column layout and
  * option matrix (K1/K2 in SURVEY.md §2.1; option semantics exercised by
  * /root/reference/tests/test-csv-writer/test-csv-writer.sh:10-100):
  *
  *   [file,] ts, [duration|end,] value..., "label"            (features)
  *   [file,] segStart, segDuration, summaryName, value..., "label"  (summaries)
  *
  * - seconds printed with 9 decimals (integer-exact from ns, the reference
  *   fixed a 1ns float bug — CHANGELOG:47-48)
  * - values g-format with `digits` significant digits (default 6,
  *   LabFeatureWriter.cpp:63-64,186)
  * - filename column quoted and only on the first row of each doc
  *   (goldens tests/test-summaries/expected/summaries.csv:1-2)
  * - end-times: duration column becomes ts+duration; fill-ends:
  *   durationless rows get end = next row's ts, last row = own ts
  * - sample-timing: integer positions instead of seconds
  *
  * Formatting is fully distributed (window + projection); only file moves
  * happen on the driver. Formatting NEVER leaks into the compute path
  * (SURVEY.md §7.4).
  */
object CsvSink {

  case class Options(
      separator: String = ",",
      omitFilename: Boolean = false,
      endTimes: Boolean = false,
      fillEnds: Boolean = false,
      sampleTiming: Boolean = false,
      digits: Int = 6,
      force: Boolean = false,
      append: Boolean = false,
      rate: Double = 1000.0) // positions/sec, for sample-timing

  /** %g-style significant-digit formatter (sink-side only). */
  def gFormat(digits: Int): Column => Column = { c =>
    val f = udf((v: java.lang.Float) =>
      if (v == null) ""
      else {
        val d = v.toDouble
        if (d.isNaN) "NaN"
        else if (d.isInfinite) { if (d > 0) "Inf" else "-Inf" }
        else {
          val s = String.format(s"%.${digits}g", java.lang.Double.valueOf(d))
          // trim exponent-free trailing zeros the way %g in C does
          if (s.contains('e') || s.contains('E')) s
          else if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse
            .stripSuffix(".")
          else s
        }
      })
    f(c)
  }

  /** integer-exact seconds with 9 decimals from a ns column (Spark's `/`
    * is fractional division even on longs — use floor). */
  def secs9(ns: Column): Column =
    format_string("%d.%09d",
      floor(ns.cast("long") / 1000000000L).cast("long"),
      pmod(ns.cast("long"), lit(1000000000L)))

  /** Format feature rows (doc_id, transform_id, ts, duration, values,
    * label) into one `line` string column + ordering keys. */
  def formatFeatures(features: DataFrame, opts: Options): DataFrame = {
    val w = Window.partitionBy(col("transform_id")).orderBy(col("doc_id"), col("ts"))
    val sep = opts.separator
    val g = gFormat(opts.digits)

    val tsOut: Column =
      if (opts.sampleTiming)
        (col("ts").cast("double") * opts.rate / 1e9).cast("long").cast("string")
      else secs9(col("ts"))

    // end/duration column per the option matrix
    val endCol: Option[Column] =
      if (opts.endTimes)
        Some(when(col("duration").isNotNull,
          if (opts.sampleTiming)
            ((col("ts") + col("duration")).cast("double") * opts.rate / 1e9)
              .cast("long").cast("string")
          else secs9(col("ts") + col("duration"))))
      else if (opts.fillEnds) {
        val nextTs = lead(col("ts"), 1).over(
          Window.partitionBy(col("transform_id"), col("doc_id")).orderBy(col("ts")))
        val end = coalesce(col("ts") + col("duration"), nextTs, col("ts"))
        Some(if (opts.sampleTiming)
          (end.cast("double") * opts.rate / 1e9).cast("long").cast("string")
        else secs9(end))
      } else
        Some(when(col("duration").isNotNull,
          if (opts.sampleTiming)
            (col("duration").cast("double") * opts.rate / 1e9).cast("long").cast("string")
          else secs9(col("duration"))))

    val fileCol: Option[Column] =
      if (opts.omitFilename) None
      else Some(when(lag(col("doc_id"), 1).over(w).isNull ||
          lag(col("doc_id"), 1).over(w) =!= col("doc_id"),
        concat(lit("\""), col("doc_id"), lit("\""))).otherwise(lit("")))

    val valuesCol = array_join(transform(col("values"), v => g(v)), sep)
    val labelCol = when(length(col("label")) > 0,
      concat(lit("\""), col("label"), lit("\""))).otherwise(lit(""))

    val pieces: Seq[Column] =
      fileCol.toSeq ++ Seq(tsOut) ++
        endCol.map(e => coalesce(e, lit(""))).toSeq ++
        Seq(valuesCol, labelCol)
    // concat_ws would skip NULLs and shift columns; coalesce to "" instead
    features
      .withColumn("line",
        concat_ws(sep, pieces.map(p => coalesce(p, lit(""))): _*))
      // durationless feature shapes drop the empty duration column slot;
      // empty labels drop the trailing field (golden
      // tests/test-transforms-basic/expected/percussiononsets.csv:1-3) —
      // note the LEADING empty filename slot is preserved (single sep)
      .withColumn("line", regexp_replace(col("line"),
        java.util.regex.Pattern.quote(sep) + "{2,}", sep))
      .withColumn("line", regexp_replace(col("line"),
        java.util.regex.Pattern.quote(sep) + "+$", ""))
      .select(col("doc_id"), col("transform_id"), col("ts"), col("line"))
  }

  /** Format summary rows from Engine.summarize. */
  def formatSummaries(summaries: DataFrame, opts: Options): DataFrame = {
    val sep = opts.separator
    val w = Window.partitionBy(col("transform_id"))
      .orderBy(col("doc_id"), col("seg_start_ns"), col("summary_name"))
    val g = gFormat(opts.digits)
    val fileCol =
      if (opts.omitFilename) lit(null).cast("string")
      else when(lag(col("doc_id"), 1).over(w).isNull ||
          lag(col("doc_id"), 1).over(w) =!= col("doc_id"),
        concat(lit("\""), col("doc_id"), lit("\""))).otherwise(lit(""))
    val pieces: Seq[Column] = (if (opts.omitFilename) Nil else Seq(fileCol)) ++ Seq(
      secs9(col("seg_start_ns")),
      secs9(col("seg_duration_ns")),
      col("summary_name"),
      array_join(transform(col("values"), v => g(v.cast("float"))), sep),
      concat(lit("\""), col("label"), lit("\"")))
    summaries.withColumn("line",
      concat_ws(sep, pieces.map(p => coalesce(p, lit(""))): _*))
      .select(col("doc_id"), col("transform_id"),
        col("seg_start_ns").as("ts"), col("line"))
  }

  /** Write formatted lines as ONE csv file (the reference --csv-one-file):
    * deterministic global order (doc, transform, ts), single part file
    * moved to `path`. Refuses to overwrite unless force/append (K8). */
  def writeOneFile(lines: DataFrame, path: String, opts: Options): Unit = {
    val target = Paths.get(path)
    if (Files.exists(target) && !opts.force && !opts.append)
      throw new IllegalStateException(
        s"output $path exists (use force/append)") // K8 overwrite policy
    val tmp = path + ".__graft_tmp"
    lines.orderBy(col("doc_id"), col("transform_id"), col("ts"))
      .select(col("line"))
      .coalesce(1)
      .write.mode("overwrite").text(tmp)
    val part = Files.list(Paths.get(tmp)).iterator()
    var src: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.startsWith("part-")) src = p
    }
    if (opts.append && Files.exists(target)) {
      val prev = Files.readAllBytes(target)
      val add = if (src == null) Array.empty[Byte] else Files.readAllBytes(src)
      Files.write(target, prev ++ add)
    } else if (src == null) {
      Files.write(target, Array.empty[Byte])
    } else {
      Files.createDirectories(target.toAbsolutePath.getParent)
      Files.move(src, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // clean tmp
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  /** Per-(doc, transform) files named `<doc>_<transform ':'->'_'>.csv`
    * (K8 naming, tests/test-csv-destinations/test-csv-destinations.sh:8-17).
    * Pre-flight existence validation before any extraction output is
    * written (K9 fail-fast, FeatureExtractionManager.cpp:1119-1134).
    * Intended for small result sets (the reference's per-track use case);
    * the scale path is writeOneFile / parquet. */
  def writePerTrack(lines: DataFrame, basedir: String, opts: Options): Seq[String] = {
    Files.createDirectories(Paths.get(basedir))
    val pairs = lines.select("doc_id", "transform_id").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    def fileFor(doc: String, tr: String) =
      Paths.get(basedir, s"${doc}_${tr.replace(':', '_')}.csv")
    // K9: validate ALL destinations before writing any
    pairs.foreach { case (d, t) =>
      val f = fileFor(d, t)
      if (Files.exists(f) && !opts.force && !opts.append)
        throw new IllegalStateException(s"output $f exists (use force/append)")
    }
    pairs.map { case (d, t) =>
      val f = fileFor(d, t)
      val rows = lines.where(col("doc_id") === d && col("transform_id") === t)
        .orderBy(col("ts")).select("line")
        .collect().map(_.getString(0))
      val content = rows.mkString("", "\n", "\n")
      if (opts.append && Files.exists(f))
        Files.writeString(f, content, java.nio.file.StandardOpenOption.APPEND)
      else Files.writeString(f, content)
      f.toString
    }.toSeq
  }
}
