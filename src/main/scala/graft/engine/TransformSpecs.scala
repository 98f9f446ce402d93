package graft.engine

import javax.xml.parsers.DocumentBuilderFactory
import java.io.ByteArrayInputStream
import scala.util.Try
import graft.model.{SummaryType, TransformSpec, WindowShape}

/** Transform-spec compilation: XML (the reference's one-transform XML form,
  * /root/reference/transforms/percussiononsets.xml:1-4), JSON (our native
  * multi-transform form, replacing the reference's RDF/Turtle), and the
  * sloppy segment-boundary list parser (/root/reference/runner/main.cpp:551-603).
  *
  * Times parse to integer nanoseconds (reference RealTime, 9-decimal
  * seconds; durations also accept the n3 fixtures' "PT2.0S" xsd:duration
  * form, tests/.../percussiononsets-start-and-duration.n3:14-15). */
object TransformSpecs {

  private val NsPerSec = 1e9

  /** "2.5" or "PT2.5S" -> nanoseconds. */
  def parseTime(s: String): Long = {
    val t = s.trim
    val num =
      if (t.toUpperCase.startsWith("PT") && t.toUpperCase.endsWith("S"))
        t.substring(2, t.length - 1)
      else t
    math.round(num.toDouble * NsPerSec)
  }

  /** Reference XML form: one <transform> element, attributes + nested
    * <parameter name= value=/>. The id attribute is the plugin id; an
    * optional output attribute selects the output (default: first). */
  def parseXml(xml: String): TransformSpec = {
    val doc = DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new ByteArrayInputStream(xml.getBytes("UTF-8")))
    val el = doc.getDocumentElement
    require(el.getTagName == "transform", s"expected <transform>, got <${el.getTagName}>")
    def attr(name: String, default: String = ""): String = {
      val v = el.getAttribute(name); if (v == null || v.isEmpty) default else v
    }
    val params = {
      val nodes = el.getElementsByTagName("parameter")
      (0 until nodes.getLength).map { i =>
        val p = nodes.item(i).asInstanceOf[org.w3c.dom.Element]
        p.getAttribute("name") -> p.getAttribute("value").toDouble
      }.toMap
    }
    TransformSpec(
      id = attr("id"),
      plugin = attr("plugin", attr("id")),
      output = attr("output"),
      stepSize = attr("stepSize", "0").toInt,
      blockSize = attr("blockSize", "0").toInt,
      windowType = WindowShape.fromName(attr("windowType", "hanning")),
      sampleRate = attr("sampleRate", "0").toDouble,
      start = parseTime(attr("startTime", "0")),
      duration = parseTime(attr("duration", "0")),
      parameters = params,
      program = attr("program"),
      summaryType = Option(attr("summary_type"))
        .filter(_.nonEmpty).map(SummaryType.fromName))
  }

  /** JSON form: `[{"id": ..., "plugin": ..., "output": ..., "step_size": n,
    * "block_size": n, "window_type": s, "sample_rate": r, "start": t,
    * "duration": t, "parameters": {..}, "summary_type": s}, ...]` —
    * the multi-transform analog of the reference's n3 files
    * (tests/test-summaries/transforms/detectionfunction.n3:6-30). */
  def parseJson(json: String): Seq[TransformSpec] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val arr = JsonMethods.parse(json) match {
      case JArray(xs) => xs
      case obj: JObject => List(obj)
      case other => throw new IllegalArgumentException(s"bad transform json: $other")
    }
    arr.zipWithIndex.map { case (j, i) =>
      def str(k: String, d: String = ""): String =
        (j \ k).extractOpt[String].getOrElse(d)
      def num(k: String, d: Double = 0.0): Double =
        (j \ k).extractOpt[Double].getOrElse(d)
      TransformSpec(
        id = str("id", s"transform$i"),
        plugin = str("plugin"),
        output = str("output"),
        stepSize = num("step_size").toInt,
        blockSize = num("block_size").toInt,
        windowType = WindowShape.fromName(str("window_type", "hanning")),
        sampleRate = num("sample_rate"),
        start = (j \ "start").extractOpt[String].map(parseTime)
          .getOrElse(math.round(num("start") * NsPerSec)),
        duration = (j \ "duration").extractOpt[String].map(parseTime)
          .getOrElse(math.round(num("duration") * NsPerSec)),
        parameters = (j \ "parameters").extractOpt[Map[String, Double]]
          .getOrElse(Map.empty),
        program = str("program"),
        summaryType = (j \ "summary_type").extractOpt[String]
          .filter(_.nonEmpty).map(SummaryType.fromName))
    }
  }

  /** Segment-boundary list, reproducing the reference's deliberately sloppy
    * parser (runner/main.cpp:551-603; fixture tests/test-summaries/
    * transforms/segmentlist:1-5): one time per line; '#' comments and blank
    * lines skipped; only the FIRST comma/space-separated field of a line is
    * read (leading separators skipped); non-numeric fields are an error.
    * Returns sorted distinct boundaries in ns. */
  def parseSegments(text: String): Seq[Long] = {
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val first = l.split("[ ,]").find(_.nonEmpty).getOrElse(
          throw new IllegalArgumentException(s"empty segment line: '$l'"))
        Try(parseTime(first)).getOrElse(
          throw new IllegalArgumentException(s"bad segment time: '$first'"))
      }
      .toSeq.distinct.sorted
  }

  /** Default-config skeleton for a plugin (the reference's --skeleton,
    * runner/main.cpp:455-466), emitted as JSON. */
  def skeleton(plugin: String): String = {
    val ex = Engine.registry.getOrElse(plugin,
      throw new IllegalArgumentException(s"unknown plugin: $plugin"))
    val params = ex.defaultParams.map { case (k, v) => s""""$k": $v""" }
      .mkString("{", ", ", "}")
    s"""[{
       |  "id": "$plugin",
       |  "plugin": "$plugin",
       |  "output": "${ex.outputs.head.identifier}",
       |  "step_size": 0,
       |  "block_size": 0,
       |  "window_type": "hanning",
       |  "sample_rate": 0,
       |  "parameters": $params
       |}]""".stripMargin
  }
}
