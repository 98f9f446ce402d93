package graft.summaries

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, struct, udaf}
import graft.model.SummaryType

/** Element-wise (per-bin) summary reducers over `array<float>` values —
  * the reference's grid outputs apply every reducer per bin
  * (fixture /root/reference/tests/test-summaries/expected/testplug-grid-fsr-min.csv:1-2,
  * SURVEY.md §2.4 A1).
  *
  * Implemented as typed Aggregators over the raw arrays so 10^12-scale runs
  * never explode rows: per-group state is O(binCount) (moments) or
  * O(binCount × distinct values) (median/mode), shuffled once as partial
  * aggregates (map-side combine), not one row per array element.
  *
  * Ragged inputs are tolerated: buffers grow to the longest array seen and
  * bins absent from a row simply contribute nothing to that bin.
  */
object VectorSummaries {

  /** Input element: one feature row's values + its continuous-time span. */
  final case class VW(values: Seq[Float], w: Double)

  // ------------------------------------------------------------- moments

  final case class MomentsBuf(
      var n: Long,
      var sumW: Double,
      var mins: Array[Float],
      var maxs: Array[Float],
      var sums: Array[Double],
      var sumWV: Array[Double],
      var sumWV2: Array[Double])

  final case class MomentsOut(
      count: Long,
      min: Seq[Float],
      max: Seq[Float],
      sum: Seq[Double],
      mean: Seq[Double],
      variance: Seq[Double],
      sd: Seq[Double])

  private def grow(a: Array[Float], n: Int, fill: Float): Array[Float] =
    if (a.length >= n) a else Array.tabulate(n)(i => if (i < a.length) a(i) else fill)
  private def growD(a: Array[Double], n: Int): Array[Double] =
    if (a.length >= n) a else Array.tabulate(n)(i => if (i < a.length) a(i) else 0.0)

  /** count/min/max/sum + continuous-time weighted mean/variance/sd, per bin. */
  class VectorMomentsAgg extends Aggregator[VW, MomentsBuf, MomentsOut] {
    def zero: MomentsBuf = MomentsBuf(0L, 0.0,
      Array.empty, Array.empty, Array.empty, Array.empty, Array.empty)

    def reduce(b: MomentsBuf, in: VW): MomentsBuf = {
      val vs = in.values
      if (vs != null) {
        val n = vs.length
        b.mins = grow(b.mins, n, Float.PositiveInfinity)
        b.maxs = grow(b.maxs, n, Float.NegativeInfinity)
        b.sums = growD(b.sums, n); b.sumWV = growD(b.sumWV, n); b.sumWV2 = growD(b.sumWV2, n)
        var i = 0
        while (i < n) {
          val v = vs(i)
          if (v < b.mins(i)) b.mins(i) = v
          if (v > b.maxs(i)) b.maxs(i) = v
          b.sums(i) += v
          b.sumWV(i) += in.w * v
          b.sumWV2(i) += in.w * v * v
          i += 1
        }
        b.n += 1
        b.sumW += in.w
      }
      b
    }

    def merge(a: MomentsBuf, c: MomentsBuf): MomentsBuf = {
      val n = math.max(a.mins.length, c.mins.length)
      a.mins = grow(a.mins, n, Float.PositiveInfinity)
      a.maxs = grow(a.maxs, n, Float.NegativeInfinity)
      a.sums = growD(a.sums, n); a.sumWV = growD(a.sumWV, n); a.sumWV2 = growD(a.sumWV2, n)
      var i = 0
      while (i < c.mins.length) {
        if (c.mins(i) < a.mins(i)) a.mins(i) = c.mins(i)
        if (c.maxs(i) > a.maxs(i)) a.maxs(i) = c.maxs(i)
        a.sums(i) += c.sums(i); a.sumWV(i) += c.sumWV(i); a.sumWV2(i) += c.sumWV2(i)
        i += 1
      }
      a.n += c.n
      a.sumW += c.sumW
      a
    }

    def finish(b: MomentsBuf): MomentsOut = {
      val n = b.mins.length
      val mean = Array.tabulate(n)(i => if (b.sumW > 0) b.sumWV(i) / b.sumW else Double.NaN)
      val variance = Array.tabulate(n) { i =>
        if (b.sumW > 0) math.max(0.0, b.sumWV2(i) / b.sumW - mean(i) * mean(i)) else Double.NaN
      }
      MomentsOut(b.n, b.mins.toSeq, b.maxs.toSeq, b.sums.toSeq,
        mean.toSeq, variance.toSeq, variance.map(math.sqrt).toSeq)
    }

    // Product (struct) encoder keeps spilled/shuffled partial buffers
    // columnar UnsafeRows instead of opaque Kryo blobs.
    def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
    def outputEncoder: Encoder[MomentsOut] = Encoders.product[MomentsOut]
  }

  // --------------------------------------------------------- median/mode

  final case class MedianModeOut(median: Seq[Float], mode: Seq[Float])

  /** Per-bin continuous-time weighted median + mode. State is one
    * value→span map per bin; suitable when per-bin distinct values are
    * bounded (e.g. token-derived features). For unbounded-cardinality bins
    * use the explode + Summaries.summarizeScalar path instead. */
  class VectorMedianModeAgg
      extends Aggregator[VW, Array[scala.collection.mutable.HashMap[Float, Double]], MedianModeOut] {
    type Buf = Array[scala.collection.mutable.HashMap[Float, Double]]

    def zero: Buf = Array.empty

    private def growBuf(b: Buf, n: Int): Buf =
      if (b.length >= n) b
      else Array.tabulate(n)(i =>
        if (i < b.length) b(i) else scala.collection.mutable.HashMap.empty[Float, Double])

    def reduce(b0: Buf, in: VW): Buf = {
      if (in.values == null) return b0
      val b = growBuf(b0, in.values.length)
      var i = 0
      while (i < in.values.length) {
        val m = b(i)
        m.update(in.values(i), m.getOrElse(in.values(i), 0.0) + in.w)
        i += 1
      }
      b
    }

    def merge(a0: Buf, c: Buf): Buf = {
      val a = growBuf(a0, c.length)
      var i = 0
      while (i < c.length) {
        c(i).foreach { case (v, w) => a(i).update(v, a(i).getOrElse(v, 0.0) + w) }
        i += 1
      }
      a
    }

    def finish(b: Buf): MedianModeOut = {
      val med = new Array[Float](b.length)
      val mode = new Array[Float](b.length)
      var i = 0
      while (i < b.length) {
        val entries = b(i).toArray.sortBy(_._1)
        val total = entries.map(_._2).sum
        var cum = 0.0
        var m = Float.NaN
        var j = 0
        while (j < entries.length && m.isNaN) {
          cum += entries(j)._2
          if (cum >= total / 2.0) m = entries(j)._1
          j += 1
        }
        med(i) = m
        // mode: greatest total span; ties -> smallest value (entries sorted asc)
        mode(i) = if (entries.isEmpty) Float.NaN else entries.maxBy(_._2)._1
        i += 1
      }
      MedianModeOut(med.toSeq, mode.toSeq)
    }

    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[MedianModeOut] = Encoders.product[MedianModeOut]
  }

  /** Summary types served by the cheap moments aggregator; the rest
    * (median/mode) need the per-bin value→span map aggregator. */
  private val momentTypes: Set[SummaryType] = Set(
    SummaryType.Count, SummaryType.Min, SummaryType.Max, SummaryType.Sum,
    SummaryType.Mean, SummaryType.Variance, SummaryType.Sd)

  /** DataFrame-level API: per-group per-bin summaries in ONE shuffle.
    * `valuesCol` must be array<float>, `wCol` the span from
    * Summaries.withSpans.
    *
    * Only the aggregators needed for `types` run: a mean-only request
    * never pays the median/mode HashMap state (one value→span map per
    * bin per group, Kryo-serialized on every partial merge — pure waste
    * on the common mean/count path at 10^12 rows). Output columns are
    * the requested subset of: count, min, max, sum, mean, variance, sd,
    * median, mode (arrays). */
  def summarizeVector(
      spanned: DataFrame,
      groupCols: Seq[String],
      valuesCol: String,
      wCol: String = "w",
      types: Set[SummaryType] = momentTypes ++
        Set(SummaryType.Median, SummaryType.Mode)): DataFrame = {
    require(types.nonEmpty, "no summary types requested")
    val needMoments = types.exists(momentTypes)
    val needMedMode = types.contains(SummaryType.Median) ||
      types.contains(SummaryType.Mode)
    val (vc, wc) = (col(valuesCol), col(wCol).cast("double"))

    val aggs = Seq(
      if (needMoments)
        Some(udaf(new VectorMomentsAgg, Encoders.product[VW])(vc, wc).as("m"))
      else None,
      if (needMedMode)
        Some(udaf(new VectorMedianModeAgg, Encoders.product[VW])(vc, wc).as("mm"))
      else None).flatten

    val momentOuts =
      if (needMoments)
        Seq("count", "min", "max", "sum", "mean", "variance", "sd")
          .filter(n => types.exists(_.name == n) || (n == "count")) // count is free
          .map(n => col(s"m.$n").as(n))
      else Nil
    val mmOuts =
      if (needMedMode)
        Seq("median", "mode").filter(n => types.exists(_.name == n))
          .map(n => col(s"mm.$n").as(n))
      else Nil

    spanned.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) ++ momentOuts ++ mmOuts: _*)
  }
}
