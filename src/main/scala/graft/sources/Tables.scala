package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-side operators (SURVEY.md §2.1 S1-S6).
  *
  * The reference's format zoo (wav/ogg/mp3/..., runner/main.cpp:236-255)
  * collapses to one table format here; what remains is source SELECTION
  * and rate normalization.
  */
object Tables {

  /** S1: the sequences table.
    *
    * BASELINE.json specifies an ICEBERG table of pre-tokenized
    * sequences; this environment ships no Iceberg runtime jar (offline
    * resolver), so parquet is the documented stand-in. The approximation
    * is precise and mechanical to swap (see README "Iceberg stand-in"):
    *
    *   - snapshot lineage/rollback  -> engine.Checkpoint manifests
    *     (per-bucket lineage + counters next to the output)
    *   - partition pruning          -> parquet partition discovery +
    *     filter pushdown (plan-asserted in PlanSpec)
    *   - hidden-partition bucketing -> engine.TableLayout (bucketed
    *     writes; exchange-free as-of join, plan-asserted)
    *   - schema evolution           -> Spark parquet mergeSchema
    *
    * A catalog-enabled cluster switches with ONE line: pass
    * `format = "iceberg"` (path = catalog table name) — every other
    * operator consumes the returned DataFrame unchanged. */
  def sequences(spark: SparkSession, path: String,
      format: String = "parquet"): DataFrame =
    format match {
      case "parquet" => spark.read.parquet(path)
      case other => spark.read.format(other).load(path)
    }

  /** S2: recursive directory source — collect every parquet under a tree
    * (the reference's `-r` walk, runner/main.cpp:488-513). */
  def sequencesRecursive(spark: SparkSession, root: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet").parquet(root)

  /** S3: playlist/manifest expansion (m3u analog, runner/main.cpp:515-549):
    * a manifest table of doc_ids selects the subset — broadcast semi join,
    * no shuffle of the fact side. */
  def fromManifest(sequences: DataFrame, manifest: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    sequences.join(broadcast(manifest.select(col(idCol)).distinct()),
      Seq(idCol), "left_semi")

  /** S6: resample-on-read analog — re-bucket an event-time column to a
    * common grid (the reference opens readers at the transform rate,
    * FeatureExtractionManager.cpp:723-763). Keeps integer time. When the
    * grid period (fromRate/toRate source ticks) is integral, the snap is
    * PURE int64 arithmetic — round(x·f)/f in doubles puts the result one
    * ulp under the grid point and a long cast then truncates to
    * grid−1 (measured: 1704067207200000 → …199999). Non-integral
    * periods keep the double path.
    *
    * The integral snap uses FLOOR division (x − pmod(x, p)) ∕ p, not
    * `div`: Spark `div` truncates toward zero, which for NEGATIVE
    * timestamps silently rounds the other way than both the double path
    * and the DuckDB `//` oracle (floor) — the divergence ADVICE r2
    * flagged. Floor-div is sign-correct for all int64 inputs. */
  def rebucketTs(df: DataFrame, tsCol: String, fromRateHz: Double,
      toRateHz: Double): DataFrame = {
    val period = fromRateHz / toRateHz
    if (period == math.rint(period) && period >= 1) {
      val p = period.toLong
      df.withColumn(tsCol,
        expr(s"((`$tsCol` + ${p / 2}L) - pmod(`$tsCol` + ${p / 2}L, ${p}L)) " +
          s"div ${p}L * ${p}L"))
    } else {
      // non-integral period: the grid point itself is fractional, so a
      // long result must round — cast-truncation would land one ulp
      // UNDER the grid point (round(x·f)/f evaluates e.g. 2.9999999999999996
      // for the grid point 3)
      val factor = toRateHz / fromRateHz
      df.withColumn(tsCol,
        round(round(col(tsCol).cast("double") * factor) / factor)
          .cast("long"))
    }
  }
}
