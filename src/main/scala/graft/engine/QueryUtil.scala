package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE tokenization contract shared by every gate query and its DuckDB
  * oracle: documents.text splits on single spaces and each word maps to
  * its LENGTH (word-length tokens keep values small and integer-exact).
  * One definition on the Scala side and ONE SQL fragment — the gate
  * queries in Queries/Queries2/3/4 all delegate here, so the engine and
  * oracle can never silently desynchronize per file. */
private[engine] object QueryUtil {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def docsTok(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("tokens", transform(split(col("text"), " "), w => length(w)))
      .withColumn("n_tok", size(col("tokens")))

  /** The sequences-schema projection (input_hint shape). */
  def seqsOf(s: SparkSession, dir: String): DataFrame =
    docsTok(s, dir).select(
      col("doc_id").cast("string").as("doc_id"),
      col("tokens"), col("n_tok"), col("source"))

  /** DuckDB equivalent of docsTok's tokens column. */
  val toksSql: String =
    "list_transform(string_split(text, ' '), w -> length(w))"

  /** THE frames CTE (step 8, block 16) shared by every frame-windowed
    * oracle (q30/q42/q43 energies, q49 vector means, q53 spectra): one
    * definition so the framing contract cannot drift per file, exactly
    * like toksSql. */
  val framesCte: String =
    s"""t AS (SELECT doc_id::VARCHAR AS doc_id, $toksSql AS toks
              FROM documents),
       f AS (
         SELECT doc_id, toks,
                unnest(range((len(toks) - 16) // 8 + 1)) AS frame
         FROM t WHERE len(toks) >= 16)"""
}
