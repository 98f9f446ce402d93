package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: an ordered rule table of
  * (name, regex, replacement tag) applied as chained codegen'd
  * `regexp_replace` calls, with per-rule match counts taken on the text
  * each rule actually SEES (rules apply in order, so an earlier rule
  * consumes its matches before later patterns run — an email's digits
  * can never double-count as a phone number). Map-only: no shuffle, no
  * UDF, no state; at corpus scale this is an embarrassingly parallel
  * scan and the regex work stays inside whole-stage codegen — the same
  * shape a 1000-executor cluster wants, with column pruning and filter
  * pushdown untouched above it.
  *
  * The default patterns use the RE2/Java-common regex subset
  * (`\d`, `\b`, bounded repeats, character classes — no backrefs, no
  * lookahead) so the DuckDB oracle (q60) runs the SAME pattern strings;
  * keep to that subset when adding rules.
  */
object Redact {

  /** One redaction rule: matches of `pattern` are replaced by `tag` and
    * counted into column `n_<name>`. */
  final case class Rule(name: String, pattern: String, tag: String)

  /** Default web-corpus rules, ordered most-specific first (email before
    * IPv4 so a dotted hostname's digits are consumed as part of the
    * address, never re-matched as an IP). */
  val defaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    Rule("phone", "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}", "<PHONE>"),
    Rule("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Adds one `n_<rule>` count column per rule, the total `n_redacted`,
    * and `redacted_text` (the fully chained replacement). The input
    * column is left untouched. */
  def redact(df: DataFrame, textCol: String,
      rules: Seq[Rule] = defaultRules): DataFrame = {
    require(rules.nonEmpty, "at least one redaction rule required")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate rule names")
    // fail-loudly convention (ADVICE r5): withColumn would silently
    // OVERWRITE pre-existing columns with these names
    val outCols = rules.map(r => s"n_${r.name}") ++
      Seq("n_redacted", "redacted_text")
    val clash = outCols.filter(df.columns.contains)
    require(clash.isEmpty,
      s"redact output columns already exist in the input: ${clash.mkString(", ")}")
    // thread the text through the rule chain; each rule's count is taken
    // on the text AFTER all earlier rules applied (sequential semantics,
    // mirrored verbatim by the oracle CTE chain)
    val (redacted, counts) =
      rules.foldLeft((col(textCol), Vector.empty[(String, Column)])) {
        case ((txt, acc), r) =>
          (regexp_replace(txt, r.pattern, r.tag),
            acc :+ (r.name -> regexp_count(txt, lit(r.pattern))))
      }
    val withCounts = counts.foldLeft(df) { case (d, (n, c)) =>
      d.withColumn(s"n_$n", c)
    }
    withCounts
      .withColumn("n_redacted", counts.map(_._2).reduce(_ + _))
      .withColumn("redacted_text", redacted)
  }
}
