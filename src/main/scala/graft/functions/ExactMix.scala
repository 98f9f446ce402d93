package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, pmod}

/** THE oracle-portable exact-int64 mix family — one definition for the
  * constants that several operators (LSH plane coefficients, IVF
  * centroid sampling, deterministic sampling) and their DuckDB oracles
  * must agree on bit-for-bit:
  *
  *   mix(t) = ((t² mod M)·2654435761 + 40503·t + 1299721) mod M,
  *   M = 1000003 (prime)
  *
  * Every intermediate stays < 2⁶³ for t ∈ [0, M): (t² mod M)·2654435761
  * < 2.7·10¹⁵. Applied TWICE wherever decorrelation matters (one round
  * has sequential correlation — measured ANN recall drop 0.5 → 0.36).
  * The three faces (Scala scalar, Catalyst Column, SQL text) live here
  * together so a constant tweak cannot update one and silently break
  * engine/oracle parity in another — the same one-definition rule as
  * QueryUtil.toksSql. */
object ExactMix {
  val M = 1000003L

  /** Scalar face (plan-build-time folding, e.g. plane matrices). */
  def mix(t: Long): Long =
    ((t * t % M) * 2654435761L + 40503L * t + 1299721L) % M

  /** Catalyst Column face (per-row evaluation, e.g. sampling). */
  def mixCol(t: Column): Column =
    pmod((t * t % M) * 2654435761L + lit(40503L) * t + 1299721L, lit(M))

  /** SQL face: the mix of SQL expression `t` (DuckDB oracle text). */
  def mixSql(t: String): String =
    s"((($t)*($t) % $M) * 2654435761 + 40503*($t) + 1299721) % $M"
}
