package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact power-sum state for distributed variance: (n, sum, sumsq) of
  * integer-quantized values. Top-level case class — Catalyst's encoder
  * codegen cannot reference classes nested inside objects. */
final case class VarState(n: Long, sum: Long, sumsq: Long)

/**
 * Typed `Aggregator` (the Dataset custom-aggregation API) carrying exact
 * integer power sums: reduce/merge are pure BIGINT additions, so the result
 * is identical under ANY partitioning or merge order — the property a
 * floating-point variance aggregator cannot give. The caller derives
 * mean/variance from the returned integers (divisions happen once, in the
 * final projection, deterministically).
 *
 * Overflow headroom: sumsq grows as n * max(value)^2 — at 1e12 rows keep
 * quantized magnitudes under ~3e3 (or swap the Longs for a 128-bit pair);
 * the q91 inputs (whole dollars, <= ~6e5) are safe past 1e7 rows per group.
 */
object CentsVariance extends Aggregator[Long, VarState, VarState] {
  def zero: VarState = VarState(0L, 0L, 0L)
  def reduce(b: VarState, a: Long): VarState =
    VarState(b.n + 1L, b.sum + a, b.sumsq + a * a)
  def merge(x: VarState, y: VarState): VarState =
    VarState(x.n + y.n, x.sum + y.sum, x.sumsq + y.sumsq)
  def finish(r: VarState): VarState = r
  def bufferEncoder: Encoder[VarState] = Encoders.product[VarState]
  def outputEncoder: Encoder[VarState] = Encoders.product[VarState]
}
