package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Transitive closure of a FUNCTIONAL graph (out-degree <= 1 — e.g. a D8
 * drainage forest, a parent-pointer hierarchy) by repeated squaring:
 * T_{k+1} = T_k UNION (T_k JOIN T_k), so paths of length up to 2^k are
 * covered after k rounds — O(log(longest path)) shuffle-join rounds, the
 * distributed alternative to sequential path walking (which would need
 * longest-path rounds: thousands on river networks).
 *
 * Output is every (u, v) pair with v strictly downstream of u. Its size is
 * the sum of path lengths — the inherent cost of EXACT flow accumulation /
 * descendant counting (each cell's count answers "how many upstream cells",
 * which is |reach| grouped by target). Cycles would merely saturate to the
 * cycle's pair set (the fixpoint still exists), but callers feeding
 * steepest-descent edges get acyclicity for free.
 *
 * Per round: one self-join shuffle + distinct, one lazy localCheckpoint
 * materialized by the convergence count — a single action per round, plan
 * lineage O(1).
 */
object FunctionalClosure {

  import IterativeLoops.materializedLeaf

  def ancestorPairs(edges: DataFrame, uCol: String, vCol: String,
                    maxRounds: Int = 48): DataFrame = {
    var t = materializedLeaf(
      edges.select(col(uCol).as("u"), col(vCol).as("v")).na.drop().distinct())
    var size = t.count()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = materializedLeaf(t
        .union(t.as("a").join(t.as("b"), col("a.v") === col("b.u"))
          .select(col("a.u").as("u"), col("b.v").as("v")))
        .distinct())
      val n2 = next.count()
      converged = n2 == size
      size = n2
      t = next
      round += 1
    }
    require(converged, s"closure did not converge in $maxRounds rounds")
    t
  }
}
