package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Shared machinery for DataFrame FIXPOINT LOOPS (connected components,
 * transitive closure, any iterate-until-stable dataflow).
 */
object IterativeLoops {

  /**
   * Materialize + SEVER: `localCheckpoint` truncates the execution lineage,
   * but the returned LogicalRDD still carries origin constraints/stats
   * referencing the producing plan — chained across loop iterations, that
   * metadata makes Catalyst's per-round PLANNING time grow EXPONENTIALLY
   * (measured on q85's 22-round CC: flat 0.3 s/round for ~16 rounds, then
   * 1/2/4/9/24 s while task counts stayed flat and the 25 s round-22 gap
   * sat between jobs — pure driver planning; invisible below ~15 rounds).
   * Rebuilding the frame from the checkpointed RDD drops every reference
   * to the old plan, so each round starts from a bare leaf. The extra Row
   * conversion runs over the already-cached checkpoint blocks.
   *
   * Every loop round MUST route its new state through this — a plain
   * localCheckpoint is not enough.
   */
  def materializedLeaf(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /**
   * Materialize-on-first-action variant: the lineage is severed NOW (the
   * returned frame is a bare leaf over the checkpoint RDD, so the
   * exponential-planning hazard above cannot occur), but the blocks cache
   * inside the CALLER'S NEXT action — a fixpoint round that follows its
   * materialization with a termination count pays ONE job for both instead
   * of two (guide §7.3: on small per-round states the fixed per-job
   * driver overhead dominates the loop; measured ~0.85 s of pure driver
   * gap across q80's 32 jobs). The caller's first action must consume
   * every partition fully — counts and non-short-circuiting joins qualify,
   * limit-style actions do not.
   */
  def materializedLeafLazy(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(false)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
