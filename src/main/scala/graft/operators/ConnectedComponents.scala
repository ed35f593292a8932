package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components by iterated min-label propagation with
 * pointer jumping — the finishing step of every near-duplicate pipeline:
 * LSH/Jaccard emits PAIRS, but dedup needs CLUSTERS (keep one representative
 * per component of the pair graph). The reference's dedup surface stops at
 * pair emission; this closes it the way production training-data pipelines
 * do (cf. the MapReduce CC literature: Rastogi et al. "Finding Connected
 * Components in MapReduce", Kiveris et al. "Connected Components in
 * MapReduce and Beyond" — this is the label-propagation + path-doubling
 * variant, chosen because every round is two shuffle joins expressible as
 * plain DataFrame ops, no collected state, no driver-side graph).
 *
 * Semantics: every node's final label is the MINIMUM node id in its
 * component — algorithm-independent, so the DuckDB oracle can replay it
 * with a recursive CTE while Spark runs the log-round version.
 *
 * Scale: per round, (a) one aggregation of neighbor labels (shuffle on the
 * symmetric edge list, map-side partial min) and (b) one self-join of the
 * label table (pointer jump). Labels only decrease, so the fixpoint check
 * is a cheap any-change probe on the round's already-checkpointed output.
 * Propagation alone needs diameter rounds (a 100 TB corpus chain of
 * near-dups can be long); the jump step follows label pointers one hop,
 * which compounds to doubling — measured round counts grow ~log(diameter)
 * (see ConnectedComponentsSpec's 256-path assertion). Each round is
 * localCheckpoint(true)-bounded so plan lineage stays O(1).
 */
object ConnectedComponents {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /**
   * Component labels for the undirected graph given as an edge list.
   *
   * @param edges DataFrame with two columns of the same orderable type;
   *              multiplicity and orientation are irrelevant, null
   *              endpoints are dropped.
   * @return one row per distinct node appearing in `edges`:
   *         (id, lbl) with lbl = min node id of the node's component.
   *         Nodes with no edges are the caller's to add back
   *         (coalesce(lbl, id) after a left join).
   */
  import IterativeLoops.materializedLeaf

  def minLabel(edges: DataFrame, aCol: String, bCol: String,
               maxRounds: Int = 64, edgesDistinct: Boolean = false): DataFrame = {
    val e0 = edges.select(col(aCol).as("u"), col(bCol).as("v")).na.drop()
    // symmetric, deduplicated edge list — reused verbatim every round.
    // edgesDistinct: the caller guarantees distinct oriented pairs (a < b),
    // making the symmetrized union distinct by construction — skips a full
    // shuffle of the edge list (LSH pair generators already emit this shape)
    val symRaw = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .filter(col("u") =!= col("v"))
    val sym = materializedLeaf(if (edgesDistinct) symRaw else symRaw.distinct())

    // round 0: lbl(v) = min(v, neighbors(v))
    var lbl = materializedLeaf(
      sym.groupBy(col("u").as("id")).agg(min(col("v")).as("mn"))
        .select(col("id"), least(col("id"), col("mn")).as("lbl")))

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // (a) propagate: each node adopts the min label over its neighbors
      val nbrMin = sym.join(lbl.withColumnRenamed("id", "nid"), col("v") === col("nid"))
        .groupBy(col("u").as("pid")).agg(min(col("lbl")).as("nl"))
      val prop = lbl.join(nbrMin, col("id") === col("pid"), "left")
        .select(col("id"), col("lbl").as("old"),
                least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("l1"))
      // (b) pointer jump: follow the adopted label one hop through the
      // current label table (labels are ids, so lbl(l1) is defined). Note
      // the jump accelerates ID-CHAIN structures (near-dup graphs, paths),
      // not spatial value waves — grid-shaped inputs should be pre-reduced
      // with tile-local labeling (Focal.localRegionRoots) so only the tiny
      // cross-tile root graph reaches this loop.
      val next = materializedLeaf(prop
        .join(lbl.select(col("id").as("jid"), col("lbl").as("jl")),
              col("l1") === col("jid"), "left")
        .select(col("id"), col("old"),
                least(col("l1"), coalesce(col("jl"), col("l1"))).as("lbl")))
      val changed = next.filter(col("lbl") < col("old")).count()
      converged = changed == 0L
      lbl = next.select(col("id"), col("lbl"))
      round += 1
      log.warn(s"connected-components round $round: $changed labels changed")
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")
    lbl
  }
}
