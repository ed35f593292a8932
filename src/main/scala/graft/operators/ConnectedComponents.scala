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
 * label table (pointer jump). Propagation alone needs diameter rounds (a
 * 100 TB corpus chain of near-dups can be long); the jump step follows
 * label pointers one hop, which compounds to doubling — measured round
 * counts grow ~log(diameter) (see ConnectedComponentsSpec's 256-path
 * assertion).
 *
 * Driver round-trips: rounds run BLIND in blocks of lazily-chained
 * localCheckpoints (the StacTraversal.walkItems shape) — no job, no action
 * per round. One job materializes the whole block and ONE probe per block
 * checks convergence (labels only decrease, so a quiet final round is the
 * exact fixpoint signal). Block lengths grow geometrically (2, 4, 8, ...)
 * capped at min(12, ceil(log2 nodes)+1): 12 because chained checkpoint
 * frames re-enter Catalyst planning with origin references whose cost
 * compounds per round (measured ~2.3x/round past ~15 chained frames; see
 * BENCH.md's exponential-planning incident — the block boundary's
 * materializedLeaf severs the chain), log2(n)+1 because doubling can never
 * need more rounds than that.
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

    // one action up front (on the just-checkpointed labels): n == 0 decides
    // the empty case, and ceil(log2 n)+1 bounds any useful block length —
    // doubling converges in ~log2(diameter) <= log2(n) rounds, so blocks
    // longer than that are pure waste
    val n = lbl.count()
    val maxBlock = math.max(2, math.min(12,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1)) + 1))

    var round = 0
    var converged = n == 0L
    // GEOMETRIC block lengths (2, 4, 8, ...): short-diameter graphs — the
    // common near-dup case — stop after ~2x the rounds they need, while a
    // deep graph still amortizes probes to O(log) of its round count. A
    // fixed-length first block would run 12 blind rounds on a graph that
    // converges in 4 (measured 2x wall on the q76 pair graph). Growth caps
    // at min(12, ceil(log2 n)+1): 12 bounds chained-frame planning cost
    // (it compounds with chain depth — see the header), log2(n)+1 bounds
    // what a graph of n nodes can ever need.
    var blockSize = math.min(2, maxBlock)
    while (!converged && round < maxRounds) {
      var prev = lbl
      var cur = lbl
      var steps = 0
      while (steps < blockSize && round < maxRounds) {
        prev = cur
        // (a) propagate: each node adopts the min label over its neighbors
        val nbrMin = sym.join(cur.withColumnRenamed("id", "nid"), col("v") === col("nid"))
          .groupBy(col("u").as("pid")).agg(min(col("lbl")).as("nl"))
        val prop = cur.join(nbrMin, col("id") === col("pid"), "left")
          .select(col("id"),
                  least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("l1"))
        // (b) pointer jump: follow the adopted label one hop through the
        // current label table (labels are ids, so lbl(l1) is defined). Note
        // the jump accelerates ID-CHAIN structures (near-dup graphs, paths),
        // not spatial value waves — grid-shaped inputs should be pre-reduced
        // with tile-local labeling (Focal.localRegionRoots) so only the tiny
        // cross-tile root graph reaches this loop.
        // LAZY checkpoint: the plan collapses to a flat LogicalRDD now, the
        // work runs inside the block-end materialization job — no action,
        // no job launched here.
        cur = prop
          .join(cur.select(col("id").as("jid"), col("lbl").as("jl")),
                col("l1") === col("jid"), "left")
          .select(col("id"),
                  least(col("l1"), coalesce(col("jl"), col("l1"))).as("lbl"))
          .localCheckpoint(false)
        steps += 1
        round += 1
      }
      // block boundary: ONE job materializes all chained rounds and severs
      // the frame; ONE probe compares the block's LAST TWO rounds (labels
      // only decrease, so a quiet final round IS the fixpoint — comparing
      // against block START would re-run a whole block whenever convergence
      // lands mid-block, doubling the round count for nothing). prev's
      // cached blocks were computed inside the same materialization job, so
      // the probe join reads two cached RDDs.
      val next = materializedLeaf(cur)
      val changed = next
        .join(prev.select(col("id").as("sid"), col("lbl").as("l0")),
              col("id") === col("sid"))
        .filter(col("lbl") < col("l0")).count()
      converged = changed == 0L
      lbl = next
      blockSize = math.min(maxBlock, blockSize * 2)
      // info, not warn: round progress is normal operation (warn is reserved
      // for data-affecting events, matching BucketedSelfJoin's convention)
      log.info(s"connected-components: $round rounds run, " +
        s"$changed labels changed in the last $steps-round block")
    }
    if (!converged && round >= maxRounds) {
      // rounds exhausted with the last block's FINAL round still changing —
      // the fixpoint may nonetheless be exactly at that round. One
      // verification propagation decides.
      val nbrMin = sym.join(lbl.withColumnRenamed("id", "nid"), col("v") === col("nid"))
        .groupBy(col("u").as("pid")).agg(min(col("lbl")).as("nl"))
      val changed = lbl.join(nbrMin, col("id") === col("pid"), "left")
        .filter(coalesce(col("nl"), col("lbl")) < col("lbl")).count()
      converged = changed == 0L
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")
    lbl
  }
}
