package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.index.CellIndex

/**
 * Cell-prefix range partitioning (north rule: explicit repartitionByRange on
 * cell prefix to bound shuffle fan-out at 10^12-document scale).
 *
 * The Z-order index is hierarchical: a cell's ancestor at `prefixLevel` is a
 * morton-prefix (CellIndex.parent chains), so range-partitioning by the
 * prefix puts spatially adjacent data in the same (or neighboring)
 * partitions — downstream per-tile operators (mosaic, lineage writes,
 * neighborhood kernels) then shuffle within bounded key ranges instead of
 * scattering across the cluster, and partition pruning by cell-prefix works
 * on the materialized layout.
 */
object CellPartitioning {

  /** Column: ancestor cell id at a coarser level (pure bit math — same
    * result as CellIndex.parent applied (level-prefixLevel) times). */
  def prefixCol(cell: Column, level: Int, prefixLevel: Int): Column = {
    require(prefixLevel <= level, s"prefix $prefixLevel > level $level")
    val shift = 2 * (level - prefixLevel)
    val mortonMask = lit(0x03ffffffffffffffL)
    (lit(prefixLevel.toLong << 58)).bitwiseOR(shiftright(cell.bitwiseAND(mortonMask), shift))
  }

  /** Range-repartition by cell prefix; carries the prefix as `cell_prefix`. */
  def repartitionByCellPrefix(df: DataFrame, cellCol: String, level: Int,
                              prefixLevel: Int, numPartitions: Int): DataFrame =
    df.withColumn("cell_prefix", prefixCol(col(cellCol), level, prefixLevel))
      .repartitionByRange(numPartitions, col("cell_prefix"))

  /** Scalar mirror for tests. */
  def prefixOf(cell: Long, prefixLevel: Int): Long = {
    var c = cell
    while (CellIndex.level(c) > prefixLevel) c = CellIndex.parent(c)
    c
  }
}
