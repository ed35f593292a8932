package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Scan-parallelism guard for per-row-expensive pipelines (optimization
 * guide §2.6 idle capacity / §6 input split size).
 *
 * A small single-file parquet input plans as ONE scan task (file size is
 * far below `spark.sql.files.maxPartitionBytes` and a parquet file never
 * splits below a row group), so every expensive per-row stage fused onto
 * the scan — from_json, regex extraction, per-token md5, higher-order
 * array folds — runs on one core of a 32-core session. Measured on the
 * round-6 baseline: q46 7.7 s wall with task_sec 7.5 over 4 tasks, q65
 * 5.5 s / 5 tasks, q50 4.7 s / 4 tasks — single-threaded compute with 31
 * idle cores.
 *
 * `wide` widens such a scan by ONE round-robin repartition to the session
 * default parallelism, and is a NO-OP whenever the source already plans
 * at least that many partitions — the 100-TB case, where inputs split
 * into thousands of tasks and an extra exchange of the payload would be
 * pure loss. The parallelism target derives from the session (never a
 * hard-coded core count), so the same code is right at any width.
 *
 * Correctness: every declared query is reshard-stable by design (integer-
 * quantized sums, per-key aggregation, unique order keys — detcheck proves
 * bit-identical output at 4 vs 32 cores), so partitioning is never a
 * correctness input; the round-robin repartition is deterministic under
 * retries (sort-before-repartition, on by default).
 */
object Inputs {

  /** Round-robin-widen `df` to the session default parallelism iff its
    * current plan has fewer partitions (small local inputs); no-op at
    * scale. */
  def wide(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** `spark.read.parquet(path)` behind the widening guard — the standard
    * read for the corpus-sized tables (documents/embeddings/events/...)
    * that feed per-row-heavy operators. */
  def parquet(s: SparkSession, path: String): DataFrame = wide(s.read.parquet(path))
}
