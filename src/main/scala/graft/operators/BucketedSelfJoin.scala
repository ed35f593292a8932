package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Capped LSH bucket self-join: candidate pairs from rows sharing a bucket
 * key, with buckets larger than `cap` excluded BEFORE the join — one
 * degenerate bucket (a stop-signature, an all-identical band) is otherwise
 * an O(n^2) self-join that no amount of parallelism saves at corpus scale.
 *
 * No silent caps: the number of dropped buckets and the rows they held are
 * counted and logged (warn) whenever the cap fires. The bucket-count pass is
 * a cheap aggregation over the (small) signature table; the oversized set is
 * broadcast into a left_anti join, so the cap adds no extra shuffle of the
 * candidate volume.
 */
object BucketedSelfJoin {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /**
   * Pairs (id_a < id_b) of `idCol` values sharing all `bucketCols`, from
   * buckets of size <= cap only. Output columns: doc_a, doc_b (distinct).
   */
  def pairs(sigs: DataFrame, bucketCols: Seq[String], idCol: String,
            cap: Int, tag: String): DataFrame = {
    val keys = bucketCols.map(col)
    val counts = sigs.groupBy(keys: _*).agg(count(lit(1)).as("n_bucket"))
    val oversized = counts.filter(col("n_bucket") > cap)
    // no-silent-caps rule: surface what the cap removed
    val dropped = oversized.agg(
      count(lit(1)).as("n_buckets"),
      coalesce(sum(col("n_bucket")), lit(0L)).as("n_rows")).head()
    if (dropped.getLong(0) > 0)
      log.warn(s"[$tag] LSH bucket cap $cap dropped ${dropped.getLong(0)} " +
        s"bucket(s) holding ${dropped.getLong(1)} row(s) from candidate generation")
    val kept = sigs.join(broadcast(oversized.select(keys: _*)), bucketCols, "left_anti")
    kept.as("a").join(kept.as("b"), bucketCols)
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }
}
