package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/**
 * Capped LSH bucket self-join: candidate pairs from rows sharing a bucket
 * key, with buckets larger than `cap` excluded BEFORE the join — one
 * degenerate bucket (a stop-signature, an all-identical band) is otherwise
 * an O(n^2) self-join that no amount of parallelism saves at corpus scale.
 *
 * No silent caps: the number of dropped buckets and the rows they held are
 * counted and logged (warn) whenever the cap fires — LAZILY, through a named
 * `observe()` metric collected by a per-session QueryExecutionListener when
 * the query actually runs, so constructing the (lazy) DataFrame launches no
 * job. The bucket-count pass is a cheap aggregation over the (small)
 * signature table; the oversized set is broadcast into the probe, so the cap
 * adds no extra shuffle of the candidate volume.
 */
object BucketedSelfJoin {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** observe() names must be unique within a query; a counter disambiguates
    * multiple pairs() calls composed into one plan. */
  private val obsCounter = new AtomicInteger(0)

  /** Sessions that already carry the cap-logging listener (by session hash —
    * sessions are never unregistered; local-mode sessions are few). */
  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def ensureListener(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_bucket_cap_")) {
              val rows = row.getAs[Long]("n_rows_dropped")
              if (rows > 0L)
                log.warn(s"[$name] LSH bucket cap dropped " +
                  s"${math.round(row.getAs[Double]("n_buckets_dropped"))} bucket(s) " +
                  s"holding $rows row(s) from candidate generation")
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })
    }

  /**
   * Rows whose `keyCols` group has size <= cap; oversized groups (stop
   * signatures, stop n-grams) are dropped entirely, with the drop LOGGED
   * lazily through the observe()/listener machinery above. Shared by the
   * pair generator below and any keyed cap (e.g. q49's stop-gram drop).
   */
  def cappedByKey(rows: DataFrame, keyCols: Seq[String], cap: Int,
                  tag: String): DataFrame = {
    ensureListener(rows.sparkSession)
    val nb = "__graft_n_bucket" // internal marker; underscored against input collisions
    val keys = keyCols.map(k => col(s"`$k`")) // quoted: dots are field syntax
    val oversized = rows.groupBy(keys: _*).agg(count(lit(1)).as(nb))
      .filter(col(nb) > cap)
    // left join against the (tiny, broadcast) oversized set with NULL-SAFE
    // (<=>) key equality: GROUP BY collects NULL keys into a real group, so
    // a >cap NULL-key group must be capped (and counted in the observation)
    // like any other — null-unsafe equality would let it bypass the cap
    // silently. The marker is non-null exactly on dropped rows, so the
    // observation counts both rows (sum of 1) and buckets (sum of
    // 1/n_bucket — integral by construction) without a driver-side job.
    val in = rows.as("graft_cap_in")
    val over = oversized.as("graft_cap_over")
    // backtick-quote column names so dots (nested-field syntax) in user
    // columns don't break the alias-qualified references
    def q(alias: String, c: String) = col(s"$alias.`$c`")
    val cond = keyCols.map(k => q("graft_cap_in", k) <=> q("graft_cap_over", k))
      .reduce(_ && _)
    val flagged = in.join(broadcast(over), cond, "left")
      .select(rows.columns.map(c => q("graft_cap_in", c)) :+ col(nb): _*)
      .observe(s"graft_bucket_cap_${tag}_${obsCounter.incrementAndGet()}",
        sum(when(col(nb).isNotNull, 1L).otherwise(0L)).as("n_rows_dropped"),
        coalesce(sum(when(col(nb).isNotNull,
          lit(1.0) / col(nb))), lit(0.0)).as("n_buckets_dropped"))
    flagged.filter(col(nb).isNull).drop(nb)
  }

  /**
   * Pairs (id_a < id_b) of `idCol` values sharing all `bucketCols`, from
   * buckets of size <= cap only. Output columns: doc_a, doc_b (distinct).
   */
  def pairs(sigs: DataFrame, bucketCols: Seq[String], idCol: String,
            cap: Int, tag: String): DataFrame = {
    val kept = cappedByKey(sigs, bucketCols, cap, tag)
    kept.as("a").join(kept.as("b"), bucketCols)
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }
}
