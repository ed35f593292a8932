package graft.lineage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Resumable per-tile materialization with lineage checkpoints — the
 * "Iceberg metadata table" stand-in (SURVEY.md §7.0: no Iceberg jar in this
 * environment, so partitioned parquet + an explicit `_lineage` side table
 * behind this facade; the API shape stays swappable for a real catalog).
 *
 * Layout of a graft table:
 *   <dir>/data/tile_id=<t>/...parquet    one partition dir per tile
 *   <dir>/_lineage/...parquet            append-only commit records
 *                                        (tile_id, rows, bytes, attempt,
 *                                         completed_at_ms)
 *
 * Write discipline (north rule: a killed run resumes without recomputing
 * completed tiles):
 *  1. completed = distinct tile_ids in _lineage (the commit log);
 *  2. todo = input anti-joined against completed;
 *  3. one distributed job writes todo via DYNAMIC partition overwrite —
 *     per-tile atomicity: a tile directory is replaced wholesale or not at
 *     all, so a kill mid-job leaves either the old or the new content,
 *     never a mix visible to readers (parquet job commit = atomic rename);
 *  4. lineage records for the newly written tiles are appended LAST —
 *     a tile is "done" only once its record is committed. A kill between
 *     3 and 4 recomputes those tiles (idempotent overwrite), never skips.
 *
 * The reference analog: WCS/export file caches keyed by request
 * (WCSAdapter.java:114-158, RasterEncoder.java:69-80) — replaced here by
 * deterministic recompute + a durable commit log.
 */
object TileLineage {

  val DataDir = "data"
  val LineageDir = "_lineage"

  final case class RunStats(tilesTotal: Long, tilesSkipped: Long, tilesWritten: Long, rowsWritten: Long)

  /** Distinct completed tile ids from the lineage log (empty on first run). */
  def completedTiles(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val path = s"$tableDir/$LineageDir"
    if (new java.io.File(path).exists())
      spark.read.parquet(path).select($"tile_id").distinct()
    else
      spark.emptyDataset[String].toDF("tile_id")
  }

  /** The lineage log itself (tile_id, rows, bytes, attempt, completed_at_ms). */
  def lineage(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(s"$tableDir/$LineageDir")

  /** Read the materialized table back. */
  def readTable(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(s"$tableDir/$DataDir")

  /**
   * Materialize `input` (must carry a `tile_id` column) under `tableDir`,
   * skipping tiles already committed to lineage. Returns run statistics.
   * `failTiles` injects a fault for resume tests: the job throws while
   * writing any of those tiles (simulating a killed spark-submit).
   */
  def runResumable(spark: SparkSession, input: DataFrame, tableDir: String,
                   attempt: Int = 1, failTiles: Set[String] = Set.empty): RunStats = {
    import spark.implicits._

    val done = completedTiles(spark, tableDir)
    val total = input.select($"tile_id").distinct().count()
    val todo = input.join(broadcast(done), Seq("tile_id"), "left_anti")

    val poison = udf { t: String =>
      if (failTiles.contains(t)) throw new RuntimeException(s"injected failure at tile $t")
      t
    }
    val toWrite = if (failTiles.isEmpty) todo
                  else todo.withColumn("tile_id", poison($"tile_id"))

    // per-tile counts BEFORE the write so the lineage append after the job
    // commits exactly what the job wrote (deterministic input => same rows)
    val counts = todo.groupBy($"tile_id").agg(count(lit(1)).as("rows")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    if (counts.nonEmpty) {
      // per-write option, not session conf: mutating the session-wide
      // partitionOverwriteMode would silently change unrelated writes
      toWrite.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tile_id")
        .parquet(s"$tableDir/$DataDir")
      // job committed: now (and only now) record lineage
      val now = System.currentTimeMillis()
      val records = counts.toSeq.map { case (t, n) =>
        val bytes = dirBytes(s"$tableDir/$DataDir/tile_id=$t")
        (t, n, bytes, attempt, now)
      }
      records.toDF("tile_id", "rows", "bytes", "attempt", "completed_at_ms")
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(s"$tableDir/$LineageDir")
    }
    RunStats(total, done.count(), counts.length, counts.map(_._2).sum)
  }

  private def dirBytes(path: String): Long = {
    val d = new java.io.File(path)
    if (!d.exists()) 0L
    else d.listFiles().filter(_.isFile).map(_.length()).sum
  }
}
