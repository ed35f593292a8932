package graft.lineage

import org.apache.hadoop.fs.Path
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
 *  2. todo = input tile set anti-joined against completed;
 *  3. one distributed job writes todo via DYNAMIC partition overwrite —
 *     per-tile atomicity: a tile directory is replaced wholesale or not at
 *     all, so a kill mid-job leaves either the old or the new content,
 *     never a mix visible to readers (parquet job commit = atomic rename);
 *  4. lineage records for the newly written tiles are appended LAST —
 *     a tile is "done" only once its record is committed. A kill between
 *     3 and 4 recomputes those tiles (idempotent overwrite), never skips.
 *
 * All filesystem access goes through the Hadoop FileSystem API (works on
 * HDFS/S3A, not just file://), and lineage records are produced by a
 * DISTRIBUTED aggregation over the data just committed — per-tile row counts
 * and byte sizes come from a `_metadata.file_size` scan of the written
 * partitions, never from a driver-side per-tile stat loop (which is O(tiles)
 * driver RPCs and always-false exists() on object stores).
 *
 * The reference analog: WCS/export file caches keyed by request
 * (WCSAdapter.java:114-158, RasterEncoder.java:69-80) — replaced here by
 * deterministic recompute + a durable commit log.
 */
object TileLineage {

  val DataDir = "data"
  val LineageDir = "_lineage"

  final case class RunStats(tilesTotal: Long, tilesSkipped: Long, tilesWritten: Long, rowsWritten: Long)

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Distinct completed tile ids from the lineage log (empty on first run). */
  def completedTiles(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val path = s"$tableDir/$LineageDir"
    if (exists(spark, path))
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
    val allTiles = input.select($"tile_id").distinct().localCheckpoint(true)
    val total = allTiles.count()
    val todoTiles = allTiles.join(broadcast(done), Seq("tile_id"), "left_anti")
      .localCheckpoint(true)
    val nTodo = todoTiles.count()

    if (nTodo > 0) {
      val todo = input.join(broadcast(todoTiles), Seq("tile_id"), "left_semi")
      val poison = udf { t: String =>
        if (failTiles.contains(t)) throw new RuntimeException(s"injected failure at tile $t")
        t
      }
      val toWrite = if (failTiles.isEmpty) todo
                    else todo.withColumn("tile_id", poison($"tile_id"))
      // per-write option, not session conf: mutating the session-wide
      // partitionOverwriteMode would silently change unrelated writes.
      // repartition by tile_id first: without it every task writes a file
      // into every tile directory it sees (tasks x tiles tiny files — the
      // classic dynamic-partition small-file explosion); with it each tile
      // is exactly one file
      toWrite.repartition($"tile_id")
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tile_id")
        .parquet(s"$tableDir/$DataDir")
      // job committed: now (and only now) record lineage — per-tile rows and
      // bytes from a distributed scan of the committed files' metadata
      // (reading back what the job ACTUALLY wrote, not what it intended to)
      val now = System.currentTimeMillis()
      // the hidden _metadata column must be projected at the scan itself
      // (it does not resolve through joins/projections added later).
      // tile_id comes from the PARTITION DIRECTORY NAME in the file path,
      // not the re-inferred partition column: inference would re-type
      // numeric-looking ids ("007" -> 7) and the semi-join against the
      // string todo set would silently drop every row — no lineage, eternal
      // recompute. The path string is exactly what partitionBy wrote
      // (modulo Hive %XX escaping, undone here).
      val unescape = udf { s: String =>
        val sb = new StringBuilder(s.length)
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (c == '%' && i + 2 < s.length) {
            sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3
          } else { sb.append(c); i += 1 }
        }
        sb.toString
      }
      val perFile = readTable(spark, tableDir)
        .select(col("_metadata.file_path").as("file"),
                col("_metadata.file_size").as("file_bytes"))
        .withColumn("tile_id", unescape(regexp_extract($"file", "/tile_id=([^/]+)/", 1)))
        .join(broadcast(todoTiles), Seq("tile_id"), "left_semi")
        .groupBy($"tile_id", $"file")
        .agg(count(lit(1)).as("rows"), first($"file_bytes").as("bytes"))
      val records = perFile.groupBy($"tile_id")
        .agg(sum($"rows").as("rows"), sum($"bytes").as("bytes"))
        .select($"tile_id", $"rows", $"bytes",
                lit(attempt).as("attempt"), lit(now).as("completed_at_ms"))
        .localCheckpoint(true)
      records.coalesce(1)
        .write.mode(SaveMode.Append).parquet(s"$tableDir/$LineageDir")
      val agg = records.agg(count(lit(1)), coalesce(sum($"rows"), lit(0L))).head()
      RunStats(total, total - nTodo, agg.getLong(0), agg.getLong(1))
    } else {
      RunStats(total, total, 0L, 0L)
    }
  }
}
