package graft.api

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

/**
 * Deterministic, stage-once fixture directories for queries that synthesize
 * file-backed inputs (the GeoTIFF scan queries q68/q69/q73/q74).
 *
 * Earlier rounds created a fresh temp dir + a fresh JVM shutdown hook on
 * EVERY query invocation, so one driver run (Verify + bench warmup + bench
 * measured pass) accumulated 3+ hooks per query and re-synthesized the
 * fixture tree inside the timed region — fixture I/O polluted the bench
 * number. This helper fixes both:
 *
 *  - the path is deterministic per (name, version): `$tmpdir/graft_stage/
 *    <name>_v<version>`, so a warmup pass at any sf pre-stages the exact
 *    dir the measured pass reads (the fixtures derive from nation.parquet,
 *    which is byte-identical across all sf dirs — verified);
 *  - synthesis runs at most once per JVM (and is skipped entirely when a
 *    prior process already staged it): a `_STAGED` marker commits the
 *    synthesis, half-written trees from a killed run are wiped and redone;
 *  - exactly ONE shutdown hook for the whole JVM, registered lazily on
 *    first use, which removes the staging root.
 *
 * Bump `version` whenever the synthesized content changes — the path is the
 * cache key. In local mode this stages to the local tmpdir; on a cluster
 * the same contract targets shared storage (any path all executors see).
 */
object FixtureStage {
  private val staged = new ConcurrentHashMap[String, String]()
  @volatile private var hookInstalled = false

  private def root: Path = Paths.get(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_stage")

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      try Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(q => { Files.deleteIfExists(q); () })
      catch { case _: Exception => () }
    }

  private def ensureHook(): Unit = if (!hookInstalled) synchronized {
    if (!hookInstalled) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(root)))
      hookInstalled = true
    }
  }

  /**
   * Returns the absolute path of the staged directory for (name, version),
   * running `synth(dir)` first iff no committed staging exists.
   */
  def stage(name: String, version: Int)(synth: String => Unit): String = {
    val key = s"${name}_v$version"
    val cached = staged.get(key)
    if (cached != null) return cached
    synchronized {
      val again = staged.get(key)
      if (again != null) return again
      ensureHook()
      val dir = root.resolve(key)
      val marker = dir.resolve("_STAGED")
      if (!Files.exists(marker)) {
        deleteTree(dir) // wipe any half-written tree from a killed run
        Files.createDirectories(dir)
        synth(dir.toAbsolutePath.toString)
        Files.createFile(marker)
      }
      val abs = dir.toAbsolutePath.toString
      staged.put(key, abs)
      abs
    }
  }
}
