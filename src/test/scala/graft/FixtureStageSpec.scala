package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.FixtureStage

/** Stage-once semantics: one synthesis per (name, version) per JVM,
  * atomic-rename commit (no partially-visible tree), distinct versions get
  * distinct trees, and a tree committed by another process is reused
  * without re-synthesis. */
class FixtureStageSpec extends AnyFunSuite {

  test("synth runs once per key; versions are distinct") {
    var calls = 0
    val name = s"spec_${System.nanoTime()}" // unique per test run
    def stageOnce(): String = FixtureStage.stage(name, version = 1) { out =>
      calls += 1
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(out, "data.txt"), "v1")
    }
    val d1 = stageOnce()
    val d2 = stageOnce()
    assert(d1 == d2)
    assert(calls == 1)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(d1, "data.txt")) == "v1")
    // a bumped version is a different tree
    var calls2 = 0
    val d3 = FixtureStage.stage(name, version = 2) { out =>
      calls2 += 1
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(out, "data.txt"), "v2")
    }
    assert(d3 != d1 && calls2 == 1)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(d3, "data.txt")) == "v2")
  }

  test("a tree committed by another process is reused without re-synthesis") {
    val name = s"spec_pre_${System.nanoTime()}"
    val dir = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_stage", s"${name}_v1")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("data.txt"), "theirs")
    var calls = 0
    val out = FixtureStage.stage(name, version = 1) { d =>
      calls += 1
      java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "data.txt"), "mine")
    }
    assert(calls == 0) // committed tree wins; no wipe, no re-synth
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "data.txt")) == "theirs")
  }

  test("a killed run's scratch never becomes visible; fresh staging commits") {
    val name = s"spec_kill_${System.nanoTime()}"
    // simulate a killed prior process: an uncommitted scratch dir lingers
    val root = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_stage")
    java.nio.file.Files.createDirectories(root)
    val scratch = java.nio.file.Files.createTempDirectory(root, s".${name}_v1.")
    java.nio.file.Files.writeString(scratch.resolve("stale.txt"), "junk")
    val out = FixtureStage.stage(name, version = 1) { d =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "good.txt"), "ok")
    }
    // the committed tree is complete and contains none of the stale scratch
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "stale.txt")))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "good.txt")) == "ok")
  }
}
