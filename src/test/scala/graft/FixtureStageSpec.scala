package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.FixtureStage

/** Stage-once semantics: one synthesis per (name, version) per JVM, commit
  * marker guards against half-written trees, distinct versions get
  * distinct trees. */
class FixtureStageSpec extends AnyFunSuite {

  test("synth runs once per key; marker commits; versions are distinct") {
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
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d1, "_STAGED")))
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

  test("an uncommitted (killed-run) tree is wiped and re-synthesized") {
    val name = s"spec_kill_${System.nanoTime()}"
    // simulate a half-written tree from a killed prior process: dir exists,
    // stale content present, no _STAGED marker
    val dir = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_stage", s"${name}_v1")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("stale.txt"), "junk")
    val out = FixtureStage.stage(name, version = 1) { d =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "good.txt"), "ok")
    }
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "stale.txt")))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "good.txt")) == "ok")
  }
}
