package graft

import org.scalatest.funsuite.AnyFunSuite

/** Board output-path policy (round-12 directive #2): the committed clean
  * board must survive side runs and contaminated runs — `Bench` writes
  * to exactly one path, and a run whose contamination banner fired never
  * overwrites an existing board.
  */
class BenchBoardSpec extends AnyFunSuite {

  test("env override wins: full JSON goes ONLY to SPARK_GRAFT_BENCH_OUT") {
    val (p, diverted) = Bench.resolveBoardPath(Some("/tmp/side.json"),
      contaminated = false, exists = _ => true)
    assert(p == "/tmp/side.json" && !diverted)
  }

  test("default path is cwd bench_full.json when the env var is unset") {
    val (p, diverted) = Bench.resolveBoardPath(None,
      contaminated = false, exists = _ => false)
    assert(p == "bench_full.json" && !diverted)
  }

  test("a contaminated run never clobbers an existing board — diverted aside") {
    val (p, diverted) = Bench.resolveBoardPath(None,
      contaminated = true, exists = _ == "bench_full.json")
    assert(p == "bench_full.json.contaminated" && diverted)
  }

  test("a contaminated run with NO existing board writes the target (stamped as such in JSON)") {
    val (p, diverted) = Bench.resolveBoardPath(Some("/tmp/fresh.json"),
      contaminated = true, exists = _ => false)
    assert(p == "/tmp/fresh.json" && !diverted)
  }

  test("contaminated side-run leaves the committed board untouched on a real fs") {
    val dir = java.nio.file.Files.createTempDirectory("board")
    val board = dir.resolve("bench_full.json")
    java.nio.file.Files.writeString(board, "{\"clean\":true}\n")
    val (p, diverted) = Bench.resolveBoardPath(Some(board.toString),
      contaminated = true,
      exists = s => java.nio.file.Files.exists(java.nio.file.Paths.get(s)))
    // the policy routes the write elsewhere; the clean file is untouched
    assert(diverted && p == board.toString + ".contaminated")
    assert(java.nio.file.Files.readString(board).contains("\"clean\":true"))
  }

  test("boot identity stamps are readable and plausibly shaped") {
    // boot_id is a kernel UUID on linux (empty only if /proc unreadable)
    val b = Bench.bootId()
    assert(b.isEmpty || b.matches("[0-9a-f-]{36}"), b)
    assert(Bench.uptimeSec() >= 0.0)
  }
}
