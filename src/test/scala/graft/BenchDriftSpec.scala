package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's drift-confirmation rule (r12). The r11 capture
  * "confirmed" six drift flags that a quiet host refuted because the
  * end-of-suite recheck ran inside the same contended window — wall
  * reproduction alone cannot tell a starved query from a slow one. The
  * rule under test: a flag confirms only when the recheck leg reproduces
  * the WALL regression AND shows an own-work regression (its process-CPU
  * seconds > 2x the committed reference cpu). These tests drive
  * [[Bench.confirmDrift]] with the r11 signatures directly — no Spark,
  * no timing, fully deterministic. */
class BenchDriftSpec extends AnyFunSuite {

  // r11's e05 signature: reference warm ~1.0 s at ~12 cores of useful
  // work; the "slow" recheck read 12 s wall but burned only 1.2 cores —
  // starved by competing load, cpu flat. Must NOT confirm.
  test("a starved recheck (wall regressed, own-CPU flat) does not confirm") {
    assert(!Bench.confirmDrift(
      refWall = Some(1.0), refCpu = Some(12.0),
      recheckOk = true, recheckWall = 12.0, recheckCpu = 14.0))
  }

  // A genuine data-path regression (an extra shuffle, a lost pushdown)
  // does more WORK: wall and own-CPU rise together. Must confirm.
  test("a genuine regression (wall and own-CPU both >2x) confirms") {
    assert(Bench.confirmDrift(
      refWall = Some(1.0), refCpu = Some(12.0),
      recheckOk = true, recheckWall = 3.0, recheckCpu = 36.0))
  }

  test("a recheck whose wall recovered does not confirm, regardless of cpu") {
    assert(!Bench.confirmDrift(
      refWall = Some(1.0), refCpu = Some(12.0),
      recheckOk = true, recheckWall = 1.1, recheckCpu = 40.0))
  }

  // Pre-r12 BASELINE rows carry no cpu columns: the legacy wall-only
  // rule applies so the defense tightens as rows are re-recorded rather
  // than silently never confirming on old rows.
  test("no cpu reference falls back to the legacy wall-only rule") {
    assert(Bench.confirmDrift(
      refWall = Some(1.0), refCpu = None,
      recheckOk = true, recheckWall = 3.0, recheckCpu = 0.5))
    assert(!Bench.confirmDrift(
      refWall = Some(1.0), refCpu = None,
      recheckOk = true, recheckWall = 1.5, recheckCpu = 99.0))
  }

  // A JVM without com.sun.management reports cpu = -1: telemetry
  // unavailable must mean wall-only, never "cpu flat, refute".
  test("unavailable cpu telemetry (cpu < 0) falls back to wall-only") {
    assert(Bench.confirmDrift(
      refWall = Some(1.0), refCpu = Some(12.0),
      recheckOk = true, recheckWall = 3.0, recheckCpu = -1.0))
  }

  test("a recheck that errored keeps the flag (an error never reads as refuted)") {
    assert(Bench.confirmDrift(
      refWall = Some(1.0), refCpu = Some(12.0),
      recheckOk = false, recheckWall = -1.0, recheckCpu = -1.0))
  }

  test("baseline parse: 3-, 4- and 5-column rows; last occurrence wins") {
    val md =
      """
        |# some table
        || query | warm | cold |
        ||---|---|---|
        || d01_dedup_exact | 1.500 | 3.000 |
        |
        |# re-baselined later with cpu columns (last row wins)
        || query | warm | cold | cpu_warm_s | cpu_cold_s |
        ||---|---|---|---|---|
        || d01_dedup_exact | 1.200 | 2.800 | 14.250 | 30.100 |
        || e05_ann_recall | 1.000 | 2.000 | 12.000 |
        || t01_text_stats | 0.400 | 0.900 |
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("baseline", ".md")
    try {
      java.nio.file.Files.write(f, md.getBytes("UTF-8"))
      val refs = Bench.baselineRefs(f.toString)
      assert(refs("d01_dedup_exact") == Bench.Ref(1.2, 2.8, Some(14.25), Some(30.1)))
      assert(refs("e05_ann_recall") == Bench.Ref(1.0, 2.0, Some(12.0), None))
      assert(refs("t01_text_stats") == Bench.Ref(0.4, 0.9, None, None))
    } finally java.nio.file.Files.delete(f)
  }

  test("baseline parse: missing file yields no references (no flags)") {
    assert(Bench.baselineRefs("/nonexistent/BASELINE.md").isEmpty)
  }

  test("cpuDiff surfaces unavailable telemetry as -1, never as zero own-work") {
    // on a JVM without com.sun.management, cpuS() is a constant -1.0;
    // a naive after-before would read 0.0 = "present, zero work" and
    // the own-CPU gate would silently refute every genuine regression
    assert(Bench.cpuDiff(-1.0, -1.0) == -1.0)
    assert(Bench.cpuDiff(-1.0, 5.0) == -1.0)
    assert(Bench.cpuDiff(5.0, -1.0) == -1.0)
    assert(Bench.cpuDiff(2.0, 7.5) == 5.5)
  }
}
