package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sweep gate itself is under test (round-16 verdict task 1): a
  * deliberately slowed derived-artifact BUILD must trip the floored 2x
  * gate exactly like a slowed query — tools/test_sweep_gate.py runs
  * sweep_gate.py against synthetic fixtures (no sbt subprocesses:
  * SWEEP_GATE_NO_ISOLATE short-circuits the isolate protocol, which is
  * the confirmation path a real regression takes anyway). Wired into sbt
  * test so a gate-script edit can't silently defang the build gate.
  */
class SweepGateSpec extends AnyFunSuite {
  test("a deliberately slowed build (and query) trips the gate; clean and sub-floor sweeps pass") {
    val repoRoot = new java.io.File(".").getCanonicalFile
    val script = new java.io.File(repoRoot, "tools/test_sweep_gate.py")
    assume(script.exists(), s"gate test script missing at $script")
    val python = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => new java.io.File(p).exists())
    assume(python.nonEmpty, "python3 unavailable on this box")
    val pb = new ProcessBuilder(python.get, script.getPath)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val rc = proc.waitFor()
    assert(rc === 0, s"gate self-test failed (rc=$rc):\n$out")
  }
}
