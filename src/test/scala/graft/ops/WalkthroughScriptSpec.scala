package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The README "Operate the engine" walkthrough as a REGRESSION GATE,
  * not documentation: `tools/walkthrough.sh` drives CurateCli →
  * ReconcileCli (exit-code contract + DuckDB row-count cross-check) →
  * JsonStage → two chained SessionCensusCli runs via `java -cp` on the
  * compiled classes, and exits nonzero on any drift. The oracle step
  * is skipped here — `graft.Verify` + `tools/check_oracle.py` is its
  * own gate — and sf0.001 keeps this suite fast. The script's
  * fresh-JVM launches are the point: they prove the launchers work
  * cold, outside sbt and outside a shared test session. */
class WalkthroughScriptSpec extends AnyFunSuite {

  test("tools/walkthrough.sh: README walkthrough end-to-end at sf0.001") {
    val repo = new java.io.File(".").getCanonicalFile
    assume(new java.io.File(repo, "tools/walkthrough.sh").isFile,
      "walkthrough script present")
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "sf0.001 testdata present")
    val pb = new ProcessBuilder("bash", "tools/walkthrough.sh",
      "--sf", "/root/testdata/sf0.001", "--skip-oracle")
    pb.directory(repo)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    assert(code == 0, s"walkthrough exited $code:\n$out")
    assert(out.contains("WALKTHROUGH OK"), s"missing OK line:\n$out")
    // the drift checks that actually ran, visible in the transcript
    assert(out.contains("cross-checked against DuckDB") ||
      out.contains("duckdb unavailable"), out)
    assert(out.contains("delta chained"), out)
  }
}
