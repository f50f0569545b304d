package graft

import org.scalatest.funsuite.AnyFunSuite

/** Session-scoped caches (Dedup.vocabCache, AnnIndex.handles) must not
  * accumulate entries pinned to dead sessions: an application-end
  * listener clears them, and a lookup-time sweep drops stopped-context
  * entries. Runs in a CHILD JVM (probe) because stopping a SparkContext
  * is JVM-global and the suites share one. */
class CacheLifecycleSpec extends AnyFunSuite {

  test("stopping a session evicts its cached vocab + ANN handles") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ Bench.jdk17AddOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"), "graft.CacheLifecycleProbe")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toList
    val rc = proc.waitFor()
    assert(rc == 0, s"probe JVM failed rc=$rc; output: ${out.mkString(" | ")}")
    val line = out.find(_.startsWith("PROBE ")).getOrElse(
      fail(s"no PROBE line in: ${out.mkString(" | ")}"))
    def v(k: String): Int =
      (k + "=(\\d+)").r.findFirstMatchIn(line).get.group(1).toInt
    assert(v("during") == 1, s"vocab must be cached while the session lives: $line")
    assert(v("annDuring") == 1, s"handle must be cached while the session lives: $line")
    assert(v("afterStop") == 0,
      s"the application-end listener must clear the vocab cache: $line")
    assert(v("annAfterStop") == 0,
      s"the application-end listener must clear the ANN handles: $line")
    assert(v("after2") == 1,
      s"a fresh session must see only its own entry, no stale ones: $line")
  }
}
