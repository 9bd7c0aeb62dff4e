package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI gate for multi-process execution (VERDICT r2 ask #4): runs
  * graft.ClusterSmoke in a child JVM so the standalone-master session
  * (`local-cluster[2,8,4096]` — real executor processes) cannot clash
  * with the other suites' `local[*]` singleton sessions. The smoke
  * compares the headline join, native-intersects subset, dissolve UDAF,
  * and pods roundtrip row-for-row between local[4] and two real
  * executor JVMs — broadcast payloads, `ctx.addReferenceObj` codegen
  * references, and UDAF partial buffers all cross a process boundary. */
class ClusterSmokeSpec extends AnyFunSuite {

  test("local-cluster[2,8,4096]: results match local[4] across real executor processes") {
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
      "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar").flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq("-Xmx4g", "-Dspark.ui.enabled=false",
      "-cp", cp, "graft.ClusterSmoke", "/root/testdata/sf0.001")
    val pb = new ProcessBuilder(cmd: _*)
    // the executor-process launcher resolves the scala dir from this (no
    // build layout under SPARK_HOME in this sandbox)
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.redirectErrorStream(false)
    val p = pb.start()
    val errDrain = new Thread(() => p.getErrorStream.readAllBytes()) // keep the child unblocked
    errDrain.setDaemon(true); errDrain.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val rc = p.waitFor()
    val line = out.linesIterator.find(_.startsWith("{\"cluster_smoke_ok\"")).getOrElse("")
    assert(rc === 0, s"cluster smoke child exited $rc: $out")
    assert(line.contains("\"cluster_smoke_ok\":true"), s"smoke line: $line")
    Seq("join", "subset", "dissolve", "pods", "shuffle_join").foreach { k =>
      assert(line.contains(s""""$k":"match""""), s"probe $k mismatched: $line")
    }
  }
}
