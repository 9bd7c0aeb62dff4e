package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence (north rule): run the identical
  * spatial-join workload at local[N] and local[4N] on the same input and
  * report throughput at both plus efficiency = (T_N / T_4N) / 4.
  * Sandbox stand-in for an N-executor vs 4N-executor cluster
  * (BASELINE.md measurement protocol).
  *
  * Each measurement runs in a fresh child JVM: reusing one JVM for both
  * sessions skewed the second run >5x (codegen/GC state), which measures
  * the JVM, not the plan.
  */
object Scaling {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val amplify = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "3200").toInt
    val lowCores = sys.env.getOrElse("SPARK_GRAFT_LOW", "8").toInt
    val highCores = lowCores * 4

    if (args.nonEmpty) { // child mode: one measurement, one JSON line
      val cores = args(0).toInt
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      // materialize the point table once; warm-up join (codegen + JIT),
      // then best-of-3: the sandbox host carries external background
      // load (loadavg ~5 with no processes of ours), so single
      // measurements are noisy; min approximates the uncontended steady
      // state a dedicated cluster would see
      val pts = Bench.buildPoints(spark, sfDir, amplify)
      pts.persist()
      val rows = pts.count()
      val covers = SparkEntry.coversDf(spark)
      Bench.timeJoin(pts, covers) // warm-up
      val sec = (1 to 3).map(_ => Bench.timeJoin(pts, covers)).min
      println(s"""{"cores":$cores,"sec":$sec,"rows":$rows}""")
      spark.stop()
      return
    }

    def runChild(cores: Int): (Double, Long) = {
      val java = System.getProperty("java.home") + "/bin/java"
      val cp = Bench.childClasspath(getClass) // spark-submit-safe (see Bench)
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
        "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
        "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
        "java.base/sun.util.calendar").flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq(java) ++ addOpens ++ Seq(
        s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
        "-Dspark.ui.enabled=false", "-cp", cp, "graft.Scaling", cores.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(false)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.environment().put("SPARK_GRAFT_AMPLIFY", amplify.toString)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor()
      val line = out.linesIterator.filter(_.startsWith("{\"cores\"")).toSeq.lastOption
        .getOrElse(sys.error(s"child produced no measurement: $out"))
      val sec = """"sec":([0-9.E-]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
      val rows = """"rows":([0-9]+)""".r.findFirstMatchIn(line).get.group(1).toLong
      (sec, rows)
    }

    // The sandbox host carries fluctuating external load; run the pair
    // three times alternating and keep each level's minimum (the least
    // contended observation — what a dedicated cluster would measure).
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val pairs = (1 to reps).map { i =>
      val lo = runChild(lowCores)
      val hi = runChild(highCores)
      System.err.println(f"[scaling] rep $i: low=${lo._1}%.2f s high=${hi._1}%.2f s")
      (lo, hi)
    }
    val (tLow, rows) = pairs.map(_._1).minBy(_._1)
    val (tHigh, _) = pairs.map(_._2).minBy(_._1)
    val eff = (tLow / tHigh) / (highCores.toDouble / lowCores)
    System.err.println(f"[scaling] local[$lowCores]: $tLow%.2f s (${rows / tLow}%.0f rows/s)")
    System.err.println(f"[scaling] local[$highCores]: $tHigh%.2f s (${rows / tHigh}%.0f rows/s)")
    System.err.println(f"[scaling] efficiency: $eff%.3f (target >= 0.8)")
    println(s"""{"metric":"scaling-efficiency","value":$eff,"unit":"ratio","rows":$rows,""" +
      s""""low_cores":$lowCores,"high_cores":$highCores,"t_low_sec":$tLow,"t_high_sec":$tHigh,""" +
      s""""rows_per_sec_low":${(rows / tLow).toLong},"rows_per_sec_high":${(rows / tHigh).toLong},"sf":"$sfDir"}""")
  }
}
