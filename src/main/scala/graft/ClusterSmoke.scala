package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-process execution evidence: everything else in this repo runs
  * `local[N]` (one JVM), which never exercises a real process boundary —
  * broadcast of the codegen reference objects (`ctx.addReferenceObj`
  * interval runs in NativeExpressions), the dissolve UDAF buffer
  * serde, and closure shipping are all written cluster-safe but would
  * only fail across real executor JVMs. `local-cluster[2,8,4096]`
  * starts a standalone master + 2 workers in-process and launches TWO
  * SEPARATE EXECUTOR PROCESSES, which is exactly the boundary a
  * 1000-executor cluster has.
  *
  * Protocol: run the headline cover join, q24 (native intersects +
  * pushdown), q23-style dissolve (UDAF buffers), and q27 pods
  * roundtrip (write + pruned read) on sf0.001 under local[4] and under
  * local-cluster[2,8,4096]; the results must match row for row.
  * Prints one JSON line; exit code != 0 on any mismatch. */
object ClusterSmoke {

  private def addOpens: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
    "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
    "java.base/sun.util.calendar").map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  private def session(master: String): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val withExec =
      if (master.startsWith("local-cluster")) b
        .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executor.memory", "3g")
      else b
    val s = withExec.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** the four probes; each returns a canonical sorted result string. */
  private def probes(spark: SparkSession, sfDir: String, tag: String): Map[String, String] = {
    import graft.functions.StareFunctions._
    val docs = SparkEntry.indexed(spark, sfDir)

    // 1. headline cover join across a real broadcast + codegen refs
    val join = graft.operators.StareJoin.pointJoin(docs, "sid", SparkEntry.coversDf(spark),
        "sids", how = "inner", knownMinLeftLevel = Some(26))
      .groupBy(col("region_name")).agg(count(lit(1)).as("pages"))
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").sorted.mkString(",")

    // 2. q24: native intersects expression (addReferenceObj run array
    // must serialize to the executor processes)
    val r = SparkEntry.region("europe_c")
    val subset = graft.operators.SpeedySubset(docs, "sid", SparkEntry.regionCover(r))
      .filter(SparkEntry.inRegion(r))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.mkString(",")

    // 3. dissolve: UDAF partial buffers merge ACROSS executors
    val dis = graft.operators.Dissolve(
        docs.withColumn("sids", array(stareClearTo(col("sid"), 8))),
        by = "lang", sidsCol = "sids", aggFuncs = Map("doc_id" -> "sum"))
      .select(col("lang"), col("doc_id"), size(col("sids")).cast("long").as("n_cells"))
      .collect().map(x => s"${x.getString(0)}:${x.getLong(1)}:${x.getLong(2)}").sorted.mkString(",")

    // 4. pods write + pruned read roundtrip through executor tasks
    val out = s"/tmp/graft_cluster_smoke_$tag"
    graft.sources.Pods.write(docs.select(col("doc_id"), col("sid")), out, "sid",
      podLevel = 2, lineageId = s"smoke-$tag-${java.util.UUID.randomUUID}")
    val pods = graft.sources.Pods.read(spark, out, SparkEntry.regionCover(r))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.mkString(",")

    // 5. shuffle-path LEFT join: packed stable ids (LogicalRDD over
    // queryExecution.toRdd via the shim) on BOTH sides, keyed equi-join,
    // pair join-back and assembly — the id derivation and the
    // internalCreateDataFrame leaf must behave identically when the
    // partitions run in separate executor JVMs
    val shj = graft.operators.Skew.shuffleJoin(docs, "sid", SparkEntry.coversDf(spark),
        "sids", how = "left", knownMinLeftLevel = Some(26))
      .groupBy(coalesce(col("region_name"), lit("__none")).as("rn"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").sorted.mkString(",")

    Map("join" -> join, "subset" -> subset, "dissolve" -> dis, "pods" -> pods,
      "shuffle_join" -> shj)
  }

  def run(sfDir: String): (Boolean, String) = {
    val local = {
      val s = session("local[4]")
      try probes(s, sfDir, "local") finally s.stop()
    }
    val cluster = {
      val s = session("local-cluster[2,8,4096]")
      try {
        val p = probes(s, sfDir, "cluster")
        // after the probes every task has run on a registered executor;
        // the status map holds driver + one entry per executor process
        val execs = s.sparkContext.getExecutorMemoryStatus.size - 1
        require(execs >= 2, s"expected >= 2 executor processes, saw $execs")
        p
      } finally s.stop()
    }
    val keys = local.keySet ++ cluster.keySet
    val diffs = keys.filter(k => local.get(k) != cluster.get(k))
    val ok = diffs.isEmpty && local("join").nonEmpty
    val detail = keys.toSeq.sorted.map { k =>
      s""""$k":${if (local.get(k) == cluster.get(k)) "\"match\"" else "\"MISMATCH\""}"""
    }.mkString(",")
    (ok, s"""{"cluster_smoke_ok":$ok,$detail}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val (ok, json) = run(sfDir)
    println(json)
    if (!ok) sys.exit(1)
  }
}
