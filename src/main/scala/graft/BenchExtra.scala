package graft

import org.apache.spark.sql.functions._

/** Round-6 optimization harness (guide §1): NOT part of the driver
  * contract — Bench.scala is frozen; this main exists so the round's
  * measurements (per-query isolation, noop-sink timing, plan capture)
  * are reproducible without touching the frozen harness.
  *
  * Modes:
  *   plans <outDir> [qnames...]  — write .explain("formatted") per query
  *   sweep [reps]                — Bench-style sweep (sorted order, warm
  *                                 session, count() action, memo cleared
  *                                 per rep) printed as one JSON line/rep
  *   noop [qnames...]            — noop-sink timing (full-column compute)
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.buildSession(cpus)
    val mode = if (args.isEmpty) "sweep" else args(0)

    // same session warm-up as the frozen bench
    try {
      spark.read.parquet(s"$sfDir/documents.parquet").groupBy(col("lang")).count().collect()
      spark.range(1000000).select(sum(col("id"))).collect()
      Seq("q01_lineitem_agg", "q02_order_join", "q03_window_topk").foreach { n =>
        SparkEntry.queries(n)(spark, sfDir).count()
      }
      spark.catalog.clearCache()
      SparkEntry.clearDupPairsMemo()
    } catch { case _: Throwable => () }

    mode match {
      case "plans" =>
        val outDir = args(1)
        new java.io.File(outDir).mkdirs()
        val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
        names.foreach { name =>
          try {
            val df = SparkEntry.queries(name)(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
            System.err.println(s"[plans] $name ok")
          } catch { case e: Throwable =>
            System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
          }
          spark.catalog.clearCache()
          SparkEntry.clearDupPairsMemo()
        }
      case "sweep" =>
        val reps = if (args.length > 1) args(1).toInt else 1
        for (rep <- 1 to reps) {
          SparkEntry.clearDupPairsMemo()
          val rs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
            spark.sparkContext.setJobDescription(name)
            val t0 = System.nanoTime()
            val ok = try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              System.err.println(s"[sweep] $name FAILED: ${e.getMessage}"); false }
            val sec = (System.nanoTime() - t0) / 1e9
            System.err.println(f"[sweep] $name%-24s $sec%8.2f s")
            spark.catalog.clearCache()
            name -> (if (ok) sec else -1.0)
          }
          val qs = rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
          val total = rs.map(_._2).filter(_ > 0).sum
          println(s"""{"rep":$rep,"total":$total,"loadavg":${Bench.loadavg()},"queries":$qs}""")
        }
      case "noop" =>
        val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
        names.foreach { name =>
          SparkEntry.clearDupPairsMemo()
          spark.sparkContext.setJobDescription(s"noop:$name")
          val t0 = System.nanoTime()
          try {
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            println(f"[noop] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
          } catch { case e: Throwable =>
            println(s"[noop] $name FAILED: ${e.getMessage}")
          }
          spark.catalog.clearCache()
        }
      case "joinphases" =>
        // Phase breakdown of the headline join section (guide §1.4):
        // same generator, same persist, fresh timings per phase with the
        // noop sink so each phase computes every column it claims to.
        import graft.functions.StareFunctions._
        val amplify = sys.env.get("SPARK_GRAFT_AMPLIFY").map(_.toInt).getOrElse(-1)
        val pts = Bench.buildPoints(spark, sfDir, amplify)
        pts.persist().count()
        val n = pts.count()
        def t(label: String)(f: => Unit): Double = {
          spark.sparkContext.setJobDescription(label)
          val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[joinphases] $label%-12s $s%6.2f s"); s
        }
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val covers = SparkEntry.coversDf(spark)
        // warm-up all plans once (codegen/JIT)
        noop(pts); noop(pts.withColumn("sid", stareSid(col("lat"), col("lon"), 26)))
        Bench.timeJoin(pts, covers)
        val indexed = pts.withColumn("sid", stareSid(col("lat"), col("lon"), 26))
        val joinedNoAgg = graft.operators.StareJoin.pointJoin(indexed, "sid", covers, "sids",
          how = "inner", knownMinLeftLevel = Some(26))
        noop(indexed.withColumn("k", stareClearTo(col("sid"), 6))); noop(joinedNoAgg)
        val scanSec = (1 to 3).map(_ => t("cache_scan")(noop(pts))).min
        val encodeSec = (1 to 3).map(_ => t("scan+encode")(noop(indexed))).min
        val clearSec = (1 to 3).map(_ => t("encode+clear")(noop(
          indexed.withColumn("k", stareClearTo(col("sid"), 6))))).min
        val joinNoAggSec = (1 to 3).map(_ => t("join_noagg")(noop(joinedNoAgg))).min
        // stage-level accounting for one full_join run: wall vs summed
        // executor run time tells CPU-bound from scheduling-bound
        val stageLog = new scala.collection.mutable.ArrayBuffer[(Int, String, Int, Long, Long)]
        val sl = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            stageLog.synchronized {
              stageLog += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
                si.taskMetrics.executorRunTime,
                si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)))
            }
          }
        }
        spark.sparkContext.addSparkListener(sl)
        val joinSec = (1 to 3).map(_ => t("full_join")(Bench.timeJoin(pts, covers))).min
        spark.sparkContext.removeSparkListener(sl)
        stageLog.foreach { case (id, nm, nt, run, wall) =>
          System.err.println(f"[stage] $id%4d $nm%-60s tasks=$nt%3d execRunMs=$run%7d wallMs=$wall%6d")
        }
        val matched = joinedNoAgg.count()
        // slim variant: covers without the fat sids payload in the output
        val slimCovers = covers // pointJoin prunes through Catalyst; compare a pre-dropped contract
        val joinedSlim = graft.operators.StareJoin.pointJoin(indexed, "sid",
          slimCovers, "sids", how = "inner", knownMinLeftLevel = Some(26))
          .select(col("region_name"))
        noop(joinedSlim)
        val slimSec = (1 to 3).map(_ => t("join_slim")(noop(joinedSlim))).min
        // executed (final AQE) plan of the aggregated query, post-action
        val agg = joinedNoAgg.groupBy(col("region_name")).agg(count(lit(1)))
        agg.collect()
        java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/joinphases_planagg.txt"),
          agg.queryExecution.executedPlan.toString)
        java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/joinphases_plan.txt"),
          joinedNoAgg.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        println(f"""{"rows":$n,"matched":$matched,"cache_scan_sec":$scanSec%.3f,""" +
          f""""scan_encode_sec":$encodeSec%.3f,"encode_clear_sec":$clearSec%.3f,""" +
          f""""join_noagg_sec":$joinNoAggSec%.3f,"join_slim_sec":$slimSec%.3f,""" +
          f""""full_join_sec":$joinSec%.3f}""")
      case "joinlab" =>
        // controlled matrix isolating the headline join's per-row cost
        import graft.functions.StareFunctions._
        import spark.implicits._
        val amplify = sys.env.get("SPARK_GRAFT_AMPLIFY").map(_.toInt).getOrElse(-1)
        val pts = Bench.buildPoints(spark, sfDir, amplify)
        pts.persist().count()
        def t(label: String)(f: => Unit): Unit = {
          val secs = (1 to 3).map { _ =>
            spark.sparkContext.setJobDescription(label)
            val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
          }
          System.err.println(f"[joinlab] $label%-22s ${secs.min}%6.2f s  (${secs.map(s => f"$s%.2f").mkString(",")})")
        }
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val indexed = pts.withColumn("sid", stareSid(col("lat"), col("lon"), 26))
        val keyed = indexed.withColumn("k", stareClearTo(col("sid"), 6))
        // manual dictionary: exactly the (key, region) pairs the pointJoin
        // dictionary carries, built on the driver
        val dict = SparkEntry.regions.flatMap { r =>
          graft.core.Sid.expandToLevel(SparkEntry.regionCover(r, 6), 6)
            .map(c => (c, r.name))
        }.toDF("k", "region_name")
        val covers = SparkEntry.coversDf(spark)
        // warm-ups
        noop(keyed); keyed.groupBy(col("k")).count().write.format("noop").mode("overwrite").save()
        t("encode_clear_noop")(noop(keyed))
        t("agg_nokey")(indexed.groupBy().count().collect())
        t("agg_bykey")(keyed.groupBy(col("k")).agg(count(lit(1))).write.format("noop").mode("overwrite").save())
        t("manual_join_agg")(keyed.join(broadcast(dict), Seq("k"))
          .groupBy(col("region_name")).agg(count(lit(1))).collect())
        t("manual_join_noagg")(noop(keyed.join(broadcast(dict), Seq("k"))))
        t("pointjoin_agg")(Bench.timeJoin(pts, covers))
        System.err.println(s"[joinlab] dict_rows=${dict.count()}")
        // variant A: key materialized in the cache (no encode in the join stage)
        val keyedMat = keyed.persist(); keyedMat.count()
        t("matkey_join_agg")(keyedMat.join(broadcast(dict), Seq("k"))
          .groupBy(col("region_name")).agg(count(lit(1))).collect())
        // variant B: non-STARE key, same cardinality — isolates the encode
        val hashKeyed = pts.withColumn("k", pmod(xxhash64(col("lat"), col("lon")), lit(7000)))
        val dict2 = (0L until 7000L).map(i => (i, s"g${i % 8}")).toDF("k", "region_name")
        t("hashkey_join_agg")(hashKeyed.join(broadcast(dict2), Seq("k"))
          .groupBy(col("region_name")).agg(count(lit(1))).collect())
        // variant C: stare key join with whole-stage codegen OFF
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        t("nowscg_join_agg")(keyedMat.join(broadcast(dict), Seq("k"))
          .groupBy(col("region_name")).agg(count(lit(1))).collect())
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        keyedMat.unpersist()
      case "q43parts" =>
        // cold-cost bisection of q43's pipeline (jobs + codegen)
        import graft.functions.StareFunctions._
        def t(label: String)(f: => Unit): Unit = {
          val t0 = System.nanoTime(); f
          System.err.println(f"[q43parts] $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
        val docs = SparkEntry.indexed(spark, sfDir)
        t("indexed_count")(docs.count())
        val joined = graft.operators.Skew.shuffleJoin(docs, "sid", SparkEntry.coversDf(spark),
          "sids", splitHot = None, how = "left", knownMinLeftLevel = Some(26))
        t("shufflejoin_count")(joined.count())
        t("q43_full")(SparkEntry.queries("q43_shuffle_join_left")(spark, sfDir).count())
        t("q43_warm")(SparkEntry.queries("q43_shuffle_join_left")(spark, sfDir).count())
      case "q27parts" =>
        // phase decomposition of the pods roundtrip (write / commit /
        // pruned read) — guide §6
        import graft.functions.StareFunctions._
        def t(label: String)(f: => Unit): Unit = {
          val t0 = System.nanoTime(); f
          System.err.println(f"[q27parts] $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
        val out = s"/tmp/graft_q27parts"
        graft.sources.Pods.trashAsync(java.nio.file.Paths.get(out))
        val docs = SparkEntry.indexed(spark, sfDir).select(col("doc_id"), col("sid"),
          col("lat"), col("lon"), col("warc_ts"), col("lang"))
        t("indexed_count")(docs.count())
        t("pods_write")(graft.sources.Pods.write(docs, out, "sid", podLevel = 2,
          lineageId = s"q27parts-${System.nanoTime()}", tsCol = Some("warc_ts"),
          chunkMs = 30L * 86400000L))
        val r = SparkEntry.region("europe_c")
        val t0 = 1700000600L; val t1 = 1700020000L
        t("pruned_read")(graft.sources.Pods.read(spark, out, SparkEntry.regionCover(r),
          timeRangeMs = Some((t0 * 1000, t1 * 1000)))
          .filter(SparkEntry.inRegion(r) && unix_timestamp(col("warc_ts")).between(t0, t1))
          .select(col("doc_id")).orderBy(col("doc_id")).count())
        t("q27_full")(SparkEntry.queries("q27_pods_roundtrip")(spark, sfDir).count())
        // commit-scan proxy: the read-back aggregation commitStore pays
        t("commit_scan")(spark.read.parquet(out)
          .groupBy(col("pod"), col("tchunk"))
          .agg(min(col("sid")), max(col("sid")), count(lit(1)),
            min(col("warc_ts")), max(col("warc_ts"))).collect())
        // raw write-only proxy (no manifests): same repartition+sort+write
        val out2 = "/tmp/graft_q27parts_raw"
        graft.sources.Pods.trashAsync(java.nio.file.Paths.get(out2))
        t("raw_write")(docs
          .withColumn("pod", starePod(col("sid"), 2))
          .withColumn("tchunk", floor((col("warc_ts").cast("double") * 1000).cast("long")
            / (30L * 86400000L)).cast("long"))
          .repartition(spark.sessionState.conf.numShufflePartitions, col("pod"), col("tchunk"))
          .sortWithinPartitions(col("sid"))
          .write.mode("overwrite")
          .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
          .partitionBy("pod", "tchunk").parquet(out2))
      case "qstages" =>
        // per-stage wall/executor-time accounting for one query (cold
        // then warm) — locates CPU-bound stages vs scheduling/compile
        val name = args(1)
        val stageLog = new scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long)]
        val sl = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            stageLog.synchronized {
              stageLog += ((si.stageId, si.numTasks, si.taskMetrics.executorRunTime,
                si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)))
            }
          }
        }
        spark.sparkContext.addSparkListener(sl)
        for (rep <- 1 to 2) {
          stageLog.clear()
          SparkEntry.clearDupPairsMemo()
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // let stage-completed events drain
          val (nstages, runMs, wallMs) = stageLog.synchronized {
            (stageLog.length, stageLog.map(_._3).sum, stageLog.map(_._4).sum)
          }
          System.err.println(f"[qstages] $name rep$rep: wall $wall%.2f s, $nstages stages, " +
            f"execRun ${runMs / 1e3}%.2f s, stage-wall ${wallMs / 1e3}%.2f s")
          stageLog.synchronized(stageLog.toSeq).sortBy(-_._3).take(6).foreach {
            case (id, nt, run, w) =>
              System.err.println(f"[qstages]   stage $id%4d tasks=$nt%3d execRunMs=$run%6d wallMs=$w%5d")
          }
        }
        spark.sparkContext.removeSparkListener(sl)
      case other => sys.error(s"unknown BenchExtra mode: $other")
    }
    spark.stop()
  }
}
