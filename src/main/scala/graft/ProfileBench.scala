package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-19 optimization instrumentation (guide §1: measure first).
  *
  * For each selected registry query, under the EXACT session config the
  * driver's Bench uses, this records per-run wall time plus the
  * listener-level shape of the work — jobs, stages, tasks, shuffle
  * read/write bytes, executor run/CPU time — and writes the
  * `.explain("formatted")` plan to `<outDir>/<name>_<tag>.txt`. Usage:
  *
  *   sbt 'runMain graft.ProfileBench <sfDir> <outDir> <tag> [names...]'
  *
  * Streaming queries execute on build, so their "plan" file records the
  * listener shape only (micro-batch machinery has no executedPlan until
  * started; the wall/task numbers are the evidence that matters there).
  *
  * Pure measurement tooling: reads the same registry Bench reads, never
  * mutates anything, noop sink like Bench so full plans materialize.
  */
object ProfileBench {

  private final class Probe extends SparkListener {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufRead = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    val runTimeMs = new AtomicLong(0L)
    val cpuTimeMs = new AtomicLong(0L)
    val gcTimeMs = new AtomicLong(0L)
    /** (jobId, submitNanos) -> completion line, in completion order. */
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      val site = Option(j.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
      jobStart.put(j.jobId, (System.nanoTime(), site))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      Option(jobStart.remove(j.jobId)).foreach { case (t0, site) =>
        val ms = (System.nanoTime() - t0) / 1e6
        jobLines.add(f"      job ${j.jobId}%3d ${ms}%7.1f ms  $site")
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        runTimeMs.addAndGet(m.executorRunTime)
        cpuTimeMs.addAndGet(m.executorCpuTime / 1000000L)
        gcTimeMs.addAndGet(m.jvmGCTime)
      }
    }
    def snapshot: String =
      s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
        s"shufRead=${shufRead.get} shufWrite=${shufWrite.get} " +
        s"execRunMs=${runTimeMs.get} execCpuMs=${cpuTimeMs.get} gcMs=${gcTimeMs.get}"
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      shufRead.set(0L); shufWrite.set(0L)
      runTimeMs.set(0L); cpuTimeMs.set(0L); gcTimeMs.set(0L)
      jobLines.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r19")
    val tag = args.lift(2).getOrElse("before")
    val names = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val k = math.max(1, sys.env.get("SPARK_GRAFT_BENCH_K").map(_.toInt).getOrElse(3))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val probe = new Probe
    spark.sparkContext.addSparkListener(probe)

    val streamingNames = operators.StreamingQueries.all.map(_.name).toSet
    val selected = SparkEntry.benchQueries
      .filter(q => names.isEmpty || names.contains(q.name))

    def releaseCaches(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // warmup pass at sf0.001 (JIT/codegen/parquet classes), like Bench
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) selected.foreach { q =>
      try q.fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[profile-warmup] ${q.name}: ${e.getMessage}")
      }
      releaseCaches()
    }

    val rows = selected.map { q =>
      spark.sparkContext.setJobDescription(q.name)
      // plan dump (batch queries only — streaming executes on build)
      if (!streamingNames.contains(q.name)) {
        try {
          val df = q.fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$outDir/${q.name}_$tag.txt", "UTF-8")
          try w.println(plan) finally w.close()
        } catch { case e: Throwable =>
          System.err.println(s"[profile-plan] ${q.name}: ${e.getMessage}")
        }
        releaseCaches()
      }
      val walls = (1 to k).map { i =>
        probe.reset()
        val t0 = System.nanoTime()
        try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[profile] ${q.name} run $i failed: ${e.getMessage}")
        }
        val wall = (System.nanoTime() - t0) / 1e6
        val shape = probe.snapshot
        releaseCaches()
        (wall, shape)
      }
      spark.sparkContext.setJobDescription(null)
      val med = walls.map(_._1).sorted.apply(walls.size / 2)
      val line = f"${q.name}%-36s med=${med}%8.1f ms  min=${walls.map(_._1).min}%8.1f  " +
        walls.last._2
      println("PROF " + line)
      if (sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")) {
        import scala.jdk.CollectionConverters._
        probe.jobLines.asScala.foreach(println) // last run's job timeline
      }
      line
    }
    val w = new java.io.PrintWriter(s"$outDir/profile_$tag.txt", "UTF-8")
    try rows.foreach(w.println) finally w.close()
    spark.stop()
  }
}
