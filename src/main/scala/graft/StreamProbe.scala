package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch timing probe for the streaming replays (guide §1:
  * measure first). Runs one named entry from SparkEntry through the
  * noop sink and prints every micro-batch's durationMs breakdown
  * (triggerExecution / addBatch / getBatch / latestOffset /
  * queryPlanning / walCommit / commitOffsets) plus per-operator state
  * commit times — the evidence that tells fixed micro-batch machinery
  * cost apart from actual data work before any optimization is
  * attempted. Not part of the driver contract; measurement tooling
  * only.
  *
  * Usage: runMain graft.StreamProbe <queryName> [sfDir] [reps]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // job-level breakdown: which actions inside foreachBatch bodies
    // cost what (duration, task count, first-stage name)
    val jobs = scala.collection.mutable.ArrayBuffer[String]()
    // rep-start nanotime, for job start offsets (gap analysis)
    val probeT0 = new java.util.concurrent.atomic.AtomicLong(
      System.nanoTime())
    val jobStart = new java.util.concurrent.ConcurrentHashMap[
      Integer, (Long, Int, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart)
            : Unit = {
          val tasks = e.stageInfos.map(_.numTasks).sum
          val site = e.stageInfos.lastOption.map(_.name)
            .getOrElse("?")
          jobStart.put(e.jobId,
            (System.nanoTime(), tasks, site.take(60)))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd)
            : Unit = {
          Option(jobStart.remove(e.jobId)).foreach {
            case (t0, tasks, site) =>
              val ms = (System.nanoTime() - t0) / 1000000
              val off = (t0 - probeT0.get()) / 1000000
              jobs.synchronized {
                jobs += f"job=${e.jobId}%4d t0=$off%6d ms=$ms%5d tasks=$tasks%3d $site"
              }
          }
        }
        // per-stage wall + cumulative task time: names which stage of
        // a multi-stage micro-batch job carries the cost
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = e.stageInfo
          val wall = (for {
            a <- si.submissionTime; b <- si.completionTime
          } yield b - a).getOrElse(-1L)
          val m = si.taskMetrics
          val detail =
            if (m == null) ""
            else f" run=${m.executorRunTime}%4d " +
              f"deser=${m.executorDeserializeTime}%3d " +
              f"gc=${m.jvmGCTime}%3d cpu=${m.executorCpuTime / 1000000}%4d" +
              f" sched=${wall * si.numTasks - m.executorRunTime - m.executorDeserializeTime}%4d"
          jobs.synchronized {
            jobs += f"  stage=${si.stageId}%4d ms=$wall%5d " +
              f"tasks=${si.numTasks}%3d$detail ${si.name.take(40)}"
          }
        }
      })
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryIdle(
          e: StreamingQueryListener.QueryIdleEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        def d(k: String): Long =
          Option(p.durationMs.get(k)).map(_.longValue).getOrElse(-1L)
        val state = p.stateOperators.toSeq
          .map(s => s"op=${s.operatorName} commit=${s.commitTimeMs}" +
            s" upd=${s.allUpdatesTimeMs} rm=${s.allRemovalsTimeMs}" +
            s" rows=${s.numRowsTotal} mem=${s.memoryUsedBytes}")
          .mkString(" | ")
        lines.synchronized {
          lines += f"batch=${p.batchId}%2d trig=${d("triggerExecution")}%5d" +
            f" add=${d("addBatch")}%5d get=${d("getBatch")}%4d" +
            f" off=${d("latestOffset")}%4d plan=${d("queryPlanning")}%4d" +
            f" wal=${d("walCommit")}%4d cmt=${d("commitOffsets")}%4d" +
            s" rows=${p.numInputRows} [$state]"
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val fn = (SparkEntry.queries ++ SparkEntry.benchOnly)(name)
    (1 to reps).foreach { rep =>
      lines.synchronized(lines.clear())
      jobs.synchronized(jobs.clear())
      spark.catalog.clearCache()
      probeT0.set(System.nanoTime())
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async — drain before reading
      Thread.sleep(500)
      println(f"[probe] $name rep=$rep total=$sec%.2f s")
      lines.synchronized(lines.toSeq).foreach(l =>
        println("[probe]   " + l))
      if (rep == reps)
        jobs.synchronized(jobs.toSeq).foreach(l =>
          println("[probe] " + l))
    }
    spark.stop()
  }
}
