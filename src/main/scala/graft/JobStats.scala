package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Diagnostic harness (optimization guide §1 / §7.1 with the UI disabled):
  * run each named query twice (cold, then warm) and report, for the WARM
  * run, the listener-observed job/stage/task counts, summed task time,
  * shuffle bytes and spill — separating scheduler/plan overhead (wall ≫
  * task-time/cores) from genuine compute. Not part of the driver contract.
  *
  * Usage: JobStats <sfDir> <queryName> [queryName ...]   ("ALL" = registry)
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names: Seq[String] =
      if (args.length == 2 && args(1) == "ALL")
        SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("ref_"))
      else args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!sys.env.contains("GRAFT_NO_REWRITE"))
      graft.functions.RewriteDotProduct.install(spark)

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0)
    val gcMs = new AtomicLong(0)
    val shuffleRead = new AtomicLong(0)
    val shuffleWrite = new AtomicLong(0)
    val spill = new AtomicLong(0)
    // per-stage "name -> (tasks, taskTimeMs)" for the optional -stages mode
    val stageDetail = sys.env.contains("GRAFT_STAGE_DETAIL")
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (stageDetail) {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          val tt = if (tm != null) tm.executorRunTime else -1L
          val gc = if (tm != null) tm.jvmGCTime else -1L
          // first graft frame in the stage's long callsite — names the
          // operator code that submitted the stage (si.name alone is the
          // AQE thread-pool frame for every adaptive stage)
          val site = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("JobStats"))
            .map(_.trim.take(80)).getOrElse("")
          stageRows.add(f"    stage ${si.stageId}%4d tasks=${si.numTasks}%4d taskt=${tt / 1e3}%7.2fs gc=${gc / 1e3}%6.2fs ${si.name.take(60)} | $site")
        }
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = te.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    println(f"${"query"}%-28s ${"warm_s"}%8s ${"cold_s"}%8s ${"jobs"}%5s ${"stg"}%5s ${"tasks"}%6s ${"taskt_s"}%8s ${"gc_s"}%6s ${"shR_MB"}%7s ${"shW_MB"}%7s ${"spill_MB"}%8s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable => println(s"ERR cold $name: ${e.getClass.getSimpleName}") }
      val cold = (System.nanoTime() - t0) / 1e9
      // settle listener events from the cold run before zeroing
      Thread.sleep(200)
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0); gcMs.set(0)
      shuffleRead.set(0); shuffleWrite.set(0); spill.set(0); stageRows.clear()
      val t1 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable => println(s"ERR warm $name: ${e.getClass.getSimpleName}") }
      val warm = (System.nanoTime() - t1) / 1e9
      Thread.sleep(200)
      println(f"$name%-28s $warm%8.2f $cold%8.2f ${jobs.get}%5d ${stages.get}%5d ${tasks.get}%6d ${taskTimeMs.get / 1e3}%8.2f ${gcMs.get / 1e3}%6.2f ${shuffleRead.get / 1e6}%7.1f ${shuffleWrite.get / 1e6}%7.1f ${spill.get / 1e6}%8.1f")
      if (stageDetail) stageRows.forEach(r => println(r))
    }
    spark.stop()
  }
}
