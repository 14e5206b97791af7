package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Stage-level profiler for one harness query — the §1 "empirical loop"
  * companion to [[Explain]]: runs the query through the noop sink (the
  * Bench methodology) with a listener that aggregates per-stage wall,
  * executor-CPU, shuffle bytes and task counts, then prints jobs and the
  * top stages by duration. Diagnostic surface only; never run by the
  * round driver.
  *
  * Usage: `sbt "runMain graft.ProfileQuery <name> [sfDir]"` (or the
  * direct-classpath runner); SPARK_GRAFT_CPUS as in Bench.
  */
object ProfileQuery {
  private case class StageAgg(name: String, var wallMs: Long = 0,
    var cpuMs: Long = 0, var tasks: Int = 0, var shufRead: Long = 0,
    var shufWrite: Long = 0, var input: Long = 0, var submitted: Long = 0,
    var completed: Long = 0)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // same warmup as Bench so one-time startup isn't charged to the query
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    val stages = mutable.LinkedHashMap.empty[Int, StageAgg]
    val jobs = mutable.LinkedHashMap.empty[Int, (Long, Long, Int)] // start, end, nStages
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val agg = stages.getOrElseUpdate(si.stageId, StageAgg(si.name))
        agg.submitted = si.submissionTime.getOrElse(0L)
        agg.completed = si.completionTime.getOrElse(0L)
        agg.wallMs = agg.completed - agg.submitted
        agg.tasks = si.numTasks
        val m = si.taskMetrics
        agg.cpuMs = m.executorCpuTime / 1000000L
        agg.shufRead = m.shuffleReadMetrics.totalBytesRead
        agg.shufWrite = m.shuffleWriteMetrics.bytesWritten
        agg.input = m.inputMetrics.bytesRead
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs(js.jobId) = (js.time, 0L, js.stageInfos.size)
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.get(je.jobId).foreach { case (s, _, n) => jobs(je.jobId) = (s, je.time, n) }
    }
    spark.sparkContext.addSparkListener(listener)

    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // SPARK_GRAFT_PROFILE_PLAN=1: print the FINAL (post-AQE) physical plan
    // of a second run via collect, with WholeStageCodegen annotations —
    // the codegen-coverage audit explain("formatted") can't give pre-run
    if (sys.env.get("SPARK_GRAFT_PROFILE_PLAN").contains("1")) {
      val df2 = SparkEntry.queries(name)(spark, sfDir)
      df2.collect()
      println("\n== executed plan (final) ==")
      println(df2.queryExecution.executedPlan.toString)
    }
    // listener bus is async; let the last events drain BEFORE removal —
    // removing first drops still-queued trailing stage events (ADVICE r17)
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)

    println(f"%nTOTAL $name: $wall%.2f s, ${jobs.size} jobs, ${stages.size} stages")
    val jobWall = jobs.values.collect { case (s, e, _) if e > 0 => e - s }.sum
    println(f"sum of job walls: ${jobWall / 1e3}%.2f s (gap to total = driver-side planning/collect)")
    println("\n== top 30 stages by wall ==")
    println(f"${"stage"}%6s ${"wall_s"}%8s ${"cpu_s"}%8s ${"tasks"}%6s ${"input"}%10s ${"shufR"}%10s ${"shufW"}%10s  name")
    stages.toSeq.sortBy(-_._2.wallMs).take(30).foreach { case (id, a) =>
      println(f"$id%6d ${a.wallMs / 1e3}%8.2f ${a.cpuMs / 1e3}%8.2f ${a.tasks}%6d ${a.input}%10d ${a.shufRead}%10d ${a.shufWrite}%10d  ${a.name.take(80)}")
    }
    val totCpu = stages.values.map(_.cpuMs).sum
    val totShuf = stages.values.map(_.shufWrite).sum
    println(f"%ntotal executor CPU: ${totCpu / 1e3}%.1f s; total shuffle write: ${totShuf / 1e6}%.1f MB; stages: ${stages.size}; tasks: ${stages.values.map(_.tasks).sum}")
    spark.stop()
    sys.exit(0)
  }
}
