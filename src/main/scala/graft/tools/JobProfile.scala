package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-query JOB-LEVEL profile: runs a query through the noop sink with a
  * SparkListener attached and prints every Spark job it launched — start
  * offset, duration, task count, and the driver-side GAP since the
  * previous job ended. In the sf0.1 regime (single-row-group fixtures,
  * sub-5s queries) wall time hides in sequential job barriers — driver
  * collects, localCheckpoints, rank dictionaries, hot-bucket censuses —
  * not in shuffle volume, and stage metrics alone cannot show the gaps.
  *
  *   sbt "runMain graft.tools.JobProfile <sfDir> <query> [query…]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    require(names.nonEmpty, "usage: JobProfile <sfDir> <query>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, start: Long, var end: Long = -1L,
                      var nTasks: Int = 0, var desc: String = "")
    val jobs = ArrayBuffer.empty[JobRec]
    // stage -> job via JobStart.stageIds: overlapping jobs (broadcast
    // exchanges run concurrently with the main job) would otherwise have
    // their stages' task counts charged to whichever job started last.
    val stageToJob = scala.collection.mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("")
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        jobs += JobRec(e.jobId, e.time, desc = d.take(90))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val owner = stageToJob.get(e.stageInfo.stageId)
            .flatMap(jid => jobs.find(_.id == jid))
            .orElse(jobs.lastOption)
          owner.foreach(_.nTasks += e.stageInfo.numTasks)
        }
    }

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { n =>
      run(n) // warmup: JIT + codegen + file listing
      jobs.clear()
      stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.currentTimeMillis()
      val wall = run(n)
      Thread.sleep(300) // let the listener bus drain the final JobEnd
      spark.sparkContext.removeSparkListener(listener)
      println(f"[jobs] $n%-28s wall $wall%6.2f s, ${jobs.size} jobs")
      var prevEnd = t0
      var inJobs = 0L
      jobs.sortBy(_.start).foreach { j =>
        val gap = j.start - prevEnd
        val dur = if (j.end < 0) -1L else j.end - j.start
        if (dur > 0) inJobs += dur
        println(f"[jobs]   gap ${gap / 1000.0}%6.2f s | job ${j.id}%3d " +
          f"${dur / 1000.0}%6.2f s ${j.nTasks}%4d tasks  ${j.desc}")
        prevEnd = math.max(prevEnd, if (j.end < 0) j.start else j.end)
      }
      val tail = t0 + (wall * 1000).toLong - prevEnd
      println(f"[jobs]   tail-gap ${tail / 1000.0}%6.2f s | in-jobs ${inJobs / 1000.0}%6.2f s")
    }
    spark.stop()
  }
}
