package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/**
 * Scratch: per-job timeline for one named SparkEntry query — where a
 * lifecycle gate's wall-clock actually goes. For each Spark job of the
 * MEASURED run (after one untimed warm pass): job wall, the driver GAP
 * since the previous job ended (planning/FS/driver work — the part no
 * task metric shows), task count and the job's first line of call site.
 * Run outside the sbt lock: `java <addOpens> -cp classes:spark-jars
 * graft.tools.JobProfile <query> [sfDir] [cpus]`.
 */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.setupFixtures(spark, sfDir)

    case class J(id: Int, start: Long, var end: Long, var tasks: Int, site: String)
    val jobs = mutable.ArrayBuffer.empty[J]
    val byId = mutable.Map.empty[Int, J]
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (record) synchronized {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        val stages = js.stageInfos.map(_.name.takeWhile(_ != '+').take(40)).mkString("|")
        val j = J(js.jobId, System.nanoTime(), 0L, 0, s"$site  [$stages]")
        jobs += j; byId(js.jobId) = j
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (record) synchronized {
        byId.get(je.jobId).foreach(_.end = System.nanoTime())
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (record) synchronized {
        // attribute tasks to the most recent unfinished job (approximation)
        jobs.lastOption.foreach(j => j.tasks += sc.stageInfo.numTasks)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm
    Thread.sleep(300)
    record = true
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    record = false
    Thread.sleep(300)

    println(f"[jobprofile] $name total ${total}%.3f s, ${jobs.size} jobs")
    var prevEnd = t0
    var jobSum = 0.0; var gapSum = 0.0
    jobs.sortBy(_.start).foreach { j =>
      val gap = (j.start - prevEnd) / 1e9
      val wall = if (j.end > 0) (j.end - j.start) / 1e9 else -1.0
      jobSum += math.max(wall, 0); gapSum += math.max(gap, 0)
      println(f"[jobprofile]   job ${j.id}%4d gap ${gap}%7.3f wall ${wall}%7.3f tasks ${j.tasks}%4d  ${j.site}")
      if (j.end > prevEnd) prevEnd = j.end
    }
    val tail = (t0 + (total * 1e9).toLong - prevEnd) / 1e9
    println(f"[jobprofile] $name sum(job wall) ${jobSum}%.3f s, sum(driver gaps) ${gapSum}%.3f s, tail ${math.max(tail, 0)}%.3f s")
    spark.stop()
  }
}
