package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Ad-hoc per-JOB profiler for a single `SparkEntry.queries` key (guide
  * §1): runs the query with the bench session config and a listener that
  * prints every job's wall time and description, so fixed-cost job/stage
  * overhead (the dominant term at sf0.1) is attributable. Diagnostic
  * only — not part of the frozen driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.JobProbe <query> [reps]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dedup_groups")
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .appName("thorspark-job-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        (!sys.env.contains("SPARK_GRAFT_PROBE_NO_AQE")).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = mutable.Map[Int, (Long, String)]()
    val lines = mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.synchronized {
          starts(e.jobId) = (System.nanoTime(),
            Option(e.properties.getProperty("spark.job.description"))
              .getOrElse(""))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.get(e.jobId).foreach { case (t0, desc) =>
            lines += f"  job ${e.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc"
          }
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        starts.synchronized {
          val si = e.stageInfo
          val dur = (for (a <- si.submissionTime; b <- si.completionTime)
            yield (b - a) / 1e3).getOrElse(-1.0)
          val site = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("JobProbe"))
            .getOrElse("").trim
          lines += f"    stage ${si.stageId}%3d $dur%7.3f s tasks=${si.numTasks}%3d  ${si.name} | $site"
        }
    })
    spark.read.parquet(s"$sfDir/region.parquet").count() // absorb init
    (1 to reps).foreach { r =>
      lines.clear()
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(s"probe: $name")
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      println(f"== $name rep $r: $total%.3f s")
      lines.foreach(println)
    }
    spark.stop()
  }
}
