package graft

import graft.operators.Dedup
import graft.functions.{Salt, TextExtract}
import graft.sources.Ledger
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for scaling diagnostics: times each replay phase
  * independently at a given parallelism. Not part of the driver contract.
  * Usage: runMain graft.BenchProbe <cpus> <nEvents> <ledgerDir>
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val ledger = args(2)
    val master = sys.env.get("SPARK_GRAFT_MASTER") match {
      case Some("local-cluster") => s"local-cluster[$cpus,1,4096]"
      case _ => s"local[$cpus]"
    }
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(ledger))) {
      Ledger.synthesize(spark,
        Ledger.Config(nEvents = n, nDomains = 1000, pagesPerDomain = 100,
          partitions = 16, segments = 4, duplicateRate = 0.03,
          deleteRate = 0.04), ledger)
    }
    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $tag cpus=$cpus ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val ev = Ledger.scan(spark, ledger)
    timed("scan_count")(ev.count())
    timed("scan_full") {
      ev.write.format("noop").mode("overwrite").save()
    }
    val deduped = Dedup.latestPerKey(ev.filter(col("op") =!= "ALTER"))
    timed("dedup_noop") {
      deduped.write.format("noop").mode("overwrite").save()
    }
    timed("dedup_extract_noop") {
      deduped.withColumn("text", TextExtract.extract_text(col("html")))
        .write.format("noop").mode("overwrite").save()
    }
    timed("dedup_extract_write") {
      deduped.withColumn("text", TextExtract.extract_text(col("html")))
        .withColumn("_bucket", Salt.bucket(col("url"), 64))
        .repartition(col("_bucket"), pmod(col("offset"), lit(4L)))
        .write.partitionBy("_bucket").mode("overwrite")
        .parquet(s"$ledger-probe-out-$cpus")
    }
    (1 to 3).foreach { k =>
      val work = java.nio.file.Files.createTempDirectory("probe-replay").toString
      timed(s"replay_full_$k") {
        graft.operators.Replay.full(spark, ledger, s"$work/pages", nBuckets = 64)
      }
    }
    spark.stop()
  }
}
