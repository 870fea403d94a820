package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query benchmark (guide §1.4 noop-sink isolation), SEPARATE
  * from the frozen driver contract in [[Bench]]: times the named
  * `SparkEntry.queries` keys (default: all) with the same session config
  * and noop sink as the driver bench, optionally repeating each query
  * `SPARK_GRAFT_EXTRA_REPS` times (min is reported — the least-disturbed
  * run on this noisy shared host). Used for the round-6 optimization
  * evidence in OPTIMIZATION_r06.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.BenchExtra [query ...]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "1").toInt
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .appName("thorspark-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count() // absorb init
    val out = names.map { name =>
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"bench-extra: $name")
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      f""""$name":${secs.min}%.3f"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
