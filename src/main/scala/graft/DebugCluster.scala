package graft
import graft.sources.Ledger
import org.apache.spark.sql.SparkSession
object DebugCluster {
  def main(args: Array[String]): Unit = {
    val workers = args(0).toInt
    val nEvents = args(1).toLong
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "dbgcl").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master(s"local-cluster[$workers,1,4096]")
      .config("spark.sql.shuffle.partitions", workers.toString)
      .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.local.dir", work + "/sl")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = Ledger.Config(seed = 42L, nEvents = nEvents, nDomains = 1000,
      pagesPerDomain = 100, partitions = 16, segments = 4,
      duplicateRate = 0.03, deleteRate = 0.04)
    Ledger.synthesize(spark, cfg, s"$work/ledger")
    var t0 = System.nanoTime()
    graft.operators.Replay.full(spark, s"$work/ledger", s"$work/warm", 64, "w")
    println(f"[cluster] warm: ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    graft.operators.Replay.full(spark, s"$work/ledger", s"$work/pages", 64, "r")
    val sec = (System.nanoTime()-t0)/1e9
    println(f"[cluster] workers=$workers events=$nEvents replay=$sec%.2f s evps=${nEvents/sec}%.0f")
    spark.stop()
  }
}
