package graft

import graft.icelite.IceLite
import graft.sources.Ledger
import graft.operators.Replay
import org.apache.spark.sql.SparkSession

/** Demo CLI: synthesize a change ledger, replay it into an IceLite table,
  * show the result. Usage:
  * {{{ sbt "runMain graft.Demo <workDir> [nEvents] [alterAt]" }}}
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(sys.error("usage: Demo <workDir>"))
    val n = if (args.length > 1) args(1).toLong else 20000L
    val alter = if (args.length > 2) Some(args(2).toLong) else None
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("thorspark-demo")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = Ledger.Config(nEvents = n,
      alterAt = alter.map(p => p -> Ledger.addColumnJson("fetch_ms", "long")).toMap)
    val ledger = s"$work/ledger"
    val table = s"$work/pages"
    val t0 = System.nanoTime()
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(ledger))) {
      Ledger.synthesize(spark, cfg, ledger)
    }
    val t1 = System.nanoTime()
    val segs = Replay.full(spark, ledger, table)
    val t2 = System.nanoTime()

    val m = IceLite.load(table)
    val live = IceLite.read(spark, table)
    println(f"=== ledger: $n events in ${(t1 - t0) / 1e9}%.1fs; " +
      f"replay: $segs segment(s) in ${(t2 - t1) / 1e9}%.1fs")
    println(f"=== throughput: ${n / ((t2 - t1) / 1e9)}%.0f events/sec applied")
    println(s"=== table: snapshot=${m.snapshotId} version=${m.version} " +
      s"schema=${m.currentSchema.struct.simpleString}")
    println(s"=== live rows: ${live.count()}")
    live.orderBy("url").show(10, 60)
    spark.stop()
  }
}
