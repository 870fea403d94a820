package graft

import org.apache.spark.sql.SparkSession

/** Plan diagnostics: prints `explain("formatted")` for the load-bearing
  * queries so pushdown / pruning / join strategy / codegen spans can be
  * audited. Usage: runMain graft.Plans <sfDir> [name ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("scan_ledger", "broadcast_join", "dedup_latest", "agg_metrics",
        "merge_join", "dedup_jaccard", "ann_cosine", "tumbling_window")
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== PLAN: $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
