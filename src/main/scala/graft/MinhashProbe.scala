package graft

import graft.functions.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostics: times portable-minhash variants back-to-back in
  * one hot JVM so host drift between runs cannot confound the comparison.
  * Usage: runMain graft.MinhashProbe <sfDir> [reps]
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm IO
    def timed(tag: String)(f: => Unit): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      f
      println(f"PROBE $tag rep=$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    timed("xxhash64_hof") {
      DedupOps.minhashCandidates(docs, "doc_id", "text", 2, 8, 0.9)
        .write.format("noop").mode("overwrite").save()
    }
    timed("md5_salted_hof") {
      DedupOps.minhashCandidates(docs, "doc_id", "text", 2, 8, 0.9,
        hashFn = DedupOps.portableHash)
        .write.format("noop").mode("overwrite").save()
    }
    // a Carter-Wegman double-hash variant (2 md5s/token) was probed here
    // and rejected: correlated members band-collide 4x more, and the
    // candidate join dominates — see DedupOps.candidatesFromSigs Scaladoc
    spark.stop()
  }
}
