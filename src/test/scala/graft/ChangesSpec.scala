package graft

import graft.icelite.IceLite
import graft.model.ChangeEvent
import graft.operators.{Changes, Merge}
import org.apache.spark.sql.functions._

/** Incremental CDC read + SparkSessionExtensions registration. */
class ChangesSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(off: Long, op: String, url: String, ts: Long,
      body: String): ChangeEvent =
    ChangeEvent(0, off, op, url, new java.sql.Timestamp(ts),
      if (op == "D") null else body.getBytes("UTF-8"), "en", null, Map.empty)

  test("changes between snapshots classify insert/update/delete exactly") {
    val table = tmpDir("chg")
    IceLite.create(table, graft.model.Model.pagesSchema, 4)
    val u = (i: Int) => s"https://c.example.com/$i"
    Merge(spark, table, Seq(
      ev(0, "I", u(1), 1000, "<p>one</p>"),
      ev(1, "I", u(2), 1000, "<p>two</p>"),
      ev(2, "I", u(3), 1000, "<p>three</p>")).toDF(), "b1")
    val v1 = IceLite.currentVersion(table)
    Merge(spark, table, Seq(
      ev(3, "U", u(2), 2000, "<p>two-v2</p>"), // update
      ev(4, "D", u(3), 2000, ""),              // delete
      ev(5, "I", u(4), 2000, "<p>four</p>"),   // insert
      ev(6, "U", u(1), 500, "<p>stale</p>")).toDF(), "b2") // older: no-op
    val got = Changes.between(spark, table, v1)
      .select(col("url"), col("change_type"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set((u(2), "update"), (u(3), "delete"), (u(4), "insert")))
    // updated row carries the new payload
    val updText = Changes.between(spark, table, v1)
      .filter(col("change_type") === "update").head().getAs[String]("text")
    assert(updText == "two-v2")
    // self-diff is empty
    assert(Changes.between(spark, table, IceLite.currentVersion(table)).isEmpty)
  }

  test("between reads only buckets whose manifest ref changed " +
      "(destroyed untouched buckets prove the pruning)") {
    val table = tmpDir("chgprune")
    IceLite.create(table, graft.model.Model.pagesSchema, 8)
    val urls = (0 until 40).map(i => s"https://p.example.com/$i")
    val byBucket = urls.groupBy(u => graft.functions.Salt.bucketOfValue(u, 8))
    assert(byBucket.size >= 2, "fixture must span several buckets")
    val (tb, tUrls) = byBucket.maxBy(_._2.size)
    Merge(spark, table, urls.zipWithIndex.map { case (u, i) =>
      ev(i.toLong, "I", u, 1000, s"<p>v1-$i</p>") }.toDF(), "pb1")
    val v1 = IceLite.currentVersion(table)
    // second commit touches ONLY bucket tb: update + delete existing keys
    // of tb, insert a fresh key that hashes into tb
    val newUrl = (1000 to 4000).map(i => s"https://p.example.com/n$i")
      .find(u => graft.functions.Salt.bucketOfValue(u, 8) == tb).get
    Merge(spark, table, Seq(
      ev(100, "U", tUrls.head, 2000, "<p>v2</p>"),
      ev(101, "I", newUrl, 2000, "<p>new</p>"),
      ev(102, "D", tUrls(1), 2000, "")).toDF(), "pb2")
    val expected = Set((tUrls.head, "update"), (newUrl, "insert"),
      (tUrls(1), "delete"))
    def diff(): Set[(String, String)] = Changes.between(spark, table, v1)
      .select(col("url"), col("change_type"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(diff() == expected) // pruned result == full diff semantics
    // destroy every data file of every UNTOUCHED bucket: the unpruned
    // form full-outer-joined both complete snapshots and would now fail
    // at scan time; the manifest-ref-diff form must never open them
    val it = java.nio.file.Files.list(
      java.nio.file.Paths.get(table, "data")).iterator()
    var destroyed = 0
    while (it.hasNext) {
      val p = it.next()
      val n = p.getFileName.toString
      if (n.endsWith(".parquet") && !n.contains(s"-b$tb-")) {
        java.nio.file.Files.delete(p)
        destroyed += 1
      }
    }
    assert(destroyed > 0, "destruction must have removed other buckets")
    assert(diff() == expected)
    // the attach scan is pruned too: the update row's payload still reads
    val updText = Changes.between(spark, table, v1)
      .filter(col("change_type") === "update").head().getAs[String]("text")
    assert(updText == "v2")
  }

  test("extract_text is SQL-callable after registration") {
    // the SparkSessionExtensions path needs a FRESH session and is driven
    // end-to-end by graft.Demo (first session of its JVM uses
    // withExtensions(new GraftExtensions)); here we cover the runtime
    // registration path on the shared test session
    graft.functions.ExtractTextExpression.register(spark)
    val out = spark.sql(
      "SELECT extract_text(CAST('<i>ok &amp; fine</i>' AS BINARY)) AS t")
      .head().getString(0)
    assert(out == "ok & fine")
  }
}
