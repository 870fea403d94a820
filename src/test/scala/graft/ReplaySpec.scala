package graft

import graft.functions.TextExtract
import graft.icelite.IceLite
import graft.model.ChangeEvent
import graft.operators.Replay
import graft.sources.Ledger
import graft.util.Det

/** End-to-end batch replay vs an in-memory oracle (SURVEY.md §7 M2 exit).
  *
  * The oracle applies the spec semantics directly: latest event per url
  * under the total order (warc_ts, offset, partition) wins; a winning D is a
  * tombstone; `text` = frozen extractor over the winner's html. The engine
  * must reconverge to exactly this state, byte-identical text per url.
  */
class ReplaySpec extends SparkTestBase {

  def oracleState(events: Seq[ChangeEvent]): Map[String, ChangeEvent] =
    events.filter(_.op != "ALTER")
      .groupBy(_.url)
      .map { case (u, es) =>
        u -> es.maxBy(e => (e.warc_ts.getTime, e.offset, e.partition.toLong))
      }

  test("full replay reconverges to oracle state, byte-identical text per url") {
    val cfg = Ledger.Config(seed = 42L, nEvents = 5000, nDomains = 40,
      pagesPerDomain = 12, partitions = 4, segments = 3,
      duplicateRate = 0.08, deleteRate = 0.07)
    val ledger = tmpDir("ledger")
    val table = tmpDir("table")
    Ledger.synthesize(spark, cfg, ledger)

    Replay.full(spark, ledger, table, nBuckets = 16)

    // oracle from the same pure generator (includes injected duplicates —
    // harmless: they are copies of existing events)
    import spark.implicits._
    val all = Ledger.scan(spark, ledger).as[ChangeEvent].collect().toSeq
    val want = oracleState(all)
    val live = want.filter(_._2.op != "D")

    val got = IceLite.read(spark, table).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.size == live.size, s"row count: got ${got.size}, want ${live.size}")
    live.foreach { case (url, ev) =>
      val row = got(url)
      assert(row.getTimestamp(1) == ev.warc_ts, s"warc_ts for $url")
      assert(java.util.Arrays.equals(row.getAs[Array[Byte]](2), ev.html),
        s"html for $url")
      assert(row.getString(3) == TextExtract.extract(ev.html),
        s"text byte-identity for $url")
      assert(row.getString(4) == ev.lang, s"lang for $url")
    }
  }

  test("replay is idempotent: running it twice changes nothing") {
    val cfg = Ledger.Config(seed = 7L, nEvents = 1200, nDomains = 10,
      pagesPerDomain = 8, partitions = 2, segments = 2)
    val ledger = tmpDir("ledger2")
    val table = tmpDir("table2")
    Ledger.synthesize(spark, cfg, ledger)
    def snapshot() = IceLite.read(spark, table).collect().map(r =>
      (r.getString(0), r.getTimestamp(1), r.getAs[Array[Byte]](2).toSeq,
        r.getString(3), r.getString(4))).toSet
    Replay.full(spark, ledger, table, nBuckets = 8)
    val v1 = IceLite.currentVersion(table)
    val rows1 = snapshot()
    Replay.full(spark, ledger, table, nBuckets = 8) // same epoch keys → no-ops
    assert(IceLite.currentVersion(table) == v1, "no new snapshots on replay")
    assert(snapshot() == rows1)
  }

  test("deletes leave tombstones that mask later-arriving older events") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val table = tmpDir("table3")
    IceLite.create(table, graft.model.Model.pagesSchema, 4)
    def ev(off: Long, op: String, ts: Long, body: String): ChangeEvent =
      ChangeEvent(0, off, op, "https://u.example.com/1",
        new java.sql.Timestamp(ts),
        if (op == "D") null else body.getBytes("UTF-8"), "en", null, Map.empty)
    // batch 1: insert @t=1000 then delete @t=3000
    graft.operators.Merge(spark, table,
      Seq(ev(0, "I", 1000, "<p>one</p>"), ev(1, "D", 3000, "")).toDF(), "b1")
    assert(IceLite.read(spark, table).count() == 0, "deleted")
    // batch 2: a LATE update @t=2000 (older than the delete) must NOT resurrect
    graft.operators.Merge(spark, table,
      Seq(ev(2, "U", 2000, "<p>late</p>")).toDF(), "b2")
    assert(IceLite.read(spark, table).count() == 0, "tombstone masks older event")
    // batch 3: a genuinely newer insert @t=4000 DOES revive the url
    graft.operators.Merge(spark, table,
      Seq(ev(3, "I", 4000, "<p>back</p>")).toDF(), "b3")
    val rows = IceLite.read(spark, table).collect()
    assert(rows.length == 1 && rows(0).getString(3) == "back")
  }

  test("generator is deterministic and partitioning-independent") {
    val cfg = Ledger.Config(seed = 99L, nEvents = 500, partitions = 4)
    val cdf = Det.zipfCdf(cfg.nDomains, cfg.zipfSkew)
    val a = (0L until 500L).map(Ledger.makeEvent(cfg, cdf, _))
    val b = (0L until 500L).map(Ledger.makeEvent(cfg, cdf, _))
    (a zip b).foreach { case (x, y) =>
      assert(x.copy(html = null) == y.copy(html = null))
      assert((x.html == null && y.html == null) ||
        java.util.Arrays.equals(x.html, y.html))
    }
    // offsets monotone per partition
    a.groupBy(_.partition).foreach { case (_, es) =>
      val offs = es.sortBy(_.offset).map(_.offset)
      assert(offs == offs.distinct.sorted)
    }
    // Zipf skew present: top domain clearly hotter than median
    val byDomain = a.filter(_.url != null).groupBy(e => e.url.split('/')(2))
    val counts = byDomain.values.map(_.size).toSeq.sorted
    assert(counts.max >= 3 * counts(counts.size / 2))
  }
}
