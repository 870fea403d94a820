package graft

import graft.functions.TextExtract
import graft.icelite.IceLite
import graft.model.ChangeEvent
import graft.operators.Replay
import graft.sources.Ledger
import graft.util.Det

/** Hot-domain skew (BASELINE.json north_rule: "salted repartitioning on
  * url-hash to defuse hot-domain skew"): an extreme-Zipf ledger must (a)
  * replay to the exact oracle state, and (b) spread the hot bucket's write
  * work across several salt lanes instead of one task.
  */
class SkewSpec extends SparkTestBase {

  test("extreme Zipf ledger: correct result + hot bucket spread over salt lanes") {
    // zipfSkew 2.5 over few domains: the head domain dominates
    val cfg = Ledger.Config(seed = 555L, nEvents = 6000, nDomains = 20,
      pagesPerDomain = 30, partitions = 4, segments = 2, zipfSkew = 2.5,
      duplicateRate = 0.05, deleteRate = 0.05)
    val cdf = Det.zipfCdf(cfg.nDomains, cfg.zipfSkew)
    val headShare = cdf(0)
    assert(headShare > 0.5, s"fixture must be skewed (head=$headShare)")

    val ledger = tmpDir("skew-ledger")
    val table = tmpDir("skew-table")
    Ledger.synthesize(spark, cfg, ledger)

    // many salt lanes + partitions so the spread is observable
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Replay.full(spark, ledger, table, nBuckets = 8, nSalts = 8)
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // (a) correctness under skew: oracle reconvergence
    import spark.implicits._
    val all = Ledger.scan(spark, ledger).as[ChangeEvent].collect()
    val want = all.filter(_.op != "ALTER").groupBy(_.url).map { case (u, es) =>
      u -> es.maxBy(e => (e.warc_ts.getTime, e.offset, e.partition.toLong))
    }.filter(_._2.op != "D")
    val got = IceLite.read(spark, table).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got.size == want.size)
    want.foreach { case (u, ev) =>
      assert(got(u) == TextExtract.extract(ev.html), s"text for $u")
    }

    // (b) the hottest bucket's rows arrived via multiple files (salt lanes)
    val m = IceLite.load(table)
    val filesPerBucket = m.files.groupBy(_.bucket).view.mapValues(_.size)
    val hottest = filesPerBucket.maxBy(_._2)
    assert(hottest._2 >= 3,
      s"hot bucket ${hottest._1} written by ${hottest._2} lane(s); " +
        s"distribution=${filesPerBucket.toMap}")
  }
}
