package graft

/** Guards the driver contract: `entry()` must return rows on every run
  * (the driver smoke-checks rows > 0 at sf0.001), and every oracle key
  * must have a matching query.
  */
class EntrySpec extends SparkTestBase {

  test("entry() runs the CDC engine end-to-end and returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("url") && df.columns.contains("fetch_ms"))
  }

  test("every oracleSql key has a queries entry; no orphans") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle without query: ${o -- q}")
    assert(q.size >= 50, s"operator surface shrank: ${q.size}")
  }
}
