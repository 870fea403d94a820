package graft

import graft.functions.LineageAggregator
import graft.model.ChangeEvent
import graft.sources.Ledger
import org.apache.spark.sql.functions._

class LineageAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  test("typed aggregator == built-in min/max/count/sum per partition") {
    val cfg = Ledger.Config(seed = 5L, nEvents = 1000, partitions = 4,
      deleteRate = 0.1)
    val ds = Ledger.events(spark, cfg).filter(_.op != "ALTER")

    val typedRows = ds.groupByKey(_.partition)
      .agg(LineageAggregator.toColumn.name("l"))
      .collect()
      .map { case (p, r) =>
        (p, r.min_offset, r.max_offset, r.n_events, r.payload_bytes)
      }.toSet

    val builtinRows = ds.toDF().groupBy(col("partition"))
      .agg(min("offset"), max("offset"), count(lit(1)),
        sum(coalesce(octet_length(col("html")), lit(0)).cast("long")))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    assert(typedRows == builtinRows)
    assert(typedRows.map(_._1) == Set(0, 1, 2, 3))
  }
}
