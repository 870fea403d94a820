package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch dedup: one winning event per key (SURVEY.md §2.4).
  *
  * Semantics (BASELINE.json north_star): events are deduplicated by
  * `(url, warc_ts, event-offset)` and the LATEST event per url wins, under
  * the total order `(warc_ts, offset, partition)` — partition as final
  * tie-break makes the order total even across source partitions.
  *
  * Implementation is a single aggregation (`groupBy(url).max_by`), NOT a
  * window: Catalyst plans partial + final aggregation with map-side
  * combine, so at 10^10 events the shuffle carries one candidate row per
  * (url × map-task) instead of every event — and wire duplicates
  * (identical copies) collapse for free since `max_by` is duplicate-
  * insensitive. A `row_number()` window would shuffle + sort the full
  * batch instead. (Plan note, verified with explain("formatted"): the
  * struct-typed max_by buffer is not hash-aggregable, so Catalyst picks
  * SortAggregate — the map-side per-partition sort is parallel CPU; the
  * shuffle-volume win over a window is unchanged.)
  */
object Dedup {

  /** Winning event per url. Input: envelope-shaped DataFrame (op != ALTER,
    * url non-null). Output: same columns, one row per url.
    */
  def latestPerKey(events: DataFrame): DataFrame = {
    val cols = events.columns.toSeq
    events
      .groupBy(col("url"))
      .agg(max_by(
        struct(cols.map(col): _*),
        struct(col("warc_ts"), col("offset"), col("partition"))).as("_w"))
      .select(col("_w.*"))
  }

  /** Wire-duplicate count per partition (metrics only — the merge itself
    * never needs explicit wire dedup because latest-wins is idempotent).
    */
  def wireDuplicates(events: DataFrame): DataFrame =
    events.groupBy(col("partition"), col("offset"), col("url"), col("warc_ts"))
      .count()
      .filter(col("count") > 1)
      .groupBy(col("partition"))
      .agg(sum(col("count") - 1).as("wire_duplicates"))
}
