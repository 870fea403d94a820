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

  /** Winning event per url, payload-light variant for HIGH-DUPLICATION
    * replays (a full binlog replay sees every historical version of every
    * url — 10–100+ events per key). [[latestPerKey]] funnels the whole
    * payload (html, ~KB/row) through a SortAggregate buffer: the map-side
    * sort + combine touches every payload byte, which is memory-bandwidth
    * bound and scales poorly with threads. This variant:
    *
    *  1. aggregates only `(url → max (warc_ts, offset, partition))` —
    *     a fixed-width ~50-byte row per event through the agg,
    *  2. LEFT SEMI joins events against the winner set on (url, version) —
    *     AQE turns this into a broadcast semi join whenever the distinct
    *     key set fits (a replay's key set ≪ its event count), so payloads
    *     are filtered IN PLACE, never shuffled,
    *  3. drops exact wire-duplicate copies of the winner (tiny shuffle,
    *     one row per key).
    *
    * Same result as [[latestPerKey]] (identical win order; wire duplicates
    * are byte-identical copies, so either copy is the same row). When the
    * winner set is too big to broadcast, AQE keeps a shuffled semi join —
    * payload shuffle equal to the agg form, never worse.
    */
  def latestPerKeyViaWinners(events: DataFrame): DataFrame =
    latestPerKeyAdaptive(events)

  /** [[latestPerKeyAdaptive]] that also reports the winner count when the
    * broadcast path ran (None on the large-key fallback). The count is
    * free — the adaptive size check already computes it — and callers
    * (Merge) use it to size the salted write: lane count should track
    * per-bucket volume and reducer parallelism, not a constant (a
    * constant 4 salts made a 20k-event CTAS open 256 parquet writers —
    * 1.6 s of pure fixed cost, the dominant Amdahl term in the replay).
    */
  def latestPerKeyWithCount(events: DataFrame,
      maxBroadcastKeys: Long = 4000000L): (DataFrame, Option[Long]) = {
    var n: Option[Long] = None
    val df = latestPerKeyAdaptive(events, maxBroadcastKeys,
      onWinnerCount = c => n = Some(c))
    (df, n)
  }

  /** Size-checked payload-light dedup for batch replays. The winner set
    * `(url → max (warc_ts, offset, partition))` is computed over four
    * pruned fixed-width columns, cached, and counted; when it fits
    * (`maxBroadcastKeys`) the events are LEFT SEMI joined against an
    * EXPLICIT broadcast of it — payloads are filtered in place, never
    * sorted or shuffled before the merge. Otherwise falls back to the
    * single-pass [[latestPerKey]] partial aggregation (whose shuffle is
    * already bounded by distinct keys per map task).
    *
    * Why explicit: the winner keys are FLATTENED to scalar columns (a
    * struct-typed join key is not hash-join-able — Catalyst would force a
    * SortMergeJoin and shuffle every payload; measured 30% throughput
    * loss), and the broadcast is hinted rather than left to AQE, because
    * AQE materializes both join children's shuffle WRITES before it can
    * switch strategy — the payload shuffle cost would already be paid.
    */
  def latestPerKeyAdaptive(events: DataFrame,
      maxBroadcastKeys: Long = 4000000L,
      onWinnerCount: Long => Unit = _ => ()): DataFrame = {
    val ver = struct(col("warc_ts"), col("offset"), col("partition"))
    // localCheckpoint, NOT cache(): cache() registers the frame in the
    // session-wide CacheManager, which holds it strongly — a per-batch
    // replay merge would leak one cached DataFrame per batch for the
    // session lifetime. Checkpoint blocks are owned by the RDD and freed
    // by the ContextCleaner as soon as the returned plan is unreferenced.
    // Eager by default, so count() and the broadcast build both read the
    // materialized blocks instead of re-running the aggregation.
    val winners = graft.util.Phase("dedup.winners-agg") {
      events.groupBy(col("url")).agg(max(ver).as("_ver"))
        .select(col("url").as("_wurl"), col("_ver.warc_ts").as("_wts"),
          col("_ver.offset").as("_woff"), col("_ver.partition").as("_wpart"))
        .localCheckpoint()
    }
    val nWinners = graft.util.Phase("dedup.winners-count") { winners.count() }
    if (nWinners <= maxBroadcastKeys) {
      onWinnerCount(nWinners)
      // null-safe equality (<=>): a winning event with a NULL version
      // component must still match itself, exactly as latestPerKey keeps
      // it (EqualNullSafe remains a hash-join-able equi key)
      events.join(broadcast(winners),
          col("url") <=> col("_wurl") && col("warc_ts") <=> col("_wts") &&
            col("offset") <=> col("_woff") &&
            col("partition") <=> col("_wpart"),
          "left_semi")
        .dropDuplicates("url")
    } else {
      latestPerKey(events)
    }
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
