package graft.streaming

import graft.model.ChangeEvent
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Wire-duplicate dedup as a `transformWithState` StatefulProcessor —
  * the custom-state alternative to `dropDuplicatesWithinWatermark`
  * (SURVEY.md §2.7): one boolean `seen` flag per dedup key
  * `(url, warc_ts, offset, partition)`, expired by an explicit
  * processing-time TTL instead of the event-time watermark.
  *
  * When TTL covers the source's maximum duplicate re-delivery lag, the
  * output is identical to the watermark form on a bounded-disorder
  * ledger (PipelineSpec equivalence case): the first copy of a key
  * passes, every later copy — same batch or later batch within TTL —
  * drops. State size is bounded by keys-per-TTL-window, evicted by the
  * store itself (RocksDB), not by watermark math.
  */
class DedupProcessor(ttl: java.time.Duration) extends StatefulProcessor[
    (String, java.sql.Timestamp, Long, Int), ChangeEvent, ChangeEvent] {

  @transient private var seen: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
      TTLConfig(ttl))
  }

  override def handleInputRows(
      key: (String, java.sql.Timestamp, Long, Int),
      inputRows: Iterator[ChangeEvent],
      timerValues: TimerValues): Iterator[ChangeEvent] = {
    if (seen.exists()) {
      Iterator.empty // duplicate delivery of an already-passed key
    } else {
      seen.update(true)
      inputRows.take(1) // collapse same-batch copies too
    }
  }
}
