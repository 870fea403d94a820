package graft.functions

import graft.model.ChangeEvent
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

case class LineageBuf(minOff: Long, maxOff: Long, n: Long, bytes: Long)

case class LineageResult(min_offset: Long, max_offset: Long, n_events: Long,
    payload_bytes: Long)

/** Typed lineage aggregator (SURVEY.md §2.6): per source partition, one
  * pass over typed `ChangeEvent`s yields the consumed offset range, event
  * count, and payload byte volume.
  *
  * This is the idiomatic `Dataset[ChangeEvent]` surface
  * (`ds.groupByKey(_.partition).agg(LineageAggregator.toColumn)`); the
  * streaming pipeline's hot path uses the equivalent built-in
  * min/max/count columns (codegen'd) — both produce the same rows, proven
  * in the spec.
  */
object LineageAggregator
    extends Aggregator[ChangeEvent, LineageBuf, LineageResult] {

  override def zero: LineageBuf =
    LineageBuf(Long.MaxValue, Long.MinValue, 0L, 0L)

  override def reduce(b: LineageBuf, e: ChangeEvent): LineageBuf = LineageBuf(
    math.min(b.minOff, e.offset),
    math.max(b.maxOff, e.offset),
    b.n + 1,
    b.bytes + (if (e.html == null) 0L else e.html.length.toLong))

  override def merge(a: LineageBuf, b: LineageBuf): LineageBuf = LineageBuf(
    math.min(a.minOff, b.minOff),
    math.max(a.maxOff, b.maxOff),
    a.n + b.n,
    a.bytes + b.bytes)

  override def finish(b: LineageBuf): LineageResult =
    LineageResult(b.minOff, b.maxOff, b.n, b.bytes)

  override def bufferEncoder: Encoder[LineageBuf] =
    Encoders.product[LineageBuf]
  override def outputEncoder: Encoder[LineageResult] =
    Encoders.product[LineageResult]
}
