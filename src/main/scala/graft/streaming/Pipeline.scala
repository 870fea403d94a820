package graft.streaming

import graft.icelite.IceLite
import graft.model.Model
import graft.operators.{Dedup, Merge, SchemaEvolution}
import graft.sources.Ledger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The production entry point: Structured Streaming CDC pipeline
  * (BASELINE.json north_star — "tail a Kafka-carried binlog/WAL …
  * exactly-once via idempotent snapshot commits keyed by epoch-id plus
  * checkpointed source offsets … per-micro-batch per-partition lineage
  * records and throughput metrics to a sidecar table … recovery from any
  * checkpoint without duplicates or gaps").
  *
  * Exactly-once decomposition (SURVEY.md §3, entry point 1):
  *  - BEFORE a batch runs, Structured Streaming writes the offsets WAL in
  *    `checkpointDir` — the source-side bookkeeping.
  *  - INSIDE the batch, every effect (table merge, each ALTER, lineage
  *    append, metrics append) is an idempotent IceLite commit keyed by a
  *    deterministic epoch key derived from the batch id. A crash anywhere
  *    between the two WALs re-runs the batch on restart; committed epochs
  *    no-op, missing ones complete. No duplicates, no gaps.
  *
  * Watermark contract: `watermarkDelay` must be ≥ the source's maximum
  * event-time disorder. Events later than that are dropped by the dedup
  * state (standard append-mode semantics) — the batch↔streaming
  * equivalence gate holds because the synthetic source's disorder is
  * bounded (Ledger.Config.outOfOrderLagMs).
  */
object Pipeline {

  case class Config(
      ledgerDir: String,
      tableDir: String,
      checkpointDir: String,
      lineageDir: String,
      metricsDir: String,
      nBuckets: Int = 32,
      nSalts: Int = 4,
      watermarkDelay: String = "2 hours",
      maxFilesPerTrigger: Int = 8,
      /** dead-letter sidecar table for malformed events (None = drop) */
      dlqDir: Option[String] = None,
      /** RocksDB state store for the dedup state — the right choice when
        * keys-in-watermark exceed executor heap (10^10-event tails);
        * default HDFS-backed store is fine for tests */
      useRocksDB: Boolean = false,
      /** Dedup via `transformWithState` (a custom [[DedupProcessor]] with
        * an explicit processing-time state TTL) instead of
        * `dropDuplicatesWithinWatermark`. Same result on a
        * bounded-disorder ledger (PipelineSpec equivalence case); the
        * knob exists for sources whose duplicate-arrival window is better
        * expressed as a TTL than as an event-time watermark. Implies
        * RocksDB: Spark's state-v2 operators only run on the RocksDB
        * state store provider. */
      useTransformWithState: Boolean = false,
      /** seen-key state TTL for the transformWithState dedup — must cover
        * the source's maximum duplicate re-delivery lag in processing time */
      dedupStateTtl: java.time.Duration = java.time.Duration.ofHours(1),
      /** test hook: throw at (epochId, point); point ∈ {beforeMerge,
        * afterMerge, afterLineage} — the M5 kill/restart fault injection */
      failAt: Option[(Long, String)] = None)

  /** Start the pipeline. `Trigger.AvailableNow()` = bounded replay-to-end
    * (the bench path); `ProcessingTime` = continuous tail.
    */
  def run(spark: SparkSession, cfg: Config,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    if (!IceLite.exists(cfg.tableDir)) {
      IceLite.create(cfg.tableDir, Model.pagesSchema, cfg.nBuckets)
    }
    if (cfg.useRocksDB || cfg.useTransformWithState) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    }
    if (cfg.useTransformWithState) {
      // transformWithState in ProcessingTime mode schedules NO-DATA batches
      // to advance its TTL clock — under Trigger.AvailableNow that loop
      // never drains (measured: 1000+ empty micro-batches, one commit
      // each, query never terminates). The pipeline needs no eager TTL
      // ticks: expired `seen` state is dropped lazily on access/maintenance,
      // and every effect is driven by DATA batches only.
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    }
    val raw = Ledger.tail(spark, cfg.ledgerDir, cfg.maxFilesPerTrigger)
    val stream =
      if (cfg.useTransformWithState) {
        import spark.implicits._
        raw.as[graft.model.ChangeEvent]
          .groupByKey(e => (e.url, e.warc_ts, e.offset, e.partition))
          .transformWithState(new DedupProcessor(cfg.dedupStateTtl),
            org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .toDF()
      } else {
        raw.withWatermark("warc_ts", cfg.watermarkDelay)
          .dropDuplicatesWithinWatermark("url", "warc_ts", "offset", "partition")
      }

    stream.writeStream
      .queryName("thorspark-pipeline")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, epochId: Long) =>
        processBatch(df.sparkSession, cfg, df, epochId)
      }
      .start()
  }

  /** One micro-batch: ALTERs first (in global order), then one conditional
    * MERGE of the data events, then lineage + metrics sidecar commits —
    * each an independently idempotent epoch.
    */
  def processBatch(spark: SparkSession, cfg: Config, df: DataFrame,
      epochId: Long): Unit = {
    val t0 = System.nanoTime()
    def inject(point: String): Unit = cfg.failAt.foreach { case (e, p) =>
      if (e == epochId && p == point) {
        throw new RuntimeException(s"injected failure at epoch $epochId/$point")
      }
    }
    val batch = df.cache()
    try {
      // 0. dead-letter routing, same validity rule as batch replay
      // key shape stream.dlq.<n>: NUMERIC suffix so the DLQ table's epoch
      // log folds into a high-water mark instead of growing per batch.
      // NOTE (upgrade): pre-round-2 DLQ tables used stream.<n>.dlq keys,
      // which this HWM prefix does not cover — crash replay across that
      // upgrade would re-append those batches' DLQ rows once. Acceptable
      // pre-release; rewrite legacy DLQ tables when upgrading.
      cfg.dlqDir.foreach { dq =>
        IceLite.append(spark, dq, s"stream.dlq.$epochId",
          graft.operators.Validate.invalid(batch))
      }
      val okEvents = graft.operators.Validate.valid(batch)

      // 1. schema evolution, ordered by global position, deduped (ALTER
      //    events can be wire-duplicated like any event)
      val alters = okEvents.filter(col("op") === "ALTER")
        .select(col("offset"), col("partition"), col("alterJson"))
        .distinct()
        .collect()
        .sortBy(r => (r.getLong(0), r.getInt(1)))
      alters.zipWithIndex.foreach { case (r, k) =>
        SchemaEvolution(cfg.tableDir, r.getString(2), s"stream.$epochId.alter.$k")
      }

      // 2. one action over the raw batch: per-partition consumed offset
      //    ranges + counts (lineage's gapless-cover invariant is over the
      //    RAW range; rows_applied comes from the merge result below)
      val data = okEvents.filter(col("op") =!= "ALTER")
      val ranges = data.groupBy(col("partition"))
        .agg(min("offset").as("lo"), max("offset").as("hi"),
          count(lit(1)).as("n"))
        .collect()
      val eventsIn = ranges.map(_.getLong(3)).sum
      if (eventsIn == 0) return // nothing to commit; replay-safe no-op
      val deduped = Dedup.latestPerKey(data).cache()
      try {
        inject("beforeMerge")
        val res = Merge(spark, cfg.tableDir, deduped, s"stream.$epochId",
          cfg.nSalts, preDeduped = true)
        inject("afterMerge")

        // 3. lineage: one row per source partition of this batch, built
        //    driver-side from already-collected stats (deterministic on
        //    replay — derived from batch content, not the table diff)
        val snapshotId = IceLite.load(cfg.tableDir).snapshotId
        // applied counts come from the merge result when it ran, and are
        // recomputed from the (identical) deduped batch when the merge was
        // a no-op replay after a crash — lineage rows must not depend on
        // whether THIS attempt or a previous one committed the table epoch
        val appliedBy =
          if (res.lineage.nonEmpty) {
            res.lineage.map(l => l.partition -> l.rowsApplied).toMap
          } else {
            deduped.groupBy(col("partition")).agg(count(lit(1)).as("n"))
              .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
          }
        import spark.implicits._
        val lineageDf = ranges.map { r =>
          (epochId, r.getInt(0), r.getLong(1), r.getLong(2),
            appliedBy.getOrElse(r.getInt(0), 0L), snapshotId,
            new java.sql.Timestamp(System.currentTimeMillis()))
        }.toSeq.toDF("epoch_id", "partition", "min_offset", "max_offset",
          "rows_applied", "snapshot_id", "commit_ts")
        IceLite.append(spark, cfg.lineageDir, s"stream.$epochId", lineageDf)
        inject("afterLineage")

        // 4. throughput metrics: one row per batch. Upsert/delete counts
        //    come from the merge result when it computed them; the CTAS
        //    fast path (rowsUpserted = -1 sentinel) and a crash-replayed
        //    no-op merge (committed = false) recompute them from the
        //    cached deduped batch instead — metrics must never publish a
        //    sentinel, and must be identical whether THIS attempt or a
        //    previous one committed the table epoch.
        val (ups, dels) =
          if (res.committed && res.rowsUpserted >= 0) {
            (res.rowsUpserted, res.rowsDeleted)
          } else {
            val a = deduped.agg(count(lit(1)).as("n"),
              sum(when(col("op") === "D", 1L).otherwise(0L)).as("d"))
              .collect()(0)
            (a.getLong(0) - a.getLong(1), a.getLong(1))
          }
        import spark.implicits._
        val batchMs = (System.nanoTime() - t0) / 1000000L
        val metricsDf = Seq((epochId, eventsIn, ups, dels, batchMs,
          if (batchMs > 0) eventsIn * 1000.0 / batchMs else 0.0))
          .toDF("epoch_id", "events_in", "rows_upserted", "rows_deleted",
            "batch_ms", "events_per_sec")
        IceLite.append(spark, cfg.metricsDir, s"stream.$epochId", metricsDf)
      } finally deduped.unpersist()
    } finally batch.unpersist()
  }

  /** Run to end of available input and wait (the bounded-replay path). */
  def runToCompletion(spark: SparkSession, cfg: Config): Unit = {
    val q = run(spark, cfg, Trigger.AvailableNow())
    try q.awaitTermination()
    finally if (q.isActive) q.stop()
  }
}
