package graft.operators

import graft.icelite.IceLite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental CDC read of an IceLite table: the NET row changes between
  * two snapshot versions, as (key, change_type, current columns).
  *
  * Downstream consumers (a second-hop pipeline, a search indexer) read
  * this instead of re-scanning the table — the lake-side equivalent of the
  * binlog the engine ingests.
  *
  * Detection is version-tuple based: a key changed between snapshots iff
  * its winning `(warc_ts, _offset, _partition, _deleted)` changed — no
  * payload comparison, no dependency on schema equality across versions
  * (columns added by evolution simply ride along from the newer snapshot).
  */
object Changes {

  /** Changes from `fromVersion` to `toVersion` (default: current).
    * change_type ∈ {insert, update, delete}.
    *
    * BUCKET-PRUNED via manifest-ref diff: a commit replaces manifests only
    * for the buckets it touches and carries every other bucket's manifest
    * BY REFERENCE (IceLite commit invariant); manifests and data files are
    * immutable, so an identical `ManifestRef.path` in both versions proves
    * the bucket's content is byte-identical — no key in it can have a
    * changed winner tuple, so it can contribute no diff row. Both snapshot
    * scans and the current-row attach therefore read ONLY buckets whose
    * manifest ref differs: O(changed buckets) per delta instead of two
    * full table scans (the streaming change source calls this per
    * micro-batch — at 10^5 files per snapshot the unpruned form was the
    * scale-killer the round-5 review flagged). The key→bucket layout
    * invariant (a key's rows live only in `Salt.bucket(key, numBuckets)`,
    * identical across versions while numBuckets is fixed) makes pruning
    * the attach scan safe too. Falls back to the unpruned scan when either
    * version predates bucket manifests (icelite/1 inline files) or the
    * bucket count differs.
    */
  def between(spark: SparkSession, dir: String, fromVersion: Int,
      toVersion: Option[Int] = None): DataFrame = {
    val to = toVersion.getOrElse(IceLite.currentVersion(dir))
    val mFrom = IceLite.loadVersion(dir, fromVersion)
    val mTo = IceLite.loadVersion(dir, to)
    val key = mTo.currentSchema.fields.head.name
    val prunable = mFrom.numBuckets == mTo.numBuckets &&
      (mFrom.files.isEmpty || mFrom.manifests.nonEmpty) &&
      (mTo.files.isEmpty || mTo.manifests.nonEmpty)
    val buckets: Option[Set[Int]] =
      if (!prunable) None
      else {
        val fromRefs = mFrom.manifests.map(r => r.bucket -> r.path).toMap
        val toRefs = mTo.manifests.map(r => r.bucket -> r.path).toMap
        Some((fromRefs.keySet ++ toRefs.keySet)
          .filter(b => fromRefs.get(b) != toRefs.get(b)))
      }
    // key + event-time columns resolved PER VERSION by field id: a rename
    // between the two snapshots must not break the diff (the read path
    // reconciles each version to ITS OWN schema's names)
    def keyed(v: Int, p: String) = {
      val s = IceLite.loadVersion(dir, v).currentSchema
      val keyName = s.fields.head.name
      val tsName = s.fields.find(_.id == Merge.versionFieldId)
        .getOrElse(sys.error(s"version field missing in v$v")).name
      IceLite.readInternal(spark, dir, Some(v), buckets)
        .select(col(keyName).as(s"${p}_key"), col(tsName).as(s"${p}_ts"),
          col("_offset").as(s"${p}_off"), col("_partition").as(s"${p}_part"),
          col("_deleted").as(s"${p}_del"))
    }
    val a = keyed(fromVersion, "a")
    val b = keyed(to, "b")
    val joined = a.join(b, col("a_key") === col("b_key"), "full_outer")
    val aLive = col("a_key").isNotNull && !col("a_del")
    val bLive = col("b_key").isNotNull && !col("b_del")
    val sameVersion =
      col("a_ts") <=> col("b_ts") && col("a_off") <=> col("b_off") &&
        col("a_part") <=> col("b_part")
    val changed = joined
      .withColumn("change_type",
        when(!aLive && bLive, lit("insert"))
          .when(aLive && !bLive, lit("delete"))
          .when(aLive && bLive && !sameVersion, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(coalesce(col("b_key"), col("a_key")).as(key), col("change_type"))
    // attach the newer snapshot's full row for inserts/updates — pruned to
    // the same changed buckets (every changed key lives in one of them, by
    // the layout invariant above)
    val current = buckets match {
      case Some(bs) =>
        IceLite.readInternal(spark, dir, Some(to), Some(bs))
          .filter(!col("_deleted"))
          .drop(IceLite.internalFields.map(_.name): _*)
      case None => IceLite.read(spark, dir, Some(to))
    }
    changed.join(current, Seq(key), "left")
  }
}
