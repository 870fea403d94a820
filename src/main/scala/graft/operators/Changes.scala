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
    */
  def between(spark: SparkSession, dir: String, fromVersion: Int,
      toVersion: Option[Int] = None): DataFrame = {
    val to = toVersion.getOrElse(IceLite.currentVersion(dir))
    val key = IceLite.loadVersion(dir, to).currentSchema.fields.head.name
    // key + event-time columns resolved PER VERSION by field id: a rename
    // between the two snapshots must not break the diff (the read path
    // reconciles each version to ITS OWN schema's names)
    def keyed(v: Int, p: String) = {
      val s = IceLite.loadVersion(dir, v).currentSchema
      val keyName = s.fields.head.name
      val tsName = s.fields.find(_.id == Merge.versionFieldId)
        .getOrElse(sys.error(s"version field missing in v$v")).name
      IceLite.readInternal(spark, dir, Some(v))
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
    // attach the newer snapshot's full row for inserts/updates
    val current = IceLite.read(spark, dir, Some(to))
    changed.join(current, Seq(key), "left")
  }
}
