package graft

import graft.icelite.IceLite
import graft.model.Model
import graft.operators.SchemaEvolution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IceLite table-format invariants (SURVEY.md §7 M1 exit tests). */
class IceLiteSpec extends SparkTestBase {
  import spark.implicits._

  private def mkRows(n: Int) =
    (1 to n).map(i => (s"https://t.example.com/$i",
      new java.sql.Timestamp(1000L * i), Array[Byte](i.toByte), s"text$i",
      "en", i.toLong, 0, false))
      .toDF("url", "warc_ts", "html", "text", "lang",
        "_offset", "_partition", "_deleted")
      .withColumn("_bucket", pmod(xxhash64(col("url")), lit(4L)).cast("int"))

  test("create + commit + read roundtrip") {
    val dir = tmpDir("ice1")
    IceLite.create(dir, Model.pagesSchema, 4)
    val staged = IceLite.stageFiles(dir, "e1", mkRows(10), Some("_bucket"), 1)
    IceLite.commit(dir, "e1", "merge", staged, replacedBuckets = (0 until 4).toSet)
    val got = IceLite.read(spark, dir)
    assert(got.count() == 10)
    assert(got.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))
  }

  test("epoch-keyed commits are idempotent (exactly-once replay)") {
    val dir = tmpDir("ice2")
    IceLite.create(dir, Model.pagesSchema, 4)
    val staged = IceLite.stageFiles(dir, "e1", mkRows(5), Some("_bucket"), 1)
    val m1 = IceLite.commit(dir, "e1", "merge", staged, (0 until 4).toSet)
    // replayed commit of the same epoch: metadata unchanged
    val m2 = IceLite.commit(dir, "e1", "merge", staged, (0 until 4).toSet)
    assert(m1.version == m2.version && m1.snapshotId == m2.snapshotId)
    assert(IceLite.hasEpoch(dir, "e1") && !IceLite.hasEpoch(dir, "nope"))
    assert(IceLite.read(spark, dir).count() == 5)
  }

  test("time travel: old versions stay readable; hint is atomic pointer") {
    val dir = tmpDir("ice3")
    IceLite.create(dir, Model.pagesSchema, 4)
    val s1 = IceLite.stageFiles(dir, "e1", mkRows(3), Some("_bucket"), 1)
    IceLite.commit(dir, "e1", "merge", s1, (0 until 4).toSet)
    val vAfterFirst = IceLite.currentVersion(dir)
    val s2 = IceLite.stageFiles(dir, "e2", mkRows(8), Some("_bucket"), 1)
    IceLite.commit(dir, "e2", "merge", s2, (0 until 4).toSet)
    assert(IceLite.read(spark, dir).count() == 8)
    assert(IceLite.read(spark, dir, Some(vAfterFirst)).count() == 3)
  }

  test("schema evolution is metadata-only: add, rename, widen, no rewrite") {
    val dir = tmpDir("ice4")
    IceLite.create(dir, Model.pagesSchema, 4)
    val s1 = IceLite.stageFiles(dir, "e1", mkRows(4), Some("_bucket"), 1)
    IceLite.commit(dir, "e1", "merge", s1, (0 until 4).toSet)
    val filesBefore = IceLite.load(dir).files.map(_.path).toSet

    SchemaEvolution(dir, """{"addColumn":{"name":"fetch_ms","type":"long"}}""", "a1")
    SchemaEvolution(dir, """{"renameColumn":{"from":"lang","to":"language"}}""", "a2")
    SchemaEvolution(dir, """{"widenColumn":{"name":"fetch_ms","type":"double"}}""", "a3")

    val m = IceLite.load(dir)
    assert(m.files.map(_.path).toSet == filesBefore, "NO data rewrite on ALTER")
    val got = IceLite.read(spark, dir)
    assert(got.columns.toSeq ==
      Seq("url", "warc_ts", "html", "text", "language", "fetch_ms"))
    assert(got.schema("fetch_ms").dataType == DoubleType)
    // old rows: added col null-filled, renamed col still carries data
    assert(got.filter(col("fetch_ms").isNotNull).count() == 0)
    assert(got.filter(col("language") === "en").count() == 4)
    // idempotent ALTER replay
    SchemaEvolution(dir, """{"addColumn":{"name":"x","type":"int"}}""", "a1")
    assert(!IceLite.load(dir).currentSchema.fields.exists(_.name == "x"))
  }

  test("illegal evolutions are rejected") {
    val dir = tmpDir("ice5")
    IceLite.create(dir, Model.pagesSchema, 4)
    intercept[IllegalArgumentException] {
      SchemaEvolution(dir, """{"widenColumn":{"name":"lang","type":"int"}}""", "b1")
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution(dir, """{"dropColumn":{"name":"url"}}""", "b2")
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution(dir, """{"addColumn":{"name":"url","type":"int"}}""", "b3")
    }
    // the event-time (merge version) column can be renamed but never dropped
    intercept[IllegalArgumentException] {
      SchemaEvolution(dir, """{"dropColumn":{"name":"warc_ts"}}""", "b4")
    }
  }

  private def env(rows: Seq[(String, Long, String)]) =
    rows.map { case (u, o, op) =>
      (0, o, op, u, new java.sql.Timestamp(1000L * o),
        s"<html><body>p$o</body></html>".getBytes("UTF-8"), "en",
        null: String, Map.empty[String, String])
    }.toDF("partition", "offset", "op", "url", "warc_ts", "html", "lang",
      "alterJson", "extra")

  test("merge + CDC read survive a RENAME of the event-time column " +
      "(version resolved by field id)") {
    val dir = tmpDir("ice6")
    IceLite.create(dir, Model.pagesSchema, 4)
    graft.operators.Merge(spark, dir,
      env(Seq(("https://r.example.com/a", 1L, "I"),
        ("https://r.example.com/b", 2L, "I"))), "m.0")
    val vAfterFirst = IceLite.currentVersion(dir)
    SchemaEvolution(dir,
      """{"renameColumn":{"from":"warc_ts","to":"captured_at"}}""", "m.alt")
    // a merge into the NON-EMPTY renamed table must still apply the
    // (event_time, offset, partition) condition — round-1 bug: hard-coded
    // c_warc_ts/e_warc_ts blew up with unresolved columns here
    graft.operators.Merge(spark, dir,
      env(Seq(("https://r.example.com/a", 9L, "U"),
        ("https://r.example.com/c", 3L, "I"))), "m.1")
    val got = IceLite.read(spark, dir)
    assert(got.columns.contains("captured_at") && got.count() == 3)
    assert(got.filter(col("url") === "https://r.example.com/a")
      .collect()(0).getTimestamp(1).getTime == 9000L)
    // stale update (older event time) must lose against the stored row
    graft.operators.Merge(spark, dir,
      env(Seq(("https://r.example.com/a", 4L, "U"))), "m.2")
    assert(IceLite.read(spark, dir)
      .filter(col("url") === "https://r.example.com/a")
      .collect()(0).getTimestamp(1).getTime == 9000L, "older event resurged")
    // incremental CDC diff across the rename is still computable
    val ch = graft.operators.Changes.between(spark, dir, vAfterFirst)
    assert(ch.filter(col("change_type") === "insert").count() == 1)
    assert(ch.filter(col("change_type") === "update").count() == 1)
  }

  /** Sum of sizes of metadata-dir files created by `body` (the bytes one
    * commit writes: new manifests + the new metadata JSON; hint excluded —
    * it's a fixed-size cache).
    */
  private def metadataBytesWritten(dir: String)(body: => Unit): Long = {
    import scala.jdk.CollectionConverters._
    val md = java.nio.file.Paths.get(dir, "metadata")
    def snap() = java.nio.file.Files.list(md).iterator().asScala
      .filterNot(_.getFileName.toString.startsWith("version-hint"))
      .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
    val before = snap()
    body
    snap().filterNot { case (p, _) => before.contains(p) }.values.sum
  }

  private def mkRowsInBucket(n: Int, bucket: Int) =
    (1 to n).map(i => (s"https://t.example.com/$bucket/$i",
      new java.sql.Timestamp(1000L * i), Array[Byte](i.toByte), s"text$i",
      "en", i.toLong, 0, false))
      .toDF("url", "warc_ts", "html", "text", "lang",
        "_offset", "_partition", "_deleted")
      .withColumn("_bucket", lit(bucket))

  test("manifest split: a one-bucket commit writes O(touched bucket) " +
      "metadata bytes, flat as total live-file count grows 16x") {
    def build(name: String, commitsPerBucket: Int): String = {
      val dir = tmpDir(name)
      IceLite.create(dir, Model.pagesSchema, 8)
      (0 until commitsPerBucket).foreach { k =>
        (0 until 8).foreach { b =>
          val staged = IceLite.stageFiles(dir, s"load.$b.$k",
            mkRowsInBucket(2, b), Some("_bucket"), 1)
          IceLite.commit(dir, s"load.$b.$k", "append", staged)
        }
      }
      dir
    }
    val small = build("man_small", 1) // 8 live files
    val big = build("man_big", 16)    // 128 live files
    def oneBucketCommit(dir: String): Long = metadataBytesWritten(dir) {
      val staged = IceLite.stageFiles(dir, "probe.0",
        mkRowsInBucket(1, 0), Some("_bucket"), 1)
      IceLite.commit(dir, "probe.0", "merge", staged,
        replacedBuckets = Set(0))
    }
    val bytesSmall = oneBucketCommit(small)
    val bytesBig = oneBucketCommit(big)
    // inline-files metadata would scale ~16x here; the manifest list keeps
    // the commit's writes at one bucket manifest + O(buckets) refs
    assert(bytesBig < bytesSmall * 3,
      s"per-commit metadata grew with live files: $bytesSmall -> $bytesBig")
    // and the split loses nothing: full read still sees every live file
    assert(IceLite.read(spark, big).count() == 7 * 16 * 2 + 1)
    assert(IceLite.load(big).manifests.size == 8, "one manifest per bucket")
  }

  test("concurrent committers: conditional-create CAS — every epoch lands, " +
      "losers rebase, versions stay sequential") {
    val dir = tmpDir("icerace")
    IceLite.create(dir, Model.pagesSchema, 4)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def committer(prefix: String) = new Thread(() => {
      try {
        (0 until 10).foreach { i =>
          IceLite.commit(dir, s"$prefix.$i", "merge", maxAttempts = 200)
        }
      } catch { case t: Throwable => errs.add(t) }
    })
    val ts = Seq(committer("a"), committer("b"))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"committer failed: ${errs.peek()}")
    val m = IceLite.load(dir)
    assert(m.version == 21, "create + 20 contended commits, none lost")
    assert((0 until 10).forall(i =>
      m.committedEpoch(s"a.$i") && m.committedEpoch(s"b.$i")))
  }

  test("CasCatalog: the commit protocol runs rename-free on a conditional-" +
      "PUT object store; racing publishes of one version — exactly one wins") {
    val cat = new graft.icelite.CasCatalog
    val dir = tmpDir("icecas")
    IceLite.create(dir, Model.pagesSchema, 4, cat)
    val staged = IceLite.stageFiles(dir, "e1", mkRows(5), Some("_bucket"), 1)
    IceLite.commit(dir, "e1", "merge", staged, (0 until 4).toSet, catalog = cat)
    // replay no-op + read both work against the object-store catalog
    val v = IceLite.currentVersion(dir, cat)
    IceLite.commit(dir, "e1", "merge", staged, (0 until 4).toSet, catalog = cat)
    assert(IceLite.currentVersion(dir, cat) == v)
    assert(IceLite.read(spark, dir, catalog = cat).count() == 5)
    // nothing leaked into the FileCatalog layout: no metadata JSON on disk
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "metadata", "v1.metadata.json")))
    // the raw CAS: 8 threads race to create one version, exactly one wins
    val wins = new java.util.concurrent.atomic.AtomicInteger()
    val threads = (0 until 8).map(i => new Thread(() => {
      if (cat.tryPublish(dir, 99, Array(i.toByte))) wins.incrementAndGet()
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1)
  }

  test("epoch log folds to per-prefix high-water marks: metadata stays " +
      "O(live files) after 1000 commits") {
    val dir = tmpDir("ice7")
    IceLite.create(dir, Model.pagesSchema, 4)
    (0 until 1000).foreach { i =>
      IceLite.commit(dir, s"stream.$i", "merge")
      if (i % 50 == 0) IceLite.commit(dir, s"stream.$i.alter.0", "alter")
    }
    val m = IceLite.load(dir)
    // every epoch is still recognized as committed (replay no-ops) ...
    assert((0 until 1000).forall(i => m.committedEpoch(s"stream.$i")))
    assert(m.committedEpoch("stream.500.alter.0") &&
      !m.committedEpoch("stream.1000") && !m.committedEpoch("other.0"))
    val before = IceLite.currentVersion(dir)
    IceLite.commit(dir, "stream.123", "merge") // replay → no new version
    assert(IceLite.currentVersion(dir) == before)
    // ... but the metadata does NOT carry 1000 keys: numeric suffixes fold
    assert(m.epochLog.size <= 2, s"epochLog grew: ${m.epochLog.size}")
    val metaBytes = java.nio.file.Files.size(java.nio.file.Paths.get(
      dir, "metadata", s"v$before.metadata.json"))
    assert(metaBytes < 16 * 1024,
      s"metadata file is $metaBytes bytes after 1000 commits")
  }
}
