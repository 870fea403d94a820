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
  }
}
