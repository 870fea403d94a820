package graft.icelite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** "IceLite" — a minimal Iceberg-style snapshot table format built from
  * scratch for this engine (SURVEY.md §1.4). No Iceberg runtime exists in
  * this sandbox, so the engine ships the subset of the public Iceberg table
  * spec semantics that BASELINE.json requires:
  *
  *  - immutable parquet data files + a JSON metadata log (one file per commit)
  *  - PER-BUCKET MANIFEST files + a manifest list in the metadata (the
  *    Iceberg manifest split): the metadata JSON names one manifest per
  *    bucket; each manifest lists that bucket's data files. A commit writes
  *    new manifests only for the buckets it touches and carries every other
  *    bucket's manifest BY REFERENCE — per-commit metadata writes are
  *    O(touched buckets × files-per-bucket + total buckets), never
  *    O(all live files). At 10^5 buckets × several files each, a one-bucket
  *    micro-batch commit writes a few KB, not the whole file census.
  *  - atomic commits via CONDITIONAL CREATE of the next metadata version
  *    (the [[Catalog]] CAS — filesystem CREATE_NEW locally, S3/GCS
  *    conditional PUT in an object store). Concurrent committers race on
  *    the create; the loser reloads and rebases (see [[commit]]).
  *  - idempotent commits keyed by **epoch key**: a commit whose epoch key is
  *    already in the snapshot log is a no-op replay — this is the
  *    exactly-once mechanism for `foreachBatch` (epoch key = batch id)
  *  - schema evolution as metadata-only commits (field-id based: add /
  *    rename / widen / drop with NO data-file rewrite); readers reconcile
  *    old files to the current schema by field id
  *  - url-hash bucketed layout: each data file belongs to one bucket;
  *    copy-on-write MERGE replaces only the buckets a batch touches
  *  - time travel: any retained metadata version is readable
  *
  * Layout:
  * {{{
  * table/
  *   data/<epoch>-<bucket>-<n>.parquet
  *   metadata/v<N>.metadata.json       // manifest list + schemas + epochs
  *   metadata/man-<uniq>-b<B>.json     // bucket B's data-file list
  *   metadata/version-hint.text        // read fast path (cache, not truth)
  * }}}
  *
  * Crash/race debris: a committer that dies (or loses the CAS) after
  * staging data files or manifests leaves unreachable orphans — never
  * visible, reclaimed by maintenance. Metadata is read once per query from
  * the driver.
  */
object IceLite {

  /** Iceberg-style field: stable id survives renames and type widening. */
  case class Field(id: Int, name: String, dataType: DataType, nullable: Boolean)

  case class Schema(schemaId: Int, fields: Seq[Field]) {
    def struct: StructType =
      StructType(fields.map(f => StructField(f.name, f.dataType, f.nullable)))
  }

  case class DataFileEntry(path: String, bucket: Int, schemaId: Int, rows: Long)

  /** One bucket's data-file list, stored out-of-line (the manifest split).
    * Immutable once written; shared by reference across versions.
    */
  case class ManifestRef(path: String, bucket: Int, nFiles: Int)

  case class Metadata(
      version: Int,
      snapshotId: Long,
      parentSnapshotId: Long,
      epochKey: String,
      operation: String,
      currentSchemaId: Int,
      numBuckets: Int,
      schemas: Seq[Schema],
      manifests: Seq[ManifestRef],
      files: Seq[DataFileEntry],
      epochLog: Set[String],
      epochHwm: Map[String, Long],
      committedAtMs: Long) {
    def currentSchema: Schema = schemas.find(_.schemaId == currentSchemaId).get

    /** Live data-file count per bucket — the compaction-pressure signal.
      * Driver-side and metadata-only (no storage listing): ingest commit
      * results surface its max so a pipeline knows WHEN to schedule
      * [[graft.operators.Maintenance.compactIfNeeded]].
      */
    def filesPerBucket: Map[Int, Int] =
      files.groupBy(_.bucket).map { case (b, fs) => b -> fs.size }

    /** True iff `key` was already committed. Numeric-suffixed keys
      * (`<prefix>.<n>`) are folded into a per-prefix HIGH-WATER MARK
      * instead of being stored individually, so per-commit metadata stays
      * O(live files + prefixes) after 10^6 micro-batches — the same
      * compaction a Flink→Iceberg committer does by storing only the last
      * committed checkpoint id per writer.
      *
      * CONTRACT (holds for every producer in this engine): within one
      * prefix, epochs are committed in non-decreasing numeric order, and a
      * recovery only ever re-attempts the LAST epochs (Structured
      * Streaming's offsets/commits WAL guarantees batch ids are monotone
      * and at most the tail batch re-runs; Replay's segments run 0..k in
      * order from the start). Under that contract, n ≤ hwm(prefix) ⟺
      * the epoch's effects are already in the table.
      */
    def committedEpoch(key: String): Boolean =
      epochLog.contains(key) || splitNumericSuffix(key).exists {
        case (p, n) => epochHwm.get(p).exists(_ >= n)
      }
  }

  /** `"a.b.7"` → `("a.b", 7)`; None when the last dot-segment isn't a
    * plain decimal number (or is too long to be a Long).
    */
  private[graft] def splitNumericSuffix(key: String): Option[(String, Long)] = {
    val i = key.lastIndexOf('.')
    if (i <= 0 || i == key.length - 1) None
    else {
      val suf = key.substring(i + 1)
      if (suf.forall(_.isDigit) && suf.length <= 18)
        Some((key.substring(0, i), suf.toLong))
      else None
    }
  }

  // ---------------------------------------------------------------- JSON

  private def typeToJsonString(dt: DataType): String = dt.json
  private def typeFromJsonString(s: String): DataType = DataType.fromJson(s)

  private def fileToJson(f: DataFileEntry): JObject = JObject(
    "path" -> JString(f.path),
    "bucket" -> JInt(f.bucket),
    "schemaId" -> JInt(f.schemaId),
    "rows" -> JLong(f.rows))

  private def jstr(v: JValue): String =
    v match { case JString(x) => x; case _ => sys.error("str") }
  private def jnum(v: JValue): Long = v match {
    case JInt(x) => x.toLong; case JLong(x) => x; case _ => sys.error("num")
  }
  private def jbool(v: JValue): Boolean =
    v match { case JBool(x) => x; case _ => sys.error("bool") }

  private def fileFromJson(fv: JValue): DataFileEntry = {
    val fo = fv.asInstanceOf[JObject].obj.toMap
    DataFileEntry(jstr(fo("path")), jnum(fo("bucket")).toInt,
      jnum(fo("schemaId")).toInt, jnum(fo("rows")))
  }

  private def toJson(m: Metadata): String = {
    val j = JObject(
      "format" -> JString("icelite/2"),
      "version" -> JInt(m.version),
      "snapshotId" -> JLong(m.snapshotId),
      "parentSnapshotId" -> JLong(m.parentSnapshotId),
      "epochKey" -> JString(m.epochKey),
      "operation" -> JString(m.operation),
      "currentSchemaId" -> JInt(m.currentSchemaId),
      "numBuckets" -> JInt(m.numBuckets),
      "committedAtMs" -> JLong(m.committedAtMs),
      "schemas" -> JArray(m.schemas.toList.map(s => JObject(
        "schemaId" -> JInt(s.schemaId),
        "fields" -> JArray(s.fields.toList.map(f => JObject(
          "id" -> JInt(f.id),
          "name" -> JString(f.name),
          "type" -> JString(typeToJsonString(f.dataType)),
          "nullable" -> JBool(f.nullable))))))),
      // the manifest LIST: per-bucket file lists live out-of-line; this
      // JSON never carries individual data files (see fromJson for the
      // icelite/1 inline-files legacy read path)
      "manifests" -> JArray(m.manifests.toList.map(r => JObject(
        "path" -> JString(r.path),
        "bucket" -> JInt(r.bucket),
        "nFiles" -> JInt(r.nFiles)))),
      "epochLog" -> JArray(m.epochLog.toList.sorted.map(JString(_))),
      "epochHwm" -> JObject(m.epochHwm.toList.sortBy(_._1)
        .map { case (k, v) => k -> (JLong(v): JValue) }))
    JsonMethods.pretty(JsonMethods.render(j))
  }

  private def fromJson(s: String): Metadata = {
    val j = JsonMethods.parse(s)
    val o = j.asInstanceOf[JObject].obj.toMap
    val schemas = o("schemas").asInstanceOf[JArray].arr.map { sv =>
      val so = sv.asInstanceOf[JObject].obj.toMap
      Schema(
        jnum(so("schemaId")).toInt,
        so("fields").asInstanceOf[JArray].arr.map { fv =>
          val fo = fv.asInstanceOf[JObject].obj.toMap
          Field(jnum(fo("id")).toInt, jstr(fo("name")),
            typeFromJsonString(jstr(fo("type"))), jbool(fo("nullable")))
        })
    }
    val manifests = o.get("manifests") match {
      case Some(JArray(arr)) => arr.map { rv =>
        val ro = rv.asInstanceOf[JObject].obj.toMap
        ManifestRef(jstr(ro("path")), jnum(ro("bucket")).toInt,
          jnum(ro("nFiles")).toInt)
      }
      case _ => Nil
    }
    // icelite/2 resolves files from manifests; icelite/1 carried them inline
    val files =
      if (manifests.nonEmpty) manifests.flatMap(readManifest)
      else o.get("files") match {
        case Some(JArray(arr)) => arr.map(fileFromJson)
        case _ => Nil
      }
    val hwm = o.get("epochHwm") match { // absent in early icelite/1 files
      case Some(JObject(kvs)) => kvs.map { case (k, v) => k -> jnum(v) }.toMap
      case _ => Map.empty[String, Long]
    }
    Metadata(
      jnum(o("version")).toInt, jnum(o("snapshotId")), jnum(o("parentSnapshotId")),
      jstr(o("epochKey")), jstr(o("operation")), jnum(o("currentSchemaId")).toInt,
      jnum(o("numBuckets")).toInt, schemas, manifests, files,
      o("epochLog").asInstanceOf[JArray].arr.map(jstr).toSet,
      hwm,
      jnum(o("committedAtMs")))
  }

  // ------------------------------------------------------------ manifests

  private def metaDir(dir: String): Path = Paths.get(dir, "metadata")
  private def dataDir(dir: String): Path = Paths.get(dir, "data")

  private val manifestSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Write one bucket's file list as an immutable manifest file. Uniquely
    * named per attempt, so racing committers can never collide — a lost
    * CAS only orphans the loser's manifests.
    */
  private def writeManifest(dir: String, bucket: Int,
      files: Seq[DataFileEntry]): ManifestRef = {
    val p = metaDir(dir).resolve(
      s"man-${System.nanoTime()}-${manifestSeq.incrementAndGet()}-b$bucket.json")
    val j = JObject(
      "bucket" -> JInt(bucket),
      "files" -> JArray(files.toList.map(fileToJson(_): JValue)))
    Files.createDirectories(metaDir(dir))
    Files.write(p, JsonMethods.compact(JsonMethods.render(j))
      .getBytes(StandardCharsets.UTF_8))
    ManifestRef(p.toString, bucket, files.size)
  }

  private def readManifest(r: ManifestRef): Seq[DataFileEntry] = {
    val s = new String(Files.readAllBytes(Paths.get(r.path)),
      StandardCharsets.UTF_8)
    val o = JsonMethods.parse(s).asInstanceOf[JObject].obj.toMap
    o("files").asInstanceOf[JArray].arr.map(fileFromJson)
  }

  // ---------------------------------------------------------------- load

  def exists(dir: String, catalog: Catalog = FileCatalog): Boolean =
    catalog.exists(dir)

  def currentVersion(dir: String, catalog: Catalog = FileCatalog): Int =
    catalog.currentVersion(dir)

  def load(dir: String, catalog: Catalog = FileCatalog): Metadata =
    loadVersion(dir, catalog.currentVersion(dir), catalog)

  def loadVersion(dir: String, v: Int,
      catalog: Catalog = FileCatalog): Metadata =
    fromJson(new String(catalog.readVersion(dir, v), StandardCharsets.UTF_8))

  /** Newest version committed at or before `tsMillis` (timestamp time
    * travel). Linear walk from the head — version count is bounded by
    * snapshot expiry and metadata files are tiny; a wall-clock regression
    * between commits can't break it the way a binary search could.
    */
  def versionAt(dir: String, tsMillis: Long,
      catalog: Catalog = FileCatalog): Int = {
    var v = catalog.currentVersion(dir)
    while (v >= 1) {
      // a MISSING older version file = expired history (snapshot expiry
      // deletes metadata first, then manifests — so the expired tail
      // surfaces as missing files): treat as end-of-walk, the documented
      // "expired" message below fires. Any OTHER IO error (transient read
      // failure, corrupt metadata) PROPAGATES — swallowing it would mask
      // corruption as expiry and wrongly report "no snapshot at or before"
      // even when loadable older snapshots exist.
      val committedAt =
        try { Some(loadVersion(dir, v, catalog).committedAtMs) }
        catch { case _: java.nio.file.NoSuchFileException |
          _: java.io.FileNotFoundException => None }
      committedAt match {
        case Some(ts) if ts <= tsMillis => return v
        case Some(_) => v -= 1
        case None => v = 0 // expired tail: nothing older is loadable either
      }
    }
    throw new IllegalArgumentException(
      s"icelite: no snapshot at or before timestamp $tsMillis in $dir " +
        "(or it was expired)")
  }

  // ---------------------------------------------------------------- create

  /** Create an empty table with user schema `struct` (field ids 1..n). */
  def create(dir: String, struct: StructType, numBuckets: Int,
      catalog: Catalog = FileCatalog): Metadata = {
    Files.createDirectories(metaDir(dir))
    Files.createDirectories(dataDir(dir))
    val fields = struct.fields.zipWithIndex.map { case (f, i) =>
      Field(i + 1, f.name, f.dataType, f.nullable)
    }
    val m = Metadata(1, snapshotId = 1L, parentSnapshotId = 0L,
      epochKey = "create", operation = "create", currentSchemaId = 1,
      numBuckets = numBuckets, schemas = Seq(Schema(1, fields.toIndexedSeq)),
      manifests = Nil, files = Nil, epochLog = Set("create"),
      epochHwm = Map.empty, committedAtMs = System.currentTimeMillis())
    require(catalog.tryPublish(dir, 1,
      toJson(m).getBytes(StandardCharsets.UTF_8)),
      s"table already exists at $dir")
    m
  }

  /** True iff `epochKey` was already committed — the replay no-op check. */
  def hasEpoch(dir: String, epochKey: String,
      catalog: Catalog = FileCatalog): Boolean =
    exists(dir, catalog) && load(dir, catalog).committedEpoch(epochKey)

  // ---------------------------------------------------------------- commit

  /** Atomic commit: replace `replacedBuckets`' files with `newFiles`, and/or
    * evolve the schema. Idempotent on `epochKey`: returns the existing
    * metadata unchanged if the epoch was already committed (even if the
    * process died between data-file staging and here — staged files of an
    * aborted attempt are unreachable garbage, never visible).
    *
    * Concurrency: optimistic. The commit is built against the loaded
    * current version and published with the catalog's conditional create;
    * when a concurrent committer wins the race, this committer reloads the
    * winner's metadata, re-checks the epoch (same-epoch races collapse to
    * the idempotent no-op) and REBASES.
    *
    * A rebase is only sound when this commit's files do not DEPEND on
    * table contents another committer may have changed: purely ADDITIVE
    * commits (no `replacedBuckets`) always rebase cleanly, but a commit
    * that REPLACES buckets computed its new files from those buckets'
    * prior contents. Callers that read-then-replace must pass
    * `baseVersion` = the version they read; if any replaced bucket
    * changed between base and current (a concurrent merge, compact, GC…),
    * the commit throws [[CommitConflictException]] instead of silently
    * clobbering the other committer's rows — the caller re-reads and
    * re-executes (Iceberg's serializable-isolation validation, same idea).
    *
    * Metadata writes per commit: one manifest per TOUCHED bucket (touched =
    * gaining or losing files this commit) + the manifest list — untouched
    * buckets' manifests are carried by reference, so commit cost never
    * scales with total live-file count.
    */
  def commit(
      dir: String,
      epochKey: String,
      operation: String,
      newFiles: Seq[DataFileEntry] = Nil,
      replacedBuckets: Set[Int] = Set.empty,
      newSchema: Option[Schema] = None,
      catalog: Catalog = FileCatalog,
      maxAttempts: Int = 10,
      baseVersion: Option[Int] = None): Metadata = {
    var attempts = 0
    while (true) {
      val cur = load(dir, catalog)
      if (cur.committedEpoch(epochKey)) return cur
      baseVersion.filter(_ != cur.version).foreach { bv =>
        val base = loadVersion(dir, bv, catalog)
        def replacedFiles(m: Metadata) =
          m.files.filter(f => replacedBuckets.contains(f.bucket))
            .map(_.path).toSet
        if (replacedFiles(cur) != replacedFiles(base)) {
          throw new CommitConflictException(
            s"commit $epochKey based on v$bv replaces buckets " +
              s"modified by a concurrent commit (now v${cur.version}) — " +
              "re-read and re-execute")
        }
      }
      // racing schema evolutions would mint colliding schema ids
      newSchema.filter(s => cur.schemas.exists(_.schemaId == s.schemaId))
        .foreach { s =>
          throw new CommitConflictException(
            s"schema id ${s.schemaId} already exists at v${cur.version} — " +
              "a concurrent ALTER won; re-derive the evolution")
        }
      val keptFiles = cur.files.filterNot(f => replacedBuckets.contains(f.bucket))
      val keptByBucket = keptFiles.groupBy(_.bucket)
      val newByBucket = newFiles.groupBy(_.bucket)
      val refByBucket = cur.manifests.map(r => r.bucket -> r).toMap
      // buckets whose file list changes this commit: gaining files, or
      // replaced while holding files
      val touched = newByBucket.keySet ++
        replacedBuckets.intersect(cur.files.map(_.bucket).toSet)
      val manifests2 = (keptByBucket.keySet ++ newByBucket.keySet)
        .toSeq.sorted.map { b =>
          refByBucket.get(b) match {
            case Some(ref) if !touched.contains(b) => ref // by reference
            case _ => // touched, or legacy inline-files metadata: (re)write
              writeManifest(dir, b,
                keptByBucket.getOrElse(b, Nil) ++ newByBucket.getOrElse(b, Nil))
          }
        }
      val schemas = newSchema match {
        case Some(s) => cur.schemas :+ s
        case None => cur.schemas
      }
      // numeric-suffixed epochs fold into the per-prefix high-water mark
      // (see Metadata.committedEpoch); everything else stays in the set
      val (log2, hwm2) = splitNumericSuffix(epochKey) match {
        case Some((p, n)) =>
          (cur.epochLog,
            cur.epochHwm + (p -> math.max(cur.epochHwm.getOrElse(p, -1L), n)))
        case None => (cur.epochLog + epochKey, cur.epochHwm)
      }
      val m = Metadata(
        version = cur.version + 1,
        snapshotId = cur.snapshotId + 1,
        parentSnapshotId = cur.snapshotId,
        epochKey = epochKey,
        operation = operation,
        currentSchemaId = newSchema.map(_.schemaId).getOrElse(cur.currentSchemaId),
        numBuckets = cur.numBuckets,
        schemas = schemas,
        manifests = manifests2,
        files = keptFiles ++ newFiles,
        epochLog = log2,
        epochHwm = hwm2,
        committedAtMs = System.currentTimeMillis())
      if (catalog.tryPublish(dir, m.version,
          toJson(m).getBytes(StandardCharsets.UTF_8))) {
        return m
      }
      // lost the CAS: a concurrent committer published this version first —
      // rebase on its metadata (this attempt's manifests become orphans)
      attempts += 1
      if (attempts >= maxAttempts) {
        throw new IllegalStateException(
          s"commit $epochKey lost the publish race $maxAttempts times at $dir")
      }
    }
    sys.error("unreachable")
  }

  // ---------------------------------------------------------------- read

  /** Internal (physical) columns appended to every data file by the writer;
    * they never evolve and never appear in the user schema.
    * `_offset`/`_partition` = source position of the winning event (the
    * late-data merge condition); `_deleted` = tombstone flag so a delete
    * masks later-arriving older events for the same url.
    */
  val internalFields: Seq[StructField] = Seq(
    StructField("_offset", LongType, nullable = true),
    StructField("_partition", IntegerType, nullable = true),
    StructField("_deleted", BooleanType, nullable = false))

  /** Read the table at the given (default: current) version, reconciled to
    * that version's schema, INCLUDING internal columns and tombstones.
    * Files are grouped by the schema they were written under; each group is
    * read schema-pinned, then renamed by field id / widened / null-filled to
    * the target schema — no data rewrite ever happens on evolution.
    */
  def readInternal(spark: SparkSession, dir: String,
      version: Option[Int] = None,
      buckets: Option[Set[Int]] = None,
      catalog: Catalog = FileCatalog): DataFrame = {
    val m = version.map(loadVersion(dir, _, catalog))
      .getOrElse(load(dir, catalog))
    val target = m.currentSchema
    val wanted = buckets match {
      case Some(bs) => m.files.filter(f => bs.contains(f.bucket))
      case None => m.files
    }
    val outStruct = StructType(target.struct.fields ++ internalFields)
    if (wanted.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outStruct)
    }
    val bySchema = wanted.groupBy(_.schemaId).toSeq.sortBy(_._1)
    val parts = bySchema.map { case (sid, fs) =>
      val writeSchema = m.schemas.find(_.schemaId == sid).get
      val physical = StructType(writeSchema.struct.fields ++ internalFields)
      val df = spark.read.schema(physical).parquet(fs.map(_.path): _*)
      // reconcile by field id: rename, widen, then add missing as nulls
      val byId = writeSchema.fields.map(f => f.id -> f).toMap
      val cols = target.fields.map { tf =>
        byId.get(tf.id) match {
          case Some(wf) if wf.dataType == tf.dataType =>
            col(wf.name).as(tf.name)
          case Some(wf) =>
            col(wf.name).cast(tf.dataType).as(tf.name) // widening cast
          case None =>
            lit(null).cast(tf.dataType).as(tf.name) // added after write
        }
      } ++ internalFields.map(f => col(f.name))
      df.select(cols: _*)
    }
    parts.reduce(_ unionByName _)
  }

  /** Public read: current live rows (tombstones filtered, internals dropped). */
  def read(spark: SparkSession, dir: String, version: Option[Int] = None,
      catalog: Catalog = FileCatalog): DataFrame = {
    val df = readInternal(spark, dir, version, catalog = catalog)
    df.filter(!col("_deleted")).drop(internalFields.map(_.name): _*)
  }

  /** Append-only commit of a DataFrame (sidecar lineage/metrics tables,
    * `INSERT INTO` / `save` through the data source): writes one staged
    * file set, commits under `epochKey`.
    *
    * LAYOUT INVARIANT: every writer buckets rows by
    * `Salt.bucket(key, numBuckets)` (key = first schema field), so a
    * key's rows live ONLY in its bucket's files — bucket-scoped rewrites
    * (merge, SQL MERGE, compaction) and bucket-pruned scans depend on it.
    * Single-bucket tables degenerate to bucket 0 unchanged.
    */
  def append(spark: SparkSession, dir: String, epochKey: String,
      df: DataFrame, catalog: Catalog = FileCatalog): Unit = {
    if (!exists(dir, catalog)) create(dir, df.schema, numBuckets = 1, catalog)
    if (hasEpoch(dir, epochKey, catalog)) return
    val m = load(dir, catalog)
    val keyName = m.currentSchema.fields.head.name
    val staged = stageFiles(dir, epochKey,
      df.withColumn("_offset", lit(null).cast(LongType))
        .withColumn("_partition", lit(null).cast(IntegerType))
        .withColumn("_deleted", lit(false))
        .withColumn("_bucket",
          graft.functions.Salt.bucket(col(keyName), m.numBuckets)),
      bucketCol = Some("_bucket"), schemaId = m.currentSchemaId)
    commit(dir, epochKey, "append", newFiles = staged, catalog = catalog)
  }

  /** Write `df` (which must already contain the internal columns, and a
    * `_bucket` column when `bucketCol` is set) into staged immutable data
    * files under `data/`, returning their entries. Nothing is visible until
    * `commit` publishes them in metadata — a crash leaves only orphans.
    */
  def stageFiles(dir: String, epochKey: String, df: DataFrame,
      bucketCol: Option[String], schemaId: Int): Seq[DataFileEntry] = {
    val safe = epochKey.replaceAll("[^A-Za-z0-9._-]", "_")
    val staging = Paths.get(dir, "data", s".staging-$safe-${System.nanoTime()}")
    graft.util.Phase("stage.write-job") {
      bucketCol match {
        case Some(bc) =>
          df.write.partitionBy(bc).mode("overwrite").parquet(staging.toString)
        case None =>
          df.write.mode("overwrite").parquet(staging.toString)
      }
    }
    // harvest part files into data/, named by epoch+bucket (collision-free:
    // one staging dir per attempt; final names carry a sequence number)
    val entries = scala.collection.mutable.ArrayBuffer[DataFileEntry]()
    var seq = 0
    def harvest(src: Path, bucket: Int): Unit = {
      val it = Files.list(src).iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith("part-") && n.endsWith(".parquet")) {
          val dst = Paths.get(dir, "data", s"$safe-b$bucket-$seq.parquet")
          Files.move(p, dst, StandardCopyOption.REPLACE_EXISTING)
          entries += DataFileEntry(dst.toString, bucket, schemaId, -1L)
          seq += 1
        }
      }
    }
    graft.util.Phase("stage.harvest") {
      bucketCol match {
        case Some(bc) =>
          val it = Files.list(staging).iterator()
          while (it.hasNext) {
            val d = it.next()
            val n = d.getFileName.toString
            if (n.startsWith(s"$bc=")) {
              harvest(d, n.substring(bc.length + 1).toInt)
            }
          }
        case None => harvest(staging, 0)
      }
    }
    // remove staging leftovers (_SUCCESS etc.)
    deleteRecursively(staging)
    entries.toSeq
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val it = Files.list(p).iterator()
      while (it.hasNext) deleteRecursively(it.next())
    }
    Files.deleteIfExists(p)
  }
}
