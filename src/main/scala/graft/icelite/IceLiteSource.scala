package graft.icelite

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Spark Data Source API surface for IceLite tables, so a user reaches the
  * table format through the idiomatic entry points instead of the engine's
  * Scala API:
  *
  * {{{
  * spark.read.format("icelite").load("/path/table")                  // current
  * spark.read.format("icelite").option("version", 3).load(path)      // time travel
  * df.write.format("icelite").option("epoch", "job.7").mode("append").save(path)
  *
  * CREATE TABLE pages USING icelite OPTIONS (path '/path/table');
  * SELECT ... FROM pages;                 -- column-pruned scan
  * INSERT INTO pages SELECT ...;          -- epoch-keyed append commit
  * }}}
  *
  * DSv1 (`RelationProvider`) by design: the relation delegates to
  * [[IceLite.read]], so schema-evolution reconciliation, bucket layout and
  * tombstone filtering stay in ONE implementation, and Catalyst still sees
  * the underlying parquet scans (column pruning pushes through the inner
  * plan to the parquet readers). Writes are ordinary epoch-keyed commits —
  * idempotent and atomic like every other side effect in the engine. A
  * DSv2 `SupportsRowLevelOperations` (SQL `MERGE INTO`) surface remains
  * out of scope (SURVEY §4.3); conditional upserts go through
  * `operators.Merge`.
  */
class IceLiteSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "icelite"

  private def path(parameters: Map[String, String]): String = {
    val raw = parameters.getOrElse("path", throw new IllegalArgumentException(
      "icelite: 'path' must be set (load(path) or OPTIONS (path '...'))"))
    // SQL CREATE TABLE qualifies the option into a URI (file:/tmp/x);
    // IceLite metadata IO is java.nio over local paths
    if (raw.startsWith("file:")) new java.net.URI(raw).getPath else raw
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    IceLiteRelation(sqlContext, path(parameters),
      parameters.get("version").map(_.trim.toInt))

  /** `df.write.format("icelite")`: Append = epoch-keyed append commit;
    * Overwrite = replace every bucket holding rows (plus, for a fresh
    * table, creation). The epoch key comes from `.option("epoch", ...)` —
    * REQUIRED for exactly-once retries; an unkeyed save gets a
    * wall-clock-unique key (safe, but a retried job appends twice).
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val dir = path(parameters)
    val spark = sqlContext.sparkSession
    val epoch = parameters.getOrElse("epoch",
      s"save.${System.currentTimeMillis()}")
    val tableExists = IceLite.exists(dir)
    mode match {
      case SaveMode.ErrorIfExists if tableExists =>
        throw new IllegalStateException(s"icelite table exists: $dir")
      case SaveMode.Ignore if tableExists => ()
      case SaveMode.Overwrite =>
        if (!tableExists) IceLite.create(dir, data.schema, numBuckets = 1)
        if (!IceLite.hasEpoch(dir, epoch)) {
          val m = IceLite.load(dir)
          val staged = IceLite.stageFiles(dir, epoch, withInternals(data),
            bucketCol = None, schemaId = m.currentSchemaId)
          IceLite.commit(dir, epoch, "overwrite", newFiles = staged,
            replacedBuckets = m.files.map(_.bucket).toSet)
        }
      case _ => // Append / ErrorIfExists / Ignore on a fresh table
        IceLite.append(spark, dir, epoch, data)
    }
    createRelation(sqlContext, parameters)
  }

  private def withInternals(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.lit
    df.withColumn("_offset", lit(null).cast("long"))
      .withColumn("_partition", lit(null).cast("int"))
      .withColumn("_deleted", lit(false))
  }
}

/** Read relation: current (or time-travel) live rows, reconciled to that
  * version's schema. `PrunedScan` so SELECTed columns prune through the
  * inner plan down to the parquet `ReadSchema`; `InsertableRelation` so
  * SQL `INSERT INTO` lands as an epoch-keyed append commit.
  */
case class IceLiteRelation(sqlContext: SQLContext, dir: String,
    version: Option[Int]) extends BaseRelation
    with PrunedScan with InsertableRelation {

  override def schema: StructType = {
    val m = version.map(IceLite.loadVersion(dir, _))
      .getOrElse(IceLite.load(dir))
    m.currentSchema.struct
  }

  private def df: DataFrame =
    IceLite.read(sqlContext.sparkSession, dir, version)

  override def buildScan(requiredColumns: Array[String]): RDD[Row] = {
    val base = df
    // DSv1 contract: empty projection still needs correctly-counted rows
    if (requiredColumns.isEmpty) base.rdd
    else base.select(requiredColumns.head, requiredColumns.tail: _*).rdd
  }

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(!overwrite,
      "icelite: INSERT OVERWRITE not supported — use the Merge operator " +
        "or DataFrame save(Overwrite) with an epoch option")
    IceLite.append(sqlContext.sparkSession, dir,
      s"insert.${System.currentTimeMillis()}", data)
  }
}
