package graft.operators

import scala.annotation.tailrec

import graft.functions.Salt
import graft.icelite.{CommitConflictException, IceLite, IceLiteRelation}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, AttributeSet, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

/** SQL `MERGE INTO` surface for IceLite tables (SURVEY §4.3's "revisit
  * if a MERGE INTO SQL surface is added": this is that revisit).
  *
  * Spark's analyzer fully resolves `MergeIntoTable` over a v1 relation —
  * only the PLANNER rejects it (`BasicOperators` throws "MERGE INTO TABLE
  * is not supported temporarily", verified against Spark 4.1). So the
  * whole surface is one post-hoc resolution rule that rewrites the
  * resolved `MergeIntoTable` into a `LeafRunnableCommand` executing
  * standard SQL MERGE semantics as Catalyst-planned dataflow:
  *
  *  - target ⟗ source on the merge condition (left-outer when there are
  *    no NOT MATCHED clauses — source-only rows would be dropped anyway);
  *  - first-matching-clause action resolution as a CASE chain (clause
  *    order is the SQL-mandated priority);
  *  - cardinality check + multi-match dedup in ONE hash-partitioned
  *    window (per-target-row groups; source-only rows get singleton
  *    groups so no single-task skew);
  *  - bucket-scoped rewrite: only buckets that gained, lost or changed a
  *    row are rewritten, committed with `baseVersion` so a concurrent
  *    CDC merge CONFLICTS instead of being clobbered (serializable
  *    isolation; the command re-reads and re-executes on conflict);
  *  - when the merge condition pins the storage key (`t.key = s.expr`),
  *    the target SCAN is bucket-pruned to the source keys' buckets —
  *    the same pruning the CDC merge uses, so a point-merge into a
  *    10^5-bucket table reads a handful of buckets, not the table.
  *
  * Semantics notes (documented divergences from the CDC merge operator):
  * `WHEN MATCHED ... DELETE` deletes immediately (no tombstone — SQL
  * statement semantics, not late-data CDC fencing); existing tombstones
  * in rewritten buckets are preserved unless the statement re-inserts
  * that key; unchanged and updated rows keep their stored CDC position
  * (`_offset`/`_partition`), inserted rows get a null position.
  */
object SqlMerge {

  @tailrec
  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => stripAlias(child)
    case other => other
  }

  /** The IceLite relation beneath a MERGE target, if it is one. */
  def iceTarget(p: LogicalPlan): Option[IceLiteRelation] = stripAlias(p) match {
    case lr: LogicalRelation => lr.relation match {
      case r: IceLiteRelation => Some(r)
      case _ => None
    }
    case _ => None
  }

  /** One MERGE clause, normalized: per-target-column assignment values
    * looked up by position (v1 targets are never "rewritable", so the
    * analyzer leaves assignments unaligned — we align here by exprId).
    */
  private case class Clause(idx: Int, cond: Option[Expression],
      isDelete: Boolean, assigns: Map[Int, Expression])

  private def clauses(actions: Seq[MergeAction],
      tgtAttrs: Seq[AttributeReference]): Seq[Clause] =
    actions.zipWithIndex.map {
      case (u: UpdateAction, i) => Clause(i, u.condition, isDelete = false,
        assignMap(u.assignments, tgtAttrs))
      case (d: DeleteAction, i) => Clause(i, d.condition, isDelete = true,
        Map.empty)
      case (ins: InsertAction, i) => Clause(i, ins.condition,
        isDelete = false, assignMap(ins.assignments, tgtAttrs))
      case (other, _) => throw new UnsupportedOperationException(
        s"MERGE INTO icelite: unsupported clause $other (star actions " +
          "should have been expanded by the analyzer)")
    }

  private def assignMap(as: Seq[Assignment],
      tgtAttrs: Seq[AttributeReference]): Map[Int, Expression] =
    as.map { a =>
      a.key match {
        case ar: AttributeReference =>
          val i = tgtAttrs.indexWhere(_.exprId == ar.exprId)
          if (i < 0) throw new UnsupportedOperationException(
            s"MERGE INTO icelite: assignment key $ar is not a top-level " +
              "target column")
          i -> a.value
        case other => throw new UnsupportedOperationException(
          s"MERGE INTO icelite: only top-level column assignments are " +
            s"supported, got $other")
      }
    }.toMap

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def cc(e: Expression): Column = ColumnBridge.column(e)

  /** Execute once against the current table version; throws
    * [[CommitConflictException]] if a concurrent commit invalidates the
    * read (the command's retry loop re-executes).
    */
  def execute(spark: SparkSession, merge: MergeIntoTable): Unit = {
    val rel = iceTarget(merge.targetTable).getOrElse(
      sys.error("SqlMerge on a non-icelite target"))
    val dir = rel.dir
    val pre = IceLite.load(dir)
    val tgtAttrs = merge.targetTable.output.map(_.asInstanceOf[AttributeReference])
    schemaGuard(pre, tgtAttrs, dir)
    val keyAttr = tgtAttrs.head
    val keyName = keyAttr.name
    val nB = pre.numBuckets

    val matched = clauses(merge.matchedActions, tgtAttrs)
    val inserts = clauses(merge.notMatchedActions, tgtAttrs)
    val nmbs = clauses(merge.notMatchedBySourceActions, tgtAttrs)

    // ---- bucket pruning: sound only when every affected bucket is
    // derivable from the source keys (condition pins t.key to a source
    // expression, updates never move a row's key, inserts use that same
    // key expression, nothing touches rows without a source match, and
    // the source is deterministic so scanning it twice is consistent)
    val srcAttrSet = AttributeSet(merge.sourceTable.output)
    val srcKeyExpr = conjuncts(merge.mergeCondition).collectFirst {
      case EqualTo(l, r) if l.semanticEquals(keyAttr) &&
        r.references.subsetOf(srcAttrSet) && r.deterministic => r
      case EqualTo(l, r) if r.semanticEquals(keyAttr) &&
        l.references.subsetOf(srcAttrSet) && l.deterministic => l
    }
    val updatesPreserveKey = (matched ++ nmbs).forall(c =>
      c.isDelete || c.assigns.get(0).forall(_.semanticEquals(keyAttr)))
    val insertsUseKey = srcKeyExpr.exists(ske =>
      inserts.forall(_.assigns.get(0).exists(_.semanticEquals(ske))))
    // "deterministic" must mean REPEATABLE across two executions (the
    // bucket probe + the join re-scan the source): nondeterministic
    // expressions, unordered LIMIT and TABLESAMPLE can all legally yield
    // a different row set the second time — any of them disables pruning
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Sample}
    val srcDeterministic = !merge.sourceTable.exists {
      case _: GlobalLimit | _: LocalLimit | _: Sample => true
      case p => p.expressions.exists(e => e.exists(!_.deterministic))
    }
    val canPrune = srcKeyExpr.isDefined && nmbs.isEmpty &&
      updatesPreserveKey && insertsUseKey && srcDeterministic

    val srcDF = PlanBridge.ofRows(spark, merge.sourceTable)
    val scanBuckets: Option[Set[Int]] =
      if (!canPrune) None
      else {
        val bs = srcDF.select(Salt.bucket(cc(srcKeyExpr.get), nB).as("__b"))
          .filter(col("__b").isNotNull).distinct()
          .collect().map(_.getInt(0)).toSet
        if (bs.size * 5 >= nB * 4) None else Some(bs) // ≥80%: not worth it
      }

    // ---- target frame: version-pinned, bucket-pruned, WITH the stored
    // CDC position columns — and with the analyzer's attribute ids
    // grafted on via explicit-exprId aliases, so the merge condition and
    // assignment expressions resolve against it unchanged
    val tgtDF = pinnedTarget(spark, dir, pre.version, tgtAttrs, scanBuckets)

    val tb = tgtDF
      .withColumn("__rid", monotonically_increasing_id())
      .withColumn("__t_ex", lit(true))
    val sb = srcDF
      .withColumn("__sid", monotonically_increasing_id())
      .withColumn("__s_ex", lit(true))
    val joinType = if (inserts.nonEmpty) "full_outer" else "left_outer"
    val joined = tb.join(sb, cc(merge.mergeCondition), joinType)

    val isM = col("__t_ex").isNotNull && col("__s_ex").isNotNull
    val isS = col("__t_ex").isNull
    val isT = col("__t_ex").isNotNull && col("__s_ex").isNull

    // index of the first clause whose condition holds, else -1 (SQL gives
    // clause order priority; a null condition falls through)
    def firstClause(cs: Seq[Clause]): Column =
      cs.foldRight(lit(-1): Column)((c, acc) =>
        when(c.cond.map(cc).getOrElse(lit(true)), lit(c.idx)).otherwise(acc))

    val acted = joined
      .withColumn("__mact", when(isM, firstClause(matched)).otherwise(lit(-1)))
      .withColumn("__nmact", when(isS, firstClause(inserts)).otherwise(lit(-1)))
      .withColumn("__tact", when(isT, firstClause(nmbs)).otherwise(lit(-1)))

    // one window does both duties: cardinality violation (two+ clauses
    // firing for the same target row) and multi-match dedup (a target row
    // matching k source rows with no firing clause must survive ONCE).
    // Partition key (side, per-row id): matched copies share their target
    // row's group; source-only rows get singleton groups — no skew.
    val wkey = coalesce(col("__rid"), col("__sid"))
    val w = Window.partitionBy(col("__t_ex"), wkey)
    val wo = w.orderBy(col("__sid").asc_nulls_first)
    val withCard = acted
      .withColumn("__fcnt",
        sum(when(col("__mact") >= 0, 1).otherwise(0)).over(w))
      .withColumn("__cno", row_number().over(wo))

    val mDel = matched.filter(_.isDelete).map(_.idx)
    val tDel = nmbs.filter(_.isDelete).map(_.idx)
    def isin(c: Column, idxs: Seq[Int]): Column =
      if (idxs.isEmpty) lit(false) else c.isInCollection(idxs)

    val cardMsg = "MERGE INTO icelite: a target row matched multiple " +
      "source rows that attempt to update or delete it " +
      "(MERGE cardinality violation)"
    val keep =
      when(isM && col("__fcnt") > 1,
        assert_true(lit(false), lit(cardMsg)).isNotNull)
      .when(isM && col("__mact") >= 0, !isin(col("__mact"), mDel))
      .when(isM, col("__fcnt") === 0 && col("__cno") === 1)
      .when(isS, col("__nmact") >= 0)
      .when(isT && col("__tact") >= 0, !isin(col("__tact"), tDel))
      .otherwise(lit(true))
    val changed = (isM && col("__mact") >= 0) ||
      (isS && col("__nmact") >= 0) || (isT && col("__tact") >= 0)

    // final value of target column j under the firing clause (store
    // assignment casts to the column type, ANSI semantics); unassigned
    // columns keep their value on UPDATE and get null on INSERT
    def clauseValue(cs: Seq[Clause], actCol: Column, j: Int,
        default: Column): Column =
      cs.filterNot(_.isDelete).foldRight(default)((c, acc) =>
        when(actCol === c.idx,
          c.assigns.get(j).map(e => cc(e).cast(tgtAttrs(j).dataType))
            .getOrElse(default)).otherwise(acc))
    def finalValue(j: Int): Column = {
      val old = cc(tgtAttrs(j))
      val nul = lit(null).cast(tgtAttrs(j).dataType)
      when(isM, clauseValue(matched, col("__mact"), j, old))
        .when(isS, clauseValue(inserts, col("__nmact"), j, nul))
        .otherwise(clauseValue(nmbs, col("__tact"), j, old))
    }

    val merged = withCard.select(
      tgtAttrs.indices.map(j => finalValue(j).as(tgtAttrs(j).name)) ++ Seq(
        keep.as("__keep"), changed.as("__changed"),
        when(col("__t_ex").isNotNull, Salt.bucket(cc(keyAttr), nB))
          .as("__oldb"),
        col(oOff).as("_offset"), col(oPart).as("_partition")): _*)
      .withColumn("__newb",
        when(col("__keep"), Salt.bucket(col(keyName), nB)))
      // one materialization feeds the affected-bucket probe AND the write;
      // also freezes the nondeterministic row ids (CLAUDE.md: checkpoint,
      // not cache, so per-statement frames don't pin the CacheManager)
      .localCheckpoint()

    val affected = merged.filter(col("__changed"))
      .select(explode(array(col("__oldb"), col("__newb"))).as("b"))
      .filter(col("b").isNotNull)
      .distinct().collect().map(_.getInt(0)).toSet
    if (affected.isEmpty) return // every clause missed: a no-op, no commit
    scanBuckets.foreach { sbs =>
      if (!affected.subsetOf(sbs)) sys.error(
        s"internal: pruning unsound — affected $affected ⊄ scanned $sbs")
    }

    val out = merged
      .filter(col("__keep") && col("__newb").isInCollection(affected))
      .select(tgtAttrs.map(a => col(a.name)) ++ Seq(col("_offset"),
        col("_partition"), lit(false).as("_deleted"),
        col("__newb").as("_bucket")): _*)
    commitRewrite(spark, dir, pre, out, affected, keyName, nB, "sqlmerge")
    merged.unpersist()
  }

  // ------------------------------------------------------------ shared
  // machinery for the three DML surfaces (MERGE / UPDATE / DELETE)

  private[operators] val oOff = "__graft_t_offset"
  private[operators] val oPart = "__graft_t_partition"

  /** Version-pinned, optionally bucket-pruned scan of the target's LIVE
    * rows whose user columns carry the analyzer's attribute ids
    * (explicit-exprId aliases — so analyzer-produced conditions and
    * assignment expressions resolve against this frame unchanged), plus
    * the stored CDC position as [[oOff]]/[[oPart]].
    */
  private def pinnedTarget(spark: SparkSession, dir: String, version: Int,
      tgtAttrs: Seq[AttributeReference],
      scanBuckets: Option[Set[Int]]): DataFrame = {
    val base = IceLite.readInternal(spark, dir, Some(version), scanBuckets)
      .filter(!col("_deleted"))
    val basePlan = PlanBridge.analyzed(base)
    val byName = basePlan.output.map(a => a.name -> a).toMap
    val projectList: Seq[NamedExpression] =
      tgtAttrs.map(t => Alias(byName(t.name), t.name)(exprId = t.exprId)) ++
        Seq(Alias(byName("_offset"), oOff)(),
          Alias(byName("_partition"), oPart)())
    PlanBridge.ofRows(spark, Project(projectList, basePlan))
  }

  /** Commit `out` (user columns + `_offset`/`_partition`/`_deleted`/
    * `_bucket`) as the new content of the `affected` buckets: those
    * buckets' CDC tombstones are preserved (late-data fencing) unless the
    * statement re-inserted the key, and the commit validates against
    * `pre`'s version so a concurrent committer CONFLICTS, never clobbers.
    * The epoch key gets a non-numeric suffix (uuid slice keeps a '-'):
    * never folded into the epoch high-water mark, so concurrent DML
    * statements can't mask each other.
    */
  private def commitRewrite(spark: SparkSession, dir: String,
      pre: IceLite.Metadata, out: DataFrame, affected: Set[Int],
      keyName: String, nB: Int, opName: String): Unit = {
    val tombs = IceLite.readInternal(spark, dir, Some(pre.version),
        Some(affected))
      .filter(col("_deleted"))
      .join(out.select(col(keyName)), Seq(keyName), "left_anti")
      .withColumn("_bucket", Salt.bucket(col(keyName), nB))
    // one file per rewritten bucket (not one per task per bucket): DML
    // statements must not crowd buckets into needing compaction
    val toWrite = out.unionByName(tombs.select(out.columns.map(col): _*))
      .repartition(col("_bucket"))
    val epoch =
      s"$opName.${java.util.UUID.randomUUID().toString.substring(0, 13)}"
    val staged = IceLite.stageFiles(dir, epoch, toWrite, Some("_bucket"),
      pre.currentSchemaId)
    IceLite.commit(dir, epoch, opName, newFiles = staged,
      replacedBuckets = affected, baseVersion = Some(pre.version))
  }

  private def schemaGuard(pre: IceLite.Metadata,
      tgtAttrs: Seq[AttributeReference], dir: String): Unit =
    if (pre.currentSchema.struct.fields.map(f => (f.name, f.dataType)).toSeq
        != tgtAttrs.map(a => (a.name, a.dataType))) {
      throw new IllegalStateException(
        s"icelite SQL DML: $dir schema changed since the statement was " +
          "analyzed — re-run the statement")
    }

  /** Buckets implied by a condition's key conjuncts (`key = lit`,
    * `key IN (lits)`): sound whatever the rest of the condition does,
    * because matching rows must satisfy EVERY conjunct.
    */
  private def bucketsFromCondition(cond: Expression,
      keyAttr: AttributeReference, nB: Int): Option[Set[Int]] = {
    import org.apache.spark.sql.catalyst.expressions.{In, Literal}
    conjuncts(cond).collectFirst {
      case EqualTo(k, l: Literal) if k.semanticEquals(keyAttr) &&
        l.value != null => Set(Salt.bucketOfLiteral(l, nB))
      case EqualTo(l: Literal, k) if k.semanticEquals(keyAttr) &&
        l.value != null => Set(Salt.bucketOfLiteral(l, nB))
      case In(k, vs) if k.semanticEquals(keyAttr) &&
        vs.forall(_.isInstanceOf[Literal]) =>
        vs.collect { case l: Literal if l.value != null =>
          Salt.bucketOfLiteral(l, nB) }.toSet
    }
  }

  // ------------------------------------------------------------ UPDATE

  /** SQL `UPDATE t SET ... [WHERE ...]`: a bucket-scoped rewrite of the
    * buckets holding (or receiving, when the key itself is assigned)
    * matching rows. Scan pruning applies when the WHERE pins the key and
    * the key is not reassigned.
    */
  def executeUpdate(spark: SparkSession, update: UpdateTable): Unit = {
    val rel = iceTarget(update.table).getOrElse(
      sys.error("SqlUpdate on a non-icelite target"))
    val dir = rel.dir
    val pre = IceLite.load(dir)
    val tgtAttrs = update.table.output.map(_.asInstanceOf[AttributeReference])
    schemaGuard(pre, tgtAttrs, dir)
    val keyAttr = tgtAttrs.head
    val nB = pre.numBuckets
    val assigns = assignMap(update.assignments, tgtAttrs)
    val cond = update.condition
      .getOrElse(org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
    val keyReassigned = assigns.get(0).exists(!_.semanticEquals(keyAttr))
    val scanBuckets =
      if (keyReassigned) None // moved rows need their NEW bucket read too
      else bucketsFromCondition(cond, keyAttr, nB)

    val tgt = pinnedTarget(spark, dir, pre.version, tgtAttrs, scanBuckets)
    val hit = coalesce(cc(cond), lit(false))
    def finalValue(j: Int): Column = {
      val old = cc(tgtAttrs(j))
      assigns.get(j).map(e =>
        when(hit, cc(e).cast(tgtAttrs(j).dataType)).otherwise(old))
        .getOrElse(old)
    }
    val marked = tgt.select(
      tgtAttrs.indices.map(j => finalValue(j).as(tgtAttrs(j).name)) ++ Seq(
        hit.as("__hit"), Salt.bucket(cc(keyAttr), nB).as("__oldb"),
        col(oOff).as("_offset"), col(oPart).as("_partition")): _*)
      .withColumn("__newb", Salt.bucket(col(keyAttr.name), nB))
      .localCheckpoint() // freeze: one evaluation feeds probe AND write
    val affected = marked.filter(col("__hit"))
      .select(explode(array(col("__oldb"), col("__newb"))).as("b"))
      .filter(col("b").isNotNull)
      .distinct().collect().map(_.getInt(0)).toSet
    if (affected.isEmpty) return
    val out = marked.filter(col("__newb").isInCollection(affected))
      .select(tgtAttrs.map(a => col(a.name)) ++ Seq(col("_offset"),
        col("_partition"), lit(false).as("_deleted"),
        col("__newb").as("_bucket")): _*)
    commitRewrite(spark, dir, pre, out, affected, keyAttr.name, nB,
      "sqlupdate")
    marked.unpersist()
  }

  // ------------------------------------------------------------ DELETE

  /** SQL `DELETE FROM t [WHERE ...]`: rewrite the buckets holding matching
    * rows without them. Immediate deletes (no tombstone — statement
    * semantics, same note as MERGE's DELETE); existing tombstones in the
    * rewritten buckets are preserved.
    */
  def executeDelete(spark: SparkSession, delete: DeleteFromTable): Unit = {
    val rel = iceTarget(delete.table).getOrElse(
      sys.error("SqlDelete on a non-icelite target"))
    val dir = rel.dir
    val pre = IceLite.load(dir)
    val tgtAttrs = delete.table.output.map(_.asInstanceOf[AttributeReference])
    schemaGuard(pre, tgtAttrs, dir)
    val keyAttr = tgtAttrs.head
    val nB = pre.numBuckets
    val scanBuckets = bucketsFromCondition(delete.condition, keyAttr, nB)

    val tgt = pinnedTarget(spark, dir, pre.version, tgtAttrs, scanBuckets)
    val marked = tgt.select(tgtAttrs.map(a => cc(a).as(a.name)) ++ Seq(
        coalesce(cc(delete.condition), lit(false)).as("__hit"),
        Salt.bucket(cc(keyAttr), nB).as("__b"),
        col(oOff).as("_offset"), col(oPart).as("_partition")): _*)
      .localCheckpoint() // freeze: one evaluation feeds probe AND write
    val affected = marked.filter(col("__hit"))
      .select(col("__b")).distinct().collect().map(_.getInt(0)).toSet
    if (affected.isEmpty) return
    val out = marked
      .filter(!col("__hit") && col("__b").isInCollection(affected))
      .select(tgtAttrs.map(a => col(a.name)) ++ Seq(col("_offset"),
        col("_partition"), lit(false).as("_deleted"),
        col("__b").as("_bucket")): _*)
    commitRewrite(spark, dir, pre, out, affected, keyAttr.name, nB,
      "sqldelete")
    marked.unpersist()
  }
}

/** Base for the three DML command nodes: executes eagerly like every SQL
  * DML, re-executing on commit conflict (the statement's read is
  * repeatable — a conflict only means a concurrent committer changed an
  * affected bucket first).
  */
sealed trait SqlDmlCommand extends LeafRunnableCommand {
  protected def executeOnce(spark: SparkSession): Unit
  override def run(spark: SparkSession): Seq[Row] = {
    var left = 3
    while (true) {
      try { executeOnce(spark); return Seq.empty }
      catch {
        case e: CommitConflictException =>
          left -= 1
          if (left <= 0) throw e
      }
    }
    Seq.empty
  }
}

case class SqlMergeCommand(merge: MergeIntoTable) extends SqlDmlCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(merge)
  override protected def executeOnce(spark: SparkSession): Unit =
    SqlMerge.execute(spark, merge)
}

case class SqlUpdateCommand(update: UpdateTable) extends SqlDmlCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(update)
  override protected def executeOnce(spark: SparkSession): Unit =
    SqlMerge.executeUpdate(spark, update)
}

case class SqlDeleteCommand(delete: DeleteFromTable) extends SqlDmlCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(delete)
  override protected def executeOnce(spark: SparkSession): Unit =
    SqlMerge.executeDelete(spark, delete)
}

/** Post-hoc resolution rule: resolved MERGE / UPDATE / DELETE over an
  * icelite v1 relation → the matching command. Anything else is left for
  * Spark to handle (or reject) as usual.
  */
class SqlDmlRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable
        if m.resolved && SqlMerge.iceTarget(m.targetTable).isDefined =>
      if (m.withSchemaEvolution) throw new UnsupportedOperationException(
        "MERGE INTO icelite: WITH SCHEMA EVOLUTION is not supported — " +
          "evolve the table with the ALTER interpreter first")
      SqlMergeCommand(m)
    case u: UpdateTable
        if u.resolved && SqlMerge.iceTarget(u.table).isDefined =>
      SqlUpdateCommand(u)
    case d: DeleteFromTable
        if d.resolved && SqlMerge.iceTarget(d.table).isDefined =>
      SqlDeleteCommand(d)
    case other => other
  }
}
