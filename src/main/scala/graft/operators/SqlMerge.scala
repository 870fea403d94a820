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
    // the WITH SCHEMA EVOLUTION widening wrapper (see
    // [[SqlMergeEvolutionRule]]): pass-through attributes + null-literal
    // aliases over the relation — transparent for target identification
    case Project(pl, child) if pl.forall {
      case _: AttributeReference => true
      case Alias(l: org.apache.spark.sql.catalyst.expressions.Literal, _)
        if l.value == null => true
      case _ => false
    } => stripAlias(child)
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

  /** REPEATABLE across two evaluations of the same statement? False for
    * nondeterministic expressions AND for any subquery — a subquery's plan
    * can hide a LIMIT, a TABLESAMPLE or an icelite scan (mutable between
    * the probe and the write) from the outer plan-node traversal, so it
    * forces the single-evaluation checkpoint path wholesale.
    */
  private def repeatableExpr(e: Expression): Boolean = !e.exists {
    case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
      true
    case x => !x.deterministic
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
    val tgtAttrs = merge.targetTable.output.map(_.asInstanceOf[AttributeReference])
    val pre = IceLite.load(dir)
    // WITH SCHEMA EVOLUTION: the resolution rule widened the analyzed
    // target with the source's new columns. The TABLE is NOT altered up
    // front — the new columns ride the merge's OWN commit
    // (IceLite.commit's newSchema, same metadata shape the ALTER
    // interpreter produces), Delta-style ATOMIC evolution: a statement
    // that fails after analysis (cardinality violation, key-uniqueness
    // abort, exhausted conflict retries) — or that matches nothing and
    // no-ops — leaves the table schema untouched. The pinned target scan
    // null-fills the not-yet-existing columns, exactly what a post-ALTER
    // read of the old files would produce, so the dataflow is unchanged.
    val existingNames = pre.currentSchema.fields.map(_.name).toSet
    val evolveAttrs: Seq[AttributeReference] =
      if (merge.withSchemaEvolution)
        tgtAttrs.filterNot(a => existingNames.contains(a.name))
      else Nil
    schemaGuard(pre, tgtAttrs.filterNot(evolveAttrs.contains), dir)
    // new field ids are minted above every id EVER used (all schemas,
    // not just current): after a dropColumn, max(current)+1 would REUSE
    // the dropped id and the by-field-id read reconciliation would
    // resurrect the dropped column's stored values into the new column
    val usedIds = pre.schemas.flatMap(_.fields.map(_.id)).toSet
    val newSchema: Option[IceLite.Schema] =
      if (evolveAttrs.isEmpty) None
      else Some(IceLite.Schema(
        pre.schemas.map(_.schemaId).max + 1,
        evolveAttrs.zipWithIndex.foldLeft(pre.currentSchema.fields) {
          case (fs, (a, k)) => fs :+ IceLite.Field(usedIds.max + 1 + k,
            a.name, a.dataType, nullable = true)
        }))
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
    // a different row set the second time — any of them disables pruning.
    // An icelite relation inside the SOURCE is equally non-repeatable: a
    // concurrent commit landing between the two evaluations changes the
    // row set, and baseVersion conflict detection guards only the TARGET
    // — so it forces the single-evaluation checkpoint path too
    // (version-pinning source icelite scans is the sharper future fix).
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Sample}
    val srcDeterministic = !merge.sourceTable.exists {
      case _: GlobalLimit | _: LocalLimit | _: Sample => true
      case lr: LogicalRelation => lr.relation.isInstanceOf[IceLiteRelation]
      case p => p.expressions.exists(e => !repeatableExpr(e))
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

    // ---- the merge dataflow over a given target scan: version-pinned,
    // optionally bucket-pruned, WITH the stored CDC position columns —
    // and with the analyzer's attribute ids grafted on via explicit-exprId
    // aliases, so the merge condition and assignment expressions resolve
    // against it unchanged
    def mergedFrame(buckets: Option[Set[Int]]): DataFrame = {
      val tgtDF = pinnedTarget(spark, dir, pre.version, tgtAttrs, buckets)

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

      withCard.select(
        tgtAttrs.indices.map(j => finalValue(j).as(tgtAttrs(j).name)) ++ Seq(
          keep.as("__keep"), changed.as("__changed"),
          when(col("__t_ex").isNotNull, Salt.bucket(cc(keyAttr), nB))
            .as("__oldb"),
          col(oOff).as("_offset"), col(oPart).as("_partition")): _*)
        .withColumn("__newb",
          when(col("__keep"), Salt.bucket(col(keyName), nB)))
    }

    def affectedOf(df: DataFrame): Set[Int] =
      df.filter(col("__changed"))
        .select(explode(array(col("__oldb"), col("__newb"))).as("b"))
        .filter(col("b").isNotNull)
        .distinct().collect().map(_.getInt(0)).toSet
    def outOf(df: DataFrame, affected: Set[Int]): DataFrame =
      df.filter(col("__keep") && col("__newb").isInCollection(affected))
        .select(tgtAttrs.map(a => col(a.name)) ++ Seq(col("_offset"),
          col("_partition"), lit(false).as("_deleted"),
          col("__newb").as("_bucket")): _*)
    // inserts (incl. duplicate source keys) and key-reassigning updates
    // can put a new key into a bucket — those need the uniqueness guard
    // and the tombstone re-insert anti-join (see commitRewrite)
    val introducesKeys = inserts.nonEmpty || !updatesPreserveKey

    // plan REPEATABILITY across two evaluations (the affected-bucket probe
    // and the write): same bar as scan pruning — nondeterministic clause
    // conditions/assignments or a nondeterministic source force the
    // single-evaluation checkpoint path
    val deterministicPlan = srcDeterministic &&
      repeatableExpr(merge.mergeCondition) &&
      (matched ++ inserts ++ nmbs).forall(c =>
        c.cond.forall(repeatableExpr) && c.assigns.values.forall(repeatableExpr))

    if (scanBuckets.isEmpty && deterministicPlan) {
      // ---- UNPRUNED, repeatable statement: two-pass — an aggregate-only
      // probe over the full join finds the affected buckets, then the
      // write re-derives the merge, with the TARGET scan pruned to those
      // buckets WHEN that is provably sound. Cost: join evaluated twice,
      // but the table is never spooled to executor-local disk (the
      // checkpoint path writes the whole table once to local disk and
      // again to the table — 2x write; at 100 TB the 2x read is the
      // right trade).
      //
      // Pass-2 target-pruning soundness: every changed row's old AND new
      // bucket is in `affected`, so pruning only hides UNCHANGED matched
      // target rows — whose source partners then look unmatched in pass
      // 2 and can fire a spurious INSERT. That insert is harmless only
      // when its key provably equals the hidden match's key (the merge
      // condition pins the key and every insert uses it): the spurious
      // row then aims at the hidden row's UNaffected bucket and the
      // `__newb IN affected` filter in outOf drops it. With an insert
      // key unrelated to the match key, the spurious row could land
      // INSIDE an affected bucket — so those statements re-scan the full
      // target in pass 2 (still no checkpoint spool).
      val affected = affectedOf(mergedFrame(None))
      if (affected.isEmpty) return // every clause missed: a no-op
      val pass2Buckets =
        if (inserts.isEmpty || (srcKeyExpr.isDefined && insertsUseKey))
          Some(affected)
        else None
      val out = outOf(mergedFrame(pass2Buckets), affected)
      commitRewrite(spark, dir, pre, out, affected, keyName, nB, "sqlmerge",
        introducesKeys, newSchema)
    } else {
      // ---- pruned (cheap: only the source keys' buckets) or
      // nondeterministic: ONE materialization feeds the probe AND the
      // write, and freezes the nondeterministic row ids (CLAUDE.md:
      // checkpoint, not cache, so per-statement frames don't pin the
      // CacheManager). try/finally: the no-op return, a cardinality
      // violation and a commit conflict must all release the checkpoint.
      val merged = mergedFrame(scanBuckets).localCheckpoint()
      try {
        val affected = affectedOf(merged)
        if (affected.isEmpty) return // every clause missed: a no-op
        scanBuckets.foreach { sbs =>
          if (!affected.subsetOf(sbs)) sys.error(
            s"internal: pruning unsound — affected $affected ⊄ scanned $sbs")
        }
        commitRewrite(spark, dir, pre, outOf(merged, affected), affected,
          keyName, nB, "sqlmerge", introducesKeys, newSchema)
      } finally merged.unpersist()
    }
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
      tgtAttrs.map(t => byName.get(t.name) match {
        case Some(a) => Alias(a, t.name)(exprId = t.exprId)
        // WITH SCHEMA EVOLUTION: the column does not exist in the table
        // yet (it evolves atomically with the statement's commit) — every
        // stored row null-fills it, exactly as a post-ALTER read would
        case None => Alias(org.apache.spark.sql.catalyst.expressions
          .Literal(null, t.dataType), t.name)(exprId = t.exprId)
      }) ++
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
    *
    * `introducesKeys`: true for statements that can put a NEW key into a
    * bucket (MERGE inserts, key-reassigning UPDATE). Those — and only
    * those — need (a) the key-uniqueness guard: a per-key window over the
    * rewrite set (collisions are bucket-local by the layout invariant,
    * and `out` fully covers the affected buckets) fails the statement
    * BEFORE the commit if two live rows would share a key (the
    * one-live-row-per-key invariant every other operator assumes); and
    * (b) the tombstone re-insert anti-join — a statement that cannot mint
    * keys cannot collide with a tombstoned key (live and tombstoned key
    * sets are disjoint), so both steps are skipped entirely then.
    */
  private def commitRewrite(spark: SparkSession, dir: String,
      pre: IceLite.Metadata, out: DataFrame, affected: Set[Int],
      keyName: String, nB: Int, opName: String,
      introducesKeys: Boolean = false,
      newSchema: Option[IceLite.Schema] = None): Unit = {
    val guarded =
      if (!introducesKeys) out
      else {
        val dupMsg = s"$opName: two live rows would share key `$keyName` " +
          "after this statement (an INSERT or key reassignment collides " +
          "with an existing live key) — key uniqueness violation"
        val wk = Window.partitionBy(col(keyName))
        out.withColumn("__kc", count(lit(1)).over(wk))
          // filter (not a dropped projection — column pruning would erase
          // it): evaluated during the write, aborts before any commit
          .filter(when(col("__kc") > 1,
            assert_true(lit(false), lit(dupMsg)).isNotNull)
            .otherwise(lit(true)))
          .drop("__kc")
      }
    val tombs0 = IceLite.readInternal(spark, dir, Some(pre.version),
        Some(affected))
      .filter(col("_deleted"))
    // one cheap existence probe (bucket-pruned scan, pushed `_deleted`
    // filter) gates BOTH the tombstone union and the re-insert anti-join:
    // tombstones only ever come from CDC deletes, so most DML statements
    // touch buckets holding none — and the anti-join is expensive out of
    // proportion (it re-evaluates the statement's whole merge dataflow a
    // second time inside the write job to produce `out`'s key column)
    val haveTombs = graft.util.Phase("dml.tombstone-probe") {
      tombs0.select(col(keyName)).limit(1).count() > 0L
    }
    val withTombs =
      if (!haveTombs) guarded
      else {
        val tombs1 = (if (introducesKeys)
            tombs0.join(out.select(col(keyName)), Seq(keyName), "left_anti")
          else tombs0)
          .withColumn("_bucket", Salt.bucket(col(keyName), nB))
        // atomic evolution: tombstones were read under the pre-statement
        // schema — null-fill the statement's new columns, as any
        // post-evolution read of old files would
        val tombs = newSchema.fold(tombs1)(s =>
          s.fields.filterNot(f => tombs1.columns.contains(f.name))
            .foldLeft(tombs1)((df, f) =>
              df.withColumn(f.name, lit(null).cast(f.dataType))))
        guarded.unionByName(tombs.select(out.columns.map(col): _*))
      }
    // one file per rewritten bucket (not one per task per bucket): DML
    // statements must not crowd buckets into needing compaction
    val toWrite = withTombs.repartition(col("_bucket"))
    val epoch =
      s"$opName.${java.util.UUID.randomUUID().toString.substring(0, 13)}"
    val staged = IceLite.stageFiles(dir, epoch, toWrite, Some("_bucket"),
      newSchema.map(_.schemaId).getOrElse(pre.currentSchemaId))
    IceLite.commit(dir, epoch, opName, newFiles = staged,
      replacedBuckets = affected, baseVersion = Some(pre.version),
      newSchema = newSchema)
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

    val hit = coalesce(cc(cond), lit(false))
    def finalValue(j: Int): Column = {
      val old = cc(tgtAttrs(j))
      assigns.get(j).map(e =>
        when(hit, cc(e).cast(tgtAttrs(j).dataType)).otherwise(old))
        .getOrElse(old)
    }
    def markedFrame(buckets: Option[Set[Int]]): DataFrame =
      pinnedTarget(spark, dir, pre.version, tgtAttrs, buckets).select(
        tgtAttrs.indices.map(j => finalValue(j).as(tgtAttrs(j).name)) ++ Seq(
          hit.as("__hit"), Salt.bucket(cc(keyAttr), nB).as("__oldb"),
          col(oOff).as("_offset"), col(oPart).as("_partition")): _*)
        .withColumn("__newb", Salt.bucket(col(keyAttr.name), nB))
    def affectedOf(df: DataFrame): Set[Int] =
      df.filter(col("__hit"))
        .select(explode(array(col("__oldb"), col("__newb"))).as("b"))
        .filter(col("b").isNotNull)
        .distinct().collect().map(_.getInt(0)).toSet
    def outOf(df: DataFrame, affected: Set[Int]): DataFrame =
      df.filter(col("__newb").isInCollection(affected))
        .select(tgtAttrs.map(a => col(a.name)) ++ Seq(col("_offset"),
          col("_partition"), lit(false).as("_deleted"),
          col("__newb").as("_bucket")): _*)

    // repeatability bar for the two-evaluation path: the WHERE and (when
    // the key moves) the key assignment must be deterministic — other
    // assignment values are only ever evaluated once, in the write pass
    val repeatable = repeatableExpr(cond) &&
      (!keyReassigned || assigns.get(0).forall(repeatableExpr))
    if (scanBuckets.isEmpty && repeatable) {
      // unpruned full-table statement: aggregate-only probe, then the
      // write re-scans ONLY the affected buckets — the table is read
      // twice, never spooled to executor-local checkpoint disk (hit rows'
      // old and new buckets are both in `affected`, so the restricted
      // scan covers every row the rewrite needs)
      val affected = affectedOf(markedFrame(None))
      if (affected.isEmpty) return
      commitRewrite(spark, dir, pre,
        outOf(markedFrame(Some(affected)), affected), affected,
        keyAttr.name, nB, "sqlupdate", introducesKeys = keyReassigned)
    } else {
      val marked = markedFrame(scanBuckets)
        .localCheckpoint() // freeze: one evaluation feeds probe AND write
      try {
        val affected = affectedOf(marked)
        if (affected.isEmpty) return
        commitRewrite(spark, dir, pre, outOf(marked, affected), affected,
          keyAttr.name, nB, "sqlupdate", introducesKeys = keyReassigned)
      } finally marked.unpersist()
    }
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

    def markedFrame(buckets: Option[Set[Int]]): DataFrame =
      pinnedTarget(spark, dir, pre.version, tgtAttrs, buckets)
        .select(tgtAttrs.map(a => cc(a).as(a.name)) ++ Seq(
          coalesce(cc(delete.condition), lit(false)).as("__hit"),
          Salt.bucket(cc(keyAttr), nB).as("__b"),
          col(oOff).as("_offset"), col(oPart).as("_partition")): _*)
    def affectedOf(df: DataFrame): Set[Int] =
      df.filter(col("__hit"))
        .select(col("__b")).distinct().collect().map(_.getInt(0)).toSet
    def outOf(df: DataFrame, affected: Set[Int]): DataFrame =
      df.filter(!col("__hit") && col("__b").isInCollection(affected))
        .select(tgtAttrs.map(a => col(a.name)) ++ Seq(col("_offset"),
          col("_partition"), lit(false).as("_deleted"),
          col("__b").as("_bucket")): _*)

    if (scanBuckets.isEmpty && repeatableExpr(delete.condition)) {
      // unpruned full-table statement: aggregate-only probe, then the
      // write re-scans only the affected buckets (no checkpoint spool)
      val affected = affectedOf(markedFrame(None))
      if (affected.isEmpty) return
      commitRewrite(spark, dir, pre,
        outOf(markedFrame(Some(affected)), affected), affected,
        keyAttr.name, nB, "sqldelete")
    } else {
      val marked = markedFrame(scanBuckets)
        .localCheckpoint() // freeze: one evaluation feeds probe AND write
      try {
        val affected = affectedOf(marked)
        if (affected.isEmpty) return
        commitRewrite(spark, dir, pre, outOf(marked, affected), affected,
          keyAttr.name, nB, "sqldelete")
      } finally marked.unpersist()
    }
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

/** Resolution rule for `MERGE ... WITH SCHEMA EVOLUTION` over an icelite
  * target: widen the analyzed target with the SOURCE's new columns (as
  * null-literal aliases appended in source order) so assignments and star
  * expansions referencing them RESOLVE — Spark's own evolution resolution
  * only covers v2 relations, and without the widening `tg.newcol = ...`
  * dies with UNRESOLVED_COLUMN before any post-hoc rule runs.
  *
  * New columns are derived from the source SCHEMA, Delta-like: star
  * actions (`UPDATE SET *` / `INSERT *`) pull in EVERY source column the
  * target lacks; explicit assignments pull in only the assigned names
  * that exist in the source — an assignment to a name in neither target
  * nor source still fails resolution with the standard clear error, and
  * unreferenced source columns never pollute the table. The widening is
  * pure plan surgery — the TABLE evolves at execution time
  * (SqlMerge.execute applies one metadata-only ALTER per missing column
  * through the same interpreter the CDC ALTER path uses), so EXPLAIN
  * never mutates state. Idempotent under the analyzer's fixpoint: once
  * widened, no wanted column is missing.
  */
class SqlMergeEvolutionRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.withSchemaEvolution &&
        m.sourceTable.resolved && m.targetTable.resolved &&
        SqlMerge.iceTarget(m.targetTable).isDefined =>
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.catalyst.plans.logical.{InsertStarAction, UpdateStarAction}
      val tgtOut = m.targetTable.output
      val actions = m.matchedActions ++ m.notMatchedActions ++
        m.notMatchedBySourceActions
      val hasStar = actions.exists {
        case _: UpdateStarAction | _: InsertStarAction => true
        case _ => false
      }
      val assignedNames: Seq[String] = actions.flatMap {
        case u: UpdateAction => u.assignments.map(_.key)
        case i: InsertAction => i.assignments.map(_.key)
        case _ => Nil
      }.collect { case ua: UnresolvedAttribute => ua.nameParts.last }
      val missing = m.sourceTable.output.filterNot(s =>
        tgtOut.exists(t => conf.resolver(t.name, s.name)))
      val newCols =
        if (hasStar) missing
        else missing.filter(s =>
          assignedNames.exists(conf.resolver(_, s.name)))
      if (newCols.isEmpty) m
      else {
        def widen(p: LogicalPlan): LogicalPlan = Project(
          p.output ++ newCols.map(s => Alias(
            org.apache.spark.sql.catalyst.expressions.Literal(null,
              s.dataType), s.name)()),
          p)
        // widen INSIDE the target's alias, so `tg.newcol` references
        // resolve with their qualifier (SubqueryAlias re-qualifies its
        // child's output)
        val widened = m.targetTable match {
          case SubqueryAlias(id, child) => SubqueryAlias(id, widen(child))
          case other => widen(other)
        }
        m.copy(targetTable = widened)
      }
    case other => other
  }
}

/** Post-hoc resolution rule: resolved MERGE / UPDATE / DELETE over an
  * icelite v1 relation → the matching command. Anything else is left for
  * Spark to handle (or reject) as usual.
  */
class SqlDmlRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable
        if m.resolved && SqlMerge.iceTarget(m.targetTable).isDefined =>
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
