package graft.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, First}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StringType

/** Rewrites an EAV self-join chain into a single-pass pivot aggregate.
  *
  * The reference widens `wp_usermeta` by self-joining once per meta key
  * (reference: libs/export/authors.js:22-24 — `m1.meta_key='first_name'
  * AND m2.meta_key='last_name' AND ...` with `m1.user_id = m2.user_id`
  * join conditions). Users porting that SQL to the DataFrame API write
  * the same N-way self-join — which Spark executes as N scans of the
  * meta table and N-1 shuffled joins. The equivalent pivot
  * (`groupBy(entity).pivot(key).agg(first(value))`) is ONE scan and ONE
  * shuffle with map-side partial aggregation; at 100 TB the difference
  * is N-fold scan+shuffle volume.
  *
  * This rule performs that rewrite inside the optimizer, so the naive
  * join-chain gets the pivot plan automatically:
  *
  * {{{
  *   Join(e1 = e2, Inner)                 Project(original output attrs)
  *     Filter(key = 'k1', EAV)       =>     Filter(every key present)
  *     Filter(key = 'k2', EAV)                Aggregate(entity,
  *                                              first(value WHERE key=k_i)...,
  *                                              Filter(key IN (k1..kn), EAV))
  * }}}
  *
  * Equivalence requires each (entity, key) pair to be unique in the EAV
  * table — WordPress's meta-table contract, but not a property Spark can
  * verify from the data — so the rewrite is doubly opted into:
  * `spark.graft.eav.pivotJoinChains=true` enables the rule, and
  * `spark.graft.eav.entityColumn` must NAME the entity column (e.g.
  * `user_id`). The chain's link column is inferred structurally from the
  * join condition, and structure alone cannot distinguish the entity id
  * from any other column: a chain joined on `m1.meta_value =
  * m2.meta_value` matches the same pattern, but that join is
  * many-to-many (entities share values) while the pivot would collapse
  * to one arbitrary row per value. Requiring the name makes the opt-in
  * assert uniqueness of the column the user actually means. Inner-join
  * "drop entities missing any key" semantics are preserved by the
  * presence filter; output attribute ids are preserved (aliases reuse
  * the join's exprIds), so downstream operators resolve unchanged.
  */
object EavPivotRule extends Rule[LogicalPlan] {

  /** One `Filter(key = 'k', base)` arm of the self-join chain.
    *
    * @param exposed  the attributes this arm contributes to the join
    *                 output (post-Project, if any)
    * @param baseOrd  for each exposed attribute, its ordinal in the base
    *                 relation's output
    */
  private case class Arm(
      key: String,
      keyOrd: Int,
      relation: LogicalPlan,
      exposed: Seq[Attribute],
      baseOrd: Seq[Int])

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled =
      conf.getConfString("spark.graft.eav.pivotJoinChains", "false").toBoolean
    val entityName =
      conf.getConfString("spark.graft.eav.entityColumn", "").trim
    if (!enabled || entityName.isEmpty) {
      plan
    } else {
      plan.transform {
        case j @ Join(_, _, Inner, Some(_), _) =>
          rewrite(j, entityName).getOrElse(j)
      }
    }
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Same base table? Compared structurally (paths+schema for file scans,
    * schema+data for local relations) because each self-join arm is a
    * distinct plan instance with fresh exprIds. */
  private def sameBase(a: LogicalPlan, b: LogicalPlan): Boolean = (a, b) match {
    case (x: LogicalRelation, y: LogicalRelation) =>
      (x.relation, y.relation) match {
        case (hx: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
              hy: org.apache.spark.sql.execution.datasources.HadoopFsRelation) =>
          hx.location.rootPaths == hy.location.rootPaths &&
            hx.dataSchema == hy.dataSchema
        case (rx, ry) => rx == ry
      }
    case (x: LocalRelation, y: LocalRelation) =>
      x.schema == y.schema && x.data == y.data
    case _ => false
  }

  /** Parse one join arm: `[Project?] Filter(key = 'lit' [, IsNotNull...])`
    * over a scannable base. Any other predicate disqualifies the arm. */
  private def parseArm(p: LogicalPlan): Option[Arm] = {
    def overBase(rel: LogicalPlan): Boolean = rel match {
      case _: LogicalRelation | _: LocalRelation => true
      case _ => false
    }
    def fromFilter(cond: Expression, rel: LogicalPlan,
                   exposed: Seq[Attribute], ords: Seq[Int]): Option[Arm] = {
      val conjuncts = splitAnd(cond)
      val keyEq = conjuncts.collect {
        case EqualTo(a: AttributeReference, Literal(v, StringType))
            if rel.outputSet.contains(a) => (a, String.valueOf(v))
        case EqualTo(Literal(v, StringType), a: AttributeReference)
            if rel.outputSet.contains(a) => (a, String.valueOf(v))
      }
      val benign = conjuncts.forall {
        case _: IsNotNull => true
        case EqualTo(_: AttributeReference, Literal(_, StringType)) => true
        case EqualTo(Literal(_, StringType), _: AttributeReference) => true
        case _ => false
      }
      if (keyEq.size != 1 || !benign) None
      else {
        val (keyAttr, key) = keyEq.head
        if (ords.contains(-1)) None
        else Some(Arm(key, rel.output.indexWhere(_.exprId == keyAttr.exprId),
          rel, exposed, ords))
      }
    }
    // a projection may rename columns (`meta_value AS first_name`); track
    // each exposed attribute back to its base-relation ordinal
    def baseRef(e: NamedExpression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case Alias(a: AttributeReference, _) => Some(a)
      case _ => None
    }
    p match {
      case Filter(cond, rel) if overBase(rel) =>
        fromFilter(cond, rel, rel.output,
          rel.output.indices)
      case Project(ps, Filter(cond, rel))
          if overBase(rel) && ps.forall(baseRef(_).isDefined) =>
        fromFilter(cond, rel, ps.map(_.toAttribute),
          ps.map(e => rel.output.indexWhere(
            _.exprId == baseRef(e).get.exprId)))
      case _ => None
    }
  }

  /** Collect a left-deep chain of inner equi-joins over arms of the same
    * base. ColumnPruning inserts pure-attribute Projects between chained
    * joins (to drop the already-consumed entity aliases) — those are
    * transparent here; the rewrite's final Project restores exactly the
    * outermost output. Returns arms in join order plus the entity-column
    * ordinal. */
  private def collectChain(p: LogicalPlan): Option[(Seq[Arm], Int)] = p match {
    case Join(l, r, Inner, Some(cond), _) =>
      for {
        (leftArms, entOrdL) <- collectChain(l)
        rightArm <- parseArm(r)
        if sameBase(leftArms.head.relation, rightArm.relation)
        entOrd <- linkOrdinal(leftArms, rightArm, cond)
        if entOrdL < 0 || entOrd == entOrdL
      } yield (leftArms :+ rightArm, entOrd)
    case Project(ps, child: Join) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      collectChain(child)
    case other =>
      parseArm(other).map(a => (Seq(a), -1)) // ordinal fixed by first join
  }

  /** The join condition must be a single equality linking the new arm's
    * entity column to the same column of one earlier arm. Attributes are
    * resolved through each arm's exposed->base mapping, since the entity
    * column may be exposed under an alias (`user_id AS u2`). */
  private def linkOrdinal(left: Seq[Arm], right: Arm,
                          cond: Expression): Option[Int] = {
    splitAnd(cond) match {
      case Seq(EqualTo(a: AttributeReference, b: AttributeReference)) =>
        def ordIn(arm: Arm, at: AttributeReference): Int = {
          val i = arm.exposed.indexWhere(_.exprId == at.exprId)
          if (i < 0) -1 else arm.baseOrd(i)
        }
        val pairs = Seq((a, b), (b, a))
        pairs.flatMap { case (x, y) =>
          val ro = ordIn(right, y)
          val lo = left.map(arm => ordIn(arm, x)).find(_ >= 0)
          if (ro >= 0) lo.filter(_ == ro).map(_ => ro) else None
        }.headOption
      case _ => None
    }
  }

  private def rewrite(j: Join, entityName: String): Option[LogicalPlan] = {
    collectChain(j).flatMap { case (arms, entOrd) =>
      val keyOrds = arms.map(_.keyOrd).distinct
      if (arms.size < 2 || entOrd < 0 || keyOrds.size != 1 ||
          keyOrds.head == entOrd ||
          // the structurally-inferred link column must be the column the
          // user DECLARED unique — a chain joined on any other column
          // (e.g. meta_value) is many-to-many and must not pivot
          !conf.resolver(arms.head.relation.output(entOrd).name, entityName))
        None
      else {
        val keyOrd = keyOrds.head
        // fresh-id copy of the base so pivot aliases can reuse the join's
        // output exprIds without colliding with the scan's own attributes
        val base = arms.head.relation match {
          case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
          case other => other
        }
        val keyAttr = base.output(keyOrd)
        val entAttr = base.output(entOrd)
        val scanFilter = Filter(
          And(In(keyAttr, arms.map(a => Literal(a.key))), IsNotNull(entAttr)),
          base)

        def firstWhere(key: String, value: Expression): Expression =
          AggregateExpression(
            First(If(EqualTo(keyAttr, Literal(key)), value,
              Literal(null, value.dataType)), ignoreNulls = true),
            Complete, isDistinct = false)

        // per arm: every exposed column becomes a pivoted first(); the
        // entity column passes through the grouping key. ExprIds are the
        // originals, so parents above the join resolve untouched.
        val pivoted = arms.map { arm =>
          arm.exposed.lazyZip(arm.baseOrd).map { (orig, ord) =>
            if (ord == entOrd)
              Alias(entAttr, orig.name)(exprId = orig.exprId)
            else
              Alias(firstWhere(arm.key, base.output(ord)), orig.name)(
                exprId = orig.exprId)
          }
        }
        // presence columns drive the inner-join semantics: an entity
        // survives only if every key produced a row
        val presence = arms.zipWithIndex.map { case (arm, i) =>
          Alias(firstWhere(arm.key, keyAttr), s"__present_$i")()
        }
        val agg = Aggregate(Seq(entAttr), pivoted.flatten ++ presence, scanFilter)
        val present = presence
          .map(p => IsNotNull(p.toAttribute): Expression)
          .reduce(And(_, _))
        val byId = agg.aggregateExpressions.map(a => a.exprId -> a.toAttribute).toMap
        val outs = j.output.map(o => byId.get(o.exprId))
        if (outs.contains(None)) None // join output we failed to reconstruct
        else Some(Project(outs.flatten, Filter(present, agg)))
      }
    }
  }
}
