package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Max, Min}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampType}

object AsOfRewriteRule {
  /** Opt-in gate; the rule ships disabled like the range-join rewrite. */
  val EnabledKey = "spark.graft.asofRewrite.enabled"

  /** Install into `experimental.extraOptimizations`: the decorrelated
    * scalar-subquery shape this rule matches only EXISTS after
    * `RewriteSubquery`, which runs after the operator-optimization
    * fixpoint the extension-injected rules live in — same positioning
    * argument as [[RangeBinJoinRule.installLate]]. Idempotent per
    * session; GraftSession.configure calls it.
    */
  def installLate(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[AsOfRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfRewriteRule(spark)
  }
}

/** Automatic as-of rewrite — the optimizer-rule front door to the
  * native as-of operator ([[AsOfJoinPlan]]).
  *
  * A SQL user with no ASOF JOIN keyword writes the natural thing — a
  * correlated scalar subquery:
  *
  * {{{
  *   SELECT e.*, (SELECT max(o.o_orderdate) FROM orders o
  *                WHERE o.o_custkey = e.user_id
  *                  AND o.o_orderdate <= e.ts) AS asof_date
  *   FROM events e
  * }}}
  *
  * Catalyst decorrelates that into the canonical domain-join sandwich:
  *
  * {{{
  *   Project [l.*, max#M AS asof_date]
  *   +- Join LeftOuter ((dom#D <=> lt) AND (rk = lk))
  *      :- L
  *      +- Aggregate [dom#D, rk], [max(rt) AS max#M, dom#D, rk]
  *         +- Join Inner (rt <= dom#D)
  *            :- Aggregate [lt], [lt AS dom#D]   // DISTINCT left times
  *            +- R
  * }}}
  *
  * whose inner join is pure-theta — |distinct left times| × |R|
  * nested-loop comparisons, the same 100 TB non-starter the range-join
  * rule closes for interval predicates. But the VALUE this plan
  * computes per left row — the greatest right time at or before the
  * left time within the key — is exactly the backward as-of match
  * time (and `min`/`>=` is the forward one). So the whole sandwich
  * collapses into the native operator:
  *
  * {{{
  *   Project [l.*, rt' AS asof_date]   // rt' = R's time attr, nullable
  *   +- AsOfJoin [lk], [rk], lt, rt, backward
  * }}}
  *
  * — two co-partitioned sorted exchanges and one merge pass instead of
  * a quadratic domain join, with identical results: one row per left
  * row either way (the aggregate made (dom, keys) unique; the as-of
  * match is unique by construction), null keys/times yield NULL in
  * both forms (the theta comparison rejects nulls; the merge skips
  * them), and ties at the matched time are no tie at all because the
  * surfaced value IS the time.
  *
  * Eligibility (deliberately narrow): exactly the decorrelated shape
  * above — one `max`(`min`) over the SAME attribute the single
  * non-strict theta conjunct compares (a strict `<`/`>` is not
  * expressible as an inclusive as-of and is left alone), at least one
  * cross-side equi key, aggregate grouping exactly {domain} ∪ keys,
  * and a parent projection that references nothing else from the
  * subquery side (the domain/key passthrough attrs die with the
  * rewrite). Date columns ride through session-zone casts to
  * timestamp, both sides, mirroring the comparison the original plan
  * performed.
  */
case class AsOfRewriteRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {
  import AsOfRewriteRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").trim
        .equalsIgnoreCase("true")) plan
    else plan.transformUp {
      case p @ Project(_, _: Join) => rewrite(p).getOrElse(p)
    }
  }

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  /** Time expr in a type the as-of operator accepts, or None. */
  private def asTime(e: Expression): Option[Expression] = e.dataType match {
    case t if AsOfJoinNative.timeTypeOk(t) => Some(e)
    case DateType =>
      Some(Cast(e, TimestampType, Some(conf.sessionLocalTimeZone)))
    case _ => None
  }

  private def rewrite(p: Project): Option[LogicalPlan] = p.child match {
    case j @ Join(l,
        agg @ Aggregate(gExprs, aExprs,
          Join(domAgg: Aggregate, r, Inner, Some(theta), _), _),
        LeftOuter, Some(cond), _) =>

      // the domain side: DISTINCT of one left expression, one output
      if (domAgg.aggregateExpressions.length != 1 ||
          domAgg.groupingExpressions.length != 1) return None
      val domAttr = domAgg.output.head

      // the single non-strict theta conjunct against the domain attr,
      // time on the R side: rt <= dom (backward) / rt >= dom (forward)
      val (rtExpr, forward) = splitConjunctivePredicates(theta) match {
        case Seq(LessThanOrEqual(x, d: Attribute))
            if d.exprId == domAttr.exprId => (x, false)
        case Seq(GreaterThanOrEqual(d: Attribute, x))
            if d.exprId == domAttr.exprId => (x, false)
        case Seq(GreaterThanOrEqual(x, d: Attribute))
            if d.exprId == domAttr.exprId => (x, true)
        case Seq(LessThanOrEqual(d: Attribute, x))
            if d.exprId == domAttr.exprId => (x, true)
        case _ => return None
      }
      if (!rtExpr.references.subsetOf(r.outputSet)) return None
      val rtAttr = stripCast(rtExpr) match {
        case a: Attribute if r.outputSet.contains(a) => a
        case _ => return None
      }

      // the aggregate: exactly one agg function — max (backward) / min
      // (forward) of that same attribute — everything else passthrough
      val aggAliases = aExprs.flatMap(_.collect {
        case ae: AggregateExpression => ae
      })
      if (aggAliases.length != 1) return None
      val maxAlias = aExprs.collectFirst {
        case al @ Alias(AggregateExpression(f, _, false, None, _), _) =>
          (al, f)
      } match {
        case Some((al, f)) =>
          val ok = f match {
            case Max(c) if !forward => stripCast(c) == rtAttr
            case Min(c) if forward  => stripCast(c) == rtAttr
            case _ => false
          }
          if (!ok) return None
          al
        case None => return None
      }
      val maxAttr = maxAlias.toAttribute

      // grouping must be attributes: the domain plus the R-side keys
      val gAttrs = gExprs.map {
        case a: Attribute => a
        case _ => return None
      }
      if (!gAttrs.exists(_.exprId == domAttr.exprId)) return None
      val rKeysInGroup = gAttrs.filter(_.exprId != domAttr.exprId)
      if (!rKeysInGroup.forall(r.outputSet.contains)) return None

      // outer condition: (dom <=>/= lt) + equi keys, nothing else
      var ltAttrOpt: Option[Attribute] = None
      val keyPairs = scala.collection.mutable.ArrayBuffer
        .empty[(Attribute, Attribute)]
      def classify(a: Expression, b: Expression, nullSafe: Boolean): Boolean =
        (a, b) match {
          case (x: Attribute, y: Attribute)
              if x.exprId == domAttr.exprId && l.outputSet.contains(y) =>
            if (ltAttrOpt.isDefined) false else { ltAttrOpt = Some(y); true }
          case (x: Attribute, y: Attribute)
              if y.exprId == domAttr.exprId && l.outputSet.contains(x) =>
            if (ltAttrOpt.isDefined) false else { ltAttrOpt = Some(x); true }
          // key conjuncts must be plain equality: <=> would match
          // null-to-null keys, which the as-of merge (SQL-style) skips
          case (x: Attribute, y: Attribute) if !nullSafe &&
              rKeysInGroup.exists(_.exprId == x.exprId) &&
              l.outputSet.contains(y) =>
            keyPairs += ((y, x)); true
          case (x: Attribute, y: Attribute) if !nullSafe &&
              rKeysInGroup.exists(_.exprId == y.exprId) &&
              l.outputSet.contains(x) =>
            keyPairs += ((x, y)); true
          case _ => false
        }
      val allClassified = splitConjunctivePredicates(cond).forall {
        case EqualNullSafe(a, b) => classify(a, b, nullSafe = true)
        case EqualTo(a, b)       => classify(a, b, nullSafe = false)
        case _                   => false
      }
      if (!allClassified || ltAttrOpt.isEmpty || keyPairs.isEmpty) return None
      // every grouped key must be equated, or the aggregate's extra
      // grouping would have multiplied outer matches
      if (keyPairs.map(_._2.exprId).toSet !=
          rKeysInGroup.map(_.exprId).toSet) return None

      // the parent projection may use only L attrs and the aggregate
      // value — the domain/key passthroughs die with the rewrite
      val allowed = l.outputSet + maxAttr
      if (!p.projectList.forall(_.references.subsetOf(allowed))) return None

      val ltExpr = asTime(ltAttrOpt.get).getOrElse(return None)
      val rtTime = asTime(rtExpr).getOrElse(return None)
      if (ltExpr.dataType != rtTime.dataType) return None

      val node = AsOfJoinPlan(l, r,
        keyPairs.map(_._1).toSeq, keyPairs.map(_._2).toSeq,
        ltExpr, rtTime, forward, None)
      val rtPayload = node.output
        .find(_.exprId == rtAttr.exprId).getOrElse(return None)
      val newList = p.projectList.map {
        case a: AttributeReference if a.exprId == maxAttr.exprId =>
          Alias(rtPayload, a.name)(exprId = a.exprId)
        case ne => ne.transform {
          case a: Attribute if a.exprId == maxAttr.exprId => rtPayload
        }.asInstanceOf[NamedExpression]
      }
      logInfo(s"as-of rewrite fired: keys=${keyPairs.length} " +
        s"forward=$forward payload=${rtAttr.name}")
      Some(Project(newList, node))

    case _ => None
  }
}
