package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a filter `jaccard(a, b) >= t` (the canonical shape
  * emitted by graft.functions.TextFunctions.jaccard — size(array_intersect)
  * over the inclusion-exclusion union) implies the LOSSLESS size bounds
  *
  *   size(b) >= t * size(a)   and   size(a) >= t * size(b)
  *
  * (jaccard ≤ min|s|/max|s|, so above threshold the sizes are within a
  * factor t). The rule prepends those bounds so rows failing two O(1)
  * length probes never evaluate the O(|a|+|b|) intersection — on a
  * similarity self-join the intersection is the dominant per-row cost.
  * The rewrite never changes results; it only short-circuits.
  *
  * Registered via [[GraftExtensions]] (injectOptimizerRule), so it runs
  * inside the operator-optimization fixed point; the guard against
  * re-adding bounds keeps it idempotent there.
  */
object JaccardSizeBoundRule extends Rule[LogicalPlan] {

  /** Matches size(array_intersect(a, b)) cast to double, with or without
    * the `* 1.0` that the Column-API formula carries before constant
    * folding simplifies it. */
  private def interSize(e: Expression): Option[(Expression, Expression)] = e match {
    case Multiply(inner, Literal(1.0, DoubleType), _) => interSize(inner)
    case Multiply(Literal(1.0, DoubleType), inner, _) => interSize(inner)
    case Cast(Size(ArrayIntersect(a, b), _), DoubleType, _, _) => Some((a, b))
    case _ => None
  }

  /** Matches the full jaccard >= t comparison; yields (a, b, t). */
  private def jaccardGeq(e: Expression): Option[(Expression, Expression, Double)] = e match {
    case GreaterThanOrEqual(Divide(num, den, _), Literal(t: Double, DoubleType)) =>
      for {
        (a, b) <- interSize(num)
        _ <- den match {
          case Cast(Subtract(Add(Size(a2, _), Size(b2, _), _), Size(ArrayIntersect(a3, b3), _), _),
              DoubleType, _, _)
            if a.semanticEquals(a2) && a.semanticEquals(a3) &&
              b.semanticEquals(b2) && b.semanticEquals(b3) => Some(())
          case _ => None
        }
        if t > 0.0
      } yield (a, b, t)
    case _ => None
  }

  private def sizeBounds(a: Expression, b: Expression, t: Double): Seq[Expression] = Seq(
    GreaterThanOrEqual(Cast(Size(b), DoubleType),
      Multiply(Literal(t, DoubleType), Cast(Size(a), DoubleType))),
    GreaterThanOrEqual(Cast(Size(a), DoubleType),
      Multiply(Literal(t, DoubleType), Cast(Size(b), DoubleType))))

  /** The added bounds are IMPLIED by the jaccard conjunct, so conjoining
    * them leaves the predicate's truth table unchanged — safe in a Filter
    * and in ANY join type's condition (outer-join null-extension depends
    * only on the condition's truth value, which is identical). */
  private def augment(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjuncts(cond)
    val additions = conjuncts.flatMap(jaccardGeq).flatMap {
      case (a, b, t) => sizeBounds(a, b, t)
    }.filterNot(add => conjuncts.exists(_.semanticEquals(add)))
    if (additions.isEmpty) None else Some((additions :+ cond).reduce(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      augment(cond).map(Filter(_, child)).getOrElse(f)
    // PushDownPredicates merges a both-sides filter into the join condition
    // before this rule sees a Filter — the similarity self-join path lands
    // here, not in the Filter case.
    case j @ Join(_, _, _, Some(cond), _) =>
      augment(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
