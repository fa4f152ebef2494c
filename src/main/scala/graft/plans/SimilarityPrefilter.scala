package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.{IndelRatio, TokenSortRatio}

/** Optimizer rule: derive a cheap length-difference guard for similarity
  * thresholds.
  *
  * For the Indel ratio, `dist ≥ | |a| − |b| |` always, so
  * `ratio = 100·(1 − dist/(|a|+|b|)) ≥ T` implies
  * `| |a|−|b| | ≤ (1 − T/100)·(|a|+|b|)`. The rule rewrites
  *
  * {{{ Filter(token_sort_ratio(a,b) >= T && rest, child) }}}
  *
  * into
  *
  * {{{ Filter(lengthGuard && token_sort_ratio(a,b) >= T && rest, child) }}}
  *
  * using the kernel's normalized lengths (whitespace runs collapsed —
  * token sorting itself is length-preserving), so the guard is exact: it
  * only rejects pairs the kernel would reject. In a blocked fuzzy join
  * this short-circuits the O(|a|·|b|) DP kernel for wildly
  * different-length pairs at the cost of two length() calls — the classic
  * length filter of the similarity-join literature (Ed-Join family),
  * expressed as a Catalyst rewrite so every thresholded query gets it for
  * free. Idempotent: a guard is added only if a semantically-equal
  * conjunct is not already present.
  */
object SimilarityPrefilter extends Rule[LogicalPlan] {

  /** Normalized length as double; PRE-FOLDED for literal inputs so the
    * generated guard is structurally stable under ConstantFolding (the
    * idempotency check below compares against already-optimized
    * conjuncts). */
  private def normalizedLen(e: Expression): Expression = {
    val len = Cast(
      Length(RegExpReplace(StringTrim(e), Literal("\\s+"), Literal(" "))),
      DoubleType)
    if (e.foldable) Literal(len.eval(null), DoubleType) else len
  }

  private def guardFor(a: Expression, b: Expression, t: Double): Expression = {
    val la = normalizedLen(a)
    val lb = normalizedLen(b)
    // |la - lb| <= (1 - t/100) * (la + lb)
    LessThanOrEqual(Abs(Subtract(la, lb)),
      Multiply(Literal(1.0 - t / 100.0), Add(la, lb)))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def simArgs(e: Expression): Option[(Expression, Expression, Double)] =
    e match {
      case GreaterThanOrEqual(TokenSortRatio(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
      case GreaterThanOrEqual(IndelRatio(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
      case GreaterThan(TokenSortRatio(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
      case GreaterThan(IndelRatio(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val cs = conjuncts(cond)
      val guards = cs.flatMap(simArgs).collect {
        // both-literal guards would fold to a constant and regenerate
        // forever; they are also useless — skip them
        case (a, b, t) if t > 0.0 && !(a.foldable && b.foldable) =>
          guardFor(a, b, t)
      }.filterNot(g => cs.exists(_.semanticEquals(g)))
      if (guards.isEmpty) f
      else Filter((guards ++ cs).reduceLeft(And), child)
  }
}
