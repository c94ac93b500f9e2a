package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a pure interval (range) inner join into the
  * bucket-expansion equi-join — the automatic form of what q153 composes
  * by hand. Spark's native plan for `A ⋈ B ON p >= lo AND p < hi` with
  * two large sides is BroadcastNestedLoopJoin: O(|A|·|B|) comparisons
  * and a broadcast that dies at scale. With a bucket width W this rule
  * produces:
  *
  * {{{
  *   probe side:    bucket_p = p div W                      (scan-side)
  *   interval side: bucket_i = explode(sequence(lo div W, (hi-1) div W))
  *   join:          bucket_p = bucket_i AND p >= lo AND p < hi
  * }}}
  *
  * Soundness: trunc-division is monotone, so lo <= p < hi implies
  * lo div W <= p div W <= (hi-1) div W — every qualifying pair meets in
  * exactly one bucket (the probe's), and the original predicate rides
  * along as the join's post-condition, so no false positives and no
  * dedup pass. The rewritten join has an equality conjunct, so the rule
  * cannot match its own output (fixed point by construction).
  *
  * OPT-IN: fires only when `spark.graft.rangeJoin.bucketWidth` is set
  * to a positive integer (the width is workload knowledge — it should
  * be a small multiple of the typical interval length). Scope is
  * deliberately narrow: INNER join, condition is EXACTLY a lower and an
  * upper bound on one integral probe column against integral bounds
  * from the other side, all three plain attributes.
  *
  * Scoping convention (q163): because the conf governs every matching
  * join the owning session plans, callers set the width on a CLONED
  * session (`spark.newSession()` — isolated conf, shared context/data)
  * that plans only the target query, rather than set/restore on a
  * shared session where a concurrently planned join of the same shape
  * would silently pick up this workload's width.
  */
case class RangeJoinBucketing(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = spark.conf.getOption(WidthConf).map(_.toLong).getOrElse(0L)
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, w).getOrElse(j)
    }
  }

  private def integralAttr(e: Expression): Option[Attribute] = e match {
    case a: Attribute if a.dataType == LongType || a.dataType == IntegerType =>
      Some(a)
    case _ => None
  }

  private def tz: Option[String] =
    Some(spark.sessionState.conf.sessionLocalTimeZone)

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType, tz)

  /** (probe, bound, boundIsLower) for a normalized range conjunct. */
  private def rangeSide(c: Expression): Option[(Attribute, Attribute, Boolean)] =
    c match {
      case GreaterThanOrEqual(p, lo) =>
        for (pa <- integralAttr(p); la <- integralAttr(lo)) yield (pa, la, true)
      case LessThanOrEqual(lo, p) =>
        for (pa <- integralAttr(p); la <- integralAttr(lo)) yield (pa, la, true)
      case LessThan(p, hi) =>
        for (pa <- integralAttr(p); ha <- integralAttr(hi)) yield (pa, ha, false)
      case GreaterThan(hi, p) =>
        for (pa <- integralAttr(p); ha <- integralAttr(hi)) yield (pa, ha, false)
      case _ => None
    }

  private def rewrite(j: Join, cond: Expression, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.length != 2) return None
    (rangeSide(conjuncts(0)), rangeSide(conjuncts(1))) match {
      case (Some((p1, lo, true)), Some((p2, hi, false))) if p1.semanticEquals(p2) =>
        build(j, cond, w, p1, lo, hi)
      case (Some((p1, hi, false)), Some((p2, lo, true))) if p1.semanticEquals(p2) =>
        build(j, cond, w, p1, lo, hi)
      case _ => None
    }
  }

  private def build(j: Join, cond: Expression, w: Long,
      p: Attribute, lo: Attribute, hi: Attribute): Option[LogicalPlan] = {
    // probe on one child, BOTH bounds on the other — else not this shape
    val (probeChild, ivChild, probeIsLeft) =
      if (j.left.outputSet.contains(p) && j.right.outputSet.contains(lo)
        && j.right.outputSet.contains(hi)) (j.left, j.right, true)
      else if (j.right.outputSet.contains(p) && j.left.outputSet.contains(lo)
        && j.left.outputSet.contains(hi)) (j.right, j.left, false)
      else return None

    val width = Literal(w, LongType)
    val probeBucket = Alias(IntegralDivide(asLong(p), width), "graft_bucket_p")()
    val probePlan = Project(probeChild.output :+ probeBucket, probeChild)

    // TimeZoneAwareExpressions (Sequence, Cast) resolve only with a
    // timezone id attached — an optimizer-constructed plan never passes
    // through the analyzer's ResolveTimeZone
    val seq = Sequence(
      IntegralDivide(asLong(lo), width),
      IntegralDivide(Subtract(asLong(hi), Literal(1L, LongType)), width),
      None, tz)
    val ivBucket = AttributeReference("graft_bucket_i", LongType, nullable = false)()
    // empty intervals (hi <= lo) produce a descending sequence bound pair;
    // Sequence with default step would THROW, but such rows can't join
    // anyway — guard them out first (semantics unchanged: inner join)
    val nonEmpty = org.apache.spark.sql.catalyst.plans.logical.Filter(
      LessThan(asLong(lo), asLong(hi)), ivChild)
    val ivPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(ivBucket), nonEmpty)

    val bucketEq = EqualTo(probeBucket.toAttribute, ivBucket)
    val (l, r) = if (probeIsLeft) (probePlan, ivPlan) else (ivPlan, probePlan)
    val bucketed = Join(l, r, Inner, Some(And(bucketEq, cond)), j.hint)
    Some(Project(j.output, bucketed))
  }
}
