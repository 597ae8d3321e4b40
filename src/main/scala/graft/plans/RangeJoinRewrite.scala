package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, TimestampNTZType, TimestampType}

/** Catalyst optimizer rule: rewrite a point-in-interval (range) join into a
  * bucketed equi-join.
  *
  * Spark plans a bare `p >= lo AND p < hi` inner join as a
  * broadcast-nested-loop / cartesian product — O(|points|·|intervals|),
  * the classic 100 TB killer for banding/binning queries. This rule
  * detects that shape and rewrites it into the scalable formulation that
  * `graft.operators.RangeJoin.rangeJoin` provides manually: intervals are
  * exploded onto the fixed-width buckets they cover, each point owns
  * exactly one bucket, and the join becomes a shuffled equi-join on the
  * bucket id with the original range predicate kept as the join residual.
  * Each qualifying (point, interval) pair surfaces exactly once because
  * the point's bucket is unique, so no dedup pass is needed and inner-join
  * multiplicity is preserved.
  *
  * Opt-in: set `spark.graft.rangeJoin.bucketWidth` to a positive width
  * (in point-domain units, ideally near the typical interval length —
  * wider buckets shrink the interval explode factor, narrower buckets
  * shrink the per-bucket candidate count). Unset/zero disables the rule
  * entirely. The rewrite fires only on INNER joins whose condition
  * contains a lower and an upper bound on the same numeric expression,
  * with the point expression referencing one side only and both bounds
  * referencing only the other side; any extra conjuncts (e.g. additional
  * equality keys) ride along unchanged in the preserved original
  * condition. Null bounds/points drop on both formulations (inner-join
  * comparison semantics), and intervals with `lo > hi` (unsatisfiable,
  * and the one case where the bucket `sequence` would run descending) are
  * filtered before the explode.
  *
  * Register at session build via `GraftExtensions`
  * (`injectOptimizerRule`) or on a live session through
  * `spark.experimental.extraOptimizations`
  * (`GraftExtensions.register`).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"
  private val BucketPrefix = "_graft_rj_"

  /** One normalized comparison conjunct: `small (< | <=) large`. */
  private final case class Cmp(small: Expression, large: Expression,
                               strict: Boolean)

  private def normalize(e: Expression): Option[Cmp] = e match {
    case LessThan(a, b)           => Some(Cmp(a, b, strict = true))
    case LessThanOrEqual(a, b)    => Some(Cmp(a, b, strict = false))
    case GreaterThan(a, b)        => Some(Cmp(b, a, strict = true))
    case GreaterThanOrEqual(a, b) => Some(Cmp(b, a, strict = false))
    case _                        => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Bucketable domains: numerics, plus timestamps (cast to double =
    * epoch seconds, so `bucketWidth` is in seconds for time joins — the
    * most common real range-join shape).
    */
  private def bucketable(e: Expression): Boolean = e.dataType match {
    case _: NumericType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = SQLConf.get.getConfString(WidthConf, "0").toDouble
    if (width <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _)
          if !j.output.exists(_.name.startsWith(BucketPrefix)) =>
        rewrite(j, left, right, cond, width).getOrElse(j)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, width: Double): Option[LogicalPlan] = {
    val cmps = conjuncts(cond).flatMap(normalize)
    // A range pair is (lo ≤ p) and (p ≤ hi) sharing the point expression,
    // with p's references confined to one join side and lo/hi to the other.
    val pair = (for {
      lower <- cmps.iterator
      upper <- cmps.iterator
      if lower.large.semanticEquals(upper.small)
      p = lower.large; lo = lower.small; hi = upper.large
      if bucketable(p) && bucketable(lo) && bucketable(hi)
      if p.references.nonEmpty && lo.references.nonEmpty && hi.references.nonEmpty
      pointsLeft <-
        if (p.references.subsetOf(left.outputSet) &&
            (lo.references ++ hi.references).subsetOf(right.outputSet))
          Iterator(true)
        else if (p.references.subsetOf(right.outputSet) &&
                 (lo.references ++ hi.references).subsetOf(left.outputSet))
          Iterator(false)
        else Iterator.empty
    } yield (p, lo, hi, lower.strict || upper.strict, pointsLeft)).nextOption()

    pair.map { case (p, lo, hi, anyStrict, pointsLeft) =>
      val tz = Some(SQLConf.get.sessionLocalTimeZone)
      def bucket(e: Expression): Expression = {
        // NTZ has no direct numeric cast: go through TimestampType with
        // the session tz on BOTH sides (monotone, so bucketing is sound)
        val num = e.dataType match {
          case TimestampNTZType => Cast(Cast(e, TimestampType, tz), DoubleType)
          case _                => Cast(e, DoubleType) // timestamp = epoch secs
        }
        Floor(Divide(num, Literal(width))) // Floor(double) is LongType
      }
      val (pointChild, intervalChild) = if (pointsLeft) (left, right) else (right, left)

      val pBucket = Alias(bucket(p), s"${BucketPrefix}pb")()
      val pointSide = Project(pointChild.output :+ pBucket, pointChild)

      // lo > hi is unsatisfiable under either strictness and is the one
      // shape where sequence() would run descending — drop before explode.
      val satisfiable =
        if (anyStrict) LessThan(lo, hi) else LessThanOrEqual(lo, hi)
      // Sequence is TimeZoneAwareExpression: tz must be set for it to stay
      // resolved, even over a pure-numeric domain.
      val seq = Sequence(bucket(lo), bucket(hi), None,
        Some(SQLConf.get.sessionLocalTimeZone))
      val elem = Explode(seq).elementSchema.head
      val iBucket =
        AttributeReference(s"${BucketPrefix}ib", LongType, elem.nullable)()
      val intervalSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(iBucket),
        child = Filter(satisfiable, intervalChild))

      // Keep the FULL original condition: the equi-key extractor picks up
      // the bucket equality (plus any original equality conjuncts) and the
      // range bounds become the join residual.
      val newCond = And(EqualTo(pBucket.toAttribute, iBucket), cond)
      val joined =
        if (pointsLeft) Join(pointSide, intervalSide, Inner, Some(newCond), j.hint)
        else Join(intervalSide, pointSide, Inner, Some(newCond), j.hint)
      Project(j.output, joined)
    }
  }
}
