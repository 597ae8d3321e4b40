package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, TimestampNTZType, TimestampType}

/** Catalyst optimizer rule: rewrite a point-in-interval (range) join — or
  * an interval × interval overlap join — into a bucketed equi-join.
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
  * When no point-in-interval pair matches, the rule looks for the SQL
  * overlap idiom `lLo < rHi AND rLo < lHi` (any operand order or
  * strictness) and rewrites it as a double-explode bucketed equi-join
  * with first-shared-bucket pair ownership — see [[rewriteOverlap]];
  * unlike `RangeJoin.overlapJoin`, the rewrite preserves raw predicate
  * semantics EXACTLY, including malformed `lo > hi` intervals. Note the
  * matcher is structural: ANY two opposing cross-side inequalities read
  * as an interval pair (which is semantically sound — the rewrite is
  * exactly the predicate's interval-intersection reading), so with the
  * conf set, an unrelated-inequality join whose implied "interval" spans
  * a huge value range stops at the `maxBandsPerRow` guard rather than
  * exploding.
  *
  * PREFERRED activation is per-query, via the `RANGE_JOIN(width)` hint
  * ([[ResolveRangeJoinHint]] → [[RangeJoinHint]] marker): SQL
  * `hint comment `RANGE_JOIN(2600)`) or `df.hint("range_join", 2600)` on a join
  * input — the rewrite then fires ONLY under the annotated (sub)plan and
  * the session conf stays unset. The conf remains for live sessions
  * whose analyzer cannot be extended; [[withBucketWidth]] scopes it
  * set-then-restore around a body.
  *
  * Register at session build via `GraftExtensions`
  * (`injectOptimizerRule` + `injectResolutionRule`) or on a live session
  * through `spark.experimental.extraOptimizations`
  * (`GraftExtensions.register` — optimizer rule + conf path only; the
  * hint needs the session-construction extensions).
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

  val MaxBandsConf = "spark.graft.rangeJoin.maxBandsPerRow"

  /** Scoped (set-then-restore) conf activation for live sessions that
    * cannot take the [[ResolveRangeJoinHint]] analyzer rule: the width is
    * set only around `body` and the PRIOR value is restored, so user code
    * never leaves the session-global conf dangling. NOTE: DataFrames are
    * lazy — the ACTION (collect/write) must run inside `body`, or it will
    * optimize after the width is restored. Prefer the `RANGE_JOIN(w)`
    * hint on extension-built sessions.
    */
  def withBucketWidth[T](spark: org.apache.spark.sql.SparkSession,
                         width: Double)(body: => T): T = {
    val prev = spark.conf.getOption(WidthConf)
    spark.conf.set(WidthConf, width.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(WidthConf, v)
      case None    => spark.conf.unset(WidthConf)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // malformed conf value = disabled, not a session-wide
    // NumberFormatException from inside every query's optimization
    val confWidth = SQLConf.get.getConfString(WidthConf, "0")
      .trim.toDoubleOption.getOrElse(0.0)
    val hinted = plan.collectFirst { case h: RangeJoinHint => h }.isDefined
    if (confWidth <= 0 && !hinted) return plan

    def tryRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                   cond: Expression, width: Double): Option[LogicalPlan] =
      if (width <= 0 ||
          j.output.exists(_.name.startsWith(BucketPrefix)) ||
          hasCrossSideEquality(left, right, cond)) None
      else rewrite(j, left, right, cond, width)
        .orElse(rewriteOverlap(j, left, right, cond, width))

    val transformed = plan.transformDown {
      // hint ABOVE the join (the SQL `/*+ RANGE_JOIN(w) */` placement):
      // rewrite the joins inside the marked subtree with the hint width
      case h: RangeJoinHint =>
        h.child.transformDown {
          case j @ Join(l, r, Inner, Some(cond), _) =>
            tryRewrite(j, l, r, cond, h.width).getOrElse(j)
        }
      // hint ON a join input (`df.hint("range_join", w).join(...)`), or
      // the session-conf path for unhinted joins
      case j @ Join(l0, r0, Inner, Some(cond), _) =>
        def unwrap(p: LogicalPlan): (LogicalPlan, Option[Double]) = p match {
          case RangeJoinHint(w, c) => (c, Some(w))
          case other               => (other, None)
        }
        val (l, wl) = unwrap(l0)
        val (r, wr) = unwrap(r0)
        val hintWidth = wl.orElse(wr)
        val jj =
          if (hintWidth.isDefined) j.copy(left = l, right = r) else j
        tryRewrite(jj, l, r, cond, hintWidth.getOrElse(confWidth))
          .getOrElse(jj)
    }
    // markers the matcher did not consume (no eligible join underneath)
    // must still vanish before physical planning
    transformed.transformUp { case h: RangeJoinHint => h.child }
  }

  /** A cross-side equality conjunct means Catalyst already plans a hash
    * join on it (the range predicate rides as the residual) — the bucket
    * rewrite would only add an explode for no planning benefit. This also
    * keeps the rule off `RangeJoin.rangeJoin`'s own output (its manual
    * `_bucket` equality is exactly such a conjunct).
    */
  private def hasCrossSideEquality(left: LogicalPlan, right: LogicalPlan,
                                   cond: Expression): Boolean =
    conjuncts(cond).exists {
      case EqualTo(a, b) =>
        (a.references.nonEmpty && b.references.nonEmpty) &&
          ((a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet)) ||
           (a.references.subsetOf(right.outputSet) &&
            b.references.subsetOf(left.outputSet)))
      case _ => false
    }

  /** `e` as a DoubleType expression. NTZ has no direct numeric cast: it
    * routes through TimestampType pinned to UTC — NOT the session tz,
    * whose DST gaps/overlaps would make the wall-clock→epoch map
    * non-monotone and silently drop pairs near transitions; UTC has no
    * DST, so NTZ order is preserved exactly. Both sides of a join use
    * the same map, and the raw predicate still evaluates in NTZ space.
    */
  private def asDouble(e: Expression): Expression = e.dataType match {
    case TimestampNTZType =>
      Cast(Cast(e, TimestampType, Some("UTC")), DoubleType)
    case _ => Cast(e, DoubleType)
  }

  /** Explode-width guard: a mismatched width (or a join the matcher read
    * as an interval that is really two unrelated columns) could explode
    * one row onto millions of buckets and OOM before Spark's own
    * sequence-length check fires. Filter shape `span <= max OR
    * raise_error(...)`: free for sane rows, and pathological rows fail
    * LOUDLY with the conf keys in the message instead of crashing the
    * executor.
    */
  private def bandGuard(start: Expression, stop: Expression): Expression = {
    val maxBands = SQLConf.get.getConfString(MaxBandsConf, "1048576")
      .trim.toLongOption.getOrElse(1048576L)
    val span = Subtract(stop, start)
    // null span (null bounds) passes: those rows drop at the explode /
    // the raw predicate, and must not trip the error
    If(Or(IsNull(span), LessThanOrEqual(span, Literal(maxBands))), Literal(true),
      Cast(RaiseError(Literal(
        s"range-join rewrite: an interval spans more than $maxBands buckets; " +
          s"raise $WidthConf (bucket width) or $MaxBandsConf, or unset " +
          s"$WidthConf to disable the rewrite for this query")),
        org.apache.spark.sql.types.BooleanType))
  }

  /** Bucket id of an already-double expression. Floor(double) is LongType. */
  private def bucketOf(d: Expression, width: Double): Expression =
    Floor(Divide(d, Literal(width)))

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
      def bucket(e: Expression): Expression = bucketOf(asDouble(e), width)
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
        child = Filter(And(satisfiable, bandGuard(bucket(lo), bucket(hi))),
          intervalChild))

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

  /** Interval × interval overlap: condition contains `lLo (<|<=) rHi` and
    * `rLo (<|<=) lHi` with lLo/lHi on one side and rLo/rHi on the other
    * (the SQL intersection idiom). Both sides explode onto
    * `sequence(bucket(lo), bucket(greatest(lo, hi)))` — the `greatest`
    * clamp keeps the sequence ascending for malformed `lo > hi` rows
    * WITHOUT changing semantics: such a row explodes onto the single
    * bucket(lo), and whenever the raw predicate accepts a (bad, well)
    * pair the well side's span provably contains that bucket
    * (`rLo < lHi < lLo < rHi` follows from the predicate), while
    * (bad, bad) pairs are unsatisfiable. Pair dedup is the
    * first-shared-bucket ownership rule: emit only at
    * `bucket(max(lLo, rLo))`, which any accepted pair covers exactly
    * once on both sides. The full original condition rides along as the
    * join residual, so extra conjuncts and strictness are preserved
    * verbatim.
    */
  private def rewriteOverlap(j: Join, left: LogicalPlan, right: LogicalPlan,
                             cond: Expression, width: Double): Option[LogicalPlan] = {
    val cmps = conjuncts(cond).flatMap(normalize).toIndexedSeq
    val found = (for {
      i1 <- cmps.indices.iterator
      i2 <- cmps.indices.iterator
      if i1 != i2
      c1 = cmps(i1); c2 = cmps(i2)
      if Seq(c1.small, c1.large, c2.small, c2.large)
        .forall(e => bucketable(e) && e.references.nonEmpty)
      // c1: lLo < rHi ; c2: rLo < lHi (both orientations covered because
      // the loop also visits (c2, c1))
      if c1.small.references.subsetOf(left.outputSet) &&
         c1.large.references.subsetOf(right.outputSet) &&
         c2.small.references.subsetOf(right.outputSet) &&
         c2.large.references.subsetOf(left.outputSet)
    } yield (c1.small, c2.large, c2.small, c1.large)).nextOption()

    found.map { case (lLo, lHi, rLo, rHi) =>
      val tzOpt = Some(SQLConf.get.sessionLocalTimeZone)
      def gen(child: LogicalPlan, lo: Expression, hi: Expression,
              name: String): (Generate, Attribute) = {
        val start = bucketOf(asDouble(lo), width)
        val stop = bucketOf(Greatest(Seq(asDouble(lo), asDouble(hi))), width)
        val seq = Sequence(start, stop, None, tzOpt)
        val elem = Explode(seq).elementSchema.head
        val attr = AttributeReference(name, LongType, elem.nullable)()
        (Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(attr),
          child = Filter(bandGuard(start, stop), child)), attr)
      }
      val (genL, bL) = gen(left, lLo, lHi, s"${BucketPrefix}lb")
      val (genR, bR) = gen(right, rLo, rHi, s"${BucketPrefix}rb")
      val ownership = EqualTo(bL,
        bucketOf(Greatest(Seq(asDouble(lLo), asDouble(rLo))), width))
      val newCond = And(EqualTo(bL, bR), And(cond, ownership))
      Project(j.output, Join(genL, genR, Inner, Some(newCond), j.hint))
    }
  }
}
