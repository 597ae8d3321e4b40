package graft.plans

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Attribute, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{NumericType, StringType}

/** Scoped activation marker for [[RangeJoinRewrite]]: a resolved no-op
  * node carrying the bucket width for the join(s) beneath (or beside) it.
  * Produced by [[ResolveRangeJoinHint]] from the user-facing hint and
  * consumed — always removed — by the optimizer rule, so it never reaches
  * physical planning.
  */
final case class RangeJoinHint(width: Double, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): RangeJoinHint =
    copy(child = newChild)
}

/** Analyzer rule (inject via `GraftExtensions` — session-construction
  * extensions; a live session's analyzer cannot be extended) that turns
  * the `RANGE_JOIN(<bucketWidth>)` hint into the [[RangeJoinHint]] marker:
  *
  *   - SQL: `SELECT ... FROM points JOIN bands ON p >= lo AND p < hi`
  *     with the hint comment `RANGE_JOIN(2600)` on the SELECT
  *   - DataFrame: `points.hint("range_join", 2600).join(bands, cond)`
  *
  * This is the PER-QUERY activation path — unlike the session-global
  * `spark.graft.rangeJoin.bucketWidth` conf, the hint scopes the rewrite
  * to exactly the annotated (sub)plan, so an unrelated inequality join
  * elsewhere in the session can never be misread as an interval join.
  * Width semantics match the conf: point-domain units (seconds on
  * timestamp domains), ideally near the typical interval length.
  */
object ResolveRangeJoinHint extends Rule[LogicalPlan] {

  val HintName = "RANGE_JOIN"

  private def widthOf(p: Any): Option[Double] = p match {
    case d: Double => Some(d)
    case f: Float  => Some(f.toDouble)
    case i: Int    => Some(i.toDouble)
    case l: Long   => Some(l.toDouble)
    case s: String => s.trim.toDoubleOption
    case Literal(v, _: NumericType) =>
      Option(v).flatMap(x => x.toString.toDoubleOption)
    case Literal(s, StringType) =>
      Option(s).flatMap(x => x.toString.trim.toDoubleOption)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case h @ UnresolvedHint(name, params, child)
          if name.toUpperCase(Locale.ROOT) == HintName =>
        if (!child.resolved) h // wait for the child; fixed point re-runs
        else params.map(widthOf) match {
          case Seq(Some(w)) if w > 0 => RangeJoinHint(w, child)
          case _ => throw new IllegalArgumentException(
            s"$HintName takes exactly one positive numeric bucket width " +
              s"(point-domain units; seconds for timestamps), got: $params")
        }
    }
}
