package graft

import graft.functions.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native expressions
  * as SQL functions, so the whole operator library is reachable from pure
  * SQL (`spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`).
  *
  * This is the reference's "custom sink/module registry" extension seam
  * (ServiceStarter.java:187-213) re-expressed the Spark way: session
  * extensions + function registry instead of a module enum.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Opt-in range-join rewrite: point-in-interval joins plan as bucketed
    // equi-joins, not BNLJ. Activated per-query by the RANGE_JOIN(width)
    // hint (resolution rule below), or session-wide by
    // spark.graft.rangeJoin.bucketWidth > 0.
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectResolutionRule(_ => graft.plans.ResolveRangeJoinHint)
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - 64-bit polynomial rolling hash"),
      (args: Seq[Expression]) => RollingHash(args.head)))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(str, n) - word n-gram shingles"),
      (args: Seq[Expression]) => WordShingles(args.head, intArg(args, 1))))
    ext.injectFunction((FunctionIdentifier("minhash60"),
      info("minhash60", "minhash60(array<string>, k) - minhash signature"),
      (args: Seq[Expression]) => MinHash60(args.head, intArg(args, 1))))
    ext.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(array<string>) - 60-bit simhash"),
      (args: Seq[Expression]) => SimHash60(args.head)))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<double>, array<double>) - cosine similarity"),
      (args: Seq[Expression]) => CosineSim(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("sorted_jaccard"),
      info("sorted_jaccard", "sorted_jaccard(array<long>, array<long>) - jaccard of sorted distinct arrays"),
      (args: Seq[Expression]) => SortedJaccard(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("hyperplane_bucket"),
      info("hyperplane_bucket", "hyperplane_bucket(array<double>, nPlanes) - sign-LSH bucket id"),
      (args: Seq[Expression]) => HyperplaneBucket(args.head, intArg(args, 1))))
  }

  private[graft] def intArg(args: Seq[Expression], i: Int): Int =
    args(i) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be an integer literal, got $other")
    }
}

object GraftExtensions {
  /** Register the same functions on an ALREADY-running session (the
    * extensions path only applies at session construction).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    // Live-session seam for the optimizer rule (the extensions path only
    // applies at session construction); idempotent, and a no-op unless
    // spark.graft.rangeJoin.bucketWidth is set positive.
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRewrite
    val reg = spark.sessionState.functionRegistry
    val ext = new GraftExtensions
    def temp(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    temp("rolling_hash", args => RollingHash(args.head))
    temp("word_shingles", args => WordShingles(args.head, ext.intArg(args, 1)))
    temp("minhash60", args => MinHash60(args.head, ext.intArg(args, 1)))
    temp("simhash60", args => SimHash60(args.head))
    temp("cosine_sim", args => CosineSim(args.head, args(1)))
    temp("sorted_jaccard", args => SortedJaccard(args.head, args(1)))
    temp("hyperplane_bucket", args => HyperplaneBucket(args.head, ext.intArg(args, 1)))
  }
}
