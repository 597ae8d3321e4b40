package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional scan pruning.
  *
  * At 100 TB the dominant cost of a selective query is the scan, and the
  * scan is only cheap if parquet row-group/file min-max stats can prune
  * it. A layout sorted on ONE column gives tight stats on that column and
  * useless stats on every other; interleaving the bits of several
  * bucketized columns (the classic Z-order curve, as used by Delta/Iceberg
  * OPTIMIZE ZORDER) clusters rows so that EVERY interleaved column has
  * tight per-file ranges — a box predicate on any subset of the dimensions
  * prunes most files. This is pure layout: no data changes, no index
  * structure, nothing to maintain at read time — the existing pushed-down
  * filters do the pruning (build-prompt custom-operator case (a): composed
  * from existing ops; the interleave is a fold of shift/mask Columns that
  * stays inside WholeStageCodegen).
  *
  * Usage: `ZOrder.zorder(df, Seq("user_id", "ts"), bits = 12)` → write.
  * The rewrite is one range shuffle (`repartitionByRange` on the z-value,
  * the same cost as any global sort) and scales linearly; ranges come from
  * one bounded 2×d-value aggregate.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `cols` (non-negative integral
    * Columns, already bucketized to [0, 2^bits)): bit i of column j lands
    * at position `i * d + j` of the z-value. `bits * cols.size` must fit
    * in 62 bits. Composed from shift/mask/or primitives — codegen-friendly,
    * and the same arithmetic is expressible in ANSI SQL for the oracle.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits=$bits × ${cols.size} dims must fit in 62 bits")
    val d = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * d + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Equi-width bucketization of a long Column onto [0, 2^bits):
    * `floor((v - lo) * (2^bits - 1) / (hi - lo))`, clamped. The numerator
    * stays integral; the division result is exact as long as
    * `(hi - lo) * (2^bits - 1) < 2^53` (double division of exact integers
    * in that range cannot cross an integer boundary — quotient gaps are
    * ≥ 1/span while rounding error is < 1 ulp of a ≤ 2^bits value), so an
    * oracle engine's integer `//` division reproduces it bit-for-bit.
    */
  def bucketize(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    // a domain wider than Long range overflows hi-lo to a NEGATIVE span,
    // which would silently pass the exactness guard below and interleave
    // garbage — fail loudly; pre-scale such columns (e.g. >> 16) first
    require(hi >= lo, s"bucketize: hi $hi < lo $lo")
    require(hi - lo >= 0,
      s"bucketize: domain [$lo, $hi] wider than Long range — pre-scale the column")
    val span = math.max(1L, hi - lo)
    val maxB = (1L << bits) - 1
    require(span <= (1L << 53) / math.max(1L, maxB),
      s"bucketize: span $span × $maxB exceeds the exact-division bound; " +
        "use fewer bits or pre-scale the column")
    val clamped = least(lit(hi), greatest(lit(lo), c.cast("long")))
    // greatest/least SKIP nulls (a null input would silently land in
    // bucket 0) — propagate null instead: a row without a value has no
    // cell on this dimension
    when(c.isNull, lit(null).cast("long"))
      .otherwise(
        floor((clamped - lit(lo)) * lit(maxB) / lit(span.toDouble)).cast("long"))
  }

  /** Rewrite `df` into z-order on `cols` (numeric/timestamp-free long
    * domains — pass e.g. millis for time): per-column [min, max] comes
    * from ONE aggregate, each column bucketizes to `bits` bits, the
    * interleaved z-value drives a range repartition into `numPartitions`
    * output slices plus an intra-partition sort. Write the result as-is;
    * downstream is ordinary pruned parquet scanning.
    */
  def zorder(df: DataFrame, cols: Seq[String], bits: Int = 12,
             numPartitions: Int = 0): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("long")).as(s"_lo_$c"),
                                     max(col(c).cast("long")).as(s"_hi_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val bucketized = cols.zipWithIndex.map { case (c, i) =>
      // empty input (null aggregates): degenerate single bucket
      val (lo, hi) =
        if (r.isNullAt(2 * i)) (0L, 0L)
        else (r.getLong(2 * i), r.getLong(2 * i + 1))
      bucketize(col(c), lo, hi, bits)
    }
    val z = df.withColumn("_z", zValue(bucketized, bits))
    val parts = if (numPartitions > 0) numPartitions
                else df.sparkSession.sessionState.conf.numShufflePartitions
    z.repartitionByRange(parts, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
