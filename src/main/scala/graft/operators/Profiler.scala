package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality pass a corpus gets before training:
  * per column, row/null/distinct counts and min/max. One aggregation job
  * per column (each a two-stage hash agg — map-side combined, safe at any
  * scale), unioned into a tidy (column, stats) frame. Values surface as
  * strings so heterogeneous columns stack; numeric columns keep their
  * natural ordering for min/max (computed before the cast).
  */
object Profiler {

  /** Profile `cols` (default: every top-level column). */
  def profile(df: DataFrame, cols: Seq[String] = Seq.empty): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    targets.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_present"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column"), col("n_rows"),
          (col("n_rows") - col("n_present")).as("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_.unionAll(_))
  }
}
