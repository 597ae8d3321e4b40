package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, reused). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions) // functions + range-join hint seam
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark
  def sf(name: String, dir: String = "/root/testdata/sf0.001") =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Deterministic streaming teardown: any query a test left running (or
    * still winding down after `stop()` returned from a timed-out
    * `awaitTermination`) would otherwise race the shared session's
    * end-of-JVM teardown — a MicroBatchExecution thread planning against a
    * torn-down session logs `[INTERNAL_ERROR] SparkPlan.session() is null`
    * noise that masks real failures. Suites run sequentially in the forked
    * test JVM, so stopping ALL active queries here can only touch queries
    * this suite started.
    */
  override def afterAll(): Unit = {
    try SparkSpec.spark.streams.active.foreach { q =>
      try { q.stop(); q.awaitTermination() }
      catch { case _: Throwable => () } // teardown must not fail the suite
    } finally super.afterAll()
  }
}
