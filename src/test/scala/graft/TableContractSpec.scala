package graft

import graft.schema.TableContract
import org.apache.spark.sql.functions._

/** The round-7 lesson: a silent driver-side testdata regeneration must
  * fail loudly at the table read, naming the drifted column — not deep in
  * an expression tree at analysis time.
  */
class TableContractSpec extends SparkSpec {
  import spark.implicits._

  test("current testdata passes the contract for all three tables") {
    Seq("events", "documents", "embeddings").foreach { t =>
      val df = sf(t)
      assert(TableContract.check(t, df) eq df)
    }
  }

  test("both historical ts encodings are accepted") {
    // nanos-long shape (rounds 1-6)
    val longTs = sf("events").withColumn("ts", lit(1700000000000000000L))
    TableContract.check("events", longTs)
    // native timestamp shape (round 7+)
    val tsTs = sf("events").withColumn("ts", lit(0L).cast("timestamp"))
    TableContract.check("events", tsTs)
  }

  test("a drifted column type fails, naming table/column/expected/found") {
    val drifted = sf("events").withColumn("ts", $"ts".cast("string"))
    val e = intercept[IllegalStateException] {
      TableContract.check("events", drifted)
    }
    assert(e.getMessage.contains("'events'"))
    assert(e.getMessage.contains("ts: found string"))
    assert(e.getMessage.contains("timestamp"))
  }

  test("a missing column fails, naming it") {
    val e = intercept[IllegalStateException] {
      TableContract.check("documents", sf("documents").drop("lang"))
    }
    assert(e.getMessage.contains("lang: MISSING"))
  }

  test("tables without a contract are passed through untouched") {
    val r = sf("region").withColumn("extra", lit(1))
    assert(TableContract.check("region", r) eq r)
  }

  test("SparkEntry ts helpers dispatch on both encodings") {
    val nanos = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    val millisFromLong = nanos.select(SparkEntry.tsMillis(nanos).as("ms"))
      .as[Long].head()
    assert(millisFromLong == 1700000000123L)

    val tsDf = Seq((1L, new java.sql.Timestamp(1700000000123L)))
      .toDF("event_id", "ts")
    val millisFromTs = tsDf.select(SparkEntry.tsMillis(tsDf).as("ms"))
      .as[Long].head()
    assert(millisFromTs == 1700000000123L)

    val microsFromLong = nanos.select(
        unix_micros(SparkEntry.tsTimestamp(nanos)).as("us")).as[Long].head()
    assert(microsFromLong == 1700000000123456L)
    val microsFromTs = tsDf.select(
        unix_micros(SparkEntry.tsTimestamp(tsDf)).as("us")).as[Long].head()
    assert(microsFromTs == 1700000000123000L)
  }

  test("ts helpers FLOOR pre-1970 values on both encodings") {
    // -1_500_001_234 ns = -1500.001234 ms: floor = -1501, trunc = -1500.
    // The TimestampType branch floors via unix_millis (Math.floorDiv);
    // the legacy nanos-long branch must floor identically — a bare `div`
    // truncates and diverges from the oracle's floor replay by 1 ms on
    // every pre-1970 value off an exact millisecond multiple (the XL
    // seed-17 bug class, on the other encoding).
    val nanos = Seq((1L, -1500001234L)).toDF("event_id", "ts")
    assert(nanos.select(SparkEntry.tsMillis(nanos).as("ms"))
      .as[Long].head() == -1501L)
    assert(nanos.select(
        unix_micros(SparkEntry.tsTimestamp(nanos)).as("us"))
      .as[Long].head() == -1500002L) // floor(-1500001.234 us)

    val tsDf = Seq((1L, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(-2, 499998000L)))) // -1500002 µs
      .toDF("event_id", "ts")
    assert(tsDf.select(SparkEntry.tsMillis(tsDf).as("ms"))
      .as[Long].head() == -1501L) // floor(-1500.002 ms)
  }
}
