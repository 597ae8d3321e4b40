package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("batch sessions: gap semantics and per-key rollup") {
    import spark.implicits._
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")),
      (1L, t("2024-01-01 10:10:00")), // same session (gap < 30m)
      (1L, t("2024-01-01 11:30:00")), // new session (gap 80m)
      (2L, t("2024-01-01 09:00:00"))) // single-event session
      .toDF("user_id", "ts")
    val s = Sessionize.sessions(ev, "user_id", "ts", "30 minutes")
      .orderBy($"user_id", $"session_start").collect()
    assert(s.length == 3)
    assert(s(0).getLong(0) == 1L && s(0).getLong(3) == 2L) // 2-event session
    assert(s(0).getAs[java.sql.Timestamp]("session_end") ==
      t("2024-01-01 10:40:00")) // last event + gap
    assert(s(1).getLong(3) == 1L && s(2).getLong(0) == 2L)

    val stats = Sessionize.sessionStats(
      Sessionize.sessions(ev, "user_id", "ts", "30 minutes"), "user_id")
      .orderBy($"user_id").collect()
    assert(stats(0).getLong(1) == 2 && stats(0).getLong(2) == 3 &&
      stats(0).getLong(3) == 2)
    assert(stats(1).getLong(1) == 1)
  }

  test("streaming sessions (append + watermark) equal the batch sessions") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("sess_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sess_ck").toString
    val schema = "user_id BIGINT, ts TIMESTAMP"

    def drop(name: String, rows: Seq[(Long, java.sql.Timestamp)]): Unit =
      rows.toDF("user_id", "ts").repartition(1)
        .write.mode("append").parquet(s"$inDir/staged_$name")
    // file-source streams read a single dir; stage then move files in
    def publish(name: String): Unit = {
      val fs = new org.apache.hadoop.fs.Path(inDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$inDir/staged_$name"))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (st, i) =>
          fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(s"$inDir/${name}_$i.parquet")); ()
        }
    }

    val b1 = Seq((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 09:00:00")))
    val b2 = Seq((1L, t("2024-01-01 10:10:00")), (1L, t("2024-01-01 11:30:00")))
    // sentinel far in the future: advances the watermark so every real
    // session closes and appends before the test reads the sink
    val sentinel = Seq((999L, t("2024-01-02 00:00:00")))

    drop("b1", b1); publish("b1")
    val stream = spark.readStream.schema(schema).parquet(inDir)
    val q = Sessionize.sessions(stream, "user_id", "ts", "30 minutes",
        watermark = Some("1 minute"))
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      drop("b2", b2); publish("b2")
      q.processAllAvailable()
      drop("fin", sentinel); publish("fin")
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sess_stream")
      .where($"user_id" =!= 999L)
      .orderBy($"user_id", $"session_start")
      .collect().map(_.toSeq).toSeq
    val batch = Sessionize.sessions((b1 ++ b2).toDF("user_id", "ts"),
        "user_id", "ts", "30 minutes")
      .orderBy($"user_id", $"session_start")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      s"streaming sessions diverged:\n$streamed\nvs batch:\n$batch")
    assert(batch.length == 3)
  }
}
