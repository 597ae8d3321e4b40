package graft

/** Pins the streaming throughput bench harness itself: the replay must
  * drain every staged record through the real `IngestStream.start` pipeline
  * across multiple micro-batches and report a sane distribution — so the
  * driver-run bench entry can't silently rot.
  */
class StreamBenchSpec extends SparkSpec {

  test("replay drains all staged records over >=3 micro-batches") {
    val r = StreamBench.run(spark, "/root/testdata/sf0.001",
      chunks = 3, targetRecords = 1000)
    // sf0.001 events = 1000 rows, replication 1 → 1000 wire records
    assert(r.records === 1000L)
    // maxFilesPerTrigger=1 over 3 chunk files → at least 3 data batches
    assert(r.batches >= 3)
    assert(r.collections > 0, "schema inference must have registered collections")
    assert(r.busySec > 0 && r.recordsPerSecBusy > 0)
    assert(r.batchMsMax >= r.batchMsP95 && r.batchMsP95 >= r.batchMsP50)
    // at least one registry save happened (first batch evolves schemas)
    assert(r.registrySaveMs >= 0)
    val json = r.toJson
    assert(json.contains("\"records\":1000") && json.contains("\"batch_ms\""))
  }

  test("avro replay drains all staged tagged records through startAvro") {
    val r = StreamBench.runAvro(spark, "/root/testdata/sf0.001",
      chunks = 3, targetRecords = 1000)
    assert(r.records === 1000L)
    assert(r.batches >= 3)
    assert(r.collections > 0, "schema-fixed registry must hold the collections")
    assert(r.busySec > 0 && r.recordsPerSecBusy > 0)
  }

  test("evolution churn replay widens the registry every chunk") {
    // runEvolve's internal certificate requires every chunk's f<c> field
    // to have reached the registry — a throw here is the failure signal
    val r = StreamBench.runEvolve(spark, "/root/testdata/sf0.001",
      chunks = 3, targetRecords = 900, filesPerBatch = 2)
    assert(r.records === 900L)
    assert(r.batches >= 1 && r.busySec > 0)
    assert(r.collections > 0)
    val json = r.toJson
    assert(json.contains("\"registry_save_ms\""))
  }
}
