package graft

/** Smoke + contract spec for the streaming throughput bench tier
  * (r14): every sink tier must move its rows, and the backlog
  * catch-up tier must show the maxVersionsPerTrigger PACING — a
  * 20-version backlog drained 5 versions per trigger is exactly 4
  * non-empty micro-batches, which is the property that bounds a
  * micro-batch's size when a stream restarts against a deep lake
  * history (unpaced, batch 0 would replay the whole table at once).
  */
class StreamBenchSpec extends SparkSpec {

  it("every sink tier sustains rows and backlog drains in 4 paced batches") {
    val tiers = StreamBench.run(spark, sf).map(t => t.name -> t).toMap
    tiers.keySet shouldBe Set("atomic_upsert", "merge", "ingest_index",
      "vector_index", "backlog_catchup")
    for ((name, t) <- tiers) {
      withClue(s"$name: ") {
        t.rows should be > 0L
        t.batches should be > 0
        t.sec should be > 0.0
      }
    }
    // the pacing contract: 20 committed versions / 5 per trigger
    tiers("backlog_catchup").batches shouldBe 4
    // and nothing was lost on the way through the source: the
    // backlog is 20 appends of the same <=5000-row events slice
    tiers("backlog_catchup").rows shouldBe
      20L * math.min(5000L, tiers("atomic_upsert").rows)
  }
}
