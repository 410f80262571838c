package graft

/** The driver's smoke check: `SparkEntry.entry` on sf0.001 must return
  * rows > 0 (it runs exactly this before grading a round). */
class EntrySmokeSpec extends SparkSpec {
  test("entry returns rows on sf0.001") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(r.fieldIndex("cnt")) > 0L))
  }
}
