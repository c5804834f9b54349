package graft

/** The driver contract's flagship smoke, kept green locally so the round
  * gate can never be surprised: entry() runs the full pipeline and yields
  * rows, and every oracle name refers to a declared query. */
class EntrySpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key is a declared query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
