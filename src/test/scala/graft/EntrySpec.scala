package graft

/** Integration smoke over the real testdata (fast: sf0.001). */
class EntrySpec extends SparkSpec {

  test("entry (flagship sessionization) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has runnable plan and every oracle key exists") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    // all queries run and return a schema on the smallest SF
    qs.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.nonEmpty, name)
    }
  }
}
