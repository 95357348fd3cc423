package graft

class QueriesSpec extends SparkSpecBase {

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with a stable schema") {
      val df = fn(spark, sf0001)
      val n = df.count()
      // empty is legal for selective predicates, but schema must be sane
      assert(df.columns.nonEmpty && df.columns.distinct.length == df.columns.length)
      // deterministic: running twice gives identical results
      val again = fn(spark, sf0001).collect()
      assert(df.collect().sameElements(again), s"$name not deterministic")
      assert(n >= 0)
    }
  }
}
