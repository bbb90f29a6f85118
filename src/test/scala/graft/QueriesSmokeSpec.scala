package graft

/** Every registered operator runs end-to-end on sf0.001 and returns a
  * sane shape. Exact value correctness is covered by the DuckDB oracle
  * gate (tools/compare_oracle.py / driver t2).
  */
class QueriesSmokeSpec extends SparkSpec {

  SparkEntry.allQueries.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val df = q.fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique (Map would silently drop duplicates)") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicate names: ${names.diff(names.distinct).mkString(", ")}")
  }

  test("oracle keys are a subset of query keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }
}
