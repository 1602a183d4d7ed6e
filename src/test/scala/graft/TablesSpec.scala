package graft

/** The per-session reader cache: memoization identity, isolation across
  * sessions, and explicit invalidation (the cache is a bounded LRU, not
  * weak-keyed — see the comment in Tables). */
class TablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("same (session, table) returns the memoized DataFrame instance") {
    val a = Tables.nation(spark, dir)
    val b = Tables.nation(spark, dir)
    assert(a eq b)
  }

  test("sessions do not share cache entries; invalidate forces a re-read") {
    val s2 = spark.newSession()
    val a = Tables.nation(spark, dir)
    val other = Tables.nation(s2, dir)
    assert(!(a eq other))
    Tables.invalidate(spark)
    val c = Tables.nation(spark, dir)
    assert(!(a eq c))            // fresh reader after invalidation
    assert(Tables.nation(s2, dir) eq other) // other session untouched
    Tables.invalidate(s2)
  }
}
