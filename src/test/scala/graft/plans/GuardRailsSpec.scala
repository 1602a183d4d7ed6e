package graft.plans

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GuardRailsSpec extends SparkSpec {
  import spark.implicits._

  private def withGuard[A](body: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      before :+ UnpartitionedWindowGuard :+ UnboundedCrossJoinGuard
    try body
    finally spark.experimental.extraOptimizations = before
  }

  test("guard rejects an unpartitioned window over unbounded input") {
    withGuard {
      val df = spark.range(1000).toDF("id")
        .withColumn("rn", row_number().over(Window.orderBy("id")))
      val e = intercept[SparkException] { df.collect() }
      assert(e.getMessage.contains("globalRowNumber"), e.getMessage)
    }
  }

  test("guard allows a partitioned window over the same input") {
    withGuard {
      val df = spark.range(1000).toDF("id")
        .withColumn("rn",
          row_number().over(Window.partitionBy(col("id") % 7).orderBy("id")))
      assert(df.count() == 1000L)
    }
  }

  test("guard allows a global window over a grouping-free aggregate; a KEYED aggregate stays unbounded") {
    withGuard {
      // one-row global aggregate: bounded by construction
      val global = spark.range(1000).toDF("id")
        .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
        .withColumn("rk", row_number().over(Window.orderBy(col("n"))))
      assert(global.count() == 1L)
      // keyed aggregate = one row PER KEY — "rank every key by its
      // aggregate" is the single-partition killer; must be rejected
      val keyed = spark.range(1000).toDF("id")
        .groupBy((col("id") % 5).as("k")).agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(Window.orderBy(col("n").desc, col("k"))))
      intercept[SparkException] { keyed.collect() }
      // ...and the cap that makes it legitimate is an explicit limit
      val capped = spark.range(1000).toDF("id")
        .groupBy((col("id") % 5).as("k")).agg(count(lit(1)).as("n"))
        .limit(100)
        .withColumn("rk", row_number().over(Window.orderBy(col("n").desc, col("k"))))
      assert(capped.count() == 5L)
    }
  }

  test("guard sees through repartition/coalesce/sample/union wrappers on bounded input") {
    withGuard {
      val agg = spark.range(1000).toDF("id").agg(count(lit(1)).as("n"))
      val coalesced = agg.coalesce(1)
        .withColumn("rn", row_number().over(Window.orderBy("n")))
      assert(coalesced.count() == 1L)
      val unioned = agg.unionByName(agg)
        .withColumn("rn", row_number().over(Window.orderBy("n")))
      assert(unioned.count() == 2L)
    }
  }

  test("guard allows driver-local data and explicit limits") {
    withGuard {
      val local = Seq(1L, 2L, 3L).toDF("id")
        .withColumn("rn", row_number().over(Window.orderBy("id")))
      assert(local.count() == 3L)
      val limited = spark.range(1000).toDF("id").limit(10)
        .withColumn("rn", row_number().over(Window.orderBy("id")))
      assert(limited.count() == 10L)
    }
  }

  test("guard is opt-out per session via conf") {
    withGuard {
      spark.conf.set("spark.graft.failUnpartitionedWindow", "false")
      try {
        val df = spark.range(100).toDF("id")
          .withColumn("rn", row_number().over(Window.orderBy("id")))
        assert(df.count() == 100L)
      } finally spark.conf.unset("spark.graft.failUnpartitionedWindow")
    }
  }

  test("cross-join guard rejects two unbounded sides; a bounded side passes") {
    withGuard {
      val big1 = spark.range(1000).toDF("a")
      val big2 = spark.range(1000).toDF("b")
      val e = intercept[SparkException] { big1.crossJoin(big2).count() }
      assert(e.getMessage.contains("cross product"), e.getMessage)
      // the accidental form: a condition-free INNER join (df.join with
      // no keys) parses as Inner/None, not Cross — must also reject
      intercept[SparkException] { big1.join(big2).count() }
      // the repo's standard pattern: broadcast one-row aggregate total
      val total = big2.agg(count(lit(1)).as("n"))
      assert(big1.crossJoin(broadcast(total)).count() == 1000L)
      // a literal frame is bounded too
      assert(big1.crossJoin(Seq(1).toDF("one")).count() == 1000L)
    }
  }

  test("production path: a session built with spark.sql.extensions=GraftExtensions enforces the guards") {
    // injectOptimizerRule places the rules in the operator-optimization
    // fixed-point batch — a different execution point than the
    // extraOptimizations end-batch the tests above exercise. Build a
    // REAL opted-in session (same SparkContext) and assert both guards
    // fire there. withExtensions(new GraftExtensions) rather than the
    // spark.sql.extensions conf: that conf is STATIC, and the test
    // JVM's pre-existing SparkContext pins its (empty) value — the
    // string-conf path is proven by ExtDebug-style standalone runs;
    // what this test pins is the GraftExtensions INJECTION surface.
    import org.apache.spark.sql.SparkSession
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val guarded = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(guarded ne old, "builder must create a fresh session")
      val big = guarded.range(1000).toDF("id")
      intercept[SparkException] {
        big.withColumn("rn", row_number().over(Window.orderBy("id"))).collect()
      }
      intercept[SparkException] {
        big.join(guarded.range(1000).toDF("b")).count()
      }
      // and the injected SQL functions came along too
      assert(guarded.sql("SELECT graft_md5_upper('x') AS h").count() == 1L)
    } finally {
      SparkSession.setActiveSession(old)
      SparkSession.setDefaultSession(old)
    }
  }

  test("the whole registered inventory optimizes clean under the guard") {
    // the engine-level guard must agree with PlanPropertiesSpec's
    // physical walk: no registered query trips it
    withGuard {
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        // optimization (where the guard runs) happens during planning —
        // force it without executing the query
        fn(spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
        ()
      }
    }
  }
}
