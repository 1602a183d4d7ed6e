package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Query-level checks for the scalar-family additions: the typed JSON
  * parse path (q44) against the string-extraction path, and the
  * higher-order array reductions (q45) against a driver-side
  * recomputation over the same quantized arrays. Cross-engine value
  * agreement is the oracle's job; these pin the operator logic.
  */
class ExtendedQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q103/q104: connector round-trips are lossless vs the direct parquet plan") {
    // same aggregate, no round trip — if the CSV writer/reader mangles
    // quoting, null-vs-empty, or double text precision (q103), or the
    // ORC path shifts a timestamp (q104), the frames differ
    import graft.Exact
    val csvDirect = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        concat(col("c_name"), lit(",\""), col("c_mktsegment")).as("tricky"),
        when(col("c_custkey") % 97 === 0, lit(null).cast("int"))
          .otherwise(col("c_nationkey")).as("nat_or_null"),
        col("c_acctbal"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        Exact.centsSum(col("c_acctbal")).as("acctbal_cents"),
        sum(length(col("tricky"))).as("tricky_chars"),
        sum(when(col("nat_or_null").isNull, 1L).otherwise(0L)).as("n_null_nation"),
        sum(col("nat_or_null")).as("nat_sum"))
    val csvRt = ExtendedQueries.q103CsvRoundtrip.run(spark, dir)
    assert(csvRt.exceptAll(csvDirect).isEmpty && csvDirect.exceptAll(csvRt).isEmpty)
    // the null injection must actually fire, or the null-fidelity leg
    // of the check is vacuous
    assert(csvRt.agg(sum(col("n_null_nation"))).head.getLong(0) > 0)

    val orcDirect = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        Exact.centsSum(col("o_totalprice")).as("price_cents"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"),
        sum(col("o_orderkey")).as("key_sum"))
    val orcRt = ExtendedQueries.q104OrcRoundtrip.run(spark, dir)
    assert(orcRt.exceptAll(orcDirect).isEmpty && orcDirect.exceptAll(orcRt).isEmpty)
  }

  test("q105/q106: JDBC and XML round-trips are lossless vs the direct parquet plan") {
    import graft.Exact
    // JDBC (embedded Derby, partitioned read): prepared-statement write
    // + 4-partition range read must reproduce the direct aggregate —
    // apostrophes/quotes in `tricky`, SQL NULLs, and double precision
    val jdbcDirect = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        concat(col("c_name"), lit("','\""), col("c_mktsegment")).as("tricky"),
        when(col("c_custkey") % 97 === 0, lit(null).cast("int"))
          .otherwise(col("c_nationkey")).as("nat_or_null"),
        col("c_acctbal"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        Exact.centsSum(col("c_acctbal")).as("acctbal_cents"),
        sum(length(col("tricky"))).as("tricky_chars"),
        sum(when(col("nat_or_null").isNull, 1L).otherwise(0L)).as("n_null_nation"),
        sum(col("nat_or_null")).as("nat_sum"))
    val jdbcRt = ExtendedQueries.q105JdbcRoundtrip.run(spark, dir)
    assert(jdbcRt.exceptAll(jdbcDirect).isEmpty && jdbcDirect.exceptAll(jdbcRt).isEmpty)
    assert(jdbcRt.agg(sum(col("n_null_nation"))).head.getLong(0) > 0)

    // XML: entity escaping (< & "), element-omission→null, doubles
    val xmlDirect = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"),
        concat(col("p_name"), lit("<&\">"), col("p_type")).as("tricky"),
        when(col("p_partkey") % 89 === 0, lit(null).cast("int"))
          .otherwise(col("p_size")).as("size_or_null"),
        col("p_retailprice"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        Exact.centsSum(col("p_retailprice")).as("price_cents"),
        sum(length(col("tricky"))).as("tricky_chars"),
        sum(when(col("size_or_null").isNull, 1L).otherwise(0L)).as("n_null_size"),
        sum(col("size_or_null")).as("size_sum"))
    val xmlRt = ExtendedQueries.q106XmlRoundtrip.run(spark, dir)
    assert(xmlRt.exceptAll(xmlDirect).isEmpty && xmlDirect.exceptAll(xmlRt).isEmpty)
    assert(xmlRt.agg(sum(col("n_null_size"))).head.getLong(0) > 0)
  }

  test("q44: from_json typed parse agrees with get_json_object extraction") {
    val typed = ExtendedQueries.q44JsonFuncs.run(spark, dir)
    val strings = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("CAST(get_json_object(props, '$.k') AS LONG)").as("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max"),
        count(col("k")).as("n_k"),
        count(lit(1)).as("n"))
    assert(typed.exceptAll(strings).isEmpty)
    assert(strings.exceptAll(typed).isEmpty)
  }

  test("q98 (sliding-distinct HLL) tracks q92's exact counts within the p=9 envelope") {
    // the sketch twin must agree with the exact form it replaces: same
    // (event_type, day) keys, and every estimate within a generous
    // multiple of HLL's standard error (1.04/sqrt(512) ~ 4.6%) of the
    // exact count — catching a frame drift (wrong join, wrong key)
    // that the hash oracle alone would not relate back to q92
    val exact = SignalQueries.q92SlidingDistinct.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val est = SignalQueries.q98SlidingDistinctHll.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est.keySet == exact.keySet)
    for ((k, e) <- est) {
      val t = exact(k).toDouble
      assert(math.abs(e - t) <= math.max(3.0, 0.2 * t),
        s"$k: est=$e exact=$t")
    }
  }

  test("q53 oracle precondition: events are (user_id, ts) tie-free at every SF") {
    // funnelOnePass (sorted walk) and the join-form oracle SQL agree on
    // tie-free logs; a regenerated events table with tied same-user
    // timestamps would silently break the q53 hash match — fail HERE
    // instead, at every SF the driver or bench reads.
    // check every SF present in this environment (the driver generates
    // all three; a minimal checkout may only carry sf0.001)
    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
      .filter(sf => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"/root/testdata/$sf")))
    assert(sfs.nonEmpty, "no testdata SF dirs found")
    for (sf <- sfs) {
      val ev = Tables.events(spark, s"/root/testdata/$sf")
        .select("user_id", "ts")
      val ties = ev.count() - ev.distinct().count()
      assert(ties == 0L,
        s"$sf: $ties tied (user_id, ts) pairs — q53 oracle equivalence broken")
    }
  }

  test("d09 query leaves no cache-registry entry behind (bench honesty)") {
    // Bench times every query twice and reports the min; a query whose
    // op leaked a plan-keyed cache entry would serve run 1's data to
    // run 2's identical analyzed plan, making the reported min a
    // warm-cache number. Run the REGISTERED d09 fn end-to-end and
    // assert the registry is empty once the action completes.
    spark.catalog.clearCache() // forked suites run sequentially — safe
    val fn = graft.SparkEntry.queries("d09_dedup_resolve")
    assert(fn(spark, dir).count() > 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "d09_dedup_resolve left a cache-registry entry alive after the action")
  }

  test("d24: oracle-encoded df cap agrees with chunkDedupStats when the cap binds") {
    // The d24 oracle SQL now carries the df cap itself (the `g` CTE's
    // HAVING COUNT(*) <= 100000), so the hash match no longer depends on
    // the corpus never hitting the cap. Pin the op side of that contract
    // here: on a corpus where the cap BINDS, chunkDedupStats' tallies
    // equal the oracle's algorithm (first-occurrence over under-cap
    // chunks only) recomputed directly.
    import spark.implicits._
    // doc 1..4 share one boilerplate chunk (8 identical tokens); cap 3
    // drops it; docs also carry a unique chunk each
    val docs = (1L to 4L)
      .map(i => (i, "b b b b b b b b " + s"u$i u$i u$i u$i u$i u$i u$i u$i"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.chunkDedupStats(docs, "doc_id", "text",
        chunkTokens = 8, maxChunkDf = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // boilerplate chunk (df 4 > 3) dropped: each doc reports only its
    // unique chunk, kept (rk 1), nothing removed
    assert(got == (1L to 4L).map(i => i -> ((1L, 1L, 0L))).toMap, got.toString)
  }

  test("q59: portable HLL lands within 10% of the exact distinct count") {
    val row = ExtendedQueries.q59PortableSketch.run(spark, dir).collect()(0)
    val est = row.getAs[Double]("hll_orders")
    val exact = row.getAs[Long]("exact_orders").toDouble
    // m=512 registers → ~4.6% standard error; 10% is a >2-sigma bound
    assert(math.abs(est - exact) / exact < 0.10, s"est=$est exact=$exact")
    // the sampled median is a real lineitem price (positive cents)
    assert(row.getAs[Long]("sample_median_cents") > 0L)
  }

  test("q62: count-min estimates are one-sided — est >= true for every key") {
    val rows = ExtendedQueries.q62CountMin.run(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    assert(rows.forall { case (t, e) => e >= t },
      s"count-min guarantee violated: ${rows.mkString(",")}")
  }

  test("q49: merge actions partition the key space of both snapshots") {
    val ord = Tables.orders(spark, dir)
    val oldKeys = ord.where(col("o_orderdate") < "1996-01-01")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val newKeys = ord.where(col("o_orderdate") < "1997-01-01" && col("o_orderkey") % 13 =!= 0)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val got = ExtendedQueries.q49ScdMerge.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == (oldKeys ++ newKeys))      // full outer: every key once
    assert(got.filter(_._2 == "insert").keySet == (newKeys -- oldKeys))
    assert(got.filter(_._2 == "delete").keySet == (oldKeys -- newKeys))
    // updates are exactly the surviving keys whose price was revised (mod 7)
    val both = oldKeys intersect newKeys
    assert(got.filter(_._2 == "update").keySet == both.filter(_ % 7 == 0))
    assert(got.filter(_._2 == "unchanged").keySet == both.filterNot(_ % 7 == 0))
  }

  test("q50: unpivoted measure totals match direct per-column aggregation") {
    val li = Tables.lineitem(spark, dir)
    val expect = Map(
      "quantity" -> "l_quantity", "extendedprice" -> "l_extendedprice",
      "discount" -> "l_discount", "tax" -> "l_tax"
    ).map { case (m, c) =>
      m -> li.agg(sum(round(col(c) * 100, 0).cast("long"))).collect()(0).getLong(0)
    }
    val n = li.count()
    val got = ExtendedQueries.q50Unpivot.run(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (m, (cnt, total)) =>
      assert(cnt == n)                  // Expand emits one row per measure per input row
      assert(total == expect(m))
    }
  }

  test("q51: merged state+delta partials equal the full recomputation") {
    val full = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
    val merged = ExtendedQueries.q51IncrementalAgg.run(spark, dir)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    // the split is genuine: both periods contribute rows
    val ord = Tables.orders(spark, dir)
    assert(ord.where(col("o_orderdate") < "1997-01-01").count() > 0)
    assert(ord.where(col("o_orderdate") >= "1997-01-01").count() > 0)
  }

  test("q52: struct-ordered max picks the same winner as the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val viaWindow = ev
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"))
    val got = ExtendedQueries.q52ArgMax.run(spark, dir)
      .select(col("user_id"), col("last_event_id"))
    assert(got.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(got).isEmpty)
    // and the plan is an aggregate, not a window (the scale point)
    val plan = ExtendedQueries.q52ArgMax.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"), plan)
  }

  test("q45: array reductions match a driver-side recomputation per row") {
    val qe = transform(col("embedding"), x => round(x.cast("double") * 1000, 0).cast("long"))
    val rows = ExtendedQueries.q45ArrayHof.run(spark, dir)
      .join(Tables.embeddings(spark, dir).select(col("vec_id"), qe.as("e")), "vec_id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getSeq[Long](r.fieldIndex("e"))
      assert(r.getAs[Long]("n_dims") == e.length.toLong)
      assert(r.getAs[Long]("qnorm2") == e.map(v => v * v).sum)
      assert(r.getAs[Long]("qmax") == e.max)
      assert(r.getAs[Long]("n_pos") == e.count(_ > 0).toLong)
    }
  }
}
