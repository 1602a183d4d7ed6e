package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Regression tests for the SCALE-critical physical-plan shapes the
  * round audits verified by hand. A query can stay value-correct while
  * its plan silently degrades (lost pushdown, a broadcast that became a
  * shuffle, a top-k that became a global sort, a map-side window limit
  * that disappeared) — at 100 TB each of those is the difference
  * between a working job and a dead one, so the plan assertions ARE the
  * tests. Executed plans at sf0.001: shape is SF-independent for these
  * properties (broadcast thresholds are generous vs the tiny dims, and
  * pushdown/limit planning is size-blind).
  */
class PlanPropertiesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q38 (TPC-H Q3): filters pushed to all three scans, dims broadcast, top-10 as TakeOrderedAndProject") {
    val plan = executedPlan("q38_tpch3")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"), plan)
    assert("LessThan\\(o_orderdate".r.findFirstIn(plan).isDefined, plan)
    assert("GreaterThan\\(l_shipdate".r.findFirstIn(plan).isDefined, plan)
  }

  test("q17: global top-100 plans as TakeOrderedAndProject, not a full sort") {
    val plan = executedPlan("q17_top100")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // a global Sort node would mean the whole table is range-shuffled for 100 rows
    assert(!"(?m)^\\s*\\+?-? ?\\*?\\(?\\d*\\)? ?Sort ".r.findFirstIn(plan).isDefined, plan)
  }

  test("q10: dimension joins are broadcast, not shuffled") {
    val plan = executedPlan("q10_join_dims")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("d14: per-key cap keeps the map-side WindowGroupLimit (bounded shuffle per key)") {
    val plan = executedPlan("d14_cap_per_key")
    // one WindowGroupLimit below the exchange (map side) and one above (final)
    assert("WindowGroupLimit".r.findAllIn(plan).length >= 2, plan)
  }

  /** Execute `name` and return its runtime shuffle stages (walking
    * through query-stage boundaries, which are leaves to collect()). A
    * stage REUSED by AQE is a fresh ShuffleQueryStageExec id wrapping
    * the SAME ShuffleExchangeExec instance — reference equality on
    * `.shuffle` is the reuse check. */
  private def runtimeShuffleStages(name: String) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    def walk(p: SparkPlan): Seq[ShuffleQueryStageExec] = {
      val here = p match { case s: ShuffleQueryStageExec => Seq(s); case _ => Seq.empty }
      val into = p match { case s: QueryStageExec => walk(s.plan); case _ => p.children.flatMap(walk) }
      here ++ into
    }
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan).distinct
      case p => walk(p).distinct
    }
  }

  /** The corpus-explode shuffle must MATERIALIZE once even though two
    * (or three) aggregate branches hang off it: every runtime stage
    * whose subtree contains a Generate must share one underlying
    * exchange instance (AQE stage reuse — kept alive by the canonical-
    * twin disciplines in TextAnalysis: explicit w1/w2 null filters,
    * cf in the df-branch output). */
  private def assertOneExplodeMaterialization(name: String): Unit = {
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    // does this stage's OWN subtree (not a nested, already-materialized
    // stage it merely reads) run the explode?
    def ownGenerate(p: SparkPlan): Boolean = p match {
      case _: QueryStageExec => false
      case _: GenerateExec => true
      case other => other.children.exists(ownGenerate)
    }
    val gen = runtimeShuffleStages(name).filter(s => ownGenerate(s.shuffle))
    assert(gen.nonEmpty, s"$name: no explode shuffle stage found")
    val distinctExchanges = gen.map(s => System.identityHashCode(s.shuffle)).distinct
    assert(distinctExchanges.size == 1,
      s"$name: corpus explode materialized ${distinctExchanges.size} times " +
        s"across stages ${gen.map(_.id).mkString(",")} — AQE stage reuse broke")
  }

  test("t06: the explode shuffle materializes once — df's branch reuses tf's stage") {
    assertOneExplodeMaterialization("t06_top_terms")
    val plan = executedPlan("t06_top_terms")
    assert("WindowGroupLimit".r.findAllIn(plan).length >= 2, plan)
  }

  test("t13: the explode shuffle materializes once — df's branch reuses tf's stage") {
    assertOneExplodeMaterialization("t13_tfidf_terms")
  }

  test("t09: the explode shuffle materializes once — the history aggregate reuses it") {
    assertOneExplodeMaterialization("t09_bigram_lm")
  }

  test("d03: the minhash signature is evaluated once per row, not re-derived by the filter") {
    val plan = executedPlan("d03_minhash_pairs")
    // the sentinel filter must test the materialized sig attribute; a plan
    // where graft_minhash appears in a Filter node re-runs the whole chain
    assert(!"Filter .*graft_minhash".r.findFirstIn(plan).isDefined, plan)
  }

  test("q01 (flagship): only the three needed columns are read") {
    val plan = executedPlan("q01_gold_agg")
    val readSchemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toSeq
    assert(readSchemas.nonEmpty, plan)
    readSchemas.foreach { rs =>
      assert(rs.count(_ == ',') <= 2, s"scan reads more than 3 columns: $rs")
    }
  }

  test("t10 (PMI): the corpus explode materializes once — both margins reuse it, N from the narrow scan") {
    assertOneExplodeMaterialization("t10_pmi")
  }

  test("d54 (DSIR): the feature explode materializes once — scoring join and rollup λ-table reuse it") {
    assertOneExplodeMaterialization("d54_dsir_importance")
  }

  test("d22 (domain KL): two corpus explodes only (vocab + counts), total from the narrow scan") {
    val plan = executedPlan("d22_domain_kl")
    assert("Generate explode".r.findAllIn(plan).length == 2, plan)
  }

  test("d23 (quality gate): zero shuffles — a scan stays a scan") {
    val df = SparkEntry.queries("d23_quality_filter")(spark, dir)
    assert(!graft.ops.Bucketing.hasShuffle(df),
      df.queryExecution.executedPlan.toString)
  }

  test("m06 (patch grid): no shuffle after the decode seam") {
    val df = SparkEntry.queries("m06_patch_grid")(spark, dir)
    assert(!graft.ops.Bucketing.hasShuffle(df),
      df.queryExecution.executedPlan.toString)
  }

  test("q56 (TPC-H Q18): single lineitem pass, top-100 as TakeOrderedAndProject") {
    val plan = executedPlan("q56_tpch18")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the textbook formulation re-joins lineitem to re-aggregate; this
    // plan must read lineitem exactly once
    assert("lineitem\\.parquet".r.findAllIn(plan).length == 1, plan)
  }

  test("q57 (debounce): one window over one exchange, keyed on (user, type)") {
    val plan = executedPlan("q57_event_debounce")
    assert("(?<!Broadcast)Exchange ".r.findAllIn(plan).length == 1, plan)
    assert("\\bWindow\\b".r.findFirstIn(plan).isDefined, plan)
  }

  test("q53 (funnel): step-type pre-filter is pushed to the parquet scan, 3-col read") {
    val plan = executedPlan("q53_funnel")
    // the one unbounded per-user state (collect_list) must only ever see
    // step events — the In filter has to reach the scan, not sit above
    // the aggregate, and the scan must not read the other event columns
    assert("PushedFilters: \\[In\\(event_type".r.findFirstIn(plan).isDefined, plan)
    val readSchemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toSeq
    assert(readSchemas.nonEmpty, plan)
    readSchemas.foreach { rs =>
      assert(rs.count(_ == ',') <= 2, s"scan reads more than 3 columns: $rs")
    }
  }

  test("d24 (chunk dedup): cap window and first-occurrence window share one exchange") {
    val plan = executedPlan("d24_chunk_dedup")
    // the maxChunkDf guard partitions on the same _h key the dedup
    // window needs — the plan must show both Window nodes over ONE hash
    // exchange plus the final doc-keyed tally exchange, nothing more
    assert("\\bWindow\\b".r.findAllIn(plan).length == 2, plan)
    val exchanges = "(?<!Broadcast)Exchange [a-zA-Z]*[Hh]ash".r.findAllIn(plan).length
    assert(exchanges == 2, plan)
  }

  test("d25 (curation pipeline): the whole quality→dedup→sample funnel costs one data shuffle") {
    val plan = executedPlan("d25_curation_pipeline")
    // one Exchange for the dedup window; the final 1-row agg adds only a
    // SinglePartition exchange of already-aggregated partials
    val exchanges = "(?<!Broadcast)Exchange [a-zA-Z]*[Hh]ash".r.findAllIn(plan).length
    assert(exchanges == 1, plan)
  }

  test("q60 (recursive CTE): no single-partition Sort/Window on the data path") {
    // the ranked base is ops/Ranking.globalRowNumber (two-phase
    // partition-offset rank) materialized by localCheckpoint — the
    // recursion's executed plan must contain no Window node and no
    // SinglePartition exchange of table data (the unpartitioned
    // row_number trap this round removed)
    val plan = executedPlan("q60_recursive_cte")
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("d31 (weighted sample): priorities are a narrow projection + TakeOrdered — no shuffle, no window") {
    // the max-of-w-draws key must stay inside codegen: no explode-join
    // of draws, no exchange of the corpus, no window operator
    val plan = executedPlan("d31_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("d13 (sequence pack): the corpus is scanned and hashed ONCE (checkpointed base, no second branch)") {
    // layoutOffsets' window and totals branches both read the eager
    // checkpoint — before round 11 each branch re-scanned the parquet
    // and re-md5'd every text (2 FileScans)
    val plan = executedPlan("d13_sequence_pack")
    assert("Scan parquet".r.findAllIn(plan).length == 0, plan)
  }

  test("d33 (curriculum): global rank is the two-phase range exchange, never a single-partition window") {
    val plan = executedPlan("d33_curriculum")
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("q73 (TPC-H Q10): both fact filters pushed, nation broadcast, top-20 as TakeOrderedAndProject") {
    val plan = executedPlan("q73_tpch10")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("GreaterThanOrEqual\\(o_orderdate".r.findFirstIn(plan).isDefined, plan)
    assert("EqualTo\\(l_returnflag,R\\)".r.findFirstIn(plan).isDefined, plan)
  }

  test("q75 (TPC-H Q14): part broadcasts; the only data shuffle is the per-year aggregate") {
    val plan = executedPlan("q75_promo_ratio")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // one hash exchange (the year agg) — the promo/total split must not
    // cost a second scan or join
    assert("(?<!Broadcast)Exchange [a-zA-Z]*[Hh]ash".r.findAllIn(plan).length == 1, plan)
    assert("lineitem\\.parquet".r.findAllIn(plan).length == 1, plan)
  }

  test("q77 (relational division): two hash-aggs + broadcast universe — no shuffle join, no per-pair anti-join") {
    val plan = executedPlan("q77_division")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
  }

  test("g08 (HITS): top-20 is TakeOrderedAndProject; no cartesian product on the final assembly") {
    // the per-round ShuffledHashJoins live inside eagerly-executed
    // checkpoint stages (invisible here — their pin is the measured
    // factor table in BASELINE.md); the FINAL plan's contract is the
    // bounded top-k and left-join fill over checkpoint scans
    val plan = executedPlan("g08_hits")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the assembly's SortMergeJoin sorts are LOCAL (global=false) — a
    // global Sort of the full node table would be the q17 regression
    assert(!"Sort \\[[^\\]]+\\], true".r.findFirstIn(plan).isDefined, plan)
  }

  test("d58 (soft dedup): ONE cluster-keyed window computes the weights — no join-back, no second exchange") {
    val plan = executedPlan("d58_soft_dedup")
    assert("Window ".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("cluster_id"), plan)
  }

  test("ALL queries: no single-partition shuffle of unaggregated data anywhere in any plan") {
    // The fleet-wide scale-killer guard: a ShuffleExchange to
    // SinglePartition is only ever acceptable when its input is already
    // bounded — the partial side of a global aggregate (one row per task
    // per group, where the groups ARE the output) or a per-task
    // LocalLimit. Anything else funnels table-sized data through one
    // task and would have been the round-5 q60 regression. Walking the
    // physical tree (not the plan string) keeps the check exact:
    // wrappers (codegen / project / filter / sort) are transparent,
    // everything else on the exchange input is a violation.
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    @annotation.tailrec
    def producer(p: SparkPlan): SparkPlan = p match {
      case w: WholeStageCodegenExec => producer(w.child)
      case i: InputAdapter => producer(i.child)
      case pr: ProjectExec => producer(pr.child)
      case f: FilterExec => producer(f.child)
      case s: SortExec => producer(s.child)
      case _ => p
    }
    def boundedInput(e: ShuffleExchangeExec): Boolean = producer(e.child) match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec |
           _: SortAggregateExec | _: LocalLimitExec => true
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan
      plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning == SinglePartition && !boundedInput(e) =>
          s"$name: Exchange SinglePartition over ${producer(e.child).nodeName}"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("ALL queries: no window partitioned on a bare term/word key") {
    // The round-7 verdict's surviving scale hazard, pinned fleet-wide: a
    // window PARTITION BY a raw posting-list key (term / w1 / w2) has
    // partition size df(key) — for a Zipf head term that is ~every
    // document, funneled through ONE task, and unlike a skewed join
    // partition AQE cannot split a window partition. df/history counts
    // must fold via groupBy + join instead (the bm25TopDocs pattern).
    // Keys over BOUNDED aggregated frames (d22's mterm over a 256-term
    // vocab × strata) are a different shape and stay allowed.
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val banned = Set("term", "w1", "w2")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan
      def partNames(spec: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
        spec.flatMap(_.collect {
          case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
        })
      plan.collect {
        case w: WindowExec if partNames(w.partitionSpec).exists(banned) =>
          s"$name: WindowExec partitioned on ${partNames(w.partitionSpec).mkString(",")}"
        case w: WindowGroupLimitExec if partNames(w.partitionSpec).exists(banned) =>
          s"$name: WindowGroupLimit partitioned on ${partNames(w.partitionSpec).mkString(",")}"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("q79 (TPC-H Q6): all three predicates reach the parquet scan; 4-column read; no join") {
    // PushedFilters is elided in the plan STRING — read the scan node's
    // metadata (untruncated) instead of regexing the rendering
    val df = SparkEntry.queries("q79_tpch6")(spark, dir)
    val plan = df.queryExecution.executedPlan match {
      // collect() does not descend into the adaptive wrapper
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1, plan.toString)
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(l_discount"), pushed)
    assert(pushed.contains("LessThan(l_quantity"), pushed)
    assert(!plan.toString.contains("Join"), plan.toString)
    assert(scans.head.requiredSchema.size <= 4, scans.head.requiredSchema.toString)
  }

  test("q78 (TPC-H Q1): shipdate cutoff pushed to the scan; partial agg below the 6-group exchange") {
    val plan = executedPlan("q78_tpch1")
    assert("LessThan\\(l_shipdate".r.findFirstIn(plan).isDefined, plan)
    // map-side combine must exist: partial_sum below the exchange means
    // ~all 100 TB reduces before the 6-row shuffle
    assert(plan.contains("partial_sum"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q85 (TPC-H Q19): part broadcasts and the disjunction's common factor reaches the lineitem scan") {
    val plan = executedPlan("q85_tpch19")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the OR-of-ANDs common factor over lineitem columns (quantity
    // bounds) must be extracted and pushed into the scan's data filters
    assert("DataFilters: \\[[^\\]]*l_quantity".r.findFirstIn(plan).isDefined, plan)
  }

  test("q80 (TPC-H Q7): nation-filtered dims broadcast — the only data shuffle is lineitem ⋈ orders") {
    val plan = executedPlan("q80_tpch7")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan)
  }

  test("q81 (TPC-H Q8): five dims broadcast; no shuffle join beyond the fact-fact pair") {
    val plan = executedPlan("q81_tpch8")
    assert(!plan.contains("SortMergeJoin"), plan)
    // part's type filter must reach its scan (it gates the whole query)
    assert("EqualTo\\(p_type,ECONOMY\\)".r.findFirstIn(plan).isDefined, plan)
  }

  test("q82 (TPC-H Q13): the priority filter keeps the join LEFT OUTER (zero-order customers survive)") {
    val plan = executedPlan("q82_tpch13")
    assert(plan.contains("LeftOuter"), plan)
    // the filter must sit under the join (scan-pushed), not above it
    assert("Not\\(EqualTo\\(o_orderpriority".r.findFirstIn(plan).isDefined, plan)
  }

  test("q83 (TPC-H Q15): the revenue view computes once — its exchange is reused for the max") {
    // exchange reuse is finalized during adaptive execution — run the
    // query, then assert on the final plan
    val df = SparkEntry.queries("q83_tpch15")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedQueryStage") || plan.contains("ReusedExchange"), plan)
  }

  test("q84 (TPC-H Q17): decorrelated to ONE lineitem scan and one partkey exchange") {
    val plan = executedPlan("q84_tpch17")
    assert("lineitem\\.parquet".r.findAllIn(plan).length == 1, plan)
    assert("(?<!Broadcast)Exchange [a-zA-Z]*[Hh]ash".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q93 (TPC-H Q4): the EXISTS plans as LEFT SEMI — an order counts once however many late lines") {
    val plan = executedPlan("q93_tpch4")
    assert(plan.contains("LeftSemi"), plan)
    assert("GreaterThanOrEqual\\(o_orderdate".r.findFirstIn(plan).isDefined, plan)
  }

  test("q94 (TPC-H Q2): min-cost supplier is ONE struct-min hash-agg — no window, no re-join of offers") {
    val plan = executedPlan("q94_tpch2")
    assert(!plan.contains("Window"), plan)
    assert("lineitem\\.parquet".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q95 (TPC-H Q9): every dim broadcasts; one lineitem scan; the fact-fact pair is the only shuffle join") {
    val plan = executedPlan("q95_tpch9")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert("lineitem\\.parquet".r.findAllIn(plan).length == 1, plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan)
  }

  test("q96 (TPC-H Q16): pairs dedup before counting; exclusions are a broadcast ANTI; top-20 as TakeOrdered") {
    val plan = executedPlan("q96_tpch16")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("q91 (value functions): one exchange serves all five window functions") {
    val plan = executedPlan("q91_value_functions")
    assert("(?<!Broadcast)Exchange ".r.findAllIn(plan).length == 1, plan)
  }

  test("q86 (TPC-H Q22): no-recent-order test is an ANTI join with the date filter pushed to orders' scan") {
    val plan = executedPlan("q86_tpch22")
    assert(plan.contains("LeftAnti"), plan)
    assert("GreaterThanOrEqual\\(o_orderdate".r.findFirstIn(plan).isDefined, plan)
  }

  test("q64 (bloom prune): the probe side is scan+project — membership never joins or shuffles probe rows") {
    // one broadcast join IS expected (the exact-semi-join cross-check in
    // the query); the bloom probe itself must add no exchange beyond the
    // final 1-row aggregate and no shuffle join anywhere
    val plan = executedPlan("q64_bloom_prune")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
  }

  test("q99/d42 (quantile sketch): raw rows reduce map-side — the only exchanges carry the bounded bucket table") {
    // the scale contract: the sketch is one partial hash-agg over the
    // scan (rows never shuffle), then exchanges that move at most
    // 64·2^subBits counter rows; the single-partition fold is the
    // second of them, above the keyed aggregate. A lost partial agg
    // (rows shuffling to buckets) or a window sneaking in would break
    // the 100 TB story while staying value-correct.
    for (q <- Seq("q99_hdr_quantiles", "d42_weighted_quantile")) {
      val plan = executedPlan(q)
      assert(!plan.contains("Window"), s"$q grew a window:\n$plan")
      // two non-broadcast exchanges: bkey hash-partitioning + the 1-row fold
      assert("(?<!Broadcast)Exchange ".r.findAllIn(plan).length == 2, s"$q:\n$plan")
      // partial aggregation present before the first exchange
      assert(plan.contains("partial_count") || plan.contains("partial_sum"),
        s"$q lost its map-side partial aggregate:\n$plan")
    }
  }

  test("q100 (grouped quantile sketch): per-group fold is a keyed aggregate — no window, two bounded exchanges") {
    val plan = executedPlan("q100_hdr_by_group")
    assert(!plan.contains("Window"), plan)
    assert("(?<!Broadcast)Exchange ".r.findAllIn(plan).length == 2, plan)
    assert(plan.contains("partial_count"), plan)
  }

  test("d43 (embedding covariance): one scan, one bounded exchange — margins ride the pair aggregate, no self-join") {
    val plan = executedPlan("d43_embedding_covariance")
    assert(!plan.contains("Join"), s"covariance must not self-join:\n$plan")
    assert("(?<!Broadcast)Exchange ".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("partial_count"), plan)
    // exactly one parquet scan: the d² amplification and its collapse
    // live inside one stage over one table read
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
  }

  test("d50 (PCA projection): the data-side plan is scan + project — zero shuffles, zero joins") {
    // the covariance collect and the matrix recurrence happen at BUILD
    // time (driver-bounded by dimension); the returned frame must be a
    // pure narrow projection against the component literal
    val plan = executedPlan("d50_pca_power")
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
  }

  test("d48 (semDedup): every consumer reads the one eager checkpoint — zero parquet re-scans") {
    // without the localCheckpoint the four consumers of the cell
    // assignment re-derived it from parquet independently (6 scans,
    // plan-audited in round 10)
    val plan = executedPlan("d48_semdedup")
    assert(!plan.contains("Scan parquet"), plan)
    assert(plan.contains("Scan ExistingRDD"), plan)
  }

  test("d47/d51 (span rewrites): exactly three table reads — the two-pass frequency minimum plus the base") {
    // a regression to the left-join-chain shape re-derives the span
    // projection per branch (d45's 4-pass draft, BASELINE.md)
    for (name <- Seq("d47_dedup_rewrite", "d51_selfdup_rewrite")) {
      val plan = executedPlan(name)
      assert("Scan parquet".r.findAllIn(plan).length == 3, s"$name:\n$plan")
    }
  }

  test("d49 (fertility): pieces join back broadcast BY SIZE, not by hint; two corpus reads") {
    // termPieces is the OPEN distinct-term vocabulary (10^8+ terms on a
    // web corpus) — round 10 hint-forced the broadcast, which would
    // bypass the threshold and OOM at that scale. The hint is gone; at
    // THIS corpus size the planner must still choose broadcast on its
    // own size estimate (the small-side fast path survives), and the
    // fallback for an over-threshold vocab is a term-keyed shuffle of
    // two already-aggregated sides.
    val plan = executedPlan("d49_bpe_fertility")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("Scan parquet".r.findAllIn(plan).length == 2, plan)
  }

  test("g10 (clustering coeff): ONE intersection join — the credit fan-out is a single explode, not a union") {
    // the 3-branch union draft re-executed the adjacency closure per
    // branch (3 ShuffledHashJoins for one logical join, plan-audited);
    // the credit-array explode keeps it at exactly one
    val plan = executedPlan("g10_clustering_coeff")
    assert("ShuffledHashJoin".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // edge list checkpointed at the call site: no parquet re-scan
    assert(!plan.contains("Scan parquet"), plan)
  }

  test("d59 (SQ ANN): one calibration pass, both rank stages as TakeOrderedAndProject") {
    val plan = executedPlan("d59_sq_ann")
    // scans: data codes + query row — calibration is checkpointed once
    // (the draft ran the full-corpus calibration per crossJoin side)
    assert("Scan parquet".r.findAllIn(plan).length == 2, plan)
    assert("Scan ExistingRDD".r.findAllIn(plan).length >= 1, plan)
    assert("TakeOrderedAndProject".r.findAllIn(plan).length == 2, plan)
    // a global Sort would shuffle the whole corpus for 50 candidate rows
    assert(!"(?m)^\\s*:?\\+?-? ?\\*?\\(?\\d*\\)? ?Sort ".r.findFirstIn(plan).isDefined, plan)
  }

  test("d60 (edit verify): pair formation stays inside the capped LSH band join — no cartesian, no nested loop") {
    val plan = executedPlan("d60_edit_verify")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("g11 (personalized PR): top-20 is TakeOrderedAndProject over the iterated frame — no cartesian, no global sort") {
    // per-round pinned ShuffledHashJoins live inside checkpoint stages
    // (the g08 rule — their pin is the factor table in BASELINE.md)
    val plan = executedPlan("g11_personalized_pr")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!"Sort \\[[^\\]]+\\], true".r.findFirstIn(plan).isDefined, plan)
  }

  test("d61 (containment): rides the d15 verify plan — pair formation only in the banded join, no cartesian") {
    val plan = executedPlan("d61_containment")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("g12 (label communities): the close is a pure projection over the final checkpoint — zero exchanges") {
    // per-round pinned ShuffledHashJoins live inside checkpoint stages
    // (the g11 rule); the returned frame must add nothing on top
    val plan = executedPlan("g12_label_communities")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Scan parquet"), plan)
  }

  test("g13 (random walks): the corpus is a narrow union of the checkpointed hops — no exchange, no join") {
    val plan = executedPlan("g13_random_walks")
    assert(plan.contains("Union"), plan)
    // step-0 frontier projects off the degree checkpoint; hops 1..3
    // are their own checkpoints — 4 RDD scans, nothing recomputed
    assert("Scan ExistingRDD".r.findAllIn(plan).length == 4, plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Scan parquet"), plan)
  }

  test("g14 (neighborhood HLL): the packed estimate is a ZERO-shuffle projection over the final register checkpoint") {
    // the r11 row form needed one (node)-keyed exchange here to fold
    // register rows; the packed wide-column form reads the checkpoint
    // and projects — the estimate stage shuffles NOTHING
    val plan = executedPlan("g14_neighborhood_hll")
    assert("Scan ExistingRDD".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Scan parquet"), plan)
  }

  test("t14 (textrank): top-20 is TakeOrderedAndProject over the iterated frame — no cartesian, no global sort") {
    val plan = executedPlan("t14_textrank")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!"Sort \\[[^\\]]+\\], true".r.findFirstIn(plan).isDefined, plan)
  }

  test("g15 (k-truss): the close is a pure projection over the final peel checkpoint — zero exchanges") {
    // per-round support passes live inside checkpoint stages (the
    // g12 rule); the returned (u, v, support) frame adds nothing
    val plan = executedPlan("g15_ktruss")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Scan parquet"), plan)
  }

  test("g16 (BFS distances): the close is a pure projection over the final min-merge checkpoint — zero exchanges") {
    val plan = executedPlan("g16_bfs_distances")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Scan parquet"), plan)
  }

  test("d62 (MMR rerank): the close is a pure projection over the final greedy checkpoint — zero exchanges, no corpus rescan") {
    // candidate formation (the only corpus-wide stage) and the greedy
    // rounds live inside checkpoint stages; the returned frame must
    // not touch parquet again
    val plan = executedPlan("d62_mmr_rerank")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Scan parquet"), plan)
  }

  test("g17 (neighborhood function): per-radius folds read the register checkpoints — no join, no parquet rescan") {
    val plan = executedPlan("g17_neighborhood_function")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Scan parquet"), plan)
  }

  test("d63 (cluster sample): per-cell cap keeps the map-side WindowGroupLimit; ONE corpus scan") {
    val plan = executedPlan("d63_cluster_sample")
    assert("WindowGroupLimit".r.findAllIn(plan).length >= 2, plan)
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
  }

  test("d64 (vocab coverage): no window anywhere — two-phase rank + one grouping-free fold over the checkpoint") {
    val plan = executedPlan("d64_vocab_coverage")
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("Scan ExistingRDD"), plan)
  }

  test("g18 (assortativity): degree joins + one grouping-free fold — no cartesian, no sort-merge, no window") {
    val plan = executedPlan("g18_assortativity")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("d65 (boilerplate): no pair formation — hash joins only, no cartesian, no per-doc window") {
    val plan = executedPlan("d65_boilerplate")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
