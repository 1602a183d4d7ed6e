package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round 13 optimization): time named sub-stages of the
  * heavy registry queries in isolation — the guide §1 "measure first"
  * loop needs per-stage seconds, not per-query totals, to decide which
  * exchange/join actually owns the cost. Each experiment is forced with
  * the Bench action (xxhash64 fold — evaluation-complete) and timed
  * twice; both numbers print (first = cold incl. codegen, second =
  * steady state).
  * Usage: runMain graft.OptProbe <dir> [experiment...]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("_h"))
        .agg(expr("bit_xor(_h)")).collect()
      ()
    }
    def edges: DataFrame = graft.ops.Graph.coOccurrenceEdges(
      Tables.lineitem(spark, dir), "l_orderkey", "l_partkey", maxBasketItems = 64)

    // edgeSupport rewritten without transform() lambdas — candidate
    // replacement, must stay row-identical to Graph.edgeSupport
    def esNoHof(edges: DataFrame): DataFrame = {
      // inline copy of Graph.orient (private there)
      val deg = edges.select(col("u").as("node"))
        .unionByName(edges.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val srcFirst = col("_du") < col("_dv") ||
        (col("_du") === col("_dv") && col("u") < col("v"))
      val oriented = edges.select(col("u"), col("v"))
        .join(deg.select(col("node").as("u"), col("deg").as("_du")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("_dv")), "v")
        .select(
          when(srcFirst, col("u")).otherwise(col("v")).as("src"),
          when(srcFirst, col("v")).otherwise(col("u")).as("dst"))
      val adj = oriented
        .groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("_nbrs"))
        .localCheckpoint(true)
      // per (wedge, witness) row emit THREE unit credits — (u,v), (u,w),
      // (v,w) — summing to the same per-edge support as the size()+
      // transform() form, with every expression codegen'd
      val credits = adj
        .select(col("src").as("_u"), col("_nbrs").as("_nu"),
          explode(col("_nbrs")).as("_v"))
        .join(adj.select(col("src").as("_sv"), col("_nbrs").as("_nv"))
          .hint("shuffle_hash"), col("_v") === col("_sv"))
        .select(col("_u"), col("_v"),
          explode(array_intersect(col("_nu"), col("_nv"))).as("_w"))
        .select(explode(array(
          struct(least(col("_u"), col("_v")).as("u"),
            greatest(col("_u"), col("_v")).as("v")),
          struct(least(col("_u"), col("_w")).as("u"),
            greatest(col("_u"), col("_w")).as("v")),
          struct(least(col("_v"), col("_w")).as("u"),
            greatest(col("_v"), col("_w")).as("v")))).as("_cr"))
        .select(col("_cr.u").as("u"), col("_cr.v").as("v"))
      val sup = credits
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
      edges.select(col("u"), col("v"))
        .join(sup, Seq("u", "v"), "left")
        .select(col("u"), col("v"),
          coalesce(col("support"), lit(0L)).as("support"))
    }

    val experiments: Seq[(String, () => Unit)] = Seq(
      "edges" -> (() => force(edges)),
      "edges_ckpt" -> (() => { edges.localCheckpoint(true); () }),
      "lpa4" -> (() => force(graft.ops.Graph.labelPropagation(edges, rounds = 4))),
      "support1" -> (() => {
        val e = edges.localCheckpoint(true)
        force(graft.ops.Graph.edgeSupport(e))
      }),
      // edgeSupport decomposition: adjacency build alone
      "es_adj" -> (() => {
        val e = edges.localCheckpoint(true)
        val adj = e
          .select(col("u").as("src"), col("v").as("dst"))
          .groupBy(col("src"))
          .agg(sort_array(collect_list(col("dst"))).as("_nbrs"))
        force(adj.select(col("src"), size(col("_nbrs")).as("_n")))
      }),
      // wedge join + intersect COUNT only (triangleCount shape, per-edge)
      "es_wedge_cnt" -> (() => {
        val e = edges.localCheckpoint(true)
        val adj = e
          .select(col("u").as("src"), col("v").as("dst"))
          .groupBy(col("src"))
          .agg(sort_array(collect_list(col("dst"))).as("_nbrs"))
          .localCheckpoint(true)
        val perEdge = adj
          .select(col("src").as("_u"), col("_nbrs").as("_nu"),
            explode(col("_nbrs")).as("_v"))
          .join(adj.select(col("src").as("_sv"), col("_nbrs").as("_nv"))
            .hint("shuffle_hash"), col("_v") === col("_sv"))
          .select(col("_u"), col("_v"),
            graft.functions.TextHashExpressions
              .sortedIntersectCount(col("_nu"), col("_nv")).as("_k"))
        force(perEdge.groupBy(col("_u")).agg(sum(col("_k")).as("_s")))
      }),
      // edgeSupport with NO higher-order lambdas: one explode of the
      // witness array, then a plain 2-array explode for the two
      // witness-edge credits — every expression codegen'd
      "es_nohof" -> (() => {
        val e = edges.localCheckpoint(true)
        force(esNoHof(e))
      }),
      // LPA with the edge frame pre-partitioned by the per-round join
      // key and the round state kept co-partitioned, so each round's
      // join inserts no exchange on the 2m-row edge side (guide §2.4).
      "lpa4_pp" -> (() => {
        val e = edges
        val ed = e.select(col("u").as("s"), col("v").as("t"))
          .unionByName(e.select(col("v").as("s"), col("u").as("t")))
          .repartition(col("s"))
          .localCheckpoint(true)
        val lbl0 = ed.select(col("s").as("node")).distinct()
          .select(col("node"), col("node").as("lbl"))
          .localCheckpoint(true)
        var lbl = lbl0
        for (_ <- 1 to 4) {
          lbl = ed.join(lbl.withColumnRenamed("node", "s").hint("shuffle_hash"), "s")
            .repartition(col("t"))
            .groupBy(col("t").as("node"), col("lbl"))
            .agg(count(lit(1)).as("_c"))
            .groupBy(col("node"))
            .agg(min(struct((-col("_c")).as("_nc"), col("lbl").as("_l"))).as("_m"))
            .select(col("node"), col("_m._l").as("lbl"))
            .localCheckpoint(true)
        }
        force(lbl.select(col("node"), col("lbl").as("community")))
      }),
      // same but without the mid-round repartition(t): keeps the two
      // aggregation exchanges, only removes the edge-side join shuffle
      "lpa4_ppjoin" -> (() => {
        val e = edges
        val ed = e.select(col("u").as("s"), col("v").as("t"))
          .unionByName(e.select(col("v").as("s"), col("u").as("t")))
          .repartition(col("s"))
          .localCheckpoint(true)
        val lbl0 = ed.select(col("s").as("node")).distinct()
          .select(col("node"), col("node").as("lbl"))
          .localCheckpoint(true)
        var lbl = lbl0
        for (_ <- 1 to 4) {
          lbl = ed.join(lbl.withColumnRenamed("node", "s").hint("shuffle_hash"), "s")
            .groupBy(col("t").as("node"), col("lbl"))
            .agg(count(lit(1)).as("_c"))
            .groupBy(col("node"))
            .agg(min(struct((-col("_c")).as("_nc"), col("lbl").as("_l"))).as("_m"))
            .select(col("node"), col("_m._l").as("lbl"))
            .localCheckpoint(true)
        }
        force(lbl.select(col("node"), col("lbl").as("community")))
      }),
      // control: identical to the library labelPropagation, inlined
      "lpa4_inline" -> (() => {
        val e = edges
        val ed = e.select(col("u").as("s"), col("v").as("t"))
          .unionByName(e.select(col("v").as("s"), col("u").as("t")))
          .localCheckpoint(true)
        val lbl0 = ed.select(col("s").as("node")).distinct()
          .select(col("node"), col("node").as("lbl"))
          .localCheckpoint(true)
        var lbl = lbl0
        for (_ <- 1 to 4) {
          lbl = ed.join(lbl.withColumnRenamed("node", "s").hint("shuffle_hash"), "s")
            .groupBy(col("t").as("node"), col("lbl"))
            .agg(count(lit(1)).as("_c"))
            .groupBy(col("node"))
            .agg(min(struct((-col("_c")).as("_nc"), col("lbl").as("_l"))).as("_m"))
            .select(col("node"), col("_m._l").as("lbl"))
            .localCheckpoint(true)
        }
        force(lbl.select(col("node"), col("lbl").as("community")))
      }),
      // LPA with the edge frame repartitioned by the join key and
      // CACHED (cache preserves outputPartitioning; localCheckpoint
      // drops it) — every round's join should skip the 2m-row edge
      // exchange entirely
      "lpa4_cache" -> (() => {
        val e = edges
        val ed = e.select(col("u").as("s"), col("v").as("t"))
          .unionByName(e.select(col("v").as("s"), col("u").as("t")))
          .repartition(col("s"))
          .cache()
        ed.count()
        val lbl0 = ed.select(col("s").as("node")).distinct()
          .select(col("node"), col("node").as("lbl"))
          .localCheckpoint(true)
        var lbl = lbl0
        for (_ <- 1 to 4) {
          lbl = ed.join(lbl.withColumnRenamed("node", "s").hint("shuffle_hash"), "s")
            .groupBy(col("t").as("node"), col("lbl"))
            .agg(count(lit(1)).as("_c"))
            .groupBy(col("node"))
            .agg(min(struct((-col("_c")).as("_nc"), col("lbl").as("_l"))).as("_m"))
            .select(col("node"), col("_m._l").as("lbl"))
            .localCheckpoint(true)
        }
        force(lbl.select(col("node"), col("lbl").as("community")))
        ed.unpersist(false)
        ()
      }),
      "lpa_plan" -> (() => {
        val e = edges
        val ed = e.select(col("u").as("s"), col("v").as("t"))
          .unionByName(e.select(col("v").as("s"), col("u").as("t")))
          .repartition(col("s"))
          .localCheckpoint(true)
        val lbl0 = ed.select(col("s").as("node")).distinct()
          .select(col("node"), col("node").as("lbl"))
          .localCheckpoint(true)
        val r1 = ed.join(lbl0.withColumnRenamed("node", "s").hint("shuffle_hash"), "s")
          .groupBy(col("t").as("node"), col("lbl"))
          .agg(count(lit(1)).as("_c"))
          .groupBy(col("node"))
          .agg(min(struct((-col("_c")).as("_nc"), col("lbl").as("_l"))).as("_m"))
          .select(col("node"), col("_m._l").as("lbl"))
        r1.explain("formatted")
      }),
      "packed_init" -> (() => {
        val e = edges.localCheckpoint(true)
        force(graft.ops.Graph.neighborhoodSizes(e, radius = 0, p = 4))
      }),
      "nbr_sizes_r2" -> (() => {
        val e = edges.localCheckpoint(true)
        force(graft.ops.Graph.neighborhoodSizes(e, radius = 2, p = 4))
      })
    )
    val byName = experiments.toMap
    val sel: Seq[String] =
      if (args.length > 1) args.tail.toSeq else experiments.map(_._1)
    // arg order honored, duplicates allowed — interleave A,B,A,B and
    // read the per-name min to cancel JVM-warmth ordering bias.
    // "q:<registryName>" times a registered query (the Bench action).
    sel.foreach { name =>
      val f: () => Unit =
        if (name.startsWith("q:")) {
          val fn = SparkEntry.queries(name.drop(2))
          () => force(fn(spark, dir))
        } else byName(name)
      // force GC between runs so the ContextCleaner drops dead
      // checkpoint blocks — back-to-back heavy runs otherwise outpace
      // it and later runs measure block-manager pressure, not the plan
      def settle(): Unit = { System.gc(); Thread.sleep(1500); System.gc(); Thread.sleep(500) }
      settle()
      val t0 = System.nanoTime(); f(); val s1 = (System.nanoTime() - t0) / 1e9
      settle()
      val t1 = System.nanoTime(); f(); val s2 = (System.nanoTime() - t1) / 1e9
      println(f"[optprobe] $name%-16s cold=$s1%7.3f s  steady=$s2%7.3f s")
    }
    spark.stop()
  }
}
