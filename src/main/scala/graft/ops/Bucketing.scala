package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (co-located) joins: the zero-shuffle path for repeated
  * fact-to-fact joins at scale.
  *
  * A shuffle join moves BOTH sides across the network every time the
  * join runs. Bucketing pays that shuffle ONCE at write time: both
  * tables are hash-partitioned into the same number of buckets on the
  * join key, and every later join (or groupBy on the key) reads
  * bucket-aligned splits with no Exchange in the plan. At 100 TB this is
  * the difference between re-shuffling 100 TB per query and never
  * shuffling it again — the same idea as the reference's hive
  * ano/mes layout (partition pruning), applied to join keys.
  *
  * Constraints Spark imposes: bucketed tables live in the catalog
  * (saveAsTable, not path-based writes), both sides need the same bucket
  * count (or a multiple, with spark.sql.bucketing.coalesceBucketsInJoin),
  * and bucket pruning applies to equality filters on the bucket column.
  */
object Bucketing {

  /** Write df as a bucketed+sorted catalog table (overwrite). Sorting
    * within buckets additionally enables sort-merge joins without a
    * per-task sort. `path` makes it an EXTERNAL table at that location
    * (bucketed tables must live in the catalog for the planner to trust
    * the layout, but their files can live anywhere — on a cluster, the
    * object store). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sortBy: Seq[String] = Seq.empty, path: Option[String] = None): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val w0 = df.write.mode("overwrite").bucketBy(buckets, key)
    val w1 = path.fold(w0)(p => w0.option("path", p))
    (if (sortBy.nonEmpty) w1.sortBy(sortBy.head, sortBy.tail: _*) else w1)
      .format("parquet").saveAsTable(table)
  }

  /** Join two equally-bucketed tables on their bucket key — planner
    * elides both Exchanges (verified in BucketingSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True iff the executed plan of df contains a shuffle Exchange of
    * any partitioning (hash, range, round-robin, single) — broadcast
    * exchanges move data but are not shuffles and are excluded. */
  def hasShuffle(df: DataFrame): Boolean =
    "(?<!Broadcast)Exchange ".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined

  /** Z-order (Morton) interleave of the low `bits` bits of two integral
    * columns: x occupies the even result bits, y the odd — so sorting or
    * range-partitioning on the key clusters rows that are close in BOTH
    * dimensions, which is what makes multi-column min/max file pruning
    * effective at scale (sort on (x, y) prunes only on x). Pure integer
    * bit arithmetic (2·bits codegen'd terms, no shuffle, engine-portable
    * — writable in DuckDB SQL, noting the masking here is pmod
    * (non-negative for any sign), so the SQL twin must spell it
    * ((v % m) + m) % m, not bare sign-preserving %). */
  def zOrderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1, 16], got $bits")
    val xm = pmod(x.cast("long"), lit(1L << bits))
    val ym = pmod(y.cast("long"), lit(1L << bits))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }
}
