package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (see /root/repo/TESTDATA.md).
  *
  * One loader per table so every query goes through a single,
  * schema-aware entry point (filter/projection pushdown stays intact —
  * these return the raw scan, callers select/filter on top).
  */
object Tables {
  // Memoized per (session, path): spark.read.parquet re-lists files and
  // re-reads footers on every call, a fixed ~50-100 ms tax per query.
  // The DataFrame (and its resolved file index) is immutable — reusing
  // it across the 54 harness queries removes that per-query floor.
  //
  // Lifetime is bounded, not weak: a weak-keyed map cannot evict here
  // because the cached DataFrame values strongly reference their
  // SparkSession, pinning the key forever. Instead the cache is an LRU
  // capped at MaxEntries (a dead session's entries age out under any
  // continued use) plus an explicit invalidate(session) hook for prompt
  // release when a session is discarded.
  private val MaxEntries = 256
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        size() > MaxEntries
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.synchronized {
      val key = (spark, s"$dir/$name.parquet")
      var df = cache.get(key)
      if (df == null) { df = spark.read.parquet(key._2); cache.put(key, df) }
      df
    }

  /** Drop every cached reader of this session (call when discarding a
    * session before JVM exit). */
  def invalidate(spark: SparkSession): Unit = cache.synchronized {
    cache.keySet.removeIf(_._1 eq spark)
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright (PARQUET_TYPE_ILLEGAL). Read the
    * nanos as a raw long (legacy conf) and floor-convert to a microsecond
    * timestamp — the identical truncation DuckDB applies when it loads a
    * TIMESTAMP_NS column, so oracle comparisons line up to the microsecond.
    *
    * Layout-adaptive, normalizing to ONE type: whatever the file stores
    * (INT64 nanos, micros-no-tz → Spark TIMESTAMP_NTZ, or tz-adjusted
    * micros → TIMESTAMP), `ts` leaves this loader as the session-zoned
    * TIMESTAMP type. The session timezone is pinned UTC repo-wide
    * (GraftSession / Verify), so the NTZ→instant cast is value-identical
    * — DuckDB reads the same file as a naive timestamp and both engines
    * agree to the microsecond. Normalizing here (rather than tolerating
    * NTZ downstream) matters because `unix_micros` — the repo's
    * timestamp→integer seam, see [[tsMicros]] — accepts only TIMESTAMP.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => // TIMESTAMP_NTZ or any other timestamp layout
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  /** Timestamp → exact integer microseconds since epoch — the repo's
    * single seam for that conversion. `unix_micros` is the only
    * TIMESTAMP-only (NTZ-rejecting) Spark function the repo uses; the
    * cast makes every call site layout-proof, so a future testdata
    * layout change (nanos → micros-NTZ happened between rounds 7 and 8
    * and broke two queries) has exactly one place to hit. Under the
    * repo's pinned-UTC session the cast is value-identical for both NTZ
    * and instant inputs, and a no-op for already-TIMESTAMP columns. */
  def tsMicros(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
}

/** Exact-arithmetic helpers.
  *
  * Double summation is order-dependent, and Spark's shuffle order is
  * nondeterministic — a plain sum(double) can hash-mismatch a
  * single-threaded DuckDB oracle in the last bits. Money columns in the
  * testdata carry 2 decimals, so we sum exact integer cents
  * (round(x*100) as long: both Spark and DuckDB round doubles
  * half-away-from-zero, verified) and convert back to double once, at the
  * end. Integer sums are associative — any partition/merge order gives
  * the identical result on both engines.
  */
object Exact {
  /** x (2-decimal double) -> exact integer cents. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Sum a 2-decimal money column exactly; emit the total as double. */
  def moneySum(c: Column): Column = sum(cents(c)).cast("double") / 100

  /** Exact integer-cents sum kept as a long. */
  def centsSum(c: Column): Column = sum(cents(c))

  /** Σcents div 100 — the sum in WHOLE dollars, truncated toward zero
    * (matching DuckDB's `//`): the resolution drop that keeps x·y
    * regression/product sums inside 2⁶³ at large SF. Takes the column
    * NAME because integer `div` has no Column-API form (expr-string
    * only) — centralized here so the quantization idiom has one home. */
  def centsSumDollars(colName: String): Column =
    expr(s"sum(cast(round($colName * 100) as long)) div 100L")
}
