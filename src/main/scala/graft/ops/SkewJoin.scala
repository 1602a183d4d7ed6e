package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salting. AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin) covers sort-merge joins at runtime, but
  * a join whose hot key is 100× the median still serializes one reducer
  * unless the key space is widened. Salting is the static fix: explode
  * the small side `factor`× (one copy per salt), add a uniform random-ish
  * salt on the big side, and join on (key, salt) — the hot key's rows
  * spread over `factor` reducers.
  *
  * The salt must be DETERMINISTIC per row (we derive it from a hash of
  * the row's other columns, not rand()) so retries and speculative tasks
  * produce identical partitions — nondeterministic salting breaks
  * exactly-once shuffle semantics at scale.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `key`, with the big side's rows
    * spread across `factor` salt buckets. `saltSource` columns (from the
    * big side) feed the deterministic salt hash. Result == plain join,
    * partition profile != (that's the point). */
  def saltedInner(big: DataFrame, small: DataFrame, key: String,
      factor: Int, saltSource: Seq[String]): DataFrame = {
    require(factor > 0)
    val salted = big.withColumn("_salt",
      pmod(xxhash64(saltSource.map(col): _*), lit(factor)).cast("int"))
    val exploded = small
      .withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Skewed aggregation via two-phase (partial on (key, salt) → final on
    * key): what Spark's partial aggregation already does for algebraic
    * aggregates — exposed explicitly for aggregates where the first
    * phase must bound per-reducer cardinality (e.g. collect-like ops). */
  def twoPhaseCount(df: DataFrame, key: String, factor: Int,
      saltSource: Seq[String]): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(saltSource.map(col): _*), lit(factor)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum("_partial").as("n"))

  /** Skew DIAGNOSIS — the missing half of [[saltedInner]], which makes
    * the caller pick `factor` blind: the top-`topK` heaviest keys with
    * their share of the table (exact integer ppm) and the salt factor
    * that would level each onto average-sized reducers,
    * ceil(n_key / (n_total / numPartitions)) — "how many reducers of
    * mean size does this key need". One hash-agg + a broadcast 1-row
    * total + a windowless TakeOrdered rank; integer arithmetic end to
    * end, so the report is an oracle-checkable operator, not a
    * driver-side printout. */
  def skewReport(df: DataFrame, key: String, topK: Int,
      numPartitions: Int): DataFrame = {
    require(topK > 0 && numPartitions > 0)
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    // total via a SECOND direct scan, deliberately: it reads zero
    // columns (parquet count-star touches row-group metadata only),
    // whereas summing `counts` would re-execute the groupBy shuffle —
    // Catalyst guarantees no exchange reuse across aggregate branches
    // (the pmiScores/t06 lesson)
    val total = df.agg(count(lit(1)).as("_total"))
    Ranking.rankTop(counts, Seq(col("n").desc, col(key)), topK, "rank")
      .crossJoin(broadcast(total))
      .select(col(key), col("n"), col("rank"),
        expr("n * 1000000 DIV _total").as("share_ppm"),
        // ceil(n / (total/parts)) in exact integers:
        // (n * parts + total - 1) DIV total
        expr(s"(n * $numPartitions + _total - 1) DIV _total").as("suggested_salt"))
  }
}
