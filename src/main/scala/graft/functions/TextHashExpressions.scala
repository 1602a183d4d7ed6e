package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MD5 halves + Kirsch-Mitzenmacher lane mixing, shared by the portable
  * hash expressions below. The 64-bit halves are the LITTLE-ENDIAN reads
  * of digest bytes [0,8) and [8,16), chosen to equal DuckDB's
  * `md5_number_upper` / `md5_number_lower` bit for bit — which is what
  * makes minhash/simhash signatures reproducible in a second engine and
  * therefore SQL-oracle-checkable (lane i = h1 + i·h2, wrapping).
  */
object Md5Mix {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val scratch = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](2)
  }

  /** (h1, h2) halves of md5(utf8 bytes of s). Returns a THREAD-LOCAL
    * array valid only until the next call on the same thread — consume
    * both values before hashing again. */
  def halves(s: UTF8String): Array[Long] = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    val out = scratch.get()
    out(0) = leLong(digest, 0)
    out(1) = leLong(digest, 8)
    out
  }

  private def leLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(off + k) & 0xFFL); k -= 1 }
    v
  }
}

/** Native Catalyst expressions for the dedup hot path.
  *
  * The composed-expression forms in graft.ops.Dedup
  * (transform/sequence/array_min lambda trees) evaluate
  * numHashes × |grams| lambda frames and materialize an intermediate
  * array per lane. These expressions compute the identical values in ONE
  * pass over the input array inside whole-stage codegen.
  *
  * Two hash chains are provided, same signature semantics, different
  * lane derivation:
  *   - xxhash64 chain (graft_minhash / graft_simhash): lane i =
  *     xxhash64(i, gram) — Spark-native, bit-compatible with the
  *     composed lambda formulation, not reproducible outside Spark.
  *   - md5 chain (graft_minhash_md5 / graft_simhash_md5): lanes mixed
  *     from the two md5 halves (see [[Md5Mix]]) — reproducible in any
  *     engine with an md5 (DuckDB, Trino, Postgres), which is what the
  *     dedup operators default to so their outputs are oracle-checkable.
  */
object TextHashExpressions {

  private val SPARK_XXHASH_SEED = 42L

  private def requireStringArray(child: Expression, fn: String): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn requires array<string>, got ${other.catalogString}")
    }

  /** graft_minhash(array<string>, numHashes) -> array<long>.
    * Empty/absent grams → all-Long.MaxValue sentinel (deterministic). */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {

    require(numHashes > 0, "numHashes must be positive")

    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash"

    // lane seed i == xxhash64's running hash after folding the int literal i
    private lazy val laneSeeds: Array[Long] =
      Array.tabulate(numHashes)(i => XXH64.hashInt(i, SPARK_XXHASH_SEED))

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val lanes = Array.fill(numHashes)(Long.MaxValue)
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val g = arr.getUTF8String(j)
          var i = 0
          while (i < numHashes) {
            val h = XXH64.hashUTF8String(g, laneSeeds(i))
            if (h < lanes(i)) lanes(i) = h
            i += 1
          }
        }
        j += 1
      }
      new GenericArrayData(lanes)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val seedsRef = ctx.addReferenceObj("laneSeeds", laneSeeds, "long[]")
      nullSafeCodeGen(ctx, ev, arr => {
        val lanes = ctx.freshName("lanes")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val g = ctx.freshName("gram")
        val h = ctx.freshName("h")
        s"""
           |long[] $lanes = new long[$numHashes];
           |java.util.Arrays.fill($lanes, Long.MAX_VALUE);
           |for (int $j = 0; $j < $arr.numElements(); $j++) {
           |  if (!$arr.isNullAt($j)) {
           |    org.apache.spark.unsafe.types.UTF8String $g = $arr.getUTF8String($j);
           |    for (int $i = 0; $i < $numHashes; $i++) {
           |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64
           |        .hashUTF8String($g, $seedsRef[$i]);
           |      if ($h < $lanes[$i]) $lanes[$i] = $h;
           |    }
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lanes);
           |""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  /** graft_minhash_md5(array<string>, numHashes) -> array<long>: the
    * engine-portable minhash. Lane i of a gram = h1 + i·h2 (wrapping)
    * over the md5 halves; signature lane i = min over grams. Empty/
    * absent grams → all-Long.MaxValue sentinel, same as the xxhash
    * chain. */
  case class PortableMinHash(child: Expression, numHashes: Int)
      extends UnaryExpression {

    require(numHashes > 0, "numHashes must be positive")

    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_md5"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val lanes = Array.fill(numHashes)(Long.MaxValue)
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val hs = Md5Mix.halves(arr.getUTF8String(j))
          val h2 = hs(1)
          var h = hs(0)
          var i = 0
          while (i < numHashes) {
            if (h < lanes(i)) lanes(i) = h
            h += h2
            i += 1
          }
        }
        j += 1
      }
      new GenericArrayData(lanes)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val lanes = ctx.freshName("lanes")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val hs = ctx.freshName("hs")
        val h = ctx.freshName("h")
        val h2 = ctx.freshName("h2")
        s"""
           |long[] $lanes = new long[$numHashes];
           |java.util.Arrays.fill($lanes, Long.MAX_VALUE);
           |for (int $j = 0; $j < $arr.numElements(); $j++) {
           |  if (!$arr.isNullAt($j)) {
           |    long[] $hs = graft.functions.Md5Mix.halves($arr.getUTF8String($j));
           |    long $h = $hs[0];
           |    long $h2 = $hs[1];
           |    for (int $i = 0; $i < $numHashes; $i++) {
           |      if ($h < $lanes[$i]) $lanes[$i] = $h;
           |      $h += $h2;
           |    }
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lanes);
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): PortableMinHash =
      copy(child = newChild)
  }

  /** graft_md5_upper(string) -> long: the first little-endian md5 half
    * of the input's utf8 bytes — DuckDB's md5_number_upper as a signed
    * 64-bit value. The primitive behind deterministic content-keyed
    * sampling (graft.ops.Sampling): one scalar hash per row, portable. */
  case class Md5Upper(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.catalogString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_md5_upper"

    override def nullSafeEval(input: Any): Any =
      Md5Mix.halves(input.asInstanceOf[UTF8String])(0)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.Md5Mix.halves($s)[0];")

    override protected def withNewChildInternal(newChild: Expression): Md5Upper =
      copy(child = newChild)
  }

  /** graft_simhash_md5(array<string>) -> long: engine-portable 64-bit
    * SimHash — per-token hash is the FIRST md5 half (DuckDB
    * md5_number_upper), bit votes as in the xxhash chain. Empty → 0L. */
  case class PortableSimHash(child: Expression)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, prettyName)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash_md5"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counters = new Array[Int](64)
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val h = Md5Mix.halves(arr.getUTF8String(j))(0)
          var i = 0
          while (i < 64) {
            counters(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
            i += 1
          }
        }
        j += 1
      }
      var fp = 0L
      var i = 0
      while (i < 64) { if (counters(i) > 0) fp |= (1L << i); i += 1 }
      fp
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val counters = ctx.freshName("counters")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        val fp = ctx.freshName("fp")
        s"""
           |int[] $counters = new int[64];
           |for (int $j = 0; $j < $arr.numElements(); $j++) {
           |  if (!$arr.isNullAt($j)) {
           |    long $h = graft.functions.Md5Mix.halves($arr.getUTF8String($j))[0];
           |    for (int $i = 0; $i < 64; $i++) {
           |      $counters[$i] += ((($h >>> $i) & 1L) == 1L) ? 1 : -1;
           |    }
           |  }
           |}
           |long $fp = 0L;
           |for (int $i = 0; $i < 64; $i++) {
           |  if ($counters[$i] > 0) $fp |= (1L << $i);
           |}
           |${ev.value} = $fp;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): PortableSimHash =
      copy(child = newChild)
  }

  /** graft_simhash(array<string>) -> long: 64-bit SimHash over token
    * hashes, one pass, 64 sign counters. Empty input → 0L. */
  case class SimHash64(child: Expression)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, prettyName)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counters = new Array[Int](64)
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val h = XXH64.hashUTF8String(arr.getUTF8String(j), SPARK_XXHASH_SEED)
          var i = 0
          while (i < 64) {
            counters(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
            i += 1
          }
        }
        j += 1
      }
      var fp = 0L
      var i = 0
      while (i < 64) { if (counters(i) > 0) fp |= (1L << i); i += 1 }
      fp
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val counters = ctx.freshName("counters")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        val fp = ctx.freshName("fp")
        s"""
           |int[] $counters = new int[64];
           |for (int $j = 0; $j < $arr.numElements(); $j++) {
           |  if (!$arr.isNullAt($j)) {
           |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
           |      .hashUTF8String($arr.getUTF8String($j), ${SPARK_XXHASH_SEED}L);
           |    for (int $i = 0; $i < 64; $i++) {
           |      $counters[$i] += ((($h >>> $i) & 1L) == 1L) ? 1 : -1;
           |    }
           |  }
           |}
           |long $fp = 0L;
           |for (int $i = 0; $i < 64; $i++) {
           |  if ($counters[$i] > 0) $fp |= (1L << $i);
           |}
           |${ev.value} = $fp;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** graft_shingles(tokens: array<string>, n) -> array<string>: DISTINCT
    * word n-grams (space-joined), first-occurrence order — the one-pass
    * form of transform(sequence(...), i -> concat_ws(...)) + array_distinct,
    * which costs O(tokens) interpreted lambda frames per row plus an
    * intermediate non-distinct array. Shorter-than-n input → empty array.
    */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression {

    require(n > 0, "shingle size must be positive")

    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, prettyName)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_shingles"

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val numToks = toks.numElements()
      val out = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i <= numToks - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          // null tokens stay null: concatWs skips them, matching the
          // composed concat_ws fallback bit for bit
          parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        out.add(UTF8String.concatWs(WordShingles.Space, parts: _*))
        i += 1
      }
      new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // hoisted: one separator object per plan, not one per shingle
      val space = ctx.addReferenceObj("space", WordShingles.Space,
        "org.apache.spark.unsafe.types.UTF8String")
      nullSafeCodeGen(ctx, ev, toks => {
        val out = ctx.freshName("out")
        val parts = ctx.freshName("parts")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val u8 = "org.apache.spark.unsafe.types.UTF8String"
        s"""
           |java.util.LinkedHashSet<$u8> $out = new java.util.LinkedHashSet<$u8>();
           |for (int $i = 0; $i <= $toks.numElements() - $n; $i++) {
           |  $u8[] $parts = new $u8[$n];
           |  for (int $j = 0; $j < $n; $j++) {
           |    $parts[$j] = $toks.isNullAt($i + $j)
           |      ? null : $toks.getUTF8String($i + $j);
           |  }
           |  $out.add($u8.concatWs($space, $parts));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  $out.toArray());
           |""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): WordShingles =
      copy(child = newChild)
  }

  object WordShingles {
    private[functions] val Space: UTF8String = UTF8String.fromString(" ")
  }

  /** graft_sig_agree(array<long>, array<long>) -> long: number of
    * positions where the two arrays hold equal non-null values — the
    * minhash lane-agreement count, evaluated once per candidate pair. */
  case class SignatureAgreement(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"graft_sig_agree requires (array<bigint>, array<bigint>), got (${l.catalogString}, ${r.catalogString})")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_sig_agree"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var agree = 0L
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) agree += 1
        i += 1
      }
      agree
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val agree = ctx.freshName("agree")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $agree = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i)
           |      && $a.getLong($i) == $b.getLong($i)) $agree++;
           |}
           |${ev.value} = $agree;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SignatureAgreement =
      copy(left = newLeft, right = newRight)
  }

  /** graft_sorted_intersect_count(array<bigint>, array<bigint>) -> bigint:
    * two-pointer intersection count of two SORTED long arrays. The
    * array_intersect + size composition allocates a hash set and a
    * result array per row — this is the triangle-counting inner loop
    * (one intersection per oriented edge), so it gets a zero-allocation
    * codegen pass. Inputs MUST be sorted ascending (sort_array upstream
    * is the contract); null elements are skipped on either side. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"graft_sorted_intersect_count requires (array<bigint>, array<bigint>), got (${l.catalogString}, ${r.catalogString})")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_sorted_intersect_count"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val na = a.numElements()
      val nb = b.numElements()
      var i = 0
      var j = 0
      var k = 0L
      while (i < na && j < nb) {
        if (a.isNullAt(i)) i += 1
        else if (b.isNullAt(j)) j += 1
        else {
          val x = a.getLong(i)
          val y = b.getLong(j)
          if (x == y) { k += 1; i += 1; j += 1 }
          else if (x < y) i += 1
          else j += 1
        }
      }
      k
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val k = ctx.freshName("k")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |int $na = $a.numElements();
           |int $nb = $b.numElements();
           |int $i = 0; int $j = 0; long $k = 0L;
           |while ($i < $na && $j < $nb) {
           |  if ($a.isNullAt($i)) { $i++; }
           |  else if ($b.isNullAt($j)) { $j++; }
           |  else {
           |    long $x = $a.getLong($i);
           |    long $y = $b.getLong($j);
           |    if ($x == $y) { $k++; $i++; $j++; }
           |    else if ($x < $y) { $i++; } else { $j++; }
           |  }
           |}
           |${ev.value} = $k;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCount =
      copy(left = newLeft, right = newRight)
  }

  /** graft_dot(array<double>, array<double>) -> double: one-pass dot
    * product. The zip_with/aggregate formulation allocates a zipped
    * array and runs interpreted lambda frames per element — this is the
    * pairwise-similarity inner loop, so it gets codegen. Null elements
    * contribute 0; length mismatch uses the shorter prefix. */
  case class DotProduct(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires (array<double>, array<double>), got (${l.catalogString}, ${r.catalogString})")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getDouble(i) * b.getDouble(i)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
           |    $acc += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** graft_srp_codes(array<double>) -> array<long>: all nTables
    * sign-random-projection bucket codes of a vector in ONE codegen
    * pass. The composed form (transform × aggregate × per-plane
    * graft_dot) runs nTables·nPlanes interpreted lambda frames per row —
    * this is the ANN indexing hot loop, so it gets a native expression
    * with the plane matrix attached as a reference object. Table t's
    * code: bit p = sign of vec · planes[t·nPlanes + p]. Null elements
    * contribute 0 to the dot (graft_dot convention). */
  case class SrpCodes(child: Expression, planes: Array[Array[Double]], nTables: Int)
      extends UnaryExpression {

    require(nTables > 0 && planes.length % nTables == 0,
      s"planes (${planes.length}) must be a multiple of nTables ($nTables)")
    private val nPlanes = planes.length / nTables

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.catalogString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_srp_codes"

    override def nullSafeEval(input: Any): Any = {
      val vec = input.asInstanceOf[ArrayData]
      val n = vec.numElements()
      val codes = new Array[Long](nTables)
      var t = 0
      while (t < nTables) {
        var code = 0L
        var p = 0
        while (p < nPlanes) {
          val plane = planes(t * nPlanes + p)
          val dims = math.min(n, plane.length)
          var acc = 0.0
          var i = 0
          while (i < dims) {
            if (!vec.isNullAt(i)) acc += vec.getDouble(i) * plane(i)
            i += 1
          }
          // NaN counts as positive — Spark SQL's NaN-is-largest ordering
          // (what the composed when(dot > 0) form evaluates to), kept so
          // native and composed bucket NaN-bearing vectors identically
          if (acc > 0 || java.lang.Double.isNaN(acc)) code |= (1L << p)
          p += 1
        }
        codes(t) = code
        t += 1
      }
      new GenericArrayData(codes)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, vec => {
        val codes = ctx.freshName("codes")
        val t = ctx.freshName("t")
        val p = ctx.freshName("p")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val code = ctx.freshName("code")
        val plane = ctx.freshName("plane")
        val dims = ctx.freshName("dims")
        s"""
           |long[] $codes = new long[$nTables];
           |for (int $t = 0; $t < $nTables; $t++) {
           |  long $code = 0L;
           |  for (int $p = 0; $p < $nPlanes; $p++) {
           |    double[] $plane = $planesRef[$t * $nPlanes + $p];
           |    int $dims = java.lang.Math.min($vec.numElements(), $plane.length);
           |    double $acc = 0.0;
           |    for (int $i = 0; $i < $dims; $i++) {
           |      if (!$vec.isNullAt($i)) $acc += $vec.getDouble($i) * $plane[$i];
           |    }
           |    if ($acc > 0 || java.lang.Double.isNaN($acc)) $code |= (1L << $p);
           |  }
           |  $codes[$t] = $code;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
           |""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): SrpCodes =
      copy(child = newChild)
  }

  private def intLiteral(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Function descriptors for SparkSessionExtensions.injectFunction /
    * direct registry registration. */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash(grams, numHashes)")
        MinHashSignature(args.head, intLiteral(args(1), "numHashes"))
      }),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash(tokens)")
        SimHash64(args.head)
      }),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b)")
        DotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_shingles(tokens, n)")
        WordShingles(args.head, intLiteral(args(1), "n"))
      }),
    (FunctionIdentifier("graft_sig_agree"),
      new ExpressionInfo(classOf[SignatureAgreement].getName, "graft_sig_agree"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_sig_agree(a, b)")
        SignatureAgreement(args.head, args(1))
      }),
    (FunctionIdentifier("graft_minhash_md5"),
      new ExpressionInfo(classOf[PortableMinHash].getName, "graft_minhash_md5"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash_md5(grams, numHashes)")
        PortableMinHash(args.head, intLiteral(args(1), "numHashes"))
      }),
    (FunctionIdentifier("graft_simhash_md5"),
      new ExpressionInfo(classOf[PortableSimHash].getName, "graft_simhash_md5"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash_md5(tokens)")
        PortableSimHash(args.head)
      }),
    (FunctionIdentifier("graft_md5_upper"),
      new ExpressionInfo(classOf[Md5Upper].getName, "graft_md5_upper"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_md5_upper(s)")
        Md5Upper(args.head)
      }))

  // --- typed Column builders -----------------------------------------
  // Direct expression construction via the classic Column<->Expression
  // bridge: works in ANY session with no function registration (the
  // registry below only serves the SQL string surface).

  private def expr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)
  private def toCol(e: Expression) =
    org.apache.spark.sql.graft.ColumnBridge.column(e)

  def minhash(grams: org.apache.spark.sql.Column, numHashes: Int): org.apache.spark.sql.Column =
    toCol(MinHashSignature(expr(grams), numHashes))
  def simhash(tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    toCol(SimHash64(expr(tokens)))
  def minhashMd5(grams: org.apache.spark.sql.Column, numHashes: Int): org.apache.spark.sql.Column =
    toCol(PortableMinHash(expr(grams), numHashes))
  def simhashMd5(tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    toCol(PortableSimHash(expr(tokens)))
  def md5Upper(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    toCol(Md5Upper(expr(s)))
  def srpCodes(vec: org.apache.spark.sql.Column, planes: Array[Array[Double]],
      nTables: Int): org.apache.spark.sql.Column =
    toCol(SrpCodes(expr(vec), planes, nTables))
  def dotProduct(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    toCol(DotProduct(expr(a), expr(b)))
  def shingles(tokens: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    toCol(WordShingles(expr(tokens), n))
  def sigAgreement(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    toCol(SignatureAgreement(expr(a), expr(b)))
  def sortedIntersectCount(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    toCol(SortedIntersectCount(expr(a), expr(b)))

  /** Idempotent per-session registration (for the SQL string surface;
    * the typed builders above need no registration). */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    descriptors.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}

/** spark.sql.extensions entry point:
  * .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * Injects the SQL function surface AND both engine scale guards:
  *   - graft.plans.UnpartitionedWindowGuard
  *     (opt out: spark.graft.failUnpartitionedWindow=false)
  *   - graft.plans.UnboundedCrossJoinGuard
  *     (opt out: spark.graft.failUnboundedCrossJoin=false) */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    TextHashExpressions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.UnpartitionedWindowGuard)
    ext.injectOptimizerRule(_ => graft.plans.UnboundedCrossJoinGuard)
  }
}
