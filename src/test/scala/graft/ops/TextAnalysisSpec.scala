package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the lexicon with the highest hit count") {
    val df = Seq(
      (1L, "the cat of the house and a dog"),
      (2L, "el perro de la casa que ladra los dias"),
      (3L, "der hund und die katze das ist gut"),
      (4L, "xyzzy plugh qwerty"),
      (5L, "你好世界")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.langId(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "unknown", 5L -> "zh"))
  }

  test("token counts: whitespace vs regex tokenizer") {
    val df = Seq("hello world, it's 42 degrees!").toDF("text")
    val r = df.select(
      TextAnalysis.whitespaceTokenCount(col("text")),
      TextAnalysis.regexTokenCount(col("text"))).collect()(0)
    assert(r.getLong(0) == 5)
    // hello|world|,|it|'|s|42|degrees|! = 9
    assert(r.getLong(1) == 9)
  }

  test("quality score bands: clean english text scores 4, junk scores low") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog near a river bank",
      "!!!! ???? ####"
    ).toDF("text")
    val t = col("text")
    val got = df.select(TextAnalysis.qualityScore(t,
      TextAnalysis.whitespaceTokenCount(t), TextAnalysis.punctCount(t)))
      .as[Long].collect()
    assert(got(0) == 4L)
    assert(got(1) <= 1L)
  }

  test("fingerprint is whitespace/case-canonical") {
    val df = Seq(
      ("A", "The  Quick   Fox"),
      ("B", "  the quick fox "),
      ("C", "the quick fox!")
    ).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fps("A") == fps("B"))
    assert(fps("A") != fps("C"))
  }

  test("PII scan counts and redaction replace emails, phones, masked ids") {
    val df = Seq(
      "contact me at jane.doe+x@example.co.uk or +55 91234 5678 today",
      "favorecido ***687963** paid twice: ***123456** and ***123456**",
      "no pii here at all"
    ).toDF("text")
    val t = col("text")
    val got = df.select(
      TextAnalysis.piiCount(t, TextAnalysis.piiPatterns(0)._2).as("e"),
      TextAnalysis.piiCount(t, TextAnalysis.piiPatterns(1)._2).as("p"),
      TextAnalysis.piiCount(t, TextAnalysis.piiPatterns(2)._2).as("m"),
      TextAnalysis.redactPii(t).as("red"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0)._1 == 1 && got(0)._2 == 1)
    assert(got(0)._4 == "contact me at [EMAIL] or [PHONE] today")
    assert(got(1)._3 == 3)
    assert(got(1)._4 == "favorecido [ID] paid twice: [ID] and [ID]")
    assert(got(2) == ((0L, 0L, 0L, "no pii here at all")))
  }

  test("meanTokenLen and stopwordRatio handle empty-ish text") {
    val df = Seq("ab cd", "").toDF("text")
    val rows = df.select(
      TextAnalysis.meanTokenLen(col("text")),
      TextAnalysis.stopwordRatio(col("text"))).collect()
    assert(rows(0).getDouble(0) == 2.0)
    assert(rows(0).getDouble(1) == 0.0)
  }

  test("repetitionStats: repeated text scores high dup fraction, varied text scores 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),   // 5 bigrams, 1 distinct
      (2L, "all words completely different here"), // 4 bigrams, 4 distinct
      (3L, "hi"),                               // no bigrams
      (4L, "a b a b a b")                       // 5 bigrams, 2 distinct
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(6)))).toMap
    assert(got(1L) == ((5L, 1L, 1.0 - 1.0 / 5, 1.0 - 1.0 / 4)))
    assert(got(2L) == ((4L, 4L, 0.0, 0.0)))
    assert(got(3L) == ((0L, 0L, 0.0, 0.0)))
    assert(got(4L)._3 == 1.0 - 2.0 / 5) // "a b"/"b a" alternate
    // null text: an all-zero row, never distinct > total
    val withNull = Seq((9L, null: String)).toDF("doc_id", "text")
    val nr = TextAnalysis.repetitionStats(withNull, "doc_id", "text").collect()(0)
    assert((1 to 6).map(i => nr.get(i)) == Seq(0L, 0L, 0.0, 0L, 0L, 0.0))
  }

  test("tokenEntropy: uniform text → 0, distinct tokens → ln(n), mixed in between") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),        // one term: H = 0
      (2L, "a b c d"),        // uniform over 4: H = ln 4
      (3L, "a a b b"),        // counts [2,2] of 4: H = ln 2
      (4L, "x")               // single token: H = 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 1L, 0.0)))
    assert(got(2L)._1 == 4L && got(2L)._2 == 4L)
    assert(math.abs(got(2L)._3 - math.log(4)) < 1e-6)
    assert(math.abs(got(3L)._3 - math.log(2)) < 1e-6)
    assert(got(4L) == ((1L, 1L, 0.0)))
    // determinism: repartitioning must not flip a single bit (sorted fold)
    val a = TextAnalysis.tokenEntropy(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val b = TextAnalysis.tokenEntropy(docs.repartition(5), "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(a == b)
  }

  test("bigramCounts: exact conditional probabilities, short docs contribute nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a c"),   // bigrams: ab, ba, ab, ba, ac
      (2L, "a b"),           // ab
      (3L, "solo")           // no bigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramCounts(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // history a· occurs 4 times: ab×3, ac×1
    assert(got(("a", "b")) == ((3L, 4L, 0.75)))
    assert(got(("a", "c")) == ((1L, 4L, 0.25)))
    assert(got(("b", "a")) == ((2L, 2L, 1.0)))
    assert(!got.contains(("solo", "solo")))
    assert(got.size == 3)
    // per-history probabilities always sum to 1 when nothing is filtered
    val sums = got.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._3).sum)
    sums.foreach { case (_, s) => assert(math.abs(s - 1.0) < 1e-12) }
  }

  test("buildVocab + encodeTokens: frequency-ranked ids, OOV → 0, order preserved") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a b rare")).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, "text", size = 3)
    val ids = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // b(4) > a(3) > c(1)=rare(1) tie broken lexically: c wins the last slot
    assert(ids == Map("b" -> 1L, "a" -> 2L, "c" -> 3L))
    val enc = TextAnalysis.encodeTokens(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(enc(1L) == ((6L, "1,1,1,2,2,3")))
    assert(enc(2L) == ((3L, "2,1,0")))    // rare is OOV under size=3
    // determinism under repartitioning (collected structs are sorted)
    val enc2 = TextAnalysis.encodeTokens(docs.repartition(5), "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(enc2 == enc.map { case (k, v) => k -> v._2 })
  }

  test("topTerms ranks by tf desc then rarity (df asc) then term, capped at k") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple apple banana banana cherry"),
      (2L, "banana banana banana durian durian cherry")).toDF("doc_id", "text")
    val got = TextAnalysis.topTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val doc1 = got.filter(_._1 == 1L).sortBy(_._6)
    // apple tf=3 wins; banana tf=2 beats cherry tf=1
    assert(doc1.map(t => (t._2, t._3, t._6)).toSeq == Seq(("apple", 3L, 1L), ("banana", 2L, 2L)))
    val doc2 = got.filter(_._1 == 2L).sortBy(_._6)
    // banana tf=3 first; durian tf=2 (df=1, rarer than cherry df=2) second
    assert(doc2.map(t => (t._2, t._3, t._6)).toSeq == Seq(("banana", 3L, 1L), ("durian", 2L, 2L)))
    // df counts documents containing the term corpus-wide; cf its total
    // occurrences (banana: docs 1+2, 2+3 occurrences)
    assert(got.find(t => t._2 == "banana").get._4 == 2L)
    assert(got.find(t => t._2 == "banana").get._5 == 5L)
  }

  test("pmiScores: margins and sign match the hand-computed contingency table") {
    import spark.implicits._
    // bigrams: (a,b)×2, (c,b)×1, (c,d)×1 → N=4; n_w1: a=2,c=2; n_w2: b=3,d=1
    val docs = Seq("a b", "a b", "c b", "c d").toDF("text")
    val got = TextAnalysis.pmiScores(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got(("a", "b")) == ((2L, 2L, 3L, math.rint(math.log(4.0 / 3) * 1e6) / 1e6)))
    assert(got(("c", "d")) == ((1L, 2L, 1L, math.rint(math.log(2.0) * 1e6) / 1e6)))
    // (c,b) is ANTI-collocated: observed below independence → negative pmi
    assert(got(("c", "b"))._4 < 0)
  }

  test("bpePairCounts weights char pairs by word frequency, ranks count desc") {
    import spark.implicits._
    // terms: aab×2, ab×1 → pairs: aa←2, ab←2(from aab)+1(from ab)=3
    val docs = Seq("aab aab ab").toDF("text")
    val got = TextAnalysis.bpePairCounts(docs, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("ab", 3L, 1L), ("aa", 2L, 2L)))
    // single-char words carry no pairs
    val single = Seq("a a a b").toDF("text")
    assert(TextAnalysis.bpePairCounts(single, "text", k = 10).isEmpty)
  }

  /** Reference BPE trainer (Sennrich get_stats/merge_vocab, imperative):
    * the ground truth bpeTrain must reproduce. Greedy left-to-right
    * merge, ties broken by (count desc, left, right). */
  private def referenceBpe(corpus: Seq[String], k: Int): Seq[(Long, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = corpus.flatMap(_.split(" "))
      .filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    for (round <- 1 to k if vocab.exists(_._1.size >= 2)) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
      out += ((round.toLong, l, r, l + r, n))
      vocab = vocab.map { case (syms, c) =>
        val merged = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
            merged += (l + r); i += 2
          } else { merged += syms(i); i += 1 }
        }
        merged.toVector -> c
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap // merge collisions
    }
    out.toSeq
  }

  test("bpeTrain reproduces the imperative reference trainer, round for round") {
    import spark.implicits._
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest newest newest newest newest",
      "widest widest widest",
      "a banana banana bandana")
    val want = referenceBpe(corpus, 8)
    val got = TextAnalysis.bpeTrain(corpus.toDF("text"), "text", merges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // overlap greediness: aaaa + (a,a) must yield [aa, aa], and then
    // (aa,aa) → aaaa — the left-to-right non-overlapping scan contract
    val chain = TextAnalysis.bpeTrain(Seq("aaaa aaaa aaaa").toDF("text"), "text", merges = 2)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    // round 1: (a,a) at 3 positions × freq 3 = 9; greedy merge → [aa, aa]
    // round 2: (aa,aa) once per word × freq 3 = 3
    assert(chain == Seq(("a", "a", 9L), ("aa", "aa", 3L)), chain.toString)
  }

  /** Imperative reference BPE ENCODER: greedy left-to-right application
    * of the learned merges in rank order — the ground truth bpeEncode
    * must reproduce, including 1-char words training never saw. */
  private def referenceEncode(corpus: Seq[String],
      merges: Seq[(String, String)]): Map[String, Long] = {
    val words = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
    val tokens = words.flatMap { w =>
      var syms = w.map(_.toString).toVector
      for ((l, r) <- merges) {
        val merged = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
            merged += (l + r); i += 2
          } else { merged += syms(i); i += 1 }
        }
        syms = merged.toVector
      }
      syms
    }
    tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("bpeEncode applies the learned merges like the reference encoder") {
    import spark.implicits._
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest newest newest newest newest",
      "widest widest widest",
      "a banana banana bandana")
    val docs = corpus.toDF("text")
    val mergeDf = TextAnalysis.bpeTrain(docs, "text", merges = 8)
    val ranked = mergeDf.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val want = referenceEncode(corpus, ranked)
    val got = TextAnalysis.bpeEncode(docs, "text", mergeDf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"\ngot:  ${got.toSeq.sorted}\nwant: ${want.toSeq.sorted}")
    // 1-char words (excluded from training) still encode: the word "a"
    // plus the trailing a's the (a,n) merge leaves in banana/bandana
    assert(got.contains("a") && got("a") == 4L)
    // token mass is conserved: Σ n_occ · 1 tokens reassemble the corpus
    val totalChars = corpus.flatMap(_.split(" ")).map(_.length.toLong).sum
    val gotChars = got.map { case (t, n) => t.length * n }.sum
    assert(gotChars == totalChars, s"char mass $gotChars != $totalChars")
  }

  test("bpeFertility: per-stratum tokens-per-word under a hand-checked merge table") {
    import spark.implicits._
    // one merge on this corpus: distinct multi-char terms {aa(×2), ab}
    // → pair (a,a) count 2 beats (a,b) count 1 → merge a+a
    val docs = Seq(
      ("s1", "aa aa ab"), // aa→1 piece, aa→1, ab→2 → 4 tokens / 3 words
      ("s2", "b"),        // 1-char word encodes to itself → 1 / 1
      ("s3", null.asInstanceOf[String])
    ).toDF("source", "text").where(col("text").isNotNull)
    val merges = TextAnalysis.bpeTrain(docs, "text", merges = 1)
    assert(merges.collect().map(r => (r.getString(1), r.getString(2))).toSeq
      == Seq(("a", "a")))
    val got = TextAnalysis.bpeFertility(docs, "text", "source", merges)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      "s1" -> ((3L, 4L, 4.0 / 3.0)),
      "s2" -> ((1L, 1L, 1.0))))
  }

  test("bpe merge cap is a two-sided contract: train refuses > 64 rounds, encode refuses an oversized merge table") {
    import spark.implicits._
    val docs = Seq("low lower").toDF("text")
    // train side: each round is a driver-blocking job (the latency
    // floor documented on bpeTrain) — the cap is the contract, not a
    // tuning default
    val trainEx = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrain(docs, "text", merges = 65)
    }
    assert(trainEx.getMessage.contains("each round is a Spark job"),
      trainEx.getMessage)
    // encode side re-checks the TABLE, so a hand-built or foreign merge
    // list can't smuggle in an unbounded codegen replace chain
    val bigTable = (1 to 65).map(i => (i.toLong, s"x$i", "y", s"x${i}y", 1L))
      .toDF("rank", "l", "r", "merged", "n_occ")
    val encodeEx = intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncode(docs, "text", bigTable)
    }
    assert(encodeEx.getMessage.contains("bpeTrain's contract is <= 64"),
      encodeEx.getMessage)
  }

  test("domainDivergence: zero for identical distributions, ln 2 for disjoint halves") {
    import spark.implicits._
    val same = Seq(("A", "x y"), ("B", "x y")).toDF("src", "text")
    val klSame = TextAnalysis.domainDivergence(same, "text", "src", vocabSize = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(klSame.values.forall(math.abs(_) < 1e-9))
    // A = all x, B = all y, corpus 50/50 → KL = 1·ln(1/0.5) = ln 2 each side
    val split = Seq(("A", "x x x x"), ("B", "y y y y")).toDF("src", "text")
    val klSplit = TextAnalysis.domainDivergence(split, "text", "src", vocabSize = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(klSplit.values.forall(v => math.abs(v - math.log(2.0)) < 1e-6))
    // n_tokens reports the stratum size
    val rows = TextAnalysis.domainDivergence(split, "text", "src", vocabSize = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("A" -> 4L, "B" -> 4L))
  }

  test("qualityFilter assigns the first failing reason in severity order") {
    import spark.implicits._
    val long = ("w " * 30).trim                          // 30 distinct-position tokens
    val docs = Seq(
      (1L, "too short"),                                 // 2 tokens
      (2L, ("a b c d e f g h i j " * 3).trim),           // 30 tokens, dup bigrams ARE high
      (3L, "x " * 10 + "supercalifragilisticexpialidocious-from-a-very-spammy-url " + "y z " * 8),
      (4L, (1 to 25).map(i => s"tok$i").mkString(" "))   // clean: 25 distinct tokens
    ).toDF("doc_id", "text")
    val got = TextAnalysis.qualityFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(4), r.getBoolean(5))).toMap
    assert(got(1L) == (("too_short", false)))
    assert(got(2L) == (("repetitive", false)))
    assert(got(3L) == (("word_too_long", false)))
    assert(got(4L) == (("ok", true)))
    // doc 2: 29 bigrams, 10 distinct ("j a" wraps) → frac far over 0.06
    assert(long.nonEmpty) // silence unused warning paranoia
  }

  test("docCrossEntropy: repeated transitions score lower; sub-bigram docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b a b"),   // one high-probability transition, repeated
      (2L, "c d e f g h i j"),   // every transition unique in the corpus
      (3L, "solo")               // no bigrams -> no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.docCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 7L && got(2L)._1 == 7L)
    assert(got(1L)._2 < got(2L)._2,
      s"predictable doc must score lower: $got")
  }

  test("zipfFit recovers slope -1 on an exact power-law corpus") {
    import spark.implicits._
    // counts 12/r for ranks 1..4: a×12, b×6, c×4, d×3
    val text = ("a " * 12 + "b " * 6 + "c " * 4 + "d " * 3).trim
    val got = TextAnalysis.zipfFit(Seq(text).toDF("text"), "text", topK = 16)
      .collect()(0)
    assert(got.getLong(0) == 4L)
    assert(math.abs(got.getDouble(1) + 1.0) < 0.01)     // slope ≈ −1
    assert(math.abs(got.getDouble(2) - math.log(12.0)) < 0.01) // intercept ≈ ln 12
  }

  test("dsirImportance: corpus-fitted log-ratio weights, null-safe source split, micro-exact sums") {
    val df = Seq(
      (1L, "apple banana", "src0"),
      (2L, "apple cherry", "src0"),
      (3L, "dog cat", "src1"),
      (4L, "dog emu", null.asInstanceOf[String]), // null source = RAW
      (5L, null.asInstanceOf[String], "src0")     // null text excluded
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.dsirImportance(df, "doc_id", "text", "source", "src0")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap

    // independent recomputation: same md5 hex-prefix bucket, same
    // smoothing, same four-ln parenthesization, HALF_UP micro rounding
    def bucket(f: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1024
    }
    def feats(text: String): Seq[String] = {
      val t = text.split(" ").toSeq
      t ++ t.sliding(2).filter(_.size == 2).map(_.mkString("_"))
    }
    val corpus = Seq((1L, "apple banana", Option("src0")),
      (2L, "apple cherry", Option("src0")), (3L, "dog cat", Option("src1")),
      (4L, "dog emu", Option.empty[String]))
    val allF = corpus.flatMap { case (id, tx, src) =>
      feats(tx).map(f => (id, src, bucket(f))) }
    val tb = allF.filter(_._2.contains("src0")).groupBy(_._3)
      .view.mapValues(_.size.toLong).toMap
    val rb = allF.filter(!_._2.contains("src0")).groupBy(_._3)
      .view.mapValues(_.size.toLong).toMap
    val (tT, rT) = (tb.values.sum, rb.values.sum)
    def lam(b: Long): Long = BigDecimal(
      ((math.log(tb.getOrElse(b, 0L) + 1.0) - math.log(tT + 1024.0)) -
        (math.log(rb.getOrElse(b, 0L) + 1.0) - math.log(rT + 1024.0))) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    corpus.foreach { case (id, tx, _) =>
      val bs = feats(tx).map(bucket)
      val exp = bs.map(lam).sum
      assert(got(id) == ((bs.size.toLong, exp, exp > 0)),
        s"doc $id: got ${got(id)}, expected (${bs.size}, $exp, ${exp > 0})")
    }
    assert(!got.contains(5L))
    // with equal target/raw totals a target-only feature weighs
    // ln(t+1) and a raw-only one −ln(r+1): target docs keep, raw drop
    assert(got(1L)._3 && got(2L)._3 && !got(3L)._3 && !got(4L)._3)
  }

  test("hashedLinearScore: unigram+bigram feature count, md5-derived weight fold, integer keep threshold") {
    // expected values derived independently in python (hashlib.md5 over
    // the same hex-prefix arithmetic): "the quick brown fox" → 7
    // features (4 unigrams + 3 bigrams), w_sum 3056; "solo" → 1
    // feature (no bigram arm), w_sum 955. Null text excluded.
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "solo"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.hashedLinearScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((7L, 3056L, 3056.0 / 7000.0, true)))
    assert(got(2L) == ((1L, 955L, 955.0 / 1000.0, true)))
    assert(!got.contains(3L))
    // plan shape: the 100 TB filter archetype must stay a pure
    // projection — no exchange anywhere in the physical plan
    val plan = TextAnalysis.hashedLinearScore(df, "doc_id", "text")
      .queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"),
      s"hashedLinearScore must not shuffle:\n$plan")
  }

  test("vocabCoverage: exact counts at each breakpoint, floor-division ppm, saturation at full vocab") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=3, b=2, c=1; total 6; rank order a, b, c
    val got = TextAnalysis.vocabCoverage(docs, "text", Seq(1, 2, 5))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 6L, 500000L),
      (2L, 5L, 6L, 833333L),   // floor(5e6/6), never rounded up
      (5L, 6L, 6L, 1000000L)))
    // ties in count rank by term: "b"(2) vs a twin "d"(2) — vocab 2
    // must cover a + b (term order), not a + d
    val tied = Seq((1L, "a a b b d d")).toDF("doc_id", "text")
    val g2 = TextAnalysis.vocabCoverage(tied, "text", Seq(2))
      .as[(Long, Long, Long, Long)].head()
    assert(g2 == ((2L, 4L, 6L, 666666L)))
    // duplicate breakpoints would mint two identically-named aggregate
    // aliases — rejected up front, not a runtime ambiguous-column error
    val dup = intercept[IllegalArgumentException] {
      TextAnalysis.vocabCoverage(docs, "text", Seq(2, 2))
    }
    assert(dup.getMessage.contains("distinct"))
  }

  test("cohenKappa: hand-computed 2x2 fixture, skew correction vs raw agreement, null exclusion, degenerate NULL") {
    import spark.implicits._
    // 10 rows: a = x x x x x x y y y y ; b = x x x x x y y y y x
    // agree = 8, nA: x=6 y=4, nB: x=6 y=4 -> S = 36+16 = 52
    // kappa = (10*8 - 52)/(100 - 52) = 28/48 = 0.583333
    val rows = Seq(("x","x"),("x","x"),("x","x"),("x","x"),("x","x"),
      ("x","y"),("y","y"),("y","y"),("y","y"),("y","x"))
    val got = TextAnalysis.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Double)].head()
    assert(got == ((10L, 8L, 0.583333)))
    // null rows excluded: adding (null, x) and (y, null) changes nothing
    val withNulls = (rows.map { case (a, b) => (a: String, b: String) } ++
      Seq((null, "x"), ("y", null))).toDF("a", "b")
    assert(TextAnalysis.cohenKappa(withNulls, "a", "b")
      .as[(Long, Long, Double)].head() == ((10L, 8L, 0.583333)))
    // both annotators constant and equal: p_e = 1 -> NULL, not NaN
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val row = TextAnalysis.cohenKappa(const, "a", "b").head()
    assert(row.getLong(0) == 2L && row.getLong(1) == 2L && row.isNullAt(2))
    // labels seen by only one side contribute 0 to p_e, not a crash:
    // a = p p q, b = p r r -> agree 1, S = nA(p)*nB(p) = 2*1 = 2
    // kappa = (3*1 - 2)/(9 - 2) = 1/7 = 0.142857
    val oneSided = Seq(("p","p"),("p","r"),("q","r")).toDF("a", "b")
    assert(TextAnalysis.cohenKappa(oneSided, "a", "b")
      .as[(Long, Long, Double)].head() == ((3L, 1L, 0.142857)))
  }

  test("reliabilityBins: exact integer bin edges, micro means, ppm rates; constant score collapses to bin 0") {
    import spark.implicits._
    // scores 0..9, outcome = score >= 5; nBins=5 over range [0,9]:
    // bin = s*5 div 10 -> {0,1}->0, {2,3}->1, ... {8,9}->4
    val df = (0L to 9L).map(s => (s, s >= 5L)).toDF("s", "y")
    val got = TextAnalysis.reliabilityBins(df, col("s"), col("y"), nBins = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 2L, 500000L, 0L),        // scores 0,1: mean 0.5, pos 0
      (1L, 2L, 2500000L, 0L),
      (2L, 2L, 4500000L, 500000L),  // scores 4,5: one positive
      (3L, 2L, 6500000L, 1000000L),
      (4L, 2L, 8500000L, 1000000L)))
    // constant score: hi - lo + 1 = 1, every row bin 0 — no div-by-zero
    val const = Seq((7L, true), (7L, false)).toDF("s", "y")
    assert(TextAnalysis.reliabilityBins(const, col("s"), col("y"), 5)
      .as[(Long, Long, Long, Long)].head() == ((0L, 2L, 7000000L, 500000L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.reliabilityBins(df, col("s"), col("y"), nBins = 1)
    }
  }

  test("hashedFeatures: repeated terms accumulate signed counts in one bucket; buckets stay in range; partitioning-invariant") {
    import spark.implicits._
    val docs = Seq((1L, "x x x"), (2L, "x y"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.hashedFeatures(docs, "doc_id", "text", dim = 16)
      .as[(Long, Long, Long)].collect().toSet
    // doc 1: one term tripled -> exactly one cell of magnitude 3
    val d1 = got.filter(_._1 == 1L)
    assert(d1.size == 1 && math.abs(d1.head._3) == 3L, d1.toString)
    assert(got.forall { case (_, b, _) => b >= 0L && b < 16L })
    // doc 2 reuses x's cell with the same sign (1/3 of doc 1's)
    val xCell = d1.head
    assert(got.contains((2L, xCell._2, xCell._3 / 3L)) ||
      // unless y collides with x and cancels/doubles — then doc 2 has
      // one cell of magnitude 0 (dropped) or ±2
      got.filter(_._1 == 2L).forall(_._2 == xCell._2))
    val reparted = TextAnalysis.hashedFeatures(docs.repartition(7), "doc_id", "text", 16)
      .as[(Long, Long, Long)].collect().toSet
    assert(reparted == got)
    intercept[IllegalArgumentException] {
      TextAnalysis.hashedFeatures(docs, "doc_id", "text", dim = 12)
    }
  }

  test("robustScale: discrete-percentile winsorize then integer min-max, hand-checked") {
    import spark.implicits._
    // group g: values 1..20 (n=20) -> lo = p5 = 1 (cum 1 >= 1), hi = p95 = 19 (cum 19 >= 19)
    val df = (1L to 20L).map(v => (v, "g", v)).toDF("id", "src", "score")
    val got = TextAnalysis.robustScale(df, "id", "src", "score")
      .select("id", "lo", "hi", "scaled_micro")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 1L, 19L, 0L)))
    assert(got(10L) == ((10L, 1L, 19L, (9L * 1000000L) / 18L)))
    assert(got(19L) == ((19L, 1L, 19L, 1000000L)))
    assert(got(20L) == ((20L, 1L, 19L, 1000000L))) // clamped to hi
  }

  test("robustScale: degenerate single-value group pins to the midpoint; null scores come back NULL and stay out of the bounds") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", Option(7L)), (2L, "a", Option(7L)),
      (3L, "b", Option(1L)), (4L, "b", Option(3L)), (5L, "b", Option.empty[Long])
    ).toDF("id", "src", "score")
    val got = TextAnalysis.robustScale(df, "id", "src", "score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    assert(got(1L) == ((7L, 7L, 500000L)))
    assert(got(2L) == ((7L, 7L, 500000L)))
    // group b: n=2, p5 -> cum>=1 -> lo=1; p95 -> 100*cum>=190 -> cum>=2 -> hi=3
    assert(got(3L) == ((1L, 3L, 0L)))
    assert(got(4L) == ((1L, 3L, 1000000L)))
    assert(got(5L) == ((1L, 3L, -1L))) // null score: bounds joined, scaled NULL
    intercept[IllegalArgumentException] {
      TextAnalysis.robustScale(df, "id", "src", "score", pLoPct = 90, pHiPct = 10)
    }
  }

  test("vocabCoverage: plan has no window at all — ranks off the checkpointed two-phase sort, coverage via one fold") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.vocabCoverage(docs, "text", Seq(2, 4))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // the range exchange lives inside globalRowNumber's checkpoint
    // stage; the visible plan reads the checkpoint and folds once
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert("HashAggregate".r.findAllIn(plan).nonEmpty, plan)
  }

  test("readability: hand-computed Flesch micros; sentence floor at 1; null text dropped; zero shuffles") {
    import spark.implicits._
    val docs = Seq(
      (1L, Option("The cat sat. The dog ran!")), // W=6 S=2 V=6
      (2L, Option("b c d")),                     // no punctuation -> S floors to 1; V=0
      (3L, Option("banana banana.")),            // V/W = 3 -> deep negative score
      (4L, Option.empty[String])                 // dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "doc_id", "text")
    val got = out
      .select(col("doc_id"), col("words"), col("sentences"),
        col("vowel_runs"), col("flesch_micro"), col("band"))
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 6L, 2L, 6L, 206835000L - 3045000L - 84600000L, "very_easy"),
      (2L, 3L, 1L, 0L, 206835000L - 3045000L, "very_easy"),
      (3L, 2L, 1L, 6L, 206835000L - 2030000L - 253800000L, "very_difficult")),
      s"got $got")
    // narrow projections only: no Exchange anywhere in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("trigramCrossEntropy: hand-computed add-1 trigram xent; short docs drop; history = trigram margin") {
    import spark.implicits._
    // corpus: "a b c" ×2 and "a b d" -> trigrams: (a,b,c) c=2, (a,b,d) c=1
    // history (a,b) = 3; V = {a,b,c,d} = 4
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"), (4L, "x y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.trigramCrossEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    def xent(nTri: Long, nHist: Long, v: Long): Double = {
      val nanos = math.round(-math.log((nTri + 1).toDouble / (nHist + v)) * 1e9)
      BigDecimal(nanos.toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.keySet == Set(1L, 2L, 3L), s"got $got") // doc 4: 2 tokens, dropped
    assert(got(1L) == ((1L, xent(2, 3, 4))), s"got ${got(1L)}")
    assert(got(2L) == got(1L))
    assert(got(3L) == ((1L, xent(1, 3, 4))), s"got ${got(3L)}")
    // order-3 beats order-2 at its job: the salad "c a b" (novel
    // trigram context) would be absent from this model — inner join
    // semantics are per-corpus by construction, asserted above by
    // every doc trigram existing in the self-trained model
  }
}
