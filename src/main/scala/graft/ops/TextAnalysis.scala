package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Catalyst expressions (narrow, codegen-friendly, no UDFs) — a scan at
  * 100 TB stays a scan.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** Stopword lexicons for the n-gram/stopword language-ID heuristic.
    * Tiny on purpose: the heuristic is the operator; swap lexicons for a
    * real corpus. */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "des", "est", "une"))

  def lexiconScore(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit): _*))).cast("long")

  /** CJK codepoint count — the zh signal (no useful zh stopword tokens
    * in whitespace-tokenized text). */
  def cjkCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", "")))
      .cast("long")

  /** Argmax language with a fixed precedence order (en,es,de,fr,zh) —
    * deterministic, mirrors a strictly-greater-than chain. */
  def langId(text: Column): Column = {
    val scores = lexicons.map { case (l, ws) => l -> lexiconScore(text, ws) } :+
      ("zh" -> cjkCount(text))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown"): Column) { case ((l, s), acc) =>
      when(s > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("long")

  def whitespaceTokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token count: alpha runs, digit runs, single punctuation. */
  def regexTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  def stopwordRatio(text: Column): Column = {
    val n = whitespaceTokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(lexiconScore(text, lexicons.head._2).cast("double") / n)
  }

  /** Mean token length as an exact ratio of integers. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    val totalLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    when(size(toks) === 0, lit(0.0))
      .otherwise(totalLen.cast("double") / size(toks).cast("long"))
  }

  /** Integer quality score (0..4): length band, punctuation density,
    * stopword presence, mean token length band. Integer arithmetic end to
    * end — deterministic and cheap. */
  def qualityScore(text: Column, nTokens: Column, punct: Column): Column =
    (when(nTokens.between(5, 100000), 1L).otherwise(0L)
      + when(punct * 10 <= length(text), 1L).otherwise(0L)
      + when(lexiconScore(text, lexicons.head._2) > 0, 1L).otherwise(0L)
      + when(meanTokenLen(text).between(2.0, 12.0), 1L).otherwise(0L))

  /** Canonical document fingerprint: md5 of the whitespace-normalized,
    * lowercased text. Stable across engines (md5 hex is lowercase in
    * both Spark and DuckDB). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  // --- PII scan / redaction ------------------------------------------
  // Patterns restricted to syntax shared by Java regex (Spark) and RE2
  // (DuckDB) — character classes and bounded quantifiers only, no
  // lookaround — so the scan is oracle-checkable and portable.

  /** (name, pattern, replacement) triples. maskedId is the reference's
    * codigo_favorecido shape (masked CPF like `***687963**`,
    * SURVEY §1.2). */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", "\\+?[0-9]{2}[ -][0-9]{4,5}[ -][0-9]{4}", "[PHONE]"),
    ("masked_id", "\\*\\*\\*[0-9]{6}\\*\\*", "[ID]"))

  /** Occurrence count of one PII pattern. */
  def piiCount(text: Column, pattern: String): Column =
    size(call_function("regexp_extract_all", text, lit(pattern), lit(0))).cast("long")

  /** Redact every configured PII pattern (order: as declared). */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (t, (_, pattern, repl)) =>
      regexp_replace(t, pattern, repl)
    }

  /** Gopher-style repetition signals: per-doc duplicate n-gram fraction
    * (1 - distinct/total) for word bigrams and trigrams — the standard
    * filter for boilerplate/repetitive text in pretraining pipelines.
    * One NARROW pass: totals are arithmetic on the token count, distinct
    * counts come from the one-pass graft_shingles expression; a scan
    * stays a scan (no shuffle, no explode). */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import graft.functions.TextHashExpressions.shingles
    def frac(distinct: Column, total: Column): Column =
      when(total > 0, lit(1.0) - distinct.cast("double") / total).otherwise(lit(0.0))
    // greatest(..., 0) coerces BOTH the null-text case (size(null) → null,
    // greatest skips nulls → 0) and the shorter-than-n case (negative) —
    // a null-text row yields all-zero counts, never distinct > total
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_toks"))
      .select(col("doc_id"),
        greatest(size(col("_toks")) - 1, lit(0)).cast("long").as("bi_total"),
        greatest(size(shingles(col("_toks"), 2)), lit(0)).cast("long").as("bi_distinct"),
        greatest(size(col("_toks")) - 2, lit(0)).cast("long").as("tri_total"),
        greatest(size(shingles(col("_toks"), 3)), lit(0)).cast("long").as("tri_distinct"))
      .select(col("doc_id"), col("bi_total"), col("bi_distinct"),
        frac(col("bi_distinct"), col("bi_total")).as("bi_dup_frac"),
        col("tri_total"), col("tri_distinct"),
        frac(col("tri_distinct"), col("tri_total")).as("tri_dup_frac"))
  }

  /** Per-document token Shannon entropy — the information-density
    * quality signal (near-zero entropy = degenerate/repetitive text;
    * boilerplate detectors threshold on it). H = ln(N) − (Σ c·ln c)/N
    * over per-term counts c, N = token count.
    *
    * Float determinism: double addition is order-dependent, so the sum
    * runs as a left fold over the SORTED count array (collect_list order
    * is nondeterministic; sorting canonicalizes it — equal counts are
    * interchangeable in a sum) — any partitioning, and any engine that
    * folds lists left-to-right, produces the identical bit pattern up to
    * ln() ulp differences, which the final round(·, 6) absorbs. Plan:
    * explode → (doc, term) hash-agg → per-doc collect — two shuffles,
    * both keyed on doc_id-bounded cardinality, no window. */
  def tokenEntropy(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val counts = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
      .select(
        col("doc_id"),
        aggregate(col("cs"), lit(0L), (acc, c) => acc + c).as("n_tokens"),
        size(col("cs")).cast("long").as("n_distinct"),
        col("cs"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(
          log(col("n_tokens").cast("double")) -
            aggregate(col("cs"), lit(0.0),
              (acc, c) => acc + c.cast("double") * log(c.cast("double"))) /
              col("n_tokens").cast("double"),
          6).as("entropy"))
  }

  /** Corpus bigram language-model statistics: count(w1,w2), the history
    * count n(w1·) = Σ_w2 count(w1,w2), and the conditional estimate
    * P(w2|w1) = count(w1,w2)/n(w1·). The denominator folds from the
    * already-aggregated bigram counts via `groupBy(w1).sum` + an
    * equi-join back on w1 — never a second pass over the corpus (the
    * explode subtree feeds both branches through one ReusedExchange),
    * and never a window partitioned by the raw w1 key: a Zipf head
    * context's window partition is its entire continuation list — one
    * task at 100× — while a skewed join partition AQE splits at
    * runtime. The history sum is computed BEFORE the minCount filter
    * (n_w1 counts all continuations, filtered or not). The probability
    * is one IEEE division of two exact longs — bit-deterministic on any
    * engine. Bigrams via arrays_zip of two token-array slices (empty for
    * docs shorter than 2 tokens — no row, no sequence() edge case). */
  def bigramCounts(docs: org.apache.spark.sql.DataFrame, textCol: String,
      minCount: Long): org.apache.spark.sql.DataFrame = {
    val counts = bigramAgg(docs, textCol)
    val hist = counts.groupBy(col("w1")).agg(sum(col("n_bigram")).as("n_w1"))
    counts
      .where(col("n_bigram") >= minCount)
      .join(hist, "w1")
      .select(col("w1"), col("w2"), col("n_bigram"), col("n_w1"),
        (col("n_bigram").cast("double") / col("n_w1")).as("cond_p"))
  }

  /** (w1, w2, n_bigram): the corpus bigram aggregate shared by
    * bigramCounts, docCrossEntropy, and pmiScores, so the margin/history
    * aggregates hang off the grouped counts structurally. The explicit
    * w1/w2 null filters are semantic no-ops (split() never yields null
    * elements) but load-bearing for the plan: a downstream equi-join on
    * w1 alone infers `isnotnull(w1)` into ONLY its own branch, making
    * the branches canonical non-twins so the corpus explode stage
    * cannot be reused and runs once per branch (the q83 suppkey
    * lesson). With the filters explicit, every consumer branch carries
    * the identical filter set and AQE materializes the explode shuffle
    * ONCE, however many margins fold off it. */
  private def bigramAgg(docs: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = split(col(textCol), " ")
    val pairs = arrays_zip(
      slice(toks, lit(1), size(toks) - 1).as("w1"),
      slice(toks, lit(2), size(toks) - 1).as("w2"))
    docs.select(explode(pairs).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .where(col("w1").isNotNull && col("w2").isNotNull)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_bigram"))
  }

  /** Per-document cross-entropy under the corpus's OWN add-one-smoothed
    * bigram LM — the CCNet/Gopher-style "LM quality filter" signal:
    * documents whose token transitions are improbable under the corpus
    * model (boilerplate, garbled text, wrong language) score high.
    * H(doc) = avg over its bigrams of −ln P(w2|w1) with
    * P = (c(w1,w2)+1) / (c(w1)+V); V is the bigram model's vocabulary
    * (distinct contexts ∪ continuations — computed from the aggregated
    * count table, never a second corpus pass). Docs with < 2 tokens
    * have no bigrams and are absent from the output.
    *
    * Determinism: every doc bigram exists in the corpus counts (the doc
    * is part of the corpus), so the join is inner and total; each
    * bigram's −ln P is quantized to integer NANOS before the per-doc
    * sum (exact longs, order-free — the d22 contract) and the average
    * is one IEEE division rounded 6.
    *
    * Scale shape: ONE corpus explode feeds the bigram hash-agg (history
    * totals fold from that aggregate via `groupBy(w1).sum` + join —
    * never a window on the raw w1 key, whose hot-context partition
    * would funnel through one task; see [[bigramCounts]]); the
    * per-doc pass re-explodes with the doc id and joins the
    * (vocab²-bounded, in practice vastly smaller) count table on the
    * bigram key; V rides in as a broadcast 1-row frame. */
  def docCrossEntropy(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = split(col(textCol), " ")
    val pairs = arrays_zip(
      slice(toks, lit(1), size(toks) - 1).as("w1"),
      slice(toks, lit(2), size(toks) - 1).as("w2"))
    val counts = bigramAgg(docs, textCol)
    val hist = counts.groupBy(col("w1")).agg(sum(col("n_bigram")).as("n_w1"))
    val bg = counts.join(hist, "w1")
    val v = broadcast(
      counts.select(col("w1").as("t")).union(counts.select(col("w2").as("t")))
        .agg(countDistinct(col("t")).as("v")))
    val docPairs = docs
      .select(col(idCol), explode(pairs).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val nanos = round(
      -log((col("n_bigram") + lit(1L)).cast("double") /
        (col("n_w1") + col("v")).cast("double")) * 1e9, 0).cast("long")
    docPairs.join(bg, Seq("w1", "w2")).crossJoin(v)
      .select(col(idCol), nanos.as("_nanos"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_nanos")).as("_s"))
      .select(col(idCol), col("n_bigrams"),
        round(col("_s").cast("double") /
          (col("n_bigrams").cast("double") * 1e9), 6).as("xent"))
  }

  /** Per-doc TRIGRAM cross-entropy under the corpus's own add-1
    * trigram LM — [[docCrossEntropy]]'s order-3 upgrade (a bigram LM
    * forgives any locally-plausible word salad; the trigram history
    * (w1, w2) is the standard next step of the perplexity-filter
    * ladder): xent3 = mean over trigram positions of
    * −ln((c(w1w2w3)+1)/(c(w1w2)+V)), with the history count
    * c(w1w2) = Σ_w3 c(w1w2w3) (the conditional's own margin) and V the
    * LM's token vocabulary. Same determinism ladder as d28: every
    * count is an exact long, each position's −ln quantizes to integer
    * NANOS before the per-doc sum (float Σ would be order-dependent),
    * and the final mean is one IEEE division rounded 6.
    *
    * Scale shape: one corpus explode feeds both the trigram hash-agg
    * and the per-doc join (identical filter sets on both branches — the
    * q83/bigramAgg exchange-reuse rule); history counts hang off the
    * trigram agg (no second corpus pass); V is a one-row broadcast.
    * Self-trained, so every doc trigram exists in the model and the
    * model join is inner. */
  def trigramCrossEntropy(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = split(col(textCol), " ")
    val triples = arrays_zip(
      slice(toks, lit(1), size(toks) - 2).as("w1"),
      slice(toks, lit(2), size(toks) - 2).as("w2"),
      slice(toks, lit(3), size(toks) - 2).as("w3"))
    val docTris = docs
      .where(col(textCol).isNotNull && size(toks) >= 3)
      .select(col(idCol), explode(triples).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"),
        col("p.w3").as("w3"))
      .where(col("w1").isNotNull && col("w2").isNotNull && col("w3").isNotNull)
    val c3 = docTris.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("n_tri"))
    val c2 = c3.groupBy(col("w1"), col("w2")).agg(sum(col("n_tri")).as("n_hist"))
    val model = c3.join(c2, Seq("w1", "w2"))
    val v = broadcast(
      c3.select(col("w1").as("t")).union(c3.select(col("w2").as("t")))
        .union(c3.select(col("w3").as("t")))
        .agg(countDistinct(col("t")).as("v")))
    val nanos = round(
      -log((col("n_tri") + lit(1L)).cast("double") /
        (col("n_hist") + col("v")).cast("double")) * 1e9, 0).cast("long")
    docTris.join(model, Seq("w1", "w2", "w3")).crossJoin(v)
      .select(col(idCol), nanos.as("_nanos"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("_nanos")).as("_s"))
      .select(col(idCol), col("n_trigrams"),
        round(col("_s").cast("double") /
          (col("n_trigrams").cast("double") * 1e9), 6).as("xent3"))
  }

  /** Corpus vocabulary of the `size` most frequent terms, ids assigned
    * 1..size by (count desc, term asc) — deterministic under ties, so
    * the id map is reproducible across runs and engines. Scale shape:
    * one explode + term hash-agg, then a windowless TakeOrdered rank
    * over those `size` rows only (vocab is small by construction — id 0
    * is reserved for OOV in [[encodeTokens]]). */
  def buildVocab(docs: org.apache.spark.sql.DataFrame, textCol: String,
      size: Int): org.apache.spark.sql.DataFrame =
    Ranking.rankTop(
      docs.select(explode(split(col(textCol), " ")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("c")),
      Seq(col("c").desc, col("term")), size, "id")
      .select(col("term"), col("id"), col("c"))

  /** Encode each document as its token-id sequence under `vocab`
    * (OOV → 0) — the text → training-sample step. The vocab side is
    * broadcast (bounded by construction); per-doc order is restored by
    * sorting the collected (pos, id) structs, so the result is
    * deterministic under any partitioning. Emitted as a joined string
    * (the q41 convention: canonical scalar for comparison). */
  def encodeTokens(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
    toks.join(broadcast(vocab.select(col("term"), col("id"))), Seq("term"), "left")
      .select(col("doc_id"), col("pos"), coalesce(col("id"), lit(0L)).as("id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        concat_ws(",",
          transform(array_sort(collect_list(struct(col("pos"), col("id")))),
            s => s.getField("id"))).as("ids"))
  }

  /** Top-k most characteristic terms per document, ranked tf-idf-STYLE
    * but in exact integers: (term frequency desc, document frequency
    * asc, term asc). Integer ranking sidesteps the one non-portable part
    * of classic tf-idf — ln() is not guaranteed bit-identical across
    * engines — while ordering identically to tf·idf whenever tf ties
    * break on rarity. Plan: explode (narrow) → (doc, term) hash-agg →
    * df folded from that SAME aggregated frame via `groupBy(term).count`
    * + an equi-join back on term (df = tf rows per term = docs
    * containing the term) → per-doc window top-k. The tf subtree feeds
    * both branches through one ReusedExchange, so the dominant explode
    * cost is paid once; the df side is unhinted so AQE broadcasts it
    * when small. NEVER a window partitioned by the raw term — a stop
    * word's window partition is ≈ the whole corpus's posting list in
    * one task at 100×, whereas a skewed join partition AQE splits at
    * runtime. The df frame also emits cf (collection frequency,
    * Σ tf over docs — the term's total corpus occurrences): useful
    * downstream, and load-bearing for the plan — consuming tf in the
    * df-branch OUTPUT keeps its partial aggregate the canonical twin
    * of the tf branch's (otherwise column pruning drops the count
    * function from the df branch and the stages stop canonicalizing
    * equal), which is what lets AQE materialize the explode shuffle
    * once and feed both branches from it. */
  def topTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfFrame = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term"))
    tf.join(dfFrame, "term")
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("cf"),
        col("rank"))
  }

  /** Collocation extraction: pointwise mutual information of each corpus
    * bigram against its margins, all in BIGRAM event space —
    * pmi = ln(p(w1,w2) / (p(w1,·)·p(·,w2))) with p(w1,·) = n_w1/N over
    * bigram occurrences. Margins fold from the already-aggregated
    * bigram counts via two `groupBy(margin).sum` aggregates joined back
    * on their keys (bounded by distinct bigrams, never a second corpus
    * pass, and never a window on a raw word key — the hot-word
    * partition funnel; see [[bigramCounts]]); the total is a 1-row
    * aggregate broadcast back. Determinism: the ln argument is computed as
    * (n12/n1)·(N/n2) — two IEEE divisions of exact longs and one
    * product, never an integer product that could overflow at corpus
    * scale (N² ≫ 2^63 at 100 TB) — and the final round(·, 6) absorbs
    * ln() ulp differences across engines (the t08 contract).
    *
    * The global total N is NOT an aggregate over the bigram counts —
    * Spark does not reuse the exchange across that separate aggregate
    * branch (the t06/t09 lesson: the whole explode+hash-agg subtree
    * would run twice). Instead N = Σ_docs (n_tokens − 1), the identical
    * value from a narrow 1-row scan with no explode and no shuffle. */
  def pmiScores(docs: org.apache.spark.sql.DataFrame, textCol: String,
      minCount: Long): org.apache.spark.sql.DataFrame = {
    val toks = split(col(textCol), " ")
    val counts = bigramAgg(docs, textCol)
    val m1 = counts.groupBy(col("w1")).agg(sum(col("n_bigram")).as("n_w1"))
    val m2 = counts.groupBy(col("w2")).agg(sum(col("n_bigram")).as("n_w2"))
    val total = docs.where(col(textCol).isNotNull)
      .agg(sum((size(toks) - 1).cast("long")).as("n_total"))
    counts
      .where(col("n_bigram") >= minCount)
      .join(m1, "w1")
      .join(m2, "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_bigram"), col("n_w1"), col("n_w2"),
        round(log((col("n_bigram").cast("double") / col("n_w1")) *
          (col("n_total").cast("double") / col("n_w2"))), 6).as("pmi"))
  }

  /** BPE tokenizer-training step 1: adjacent character-pair frequencies
    * over the corpus vocabulary, each pair weighted by its word's corpus
    * frequency — exactly the statistic the first BPE merge maximizes.
    * Scale shape: the corpus-sized work is one explode + term hash-agg
    * (the same vocabulary aggregate every tokenizer build needs); the
    * per-character explode then runs over DISTINCT terms only — bounded
    * by vocabulary size, not corpus size. Top-k by (count desc, pair)
    * is a TakeOrdered of k rows; ids from a k-row window. Integer-exact
    * throughout. */
  def bpePairCounts(docs: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val words = docs.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .where(length(col("term")) >= 2)
    val pairCounts = words
      .select(col("term"), col("c"),
        explode(sequence(lit(1), length(col("term")) - 1)).as("i"))
      .select(col("term").substr(col("i"), lit(2)).as("pair"), col("c"))
      .groupBy(col("pair")).agg(sum(col("c")).as("n_occ"))
    Ranking.rankTop(pairCounts,
      Seq(col("n_occ").desc, col("pair")), k, "rank")
      .select(col("pair"), col("n_occ"), col("rank"))
  }

  /** BPE tokenizer TRAINING — the iterative merge loop [[bpePairCounts]]
    * is one step of: k rounds of (argmax pair → merge everywhere →
    * recount). Output: the learned merge table (rank, l, r, merged,
    * n_occ) with n_occ the pair's weighted count at selection time —
    * ranks are the tokenizer's merge priorities.
    *
    * Representation is the load-bearing trick: each vocabulary word is
    * rendered as a STRING of double-space-delimited symbols with
    * flanking spaces (" h  e  l  l  o "), so applying a merge is one
    * codegen'd `replace(syms, ' l  r ', ' lr ')` — and because both
    * Spark's and DuckDB's replace scan left-to-right non-overlapping,
    * that replace IS the greedy BPE merge application, bit-identical
    * across engines ("a a a" + (a,a) → "aa a", exactly re.sub in the
    * original BPE paper). No interpreted lambda in the loop; symbols
    * can't contain spaces (they come from whitespace-split terms), so a
    * pattern match can't straddle a symbol boundary. This is the
    * no-end-of-word-marker variant (merges never cross word boundaries
    * either way; append a marker symbol upstream if word-final tokens
    * must stay distinct).
    *
    * Scale shape: corpus-sized work is ONE explode + term hash-agg (the
    * vocabulary build); every round then runs over DISTINCT terms only —
    * explode(adjacent pairs)+hash-agg, a 1-row TakeOrdered argmax
    * (n desc, then pair — deterministic), and a narrow replace. The
    * vocab is localCheckpoint'ed per round (bounded rows), so round r
    * doesn't re-run rounds 1..r−1 — the dupClusters bounded-iteration
    * pattern. Ties and counts are exact integers; rounds stop early if
    * no pair remains (all words fully merged).
    *
    * LATENCY FLOOR — this is the repo's one driver-synchronized loop,
    * and greedy BPE makes it inherent: merge k's argmax depends on the
    * corpus AFTER merge k−1, so each round is a separate
    * driver-blocking job (the limit(1) collect) and
    * wall time ≥ merges × per-job scheduling latency NO MATTER how
    * many executors the cluster has. Adding nodes shrinks each round's
    * scan, never the round count. That floor is why the `merges` cap
    * (≤ 64, enforced here and re-checked against the merge table by
    * [[bpeEncode]]) is a hard contract rather than a tuning default:
    * production tokenizers wanting 30k+ merges need a different
    * algorithm class (pair-cache/heap training off a frequency
    * snapshot), not this operator with the cap raised. */
  def bpeTrain(docs: org.apache.spark.sql.DataFrame, textCol: String,
      merges: Int): org.apache.spark.sql.DataFrame = {
    require(merges >= 1 && merges <= 64,
      s"merges must be in [1,64], got $merges — each round is a Spark job")
    val s = docs.sparkSession
    import s.implicits._
    val chars = transform(sequence(lit(1), length(col("term"))),
      i => col("term").substr(i, lit(1)))
    var vocab = docs.select(explode(split(col(textCol), " ")).as("term"))
      .where(length(col("term")) >= 2) // 1-char words never form a pair
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "), concat_ws("  ", chars), lit(" ")).as("syms"),
        col("freq"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var exhausted = false
    for (round <- 1 to merges if !exhausted) {
      val top = vocab
        .select(split(trim(col("syms")), "  ").as("s"), col("freq"))
        .where(size(col("s")) >= 2) // Spark's sequence(1,0) counts DOWN
        .select(col("s"), col("freq"),
          explode(sequence(lit(1), size(col("s")) - 1)).as("i"))
        .select(element_at(col("s"), col("i")).as("l"),
          element_at(col("s"), col("i") + 1).as("r"), col("freq"))
        .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("n_occ"))
        .orderBy(col("n_occ").desc, col("l"), col("r")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((round.toLong, l, r, l + r, n))
        vocab = vocab
          .withColumn("syms",
            replace(col("syms"), lit(s" $l  $r "), lit(s" $l$r ")))
          .localCheckpoint()
      }
    }
    learned.toSeq.toDF("rank", "l", "r", "merged", "n_occ")
  }

  /** BPE ENCODING — the other half of the tokenizer loop: apply a
    * learned merge table (the [[bpeTrain]] output) to a corpus and
    * return the resulting token frequency table (token, n_occ) — the
    * post-BPE vocabulary a pretraining pipeline ships alongside the
    * merges. Same representation trick as training: each DISTINCT term
    * is rendered once as a double-space-delimited symbol string and the
    * merges are applied as a chain of codegen'd `replace`s in rank
    * order (left-to-right non-overlapping — identical greedy semantics
    * in Spark and DuckDB), then tokens explode weighted by term
    * frequency. Unlike training, 1-char terms participate (they encode
    * to themselves — no merge can touch them, but they are tokens).
    *
    * The merge table is collected to the driver — bounded driver state
    * by bpeTrain's `merges <= 64` contract, the same class as d10's
    * centroid literals — and folded in as replace literals, so the
    * whole encode is: one corpus explode + term hash-agg, a NARROW
    * k-replace projection over distinct terms only, one explode over
    * per-term token arrays (≤ term length), and a vocab-bounded final
    * hash-agg. Zero joins, zero windows, corpus read once.
    */
  /** Collect a [[bpeTrain]] merge table to rank-ordered (l, r) pairs —
    * bounded driver state by the `merges <= 64` contract. */
  private def collectRankedMerges(
      merges: org.apache.spark.sql.DataFrame): Array[(String, String)] = {
    val ranked = merges.select(col("rank"), col("l"), col("r"))
      .collect().sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
    require(ranked.length <= 64,
      s"merge table has ${ranked.length} rows — bpeTrain's contract is <= 64")
    ranked
  }

  /** The double-space symbol string of `term` after applying the merge
    * chain in rank order — a NARROW chain of codegen'd replaces
    * (left-to-right non-overlapping greedy, identical in DuckDB). */
  private def encodedSyms(ranked: Array[(String, String)]): Column = {
    val chars = transform(sequence(lit(1), length(col("term"))),
      i => col("term").substr(i, lit(1)))
    val syms0 = concat(lit(" "), concat_ws("  ", chars), lit(" "))
    ranked.foldLeft(syms0) { case (syms, (l, r)) =>
      replace(syms, lit(s" $l  $r "), lit(s" $l$r "))
    }
  }

  def bpeEncode(docs: org.apache.spark.sql.DataFrame, textCol: String,
      merges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val encoded = encodedSyms(collectRankedMerges(merges))
    docs.select(explode(split(col(textCol), " ")).as("term"))
      .where(length(col("term")) >= 1) // split artifacts ("") have no symbols
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .select(explode(split(trim(encoded), "  ")).as("token"), col("freq"))
      .groupBy(col("token")).agg(sum(col("freq")).as("n_occ"))
  }

  /** Tokenizer FERTILITY card (BPE tokens per whitespace word, per
    * stratum) — the compatibility metric that tells you how expensive
    * each source is to tokenize under a given merge table (fertility
    * ≈ 1 means the vocabulary fits the source; ≫ 1 means the source
    * fragments into characters — an under-trained or out-of-domain
    * tokenizer). Complements d40's OOV rate (which needs a closed
    * vocabulary; fertility measures the open-vocabulary BPE behaviour).
    * Returns (stratum, n_words, n_bpe_tokens, fertility); the counts
    * are exact longs, fertility is ONE IEEE division of two exact longs
    * (the q97 rule).
    *
    * Scale shape: the merge chain applies over DISTINCT terms only
    * (the d29/d30 contract) and per-term piece counts join back on the
    * term key; the corpus-side work is one explode + one
    * (stratum, term) hash-agg whose partial aggregation absorbs the
    * explode map-side. Two corpus passes — the
    * global-frequency-then-join-back minimum. Unlike d19/d40's CLOSED
    * vocab tables, `termPieces` is the corpus's full DISTINCT
    * whitespace-term vocabulary — OPEN, 10⁸+ terms on a web corpus —
    * so the join is deliberately NOT hint-forced to broadcast: the
    * planner broadcasts it when its measured size is under the
    * threshold and falls back to a term-keyed shuffle when it isn't
    * (both sides are already aggregated, so the shuffle carries the
    * vocab + the (stratum, term) counts, never raw text). */
  def bpeFertility(docs: org.apache.spark.sql.DataFrame, textCol: String,
      stratumCol: String,
      merges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val encoded = encodedSyms(collectRankedMerges(merges))
    val termPieces = docs
      .select(explode(split(col(textCol), " ")).as("term"))
      .where(length(col("term")) >= 1)
      .distinct()
      .select(col("term"),
        size(split(trim(encoded), "  ")).cast("long").as("_pieces"))
    val perTerm = docs.where(col(textCol).isNotNull)
      .select(col(stratumCol).as("stratum"),
        explode(split(col(textCol), " ")).as("term"))
      .where(length(col("term")) >= 1)
      .groupBy(col("stratum"), col("term"))
      .agg(count(lit(1)).as("_cnt"))
    perTerm.join(termPieces, Seq("term"))
      .groupBy(col("stratum"))
      .agg(sum(col("_cnt")).as("n_words"),
        sum(col("_cnt") * col("_pieces")).as("n_bpe_tokens"))
      .select(col("stratum"), col("n_words"), col("n_bpe_tokens"),
        (col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
  }

  /** Per-stratum domain-shift signal: KL divergence of each stratum's
    * unigram distribution from the corpus distribution, over the corpus
    * top-`vocabSize` vocabulary with all remaining tokens folded into
    * one `<oov>` symbol (so both distributions are complete and every
    * stratum term has corpus mass — no zero-denominator terms; a term a
    * stratum lacks contributes 0 by the 0·ln 0 convention, i.e. its row
    * simply doesn't exist).
    *
    * Two corpus passes by construction (the vocabulary must be global
    * before tokens can be mapped onto it), then one (stratum, term)
    * hash-agg; margins via window SUMs over the aggregated counts and a
    * broadcast 1-row total, as in [[pmiScores]]. Float determinism: each
    * term's contribution p_s·ln(p_s/p_c) is built from IEEE divisions of
    * exact longs, then quantized to integer NANOS (round ×1e9 → long)
    * so the per-stratum sum is an order-free integer sum — the t08
    * ulp-absorption contract, but immune to summation order too. */
  def domainDivergence(docs: org.apache.spark.sql.DataFrame, textCol: String,
      stratumCol: String, vocabSize: Int): org.apache.spark.sql.DataFrame = {
    val vocab = buildVocab(docs, textCol, vocabSize).select(col("term"))
    val counts = docs
      .select(col(stratumCol).as("stratum"), explode(split(col(textCol), " ")).as("term"))
      .join(broadcast(vocab.withColumn("_v", lit(1))), Seq("term"), "left")
      .select(col("stratum"),
        when(col("_v").isNotNull, col("term")).otherwise(lit("<oov>")).as("mterm"))
      .groupBy(col("stratum"), col("mterm"))
      .agg(count(lit(1)).as("n_st"))
    val wS = org.apache.spark.sql.expressions.Window.partitionBy(col("stratum"))
    val wT = org.apache.spark.sql.expressions.Window.partitionBy(col("mterm"))
    // n_c = total mapped tokens = total tokens: a narrow 1-row scan, not
    // an aggregate over `counts` (which would re-execute the whole
    // explode+join+agg subtree — no exchange reuse across aggregate
    // branches, the same trap pmiScores documents)
    val total = docs.where(col(textCol).isNotNull)
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("n_c"))
    val pS = col("n_st").cast("double") / col("n_s")
    val pC = col("n_ct").cast("double") / col("n_c")
    counts
      .withColumn("n_s", sum(col("n_st")).over(wS))
      .withColumn("n_ct", sum(col("n_st")).over(wT))
      .crossJoin(broadcast(total))
      .select(col("stratum"), col("n_s"),
        round(pS * log(pS / pC) * 1e9, 0).cast("long").as("_nano"))
      .groupBy(col("stratum"))
      .agg(max(col("n_s")).as("n_tokens"), count(lit(1)).as("n_terms"),
        (sum(col("_nano")).cast("double") / 1e9).as("kl"))
  }

  /** Composed Gopher-style curation gate: every signal is computed in
    * ONE narrow pass (token count, longest word, duplicate-bigram
    * fraction via the one-pass graft_shingles expression — no explode,
    * no shuffle; a scan stays a scan), then a when-chain assigns the
    * FIRST failing reason in severity order. This is the filter step a
    * pretraining pipeline runs before dedup/packing; the per-reason
    * rejection tally is one tiny aggregate away (callers group on
    * fail_reason). All comparisons are on exact integer counts or exact
    * integer ratios — deterministic on any engine. */
  def qualityFilter(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minTokens: Long = 20, maxTokens: Long = 100000,
      maxWordLen: Long = 30, maxBiDupFrac: Double = 0.06): org.apache.spark.sql.DataFrame = {
    import graft.functions.TextHashExpressions.shingles
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_toks"))
      .select(col("doc_id"),
        size(col("_toks")).cast("long").as("n_tokens"),
        array_max(transform(col("_toks"), t => length(t))).cast("long").as("max_word_len"),
        when(size(col("_toks")) > 1,
          lit(1.0) - size(shingles(col("_toks"), 2)).cast("double") /
            (size(col("_toks")) - 1))
          .otherwise(lit(0.0)).as("bi_dup_frac"))
      .withColumn("fail_reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("n_tokens") > maxTokens, "too_long")
          .when(col("max_word_len") > maxWordLen, "word_too_long")
          .when(col("bi_dup_frac") > maxBiDupFrac, "repetitive")
          .otherwise("ok"))
      .withColumn("passed", col("fail_reason") === "ok")
  }

  /** Zipf rank-frequency fit: least-squares slope/intercept of
    * ln(count) against ln(rank) over the top-`topK` vocabulary — the
    * dataset-card "does this corpus look like natural language" check
    * (natural text slopes ≈ −1; machine-generated or truncated corpora
    * drift off). Scale shape: one explode + term hash-agg (the same
    * vocabulary pass as buildVocab), a TakeOrdered of topK rows, then a
    * 1-row aggregate over those topK points.
    *
    * Float determinism: each point's (ln rank, ln count) is quantized
    * to integer MILLIS, so the regression sums are exact integer sums
    * (order-free), and slope/intercept are IEEE arithmetic over those
    * exact longs — rounded to 6, the t08 ulp contract. The intercept
    * reuses the ROUNDED slope so both engines feed identical inputs.
    * The coefficient products n·Σxy etc. stay inside long range only
    * while topK ≤ ~10⁵ (x,y ≤ ~30·10³ millis ⟹ n·Σxy ≤ ~4·10¹⁸ <
    * 2⁶³), so that bound is ENFORCED rather than assumed — unlike
    * q58, which runs the same formula over unbounded group sizes and
    * therefore forms the products in double. */
  def zipfFit(docs: org.apache.spark.sql.DataFrame, textCol: String,
      topK: Int): org.apache.spark.sql.DataFrame = {
    require(topK >= 2 && topK <= 100000,
      s"topK must be in [2, 100000], got $topK — beyond ~10^5 points the " +
        "integer-exact regression products overflow long (use double sums)")
    val pts = Ranking.rankTop(
      docs.select(explode(split(col(textCol), " ")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("c")),
      Seq(col("c").desc, col("term")), topK, "rank")
      .select(
        round(log(col("rank").cast("double")) * 1000, 0).cast("long").as("x"),
        round(log(col("c").cast("double")) * 1000, 0).cast("long").as("y"))
    val slope = round(
      (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
    pts
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("n_terms"), slope.as("slope"),
        round((col("sy").cast("double") / 1000 -
          slope * (col("sx").cast("double") / 1000)) / col("n"), 6).as("intercept"))
  }

  /** Hashed-linear quality classifier inference — the CCNet/fastText
    * filter shape: bag of unigram+bigram features, each hashed into a
    * 2¹⁶-bucket table (the hashing trick, collisions and all), a
    * per-bucket integer-milli weight, mean pooling, threshold at 0.
    * Output per non-null-text doc: (doc_id, n_features, w_sum, logit =
    * w_sum / (n_features·1000), keep = w_sum ≥ 0).
    *
    * This is the 100 TB filter archetype: a PURE per-row projection —
    * no shuffle, no join, no state — built entirely from codegen'd
    * built-ins (split/md5/conv/substring + higher-order aggregate), so
    * it runs at scan bandwidth inside one WholeStageCodegen span and
    * composes with partition pruning for free. The weights here are
    * md5-derived stand-ins ((md5('qw:'·bucket) hex-prefix mod 2001) −
    * 1000 ∈ [−1000, 1000] integer millis), which is what makes the
    * whole inference DuckDB-reproducible and hash-exact at any scale;
    * production swaps the weight derivation for a broadcast trained
    * vector indexed by the SAME bucket id — the plan shape (and this
    * oracle-checked plumbing) is the part that carries over.
    *
    * Exactness: w_sum is an exact integer fold; logit is IEEE ops over
    * exact operands in a fixed order (cast, multiply, divide — the q97
    * rule); keep is an integer comparison, never a float threshold. */
  def hashedLinearScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), concat(col("_toks"),
        when(size(col("_toks")) >= 2,
          transform(sequence(lit(1), size(col("_toks")) - 1),
            i => concat_ws("_", element_at(col("_toks"), i),
              element_at(col("_toks"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("_feats"))
      .select(col("doc_id"),
        size(col("_feats")).cast("long").as("n_features"),
        aggregate(transform(col("_feats"), f => {
          val bucket = conv(substring(md5(f), 1, 4), 16, 10).cast("int")
          ((conv(substring(md5(concat(lit("qw:"), bucket.cast("string"))), 1, 4),
            16, 10).cast("int") % 2001) - 1000).cast("long")
        }), lit(0L), (acc, x) => acc + x).as("w_sum"))
      .select(col("doc_id"), col("n_features"), col("w_sum"),
        (col("w_sum").cast("double") /
          (col("n_features").cast("double") * 1000.0)).as("logit"),
        (col("w_sum") >= 0L).as("keep"))
  }

  /** DSIR-style importance weight per document (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much more likely its hashed-n-gram bag is
    * under the TARGET distribution (rows whose `sourceCol` equals
    * `targetSource`) than under the RAW distribution (every other row).
    * log w(x) = Σ_f [ln p̂_target(bucket(f)) − ln p̂_raw(bucket(f))]
    * with add-one smoothing over `nBuckets` hash buckets; selection
    * keeps documents with log w > 0 (more target-like than raw-like).
    * Features are d46's unigram+bigram bag, bucketed by the same md5
    * hex-prefix hashing trick.
    *
    * Scale shape — ONE tokenize pass, bounded state: the exploded
    * feature stream collapses immediately to per-(doc, bucket) counts
    * (one shuffle, map-side combined); that SAME exchange feeds both
    * the global bucket table (second shuffle, ≤nBuckets rows per
    * partition after partial agg) and the per-doc scoring join
    * (ReusedExchange — the tokenization never runs twice). The bucket
    * λ-table is ≤nBuckets rows and joins back broadcast, so the corpus
    * never shuffles on anything but its own keys. This is the DSIR
    * paper's own 100 TB argument: the hashed generative model is a
    * fixed-width table however large the corpus or vocabulary.
    *
    * Float determinism (the t10 contract): per-bucket counts and totals
    * are exact integers; each λ_b applies IEEE ln to exact-integer
    * arguments in a fixed parenthesization, then quantizes to integer
    * MICROS (round×1e6 — the 6-decimal ulp absorber), so the per-doc
    * sum Σ c_f·λ_b is an exact integer sum, order-free across any
    * partitioning. `logw` is one exact-long divide at the end. The
    * four-ln form (never ln of a products ratio) is deliberate:
    * count×total products overflow long at web scale; ln arguments
    * stay ≤ total+nBuckets. */
  def dsirImportance(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, sourceCol: String, targetSource: String,
      nBuckets: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 65536,
      s"nBuckets must be in [2, 65536] (md5 hex-prefix range), got $nBuckets")
    val perDocBucket = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(sourceCol).as("_src"),
        tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), col("_src"), explode(concat(col("_toks"),
        when(size(col("_toks")) >= 2,
          transform(sequence(lit(1), size(col("_toks")) - 1),
            i => concat_ws("_", element_at(col("_toks"), i),
              element_at(col("_toks"), i + 1))))
          .otherwise(array().cast("array<string>")))).as("_feat"))
      .select(col("doc_id"), col("_src"),
        (conv(substring(md5(col("_feat")), 1, 4), 16, 10).cast("long") %
          nBuckets).as("_b"))
      // vacuously true (md5 of a non-null feature), but stated HERE so
      // the scoring join's inferred isnotnull(_b) is already present in
      // the shared subtree — otherwise the optimizer pushes it below
      // the exchange in the join branch only, the canonical forms
      // diverge, and AQE re-runs the tokenize stage instead of reusing
      // it (observed before this filter was added)
      .where(col("_b").isNotNull)
      .groupBy(col("doc_id"), col("_src"), col("_b"))
      .agg(count(lit(1)).as("_c"))
    // null-safe split: a null source is RAW (not-target), pinned with
    // <=> on both branches so the two partitions are exact complements.
    // ROLLUP computes per-bucket counts AND the grand totals in ONE
    // aggregation (the _b IS NULL row — _b itself is never null, it's
    // an md5 of a non-null feature): a separate totals.agg would be a
    // third plan branch whose collapsed aggregate no longer matches
    // the shared exchange subtree, re-running the tokenize scan
    // (observed in the AQE final plan before this shape was chosen).
    val rolled = perDocBucket.rollup(col("_b")).agg(
      sum(when(col("_src") <=> targetSource, col("_c")).otherwise(0L)).as("_tb"),
      sum(when(!(col("_src") <=> targetSource), col("_c")).otherwise(0L)).as("_rb"))
    // the grand-total row, re-wrapped in a grouping-free aggregate:
    // value-identical (it aggregates exactly one row), and a provably
    // one-row frame for the unbounded-cross-join guard — a bare filter
    // over the GROUPED rollup is table-sized as far as any bound
    // analysis can tell
    val totals = rolled.where(col("_b").isNull)
      .agg(sum(col("_tb")).as("_t_tot"), sum(col("_rb")).as("_r_tot"))
    val lambda = rolled.where(col("_b").isNotNull)
      .crossJoin(broadcast(totals)).select(col("_b"),
      round(((log(col("_tb") + 1) - log(col("_t_tot") + nBuckets)) -
        (log(col("_rb") + 1) - log(col("_r_tot") + nBuckets))) * 1e6, 0)
        .cast("long").as("_lam"))
    perDocBucket.join(broadcast(lambda), Seq("_b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_c")).as("n_features"),
        sum(col("_c") * col("_lam")).as("lw_micros"))
      .select(col("doc_id"), col("n_features"), col("lw_micros"),
        (col("lw_micros").cast("double") / 1e6).as("logw"),
        (col("lw_micros") > 0L).as("keep"))
  }

  /** Vocabulary coverage curve: what fraction of corpus TOKENS the
    * top-`sizes` most frequent TERMS cover — the "choose the tokenizer
    * vocab budget" analysis (d40's OOV rate answers it for ONE fixed
    * vocab; this sweeps the budget and shows where coverage
    * saturates). Terms rank by (count desc, term) — a total order —
    * via the two-phase global rank (one range exchange, no
    * single-partition window: term cardinality is corpus-dependent,
    * exactly what the q60-regression guard exists for); coverage at
    * every breakpoint folds in ONE grouping-free aggregate (a CASE
    * per size), so no running-sum window exists at all. coverage_ppm
    * is the exact integer (covered·10⁶) div total. Returns one row per
    * breakpoint: (vocab_size, covered_tokens, total_tokens,
    * coverage_ppm). */
  def vocabCoverage(docs: org.apache.spark.sql.DataFrame, textCol: String,
      sizes: Seq[Int]): org.apache.spark.sql.DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1),
      s"sizes must be non-empty positive, got $sizes")
    // duplicate breakpoints would mint two identically-named _cov$s
    // aggregate aliases → ambiguous-column failure at runtime
    require(sizes.distinct.size == sizes.size,
      s"sizes must be distinct, got $sizes")
    val tf = docs.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("_c"))
    val ranked = Ranking.globalRowNumber(
      tf, Seq(col("_c").desc, col("term").asc), "rank")
    val covs = sizes.map(s =>
      sum(when(col("rank") <= s, col("_c")).otherwise(lit(0L))).as(s"_cov$s"))
    val one = ranked.agg(covs.head, (covs.tail :+ sum(col("_c")).as("_tot")): _*)
    val rows = sizes.map(s => struct(
      lit(s.toLong).as("vocab_size"), col(s"_cov$s").as("covered_tokens")))
    one.select(explode(array(rows: _*)).as("_r"), col("_tot"))
      .select(col("_r.vocab_size").as("vocab_size"),
        col("_r.covered_tokens").as("covered_tokens"),
        col("_tot").as("total_tokens"),
        expr("_r.covered_tokens * 1000000L div _tot").as("coverage_ppm"))
  }

  /** Cohen's kappa (Cohen 1960): chance-corrected agreement between two
    * categorical columns over the same rows — the labeler-QC statistic
    * of annotation pipelines (raw agreement flatters skewed label
    * distributions; kappa subtracts the agreement two independent
    * annotators with these margins would reach by luck). Here it also
    * reads as model-vs-metadata QC: kappa(declared lang, heuristic
    * langid) says how much the tags and the text actually agree (t15).
    *
    * κ = (p_o − p_e)/(1 − p_e) with p_o = agree/n and
    * p_e = Σ_l nA_l·nB_l / n², formed as ONE IEEE division of exact
    * longs: κ = (n·agree − Σ_l nA_l·nB_l) / (n² − Σ_l nA_l·nB_l),
    * round 6 — bit-identical on both engines. Degenerate case pinned
    * (the assortativity rule): p_e = 1 (both columns constant with the
    * same value, or no rows) ⇒ κ undefined ⇒ NULL on both sides.
    * Rows where EITHER column is null are excluded by contract (an
    * unlabeled item has no agreement to score). Long-range bound:
    * n² < 2⁶³ ⇒ n < 3.0×10⁹ scored rows — beyond that pre-aggregate
    * per stratum and pool (the q58/d43 overflow convention).
    *
    * Scale shape: one grouping-free scan agg (n, agree) + two
    * label-keyed hash-aggs + a label-sized join and fold — labels are
    * a vocabulary, not a corpus; nothing here grows past |labels|
    * after the scans. Returns one row (n_items, n_agree, kappa). */
  def cohenKappa(df: org.apache.spark.sql.DataFrame, aCol: String,
      bCol: String): org.apache.spark.sql.DataFrame = {
    val base = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("_a"), col(bCol).as("_b"))
    val tot = base.agg(count(lit(1)).as("n_items"),
      coalesce(sum(when(col("_a") === col("_b"), 1L).otherwise(0L)), lit(0L))
        .as("n_agree"))
    val margA = base.groupBy(col("_a").as("_l")).agg(count(lit(1)).as("_na"))
    val margB = base.groupBy(col("_b").as("_l")).agg(count(lit(1)).as("_nb"))
    // inner join: a label seen by only one annotator has nA·nB = 0
    val s = margA.join(margB, Seq("_l"))
      .agg(coalesce(sum(col("_na") * col("_nb")), lit(0L)).as("_s"))
    tot.crossJoin(broadcast(s))
      .select(col("n_items"), col("n_agree"),
        when(col("n_items") * col("n_items") === col("_s"),
          lit(null).cast("double"))
          .otherwise(round(
            (col("n_items") * col("n_agree") - col("_s")).cast("double") /
              (col("n_items") * col("n_items") - col("_s")).cast("double"),
            6))
          .as("kappa"))
  }

  /** Reliability (calibration) bins: fixed-width bins over an INTEGER
    * score column vs a boolean outcome — the reliability-diagram table
    * behind "is this quality classifier calibrated" (a score that
    * claims 80% should be right 80% of the time; curation pipelines
    * check this before trusting a score as a keep threshold). Bins are
    * exact integer arithmetic over the observed [lo, hi] range:
    * bin = (s − lo)·nBins div (hi − lo + 1) ∈ [0, nBins−1] — no float
    * boundary to diverge, and a constant score degenerates to one bin
    * 0 by the same formula (div by hi−lo+1 = 1, all s = lo). Per bin:
    * row count, exact mean score in micros (Σs·10⁶ div n), and the
    * observed positive rate in ppm — floor-division integers, the
    * d12/coverage_ppm convention. Null score or null label rows are
    * excluded by contract. One scan for the range (broadcast 1-row),
    * one narrow projection, one nBins-bounded hash-agg. */
  def reliabilityBins(df: org.apache.spark.sql.DataFrame, score: Column,
      label: Column, nBins: Int): org.apache.spark.sql.DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val base = df.select(score.cast("long").as("_s"),
        label.cast("boolean").as("_y"))
      .where(col("_s").isNotNull && col("_y").isNotNull)
    val rng = base.agg(min(col("_s")).as("_lo"), max(col("_s")).as("_hi"))
    base.crossJoin(broadcast(rng))
      .select(expr(s"(_s - _lo) * $nBins div (_hi - _lo + 1)").as("bin"),
        col("_s"), col("_y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        expr("sum(_s) * 1000000L div count(1)").as("mean_score_micros"),
        expr("sum(CASE WHEN _y THEN 1 ELSE 0 END) * 1000000L div count(1)")
          .as("pos_ppm"))
  }

  /** Hashing-trick featurizer (Weinberger et al. 2009): each document
    * becomes a sparse `dim`-bucket signed term-frequency vector —
    * bucket = md5(term) & (dim−1), sign = the next hash bit, cell =
    * Σ signs — the stored-vocabulary-free text representation a cheap
    * linear quality classifier (d46) consumes at corpus scale (no
    * vocab build, no OOV, new terms land somewhere deterministic).
    * `dim` must be a power of two: the bucket is then a bitwise AND,
    * identical on the signed (engine) and unsigned (DuckDB
    * md5_number_upper) views of the same md5 half — a general modulus
    * would disagree whenever the high bit is set. Sign-summing makes
    * collisions cancel in expectation (the signed-hash-kernel result).
    * Zero-sum cells are dropped (sparse convention, encoded in the
    * oracle). Scale shape: one explode into one (doc, bucket)
    * hash-agg, md5 codegen'd at the scan — narrow end to end. */
  def hashedFeatures(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, dim: Int): org.apache.spark.sql.DataFrame = {
    require(dim >= 2 && (dim & (dim - 1)) == 0,
      s"dim must be a power of two >= 2, got $dim")
    val lg = java.lang.Long.numberOfTrailingZeros(dim.toLong)
    val h = graft.functions.TextHashExpressions.md5Upper(col("term"))
    docs.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .select(col(idCol),
        h.bitwiseAND(lit(dim - 1L)).as("bucket"),
        (shiftright(h, lg).bitwiseAND(lit(1L)) * 2L - 1L).as("_sgn"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("_sgn")).as("val"))
      .where(col("val") =!= 0L)
  }

  /** Robust per-group score normalization: winsorize each group's
    * integer score at its [pLoPct, pHiPct] percentiles, then min-max it
    * to 0..10⁶ — the score-harmonization step before mixing quality
    * signals from HETEROGENEOUS sources (a raw length/quality threshold
    * that is strict for one source is vacuous for another; after this
    * transform one global cut means the same thing everywhere, and the
    * winsorizing makes the bounds outlier-proof where min-max alone is
    * one corrupt document away from useless).
    *
    * Percentiles are DISCRETE (percentile_disc type-1: the smallest
    * group value whose cumulative count reaches ceil(p·n/100), spelled
    * 100·cum ≥ p·n in exact longs) — no interpolation, no doubles
    * anywhere: scaled_micro = (clamp(x) − lo)·10⁶ div (hi − lo), with
    * the degenerate hi = lo group pinned to 500000 on both engines.
    * Null scores are excluded from the distribution and come back with
    * a NULL scaled_micro.
    *
    * Scale shape: one (group, value) hash-agg collapses the corpus to
    * the distinct-value distribution BEFORE any window; the cumulative
    * runs per group over those DISTINCT values only (bounded by the
    * score domain, not the corpus — the contract: scores are
    * quantized/bounded, which integer scores are by construction); the
    * group-sized bounds frame broadcasts back onto the corpus as a
    * narrow projection. Overflow: (x − lo)·10⁶ < 2⁶³ ⇔ score spans
    * < 9.2·10¹² — cap upstream if scores exceed that. */
  def robustScale(df: org.apache.spark.sql.DataFrame, idCol: String,
      groupCol: String, valueCol: String,
      pLoPct: Int = 5, pHiPct: Int = 95): org.apache.spark.sql.DataFrame = {
    require(0 <= pLoPct && pLoPct < pHiPct && pHiPct <= 100,
      s"need 0 <= pLoPct < pHiPct <= 100, got ($pLoPct, $pHiPct)")
    val base = df.select(col(idCol), col(groupCol).as("_g"),
        col(valueCol).cast("long").as("_v"))
      .where(col(idCol).isNotNull && col("_g").isNotNull)
    val dist = base.where(col("_v").isNotNull)
      .groupBy(col("_g"), col("_v")).agg(count(lit(1)).as("_c"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_v"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("_g"))
    val bounds = dist
      .select(col("_g"), col("_v"),
        sum(col("_c")).over(wOrd).as("_cum"),
        sum(col("_c")).over(wAll).as("_n"))
      .groupBy(col("_g"))
      .agg(
        min(when(lit(100L) * col("_cum") >= lit(pLoPct.toLong) * col("_n"),
          col("_v"))).as("lo"),
        min(when(lit(100L) * col("_cum") >= lit(pHiPct.toLong) * col("_n"),
          col("_v"))).as("hi"))
    base.join(broadcast(bounds.withColumnRenamed("_g", "_gb")),
        col("_g") === col("_gb"))
      .select(col(idCol), col("_g").as(groupCol), col("_v").as(valueCol),
        col("lo"), col("hi"),
        when(col("_v").isNull, lit(null).cast("long"))
          .when(col("hi") === col("lo"), lit(500000L))
          .otherwise(expr("((greatest(lo, least(hi, _v)) - lo) * 1000000L) div (hi - lo)"))
          .as("scaled_micro"))
  }

  /** Flesch reading-ease readability per document (Flesch 1948; the
    * Kincaid recalibration shares the same three counts), the classic
    * complexity signal quality-filter recipes bucket on — exact
    * integer micros: with W whitespace words, S sentence-boundary runs
    * ([.!?]+, floored at 1 — headline-style text without terminal
    * punctuation reads as one sentence), and V vowel runs ([aeiouy]+,
    * the standard syllable proxy),
    *   flesch_micro = 206835000 − (1015000·W) div S − (84600000·V) div W
    * — two integer divisions, zero float ops, so DuckDB reproduces
    * every cell (both engines count non-overlapping leftmost regex
    * matches). Also emits the conventional difficulty band, CASE on
    * the SAME integer. Rows with no words are dropped (W divides).
    *
    * Scale shape: pure narrow projections over one scan — regexp
    * counting is codegen'd per row, no shuffle at all; the output
    * partitions exactly as the input (the t01/t02 family shape).
    * Overflow: 84600000·V binds at V ≈ 10¹¹ vowel runs in ONE
    * document — not a real document. */
  def readability(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val t = lower(col(textCol))
    docs
      .where(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol),
        size(tokens(t)).cast("long").as("words"),
        greatest(regexp_count(t, lit("[.!?]+")).cast("long"), lit(1L))
          .as("sentences"),
        regexp_count(t, lit("[aeiouy]+")).cast("long").as("vowel_runs"))
      .where(col("words") >= 1L)
      .withColumn("flesch_micro",
        lit(206835000L) -
          expr("(1015000L * words) div sentences") -
          expr("(84600000L * vowel_runs) div words"))
      .withColumn("band",
        when(col("flesch_micro") >= 90000000L, "very_easy")
          .when(col("flesch_micro") >= 60000000L, "standard")
          .when(col("flesch_micro") >= 30000000L, "difficult")
          .otherwise("very_difficult"))
  }
}
