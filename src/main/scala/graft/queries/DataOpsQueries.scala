package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Dials, Multimodal, Ranking, Relevance, Sampling, Similarity, TextAnalysis}

/** Training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal columns) over the documents/embeddings tables.
  * Hash-based queries (minhash/simhash) have no SQL oracle — the driver
  * records a rows-only check for those; everything else is
  * oracle-verified, with integer-exact arithmetic so scores are
  * bit-deterministic (see graft.ops.Similarity scaladoc).
  */
object DataOpsQueries {

  /** Shared DuckDB CTE computing the SAME minhash signatures as
    * graft.functions.TextHashExpressions.PortableMinHash: distinct word
    * 3-grams, lane i = min over grams of (h1 + i·h2) wrapping mod 2^64
    * then mapped to signed BIGINT, where (h1, h2) are DuckDB's
    * md5_number_upper/lower — the little-endian md5 halves the Spark
    * expression reproduces bit for bit (asserted in
    * TextHashExpressionsSpec). Docs shorter than 3 tokens are excluded
    * (no shingles). */
  // text IS NOT NULL on both engines: Spark's explode/split null
  // semantics and DuckDB's unnest drop null-text rows DIFFERENTLY, so
  // the hash-family queries exclude them symmetrically up front (current
  // testdata has none — this is drift-proofing, not behavior change)
  private val minhashSigCte =
    """t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
      |      WHERE text IS NOT NULL),
      |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |        generate_series(1, len(toks) - 2),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
      |      FROM t WHERE len(toks) >= 3),
      |h AS (SELECT doc_id, CAST(md5_number_upper(gram) AS HUGEINT) AS h1,
      |             CAST(md5_number_lower(gram) AS HUGEINT) AS h2 FROM g),
      |l AS (SELECT doc_id, i,
      |             MIN(CAST(CASE WHEN m >= 9223372036854775808 THEN m - 18446744073709551616 ELSE m END AS BIGINT)) AS lane
      |      FROM (SELECT doc_id, i, (h1 + i * h2) % 18446744073709551616 AS m
      |            FROM h CROSS JOIN generate_series(0, 15) s(i))
      |      GROUP BY doc_id, i),
      |sig AS (SELECT doc_id, list(lane ORDER BY i) AS sig FROM l GROUP BY doc_id)""".stripMargin

  val d01DedupExact = NamedQuery(
    "d01_dedup_exact",
    (s, dir) => {
      Dedup.exactByHash(Tables.documents(s, dir), "doc_id", "text")
    },
    Some("""SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
           |FROM documents GROUP BY text""".stripMargin))

  /** MinHash signatures + LSH bucket keys — fully oracle-checked via the
    * portable md5 hash chain (docs without shingles carry the sentinel
    * signature and hash to the sentinel bucket on both engines). */
  val d02MinhashSignatures = NamedQuery(
    "d02_minhash_signatures",
    (s, dir) => {
      Dedup.signatures(Tables.documents(s, dir).where(col("text").isNotNull),
          "doc_id", "text", shingleN = 3, numHashes = 16)
        .select(col("doc"), explode(Dedup.lshBands(col("sig"), bands = 4, rowsPerBand = 4)).as("b"))
        .select(col("doc").as("doc_id"), col("b.band").cast("long").as("band"), col("b.bucket"))
    },
    Some(s"""WITH $minhashSigCte,
            |full_sig AS (
            |  SELECT t.doc_id,
            |         COALESCE(s.sig, list_transform(generate_series(1, 16), x -> 9223372036854775807)) AS sig
            |  FROM t LEFT JOIN sig s USING (doc_id))
            |SELECT doc_id, CAST(b AS BIGINT) AS band,
            |       md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket
            |FROM full_sig CROSS JOIN generate_series(0, 3) bb(b)""".stripMargin))

  /** MinHash+LSH near-duplicate candidate pairs with estimated Jaccard —
    * oracle replays the band/bucket join and lane agreement in SQL. */
  val d03MinhashPairs = NamedQuery(
    "d03_minhash_pairs",
    (s, dir) => {
      Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, minEstJaccard = 0.0)
    },
    Some(s"""WITH $minhashSigCte,
            |bands AS (
            |  SELECT doc_id, b AS band,
            |         md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
            |  FROM sig CROSS JOIN generate_series(0, 3) bb(b)),
            |bc AS (SELECT band, bucket FROM bands GROUP BY 1, 2 HAVING COUNT(*) <= 10000)
            |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            |       CAST(len(list_filter(generate_series(1, 16), i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 16 AS est_jaccard
            |FROM bands a JOIN bands b
            |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            |JOIN bc ON a.band = bc.band AND a.bucket = bc.bucket""".stripMargin))

  /** d03's AUTO-dialed twin: the band-bucket membership cap comes from
    * Dials.autoBucketCap(count(documents)) — 16·ceil(√n) in [256, 1e6]
    * — and the oracle re-derives it from the same COUNT(*) (the d78
    * pattern; correctly-rounded sqrt is bit-portable across engines). */
  val d79MinhashPairsAuto = NamedQuery(
    "d79_minhash_pairs_auto",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, minEstJaccard = 0.0,
        maxBucketSize = Dials.autoBucketCap(docs.count()))
    },
    Some(s"""WITH $minhashSigCte,
            |cap AS (SELECT GREATEST(256, LEAST(1000000,
            |          16 * CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))) AS c
            |        FROM documents),
            |bands AS (
            |  SELECT doc_id, b AS band,
            |         md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
            |  FROM sig CROSS JOIN generate_series(0, 3) bb(b)),
            |bc AS (SELECT band, bucket FROM bands GROUP BY 1, 2
            |       HAVING COUNT(*) <= (SELECT c FROM cap))
            |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            |       CAST(len(list_filter(generate_series(1, 16), i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 16 AS est_jaccard
            |FROM bands a JOIN bands b
            |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            |JOIN bc ON a.band = bc.band AND a.bucket = bc.bucket""".stripMargin))

  /** SimHash fingerprints — oracle-checked (portable md5 chain: the
    * per-token hash is md5_number_upper, bit votes reassembled to a
    * signed 64-bit fingerprint). */
  val d04Simhash = NamedQuery(
    "d04_simhash",
    (s, dir) => {
      Dedup.simhashes(Tables.documents(s, dir).where(col("text").isNotNull),
          "doc_id", "text")
        .select(col("doc").as("doc_id"), col("fp"))
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents
           |             WHERE text IS NOT NULL),
           |th AS (SELECT doc_id, md5_number_upper(tk) AS h FROM tok),
           |bits AS (SELECT doc_id, i,
           |                CASE WHEN SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS bit
           |         FROM th CROSS JOIN generate_series(0, 63) s(i) GROUP BY doc_id, i),
           |fp0 AS (SELECT doc_id, SUM(CASE WHEN bit = 1 THEN CAST(1 AS HUGEINT) << i ELSE 0 END) AS m
           |        FROM bits GROUP BY doc_id)
           |SELECT doc_id, CAST(CASE WHEN m >= 9223372036854775808 THEN m - 18446744073709551616 ELSE m END AS BIGINT) AS fp
           |FROM fp0""".stripMargin))

  /** Exact word-bigram Jaccard of every doc against doc 0 — integer set
    * arithmetic, single final division, fully oracle-checkable. */
  val d05NgramJaccard = NamedQuery(
    "d05_ngram_jaccard",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val query = docs.where(col("doc_id") === 0)
      Dedup.ngramJaccardVs(docs.where(col("doc_id") =!= 0), "doc_id", "text",
          query, "text", n = 2)
        .where(col("n_inter") > 0)
        .select(col("doc_id"), col("n_inter"), col("n_self"), col("jaccard"))
    },
    Some("""WITH g AS (
           |  SELECT doc_id,
           |         list_distinct(list_transform(
           |           generate_series(1, len(string_split(text, ' ')) - 1),
           |           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS grams
           |  FROM documents),
           |q AS (SELECT grams AS qgrams FROM g WHERE doc_id = 0)
           |SELECT doc_id,
           |       CAST(len(list_intersect(grams, qgrams)) AS BIGINT) AS n_inter,
           |       CAST(len(grams) AS BIGINT) AS n_self,
           |       CAST(len(list_intersect(grams, qgrams)) AS DOUBLE)
           |         / (CAST(len(grams) AS BIGINT) + CAST(len(qgrams) AS BIGINT)
           |            - CAST(len(list_intersect(grams, qgrams)) AS BIGINT)) AS jaccard
           |FROM g, q WHERE doc_id <> 0 AND len(list_intersect(grams, qgrams)) > 0""".stripMargin))

  /** Brute-force cosine top-10 against vec 0 — quantized to integer
    * millis so the dot products are exact on both engines. */
  val d06CosineTopK = NamedQuery(
    "d06_cosine_topk",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        emb.where(col("vec_id") === 0), "vec_id", k = 10)
    },
    Some("""WITH quant AS (
           |  SELECT vec_id,
           |         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000)) AS e
           |  FROM embeddings),
           |q AS (SELECT e AS qe FROM quant WHERE vec_id = 0)
           |SELECT vec_id,
           |       list_dot_product(e, qe)
           |         / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))) AS cos_sim
           |FROM quant, q WHERE vec_id <> 0
           |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin))

  /** Shared DuckDB CTE replaying the SRP bucketing for 4 tables × 6-bit
    * codes: the plane matrix is Rademacher ±1 with sign = parity of
    * md5_number_upper("srp:plane:dim") — the SAME derivation
    * Similarity.planeMatrix computes on the driver, which is what turns
    * the ANN queries from rows-only into hash-exact oracles. A 1-bit
    * multi-probe collision (probe side explodes one-bit flips) is
    * exactly `hamming(code_a, code_b) <= 1` on some table. */
  private val srpCodesCte =
    """q AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |                                    x -> round(x * 1000)) AS e
      |      FROM embeddings),
      |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM q),
      |dotp AS (SELECT q.vec_id, pp.pp,
      |                list_sum(list_transform(generate_series(1, len(e)),
      |                  d -> e[d] * (CASE WHEN md5_number_upper(
      |                        'srp:' || pp.pp || ':' || (d - 1)) & 1 = 1
      |                      THEN 1.0 ELSE -1.0 END))) AS dp
      |         FROM q CROSS JOIN generate_series(0, 23) pp(pp)),
      |codes AS (SELECT vec_id, pp // 6 AS t,
      |                 CAST(SUM(CASE WHEN dp > 0 THEN (1 << (pp % 6)) ELSE 0 END) AS BIGINT) AS code
      |          FROM dotp GROUP BY 1, 2)""".stripMargin

  /** LSH-bucketed ANN (sign random projections) — the scale path.
    * Oracle-checked: the md5-derived Rademacher planes make bucket codes
    * engine-portable (see srpCodesCte), and the cosine re-rank is exact
    * integer arithmetic + IEEE division.
    *
    * lshBucketed's maxBucketSize guard is ENCODED in the oracle: the
    * `kept` CTE drops over-cap (table, code) DATA buckets exactly as
    * capTableBuckets does (the query side is deliberately uncapped on
    * both engines), so the hash match holds on any corpus. */
  val d07AnnLsh = NamedQuery(
    "d07_ann_lsh",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // 6-bit codes (not the 12-bit near-dup default): this corpus has no
      // high-cosine pairs (max ≈ 0.5), so recall needs the wider buckets;
      // 4 tables + 1-bit probes do the amplification
      Similarity.lshBucketed(emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 5), "vec_id", k = 5, nPlanes = 6)
    },
    Some(s"""WITH $srpCodesCte,
            |kept AS (SELECT t, code FROM codes GROUP BY 1, 2 HAVING COUNT(*) <= 10000),
            |cand AS (
            |  SELECT DISTINCT qc.vec_id AS query_id, dc.vec_id AS data_id
            |  FROM codes qc JOIN codes dc ON qc.t = dc.t
            |    AND bit_count(xor(qc.code, dc.code)) <= 1
            |  JOIN kept ON dc.t = kept.t AND dc.code = kept.code
            |  WHERE qc.vec_id < 5 AND dc.vec_id <> qc.vec_id),
            |scored AS (
            |  SELECT query_id, data_id,
            |         list_dot_product(nq.e, nd.e) / (nd.nrm * nq.nrm) AS cos_sim
            |  FROM cand JOIN n nq ON nq.vec_id = query_id
            |            JOIN n nd ON nd.vec_id = data_id)
            |SELECT query_id, data_id, cos_sim, rank FROM (
            |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            |              ORDER BY cos_sim DESC, data_id) AS BIGINT) AS rank
            |  FROM scored)
            |WHERE rank <= 5""".stripMargin))

  /** Embedding-cosine near-dup pairs (LSH-bucketed candidates + exact
    * cosine verify) — the vector-space member of the dedup family.
    * Oracle-checked via the same portable SRP codes as d07; the
    * maxBucketSize cap is ENCODED in the oracle (the `kept` CTE drops
    * over-cap (table, code) buckets exactly as capTableBuckets does),
    * so the hash match holds on any corpus, capped buckets or not. */
  val d08EmbeddingNeardup = NamedQuery(
    "d08_embedding_neardup",
    (s, dir) => {
      // same moderate-similarity dial as d07: 6-bit codes × 4 tables ×
      // 1-bit probes (the 12-bit default targets cos ≥ 0.9 true near-dups)
      Similarity.embeddingNearDups(Tables.embeddings(s, dir), "vec_id", "embedding",
        minCosine = 0.3, nPlanes = 6)
    },
    Some(s"""WITH $srpCodesCte,
            |kept AS (SELECT t, code FROM codes GROUP BY 1, 2 HAVING COUNT(*) <= 10000),
            |cand AS (
            |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            |  FROM codes a JOIN codes b ON a.t = b.t AND a.vec_id < b.vec_id
            |    AND bit_count(xor(a.code, b.code)) <= 1
            |  JOIN kept ka ON a.t = ka.t AND a.code = ka.code
            |  JOIN kept kb ON b.t = kb.t AND b.code = kb.code)
            |SELECT id_a, id_b,
            |       list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm) AS cos_sim
            |FROM cand JOIN n na ON na.vec_id = id_a
            |          JOIN n nb ON nb.vec_id = id_b
            |WHERE list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm) >= 0.3""".stripMargin))

  /** d08's AUTO-dialed twin: the SRP (table, code) bucket cap comes
    * from Dials.autoBucketCap(count(embeddings)) instead of the fixed
    * 10 000, oracle re-derived from the same COUNT(*) (d78/d79
    * pattern) — one √n rule now covers the minhash band buckets, the
    * SRP table buckets, and the prefix posting lists. */
  val d80EmbeddingNeardupAuto = NamedQuery(
    "d80_embedding_neardup_auto",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.embeddingNearDups(emb, "vec_id", "embedding",
        minCosine = 0.3, nPlanes = 6,
        maxBucketSize = Dials.autoBucketCap(emb.count()))
    },
    Some(s"""WITH $srpCodesCte,
            |cap AS (SELECT GREATEST(256, LEAST(1000000,
            |          16 * CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))) AS c
            |        FROM embeddings),
            |kept AS (SELECT t, code FROM codes GROUP BY 1, 2
            |         HAVING COUNT(*) <= (SELECT c FROM cap)),
            |cand AS (
            |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            |  FROM codes a JOIN codes b ON a.t = b.t AND a.vec_id < b.vec_id
            |    AND bit_count(xor(a.code, b.code)) <= 1
            |  JOIN kept ka ON a.t = ka.t AND a.code = ka.code
            |  JOIN kept kb ON b.t = kb.t AND b.code = kb.code)
            |SELECT id_a, id_b,
            |       list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm) AS cos_sim
            |FROM cand JOIN n na ON na.vec_id = id_a
            |          JOIN n nb ON nb.vec_id = id_b
            |WHERE list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm) >= 0.3""".stripMargin))

  val t01LangId = NamedQuery(
    "t01_langid",
    (s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("detected_lang"),
        TextAnalysis.lexiconScore(col("text"), TextAnalysis.lexicons.head._2).as("en_score"))
    },
    Some({
      val lex = TextAnalysis.lexicons
      def score(words: Seq[String]) =
        s"CAST(len(list_filter(string_split(text, ' '), t -> t IN (${words.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"
      val scores = lex.map { case (l, ws) => l -> score(ws) } :+
        ("zh" -> "CAST(length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT)")
      val best = scores.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
      val caseExpr = scores.foldRight("'unknown'") { case ((l, sc), acc) =>
        s"CASE WHEN $sc > 0 AND $sc = $best THEN '$l' ELSE $acc END"
      }
      s"""SELECT doc_id, $caseExpr AS detected_lang, ${score(lex.head._2)} AS en_score
         |FROM documents""".stripMargin
    }))

  val t02TextQuality = NamedQuery(
    "t02_text_quality",
    (s, dir) => {
      val t = col("text")
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.whitespaceTokenCount(t).as("n_tokens"),
        TextAnalysis.punctCount(t).as("n_punct"),
        TextAnalysis.meanTokenLen(t).as("mean_tok_len"),
        TextAnalysis.qualityScore(t, TextAnalysis.whitespaceTokenCount(t),
          TextAnalysis.punctCount(t)).as("quality_score"))
    },
    Some("""WITH m AS (
           |  SELECT doc_id, text,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |         CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS n_punct,
           |         CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0
           |              ELSE CAST(list_sum(list_transform(string_split(text, ' '), t -> CAST(length(t) AS BIGINT))) AS DOUBLE)
           |                   / CAST(len(string_split(text, ' ')) AS BIGINT) END AS mean_tok_len,
           |         CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'to', 'is'))) AS BIGINT) AS en_hits
           |  FROM documents)
           |SELECT doc_id, n_tokens, n_punct, mean_tok_len,
           |       CAST(CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1 ELSE 0 END
           |        + CASE WHEN n_punct * 10 <= length(text) THEN 1 ELSE 0 END
           |        + CASE WHEN en_hits > 0 THEN 1 ELSE 0 END
           |        + CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END AS BIGINT) AS quality_score
           |FROM m""".stripMargin))

  val t03TokenCount = NamedQuery(
    "t03_token_count",
    (s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.whitespaceTokenCount(col("text")).as("ws_tokens"),
        TextAnalysis.regexTokenCount(col("text")).as("re_tokens"))
    },
    Some("""SELECT doc_id,
           |       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS re_tokens
           |FROM documents""".stripMargin))

  val t04Fingerprint = NamedQuery(
    "t04_fingerprint",
    (s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    },
    Some("""SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
           |FROM documents""".stripMargin))

  /** PII scan + redaction over documents: per-pattern counts and the
    * fingerprint of the redacted text. Patterns use the Java∩RE2 regex
    * subset so both engines match identically; crafted-input behavior is
    * asserted in TextAnalysisSpec (synthetic corpus carries no PII, so
    * counts here are expected zeros — the oracle still proves both
    * engines agree on that). */
  val t05PiiScan = NamedQuery(
    "t05_pii_scan",
    (s, dir) => {
      val t = col("text")
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.piiCount(t, TextAnalysis.piiPatterns(0)._2).as("n_email"),
        TextAnalysis.piiCount(t, TextAnalysis.piiPatterns(1)._2).as("n_phone"),
        TextAnalysis.piiCount(t, TextAnalysis.piiPatterns(2)._2).as("n_masked_id"),
        md5(TextAnalysis.redactPii(t)).as("redacted_md5"))
    },
    Some("""SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           |  CAST(len(regexp_extract_all(text, '\+?[0-9]{2}[ -][0-9]{4,5}[ -][0-9]{4}')) AS BIGINT) AS n_phone,
           |  CAST(len(regexp_extract_all(text, '\*\*\*[0-9]{6}\*\*')) AS BIGINT) AS n_masked_id,
           |  md5(regexp_replace(regexp_replace(regexp_replace(text,
           |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           |        '\+?[0-9]{2}[ -][0-9]{4,5}[ -][0-9]{4}', '[PHONE]', 'g'),
           |        '\*\*\*[0-9]{6}\*\*', '[ID]', 'g')) AS redacted_md5
           |FROM documents""".stripMargin))

  /** Multimodal metadata slice — the SQL-expressible part of the media
    * pipeline (payload size + header bytes); the decode path itself is
    * exercised by unit tests (stubbed codec, real plumbing). */
  val m01MediaMeta = NamedQuery(
    "m01_media_meta",
    (s, dir) => {
      Multimodal.asMediaTable(Tables.documents(s, dir), "doc_id", "text")
        .select(col("media_id"),
          col("meta.nBytes").as("n_bytes"),
          substring(hex(col("content")), 1, 16).as("head_hex"),
          col("meta.sha").as("sha"))
    },
    Some("""SELECT doc_id AS media_id,
           |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |       substring(hex(encode(text)), 1, 16) AS head_hex,
           |       lower(sha256(text)) AS sha
           |FROM documents""".stripMargin))

  /** IVF ANN (k-means cells + nProbe probing) — the second classical
    * ANN scale path next to d07's SRP-LSH. Oracle-checked since round 5:
    * Similarity.ivfTopKPortable replaces the spark.ml fit with a
    * deterministic integer k-means (md5-ranked init + training sample,
    * exact integer distances, floor-of-mean updates, fixed 3 iterations)
    * whose every step is reproducible in DuckDB SQL — the oracle below
    * unrolls the three k-means iterations as CTEs. The spark.ml variant
    * (ivfTopK) remains in the library for converged-cell quality. */
  val d10AnnIvf = NamedQuery(
    "d10_ann_ivf",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopKPortable(emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 5), "vec_id", k = 5,
        nLists = 8, nProbe = 2, iters = 3)
    },
    Some(ivfOracleSuffixD10))

  /** Shared DuckDB replay of Similarity's portable integer k-means cells
    * (trainPortableCentroids + the full-table assignment) — the CTE
    * prefix behind BOTH d10's probe/re-rank and d48's within-cell
    * semantic dedup. Squared euclidean distance between quantized
    * vector `e` and centroid `c` — exact integer-valued-double
    * arithmetic. */
  private def ivfD2(e: String, c: String) =
    s"list_sum(list_transform(generate_series(1, len($e)), " +
      s"d -> ($e[d]-$c[d])*($e[d]-$c[d])))"

  private def ivfAssign(name: String, src: String, prev: String) =
    s"""$name AS (
       |  SELECT vec_id, e, list FROM (
       |    SELECT t.vec_id, t.e, c.list,
       |           row_number() OVER (PARTITION BY t.vec_id
       |             ORDER BY ${ivfD2("t.e", "c.c")}, c.list) AS rk
       |    FROM $src t CROSS JOIN $prev c) WHERE rk = 1)""".stripMargin

  // per-dim floor-of-mean update; cells with no members keep their
  // previous centroid (COALESCE). dim = 64 (driver testdata).
  private def ivfUpdate(i: Int) =
    s"""m$i AS (
       |  SELECT list, d, CAST(floor(SUM(e[d]) / COUNT(*)) AS DOUBLE) AS cv
       |  FROM a$i CROSS JOIN generate_series(1, 64) AS g(d)
       |  GROUP BY list, d),
       |c$i AS (
       |  SELECT p.list, COALESCE(mm.c, p.c) AS c
       |  FROM c${i - 1} p LEFT JOIN
       |    (SELECT list, list(cv ORDER BY d) AS c FROM m$i GROUP BY list) mm
       |    USING (list))""".stripMargin

  /** WITH-prefix ending at `af` = every vector's final cell. `nlExpr`
    * is the list count as a SQL expression — "8" for the fixed-dial
    * d10, a params scalar subquery for the auto-sized d48 (the clamp
    * arithmetic must live in SQL so the oracle re-derives the dial from
    * the same corpus the engine counted — the d44 rule). `extraCtes`
    * is spliced between `tr` and `c0` for that params block. */
  private def ivfCellCtes(iters: Int, nlExpr: String = "8",
      extraCtes: String = ""): String = {
    val iterations = (1 to iters)
      .map(i => ivfAssign(s"a$i", "tr", s"c${i - 1}") + ",\n" + ivfUpdate(i))
      .mkString(",\n")
    s"""WITH quant AS (
       |  SELECT vec_id,
       |         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000)) AS e
       |  FROM embeddings),
       |tr AS (SELECT vec_id, e, md5(CAST(vec_id AS VARCHAR)) AS m
       |       FROM quant ORDER BY m LIMIT 10000),$extraCtes
       |c0 AS (SELECT rn - 1 AS list, e AS c FROM (
       |         SELECT e, row_number() OVER (ORDER BY m) AS rn FROM tr)
       |       WHERE rn <= $nlExpr),
       |$iterations,
       |${ivfAssign("af", "quant", s"c$iters")}""".stripMargin
  }

  /** d10's oracle suffix: probe the 2 nearest cells per query, exact
    * cosine re-rank within them. */
  private lazy val ivfOracleSuffixD10: String = {
    val cos = "list_dot_product(a.e, p.qe) / (sqrt(list_dot_product(a.e, a.e))" +
      " * sqrt(list_dot_product(p.qe, p.qe)))"
    s"""${ivfCellCtes(3)},
       |qs AS (SELECT vec_id AS query_id, e AS qe FROM quant WHERE vec_id < 5),
       |probes AS (
       |  SELECT query_id, qe, list FROM (
       |    SELECT s.query_id, s.qe, c.list,
       |           row_number() OVER (PARTITION BY s.query_id
       |             ORDER BY ${ivfD2("s.qe", "c.c")}, c.list) AS rk
       |    FROM qs s CROSS JOIN c3 c) WHERE rk <= 2)
       |SELECT query_id, data_id, cos_sim, CAST(rk AS BIGINT) AS rank FROM (
       |  SELECT p.query_id, a.vec_id AS data_id, $cos AS cos_sim,
       |         row_number() OVER (PARTITION BY p.query_id
       |           ORDER BY $cos DESC, a.vec_id) AS rk
       |  FROM af a JOIN probes p USING (list) WHERE a.vec_id <> p.query_id)
       |WHERE rk <= 5""".stripMargin
  }

  /** ANN RECALL@k evaluation — the harness every production ANN
    * deployment runs before trusting an index: d10's IVF (8 cells,
    * 2 probes) against the exact brute-force top-5 for the same five
    * query vectors, hits counted by (query, neighbor) identity. This
    * is the honest-measurement op for the whole d07/d10/d55/d56/d59
    * family: recall is REPORTED, never assumed, and the op is the
    * template users point at their own dials. Both legs are
    * scale-proven shapes (broadcast queries + map-side WindowGroupLimit
    * rank on the exact leg; cell-pruned probe join on the IVF leg), so
    * the evaluation itself runs at corpus scale — recall@k on a sample
    * of queries is exactly how you'd dial nProbe at 100 TB. The oracle
    * replays BOTH legs (the d10 k-means CTEs + a windowed exact leg)
    * and the join, making the recall fraction hash-exact as an integer
    * ×10⁶ floor division. */
  val d82AnnRecall = NamedQuery(
    "d82_ann_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qs = emb.where(col("vec_id") < 5)
      val exact = Similarity.bruteForceTopKGrouped(
        emb, "vec_id", "embedding", qs, "vec_id", k = 5)
      val approx = Similarity.ivfTopKPortable(emb, "vec_id", "embedding",
        qs, "vec_id", k = 5, nLists = 8, nProbe = 2, iters = 3)
      exact.as("e").join(approx.as("a"),
          col("e.query_id") === col("a.query_id") &&
            col("e.data_id") === col("a.data_id"), "left")
        .groupBy(col("e.query_id").as("query_id"))
        .agg(count(col("a.data_id")).as("hits"), count(lit(1)).as("k"))
        .select(col("query_id"), col("hits"), col("k"),
          expr("(1000000L * hits) div k").as("recall_x1e6"))
    },
    Some {
      val cosE = "list_dot_product(d.e, q.qe) / (sqrt(list_dot_product(d.e, d.e))" +
        " * sqrt(list_dot_product(q.qe, q.qe)))"
      val cosI = "list_dot_product(a.e, p.qe) / (sqrt(list_dot_product(a.e, a.e))" +
        " * sqrt(list_dot_product(p.qe, p.qe)))"
      s"""${ivfCellCtes(3)},
         |qs AS (SELECT vec_id AS query_id, e AS qe FROM quant WHERE vec_id < 5),
         |probes AS (
         |  SELECT query_id, qe, list FROM (
         |    SELECT s.query_id, s.qe, c.list,
         |           row_number() OVER (PARTITION BY s.query_id
         |             ORDER BY ${ivfD2("s.qe", "c.c")}, c.list) AS rk
         |    FROM qs s CROSS JOIN c3 c) WHERE rk <= 2),
         |ivf AS (SELECT query_id, data_id FROM (
         |  SELECT p.query_id, a.vec_id AS data_id,
         |         row_number() OVER (PARTITION BY p.query_id
         |           ORDER BY $cosI DESC, a.vec_id) AS rk
         |  FROM af a JOIN probes p USING (list) WHERE a.vec_id <> p.query_id)
         |  WHERE rk <= 5),
         |exact AS (SELECT query_id, data_id FROM (
         |  SELECT q.query_id, d.vec_id AS data_id,
         |         row_number() OVER (PARTITION BY q.query_id
         |           ORDER BY $cosE DESC, d.vec_id) AS rk
         |  FROM quant d CROSS JOIN qs q WHERE d.vec_id <> q.query_id)
         |  WHERE rk <= 5)
         |SELECT e.query_id, CAST(COUNT(i.data_id) AS BIGINT) AS hits,
         |       CAST(COUNT(*) AS BIGINT) AS k,
         |       CAST(1000000 * COUNT(i.data_id) // COUNT(*) AS BIGINT) AS recall_x1e6
         |FROM exact e LEFT JOIN ivf i
         |  ON e.query_id = i.query_id AND e.data_id = i.data_id
         |GROUP BY 1""".stripMargin
    })

  /** Water-filling budget cap across sources
    * (Sampling.waterfillAllocation): the largest level c with
    * Σ min(mass_src, c) ≤ 60% of total corpus chars — cap the dominant
    * sources AT the level, keep everything smaller whole. The second
    * classic mixture curve next to d21's α = 0.5 temperature rule
    * (which reshapes every share; water-filling touches only the
    * overweight tail — the CommonCrawl-dominates fix). Pure integer
    * derivation end to end, and the oracle replays the WHOLE search:
    * per-rank level candidates (budget − prefix) div (remaining),
    * exact Σ min(mass, c) ≤ budget validation, max feasible wins —
    * the d44/d78 rule that the dial derivation is part of the checked
    * answer. Profile fold is driver-side over one row per source (the
    * graph-dial codebook class); the data-sized work is one agg. */
  val d83Waterfill = NamedQuery(
    "d83_waterfill",
    (s, dir) => {
      Sampling.waterfillAllocation(
          Tables.documents(s, dir).where(col("n_chars").isNotNull),
          "source", col("n_chars"), budgetNumer = 6L, budgetDenom = 10L)
        .select(col("key").as("source"), col("mass"), col("alloc"),
          col("level"), col("budget"))
    },
    Some("""WITH src AS (
           |  SELECT source AS key, CAST(SUM(n_chars) AS BIGINT) AS mass
           |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
           |tot AS (SELECT CAST(SUM(mass) AS BIGINT) AS s,
           |               CAST(COUNT(*) AS BIGINT) AS d FROM src),
           |b AS (SELECT (6 * s) // 10 AS budget, d, s FROM tot),
           |ord AS (SELECT mass,
           |               CAST(row_number() OVER (ORDER BY mass, key) AS BIGINT) AS rn,
           |               CAST(SUM(mass) OVER (ORDER BY mass, key
           |                    ROWS UNBOUNDED PRECEDING) - mass AS BIGINT) AS prefix
           |        FROM src),
           |cand AS (
           |  SELECT (budget - prefix) // (d - rn + 1) AS c
           |  FROM ord CROSS JOIN b WHERE budget - prefix >= 0
           |  UNION ALL
           |  SELECT (SELECT MAX(mass) FROM src) FROM b WHERE s <= budget),
           |lvl AS (SELECT CAST(MAX(c) AS BIGINT) AS level FROM cand
           |        WHERE c >= 0
           |          AND (SELECT SUM(LEAST(mass, c)) FROM src)
           |                <= (SELECT budget FROM b))
           |SELECT key AS source, mass,
           |       CAST(LEAST(mass, (SELECT level FROM lvl)) AS BIGINT) AS alloc,
           |       (SELECT level FROM lvl) AS level,
           |       (SELECT CAST(budget AS BIGINT) FROM b) AS budget
           |FROM src""".stripMargin))

  /** DEDUP RECALL/PRECISION evaluation — d82's honest-measurement
    * discipline applied to the near-dup family: the banded-minhash
    * candidate generator (d03's dial: 16 hashes × 4 bands) measured
    * against the EXACT θ = 0.8 Jaccard pair set from d70's
    * prefix-filter join as ground truth. Recall says how many true
    * near-dup pairs the LSH bands surface; precision says how much of
    * the candidate volume is worth verifying — the two numbers that
    * justify (or re-dial) bands/hashes before a 100 TB dedup run, and
    * exactly the audit a curation pipeline should publish next to its
    * dedup rate. Both legs are scale-proven shapes with caps+audits;
    * the oracle replays both chains end to end and the semi-join, so
    * the ×10⁶ ratios are hash-exact. Both pair legs checkpoint once —
    * the hit join would otherwise re-run both chains. */
  val d84DedupRecall = NamedQuery(
    "d84_dedup_recall",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val exact = Dedup.prefixFilterPairs(docs, "doc_id", "text",
          shingleN = 3, thetaPct = 80, maxPostings = 10000)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
      val lsh = Dedup.minhashCandidates(docs, "doc_id", "text",
          shingleN = 3, numHashes = 16, bands = 4, minEstJaccard = 0.0)
        .select(col("doc_a"), col("doc_b")).distinct().localCheckpoint(true)
      val hit = exact.join(lsh, Seq("doc_a", "doc_b"), "left_semi")
      exact.agg(count(lit(1)).as("n_true"))
        .crossJoin(broadcast(lsh.agg(count(lit(1)).as("n_cand"))))
        .crossJoin(broadcast(hit.agg(count(lit(1)).as("n_hit"))))
        .select(col("n_true"), col("n_cand"), col("n_hit"),
          expr("(1000000L * n_hit) div greatest(1L, n_true)").as("recall_x1e6"),
          expr("(1000000L * n_hit) div greatest(1L, n_cand)").as("precision_x1e6"))
    },
    Some(s"""WITH $minhashSigCte,
            |bands AS (
            |  SELECT doc_id, b AS band,
            |         md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket
            |  FROM sig CROSS JOIN generate_series(0, 3) bb(b)),
            |bc AS (SELECT band, bucket FROM bands GROUP BY 1, 2 HAVING COUNT(*) <= 10000),
            |lsh AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            |        FROM bands a JOIN bands b
            |          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            |        JOIN bc ON a.band = bc.band AND a.bucket = bc.bucket),
            |pg AS (SELECT doc_id, list_distinct(list_transform(
            |         generate_series(1, len(toks) - 2),
            |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
            |       FROM t WHERE len(toks) >= 3 AND doc_id IS NOT NULL),
            |ptok AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n,
            |                unnest(grams) AS gm FROM pg),
            |pdfr AS (SELECT gm, CAST(COUNT(*) AS BIGINT) AS df FROM ptok GROUP BY 1),
            |ppfx AS (SELECT doc_id, gm FROM (
            |           SELECT ptok.doc_id, ptok.gm, ptok.n,
            |                  row_number() OVER (PARTITION BY ptok.doc_id
            |                    ORDER BY df, ptok.gm) AS rk
            |           FROM ptok JOIN pdfr USING (gm))
            |         WHERE rk <= n - ((80 * n + 99) // 100) + 1),
            |ppost AS (SELECT gm FROM ppfx GROUP BY gm HAVING COUNT(*) <= 10000),
            |pkept AS (SELECT doc_id, gm FROM ppfx WHERE gm IN (SELECT gm FROM ppost)),
            |pcand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            |          FROM pkept a JOIN pkept b
            |            ON a.gm = b.gm AND a.doc_id < b.doc_id),
            |ex AS (SELECT doc_a, doc_b FROM (
            |         SELECT doc_a, doc_b,
            |                CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS n_shared,
            |                CAST(len(ga.grams) AS BIGINT) AS n_a,
            |                CAST(len(gb.grams) AS BIGINT) AS n_b
            |         FROM pcand JOIN pg ga ON ga.doc_id = pcand.doc_a
            |              JOIN pg gb ON gb.doc_id = pcand.doc_b)
            |       WHERE 100 * n_shared >= 80 * (n_a + n_b - n_shared)),
            |hit AS (SELECT ex.doc_a FROM ex JOIN lsh
            |          ON ex.doc_a = lsh.doc_a AND ex.doc_b = lsh.doc_b)
            |SELECT CAST((SELECT COUNT(*) FROM ex) AS BIGINT) AS n_true,
            |       CAST((SELECT COUNT(*) FROM lsh) AS BIGINT) AS n_cand,
            |       CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hit,
            |       CAST(1000000 * (SELECT COUNT(*) FROM hit)
            |            // GREATEST(1, (SELECT COUNT(*) FROM ex)) AS BIGINT) AS recall_x1e6,
            |       CAST(1000000 * (SELECT COUNT(*) FROM hit)
            |            // GREATEST(1, (SELECT COUNT(*) FROM lsh)) AS BIGINT) AS precision_x1e6""".stripMargin))

  /** Product-quantization ANN (Similarity.pqTopK): per-subspace
    * codebooks from the same deterministic integer k-means, vectors
    * encoded to nSub codes, queries answered via per-query lookup
    * tables — the memory-compressed third ANN path next to d07's
    * SRP-LSH and d10's IVF. The oracle unrolls the k-means per
    * subspace (4 × 2 iterations) and recomputes the monotone-shift ADC
    * score Σ_j (|c_j|² − 2·q_j·c_j) with the same fixed addition
    * order — exact integer-valued doubles end to end, so the gate is
    * hash-exact. */
  val d55PqAnn = NamedQuery(
    "d55_pq_ann",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.pqTopK(emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 5), "vec_id", k = 5,
        nSub = 4, nCentroids = 8, iters = 2)
    },
    Some(pqOracleSql))

  /** d55's oracle: the full per-subspace k-means unroll. Generated, not
    * hand-written — 4 subspaces × (init + 2 assign/update rounds +
    * final encode) share the one md5-ranked training CTE, exactly
    * mirroring pqTopK's single training collect sliced per subspace. */
  /** IVF-PQ composition (Similarity.ivfPqTopK): d10's cell pruning ×
    * d55's compressed ADC scan — the production ANN shape, registered
    * so the COMPOSITION itself carries a correctness row (both halves
    * passing separately does not prove the probe-then-lookup join
    * keeps ids, cells, and tie order straight). Oracle = d10's
    * unrolled cell CTEs + d55's per-subspace codebook CTEs off the
    * SAME training CTE, probes and ADC terms recomputed per pair. */
  val d56IvfPq = NamedQuery(
    "d56_ivfpq",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 5), "vec_id", k = 5)
    },
    Some(ivfPqOracleSql))

  private lazy val ivfPqOracleSql: String =
    s"""${ivfCellCtes(3)},
       |$pqSubCtes,
       |qs AS (SELECT vec_id AS query_id, e FROM quant WHERE vec_id < 5),
       |probes AS (
       |  SELECT query_id, e, list FROM (
       |    SELECT q.query_id, q.e, c.list,
       |           row_number() OVER (PARTITION BY q.query_id
       |             ORDER BY ${ivfD2("q.e", "c.c")}, c.list) AS rk
       |    FROM qs q CROSS JOIN c3 c) WHERE rk <= 2),
       |scored AS (
       |  SELECT s.query_id, a.vec_id AS data_id, $pqScoreTerms AS adc_score
       |  FROM probes s JOIN af a ON a.list = s.list
       |    JOIN codes cd ON cd.vec_id = a.vec_id
       |    $pqCentJoins
       |  WHERE a.vec_id <> s.query_id)
       |SELECT query_id, data_id, adc_score, CAST(rk AS BIGINT) AS rank FROM (
       |  SELECT query_id, data_id, adc_score,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY adc_score, data_id) AS rk
       |  FROM scored)
       |WHERE rk <= 5""".stripMargin

  // shared PQ oracle machinery (d55 standalone + d56's IVF-PQ compose):
  // dials mirror pqTopK's defaults. FINAL literal vals — constant-folded
  // at compile time, so the lazy oracle builders above can force them
  // before this point in object-init order (the g07 kcoreRounds lesson)
  private final val pqNSub = 4; private final val pqSubDim = 16
  private final val pqNCent = 8; private final val pqIters = 2

  private def pqLo(j: Int) = j * pqSubDim + 1
  private def pqHi(j: Int) = (j + 1) * pqSubDim

  private def pqD2(e: String, c: String) =
    s"list_sum(list_transform(generate_series(1, $pqSubDim), " +
      s"d -> ($e[d]-$c[d])*($e[d]-$c[d])))"

  private def pqAssign(name: String, src: String, cents: String) =
    s"""$name AS (
       |  SELECT vec_id, e, list FROM (
       |    SELECT t.vec_id, t.e, c.list,
       |           row_number() OVER (PARTITION BY t.vec_id
       |             ORDER BY ${pqD2("t.e", "c.c")}, c.list) AS rk
       |    FROM $src t CROSS JOIN $cents c) WHERE rk = 1)""".stripMargin

  /** The per-subspace codebook/encode CTE block (references `quant` and
    * `tr` from the surrounding WITH): t_j slices, c{i}_j iterations,
    * enc_j final codes, then `codes` assembling one row per vector. */
  private lazy val pqSubCtes: String = {
    val subs = (0 until pqNSub).map { j =>
      val iterCtes = (1 to pqIters).map { i =>
        s"""${pqAssign(s"a${i}_$j", s"t_$j", s"c${i - 1}_$j")},
           |m${i}_$j AS (
           |  SELECT list, d, CAST(floor(SUM(e[d]) / COUNT(*)) AS DOUBLE) AS cv
           |  FROM a${i}_$j CROSS JOIN generate_series(1, $pqSubDim) AS g(d)
           |  GROUP BY list, d),
           |c${i}_$j AS (
           |  SELECT p.list, COALESCE(mm.c, p.c) AS c
           |  FROM c${i - 1}_$j p LEFT JOIN
           |    (SELECT list, list(cv ORDER BY d) AS c FROM m${i}_$j GROUP BY list) mm
           |    USING (list))""".stripMargin
      }.mkString(",\n")
      s"""t_$j AS (SELECT vec_id, e[${pqLo(j)}:${pqHi(j)}] AS e, m FROM tr),
         |c0_$j AS (SELECT rn - 1 AS list, e AS c FROM (
         |           SELECT e, row_number() OVER (ORDER BY m) AS rn FROM t_$j)
         |         WHERE rn <= $pqNCent),
         |$iterCtes,
         |q_$j AS (SELECT vec_id, e[${pqLo(j)}:${pqHi(j)}] AS e FROM quant),
         |${pqAssign(s"enc_$j", s"q_$j", s"c${pqIters}_$j")}""".stripMargin
    }.mkString(",\n")
    val codeJoin = (1 until pqNSub)
      .map(j => s"JOIN enc_$j e$j USING (vec_id)").mkString(" ")
    val codeCols = (0 until pqNSub).map(j => s"e$j.list AS c$j").mkString(", ")
    s"""$subs,
       |codes AS (SELECT e0.vec_id, $codeCols
       |          FROM enc_0 e0 $codeJoin)""".stripMargin
  }

  /** ADC score terms against the final codebooks, `s` = query row with
    * full vector `e`, `cd` = codes row. Fixed left-assoc + order — the
    * same order pqTopK's reduceLeft emits. */
  private lazy val pqScoreTerms: String = (0 until pqNSub).map { j =>
    s"(list_sum(list_transform(generate_series(1, $pqSubDim), " +
      s"d -> k$j.c[d]*k$j.c[d])) - 2*list_dot_product(s.e[${pqLo(j)}:${pqHi(j)}], k$j.c))"
  }.mkString(" + ")

  private lazy val pqCentJoins: String = (0 until pqNSub)
    .map(j => s"JOIN c${pqIters}_$j k$j ON k$j.list = cd.c$j").mkString("\n    ")

  private lazy val pqOracleSql: String =
    s"""WITH quant AS (
       |  SELECT vec_id,
       |         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000)) AS e
       |  FROM embeddings),
       |tr AS (SELECT vec_id, e, md5(CAST(vec_id AS VARCHAR)) AS m
       |       FROM quant ORDER BY m LIMIT 10000),
       |$pqSubCtes,
       |qs AS (SELECT vec_id AS query_id, e FROM quant WHERE vec_id < 5),
       |scored AS (
       |  SELECT s.query_id, cd.vec_id AS data_id, $pqScoreTerms AS adc_score
       |  FROM qs s CROSS JOIN codes cd
       |    $pqCentJoins
       |  WHERE cd.vec_id <> s.query_id)
       |SELECT query_id, data_id, adc_score, CAST(rk AS BIGINT) AS rank FROM (
       |  SELECT query_id, data_id, adc_score,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY adc_score, data_id) AS rk
       |  FROM scored)
       |WHERE rk <= 5""".stripMargin

  /** Full dedup resolution: minhash candidates → connected components →
    * canonical doc per cluster. Oracle-checked because at
    * minEstJaccard = 1.0 a candidate pair exists iff the two signatures
    * are IDENTICAL (est = agreement/16 = 1.0 needs all lanes equal, and
    * identical signatures share every band bucket), so connected
    * components collapse to signature-equality classes — expressible as
    * a window MIN over the signature key. Short docs (< 3 tokens) fold
    * by exact text, mirroring resolveMinhashDups' exact-text pass. The
    * Spark side still runs the general iterative component resolution;
    * the oracle checks its fixpoint. */
  val d09DedupResolve = NamedQuery(
    "d09_dedup_resolve",
    (s, dir) => {
      Dedup.resolveMinhashDups(Tables.documents(s, dir).where(col("text").isNotNull),
          "doc_id", "text", minEstJaccard = 1.0)
        .select(col("doc_id"), col("cluster_id"), col("is_canonical"))
    },
    Some(s"""WITH $minhashSigCte,
            |keyed AS (
            |  SELECT t.doc_id,
            |         CASE WHEN s.doc_id IS NOT NULL THEN 'L:' || array_to_string(s.sig, ',')
            |              ELSE 'S:' || t.text END AS k
            |  FROM t LEFT JOIN sig s USING (doc_id))
            |SELECT doc_id, MIN(doc_id) OVER (PARTITION BY k) AS cluster_id,
            |       doc_id = MIN(doc_id) OVER (PARTITION BY k) AS is_canonical
            |FROM keyed""".stripMargin))

  /** Decode + frame-sample pass over the media table — exercises the
    * mapPartitions plumbing end to end in the harness (stub codec, real
    * batching/schema). Oracle-checked: the STUB's dimensions/frame-count
    * are pure functions of the payload byte length, so the sampled-frame
    * output is SQL-reproducible (a real codec would be rows-only — the
    * oracle checks the plumbing, not codec fidelity). */
  val m02MediaDecode = NamedQuery(
    "m02_media_decode",
    (s, dir) => {
      val media = Multimodal.asMediaTable(Tables.documents(s, dir), "doc_id", "text")
      val decoded = Multimodal.decode(s, media)
      Multimodal.sampleFrames(s, decoded, everyK = 4)
    },
    Some("""WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n FROM documents),
           |f AS (SELECT media_id,
           |             CAST(64 + n % 512 AS INTEGER) AS width,
           |             CAST(64 + (n // 7) % 512 AS INTEGER) AS height,
           |             1 + n % 16 AS frames
           |      FROM m)
           |SELECT media_id, CAST(i AS INTEGER) AS frame_idx, width, height
           |FROM f CROSS JOIN generate_series(0, 15) t(i)
           |WHERE i < frames AND i % 4 = 0""".stripMargin))

  /** Resize planning over decoded media (fit in a 224-box, aspect
    * preserved, never upscale) — integer arithmetic over the stub
    * decoder's dimensions, so the plan is SQL-reproducible like m02. */
  val m03MediaResize = NamedQuery(
    "m03_media_resize",
    (s, dir) => {
      val media = Multimodal.asMediaTable(Tables.documents(s, dir), "doc_id", "text")
      Multimodal.resizePlan(Multimodal.decode(s, media), maxSide = 224)
    },
    Some("""WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n FROM documents),
           |d AS (SELECT media_id, CAST(64 + n % 512 AS INTEGER) AS width,
           |             CAST(64 + (n // 7) % 512 AS INTEGER) AS height FROM m),
           |g AS (SELECT *, greatest(width, height) AS longest FROM d)
           |SELECT media_id, width, height,
           |       CAST(CASE WHEN longest <= 224 THEN width
           |            ELSE greatest(1, (width * 224) // longest) END AS INTEGER) AS out_width,
           |       CAST(CASE WHEN longest <= 224 THEN height
           |            ELSE greatest(1, (height * 224) // longest) END AS INTEGER) AS out_height
           |FROM g""".stripMargin))

  /** Train/eval contamination scan (GPT-3-style 8-gram collision test):
    * eval slice = doc_id ≡ 0 (mod 10), report pairs sharing ≥ 2 distinct
    * 8-grams. Fully oracle-checked (shingles + md5 gram keys are
    * portable). */
  val d11Contamination = NamedQuery(
    "d11_contamination",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.contaminationScan(
        docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", shingleN = 8, minSharedGrams = 2)
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
           |        generate_series(1, len(toks) - 7),
           |        i -> array_to_string(toks[i : i+7], ' ')))) AS gram
           |      FROM t WHERE len(toks) >= 8),
           |tr0 AS (SELECT doc_id AS train_id, gram FROM g WHERE doc_id % 10 <> 0),
           |ev0 AS (SELECT doc_id AS eval_id, gram FROM g WHERE doc_id % 10 = 0),
           |tr AS (SELECT train_id, gram FROM
           |        (SELECT train_id, gram, COUNT(*) OVER (PARTITION BY gram) AS dfc FROM tr0)
           |       WHERE dfc <= 1000),
           |ev AS (SELECT eval_id, gram FROM
           |        (SELECT eval_id, gram, COUNT(*) OVER (PARTITION BY gram) AS dfc FROM ev0)
           |       WHERE dfc <= 1000)
           |SELECT train_id, eval_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
           |FROM tr JOIN ev USING (gram)
           |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin))

  /** Decontamination APPLIED (Dedup.decontaminate) — d11's removal
    * twin: the per-train-doc keep decision with eval-hit count and
    * worst collision strength. Same train/eval split and dials as d11,
    * so the two queries are the measure/apply pair of one operation. */
  val d52Decontaminate = NamedQuery(
    "d52_decontaminate",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.decontaminate(
        docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", shingleN = 8, minSharedGrams = 2)
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
           |        generate_series(1, len(toks) - 7),
           |        i -> array_to_string(toks[i : i+7], ' ')))) AS gram
           |      FROM t WHERE len(toks) >= 8),
           |tr0 AS (SELECT doc_id AS train_id, gram FROM g WHERE doc_id % 10 <> 0),
           |ev0 AS (SELECT doc_id AS eval_id, gram FROM g WHERE doc_id % 10 = 0),
           |tr AS (SELECT train_id, gram FROM
           |        (SELECT train_id, gram, COUNT(*) OVER (PARTITION BY gram) AS dfc FROM tr0)
           |       WHERE dfc <= 1000),
           |ev AS (SELECT eval_id, gram FROM
           |        (SELECT eval_id, gram, COUNT(*) OVER (PARTITION BY gram) AS dfc FROM ev0)
           |       WHERE dfc <= 1000),
           |sc AS (SELECT train_id, eval_id, COUNT(*) AS nsg
           |       FROM tr JOIN ev USING (gram)
           |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           |hits AS (SELECT train_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
           |                CAST(MAX(nsg) AS BIGINT) AS max_shared_grams
           |         FROM sc GROUP BY 1)
           |SELECT d.doc_id, COALESCE(h.n_eval_hits, 0) AS n_eval_hits,
           |       COALESCE(h.max_shared_grams, 0) AS max_shared_grams,
           |       h.train_id IS NULL AS keep
           |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
           |LEFT JOIN hits h ON h.train_id = d.doc_id""".stripMargin))

  /** Source-overlap duplication matrix (Dedup.sourceOverlapMatrix) —
    * the dataset-card governance view of d09's clusters: for each
    * ordered source pair, how many of src_a's docs have a duplicate in
    * src_b (diagonal = another copy in the same source). The oracle
    * reuses d09/d41's cluster CTE; NO doc-pair formation — the
    * within-cluster cross fans out by source cardinality only. */
  val d53SourceOverlap = NamedQuery(
    "d53_source_overlap",
    (s, dir) => Dedup.sourceOverlapMatrix(Tables.documents(s, dir),
      "doc_id", "text", "source"),
    Some(s"""WITH $minhashSigCte,
            |keyed AS (
            |  SELECT t.doc_id,
            |         CASE WHEN s.doc_id IS NOT NULL THEN 'L:' || array_to_string(s.sig, ',')
            |              ELSE 'S:' || t.text END AS k
            |  FROM t LEFT JOIN sig s USING (doc_id)),
            |cl AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY k) AS cluster_id
            |       FROM keyed),
            |ws AS (SELECT cl.cluster_id, d.source FROM cl JOIN documents d USING (doc_id)),
            |cs AS (SELECT cluster_id, source, CAST(COUNT(*) AS BIGINT) AS n
            |       FROM ws GROUP BY 1, 2),
            |ov AS (SELECT a.source AS src_a, b.source AS src_b,
            |              CAST(SUM(a.n) AS BIGINT) AS n_overlap
            |       FROM cs a JOIN cs b USING (cluster_id)
            |       WHERE a.source <> b.source OR a.n >= 2
            |       GROUP BY 1, 2),
            |tot AS (SELECT source AS src_a, CAST(COUNT(*) AS BIGINT) AS n_docs_a
            |        FROM documents WHERE text IS NOT NULL GROUP BY 1)
            |SELECT ov.src_a, ov.src_b, tot.n_docs_a, ov.n_overlap,
            |       CAST(ov.n_overlap AS DOUBLE) / CAST(tot.n_docs_a AS DOUBLE) AS share
            |FROM ov JOIN tot USING (src_a)""".stripMargin))

  /** DSIR importance-resampling weights (TextAnalysis.dsirImportance,
    * Xie et al. 2023): hashed unigram+bigram generative models for the
    * target slice (source = src0) vs the rest of the corpus; per-doc
    * log importance weight as an exact integer-micros sum, keep =
    * more-target-like-than-raw. THE principled data-selection op next
    * to d46's discriminative filter — d46 scores quality with fixed
    * weights, this op scores domain match with corpus-fitted ones.
    * Oracle replays the full chain: same md5 bucket hash, same add-one
    * smoothing, same fixed four-ln parenthesization quantized to
    * micros (the t10 ulp contract), so the gate is hash-exact at any
    * corpus size. */
  val d54DsirImportance = NamedQuery(
    "d54_dsir_importance",
    (s, dir) => TextAnalysis.dsirImportance(Tables.documents(s, dir),
      "doc_id", "text", "source", "src0"),
    Some("""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
           |           FROM documents WHERE text IS NOT NULL),
           |f AS (SELECT doc_id, source, unnest(list_concat(toks,
           |        list_transform(generate_series(1, len(toks) - 1),
           |          i -> toks[i] || '_' || toks[i + 1]))) AS feat
           |      FROM t),
           |pb AS (SELECT doc_id, source,
           |         CAST(CAST(concat('0x', substring(md5(feat), 1, 4)) AS BIGINT) % 1024 AS BIGINT) AS b,
           |         CAST(COUNT(*) AS BIGINT) AS c
           |       FROM f GROUP BY 1, 2, 3),
           |cnt AS (SELECT b,
           |          SUM(CASE WHEN source IS NOT DISTINCT FROM 'src0' THEN c ELSE 0 END) AS tb,
           |          SUM(CASE WHEN source IS DISTINCT FROM 'src0' THEN c ELSE 0 END) AS rb
           |        FROM pb GROUP BY b),
           |tot AS (SELECT SUM(tb) AS t_tot, SUM(rb) AS r_tot FROM cnt),
           |lam AS (SELECT b,
           |          CAST(round(((ln(tb + 1) - ln(t_tot + 1024)) -
           |            (ln(rb + 1) - ln(r_tot + 1024))) * 1e6) AS BIGINT) AS lam
           |        FROM cnt CROSS JOIN tot),
           |d AS (SELECT pb.doc_id, CAST(SUM(pb.c) AS BIGINT) AS n_features,
           |             CAST(SUM(pb.c * lam.lam) AS BIGINT) AS lw_micros
           |      FROM pb JOIN lam USING (b) GROUP BY 1)
           |SELECT doc_id, n_features, lw_micros,
           |       CAST(lw_micros AS DOUBLE) / 1e6 AS logw,
           |       lw_micros > 0 AS keep
           |FROM d""".stripMargin))

  /** Deterministic content-keyed stratified sample: downsample the
    * dominant language (en → 0.3), keep the tail. Hash-exact oracle —
    * the sampling uniform is FP-exact on both engines (see
    * graft.ops.Sampling). */
  val d12StratifiedSample = NamedQuery(
    "d12_stratified_sample",
    (s, dir) => {
      graft.ops.Sampling.stratifiedSample(Tables.documents(s, dir),
          keyCol = "text", stratumCol = "lang",
          rates = Map("en" -> 0.3), defaultRate = 1.0)
        .select(col("doc_id"), col("lang"), col("source"))
    },
    Some("""SELECT doc_id, lang, source FROM documents
           |WHERE CAST(md5_number_upper(text) >> 11 AS DOUBLE) / 9007199254740992.0
           |      < CASE WHEN lang = 'en' THEN 0.3 ELSE 1.0 END""".stripMargin))

  /** Top-5 characteristic terms per doc, integer-exact tf-idf-style
    * ranking (tf desc, df asc, term) — see TextAnalysis.topTerms. */
  val t06TopTerms = NamedQuery(
    "t06_top_terms",
    (s, dir) => {
      TextAnalysis.topTerms(Tables.documents(s, dir), "doc_id", "text", k = 5)
    },
    Some("""WITH tf AS (
           |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
           |  GROUP BY 1, 2),
           |d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           |             CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1)
           |SELECT doc_id, term, tf, df, cf, rank FROM (
           |  SELECT tf.doc_id, tf.term, tf.tf, d.df, d.cf,
           |         row_number() OVER (PARTITION BY tf.doc_id
           |                            ORDER BY tf.tf DESC, d.df ASC, tf.term) AS rank
           |  FROM tf JOIN d USING (term))
           |WHERE rank <= 5""".stripMargin))

  /** Sequence packing (offset bin assignment per language, 512-token
    * budget) — deterministic layout + running-sum cut, hash-exact oracle
    * (see graft.ops.Packing). */
  val d13SequencePack = NamedQuery(
    "d13_sequence_pack",
    (s, dir) => {
      graft.ops.Packing.packByOffset(Tables.documents(s, dir).where(col("text").isNotNull),
        "doc_id", "text", "lang", budgetTokens = 512)
    },
    Some("""WITH x AS (
           |  SELECT doc_id, lang,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |         CAST(md5_number_upper(text) >> 11 AS DOUBLE) / 9007199254740992.0 AS u
           |  FROM documents WHERE text IS NOT NULL),
           |c AS (
           |  SELECT doc_id, lang, n_tokens,
           |         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY u, doc_id
           |                             ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM x)
           |SELECT doc_id, lang, n_tokens,
           |       CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS bin_id
           |FROM c""".stripMargin))

  /** Candidates → exact-verify: the second stage of the standard dedup
    * pipeline — true n-gram Jaccard recomputed ONLY for the LSH candidate
    * pairs (work ∝ candidates, never n²; see Dedup.verifyJaccard).
    * Fully oracle-checked: candidate generation replays the d03 band
    * join — INCLUDING the maxBucketSize cap (the `bc` CTE drops over-cap
    * (band, bucket) buckets exactly as capBuckets does) — and
    * verification is integer set arithmetic + one IEEE division. */
  val d15JaccardVerify = NamedQuery(
    "d15_jaccard_verify",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, minEstJaccard = 0.0)
      // managed variant: the harness runs many queries in one session —
      // the pair-set cache entry must not outlive this query
      Dedup.verifyJaccardManaged(docs, "doc_id", "text", pairs)
    },
    Some(s"""WITH $minhashSigCte,
            |bands AS (
            |  SELECT doc_id, b AS band,
            |         md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket
            |  FROM sig CROSS JOIN generate_series(0, 3) bb(b)),
            |bc AS (SELECT band, bucket FROM bands GROUP BY 1, 2 HAVING COUNT(*) <= 10000),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            |  FROM bands a JOIN bands b
            |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            |  JOIN bc ON a.band = bc.band AND a.bucket = bc.bucket),
            |gd AS (SELECT doc_id, list_distinct(list_transform(
            |         generate_series(1, len(toks) - 2),
            |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
            |       FROM t WHERE len(toks) >= 3)
            |SELECT doc_a, doc_b,
            |       CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS n_shared,
            |       CAST(len(ga.grams) AS BIGINT) AS n_a,
            |       CAST(len(gb.grams) AS BIGINT) AS n_b,
            |       CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
            |         / (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) AS jaccard
            |FROM cand JOIN gd ga ON ga.doc_id = cand.doc_a
            |          JOIN gd gb ON gb.doc_id = cand.doc_b""".stripMargin))

  /** Deterministic per-key cap (the scalable "reservoir" of corpus
    * balancing): at most 50 docs per language, ranked by the same
    * content-keyed uniform as d12 — one shuffle on the key, no RNG,
    * hash-exact oracle (see graft.ops.Sampling.capPerKey). */
  val d14CapPerKey = NamedQuery(
    "d14_cap_per_key",
    (s, dir) => {
      graft.ops.Sampling.capPerKey(
          Tables.documents(s, dir).where(col("text").isNotNull),
          keyCol = "lang", sortKeyCol = "text", idCol = "doc_id", n = 50)
        .select(col("doc_id"), col("lang"), col("source"))
    },
    Some("""SELECT doc_id, lang, source FROM (
           |  SELECT doc_id, lang, source,
           |         row_number() OVER (PARTITION BY lang
           |           ORDER BY CAST(md5_number_upper(text) >> 11 AS DOUBLE) / 9007199254740992.0,
           |                    doc_id) AS rk
           |  FROM documents WHERE text IS NOT NULL)
           |WHERE rk <= 50""".stripMargin))

  /** Sliding-window chunking (64-token chunks, stride 48): the doc →
    * training-sequence splitting step. Narrow zero-shuffle plan;
    * hash-exact oracle (chunk layout is pure integer arithmetic over the
    * token array — see Packing.chunkByTokens). */
  val d16ChunkSplit = NamedQuery(
    "d16_chunk_split",
    (s, dir) => {
      graft.ops.Packing.chunkByTokens(
        Tables.documents(s, dir).where(col("text").isNotNull),
        "doc_id", "text", chunkSize = 64, stride = 48)
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           |           WHERE text IS NOT NULL),
           |c AS (SELECT doc_id, toks,
           |             unnest(generate_series(0, (len(toks) - 1) // 48)) AS chunk_idx
           |      FROM t WHERE len(toks) > 0)
           |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           |       CAST(len(toks[chunk_idx*48+1 : chunk_idx*48+64]) AS BIGINT) AS n_chunk_tokens,
           |       array_to_string(toks[chunk_idx*48+1 : chunk_idx*48+64], ' ') AS chunk_text
           |FROM c""".stripMargin))

  /** Corpus statistics rollup — the "dataset card" aggregation a corpus
    * pipeline publishes per (lang, source) stratum: doc/token/char
    * volumes, exact-dup count (via md5, so the distinct shuffles 32-char
    * hashes, not documents), mean doc length. One hash-aggregate with a
    * single distinct (Catalyst's Expand rewrite); integer-exact except
    * the one final IEEE division. */
  val d17CorpusStats = NamedQuery(
    "d17_corpus_stats",
    (s, dir) => {
      Tables.documents(s, dir).where(col("text").isNotNull)
        .select(col("lang"), col("source"),
          size(split(col("text"), " ")).cast("long").as("_nt"),
          length(col("text")).cast("long").as("_nc"),
          md5(col("text")).as("_h"))
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("_nt")).as("n_tokens"),
          sum(col("_nc")).as("n_chars"),
          countDistinct(col("_h")).as("n_distinct"),
          (count(lit(1)) - countDistinct(col("_h"))).as("n_exact_dups"),
          (sum(col("_nt")).cast("double") / count(lit(1))).as("mean_tokens"))
    },
    Some("""SELECT lang, source,
           |       COUNT(*) AS n_docs,
           |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           |       CAST(SUM(len(text)) AS BIGINT) AS n_chars,
           |       COUNT(DISTINCT md5(text)) AS n_distinct,
           |       CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
           |       CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS mean_tokens
           |FROM documents WHERE text IS NOT NULL
           |GROUP BY lang, source""".stripMargin))

  /** Gopher-style repetition filter signals: duplicate word-n-gram
    * fractions per doc, single narrow pass (see
    * TextAnalysis.repetitionStats). */
  val t07Repetition = NamedQuery(
    "t07_repetition",
    (s, dir) => {
      TextAnalysis.repetitionStats(
        Tables.documents(s, dir).where(col("text").isNotNull), "doc_id", "text")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           |           WHERE text IS NOT NULL),
           |c AS (SELECT doc_id,
           |             CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS bi_total,
           |             CAST(len(list_distinct(list_transform(
           |               generate_series(1, len(toks) - 1),
           |               i -> toks[i] || ' ' || toks[i+1]))) AS BIGINT) AS bi_distinct,
           |             CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS tri_total,
           |             CAST(len(list_distinct(list_transform(
           |               generate_series(1, len(toks) - 2),
           |               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS BIGINT) AS tri_distinct
           |      FROM t)
           |SELECT doc_id, bi_total, bi_distinct,
           |       CASE WHEN bi_total > 0
           |            THEN 1.0 - CAST(bi_distinct AS DOUBLE) / bi_total ELSE 0.0 END AS bi_dup_frac,
           |       tri_total, tri_distinct,
           |       CASE WHEN tri_total > 0
           |            THEN 1.0 - CAST(tri_distinct AS DOUBLE) / tri_total ELSE 0.0 END AS tri_dup_frac
           |FROM c""".stripMargin))

  /** Deterministic global shuffle + shard for training export (the
    * "shuffle corpus, split into N files" step): shard and in-shard
    * position are pure functions of content — no RNG, hash-exact oracle
    * (see Sampling.shuffleShard). */
  val d18ShuffleShard = NamedQuery(
    "d18_shuffle_shard",
    (s, dir) => {
      graft.ops.Sampling.shuffleShard(
          Tables.documents(s, dir).where(col("text").isNotNull),
          idCol = "doc_id", keyCol = "text", nShards = 16)
        .select(col("doc_id"), col("shard"), col("pos"))
    },
    Some("""SELECT doc_id,
           |       CAST(floor(u * 16) AS BIGINT) AS shard,
           |       CAST(row_number() OVER (PARTITION BY floor(u * 16)
           |                               ORDER BY u, doc_id) AS BIGINT) AS pos
           |FROM (SELECT doc_id,
           |             CAST(md5_number_upper(text) >> 11 AS DOUBLE) / 9007199254740992.0 AS u
           |      FROM documents WHERE text IS NOT NULL)""".stripMargin))

  /** Per-doc token Shannon entropy — the information-density quality
    * signal (see TextAnalysis.tokenEntropy for the float-determinism
    * contract: sorted-count left fold + round 6). */
  val t08Entropy = NamedQuery(
    "t08_entropy",
    (s, dir) => {
      TextAnalysis.tokenEntropy(
        Tables.documents(s, dir).where(col("text").isNotNull), "doc_id", "text")
    },
    Some("""WITH tf AS (
           |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |        FROM documents WHERE text IS NOT NULL)
           |  GROUP BY 1, 2),
           |a AS (SELECT doc_id, list_sort(list(c)) AS cs FROM tf GROUP BY 1)
           |SELECT doc_id,
           |       CAST(list_sum(cs) AS BIGINT) AS n_tokens,
           |       CAST(len(cs) AS BIGINT) AS n_distinct,
           |       round(ln(CAST(list_sum(cs) AS DOUBLE))
           |             - list_sum(list_transform(cs, c -> c * ln(CAST(c AS DOUBLE))))
           |               / CAST(list_sum(cs) AS DOUBLE), 6) AS entropy
           |FROM a""".stripMargin))

  /** Vocabulary build + token-id encoding (the tokenize-for-training
    * step): top-512 terms by (count desc, term) become ids 1..512, every
    * doc re-emitted as its id sequence with OOV → 0. Deterministic tie
    * handling makes the id map — and therefore the encoded corpus —
    * hash-exact reproducible in SQL. */
  val d19VocabEncode = NamedQuery(
    "d19_vocab_encode",
    (s, dir) => {
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
      TextAnalysis.encodeTokens(docs, "doc_id", "text",
        TextAnalysis.buildVocab(docs, "text", size = 512))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           |           WHERE text IS NOT NULL),
           |tok AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos,
           |               unnest(toks) AS term FROM t),
           |vocab AS (SELECT term, CAST(row_number() OVER (ORDER BY c DESC, term) AS BIGINT) AS id
           |          FROM (SELECT term, COUNT(*) AS c FROM tok GROUP BY 1)
           |          QUALIFY id <= 512),
           |enc AS (SELECT tok.doc_id, tok.pos, COALESCE(v.id, 0) AS id
           |        FROM tok LEFT JOIN vocab v USING (term))
           |SELECT doc_id, COUNT(*) AS n_tokens,
           |       array_to_string(list(id ORDER BY pos), ',') AS ids
           |FROM enc GROUP BY doc_id""".stripMargin))

  /** Leak-safe train/val/test split: assignment keyed on the NEAR-DUP
    * CLUSTER id, not the doc id — a document and its near-duplicate
    * can never straddle train and eval (the d32 doc-keyed split leaks
    * exactly that way: two copies of one document hash to different
    * splits and the eval set contains training text). Composition of
    * the two existing guarantees: d09's resolution defines the
    * clusters, d32's growth-stable integer-threshold cut assigns them
    * — every doc inherits its cluster's split, and the assignment
    * stays stable as the corpus grows. Emits the per-split summary
    * (docs + clusters); the no-straddle invariant is structural
    * (split is a FUNCTION of cluster_id) and spec-asserted on dup
    * pairs. */
  val d41LeakSafeSplit = NamedQuery(
    "d41_leaksafe_split",
    (s, dir) => {
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
      val clusters = Dedup.resolveMinhashDups(docs, "doc_id", "text",
          minEstJaccard = 1.0)
        .select(col("doc_id"), col("cluster_id"))
      graft.ops.Sampling.assignSplit(clusters, "cluster_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"))
    },
    Some(s"""WITH $minhashSigCte,
            |keyed AS (
            |  SELECT t.doc_id,
            |         CASE WHEN s.doc_id IS NOT NULL THEN 'L:' || array_to_string(s.sig, ',')
            |              ELSE 'S:' || t.text END AS k
            |  FROM t LEFT JOIN sig s USING (doc_id)),
            |cl AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY k) AS cluster_id
            |       FROM keyed),
            |u AS (SELECT cluster_id,
            |             CAST(md5_number_upper(CAST(cluster_id AS VARCHAR)) >> 11 AS BIGINT) AS h
            |      FROM cl)
            |SELECT CASE WHEN h < 7205759403792793 THEN 'train'
            |            WHEN h < 8106479329266892 THEN 'val' ELSE 'test' END AS split,
            |       CAST(COUNT(*) AS BIGINT) AS n_docs,
            |       CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
            |FROM u GROUP BY 1""".stripMargin))

  /** Vocabulary coverage audit (per-source OOV rate): the share of
    * each source's tokens that a top-20 vocabulary would map to OOV —
    * the "is this source tokenizer-compatible" card a mixture
    * assembly consults before d35 allocates its budget. Two text
    * passes by design — the vocab build (d19's deterministic top-N)
    * and the per-source tally scan different filters of documents and
    * the bounded vocab is what crosses between them; it joins back as
    * a broadcast, and the rate is exact integer milli —
    * (1000·n_oov) div n_tokens. Vocab size 20 of the corpus' ~31
    * terms so the rate is non-degenerate at every SF. */
  val d40OovRate = NamedQuery(
    "d40_oov_rate",
    (s, dir) => {
      // vocab from every text-bearing doc; the per-source tally
      // additionally needs a source key — the SAME split the oracle
      // encodes (a null-source doc still shapes the vocabulary)
      val vocab = TextAnalysis.buildVocab(
        Tables.documents(s, dir).where(col("text").isNotNull), "text", size = 20)
      val docs = Tables.documents(s, dir)
        .where(col("text").isNotNull && col("source").isNotNull)
      docs.select(col("source"), explode(split(col("text"), " ")).as("term"))
        .join(broadcast(vocab.select(col("term"), col("id"))), Seq("term"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("id").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_milli", expr("(1000L * n_oov) div n_tokens"))
    },
    Some("""WITH base AS (SELECT source, unnest(string_split(text, ' ')) AS term
           |              FROM documents
           |              WHERE text IS NOT NULL AND source IS NOT NULL),
           |vocab AS (SELECT term,
           |                 CAST(row_number() OVER (ORDER BY c DESC, term) AS BIGINT) AS id
           |          FROM (SELECT term, COUNT(*) AS c
           |                FROM (SELECT unnest(string_split(text, ' ')) AS term
           |                      FROM documents WHERE text IS NOT NULL) GROUP BY 1)
           |          QUALIFY id <= 20)
           |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |       CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           |       (1000 * CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT))
           |         // CAST(COUNT(*) AS BIGINT) AS oov_milli
           |FROM base LEFT JOIN vocab v USING (term)
           |GROUP BY 1""".stripMargin))

  /** Audio-style fixed-window framing over the raw byte stream (window
    * 1024, hop 512) — the waveform-chunking twin of m02's video frame
    * sampling: frame offsets/lengths are pure integer arithmetic over
    * the payload length, so the mapPartitions-free declarative plan
    * (sequence + explode, narrow) is fully oracle-checked. A real
    * feature extractor would consume (byte_off, byte_len) slices inside
    * the decode partition loop. */
  val m04AudioFrames = NamedQuery(
    "m04_audio_frames",
    (s, dir) => {
      Multimodal.byteFrames(
        Multimodal.asMediaTable(Tables.documents(s, dir), "doc_id", "text"),
        window = 1024, hop = 512)
    },
    Some("""WITH m AS (SELECT doc_id AS media_id,
           |                  CAST(octet_length(encode(text)) AS BIGINT) AS n
           |           FROM documents),
           |f AS (SELECT media_id, n, unnest(generate_series(0, n - 1, 512)) AS byte_off
           |      FROM m WHERE n > 0)
           |SELECT media_id,
           |       CAST(byte_off // 512 AS BIGINT) AS frame_idx,
           |       CAST(byte_off AS BIGINT) AS byte_off,
           |       CAST(least(1024, n - byte_off) AS BIGINT) AS byte_len
           |FROM f""".stripMargin))

  /** Corpus bigram LM statistics (count, history count, conditional
    * probability) — see TextAnalysis.bigramCounts: window-sum
    * denominator, one explode pass, exact-ratio probability. */
  val t09BigramLm = NamedQuery(
    "t09_bigram_lm",
    (s, dir) => {
      TextAnalysis.bigramCounts(
        Tables.documents(s, dir).where(col("text").isNotNull), "text", minCount = 5L)
    },
    Some("""WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents
           |           WHERE text IS NOT NULL),
           |b AS (SELECT unnest(toks[1:len(toks)-1]) AS w1,
           |             unnest(toks[2:len(toks)]) AS w2 FROM t),
           |c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_bigram FROM b GROUP BY 1, 2),
           |w AS (SELECT w1, w2, n_bigram,
           |             CAST(SUM(n_bigram) OVER (PARTITION BY w1) AS BIGINT) AS n_w1
           |      FROM c)
           |SELECT w1, w2, n_bigram, n_w1,
           |       CAST(n_bigram AS DOUBLE) / n_w1 AS cond_p
           |FROM w WHERE n_bigram >= 5""".stripMargin))

  /** Bigram collocation PMI (min count 5) — see TextAnalysis.pmiScores
    * for the overflow-proof ln argument and the round-6 ulp contract. */
  val t10Pmi = NamedQuery(
    "t10_pmi",
    (s, dir) => {
      TextAnalysis.pmiScores(
        Tables.documents(s, dir).where(col("text").isNotNull), "text", minCount = 5L)
    },
    Some("""WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents
           |           WHERE text IS NOT NULL),
           |b AS (SELECT unnest(toks[1:len(toks)-1]) AS w1,
           |             unnest(toks[2:len(toks)]) AS w2 FROM t),
           |c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_bigram FROM b GROUP BY 1, 2),
           |m AS (SELECT w1, w2, n_bigram,
           |             CAST(SUM(n_bigram) OVER (PARTITION BY w1) AS BIGINT) AS n_w1,
           |             CAST(SUM(n_bigram) OVER (PARTITION BY w2) AS BIGINT) AS n_w2,
           |             (SELECT CAST(SUM(len(toks) - 1) AS BIGINT) FROM t) AS n_total
           |      FROM c)
           |SELECT w1, w2, n_bigram, n_w1, n_w2,
           |       round(ln((CAST(n_bigram AS DOUBLE) / n_w1)
           |                * (CAST(n_total AS DOUBLE) / n_w2)), 6) AS pmi
           |FROM m WHERE n_bigram >= 5""".stripMargin))

  /** BPE tokenizer-training pair statistics: top-32 adjacent char pairs
    * weighted by word frequency — the statistic the first BPE merge
    * maximizes (see TextAnalysis.bpePairCounts: char-pair explode runs
    * over DISTINCT terms only, bounded by vocabulary not corpus). */
  val d20BpePairs = NamedQuery(
    "d20_bpe_pairs",
    (s, dir) => {
      TextAnalysis.bpePairCounts(
        Tables.documents(s, dir).where(col("text").isNotNull), "text", k = 32)
    },
    Some("""WITH w AS (
           |  SELECT term, CAST(COUNT(*) AS BIGINT) AS c
           |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents
           |        WHERE text IS NOT NULL)
           |  GROUP BY 1 HAVING length(term) >= 2),
           |p AS (SELECT unnest(list_transform(generate_series(1, length(term) - 1),
           |                                   i -> substring(term, i, 2))) AS pair, c
           |      FROM w),
           |a AS (SELECT pair, CAST(SUM(c) AS BIGINT) AS n_occ FROM p GROUP BY 1)
           |SELECT pair, n_occ,
           |       CAST(row_number() OVER (ORDER BY n_occ DESC, pair) AS BIGINT) AS rank
           |FROM a QUALIFY rank <= 32""".stripMargin))

  /** Temperature-sampling mixture weights per source (α = 0.5, 1M-token
    * budget) — the data-mixing step of corpus assembly (see
    * Sampling.mixtureWeights for the integer-micros determinism
    * contract). */
  val d21MixtureWeights = NamedQuery(
    "d21_mixture_weights",
    (s, dir) => {
      graft.ops.Sampling.mixtureWeights(
        Tables.documents(s, dir).where(col("text").isNotNull),
        stratumCol = "source", textCol = "text", budgetTokens = 1000000L)
    },
    Some("""WITH s AS (
           |  SELECT source AS stratum, COUNT(*) AS n_docs,
           |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           |  FROM documents WHERE text IS NOT NULL GROUP BY 1),
           |w AS (SELECT *, CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_micro
           |      FROM s),
           |t AS (SELECT *, CAST(SUM(w_micro) OVER () AS BIGINT) AS total_micro FROM w)
           |SELECT stratum, n_docs, n_tokens, w_micro,
           |       CAST(w_micro AS DOUBLE) / total_micro AS share,
           |       CAST(round((CAST(w_micro AS DOUBLE) / total_micro) * 1000000.0) AS BIGINT) AS sampled_tokens
           |FROM t""".stripMargin))

  /** Per-source KL divergence from the corpus unigram distribution over
    * the top-256 vocab + <oov> — the domain-shift monitor of a corpus
    * pipeline (see TextAnalysis.domainDivergence for the integer-nanos
    * order-free summation contract). */
  val d22DomainKl = NamedQuery(
    "d22_domain_kl",
    (s, dir) => {
      TextAnalysis.domainDivergence(
        Tables.documents(s, dir).where(col("text").isNotNull),
        "text", "source", vocabSize = 256)
        .select(col("stratum"), col("n_tokens"), col("n_terms"), col("kl"))
    },
    Some("""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
           |             FROM documents WHERE text IS NOT NULL),
           |vc AS (SELECT term FROM (SELECT term, COUNT(*) AS c FROM tok GROUP BY 1)
           |       QUALIFY row_number() OVER (ORDER BY c DESC, term) <= 256),
           |m AS (SELECT tok.source,
           |             CASE WHEN v.term IS NOT NULL THEN tok.term ELSE '<oov>' END AS mterm
           |      FROM tok LEFT JOIN vc v USING (term)),
           |c AS (SELECT source, mterm, CAST(COUNT(*) AS BIGINT) AS n_st FROM m GROUP BY 1, 2),
           |g AS (SELECT *, CAST(SUM(n_st) OVER (PARTITION BY source) AS BIGINT) AS n_s,
           |             CAST(SUM(n_st) OVER (PARTITION BY mterm) AS BIGINT) AS n_ct,
           |             (SELECT CAST(COUNT(*) AS BIGINT) FROM tok) AS n_c
           |      FROM c),
           |n AS (SELECT source, n_s,
           |             CAST(round((CAST(n_st AS DOUBLE) / n_s)
           |                  * ln((CAST(n_st AS DOUBLE) / n_s) / (CAST(n_ct AS DOUBLE) / n_c))
           |                  * 1000000000.0) AS BIGINT) AS nano
           |      FROM g)
           |SELECT source AS stratum, MAX(n_s) AS n_tokens, COUNT(*) AS n_terms,
           |       CAST(SUM(nano) AS DOUBLE) / 1000000000.0 AS kl
           |FROM n GROUP BY 1""".stripMargin))

  /** Multimodal training-record assembly: text features ⋈ embedding
    * features ⋈ media metadata into one record per sample — the final
    * manifest step of a multimodal pipeline. Equi-join on the sample id
    * (sort-merge at scale, AQE broadcasts when a side is small); the
    * embedding norm is exact integer arithmetic over quantized millis. */
  val m05AssembleRecords = NamedQuery(
    "m05_assemble_records",
    (s, dir) => {
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
      val media = Multimodal.asMediaTable(docs, "doc_id", "text")
        .select(col("media_id").as("doc_id"),
          col("meta.nBytes").as("n_bytes"), col("meta.sha").as("sha"))
      val emb = Tables.embeddings(s, dir).select(
        col("vec_id").as("doc_id"),
        size(col("embedding")).cast("long").as("emb_dim"),
        aggregate(
          transform(col("embedding"), x => round(x.cast("double") * 1000, 0).cast("long")),
          lit(0L), (acc, q) => acc + q * q).as("emb_sq_norm"))
      docs.select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .join(emb, Seq("doc_id"))
        .join(media, Seq("doc_id"))
    },
    Some("""SELECT d.doc_id, d.lang,
           |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           |       CAST(len(e.embedding) AS BIGINT) AS emb_dim,
           |       CAST(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]),
           |              x -> CAST(round(x * 1000) AS BIGINT) * CAST(round(x * 1000) AS BIGINT))) AS BIGINT) AS emb_sq_norm,
           |       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
           |       lower(sha256(d.text)) AS sha
           |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
           |WHERE d.text IS NOT NULL""".stripMargin))

  /** Composed Gopher-style curation gate: pass/fail + first failing
    * reason per doc, one narrow pass (see TextAnalysis.qualityFilter).
    * Thresholds calibrated to split the synthetic corpus non-trivially
    * (~8% too_short, ~10% repetitive at sf0.01); too_long /
    * word_too_long are real-world guards this corpus never trips. */
  val d23QualityFilter = NamedQuery(
    "d23_quality_filter",
    (s, dir) => {
      TextAnalysis.qualityFilter(
        Tables.documents(s, dir).where(col("text").isNotNull), "doc_id", "text")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           |           WHERE text IS NOT NULL),
           |m AS (SELECT doc_id,
           |             CAST(len(toks) AS BIGINT) AS n_tokens,
           |             CAST(list_max(list_transform(toks, tk -> length(tk))) AS BIGINT) AS max_word_len,
           |             CASE WHEN len(toks) > 1
           |                  THEN 1.0 - CAST(len(list_distinct(list_transform(
           |                         generate_series(1, len(toks) - 1),
           |                         i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
           |                       / (len(toks) - 1)
           |                  ELSE 0.0 END AS bi_dup_frac
           |      FROM t)
           |SELECT doc_id, n_tokens, max_word_len, bi_dup_frac,
           |       CASE WHEN n_tokens < 20 THEN 'too_short'
           |            WHEN n_tokens > 100000 THEN 'too_long'
           |            WHEN max_word_len > 30 THEN 'word_too_long'
           |            WHEN bi_dup_frac > 0.06 THEN 'repetitive'
           |            ELSE 'ok' END AS fail_reason,
           |       CASE WHEN n_tokens >= 20 AND n_tokens <= 100000
           |             AND max_word_len <= 30 AND bi_dup_frac <= 0.06
           |            THEN TRUE ELSE FALSE END AS passed
           |FROM m""".stripMargin))

  /** Zipf rank-frequency fit over the top-256 vocabulary — see
    * TextAnalysis.zipfFit for the integer-millis regression contract. */
  val t11Zipf = NamedQuery(
    "t11_zipf",
    (s, dir) => {
      TextAnalysis.zipfFit(
        Tables.documents(s, dir).where(col("text").isNotNull), "text", topK = 256)
    },
    Some("""WITH tc AS (
           |  SELECT term, CAST(COUNT(*) AS BIGINT) AS c
           |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents
           |        WHERE text IS NOT NULL)
           |  GROUP BY 1),
           |pts AS (
           |  SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1000) AS BIGINT) AS x,
           |         CAST(round(ln(CAST(c AS DOUBLE)) * 1000) AS BIGINT) AS y
           |  FROM (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rank FROM tc)
           |  WHERE rank <= 256),
           |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           |             CAST(SUM(x * y) AS BIGINT) AS sxy,
           |             CAST(SUM(x * x) AS BIGINT) AS sxx
           |      FROM pts),
           |sl AS (SELECT *, round(CAST(n * sxy - sx * sy AS DOUBLE)
           |                       / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope
           |       FROM s)
           |SELECT n AS n_terms, slope,
           |       round((CAST(sy AS DOUBLE) / 1000 - slope * (CAST(sx AS DOUBLE) / 1000)) / n, 6) AS intercept
           |FROM sl""".stripMargin))

  /** ViT-style patch tiling over decoded media (64-px ceil grid, true
    * edge extents) — integer arithmetic over the stub decoder's
    * dimensions, SQL-reproducible like m02/m03 (see
    * Multimodal.patchGrid). */
  val m06PatchGrid = NamedQuery(
    "m06_patch_grid",
    (s, dir) => {
      val media = Multimodal.asMediaTable(Tables.documents(s, dir), "doc_id", "text")
      Multimodal.patchGrid(Multimodal.decode(s, media), patch = 64)
    },
    Some("""WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n FROM documents),
           |d AS (SELECT media_id, CAST(64 + n % 512 AS BIGINT) AS width,
           |             CAST(64 + (n // 7) % 512 AS BIGINT) AS height FROM m),
           |g AS (SELECT *, (width + 63) // 64 AS nc, (height + 63) // 64 AS nr FROM d)
           |SELECT media_id, CAST(i AS BIGINT) AS patch_idx,
           |       CAST(i // nc AS BIGINT) AS prow, CAST(i % nc AS BIGINT) AS pcol,
           |       CAST((i % nc) * 64 AS BIGINT) AS x0, CAST((i // nc) * 64 AS BIGINT) AS y0,
           |       CAST(least(64, width - (i % nc) * 64) AS BIGINT) AS p_width,
           |       CAST(least(64, height - (i // nc) * 64) AS BIGINT) AS p_height
           |FROM g CROSS JOIN generate_series(0, 99) t(i) WHERE i < nr * nc""".stripMargin))

  /** Perceptual near-dup for media: pHash over the stub-decoded payload
    * (16-char blocks as the patch stream — see
    * Multimodal.perceptualHashes) banded through the shared fingerprint
    * candidate machinery (Dedup.fingerprintCandidates). Oracle-checked
    * end to end because the stub decode is byte-deterministic and the
    * fingerprint is the portable md5 simhash chain (the d04 SQL, over
    * blocks instead of tokens); the band join carries the maxBucketSize
    * cap in its `bc` CTE, mirroring capBuckets. */
  val m07PerceptualNeardup = NamedQuery(
    "m07_perceptual_neardup",
    (s, dir) => {
      val media = Multimodal.asMediaTable(
        Tables.documents(s, dir).where(col("text").isNotNull), "doc_id", "text")
      Multimodal.perceptualCandidates(media, block = 16, maxHamming = 8)
    },
    Some("""WITH src AS (
           |  SELECT doc_id AS media_id, text AS s FROM documents
           |  WHERE text IS NOT NULL AND length(text) > 0),
           |pt AS (SELECT media_id,
           |              unnest(list_transform(generate_series(1, (length(s) + 15) // 16),
           |                                    i -> substring(s, (i - 1) * 16 + 1, 16))) AS patch
           |       FROM src),
           |ph AS (SELECT media_id, md5_number_upper(patch) AS h FROM pt),
           |bits AS (SELECT media_id, i,
           |                CASE WHEN SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS bit
           |         FROM ph CROSS JOIN generate_series(0, 63) g(i) GROUP BY media_id, i),
           |fp0 AS (SELECT media_id, SUM(CASE WHEN bit = 1 THEN CAST(1 AS HUGEINT) << i ELSE 0 END) AS m
           |        FROM bits GROUP BY media_id),
           |fp AS (SELECT media_id,
           |              CAST(CASE WHEN m >= 9223372036854775808 THEN m - 18446744073709551616 ELSE m END AS BIGINT) AS fp
           |       FROM fp0),
           |bands AS (SELECT media_id, fp, b, (fp >> (b * 16)) & 65535 AS bucket
           |          FROM fp CROSS JOIN generate_series(0, 3) bb(b)),
           |bc AS (SELECT b, bucket FROM bands GROUP BY 1, 2 HAVING COUNT(*) <= 10000)
           |SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
           |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
           |FROM bands a JOIN bands b
           |  ON a.b = b.b AND a.bucket = b.bucket AND a.media_id < b.media_id
           |JOIN bc ON a.b = bc.b AND a.bucket = bc.bucket
           |WHERE bit_count(xor(a.fp, b.fp)) <= 8""".stripMargin))

  /** C4-style cross-document chunk dedup (8-token disjoint chunks,
    * global first-occurrence wins): per-doc kept/removed tallies — see
    * Dedup.chunkDedupStats (md5 keys travel, not text; ~5% of chunks
    * are cross-doc dups on this corpus, so the op demonstrably fires). */
  val d24ChunkDedup = NamedQuery(
    "d24_chunk_dedup",
    (s, dir) => {
      Dedup.chunkDedupStats(
        Tables.documents(s, dir).where(col("text").isNotNull),
        "doc_id", "text", chunkTokens = 8)
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           |           WHERE text IS NOT NULL),
           |c AS (SELECT doc_id, unnest(generate_series(0, (len(toks) - 1) // 8)) AS chunk_idx,
           |             toks
           |      FROM t WHERE len(toks) > 0),
           |x AS (SELECT doc_id, chunk_idx,
           |             md5(array_to_string(toks[chunk_idx*8+1 : chunk_idx*8+8], ' ')) AS h
           |      FROM c),
           |g AS (SELECT h FROM x GROUP BY h HAVING COUNT(*) <= 100000),
           |r AS (SELECT doc_id, chunk_idx,
           |             row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rk
           |      FROM x JOIN g USING (h))
           |SELECT doc_id, COUNT(*) AS n_chunks,
           |       CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |       CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
           |FROM r GROUP BY 1""".stripMargin))

  /** The full curation pipeline — quality gate → exact dedup → balanced
    * sample — composed as ONE declarative plan with per-stage survivor
    * counts: every stage is a FLAG on the same frame (quality is narrow
    * arithmetic; dedup-canonical is one window MIN over md5(text)
    * restricted to quality survivors; the sample flag is content-keyed),
    * so the whole funnel costs one narrow pass + ONE shuffle (the dedup
    * window) + a 1-row aggregate, instead of four chained jobs each
    * re-reading the corpus. The same flags select the surviving rows in
    * production; emitting the stage tallies exercises the identical
    * plan. */
  val d25CurationPipeline = NamedQuery(
    "d25_curation_pipeline",
    (s, dir) => {
      import graft.functions.TextHashExpressions.shingles
      val toks = split(col("text"), " ")
      val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
      val staged = Tables.documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"), col("lang"), col("text"),
          size(toks).cast("long").as("_nt"),
          array_max(transform(toks, t => length(t))).cast("long").as("_mw"),
          when(size(toks) > 1,
            lit(1.0) - size(shingles(toks, 2)).cast("double") / (size(toks) - 1))
            .otherwise(lit(0.0)).as("_bd"))
        .withColumn("_q", col("_nt") >= 20 && col("_nt") <= 100000 &&
          col("_mw") <= 30 && col("_bd") <= 0.06)
        .withColumn("_minq", min(when(col("_q"), col("doc_id"))).over(w))
        .withColumn("_d", col("_q") && col("doc_id") === col("_minq"))
        .withColumn("_s", col("_d") && graft.ops.Sampling.hashUniform(col("text")) <
          when(col("lang") === "en", 0.5).otherwise(1.0))
      staged.agg(
          count(lit(1)).as("n0"),
          sum(when(col("_q"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("_d"), 1L).otherwise(0L)).as("n2"),
          sum(when(col("_s"), 1L).otherwise(0L)).as("n3"))
        .select(explode(array(
          struct(lit(0L).as("stage"), lit("input").as("name"), col("n0").as("n_docs")),
          struct(lit(1L).as("stage"), lit("quality").as("name"), col("n1").as("n_docs")),
          struct(lit(2L).as("stage"), lit("dedup").as("name"), col("n2").as("n_docs")),
          struct(lit(3L).as("stage"), lit("sample").as("name"), col("n3").as("n_docs"))))
          .as("r"))
        .select(col("r.stage").as("stage"), col("r.name").as("name"),
          col("r.n_docs").as("n_docs"))
    },
    Some("""WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
           |           FROM documents WHERE text IS NOT NULL),
           |f AS (SELECT doc_id, lang, text,
           |             CAST(len(toks) AS BIGINT) AS nt,
           |             CAST(list_max(list_transform(toks, tk -> length(tk))) AS BIGINT) AS mw,
           |             CASE WHEN len(toks) > 1
           |                  THEN 1.0 - CAST(len(list_distinct(list_transform(
           |                         generate_series(1, len(toks) - 1),
           |                         i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
           |                       / (len(toks) - 1)
           |                  ELSE 0.0 END AS bd
           |      FROM t),
           |q AS (SELECT *, (nt >= 20 AND nt <= 100000 AND mw <= 30 AND bd <= 0.06) AS qok
           |      FROM f),
           |d AS (SELECT *, qok AND doc_id = MIN(CASE WHEN qok THEN doc_id END)
           |               OVER (PARTITION BY md5(text)) AS dok
           |      FROM q),
           |sc AS (SELECT *, dok AND
           |              (CAST(md5_number_upper(text) >> 11 AS DOUBLE) / 9007199254740992.0)
           |                < (CASE WHEN lang = 'en' THEN 0.5 ELSE 1.0 END) AS sok
           |       FROM d),
           |a AS (SELECT COUNT(*) AS n0,
           |             CAST(SUM(CASE WHEN qok THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           |             CAST(SUM(CASE WHEN dok THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           |             CAST(SUM(CASE WHEN sok THEN 1 ELSE 0 END) AS BIGINT) AS n3
           |      FROM sc)
           |SELECT CAST(0 AS BIGINT) AS stage, 'input' AS name, n0 AS n_docs FROM a
           |UNION ALL SELECT 1, 'quality', n1 FROM a
           |UNION ALL SELECT 2, 'dedup', n2 FROM a
           |UNION ALL SELECT 3, 'sample', n3 FROM a""".stripMargin))

  /** k-anonymity audit over quasi-identifiers (nation × market segment,
    * k = 10): every equivalence class with its size and compliance flag —
    * the data-governance check run before releasing a dataset keyed on
    * quasi-identifiers. One hash-aggregate; the violating classes are
    * the `NOT k_ok` slice. */
  val d26KAnonymity = NamedQuery(
    "d26_k_anonymity",
    (s, dir) => {
      Tables.customer(s, dir)
        .groupBy(col("c_nationkey").cast("long").as("nationkey"),
          col("c_mktsegment").as("mktsegment"))
        .agg(count(lit(1)).as("n_members"))
        .withColumn("k_ok", col("n_members") >= 10)
    },
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment AS mktsegment,
           |       COUNT(*) AS n_members, COUNT(*) >= 10 AS k_ok
           |FROM customer GROUP BY 1, 2""".stripMargin))

  /** Right-to-be-forgotten purge accounting: given a deletion-request
    * list (subject ids ≡ 0 mod 17 as the deterministic stand-in), report
    * purged/kept row counts per table, INCLUDING the two-hop cascade
    * lineitem ← orders ← subject. The subject list joins as a table
    * (broadcast — request lists are small); the lineitem cascade joins
    * on the purged ORDER keys without a broadcast hint, because at real
    * scale a heavy deleter's order set is not broadcast-sized (AQE
    * promotes it when it is). Each table contributes one aggregate
    * branch; the only re-derived subtree is the tiny subject scan. */
  val d27ForgetPurge = NamedQuery(
    "d27_forget_purge",
    (s, dir) => {
      val subjects = Tables.customer(s, dir)
        .where(pmod(col("c_custkey"), lit(17L)) === 0)
        .select(col("c_custkey").as("sid"))
      def tally(df: org.apache.spark.sql.DataFrame, key: String, table: String,
          hinted: Boolean = true) = {
        val subj = if (hinted) broadcast(subjects) else subjects
        df.join(subj, col(key) === col("sid"), "left")
          .agg(sum(when(col("sid").isNotNull, 1L).otherwise(0L)).as("n_purged"),
            sum(when(col("sid").isNull, 1L).otherwise(0L)).as("n_kept"))
          .select(lit(table).as("table"), col("n_purged"), col("n_kept"))
      }
      val purgedOrders = Tables.orders(s, dir)
        .join(broadcast(subjects), col("o_custkey") === col("sid"), "left_semi")
        .select(col("o_orderkey").as("sid"))
      tally(Tables.customer(s, dir), "c_custkey", "customer")
        .unionByName(tally(Tables.orders(s, dir), "o_custkey", "orders"))
        .unionByName(tally(Tables.events(s, dir), "user_id", "events"))
        .unionByName(
          Tables.lineitem(s, dir)
            .join(purgedOrders, col("l_orderkey") === col("sid"), "left")
            .agg(sum(when(col("sid").isNotNull, 1L).otherwise(0L)).as("n_purged"),
              sum(when(col("sid").isNull, 1L).otherwise(0L)).as("n_kept"))
            .select(lit("lineitem").as("table"), col("n_purged"), col("n_kept")))
    },
    Some("""WITH subj AS (SELECT c_custkey AS sid FROM customer WHERE c_custkey % 17 = 0),
           |po AS (SELECT o_orderkey AS sid FROM orders
           |       WHERE o_custkey IN (SELECT sid FROM subj))
           |SELECT 'customer' AS "table",
           |       CAST(SUM(CASE WHEN c_custkey IN (SELECT sid FROM subj) THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
           |       CAST(SUM(CASE WHEN c_custkey IN (SELECT sid FROM subj) THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
           |FROM customer
           |UNION ALL
           |SELECT 'orders',
           |       CAST(SUM(CASE WHEN o_custkey IN (SELECT sid FROM subj) THEN 1 ELSE 0 END) AS BIGINT),
           |       CAST(SUM(CASE WHEN o_custkey IN (SELECT sid FROM subj) THEN 0 ELSE 1 END) AS BIGINT)
           |FROM orders
           |UNION ALL
           |SELECT 'events',
           |       CAST(SUM(CASE WHEN user_id IN (SELECT sid FROM subj) THEN 1 ELSE 0 END) AS BIGINT),
           |       CAST(SUM(CASE WHEN user_id IN (SELECT sid FROM subj) THEN 0 ELSE 1 END) AS BIGINT)
           |FROM events
           |UNION ALL
           |SELECT 'lineitem',
           |       CAST(SUM(CASE WHEN l_orderkey IN (SELECT sid FROM po) THEN 1 ELSE 0 END) AS BIGINT),
           |       CAST(SUM(CASE WHEN l_orderkey IN (SELECT sid FROM po) THEN 0 ELSE 1 END) AS BIGINT)
           |FROM lineitem""".stripMargin))

  /** CCNet/Gopher-style LM quality filter: per-doc cross-entropy under
    * the corpus's own add-one-smoothed bigram LM — see
    * TextAnalysis.docCrossEntropy for the integer-nanos order-free sum
    * and the one-explode corpus pass. High xent = improbable token
    * transitions (boilerplate, garbled text, wrong language). */
  val d28LmQuality = NamedQuery(
    "d28_lm_quality",
    (s, dir) => {
      TextAnalysis.docCrossEntropy(
        Tables.documents(s, dir).where(col("text").isNotNull),
        "doc_id", "text")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           |           WHERE text IS NOT NULL),
           |b AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
           |             unnest(toks[2:len(toks)]) AS w2 FROM t),
           |c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_bigram FROM b GROUP BY 1, 2),
           |bg AS (SELECT w1, w2, n_bigram,
           |              CAST(SUM(n_bigram) OVER (PARTITION BY w1) AS BIGINT) AS n_w1
           |       FROM c),
           |v AS (SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v FROM (
           |        SELECT w1 AS tk FROM bg UNION SELECT w2 FROM bg)),
           |n AS (SELECT b.doc_id,
           |             CAST(round(-ln((bg.n_bigram + 1)
           |                            / CAST(bg.n_w1 + v.v AS DOUBLE)) * 1e9) AS BIGINT) AS nanos
           |      FROM b JOIN bg USING (w1, w2) CROSS JOIN v)
           |SELECT doc_id, COUNT(*) AS n_bigrams,
           |       round(CAST(SUM(nanos) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e9), 6) AS xent
           |FROM n GROUP BY doc_id""".stripMargin))

  /** The k-round BPE TRAINING loop (d20 is one round's statistic; this
    * is the tokenizer build): argmax pair → greedy merge everywhere →
    * recount, 6 rounds over the documents vocabulary. Oracle: DuckDB
    * replays every round with the SAME argmax-as-scalar-subquery and
    * the SAME string `replace` merge (identical left-to-right
    * non-overlapping scan in both engines) — the d10 unroll-the-
    * iterations trick, generated per round by [[bpeOracleSql]]. See
    * TextAnalysis.bpeTrain for the representation and scale notes. */
  val d29BpeTrain = NamedQuery(
    "d29_bpe_train",
    (s, dir) => {
      TextAnalysis.bpeTrain(
        Tables.documents(s, dir).where(col("text").isNotNull),
        "text", merges = 6)
    },
    Some(bpeOracleSql(6)))

  /** DuckDB replay of [[TextAnalysis.bpeTrain]]'s learning loop, `k`
    * rounds unrolled as CTE pairs (v_r = vocabulary after r merges,
    * p_r = round r's argmax pair): the merge pair is injected into
    * round r+1's replace via scalar subqueries, so the oracle LEARNS
    * the merges itself rather than trusting Spark's. AS MATERIALIZED is
    * load-bearing: each CTE is referenced several times downstream, and
    * without it DuckDB re-inlines the whole v0→p_r chain per reference
    * — exponential in k (measured: >3 min inlined vs 0.1 s materialized
    * at sf0.001). Returns the WITH body through p_k — shared training
    * prefix for the d29 (merge table) and d30 (encode) oracles. */
  private def bpeTrainCtes(k: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH w AS (
             |  SELECT term, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents
             |        WHERE text IS NOT NULL)
             |  GROUP BY 1 HAVING length(term) >= 2),
             |v0 AS MATERIALIZED (
             |  SELECT ' ' || array_to_string(list_transform(generate_series(1, length(term)),
             |                                               i -> term[i:i]), '  ') || ' ' AS syms,
             |         c AS freq
             |  FROM w)""".stripMargin
    for (r <- 1 to k) {
      sb ++= s""",
               |p$r AS MATERIALIZED (
               |  SELECT s[i] AS l, s[i + 1] AS r, CAST(SUM(freq) AS BIGINT) AS n_occ
               |  FROM (SELECT string_split(trim(syms), '  ') AS s, freq FROM v${r - 1}),
               |       unnest(generate_series(1, len(s) - 1)) t(i)
               |  GROUP BY 1, 2 ORDER BY n_occ DESC, l, r LIMIT 1)""".stripMargin
      if (r < k) sb ++= s""",
               |v$r AS MATERIALIZED (
               |  SELECT replace(syms,
               |                 ' ' || (SELECT l FROM p$r) || '  ' || (SELECT r FROM p$r) || ' ',
               |                 ' ' || (SELECT l FROM p$r) || (SELECT r FROM p$r) || ' ') AS syms,
               |         freq
               |  FROM v${r - 1})""".stripMargin
    }
    sb.toString
  }

  private def bpeOracleSql(k: Int): String =
    bpeTrainCtes(k) + (1 to k).map(r =>
      s"""
         |SELECT CAST($r AS BIGINT) AS rank, l, r, l || r AS merged, n_occ FROM p$r"""
        .stripMargin).mkString("\nUNION ALL")

  /** DuckDB replay of [[TextAnalysis.bpeEncode]]: relearn the merges
    * (shared [[bpeTrainCtes]] prefix), then re-render EVERY term —
    * including the 1-char terms training excludes — and apply the k
    * replaces in rank order before exploding tokens weighted by term
    * frequency. The replace chain uses the same scalar-subquery
    * injection as training, so the oracle derives the whole tokenizer
    * end to end. */
  private def bpeEncodeOracleSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= bpeTrainCtes(k)
    sb ++= """,
             |wall AS (
             |  SELECT term, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents
             |        WHERE text IS NOT NULL)
             |  GROUP BY 1 HAVING length(term) >= 1),
             |e0 AS MATERIALIZED (
             |  SELECT ' ' || array_to_string(list_transform(generate_series(1, length(term)),
             |                                               i -> term[i:i]), '  ') || ' ' AS syms,
             |         c AS freq
             |  FROM wall)""".stripMargin
    for (r <- 1 to k) {
      sb ++= s""",
               |e$r AS MATERIALIZED (
               |  SELECT replace(syms,
               |                 ' ' || (SELECT l FROM p$r) || '  ' || (SELECT r FROM p$r) || ' ',
               |                 ' ' || (SELECT l FROM p$r) || (SELECT r FROM p$r) || ' ') AS syms,
               |         freq
               |  FROM e${r - 1})""".stripMargin
    }
    sb ++= s"""
              |SELECT token, CAST(SUM(freq) AS BIGINT) AS n_occ
              |FROM (SELECT unnest(string_split(trim(syms), '  ')) AS token, freq FROM e$k)
              |GROUP BY token""".stripMargin
    sb.toString
  }

  /** The tokenizer loop CLOSED: train 6 merges on the corpus
    * (d29's loop), then ENCODE the same corpus with them —
    * output is the post-BPE token frequency table (the vocabulary a
    * pretraining pipeline ships alongside the merge list). Training
    * cost is d29's; encoding adds only a narrow k-replace over
    * distinct terms and a vocab-bounded agg — see
    * TextAnalysis.bpeEncode. The oracle relearns the merges AND
    * re-derives the encoding, so the whole tokenizer round-trips
    * through a second engine. */
  val d30BpeEncode = NamedQuery(
    "d30_bpe_encode",
    (s, dir) => {
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
      TextAnalysis.bpeEncode(docs, "text",
        TextAnalysis.bpeTrain(docs, "text", merges = 6))
    },
    Some(bpeEncodeOracleSql(6)))

  /** Quality/importance-weighted corpus draw: sample 100 documents
    * without replacement with probability ∝ an integer weight (token
    * count DIV 16, clamped to [1,32]) — Efraimidis–Spirakis A-ES with
    * the float-free max-of-w-draws key (see Sampling.weightedSample:
    * P(max of w uniforms ≤ t) = t^w, every draw an exact 53-bit
    * integer). One narrow projection + TakeOrdered; the oracle
    * recomputes the identical priorities in DuckDB. */
  val d31WeightedSample = NamedQuery(
    "d31_weighted_sample",
    (s, dir) => {
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("w", greatest(expr("n_tokens DIV 16"), lit(1L)))
      graft.ops.Sampling.weightedSample(docs, "doc_id", col("w"),
          k = 100, maxWeight = 32)
        .select(col("doc_id"), col("n_tokens"),
          least(col("w"), lit(32L)).as("w"), col("_pri").as("pri"))
    },
    Some("""WITH d AS (
           |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           |  FROM documents WHERE text IS NOT NULL),
           |w AS (SELECT doc_id, n_tokens,
           |             LEAST(GREATEST(n_tokens // 16, 1), 32) AS w FROM d),
           |p AS (SELECT doc_id, n_tokens, CAST(w AS BIGINT) AS w,
           |             CAST(list_max(list_transform(generate_series(1, CAST(w AS INT)),
           |               i -> md5_number_upper(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)) >> 11))
           |               AS BIGINT) AS pri
           |      FROM w)
           |SELECT doc_id, n_tokens, w, pri FROM p
           |ORDER BY pri DESC, doc_id LIMIT 100""".stripMargin))

  /** Deterministic train/val/test assignment (80/10/10 cumulative cuts
    * of the content-keyed uniform): a document's split never changes as
    * the corpus grows — the property that keeps held-out sets
    * uncontaminated across dataset versions. Narrow when-chain + one
    * (split, lang) hash-agg. The oracle's literal thresholds are the
    * same integers assignSplit computes: floor(800000·2^53/10^6) =
    * 7205759403792793 and floor(900000·2^53/10^6) = 8106479329266892 —
    * both engines compare the raw 53-bit hash in integer space, so the
    * boundary ulp cannot classify differently (no accumulated-double
    * cuts anywhere). */
  val d32SplitAssign = NamedQuery(
    "d32_split_assign",
    (s, dir) => {
      graft.ops.Sampling.assignSplit(
          Tables.documents(s, dir).where(col("text").isNotNull),
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    },
    Some("""WITH u AS (
           |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
           |         CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) >> 11 AS BIGINT) AS h
           |  FROM documents WHERE text IS NOT NULL)
           |SELECT CASE WHEN h < 7205759403792793 THEN 'train'
           |            WHEN h < 8106479329266892 THEN 'val' ELSE 'test' END AS split,
           |       lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |       CAST(SUM(n_toks) AS BIGINT) AS n_tokens
           |FROM u GROUP BY 1, 2""".stripMargin))

  /** Curriculum-ordered training export: rank the corpus by a
    * difficulty proxy (token count, doc_id tie-break — a total order)
    * with the SCALE-SAFE two-phase global rank (ops/Ranking
    * .globalRowNumber — one range exchange, never a single-partition
    * window), then assign fixed-size curriculum shards. The q60
    * primitive doing the training-data job it was built for. */
  val d33Curriculum = NamedQuery(
    "d33_curriculum",
    (s, dir) => {
      graft.ops.Ranking.globalRowNumber(
          Tables.documents(s, dir).where(col("text").isNotNull)
            .select(col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("n_tokens")),
          Seq(col("n_tokens"), col("doc_id")), rankCol = "rank")
        .select(col("doc_id"), col("n_tokens"), col("rank"),
          expr("(rank - 1) DIV 100").as("shard"))
    },
    Some("""SELECT doc_id, n_tokens,
           |       CAST(row_number() OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS rank,
           |       (CAST(row_number() OVER (ORDER BY n_tokens, doc_id) AS BIGINT) - 1) // 100 AS shard
           |FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           |      FROM documents WHERE text IS NOT NULL)""".stripMargin))

  /** Dataset-version diff audit (ops/Dedup.corpusDiff): documents vs a
    * deterministically derived v2 (every 13th doc removed, every 7th
    * doc's text amended, every 17th doc cloned under a new id) —
    * per-status doc counts and net token delta, the release note a
    * versioned corpus pipeline publishes. The diff shuffles (id,
    * fingerprint, token count) only — never text. */
  val d34CorpusDiff = NamedQuery(
    "d34_corpus_diff",
    (s, dir) => {
      val v1 = Tables.documents(s, dir)
      // clone ids mirror to the NEGATIVE range (-id - 1): collision with
      // a real non-negative doc_id is impossible at ANY scale factor —
      // an additive offset would silently collide once ids exceed it,
      // fanning out corpusDiff's full-outer join on both engines at once
      val v2 = v1.where(col("doc_id") % 13 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0 && col("text").isNotNull,
            concat(col("text"), lit(" v2changed"))).otherwise(col("text")))
        .unionByName(v1.where(col("doc_id") % 17 === 0)
          .withColumn("doc_id", -col("doc_id") - 1L))
      Dedup.corpusDiff(v1, v2, "doc_id", "text")
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("token_delta")).as("token_delta"))
    },
    Some("""WITH v2 AS (
           |  SELECT doc_id,
           |         CASE WHEN doc_id % 7 = 0 AND text IS NOT NULL
           |              THEN text || ' v2changed' ELSE text END AS text
           |  FROM documents WHERE doc_id % 13 <> 0
           |  UNION ALL
           |  SELECT -doc_id - 1, text FROM documents WHERE doc_id % 17 = 0),
           |a AS (SELECT doc_id AS id,
           |             COALESCE(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), '-') AS fp,
           |             COALESCE(CAST(len(string_split(text, ' ')) AS BIGINT), 0) AS tok
           |      FROM documents),
           |b AS (SELECT doc_id AS id,
           |             COALESCE(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), '-') AS fp,
           |             COALESCE(CAST(len(string_split(text, ' ')) AS BIGINT), 0) AS tok
           |      FROM v2),
           |d AS (SELECT CASE WHEN a.fp IS NULL THEN 'added'
           |                  WHEN b.fp IS NULL THEN 'removed'
           |                  WHEN a.fp = b.fp THEN 'unchanged'
           |                  ELSE 'changed' END AS status,
           |             COALESCE(b.tok, 0) - COALESCE(a.tok, 0) AS delta
           |      FROM a FULL OUTER JOIN b ON a.id = b.id)
           |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |       CAST(SUM(delta) AS BIGINT) AS token_delta
           |FROM d GROUP BY 1""".stripMargin))

  /** The α=0.5 mixture ENFORCED under a 20k-token budget
    * (ops/Sampling.budgetedAssembly): every source contributes the
    * prefix of its deterministic layout order that starts inside its
    * allocation — d21 computes the weights, this builds the corpus.
    * Start offsets via the distributed prefix sum (no stratum-sized
    * single task); allocations broadcast. Oracle replays weights,
    * layout, and cut. */
  val d35BudgetAssembly = NamedQuery(
    "d35_budget_assembly",
    (s, dir) => {
      graft.ops.Sampling.budgetedAssembly(
          Tables.documents(s, dir).where(col("text").isNotNull),
          "doc_id", "source", "text", budgetTokens = 20000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(col("n_tokens")).as("tokens_kept"),
          max(col("alloc_tokens")).as("alloc_tokens"))
    },
    Some("""WITH s AS (
           |  SELECT source AS stratum, COUNT(*) AS n_docs,
           |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           |  FROM documents WHERE text IS NOT NULL GROUP BY 1),
           |w AS (SELECT *, CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_micro
           |      FROM s),
           |t AS (SELECT *, CAST(SUM(w_micro) OVER () AS BIGINT) AS total_micro FROM w),
           |a AS (SELECT stratum,
           |             CAST(round((CAST(w_micro AS DOUBLE) / total_micro) * 20000.0) AS BIGINT) AS alloc
           |      FROM t),
           |d AS (SELECT source, doc_id,
           |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |             CAST(md5_number_upper(text) >> 11 AS DOUBLE) / 9007199254740992.0 AS u
           |      FROM documents WHERE text IS NOT NULL),
           |c AS (SELECT source, doc_id, n_tokens,
           |             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
           |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |               - n_tokens AS start
           |      FROM d)
           |SELECT c.source, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           |       CAST(SUM(c.n_tokens) AS BIGINT) AS tokens_kept,
           |       CAST(MAX(a.alloc) AS BIGINT) AS alloc_tokens
           |FROM c JOIN a ON c.source = a.stratum
           |WHERE c.start < a.alloc GROUP BY 1""".stripMargin))

  /** WebDataset-style shard export (ops/Multimodal.tarShards): the
    * media table is cut into 8 deterministic shards and each becomes a
    * REAL ustar blob. The oracle cannot build tar in SQL — instead it
    * exploits that ustar is arithmetic: with 512-byte blocks the
    * archive length is exactly Σ(512 + ceil(size/512)·512) + 1024, so
    * DuckDB derives every shard's expected byte length from sample
    * sizes alone and the hash match proves the real archives have
    * exactly those lengths (round-trip content equality is spec'd in
    * MultimodalSpec). */
  val m08TarShards = NamedQuery(
    "m08_tar_shards",
    (s, dir) => {
      Multimodal.tarShards(s,
          Multimodal.asMediaTable(
            Tables.documents(s, dir).where(col("text").isNotNull),
            "doc_id", "text"),
          nShards = 8)
        .toDF()
        .select(col("shard"), col("n_samples"), col("payload_bytes"),
          octet_length(col("tar")).cast("long").as("tar_len"))
    },
    Some("""WITH m AS (
           |  SELECT doc_id AS media_id,
           |         CAST(octet_length(encode(text)) AS BIGINT) AS sz
           |  FROM documents WHERE text IS NOT NULL),
           |s AS (SELECT media_id, sz,
           |             CAST(floor(CAST(md5_number_upper(CAST(media_id AS VARCHAR)) >> 11 AS DOUBLE)
           |                        / 9007199254740992.0 * 8) AS BIGINT) AS shard
           |      FROM m)
           |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_samples,
           |       CAST(SUM(sz) AS BIGINT) AS payload_bytes,
           |       CAST(SUM(512 + (sz + 511) // 512 * 512) + 1024 AS BIGINT) AS tar_len
           |FROM s GROUP BY shard""".stripMargin))

  /** The full WebDataset round trip proven against SQL: documents →
    * real ustar shard blobs → samples extracted BACK out of the archive
    * bytes, each reduced to (media_id, n_bytes, sha256). The oracle
    * computes the same triple straight from the documents table — a
    * hash match means the packed-then-unpacked payloads are
    * byte-identical to the source, through genuine tar bytes the
    * oracle never sees. */
  val m09TarRoundtrip = NamedQuery(
    "m09_tar_roundtrip",
    (s, dir) => {
      val media = Multimodal.asMediaTable(
        Tables.documents(s, dir).where(col("text").isNotNull),
        "doc_id", "text")
      Multimodal.untarSamples(s, Multimodal.tarShards(s, media, nShards = 8))
        .toDF()
        .select(col("key").cast("long").as("media_id"),
          octet_length(col("content")).cast("long").as("n_bytes"),
          sha2(col("content"), 256).as("sha"))
    },
    Some("""SELECT doc_id AS media_id,
           |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |       lower(sha256(text)) AS sha
           |FROM documents WHERE text IS NOT NULL""".stripMargin))

  /** REAL image decode (Multimodal.renderPngs + decodePngs): one PNG
    * per document — width/height/channels derived from doc_id by pure
    * integer arithmetic, red a horizontal gradient, green/blue solid —
    * encoded to actual PNG bytes and decoded back with JDK
    * `javax.imageio` at the mapPartitions codec seam. The output is
    * the DECODED dimensions and exact per-channel pixel sums, so the
    * oracle (which recomputes the expected sums from the same doc_id
    * arithmetic — the generator manifest, inlined) certifies a real
    * lossless codec round trip, not a byte hash: any decoder
    * mis-read of dims, channel order, or a single pixel breaks the
    * hash. Corrupt payloads become ok=false null AUDIT rows, never
    * task failures (spec-pinned in MultimodalSpec). */
  val m10PngDecode = NamedQuery(
    "m10_png_decode",
    (s, dir) => {
      import s.implicits._
      val srcs = Tables.documents(s, dir).select(
          col("doc_id").as("media_id"),
          (lit(8) + pmod(col("doc_id"), lit(24L))).cast("int").as("width"),
          (lit(8) + pmod(expr("doc_id div 24"), lit(24L))).cast("int").as("height"),
          pmod(col("doc_id") * 7, lit(256L)).cast("int").as("g"),
          pmod(col("doc_id") * 13, lit(256L)).cast("int").as("b"))
        .as[Multimodal.PngSource]
      Multimodal.decodePngs(s, Multimodal.renderPngs(s, srcs))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("r_sum"), col("g_sum"), col("b_sum"))
    },
    Some("""WITH dims AS (
           |  SELECT doc_id,
           |         CAST(8 + doc_id % 24 AS INT) AS w,
           |         CAST(8 + (doc_id // 24) % 24 AS INT) AS h,
           |         doc_id * 7 % 256 AS g, doc_id * 13 % 256 AS b
           |  FROM documents)
           |SELECT doc_id AS media_id, w AS width, h AS height,
           |       CAST(h * list_sum(list_transform(generate_series(0, w - 1),
           |              x -> (x * 255) // (w - 1))) AS BIGINT) AS r_sum,
           |       CAST(CAST(h AS BIGINT) * w * g AS BIGINT) AS g_sum,
           |       CAST(CAST(h AS BIGINT) * w * b AS BIGINT) AS b_sum
           |FROM dims""".stripMargin))

  /** REAL audio decode — RIFF/WAVE PCM16 round trip
    * (Multimodal.renderWavs/decodeWavs, the m10 principle applied to
    * audio): canonical WAV bytes are rendered per document with the
    * deterministic integer sample ramp s(t) = ((base + t·step) mod
    * 201) − 100, then DECODED by walking the actual RIFF chunk list
    * (magic, fmt PCM16-mono validation, word-aligned chunk skip) and
    * folding exact amplitude stats. The oracle regenerates every
    * sample from the same doc_id-derived params in SQL — one mis-read
    * header field, sample byte, or sign extension breaks the hash.
    * Corrupt payloads are ok=false AUDIT rows, never task failures
    * (spec: garbage, truncation, bad format). Codec-bound LINEAR at
    * scale: per-row constant work at the mapPartitions seam, no
    * shuffle anywhere. */
  val m11WavDecode = NamedQuery(
    "m11_wav_decode",
    (s, dir) => {
      import s.implicits._
      val srcs = Tables.documents(s, dir).select(
          col("doc_id").as("media_id"),
          (lit(160L) + pmod(col("doc_id"), lit(6L)) * 40L).cast("int").as("n_samples"),
          pmod(col("doc_id"), lit(97L)).cast("int").as("base"),
          (lit(1L) + pmod(col("doc_id"), lit(13L))).cast("int").as("step"))
        .as[Multimodal.WavSource]
      Multimodal.decodeWavs(s, Multimodal.renderWavs(s, srcs))
        .toDF()
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          col("amp_sum"), col("amp_min"), col("amp_max"))
    },
    Some("""WITH p AS (
           |  SELECT doc_id, 160 + (doc_id % 6) * 40 AS n,
           |         doc_id % 97 AS base, 1 + doc_id % 13 AS step
           |  FROM documents),
           |v AS (SELECT doc_id, n,
           |             list_transform(generate_series(0, CAST(n AS INT) - 1),
           |               t -> (base + t * step) % 201 - 100) AS samples
           |      FROM p)
           |SELECT doc_id AS media_id, CAST(16000 AS INT) AS sample_rate,
           |       CAST(n AS BIGINT) AS n_samples,
           |       CAST(list_sum(samples) AS BIGINT) AS amp_sum,
           |       CAST(list_min(samples) AS INT) AS amp_min,
           |       CAST(list_max(samples) AS INT) AS amp_max
           |FROM v""".stripMargin))

  /** Curation-grade cluster resolution: same clusters as d09, but the
    * keep decision surrenders each cluster's LONGEST copy (token count,
    * ties → min id) instead of its min-id copy — the choice an actual
    * corpus pipeline wants when near-dup copies differ in completeness
    * (truncated mirrors, boilerplate-wrapped rehosts). Composition of
    * resolveMinhashDups + keepBestPerCluster: one extra window shuffle
    * on the cluster key over d09's plan. Oracle: d09's
    * signature-equality classes, argmax by (n_tokens desc, doc_id).
    * Cap assumption (inherited from d09, NOT encodable as a k-class
    * oracle): a signature class larger than maxBucketSize whose members
    * are not byte-identical would have all its LSH pairs capped away on
    * the Spark side while the oracle keeps one class — valid while no
    * (band, bucket) exceeds the cap (audit: Dedup.minhashBucketOverflow). */
  val d36KeepBest = NamedQuery(
    "d36_keep_best",
    (s, dir) => {
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
      val labeled = Dedup.resolveMinhashDups(docs, "doc_id", "text",
          minEstJaccard = 1.0)
        .join(docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")), Seq("doc_id"))
      Dedup.keepBestPerCluster(labeled, "doc_id", "cluster_id", "n_tokens")
        .select(col("doc_id"), col("cluster_id"), col("n_tokens"), col("is_kept"))
    },
    Some(s"""WITH $minhashSigCte,
            |keyed AS (
            |  SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
            |         CASE WHEN s.doc_id IS NOT NULL THEN 'L:' || array_to_string(s.sig, ',')
            |              ELSE 'S:' || t.text END AS k
            |  FROM t LEFT JOIN sig s USING (doc_id))
            |SELECT doc_id, MIN(doc_id) OVER (PARTITION BY k) AS cluster_id, n_tokens,
            |       row_number() OVER (PARTITION BY k ORDER BY n_tokens DESC, doc_id) = 1 AS is_kept
            |FROM keyed""".stripMargin))

  /** Per-dimension embedding statistics — the hygiene audit an
    * embedding pipeline runs before ANN indexing (a dead dimension,
    * a scale-outlier dimension, or a shifted mean all degrade every
    * downstream cosine). One posexplode + one (dim)-keyed hash-agg:
    * 64 output rows regardless of corpus size. Values quantized to
    * integer millis (the d06/SRP precedent) so count/sum/sumsq/min/max
    * are exact integers; mean and variance are then two or three IEEE
    * ops on those exact longs — deterministic on both engines. */
  val d37EmbeddingStats = NamedQuery(
    "d37_embedding_stats",
    (s, dir) => {
      // cast to double BEFORE the ×1000 (the Similarity.quantize rule):
      // multiplying the raw FLOAT first rounds in float precision,
      // which can land the .5 boundary differently from the oracle's
      // CAST(v AS DOUBLE) * 1000 on adversarial values
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          posexplode(expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(round(x * 1000) AS BIGINT))")))
        .groupBy(col("pos").cast("long").as("dim"))
        .agg(count(lit(1)).as("n"),
          sum(col("col")).as("sum_milli"),
          sum(col("col") * col("col")).as("ssq_milli"),
          min(col("col")).as("min_milli"),
          max(col("col")).as("max_milli"))
        .withColumn("mean_milli", col("sum_milli").cast("double") / col("n"))
        .withColumn("var_milli",
          col("ssq_milli").cast("double") / col("n")
            - col("mean_milli") * col("mean_milli"))
    },
    Some("""WITH e AS (
           |  SELECT vec_id,
           |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q,
           |         generate_subscripts(embedding, 1) - 1 AS dim
           |  FROM embeddings),
           |a AS (SELECT CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
           |             CAST(SUM(q) AS BIGINT) AS sum_milli,
           |             CAST(SUM(q * q) AS BIGINT) AS ssq_milli,
           |             CAST(MIN(q) AS BIGINT) AS min_milli,
           |             CAST(MAX(q) AS BIGINT) AS max_milli
           |      FROM e GROUP BY 1)
           |SELECT dim, n, sum_milli, ssq_milli, min_milli, max_milli,
           |       CAST(sum_milli AS DOUBLE) / n AS mean_milli,
           |       CAST(ssq_milli AS DOUBLE) / n
           |         - (CAST(sum_milli AS DOUBLE) / n) * (CAST(sum_milli AS DOUBLE) / n) AS var_milli
           |FROM a""".stripMargin))

  /** Dup-cluster size distribution — the dataset-card statistic behind
    * every dedup report ("how duplicated is this corpus?"): cluster
    * size → number of clusters and docs at that size. Two bounded
    * hash-aggs over d09's resolution (cluster sizes, then the size
    * histogram — output rows = distinct sizes, ≤ tens). A heavy tail
    * here is the first sign the corpus needs the cap audits tightened.
    * Same cap assumption as d09/d36: the k-class oracle cannot model
    * the band-bucket cap — valid while no (band, bucket) exceeds
    * maxBucketSize (audit: Dedup.minhashBucketOverflow). */
  val d38ClusterSizes = NamedQuery(
    "d38_cluster_sizes",
    (s, dir) => {
      Dedup.resolveMinhashDups(
          Tables.documents(s, dir).where(col("text").isNotNull),
          "doc_id", "text", minEstJaccard = 1.0)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("sz")).as("n_docs"))
    },
    Some(s"""WITH $minhashSigCte,
            |keyed AS (
            |  SELECT t.doc_id,
            |         CASE WHEN s.doc_id IS NOT NULL THEN 'L:' || array_to_string(s.sig, ',')
            |              ELSE 'S:' || t.text END AS k
            |  FROM t LEFT JOIN sig s USING (doc_id)),
            |c AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS sz FROM keyed GROUP BY 1)
            |SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
            |       CAST(SUM(sz) AS BIGINT) AS n_docs
            |FROM c GROUP BY 1""".stripMargin))

  /** Incremental dedup of a crawl increment against the existing corpus
    * (Dedup.incrementalDedup): the increment is a derived variant of
    * documents — every 7th doc re-crawled verbatim (must report dup_of
    * its original) and every 11th doc with appended novel content
    * (new unless its 16-lane signature happens to collide — both
    * engines agree either way). Clone ids mirror to disjoint negative
    * ranges (odd = re-crawl, even = novel) so collision with real ids
    * is impossible at any SF — the d34 rule. */
  val d39IncrementalDedup = NamedQuery(
    "d39_incremental_dedup",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val recrawl = docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") * -2 - 1).as("doc_id"), col("text"))
      val novel = docs.where(col("doc_id") % 11 === 0 && col("text").isNotNull)
        .select((col("doc_id") * -2 - 2).as("doc_id"),
          concat(col("text"), lit(" entirely novel content marker")).as("text"))
      Dedup.incrementalDedup(docs, recrawl.unionByName(novel), "doc_id", "text")
    },
    Some(s"""WITH $minhashSigCte,
            |v2 AS (
            |  SELECT -2 * doc_id - 1 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
            |  UNION ALL
            |  SELECT -2 * doc_id - 2 AS doc_id, text || ' entirely novel content marker' AS text
            |  FROM documents WHERE doc_id % 11 = 0 AND text IS NOT NULL),
            |t2 AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM v2
            |       WHERE text IS NOT NULL),
            |g2 AS (SELECT doc_id, unnest(list_distinct(list_transform(
            |         generate_series(1, len(toks) - 2),
            |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
            |       FROM t2 WHERE len(toks) >= 3),
            |h2 AS (SELECT doc_id, CAST(md5_number_upper(gram) AS HUGEINT) AS h1,
            |              CAST(md5_number_lower(gram) AS HUGEINT) AS h2 FROM g2),
            |l2 AS (SELECT doc_id, i,
            |              MIN(CAST(CASE WHEN m >= 9223372036854775808 THEN m - 18446744073709551616 ELSE m END AS BIGINT)) AS lane
            |       FROM (SELECT doc_id, i, (h1 + i * h2) % 18446744073709551616 AS m
            |             FROM h2 CROSS JOIN generate_series(0, 15) s(i))
            |       GROUP BY doc_id, i),
            |sig2 AS (SELECT doc_id, list(lane ORDER BY i) AS sig FROM l2 GROUP BY doc_id),
            |tm AS (SELECT v.doc_id AS nid, MIN(d.doc_id) AS tdup
            |       FROM v2 v JOIN documents d ON d.text = v.text GROUP BY 1),
            |sm AS (SELECT s2.doc_id AS nid, MIN(s1.doc_id) AS sdup
            |       FROM sig2 s2 JOIN sig s1
            |         ON array_to_string(s2.sig, ',') = array_to_string(s1.sig, ',')
            |       GROUP BY 1)
            |SELECT v.doc_id, least(tm.tdup, sm.sdup) AS dup_of,
            |       (tm.tdup IS NULL AND sm.sdup IS NULL) AS is_new
            |FROM v2 v LEFT JOIN tm ON v.doc_id = tm.nid
            |          LEFT JOIN sm ON v.doc_id = sm.nid""".stripMargin))

  /** Exact embedding covariance matrix (Similarity.covarianceMatrix):
    * d37's per-dimension stats are this matrix's diagonal; the
    * off-diagonals are what PCA/whitening before ANN indexing needs.
    * One pass, NO self-join: each row emits its d² quantized products
    * via a nested-transform outer product and the (i, j)-keyed
    * hash-agg collapses them map-side — the exchange carries ≤ d²
    * cells per partition at any corpus size. The harness query takes
    * the first 16 dimensions (256 cells) so the ORACLE's pair
    * formulation — a vec_id self-join, the natural SQL shape — stays
    * bounded on any gate corpus; the operator itself takes the full
    * width. Integer-millis exact sums; cov formed as IEEE ops over
    * double-cast exact longs (the q58 overflow pattern). */
  val d43EmbeddingCovariance = NamedQuery(
    "d43_embedding_covariance",
    (s, dir) => {
      graft.ops.Similarity.covarianceMatrix(
        Tables.embeddings(s, dir), "embedding", dims = 16)
    },
    Some("""WITH e AS (
           |  SELECT vec_id,
           |         CAST(round(CAST(unnest(embedding[1:16]) AS DOUBLE) * 1000) AS BIGINT) AS q,
           |         generate_subscripts(embedding[1:16], 1) - 1 AS dim
           |  FROM embeddings),
           |p AS (SELECT a.dim AS i, b.dim AS j, CAST(COUNT(*) AS BIGINT) AS n,
           |             CAST(SUM(a.q * b.q) AS BIGINT) AS sprod,
           |             CAST(SUM(a.q) AS BIGINT) AS si, CAST(SUM(b.q) AS BIGINT) AS sj
           |      FROM e a JOIN e b USING (vec_id)
           |      WHERE a.q IS NOT NULL AND b.q IS NOT NULL
           |      GROUP BY 1, 2)
           |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, n, sprod,
           |       (CAST(n AS DOUBLE) * CAST(sprod AS DOUBLE)
           |        - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE))
           |         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cov
           |FROM p""".stripMargin))

  /** d08's corpus-adaptive twin (Similarity.embeddingNearDupsAutoSized)
    * — the 100 TB form: code width p = ceil(log2(n / 8)) is derived
    * from the corpus cardinality, holding expected bucket size constant
    * so candidate volume stays linear in n (a FIXED width crosses a
    * quadratic regime and then the bucket cap zeroes recall — the 606 s
    * vs 9 s A/B on the 100× corpus, BASELINE.md). The ORACLE derives p
    * the same way — integer ceil-divide + bit length, never floating
    * log (Similarity.autoPlanes) — so the adaptive dial itself is
    * hash-exact at EVERY gate scale: p resolves to 6 at sf0.01, 8 at
    * sf0.1, 12 on the 10× corpus, with both engines agreeing on the
    * width, the buckets, and the surviving pairs. */
  val d44NeardupAutoSized = NamedQuery(
    "d44_neardup_autosized",
    (s, dir) => {
      Similarity.embeddingNearDupsAutoSized(Tables.embeddings(s, dir),
        "vec_id", "embedding", minCosine = 0.3)
    },
    Some("""WITH q AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
           |                                         x -> round(x * 1000)) AS e
           |           FROM embeddings),
           |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM q),
           |params AS (SELECT GREATEST(6, LEAST(30, length(bin(GREATEST(1,
           |             ((COUNT(*) + 7) // 8) - 1))))) AS p
           |           FROM embeddings),
           |pl AS (SELECT unnest(range(0, 4 * (SELECT p FROM params))) AS pp),
           |dotp AS (SELECT q.vec_id, pl.pp,
           |                list_sum(list_transform(generate_series(1, len(e)),
           |                  d -> e[d] * (CASE WHEN md5_number_upper(
           |                        'srp:' || pl.pp || ':' || (d - 1)) & 1 = 1
           |                      THEN 1.0 ELSE -1.0 END))) AS dp
           |         FROM q CROSS JOIN pl),
           |codes AS (SELECT vec_id, pp // (SELECT p FROM params) AS t,
           |                 CAST(SUM(CASE WHEN dp > 0
           |                     THEN (CAST(1 AS BIGINT) << (pp % (SELECT p FROM params)))
           |                     ELSE 0 END) AS BIGINT) AS code
           |          FROM dotp GROUP BY 1, 2),
           |kept AS (SELECT t, code FROM codes GROUP BY 1, 2 HAVING COUNT(*) <= 10000),
           |cand AS (
           |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM codes a JOIN codes b ON a.t = b.t AND a.vec_id < b.vec_id
           |    AND bit_count(xor(a.code, b.code)) <= 1
           |  JOIN kept ka ON a.t = ka.t AND a.code = ka.code
           |  JOIN kept kb ON b.t = kb.t AND b.code = kb.code)
           |SELECT id_a, id_b,
           |       list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm) AS cos_sim
           |FROM cand JOIN n na ON na.vec_id = id_a
           |          JOIN n nb ON nb.vec_id = id_b
           |WHERE list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm) >= 0.3""".stripMargin))

  /** FULL-auto embedding near-dup: d44's adaptive code WIDTH
    * (autoPlanes — buckets grow with the corpus, the answer to d08's
    * fixed-width 100× wall) composed with round 13's adaptive bucket
    * CAP (autoBucketCap, the d80 dial) — zero hand-guessed constants
    * left anywhere in this family's candidate formation. Both dials
    * re-derived in the oracle from the same COUNT(*) (bit-length for
    * the width, ceil-sqrt for the cap). */
  val d81NeardupFullAuto = NamedQuery(
    "d81_neardup_fullauto",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val n = emb.count()
      Similarity.embeddingNearDupsAutoSized(emb, "vec_id", "embedding",
        minCosine = 0.3, maxBucketSize = Dials.autoBucketCap(n),
        nRows = Some(n))
    },
    Some("""WITH q AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
           |                                         x -> round(x * 1000)) AS e
           |           FROM embeddings),
           |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM q),
           |params AS (SELECT GREATEST(6, LEAST(30, length(bin(GREATEST(1,
           |             ((COUNT(*) + 7) // 8) - 1))))) AS p,
           |           GREATEST(256, LEAST(1000000,
           |             16 * CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))) AS cap
           |           FROM embeddings),
           |pl AS (SELECT unnest(range(0, 4 * (SELECT p FROM params))) AS pp),
           |dotp AS (SELECT q.vec_id, pl.pp,
           |                list_sum(list_transform(generate_series(1, len(e)),
           |                  d -> e[d] * (CASE WHEN md5_number_upper(
           |                        'srp:' || pl.pp || ':' || (d - 1)) & 1 = 1
           |                      THEN 1.0 ELSE -1.0 END))) AS dp
           |         FROM q CROSS JOIN pl),
           |codes AS (SELECT vec_id, pp // (SELECT p FROM params) AS t,
           |                 CAST(SUM(CASE WHEN dp > 0
           |                     THEN (CAST(1 AS BIGINT) << (pp % (SELECT p FROM params)))
           |                     ELSE 0 END) AS BIGINT) AS code
           |          FROM dotp GROUP BY 1, 2),
           |kept AS (SELECT t, code FROM codes GROUP BY 1, 2
           |         HAVING COUNT(*) <= (SELECT cap FROM params)),
           |cand AS (
           |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM codes a JOIN codes b ON a.t = b.t AND a.vec_id < b.vec_id
           |    AND bit_count(xor(a.code, b.code)) <= 1
           |  JOIN kept ka ON a.t = ka.t AND a.code = ka.code
           |  JOIN kept kb ON b.t = kb.t AND b.code = kb.code)
           |SELECT id_a, id_b,
           |       list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm) AS cos_sim
           |FROM cand JOIN n na ON na.vec_id = id_a
           |          JOIN n nb ON nb.vec_id = id_b
           |WHERE list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm) >= 0.3""".stripMargin))

  /** Substring-level duplication coverage (Dedup.spanDupCoverage): per
    * doc, the fraction of tokens inside an 8-token span repeated
    * verbatim across ≥ 2 docs — the exact-substring complement to
    * document-level minhash (d03/d09) and chunk dedup (d24, which
    * hashes FIXED windows; spans here slide, so a shared passage is
    * caught at any alignment). No pair formation anywhere (a span in k
    * docs costs k rows, not k²), so unlike the LSH family this needs
    * no caps and the oracle carries none. Counts are exact longs;
    * dup_coverage is one IEEE division of two exact longs (the q97
    * rule). */
  val d45SpanDupCoverage = NamedQuery(
    "d45_span_dup_coverage",
    (s, dir) => Dedup.spanDupCoverage(Tables.documents(s, dir), "doc_id", "text"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           |           FROM documents WHERE text IS NOT NULL),
           |sp AS (SELECT doc_id, unnest(generate_series(0, len(toks) - 8)) AS start, toks
           |       FROM t WHERE len(toks) >= 8),
           |sh AS (SELECT doc_id, start,
           |              md5(array_to_string(toks[start + 1 : start + 8], ' ')) AS h
           |       FROM sp),
           |dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
           |ds AS (SELECT sh.doc_id, sh.start FROM sh JOIN dup USING (h)),
           |pds AS (SELECT doc_id, COUNT(*) AS n_dup_spans FROM ds GROUP BY 1),
           |cov AS (SELECT DISTINCT doc_id, start + o AS pos
           |        FROM ds CROSS JOIN generate_series(0, 7) g(o)),
           |covc AS (SELECT doc_id, COUNT(*) AS n_covered FROM cov GROUP BY 1),
           |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t)
           |SELECT base.doc_id, base.n_tokens,
           |       CAST(COALESCE(pds.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           |       CAST(COALESCE(covc.n_covered, 0) AS BIGINT) AS n_covered,
           |       CAST(COALESCE(covc.n_covered, 0) AS DOUBLE)
           |         / CAST(base.n_tokens AS DOUBLE) AS dup_coverage
           |FROM base LEFT JOIN pds USING (doc_id) LEFT JOIN covc USING (doc_id)""".stripMargin))

  /** Hashed-linear quality classifier inference (the CCNet/fastText
    * filter shape) — TextAnalysis.hashedLinearScore. A pure per-row
    * projection: no shuffle, no join; the scan-bandwidth filter a
    * 100 TB curation pass runs FIRST. md5-derived stand-in weights
    * make the full inference — hashing trick, bucket collisions, mean
    * pooling, integer threshold — reproducible in DuckDB hash-exact. */
  val d46QualityClassifier = NamedQuery(
    "d46_quality_classifier",
    (s, dir) => TextAnalysis.hashedLinearScore(Tables.documents(s, dir), "doc_id", "text"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           |           FROM documents WHERE text IS NOT NULL),
           |f AS (SELECT doc_id, unnest(list_concat(toks,
           |        list_transform(generate_series(1, len(toks) - 1),
           |          i -> toks[i] || '_' || toks[i + 1]))) AS feat
           |      FROM t),
           |w AS (SELECT doc_id,
           |        CAST(CAST(concat('0x', substring(md5('qw:' ||
           |          CAST(CAST(concat('0x', substring(md5(feat), 1, 4)) AS INTEGER) AS VARCHAR)
           |          ), 1, 4)) AS INTEGER) % 2001 - 1000 AS BIGINT) AS wt
           |      FROM f),
           |a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_features,
           |             CAST(SUM(wt) AS BIGINT) AS w_sum
           |      FROM w GROUP BY 1)
           |SELECT a.doc_id, a.n_features, a.w_sum,
           |       CAST(a.w_sum AS DOUBLE) / (CAST(a.n_features AS DOUBLE) * 1000.0) AS logit,
           |       a.w_sum >= 0 AS keep
           |FROM a""".stripMargin))

  /** Span-level dedup APPLIED (Dedup.spanDedupRewrite) — d45 measures
    * duplication coverage; this op performs the C4/Lee-et-al. rewrite:
    * every position covered by a cross-doc-duplicated 8-token span is
    * REMOVED except in the span's canonical owner (min doc id), and the
    * document text is reconstructed from the surviving tokens. Output
    * is fixed-width per doc (counts + md5 of the cleaned text), so the
    * result never re-ships the corpus. Inherits d45's no-pair-formation
    * scale property — no caps, and the oracle carries none; the oracle
    * rebuilds the cleaned text with an ORDER BY pos string_agg. */
  val d47DedupRewrite = NamedQuery(
    "d47_dedup_rewrite",
    (s, dir) => Dedup.spanDedupRewrite(Tables.documents(s, dir), "doc_id", "text"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           |           FROM documents WHERE text IS NOT NULL),
           |sp AS (SELECT doc_id, unnest(generate_series(0, len(toks) - 8)) AS start, toks
           |       FROM t WHERE len(toks) >= 8),
           |sh AS (SELECT doc_id, start,
           |              md5(array_to_string(toks[start + 1 : start + 8], ' ')) AS h
           |       FROM sp),
           |own AS (SELECT h, MIN(doc_id) AS owner FROM sh
           |        GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
           |drp AS (SELECT DISTINCT sh.doc_id, sh.start + g.o AS pos
           |        FROM sh JOIN own USING (h)
           |        CROSS JOIN generate_series(0, 7) g(o)
           |        WHERE sh.doc_id > own.owner),
           |tp AS (SELECT doc_id, p1 - 1 AS pos, toks[p1] AS tok
           |       FROM (SELECT doc_id, unnest(generate_series(1, len(toks))) AS p1, toks
           |             FROM t)),
           |kp AS (SELECT tp.doc_id, tp.pos, tp.tok
           |       FROM tp LEFT JOIN drp d ON d.doc_id = tp.doc_id AND d.pos = tp.pos
           |       WHERE d.doc_id IS NULL),
           |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
           |               md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_md5
           |        FROM kp GROUP BY doc_id)
           |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
           |       CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
           |       COALESCE(agg.clean_md5, md5('')) AS clean_md5
           |FROM t LEFT JOIN agg USING (doc_id)""".stripMargin))

  /** Top-principal-component projection (Similarity.pcaPowerProjection)
    * — PCA by ALL-INTEGER power iteration over the d43 covariance
    * cells, then a narrow per-vector projection. The matrix recurrence
    * (rescale by ceil(max/1000) floor-division, 4 iterations) has no
    * normalization sqrt, so the oracle replays it exactly: covariance
    * cells → integer rescale → 4 unrolled matrix-vector CTE rounds →
    * projection, every value a 64-bit integer in both engines. */
  val d50PcaPower = NamedQuery(
    "d50_pca_power",
    (s, dir) => Similarity.pcaPowerProjection(Tables.embeddings(s, dir),
      "vec_id", "embedding", dims = 16, iters = 4),
    Some(pcaPowerOracleSql(16, 4)))

  /** DuckDB replay of the integer power iteration. `//` on DuckDB
    * truncates toward zero (the q88 finding), so floor division is
    * spelled out: nonneg operands use `//` directly, negative dividends
    * go through -((-x + d - 1) // d). */
  private def pcaPowerOracleSql(dims: Int, iters: Int): String = {
    def floorDiv(x: String, d: String) =
      s"CASE WHEN $x >= 0 THEN $x // $d ELSE -((-($x) + $d - 1) // $d) END"
    val sb = new StringBuilder
    sb ++= s"""WITH quant AS (
              |  SELECT vec_id,
              |         list_transform(CAST(embedding[1:$dims] AS DOUBLE[]),
              |                        x -> CAST(round(x * 1000) AS BIGINT)) AS q
              |  FROM embeddings),
              |cells AS (
              |  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
              |         CAST(SUM(q[i] * q[j]) AS BIGINT) AS sp,
              |         CAST(SUM(q[i]) AS BIGINT) AS si,
              |         CAST(SUM(q[j]) AS BIGINT) AS sj
              |  FROM quant
              |  CROSS JOIN generate_series(1, $dims) g1(i)
              |  CROSS JOIN generate_series(1, $dims) g2(j)
              |  WHERE q[i] IS NOT NULL AND q[j] IS NOT NULL
              |  GROUP BY i, j),
              |cp AS (SELECT i, j, n * sp - si * sj AS c FROM cells),
              |s0 AS (SELECT GREATEST((MAX(ABS(c)) + 999) // 1000, 1) AS d FROM cp),
              |cs AS (SELECT i, j, ${floorDiv("c", "(SELECT d FROM s0)")} AS cs FROM cp),
              |v0 AS (SELECT unnest(generate_series(1, $dims)) AS j,
              |              CAST(1000 AS BIGINT) AS v)""".stripMargin
    for (r <- 1 to iters) {
      sb ++= s""",
               |u$r AS (SELECT s.i AS j, CAST(SUM(s.cs * v.v) AS BIGINT) AS u
               |        FROM cs s JOIN v${r - 1} v ON v.j = s.j GROUP BY s.i),
               |s$r AS (SELECT GREATEST((MAX(ABS(u)) + 999) // 1000, 1) AS d FROM u$r),
               |v$r AS (SELECT j, ${floorDiv("u", s"(SELECT d FROM s$r)")} AS v FROM u$r)""".stripMargin
    }
    sb ++= s"""
              |SELECT quant.vec_id,
              |       CAST(SUM(q[v.j] * v.v) AS BIGINT) AS pc1_proj
              |FROM quant CROSS JOIN v$iters v GROUP BY quant.vec_id""".stripMargin
    sb.toString
  }

  /** Within-doc repeated-span removal (Dedup.selfDupRewrite) — the
    * Gopher repetition signal (t07) applied as a TRANSFORM: later
    * occurrences of any 8-token span repeated inside the same doc are
    * removed, the first stays. No corpus-wide pass at all — every
    * stage keys on the doc — so this is the scan-bandwidth rewrite
    * that composes with d47's cross-doc pass. */
  val d51SelfDupRewrite = NamedQuery(
    "d51_selfdup_rewrite",
    (s, dir) => Dedup.selfDupRewrite(Tables.documents(s, dir), "doc_id", "text"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           |           FROM documents WHERE text IS NOT NULL),
           |sp AS (SELECT doc_id, unnest(generate_series(0, len(toks) - 8)) AS start, toks
           |       FROM t WHERE len(toks) >= 8),
           |sh AS (SELECT doc_id, start,
           |              md5(array_to_string(toks[start + 1 : start + 8], ' ')) AS h
           |       FROM sp),
           |fs AS (SELECT doc_id, h, MIN(start) AS fst FROM sh
           |       GROUP BY doc_id, h HAVING COUNT(*) > 1),
           |drp AS (SELECT DISTINCT sh.doc_id, sh.start + g.o AS pos
           |        FROM sh JOIN fs ON fs.doc_id = sh.doc_id AND fs.h = sh.h
           |        CROSS JOIN generate_series(0, 7) g(o)
           |        WHERE sh.start > fs.fst),
           |tp AS (SELECT doc_id, p1 - 1 AS pos, toks[p1] AS tok
           |       FROM (SELECT doc_id, unnest(generate_series(1, len(toks))) AS p1, toks
           |             FROM t)),
           |kp AS (SELECT tp.doc_id, tp.pos, tp.tok
           |       FROM tp LEFT JOIN drp d ON d.doc_id = tp.doc_id AND d.pos = tp.pos
           |       WHERE d.doc_id IS NULL),
           |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
           |               md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_md5
           |        FROM kp GROUP BY doc_id)
           |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
           |       CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
           |       COALESCE(agg.clean_md5, md5('')) AS clean_md5
           |FROM t LEFT JOIN agg USING (doc_id)""".stripMargin))

  /** SemDeDup-style semantic dedup (Similarity.semDedupAutoSized):
    * d10's portable integer k-means cells + within-cell non-transitive
    * min-id drop at cosine ≥ 0.8, with the cell COUNT derived from the
    * corpus cardinality — nLists = clamp(ceil(√n), 8, 1024), the
    * assignment/pair cost-balanced sizing (Similarity.autoLists) — so
    * the dedup decision stays ENGAGED at every scale (at the round-10
    * fixed dial of 8, the 100× corpus put every cell over the 10 000
    * cap and all rows kept: audited, but a no-op — the d44 lesson).
    * The oracle reuses the SAME unrolled k-means CTEs as d10
    * (ivfCellCtes — two queries, one clustering replay) with the clamp
    * re-derived in integer SQL (params CTE), the identical pair set,
    * the min-smaller-neighbour decision, the 10 000 cell cap, AND the
    * zero-norm exclusion (a vector quantizing to all-zero never forms
    * pairs — 0/0 cosine is engine-defined, so both engines exclude it
    * up front). Caps and dials live in BOTH engines or the gate can't
    * see them (the d24/d44 rule). */
  val d48SemDedup = NamedQuery(
    "d48_semdedup",
    (s, dir) => Similarity.semDedupAutoSized(Tables.embeddings(s, dir),
      "vec_id", "embedding", minCosine = 0.8),
    Some {
      val cosAb = "list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e))" +
        " * sqrt(list_dot_product(b.e, b.e)))"
      val params = """
        |params AS (SELECT GREATEST(8, LEAST(1024,
        |             CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))) AS nl
        |           FROM embeddings),""".stripMargin
      s"""${ivfCellCtes(3, "(SELECT nl FROM params)", params)},
         |cells AS (SELECT list, COUNT(*) AS cn FROM af GROUP BY list),
         |ok AS (SELECT list FROM cells WHERE cn <= 10000),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM af a JOIN af b ON a.list = b.list AND a.vec_id < b.vec_id
         |  JOIN ok ON ok.list = a.list
         |  WHERE list_dot_product(a.e, a.e) > 0 AND list_dot_product(b.e, b.e) > 0
         |    AND $cosAb >= 0.8),
         |dup AS (SELECT id_b AS vec_id, MIN(id_a) AS dup_of FROM pairs GROUP BY id_b)
         |SELECT af.vec_id, CAST(af.list AS BIGINT) AS cell,
         |       CAST(dup.dup_of AS BIGINT) AS dup_of,
         |       dup.dup_of IS NULL AS keep,
         |       af.list NOT IN (SELECT list FROM ok) AS cell_capped
         |FROM af LEFT JOIN dup USING (vec_id)""".stripMargin
    })

  /** Tokenizer fertility card (TextAnalysis.bpeFertility): BPE tokens
    * per whitespace word, per source, under the 6-merge table d29
    * learns from this corpus — the open-vocabulary complement to d40's
    * closed-vocab OOV rate. The oracle relearns the merges (shared
    * bpeTrainCtes prefix), re-applies them over distinct terms, and
    * re-aggregates — the tokenizer-compatibility loop round-tripped
    * through a second engine. */
  val d49BpeFertility = NamedQuery(
    "d49_bpe_fertility",
    (s, dir) => {
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
      TextAnalysis.bpeFertility(docs, "text", "source",
          TextAnalysis.bpeTrain(docs, "text", merges = 6))
        .withColumnRenamed("stratum", "source")
    },
    Some(bpeFertilityOracleSql(6)))

  private def bpeFertilityOracleSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= bpeTrainCtes(k)
    sb ++= """,
             |terms AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS term
             |          FROM documents WHERE text IS NOT NULL),
             |f0 AS MATERIALIZED (
             |  SELECT term,
             |         ' ' || array_to_string(list_transform(generate_series(1, length(term)),
             |                                               i -> term[i:i]), '  ') || ' ' AS syms
             |  FROM terms WHERE length(term) >= 1)""".stripMargin
    for (r <- 1 to k) {
      sb ++= s""",
               |f$r AS MATERIALIZED (
               |  SELECT term, replace(syms,
               |                 ' ' || (SELECT l FROM p$r) || '  ' || (SELECT r FROM p$r) || ' ',
               |                 ' ' || (SELECT l FROM p$r) || (SELECT r FROM p$r) || ' ') AS syms
               |  FROM f${r - 1})""".stripMargin
    }
    sb ++= s"""
              |,pieces AS (SELECT term,
              |              CAST(len(string_split(trim(syms), '  ')) AS BIGINT) AS np
              |            FROM f$k),
              |sc AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
              |       FROM (SELECT source, unnest(string_split(text, ' ')) AS term
              |             FROM documents WHERE text IS NOT NULL)
              |       WHERE length(term) >= 1 GROUP BY 1, 2)
              |SELECT source, CAST(SUM(c) AS BIGINT) AS n_words,
              |       CAST(SUM(c * np) AS BIGINT) AS n_bpe_tokens,
              |       CAST(SUM(c * np) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS fertility
              |FROM sc JOIN pieces USING (term) GROUP BY source""".stripMargin
    sb.toString
  }

  /** MinHash-LSH candidates with the banding DERIVED from the target
    * Jaccard (Dedup.autoBands — the d44/d48 auto-dial lesson applied to
    * the last hand-guessed LSH dial). At numHashes = 16, target 0.5 the
    * integer rule selects rowsPerBand = 2 / bands = 8 (knee
    * (1/8)^(1/2) ≈ 0.354 ≤ 0.5; the next-sharper banding's knee
    * (1/4)^(1/4) ≈ 0.707 overshoots) — the oracle inlines that derived
    * banding (the dial depends only on constants; DedupSpec
    * property-tests the derivation) and replays the bucket join with
    * the est-Jaccard floor AT the target. */
  val d57AutoBandPairs = NamedQuery(
    "d57_autoband_pairs",
    (s, dir) => {
      Dedup.minhashCandidatesAtThreshold(Tables.documents(s, dir),
        "doc_id", "text", targetJaccard = 0.5, shingleN = 3, numHashes = 16)
    },
    Some(s"""WITH $minhashSigCte,
            |bands AS (
            |  SELECT doc_id, b AS band,
            |         md5(array_to_string(sig[b*2+1 : b*2+2], ',')) AS bucket, sig
            |  FROM sig CROSS JOIN generate_series(0, 7) bb(b)),
            |bc AS (SELECT band, bucket FROM bands GROUP BY 1, 2 HAVING COUNT(*) <= 10000)
            |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            |       CAST(len(list_filter(generate_series(1, 16), i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 16 AS est_jaccard
            |FROM bands a JOIN bands b
            |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            |JOIN bc ON a.band = bc.band AND a.bucket = bc.bucket
            |WHERE CAST(len(list_filter(generate_series(1, 16), i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 16 >= 0.5""".stripMargin))

  /** Duplicate-aware SOFT dedup (keep everything, weight = 1/|cluster|)
    * — the training-loss alternative to d09's hard keep decision, on
    * the same threshold-1.0 cluster structure, so the oracle is d09's
    * signature-identity partition plus a window count and ONE IEEE
    * division of exact longs. */
  val d58SoftDedup = NamedQuery(
    "d58_soft_dedup",
    (s, dir) => {
      Dedup.softDedupWeights(Tables.documents(s, dir).where(col("text").isNotNull),
        "doc_id", "text", minEstJaccard = 1.0)
    },
    Some(s"""WITH $minhashSigCte,
            |keyed AS (
            |  SELECT t.doc_id,
            |         CASE WHEN s.doc_id IS NOT NULL THEN 'L:' || array_to_string(s.sig, ',')
            |              ELSE 'S:' || t.text END AS k
            |  FROM t LEFT JOIN sig s USING (doc_id)),
            |cl AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY k) AS cluster_id FROM keyed)
            |SELECT doc_id, cluster_id,
            |       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members,
            |       CAST(1 AS DOUBLE) / CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS DOUBLE) AS weight
            |FROM cl""".stripMargin))

  /** Scalar-quantization (int8) ANN against vec 0: corpus-calibrated
    * per-dim scales, integer-code dot scan for the top-50, exact
    * cosine rescore for the top-10 (Similarity.sqTopK — the
    * no-trained-model point of the IVF/PQ/SQ compression triangle).
    * The oracle replays the calibration (per-dim max |milli value|,
    * floor 1), the sign-split floor quantization, and both rank
    * stages; code dots are exact integers and the final cosine is the
    * d06 contract, so the gate is hash-exact. */
  val d59SqAnn = NamedQuery(
    "d59_sq_ann",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.sqTopK(emb, "vec_id", "embedding",
        emb.where(col("vec_id") === 0), "vec_id", candidates = 50, k = 10)
    },
    Some("""WITH quant AS (
           |  SELECT vec_id,
           |         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000)) AS e
           |  FROM embeddings),
           |scd AS (SELECT d, GREATEST(MAX(ABS(x)), 1.0) AS m
           |        FROM (SELECT unnest(e) AS x,
           |                     unnest(generate_series(1, len(e))) AS d
           |              FROM quant)
           |        GROUP BY d),
           |scl AS (SELECT list(m ORDER BY d) AS s FROM scd),
           |codes AS (
           |  SELECT vec_id, e,
           |         list_transform(generate_series(1, len(e)),
           |           i -> CASE WHEN e[i] < 0 THEN -FLOOR((-e[i] * 127) / s[i])
           |                     ELSE FLOOR((e[i] * 127) / s[i]) END) AS c
           |  FROM quant, scl),
           |qr AS (SELECT e AS qe, c AS qc FROM codes WHERE vec_id = 0),
           |cand AS (
           |  SELECT vec_id, e, qe,
           |         CAST(list_dot_product(c, qc) AS BIGINT) AS q_score
           |  FROM codes, qr WHERE vec_id <> 0
           |  ORDER BY q_score DESC, vec_id LIMIT 50)
           |SELECT vec_id, q_score,
           |       list_dot_product(e, qe)
           |         / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))) AS cos_sim
           |FROM cand ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin))

  /** Edit-distance-verified near-dup pairs (Dedup.editVerifiedPairs):
    * the d03 LSH candidate stage verified by EXACT Levenshtein — the
    * character-level verify word-shingle Jaccard (d15) is too coarse
    * for. Keep decision is the pure-integer milli comparison; both
    * engines run the textbook DP, and the cap + audit contract
    * (`verified` = false above maxChars) is encoded in the oracle. */
  val d60EditVerify = NamedQuery(
    "d60_edit_verify",
    (s, dir) => {
      Dedup.editVerifiedPairs(Tables.documents(s, dir), "doc_id", "text",
        minSimMilli = 800, shingleN = 3, numHashes = 16, bands = 4,
        maxBucketSize = 10000, maxChars = 10000)
    },
    Some(s"""WITH $minhashSigCte,
            |bands AS (
            |  SELECT doc_id, b AS band,
            |         md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
            |  FROM sig CROSS JOIN generate_series(0, 3) bb(b)),
            |bc AS (SELECT band, bucket FROM bands GROUP BY 1, 2 HAVING COUNT(*) <= 10000),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            |  FROM bands a JOIN bands b
            |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            |  JOIN bc ON a.band = bc.band AND a.bucket = bc.bucket),
            |tx AS (SELECT doc_id, text, CAST(LENGTH(text) AS BIGINT) AS len
            |       FROM documents WHERE text IS NOT NULL),
            |pr AS (
            |  SELECT doc_a, doc_b,
            |         GREATEST(ta.len, tb.len) AS max_len,
            |         GREATEST(ta.len, tb.len) <= 10000 AS verified,
            |         ta.text AS t_a, tb.text AS t_b
            |  FROM cand JOIN tx ta ON cand.doc_a = ta.doc_id
            |            JOIN tx tb ON cand.doc_b = tb.doc_id),
            |lv AS (
            |  SELECT doc_a, doc_b,
            |         CASE WHEN verified THEN CAST(levenshtein(t_a, t_b) AS BIGINT) END AS lev,
            |         max_len, verified
            |  FROM pr)
            |SELECT doc_a, doc_b, lev, max_len,
            |       CASE WHEN verified
            |            THEN CAST(max_len - lev AS DOUBLE) / max_len END AS edit_sim,
            |       CASE WHEN verified
            |            THEN (max_len - lev) * 1000 >= max_len * 800 END AS is_dup,
            |       verified
            |FROM lv""".stripMargin))

  /** Containment verify over the d15 candidate set: the asymmetric
    * measure Jaccard misses — a short doc quoted inside a long one
    * scores near-0 Jaccard but containment ≈ 1 (Dedup.containmentVerify;
    * keep rule n_shared·1000 ≥ 900·min(n_a,n_b), pure-integer;
    * contained_doc names the smaller side only when the flag fires). */
  val d61Containment = NamedQuery(
    "d61_containment",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, minEstJaccard = 0.0)
      Dedup.containmentVerify(docs, "doc_id", "text", pairs,
        minContainMilli = 900)
    },
    Some(s"""WITH $minhashSigCte,
            |bands AS (
            |  SELECT doc_id, b AS band,
            |         md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket
            |  FROM sig CROSS JOIN generate_series(0, 3) bb(b)),
            |bc AS (SELECT band, bucket FROM bands GROUP BY 1, 2 HAVING COUNT(*) <= 10000),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            |  FROM bands a JOIN bands b
            |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            |  JOIN bc ON a.band = bc.band AND a.bucket = bc.bucket),
            |gd AS (SELECT doc_id, list_distinct(list_transform(
            |         generate_series(1, len(toks) - 2),
            |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
            |       FROM t WHERE len(toks) >= 3),
            |vr AS (SELECT doc_a, doc_b,
            |              CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS n_shared,
            |              CAST(len(ga.grams) AS BIGINT) AS n_a,
            |              CAST(len(gb.grams) AS BIGINT) AS n_b
            |       FROM cand JOIN gd ga ON ga.doc_id = cand.doc_a
            |                 JOIN gd gb ON gb.doc_id = cand.doc_b)
            |SELECT doc_a, doc_b, n_shared, n_a, n_b,
            |       CAST(n_shared AS DOUBLE) / LEAST(n_a, n_b) AS containment,
            |       n_shared * 1000 >= LEAST(n_a, n_b) * 900 AS is_contained,
            |       CASE WHEN n_shared * 1000 >= LEAST(n_a, n_b) * 900
            |            THEN CASE WHEN n_a <= n_b THEN doc_a ELSE doc_b END
            |       END AS contained_doc
            |FROM vr""".stripMargin))

  /** Boilerplate chunk removal (df-threshold, removes ALL copies —
    * see Dedup.boilerplateRewrite for how this differs from d24's
    * first-wins and d47's keep-one-owner). The oracle rebuilds every
    * cleaned doc with an ORDER BY chunk_idx string_agg and compares
    * md5 per doc (the d47 reconstruction oracle shape). */
  val d65Boilerplate = NamedQuery(
    "d65_boilerplate",
    (s, dir) => {
      Dedup.boilerplateRewrite(
        Tables.documents(s, dir), "doc_id", "text",
        chunkTokens = 8, minDocs = 2)
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           |           WHERE text IS NOT NULL),
           |c AS (SELECT doc_id, unnest(generate_series(0, (len(toks) - 1) // 8)) AS chunk_idx,
           |             toks
           |      FROM t WHERE len(toks) > 0),
           |x AS (SELECT doc_id, chunk_idx,
           |             array_to_string(toks[chunk_idx*8+1 : chunk_idx*8+8], ' ') AS ct
           |      FROM c),
           |b AS (SELECT md5(ct) AS h FROM x GROUP BY 1
           |      HAVING COUNT(DISTINCT doc_id) >= 2),
           |m AS (SELECT doc_id, chunk_idx, ct,
           |             md5(ct) IN (SELECT h FROM b) AS bo FROM x)
           |SELECT doc_id, COUNT(*) AS n_chunks,
           |       CAST(SUM(CASE WHEN bo THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           |       md5(COALESCE(string_agg(CASE WHEN NOT bo THEN ct END, ' '
           |                               ORDER BY chunk_idx), '')) AS clean_md5
           |FROM m GROUP BY doc_id""".stripMargin))

  /** Semantic-diversity corpus draw: k-means cells (the d10/d48
    * portable quantizer) capped at 100 vectors each by content-keyed
    * rank — the cluster-balanced sampling step of curation pipelines
    * (flatten topical skew before mixing). The oracle re-derives the
    * cells via the shared ivfCellCtes prefix and replays the
    * md5-uniform in-cell rank. */
  val d63ClusterSample = NamedQuery(
    "d63_cluster_sample",
    (s, dir) => {
      Similarity.clusterBalancedSample(
        Tables.embeddings(s, dir), "vec_id", "embedding", perCell = 100)
    },
    Some(s"""${ivfCellCtes(3)}
            |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(list AS BIGINT) AS cell
            |FROM (
            |  SELECT vec_id, list,
            |         row_number() OVER (PARTITION BY list
            |           ORDER BY md5_number_upper(CAST(vec_id AS VARCHAR)) >> 11,
            |                    vec_id) AS rk
            |  FROM af) WHERE rk <= 100""".stripMargin))

  /** Vocabulary-budget coverage curve (see TextAnalysis.vocabCoverage):
    * token coverage of the top-{4,16,64,4096} terms — the sweep d40's
    * single fixed vocab cannot answer; 4096 saturates on this corpus
    * (coverage_ppm = 10⁶), demonstrating the knee. */
  val d64VocabCoverage = NamedQuery(
    "d64_vocab_coverage",
    (s, dir) => {
      TextAnalysis.vocabCoverage(
        Tables.documents(s, dir).where(col("text").isNotNull),
        "text", Seq(4, 16, 64, 4096))
    },
    Some {
      val sizes = Seq(4, 16, 64, 4096)
      s"""WITH tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM (
         |  SELECT unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE text IS NOT NULL) GROUP BY 1),
         |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rk FROM tf),
         |a AS (SELECT CAST(SUM(c) AS BIGINT) AS tot,
         |${sizes.map(s => s"  CAST(SUM(CASE WHEN rk <= $s THEN c ELSE 0 END) AS BIGINT) AS cov$s")
            .mkString(",\n")}
         |      FROM r)
         |${sizes.map(s =>
            s"""SELECT CAST($s AS BIGINT) AS vocab_size, cov$s AS covered_tokens,
               |       tot AS total_tokens, cov$s * 1000000 // tot AS coverage_ppm
               |FROM a""".stripMargin).mkString("\nUNION ALL\n")}""".stripMargin
    })

  /** The MMR oracle's greedy steps, unrolled: step i scores every
    * not-yet-selected candidate as rel − max sim to the selected set
    * (λ = 1/2 scaled ×2 — one subtraction of IEEE quotients of exact
    * quantized longs) and takes the (mmr2x desc, vec_id) top-1. */
  private val mmrK = 5
  private def mmrUnrolled: String = (2 to mmrK).map { i =>
    s"""s$i AS (SELECT $i AS sel_rank, vec_id, rel, mmr2x FROM (
       |    SELECT c.vec_id, c.rel,
       |           c.rel - coalesce(MAX(CASE WHEN s.vec_id IS NOT NULL
       |                                     THEN p.sim END), 0) AS mmr2x
       |    FROM cand c
       |    LEFT JOIN p ON p.ca = c.vec_id
       |    LEFT JOIN a${i - 1} s ON p.cb = s.vec_id
       |    WHERE c.vec_id NOT IN (SELECT vec_id FROM a${i - 1})
       |    GROUP BY c.vec_id, c.rel)
       |  ORDER BY mmr2x DESC, vec_id LIMIT 1),
       |a$i AS (SELECT * FROM a${i - 1} UNION ALL SELECT * FROM s$i)""".stripMargin
  }.mkString(",\n")

  /** Diversity-aware re-rank of the d06 candidate pool: MMR at λ = 1/2
    * over the exact cosine top-20 of vec 0, greedy top-5 (see
    * Similarity.mmrRerank for the contract — candidate formation is
    * the only corpus-wide stage; the greedy loop touches 20 rows). */
  val d62MmrRerank = NamedQuery(
    "d62_mmr_rerank",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.mmrRerank(emb, "vec_id", "embedding",
        emb.where(col("vec_id") === 0), "vec_id", nCandidates = 20, k = mmrK)
    },
    Some(s"""WITH quant AS (
            |  SELECT vec_id,
            |         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000)) AS e
            |  FROM embeddings),
            |q AS (SELECT e AS qe, sqrt(list_dot_product(e, e)) AS qn
            |      FROM quant WHERE vec_id = 0),
            |cand AS MATERIALIZED (
            |  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS n,
            |         list_dot_product(e, qe)
            |           / (sqrt(list_dot_product(e, e)) * qn) AS rel
            |  FROM quant, q WHERE vec_id <> 0
            |  ORDER BY rel DESC, vec_id LIMIT 20),
            |p AS MATERIALIZED (
            |  SELECT a.vec_id AS ca, b.vec_id AS cb,
            |         list_dot_product(a.e, b.e) / (a.n * b.n) AS sim
            |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
            |s1 AS (SELECT 1 AS sel_rank, vec_id, rel, rel AS mmr2x
            |       FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
            |a1 AS (SELECT * FROM s1),
            |$mmrUnrolled
            |SELECT sel_rank, vec_id, round(rel, 6) AS cos_sim,
            |       round(mmr2x, 6) AS mmr2x
            |FROM a$mmrK""".stripMargin))

  /** Hybrid retrieval (Relevance.hybridRrf): t12's BM25 lexical leg and
    * d06's exact-cosine vector leg (probe = doc/vec 0, excluded from
    * both legs) fused by reciprocal-rank fusion — rrf_micro =
    * Σ 10⁹ div (60 + rank), exact integer arithmetic over two bounded
    * top-20 lists, so the fused ranking is hash-exact. A leg that
    * missed a document keeps a NULL rank and contributes 0. */
  val d66HybridRrf = NamedQuery(
    "d66_hybrid_rrf",
    (s, dir) => {
      val docs = Tables.documents(s, dir).where(col("doc_id") =!= 0)
      val emb = Tables.embeddings(s, dir)
      Relevance.hybridRrf(docs, "doc_id", "text",
        queryTerms = Seq("dup", "spark", "scan"),
        emb, "vec_id", "embedding",
        emb.where(col("vec_id") === 0), "vec_id",
        nLex = 20, nVec = 20, k = 15)
    },
    Some("""WITH b2 AS (
           |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
           |         string_split(text, ' ') AS toks
           |  FROM documents
           |  WHERE text IS NOT NULL AND doc_id IS NOT NULL AND doc_id <> 0),
           |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           |                 CAST(SUM(len) AS BIGINT) AS l_tot FROM b2),
           |tf AS (SELECT doc_id, len, term, CAST(COUNT(*) AS BIGINT) AS tf
           |       FROM (SELECT doc_id, len, unnest(toks) AS term FROM b2)
           |       WHERE term IN ('dup', 'spark', 'scan') GROUP BY 1, 2, 3),
           |dfx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
           |sc AS (SELECT doc_id,
           |         (2200 * tf * (((2 * (n_docs - df) + 1) * 1000) // (2 * df + 1)))
           |         // (1000 * tf + 300
           |             + (9 * ((1000 * len * n_docs) // l_tot)) // 10) AS s
           |       FROM tf JOIN dfx USING (term), stats),
           |lexs AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_milli
           |         FROM sc GROUP BY 1 ORDER BY score_milli DESC, doc_id LIMIT 20),
           |lex AS (SELECT doc_id, CAST(row_number() OVER (
           |          ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank_lex
           |        FROM lexs),
           |quant AS (
           |  SELECT vec_id,
           |         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000)) AS e
           |  FROM embeddings),
           |q AS (SELECT e AS qe FROM quant WHERE vec_id = 0),
           |vecs AS (SELECT vec_id AS doc_id,
           |                list_dot_product(e, qe)
           |                  / (sqrt(list_dot_product(e, e))
           |                     * sqrt(list_dot_product(qe, qe))) AS cos_sim
           |         FROM quant, q WHERE vec_id <> 0
           |         ORDER BY cos_sim DESC, doc_id LIMIT 20),
           |vec AS (SELECT doc_id, CAST(row_number() OVER (
           |          ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS rank_vec
           |        FROM vecs),
           |fused AS (SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
           |                 rank_lex, rank_vec,
           |                 COALESCE(1000000000 // (60 + rank_lex), 0)
           |                   + COALESCE(1000000000 // (60 + rank_vec), 0) AS rrf_micro
           |          FROM lex l FULL JOIN vec v ON l.doc_id = v.doc_id)
           |SELECT doc_id, rank_lex, rank_vec, CAST(rrf_micro AS BIGINT) AS rrf_micro,
           |       CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rank
           |FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT 15""".stripMargin))

  /** Two-stage ANN with exact refine (Similarity.ivfPqRefineTopK):
    * d56's IVF-PQ proposes 15 candidates per query from compressed
    * codes, then only those rows are re-scored with the exact cosine
    * and re-ranked top-5 — the production answer to ADC quantization
    * error. Registered so the candidate→refine composition carries its
    * own correctness row (stage-1 id/tie handling feeding stage 2 is
    * exactly where an off-by-one would hide). */
  val d67IvfPqRefine = NamedQuery(
    "d67_ivfpq_refine",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfPqRefineTopK(emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 5), "vec_id", k = 5, nCandidates = 15)
    },
    Some(ivfPqRefineOracleSql))

  private lazy val ivfPqRefineOracleSql: String =
    s"""${ivfCellCtes(3)},
       |$pqSubCtes,
       |qs AS (SELECT vec_id AS query_id, e FROM quant WHERE vec_id < 5),
       |probes AS (
       |  SELECT query_id, e, list FROM (
       |    SELECT q.query_id, q.e, c.list,
       |           row_number() OVER (PARTITION BY q.query_id
       |             ORDER BY ${ivfD2("q.e", "c.c")}, c.list) AS rk
       |    FROM qs q CROSS JOIN c3 c) WHERE rk <= 2),
       |scored AS (
       |  SELECT s.query_id, a.vec_id AS data_id, $pqScoreTerms AS adc_score
       |  FROM probes s JOIN af a ON a.list = s.list
       |    JOIN codes cd ON cd.vec_id = a.vec_id
       |    $pqCentJoins
       |  WHERE a.vec_id <> s.query_id),
       |cand AS (SELECT query_id, data_id FROM (
       |  SELECT query_id, data_id,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY adc_score, data_id) AS rk
       |  FROM scored) WHERE rk <= 15),
       |ref AS (
       |  SELECT c.query_id, c.data_id,
       |         list_dot_product(a.e, s.e)
       |           / (sqrt(list_dot_product(a.e, a.e))
       |              * sqrt(list_dot_product(s.e, s.e))) AS cos_sim
       |  FROM cand c JOIN quant a ON a.vec_id = c.data_id
       |       JOIN qs s ON s.query_id = c.query_id)
       |SELECT query_id, data_id, cos_sim, CAST(rk AS BIGINT) AS rank FROM (
       |  SELECT query_id, data_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY cos_sim DESC, data_id) AS rk
       |  FROM ref)
       |WHERE rk <= 5""".stripMargin

  /** Robust per-source score normalization (TextAnalysis.robustScale):
    * every document's n_chars winsorized at its source's [p5, p95]
    * discrete percentiles and min-max'd to 0..10⁶ — pure integer
    * arithmetic end to end (percentile_disc as the 100·cum ≥ p·n
    * ladder), so the gate is hash-exact. The harmonization step before
    * a single global quality cut across heterogeneous sources. */
  val d68RobustScale = NamedQuery(
    "d68_robust_scale",
    (s, dir) => TextAnalysis.robustScale(
      Tables.documents(s, dir), "doc_id", "source", "n_chars"),
    Some("""WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
           |           FROM documents
           |           WHERE doc_id IS NOT NULL AND source IS NOT NULL),
           |dist AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
           |         FROM d WHERE n_chars IS NOT NULL GROUP BY 1, 2),
           |cum AS (SELECT source, v,
           |               SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum,
           |               SUM(c) OVER (PARTITION BY source) AS n
           |        FROM dist),
           |b AS (SELECT source,
           |             MIN(CASE WHEN 100 * cum >= 5 * n THEN v END) AS lo,
           |             MIN(CASE WHEN 100 * cum >= 95 * n THEN v END) AS hi
           |      FROM cum GROUP BY 1)
           |SELECT doc_id, source, n_chars, lo, hi,
           |       CASE WHEN n_chars IS NULL THEN NULL
           |            WHEN hi = lo THEN 500000
           |            ELSE ((GREATEST(lo, LEAST(hi, n_chars)) - lo) * 1000000)
           |                 // (hi - lo)
           |       END AS scaled_micro
           |FROM d JOIN b USING (source)""".stripMargin))

  /** Hashing-trick features (TextAnalysis.hashedFeatures): 16-bucket
    * signed term-frequency vectors, bucket = md5 & 15 and sign = the
    * next hash bit — both bitwise, so the signed (Spark) and unsigned
    * (DuckDB) views of the md5 half agree exactly. The vocab-free
    * featurizer for corpus-scale linear classifiers. */
  val d69FeatureHash = NamedQuery(
    "d69_feature_hash",
    (s, dir) => TextAnalysis.hashedFeatures(
      Tables.documents(s, dir), "doc_id", "text", dim = 16),
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |             FROM documents
           |             WHERE doc_id IS NOT NULL AND text IS NOT NULL),
           |h AS (SELECT doc_id,
           |             CAST(md5_number_upper(term) & 15 AS BIGINT) AS bucket,
           |             CASE WHEN (md5_number_upper(term) >> 4) & 1 = 1
           |                  THEN 1 ELSE -1 END AS sgn
           |      FROM tok)
           |SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS val
           |FROM h GROUP BY 1, 2 HAVING SUM(sgn) <> 0""".stripMargin))

  /** Prefix-filtering set-similarity self-join (Dedup.prefixFilterPairs,
    * Bayardo et al. WWW'07) at Jaccard ≥ 0.8 over 3-shingles — the
    * EXACT-threshold dedup candidate engine next to d03's probabilistic
    * minhash banding: no false negatives by the prefix pigeonhole, and
    * the keep decision is the integer cross-multiply 100·|∩| ≥ 80·|∪|.
    * The oracle replays the df-ranked prefixes, the 10k posting cap
    * (never engaging here — max 3-gram df is single-digit), and the
    * exact verify, all in integer arithmetic — hash-exact. */
  val d70PrefixJoin = NamedQuery(
    "d70_prefix_join",
    (s, dir) => Dedup.prefixFilterPairs(
      Tables.documents(s, dir), "doc_id", "text",
      shingleN = 3, thetaPct = 80, maxPostings = 10000),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           |           FROM documents
           |           WHERE text IS NOT NULL AND doc_id IS NOT NULL),
           |g AS (SELECT doc_id, list_distinct(list_transform(
           |        generate_series(1, len(toks) - 2),
           |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
           |      FROM t WHERE len(toks) >= 3),
           |tok AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n,
           |               unnest(grams) AS gm FROM g),
           |dfr AS (SELECT gm, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY 1),
           |pfx AS (SELECT doc_id, gm FROM (
           |          SELECT tok.doc_id, tok.gm, tok.n,
           |                 row_number() OVER (PARTITION BY tok.doc_id
           |                   ORDER BY df, tok.gm) AS rk
           |          FROM tok JOIN dfr USING (gm))
           |        WHERE rk <= n - ((80 * n + 99) // 100) + 1),
           |post AS (SELECT gm FROM pfx GROUP BY gm HAVING COUNT(*) <= 10000),
           |kept AS (SELECT doc_id, gm FROM pfx WHERE gm IN (SELECT gm FROM post)),
           |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |         FROM kept a JOIN kept b
           |           ON a.gm = b.gm AND a.doc_id < b.doc_id),
           |iv AS (SELECT doc_a, doc_b,
           |              CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS n_shared,
           |              CAST(len(ga.grams) AS BIGINT) AS n_a,
           |              CAST(len(gb.grams) AS BIGINT) AS n_b
           |       FROM cand JOIN g ga ON ga.doc_id = cand.doc_a
           |            JOIN g gb ON gb.doc_id = cand.doc_b)
           |SELECT doc_a, doc_b, n_shared, n_a, n_b,
           |       n_shared * 1000000 // (n_a + n_b - n_shared) AS jacc_ppm
           |FROM iv
           |WHERE 100 * n_shared >= 80 * (n_a + n_b - n_shared)""".stripMargin))

  /** Curation-pipeline v2 — the round-12 surface composed as ONE
    * registered query with per-stage tallies (the d25/d56 composition
    * contract: compositions carry their own correctness rows):
    * d68 robust scale (per-source n_chars harmonized to 0..10⁶) feeds
    * d73's rank ensemble as its third signal (the point of the
    * composition — a HARMONIZED signal fuses with raw ones without
    * scale dominance because only ranks fuse), a top-60% keep cut on
    * the fused rank, then d41's leak-safe split of the kept docs
    * (cluster-keyed — a kept doc and its near-dup can never straddle
    * train/eval). Output: (stage, name, n_docs) tallies. Plan shape:
    * every stage is the already-gate-certified operator's plan; the
    * stitches are one doc_id equi-join, one broadcast 1-row total,
    * one doc_id semi-join — no new shuffle regimes. */
  val d77CurationV2 = NamedQuery(
    "d77_curation_v2",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .where(col("text").isNotNull && col("source").isNotNull &&
          col("doc_id").isNotNull)
        .localCheckpoint()
      // each stage boundary is checkpointed: the four tally branches
      // would otherwise RE-DERIVE every upstream stage per branch
      // (measured: 28 exchanges un-pinned vs stagewise single digits)
      val scaled = TextAnalysis.robustScale(docs, "doc_id", "source", "n_chars")
        .select(col("doc_id"), col("scaled_micro"))
        .localCheckpoint()
      val t = col("text")
      val ranked = Ranking.rankEnsemble(docs.join(scaled, Seq("doc_id")), "doc_id", Seq(
        "quality" -> TextAnalysis.qualityScore(t,
          TextAnalysis.whitespaceTokenCount(t), TextAnalysis.punctCount(t)),
        "uniq" -> expr(
          "(1000000L * size(array_distinct(split(text, ' ')))) div size(split(text, ' '))"),
        "scaled" -> col("scaled_micro")))
        .localCheckpoint()
      val total = ranked.agg(count(lit(1)).as("_n"))
      val kept = ranked.crossJoin(broadcast(total))
        .where(col("ensemble_rank") * 10 <= lit(6L) * col("_n"))
        .select(col("doc_id"))
        .localCheckpoint()
      val clusters = Dedup.resolveMinhashDups(
          docs.join(kept, Seq("doc_id"), "left_semi"), "doc_id", "text",
          minEstJaccard = 1.0)
        .select(col("doc_id"), col("cluster_id"))
      val splits = graft.ops.Sampling.assignSplit(clusters, "cluster_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .localCheckpoint()
      docs.agg(count(lit(1)).as("n"))
        .select(lit(0L).as("stage"), lit("input").as("name"), col("n").as("n_docs"))
        .unionByName(scaled.agg(count(when(col("scaled_micro").isNotNull, 1L)).as("n"))
          .select(lit(1L).as("stage"), lit("scaled").as("name"), col("n").as("n_docs")))
        .unionByName(kept.agg(count(lit(1)).as("n"))
          .select(lit(2L).as("stage"), lit("kept").as("name"), col("n").as("n_docs")))
        .unionByName(splits.groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"))
          .select(lit(3L).as("stage"), col("split").as("name"), col("n_docs")))
    },
    Some(s"""WITH $minhashSigCte,
            |base AS (SELECT doc_id, source, text, CAST(n_chars AS BIGINT) AS n_chars
            |         FROM documents
            |         WHERE text IS NOT NULL AND source IS NOT NULL AND doc_id IS NOT NULL),
            |dist68 AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
            |           FROM base WHERE n_chars IS NOT NULL GROUP BY 1, 2),
            |cum68 AS (SELECT source, v,
            |                 SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum,
            |                 SUM(c) OVER (PARTITION BY source) AS n FROM dist68),
            |bounds AS (SELECT source,
            |                  MIN(CASE WHEN 100 * cum >= 5 * n THEN v END) AS lo,
            |                  MIN(CASE WHEN 100 * cum >= 95 * n THEN v END) AS hi
            |           FROM cum68 GROUP BY source),
            |sc68 AS (SELECT b.doc_id,
            |                CASE WHEN b.n_chars IS NULL THEN NULL
            |                     WHEN bo.hi = bo.lo THEN 500000
            |                     ELSE ((GREATEST(bo.lo, LEAST(bo.hi, b.n_chars)) - bo.lo)
            |                           * 1000000) // (bo.hi - bo.lo) END AS scaled_micro
            |         FROM base b JOIN bounds bo USING (source)),
            |m73 AS (SELECT doc_id, text,
            |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            |         CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
            |         CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0
            |              ELSE CAST(list_sum(list_transform(string_split(text, ' '), tk -> CAST(length(tk) AS BIGINT))) AS DOUBLE)
            |                   / CAST(len(string_split(text, ' ')) AS BIGINT) END AS mean_tok_len,
            |         CAST(len(list_filter(string_split(text, ' '), tk -> tk IN ('the', 'a', 'of', 'and', 'to', 'is'))) AS BIGINT) AS en_hits
            |        FROM base),
            |sg73 AS (SELECT doc_id,
            |          CAST(CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1 ELSE 0 END
            |           + CASE WHEN n_punct * 10 <= length(text) THEN 1 ELSE 0 END
            |           + CASE WHEN en_hits > 0 THEN 1 ELSE 0 END
            |           + CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END AS BIGINT) AS sq,
            |          (1000000 * CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT))
            |            // CAST(len(string_split(text, ' ')) AS BIGINT) AS su
            |         FROM m73),
            |r73 AS (SELECT doc_id,
            |         CAST(row_number() OVER (ORDER BY sq DESC, doc_id) AS BIGINT) AS rank_quality,
            |         CAST(row_number() OVER (ORDER BY su DESC, doc_id) AS BIGINT) AS rank_uniq
            |        FROM sg73),
            |rsc AS (SELECT doc_id,
            |         CAST(row_number() OVER (ORDER BY scaled_micro DESC, doc_id) AS BIGINT) AS rank_scaled
            |        FROM sc68),
            |fused AS (SELECT r73.doc_id,
            |           (rank_quality + rank_uniq + rank_scaled) * 1000 // 3 AS mrm
            |          FROM r73 JOIN rsc USING (doc_id)),
            |ens AS (SELECT doc_id,
            |         CAST(row_number() OVER (ORDER BY mrm, doc_id) AS BIGINT) AS er
            |        FROM fused),
            |kept AS (SELECT doc_id FROM ens
            |         WHERE er * 10 <= 6 * (SELECT COUNT(*) FROM ens)),
            |keyed AS (SELECT b.doc_id,
            |           CASE WHEN s.doc_id IS NOT NULL THEN 'L:' || array_to_string(s.sig, ',')
            |                ELSE 'S:' || b.text END AS k
            |          FROM base b JOIN kept USING (doc_id)
            |               LEFT JOIN sig s ON s.doc_id = b.doc_id),
            |cl AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY k) AS cluster_id
            |       FROM keyed),
            |u AS (SELECT cluster_id,
            |             CAST(md5_number_upper(CAST(cluster_id AS VARCHAR)) >> 11 AS BIGINT) AS h
            |      FROM cl)
            |SELECT CAST(0 AS BIGINT) AS stage, 'input' AS name,
            |       CAST(COUNT(*) AS BIGINT) AS n_docs FROM base
            |UNION ALL
            |SELECT 1, 'scaled', CAST(COUNT(*) AS BIGINT)
            |FROM sc68 WHERE scaled_micro IS NOT NULL
            |UNION ALL
            |SELECT 2, 'kept', CAST(COUNT(*) AS BIGINT) FROM kept
            |UNION ALL
            |SELECT 3,
            |       CASE WHEN h < 7205759403792793 THEN 'train'
            |            WHEN h < 8106479329266892 THEN 'val' ELSE 'test' END,
            |       CAST(COUNT(*) AS BIGINT)
            |FROM u GROUP BY 2""".stripMargin))

  /** d70's AUTO-dialed twin: the posting cap comes from
    * Dials.autoMaxPostings(count(documents)) — 4·ceil(√n) clamped to
    * [64, 1e6] — instead of a hand-fixed constant (the q102 auto-dial
    * contract applied to caps). The oracle REPLAYS the derivation from
    * the same COUNT(*) (correctly-rounded sqrt is bit-portable), so
    * the gate certifies cap + answer together at any corpus size,
    * whether or not the cap engages. */
  val d78PrefixJoinAuto = NamedQuery(
    "d78_prefix_join_auto",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.prefixFilterPairs(docs, "doc_id", "text",
        shingleN = 3, thetaPct = 80,
        maxPostings = Dials.autoMaxPostings(docs.count()))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           |           FROM documents
           |           WHERE text IS NOT NULL AND doc_id IS NOT NULL),
           |g AS (SELECT doc_id, list_distinct(list_transform(
           |        generate_series(1, len(toks) - 2),
           |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
           |      FROM t WHERE len(toks) >= 3),
           |cap AS (SELECT GREATEST(64, LEAST(1000000,
           |          4 * CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))) AS c
           |        FROM documents),
           |tok AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n,
           |               unnest(grams) AS gm FROM g),
           |dfr AS (SELECT gm, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY 1),
           |pfx AS (SELECT doc_id, gm FROM (
           |          SELECT tok.doc_id, tok.gm, tok.n,
           |                 row_number() OVER (PARTITION BY tok.doc_id
           |                   ORDER BY df, tok.gm) AS rk
           |          FROM tok JOIN dfr USING (gm))
           |        WHERE rk <= n - ((80 * n + 99) // 100) + 1),
           |post AS (SELECT gm FROM pfx GROUP BY gm
           |         HAVING COUNT(*) <= (SELECT c FROM cap)),
           |kept AS (SELECT doc_id, gm FROM pfx WHERE gm IN (SELECT gm FROM post)),
           |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |         FROM kept a JOIN kept b
           |           ON a.gm = b.gm AND a.doc_id < b.doc_id),
           |iv AS (SELECT doc_a, doc_b,
           |              CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS n_shared,
           |              CAST(len(ga.grams) AS BIGINT) AS n_a,
           |              CAST(len(gb.grams) AS BIGINT) AS n_b
           |       FROM cand JOIN g ga ON ga.doc_id = cand.doc_a
           |            JOIN g gb ON gb.doc_id = cand.doc_b)
           |SELECT doc_a, doc_b, n_shared, n_a, n_b,
           |       n_shared * 1000000 // (n_a + n_b - n_shared) AS jacc_ppm
           |FROM iv
           |WHERE 100 * n_shared >= 80 * (n_a + n_b - n_shared)""".stripMargin))

  /** Hard-negative mining (Similarity.hardNegatives): for each of the
    * first 5 vectors by id, the 5 most cosine-similar vectors with a
    * DIFFERENT label — the near-miss negatives a contrastive loss
    * trains on. Exact quantized-long dot products (the d06
    * arithmetic), so all 25 mined rows are oracle-checked hash-exact;
    * the per-query top-k plans as WindowGroupLimit (map-side rank
    * pushdown), never a corpus-wide sort. */
  val d71HardNegatives = NamedQuery(
    "d71_hard_negatives",
    (s, dir) => Similarity.hardNegatives(
      Tables.embeddings(s, dir), "vec_id", "embedding", "label",
      nQueries = 5, k = 5),
    Some("""WITH quant AS (
           |  SELECT vec_id, CAST(label AS BIGINT) AS label,
           |         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000)) AS e
           |  FROM embeddings),
           |n AS (SELECT vec_id, label, e,
           |             sqrt(list_dot_product(e, e)) AS nrm FROM quant),
           |q AS (SELECT vec_id AS q_id, label AS q_lbl, e AS qe, nrm AS qn
           |      FROM n ORDER BY vec_id LIMIT 5),
           |sc AS (SELECT q.q_id, n.vec_id, n.label AS neg_label,
           |              list_dot_product(n.e, q.qe) / (n.nrm * q.qn) AS cos_sim
           |       FROM n CROSS JOIN q
           |       WHERE n.label <> q.q_lbl AND n.vec_id <> q.q_id)
           |SELECT q_id, vec_id, neg_label, cos_sim, CAST(rk AS BIGINT) AS rank
           |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
           |        ORDER BY cos_sim DESC, vec_id) AS rk FROM sc)
           |WHERE rk <= 5""".stripMargin))

  /** Per-doc n-gram novelty of the odd-id half against the even-id
    * half as reference corpus (Dedup.noveltyScore) — the incremental-
    * crawl "is this worth keeping?" rank signal, d11's complement.
    * Exact ppm; grams travel as md5 (hashes shuffle, never text). */
  val d72Novelty = NamedQuery(
    "d72_novelty",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.noveltyScore(
        docs.where(col("doc_id") % 2 === 1), docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", shingleN = 3)
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
           |        generate_series(1, len(toks) - 2),
           |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
           |      FROM t WHERE len(toks) >= 3),
           |ref AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
           |cand AS (SELECT doc_id, gram FROM g WHERE doc_id % 2 = 1)
           |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           |       CAST(SUM(CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           |       (1000000 * CAST(SUM(CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT))
           |         // CAST(COUNT(*) AS BIGINT) AS novelty_ppm
           |FROM cand c LEFT JOIN ref r ON c.gram = r.gram
           |GROUP BY 1""".stripMargin))

  /** Rank-fusion quality ensemble (Ranking.rankEnsemble): three weak
    * per-doc quality signals — the t02 heuristic score, distinct-token
    * ratio, and raw length — vote by exact mean rank into ONE keep
    * order, the multi-filter combination step of curation recipes
    * (each signal alone is gameable; the fused rank is robust to any
    * one signal's scale because only ranks fuse). Every rank is a
    * scale-safe two-phase global sort (no unpartitioned window); all
    * four rank columns and the milli mean are oracle-checked
    * hash-exact. */
  val d73QualityEnsemble = NamedQuery(
    "d73_quality_ensemble",
    (s, dir) => {
      val t = col("text")
      Ranking.rankEnsemble(Tables.documents(s, dir), "doc_id", Seq(
        "quality" -> TextAnalysis.qualityScore(t,
          TextAnalysis.whitespaceTokenCount(t), TextAnalysis.punctCount(t)),
        "uniq" -> expr(
          "(1000000L * size(array_distinct(split(text, ' ')))) div size(split(text, ' '))"),
        "chars" -> col("n_chars").cast("long")))
    },
    Some("""WITH m AS (
           |  SELECT doc_id, text, n_chars,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |         CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS n_punct,
           |         CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0
           |              ELSE CAST(list_sum(list_transform(string_split(text, ' '), t -> CAST(length(t) AS BIGINT))) AS DOUBLE)
           |                   / CAST(len(string_split(text, ' ')) AS BIGINT) END AS mean_tok_len,
           |         CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'to', 'is'))) AS BIGINT) AS en_hits
           |  FROM documents),
           |sg AS (SELECT doc_id,
           |         CAST(CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1 ELSE 0 END
           |          + CASE WHEN n_punct * 10 <= length(text) THEN 1 ELSE 0 END
           |          + CASE WHEN en_hits > 0 THEN 1 ELSE 0 END
           |          + CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END AS BIGINT) AS sq,
           |         (1000000 * CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT))
           |           // CAST(len(string_split(text, ' ')) AS BIGINT) AS su,
           |         CAST(n_chars AS BIGINT) AS sc
           |       FROM m),
           |r AS (SELECT doc_id,
           |        CAST(row_number() OVER (ORDER BY sq DESC, doc_id) AS BIGINT) AS rank_quality,
           |        CAST(row_number() OVER (ORDER BY su DESC, doc_id) AS BIGINT) AS rank_uniq,
           |        CAST(row_number() OVER (ORDER BY sc DESC, doc_id) AS BIGINT) AS rank_chars
           |      FROM sg),
           |w AS (SELECT doc_id, rank_quality, rank_uniq, rank_chars,
           |        CAST((rank_quality + rank_uniq + rank_chars) * 1000 // 3 AS BIGINT) AS mean_rank_milli
           |      FROM r)
           |SELECT doc_id, rank_quality, rank_uniq, rank_chars, mean_rank_milli,
           |       CAST(row_number() OVER (ORDER BY mean_rank_milli, doc_id) AS BIGINT) AS ensemble_rank
           |FROM w""".stripMargin))

  /** Clipped n-gram precision verify (Dedup.ngramPrecisionVerify) on
    * d15's minhash candidate pairs at n = 2 — the BLEU-style MULTISET
    * overlap the distinct-set verifies (d15 Jaccard, d61 containment)
    * cannot see: occurrences count, capped at the reference's own
    * multiplicity. Both direction precisions in exact ppm. */
  val d74NgramPrecision = NamedQuery(
    "d74_ngram_precision",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, minEstJaccard = 0.0)
      Dedup.ngramPrecisionVerify(docs, "doc_id", "text", pairs, shingleN = 2)
    },
    Some(s"""WITH $minhashSigCte,
            |bands AS (
            |  SELECT doc_id, b AS band,
            |         md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket
            |  FROM sig CROSS JOIN generate_series(0, 3) bb(b)),
            |bc AS (SELECT band, bucket FROM bands GROUP BY 1, 2 HAVING COUNT(*) <= 10000),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            |  FROM bands a JOIN bands b
            |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            |  JOIN bc ON a.band = bc.band AND a.bucket = bc.bucket),
            |g2 AS (SELECT doc_id, unnest(list_transform(
            |         generate_series(1, len(toks) - 1),
            |         i -> toks[i] || ' ' || toks[i+1])) AS gram
            |       FROM t WHERE len(toks) >= 2),
            |gc AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
            |       FROM g2 GROUP BY 1, 2),
            |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nt FROM gc GROUP BY 1),
            |cl AS (SELECT cand.doc_a, cand.doc_b,
            |              CAST(SUM(least(ga.c, gb.c)) AS BIGINT) AS n_clip
            |       FROM cand JOIN gc ga ON ga.doc_id = cand.doc_a
            |                 JOIN gc gb ON gb.doc_id = cand.doc_b AND gb.gram = ga.gram
            |       GROUP BY 1, 2)
            |SELECT cand.doc_a, cand.doc_b,
            |       COALESCE(cl.n_clip, 0) AS n_clip, ta.nt AS n_a, tb.nt AS n_b,
            |       (1000000 * COALESCE(cl.n_clip, 0)) // ta.nt AS prec_a_ppm,
            |       (1000000 * COALESCE(cl.n_clip, 0)) // tb.nt AS prec_b_ppm
            |FROM cand
            |LEFT JOIN cl ON cl.doc_a = cand.doc_a AND cl.doc_b = cand.doc_b
            |JOIN tot ta ON ta.doc_id = cand.doc_a
            |JOIN tot tb ON tb.doc_id = cand.doc_b""".stripMargin))

  /** Johnson–Lindenstrauss projection to 8 dims (Similarity.jlProject):
    * exact integer output coordinates from the md5-parity Rademacher
    * matrix — the deterministic dimensionality-reduction front end for
    * clustering/ANN, oracle-replayed plane by plane. */
  val d75JlProjection = NamedQuery(
    "d75_jl_projection",
    (s, dir) => Similarity.jlProject(
      Tables.embeddings(s, dir), "vec_id", "embedding", rDim = 8),
    Some {
      val cols = (0 until 8).map { j =>
        s"""CAST(list_sum(list_transform(generate_series(1, len(e)),
           |  d -> e[d] * (CASE WHEN md5_number_upper('srp:' || $j || ':' || (d - 1)) & 1 = 1
           |               THEN 1.0 ELSE -1.0 END))) AS BIGINT) AS p$j""".stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
         |                                         x -> round(x * 1000)) AS e
         |           FROM embeddings)
         |SELECT vec_id,
         |$cols
         |FROM q""".stripMargin
    })

  /** kNN label probe (Similarity.knnLabelProbe): majority label of the
    * 5 nearest neighbours for the first 20 vectors — the embedding-
    * quality go/no-go before trusting the space for SemDeDup or
    * clustering. Argmax ties pin (votes desc, label asc); every row
    * oracle-checked hash-exact. */
  val d76KnnProbe = NamedQuery(
    "d76_knn_probe",
    (s, dir) => Similarity.knnLabelProbe(
      Tables.embeddings(s, dir), "vec_id", "embedding", "label",
      nQueries = 20, k = 5),
    Some("""WITH quant AS (
           |  SELECT vec_id, CAST(label AS BIGINT) AS label,
           |         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000)) AS e
           |  FROM embeddings),
           |n AS (SELECT vec_id, label, e,
           |             sqrt(list_dot_product(e, e)) AS nrm FROM quant),
           |q AS (SELECT vec_id AS q_id, label AS true_label, e AS qe, nrm AS qn
           |      FROM n ORDER BY vec_id LIMIT 20),
           |sc AS (SELECT q.q_id, q.true_label, n.vec_id, n.label AS nlbl,
           |              list_dot_product(n.e, q.qe) / (n.nrm * q.qn) AS cos_sim
           |       FROM n CROSS JOIN q WHERE n.vec_id <> q.q_id),
           |nb AS (SELECT * FROM (
           |         SELECT *, row_number() OVER (PARTITION BY q_id
           |                     ORDER BY cos_sim DESC, vec_id) AS rk FROM sc)
           |       WHERE rk <= 5),
           |vt AS (SELECT q_id, true_label, nlbl, CAST(COUNT(*) AS BIGINT) AS votes
           |       FROM nb GROUP BY 1, 2, 3)
           |SELECT q_id, true_label, nlbl AS predicted_label, votes
           |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
           |        ORDER BY votes DESC, nlbl) AS rn FROM vt)
           |WHERE rn = 1""".stripMargin))

  val all: Seq[NamedQuery] = Seq(
    d01DedupExact, d02MinhashSignatures, d03MinhashPairs, d04Simhash,
    d05NgramJaccard, d06CosineTopK, d07AnnLsh, d08EmbeddingNeardup,
    d09DedupResolve, d10AnnIvf, d11Contamination, d12StratifiedSample,
    d13SequencePack, d14CapPerKey, d15JaccardVerify, d16ChunkSplit,
    d17CorpusStats, d18ShuffleShard, d19VocabEncode, d20BpePairs,
    d21MixtureWeights, d22DomainKl, d23QualityFilter, d24ChunkDedup,
    d25CurationPipeline, d26KAnonymity, d27ForgetPurge, d28LmQuality,
    d29BpeTrain, d30BpeEncode, d31WeightedSample, d32SplitAssign,
    d33Curriculum, d34CorpusDiff, d35BudgetAssembly, d36KeepBest,
    d37EmbeddingStats, d38ClusterSizes, d39IncrementalDedup, d40OovRate,
    d41LeakSafeSplit, d43EmbeddingCovariance, d44NeardupAutoSized,
    d45SpanDupCoverage, d46QualityClassifier, d47DedupRewrite,
    d48SemDedup, d49BpeFertility, d50PcaPower, d51SelfDupRewrite,
    d52Decontaminate, d53SourceOverlap, d54DsirImportance, d55PqAnn,
    d56IvfPq, d57AutoBandPairs, d58SoftDedup, d59SqAnn, d60EditVerify,
    d61Containment, d62MmrRerank, d63ClusterSample, d64VocabCoverage,
    d65Boilerplate, d66HybridRrf, d67IvfPqRefine, d68RobustScale,
    d69FeatureHash, d70PrefixJoin, d71HardNegatives, d72Novelty,
    d73QualityEnsemble, d74NgramPrecision, d75JlProjection, d76KnnProbe,
    d77CurationV2, d78PrefixJoinAuto, d79MinhashPairsAuto, d80EmbeddingNeardupAuto,
    d81NeardupFullAuto, d82AnnRecall, d83Waterfill, d84DedupRecall,
    t01LangId, t02TextQuality, t03TokenCount, t04Fingerprint, t05PiiScan,
    t06TopTerms, t07Repetition, t08Entropy, t09BigramLm, t10Pmi, t11Zipf,
    m01MediaMeta, m02MediaDecode, m03MediaResize, m04AudioFrames,
    m05AssembleRecords, m06PatchGrid, m07PerceptualNeardup, m08TarShards,
    m09TarRoundtrip, m10PngDecode, m11WavDecode)
}
