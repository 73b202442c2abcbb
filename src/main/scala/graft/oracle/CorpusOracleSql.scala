package graft.oracle

import graft.corpus.TextStats

/** DuckDB-dialect oracles for the corpus/multimodal queries (CorpusQueries `x1..x11`, `m1`).
  *
  * Where the operator embeds constants (stopword lists, LSH hyperplanes, shingle
  * width), the SQL is BUILT from the same Scala constants the operator uses, so the
  * two can never drift silently. The hyperplane matrix replays
  * `scala.util.Random(42)` (java.util.Random LCG) exactly as
  * `graft.corpus.Similarity.hyperplanes` does.
  *
  * Every corpus query is oracle-checked, including m2: its mapPartitions codec
  * kernel runs FakeCodec, whose deterministic arithmetic the oracle replays in
  * SQL (milli-unit rendering sidesteps float-formatting divergence).
  */
object CorpusOracleSql {

  /** Word-3-gram shingle CTEs (toks → distinct shingles → postings) shared by
    * every shingle-based oracle, so shingle semantics live in ONE place. */
  private val shinglePrelude = """WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id,
    CASE WHEN len(ws) >= 3
      THEN list_distinct(list_transform(range(len(ws) - 2),
             i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))
      ELSE CAST([] AS VARCHAR[]) END AS shingles
  FROM toks),
post AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
"""

  /** Postings + exact pairwise Jaccard, mirroring TextDedup.shingles /
    * ngramJaccardPairs (n=3). */
  private val jaccardPrelude = shinglePrelude +
    """szs AS (SELECT doc_id, len(shingles) AS n_shingles FROM sh),
inter AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, COUNT(*) AS c
  FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
jpairs AS (
  SELECT doc_id_1, doc_id_2,
         CAST(c AS DOUBLE) / (x.n_shingles + y.n_shingles - c) AS jaccard
  FROM inter JOIN szs x ON doc_id_1 = x.doc_id JOIN szs y ON doc_id_2 = y.doc_id)
"""

  private val jaccardSelect =
    s"SELECT doc_id_1, doc_id_2, jaccard FROM jpairs WHERE jaccard >= ${graft.corpus.TextDedup.DefaultJaccardThreshold}"

  /** x2's capped-universe variant: shingles with document frequency > 1000 are
    * excluded from postings AND set sizes, mirroring ngramJaccardPairs(maxDf=1000).
    * At test scale no shingle can exceed the cap, so this equals unrestricted J. */
  private val cappedIpairsPrelude = shinglePrelude +
    """rare AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM post)
  WHERE df <= 1000),
szs AS (SELECT doc_id, COUNT(*) AS n_shingles FROM rare GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, COUNT(*) AS c
  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
ipairs AS (
  SELECT doc_id_1, doc_id_2, c, x.n_shingles AS n1, y.n_shingles AS n2
  FROM inter JOIN szs x ON doc_id_1 = x.doc_id JOIN szs y ON doc_id_2 = y.doc_id)
"""

  /** ONE `ipairs` core shared by the x2/x82 measures — mirroring the
    * engine's `sizedIntersections`, so the two measures can never disagree
    * on the capped shingle universe. */
  private val cappedJaccardPrelude = cappedIpairsPrelude +
    """, jpairs AS (
  SELECT doc_id_1, doc_id_2, CAST(c AS DOUBLE) / (n1 + n2 - c) AS jaccard
  FROM ipairs)
"""

  /** 32-bit SimHash, mirroring TextDedup.simhash's md5-nibble construction. */
  private val simhashPrelude: String = {
    val high = Seq("8", "9", "a", "b", "c", "d", "e", "f")
      .map(c => s"'$c'").mkString(", ")
    val sums = (0 until 32).map(i =>
      s"SUM(CASE WHEN substr(hx, ${i + 1}, 1) IN ($high) THEN 1 ELSE -1 END) AS s$i")
      .mkString(",\n    ")
    val bits = (0 until 32).map(i =>
      s"(CASE WHEN s$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tokh AS (
  SELECT doc_id, md5(w) AS hx
  FROM (SELECT doc_id, unnest(ws) AS w FROM toks)),
bitsums AS (
  SELECT doc_id,
    $sums
  FROM tokh GROUP BY doc_id),
sims AS (
  SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM bitsums)
"""
  }

  /** [[simhashPrelude]] extended with the x5 pigeonhole-blocked candidate
    * set as a `cand` CTE — ONE definition shared by x5 and x80 so the
    * verifier's oracle can never drift from the generator's. */
  private val simhashCandidates: String = simhashPrelude +
    """, ch AS (
  SELECT doc_id, simhash, chunk, (simhash >> (chunk * 8)) & 255 AS v
  FROM sims CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS chunk)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.v = b.v AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)
"""

  /** x81 — BPE train-then-segment, replayed round-for-round: each training
    * round is a pair-count CTE, a (count desc, l, r) argmax CTE, and a
    * re-segmentation CTE; the application chain then replays the same
    * argmaxes over every document's words. Words live as WRAPPED symbol
    * strings — every symbol rendered `<SEP>sym<SEP>` (SEP = chr(1), a
    * char no corpus symbol contains) and concatenated — so one
    * left-to-right non-overlapping `replace` of `<SEP>l<SEP><SEP>r<SEP>`
    * with `<SEP>lr<SEP>` IS Sennrich's merge_vocab pass (the wrapping
    * makes symbol boundaries unmistakable: merging (b, c) can never match
    * inside (ab, c)); `chr(2)` fallbacks make exhausted rounds exact no-ops,
    * matching the engine's early stop. CTEs are MATERIALIZED: `t_i` and
    * `w_i` are each referenced twice, and DuckDB's default inlining would
    * re-run the whole training prefix per reference — 2^rounds blowup,
    * measured as a >100× slowdown at 8 rounds. */
  /** `trainRel` feeds the merge training (w0), `applyRel` the segmentation
    * (dw) — "documents"/"documents" reproduces the original x81/x88 chain
    * byte-for-byte; x91 trains on the frozen half and applies to all. */
  private def bpeChainCtes(trainRel: String = "documents",
      applyRel: String = "documents"): String = {
    val rounds = graft.corpus.TextStats.BpeDefaultMerges
    val s1 = "chr(1)"
    val s2 = "chr(1)||chr(1)"
    // [\s\S], not '.': RE2's dot excludes newline, which would leave \n
    // unwrapped — garbling the symbol string (and leaking raw chr(1)
    // separators into subword_text) for any multi-line document. Both
    // alternates match per CODE POINT, the engine kernel's symbol unit.
    val wrapChars =
      "regexp_replace(%s, '([\\s\\S])', chr(1) || '\\1' || chr(1), 'g')"
    val train = (1 to rounds).map { i =>
      s"""p$i AS MATERIALIZED (
  SELECT p.l AS l, p.r AS r, SUM(freq) AS n FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      j -> {'l': syms[j], 'r': syms[j + 1]})) AS p
    FROM (SELECT string_split(trim(s, $s1), $s2) AS syms, freq FROM w${i - 1}))
  GROUP BY 1, 2),
t$i AS MATERIALIZED (SELECT l, r FROM p$i ORDER BY n DESC, l, r LIMIT 1),
w$i AS MATERIALIZED (
  SELECT replace(s,
    coalesce((SELECT $s1||l||$s1||$s1||r||$s1 FROM t$i), chr(2)),
    coalesce((SELECT $s1||l||r||$s1 FROM t$i), chr(2))) AS s, freq
  FROM w${i - 1})"""
    }.mkString(",\n")
    val apply = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
  SELECT doc_id, j, replace(s,
    coalesce((SELECT $s1||l||$s1||$s1||r||$s1 FROM t$i), chr(2)),
    coalesce((SELECT $s1||l||r||$s1 FROM t$i), chr(2))) AS s
  FROM d${i - 1})"""
    }.mkString(",\n")
    s"""WITH w0 AS MATERIALIZED (
  SELECT ${wrapChars.format("w")} AS s, COUNT(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM $trainRel t0
        WHERE text IS NOT NULL)
  WHERE w <> ''
  GROUP BY 1),
$train,
dw AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS j
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM $applyRel a0
        WHERE text IS NOT NULL)),
d0 AS MATERIALIZED (
  SELECT doc_id, j, ${wrapChars.format("ws[j]")} AS s
  FROM dw WHERE ws[j] <> ''),
$apply,
agg AS (
  SELECT doc_id, COUNT(*) AS nt,
    SUM(len(string_split(trim(s, $s1), $s2))) AS nsub,
    string_agg(array_to_string(
      string_split(trim(s, $s1), $s2), ' '), ' ' ORDER BY j) AS sub_text
  FROM d$rounds GROUP BY doc_id)"""
  }

  private val bpeSegmentSql: String = bpeChainCtes() + """
SELECT d.doc_id,
  CAST(CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(a.nt, 0) END
    AS BIGINT) AS n_tokens,
  CAST(CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(a.nsub, 0) END
    AS BIGINT) AS n_subwords,
  CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(a.sub_text, '') END
    AS subword_text
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"""

  /** x91 — fertility drift: merges trained on the FROZEN half (even
    * doc_ids), applied to everything, sums split by side (doc_id parity),
    * full-outer pivot with micro-exact ratios and double deltas. */
  private val fertilityDriftSql: String = bpeChainCtes(
    trainRel = "(SELECT * FROM documents WHERE doc_id % 2 = 0)",
    applyRel = "documents") + """,
perdoc AS (
  SELECT d.doc_id % 2 AS side, d.lang, d.source, d.text,
    CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(a.nt, 0) END AS nt,
    CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(a.nsub, 0) END AS nsub
  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
sums AS (
  SELECT side, lang, source, COUNT(text) AS n_docs,
    CAST(SUM(len(text)) AS BIGINT) AS n_chars,
    CAST(SUM(nt) AS BIGINT) AS n_words,
    CAST(SUM(nsub) AS BIGINT) AS n_subwords
  FROM perdoc GROUP BY 1, 2, 3),
rat AS (
  SELECT side, lang, source, n_docs,
    CASE WHEN n_subwords > 0 THEN
      CAST((CAST(2000000 AS HUGEINT) * n_chars + n_subwords)
        // (2 * CAST(n_subwords AS HUGEINT)) AS DOUBLE) / 1000000.0
    END AS cpt,
    CASE WHEN n_words > 0 THEN
      CAST((CAST(2000000 AS HUGEINT) * n_subwords + n_words)
        // (2 * CAST(n_words AS HUGEINT)) AS DOUBLE) / 1000000.0
    END AS tpw
  FROM sums)
SELECT COALESCE(n.lang, r.lang) AS lang,
  COALESCE(n.source, r.source) AS source,
  n.n_docs AS n_docs_new, r.n_docs AS n_docs_ref,
  n.cpt AS chars_per_token_new, r.cpt AS chars_per_token_ref,
  n.cpt - r.cpt AS delta_chars_per_token,
  n.tpw AS tokens_per_word_new, r.tpw AS tokens_per_word_ref,
  n.tpw - r.tpw AS delta_tokens_per_word
FROM (SELECT * FROM rat WHERE side = 1) n
FULL OUTER JOIN (SELECT * FROM rat WHERE side = 0) r
  ON n.lang = r.lang AND n.source = r.source"""

  /** x88 — the x81 chain aggregated per (lang, source): corpus-trained-BPE
    * fertility. Ratios are exact integer half-up micro divisions on the
    * aggregated sums, in HUGEINT (Spark mirrors in DECIMAL(38,0)) — the
    * x78 rational-tie discipline widened past the BIGINT envelope. */
  private val tokenizerFertilitySql: String = bpeChainCtes() + """,
perdoc AS (
  SELECT d.lang, d.source, d.text,
    CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(a.nt, 0) END AS nt,
    CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(a.nsub, 0) END AS nsub
  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
sums AS (
  SELECT lang, source, COUNT(text) AS n_docs,
    CAST(SUM(len(text)) AS BIGINT) AS n_chars,
    CAST(SUM(nt) AS BIGINT) AS n_words,
    CAST(SUM(nsub) AS BIGINT) AS n_subwords
  FROM perdoc GROUP BY 1, 2)
SELECT lang, source, n_docs, n_chars, n_words, n_subwords,
  CASE WHEN n_subwords > 0 THEN
    CAST((CAST(2000000 AS HUGEINT) * n_chars + n_subwords)
      // (2 * CAST(n_subwords AS HUGEINT)) AS DOUBLE) / 1000000.0
  END AS chars_per_token,
  CASE WHEN n_words > 0 THEN
    CAST((CAST(2000000 AS HUGEINT) * n_subwords + n_words)
      // (2 * CAST(n_words AS HUGEINT)) AS DOUBLE) / 1000000.0
  END AS tokens_per_word
FROM sums"""

  /** The ±1 hyperplane matrix `Similarity.hyperplanes(bits=6, dim=64)` uses —
    * replayed from the same fixed-seed java.util.Random stream. */
  private def hyperplaneLiterals(bits: Int, dim: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(bits)(
      Seq.fill(dim)(if (rnd.nextBoolean()) "1" else "-1")
        .mkString("CAST([", ",", "] AS DOUBLE[])"))
  }

  private val cosine =
    "list_dot_product(%A, %B) / (sqrt(list_dot_product(%A, %A)) * sqrt(list_dot_product(%B, %B)))"

  private def cos(a: String, b: String): String =
    cosine.replace("%A", a).replace("%B", b)

  private val langIdSql: String = {
    val hitCols = TextStats.Stopwords.map { case (l, stop) =>
      val lst = stop.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(ws, w -> list_contains([$lst], w))) AS s_$l"
    }.mkString(",\n    ")
    val best = TextStats.Stopwords.map { case (l, _) => s"s_$l" }
      .mkString("greatest(", ", ", ")")
    val pick = TextStats.Stopwords.map { case (l, _) =>
      s"WHEN s_$l = best THEN '$l'"
    }.mkString(" ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
st AS (
  SELECT doc_id,
    $hitCols,
    len(ws) AS n_tokens
  FROM toks),
sb AS (SELECT *, $best AS best FROM st)
SELECT doc_id,
  -- NULL text: every hit count is NULL, the CASE yields NULL, and the
  -- engine's fold-with-'und'-default says UNDETERMINED — coalesce to match
  -- (healthy rows always take a CASE branch, so this touches only NULLs)
  COALESCE(CASE WHEN best <= 0 THEN 'und' $pick END, 'und') AS predicted_lang,
  round(CAST(best AS DOUBLE) / n_tokens, 6) AS stopword_ratio
FROM sb"""
  }

  /** The x9 quality-score CTEs, with optional pass-through columns — shared by
    * every oracle that consumes the quality score, so the formula lives in ONE
    * place (mirroring TextStats.quality's passthrough design). */
  private def qualityPrelude(extraCols: String): String = {
    val en = TextStats.Stopwords.head._2.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, text$extraCols, string_split(text, ' ') AS ws FROM documents),
st AS (
  SELECT doc_id$extraCols, len(ws) AS n_tokens, length(text) AS n_chars,
    len(list_filter(ws, w -> list_contains([$en], w))) AS h
  FROM toks),
q AS (
  SELECT doc_id$extraCols, n_tokens, n_chars,
    round(0.5 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        + 0.5 * least(CAST(h AS DOUBLE) / n_tokens * 4.0, 1.0), 6) AS quality
  FROM st)
"""
  }

  private val qualitySql: String =
    qualityPrelude("") + "SELECT doc_id, n_tokens, n_chars, quality FROM q"

  /** x6 — exact cosine top-k; shared VERBATIM by x96 (same output contract
    * through the bounded topk_pairs aggregate, spec-pinned bit-identical). */
  private val cosineTopKSql: String = s"""WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
base AS (
  SELECT vec_id, CASE WHEN list_dot_product(raw, raw) > 0
         THEN list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw)))
         END AS e
  FROM raw WHERE raw IS NOT NULL
  UNION ALL
  SELECT vec_id, NULL AS e FROM raw WHERE raw IS NULL),
q AS (SELECT vec_id AS qid, e AS qe FROM base WHERE vec_id < ${graft.corpus.Similarity.DefaultTopKQueries}),
pr AS (
  -- NULL-guarded cosine, NOT a pre-filter: the engine KEEPS degenerate
  -- pairs with a NULL cosine (a degenerate query still emits k rows, ranked
  -- by the neighbor_id tiebreak; degenerate corpus vectors rank last and
  -- fall outside top-k) — the guard only dodges DuckDB's NULL-input error
  SELECT qid, vec_id AS neighbor_id,
         CASE WHEN qe IS NULL OR e IS NULL THEN NULL
              ELSE list_dot_product(qe, e) END AS cos
  FROM base CROSS JOIN q WHERE vec_id <> qid)
SELECT qid, neighbor_id, rn AS "rank", round(cos, 6) AS cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rn
  FROM pr)
WHERE rn <= ${graft.corpus.Similarity.DefaultTopK}"""

  private val annLshSql: String = {
    val hp = hyperplaneLiterals(graft.corpus.Similarity.DefaultLshBits,
      graft.corpus.Similarity.DefaultDim)
    // buckets AND cosines from the normalized vectors, mirroring the Spark
    // side's normalize-once design with the identical operation sequence
    val bucket = hp.zipWithIndex.map { case (h, b) =>
      s"(CASE WHEN list_dot_product(e, $h) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
base AS (
  SELECT vec_id, CASE WHEN list_dot_product(raw, raw) > 0
         THEN list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw)))
         END AS e
  FROM raw WHERE raw IS NOT NULL
  UNION ALL
  SELECT vec_id, NULL AS e FROM raw WHERE raw IS NULL),
hb AS (SELECT vec_id, e,
  -- NULL bucket for degenerate vectors (engine lshBucket's NULL propagation):
  -- the bare CASE chain would fall through to bucket 0 and pair them with
  -- real bucket-0 vectors
  CASE WHEN e IS NOT NULL THEN CAST($bucket AS BIGINT) END AS bucket
  FROM base),
pr AS (
  SELECT a.vec_id AS vec_id, a.bucket AS bucket, b.vec_id AS neighbor_id,
         list_dot_product(a.e, b.e) AS cos
  FROM hb a JOIN hb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
SELECT vec_id, bucket, neighbor_id, round(cos, 6) AS cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rn
  FROM pr)
WHERE rn = 1"""
  }

  /** The x28 PII fixture — replays Privacy.syntheticPiiFixture's doc_id
    * arithmetic byte-for-byte, so the redaction hash check sees real matches. */
  private val piiFixtureSql = """WITH fx AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 7 = 0
         THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@data.example.com'
         ELSE '' END
    || CASE WHEN doc_id % 11 = 0
         THEN ' node 10.' || CAST(doc_id % 200 + 1 AS VARCHAR) || '.0.'
              || CAST(doc_id % 250 + 1 AS VARCHAR)
         ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN ' call 555-867-5309' ELSE '' END
    AS text
  FROM documents)
"""

  private val piiScrubSql: String = {
    import graft.corpus.Privacy._
    // DuckDB regexp_replace only replaces the FIRST match without 'g'; counts
    // come from the raw text per pattern, mirroring Privacy.piiScrub
    val redacted = Redactions.foldLeft("text") { case (c, (pat, tag)) =>
      s"regexp_replace($c, '$pat', '$tag', 'g')"
    }
    piiFixtureSql +
      s"""SELECT doc_id,
  len(regexp_extract_all(text, '$EmailPattern')) AS n_emails,
  len(regexp_extract_all(text, '$PhonePattern')) AS n_phones,
  len(regexp_extract_all(text, '$Ipv4Pattern')) AS n_ipv4,
  $redacted AS redacted
FROM fx"""
  }

  // the whitespace class interpolates from Privacy.WhitespaceClass — Java \s
  // and RE2 \s disagree on U+000B, so the shared explicit class is the parity
  // contract (and the % 7 fixture stage makes the check exercise it)
  private val normalizeSql = s"""WITH fx AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN '  ' || text || ' ' ELSE text END AS t0
  FROM documents),
fx2 AS (
  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN upper(t0) ELSE t0 END AS t1
  FROM fx),
fx3 AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0 THEN replace(t1, ' ', '  ') ELSE t1 END AS t2
  FROM fx2),
fx4 AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN t2 || chr(11) || 'vt' ELSE t2 END AS text
  FROM fx3),
n AS (
  SELECT doc_id, text,
    lower(trim(regexp_replace(text, '${graft.corpus.Privacy.WhitespaceClass}+', ' ', 'g'))) AS normalized
  FROM fx4)
SELECT doc_id, normalized,
  length(text) AS n_chars_raw,
  length(normalized) AS n_chars_norm,
  CASE WHEN normalized = text THEN 0 ELSE 1 END AS changed
FROM n"""

  /** x30 — DSIR hashed-bigram importance weights, replaying
    * TextStats.importanceWeights' bucket arithmetic with the SAME target-source
    * list and bucket count. The md5-prefix bucket is rebuilt digit-by-digit
    * (DuckDB has no base-16 conv()); the likelihood ratio is written as the
    * identical double-op sequence, rounded to 8 dp then DECIMAL-summed (x19's
    * order-independence trick). */
  private val dsirSql: String = {
    val buckets = 256
    val targets = TextStats.DsirTargetSources.map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
bg AS (
  SELECT doc_id, source,
    unnest(CASE WHEN len(ws) >= 2
      THEN list_transform(range(len(ws) - 1), i -> ws[i+1] || ' ' || ws[i+2])
      ELSE CAST([] AS VARCHAR[]) END) AS bg
  FROM toks),
occ AS (
  SELECT doc_id, source,
    ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
     + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
     + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
     + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % $buckets AS b
  FROM (SELECT doc_id, source, md5(bg) AS h FROM bg)),
bybucket AS (
  SELECT b, COUNT(*) AS cr,
    SUM(CASE WHEN source IN ($targets) THEN 1 ELSE 0 END) AS ct
  FROM occ GROUP BY 1),
tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM bybucket),
lrt AS (
  SELECT b,
    CAST(round(log10(
      (CAST(ct + 1 AS DOUBLE) / CAST(tt + $buckets AS DOUBLE))
      / (CAST(cr + 1 AS DOUBLE) / CAST(tr + $buckets AS DOUBLE))), 8)
      AS DECIMAL(12,8)) AS lr
  FROM bybucket CROSS JOIN tot)
SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(lr) AS DOUBLE) AS dsir_score
FROM occ JOIN lrt USING (b)
GROUP BY doc_id"""
  }

  /** x31 — sequence packing: exclusive per-source cumulative token sum, then
    * integer div/mod by the SAME budget constant the operator uses. Pure
    * integer arithmetic on both engines — exact by construction. */
  private val packSql: String = {
    val b = graft.corpus.Curation.PackBudget
    s"""WITH t AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
c AS (
  SELECT source, doc_id, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS st
  FROM t)
SELECT source, doc_id, n_tokens,
  CAST(st // $b AS BIGINT) AS seq_id,
  CAST(st % $b AS BIGINT) AS "offset"
FROM c"""
  }

  /** x79 — balanced shard assignment: per-source token-count rank (DESC,
    * NULLS LAST on both engines), snake-folded across ShardCount shards.
    * Pure integer arithmetic below the window — exact by construction. */
  private val shardSql: String = {
    val k = graft.corpus.Curation.ShardCount
    s"""WITH t AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM documents),
r AS (
  SELECT doc_id, source, n_tokens,
    ROW_NUMBER() OVER (PARTITION BY source
      ORDER BY n_tokens DESC, doc_id) - 1 AS rk
  FROM t)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(CASE WHEN (rk // $k) % 2 = 0 THEN rk % $k
            ELSE ${k - 1} - rk % $k END AS BIGINT) AS shard
FROM r"""
  }

  /** x34 — overlapping fixed-window chunking: same ceil-division chunk count
    * and 1-based inclusive list slice as the operator; geometry interpolated
    * from Curation's constants. Pure integer + string ops — exact. */
  private val chunkSql: String = {
    val cs = graft.corpus.Curation.ChunkTokens
    val st = graft.corpus.Curation.ChunkStride
    s"""WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (
  SELECT doc_id, ws, len(ws) AS n,
    CASE WHEN len(ws) <= $cs THEN 1
         ELSE 1 + (len(ws) - $cs + ${st - 1}) // $st END AS n_chunks
  FROM t),
e AS (SELECT doc_id, ws, n, unnest(range(n_chunks)) AS chunk_id FROM c)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
  CAST(chunk_id * $st AS BIGINT) AS start_tok,
  CAST(least($cs, n - chunk_id * $st) AS BIGINT) AS n_chunk_tokens,
  array_to_string(
    ws[chunk_id * $st + 1 : chunk_id * $st + least($cs, n - chunk_id * $st)],
    ' ') AS chunk_text
FROM e"""
  }

  /** x35 — identity-hash split assignment: md5 hex prefixes compare
    * lexicographically == numerically (the x23 parity fact); thresholds
    * interpolated from Curation's constants. */
  private val splitAssignSql: String = {
    val cases = graft.corpus.Curation.SplitThresholds
      .map { case (name, th) => s"WHEN gate < '$th' THEN '$name'" }
      .mkString(" ")
    s"""WITH g AS (
  SELECT doc_id, source, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS gate
  FROM documents)
SELECT doc_id, source, gate,
  CASE $cases ELSE '${graft.corpus.Curation.SplitFallback}' END AS split
FROM g"""
  }

  /** x36 — PMI collocations: the ratio is assembled with the SAME association
    * order as the operator's double expression (IEEE div/mul are exact, so
    * the ln argument is bit-identical; the 6-dp round absorbs any last-ulp
    * `ln` difference between runtimes). Floor and k interpolated from
    * TextStats' constants. */
  private val pmiSql: String = {
    val minC = TextStats.PmiMinPairCount
    val k = TextStats.PmiTopK
    s"""WITH toks AS (SELECT string_split(text, ' ') AS ws FROM documents),
uni AS (SELECT unnest(ws) AS w FROM toks),
cu AS (SELECT w, COUNT(*) AS cu FROM uni GROUP BY 1),
bi AS (
  SELECT ws[i + 1] AS w1, ws[i + 2] AS w2
  FROM (SELECT ws, unnest(range(len(ws) - 1)) AS i FROM toks WHERE len(ws) >= 2)),
c12 AS (SELECT w1, w2, COUNT(*) AS pair_count FROM bi GROUP BY 1, 2),
nu AS (SELECT CAST(SUM(cu) AS DOUBLE) AS n_uni FROM cu),
nb AS (SELECT CAST(SUM(pair_count) AS DOUBLE) AS n_bi FROM c12)
SELECT w1, w2, pair_count,
  round(ln((CAST(pair_count AS DOUBLE) / n_bi) /
           ((CAST(a.cu AS DOUBLE) / n_uni) * (CAST(b.cu AS DOUBLE) / n_uni))),
        6) AS pmi
FROM c12
JOIN cu a ON c12.w1 = a.w
JOIN cu b ON c12.w2 = b.w
CROSS JOIN nu CROSS JOIN nb
WHERE pair_count >= $minC
ORDER BY pmi DESC, w1, w2 LIMIT $k"""
  }

  /** x37 — cross-document duplicated spans: document frequency over
    * position-multiplicity window grams (DISTINCT before the df count, same
    * as the operator); width interpolated from TextDedup's constant. */
  private val crossDocSpansSql: String = {
    val l = graft.corpus.TextDedup.SpanTokens
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
p AS (
  SELECT doc_id, array_to_string(ws[i + 1 : i + $l], ' ') AS g
  FROM (SELECT doc_id, ws, unnest(range(len(ws) - ${l - 1})) AS i
        FROM t WHERE len(ws) >= $l)),
df AS (
  SELECT g, COUNT(*) AS df
  FROM (SELECT DISTINCT doc_id, g FROM p) GROUP BY 1)
SELECT doc_id, COUNT(*) AS n_positions,
  CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_positions,
  round(CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*),
        6) AS dup_span_frac
FROM p JOIN df USING (g)
GROUP BY doc_id"""
  }

  /** x99 — exact-substring duplicate spans: maximal runs of consecutive
    * duplicated window positions (df ≥ 2 over per-doc-distinct grams, the
    * x37 definition) whose covered span reaches ExactSubstrMinTokens;
    * islands-and-gaps via pos − row_number. Width/threshold interpolated
    * from TextDedup's constants. */
  private val exactSubstrSpansSql: String = {
    val l = graft.corpus.TextDedup.SpanTokens
    val m = graft.corpus.TextDedup.ExactSubstrMinTokens
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
p AS (
  SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
         array_to_string(ws[i + 1 : i + $l], ' ') AS g
  FROM (SELECT doc_id, ws, unnest(range(len(ws) - ${l - 1})) AS i
        FROM t WHERE len(ws) >= $l)),
df AS (
  SELECT g, COUNT(*) AS df
  FROM (SELECT DISTINCT doc_id, g FROM p) GROUP BY 1),
dup AS (
  SELECT p.doc_id, p.pos FROM p JOIN df USING (g) WHERE df.df >= 2),
runs AS (
  SELECT doc_id,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp,
         pos
  FROM dup),
spans AS (
  SELECT doc_id, MIN(pos) AS start_pos,
         MAX(pos) - MIN(pos) + $l AS n_span_tokens
  FROM runs GROUP BY doc_id, grp
  HAVING MAX(pos) - MIN(pos) + $l >= $m)
SELECT s.doc_id, s.start_pos, s.n_span_tokens,
  array_to_string(t.ws[CAST(s.start_pos AS BIGINT) :
    CAST(s.start_pos + s.n_span_tokens - 1 AS BIGINT)], ' ') AS span_text
FROM spans s JOIN t USING (doc_id)"""
  }

  /** x100 — increment exact-substring spans: odd-id documents' maximal
    * runs of window positions present in the even-id half's frozen span
    * vocabulary (the x40 split), gated at ExactSubstrMinTokens. */
  private val incrSubstrSpansSql: String = {
    val l = graft.corpus.TextDedup.SpanTokens
    val m = graft.corpus.TextDedup.ExactSubstrMinTokens
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
p AS (
  SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
         array_to_string(ws[i + 1 : i + $l], ' ') AS g
  FROM (SELECT doc_id, ws, unnest(range(len(ws) - ${l - 1})) AS i
        FROM t WHERE len(ws) >= $l)),
vocab AS (SELECT DISTINCT g FROM p WHERE doc_id % 2 = 0),
dup AS (
  SELECT p.doc_id, p.pos FROM p JOIN vocab USING (g) WHERE p.doc_id % 2 = 1),
runs AS (
  SELECT doc_id,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp,
         pos
  FROM dup),
spans AS (
  SELECT doc_id, MIN(pos) AS start_pos,
         MAX(pos) - MIN(pos) + $l AS n_span_tokens
  FROM runs GROUP BY doc_id, grp
  HAVING MAX(pos) - MIN(pos) + $l >= $m)
SELECT s.doc_id, s.start_pos, s.n_span_tokens,
  array_to_string(t.ws[CAST(s.start_pos AS BIGINT) :
    CAST(s.start_pos + s.n_span_tokens - 1 AS BIGINT)], ' ') AS span_text
FROM spans s JOIN t USING (doc_id)"""
  }

  /** x83 — cross-document span scrub: keep-one-copy removal of duplicated
    * `SpanTokens`-token windows (canonical = the gram's minimal doc_id),
    * token positions covered by any removed window dropped, survivors
    * re-joined in order. Width interpolated from TextDedup's constant;
    * NULL text → NULL outputs, fully-covered docs → ''. */
  private val spanScrubSql: String = {
    val l = graft.corpus.TextDedup.SpanTokens
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
p AS (
  SELECT doc_id, i + 1 AS pos, array_to_string(ws[i + 1 : i + $l], ' ') AS g
  FROM (SELECT doc_id, ws, unnest(range(len(ws) - ${l - 1})) AS i
        FROM t WHERE len(ws) >= $l)),
st AS (
  SELECT g, COUNT(*) AS df, MIN(doc_id) AS min_doc
  FROM (SELECT DISTINCT doc_id, g FROM p) GROUP BY 1),
cov AS (
  SELECT DISTINCT p.doc_id, p.pos + su.u AS tp
  FROM p JOIN st USING (g)
  CROSS JOIN (SELECT unnest(range($l)) AS u) su
  WHERE st.df >= 2 AND p.doc_id <> st.min_doc),
toks AS (
  SELECT doc_id, u + 1 AS tp, ws[u + 1] AS tok
  FROM (SELECT doc_id, ws, unnest(range(len(ws))) AS u FROM t)),
k AS (
  SELECT toks.doc_id, string_agg(toks.tok, ' ' ORDER BY toks.tp) AS kept_text,
    COUNT(*) AS n_kept
  FROM toks LEFT JOIN cov ON toks.doc_id = cov.doc_id AND toks.tp = cov.tp
  WHERE cov.tp IS NULL GROUP BY 1)
SELECT t.doc_id,
  CASE WHEN t.ws IS NOT NULL THEN coalesce(k.kept_text, '') END AS scrubbed,
  len(t.ws) AS n_tokens,
  len(t.ws) - coalesce(k.n_kept, 0) AS n_removed
FROM t LEFT JOIN k USING (doc_id)"""
  }

  /** x101 — exact-substring scrub at ExactSubstr length: x83's
    * keep-one-copy coverage gated to maximal duplicated runs covering ≥
    * ExactSubstrMinTokens tokens (x99's islands definition; runs measure
    * over ALL duplicated positions, canonical ones included — only
    * non-canonical occurrences inside a qualifying run are removed). */
  private val spanScrubLongSql: String = {
    val l = graft.corpus.TextDedup.SpanTokens
    val m = graft.corpus.TextDedup.ExactSubstrMinTokens
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
p AS (
  SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
         array_to_string(ws[i + 1 : i + $l], ' ') AS g
  FROM (SELECT doc_id, ws, unnest(range(len(ws) - ${l - 1})) AS i
        FROM t WHERE len(ws) >= $l)),
st AS (
  SELECT g, COUNT(*) AS df, MIN(doc_id) AS min_doc
  FROM (SELECT DISTINCT doc_id, g FROM p) GROUP BY 1),
dup AS (
  SELECT p.doc_id, p.pos, p.doc_id <> st.min_doc AS removable
  FROM p JOIN st USING (g) WHERE st.df >= 2),
runs AS (
  SELECT doc_id,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp,
         pos
  FROM dup),
qr AS (
  SELECT doc_id, MIN(pos) AS a, MAX(pos) AS b
  FROM runs GROUP BY doc_id, grp
  HAVING MAX(pos) - MIN(pos) + $l >= $m),
cov AS (
  SELECT DISTINCT d.doc_id, d.pos + su.u AS tp
  FROM dup d JOIN qr ON d.doc_id = qr.doc_id AND d.pos BETWEEN qr.a AND qr.b
  CROSS JOIN (SELECT unnest(range($l)) AS u) su
  WHERE d.removable),
toks AS (
  SELECT doc_id, u + 1 AS tp, ws[u + 1] AS tok
  FROM (SELECT doc_id, ws, unnest(range(len(ws))) AS u FROM t)),
k AS (
  SELECT toks.doc_id, string_agg(toks.tok, ' ' ORDER BY toks.tp) AS kept_text,
    COUNT(*) AS n_kept
  FROM toks LEFT JOIN cov ON toks.doc_id = cov.doc_id AND toks.tp = cov.tp
  WHERE cov.tp IS NULL GROUP BY 1)
SELECT t.doc_id,
  CASE WHEN t.ws IS NOT NULL THEN coalesce(k.kept_text, '') END AS scrubbed,
  len(t.ws) AS n_tokens,
  len(t.ws) - coalesce(k.n_kept, 0) AS n_removed
FROM t LEFT JOIN k USING (doc_id)"""
  }

  /** x84 — incremental span scrub: the odd-id increment against the even-id
    * reference half's distinct span-gram vocabulary; ANY vocabulary hit is
    * removed (the reference is canonical — no keep-one-copy contest),
    * increment-internal duplicates untouched. */
  private val incrSpanScrubSql: String = {
    val l = graft.corpus.TextDedup.SpanTokens
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE doc_id % 2 = 1),
rg AS (
  SELECT DISTINCT array_to_string(ws[i + 1 : i + $l], ' ') AS g
  FROM (SELECT ws, unnest(range(len(ws) - ${l - 1})) AS i
        FROM (SELECT string_split(text, ' ') AS ws
              FROM documents WHERE doc_id % 2 = 0)
        WHERE len(ws) >= $l)),
p AS (
  SELECT doc_id, i + 1 AS pos, array_to_string(ws[i + 1 : i + $l], ' ') AS g
  FROM (SELECT doc_id, ws, unnest(range(len(ws) - ${l - 1})) AS i
        FROM t WHERE len(ws) >= $l)),
cov AS (
  SELECT DISTINCT p.doc_id, p.pos + su.u AS tp
  FROM p JOIN rg USING (g)
  CROSS JOIN (SELECT unnest(range($l)) AS u) su),
toks AS (
  SELECT doc_id, u + 1 AS tp, ws[u + 1] AS tok
  FROM (SELECT doc_id, ws, unnest(range(len(ws))) AS u FROM t)),
k AS (
  SELECT toks.doc_id, string_agg(toks.tok, ' ' ORDER BY toks.tp) AS kept_text,
    COUNT(*) AS n_kept
  FROM toks LEFT JOIN cov ON toks.doc_id = cov.doc_id AND toks.tp = cov.tp
  WHERE cov.tp IS NULL GROUP BY 1)
SELECT t.doc_id,
  CASE WHEN t.ws IS NOT NULL THEN coalesce(k.kept_text, '') END AS scrubbed,
  len(t.ws) AS n_tokens,
  len(t.ws) - coalesce(k.n_kept, 0) AS n_removed
FROM t LEFT JOIN k USING (doc_id)"""
  }

  /** x102 — incremental exact-substring scrub at ExactSubstr length: x84's
    * vocabulary-hit coverage gated to maximal MATCHED runs covering ≥
    * ExactSubstrMinTokens tokens (x99's islands definition over matched
    * positions; every qualifying matched occurrence is removable — the
    * reference is canonical, no keep-one-copy contest). */
  private val incrScrubLongSql: String = {
    val l = graft.corpus.TextDedup.SpanTokens
    val m = graft.corpus.TextDedup.ExactSubstrMinTokens
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE doc_id % 2 = 1),
rg AS (
  SELECT DISTINCT array_to_string(ws[i + 1 : i + $l], ' ') AS g
  FROM (SELECT ws, unnest(range(len(ws) - ${l - 1})) AS i
        FROM (SELECT string_split(text, ' ') AS ws
              FROM documents WHERE doc_id % 2 = 0)
        WHERE len(ws) >= $l)),
p AS (
  SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
         array_to_string(ws[i + 1 : i + $l], ' ') AS g
  FROM (SELECT doc_id, ws, unnest(range(len(ws) - ${l - 1})) AS i
        FROM t WHERE len(ws) >= $l)),
hit AS (
  SELECT p.doc_id, p.pos FROM p JOIN rg USING (g)),
runs AS (
  SELECT doc_id,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp,
         pos
  FROM hit),
q AS (
  SELECT doc_id, pos,
         MAX(pos) OVER (PARTITION BY doc_id, grp)
           - MIN(pos) OVER (PARTITION BY doc_id, grp) + $l AS n_span
  FROM runs),
cov AS (
  SELECT DISTINCT q.doc_id, q.pos + su.u AS tp
  FROM q CROSS JOIN (SELECT unnest(range($l)) AS u) su
  WHERE q.n_span >= $m),
toks AS (
  SELECT doc_id, u + 1 AS tp, ws[u + 1] AS tok
  FROM (SELECT doc_id, ws, unnest(range(len(ws))) AS u FROM t)),
k AS (
  SELECT toks.doc_id, string_agg(toks.tok, ' ' ORDER BY toks.tp) AS kept_text,
    COUNT(*) AS n_kept
  FROM toks LEFT JOIN cov ON toks.doc_id = cov.doc_id AND toks.tp = cov.tp
  WHERE cov.tp IS NULL GROUP BY 1)
SELECT t.doc_id,
  CASE WHEN t.ws IS NOT NULL THEN coalesce(k.kept_text, '') END AS scrubbed,
  len(t.ws) AS n_tokens,
  len(t.ws) - coalesce(k.n_kept, 0) AS n_removed
FROM t LEFT JOIN k USING (doc_id)"""
  }

  /** x103 — span-level decontamination report: non-benchmark documents'
    * maximal runs of window positions present in the doc_id % 50 == 0
    * benchmark slice's span vocabulary (x22's slice convention), gated at
    * DecontamMinTokens (GPT-3's 13). */
  private val decontamSpansSql: String = {
    val l = graft.corpus.TextDedup.SpanTokens
    val m = graft.corpus.TextDedup.DecontamMinTokens
    val b = graft.corpus.TextDedup.DefaultBenchMod
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE doc_id % $b <> 0),
vocab AS (
  SELECT DISTINCT array_to_string(ws[i + 1 : i + $l], ' ') AS g
  FROM (SELECT ws, unnest(range(len(ws) - ${l - 1})) AS i
        FROM (SELECT string_split(text, ' ') AS ws
              FROM documents WHERE doc_id % $b = 0)
        WHERE len(ws) >= $l)),
p AS (
  SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
         array_to_string(ws[i + 1 : i + $l], ' ') AS g
  FROM (SELECT doc_id, ws, unnest(range(len(ws) - ${l - 1})) AS i
        FROM t WHERE len(ws) >= $l)),
dup AS (
  SELECT p.doc_id, p.pos FROM p JOIN vocab USING (g)),
runs AS (
  SELECT doc_id,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp,
         pos
  FROM dup),
spans AS (
  SELECT doc_id, MIN(pos) AS start_pos,
         MAX(pos) - MIN(pos) + $l AS n_span_tokens
  FROM runs GROUP BY doc_id, grp
  HAVING MAX(pos) - MIN(pos) + $l >= $m)
SELECT s.doc_id, s.start_pos, s.n_span_tokens,
  array_to_string(t.ws[CAST(s.start_pos AS BIGINT) :
    CAST(s.start_pos + s.n_span_tokens - 1 AS BIGINT)], ' ') AS span_text
FROM spans s JOIN t USING (doc_id)"""
  }

  /** x104 — the OPQ rotation kernel under the oracle: three coordinates of
    * `R·x` for the FIXED seeded rotation, each a 64-term dot whose
    * left-to-right fold matches `list_dot_product` op for op (the PqEncode
    * parity discipline); the exact matrix rows interpolate from the same
    * Scala constant the query uses (`Double.toString` round-trips bit-exact),
    * so the two sides cannot drift. NULL / off-dimension vectors yield NULL
    * coordinates, the RotateVector contract. */
  private val rotateEncodeSql: String = {
    val r = graft.corpus.Quantization.fixedRotation()
    def lst(row: Array[Double]): String =
      row.map(_.toString).mkString("[", ", ", "]")
    def coord(row: Array[Double], as: String): String =
      s"""  CASE WHEN embedding IS NOT NULL AND len(embedding) = ${r.length}
    THEN round(list_dot_product(CAST(embedding AS DOUBLE[]),
      ${lst(row)}), 6) END AS $as"""
    s"""SELECT vec_id,
${coord(r(0), "y1")},
${coord(r(31), "y32")},
${coord(r(63), "y64")}
FROM embeddings"""
  }

  /** x38 — per-source length profile; `quantile_cont` == Spark `percentile`
    * (the q11 parity fact), BIGINT casts against DuckDB's HUGEINT widening. */
  private val lengthProfileSql: String =
    """WITH t AS (
  SELECT source, len(string_split(text, ' ')) AS n FROM documents)
SELECT source, COUNT(*) AS n_docs,
  CAST(MIN(n) AS BIGINT) AS min_tokens,
  CAST(MAX(n) AS BIGINT) AS max_tokens,
  quantile_cont(n, 0.25) AS p25_tokens,
  quantile_cont(n, 0.5) AS p50_tokens,
  quantile_cont(n, 0.75) AS p75_tokens,
  CAST(SUM(n) AS BIGINT) AS sum_tokens
FROM t GROUP BY 1"""

  /** x39 — sequence assembly over the x31 packing: `string_agg ... ORDER BY`
    * mirrors the sorted-struct concat; budget interpolated from Curation. */
  private val assembleSql: String = {
    val b = graft.corpus.Curation.PackBudget
    s"""WITH t AS (
  SELECT source, doc_id, text,
    len(string_split(text, ' ')) AS n_tokens FROM documents),
c AS (
  SELECT source, doc_id, text, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS st
  FROM t)
SELECT source, CAST(st // $b AS BIGINT) AS seq_id,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
  -- an all-NULL-text group aggregates to NULL here but to '' in the
  -- engine's concat of collected structs — coalesce to the engine's ''
  COALESCE(string_agg(text, ' ' ORDER BY doc_id), '') AS seq_text
FROM c GROUP BY 1, 2"""
  }

  /** x32 — quality-gate rules, thresholds interpolated from TextStats'
    * constants; `[a-z]` containment reads identically in Java regex and RE2. */
  private val qualityGateSql: String = {
    import TextStats._
    val en = Stopwords.head._2.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
st AS (
  SELECT doc_id, len(ws) AS n_tokens,
    CAST(length(text) AS DOUBLE) / len(ws) AS cpt,
    len(list_filter(ws, w -> list_contains([$en], w))) AS sh,
    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
      / len(ws) AS af
  FROM toks),
fl AS (
  SELECT doc_id, n_tokens,
    CASE WHEN n_tokens >= $GateMinTokens AND n_tokens <= $GateMaxTokens
         THEN 1 ELSE 0 END AS r_len,
    CASE WHEN cpt >= $GateMinCharsPerToken AND cpt <= $GateMaxCharsPerToken
         THEN 1 ELSE 0 END AS r_token_len,
    CASE WHEN sh >= $GateMinStopwordHits THEN 1 ELSE 0 END AS r_stopwords,
    CASE WHEN af >= $GateMinAlphaFrac THEN 1 ELSE 0 END AS r_alpha
  FROM st)
SELECT doc_id, n_tokens, r_len, r_token_len, r_stopwords, r_alpha,
  r_len * r_token_len * r_stopwords * r_alpha AS keep
FROM fl"""
  }

  /** x33 — cross-source overlap over the exact-Jaccard pair set (identical to
    * x3's verified pairs), name-ordered source pairs, order-independent max.
    *
    * RECALL ASSUMPTION (shared with x3): the engine aggregates
    * `TextDedup.minhashPairs` — LSH candidates + exact-Jaccard verify — while
    * this oracle aggregates ALL exact-Jaccard >= 0.8 pairs. Parity therefore
    * depends on the 16-band x 4-row LSH finding every >= 0.8 pair on the
    * fixture corpus; at j = 0.8 the per-pair miss probability is
    * (1 - 0.8^4)^16 ~ 2e-4, and the driver corpus's near-dup pairs are
    * near-identical (j >> 0.8), so in practice recall is 1. If x33 (or x3)
    * ever hash-mismatches HERE FIRST, suspect an LSH-missed borderline pair —
    * diff the two pair sets — before auditing the overlap/banding logic. */
  private val sourceOverlapSql: String = jaccardPrelude +
    s""", fp AS (SELECT doc_id_1, doc_id_2, jaccard FROM jpairs WHERE jaccard >= ${graft.corpus.TextDedup.DefaultJaccardThreshold}),
s AS (SELECT doc_id, source FROM documents)
SELECT least(a.source, b.source) AS source_a,
       greatest(a.source, b.source) AS source_b,
       COUNT(*) AS n_pairs, round(MAX(jaccard), 6) AS max_jaccard
FROM fp JOIN s a ON fp.doc_id_1 = a.doc_id JOIN s b ON fp.doc_id_2 = b.doc_id
GROUP BY 1, 2"""

  /** x40 — incremental dedup over the exact cross-side Jaccard pair set
    * (new = odd doc_ids, old = even). Same LSH-recall assumption as x3/x33 —
    * the engine verifies banded candidates, this oracle enumerates ALL
    * cross-side pairs; parity holds because banding has no false negatives on
    * this corpus (a miss would fail the row compare HERE first). Best match
    * ranked on the ROUNDED similarity with a min-old-id tiebreak, mirroring
    * the engine. */
  private val incrementalDedupSql: String = shinglePrelude +
    s"""szs AS (SELECT doc_id, len(shingles) AS n_shingles FROM sh),
inter AS (
  SELECT a.doc_id AS nid, b.doc_id AS oid, COUNT(*) AS c
  FROM post a JOIN post b ON a.s = b.s
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
  GROUP BY 1, 2),
j AS (
  SELECT nid, oid,
         CAST(c AS DOUBLE) / (x.n_shingles + y.n_shingles - c) AS jaccard
  FROM inter JOIN szs x ON nid = x.doc_id JOIN szs y ON oid = y.doc_id),
f AS (SELECT nid, oid, round(jaccard, 6) AS j FROM j WHERE jaccard >= ${graft.corpus.TextDedup.DefaultJaccardThreshold}),
r AS (
  SELECT nid, oid, j,
    ROW_NUMBER() OVER (PARTITION BY nid ORDER BY j DESC, oid) AS rn,
    COUNT(*) OVER (PARTITION BY nid) AS n_matches
  FROM f)
SELECT nid AS doc_id, oid AS matched_doc_id, j AS jaccard, n_matches
FROM r WHERE rn = 1"""

  /** Normalized-embedding base CTEs shared by the semantic (x42/x44/x45)
    * oracles — the identical normalize-then-dot operation sequence as
    * x6/x12/x13, so the doubles stay bit-equal. The `dot > 0` CASE guard
    * mirrors `Similarity.normalizedBase`'s degenerate-vector contract
    * (zero-norm/empty → e NULL, which loses every contest) — an unguarded
    * x/0 here would yield NaN/NULL elements and break lockstep exactly on
    * the edge the engine guards. */
  private val embBase: String = """raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
base AS (
  SELECT vec_id, CASE WHEN list_dot_product(raw, raw) > 0
         THEN list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw)))
         END AS e
  FROM raw WHERE raw IS NOT NULL
  UNION ALL
  SELECT vec_id, NULL AS e FROM raw WHERE raw IS NULL)"""

  /** k-means CTE chain shared by x44/x45 — geometry, rounding, and iteration
    * count interpolated from [[graft.corpus.Semantic]]'s constants; one
    * assign+recompute CTE block generated per engine round. Centroid means
    * replay the engine's round-then-DECIMAL-sum exactly (round to
    * [[graft.corpus.Semantic.MeanRoundDp]] dp, exact DECIMAL accumulation,
    * divide the identical total as doubles, re-round, re-normalize), so the
    * assignment doubles cannot drift between engines. */
  /** Max-cosine assignment CTE of `baseName` against `centName` (ties to the
    * lowest cid), as `name`. */
  private def assignCte(name: String, baseName: String, centName: String): String =
    s""",
$name AS (
  SELECT vec_id, e, cid, ac FROM (
    SELECT b.vec_id, b.e, c.cid, list_dot_product(b.e, c.ce) AS ac,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.e, c.ce) DESC, c.cid) AS rn
    FROM (SELECT * FROM $baseName WHERE e IS NOT NULL) b
    CROSS JOIN $centName c) WHERE rn = 1
  -- degenerate vectors keep their ROW but assign nowhere (engine:
  -- withBestMatch NULLs the whole struct) — an unguarded all-NULL-cosine
  -- ORDER BY would fall through to the cid tiebreak and "assign" them to
  -- the lowest centroid
  UNION ALL
  SELECT vec_id, e, NULL AS cid, NULL AS ac
  FROM $baseName WHERE e IS NULL)"""

  /** The Lloyd's CTE chain over `baseName` from `cent0Sql` seeds: one
    * assign + decimal-mean recompute block per engine round, ending at
    * `cent<KmeansIters>`. */
  private def lloydChain(baseName: String, cent0Sql: String): String = {
    val dp = graft.corpus.Semantic.MeanRoundDp
    val iters = graft.corpus.Semantic.KmeansIters
    def iterCte(i: Int): String = s""",
a$i AS (
  -- degenerate (NULL-e) vectors contribute no coordinates to any mean
  -- (engine: posexplode of a NULL array emits nothing), so dropping them
  -- here is identity for training — and dodges list_dot_product's
  -- NULL-input error
  SELECT vec_id, e, cid FROM (
    SELECT b.vec_id, b.e, c.cid,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.e, c.ce) DESC, c.cid) AS rn
    FROM (SELECT * FROM $baseName WHERE e IS NOT NULL) b
    CROSS JOIN cent${i - 1} c) WHERE rn = 1),
x$i AS (SELECT cid, e, unnest(range(len(e))) AS p FROM a$i),
s$i AS (
  SELECT cid, p, SUM(CAST(round(e[p+1], $dp) AS DECIMAL(28,12))) AS s,
         COUNT(*) AS n
  FROM x$i GROUP BY 1, 2),
m$i AS (
  SELECT cid, list(round(CAST(s AS DOUBLE)/n, $dp) ORDER BY p) AS m
  FROM s$i GROUP BY 1),
cent$i AS (
  -- zero-norm-mean clusters DROP (engine recompute's nm > 0 filter): an
  -- unguarded renorm would emit NaN centroids that sort greatest
  SELECT cid, list_transform(m, x -> x / sqrt(list_dot_product(m, m))) AS ce
  FROM m$i WHERE list_dot_product(m, m) > 0)"""
    s""",
cent0 AS ($cent0Sql)""" + (1 to iters).map(iterCte).mkString
  }

  private def kmeansPrelude: String = {
    val k = graft.corpus.Semantic.KmeansK
    val iters = graft.corpus.Semantic.KmeansIters
    s"WITH $embBase" +
      lloydChain("base",
        // engine trainOn: degenerate (e-NULL) vectors cannot seed
        s"SELECT vec_id AS cid, e AS ce FROM base WHERE vec_id < $k AND e IS NOT NULL") +
      assignCte("fin", "base", s"cent$iters")
  }

  /** x44 — final k-means assignment after the pinned iteration budget. */
  private def kmeansSql: String = kmeansPrelude +
    "\nSELECT vec_id, cid AS cluster, round(ac, 6) AS cosine FROM fin"

  /** x64 — per-cluster bottom-m assignment cosines with the cluster's size
    * and decimal-mean cosine; degenerate (NULL-cid) rows excluded, the
    * engine's filter mirrored. */
  private def outlierReportSql: String = {
    val m = graft.corpus.Semantic.OutliersPerCluster
    kmeansPrelude + s""",
asg AS (
  SELECT vec_id, cid AS cluster, round(ac, 6) AS cosine
  FROM fin WHERE cid IS NOT NULL),
st AS (
  SELECT cluster, COUNT(*) AS n_members,
         round(CAST(SUM(CAST(cosine AS DECIMAL(10,6))) AS DOUBLE)
               / COUNT(*), 6) AS mean_cosine
  FROM asg GROUP BY 1)
SELECT cluster, vec_id, cosine, rn AS "rank", n_members, mean_cosine,
       round(mean_cosine - cosine, 6) AS gap
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
    ORDER BY cosine, vec_id) AS rn FROM asg)
JOIN st USING (cluster)
WHERE rn <= $m"""
  }

  /** x45 — SemDeDup prune list: within-cluster pairs ≥ τ, each dropped
    * (higher-id) vector reporting its best lower-id keeper. */
  private def semanticDedupSql: String = {
    val tau = graft.corpus.Semantic.SemDedupTau
    kmeansPrelude + s""",
pr AS (
  SELECT b.vec_id AS vec_id, b.cid AS cluster, a.vec_id AS keeper_id,
         list_dot_product(a.e, b.e) AS cos
  FROM fin a JOIN fin b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.e, b.e) >= $tau)
SELECT vec_id, cluster, keeper_id, round(cos, 6) AS cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
    ORDER BY cos DESC, keeper_id) AS rn FROM pr)
WHERE rn = 1"""
  }

  /** x52 — materialized temperature mix: x41's decimal-normalized rate, a
    * hex-prefix integer gate, keep iff gate < floor(rate · 2³²). */
  private def applyMixSql: String = {
    val budget = graft.corpus.Curation.MixApplyBudget
    s"""WITH per AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
w AS (SELECT *, CAST(round(sqrt(n_tokens), 6) AS DECIMAL(18,6)) AS s FROM per),
t AS (SELECT *, SUM(s) OVER () AS tot FROM w),
r AS (
  SELECT source, least(CAST(1.0 AS DOUBLE),
    (CAST(s AS DOUBLE)/CAST(tot AS DOUBLE)) * $budget / n_tokens) AS rate
  FROM t)
SELECT doc_id, source, gate FROM (
  SELECT d.doc_id, d.source, r.rate,
         CAST(('0x' || substr(md5(d.text), 1, 8)) AS BIGINT) AS gate
  FROM documents d JOIN r USING (source))
WHERE gate < CAST(floor(rate * 4294967296.0) AS BIGINT)"""
  }

  /** x48 — per-source boilerplate spans: doc-frequency of distinct
    * `SpanTokens`-token windows within each source, top-`BoilerplateTopK`
    * per source; all three knobs interpolated from the TextDedup constants
    * so the oracle cannot drift from the engine. */
  private def boilerplateSql: String = {
    val l = graft.corpus.TextDedup.SpanTokens
    val k = graft.corpus.TextDedup.BoilerplateTopK
    val minDf = graft.corpus.TextDedup.BoilerplateMinDf
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
p AS (
  SELECT DISTINCT doc_id, source, array_to_string(ws[i + 1 : i + $l], ' ') AS gram
  FROM (SELECT doc_id, source, ws, unnest(range(len(ws) - ${l - 1})) AS i
        FROM t WHERE len(ws) >= $l)),
df AS (SELECT source, gram, COUNT(*) AS n_docs FROM p GROUP BY 1, 2),
tot AS (SELECT source, COUNT(*) AS src_docs FROM documents GROUP BY 1)
SELECT source, gram, n_docs, "rank",
       round(CAST(n_docs AS DOUBLE) / src_docs, 6) AS df_frac
FROM (
  SELECT df.source, gram, n_docs, src_docs,
    ROW_NUMBER() OVER (PARTITION BY df.source
      ORDER BY n_docs DESC, gram) AS "rank"
  FROM df JOIN tot USING (source) WHERE n_docs >= $minDf)
WHERE "rank" <= $k"""
  }

  /** x53 — snapshot diff between the synthetic old (doc_id % 3 != 0) and new
    * (doc_id % 5 != 0, " v2" edit at % 7 == 0) snapshots; identity by
    * doc_id, change by md5 digest, attribution to the NEW side's source. */
  private val snapshotDiffSql: String =
    """WITH o AS (
  SELECT doc_id, source, md5(text) AS dg,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
  FROM documents WHERE doc_id % 3 <> 0),
n AS (
  SELECT doc_id, source, md5(t) AS dg,
    CAST(len(string_split(t, ' ')) AS BIGINT) AS nt
  FROM (SELECT doc_id, source,
          CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS t
        FROM documents WHERE doc_id % 5 <> 0))
SELECT COALESCE(n.source, o.source) AS source,
  CAST(SUM(CASE WHEN o.dg IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
  CAST(SUM(CASE WHEN n.dg IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  CAST(SUM(CASE WHEN o.dg IS NOT NULL AND n.dg IS NOT NULL AND o.dg <> n.dg
    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
  CAST(SUM(CASE WHEN o.dg = n.dg THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
  CAST(SUM(COALESCE(n.nt, 0)) - SUM(COALESCE(o.nt, 0)) AS BIGINT) AS token_delta
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
GROUP BY 1"""

  /** x54 — n-gram novelty of the odd-id increment vs the even-id reference
    * vocabulary; shingle geometry from shinglePrelude (n=3, distinct per
    * doc), matching TextDedup.noveltyScore. */
  private val noveltySql: String = shinglePrelude +
    """ref AS (SELECT DISTINCT s FROM post WHERE doc_id % 2 = 0),
np AS (SELECT doc_id, s FROM post WHERE doc_id % 2 = 1)
SELECT np.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
  CAST(SUM(CASE WHEN ref.s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
  round(CAST(SUM(CASE WHEN ref.s IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / COUNT(*), 6) AS novelty
FROM np LEFT JOIN ref ON np.s = ref.s
GROUP BY 1"""

  /** x55 — source token-share concentration: exact BIGINT counts, shares as
    * doubles, per-term 12-dp round + DECIMAL sum (x19's order-independence
    * pattern) for hhi and entropy. */
  private val concentrationSql: String =
    """WITH per AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS nt
  FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(nt) AS BIGINT) AS tot FROM per),
sh AS (SELECT CAST(nt AS DOUBLE) / CAST(tot AS DOUBLE) AS share
       FROM per CROSS JOIN tot)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
  round(MAX(share), 6) AS top_share,
  round(CAST(SUM(CAST(round(share * share, 12) AS DECIMAL(28,12))) AS DOUBLE),
        6) AS hhi,
  round(CAST(SUM(CAST(round(0 - share * log2(share), 12) AS DECIMAL(28,12)))
    AS DOUBLE), 6) AS entropy_bits
FROM sh"""

  /** x56 — per-source unigram JSD between x53's snapshots; per-token terms
    * assembled in the operator's association order, 12-dp rounded per side,
    * DECIMAL-summed. */
  private val unigramDriftSql: String =
    """WITH o0 AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE doc_id % 3 <> 0),
n0 AS (
  SELECT source, unnest(string_split(
    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END, ' ')) AS w
  FROM documents WHERE doc_id % 5 <> 0),
ocnt AS (SELECT source, w, COUNT(*) AS oc FROM o0 GROUP BY 1, 2),
ncnt AS (SELECT source, w, COUNT(*) AS nc FROM n0 GROUP BY 1, 2),
j AS (
  SELECT COALESCE(ocnt.source, ncnt.source) AS source,
    COALESCE(ocnt.oc, 0) AS oc, COALESCE(ncnt.nc, 0) AS nc
  FROM ocnt FULL OUTER JOIN ncnt
    ON ocnt.source = ncnt.source AND ocnt.w = ncnt.w),
ot0 AS (SELECT source, CAST(SUM(oc) AS BIGINT) AS ot FROM ocnt GROUP BY 1),
nt0 AS (SELECT source, CAST(SUM(nc) AS BIGINT) AS nt FROM ncnt GROUP BY 1),
tot AS (
  SELECT COALESCE(ot0.source, nt0.source) AS source,
    COALESCE(ot, 0) AS ot, COALESCE(nt, 0) AS nt
  FROM ot0 FULL OUTER JOIN nt0 ON ot0.source = nt0.source),
t AS (
  SELECT j.source, ot, nt, oc, nc,
    CASE WHEN nt > 0 THEN CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE) ELSE 0 END AS p,
    CASE WHEN ot > 0 THEN CAST(oc AS DOUBLE) / CAST(ot AS DOUBLE) ELSE 0 END AS q
  FROM j JOIN tot ON j.source = tot.source)
SELECT source, MAX(ot) AS n_tokens_old, MAX(nt) AS n_tokens_new,
  CAST(SUM(CASE WHEN oc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_old,
  CAST(SUM(CASE WHEN nc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_new,
  round(CAST(SUM(CAST(
      (CASE WHEN p > 0 THEN round(0.5 * (p * log2((2.0 * p) / (p + q))), 12)
            ELSE 0 END)
    + (CASE WHEN q > 0 THEN round(0.5 * (q * log2((2.0 * q) / (q + p))), 12)
            ELSE 0 END)
    AS DECIMAL(28,12))) AS DOUBLE), 6) AS jsd_bits
FROM t GROUP BY 1"""

  /** x57 — per-label embedding drift between the x53-convention snapshot
    * memberships; 9-dp round + DECIMAL means per dimension, 12-dp round +
    * DECIMAL sums for the displacement/cosine terms, mirroring
    * Profiling.embeddingDrift's association order. Presence is decided by
    * the count tables with the metric terms joined LEFT (the engine's
    * shape): probe label -1 — vec_id % 11 == 0, old side emptied — has no
    * term rows at all and must still surface as dim 0 vs 64 with NULL
    * metrics, pinning the loud gate in the parity run. */
  private val embeddingDriftSql: String =
    """WITH raw AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
olds AS (
  SELECT label, raw FROM raw WHERE vec_id % 3 <> 0
  UNION ALL
  SELECT -1 AS label, CAST([] AS DOUBLE[]) AS raw FROM raw
  WHERE vec_id % 3 <> 0 AND vec_id % 11 = 0),
news AS (
  SELECT label, raw FROM raw WHERE vec_id % 5 <> 0
  UNION ALL
  SELECT -1 AS label, raw FROM raw
  WHERE vec_id % 5 <> 0 AND vec_id % 11 = 0),
om AS (
  SELECT label, i AS d,
    CAST(SUM(CAST(round(raw[i + 1], 9) AS DECIMAL(28,9))) AS DOUBLE)
      / COUNT(*) AS om
  FROM olds, unnest(range(len(raw))) AS t(i) GROUP BY 1, 2),
nm AS (
  SELECT label, i AS d,
    CAST(SUM(CAST(round(raw[i + 1], 9) AS DECIMAL(28,9))) AS DOUBLE)
      / COUNT(*) AS nm
  FROM news, unnest(range(len(raw))) AS t(i) GROUP BY 1, 2),
oc AS (SELECT label, COUNT(*) AS n_old, CAST(MAX(len(raw)) AS BIGINT) AS dim_old
       FROM olds GROUP BY 1),
nc AS (SELECT label, COUNT(*) AS n_new, CAST(MAX(len(raw)) AS BIGINT) AS dim_new
       FROM news GROUP BY 1),
terms AS (
  SELECT om.label,
    round((nm - om) * (nm - om), 12) AS sq,
    round(om * nm, 12) AS pp, round(om * om, 12) AS oo,
    round(nm * nm, 12) AS nn
  FROM om JOIN nm ON om.label = nm.label AND om.d = nm.d),
agg AS (
  SELECT label,
    CAST(SUM(CAST(sq AS DECIMAL(28,12))) AS DOUBLE) AS sumsq,
    CAST(SUM(CAST(pp AS DECIMAL(28,12))) AS DOUBLE) AS sp,
    CAST(SUM(CAST(oo AS DECIMAL(28,12))) AS DOUBLE) AS so,
    CAST(SUM(CAST(nn AS DECIMAL(28,12))) AS DOUBLE) AS sn
  FROM terms GROUP BY 1)
SELECT oc.label, oc.n_old, nc.n_new, oc.dim_old, nc.dim_new,
  CASE WHEN dim_old = dim_new THEN round(sqrt(sumsq), 6) END AS mean_shift,
  CASE WHEN dim_old = dim_new AND so > 0 AND sn > 0
    THEN round(sp / (sqrt(so) * sqrt(sn)), 6) END AS cos_means
FROM oc JOIN nc ON oc.label = nc.label
LEFT JOIN agg ON oc.label = agg.label"""

  /** x22 + x59 — benchmark decontamination (both plans produce the identical
    * exact answer; x59 merely bloom-gates the postings first). */
  private def decontaminationSql: String = {
    val m = graft.corpus.TextDedup.DefaultBenchMod
    shinglePrelude +
      s"""bench AS (SELECT DISTINCT s FROM post WHERE doc_id % $m = 0),
hits AS (
  SELECT doc_id, COUNT(*) AS n_contaminated
  FROM post JOIN bench USING (s) WHERE doc_id % $m <> 0 GROUP BY 1),
szs AS (
  SELECT doc_id, len(shingles) AS n_shingles FROM sh WHERE doc_id % $m <> 0)
SELECT hits.doc_id, n_shingles, n_contaminated,
  round(CAST(n_contaminated AS DOUBLE) / n_shingles, 6) AS contaminated_frac
FROM hits JOIN szs ON hits.doc_id = szs.doc_id"""
  }

  /** The x106/x107/x108 URL fixture + normalization prelude — replays
    * `Curation.urlFixture`'s doc_id arithmetic and `Curation.normalizeUrl`'s
    * policy byte-for-byte (the tracking regex and multi-label suffix list
    * interpolate from the SAME Scala constants the engine compiles, so the
    * two sides cannot drift). Ends with a `norm` CTE exposing
    * (doc_id, url, url_norm, domain). */
  /** The canonicalization chain over any `(doc_id, url)` relation —
    * CTE names suffixed so one query can run it twice (x115 normalizes
    * the declared-canonical effective URL beside the fixture's). */
  private def urlNormChain(src: String, sfx: String): String = {
    val trk = graft.corpus.Curation.TrackingParamPattern
    val suf = graft.corpus.Curation.MultiLabelSuffixes
      .map(s => s"'$s'").mkString(", ")
    s""",
n0$sfx AS (
  SELECT doc_id, url,
    regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS scheme_raw,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)', 1) AS rest
  FROM $src),
n1$sfx AS (
  SELECT doc_id, url, scheme_raw, rest,
    regexp_extract(rest, '^([^/?]*)', 1) AS auth
  FROM n0$sfx),
n2$sfx AS (
  SELECT doc_id, url, scheme_raw, auth,
    regexp_extract(substr(rest, length(auth) + 1), '^([^?]*)', 1) AS pth,
    CASE WHEN length(substr(rest, length(auth) + 1)) >
           length(regexp_extract(substr(rest, length(auth) + 1),
             '^([^?]*)', 1))
      THEN substr(substr(rest, length(auth) + 1),
        length(regexp_extract(substr(rest, length(auth) + 1),
          '^([^?]*)', 1)) + 2)
      ELSE '' END AS query
  FROM n1$sfx),
n3$sfx AS (
  SELECT doc_id, url, pth, query,
    lower(scheme_raw) AS scheme,
    regexp_replace(lower(regexp_extract(auth, '^([^:]*)', 1)),
      '^www\\.', '') AS host,
    regexp_extract(auth, ':([0-9]+)$$', 1) AS port,
    (scheme_raw <> '' AND
     regexp_replace(lower(regexp_extract(auth, '^([^:]*)', 1)),
       '^www\\.', '') <> '' AND
     regexp_matches(auth, '^[^:@]*(:[0-9]*)?$$')) AS valid
  FROM n2$sfx),
n4$sfx AS (
  SELECT doc_id, url, scheme, host, port, valid,
    (port = '' OR (scheme = 'http' AND port = '80')
       OR (scheme = 'https' AND port = '443')) AS dropport,
    regexp_replace(pth, '/+$$', '') AS npath,
    COALESCE(array_to_string(list_filter(string_split(query, '&'),
      p -> p <> '' AND NOT regexp_matches(p, '$trk')), '&'), '') AS keptq,
    string_split(host, '.') AS hl
  FROM n3$sfx),
norm$sfx AS (
  SELECT doc_id, url,
    CASE WHEN valid THEN
      scheme || '://' || host
      || (CASE WHEN dropport THEN '' ELSE ':' || port END)
      || npath
      || (CASE WHEN keptq = '' THEN '' ELSE '?' || keptq END)
    END AS url_norm,
    CASE WHEN valid THEN
      (CASE WHEN len(hl) <= 1 THEN host
            WHEN len(hl) >= 3 AND list_contains([$suf],
                hl[-2] || '.' || hl[-1])
              THEN hl[-3] || '.' || hl[-2] || '.' || hl[-1]
            ELSE hl[-2] || '.' || hl[-1] END)
    END AS domain
  FROM n4$sfx)
"""
  }

  private def urlNormPrelude: String =
    urlFixtureCte + urlNormChain("fx", "")

  private def urlFixtureCte: String = {
    s"""WITH p0 AS (SELECT doc_id, doc_id % 125 AS k FROM documents),
p1 AS (
  SELECT doc_id, k,
    CASE WHEN k % 2 = 0 THEN 'https' ELSE 'http' END AS sb,
    CASE WHEN k % 10 = 9 THEN ':8080' ELSE '' END AS cport,
    CASE WHEN k % 11 = 0 THEN ''
         ELSE '/p/' || CAST(k % 12 AS VARCHAR) END AS pth,
    CASE WHEN k % 3 = 0 THEN 'id=' || CAST(k % 50 AS VARCHAR)
         WHEN k % 3 = 1 THEN 'a=1&b=' || CAST(k % 7 AS VARCHAR)
         ELSE '' END AS keptq,
    CASE WHEN doc_id % 4 = 0 THEN 'utm_source=feed' ELSE '' END AS tpre,
    CASE WHEN doc_id % 4 = 1 THEN 'fbclid=abc&utm_campaign=x'
         WHEN doc_id % 4 = 3 THEN 'gclid=g1' ELSE '' END AS tpost
  FROM p0),
fx AS (
  SELECT doc_id,
    CASE WHEN k = 124 THEN 'not a url' ELSE
      (CASE WHEN doc_id % 4 < 2 THEN sb ELSE upper(sb) END)
      || '://'
      || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.'
               WHEN doc_id % 3 = 1 THEN 'www.' ELSE '' END)
      || (CASE WHEN k % 4 = 0 THEN 'm.' ELSE '' END)
      || 'Brand' || CAST(k % 23 AS VARCHAR)
      || (CASE WHEN k % 5 = 0 THEN '.CO.UK'
               WHEN k % 5 = 1 THEN '.com.au' ELSE '.COM' END)
      || cport
      || (CASE WHEN cport = '' AND doc_id % 5 = 0
            THEN (CASE WHEN sb = 'https' THEN ':443' ELSE ':80' END)
            ELSE '' END)
      || pth
      || (CASE WHEN doc_id % 5 = 2 AND pth <> '' THEN '/' ELSE '' END)
      || (CASE WHEN COALESCE(array_to_string(list_filter(
              [tpre, keptq, tpost], p -> p <> ''), '&'), '') = '' THEN ''
            ELSE '?' || array_to_string(list_filter(
              [tpre, keptq, tpost], p -> p <> ''), '&') END)
      || (CASE WHEN doc_id % 3 = 2
            THEN '#sec' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END)
    END AS url
  FROM p1)
"""
  }

  /** x106 — URL normalization: the fixture + policy prelude projected. */
  private def urlNormalizeSql: String =
    urlNormPrelude + "SELECT doc_id, url, url_norm, domain FROM norm"

  /** x107 — canonical-URL exact dedup: keep-min over url_norm groups,
    * malformed (NULL url_norm) excluded — no identity key to collide on. */
  private def urlDedupSql: String =
    urlNormPrelude +
      """SELECT url_norm, MIN(doc_id) AS canonical_doc_id,
  COUNT(*) AS n_copies
FROM norm WHERE url_norm IS NOT NULL GROUP BY 1"""

  /** x108 — domain gate dispositions against the shared blocklist constant
    * (empty allowlist — `unlisted` is spec-pinned, never emitted here). */
  private def domainGateSql: String = {
    val bl = graft.corpus.Curation.DefaultDomainBlocklist
      .map(s => s"'$s'").mkString(", ")
    urlNormPrelude +
      s"""SELECT doc_id, url, domain,
  CASE WHEN domain IS NULL THEN 'malformed'
       WHEN domain IN ($bl) THEN 'blocked'
       ELSE 'allowed' END AS disposition
FROM norm"""
  }

  /** x112 — incremental canonical-URL dedup: odd-id increment probed
    * against the even-id reference half's frozen url index, with classes
    * `(doc_id % 125) % 10 == 3` withheld from the reference (the
    * engineered misses — absent rows pin the unknown-URL branch). */
  private def incrUrlDedupSql: String =
    urlNormPrelude +
      """SELECT n.doc_id, n.url_norm, r.canonical_doc_id
FROM (SELECT doc_id, url_norm FROM norm
      WHERE doc_id % 2 = 1 AND url_norm IS NOT NULL) n
JOIN (SELECT url_norm, MIN(doc_id) AS canonical_doc_id FROM norm
      WHERE doc_id % 2 = 0 AND (doc_id % 125) % 10 <> 3
        AND url_norm IS NOT NULL GROUP BY 1) r
  USING (url_norm)"""

  /** The x110/x111 HTML fixture — replays `Html.htmlFixture` byte-for-byte
    * (paragraph re-chunking, script/style/comment plants, the entity
    * paragraph, nav/single-quoted/relative links with the urlFixture
    * Brand/tld branch values). Ends with a `hfx` CTE of (doc_id, html). */
  private val htmlFixturePrelude: String =
    """WITH hb AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
hp AS (
  SELECT doc_id,
    array_to_string(list_transform(range(CAST(ceil(len(ws) / 7.0) AS INT)),
      i -> '<p class="c' || CAST(i % 3 AS VARCHAR) || '">'
        || array_to_string(ws[i * 7 + 1 : i * 7 + 7], ' ') || '</p>'),
      '') AS paras,
    array_to_string(list_transform(range(CAST(doc_id % 3 + 1 AS INT)),
      i -> '<a '
        || (CASE WHEN (doc_id * 3 + i) % 11 = 5 THEN 'HREF'
                 ELSE 'href' END)
        || '="'
        || (CASE WHEN (doc_id * 3 + i) % 11 = 5
              THEN upper(CASE WHEN (doc_id * 3 + i) % 2 = 0
                THEN 'https' ELSE 'http' END)
              ELSE (CASE WHEN (doc_id * 3 + i) % 2 = 0
                THEN 'https' ELSE 'http' END) END)
        || '://'
        || (CASE WHEN (doc_id * 3 + i) % 3 = 0 THEN 'www.' ELSE '' END)
        || 'Brand' || CAST((doc_id * 3 + i) % 23 AS VARCHAR)
        || (CASE WHEN (doc_id * 3 + i) % 5 = 0 THEN '.CO.UK'
                 WHEN (doc_id * 3 + i) % 5 = 1 THEN '.com.au'
                 ELSE '.COM' END)
        || '/l/' || CAST((doc_id * 3 + i) % 9 AS VARCHAR)
        || (CASE WHEN (doc_id * 3 + i) % 4 = 0 THEN '?utm_source=nav'
                 WHEN (doc_id * 3 + i) % 4 = 2
                   THEN '?id=' || CAST((doc_id * 3 + i) % 7 AS VARCHAR)
                 ELSE '' END)
        || (CASE WHEN (doc_id * 3 + i) % 3 = 1 THEN '#f' ELSE '' END)
        || '">more ' || CAST(i AS VARCHAR) || '</a>'), '') AS nav
  FROM hb),
hfx AS (
  SELECT doc_id,
    '<html'
    || (CASE WHEN doc_id % 9 = 0 THEN ' lang="en"'
             WHEN doc_id % 9 = 1 THEN ' LANG="EN-US"'
             WHEN doc_id % 9 = 2 THEN ' lang=''fr'''
             WHEN doc_id % 9 = 3 THEN ' lang="pt-BR"'
             WHEN doc_id % 9 = 4 THEN ' class="x" lang="de"'
             ELSE '' END)
    || '><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title>'
    || (CASE WHEN doc_id % 3 = 0
          THEN '<style>.c0 { color: #111; }</style>' ELSE '' END)
    || (CASE WHEN doc_id % 2 = 0
          THEN '<script type="text/javascript">if (1 < 2) { track("d'
            || CAST(doc_id AS VARCHAR) || '"); }</script>' ELSE '' END)
    || (CASE WHEN doc_id % 6 = 2
          THEN '<meta name="robots" content="noindex, follow">'
          WHEN doc_id % 6 = 5
          THEN '<META CONTENT="NOFOLLOW" NAME="ROBOTS">'
          ELSE '' END)
    || (CASE WHEN doc_id % 21 = 9
          THEN '<link rel="canonical" href="/c/rel">'
          WHEN doc_id % 9 = 6
          THEN '<link href="https://brandc'
            || CAST(((doc_id % 125) // 2) % 23 AS VARCHAR) || '.com/c/'
            || CAST(((doc_id % 125) // 2) % 5 AS VARCHAR)
            || '" rel=''canonical''>'
          WHEN doc_id % 3 = 0
          THEN '<link rel="canonical" href="https://brandc'
            || CAST(((doc_id % 125) // 2) % 23 AS VARCHAR) || '.com/c/'
            || CAST(((doc_id % 125) // 2) % 5 AS VARCHAR) || '">'
          ELSE '' END)
    || '</head><body>'
    || (CASE WHEN doc_id % 4 = 1
          THEN '<!-- hidden <a href="https://evil.example/x">spam</a> -->'
          ELSE '' END)
    || '<nav>' || nav
    || (CASE WHEN doc_id % 7 = 0
          THEN '<a href=''http://Brand' || CAST(doc_id % 23 AS VARCHAR)
            || '.COM/s''>q</a>' ELSE '' END)
    || (CASE WHEN doc_id % 8 = 3
          THEN '<a href="https://Brand' || CAST(doc_id % 23 AS VARCHAR)
            || '.COM/t/' || CAST(doc_id % 6 AS VARCHAR)
            || '"><b>Great &amp; cheap</b> deal '
            || CAST(doc_id % 4 AS VARCHAR) || '</a>' ELSE '' END)
    || '</nav>' || paras
    || (CASE WHEN doc_id % 5 = 0
          THEN '<p>Tom &amp; Jerry say &quot;hi&quot; &lt;here&gt;&nbsp;&#39;now&#39; &amp;lt;twice&amp;gt;</p>'
          ELSE '' END)
    || '<a href="/local/' || CAST(doc_id % 5 AS VARCHAR)
    || '">rel</a></body></html>' AS html
  FROM hp)
"""

  /** x110 — HTML → text extraction: the fixture + the six-stage policy
    * (comments, script blocks, style blocks, tags, the entity subset in
    * order with `&amp;` last, whitespace collapse + trim), each stage its
    * own CTE mirroring the engine's staged columns. */
  private def htmlExtractSql: String =
    htmlFixturePrelude +
      """, he0 AS (SELECT doc_id, html,
    regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g') AS t FROM hfx),
he1 AS (SELECT doc_id, html,
    regexp_replace(t, '(?is)<script\b[^>]*>.*?</script>', ' ', 'g') AS t
  FROM he0),
he2 AS (SELECT doc_id, html,
    regexp_replace(t, '(?is)<style\b[^>]*>.*?</style>', ' ', 'g') AS t
  FROM he1),
he3 AS (SELECT doc_id, html,
    regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM he2),
he4 AS (SELECT doc_id, html,
    replace(replace(replace(replace(replace(replace(t,
      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      '&nbsp;', ' '), '&amp;', '&') AS t FROM he3),
he5 AS (SELECT doc_id, html,
    trim(regexp_replace(t, '[ \t\n\r]+', ' ', 'g')) AS t FROM he4)
SELECT doc_id, t AS text, length(html) AS html_len, length(t) AS text_len
FROM he5"""

  /** x111 — domain-level web-graph edges: src domains from the URL
    * fixture's normalization chain (`norm`), dst domains from each
    * extracted absolute outlink (comment-strip first, both quote styles,
    * case-insensitive), host-only normalization for the dst side (the
    * registrable domain depends on scheme validity and the canonical host
    * alone — path/port/query stages canonically irrelevant). */
  private def domainEdgesChain: String = {
    val suf = graft.corpus.Curation.MultiLabelSuffixes
      .map(s => s"'$s'").mkString(", ")
    "WITH " + htmlFixturePrelude.stripPrefix("WITH ").stripSuffix("\n") +
      ",\n" + urlNormPrelude.stripPrefix("WITH ") +
      s""", lnc AS (SELECT doc_id,
    regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g') AS nc FROM hfx),
lraw AS (
  SELECT doc_id, unnest(list_concat(
    regexp_extract_all(nc,
      '(?i)href[ \\t\\n\\r]*=[ \\t\\n\\r]*"(https?://[^"]*)"', 1),
    regexp_extract_all(nc,
      '(?i)href[ \\t\\n\\r]*=[ \\t\\n\\r]*''(https?://[^'']*)''', 1)))
    AS lurl
  FROM lnc),
l0 AS (SELECT doc_id,
    regexp_extract(lurl, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS scheme_raw,
    regexp_replace(lower(regexp_extract(regexp_extract(
      regexp_extract(lurl, '^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)', 1),
      '^([^/?]*)', 1), '^([^:]*)', 1)), '^www\\.', '') AS host
  FROM lraw),
l1 AS (SELECT doc_id,
    CASE WHEN scheme_raw <> '' AND host <> '' THEN
      (CASE WHEN len(hl) <= 1 THEN host
            WHEN len(hl) >= 3 AND list_contains([$suf],
                hl[-2] || '.' || hl[-1])
              THEN hl[-3] || '.' || hl[-2] || '.' || hl[-1]
            ELSE hl[-2] || '.' || hl[-1] END)
    END AS dst_domain
  FROM (SELECT doc_id, scheme_raw, host, string_split(host, '.') AS hl
        FROM l0)),
gedges AS (
  SELECT n.domain AS src_domain, l.dst_domain, COUNT(*) AS n_links
  FROM l1 l JOIN norm n USING (doc_id)
  WHERE n.domain IS NOT NULL AND l.dst_domain IS NOT NULL
  GROUP BY 1, 2)
"""
  }

  private def domainEdgesSql: String =
    domainEdgesChain + "SELECT src_domain, dst_domain, n_links FROM gedges"

  /** x113 — weighted domain PageRank, damping 0.85, the fixed iteration
    * count unrolled (one CTE per round, interpolated from the SAME
    * `WebGraph.PageRankIters`/`PageRankScale` constants the engine
    * compiles). All arithmetic integer micro-units: `//` here and `DIV`
    * there truncate identically on non-negative operands, BIGINT sums are
    * order-free — the fixed point is exact on both engines. */
  /** One unrolled PageRank round per k: `<p>k` reads `<p>(k-1)` (or the
    * given init CTE at k = 1) over the named edge/nodes/outw/base CTEs —
    * shared by the cold (x113) and warm-start (x116) generators. */
  private def pageRankRounds(p: String, edges: String, nodes: String,
      outw: String, base: String, init: String, iters: Int): String =
    (1 to iters).map { k =>
      val prev = if (k == 1) init else s"$p${k - 1}"
      s"""$p$k AS (
  SELECT $nodes.domain,
    CAST(b + (85 * COALESCE(s.cin, 0)) // 100 AS BIGINT) AS rank_micro
  FROM $nodes CROSS JOIN $base LEFT JOIN (
    SELECT e.dst_domain, SUM((r.rank_micro * e.n_links) // o.out_w) AS cin
    FROM $edges e
    JOIN $prev r ON e.src_domain = r.domain
    JOIN $outw o ON e.src_domain = o.src_domain
    GROUP BY 1) s ON s.dst_domain = $nodes.domain)"""
    }.mkString(",\n")

  /** The node/count/out-weight/base(/uniform-init) CTE block for one edge
    * relation, names prefixed — shared by x113 and both of x116's graphs
    * (the warm query's full graph skips the unused `r0` init: its round
    * starts from `winit`). */
  private def pageRankBase(p: String, edges: String,
      withInit: Boolean = true): String = {
    val scale = graft.corpus.WebGraph.PageRankScale
    s"""${p}nodes AS (
  SELECT DISTINCT domain FROM (
    SELECT src_domain AS domain FROM $edges
    UNION ALL SELECT dst_domain FROM $edges)),
${p}n AS (SELECT COUNT(*) AS n FROM ${p}nodes),
${p}outw AS (SELECT src_domain, CAST(SUM(n_links) AS BIGINT) AS out_w
  FROM $edges GROUP BY 1),
${p}base AS (SELECT (($scale // n) * 15) // 100 AS b FROM ${p}n)""" +
      (if (withInit) s""",
${p}r0 AS (SELECT domain, CAST($scale // n AS BIGINT) AS rank_micro
  FROM ${p}nodes CROSS JOIN ${p}n)""" else "")
  }

  private def domainPageRankSql: String = {
    val iters = graft.corpus.WebGraph.PageRankIters
    domainEdgesChain + ", " + pageRankBase("g", "gedges") + ",\n" +
      pageRankRounds("gr", "gedges", "gnodes", "goutw", "gbase", "gr0",
        iters) +
      s"\nSELECT domain, rank_micro FROM gr$iters"
  }

  /** x116 — warm-start PageRank: the previous snapshot is the fixture
    * graph with every edge touching a `brandc` domain withheld (the
    * declared-canonical targets — a DOC split cannot starve the fallback,
    * any large doc subset covers every fixture domain), ranked cold; then
    * ONE round over the FULL graph starting from those ranks, the
    * withheld domains entering at the full graph's uniform share — the
    * COALESCE fallback fires for dozens of domains under the hash. */
  private def warmPageRankSql: String = {
    val scale = graft.corpus.WebGraph.PageRankScale
    val iters = graft.corpus.WebGraph.PageRankIters
    domainEdgesChain +
      """, gedges_p AS (
  SELECT src_domain, dst_domain, n_links FROM gedges
  WHERE src_domain NOT LIKE 'brandc%' AND dst_domain NOT LIKE 'brandc%'),
""" + pageRankBase("e", "gedges_p") + ",\n" +
      pageRankRounds("er", "gedges_p", "enodes", "eoutw", "ebase", "er0",
        iters) + ",\n" +
      pageRankBase("g", "gedges", withInit = false) + s""",
winit AS (
  SELECT gnodes.domain,
    COALESCE(er$iters.rank_micro, CAST($scale // n AS BIGINT))
      AS rank_micro
  FROM gnodes CROSS JOIN gn
  LEFT JOIN er$iters ON er$iters.domain = gnodes.domain),
""" + pageRankRounds("wr", "gedges", "gnodes", "goutw", "gbase", "winit",
        1) +
      "\nSELECT domain, rank_micro FROM wr1"
  }

  /** x114 — meta-robots gate: both attribute-order patterns over the
    * comment-stripped fixture, name-first wins, directives split on
    * commas and trimmed, `none` implies both verdicts. */
  private def robotsGateSql: String =
    htmlFixturePrelude + """, rb0 AS (SELECT doc_id,
    regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g') AS nc FROM hfx),
rb1 AS (SELECT doc_id,
    regexp_extract(nc, '(?i)<meta\b[^>]*name[ \t\n\r]*=[ \t\n\r]*["'']robots["''][^>]*content[ \t\n\r]*=[ \t\n\r]*"([^"]*)"', 1) AS c1,
    regexp_extract(nc, '(?i)<meta\b[^>]*content[ \t\n\r]*=[ \t\n\r]*"([^"]*)"[^>]*name[ \t\n\r]*=[ \t\n\r]*["'']robots["'']', 1) AS c2
  FROM rb0),
rb2 AS (SELECT doc_id,
    list_transform(string_split(lower(
      CASE WHEN c1 <> '' THEN c1 ELSE c2 END), ','), d -> trim(d)) AS dirs
  FROM rb1)
SELECT doc_id,
  (list_contains(dirs, 'noindex') OR list_contains(dirs, 'none')) AS noindex,
  (list_contains(dirs, 'nofollow') OR list_contains(dirs, 'none')) AS nofollow
FROM rb2"""

  /** x115 — declared-canonical dedup: both link attribute orders, an
    * absolute declared target wins over the fetch URL, relative declared
    * falls back; the effective URL runs the SAME normalization chain and
    * the dedup groups on it (keep-min + declared census). */
  private def canonicalDedupSql: String =
    "WITH " + htmlFixturePrelude.stripPrefix("WITH ").stripSuffix("\n") +
      ",\n" + urlFixtureCte.stripPrefix("WITH ") +
      """, cl0 AS (SELECT f.doc_id, f.url,
    regexp_replace(h.html, '(?s)<!--.*?-->', ' ', 'g') AS nc
  FROM fx f JOIN hfx h USING (doc_id)),
cl1 AS (SELECT doc_id, url,
    regexp_extract(nc, '(?i)<link\b[^>]*rel[ \t\n\r]*=[ \t\n\r]*["'']canonical["''][^>]*href[ \t\n\r]*=[ \t\n\r]*"([^"]*)"', 1) AS r1,
    regexp_extract(nc, '(?i)<link\b[^>]*href[ \t\n\r]*=[ \t\n\r]*"([^"]*)"[^>]*rel[ \t\n\r]*=[ \t\n\r]*["'']canonical["'']', 1) AS r2
  FROM cl0),
cl2 AS (SELECT doc_id, url,
    CASE WHEN r1 <> '' THEN r1 ELSE r2 END AS decl FROM cl1),
ceff AS (SELECT doc_id,
    CASE WHEN regexp_matches(decl, '^(?i)https?://') THEN decl
         ELSE url END AS url,
    CASE WHEN regexp_matches(decl, '^(?i)https?://') THEN 1
         ELSE 0 END AS declared
  FROM cl2)""" +
      urlNormChain("ceff", "_c") +
      """SELECT n.url_norm AS canonical_key,
  MIN(n.doc_id) AS canonical_doc_id,
  COUNT(*) AS n_copies,
  CAST(SUM(c.declared) AS BIGINT) AS n_declared
FROM norm_c n JOIN ceff c USING (doc_id)
WHERE n.url_norm IS NOT NULL
GROUP BY 1"""

  /** x117 — robots.txt crawl gate: the per-domain robots fixture replayed
    * byte-for-byte (brand number `b` + tld class `t` drive every branch),
    * the RFC 9309-subset parse (comment strip, token capture, consecutive
    * UA lines share a group via the lag/sum window, agent groups beat `*`,
    * orphan rules join no group), and the longest-match / allow-wins-tie
    * verdict as one `2·len + isAllow` key maximum — the same arithmetic
    * the engine's array_max struct computes. */
  /** The robots fixture + RFC 9309-subset rule-selection chain over the
    * `norm` CTE, ending with `rsel` (domain, rtype, rpath) — shared by
    * the x117 gate and the x124 scorecard's rule census. */
  private def robotsRulesChain: String = {
    val agent = graft.corpus.Robots.CrawlerAgent.toLowerCase
    raw""", rdom AS (SELECT DISTINCT domain FROM norm WHERE domain IS NOT NULL),
rbm AS (SELECT domain,
    CAST(regexp_extract(domain, '^brand([0-9]+)\.', 1) AS BIGINT) AS b,
    CASE WHEN domain LIKE '%.co.uk' THEN 0
         WHEN domain LIKE '%.com.au' THEN 1 ELSE 2 END AS t
  FROM rdom),
rtxt AS (SELECT domain,
    '# robots brand' || CAST(b AS VARCHAR) || ' t' || CAST(t AS VARCHAR)
    || CASE WHEN b % 3 = 0 THEN chr(10) || 'Sitemap: https://' || domain
         || '/sitemap.xml' ELSE '' END
    || CASE WHEN b % 10 = 7 THEN chr(10) || 'Disallow: /' ELSE '' END
    || chr(10) || chr(10) || 'User-agent: OtherBot'
    || chr(10) || 'Disallow: /'
    || CASE WHEN b % 8 = 1 THEN chr(10) || 'SITEMAP: https://cdn'
         || CAST((b + 2) % 23 AS VARCHAR) || '.example/sm.xml # mirror'
         ELSE '' END
    || chr(10) || chr(10) || 'User-agent: *'
    || CASE WHEN b % 2 = 0 THEN chr(10) || 'Disallow: /p/1' ELSE '' END
    || CASE WHEN b % 4 = 0 THEN chr(10) || 'Allow: /p/11' ELSE '' END
    || CASE WHEN b % 5 = 1 THEN chr(10) || 'Disallow: /p/2'
         || chr(10) || 'Allow: /p/2' ELSE '' END
    || CASE WHEN b % 3 = 1 THEN chr(10) || 'DISALLOW: /p/7' ELSE '' END
    || CASE WHEN b % 6 = 2 THEN chr(10) || 'Disallow:' ELSE '' END
    || CASE WHEN t = 1 THEN chr(10) || 'Disallow: /' ELSE '' END
    || CASE WHEN b % 11 = 6
         THEN chr(10) || 'Disallow: /p/4 # trailing' ELSE '' END
    || CASE WHEN b % 6 = 0 THEN chr(10) || chr(10) || 'User-agent: *'
         || chr(10) || 'Disallow: /p/3' ELSE '' END
    || CASE WHEN b % 4 = 1 THEN chr(10) || chr(10)
         || (CASE WHEN b % 8 = 5 THEN 'User-Agent: GraftBot'
                  ELSE 'User-agent: graftbot' END)
         || (CASE WHEN t = 2 THEN chr(10) || 'Allow: /p/' ELSE '' END)
         || chr(10) || 'Disallow: /p/5' ELSE '' END
    || CASE WHEN b % 9 = 4 THEN chr(10) || chr(10) || 'User-agent: graftbot'
         || chr(10) || 'User-agent: otherbot'
         || chr(10) || 'Disallow: /p/9' ELSE '' END
    || CASE WHEN b % 12 = 5 THEN chr(10) || 'Sitemap: /sitemap.xml'
         ELSE '' END
    AS robots_txt
  FROM rbm WHERE b % 7 <> 3),
rls AS (SELECT domain, string_split(robots_txt, chr(10)) AS ls FROM rtxt),
rl0 AS (SELECT domain, unnest(range(len(ls))) AS pos, unnest(ls) AS raw
  FROM rls),
rl1 AS (SELECT domain, pos,
    lower(regexp_extract(regexp_replace(raw, '#.*', '', 'g'),
      '(?i)^[ \t]*user-agent[ \t]*:[ \t]*([^ \t]*)', 1)) AS ua,
    regexp_extract(regexp_replace(raw, '#.*', '', 'g'),
      '(?i)^[ \t]*allow[ \t]*:[ \t]*([^ \t]*)', 1) AS al,
    regexp_extract(regexp_replace(raw, '#.*', '', 'g'),
      '(?i)^[ \t]*disallow[ \t]*:[ \t]*([^ \t]*)', 1) AS di
  FROM rl0),
rl2 AS (SELECT domain, pos, ua, al, di, (ua <> '') AS isua,
    ((ua <> '') AND NOT COALESCE(
      lag(ua <> '') OVER (PARTITION BY domain ORDER BY pos), false)) AS newg
  FROM rl1),
rl3 AS (SELECT domain, pos, ua, al, di, isua,
    SUM(CASE WHEN newg THEN 1 ELSE 0 END)
      OVER (PARTITION BY domain ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
  FROM rl2),
ruas AS (SELECT domain, gid, ua FROM rl3 WHERE isua),
rrules AS (SELECT domain, gid,
    CASE WHEN al <> '' THEN 'allow' ELSE 'disallow' END AS rtype,
    CASE WHEN al <> '' THEN al ELSE di END AS rpath
  FROM rl3 WHERE al <> '' OR di <> ''),
rgh AS (SELECT domain, gid,
    MAX(CASE WHEN ua = '$agent' THEN 1 ELSE 0 END) AS is_agent,
    MAX(CASE WHEN ua = '*' THEN 1 ELSE 0 END) AS is_star
  FROM ruas GROUP BY 1, 2),
rdf AS (SELECT domain, MAX(is_agent) AS has_agent FROM rgh GROUP BY 1),
rsel AS (SELECT r.domain, r.rtype, r.rpath
  FROM rrules r JOIN rgh g ON r.domain = g.domain AND r.gid = g.gid
  JOIN rdf d ON r.domain = d.domain
  WHERE (d.has_agent = 1 AND g.is_agent = 1)
     OR (d.has_agent = 0 AND g.is_star = 1))"""
  }

  private def robotsTxtGateSql: String =
    urlNormPrelude + robotsRulesChain +
      raw""", rpq AS (SELECT doc_id, url, domain,
    CASE WHEN url_norm IS NULL THEN NULL
         WHEN pq0 LIKE '/%' THEN pq0 ELSE '/' || pq0 END AS pq
  FROM (SELECT doc_id, url, domain, url_norm,
          regexp_extract(url_norm, '^[^:/?#]+://[^/?]*(.*)$$', 1) AS pq0
        FROM norm)),
rcand AS (SELECT n.doc_id,
    length(r.rpath) * 2 + CASE WHEN r.rtype = 'allow' THEN 1 ELSE 0 END
      AS rk,
    r.rpath
  FROM rpq n JOIN rsel r USING (domain)
  WHERE starts_with(n.pq, r.rpath)),
rbest AS (SELECT doc_id, MAX(rk) AS mk, arg_max(rpath, rk) AS mr
  FROM rcand GROUP BY 1)
SELECT n.doc_id, n.url, n.domain,
  CASE WHEN n.domain IS NULL THEN 'malformed'
       WHEN b.mk IS NULL THEN 'allowed'
       WHEN b.mk % 2 = 1 THEN 'allowed' ELSE 'blocked' END
    AS robots_disposition,
  CASE WHEN n.domain IS NULL OR b.mk IS NULL THEN '' ELSE b.mr END
    AS matched_rule
FROM rpq n LEFT JOIN rbest b USING (doc_id)"""

  /** x118 — anchor-text aggregation: comment-stripped fixture pages,
    * both anchor quote styles extracted with positional link/text zip,
    * the anchor text run through the content stages (inner tag strip,
    * the entity subset in order, lowercase, whitespace collapse), terms
    * split on spaces, targeted by registrable domain (the x111
    * host-only chain — the fixture's links are well-formed by
    * construction). The chain form (everything after `hfx`, ending with
    * the aggregated `aterms` CTE) is shared with the x124 scorecard. */
  private def anchorTermsChain: String = {
    val suf = graft.corpus.Curation.MultiLabelSuffixes
      .map(s => s"'$s'").mkString(", ")
    raw""", anc0 AS (SELECT doc_id,
    regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g') AS nc FROM hfx),
apairs AS (
  SELECT doc_id,
    unnest(regexp_extract_all(nc,
      '(?is)<a\b[^>]*href[ \t\n\r]*=[ \t\n\r]*"(https?://[^"]*)"[^>]*>(.*?)</a>', 1)) AS lurl,
    unnest(regexp_extract_all(nc,
      '(?is)<a\b[^>]*href[ \t\n\r]*=[ \t\n\r]*"(https?://[^"]*)"[^>]*>(.*?)</a>', 2)) AS atext
  FROM anc0
  UNION ALL
  SELECT doc_id,
    unnest(regexp_extract_all(nc,
      '(?is)<a\b[^>]*href[ \t\n\r]*=[ \t\n\r]*''(https?://[^'']*)''[^>]*>(.*?)</a>', 1)),
    unnest(regexp_extract_all(nc,
      '(?is)<a\b[^>]*href[ \t\n\r]*=[ \t\n\r]*''(https?://[^'']*)''[^>]*>(.*?)</a>', 2))
  FROM anc0),
aproc AS (SELECT doc_id, lurl,
    lower(trim(regexp_replace(
      replace(replace(replace(replace(replace(replace(
        regexp_replace(atext, '<[^>]*>', ' ', 'g'),
        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        '&nbsp;', ' '), '&amp;', '&'),
      '[ \t\n\r]+', ' ', 'g'))) AS t
  FROM apairs),
a0 AS (SELECT doc_id, t,
    regexp_extract(lurl, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS scheme_raw,
    regexp_replace(lower(regexp_extract(regexp_extract(
      regexp_extract(lurl, '^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)', 1),
      '^([^/?]*)', 1), '^([^:]*)', 1)), '^www\.', '') AS host
  FROM aproc),
a1 AS (SELECT doc_id, t,
    CASE WHEN scheme_raw <> '' AND host <> '' THEN
      (CASE WHEN len(hl) <= 1 THEN host
            WHEN len(hl) >= 3 AND list_contains([$suf],
                hl[-2] || '.' || hl[-1])
              THEN hl[-3] || '.' || hl[-2] || '.' || hl[-1]
            ELSE hl[-2] || '.' || hl[-1] END)
    END AS dst_domain
  FROM (SELECT doc_id, t, scheme_raw, host, string_split(host, '.') AS hl
        FROM a0)),
aterm AS (SELECT doc_id, dst_domain, unnest(string_split(t, ' ')) AS term
  FROM a1 WHERE dst_domain IS NOT NULL),
aterms AS (SELECT dst_domain, term, COUNT(*) AS n_mentions,
    COUNT(DISTINCT doc_id) AS n_pages
  FROM aterm WHERE term <> ''
  GROUP BY 1, 2)"""
  }

  private def anchorTermsSql: String =
    htmlFixturePrelude + anchorTermsChain +
      "\nSELECT dst_domain, term, n_mentions, n_pages FROM aterms"

  /** x119 — crawl-frontier scheduling: candidates from the outlink raw
    * list (`lraw`) through the FULL normalization chain (the engine
    * canonicalizes frontier targets with normalizeUrl, strict authority
    * included), deduped and anti-joined against the fetch-URL set; the
    * rank snapshot is the brandc-withheld graph (x116's convention), so
    * brandc candidates take the uniform share — the fallback is under
    * the hash. Politeness slots + the budget cut use the same strict
    * total order `(rank DESC, url_norm)` as the engine. */
  private def crawlFrontierSql: String = {
    val scale = graft.corpus.WebGraph.PageRankScale
    val iters = graft.corpus.WebGraph.PageRankIters
    val cap = graft.corpus.WebGraph.FrontierPerDomainCap
    val budget = graft.corpus.WebGraph.FrontierBudget
    domainEdgesChain +
      """, gedges_p AS (
  SELECT src_domain, dst_domain, n_links FROM gedges
  WHERE src_domain NOT LIKE 'brandc%' AND dst_domain NOT LIKE 'brandc%'),
""" + pageRankBase("e", "gedges_p") + ",\n" +
      pageRankRounds("er", "gedges_p", "enodes", "eoutw", "ebase", "er0",
        iters) +
      ",\nclnk AS (SELECT doc_id, lurl AS url FROM lraw)" +
      urlNormChain("clnk", "_f") +
      s""", fcand AS (SELECT url_norm, MIN(domain) AS domain
  FROM norm_f WHERE url_norm IS NOT NULL GROUP BY 1),
ffetch AS (SELECT DISTINCT url_norm FROM norm WHERE url_norm IS NOT NULL),
fnew AS (SELECT c.url_norm, c.domain FROM fcand c
  LEFT JOIN ffetch f USING (url_norm) WHERE f.url_norm IS NULL),
fsc AS (SELECT c.url_norm, c.domain,
    COALESCE(r.rank_micro, CAST($scale // n AS BIGINT)) AS rank_micro
  FROM fnew c CROSS JOIN en
  LEFT JOIN er$iters r ON r.domain = c.domain),
fslot AS (SELECT url_norm, domain, rank_micro,
    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY url_norm) AS slot
  FROM fsc)
SELECT url_norm, domain, CAST(rank_micro AS BIGINT) AS rank_micro,
  CAST(slot AS BIGINT) AS slot
FROM fslot WHERE slot <= $cap
ORDER BY rank_micro DESC, url_norm
LIMIT $budget"""
  }

  /** x120 — per-domain degree/reciprocity profile over the fixture web
    * graph: out/in distinct-partner and weight aggregates, self-loop
    * weight, and the (src,dst)=(dst,src) reciprocity join, assembled
    * over the full node list with zero fills. */
  private def degreeProfileSql: String =
    domainEdgesChain +
      """, dout AS (SELECT src_domain AS domain,
    COUNT(DISTINCT dst_domain) AS out_domains,
    CAST(SUM(n_links) AS BIGINT) AS out_w
  FROM gedges GROUP BY 1),
din AS (SELECT dst_domain AS domain,
    COUNT(DISTINCT src_domain) AS in_domains,
    CAST(SUM(n_links) AS BIGINT) AS in_w
  FROM gedges GROUP BY 1),
dself AS (SELECT src_domain AS domain,
    CAST(SUM(n_links) AS BIGINT) AS self_w
  FROM gedges WHERE src_domain = dst_domain GROUP BY 1),
drec AS (SELECT e1.src_domain AS domain,
    COUNT(DISTINCT e1.dst_domain) AS recip_domains
  FROM gedges e1 JOIN gedges e2
    ON e1.src_domain = e2.dst_domain AND e1.dst_domain = e2.src_domain
  WHERE e1.src_domain <> e1.dst_domain GROUP BY 1),
dnode AS (SELECT DISTINCT domain FROM (
  SELECT src_domain AS domain FROM gedges
  UNION ALL SELECT dst_domain FROM gedges))
SELECT n.domain,
  CAST(COALESCE(o.out_domains, 0) AS BIGINT) AS out_domains,
  CAST(COALESCE(i.in_domains, 0) AS BIGINT) AS in_domains,
  CAST(COALESCE(o.out_w, 0) AS BIGINT) AS out_w,
  CAST(COALESCE(i.in_w, 0) AS BIGINT) AS in_w,
  CAST(COALESCE(s.self_w, 0) AS BIGINT) AS self_w,
  CAST(COALESCE(r.recip_domains, 0) AS BIGINT) AS recip_domains
FROM dnode n
LEFT JOIN dout o USING (domain)
LEFT JOIN din i USING (domain)
LEFT JOIN dself s USING (domain)
LEFT JOIN drec r USING (domain)"""

  /** x124 — the per-domain scorecard: every shared chain composed once
    * (edges, anchor terms, robots rules, the unrolled PageRank) plus the
    * census, degree, rule-count, and top-anchor aggregates, assembled
    * over the rank∪census domain base with zero-filled counts and
    * NULL-preserved identities. The top anchor mirrors the engine's
    * `max(struct(n_mentions, term))` as a (mentions DESC, term DESC)
    * row-number — same maximum, same tie-break. */
  private def domainScorecardSql: String = {
    val iters = graft.corpus.WebGraph.PageRankIters
    domainEdgesChain + anchorTermsChain + robotsRulesChain +
      ", " + pageRankBase("g", "gedges") + ",\n" +
      pageRankRounds("gr", "gedges", "gnodes", "goutw", "gbase", "gr0",
        iters) +
      s""",
scen AS (SELECT domain, COUNT(*) AS n_pages,
    COUNT(DISTINCT url_norm) AS n_urls
  FROM norm WHERE domain IS NOT NULL GROUP BY 1),
sdout AS (SELECT src_domain AS domain,
    COUNT(DISTINCT dst_domain) AS out_domains FROM gedges GROUP BY 1),
sdin AS (SELECT dst_domain AS domain,
    COUNT(DISTINCT src_domain) AS in_domains FROM gedges GROUP BY 1),
sdrec AS (SELECT e1.src_domain AS domain,
    COUNT(DISTINCT e1.dst_domain) AS recip_domains
  FROM gedges e1 JOIN gedges e2
    ON e1.src_domain = e2.dst_domain AND e1.dst_domain = e2.src_domain
  WHERE e1.src_domain <> e1.dst_domain GROUP BY 1),
satop AS (SELECT dst_domain AS domain, term AS top_anchor_term,
    n_mentions AS top_anchor_mentions
  FROM (SELECT dst_domain, term, n_mentions,
      ROW_NUMBER() OVER (PARTITION BY dst_domain
        ORDER BY n_mentions DESC, term DESC) AS rn
    FROM aterms) WHERE rn = 1),
srcnt AS (SELECT domain, COUNT(*) AS n_robots_rules
  FROM rsel GROUP BY 1),
sbase AS (SELECT DISTINCT domain FROM (
  SELECT domain FROM gr$iters UNION ALL SELECT domain FROM scen))
SELECT b.domain,
  CAST(COALESCE(c.n_pages, 0) AS BIGINT) AS n_pages,
  CAST(COALESCE(c.n_urls, 0) AS BIGINT) AS n_urls,
  r.rank_micro,
  CAST(COALESCE(o.out_domains, 0) AS BIGINT) AS out_domains,
  CAST(COALESCE(i.in_domains, 0) AS BIGINT) AS in_domains,
  CAST(COALESCE(rc.recip_domains, 0) AS BIGINT) AS recip_domains,
  CAST(COALESCE(rr.n_robots_rules, 0) AS BIGINT) AS n_robots_rules,
  a.top_anchor_term,
  CAST(a.top_anchor_mentions AS BIGINT) AS top_anchor_mentions
FROM sbase b
LEFT JOIN scen c USING (domain)
LEFT JOIN gr$iters r USING (domain)
LEFT JOIN sdout o USING (domain)
LEFT JOIN sdin i USING (domain)
LEFT JOIN sdrec rc USING (domain)
LEFT JOIN srcnt rr USING (domain)
LEFT JOIN satop a USING (domain)"""
  }

  /** x121 — content blocks by link density: the fixture pages split at
    * the shared BlockTagPattern (both engines keep empty segments, so
    * block_idx aligns), per-block anchor-text extraction, both texts
    * through the content stages, and the integer min-words/max-density
    * verdict interpolated from the shared Html constants. */
  private def contentBlocksSql: String = {
    val pat = graft.corpus.Html.BlockTagPattern
    val minW = graft.corpus.Html.ContentMinWords
    val pct = graft.corpus.Html.ContentMaxLinkDensityPct
    htmlFixturePrelude +
      raw""", cb0 AS (SELECT doc_id,
    regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g') AS t FROM hfx),
cb1 AS (SELECT doc_id,
    regexp_replace(t, '(?is)<script\b[^>]*>.*?</script>', ' ', 'g') AS t
  FROM cb0),
cb2 AS (SELECT doc_id,
    regexp_replace(t, '(?is)<style\b[^>]*>.*?</style>', ' ', 'g') AS t
  FROM cb1),
cbs AS (SELECT doc_id, string_split_regex(t, '$pat') AS segs FROM cb2),
cb3 AS (SELECT doc_id, unnest(range(len(segs))) AS block_idx,
    unnest(segs) AS seg FROM cbs),
cb4 AS (SELECT doc_id, block_idx, seg,
    COALESCE(array_to_string(regexp_extract_all(seg,
      '(?is)<a\b[^>]*>(.*?)</a>', 1), ' '), '') AS atxt
  FROM cb3),
cb5 AS (SELECT doc_id, block_idx,
    trim(regexp_replace(
      replace(replace(replace(replace(replace(replace(
        regexp_replace(seg, '<[^>]*>', ' ', 'g'),
        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        '&nbsp;', ' '), '&amp;', '&'),
      '[ \t\n\r]+', ' ', 'g')) AS txt,
    trim(regexp_replace(
      replace(replace(replace(replace(replace(replace(
        regexp_replace(atxt, '<[^>]*>', ' ', 'g'),
        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        '&nbsp;', ' '), '&amp;', '&'),
      '[ \t\n\r]+', ' ', 'g')) AS atx
  FROM cb4),
cb6 AS (SELECT doc_id, block_idx, txt,
    len(list_filter(string_split(txt, ' '), w -> w <> '')) AS n_words,
    len(list_filter(string_split(atx, ' '), w -> w <> ''))
      AS n_anchor_words
  FROM cb5)
SELECT doc_id, block_idx, CAST(n_words AS BIGINT) AS n_words,
  CAST(n_anchor_words AS BIGINT) AS n_anchor_words,
  (n_words >= $minW AND n_anchor_words * 100 <= $pct * n_words)
    AS is_content,
  txt AS text
FROM cb6 WHERE txt <> ''"""
  }

  /** x122 — declared page language: the `<html lang>` attribute (both
    * quote styles, double-quoted wins, whitespace-before-name so
    * `xml:lang`/`data-lang` never read), trimmed verbatim plus the
    * lowercased primary subtag, NULL when nothing declared. */
  private def declaredLangSql: String =
    htmlFixturePrelude +
      raw""", lg0 AS (SELECT doc_id,
    regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g') AS nc FROM hfx),
lg1 AS (SELECT doc_id,
    regexp_extract(nc,
      '(?is)<html\b[^>]*[ \t\n\r]lang[ \t\n\r]*=[ \t\n\r]*"([^"]*)"', 1)
      AS c1,
    regexp_extract(nc,
      '(?is)<html\b[^>]*[ \t\n\r]lang[ \t\n\r]*=[ \t\n\r]*''([^'']*)''', 1)
      AS c2
  FROM lg0),
lg2 AS (SELECT doc_id,
    trim(CASE WHEN c1 <> '' THEN c1 ELSE c2 END) AS lang_attr FROM lg1)
SELECT doc_id, lang_attr,
  CASE WHEN lang_attr = '' THEN NULL
       ELSE lower(regexp_extract(lang_attr, '^([A-Za-z0-9]+)', 1)) END
    AS lang_primary
FROM lg2"""

  /** x123 — URL shape features + the word gate: path/query split off the
    * canonical form, integer counts, the OR-chain over the shared
    * DefaultUrlBlockWords constant (NULL through for malformed rows on
    * both engines — FALSE OR NULL is NULL). */
  private def urlFeaturesSql: String = {
    val words = graft.corpus.Curation.DefaultUrlBlockWords
      .map(w => s"contains(lower(url_norm), '$w')").mkString(" OR ")
    urlNormPrelude +
      raw""", uf0 AS (SELECT doc_id, url_norm,
    regexp_extract(url_norm, '^[^:/?#]+://[^/?]*([^?]*)', 1) AS pth,
    regexp_extract(url_norm, '^[^?]*\?(.*)$$', 1) AS q
  FROM norm)
SELECT doc_id, url_norm,
  CAST(len(list_filter(string_split(pth, '/'), s -> s <> '')) AS BIGINT)
    AS path_depth,
  CAST(length(pth) AS BIGINT) AS path_chars,
  CAST(length(pth) - length(regexp_replace(pth, '[0-9]', '', 'g'))
    AS BIGINT) AS path_digits,
  CAST(len(list_filter(string_split(q, '&'), s -> s <> '')) AS BIGINT)
    AS n_params,
  CASE WHEN url_norm IS NULL THEN 'malformed'
       WHEN $words THEN 'flagged' ELSE 'clean' END AS url_flag
FROM uf0"""
  }

  /** The `Curation.fixtureUrl` constructor, parameterized: consumes a
    * relation `src` with `(doc_id, kk, dd)` — core class and decoration
    * seed — and ends with a `ug$sfx` CTE of `(doc_id, url)`. The
    * urlFixtureCte body with `kk`/`dd` in place of `doc_id % 125` /
    * `doc_id` (the x126 redirect fixture mints its TARGETS with a
    * shifted decoration seed in the same URL space). */
  private def urlGenCtes(src: String, sfx: String): String =
    raw""",
ug0$sfx AS (SELECT doc_id, kk, dd,
    CASE WHEN kk % 2 = 0 THEN 'https' ELSE 'http' END AS sb,
    CASE WHEN kk % 10 = 9 THEN ':8080' ELSE '' END AS cport,
    CASE WHEN kk % 11 = 0 THEN ''
         ELSE '/p/' || CAST(kk % 12 AS VARCHAR) END AS pth,
    CASE WHEN kk % 3 = 0 THEN 'id=' || CAST(kk % 50 AS VARCHAR)
         WHEN kk % 3 = 1 THEN 'a=1&b=' || CAST(kk % 7 AS VARCHAR)
         ELSE '' END AS keptq,
    CASE WHEN dd % 4 = 0 THEN 'utm_source=feed' ELSE '' END AS tpre,
    CASE WHEN dd % 4 = 1 THEN 'fbclid=abc&utm_campaign=x'
         WHEN dd % 4 = 3 THEN 'gclid=g1' ELSE '' END AS tpost
  FROM $src),
ug$sfx AS (SELECT doc_id,
    CASE WHEN kk = 124 THEN 'not a url' ELSE
      (CASE WHEN dd % 4 < 2 THEN sb ELSE upper(sb) END)
      || '://'
      || (CASE WHEN dd % 3 = 0 THEN 'WWW.'
               WHEN dd % 3 = 1 THEN 'www.' ELSE '' END)
      || (CASE WHEN kk % 4 = 0 THEN 'm.' ELSE '' END)
      || 'Brand' || CAST(kk % 23 AS VARCHAR)
      || (CASE WHEN kk % 5 = 0 THEN '.CO.UK'
               WHEN kk % 5 = 1 THEN '.com.au' ELSE '.COM' END)
      || cport
      || (CASE WHEN cport = '' AND dd % 5 = 0
            THEN (CASE WHEN sb = 'https' THEN ':443' ELSE ':80' END)
            ELSE '' END)
      || pth
      || (CASE WHEN dd % 5 = 2 AND pth <> '' THEN '/' ELSE '' END)
      || (CASE WHEN COALESCE(array_to_string(list_filter(
              [tpre, keptq, tpost], p -> p <> ''), '&'), '') = '' THEN ''
            ELSE '?' || array_to_string(list_filter(
              [tpre, keptq, tpost], p -> p <> ''), '&') END)
      || (CASE WHEN dd % 3 = 2
            THEN '#sec' || CAST(dd % 4 AS VARCHAR) ELSE '' END)
    END AS url
  FROM ug0$sfx)
"""

  /** x125 — sitemap URL discovery: the per-domain XML fixture replayed
    * byte-for-byte (entry list via list_transform over the same
    * `b + i` keys, decoration/order/metadata branches identical), blocks
    * split with the same `(?s)<url>` regex, per-field extraction with
    * NULLIF-on-empty, the trim rule, the guarded DECIMAL milli-priority;
    * locs run the full normalization chain keyed by a synthetic
    * row number, and the verdict joins the same url index `norm`
    * aggregates. */
  /** The shared x125/x129 sitemap prelude: fixture XML per domain,
    * block split, per-field extraction, and the normalization chain on
    * the locs — ends with `smk` (entries + fields, keyed by a synthetic
    * row number) and `norm_sm` (the locs' canonical forms). INCLUDES
    * the urlNormPrelude (callers append their verdict SELECT only).
    * ONE definition so the discovery and recrawl rows cannot drift. */
  private def sitemapEntriesCtes: String = {
    // each metadata fragment bound ONCE and interpolated in both child
    // orders — the engine fixture binds one Scala val per fragment and
    // reorders, so the oracle must too or an edit to one branch desyncs
    // the other's fixture bytes (r19s3 review find)
    val lastmod = raw"""(CASE WHEN (b + i) % 3 <> 0 THEN '<lastmod>2026-0'
                 || CAST((b + i) % 9 + 1 AS VARCHAR) || '-1'
                 || CAST((b + i) % 3 AS VARCHAR) || '</lastmod>'
                 ELSE '' END)"""
    val changefreq = raw"""(CASE WHEN (b + i) % 2 = 0 THEN '<changefreq>'
                 || (CASE WHEN (b + i) % 3 = 0 THEN 'daily'
                          WHEN (b + i) % 3 = 1 THEN 'weekly'
                          ELSE 'monthly' END)
                 || '</changefreq>' ELSE '' END)"""
    val priority = raw"""(CASE WHEN (b + i) % 4 <> 3 THEN '<priority>'
               || (CASE WHEN (b + i) % 4 = 0 THEN '1.0'
                        WHEN (b + i) % 4 = 1 THEN '0.5' ELSE '0.25' END)
               || '</priority>' ELSE '' END)"""
    urlNormPrelude +
      raw""", smdom AS (SELECT DISTINCT domain FROM norm
  WHERE domain IS NOT NULL),
smb AS (SELECT domain,
    CAST(regexp_extract(domain, '^brand([0-9]+)\.', 1) AS BIGINT) AS b
  FROM smdom),
smxml AS (SELECT domain AS sm_domain,
    '<?xml version="1.0" encoding="UTF-8"?>' || chr(10)
    || '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    || chr(10)
    || array_to_string(list_transform(range(b % 3 + 2), i ->
      '<url><loc>'
      || (CASE WHEN (b + i) % 5 = 3 THEN chr(10) || '  ' ELSE '' END)
      || (CASE WHEN (b + i) % 4 = 1 THEN 'HTTPS://WWW.' || upper(domain)
               ELSE 'https://' || domain END)
      || '/p/' || CAST((b + i) % 12 AS VARCHAR)
      || (CASE WHEN (b + i) % 4 = 1 THEN '?utm_source=sm' ELSE '' END)
      || (CASE WHEN (b + i) % 5 = 3 THEN ' ' || chr(10) ELSE '' END)
      || '</loc>'
      || (CASE WHEN (b + i) % 2 = 1 THEN
            $priority || $lastmod || $changefreq
          ELSE
            $lastmod || $changefreq || $priority
          END)
      || '</url>'), chr(10))
    || (CASE WHEN b % 4 = 2 THEN chr(10) || '<url><loc>https://brand'
         || CAST((b + 1) % 23 AS VARCHAR) || '.com/x/f</loc></url>'
         ELSE '' END)
    || (CASE WHEN b % 6 = 1
         THEN chr(10) || '<url><loc>not a url</loc></url>' ELSE '' END)
    || (CASE WHEN b % 7 = 2
         THEN chr(10) || '<url><lastmod>2026-02-03</lastmod></url>'
         ELSE '' END)
    || chr(10) || '</urlset>' AS xml
  FROM smb WHERE b % 5 <> 2),
smblk AS (SELECT sm_domain, i AS entry_idx, bl[i + 1] AS blk
  FROM (SELECT sm_domain,
          regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1) AS bl
        FROM smxml),
    unnest(range(len(bl))) AS t(i)),
sment AS (SELECT sm_domain, entry_idx,
    NULLIF(regexp_replace(
      regexp_extract(blk, '(?s)<loc>(.*?)</loc>', 1),
      '^\s+|\s+$$', '', 'g'), '') AS loc_raw,
    NULLIF(regexp_extract(blk, '(?s)<lastmod>(.*?)</lastmod>', 1), '')
      AS lastmod,
    NULLIF(regexp_extract(blk, '(?s)<changefreq>(.*?)</changefreq>', 1),
      '') AS changefreq,
    CASE WHEN regexp_matches(
        regexp_extract(blk, '(?s)<priority>(.*?)</priority>', 1),
        '^[0-9]{1,3}(\.[0-9]{1,3})?$$')
      THEN CAST(CAST(regexp_extract(blk,
        '(?s)<priority>(.*?)</priority>', 1) AS DECIMAL(7,3)) * 1000
        AS BIGINT) END AS priority_milli
  FROM smblk),
smk AS (SELECT ROW_NUMBER() OVER (ORDER BY sm_domain, entry_idx)
    AS doc_id, * FROM sment),
smu AS (SELECT doc_id, loc_raw AS url FROM smk)""" +
      urlNormChain("smu", "_sm")
  }

  private def sitemapDiscoverySql: String =
    sitemapEntriesCtes +
      raw"""
SELECT k.sm_domain, k.entry_idx, n.url_norm, k.lastmod, k.changefreq,
  k.priority_milli, ui.canonical_doc_id,
  CASE WHEN n.url_norm IS NULL THEN 'malformed'
       WHEN n.domain <> k.sm_domain THEN 'foreign'
       WHEN ui.canonical_doc_id IS NOT NULL THEN 'known'
       ELSE 'new' END AS sitemap_status
FROM smk k JOIN norm_sm n USING (doc_id)
LEFT JOIN (SELECT url_norm, MIN(doc_id) AS canonical_doc_id FROM norm
           WHERE url_norm IS NOT NULL GROUP BY 1) ui
  ON n.url_norm = ui.url_norm"""

  /** x129 — recrawl scheduling: the shared sitemap prelude joined to
    * the fetch-log fixture (even-brand domains x /p/0..11, the
    * interleaved month arithmetic), lexicographic lastmod-vs-fetched_at
    * compare, audit/fetch/refetch/fresh verdicts. */
  private def recrawlVerdictsSql: String =
    sitemapEntriesCtes +
      raw""", flog AS (SELECT
    'https://' || domain || '/p/' || CAST(p AS VARCHAR) AS url_norm,
    '2026-0' || CAST((p + b) % 9 + 1 AS VARCHAR) || '-05' AS fetched_at
  FROM smb, unnest(range(12)) AS t(p) WHERE b % 2 = 0)
SELECT k.sm_domain, k.entry_idx, n.url_norm, k.lastmod, f.fetched_at,
  CASE WHEN n.url_norm IS NULL THEN 'audit'
       WHEN n.domain <> k.sm_domain THEN 'audit'
       WHEN f.fetched_at IS NULL THEN 'fetch'
       WHEN k.lastmod IS NOT NULL AND k.lastmod > f.fetched_at
         THEN 'refetch'
       ELSE 'fresh' END AS recrawl_verdict
FROM smk k JOIN norm_sm n USING (doc_id)
LEFT JOIN flog f ON n.url_norm = f.url_norm"""

  /** x130 — Sitemap declarations: the robots fixture's line table
    * (`rl0`, shared with the rule chain) filtered on the sitemap field
    * regex under the same comment-strip, per-domain ref order, the
    * normalization chain on the declared URLs, and the
    * same/cross-host/malformed scope. */
  private def sitemapRefsSql: String =
    urlNormPrelude + robotsRulesChain +
      raw""", sref0 AS (SELECT domain, pos,
    regexp_extract(regexp_replace(raw, '#.*', '', 'g'),
      '(?i)^[ \t]*sitemap[ \t]*:[ \t]*([^ \t]*)', 1) AS sitemap_url
  FROM rl0),
sref1 AS (SELECT domain AS sm_domain, sitemap_url,
    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY pos) - 1 AS ref_idx,
    ROW_NUMBER() OVER (ORDER BY domain, pos) AS doc_id
  FROM sref0 WHERE sitemap_url <> ''),
srefu AS (SELECT doc_id, sitemap_url AS url FROM sref1)""" +
      urlNormChain("srefu", "_sr") +
      raw"""
SELECT r.sm_domain AS domain, r.ref_idx, r.sitemap_url, n.url_norm,
  CASE WHEN n.url_norm IS NULL THEN 'malformed'
       WHEN n.domain = r.sm_domain THEN 'same_host'
       ELSE 'cross_host' END AS ref_scope
FROM sref1 r JOIN norm_sr n USING (doc_id)"""

  /** x126 — redirect-chain resolution: the per-doc redirect fixture
    * (target-class map over `p0`, dst URLs minted by [[urlGenCtes]] with
    * the `doc_id + 7` decoration seed), both sides through the
    * normalization chain, per-doc observations collapsed to one
    * `min(dst)` edge per src, then the doubling ladder UNROLLED to the
    * shared `WebGraph.RedirectHopCap = 8` (g1→g2→g4→g8 — exactly the
    * engine's ⌈log₂ 8⌉ = 3 compose joins), and the per-doc verdict off
    * one left join. */
  private def resolveRedirectsSql: String = {
    require(graft.corpus.WebGraph.RedirectHopCap == 8,
      "the x126 oracle unrolls exactly 3 doubling joins (cap 8) — " +
        "re-unroll it if the shared constant moves")
    urlNormPrelude +
      raw""", rtg AS (SELECT doc_id,
    CASE WHEN k = 50 THEN 55 WHEN k = 55 THEN 50 WHEN k = 60 THEN 60
         WHEN k % 5 <> 0 AND k < 100 AND k NOT BETWEEN 51 AND 64
           THEN k - 1
         WHEN k BETWEEN 101 AND 123 THEN k - 1 END AS kt
  FROM p0),
rsrc AS (SELECT doc_id, kt AS kk, doc_id + 7 AS dd FROM rtg
  WHERE kt IS NOT NULL)""" +
      urlGenCtes("rsrc", "_rd") +
      raw""", rdst AS (SELECT doc_id, url FROM ug_rd)""" +
      urlNormChain("rdst", "_rd") +
      raw""", redge AS (SELECT n.url_norm AS src, MIN(rd.url_norm) AS dst
  FROM norm n JOIN norm_rd rd USING (doc_id)
  WHERE n.url_norm IS NOT NULL AND rd.url_norm IS NOT NULL
  GROUP BY 1),
rg1 AS (SELECT src AS u, dst AS v, CAST(1 AS BIGINT) AS h,
    dst NOT IN (SELECT src FROM redge) AS done FROM redge),
rg2 AS (SELECT a.u, CASE WHEN a.done THEN a.v ELSE b.v END AS v,
    CASE WHEN a.done THEN a.h ELSE a.h + b.h END AS h,
    CASE WHEN a.done THEN TRUE ELSE b.done END AS done
  FROM rg1 a LEFT JOIN rg1 b ON NOT a.done AND a.v = b.u),
rg4 AS (SELECT a.u, CASE WHEN a.done THEN a.v ELSE b.v END AS v,
    CASE WHEN a.done THEN a.h ELSE a.h + b.h END AS h,
    CASE WHEN a.done THEN TRUE ELSE b.done END AS done
  FROM rg2 a LEFT JOIN rg2 b ON NOT a.done AND a.v = b.u),
rg8 AS (SELECT a.u, CASE WHEN a.done THEN a.v ELSE b.v END AS v,
    CASE WHEN a.done THEN a.h ELSE a.h + b.h END AS h,
    CASE WHEN a.done THEN TRUE ELSE b.done END AS done
  FROM rg4 a LEFT JOIN rg4 b ON NOT a.done AND a.v = b.u)
SELECT d.doc_id, d.url_norm,
  CASE WHEN d.url_norm IS NULL THEN NULL
       WHEN g.u IS NULL THEN d.url_norm
       WHEN g.done THEN g.v END AS final_url,
  CASE WHEN d.url_norm IS NULL THEN NULL
       WHEN g.u IS NULL THEN CAST(0 AS BIGINT)
       WHEN g.done THEN g.h END AS n_hops,
  CASE WHEN d.url_norm IS NULL THEN 'malformed'
       WHEN g.u IS NULL THEN 'direct'
       WHEN g.done THEN 'resolved' ELSE 'unresolved' END
    AS redirect_disposition
FROM norm d LEFT JOIN rg8 g ON d.url_norm = g.u"""
  }

  /** x127 — mirror-domain detection: content classes `doc_id % 150` on
    * the urlFixture domain space, (domain, class) distinct (digest
    * equality ≡ class equality — the md5 never leaves the engine, the
    * x1 convention), the driver row's cap 4 and threshold 60, integer
    * containment percent. */
  private def mirrorDomainsSql: String = {
    val cap = 4
    val pct = graft.corpus.WebGraph.MirrorPctThreshold
    urlNormPrelude +
      raw""", mdd AS (SELECT DISTINCT domain,
    CASE WHEN doc_id % 50 = 17 THEN -1 ELSE doc_id % 150 END AS c
  FROM norm WHERE domain IS NOT NULL),
msz AS (SELECT c, COUNT(*) AS g FROM mdd GROUP BY 1),
mok AS (SELECT domain, mdd.c FROM mdd JOIN msz USING (c)
  WHERE g <= $cap),
mpairs AS (SELECT a.domain AS domain_a, b.domain AS domain_b,
    COUNT(*) AS shared_digests
  FROM mok a JOIN mok b ON a.c = b.c AND a.domain < b.domain
  GROUP BY 1, 2),
mtot AS (SELECT domain, COUNT(*) AS n FROM mdd GROUP BY 1)
SELECT p.domain_a, p.domain_b, p.shared_digests,
  ta.n AS n_a, tb.n AS n_b,
  100 * p.shared_digests // least(ta.n, tb.n) AS overlap_pct,
  CASE WHEN 100 * p.shared_digests // least(ta.n, tb.n) >= $pct
    THEN 'mirror' ELSE 'partial' END AS verdict
FROM mpairs p
JOIN mtot ta ON ta.domain = p.domain_a
JOIN mtot tb ON tb.domain = p.domain_b"""
  }

  /** x128 — URL path-template census: path off the canonical form (the
    * x123 extraction), digit runs masked to `N`, one (domain, template)
    * aggregate with distinct-URL counts, min-witness, and the shared
    * trap threshold. */
  private def pathTemplatesSql: String = {
    val minUrls = graft.corpus.Curation.TrapFixtureMinUrls
    urlNormPrelude +
      raw""", pt0 AS (SELECT domain, url_norm,
    regexp_replace(
      regexp_extract(url_norm, '^[^:/?#]+://[^/?]*([^?]*)', 1),
      '[0-9]+', 'N', 'g') AS template
  FROM norm WHERE url_norm IS NOT NULL)
SELECT domain, template,
  COUNT(DISTINCT url_norm) AS n_urls,
  MIN(url_norm) AS example_url,
  CASE WHEN COUNT(DISTINCT url_norm) >= $minUrls THEN 'trap'
       ELSE 'ok' END AS verdict
FROM pt0 GROUP BY 1, 2"""
  }

  /** The x58/x109 paragraph fixture + line explode — replays
    * `TextDedup.paragraphFixture` (6-token lines + planted header/footer,
    * same moduli) and ends with a `lines` CTE of (doc_id, pos, line). */
  private val paragraphLinesPrelude: String =
    """WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
b2 AS (
  SELECT doc_id,
    array_to_string(list_transform(
      range(CAST(ceil(len(ws) / 6.0) AS INT)),
      i -> array_to_string(ws[i * 6 + 1 : i * 6 + 6], ' ')), chr(10)) AS body
  FROM base),
fx AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter' || chr(10)
          ELSE '' END)
    || body
    || (CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'all rights reserved'
             ELSE '' END) AS text
  FROM b2),
lines AS (
  SELECT doc_id, i AS pos, ls[i + 1] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM fx),
    unnest(range(len(ls))) AS t(i))
"""

  /** x109 — incremental line scrub: the even-id reference half's frozen
    * line vocabulary (non-blank lines at reference df ≥ minDf − 1 — the
    * floor at which ANY increment occurrence crosses the self-contained
    * threshold), odd-id increment lines dropped on vocabulary hits, ordered
    * reassembly. */
  private def incrLineScrubSql: String = {
    val minDf = graft.corpus.TextDedup.LineScrubMinDf
    paragraphLinesPrelude +
      s""", vocab AS (
  SELECT line FROM (
    SELECT line, COUNT(*) AS line_df
    FROM (SELECT DISTINCT doc_id, line FROM lines
          WHERE doc_id % 2 = 0 AND trim(line) <> '')
    GROUP BY 1)
  WHERE line_df >= ${minDf - 1}),
j AS (
  SELECT l.doc_id, l.pos, l.line,
    (v.line IS NOT NULL AND trim(l.line) <> '') AS removable
  FROM (SELECT * FROM lines WHERE doc_id % 2 = 1) l
  LEFT JOIN vocab v ON l.line = v.line)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CASE WHEN removable THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  COALESCE(string_agg(line, chr(10) ORDER BY pos)
    FILTER (WHERE NOT removable), '') AS text
FROM j GROUP BY 1"""
  }

  /** x58 — line-level boilerplate scrub: the paragraph fixture rebuilt in
    * SQL (6-token lines + planted header/footer, same moduli), line doc
    * frequency over DISTINCT (doc, line), removal at the shared
    * LineScrubMinDf floor, ordered reassembly via string_agg ORDER BY. */
  private def lineScrubSql: String = {
    val minDf = graft.corpus.TextDedup.LineScrubMinDf
    paragraphLinesPrelude +
      s""", df AS (
  SELECT line, COUNT(*) AS line_df
  FROM (SELECT DISTINCT doc_id, line FROM lines) GROUP BY 1)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CASE WHEN line_df >= $minDf AND trim(line) <> '' THEN 1 ELSE 0 END)
    AS BIGINT) AS n_removed,
  COALESCE(string_agg(line, chr(10) ORDER BY pos)
    FILTER (WHERE NOT (line_df >= $minDf AND trim(line) <> '')), '') AS text
FROM lines JOIN df USING (line)
GROUP BY 1"""
  }

  /** x49 — dataset card: corpus-level scalars; quality via qualityPrelude so
    * the formula stays in one place. */
  private def datasetCardSql: String = {
    val b = graft.corpus.Curation.PackBudget
    val nq = graft.corpus.Similarity.DefaultTopKQueries
    val k = graft.corpus.Similarity.DefaultTopK
    val cN = graft.corpus.Similarity.DefaultIvfCentroids
    val nprobe = graft.corpus.Similarity.DefaultIvfNprobe
    val kc = graft.corpus.Similarity.HardNegCandidates
    val margin = graft.corpus.Similarity.HardNegMargin
    qualityPrelude("") +
    s""", card AS (
  SELECT COUNT(*) AS n_docs,
    COUNT(DISTINCT source) AS n_sources,
    COUNT(DISTINCT lang) AS n_langs,
    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
    CAST(SUM(length(text)) AS BIGINT) AS n_chars,
    COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dup_docs
  FROM documents),
mq AS (
  SELECT round(CAST(SUM(CAST(round(quality, 6) AS DECIMAL(18,6))) AS DOUBLE)
           / COUNT(*), 6) AS mean_quality
  FROM q),
-- packing plane, x31 layout: corpus-wide split fraction (x95's audit)
pkc AS (
  SELECT n_tokens,
    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS st
  FROM (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents)),
pk31 AS (
  SELECT CAST(SUM(CASE WHEN n_tokens > 0 AND (st % $b) + n_tokens > $b
              THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS pack_split_frac
  FROM pkc),
-- packing plane, x97 boundary-respecting layout: per-tail padding
-- fraction (the x97 recursive next-fit chain, members grouped per bin)
pt AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS pos,
         SUM(len(string_split(text, ' '))) OVER (PARTITION BY source
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS S
  FROM documents WHERE text IS NOT NULL),
pns AS (SELECT source AS nsrc, MAX(pos) AS n FROM pt GROUP BY source),
pbins AS (
  WITH RECURSIVE chain(csrc, bin, start) AS (
    SELECT nsrc, CAST(0 AS BIGINT), CAST(1 AS BIGINT) FROM pns
    UNION ALL
    SELECT c.csrc, c.bin + 1,
      GREATEST(c.start,
        (SELECT COALESCE(MAX(t2.pos), 0) FROM pt t2
         WHERE t2.source IS NOT DISTINCT FROM c.csrc
           AND t2.S <= (SELECT t3.S - t3.n_tokens FROM pt t3
                        WHERE t3.source IS NOT DISTINCT FROM c.csrc
                          AND t3.pos = c.start) + $b)) + 1
    FROM chain c JOIN pns ON pns.nsrc IS NOT DISTINCT FROM c.csrc
    WHERE c.start <= pns.n
  )
  SELECT csrc, bin, start FROM chain
  WHERE start <= (SELECT n FROM pns
                  WHERE pns.nsrc IS NOT DISTINCT FROM chain.csrc)),
pnf AS (
  SELECT pt.source, bb.bin AS seq_id, pt.n_tokens
  FROM pt
  JOIN (SELECT pt.source AS msrc, pt.pos AS mpos, MAX(b2.start) AS bstart
        FROM pt JOIN pbins b2 ON b2.csrc IS NOT DISTINCT FROM pt.source
                             AND b2.start <= pt.pos
        GROUP BY pt.source, pt.pos) m
    ON m.msrc IS NOT DISTINCT FROM pt.source AND m.mpos = pt.pos
  JOIN pbins bb ON bb.csrc IS NOT DISTINCT FROM pt.source
               AND bb.start = m.bstart),
pk97 AS (
  SELECT CASE WHEN COUNT(*) > 0
    THEN CAST(SUM(pad) AS DOUBLE) / (COUNT(*) * $b) ELSE 0.0 END
    AS pack_padding_frac
  FROM (SELECT GREATEST(0, $b - SUM(n_tokens)) AS pad
        FROM pnf GROUP BY source, seq_id)),
-- embedding planes: shared normalized base (NULL rows kept for the exact
-- side, the x94/x98 convention). The e-prefixed CTEs below are renamed
-- copies of the x94_dense_recall and x93_hard_negatives machinery (the
-- rename dodges qualityPrelude's q): edit those oracles and THIS block in
-- lockstep -- a one-sided edit is not silent (the card is hash-checked
-- every round and both read the same engine), but it is a red row
eraw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
ebase AS (
  SELECT vec_id, CASE WHEN list_dot_product(raw, raw) > 0
         THEN list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw)))
         END AS e
  FROM eraw WHERE raw IS NOT NULL
  UNION ALL
  SELECT vec_id, NULL AS e FROM eraw WHERE raw IS NULL),
-- x94 plane: mean recall@k of the default IVF generator (total hits over
-- slice x k — pure integer arithmetic into one double division)
ecent AS (SELECT vec_id AS cid, e AS ce FROM ebase
  WHERE vec_id < $cN AND e IS NOT NULL),
easg AS (
  SELECT vec_id, e, cid FROM (
    SELECT eb.vec_id, eb.e, c.cid,
           ROW_NUMBER() OVER (PARTITION BY eb.vec_id
             ORDER BY list_dot_product(eb.e, c.ce) DESC, c.cid) AS arank
    FROM ebase eb CROSS JOIN ecent c WHERE eb.e IS NOT NULL)
  WHERE arank = 1),
eprobes AS (
  SELECT qid, qe, cid FROM (
    SELECT eb.vec_id AS qid, eb.e AS qe, c.cid,
           ROW_NUMBER() OVER (PARTITION BY eb.vec_id
             ORDER BY list_dot_product(eb.e, c.ce) DESC, c.cid) AS prank
    FROM ebase eb CROSS JOIN ecent c
    WHERE eb.vec_id < $nq AND eb.e IS NOT NULL)
  WHERE prank <= $nprobe),
eapprox AS (
  SELECT qid, neighbor_id FROM (
    SELECT p.qid, a.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.qid
             ORDER BY list_dot_product(p.qe, a.e) DESC, a.vec_id) AS rn
    FROM eprobes p JOIN easg a ON p.cid = a.cid AND a.vec_id <> p.qid)
  WHERE rn <= $k),
exq AS (SELECT vec_id AS qid, e AS qe FROM ebase WHERE vec_id < $nq),
expr2 AS (
  SELECT qid, vec_id AS neighbor_id,
         CASE WHEN qe IS NULL OR e IS NULL THEN NULL
              ELSE list_dot_product(qe, e) END AS cos
  FROM ebase CROSS JOIN exq WHERE vec_id <> qid),
eexact AS (
  SELECT qid, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY cos DESC, neighbor_id) AS rn FROM expr2)
  WHERE rn <= $k),
euni AS (SELECT DISTINCT vec_id AS qid FROM embeddings WHERE vec_id < $nq),
erec AS (
  SELECT CAST((SELECT COUNT(*) FROM eexact e JOIN eapprox p
                 ON e.qid = p.qid AND e.neighbor_id = p.neighbor_id)
              AS DOUBLE)
         / ((SELECT COUNT(*) FROM euni) * $k) AS dense_recall_at_k),
-- x93 plane: hard-negative yield (emitted negatives over requested slots)
enz AS (SELECT vec_id, e FROM ebase WHERE e IS NOT NULL),
eq AS (SELECT vec_id AS qid, e AS qe FROM enz WHERE vec_id < $nq),
epool AS (
  SELECT qid, vec_id AS cid, list_dot_product(qe, e) AS cos
  FROM enz CROSS JOIN eq WHERE vec_id <> qid),
ecand AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
  FROM epool
  QUALIFY rnk <= $kc),
epos AS (SELECT qid, cid AS pos_id, cos AS pos_cos FROM ecand WHERE rnk = 1),
eneg AS (
  SELECT c.qid, c.cid,
         ROW_NUMBER() OVER (PARTITION BY c.qid
           ORDER BY c.cos DESC, c.cid) AS nrank
  FROM ecand c JOIN epos p ON c.qid = p.qid
  WHERE c.rnk > 1 AND c.cos <= p.pos_cos - $margin),
ey AS (
  SELECT CASE WHEN (SELECT COUNT(*) FROM eq) > 0
    THEN CAST((SELECT COUNT(*) FROM eneg WHERE nrank <= $k) AS DOUBLE)
         / ((SELECT COUNT(*) FROM eq) * $k) ELSE 0.0 END AS hardneg_yield)
SELECT card.*, mq.mean_quality, pk31.pack_split_frac,
       pk97.pack_padding_frac, erec.dense_recall_at_k, ey.hardneg_yield
FROM card CROSS JOIN mq CROSS JOIN pk31 CROSS JOIN pk97
CROSS JOIN erec CROSS JOIN ey"""
  }

  /** x46 — cluster × label purity profile over the final k-means
    * assignment. */
  private def clusterProfileSql: String = kmeansPrelude + """,
lab AS (SELECT vec_id, label FROM embeddings)
SELECT cluster, label, n_vecs,
       round(CAST(n_vecs AS DOUBLE) / tot, 6) AS share
FROM (
  SELECT f.cid AS cluster, l.label, COUNT(*) AS n_vecs,
         SUM(COUNT(*)) OVER (PARTITION BY f.cid) AS tot
  FROM fin f JOIN lab l ON f.vec_id = l.vec_id
  GROUP BY 1, 2)"""

  /** x51 — incremental semantic dedup: clusters trained on the OLD (even-id)
    * slice only (seeds = its k lowest present ids), both sides assigned to
    * those fixed centroids, new×old compared within clusters only. */
  private def incrementalSemanticSql: String = {
    val k = graft.corpus.Semantic.KmeansK
    val iters = graft.corpus.Semantic.KmeansIters
    val tau = graft.corpus.Semantic.SemDedupTau
    s"""WITH $embBase,
obase AS (SELECT * FROM base WHERE vec_id % 2 = 0),
nbase AS (SELECT * FROM base WHERE vec_id % 2 = 1)""" +
      lloydChain("obase",
        // k lowest HEALTHY old ids (engine filters e-NULL before the limit)
        s"SELECT vec_id AS cid, e AS ce FROM obase WHERE e IS NOT NULL ORDER BY vec_id LIMIT $k") +
      assignCte("oasg", "obase", s"cent$iters") +
      assignCte("nasg", "nbase", s"cent$iters") + s""",
pr AS (
  SELECT n.vec_id, n.cid AS cluster, o.vec_id AS matched_vec_id,
         list_dot_product(n.e, o.e) AS cos
  FROM nasg n JOIN oasg o ON n.cid = o.cid
  WHERE list_dot_product(n.e, o.e) >= $tau)
SELECT vec_id, cluster, matched_vec_id, round(cos, 6) AS cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
    ORDER BY cos DESC, matched_vec_id) AS rn FROM pr)
WHERE rn = 1"""
  }

  /** x42 — embedding-space decontamination: best benchmark match ≥ τ, slice
    * and threshold from [[graft.corpus.Semantic]]'s constants. */
  private def embedDecontamSql: String = {
    val mod = graft.corpus.Semantic.DecontamBenchMod
    val tau = graft.corpus.Semantic.DecontamTau
    s"""WITH $embBase,
bench AS (SELECT vec_id AS bench_id, e AS be FROM base
  WHERE vec_id % $mod = 0 AND e IS NOT NULL),
scored AS (
  SELECT c.vec_id, b.bench_id, list_dot_product(c.e, b.be) AS cos
  FROM base c CROSS JOIN bench b WHERE c.vec_id % $mod <> 0)
SELECT vec_id, bench_id, round(cos, 6) AS cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
    ORDER BY cos DESC, bench_id) AS rn
  FROM scored WHERE cos >= $tau)
WHERE rn = 1"""
  }

  /** x41 — temperature mixing weights; α pinned at 1/2 so the power is
    * IEEE-correctly-rounded `sqrt` in both engines; budget from Curation. */
  private def mixWeightsSql: String = {
    val budget = graft.corpus.Curation.MixBudgetTokens
    s"""WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
w AS (SELECT *, CAST(round(sqrt(n_tokens), 6) AS DECIMAL(18,6)) AS s FROM per),
t AS (SELECT *, SUM(s) OVER () AS tot FROM w)
SELECT source, n_docs, n_tokens,
  round(CAST(s AS DOUBLE)/CAST(tot AS DOUBLE), 8) AS weight,
  round((CAST(s AS DOUBLE)/CAST(tot AS DOUBLE)) * $budget / n_tokens, 6) AS epochs
FROM t"""
  }

  /** x43 — character-class entropy; classes interpolated from
    * [[TextStats.EntropyClasses]], terms rounded-then-DECIMAL-summed in the
    * engine's fixed class order. DuckDB's regexp_replace needs the explicit
    * 'g' flag to match Spark's replace-all default. */
  private def charEntropySql: String = {
    val cls = TextStats.EntropyClasses
    val counts = cls.map { case (name, re) =>
      s"length(text) - length(regexp_replace(text, '$re', '', 'g')) AS $name"
    }.mkString(",\n    ")
    val names = cls.map(_._1) :+ "n_other"
    val terms = names.map { c =>
      s"CASE WHEN $c > 0 THEN CAST(round(-(CAST($c AS DOUBLE)/n)*log2(CAST($c AS DOUBLE)/n), 8) AS DECIMAL(12,8)) ELSE CAST(0 AS DECIMAL(12,8)) END"
    }.mkString("\n  + ")
    s"""WITH c AS (
  SELECT doc_id, length(text) AS n,
    $counts,
    length(text) - (${cls.map(_._1).mkString(" + ")}) AS n_other
  FROM documents)
SELECT doc_id, ${names.mkString(", ")},
  CAST($terms AS DOUBLE) AS entropy_bits
FROM c"""
  }

  /** x76 — hashed-unigram logistic regression (Classifier.trainQualityLr +
    * scoreQualityLr), replayed CTE-by-CTE: same md5-prefix bucket hash as
    * x30, margins/weights in exact 8-dp fixed point (BIGINT), the sigmoid and
    * every `floor(x + 0.5)` fixed-point rounding written as the engine's
    * identical double-op sequence, one iteration block per training pass
    * (the lloydChain generation pattern). Buckets absent from the corpus stay
    * weight-0 in the engine's array and absent here — they contribute 0 to
    * every margin either way. */
  private def classifierSql: String = classifierSqls._1

  /** x77 — GPT-3 Pareto-acceptance resampling over the x76 scoring chain:
    * same prelude (the engine composes the same way), acceptance draw from
    * the namespaced md5-uniform via the Pareto inverse CDF, `keep` decided
    * on the ROUNDED values both engines share. */
  private def classifierResampleSql: String = classifierSqls._2

  /** x78 — calibration report over the x76 scoring chain: probability
    * deciles (floor on the identical doubles, top bin closed), DECIMAL-mean
    * predicted probability vs integer-ratio empirical target rate. */
  private def classifierCalibrationSql: String = classifierSqls._3

  private lazy val classifierSqls: (String, String, String) = {
    val C = graft.corpus.Classifier
    val B = C.DefaultBuckets
    val lr = C.DefaultLearningRate
    val ms = C.MicroScale
    val targets = C.PositiveSources.map(s => s"'$s'").mkString(", ")
    // token → bucket: first 4 md5 hex nibbles, mod B (the dsirSql nibble
    // arithmetic); md5 hashed ONCE per token via an inner list_transform —
    // DuckDB lambdas have no let-binding, so the hoist is a nested transform
    val nibbles = (1 to 4).map { i =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}"
    }.mkString("(", "\n        + ", s") % $B")
    val sigmoid = (m: String) => s"1.0/(1.0 + exp(-($m / $ms)))"
    val iterations = (1 to C.DefaultIterations).map { i =>
      val prevM = s"m${i - 1}"
      val step = (g: String) =>
        s"CAST(FLOOR($lr * $g / (SELECT n FROM nn) + 0.5) AS BIGINT)"
      val prevBias = if (i == 1) "0" else s"(SELECT bias FROM bi${i - 1})"
      // every bucket in gr$i is in w${i-1} and vice versa: both domains are
      // exactly occ's bucket set, so the inner join loses nothing
      val wFrom =
        if (i == 1) s"SELECT b, 0 - ${step("g")} AS w FROM gr$i"
        else s"SELECT gr$i.b, p.w - ${step(s"gr$i.g")} AS w " +
          s"FROM gr$i JOIN w${i - 1} p ON p.b = gr$i.b"
      s"""g$i AS (
  SELECT doc_id, y,
    CAST(FLOOR((${sigmoid("m")} - y) * $ms + 0.5) AS BIGINT) AS gm
  FROM $prevM),
gr$i AS (SELECT b, SUM(gm) AS g FROM occ JOIN g$i USING (doc_id) GROUP BY b),
bi$i AS (SELECT $prevBias - ${step(s"(SELECT SUM(gm) FROM g$i)")} AS bias),
w$i AS ($wFrom),
m$i AS (
  SELECT base.doc_id, base.y,
    CAST((SELECT bias FROM bi$i) + COALESCE(s.sw, 0) AS BIGINT) AS m
  FROM base LEFT JOIN (
    SELECT o.doc_id, SUM(w$i.w) AS sw FROM occ o JOIN w$i USING (b)
    GROUP BY o.doc_id) s
  ON base.doc_id = s.doc_id)"""
    }.mkString(",\n")
    val prelude = s"""WITH base AS (
  SELECT doc_id,
    CASE WHEN source IN ($targets) THEN 1.0 ELSE 0.0 END AS y,
    CASE WHEN text IS NULL THEN CAST([] AS BIGINT[])
         ELSE list_transform(
           list_transform(string_split(text, ' '), t -> md5(t)),
           h -> $nibbles) END AS bs
  FROM documents),
occ AS (SELECT doc_id, unnest(bs) AS b FROM base),
nn AS (SELECT COUNT(*) AS n FROM base),
m0 AS (SELECT doc_id, y, CAST(0 AS BIGINT) AS m FROM base),
$iterations"""
    val mFin = s"m${C.DefaultIterations}"
    // margin: INTEGER half-away-from-zero 8-dp→6-dp rounding on the exact
    // micro value — round(double) disagrees between the engines exactly on
    // the systematic |micro| ≡ 50 (mod 100) half-ties (~1% of documents);
    // positive-operand // matches the engine's exact positive floor
    val margin6 = "CASE WHEN m < 0 THEN 0 - ((2 * abs(m) + 100) // 200) " +
      "ELSE (2 * abs(m) + 100) // 200 END"
    val scoreSql = s"""$prelude
SELECT doc_id, CAST(y AS INTEGER) AS is_target,
  CAST($margin6 AS DOUBLE) / 1000000.0 AS margin,
  round(${sigmoid("m")}, 6) AS prob
FROM $mFin"""
    // x77: u = exact dyadic 8-hex-digit uniform; pareto inverse CDF
    // (1−u)^(−1/α) − 1; keep decided on the ROUNDED doubles both engines
    // share, ties KEEP (the engine's contract in Classifier.paretoResample —
    // a perfect score must survive a tail draw that rounds to 0.000000)
    val a = C.ParetoAlpha
    val uExpr = s"(CAST(('0x' || substr(md5('${C.ResampleKeyPrefix}' || " +
      s"CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0)"
    val resampleSql = s"""$prelude
SELECT doc_id, is_target, prob, pareto, (pareto >= 1.0 - prob) AS keep
FROM (
  SELECT doc_id, CAST(y AS INTEGER) AS is_target,
    round(${sigmoid("m")}, 6) AS prob,
    round(pow(1.0 - $uExpr, -(1.0/$a)) - 1.0, 6) AS pareto
  FROM $mFin)"""
    // x78 parity: micro-unit integers + INTEGER half-up division — never
    // round(double), whose half-tie behavior differs between the engines
    // (Spark exact-decimal HALF_UP vs DuckDB multiply-and-std::round)
    val bins = C.DefaultCalibrationBins
    val calibrationSql = s"""$prelude
SELECT bin, COUNT(*) AS n_docs,
  CAST((2 * SUM(pm) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 1000000.0
    AS mean_prob,
  CAST((2 * 1000000 * SUM(is_target) + COUNT(*)) // (2 * COUNT(*))
    AS DOUBLE) / 1000000.0 AS target_rate
FROM (
  SELECT CAST(least(floor(round(${sigmoid("m")}, 6) * $bins), ${bins - 1})
           AS INTEGER) AS bin,
    CAST(FLOOR(round(${sigmoid("m")}, 6) * 1000000.0 + 0.5) AS BIGINT) AS pm,
    CAST(y AS INTEGER) AS is_target
  FROM $mFin)
GROUP BY bin"""
    (scoreSql, resampleSql, calibrationSql)
  }

  val sql: Map[String, String] = Map(

    // x41: temperature-scaled source mixing weights
    "x41_mix_weights" -> mixWeightsSql,

    // x76: hashed-unigram logistic-regression quality classifier
    "x76_quality_lr" -> classifierSql,

    // x77: GPT-3 Pareto-acceptance resampling over the x76 scores
    "x77_classifier_resample" -> classifierResampleSql,

    // x78: classifier calibration report (decile reliability)
    "x78_calibration" -> classifierCalibrationSql,

    // x42: embedding-space benchmark decontamination
    "x42_embed_decontam" -> embedDecontamSql,

    // x43: character-class entropy — classes from TextStats.EntropyClasses
    "x43_char_entropy" -> charEntropySql,

    // x44: deterministic k-means assignment — geometry from Semantic
    "x44_kmeans" -> kmeansSql,

    // x64: per-cluster farthest-from-centroid members (rank-based outliers)
    "x64_embedding_outliers" -> outlierReportSql,

    // x45: SemDeDup within-cluster prune — threshold from Semantic
    "x45_semantic_dedup" -> semanticDedupSql,

    // x46: cluster × label purity profile
    "x46_cluster_profile" -> clusterProfileSql,

    // x51: incremental semantic dedup (new = odd ids vs old = even ids)
    "x51_incr_semantic" -> incrementalSemanticSql,

    // x48: per-source boilerplate report — span width from TextDedup
    "x48_boilerplate" -> boilerplateSql,

    // x52: materialized temperature mix — budget from Curation.MixApplyBudget
    "x52_apply_mix" -> applyMixSql,

    // x53: snapshot diff (dataset versioning report)
    "x53_snapshot_diff" -> snapshotDiffSql,

    // x54: n-gram novelty of the increment vs the reference vocabulary
    "x54_novelty" -> noveltySql,

    // x55: source token-share concentration (HHI / entropy / top share)
    "x55_concentration" -> concentrationSql,

    // x56: per-source unigram JSD between x53's snapshots
    "x56_unigram_drift" -> unigramDriftSql,

    // x57: per-label embedding drift between the same snapshot convention
    "x57_embedding_drift" -> embeddingDriftSql,

    // x58: line-level boilerplate scrub over the paragraph fixture
    "x58_line_scrub" -> lineScrubSql,

    // x50: surviving corpus after the dedup decision (x20's components, the
    // non-canonical members anti-joined away)
    "x50_dedup_apply" -> (jaccardPrelude +
      s""", jp AS (SELECT doc_id_1, doc_id_2 FROM jpairs WHERE jaccard >= ${graft.corpus.TextDedup.DefaultJaccardThreshold}),
edges AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM jp
          UNION ALL SELECT doc_id_2, doc_id_1 FROM jp),
comp(node, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.dst, c.label FROM comp c JOIN edges e ON c.node = e.src),
drops AS (SELECT node FROM comp GROUP BY node HAVING node <> MIN(label))
SELECT d.doc_id, d.source, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM drops)""").replace(
      "WITH toks", "WITH RECURSIVE toks"),

    // x49: one-row dataset card — quality formula shared via qualityPrelude
    "x49_dataset_card" -> datasetCardSql,

    // x47: embedding QA profile — same norm kernel as the similarity oracles
    "x47_embedding_profile" -> """WITH raw AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
n AS (
  -- NULL embedding: dim and nrm both NULL (engine: size/dotp null-propagate;
  -- the row still counts in n_vecs). Computed in a raw-IS-NOT-NULL branch:
  -- DuckDB's vectorized list_dot_product errors outright when a scan chunk
  -- mixes NULL and empty lists, even under a CASE guard
  SELECT label, CAST(len(raw) AS BIGINT) AS dim,
         sqrt(list_dot_product(raw, raw)) AS nrm
  FROM raw WHERE raw IS NOT NULL
  UNION ALL
  SELECT label, NULL AS dim, NULL AS nrm FROM raw WHERE raw IS NULL)
SELECT label, COUNT(*) AS n_vecs,
  MIN(dim) AS min_dim, MAX(dim) AS max_dim,
  CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
  round(MIN(nrm), 6) AS min_norm, round(MAX(nrm), 6) AS max_norm,
  round(CAST(SUM(CAST(round(nrm, 8) AS DECIMAL(20,8))) AS DOUBLE) / COUNT(*), 6)
    AS mean_norm
FROM n GROUP BY 1""",

    // x40: incremental (new-vs-index) near-dup dedup
    "x40_incr_dedup" -> incrementalDedupSql,

    // x32: Gopher-style quality-gate rules report
    "x32_quality_gate" -> qualityGateSql,

    // x33: cross-source near-dup overlap matrix
    "x33_source_overlap" -> sourceOverlapSql,

    // x30: DSIR importance weighting — constants interpolated from TextStats
    "x30_dsir_weights" -> dsirSql,

    // x31: concat-then-chunk sequence packing — budget from Curation.PackBudget
    "x31_pack_sequences" -> packSql,

    // x97: boundary-respecting next-fit packing — the oracle replays the
    // bin chain RECURSIVELY per source (next start = last position whose
    // running total fits the current start's threshold, +1; GREATEST makes
    // an oversize start a singleton), then assigns each doc the greatest
    // bin start at or before its position. The engine computes the same
    // chain with pointer doubling (no sequential pass) — this independent
    // serial replay is exactly what it must reproduce. Offsets CAST to
    // BIGINT (the correlated-subquery difference widens otherwise);
    // NULL-text docs union back with NULL packing columns.
    "x97_pack_nextfit" -> {
      val b = graft.corpus.Curation.PackBudget
      // source comparisons are IS NOT DISTINCT FROM: the engine packs a
      // NULL-source document on its own chain (r16), and SQL = would
      // silently drop it from every join below
      s"""WITH t AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS pos,
         SUM(len(string_split(text, ' '))) OVER (PARTITION BY source
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS S
  FROM documents WHERE text IS NOT NULL),
ns AS (SELECT source AS nsrc, MAX(pos) AS n FROM t GROUP BY source),
bins AS (
  WITH RECURSIVE chain(csrc, bin, start) AS (
    SELECT nsrc, CAST(0 AS BIGINT), CAST(1 AS BIGINT) FROM ns
    UNION ALL
    SELECT c.csrc, c.bin + 1,
      GREATEST(c.start,
        (SELECT COALESCE(MAX(t2.pos), 0) FROM t t2
         WHERE t2.source IS NOT DISTINCT FROM c.csrc
           AND t2.S <= (SELECT t3.S - t3.n_tokens FROM t t3
                        WHERE t3.source IS NOT DISTINCT FROM c.csrc
                          AND t3.pos = c.start) + $b)) + 1
    FROM chain c JOIN ns ON ns.nsrc IS NOT DISTINCT FROM c.csrc
    WHERE c.start <= ns.n
  )
  SELECT csrc, bin, start FROM chain
  WHERE start <= (SELECT n FROM ns
                  WHERE ns.nsrc IS NOT DISTINCT FROM chain.csrc))
SELECT t.source, t.doc_id, t.n_tokens, b.bin AS seq_id,
       CAST((t.S - t.n_tokens) -
         (SELECT t4.S - t4.n_tokens FROM t t4
          WHERE t4.source IS NOT DISTINCT FROM t.source
            AND t4.pos = b.start) AS BIGINT)
         AS "offset",
       t.n_tokens > $b AS oversize
FROM t
JOIN (SELECT t.source AS msrc, t.pos AS mpos, MAX(b2.start) AS bstart
      FROM t JOIN bins b2 ON b2.csrc IS NOT DISTINCT FROM t.source
                         AND b2.start <= t.pos
      GROUP BY t.source, t.pos) m
  ON m.msrc IS NOT DISTINCT FROM t.source AND m.mpos = t.pos
JOIN bins b ON b.csrc IS NOT DISTINCT FROM t.source AND b.start = m.bstart
UNION ALL
SELECT source, doc_id, CAST(NULL AS BIGINT) AS n_tokens,
       CAST(NULL AS BIGINT) AS seq_id, CAST(NULL AS BIGINT) AS "offset",
       CAST(NULL AS BOOLEAN) AS oversize
FROM documents WHERE text IS NULL"""
    },

    // x95: packing-efficiency audit over x31's layout — same CTEs, then a
    // per-source aggregate; totals CAST to BIGINT (DuckDB SUM widens to
    // HUGEINT), fractions are int/int double divisions on shared operands
    "x95_pack_efficiency" -> {
      val b = graft.corpus.Curation.PackBudget
      s"""WITH t AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
c AS (
  SELECT source, doc_id, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS st
  FROM t),
g AS (
  SELECT source,
    COUNT(*) AS n_docs,
    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS total_tokens,
    CAST(SUM(CASE WHEN n_tokens > 0 AND (st % $b) + n_tokens > $b
             THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
  FROM c GROUP BY source),
h AS (
  SELECT *, CAST((total_tokens + ${b - 1}) // $b AS BIGINT) AS n_seqs FROM g)
SELECT source, n_docs, total_tokens, n_seqs, n_split_docs,
  CAST(n_split_docs AS DOUBLE) / n_docs AS split_frac,
  CAST(n_seqs * $b - total_tokens AS BIGINT) AS padding_tokens,
  CASE WHEN n_seqs > 0
    THEN CAST(n_seqs * $b - total_tokens AS DOUBLE) / (n_seqs * $b)
    ELSE 0.0 END AS padding_frac
FROM h"""
    },

    // x79: balanced output-shard assignment (per-source snake deal)
    "x79_shard_assign" -> shardSql,

    // x81: BPE train-then-segment (round-for-round training replay)
    "x81_bpe_segment" -> bpeSegmentSql,
    "x88_tokenizer_fertility" -> tokenizerFertilitySql,
    "x91_fertility_drift" -> fertilityDriftSql,

    // x34: overlapping fixed-window chunking — geometry from Curation
    "x34_chunk_docs" -> chunkSql,

    // x35: identity-hash train/val/test split — thresholds from Curation
    "x35_split_assign" -> splitAssignSql,

    // x36: top-k PMI collocations — floor/k from TextStats
    "x36_pmi_collocations" -> pmiSql,

    // x37: cross-document duplicated-span report — width from TextDedup
    "x37_cross_doc_spans" -> crossDocSpansSql,
    // x83: keep-one-copy span scrub (x37's remedy) — width from TextDedup
    "x83_span_scrub" -> spanScrubSql,
    // x99: exact-substring duplicate spans at ExactSubstr length —
    // width/threshold from TextDedup
    "x99_exact_substr_spans" -> exactSubstrSpansSql,
    // x100: the increment twin — odd-id spans against the even-id half's
    // frozen span vocabulary
    "x100_incr_substr_spans" -> incrSubstrSpansSql,
    // x101: the ExactSubstr-length scrub — x83's coverage gated to
    // >= 50-token maximal runs
    "x101_span_scrub_long" -> spanScrubLongSql,
    // x102: the increment twin of x101 — odd-id docs scrubbed of >= 50-token
    // matched runs against the even-id half's frozen span vocabulary
    "x102_incr_scrub_long" -> incrScrubLongSql,
    // x103: span-level decontamination — verbatim >= 13-token overlaps with
    // the doc_id % 50 == 0 benchmark slice, with the leaked text
    "x103_decontam_spans" -> decontamSpansSql,
    // x104: the OPQ rotation kernel — three coordinates of the fixed seeded
    // rotation, interpolated from the same Scala constant the query uses
    "x104_rotate_encode" -> rotateEncodeSql,
    // x105: x103 behind the bloom prefilter — the gate changes the plan,
    // never the answer (no false negatives; the exact semi-join kills the
    // false positives), so it shares x103's oracle verbatim
    "x105_decontam_spans_bloom" -> decontamSpansSql,
    // x106: URL normalization over the deterministic URL fixture — the
    // tracking regex and suffix list interpolate from the Curation constants
    "x106_url_normalize" -> urlNormalizeSql,
    // x107: canonical-URL exact dedup — keep-min over the engineered
    // 125-congruent collision groups, malformed rows excluded
    "x107_url_dedup" -> urlDedupSql,
    // x108: domain block/allow gate — flags (malformed/blocked/allowed)
    // against the shared DefaultDomainBlocklist constant
    "x108_domain_gate" -> domainGateSql,
    // x109: incremental line scrub — odd-id increment against the even-id
    // half's frozen line vocabulary at the minDf-1 decomposition floor
    "x109_incr_line_scrub" -> incrLineScrubSql,
    // x110: HTML -> text extraction — the six ordered policy stages over
    // the deterministic HTML fixture, each stage its own CTE
    "x110_html_extract" -> htmlExtractSql,
    // x111: domain-level web-graph edges — src from the URL fixture's
    // normalization, dst from extracted absolute outlinks (comment-strip
    // first; the commented evil.example anchor must NOT appear)
    "x111_domain_edges" -> domainEdgesSql,
    // x112: incremental canonical-URL dedup — odd-id increment against the
    // even-id reference's frozen url index, classes (k % 10 == 3) withheld
    "x112_incr_url_dedup" -> incrUrlDedupSql,
    // x113: weighted domain PageRank over the x111 edges — integer
    // micro-units, the fixed iteration count unrolled from the shared
    // WebGraph constants (truncating division on both engines)
    "x113_domain_pagerank" -> domainPageRankSql,
    // x116: warm-start PageRank — brandc-withheld graph ranked cold (the
    // previous snapshot), one warm round over the full graph, the
    // withheld domains entering at the uniform share (fallback hashed)
    "x116_warm_pagerank" -> warmPageRankSql,
    // x114: meta-robots gate — noindex/nofollow flags from the page's own
    // directive, both attribute orders, `none` implies both
    "x114_robots_gate" -> robotsGateSql,
    // x115: declared-canonical dedup — rel=canonical target (absolute
    // only) beats the fetch URL as the identity key, keep-min groups
    "x115_canonical_dedup" -> canonicalDedupSql,
    // x117: robots.txt crawl gate — per-domain fixture files parsed under
    // RFC 9309-subset group semantics, longest-match/allow-wins verdicts
    "x117_robots_txt_gate" -> robotsTxtGateSql,
    // x118: anchor-text aggregation — (target domain, term) counts from
    // comment-stripped pages, anchor text through the content stages
    "x118_anchor_terms" -> anchorTermsSql,
    // x119: crawl-frontier scheduling — dedup'd unseen outlinks scored by
    // the brandc-withheld rank snapshot (uniform-share fallback live),
    // politeness slots, deterministic budget cut
    "x119_crawl_frontier" -> crawlFrontierSql,
    // x120: per-domain degree/reciprocity profile — the structural spam
    // panel over the fixture web graph, zero-filled over all nodes
    "x120_degree_profile" -> degreeProfileSql,
    // x121: content blocks by link density — block segmentation at the
    // shared tag pattern, integer min-words/max-density verdicts
    "x121_content_blocks" -> contentBlocksSql,
    // x122: declared page language — <html lang> verbatim + primary
    // subtag, NULL when the page declares nothing
    "x122_declared_lang" -> declaredLangSql,
    // x123: URL shape features + the C4-style word gate — integer
    // counts off the canonical form, flag live on the brand7 entry
    "x123_url_features" -> urlFeaturesSql,
    // x124: per-domain scorecard — census + rank + degrees + robots rule
    // count + top anchor term over the rank∪census domain base,
    // zero-filled counts, NULL-preserved identities
    "x124_domain_scorecard" -> domainScorecardSql,
    // x125: sitemap URL discovery — XML fixture entries parsed
    // (order-free fields, trim, milli-priority), canonicalized, judged
    // malformed/foreign/known/new against the url index
    "x125_sitemap_discovery" -> sitemapDiscoverySql,
    // x126: redirect-chain resolution — per-doc observed redirects
    // collapsed through normalization, doubling ladder unrolled to the
    // shared hop cap, per-doc disposition off one left join
    "x126_resolve_redirects" -> resolveRedirectsSql,
    // x127: mirror-domain detection — (domain, content-class) distinct,
    // boilerplate cap, pair containment percent, mirror/partial verdict
    "x127_mirror_domains" -> mirrorDomainsSql,
    // x128: URL path-template census — digit-masked path shapes, the
    // crawler-trap detector
    "x128_path_templates" -> pathTemplatesSql,
    // x129: sitemap-driven recrawl scheduling — lexicographic
    // lastmod-vs-fetched_at, audit/fetch/refetch/fresh
    "x129_recrawl_verdicts" -> recrawlVerdictsSql,
    // x130: Sitemap declarations from robots.txt — the discovery handoff
    // to the x125 parse tier, scoped same/cross-host/malformed
    "x130_sitemap_refs" -> sitemapRefsSql,

    // x85: CCNet per-language quality buckets — the x19 scoring prelude
    // (per-token 8-dp-rounded DECIMAL-summed log-probs, order-independent),
    // then NTILE(3) per lang ordered (mean logprob DESC, doc_id). The Spark
    // side computes the identical ranks without a per-language window
    // (literal-splitter score bands + driver-computed rank offsets); the
    // tie/boundary arithmetic is pure integer on both engines.
    "x85_ccnet_buckets" ->
      """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
counts AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT SUM(cnt) AS total FROM counts),
scored AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
    CAST(SUM(CAST(round(log10(cnt / total), 8) AS DECIMAL(12,8))) AS DOUBLE)
      AS sum_logprob
  FROM tok JOIN counts USING (w) CROSS JOIN tot
  GROUP BY doc_id)
SELECT sc.doc_id, d.lang, sc.n_tokens,
  sc.sum_logprob / sc.n_tokens AS s,
  NTILE(3) OVER (PARTITION BY d.lang
                 ORDER BY sc.sum_logprob / sc.n_tokens DESC, sc.doc_id)
    AS bucket
FROM scored sc JOIN documents d USING (doc_id)""",

    // x86: incremental CCNet bucketing — frozen half (even doc_ids) trains
    // the LM and fixes the bucket boundaries; the increment (odd doc_ids) is
    // scored against the frozen LM (OOV tokens counted, not scored; all-OOV
    // docs excluded) and lands in the first bucket whose MIN score it
    // reaches, else the tail (also the tail for unseen languages).
    "x86_incr_ccnet_buckets" ->
      """WITH frozen AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
newdocs AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
ftok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM frozen),
fcounts AS (SELECT w, COUNT(*) AS cnt FROM ftok GROUP BY 1),
ftot AS (SELECT SUM(cnt) AS total FROM fcounts),
lm AS (SELECT w, CAST(round(log10(cnt / total), 8) AS DECIMAL(12,8)) AS lp
       FROM fcounts CROSS JOIN ftot),
fscored AS (
  SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(lp) AS DOUBLE) AS sum_logprob
  FROM ftok JOIN lm USING (w) GROUP BY doc_id),
fbuckets AS (
  SELECT f.doc_id, d.lang, f.sum_logprob / f.n_tokens AS s,
    NTILE(3) OVER (PARTITION BY d.lang
                   ORDER BY f.sum_logprob / f.n_tokens DESC, f.doc_id)
      AS bucket
  FROM fscored f JOIN frozen d USING (doc_id)),
bounds AS (SELECT lang, bucket, MIN(s) AS min_s FROM fbuckets GROUP BY 1, 2),
ntok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM newdocs),
nscored AS (
  SELECT doc_id, COUNT(*) AS n_tokens, COUNT(lp) AS n_known,
    CAST(SUM(lp) AS DOUBLE) AS sum_logprob
  FROM ntok LEFT JOIN lm USING (w) GROUP BY doc_id
  HAVING COUNT(lp) > 0),
nsc AS (
  SELECT n.doc_id, d.lang, n.n_tokens, n.n_known,
    n.sum_logprob / n.n_known AS s
  FROM nscored n JOIN newdocs d USING (doc_id))
SELECT doc_id, lang, n_tokens, n_known, s,
  COALESCE(MIN(CASE WHEN s >= min_s THEN bucket END), CAST(3 AS BIGINT))
    AS bucket
FROM nsc LEFT JOIN bounds USING (lang)
GROUP BY doc_id, lang, n_tokens, n_known, s""",
    // x84: incremental span scrub against the frozen reference vocabulary
    "x84_incr_span_scrub" -> incrSpanScrubSql,

    // x38: per-source document-length profile
    "x38_length_profile" -> lengthProfileSql,

    // x39: assembled training sequences — budget from Curation.PackBudget
    "x39_assemble_seqs" -> assembleSql,

    // x28: PII scan + scrub — patterns interpolated from Privacy's constants
    "x28_pii_scrub" -> piiScrubSql,

    // x29: canonical text normalization over the messy-text fixture
    "x29_normalize" -> normalizeSql,
    "x1_dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_doc_id,
         COUNT(*) AS n_copies
       FROM documents GROUP BY 1""",

    "x2_ngram_jaccard" -> (cappedJaccardPrelude + jaccardSelect),

    // x82: Broder containment over the same capped universe (shared ipairs
    // core); ratios raw doubles, threshold on either direction
    "x82_containment" -> (cappedIpairsPrelude + {
      val t = graft.corpus.TextDedup.DefaultContainmentThreshold
      s""", cpairs AS (
  SELECT doc_id_1, doc_id_2,
    CAST(c AS DOUBLE) / n1 AS containment_1,
    CAST(c AS DOUBLE) / n2 AS containment_2
  FROM ipairs)
SELECT doc_id_1, doc_id_2, containment_1, containment_2
FROM cpairs WHERE containment_1 >= $t OR containment_2 >= $t"""
    }),

    // MinHash+LSH is exact-verified to the same J >= 0.8 contract, and 16x4
    // banding has no false negatives on this corpus, so the oracle is the same
    // exact-Jaccard SQL (a banding miss WOULD fail the row-count compare).
    "x3_minhash_lsh" -> (jaccardPrelude + jaccardSelect),

    // x20: connected components over the exact-Jaccard pair set (identical to
    // x3's verified pairs) via recursive min-label propagation
    "x20_dedup_clusters" -> (jaccardPrelude +
      s""", jp AS (SELECT doc_id_1, doc_id_2 FROM jpairs WHERE jaccard >= ${graft.corpus.TextDedup.DefaultJaccardThreshold}),
edges AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM jp
          UNION ALL SELECT doc_id_2, doc_id_1 FROM jp),
comp(node, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.dst, c.label FROM comp c JOIN edges e ON c.node = e.src)
SELECT node AS doc_id, MIN(label) AS cluster_id FROM comp GROUP BY 1""").replace(
      "WITH toks", "WITH RECURSIVE toks"),

    // m2: FakeCodec's feature arithmetic replayed in SQL — feature f is the
    // float32 mean of the byte codes at positions ≡ f (mod 8), rendered as
    // round(f*1000) milli-units (identical double → identical rounding; see
    // CorpusQueries.m2MediaFeatures). ord-per-character equals byte walking
    // because the corpus is pure ASCII (verified at every SF); the Spark side
    // is the byte-true implementation.
    "m2_media_features" -> """WITH a AS (
  SELECT doc_id, text, md5(text) AS hx FROM documents
  WHERE text IS NOT NULL),
cs AS (
  SELECT doc_id, hx, octet_length(encode(text)) AS n_pixels,
    list_transform(range(length(text)), i -> ord(substr(text, i+1, 1))) AS codes
  FROM a),
f AS (
  SELECT doc_id,
    strpos('0123456789abcdef', substr(hx, 3, 1)) AS n_frames,
    n_pixels,
    list_transform(range(8), f ->
      CASE WHEN len(list_filter(range(len(codes)), i -> i % 8 = f)) = 0
           THEN CAST(0 AS FLOAT)
           ELSE CAST(list_sum(list_transform(
                  list_filter(range(len(codes)), i -> i % 8 = f),
                  i -> codes[i+1])) AS FLOAT)
                / len(list_filter(range(len(codes)), i -> i % 8 = f)) END) AS fl
  FROM cs)
SELECT doc_id, n_frames, n_pixels,
  array_to_string(list_transform(fl,
    x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS VARCHAR)), ',')
    AS features
FROM f""",

    // x21: token-level repetition stats; dup-n-gram fractions count repeated
    // POSITIONS (total windows minus distinct shingles) over total windows
    "x21_repetition" -> """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
top AS (
  SELECT doc_id, MAX(c) AS top_c FROM (
    SELECT doc_id, w, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(ws) AS w FROM toks) GROUP BY 1, 2)
  GROUP BY 1),
gr AS (
  SELECT doc_id, len(ws) AS n,
    CASE WHEN len(ws) >= 2
      THEN len(list_distinct(list_transform(range(len(ws) - 1),
             i -> ws[i+1] || ' ' || ws[i+2]))) ELSE 0 END AS d2,
    CASE WHEN len(ws) >= 3
      THEN len(list_distinct(list_transform(range(len(ws) - 2),
             i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))) ELSE 0 END AS d3
  FROM toks)
SELECT top.doc_id, n AS n_tokens,
  round(CAST(top_c AS DOUBLE) / n, 6) AS top_token_frac,
  CASE WHEN n >= 2 THEN round(CAST(n - 1 - d2 AS DOUBLE) / (n - 1), 6)
       ELSE 0.0 END AS dup_2gram_frac,
  CASE WHEN n >= 3 THEN round(CAST(n - 2 - d3 AS DOUBLE) / (n - 2), 6)
       ELSE 0.0 END AS dup_3gram_frac
FROM top JOIN gr ON top.doc_id = gr.doc_id""",

    // x22: 3-gram overlap against the doc_id % 50 == 0 benchmark slice; the
    // per-document shingle sets are distinct, so hits count plain rows
    "x22_decontamination" -> decontaminationSql,

    // x59: the bloom-prefiltered plan of the SAME operator — bit-identical
    // output by construction (no false negatives; false positives die in
    // the exact join), so it shares x22's oracle verbatim
    "x59_bloom_decontam" -> decontaminationSql,

    // x23: deterministic hash-gate sampling — lowercase hex compares
    // lexicographically exactly as it compares numerically, so the tier
    // threshold string IS the keep rate (thresholds from the SAME Scala
    // constants the operator uses)
    "x23_quota_sample" -> {
      val tiers = graft.corpus.Curation.TierThresholds
      val whens = tiers.init.zipWithIndex
        .map { case (th, i) => s"WHEN $i THEN '$th'" }.mkString(" ")
      s"""WITH g AS (
  SELECT doc_id, source, substr(md5(text), 1, 8) AS gate,
    CASE CAST(substr(source, 4) AS INTEGER) % ${tiers.size}
      $whens ELSE '${tiers.last}' END AS th
  FROM documents)
SELECT doc_id, source, gate FROM g WHERE gate < th"""
    },

    // x25: per-source composition surviving the x23 gate (CAST keeps SUM out
    // of HUGEINT, which pandas would render as float and fail the compare)
    "x25_mix_report" -> {
      val tiers = graft.corpus.Curation.TierThresholds
      val whens = tiers.init.zipWithIndex
        .map { case (th, i) => s"WHEN $i THEN '$th'" }.mkString(" ")
      s"""WITH g AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
    substr(md5(text), 1, 8) AS gate,
    CASE CAST(substr(source, 4) AS INTEGER) % ${tiers.size}
      $whens ELSE '${tiers.last}' END AS th
  FROM documents)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM g WHERE gate < th GROUP BY 1"""
    },

    // x26: tf·idf keywords — scores rounded to 6 dp BEFORE ranking so the
    // (score desc, token asc) order cannot be flipped by a last-ulp log10
    // difference between engines
    "x26_tfidf_keywords" -> """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n FROM documents),
sc AS (
  SELECT doc_id, w AS token, round(tf * log10(n / df), 6) AS score
  FROM tf JOIN dfreq USING (w) CROSS JOIN nd)
SELECT doc_id, token, score, rn AS "rank" FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
    ORDER BY score DESC, token) AS rn FROM sc)
WHERE rn <= 3""",

    // x27: bigram conditional log-probs, rounded to 8 dp then DECIMAL-summed
    // (x19's order-independence trick); COUNT stays BIGINT on both sides
    "x27_bigram_score" -> """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bl AS (
  SELECT doc_id,
    unnest(CASE WHEN len(ws) >= 2
      THEN list_transform(range(len(ws) - 1),
             i -> {'w1': ws[i+1], 'w2': ws[i+2]})
      ELSE CAST([] AS STRUCT(w1 VARCHAR, w2 VARCHAR)[]) END) AS b
  FROM toks),
bb AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bl),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bb GROUP BY 1, 2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bb GROUP BY 1)
SELECT doc_id, COUNT(*) AS n_bigrams,
  CAST(SUM(CAST(round(log10(c12 / c1), 8) AS DECIMAL(12,8))) AS DOUBLE)
    AS sum_logprob
FROM bb JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY doc_id""",

    // x24: per-source top-3 by the x9 quality score (quality desc, doc_id asc)
    "x24_topk_quality" -> (qualityPrelude(", source") +
      """SELECT source, doc_id, quality, rn AS "rank" FROM (
  SELECT source, doc_id, quality, ROW_NUMBER() OVER (PARTITION BY source
    ORDER BY quality DESC, doc_id) AS rn FROM q)
WHERE rn <= 3"""),

    "x4_simhash" -> (simhashPrelude + "SELECT doc_id, simhash FROM sims"),

    "x5_simhash_pairs" -> (simhashCandidates +
      "SELECT doc_id_1, doc_id_2, hamming FROM cand"),

    // x80: edit-distance verification of the x5 candidates (shared `cand`
    // CTE — the two oracles cannot drift on the candidate set). DuckDB's
    // levenshtein is BYTE-based vs the engine's code points — identical on
    // this ASCII corpus (and the parity fixture); the is_dup verdict is an
    // integer comparison, never a rounded ratio (playbook rule).
    "x80_edit_verify" -> (simhashCandidates +
      s"""SELECT c.doc_id_1, c.doc_id_2, c.hamming,
  CAST(greatest(length(x.text), length(y.text)) AS BIGINT) AS max_len,
  CAST(levenshtein(x.text, y.text) AS BIGINT) AS lev,
  levenshtein(x.text, y.text) * ${graft.corpus.TextDedup.EditDupDen}
    <= greatest(length(x.text), length(y.text)) AS is_dup
FROM cand c JOIN documents x ON c.doc_id_1 = x.doc_id
            JOIN documents y ON c.doc_id_2 = y.doc_id"""),

    // x90: seeded deterministic global shuffle — identity-keyed md5 sort
    // key, exact global rank; the Spark side computes the same rank with
    // fixed 16-bit hash bands instead of a global window
    "x90_training_order" -> {
      val seed = graft.corpus.Curation.ShuffleSeed
      s"""SELECT doc_id,
  md5(concat('$seed', ':', CAST(doc_id AS VARCHAR))) AS sort_key,
  ROW_NUMBER() OVER (
    ORDER BY md5(concat('$seed', ':', CAST(doc_id AS VARCHAR))), doc_id)
    AS position
FROM documents"""
    },

    // x89: MMR-diversified top-k — the x6 cosine base (degenerates excluded
    // on BOTH sides, matching the engine's pool contract), a complete
    // candidate pair-sim table, then the greedy replayed as CHAINED CTEs
    // (the x81 round-replay pattern): step 1 argmax rel, step i argmax
    // rel/2 − max_sim_to_selected/2, all ties on the candidate id.
    "x89_mmr" -> {
      val S = graft.corpus.Similarity
      val steps = (2 to S.DefaultTopK).map { i =>
        s""",
m$i AS (
  SELECT c.qid, c.cid, c.rel, MAX(p.sim) AS ms
  FROM cand c
  JOIN ps p ON p.qid = c.qid AND p.ca = c.cid
  JOIN sel${i - 1} s ON s.qid = p.qid AND s.cid = p.cb
  WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} x
                    WHERE x.qid = c.qid AND x.cid = c.cid)
  GROUP BY 1, 2, 3),
p$i AS (
  SELECT qid, cid, rel, $i AS step, rel / 2 - ms / 2 AS mmr FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY rel / 2 - ms / 2 DESC, cid) AS rn FROM m$i)
  WHERE rn = 1),
sel$i AS (SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM p$i)"""
      }.mkString
      s"""WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
base AS (
  SELECT vec_id, list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw))) AS e
  FROM raw WHERE raw IS NOT NULL AND list_dot_product(raw, raw) > 0),
q AS (SELECT vec_id AS qid, e AS qe FROM base
      WHERE vec_id < ${S.DefaultTopKQueries}),
cand AS (
  SELECT qid, cid, rel, e FROM (
    SELECT qid, vec_id AS cid, list_dot_product(qe, e) AS rel, e,
      ROW_NUMBER() OVER (PARTITION BY qid
        ORDER BY list_dot_product(qe, e) DESC, vec_id) AS rn
    FROM base CROSS JOIN q WHERE vec_id <> qid)
  WHERE rn <= ${S.MmrCandidates}),
ps AS (
  SELECT a.qid, a.cid AS ca, b.cid AS cb, list_dot_product(a.e, b.e) AS sim
  FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid),
sel1 AS (
  SELECT qid, cid, rel, 1 AS step, rel AS mmr FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY rel DESC, cid) AS rn FROM cand)
  WHERE rn = 1)$steps
SELECT qid AS query_id, cid AS neighbor_id, step,
  round(rel, 6) AS relevance, round(mmr, 6) AS mmr_score
FROM sel${S.DefaultTopK}"""
    },

    "x6_cosine_topk" -> cosineTopKSql,

    // x96: x6 re-planned through the bounded topk_pairs aggregate — output
    // pinned bit-identical (TopKPairsSpec), so the oracle IS x6's SQL (the
    // x59/x92 shared-oracle precedent)
    "x96_topk_agg" -> cosineTopKSql,

    "x7_ann_lsh" -> annLshSql,

    // x12: exact upper-triangle cosine near-dup over PRE-NORMALIZED vectors —
    // the same normalize-then-dot operation sequence as the Spark side, so the
    // doubles are bit-identical; threshold on the unrounded value
    "x12_cosine_neardup" -> s"""WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
nrm AS (
  SELECT vec_id,
         CASE WHEN list_dot_product(raw, raw) > 0
         THEN list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw)))
         END AS e
  FROM base WHERE raw IS NOT NULL
  UNION ALL
  SELECT vec_id, NULL AS e FROM base WHERE raw IS NULL),
pr AS (
  -- degenerate (NULL-e) vectors pair with nothing, mirroring the engine:
  -- their NULL cosine fails the >= threshold, so pre-filtering is identity
  -- (it also keeps the join clear of the DuckDB quirk where vectorized
  -- list_dot_product errors on certain chunk layouts mixing NULL and empty
  -- lists — a scalar NULL list alone returns NULL fine)
  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
         list_dot_product(a.e, b.e) AS cos
  FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id
  WHERE a.e IS NOT NULL AND b.e IS NOT NULL)
SELECT vec_id_1, vec_id_2, round(cos, 6) AS cosine FROM pr WHERE cos >= ${graft.corpus.Similarity.DefaultNearDupThreshold}""",

    // x13: IVF with the deterministic first-16 quantizer — assignment and probe
    // ranks replicate the Spark side's (cosine DESC, id ASC) tiebreaks exactly,
    // over the same pre-normalized vectors. Degenerate (NULL-e) vectors are
    // excluded from BOTH index halves, mirroring the engine: annIvf filters
    // ce.isNotNull before collecting centroids, and BestMatch NULLs the
    // assignment struct so the cid equi-join drops the row — without these
    // WHERE clauses the oracle's all-NULL-cosine ORDER BY would fall through
    // to the cid tiebreak and "assign" degenerate vectors to the lowest
    // centroid, emitting NULL-cosine neighbor rows the engine never produces
    "x13_ann_ivf" -> s"""WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
base AS (
  SELECT vec_id, CASE WHEN list_dot_product(raw, raw) > 0
         THEN list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw)))
         END AS e
  FROM raw WHERE raw IS NOT NULL
  UNION ALL
  SELECT vec_id, NULL AS e FROM raw WHERE raw IS NULL),
cents AS (SELECT vec_id AS cid, e AS ce FROM base
  WHERE vec_id < ${graft.corpus.Similarity.DefaultIvfCentroids} AND e IS NOT NULL),
assigned AS (
  SELECT vec_id, e, cid FROM (
    SELECT b.vec_id, b.e, c.cid,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.e, c.ce) DESC, c.cid) AS arank
    FROM base b CROSS JOIN cents c WHERE b.e IS NOT NULL)
  WHERE arank = 1),
probes AS (
  -- a degenerate QUERY vector still probes (engine: NULL dot products rank
  -- by the cid tiebreak, picking the nprobe lowest cells) and emits
  -- NULL-cosine neighbor rows below — guard the dot, don't filter the row
  SELECT qid, qe, cid FROM (
    SELECT q.vec_id AS qid, q.e AS qe, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY CASE WHEN q.e IS NULL THEN NULL
               ELSE list_dot_product(q.e, c.ce) END DESC, c.cid) AS prank
    FROM base q CROSS JOIN cents c WHERE q.vec_id < ${graft.corpus.Similarity.DefaultTopKQueries})
  WHERE prank <= ${graft.corpus.Similarity.DefaultIvfNprobe}),
pr AS (
  SELECT p.qid, a.vec_id AS neighbor_id,
         CASE WHEN p.qe IS NULL THEN NULL
              ELSE list_dot_product(p.qe, a.e) END AS cos
  FROM probes p JOIN assigned a ON p.cid = a.cid AND a.vec_id <> p.qid)
SELECT qid, neighbor_id, rn AS "rank", round(cos, 6) AS cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rn
  FROM pr)
WHERE rn <= ${graft.corpus.Similarity.DefaultTopK}""",

    "x8_lang_id" -> langIdSql,

    "x9_quality" -> qualitySql,

    "x10_token_stats" -> s"""SELECT doc_id,
  len(string_split(text, ' ')) AS ws_tokens,
  len(regexp_extract_all(text, '${TextStats.TokenPattern}')) AS bpe_tokens,
  round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 6) AS chars_per_token
FROM documents""",

    "x11_winnow" -> """WITH g AS (
  SELECT doc_id, text, unnest(range(1, length(text) - 3)) AS pos
  FROM documents WHERE length(text) >= 5),
gh AS (
  SELECT doc_id, pos, md5(substr(text, CAST(pos AS INTEGER), 5)) AS gh FROM g),
sel AS (
  SELECT doc_id,
    MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS sel
  FROM gh)
SELECT doc_id, COUNT(DISTINCT sel) AS n_fingerprints, MIN(sel) AS min_fingerprint
FROM sel GROUP BY doc_id""",

    "m1_media_meta" -> """WITH a AS (
  SELECT doc_id, md5(text) AS hx, octet_length(encode(text)) AS n_bytes FROM documents)
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
       WHEN doc_id % 3 = 1 THEN 'audio/wav'
       ELSE 'video/mp4' END AS mime,
  n_bytes,
  16 * strpos('0123456789abcdef', substr(hx, 1, 1)) AS width,
  16 * strpos('0123456789abcdef', substr(hx, 2, 1)) AS height,
  strpos('0123456789abcdef', substr(hx, 3, 1)) AS n_frames,
  least(strpos('0123456789abcdef', substr(hx, 3, 1)), 4) AS sampled_frames
FROM a""",

    // x19: per-token log-probs rounded to 8 dp then DECIMAL-summed — exact and
    // order-independent, so both engines' aggregation orders agree
    "x19_unigram_score" ->
      """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
counts AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT SUM(cnt) AS total FROM counts)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CAST(round(log10(cnt / total), 8) AS DECIMAL(12,8))) AS DOUBLE)
         AS sum_logprob
FROM tok JOIN counts USING (w) CROSS JOIN tot
GROUP BY doc_id""",

    "x18_vocabulary" ->
      """SELECT w AS token, COUNT(*) AS n_occurrences,
         COUNT(DISTINCT doc_id) AS n_docs
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       GROUP BY 1 ORDER BY n_occurrences DESC, token LIMIT 20""",

    // x16: stopword list generated from the SAME Scala values the operator uses
    "x16_stopword_scrub" -> {
      val all = TextStats.Stopwords.flatMap(_._2).map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
k AS (
  SELECT doc_id, ws, list_filter(ws, w -> NOT list_contains([$all], w)) AS kept
  FROM t)
SELECT doc_id, len(ws) - len(kept) AS n_removed,
       array_to_string(kept, ' ') AS clean_text
FROM k"""
    },

    // x17: per-column profile — one UNION ALL branch per column (the oracle may
    // scan thrice; the Spark side must not)
    "x17_profile" -> Seq("l_quantity", "l_extendedprice", "l_discount").map(c =>
      s"""SELECT '$c' AS "column", COUNT($c) AS n_values,
         COUNT(*) - COUNT($c) AS n_nulls,
         COUNT(DISTINCT $c) AS n_distinct,
         CAST(MIN($c) AS DOUBLE) AS min_value, CAST(MAX($c) AS DOUBLE) AS max_value
       FROM lineitem""").mkString("\nUNION ALL\n"),

    // m4: aspect-preserving fit-in-128x96 plan, integer cross-multiplication
    "m4_resize_plan" -> """WITH a AS (
  SELECT doc_id, md5(text) AS hx FROM documents),
m AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
         WHEN doc_id % 3 = 1 THEN 'audio/wav'
         ELSE 'video/mp4' END AS mime,
    16 * strpos('0123456789abcdef', substr(hx, 1, 1)) AS width,
    16 * strpos('0123456789abcdef', substr(hx, 2, 1)) AS height
  FROM a),
p AS (
  SELECT m.*, (height * 128) // width AS by_w_h,
         (width <= 128 AND height <= 96) AS fits
  FROM m)
SELECT doc_id, mime, width, height,
  CASE WHEN fits THEN width
       WHEN by_w_h <= 96 THEN 128
       ELSE (width * 96) // height END AS out_width,
  CASE WHEN fits THEN height
       WHEN by_w_h <= 96 THEN by_w_h
       ELSE 96 END AS out_height,
  (CASE WHEN fits THEN width
        WHEN by_w_h <= 96 THEN 128
        ELSE (width * 96) // height END) *
  (CASE WHEN fits THEN height
        WHEN by_w_h <= 96 THEN by_w_h
        ELSE 96 END) AS out_pixels
FROM p""",

    // m3: integer `div`/`//` on both sides, so frame addressing is exact
    "m3_frame_sample" -> """WITH a AS (
  SELECT doc_id, md5(text) AS hx, octet_length(encode(text)) AS n_bytes FROM documents),
m AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
         WHEN doc_id % 3 = 1 THEN 'audio/wav'
         ELSE 'video/mp4' END AS mime,
    n_bytes,
    strpos('0123456789abcdef', substr(hx, 3, 1)) AS n_frames,
    least(strpos('0123456789abcdef', substr(hx, 3, 1)), 4) AS sampled_frames
  FROM a),
s AS (
  SELECT m.*, k.sample_idx,
         (k.sample_idx * n_frames) // sampled_frames AS frame_no
  FROM m JOIN (SELECT unnest(range(4)) AS sample_idx) k
    ON k.sample_idx < m.sampled_frames)
SELECT doc_id, mime, sample_idx, frame_no,
       (frame_no * n_bytes) // n_frames AS frame_offset,
       ((frame_no + 1) * n_bytes) // n_frames
         - (frame_no * n_bytes) // n_frames AS frame_len
FROM s""",

    // x60: Okapi BM25 top-k — all constants (slice mod, k1, b, k1+1, 1-b,
    // top-k) interpolated from the Retrieval object's Scala doubles
    // (Double.toString round-trips bit-exactly), per-term contributions
    // rounded to 6 dp then DECIMAL-summed (x19's order-independence trick)
    "x60_bm25" -> bm25Sql,
    "x87_rm3" -> rm3Sql,
    // x92: RM3 over the persisted postings + index artifacts — scored
    // against the same corpus the artifacts digest, output is pinned
    // identical to the self-contained x87 (the x51 parity discipline),
    // so the oracle IS x87's SQL
    "x92_rm3_against" -> rm3Sql,

    // x93: denoised hard-negative mining — pool = exact top-kCand cosine
    // candidates excluding self (degenerate vectors out on BOTH sides, the
    // keepDegenerate=false contract), positive = pool rank 1, negatives
    // re-ranked over survivors of the margin gate `cos <= pos_cos - margin`
    // (raw-double compare: both engines derive the cosines from the same
    // normalize-then-dot fold and the subtraction is one shared IEEE op)
    "x93_hard_negatives" -> s"""WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
nz AS (
  SELECT vec_id, list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw))) AS e
  FROM raw WHERE raw IS NOT NULL AND list_dot_product(raw, raw) > 0),
q AS (SELECT vec_id AS qid, e AS qe FROM nz
      WHERE vec_id < ${graft.corpus.Similarity.DefaultTopKQueries}),
pool AS (
  SELECT qid, vec_id AS cid, list_dot_product(qe, e) AS cos
  FROM nz CROSS JOIN q WHERE vec_id <> qid),
cand AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
  FROM pool
  QUALIFY rnk <= ${graft.corpus.Similarity.HardNegCandidates}),
pos AS (SELECT qid, cid AS pos_id, cos AS pos_cos FROM cand WHERE rnk = 1),
neg AS (
  SELECT c.qid, p.pos_id, p.pos_cos, c.cid, c.cos,
         ROW_NUMBER() OVER (PARTITION BY c.qid ORDER BY c.cos DESC, c.cid) AS nrank
  FROM cand c JOIN pos p ON c.qid = p.qid
  WHERE c.rnk > 1 AND c.cos <= p.pos_cos - ${graft.corpus.Similarity.HardNegMargin})
SELECT qid AS query_id, pos_id, round(pos_cos, 6) AS pos_cos,
       cid AS neg_id, nrank AS "rank", round(cos, 6) AS cos
FROM neg WHERE nrank <= ${graft.corpus.Similarity.DefaultTopK}""",

    // x94: recall@k of the default IVF generator vs the exact baseline —
    // exact side is x6's contract verbatim (degenerate queries keep their
    // tiebreak rows, visible recall 0); approx side is x13's probe
    // machinery restricted to non-degenerate queries (the generator's
    // query frame drops NULL-e rows), self excluded, non-self rank <= k
    "x94_dense_recall" -> {
      val nq = graft.corpus.Similarity.DefaultTopKQueries
      val k = graft.corpus.Similarity.DefaultTopK
      s"""WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings),
base AS (
  SELECT vec_id, CASE WHEN list_dot_product(raw, raw) > 0
         THEN list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw)))
         END AS e
  FROM raw WHERE raw IS NOT NULL
  UNION ALL
  SELECT vec_id, NULL AS e FROM raw WHERE raw IS NULL),
cents AS (SELECT vec_id AS cid, e AS ce FROM base
  WHERE vec_id < ${graft.corpus.Similarity.DefaultIvfCentroids} AND e IS NOT NULL),
assigned AS (
  SELECT vec_id, e, cid FROM (
    SELECT b.vec_id, b.e, c.cid,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.e, c.ce) DESC, c.cid) AS arank
    FROM base b CROSS JOIN cents c WHERE b.e IS NOT NULL)
  WHERE arank = 1),
probes AS (
  SELECT qid, qe, cid FROM (
    SELECT q.vec_id AS qid, q.e AS qe, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.e, c.ce) DESC, c.cid) AS prank
    FROM base q CROSS JOIN cents c
    WHERE q.vec_id < $nq AND q.e IS NOT NULL)
  WHERE prank <= ${graft.corpus.Similarity.DefaultIvfNprobe}),
approx AS (
  SELECT qid, neighbor_id FROM (
    SELECT p.qid, a.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.qid
             ORDER BY list_dot_product(p.qe, a.e) DESC, a.vec_id) AS rn
    FROM probes p JOIN assigned a ON p.cid = a.cid AND a.vec_id <> p.qid)
  WHERE rn <= $k),
xq AS (SELECT vec_id AS qid, e AS qe FROM base WHERE vec_id < $nq),
xpr AS (
  SELECT qid, vec_id AS neighbor_id,
         CASE WHEN qe IS NULL OR e IS NULL THEN NULL
              ELSE list_dot_product(qe, e) END AS cos
  FROM base CROSS JOIN xq WHERE vec_id <> qid),
exact AS (
  SELECT qid, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY cos DESC, neighbor_id) AS rn FROM xpr)
  WHERE rn <= $k),
hit AS (
  SELECT e.qid, COUNT(*) AS hits
  FROM exact e JOIN approx p
    ON e.qid = p.qid AND e.neighbor_id = p.neighbor_id
  GROUP BY 1)
SELECT u.qid, COALESCE(hits, 0) AS hits,
       CAST(COALESCE(hits, 0) AS DOUBLE)/$k.0 AS recall
FROM (SELECT DISTINCT vec_id AS qid FROM embeddings WHERE vec_id < $nq) u
LEFT JOIN hit USING (qid)"""
    },

    // x65: the ingest gate's best-query-per-document decision over the
    // same score CTEs
    "x65_relevance_gate" -> bm25GateSql,

    // x61: BPE merge-pair counts over the distinct-word frequency table;
    // x18's (count desc, lexicographic) top-k contract
    "x61_bpe_pairs" -> {
      val topK = TextStats.BpeTopK
      s"""WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
wf AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY 1),
pr AS (
  SELECT substr(w, CAST(i + 1 AS INTEGER), 1) AS left_sym,
         substr(w, CAST(i + 2 AS INTEGER), 1) AS right_sym, freq
  FROM (SELECT w, freq, unnest(range(len(w) - 1)) AS i
        FROM wf WHERE len(w) >= 2))
SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS n_occurrences
FROM pr GROUP BY 1, 2
ORDER BY n_occurrences DESC, left_sym, right_sym LIMIT $topK"""
    },

    // x62: stratified k-sample — the namespaced md5 sample key from the SAME
    // Scala prefix constant, (key, doc_id) order, k per source
    "x62_stratified_sample" -> {
      val p = graft.corpus.Curation.SampleKeyPrefix
      val k = graft.corpus.Curation.SamplePerSource
      s"""SELECT source, doc_id, sample_key, rn AS "rank" FROM (
  SELECT source, doc_id,
         md5('$p' || CAST(doc_id AS VARCHAR)) AS sample_key,
         ROW_NUMBER() OVER (PARTITION BY source
           ORDER BY md5('$p' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= $k"""
    },

    // x63: kNN label transfer — normalize-then-dot in the engine's operation
    // order (bit-identical doubles), degenerate vectors dropped on BOTH
    // sides, vote ties to the smaller label
    "x63_knn_labels" -> {
      val m = graft.corpus.Similarity.KnnHoldoutMod
      val k = graft.corpus.Similarity.KnnK
      s"""WITH raw AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings
  WHERE embedding IS NOT NULL),
base AS (
  SELECT vec_id, label,
    CASE WHEN list_dot_product(raw, raw) > 0
         THEN list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw)))
         END AS e
  FROM raw),
nn AS (SELECT * FROM base WHERE e IS NOT NULL),
q AS (SELECT vec_id AS qid, e AS qe, label AS actual_label
      FROM nn WHERE vec_id % $m = 0),
c AS (SELECT vec_id, e, label FROM nn
      WHERE vec_id % $m <> 0 AND label IS NOT NULL),
pr AS (
  SELECT qid, actual_label, label, vec_id,
         list_dot_product(qe, e) AS cos
  FROM c CROSS JOIN q),
topk AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY cos DESC, vec_id) AS rn FROM pr)
  WHERE rn <= $k),
votes AS (
  SELECT qid, actual_label, label, COUNT(*) AS n_votes
  FROM topk GROUP BY 1, 2, 3)
SELECT qid AS vec_id, label AS predicted_label, actual_label, n_votes,
       (label = actual_label) AS agree
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
    ORDER BY n_votes DESC, label) AS vr FROM votes)
WHERE vr = 1"""
    },

    "x66_pq_codes" -> (pqPrelude +
      "\nSELECT vec_id, s AS subspace, code FROM enc"),

    "x67_pq_ann" -> (pqPrelude + pqAnnCtes +
      s"""
SELECT qid, neighbor_id, rn AS "rank",
       CAST(micro AS DOUBLE)/1000000.0 AS score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
        ORDER BY micro DESC, neighbor_id) AS rn FROM sc)
WHERE rn <= ${graft.corpus.Quantization.DefaultTopK}"""),

    "x69_pq_rerank" -> {
      val k = graft.corpus.Quantization.DefaultTopK
      val r = k * graft.corpus.Quantization.DefaultRerankDepth
      val dim = graft.corpus.Quantization.DefaultDim
      pqPrelude + pqAnnCtes + s""",
cands AS (
  SELECT qid, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY micro DESC, neighbor_id) AS rn FROM sc)
  WHERE rn <= $r),
-- only the candidate rows touch full vectors (the re-rank contract);
-- b is enc's population, so cos is never NULL here
rr AS (
  SELECT c.qid, c.neighbor_id, list_dot_product(q.qe, b.e) AS cos
  FROM cands c
  JOIN (SELECT vec_id, e FROM base
        WHERE e IS NOT NULL AND len(e) = $dim) b
    ON c.neighbor_id = b.vec_id
  JOIN q ON c.qid = q.qid)
SELECT qid, neighbor_id, rn AS "rank", round(cos, 6) AS cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
        ORDER BY cos DESC, neighbor_id) AS rn FROM rr)
WHERE rn <= $k"""
    },

    "x70_ivf_pq" -> {
      val k = graft.corpus.Quantization.DefaultTopK
      val cN = graft.corpus.Similarity.DefaultIvfCentroids
      val nprobe = graft.corpus.Similarity.DefaultIvfNprobe
      val dim = graft.corpus.Quantization.DefaultDim
      pqPrelude + pqLutCtes + s""",
cent AS (
  SELECT vec_id AS cid, e AS ce2 FROM base
  WHERE vec_id < $cN AND e IS NOT NULL AND len(e) = $dim),
-- corpus cell assignment: max cosine, ties to the lowest cid (the x13
-- BestMatch contract)
asg AS (
  SELECT vec_id, cid FROM (
    SELECT b.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.e, c.ce2) DESC, c.cid) AS rn
    FROM (SELECT * FROM base WHERE e IS NOT NULL AND len(e) = $dim) b
    CROSS JOIN cent c) WHERE rn = 1),
-- per query, its nprobe closest cells (same fold, same tiebreak)
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.qid
             ORDER BY list_dot_product(q.qe, c.ce2) DESC, c.cid) AS rn
    FROM q CROSS JOIN cent c) WHERE rn <= $nprobe),
scx AS (
  SELECT probes.qid, enc.vec_id AS neighbor_id, SUM(micro) AS micro
  FROM enc
  JOIN asg ON enc.vec_id = asg.vec_id
  JOIN probes ON asg.cid = probes.cid
  JOIN lut ON enc.s = lut.s AND enc.code = lut.c AND lut.qid = probes.qid
  WHERE enc.vec_id <> probes.qid
  GROUP BY 1, 2)
SELECT qid, neighbor_id, rn AS "rank",
       CAST(micro AS DOUBLE)/1000000.0 AS score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
        ORDER BY micro DESC, neighbor_id) AS rn FROM scx)
WHERE rn <= $k"""
    },

    // x98: the x94 recall audit pointed at the IVF-PQ ADC generator — the
    // x70 candidate machinery (coarse cells, probes, integer-micro ADC)
    // cut at the generator's top-k, scored against the x6-contract exact
    // baseline with x94's query-universe tail (degenerate queries = a
    // visible recall 0, never a dropped row)
    "x98_adc_recall" -> {
      val nq = graft.corpus.Similarity.DefaultTopKQueries
      val k = graft.corpus.Similarity.DefaultTopK
      val cN = graft.corpus.Similarity.DefaultIvfCentroids
      val nprobe = graft.corpus.Similarity.DefaultIvfNprobe
      val dim = graft.corpus.Quantization.DefaultDim
      pqPrelude + pqLutCtes + s""",
cent AS (
  SELECT vec_id AS cid, e AS ce2 FROM base
  WHERE vec_id < $cN AND e IS NOT NULL AND len(e) = $dim),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT b.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.e, c.ce2) DESC, c.cid) AS rn
    FROM (SELECT * FROM base WHERE e IS NOT NULL AND len(e) = $dim) b
    CROSS JOIN cent c) WHERE rn = 1),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.qid
             ORDER BY list_dot_product(q.qe, c.ce2) DESC, c.cid) AS rn
    FROM q CROSS JOIN cent c) WHERE rn <= $nprobe),
scx AS (
  SELECT probes.qid, enc.vec_id AS neighbor_id, SUM(micro) AS micro
  FROM enc
  JOIN asg ON enc.vec_id = asg.vec_id
  JOIN probes ON asg.cid = probes.cid
  JOIN lut ON enc.s = lut.s AND enc.code = lut.c AND lut.qid = probes.qid
  WHERE enc.vec_id <> probes.qid
  GROUP BY 1, 2),
approx AS (
  SELECT qid, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY micro DESC, neighbor_id) AS rn FROM scx)
  WHERE rn <= $k),
xq AS (SELECT vec_id AS qid, e AS qe FROM base WHERE vec_id < $nq),
xpr AS (
  SELECT qid, vec_id AS neighbor_id,
         CASE WHEN qe IS NULL OR e IS NULL THEN NULL
              ELSE list_dot_product(qe, e) END AS cos
  FROM base CROSS JOIN xq WHERE vec_id <> qid),
exact AS (
  SELECT qid, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY cos DESC, neighbor_id) AS rn FROM xpr)
  WHERE rn <= $k),
hit AS (
  SELECT e.qid, COUNT(*) AS hits
  FROM exact e JOIN approx p
    ON e.qid = p.qid AND e.neighbor_id = p.neighbor_id
  GROUP BY 1)
SELECT u.qid, COALESCE(hits, 0) AS hits,
       CAST(COALESCE(hits, 0) AS DOUBLE)/$k.0 AS recall
FROM (SELECT DISTINCT vec_id AS qid FROM embeddings WHERE vec_id < $nq) u
LEFT JOIN hit USING (qid)"""
    },

    "x68_pq_recall" -> {
      val nq = graft.corpus.Quantization.DefaultQueries
      val k = graft.corpus.Quantization.DefaultTopK
      pqPrelude + pqAnnCtes + s""",
prq AS (
  SELECT qid, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY micro DESC, neighbor_id) AS rn FROM sc)
  WHERE rn <= $k),
-- exact-cosine baseline, the x6 contract verbatim: degenerate queries
-- KEEP their k rows (NULL cosine, neighbor_id tiebreak) so their recall
-- is a visible 0, not a dropped row
xq AS (SELECT vec_id AS qid, e AS qe FROM base WHERE vec_id < $nq),
xpr AS (
  SELECT qid, vec_id AS neighbor_id,
         CASE WHEN qe IS NULL OR e IS NULL THEN NULL
              ELSE list_dot_product(qe, e) END AS cos
  FROM base CROSS JOIN xq WHERE vec_id <> qid),
exact AS (
  SELECT qid, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY cos DESC, neighbor_id) AS rn FROM xpr)
  WHERE rn <= $k),
hit AS (
  SELECT e.qid, COUNT(*) AS hits
  FROM exact e JOIN prq p
    ON e.qid = p.qid AND e.neighbor_id = p.neighbor_id
  GROUP BY 1)
SELECT u.qid, COALESCE(hits, 0) AS hits,
       CAST(COALESCE(hits, 0) AS DOUBLE)/$k.0 AS recall
FROM (SELECT DISTINCT qid FROM exact) u LEFT JOIN hit USING (qid)"""
    },

    // x71: hybrid RRF — the x60 BM25 CTEs verbatim for the lexical list, the
    // x6 normalize-then-dot doubles for the dense list, fused by
    // 1/(rrfK+rank) contributions added in fixed lexical-then-dense order
    // (each term one exact IEEE division, so the engines cannot drift)
    "x71_hybrid_rrf" -> {
      val R = graft.corpus.Retrieval
      val kc = R.DefaultFusionCandidates
      val k = R.DefaultTopK
      val rk = R.RrfK
      bm25ScPrelude() + s""",
lex AS (
  SELECT query_id, doc_id, rn AS lex_rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY score DESC, doc_id) AS rn FROM sc)
  WHERE rn <= $kc),
$embBase,
vb AS (SELECT vec_id, e FROM base WHERE e IS NOT NULL),
vq AS (SELECT vec_id AS query_id, e AS qe FROM vb
       WHERE vec_id % ${R.QueryMod} = 0
         AND vec_id < ${R.QueryMod * R.QueryCount}),
vc AS (SELECT vec_id, e FROM vb
       WHERE NOT (vec_id % ${R.QueryMod} = 0
                  AND vec_id < ${R.QueryMod * R.QueryCount})),
dense AS (
  SELECT query_id, doc_id, rn AS dense_rank FROM (
    SELECT vq.query_id, vc.vec_id AS doc_id,
           ROW_NUMBER() OVER (PARTITION BY vq.query_id
             ORDER BY list_dot_product(qe, e) DESC, vc.vec_id) AS rn
    FROM vc CROSS JOIN vq)
  WHERE rn <= $kc),
fused AS (
  SELECT COALESCE(lex.query_id, dense.query_id) AS query_id,
         COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
         COALESCE(lex.lex_rank, 0) AS lex_rank,
         COALESCE(dense.dense_rank, 0) AS dense_rank,
         COALESCE(CAST(1 AS DOUBLE) / ($rk + lex.lex_rank), 0) +
         COALESCE(CAST(1 AS DOUBLE) / ($rk + dense.dense_rank), 0) AS rrf
  FROM lex FULL OUTER JOIN dense
    ON lex.query_id = dense.query_id AND lex.doc_id = dense.doc_id)
SELECT query_id, doc_id, lex_rank, dense_rank, round(rrf, 6) AS rrf_score,
       rn AS "rank"
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY rrf DESC, doc_id) AS rn FROM fused)
WHERE rn <= $k"""
    },

    // x73: hybrid ingest gate — x65's BM25 gate CTEs (best sheet query per
    // doc) + x42's benchmark argmax, left-joined onto the bench-excluded
    // input with the engine's −1-id/0.0 sentinels. `relevant` via presence
    // in sc is now UNCONDITIONALLY the gate kernel's n_terms>0: the kernel's
    // score ties prefer matchful queries, so any document with a matching
    // posting has a matchful best query even when every contribution rounds
    // to 0.000000. Out of oracle scope (the parity_fixture.py doctrine):
    // dimension-mismatched embeddings — DuckDB's list_dot_product raises on
    // unequal lengths, so `screenable` here is the e-IS-NOT-NULL half only;
    // the engine's dim-mismatch quarantine is pinned engine-side
    // (VectorOpsSpec / BestMatch's NULL-struct contract).
    "x73_hybrid_gate" -> {
      val R = graft.corpus.Retrieval
      val S = graft.corpus.Semantic
      val benchMod = S.DecontamBenchMod
      val tau = S.DecontamTau
      bm25ScPrelude(R.GateQueryCount) + s""",
best AS (
  SELECT query_id, doc_id, n_terms, score FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      ORDER BY score DESC, query_id) AS rn FROM sc) WHERE rn = 1),
$embBase,
bench AS (SELECT vec_id AS bench_id, e AS be FROM base
          WHERE vec_id % $benchMod = 0 AND e IS NOT NULL),
inp AS (
  SELECT c.doc_id, b.e FROM corpus c
  JOIN base b ON c.doc_id = b.vec_id
  WHERE c.doc_id % $benchMod <> 0),
dm AS (
  SELECT doc_id, bench_id, cos FROM (
    SELECT inp.doc_id, bench.bench_id,
           list_dot_product(inp.e, bench.be) AS cos,
           ROW_NUMBER() OVER (PARTITION BY inp.doc_id
             ORDER BY list_dot_product(inp.e, bench.be) DESC,
                      bench.bench_id) AS rn
    FROM inp CROSS JOIN bench WHERE inp.e IS NOT NULL) WHERE rn = 1)
SELECT inp.doc_id,
       COALESCE(best.query_id, -1) AS query_id,
       COALESCE(best.score, 0.0) AS score,
       COALESCE(best.n_terms, 0) AS n_terms,
       COALESCE(dm.bench_id, -1) AS bench_id,
       round(COALESCE(dm.cos, 0.0), 6) AS bench_cosine,
       best.doc_id IS NOT NULL AS relevant,
       COALESCE(dm.cos >= $tau, FALSE) AS contaminated,
       inp.e IS NOT NULL AS screenable,
       (best.doc_id IS NOT NULL AND NOT COALESCE(dm.cos >= $tau, FALSE)
        AND inp.e IS NOT NULL) AS keep
FROM inp LEFT JOIN best ON inp.doc_id = best.doc_id
         LEFT JOIN dm ON inp.doc_id = dm.doc_id"""
    },

    // x74: SQ8 encode — per-dimension (min, max−min) stats over the healthy
    // normalized corpus, code = clamp₀²⁵⁵(round(((v−mn)/d)·255)) in the
    // engine's exact operation order (v ≥ mn by construction, so rounding
    // is positive-half-up in both engines); constant dims code 0
    "x74_sq8_codes" -> (sq8Prelude + "\nSELECT vec_id, s, code FROM enc"),

    // x75: SQ8 ADC — the dequantized dot factored exactly as the engine
    // does: qconst = ⟨q, mins⟩ plus ⟨(q_s·d_s/255)_s, codes⟩, both dots the
    // same left-to-right fold over the same doubles
    "x75_sq8_ann" -> {
      val dim = graft.corpus.Quantization.DefaultDim
      val nq = graft.corpus.Quantization.DefaultQueries
      val k = graft.corpus.Quantization.DefaultTopK
      sq8Prelude + s""",
codesl AS (SELECT vec_id, list(code ORDER BY s) AS codes
           FROM enc GROUP BY vec_id),
sl AS (SELECT list(mn ORDER BY s) AS ml, list(d ORDER BY s) AS dl
       FROM stats),
q AS (
  SELECT vec_id AS qid,
         list_dot_product(e, ml) AS qconst,
         list_transform(range($dim), i -> e[i+1] * dl[i+1] / 255) AS qs
  FROM cb CROSS JOIN sl WHERE vec_id < $nq),
sc AS (
  SELECT qid, c.vec_id AS neighbor_id,
         list_dot_product(qs, CAST(codes AS DOUBLE[])) + qconst AS sc
  FROM codesl c CROSS JOIN q WHERE c.vec_id <> qid)
SELECT qid, neighbor_id, rn AS "rank", round(sc, 6) AS score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
        ORDER BY sc DESC, neighbor_id) AS rn FROM sc)
WHERE rn <= $k"""
    },

    // x72: truncated-dim two-stage ANN — stage-1 shortlist by prefix dot on
    // the SAME unit-normalized doubles (DuckDB's e[1:d'] slice = the
    // engine's slice(e, 1, d'), both 1-based leading windows), stage-2
    // exact full-dim re-rank restricted to the shortlist
    "x72_trunc_ann" -> {
      val nq = graft.corpus.Similarity.DefaultTopKQueries
      val k = graft.corpus.Similarity.DefaultTopK
      val dp = graft.corpus.Similarity.DefaultTruncDim
      val m = graft.corpus.Similarity.DefaultTruncShortlist
      s"""WITH $embBase,
vb AS (SELECT vec_id, e FROM base WHERE e IS NOT NULL),
q AS (SELECT vec_id AS qid, e AS qe FROM vb WHERE vec_id < $nq),
cand AS (
  SELECT qid, vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY qid
           ORDER BY list_dot_product(qe[1:$dp], e[1:$dp]) DESC,
                    vec_id) AS srank,
         list_dot_product(qe, e) AS cos
  FROM vb CROSS JOIN q WHERE vec_id <> qid)
SELECT qid, neighbor_id, rn AS "rank", round(cos, 6) AS cosine
FROM (SELECT qid, neighbor_id, cos,
        ROW_NUMBER() OVER (PARTITION BY qid
          ORDER BY cos DESC, neighbor_id) AS rn
      FROM cand WHERE srank <= $m)
WHERE rn <= $k"""
    }
  )

  /** SQ8 CTE chain (x74/x75): per-dimension stats over the healthy
    * normalized corpus (`cb`), 1-based `generate_subscripts` aligned back
    * to the engine's 0-based posexplode via `s - 1`; `stats(s, mn, d)`
    * keeps the 1-based key for the list() re-assembly in x75. */
  private def sq8Prelude: String = {
    val dim = graft.corpus.Quantization.DefaultDim
    s"""WITH $embBase,
cb AS (SELECT vec_id, e FROM base WHERE e IS NOT NULL AND len(e) = $dim),
stats AS (
  SELECT s, MIN(v) AS mn, MAX(v) - MIN(v) AS d FROM (
    SELECT unnest(e) AS v, generate_subscripts(e, 1) AS s FROM cb)
  GROUP BY s),
enc AS (
  SELECT vec_id, s - 1 AS s,
         CASE WHEN d > 0 THEN LEAST(255, GREATEST(0,
           CAST(round((v - mn) / d * 255, 0) AS BIGINT)))
         ELSE 0 END AS code
  FROM (SELECT vec_id, unnest(e) AS v, generate_subscripts(e, 1) AS s
        FROM cb) ev JOIN stats USING (s))"""
  }

  /** PQ encode CTE chain (x66/x67/x68): deterministic slice codebooks from
    * the first-ksub seed convention; argmin squared-L2 per (vector,
    * subspace) in the expanded `(‖x‖²+‖c‖²)−2⟨x,c⟩` form — the exact
    * operation sequence of [[graft.functions.PqEncode]], so near-tie argmins
    * cannot drift. Geometry (m, ksub, dim) interpolated from
    * [[graft.corpus.Quantization]]'s constants. */
  private def pqPrelude: String = {
    val m = graft.corpus.Quantization.DefaultSubspaces
    val ksub = graft.corpus.Quantization.DefaultCodewords
    val dim = graft.corpus.Quantization.DefaultDim
    val dsub = dim / m
    s"""WITH $embBase,
seeds AS (
  -- codeword index = POSITION among surviving seeds (vec_id order), not
  -- the seed's vec_id: the engine's codebook array is dense, so a
  -- degenerate seed inside [0, ksub) compacts the indices after it
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, e FROM base
  WHERE vec_id < $ksub AND e IS NOT NULL AND len(e) = $dim),
subs AS (SELECT unnest(range($m)) AS s),
cb AS (
  SELECT s, c, e[(s*$dsub+1):((s+1)*$dsub)] AS ce
  FROM seeds CROSS JOIN subs),
vs AS (
  SELECT vec_id, s, e[(s*$dsub+1):((s+1)*$dsub)] AS ve
  FROM (SELECT * FROM base WHERE e IS NOT NULL AND len(e) = $dim)
  CROSS JOIN subs),
enc AS (
  SELECT vec_id, s, c AS code FROM (
    SELECT v.vec_id, v.s, cb.c,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.s
             ORDER BY (list_dot_product(ve, ve) + list_dot_product(ce, ce))
                      - 2*list_dot_product(ve, ce), cb.c) AS rn
    FROM vs v JOIN cb ON v.s = cb.s) WHERE rn = 1)"""
  }

  /** Per-query ADC lookup-table CTEs on top of [[pqPrelude]]: 6-dp
    * micro-unit LUTs (the x19 round-then-exact-sum trick in integer form) —
    * `q(qid, qe)`, `lut(qid, s, c, micro)`. */
  private def pqLutCtes: String = {
    val nq = graft.corpus.Quantization.DefaultQueries
    val dim = graft.corpus.Quantization.DefaultDim
    val m = graft.corpus.Quantization.DefaultSubspaces
    val dsub = dim / m
    s""",
q AS (
  SELECT vec_id AS qid, e AS qe FROM base
  WHERE vec_id < $nq AND e IS NOT NULL AND len(e) = $dim),
qs AS (
  SELECT qid, s, qe[(s*$dsub+1):((s+1)*$dsub)] AS qse
  FROM q CROSS JOIN subs),
lut AS (
  SELECT qid, qs.s, c,
         CAST(CAST(round(list_dot_product(qse, ce), 6) AS DECIMAL(14,6))
              * 1000000 AS BIGINT) AS micro
  FROM qs JOIN cb ON qs.s = cb.s)"""
  }

  /** [[pqLutCtes]] plus the UNRESTRICTED per-(query, vector) micro-score
    * sum — `sc(qid, neighbor_id, micro)` (x67/x68/x69's candidate set). */
  private def pqAnnCtes: String = pqLutCtes + s""",
sc AS (
  SELECT lut.qid, enc.vec_id AS neighbor_id, SUM(micro) AS micro
  FROM enc JOIN lut ON enc.s = lut.s AND enc.code = lut.c
  WHERE enc.vec_id <> lut.qid
  GROUP BY 1, 2)"""

  /** x60/x65 shared CTE chain — Okapi BM25: the query sheet's distinct
    * terms against the corpus postings, Lucene-shape idf, 6-dp-rounded
    * DECIMAL-summed contributions, ending at `sc` (query_id, doc_id,
    * n_terms, score). */
  private def bm25ScPrelude(queryCount: Long =
      graft.corpus.Retrieval.QueryCount): String = {
    val R = graft.corpus.Retrieval
    // the CORPUS always excludes the full x60 sheet (the engine's
    // sheet-excluded index convention); only qdocs narrows to `queryCount`
    s"""WITH corpus AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE NOT (doc_id % ${R.QueryMod} = 0
             AND doc_id < ${R.QueryMod * R.QueryCount})),
qdocs AS (
  SELECT doc_id AS qid, string_split(text, ' ') AS ws FROM documents
  WHERE doc_id % ${R.QueryMod} = 0
    AND doc_id < ${R.QueryMod * queryCount}),
qt AS (SELECT DISTINCT qid, unnest(ws) AS w FROM qdocs),
qw AS (SELECT DISTINCT w FROM qt),
ctok AS (
  SELECT doc_id, len(ws) AS dl, unnest(ws) AS w FROM corpus),
tf AS (
  SELECT doc_id, dl, w, COUNT(*) AS tf
  FROM ctok JOIN qw USING (w) GROUP BY 1, 2, 3),
dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
st AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(len(ws)) AS DOUBLE) / COUNT(*) AS avgdl
  FROM corpus),
terms AS (
  SELECT qid, doc_id,
    round(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
      ((tf * ${R.K1Plus1}) /
       (tf + ${R.BM25K1} * (${R.OneMinusB} + ${R.BM25B} * (dl / avgdl)))),
      6) AS t
  FROM tf JOIN dfreq USING (w) JOIN qt USING (w) CROSS JOIN st),
sc AS (
  SELECT qid AS query_id, doc_id, COUNT(*) AS n_terms,
         CAST(SUM(CAST(t AS DECIMAL(14,6))) AS DOUBLE) AS score
  FROM terms GROUP BY 1, 2)"""
  }

  private def bm25Sql: String = bm25ScPrelude() + s"""
SELECT query_id, doc_id, n_terms, score, rn AS "rank" FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY score DESC, doc_id) AS rn FROM sc)
WHERE rn <= ${graft.corpus.Retrieval.DefaultTopK}"""

  /** x87 — RM3 on top of the x60 CTE chain: top-fbDocs pseudo-relevant set,
    * RM1 expansion mass (9-dp round + DECIMAL sum, carried as exact integer
    * NANO-units), top-fbTerms expansion terms, half-and-half interpolation
    * with the original query's term distribution in exact integer
    * MICRO-units (BOTH sides by integer half-up division — the x78
    * rational-tie discipline; RM1 mass lives on the 10⁻⁹ grid, where a
    * double `round(rw/2, 6)` demonstrably splits the engines), then a
    * weighted second BM25 pass whose per-term contribution is the exact
    * DECIMAL product `term(14,6) × wt_micro`, summed exactly, divided by
    * 10⁶ once. */
  private def rm3Sql: String = {
    val R = graft.corpus.Retrieval
    bm25ScPrelude() + s""",
fb AS (
  SELECT query_id AS qid, doc_id, score FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY score DESC, doc_id) AS rn FROM sc)
  WHERE rn <= ${R.Rm3FbDocs}),
qsum AS (
  SELECT qid, CAST(SUM(CAST(score AS DECIMAL(14,6))) AS DOUBLE) AS ssum
  FROM fb GROUP BY 1),
fbtf AS (
  SELECT doc_id, dl, w, COUNT(*) AS tf FROM ctok
  WHERE doc_id IN (SELECT DISTINCT doc_id FROM fb)
  GROUP BY 1, 2, 3),
rm1 AS (
  SELECT f.qid, t.w,
    CAST(CAST(SUM(CAST(round((f.score / q.ssum) * (t.tf / CAST(t.dl AS DOUBLE)), 9)
      AS DECIMAL(12,9))) AS DECIMAL(20,9)) * 1000000000 AS BIGINT) AS rw_nano
  FROM fb f JOIN qsum q USING (qid) JOIN fbtf t ON f.doc_id = t.doc_id
  GROUP BY 1, 2),
topm AS (
  SELECT qid, w, rw_nano FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      ORDER BY rw_nano DESC, w) AS rn
    FROM rm1)
  WHERE rn <= ${R.Rm3FbTerms}),
orig AS (
  SELECT qid, w, (1000000 * COUNT(*) + qlen) // (2 * qlen) AS om
  FROM (SELECT qid, len(ws) AS qlen, unnest(ws) AS w FROM qdocs)
  GROUP BY qid, qlen, w),
wgt AS (
  SELECT qid, w, CAST(SUM(m) AS BIGINT) AS wt FROM (
    SELECT qid, w, om AS m FROM orig
    UNION ALL
    SELECT qid, w, (rw_nano + 1000) // 2000 AS m FROM topm)
  GROUP BY 1, 2),
ew AS (SELECT DISTINCT w FROM wgt),
tf2 AS (
  SELECT doc_id, dl, w, COUNT(*) AS tf
  FROM ctok JOIN ew USING (w) GROUP BY 1, 2, 3),
df2 AS (SELECT w, COUNT(*) AS df FROM tf2 GROUP BY 1),
terms2 AS (
  SELECT g.qid, t2.doc_id,
    CAST(round(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
      ((tf * ${R.K1Plus1}) / (tf + ${R.BM25K1} * (${R.OneMinusB} +
        ${R.BM25B} * (dl / avgdl)))), 6) AS DECIMAL(14,6)) * g.wt AS c
  FROM tf2 t2 JOIN df2 USING (w) JOIN wgt g USING (w) CROSS JOIN st),
sc2 AS (
  SELECT qid AS query_id, doc_id, COUNT(*) AS n_terms,
    CAST(SUM(c) AS DOUBLE) / 1000000.0 AS score
  FROM terms2 GROUP BY 1, 2)
SELECT query_id, doc_id, n_terms, score, rn AS "rank" FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY score DESC, doc_id) AS rn FROM sc2)
WHERE rn <= ${R.DefaultTopK}"""
  }

  /** x65 — the ingest gate replayed in SQL: every (query, doc) BM25 score
    * from the x60 CTEs, reduced to each document's best query (max score,
    * min query id). */
  private def bm25GateSql: String =
    bm25ScPrelude(graft.corpus.Retrieval.GateQueryCount) + """
SELECT doc_id, query_id, score, n_terms FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
    ORDER BY score DESC, query_id) AS rn FROM sc)
WHERE rn = 1"""
}
