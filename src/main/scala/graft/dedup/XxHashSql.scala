package graft.dedup

/** DuckDB replay of Spark's `xxhash64` (standard XXH64, Cyan4973's
  * public-domain algorithm; Spark evaluates it over UTF-8 bytes with
  * seed 42) — the piece that makes the hash-keyed dedup paths
  * (q_dedup_simhash) EXACTLY oracle-able instead of rows-only.
  *
  * Shape: a prelude of scalar MACROs (64-bit modular arithmetic via
  * UHUGEINT intermediates — DuckDB BIGINT ops error on overflow rather
  * than wrap, and signed HUGEINT overflows at (2⁶⁴−1)²) plus a CTE
  * chain implementing the full spec: 32-byte stripe accumulators,
  * 8/4/1-byte tails, avalanche. Byte values come from CODEPOINTS
  * (`unicode`), sound while the corpus is ASCII — the same contract as
  * the media oracles, pinned by TestdataCanarySpec. Validated against
  * the reference vectors (xxh64("")=0xef46db3751d8e999 etc.) and
  * hash-exact against Spark's q_dedup_simhash output at sf0.01/0.1.
  *
  * The macro prelude makes the oracle a MULTI-STATEMENT script; the
  * driver's DuckDB runner (`con.execute(sql)`, per tools/check.py)
  * executes statements sequentially and returns the last result.
  */
object XxHashSql {

  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"
  private val M = "18446744073709551616"

  /** `CREATE OR REPLACE MACRO` prelude (xx_mul/add/rot/rnd/merge/
    * lane8/lane4/aval). Idempotent; names are xx_-prefixed to avoid
    * collisions if several oracles install them on one connection.
    */
  def macros: String =
    s"""CREATE OR REPLACE MACRO xx_mul(a, b) AS
       |  CAST((CAST(a AS UHUGEINT) * CAST(b AS UHUGEINT)) % $M AS UBIGINT);
       |CREATE OR REPLACE MACRO xx_add(a, b) AS
       |  CAST((CAST(a AS UHUGEINT) + CAST(b AS UHUGEINT)) % $M AS UBIGINT);
       |CREATE OR REPLACE MACRO xx_rot(x, r) AS
       |  xor(xx_mul(x, CAST(power(2, r) AS UBIGINT)),
       |      CAST(x AS UBIGINT) >> CAST(64 - r AS INTEGER));
       |CREATE OR REPLACE MACRO xx_rnd(acc, lane) AS
       |  xx_mul(xx_rot(xx_add(acc, xx_mul(lane, CAST($P2 AS UBIGINT))), 31),
       |         CAST($P1 AS UBIGINT));
       |CREATE OR REPLACE MACRO xx_merge(h, v) AS
       |  xx_add(xx_mul(xor(CAST(h AS UBIGINT), xx_rnd(CAST(0 AS UBIGINT), v)),
       |                CAST($P1 AS UBIGINT)), CAST($P4 AS UBIGINT));
       |CREATE OR REPLACE MACRO xx_lane8(bs, i) AS
       |  CAST(list_extract(bs, CAST(i AS BIGINT)) AS UBIGINT)
       |  + CAST(list_extract(bs, CAST(i+1 AS BIGINT)) AS UBIGINT)*256
       |  + CAST(list_extract(bs, CAST(i+2 AS BIGINT)) AS UBIGINT)*65536
       |  + CAST(list_extract(bs, CAST(i+3 AS BIGINT)) AS UBIGINT)*16777216
       |  + CAST(list_extract(bs, CAST(i+4 AS BIGINT)) AS UBIGINT)*4294967296
       |  + CAST(list_extract(bs, CAST(i+5 AS BIGINT)) AS UBIGINT)*1099511627776
       |  + CAST(list_extract(bs, CAST(i+6 AS BIGINT)) AS UBIGINT)*281474976710656
       |  + CAST(list_extract(bs, CAST(i+7 AS BIGINT)) AS UBIGINT)*72057594037927936;
       |CREATE OR REPLACE MACRO xx_lane4(bs, i) AS
       |  CAST(list_extract(bs, CAST(i AS BIGINT)) AS UBIGINT)
       |  + CAST(list_extract(bs, CAST(i+1 AS BIGINT)) AS UBIGINT)*256
       |  + CAST(list_extract(bs, CAST(i+2 AS BIGINT)) AS UBIGINT)*65536
       |  + CAST(list_extract(bs, CAST(i+3 AS BIGINT)) AS UBIGINT)*16777216;
       |CREATE OR REPLACE MACRO xx_aval(h0) AS (
       |  SELECT xor(h2, h2 >> 32) FROM (
       |    SELECT xx_mul(xor(h1, h1 >> 29), CAST($P3 AS UBIGINT)) AS h2 FROM (
       |      SELECT xx_mul(xor(CAST(h0 AS UBIGINT), CAST(h0 AS UBIGINT) >> 33),
       |                    CAST($P2 AS UBIGINT)) AS h1)));""".stripMargin

  /** CTE chain hashing every row of an upstream CTE `${p}toks(t)`
    * (ASCII strings) to `${p}th(t, h UBIGINT)` = XXH64(bytes(t),
    * `seed`). Stages: xb (byte list), xst (32-byte stripe accumulators
    * via list_reduce with the init state as the fold's first element),
    * xh0 (stripe merge or short-input init), xh8/xh4 (8- and 4-byte
    * tails), th (1-byte tail + avalanche). `p` prefixes every CTE name
    * so TWO independent hash chains can live in one WITH clause (the
    * composite curation oracle hashes quality features AND simhash
    * tokens).
    */
  def hashCtes(seed: Long, p: String = ""): String =
    s"""${p}xb AS (SELECT t,
       |  [CAST(unicode(t[i]) AS UBIGINT) for i in range(1, len(t)+1)] AS bs,
       |  CAST(len(t) AS UBIGINT) AS n
       |  FROM ${p}toks),
       |${p}xst AS (SELECT t, bs, n, CAST(n // 32 AS BIGINT) AS ns,
       |  CASE WHEN n >= 32 THEN
       |    list_reduce(
       |      [{'v1': xx_add(CAST($seed AS UBIGINT),
       |                     xx_add(CAST($P1 AS UBIGINT), CAST($P2 AS UBIGINT))),
       |         'v2': xx_add(CAST($seed AS UBIGINT), CAST($P2 AS UBIGINT)),
       |         'v3': CAST($seed AS UBIGINT),
       |         'v4': CAST((CAST($seed AS UHUGEINT) + $M - $P1) % $M AS UBIGINT),
       |         'i': CAST(-1 AS BIGINT)}] ||
       |      [{'v1': CAST(0 AS UBIGINT), 'v2': CAST(0 AS UBIGINT),
       |         'v3': CAST(0 AS UBIGINT), 'v4': CAST(0 AS UBIGINT),
       |         'i': CAST(k AS BIGINT)} for k in range(0, CAST(n // 32 AS BIGINT))],
       |      (a, x) -> {'v1': xx_rnd(a.v1, xx_lane8(bs, x.i*32 + 1)),
       |                  'v2': xx_rnd(a.v2, xx_lane8(bs, x.i*32 + 9)),
       |                  'v3': xx_rnd(a.v3, xx_lane8(bs, x.i*32 + 17)),
       |                  'v4': xx_rnd(a.v4, xx_lane8(bs, x.i*32 + 25)),
       |                  'i': a.i})
       |  END AS vs
       |  FROM ${p}xb),
       |${p}xh0 AS (SELECT t, bs, n, ns,
       |  CASE WHEN n >= 32 THEN
       |    xx_add(xx_merge(xx_merge(xx_merge(xx_merge(
       |      xx_add(xx_add(xx_rot(vs.v1, 1), xx_rot(vs.v2, 7)),
       |             xx_add(xx_rot(vs.v3, 12), xx_rot(vs.v4, 18))),
       |      vs.v1), vs.v2), vs.v3), vs.v4), n)
       |  ELSE xx_add(xx_add(CAST($seed AS UBIGINT), CAST($P5 AS UBIGINT)), n)
       |  END AS h
       |  FROM ${p}xst),
       |${p}xh8 AS (SELECT t, bs, n,
       |  CAST(ns*32 + ((CAST(n AS BIGINT) - ns*32) // 8)*8 AS BIGINT) AS p8,
       |  list_reduce(
       |    [h] || [xx_lane8(bs, CAST(ns*32 + 8*j + 1 AS BIGINT))
       |            for j in range(0, (CAST(n AS BIGINT) - ns*32) // 8)],
       |    (a, lane) -> xx_add(xx_mul(xx_rot(
       |      xor(a, xx_rnd(CAST(0 AS UBIGINT), lane)), 27),
       |      CAST($P1 AS UBIGINT)), CAST($P4 AS UBIGINT))) AS h
       |  FROM ${p}xh0),
       |${p}xh4 AS (SELECT t, bs, n,
       |  CASE WHEN CAST(n AS BIGINT) - p8 >= 4 THEN p8 + 4 ELSE p8 END AS p4,
       |  CASE WHEN CAST(n AS BIGINT) - p8 >= 4 THEN
       |    xx_add(xx_mul(xx_rot(xor(h, xx_mul(xx_lane4(bs, p8 + 1),
       |      CAST($P1 AS UBIGINT))), 23), CAST($P2 AS UBIGINT)),
       |      CAST($P3 AS UBIGINT))
       |  ELSE h END AS h
       |  FROM ${p}xh8),
       |${p}th AS (SELECT t, xx_aval(list_reduce(
       |    [h] || [list_extract(bs, j)
       |            for j in range(p4 + 1, CAST(n AS BIGINT) + 1)],
       |    (a, bb) -> xx_mul(xx_rot(xor(a, xx_mul(bb, CAST($P5 AS UBIGINT))), 11),
       |                      CAST($P1 AS UBIGINT)))) AS h
       |  FROM ${p}xh4)""".stripMargin

  /** Murmur3_x86_32 prelude (Spark's `hash()` — mixK1/mixH1/fmix over
    * 32-bit modular arithmetic) for replaying the MinHash band keys.
    * `mm_fmix` is spelled as pure nested macros (no scalar subquery)
    * because it must be legal INSIDE a list_reduce lambda. Validated
    * against a reference implementation on random 64-bit lanes; note
    * the oracle's correctness only needs the band key to be an
    * injective-consistent function of the 4-long slice (equality
    * joins), so even the exactness here is belt-and-braces.
    */
  def murmurMacros: String =
    """CREATE OR REPLACE MACRO mm_mul(a, b) AS
      |  CAST((CAST(a AS UBIGINT) * CAST(b AS UBIGINT)) % 4294967296 AS UBIGINT);
      |CREATE OR REPLACE MACRO mm_rot(x, r) AS
      |  xor(mm_mul(x, CAST(power(2, r) AS UBIGINT)),
      |      CAST(x AS UBIGINT) >> CAST(32 - r AS INTEGER));
      |CREATE OR REPLACE MACRO mm_k1(k) AS
      |  mm_mul(mm_rot(mm_mul(k, 3432918353), 15), 461845907);
      |CREATE OR REPLACE MACRO mm_h1(h, k) AS
      |  CAST((CAST(mm_mul(mm_rot(xor(CAST(h AS UBIGINT), mm_k1(k)), 13), 5)
      |    AS UBIGINT) + 3864292196) % 4294967296 AS UBIGINT);
      |CREATE OR REPLACE MACRO mm_s2(h) AS
      |  mm_mul(xor(CAST(h AS UBIGINT), CAST(h AS UBIGINT) >> 16), 2246822507);
      |CREATE OR REPLACE MACRO mm_s3(h) AS
      |  mm_mul(xor(CAST(h AS UBIGINT), CAST(h AS UBIGINT) >> 13), 3266489909);
      |CREATE OR REPLACE MACRO mm_s4(h) AS
      |  xor(CAST(h AS UBIGINT), CAST(h AS UBIGINT) >> 16);
      |CREATE OR REPLACE MACRO mm_fmix(h) AS
      |  mm_s4(mm_s3(mm_s2(xor(CAST(h AS UBIGINT), 8))));
      |CREATE OR REPLACE MACRO mm_long(u, seed) AS
      |  mm_fmix(mm_h1(mm_h1(seed, CAST(u AS UBIGINT) % 4294967296),
      |                CAST(u AS UBIGINT) >> 32));""".stripMargin

  /** Complete oracle for the MinHash+LSH dedup query
    * ([[graft.queries.TrainingQueries.dedupMinhash]]): word 3-shingles
    * (per-doc distinct) → ONE XXH64(seed 42) per distinct shingle →
    * per-permutation value via Spark's MULTI-COLUMN xxhash64 semantics
    * — `xxhash64(shingle, lit(i))` does NOT reseed, it hashes the
    * int literal as a SECOND column with the string's hash as the
    * running seed (the 4-byte-tail + avalanche step replayed below) —
    * → 64 SIGNED mins per doc → Murmur3 band keys over 4-long slices →
    * bucket join → matching-position Jaccard estimate ≥ `threshold`.
    * Hash-exact vs the Spark pipeline at sf0.001/0.01/0.1. The
    * mis-read of the seed argument (treating lit(i) as an XXH64 seed)
    * was caught precisely because est_jaccard diverged while the
    * candidate SET still matched — symmetric wrong-but-deterministic
    * signatures preserve equality joins; exactness needed the true
    * semantics.
    */
  /** `pairFilter`: optional extra predicate over (doc_a, doc_b)
    * injected into the candidate CTE — the incremental variant
    * restricts to pairs touching a NEW doc (`q_dedup_minhash_incr`),
    * the full dedup passes none.
    */
  def minhashOracleSql(numHashes: Int = 64, bands: Int = 16,
                       threshold: Double = 0.7,
                       pairFilter: String = ""): String = {
    val rows = numHashes / bands
    val pf = if (pairFilter.isEmpty) "" else s" AND ($pairFilter)"
    s"""$macros
       |$murmurMacros
       |WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |     for i in range(1, len(w) - 1)])) AS t
       |  FROM tok),
       |toks AS (SELECT DISTINCT t FROM sh),
       |${hashCtes(42L)},
       |sv AS (
       |  SELECT t, sd,
       |    CAST((CAST(hv AS HUGEINT) - CASE WHEN hv >= 9223372036854775808
       |      THEN CAST($M AS HUGEINT)
       |      ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS v
       |  FROM (
       |    SELECT th.t, s.sd,
       |      xx_aval(xx_add(xx_mul(xx_rot(
       |        xor(xx_add(xx_add(th.h, CAST($P5 AS UBIGINT)), 4),
       |            xx_mul(CAST(s.sd AS UBIGINT), CAST($P1 AS UBIGINT))), 23),
       |        CAST($P2 AS UBIGINT)), CAST($P3 AS UBIGINT))) AS hv
       |    FROM th CROSS JOIN (SELECT unnest(range(0, $numHashes)) AS sd) s)),
       |mins AS (
       |  SELECT s.doc_id, v.sd, min(v.v) AS m
       |  FROM sh s JOIN sv v USING (t)
       |  GROUP BY 1, 2),
       |sigs AS (
       |  SELECT doc_id, list(m ORDER BY sd) AS sig FROM mins GROUP BY 1),
       |bands AS (
       |  SELECT doc_id, b,
       |    list_reduce(
       |      [CAST(42 AS UBIGINT)] ||
       |      [CAST((CAST(sig[CAST(b*$rows + j AS BIGINT)] AS HUGEINT)
       |         + CASE WHEN sig[CAST(b*$rows + j AS BIGINT)] < 0
       |           THEN CAST($M AS HUGEINT)
       |           ELSE CAST(0 AS HUGEINT) END) AS UBIGINT)
       |       for j in range(1, ${rows + 1})],
       |      (a, u) -> mm_long(u, a)) AS bh
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, $bands)) AS b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id$pf)
       |SELECT c.doc_a, c.doc_b,
       |  round(len(list_filter([sa.sig[i] = sb.sig[i]
       |    for i in range(1, ${numHashes + 1})], x -> x))
       |    / $numHashes.0, 6) AS est_jaccard
       |FROM cand c
       |JOIN sigs sa ON sa.doc_id = c.doc_a
       |JOIN sigs sb ON sb.doc_id = c.doc_b
       |WHERE round(len(list_filter([sa.sig[i] = sb.sig[i]
       |    for i in range(1, ${numHashes + 1})], x -> x))
       |    / $numHashes.0, 6) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Complete oracle for [[Dedup.simhashPairs]] over the documents
    * table: whitespace tokens → per-distinct-token XXH64(seed 42) →
    * per-doc 64 bit-majority votes → 64-bit signature → 4×16-bit
    * block buckets (≤ `maxBucket` cap) → Hamming ≤ `maxHamming`
    * pairs. Every stage replays the Spark pipeline op-for-op on
    * integers, so the oracle is exact.
    */
  /** Shared CTE chain `${p}toksrc → … → ${p}sig`: per-doc 64-bit
    * SimHash signatures over `src(doc_id, text)` replayed op-for-op in
    * DuckDB (whitespace tokens, XXH64 per token, per-bit majority
    * `2·count > n`). No leading `WITH` — callers open the WITH clause
    * (possibly with their own upstream CTEs, e.g. the curation
    * oracle's quality/dedup stages defining `src` itself), append
    * further CTEs after a comma, and must prepend [[macros]]. `p`
    * prefixes every CTE name so the chain can coexist with another
    * [[hashCtes]] instance in one statement.
    */
  private def simhashSigCtes(seed: Long = 42L, src: String = "documents",
                             p: String = ""): String = {
    val bTerms = (0 until 64)
      .map(j => s"sum(CAST((h >> $j) & 1 AS BIGINT)) AS b$j")
      .mkString(",\n  ")
    val sTerms = (0 until 64)
      .map(j => s"CASE WHEN 2*b$j > n THEN CAST(${java.lang.Long
        .toUnsignedString(1L << j)} AS UBIGINT) ELSE CAST(0 AS UBIGINT) END")
      .mkString("\n    + ")
    s"""${p}toksrc AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
       |  FROM $src),
       |${p}toks AS (SELECT DISTINCT t FROM ${p}toksrc),
       |${hashCtes(seed, p)},
       |${p}hb AS (SELECT s.doc_id, ${p}th.h
       |  FROM ${p}toksrc s JOIN ${p}th USING (t)),
       |${p}cnt AS (SELECT doc_id, count(*) AS n,
       |  $bTerms
       |  FROM ${p}hb GROUP BY doc_id),
       |${p}sig AS (SELECT doc_id,
       |  ($sTerms) AS s
       |  FROM ${p}cnt)""".stripMargin
  }

  def simhashOracleSql(maxHamming: Int = 3, maxBucket: Int = 256): String = {
    s"""$macros
       |WITH ${simhashSigCtes()},
       |blocked AS (
       |  SELECT doc_id, s, b AS block,
       |    CAST((s >> CAST(b*16 AS INTEGER)) & 65535 AS BIGINT) AS bkey
       |  FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS b)),
       |okb AS (SELECT block, bkey FROM blocked GROUP BY 1, 2
       |        HAVING count(*) <= $maxBucket),
       |sm AS (SELECT blocked.* FROM blocked JOIN okb USING (block, bkey))
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
       |FROM sm a JOIN sm b
       |  ON a.block = b.block AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.s, b.s)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Oracle for `q_stream_neardup`: per-lang counts of docs that are
    * within `maxHamming` of some EARLIER (smaller doc_id) doc sharing
    * a 16-bit band — the exact relation
    * [[graft.stream.Streams.nearDupBands]] materializes when arrival
    * is id-ordered. No bucket-size filter (the streaming operator's
    * `maxBucket` is a loud guard, not a semantic).
    */
  def streamNearDupOracleSql(maxHamming: Int = 3): String =
    s"""$macros
       |WITH ${simhashSigCtes()},
       |blocked AS (
       |  SELECT doc_id, s, b AS block,
       |    CAST((s >> CAST(b*16 AS INTEGER)) & 65535 AS BIGINT) AS bkey
       |  FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS b)),
       |dup AS (SELECT DISTINCT b.doc_id
       |  FROM blocked a JOIN blocked b
       |    ON a.block = b.block AND a.bkey = b.bkey
       |   AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.s, b.s)) <= $maxHamming)
       |SELECT d.lang, count(*) AS n_docs,
       |  CAST(count(dup.doc_id) AS BIGINT) AS n_neardup
       |FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  /** Oracle for `q_stream_curate` — the whole two-hop streaming
    * curation pipeline ([[graft.queries.FuncQueries.streamCurate]])
    * replayed relationally, assuming id-ordered arrival (one
    * AvailableNow batch — the harness shape; cross-batch the operator
    * keeps FIRST-arrival, which the oracle can't see and
    * StreamsSpec pins instead):
    *
    *   kept  — the integer ingest quality gate (row-local on the
    *           stream): ≥ `minTokens` lowercased whitespace tokens and
    *           a 2–12 chars-per-token band, both exact integer
    *           predicates (no float rounding caveat class);
    *   uniq  — first-seen exact dedup = min doc_id per md5(text);
    *   dup   — SimHash banded near-dup among the survivors only
    *           (signatures over `uniq`, prefixed CTE chain so the
    *           XXH64 stages don't collide with anything upstream);
    *   final — per-lang doc count, token sum, and doc_id checksum of
    *           the curated set.
    */
  def streamCurateOracleSql(maxHamming: Int = 3, minTokens: Int = 8)
  : String = {
    val nTok = "CAST(len(list_filter(regexp_split_to_array(" +
      "lower(trim(text)), '\\s+'), t -> t != '')) AS BIGINT)"
    s"""$macros
       |WITH qm AS (
       |  SELECT doc_id, lang, text, $nTok AS n_tok,
       |    CAST(length(regexp_replace(trim(text), '\\s+', '', 'g'))
       |      AS BIGINT) AS n_chr
       |  FROM documents),
       |kept AS (
       |  SELECT doc_id, lang, text, n_tok FROM qm
       |  WHERE n_tok >= $minTokens
       |    AND n_chr >= 2*n_tok AND n_chr <= 12*n_tok),
       |uniq AS (
       |  SELECT doc_id, lang, text, n_tok FROM kept
       |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(text))),
       |${simhashSigCtes(src = "uniq", p = "s_")},
       |blocked AS (
       |  SELECT doc_id, s, b AS block,
       |    CAST((s >> CAST(b*16 AS INTEGER)) & 65535 AS BIGINT) AS bkey
       |  FROM s_sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS b)),
       |dup AS (SELECT DISTINCT b.doc_id
       |  FROM blocked a JOIN blocked b
       |    ON a.block = b.block AND a.bkey = b.bkey
       |   AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.s, b.s)) <= $maxHamming)
       |SELECT u.lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(u.n_tok) AS BIGINT) AS n_tokens,
       |  CAST(sum(u.doc_id) AS BIGINT) AS id_sum
       |FROM uniq u LEFT JOIN dup ON u.doc_id = dup.doc_id
       |WHERE dup.doc_id IS NULL
       |GROUP BY u.lang ORDER BY u.lang""".stripMargin
  }
}
