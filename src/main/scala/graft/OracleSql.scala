package graft

/** DuckDB twins of SparkEntry.queries — executed by the driver
  * against the same parquet tables, results hash-compared.
  *
  * Mirroring rules (see SparkEntry scaladoc): money math in scaled
  * integers, doubles produced by one identical expression chain on
  * both sides, deterministic ORDER BY everywhere. DuckDB-isms to
  * keep in sync with the Spark side:
  *  - regexp_replace needs the 'g' flag (Spark is global by default);
  *  - integer sums are CAST(... AS BIGINT) (DuckDB widens to HUGEINT);
  *  - list_reduce(list_prepend(0, ...)) mirrors Spark's aggregate()
  *    left fold with a zero initial accumulator.
  */
object OracleSql {

  /** Left-fold dot product of two 64-dim float lists, mirroring
    * VectorFunctions.dotFold bit-for-bit.
    */
  private def dot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, v) -> acc + v)"

  /** FNV-1a (64-bit, mod-2^64 wraparound) over the chars of string
    * expression `t`, as unsigned HUGEINT — mirrors
    * graft.functions.SimHashImpl.fnv1a64 / ShingleImpl.shingleHash
    * bit-for-bit on ASCII text (chars == UTF-8 bytes == code points;
    * TESTDATA documents are ASCII, asserted by the q22 ascii()-based
    * rolling hash passing). The xor trick: only the low 8 bits of the
    * accumulator can differ under xor with a byte, so split acc into
    * (acc div 256)*256 + xor(acc mod 256, byte) — BIGINT-safe.
    */
  private def fnv(t: String): String =
    s"list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), " +
      s"list_transform(string_split($t, ''), c -> CAST(ascii(c) AS HUGEINT))), " +
      s"(acc, b) -> (((acc // 256) * 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT))) " +
      s"* 1099511628211) % CAST(18446744073709551616 AS HUGEINT))"

  /** First `chars` hex chars of md5(expr) folded to a BIGINT —
    * mirrors Spark's conv(substring(md5(e), 1, chars), 16, 10)
    * (chars ≤ 15 keeps the fold inside 60 bits, BIGINT-safe).
    */
  /** q91's full BPE training loop as k generated CTE layers — each
    * layer mirrors one BpeTrainer round: overlapping pair counts
    * weighted by word frequency, argmax with (count DESC, lhs, rhs)
    * tie-break, then greedy left-to-right merge application as a
    * list_reduce fold over singleton lists (DuckDB's reduce keeps the
    * accumulator in the element type, hence the list-of-lists lift;
    * the fold is exactly BpeTrainer.applyMerge's aggregate()).
    */
  private def bpeTrainCtes(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt,
        |    list_transform(range(1, length(word)+1), i -> word[i:i]) AS syms
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word FROM documents)
        |  GROUP BY word),
        |""".stripMargin)
    for (i <- 0 until k) {
      sb.append(
        s"""p$i AS (SELECT z[1] AS l, z[2] AS r, CAST(sum(cnt) AS BIGINT) AS c
           |  FROM (SELECT unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS z, cnt FROM w$i)
           |  GROUP BY 1, 2),
           |b$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
           |""".stripMargin)
      if (i < k - 1) sb.append(
        s"""w${i + 1} AS (SELECT word, cnt,
           |    list_reduce(list_transform(syms, x -> [x]),
           |      (a, b) -> CASE WHEN len(a) > 0 AND a[len(a)] = b$i.l AND b[1] = b$i.r
           |                THEN list_append(a[1:len(a)-1], b$i.l || b$i.r)
           |                ELSE list_append(a, b[1]) END) AS syms
           |  FROM w$i CROSS JOIN b$i),
           |""".stripMargin)
    }
    sb.toString
  }

  private def bpeOracle(k: Int): String = {
    val sb = new StringBuilder(bpeTrainCtes(k))
    sb.append("sel AS (")
    sb.append((0 until k).map(i =>
      s"SELECT CAST(${i + 1} AS BIGINT) AS merge_rank, l AS lhs, r AS rhs, c AS pair_count FROM b$i")
      .mkString(" UNION ALL "))
    sb.append(") SELECT * FROM sel ORDER BY merge_rank")
    sb.toString
  }

  /** q92's encode: the same k training layers, then every document's
    * words run through the k merge folds IN RANK ORDER — the fold
    * nests k lifted list_reduce levels (innermost = merge 1), exactly
    * BpeTrainer.segment's chained aggregate() expression, so the hash
    * match proves the map-only inference path reproduces training's
    * greedy semantics end-to-end.
    */
  /** Training CTEs + the per-doc `enc` CTE (doc_id, toks) — shared by
    * the q92 encode oracle and the q207 fertility aggregate.
    */
  private def bpeEncCtes(k: Int): String = {
    var fold = "list_transform(range(1, length(w)+1), i -> w[i:i])"
    for (i <- 0 until k) fold =
      s"""list_reduce(list_transform($fold, x -> [x]),
         |      (a, b) -> CASE WHEN len(a) > 0 AND a[len(a)] = b$i.l AND b[1] = b$i.r
         |                THEN list_append(a[1:len(a)-1], b$i.l || b$i.r)
         |                ELSE list_append(a, b[1]) END)""".stripMargin
    val crossJoins = (0 until k).map(i => s"CROSS JOIN b$i").mkString(" ")
    bpeTrainCtes(k) +
      s"""enc AS (SELECT doc_id,
         |    flatten(list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> $fold)) AS toks
         |  FROM documents $crossJoins)""".stripMargin
  }

  private def bpeEncodeOracle(k: Int): String =
    bpeEncCtes(k) +
      s"""
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
         |  array_to_string(toks[1:12], ' ') AS head
         |FROM enc ORDER BY doc_id""".stripMargin

  private def md5fold(expr: String, chars: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(substring(md5($expr), 1, $chars), ''), " +
      s"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), (a, v) -> a * 16 + v)"

  /** Unsigned 2^64-domain HUGEINT → signed BIGINT (two's complement). */
  private def signed(u: String): String =
    s"CAST(CASE WHEN $u >= CAST(1 AS HUGEINT) << 63 " +
      s"THEN $u - CAST(18446744073709551616 AS HUGEINT) ELSE $u END AS BIGINT)"

  /** ShingleImpl.shingleHash: java.lang.Math.floorMod(signed fnv, 1e9+7). */
  private def shingleHash(t: String): String =
    s"CAST(((${signed(fnv(t))} % 1000000007) + 1000000007) % 1000000007 AS BIGINT)"

  /** Exact integer SSE between two quantized-long list expressions —
    * the one distance of the q29/q210 integer-ANN family.
    */
  private def sse(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 65), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), (acc, v) -> acc + v)"

  /** The integer-moments k-means training chain shared by q29 and
    * q210 (IvfIndex.trainCentroidsQuantized mirrored): floor(x·2^10)
    * quantization → pmod seed means → one Lloyd round on exact
    * integer SSE (cid tie-break) → the per-(vector, centroid)
    * distance table e2 (q29 takes rr = 1 for assignment + rr ≤ 3 for
    * probes; q210 takes rr ≤ 3 for multi-probe graph membership). xq
    * is MATERIALIZED (DuckDB re-inlines multi-referenced CTEs
    * otherwise — measured 15-25× on q210's round-layered chain).
    */
  private val ivfQuantTrainCtes: String =
    """xq AS MATERIALIZED (SELECT vec_id, embedding,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)) AS q
      |  FROM embeddings),
      |d0 AS (SELECT vec_id % 8 AS cid, t.j, sum(q[t.j]) AS s, count(*) AS n
      |  FROM xq CROSS JOIN range(1, 65) t(j) GROUP BY 1, 2),
      |c0 AS (SELECT cid, j, s // n AS cv FROM d0),
      |e1 AS (SELECT x.vec_id, c0.cid, sum((x.q[c0.j] - c0.cv) * (x.q[c0.j] - c0.cv)) AS d
      |  FROM xq x CROSS JOIN c0 GROUP BY 1, 2),
      |a1 AS (SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr FROM e1)
      |  WHERE rr = 1),
      |d1 AS (SELECT a1.cid, t.j, sum(x.q[t.j]) AS s, count(*) AS n
      |  FROM a1 JOIN xq x USING (vec_id) CROSS JOIN range(1, 65) t(j) GROUP BY 1, 2),
      |c1 AS (SELECT cid, j, s // n AS cv FROM d1),
      |e2 AS MATERIALIZED (SELECT x.vec_id, c1.cid, sum((x.q[c1.j] - c1.cv) * (x.q[c1.j] - c1.cv)) AS d
      |  FROM xq x CROSS JOIN c1 GROUP BY 1, 2)""".stripMargin

  /** Double-list + exact squared-norm view of the quantized vectors
    * plus the 3-probe bucket membership — shared by q210/q211
    * (integer SSE runs as n² = |a|²+|b|²−2a·b over native
    * list_inner_product doubles, exact below 2^53).
    */
  private val xqdAmCtes: String =
    """xqd AS MATERIALIZED (SELECT vec_id, qd,
      |    CAST(list_inner_product(qd, qd) AS BIGINT) AS n2
      |  FROM (SELECT vec_id, list_transform(q, v -> CAST(v AS DOUBLE)) AS qd FROM xq)),
      |am AS (SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr FROM e2)
      |  WHERE rr <= 3)""".stripMargin

  /** Batch-perceptron training unrolled (q212/q213, r16): hashed
    * unigram+bigram features (the q170 fold at 1024 buckets), planted
    * q165 label (≥ 50 tokens), and THREE full-batch epochs from w=0 as
    * CTE layers — epoch 1's mistake set is every featured doc (margins
    * under w=0 are all 0), so pw1 is simply Σ y·n per bucket; later
    * epochs join margins under the previous weights, filter y·m ≤ 0,
    * and fold the integer delta in. All sums are order-free integers:
    * the whole training loop replays bit-exactly (the q29/q114
    * k-means-unroll precedent applied to classifier training).
    */
  private val perceptronCtes: String = {
    val epochs = (2 to 3).map { e =>
      val pw = s"pw${e - 1}"
      s"""pm$e AS (SELECT db.doc_id, db.y, sum(db.n * coalesce(w.w, 0)) AS m
         |  FROM dbP db LEFT JOIN $pw w USING (bucket) GROUP BY 1, 2),
         |pd$e AS (SELECT db.bucket, sum(db.y * db.n) AS d
         |  FROM dbP db JOIN pm$e ON pm$e.doc_id = db.doc_id
         |  WHERE pm$e.y * pm$e.m <= 0 GROUP BY 1),
         |pw$e AS MATERIALIZED (SELECT coalesce(w.bucket, d.bucket) AS bucket,
         |    CAST(coalesce(w.w, 0) + coalesce(d.d, 0) AS BIGINT) AS w
         |  FROM pw${e - 1} w FULL JOIN pd$e d ON w.bucket = d.bucket)""".stripMargin
    }.mkString(",\n")
    s"""toksP AS (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0) AS t FROM documents),
       |gramsP AS (SELECT doc_id, len(t) >= 50 AS pos, list_concat(
       |    list_transform(t, x -> '1:' || x),
       |    list_transform(range(len(t) - 1), i -> '2:' || t[i + 1] || ' ' || t[i + 2])) AS gs
       |  FROM toksP),
       |fbP AS (SELECT doc_id, pos, ${md5fold("gram", 8)} % 1024 AS bucket
       |  FROM (SELECT doc_id, pos, unnest(gs) AS gram FROM gramsP)),
       |dbP AS MATERIALIZED (SELECT doc_id, CASE WHEN pos THEN 1 ELSE -1 END AS y, bucket,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM fbP GROUP BY 1, 2, 3),
       |pw1 AS MATERIALIZED (SELECT bucket, CAST(sum(y * n) AS BIGINT) AS w FROM dbP GROUP BY bucket),
       |$epochs,
       |psc AS MATERIALIZED (SELECT db.doc_id, CAST(sum(db.n * coalesce(w.w, 0)) AS BIGINT) AS margin
       |  FROM dbP db LEFT JOIN pw3 w USING (bucket) GROUP BY 1)""".stripMargin
  }

  /** Signed feature-hashing embedding CTEs (q214/q215, r16 —
    * Weinberger et al.'s hashing trick, all integer): bucket = md5
    * fold % 64, sign from fold bit 8, per-doc signed bag sums
    * assembled into a dense 64-list with norm², zero-token docs get
    * the zero vector.
    */
  private val hashedEmbCtes: String =
    s"""heTk AS (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0) AS t FROM documents),
       |heF AS (SELECT doc_id, ${md5fold("tok", 8)} AS h FROM (SELECT doc_id, unnest(t) AS tok FROM heTk)),
       |heC AS (SELECT doc_id, h % 64 AS bucket,
       |    CAST(sum(CASE WHEN (h // 256) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
       |  FROM heF GROUP BY 1, 2),
       |heG AS (SELECT d.doc_id, t.i, coalesce(c.v, CAST(0 AS BIGINT)) AS v
       |  FROM (SELECT DISTINCT doc_id FROM documents) d
       |  CROSS JOIN range(0, 64) t(i)
       |  LEFT JOIN heC c ON c.doc_id = d.doc_id AND c.bucket = t.i),
       |heE AS MATERIALIZED (SELECT doc_id, list(v ORDER BY i) AS embedding,
       |    CAST(sum(v * v) AS BIGINT) AS norm2
       |  FROM heG GROUP BY doc_id)""".stripMargin

  /** The q119 PQ/ADC rebuild-from-scratch chain: regenerate the
    * closed-form literal codebooks (cents mirrors SparkEntry's
    * pqLiteralModel), per-subspace nearest-centroid encode via the
    * same (dist, cid) assignment order, the ADC term chain with the
    * engine's sequential double folds, and (adc_dist, vec_id) ranking.
    * Shared by q119 (scoring over a freshly encoded corpus) and q216
    * (scoring over the D38-MAINTAINED index — the oracle's rebuild
    * against the engine's append IS the append ≡ rebuild
    * certification).
    */
  private val pqAdcScoringSql: String =
    """WITH cents AS (
      |  SELECT list_transform(range(0,8), s ->
      |           list_transform(range(0,4), c ->
      |             list_transform(range(0,8), j -> CAST((s + 2*c + 3*j) % 5 - 2 AS DOUBLE)))) AS cb),
      |e AS (SELECT vec_id, embedding FROM embeddings),
      |sd AS (SELECT e.vec_id, s.s AS s, c.c AS c,
      |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1,9), j -> cb[s.s+1][c.c+1][j] * cb[s.s+1][c.c+1][j])),
      |           (a,v) -> a + v)
      |         - 2.0 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1,9), j -> CAST(e.embedding[s.s*8 + j] AS DOUBLE) * cb[s.s+1][c.c+1][j])),
      |           (a,v) -> a + v) AS d
      |       FROM e CROSS JOIN cents CROSS JOIN range(0,8) s(s) CROSS JOIN range(0,4) c(c)),
      |codes AS (SELECT vec_id, s, c AS code FROM
      |            (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn FROM sd) z
      |          WHERE rn = 1),
      |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 3),
      |tm AS (SELECT q.query_id, cd.vec_id, cd.s,
      |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1,9), j -> CAST(q.qe[cd.s*8 + j] AS DOUBLE) * CAST(q.qe[cd.s*8 + j] AS DOUBLE))),
      |           (a,v) -> a + v)
      |         - 2.0 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1,9), j -> CAST(q.qe[cd.s*8 + j] AS DOUBLE) * cb[cd.s+1][cd.code+1][j])),
      |           (a,v) -> a + v)
      |         + list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1,9), j -> cb[cd.s+1][cd.code+1][j] * cb[cd.s+1][cd.code+1][j])),
      |           (a,v) -> a + v) AS t
      |       FROM q CROSS JOIN codes cd CROSS JOIN cents),
      |adc AS (SELECT query_id, vec_id,
      |          list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(t ORDER BY s)), (a,v) -> a + v) AS adc_dist
      |        FROM tm GROUP BY query_id, vec_id),
      |r AS (SELECT query_id, vec_id, adc_dist,
      |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, vec_id) AS BIGINT) AS rk FROM adc)
      |SELECT query_id, rk, vec_id, adc_dist FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  private def cosineCte(pairsFrom: String): String =
    s"""s AS (SELECT *, ${dot("ea", "eb")} AS dp, sqrt(${dot("ea", "ea")}) AS na, sqrt(${dot("eb", "eb")}) AS nb FROM $pairsFrom),
       |c AS (SELECT * EXCLUDE (dp, na, nb), CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0 ELSE dp / (na * nb) END AS cosine FROM s)""".stripMargin

  /** Shared menu-line synthesis (mirror of SparkEntry.menuLines). */
  private val menuCte =
    """m AS (SELECT p_partkey, p_name, CAST(round(p_retailprice*100) AS BIGINT) AS c, p_partkey % 3 AS md FROM part),
      |v AS (SELECT p_partkey, p_name, md, c, CAST(floor(c/2) AS BIGINT) AS ch, CAST(floor(c*8/10) AS BIGINT) AS cs, CAST(floor(c*12/10) AS BIGINT) AS cl FROM m),
      |l AS (SELECT p_partkey AS doc_id,
      |  CASE WHEN md = 0 THEN p_name || ' .... Half: $' || printf('%d.%02d', CAST(floor(ch/100) AS BIGINT), ch % 100) || ' Full: $' || printf('%d.%02d', CAST(floor(c/100) AS BIGINT), c % 100)
      |       WHEN md = 1 THEN p_name || ' .... $' || printf('%d.%02d', CAST(floor(c/100) AS BIGINT), c % 100)
      |       ELSE p_name || ' .... Small: $' || printf('%d.%02d', CAST(floor(cs/100) AS BIGINT), cs % 100) || ' Medium: $' || printf('%d.%02d', CAST(floor(c/100) AS BIGINT), c % 100) || ' Large: $' || printf('%d.%02d', CAST(floor(cl/100) AS BIGINT), cl % 100)
      |  END AS line FROM v)""".stripMargin

  /** Shared parse of menu lines (mirror of MenuParser.parse on the
    * synthesized single-line docs: no headers, category omitted).
    */
  private val parseCte =
    """parsed AS (SELECT doc_id,
      |  regexp_replace(trim(regexp_extract(line, '^(.+?)\s*\.{2,}', 1)), '\s+', ' ', 'g') AS item_name,
      |  CASE WHEN NOT regexp_matches(line, '(?i)(half|full|small|medium|large)\s*:') AND regexp_extract(line, '[\$₹€£¥]([0-9]+(?:\.[0-9]+)?)', 1) <> '' THEN CAST(regexp_extract(line, '[\$₹€£¥]([0-9]+(?:\.[0-9]+)?)', 1) AS DOUBLE) END AS price,
      |  CASE WHEN regexp_extract(line, '(?i)half:\s*[\$₹€£¥]([0-9]+(?:\.[0-9]+)?)', 1) <> '' THEN CAST(regexp_extract(line, '(?i)half:\s*[\$₹€£¥]([0-9]+(?:\.[0-9]+)?)', 1) AS DOUBLE) END AS half_plate_price,
      |  CASE WHEN regexp_extract(line, '(?i)full:\s*[\$₹€£¥]([0-9]+(?:\.[0-9]+)?)', 1) <> '' THEN CAST(regexp_extract(line, '(?i)full:\s*[\$₹€£¥]([0-9]+(?:\.[0-9]+)?)', 1) AS DOUBLE) END AS full_plate_price,
      |  CASE WHEN regexp_extract(line, '(?i)small:\s*[\$₹€£¥]([0-9]+(?:\.[0-9]+)?)', 1) <> '' THEN CAST(regexp_extract(line, '(?i)small:\s*[\$₹€£¥]([0-9]+(?:\.[0-9]+)?)', 1) AS DOUBLE) END AS small_price,
      |  CASE WHEN regexp_extract(line, '(?i)medium:\s*[\$₹€£¥]([0-9]+(?:\.[0-9]+)?)', 1) <> '' THEN CAST(regexp_extract(line, '(?i)medium:\s*[\$₹€£¥]([0-9]+(?:\.[0-9]+)?)', 1) AS DOUBLE) END AS medium_price,
      |  CASE WHEN regexp_extract(line, '(?i)large:\s*[\$₹€£¥]([0-9]+(?:\.[0-9]+)?)', 1) <> '' THEN CAST(regexp_extract(line, '(?i)large:\s*[\$₹€£¥]([0-9]+(?:\.[0-9]+)?)', 1) AS DOUBLE) END AS large_price,
      |  CASE WHEN regexp_extract(line, '([\$₹€£¥])', 1) <> '' THEN regexp_extract(line, '([\$₹€£¥])', 1) END AS currency
      |FROM l)""".stripMargin

  /** Shared MinHash-LSH CTE chain — splitmix64 coefficients,
    * normalized text, FNV-1a hashed 3-char shingles, 32-hash
    * signatures, md5 band hashes, capped buckets, DISTINCT
    * candidate pairs (`prs`) — used by q25 (the candidate tier)
    * and q174 (the recall evaluation) so the two replays stay in
    * lockstep with `MinHashLsh` by construction.
    */
  /** q183/q184 shared chain: the planted-community graph (`ed`) and
    * four synchronous LPA rounds to `l4` — vote counts + the
    * (count desc, label asc) argmax per layer, mirroring
    * LabelPropagation.propagate round for round.
    */
  private val lpaChain: String = {
    val rounds = (1 to 4).map { r =>
      s"""v$r AS (SELECT recv AS id, l.label, count(*) AS c FROM und
         |  JOIN l${r - 1} l ON l.id = und.voter GROUP BY 1, 2),
         |l$r AS (SELECT id, label FROM v$r
         |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY c DESC, label ASC) = 1)"""
        .stripMargin
    }.mkString(",\n")
    s"""nn AS (SELECT count(*) AS n FROM documents),
       |cq AS (SELECT doc_id AS src, doc_id + k AS dst
       |  FROM (SELECT doc_id, unnest(range(1, 6)) AS k FROM documents) CROSS JOIN nn
       |  WHERE doc_id % 6 + k < 6 AND doc_id + k < n),
       |cl AS (SELECT doc_id AS src, doc_id + 6 AS dst
       |  FROM documents CROSS JOIN nn WHERE doc_id % 29 = 0 AND doc_id + 6 < n),
       |ed AS (SELECT src, dst FROM cq UNION ALL SELECT src, dst FROM cl),
       |und AS (SELECT src AS voter, dst AS recv FROM ed
       |  UNION ALL SELECT dst AS voter, src AS recv FROM ed),
       |l0 AS (SELECT DISTINCT voter AS id, voter AS label FROM und),
       |$rounds""".stripMargin
  }

  /** wordMode (r14d): bases are md5-fold(word-3-gram) % P — the
    * portable word-shingle hash `MinHashLsh.signatures` uses — in
    * place of char-shingle FNV; everything from `sigv` down (incl.
    * the per-(id, i) min merge, the identity on unique ids and the
    * signature-union merge on grouped relations) is shared.
    */
  private def minhashPrsCtes(docsRel: String = "documents",
                             wordMode: Boolean = false): String =
    """WITH co0 AS (SELECT unnest(range(0, 64)) AS j),
        |c1 AS (SELECT j, (CAST(42 AS HUGEINT) + (j + 1) * CAST(11400714819323198485 AS HUGEINT)) % CAST(18446744073709551616 AS HUGEINT) AS z FROM co0),
        |c2 AS (SELECT j, ((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((z // 1073741824) // 4294967296 AS BIGINT)) * CAST(4294967296 AS HUGEINT) + xor(CAST((z) % 4294967296 AS BIGINT), CAST((z // 1073741824) % 4294967296 AS BIGINT)))) * CAST(484763065 AS HUGEINT) + ((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((z // 1073741824) // 4294967296 AS BIGINT)) * CAST(4294967296 AS HUGEINT) + xor(CAST((z) % 4294967296 AS BIGINT), CAST((z // 1073741824) % 4294967296 AS BIGINT)))) * CAST(3210233709 AS HUGEINT)) % CAST(4294967296 AS HUGEINT)) * CAST(4294967296 AS HUGEINT)) % CAST(18446744073709551616 AS HUGEINT)) AS z FROM c1),
        |c3 AS (SELECT j, ((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((z // 134217728) // 4294967296 AS BIGINT)) * CAST(4294967296 AS HUGEINT) + xor(CAST((z) % 4294967296 AS BIGINT), CAST((z // 134217728) % 4294967296 AS BIGINT)))) * CAST(321982955 AS HUGEINT) + ((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((z // 134217728) // 4294967296 AS BIGINT)) * CAST(4294967296 AS HUGEINT) + xor(CAST((z) % 4294967296 AS BIGINT), CAST((z // 134217728) % 4294967296 AS BIGINT)))) * CAST(2496678331 AS HUGEINT)) % CAST(4294967296 AS HUGEINT)) * CAST(4294967296 AS HUGEINT)) % CAST(18446744073709551616 AS HUGEINT)) AS z FROM c2),
        |c4 AS (SELECT j, CAST(CASE WHEN (xor(CAST((z) // 4294967296 AS BIGINT), CAST((z // 2147483648) // 4294967296 AS BIGINT)) * CAST(4294967296 AS HUGEINT) + xor(CAST((z) % 4294967296 AS BIGINT), CAST((z // 2147483648) % 4294967296 AS BIGINT))) >= CAST(1 AS HUGEINT) << 63 THEN (xor(CAST((z) // 4294967296 AS BIGINT), CAST((z // 2147483648) // 4294967296 AS BIGINT)) * CAST(4294967296 AS HUGEINT) + xor(CAST((z) % 4294967296 AS BIGINT), CAST((z // 2147483648) % 4294967296 AS BIGINT))) - CAST(18446744073709551616 AS HUGEINT) ELSE (xor(CAST((z) // 4294967296 AS BIGINT), CAST((z // 2147483648) // 4294967296 AS BIGINT)) * CAST(4294967296 AS HUGEINT) + xor(CAST((z) % 4294967296 AS BIGINT), CAST((z // 2147483648) % 4294967296 AS BIGINT))) END AS BIGINT) AS s FROM c3),
        |coeff AS (SELECT a.j // 2 AS i,
        |    CAST(((a.s % 1000000006) + 1000000006) % 1000000006 + 1 AS BIGINT) AS a,
        |    CAST(((b.s % 1000000007) + 1000000007) % 1000000007 AS BIGINT) AS b
        |  FROM c4 a JOIN c4 b ON b.j = a.j + 1 WHERE a.j % 2 = 0),
        |GRAFT_NG_CTES,
        |sigv AS (SELECT g.doc_id, coeff.i,
        |    coalesce(list_min(list_transform(g.sh, x -> (coeff.a * x + coeff.b) % 1000000007)), 1000000007) AS h
        |  FROM g CROSS JOIN coeff),
        |sig AS (SELECT doc_id, array_agg(h ORDER BY i) AS s
        |  FROM (SELECT doc_id, i, min(h) AS h FROM sigv GROUP BY 1, 2) GROUP BY doc_id),
        |bands AS (SELECT doc_id, unnest(range(0, 4)) AS band_idx, s FROM sig),
        |bh AS (SELECT doc_id, band_idx,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(substring(md5(CAST(band_idx AS VARCHAR) || ':' || array_to_string(list_transform(s[band_idx*8+1 : band_idx*8+8], x -> CAST(x AS VARCHAR)), ':')), 1, 15), ''), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), (a, v) -> a * 16 + v) AS band_hash
        |  FROM bands),
        |sized AS (SELECT doc_id, band_idx, band_hash,
        |    count(*) OVER (PARTITION BY band_idx, band_hash) AS bn FROM bh),
        |ok AS (SELECT * FROM sized WHERE bn <= 200),
        |prs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM ok a JOIN ok b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),""".stripMargin
      .replace("GRAFT_NG_CTES,", if (wordMode) wordNg else charNg)
      .replace("GRAFT_DOCS_REL", docsRel)

  /** Char-shingle n/g pair (FNV-1a mod P over 3-char shingles). */
  private val charNg: String =
    """n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t FROM GRAFT_DOCS_REL),
GRAFT_CHAR_G""".replace("GRAFT_CHAR_G", """g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(t) - 1, 1)), i -> CAST(((CAST(CASE WHEN list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), list_transform(string_split(substring(t, CAST(i AS BIGINT), 3), ''), c -> CAST(ascii(c) AS HUGEINT))), (acc, b) -> (((acc // 256) * 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT))) * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) >= CAST(1 AS HUGEINT) << 63 THEN list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), list_transform(string_split(substring(t, CAST(i AS BIGINT), 3), ''), c -> CAST(ascii(c) AS HUGEINT))), (acc, b) -> (((acc // 256) * 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT))) * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) - CAST(18446744073709551616 AS HUGEINT) ELSE list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), list_transform(string_split(substring(t, CAST(i AS BIGINT), 3), ''), c -> CAST(ascii(c) AS HUGEINT))), (acc, b) -> (((acc // 256) * 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT))) * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) END AS BIGINT) % 1000000007) + 1000000007) % 1000000007 AS BIGINT))) AS sh FROM n),""")

  /** Word-3-gram n/g pair (md5-fold mod P — MinHashLsh's portable
    * word-shingle hash).
    */
  private val wordNg: String =
    ("""n AS (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS tk FROM GRAFT_DOCS_REL),
g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(tk) - 2, 0) + 1), i -> """
      + md5fold("array_to_string(list_slice(tk, i, i + 2), ' ')", 15)
      + """ % 1000000007)) AS sh FROM n),""")

  val all: Map[String, String] = Map(

    "q01_extract_meta" ->
      """SELECT doc_id, source,
        |  CASE WHEN n_chars < 60 THEN 'ocr' ELSE 'text' END AS method,
        |  CAST(length(text) AS BIGINT) AS char_count,
        |  length(text) > 0 AS success
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q02_clean_text" ->
      """WITH raw AS (SELECT doc_id, '--- Page 1 ---' || chr(10) || text || chr(10) || 'x' || chr(10) || '!!!' || chr(10) || 'end of menu....ok' || chr(10) || chr(10) || chr(10) || 'A  B' AS r FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(r, '(?i)-{2,}\s*Page\s*\d+\s*-{2,}', chr(10), 'g') AS t FROM raw),
        |s2 AS (SELECT doc_id, array_to_string(list_transform(list_filter(list_transform(string_split(t, chr(10)), l -> regexp_replace(trim(l), '\.{2,}', ' ', 'g')), l -> length(trim(l)) > 1 AND NOT regexp_full_match(trim(l), '[\W_]+')), l -> trim(l)), chr(10)) AS t FROM s1),
        |s3 AS (SELECT doc_id, trim(regexp_replace(regexp_replace(t, '\n{2,}', chr(10) || chr(10), 'g'), '[ \t]{2,}', ' ', 'g')) AS clean FROM s2)
        |SELECT doc_id, clean, CAST(length(clean) AS BIGINT) AS clean_chars FROM s3 ORDER BY doc_id""".stripMargin,

    "q03_chunk_text" ->
      """SELECT doc_id, chunk_idx, substring(text, CAST(chunk_idx*150+1 AS BIGINT), 150) AS chunk
        |FROM (SELECT doc_id, text, unnest(range(0, greatest(CAST(ceil(length(text)/150.0) AS BIGINT), 1))) AS chunk_idx FROM documents)
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q04_parse_menu" ->
      s"""WITH $menuCte,
         |$parseCte
         |SELECT doc_id, item_name, price, half_plate_price, full_plate_price, small_price, medium_price, large_price, currency
         |FROM parsed ORDER BY doc_id""".stripMargin,

    "q05_validate" ->
      """WITH it AS (SELECT p_partkey,
        |  CASE WHEN p_partkey % 13 = 0 THEN 'X' ELSE '  ' || p_name || '  ' END AS item_name0,
        |  CASE WHEN p_partkey % 11 = 0 THEN CAST(CAST(round(p_retailprice*100) AS BIGINT) * 10000 AS DOUBLE) / 100.0 ELSE CAST(CAST(round(p_retailprice*100) AS BIGINT) AS DOUBLE) / 100.0 END AS price,
        |  CASE WHEN p_partkey % 5 = 0 THEN 'DOLLARS' WHEN p_partkey % 5 = 1 THEN 'USD' ELSE '$' END AS currency0
        | FROM part),
        |v AS (SELECT p_partkey, regexp_replace(trim(item_name0), '\s+', ' ', 'g') AS item_name, price, currency0 FROM it),
        |r AS (SELECT p_partkey, item_name, price,
        |  CASE WHEN currency0 IS NULL THEN NULL WHEN currency0 IN ('$', '₹', '€', '£', '¥', 'AUD', 'USD', 'INR', 'EUR', 'GBP') OR length(currency0) <= 3 THEN currency0 ELSE NULL END AS currency,
        |  CASE WHEN NOT (item_name IS NOT NULL AND length(item_name) >= 2) THEN 'invalid_name'
        |       WHEN NOT (price IS NULL OR (price >= 0 AND price <= 100000)) THEN 'price_out_of_range'
        |       WHEN price IS NULL THEN 'no_price'
        |  END AS rr
        | FROM v)
        |SELECT p_partkey, item_name, currency, rr IS NULL AS is_valid, coalesce(rr, 'ok') AS reject_reason
        |FROM r ORDER BY p_partkey""".stripMargin,

    "q06_price_display" ->
      s"""WITH $menuCte,
         |$parseCte
         |SELECT doc_id, item_name,
         |  CASE WHEN price IS NOT NULL THEN coalesce(currency, '$$') || printf('%.2f', price)
         |       ELSE CASE WHEN concat_ws(' | ',
         |    CASE WHEN half_plate_price IS NOT NULL THEN 'Half: ' || coalesce(currency, '$$') || printf('%.2f', half_plate_price) END,
         |    CASE WHEN full_plate_price IS NOT NULL THEN 'Full: ' || coalesce(currency, '$$') || printf('%.2f', full_plate_price) END,
         |    CASE WHEN small_price IS NOT NULL THEN 'Small: ' || coalesce(currency, '$$') || printf('%.2f', small_price) END,
         |    CASE WHEN medium_price IS NOT NULL THEN 'Medium: ' || coalesce(currency, '$$') || printf('%.2f', medium_price) END,
         |    CASE WHEN large_price IS NOT NULL THEN 'Large: ' || coalesce(currency, '$$') || printf('%.2f', large_price) END) = '' THEN 'No price'
         |       ELSE concat_ws(' | ',
         |    CASE WHEN half_plate_price IS NOT NULL THEN 'Half: ' || coalesce(currency, '$$') || printf('%.2f', half_plate_price) END,
         |    CASE WHEN full_plate_price IS NOT NULL THEN 'Full: ' || coalesce(currency, '$$') || printf('%.2f', full_plate_price) END,
         |    CASE WHEN small_price IS NOT NULL THEN 'Small: ' || coalesce(currency, '$$') || printf('%.2f', small_price) END,
         |    CASE WHEN medium_price IS NOT NULL THEN 'Medium: ' || coalesce(currency, '$$') || printf('%.2f', medium_price) END,
         |    CASE WHEN large_price IS NOT NULL THEN 'Large: ' || coalesce(currency, '$$') || printf('%.2f', large_price) END) END END AS price_display,
         |  coalesce(nullif(price, 0.0), nullif(full_plate_price, 0.0), nullif(half_plate_price, 0.0), nullif(large_price, 0.0), nullif(medium_price, 0.0), nullif(small_price, 0.0)) AS primary_price
         |FROM parsed ORDER BY doc_id""".stripMargin,

    // Expected pipeline output reconstructed DIRECTLY from the
    // deterministic doc construction (two lines per part: a
    // symbol-carrying price line and a symbol-less portion line) —
    // checks parse + detected_currency fallback + restaurant_name +
    // display end-to-end without mirroring the parser.
    "q41_detected_currency" ->
      """WITH m AS (SELECT p_partkey, p_name, CAST(round(p_retailprice*100) AS BIGINT) AS c,
        |  CASE WHEN p_partkey % 3 = 0 THEN '$' WHEN p_partkey % 3 = 1 THEN '₹' ELSE '€' END AS sym
        | FROM part),
        |v AS (SELECT *, CAST(floor(c/2) AS BIGINT) AS ch FROM m),
        |expected AS (
        |  SELECT p_partkey AS doc_id, p_name AS item_name, sym AS currency,
        |    sym || printf('%.2f', CAST(c AS DOUBLE)/100.0) AS price_display,
        |    'Menu ' || p_partkey AS restaurant_name
        |  FROM v
        |  UNION ALL
        |  SELECT p_partkey, p_name || ' II', sym,
        |    'Half: ' || sym || printf('%.2f', CAST(ch AS DOUBLE)/100.0) ||
        |      ' | Full: ' || sym || printf('%.2f', CAST(c AS DOUBLE)/100.0),
        |    'Menu ' || p_partkey
        |  FROM v)
        |SELECT doc_id, item_name, currency, price_display, restaurant_name
        |FROM expected ORDER BY doc_id, item_name""".stripMargin,

    // Expected variant-parse explosion reconstructed directly from the
    // deterministic construction (partkey mod 6 picks the rule branch).
    "q42_variant_parse" ->
      """WITH m AS (SELECT p_partkey, p_name, CAST(round(p_retailprice*100) AS BIGINT) AS c, p_partkey % 6 AS md FROM part),
        |v AS (SELECT *, CAST(floor(c/2) AS BIGINT) AS ch, CAST(floor(c*8/10) AS BIGINT) AS cs, CAST(floor(c*12/10) AS BIGINT) AS cl FROM m),
        |expected AS (
        |  SELECT p_partkey AS doc_id, p_name || ' A' AS item_name, CAST(ch AS DOUBLE)/100.0 AS price,
        |    CAST(NULL AS DOUBLE) AS half_plate_price, CAST(NULL AS DOUBLE) AS full_plate_price,
        |    CAST(NULL AS DOUBLE) AS small_price, CAST(NULL AS DOUBLE) AS medium_price, CAST(NULL AS DOUBLE) AS large_price,
        |    CAST(NULL AS VARCHAR) AS price_display_hint FROM v WHERE md = 0
        |  UNION ALL SELECT p_partkey, p_name || ' B', CAST(c AS DOUBLE)/100.0, NULL, NULL, NULL, NULL, NULL, NULL FROM v WHERE md = 0
        |  UNION ALL SELECT p_partkey, p_name || ' C', CAST(cl AS DOUBLE)/100.0, NULL, NULL, NULL, NULL, NULL, NULL FROM v WHERE md = 0
        |  UNION ALL SELECT p_partkey, p_name, NULL, NULL, NULL,
        |    CAST(cs AS DOUBLE)/100.0, CAST(c AS DOUBLE)/100.0, CAST(cl AS DOUBLE)/100.0, NULL FROM v WHERE md = 1
        |  UNION ALL SELECT p_partkey, p_name, NULL,
        |    CAST(ch AS DOUBLE)/100.0, CAST(c AS DOUBLE)/100.0, NULL, NULL, NULL, NULL FROM v WHERE md = 2
        |  UNION ALL SELECT p_partkey, p_name, NULL, NULL, NULL, NULL, NULL, NULL, 'MP' FROM v WHERE md = 3
        |  UNION ALL SELECT p_partkey, p_name, CAST(ch AS DOUBLE)/100.0, NULL, NULL, NULL, NULL, NULL,
        |    printf('%d.%02d', ch//100, ch%100) || '-' || printf('%d.%02d', c//100, c%100) FROM v WHERE md = 4
        |  UNION ALL SELECT p_partkey, p_name || ' - Chicken', CAST(ch AS DOUBLE)/100.0, NULL, NULL, NULL, NULL, NULL, NULL FROM v WHERE md = 5
        |  UNION ALL SELECT p_partkey, p_name || ' - Mutton', CAST(c AS DOUBLE)/100.0, NULL, NULL, NULL, NULL, NULL, NULL FROM v WHERE md = 5
        |  UNION ALL SELECT p_partkey, p_name || ' - Veg', CAST(cl AS DOUBLE)/100.0, NULL, NULL, NULL, NULL, NULL, NULL FROM v WHERE md = 5)
        |SELECT doc_id, item_name, price, half_plate_price, full_plate_price, small_price, medium_price, large_price, price_display_hint
        |FROM expected ORDER BY doc_id, item_name""".stripMargin,

    "q07_summary" ->
      s"""WITH $menuCte,
         |$parseCte,
         |j AS (SELECT parsed.*, part.p_brand,
         |   CAST(round(coalesce(nullif(price, 0.0), nullif(full_plate_price, 0.0), nullif(half_plate_price, 0.0), nullif(large_price, 0.0), nullif(medium_price, 0.0), nullif(small_price, 0.0)) * 100) AS BIGINT) AS pc,
         |   (price IS NOT NULL OR half_plate_price IS NOT NULL OR full_plate_price IS NOT NULL OR small_price IS NOT NULL OR medium_price IS NOT NULL OR large_price IS NOT NULL) AS has_price
         | FROM parsed JOIN part ON parsed.doc_id = part.p_partkey)
         |SELECT p_brand AS category, count(*) AS total_items,
         |  CAST(sum(CASE WHEN has_price THEN 1 ELSE 0 END) AS BIGINT) AS items_with_prices,
         |  CAST(min(pc) AS DOUBLE) / 100.0 AS min_price,
         |  CAST(max(pc) AS DOUBLE) / 100.0 AS max_price,
         |  CAST(sum(pc) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS avg_price
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q08_batch_manifest" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(CASE WHEN length(text) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
        |  CAST(sum(CAST(length(text) AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_agg" ->
      """WITH b AS (SELECT l_returnflag, l_linestatus,
        |  CAST(round(l_quantity*100) AS BIGINT) AS qc,
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS pc,
        |  CAST(round(l_discount*100) AS BIGINT) AS db,
        |  CAST(round(l_tax*100) AS BIGINT) AS tb
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01')
        |SELECT l_returnflag, l_linestatus,
        |  CAST(sum(qc) AS DOUBLE)/100.0 AS sum_qty,
        |  CAST(sum(pc) AS DOUBLE)/100.0 AS sum_base_price,
        |  CAST(sum(pc*(100-db)) AS DOUBLE)/10000.0 AS sum_disc_price,
        |  CAST(sum(pc*(100-db)*(100+tb)) AS DOUBLE)/1000000.0 AS sum_charge,
        |  CAST(sum(qc) AS DOUBLE)/100.0/CAST(count(*) AS DOUBLE) AS avg_qty,
        |  CAST(sum(pc) AS DOUBLE)/100.0/CAST(count(*) AS DOUBLE) AS avg_price,
        |  CAST(sum(db) AS DOUBLE)/100.0/CAST(count(*) AS DOUBLE) AS avg_disc,
        |  count(*) AS count_order
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q11_filter_project" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
        |  AND l_quantity < 24""".stripMargin,

    "q12_broadcast_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_multi_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "q50_profile" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_quantity_nulls,
        |  count(DISTINCT l_quantity) AS l_quantity_distinct,
        |  CAST(min(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS l_quantity_min,
        |  CAST(max(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS l_quantity_max,
        |  CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_extendedprice_nulls,
        |  count(DISTINCT l_extendedprice) AS l_extendedprice_distinct,
        |  CAST(min(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS l_extendedprice_min,
        |  CAST(max(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS l_extendedprice_max,
        |  CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_discount_nulls,
        |  count(DISTINCT l_discount) AS l_discount_distinct,
        |  CAST(min(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/100.0 AS l_discount_min,
        |  CAST(max(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/100.0 AS l_discount_max,
        |  CAST(sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_tax_nulls,
        |  count(DISTINCT l_tax) AS l_tax_distinct,
        |  CAST(min(CAST(round(l_tax*100) AS BIGINT)) AS DOUBLE)/100.0 AS l_tax_min,
        |  CAST(max(CAST(round(l_tax*100) AS BIGINT)) AS DOUBLE)/100.0 AS l_tax_max
        |FROM lineitem""".stripMargin,

    "q14_window_topk" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q32_topk_native" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q15_semi_anti" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
        |  CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "q16_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag, coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY 1, 2""".stripMargin,

    "q17_time_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q18_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(sum(k) AS DOUBLE)/CAST(count(k) AS DOUBLE) AS avg_k
        |FROM (SELECT event_type, CAST(nullif(regexp_extract(props, '"k":\s*([0-9]+)', 1), '') AS BIGINT) AS k FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q19_dedup_exact" ->
      """SELECT fingerprint, keeper_id, copies
        |FROM (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        |  min(doc_id) AS keeper_id, count(*) AS copies FROM documents GROUP BY 1)
        |ORDER BY keeper_id""".stripMargin,

    "q31_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS pts, value AS purchase_value FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, epoch_us(p.pts) AS matched_us, p.purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.pts
        |ORDER BY event_id""".stripMargin,

    "q35_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, CAST(round(value*100) AS BIGINT) AS vc FROM events),
        |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS newf FROM l),
        |g AS (SELECT *, CAST(sum(newf) OVER (PARTITION BY user_id ORDER BY ts_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM f)
        |SELECT user_id, session_id, min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
        |  count(*) AS n_events, CAST(sum(vc) AS DOUBLE)/100.0 AS total_value
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q45_range_join" ->
      """WITH w AS (SELECT CAST(n_nationkey AS BIGINT) AS window_id,
        |  1704067200000000 + CAST(n_nationkey AS BIGINT) * 97200000000 AS start_us,
        |  1704067200000000 + CAST(n_nationkey AS BIGINT) * 97200000000 + 129600000000 AS end_us
        | FROM nation),
        |e AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events)
        |SELECT e.event_id, w.window_id, e.ts_us
        |FROM e JOIN w ON e.ts_us >= w.start_us AND e.ts_us < w.end_us
        |ORDER BY e.event_id, w.window_id""".stripMargin,

    // Exact interpolated percentiles over integer cents, ROUNDED to
    // whole cents at the output boundary: Spark's (1-g)*lo + g*hi and
    // DuckDB's lo + g*(hi-lo) can differ in the last ulp for
    // non-dyadic g, and the harness bit-compares doubles — the
    // rounded bigint is interpolation-formula-proof. The sketch side
    // stays a 5%-bound assertion (full-precision) as in q38.
    // Quantiles in exact integer space: rank numerator (n-1)*p over
    // denominator 100, 100*percentile = lo*(100-rem) + hi*rem, then
    // (+50)//100 whole-cent HALF_UP — no quantile_cont, so no libm
    // ulp can straddle the two engines (round-6 verdict residual).
    "q46_quantiles" ->
      """WITH v AS (SELECT o_orderpriority, CAST(round(o_totalprice*100) AS BIGINT) AS pc FROM orders),
        |r AS (SELECT o_orderpriority, pc,
        |  CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY pc) - 1 AS BIGINT) AS rn,
        |  CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n FROM v),
        |i AS (SELECT *,
        |  ((n-1)*25)//100 AS i25, ((n-1)*25)%100 AS rem25,
        |  ((n-1)*50)//100 AS i50, ((n-1)*50)%100 AS rem50,
        |  ((n-1)*90)//100 AS i90, ((n-1)*90)%100 AS rem90,
        |  ((n-1)*99)//100 AS i99, ((n-1)*99)%100 AS rem99 FROM r),
        |g AS (SELECT o_orderpriority, max(n) AS n,
        |  max(rem25) AS rem25, max(rem50) AS rem50, max(rem90) AS rem90, max(rem99) AS rem99,
        |  max(CASE WHEN rn = i25 THEN pc END) AS l25, max(CASE WHEN rn = i25 + (CASE WHEN rem25 > 0 THEN 1 ELSE 0 END) THEN pc END) AS h25,
        |  max(CASE WHEN rn = i50 THEN pc END) AS l50, max(CASE WHEN rn = i50 + (CASE WHEN rem50 > 0 THEN 1 ELSE 0 END) THEN pc END) AS h50,
        |  max(CASE WHEN rn = i90 THEN pc END) AS l90, max(CASE WHEN rn = i90 + (CASE WHEN rem90 > 0 THEN 1 ELSE 0 END) THEN pc END) AS h90,
        |  max(CASE WHEN rn = i99 THEN pc END) AS l99, max(CASE WHEN rn = i99 + (CASE WHEN rem99 > 0 THEN 1 ELSE 0 END) THEN pc END) AS h99,
        |  approx_quantile(pc, 0.5) AS ap50
        | FROM i GROUP BY 1)
        |SELECT o_orderpriority, n,
        |  CAST((l25*(100-rem25) + h25*rem25 + 50)//100 AS BIGINT) AS p25,
        |  CAST((l50*(100-rem50) + h50*rem50 + 50)//100 AS BIGINT) AS p50,
        |  CAST((l90*(100-rem90) + h90*rem90 + 50)//100 AS BIGINT) AS p90,
        |  CAST((l99*(100-rem99) + h99*rem99 + 50)//100 AS BIGINT) AS p99,
        |  abs(CAST(ap50 AS BIGINT) - (l50*(100-rem50) + h50*rem50 + 50)//100) * 20
        |    <= (l50*(100-rem50) + h50*rem50 + 50)//100 AS approx_ok
        |FROM g ORDER BY 1""".stripMargin,

    "q47_window_suite" ->
      """WITH f AS (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 97 = 0)
        |SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM f
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, rnk""".stripMargin,

    "q36_pivot" ->
      """SELECT c_mktsegment,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS p1,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS p2,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p4,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS p5
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0)) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_re
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q21_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS ltoks,
        |  list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0) AS toks
        | FROM documents),
        |m AS (SELECT doc_id, text,
        |  CASE WHEN len(ltoks) = 0 THEN 0.0 ELSE CAST(len(list_filter(ltoks, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE) / len(ltoks) END AS stop_ratio,
        |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, b) -> a + b) AS DOUBLE) / len(toks) END AS mean_tok,
        |  CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio
        | FROM t)
        |SELECT doc_id, stop_ratio, mean_tok, punct_ratio,
        |  least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.3
        |    + (1.0 - abs(stop_ratio - 0.1)) * 0.3
        |    + (CASE WHEN mean_tok BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END) * 0.2
        |    + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 AS quality
        |FROM m ORDER BY doc_id""".stripMargin,

    "q22_fingerprint" ->
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents)
        |SELECT doc_id, md5(norm) AS fp_md5,
        |  CASE WHEN length(norm) = 0 THEN 0 ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(norm, ''), c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a * 31 + b) % 1000000007) END AS fp_roll
        |FROM n ORDER BY doc_id""".stripMargin,

    "q37_tfidf" ->
      """WITH terms AS (SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS token FROM documents),
        |tc AS (SELECT doc_id, token, count(*) AS n_term FROM terms GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(n_term) AS BIGINT) AS n_doc_tokens FROM tc GROUP BY 1),
        |df AS (SELECT token, count(*) AS df FROM tc GROUP BY 1)
        |SELECT tc.doc_id, tc.token, tc.n_term, df.df,
        |  CAST(tc.n_term AS DOUBLE) / CAST(dl.n_doc_tokens AS DOUBLE) AS tf
        |FROM tc JOIN dl USING (doc_id) JOIN df USING (token)
        |WHERE tc.doc_id < 25
        |ORDER BY tc.doc_id, tc.token""".stripMargin,

    // C4 langid SCORING tier (r13): the Cavnar-Trenkle-style profile
    // score is integer arithmetic over whitespace tokens and distinct
    // char bigrams — mirrored exactly with DuckDB list lambdas; the
    // argmax tiebreak (max score, then max language code) becomes the
    // descending-language CASE chain.
    "q23_langid" ->
      """WITH d AS (SELECT doc_id, lang AS declared_lang,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> length(t) > 0) AS toks,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |g AS (SELECT doc_id, declared_lang, toks,
        |    list_distinct(list_transform(range(1, length(norm)), i -> substr(norm, CAST(i AS INTEGER), 2))) AS bigrams
        |  FROM d),
        |s AS (SELECT doc_id, declared_lang,
        |    3 * len(list_filter(toks, t -> t IN ('the','and','of','to','is','with','that','for'))) + len(list_intersect(bigrams, ['th','he','in','er','an'])) AS s_en,
        |    3 * len(list_filter(toks, t -> t IN ('el','la','de','que','los','una','por','con'))) + len(list_intersect(bigrams, ['de','en','os','la','ar'])) AS s_es,
        |    3 * len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','mit','ein'))) + len(list_intersect(bigrams, ['en','er','ch','de','ei'])) AS s_de,
        |    3 * len(list_filter(toks, t -> t IN ('le','la','les','des','est','une','dans','pour'))) + len(list_intersect(bigrams, ['es','le','de','re','en'])) AS s_fr,
        |    3 * len(list_filter(toks, t -> t IN ('的','是','不','了','在','人','有','我'))) + len(list_intersect(bigrams, ['的','是','不','了','在'])) AS s_zh
        |  FROM g)
        |SELECT doc_id, declared_lang,
        |  CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh'
        |       WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
        |       WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
        |       WHEN s_en >= s_de THEN 'en'
        |       ELSE 'de' END AS predicted_lang,
        |  CAST(greatest(s_en, s_es, s_de, s_fr, s_zh) AS BIGINT) AS score
        |FROM s ORDER BY doc_id""".stripMargin,

    "q24_ngram_jaccard" ->
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(t) - 1, 1)), i -> substring(t, CAST(i AS BIGINT), 3))) AS sh FROM n),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sa, b.sh AS sb
        |  FROM g a JOIN g b ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0)
        |SELECT id_a, id_b, CAST(len(sa) AS BIGINT) AS n_a, CAST(len(sb) AS BIGINT) AS n_b,
        |  CASE WHEN len(sa) + len(sb) - len(list_intersect(sa, sb)) = 0 THEN 0.0
        |       ELSE CAST(len(list_intersect(sa, sb)) AS DOUBLE) / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE) END AS jaccard
        |FROM p ORDER BY id_a""".stripMargin,

    "q27_embed_neardup" ->
      s"""WITH p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
         |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id),
         |${cosineCte("p")}
         |SELECT id_a, id_b, cosine FROM c WHERE cosine >= CAST(0.4 AS DOUBLE) ORDER BY id_a, id_b""".stripMargin,

    // MinHash LSH candidates (rows-only until r14): the coefficient
    // stream is the same counter-based splitmix64 as q33 (regenerated
    // closed-form with signed floorMod), signatures are min-folds of
    // (a*x+b) mod P over the mirrored shingle hashes, band buckets
    // use the r14 PORTABLE md5 band hash, the size-200 bucket guard
    // and the verify-tier jaccard replay exactly.
    "q25_minhash_lsh" ->
      (minhashPrsCtes() + "\n" +
      """|jj AS (SELECT p.id_a, p.id_b,
        |    CASE WHEN len(ga.sh) = 0 AND len(gb.sh) = 0 THEN 0.0
        |         ELSE CAST(len(list_intersect(ga.sh, gb.sh)) AS DOUBLE) / CAST(len(ga.sh) + len(gb.sh) - len(list_intersect(ga.sh, gb.sh)) AS DOUBLE) END AS jaccard
        |  FROM prs p JOIN g ga ON ga.doc_id = p.id_a JOIN g gb ON gb.doc_id = p.id_b)
        |SELECT id_a, id_b, jaccard FROM jj WHERE jaccard >= CAST(0.5 AS DOUBLE) ORDER BY id_a, id_b""".stripMargin),

    // LSH dedup recall: the SAME shared chain produces the candidate
    // tier (`prs`), and the successor-pair audit set gets its exact
    // Jaccard plus the did-LSH-surface-it flag — the confusion table
    // of the banding, certified end-to-end.
    "q174_lsh_recall" ->
      (minhashPrsCtes(
        "(SELECT doc_id, text FROM documents UNION ALL " +
        "SELECT doc_id + 1000000, substring(text, 1, greatest(length(text) - (doc_id % 40), 1)) FROM documents) AS aug") + "\n" +
      """|sp AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b FROM documents),
         |jv AS (SELECT sp.id_a, sp.id_b,
         |    CASE WHEN len(ga.sh) = 0 AND len(gb.sh) = 0 THEN 0.0
         |         ELSE CAST(len(list_intersect(ga.sh, gb.sh)) AS DOUBLE) / CAST(len(ga.sh) + len(gb.sh) - len(list_intersect(ga.sh, gb.sh)) AS DOUBLE) END AS jaccard
         |  FROM sp JOIN g ga ON ga.doc_id = sp.id_a JOIN g gb ON gb.doc_id = sp.id_b)
         |SELECT jv.id_a, jv.id_b, jv.jaccard,
         |  (prs.id_a IS NOT NULL) AS is_candidate,
         |  jv.jaccard >= CAST(0.8 AS DOUBLE) AS is_true_dup
         |FROM jv LEFT JOIN prs ON prs.id_a = jv.id_a AND prs.id_b = jv.id_b
         |ORDER BY 1, 2""".stripMargin),

    // Sign-LSH near-dup (rows-only until r14): the splitmix64
    // hyperplane stream has a CLOSED FORM per index (the generator is
    // counter-based: x after k calls = seed + k*GAMMA mod 2^64), so
    // the oracle regenerates all 2048 pseudo-gaussian components
    // bit-for-bit (64x64 multiply-mod-2^64 via 32-bit-split HUGEINT
    // products, xor via 32-bit halves, the 4-uniform sum as an
    // ordered fold, REAL truncation), then replays bucket signs,
    // collision pairs and the cosine chain exactly.
    "q33_embed_lsh" ->
      """WITH idx AS (SELECT unnest(range(0, 2048)) AS g),
        |u AS (SELECT g, unnest(range(0, 4)) AS mm FROM idx),
        |s0 AS (SELECT g, mm, (CAST(42 AS HUGEINT) + (CAST(4 AS HUGEINT)*g + mm + 1) * CAST(11400714819323198485 AS HUGEINT)) % CAST(18446744073709551616 AS HUGEINT) AS z FROM u),
        |s1 AS (SELECT g, mm, ((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((z // 1073741824) // 4294967296 AS BIGINT)) * CAST(4294967296 AS HUGEINT) + xor(CAST((z) % 4294967296 AS BIGINT), CAST((z // 1073741824) % 4294967296 AS BIGINT)))) * CAST(484763065 AS HUGEINT) + ((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((z // 1073741824) // 4294967296 AS BIGINT)) * CAST(4294967296 AS HUGEINT) + xor(CAST((z) % 4294967296 AS BIGINT), CAST((z // 1073741824) % 4294967296 AS BIGINT)))) * CAST(3210233709 AS HUGEINT)) % CAST(4294967296 AS HUGEINT)) * CAST(4294967296 AS HUGEINT)) % CAST(18446744073709551616 AS HUGEINT)) AS z FROM s0),
        |s2 AS (SELECT g, mm, ((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((z // 134217728) // 4294967296 AS BIGINT)) * CAST(4294967296 AS HUGEINT) + xor(CAST((z) % 4294967296 AS BIGINT), CAST((z // 134217728) % 4294967296 AS BIGINT)))) * CAST(321982955 AS HUGEINT) + ((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((z // 134217728) // 4294967296 AS BIGINT)) * CAST(4294967296 AS HUGEINT) + xor(CAST((z) % 4294967296 AS BIGINT), CAST((z // 134217728) % 4294967296 AS BIGINT)))) * CAST(2496678331 AS HUGEINT)) % CAST(4294967296 AS HUGEINT)) * CAST(4294967296 AS HUGEINT)) % CAST(18446744073709551616 AS HUGEINT)) AS z FROM s1),
        |s3 AS (SELECT g, mm, (xor(CAST((z) // 4294967296 AS BIGINT), CAST((z // 2147483648) // 4294967296 AS BIGINT)) * CAST(4294967296 AS HUGEINT) + xor(CAST((z) % 4294967296 AS BIGINT), CAST((z // 2147483648) % 4294967296 AS BIGINT))) AS uu FROM s2),
        |terms AS (SELECT g, mm, CAST(uu // 2048 AS DOUBLE) / 9007199254740992.0 - 0.5 AS t FROM s3),
        |gv AS (SELECT g, CAST(list_reduce(array_agg(t ORDER BY mm), (a, b) -> a + b) AS REAL) AS fv FROM terms GROUP BY g),
        |pl AS (SELECT g // 512 AS tbl, (g // 64) % 8 AS bit, array_agg(fv ORDER BY g % 64) AS p
        |  FROM gv GROUP BY g // 512, (g // 64) % 8),
        |e AS (SELECT vec_id, embedding FROM embeddings),
        |dots AS (SELECT e.vec_id, pl.tbl, pl.bit, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(pl.p[i] AS DOUBLE))), (acc, v) -> acc + v) AS dp FROM e CROSS JOIN pl),
        |bks AS (SELECT vec_id, tbl,
        |    CAST(sum(CASE WHEN dp >= 0.0 THEN CAST(1 AS BIGINT) << CAST(bit AS INTEGER) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM dots GROUP BY vec_id, tbl),
        |prs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bks a JOIN bks b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |cz AS (SELECT p.id_a, p.id_b, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))), (acc, v) -> acc + v) AS dp,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE))), (acc, v) -> acc + v)) AS na,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))), (acc, v) -> acc + v)) AS nb
        |  FROM prs p JOIN e ea ON ea.vec_id = p.id_a JOIN e eb ON eb.vec_id = p.id_b),
        |res AS (SELECT id_a, id_b,
        |    CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0 ELSE dp / (na * nb) END AS cosine FROM cz)
        |SELECT id_a, id_b, cosine FROM res WHERE cosine >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    // Trained quality classifier (q212, r16): the whole batch-
    // perceptron training loop — features, labels, three epoch weight
    // tables — unrolled in perceptronCtes; the emitted per-doc margin
    // under the final weights hash-certifies every epoch.
    "q212_perceptron_train" ->
      s"""WITH $perceptronCtes
         |SELECT g.doc_id, CAST(coalesce(psc.margin, 0) AS BIGINT) AS margin,
         |  coalesce(psc.margin, 0) > 0 AS predicted, g.pos AS label
         |FROM gramsP g LEFT JOIN psc USING (doc_id) ORDER BY g.doc_id""".stripMargin,

    // Trained-classifier AUC (q213, r16): q165's exact Mann-Whitney
    // rank machinery over the TRAINED margins — the evidence the
    // training loop learned the planted label (stand-in hash weights
    // sit at ~0.5; trained must sit far above).
    "q213_perceptron_auc" ->
      s"""WITH $perceptronCtes,
         |lab AS (SELECT CAST(coalesce(psc.margin, 0) AS BIGINT) AS s, g.pos AS y
         |  FROM gramsP g LEFT JOIN psc USING (doc_id)),
         |rk AS (SELECT s, y, row_number() OVER (ORDER BY s) AS r FROM lab),
         |gg AS (SELECT s, CAST(min(r) AS HUGEINT) AS lo, CAST(max(r) AS HUGEINT) AS hi,
         |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS HUGEINT) AS p,
         |    CAST(count(*) AS HUGEINT) AS ng
         |  FROM rk GROUP BY s),
         |tt AS (SELECT sum(p * (lo + hi)) AS rs2, sum(p) AS pt, sum(ng - p) AS nt FROM gg)
         |SELECT CAST(pt + nt AS BIGINT) AS n, CAST(pt AS BIGINT) AS n_pos,
         |  CAST(nt AS BIGINT) AS n_neg,
         |  CAST(rs2 - pt * (pt + 1) AS BIGINT) AS numer2,
         |  CASE WHEN pt = 0 OR nt = 0 THEN NULL
         |       ELSE CAST(rs2 - pt * (pt + 1) AS DOUBLE)
         |            / (2.0 * CAST(pt AS DOUBLE) * CAST(nt AS DOUBLE)) END AS auc
         |FROM tt""".stripMargin,

    // Hashing-trick document embeddings (q214, r16): the whole signed
    // projection — fold, bucket, sign, bag sum, dense assembly, norm²
    // — replayed integer-for-integer. r17: the vector is serialized to
    // a comma-joined digit string on BOTH sides (the driver's hasher
    // cannot canonicalize nested payloads; q170-decimal class).
    "q214_text_embed" ->
      s"""WITH $hashedEmbCtes
         |SELECT doc_id,
         |  array_to_string(list_transform(embedding, x -> CAST(x AS VARCHAR)), ',') AS embedding_csv,
         |  norm2 FROM heE ORDER BY doc_id""".stripMargin,

    // Self-contained text retrieval (q215, r16): exact cosine top-5
    // over the q214 self-computed embeddings — integer dot products
    // (list_inner_product over integer-valued doubles, exact below
    // 2^53), cosine as the one mirrored sqrt+division expression.
    "q215_text_retrieval" ->
      s"""WITH $hashedEmbCtes,
         |hq AS (SELECT doc_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qd, norm2 AS qn
         |  FROM heE WHERE doc_id < 5),
         |hx AS (SELECT doc_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd, norm2 FROM heE),
         |hp AS (SELECT hq.query_id, hx.doc_id,
         |    CAST(list_inner_product(hq.qd, hx.xd) AS BIGINT) AS dot,
         |    CASE WHEN hq.qn = 0 OR hx.norm2 = 0 THEN 0.0
         |         ELSE list_inner_product(hq.qd, hx.xd)
         |              / (sqrt(CAST(hq.qn AS DOUBLE)) * sqrt(CAST(hx.norm2 AS DOUBLE))) END AS cosine
         |  FROM hq CROSS JOIN hx)
         |SELECT query_id, CAST(rr AS BIGINT) AS rk, doc_id, dot, cosine FROM (
         |    SELECT query_id, doc_id, dot, cosine,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rr FROM hp)
         |WHERE rr <= 5 ORDER BY query_id, rk""".stripMargin,

    "q28_ann_topk" ->
      s"""WITH p AS (SELECT q.vec_id AS query_id, e.vec_id, q.embedding AS ea, e.embedding AS eb
         |  FROM embeddings q CROSS JOIN embeddings e WHERE q.vec_id < 8),
         |${cosineCte("p")},
         |r AS (SELECT query_id, vec_id, cosine,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk FROM c)
         |SELECT query_id, rk, vec_id, cosine FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    // Near-dup groups over the q39 edge set: on (even, even+1) edges a
    // component is a singleton or a pair, so group_id = the edge's
    // id_a for matched odd docs, else the doc itself. The Spark side
    // runs the general connected-components fixpoint; the shingle-hash
    // Jaccard edges are mirrored bit-for-bit as in q39.
    "q43_dedup_groups" ->
      s"""WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t FROM documents),
         |g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(t) - 1, 1)), i -> ${shingleHash("substring(t, CAST(i AS BIGINT), 3)")})) AS sh FROM n),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sa, b.sh AS sb
         |  FROM g a JOIN g b ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0),
         |j AS (SELECT id_a, id_b,
         |  CASE WHEN len(sa) = 0 AND len(sb) = 0 THEN 0.0
         |       ELSE CAST(len(list_intersect(sa, sb)) AS DOUBLE) / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE) END AS jaccard
         |FROM p),
         |e AS (SELECT id_a, id_b FROM j WHERE jaccard >= CAST(0.1 AS DOUBLE))
         |SELECT d.doc_id, coalesce(e.id_a, d.doc_id) AS group_id,
         |  d.doc_id = coalesce(e.id_a, d.doc_id) AS is_keeper
         |FROM documents d LEFT JOIN e ON d.doc_id = e.id_b
         |ORDER BY d.doc_id""".stripMargin,

    // Bitext mining (q211, r15): shared integer k-means memberships →
    // en×de bucket candidates → exact integer SSE → per-side k-NN
    // pools → best pair per src with the cross-multiplied integer
    // margin d·n·105 < S·100. No float anywhere.
    "q211_bitext_mining" ->
      s"""WITH $ivfQuantTrainCtes,
         |$xqdAmCtes,
         |mem AS (SELECT am.vec_id AS id, d.lang AS g, am.cid
         |  FROM am JOIN documents d ON d.doc_id = am.vec_id),
         |cand AS (SELECT DISTINCT a.id AS src_id, b.id AS tgt_id
         |  FROM mem a JOIN mem b ON a.cid = b.cid AND a.g = 'en' AND b.g = 'de'),
         |cd AS MATERIALIZED (SELECT src_id, tgt_id,
         |    CAST(xa.n2 + xb.n2 - 2 * list_inner_product(xa.qd, xb.qd) AS BIGINT) AS d
         |  FROM cand JOIN xqd xa ON xa.vec_id = src_id JOIN xqd xb ON xb.vec_id = tgt_id),
         |sp AS (SELECT src_id, count(*) AS na, sum(d) AS sa FROM (
         |    SELECT src_id, d, row_number() OVER (PARTITION BY src_id ORDER BY d, tgt_id) AS rr FROM cd)
         |  WHERE rr <= 4 GROUP BY 1),
         |tp AS (SELECT tgt_id, count(*) AS nb, sum(d) AS sb FROM (
         |    SELECT tgt_id, d, row_number() OVER (PARTITION BY tgt_id ORDER BY d, src_id) AS rr FROM cd)
         |  WHERE rr <= 4 GROUP BY 1),
         |best AS (SELECT src_id, tgt_id, d FROM (
         |    SELECT src_id, tgt_id, d, row_number() OVER (PARTITION BY src_id ORDER BY d, tgt_id) AS rr FROM cd)
         |  WHERE rr = 1)
         |SELECT b.src_id, b.tgt_id, b.d AS dist,
         |  CAST(na + nb AS BIGINT) AS nn_n,
         |  CAST(sa + sb AS BIGINT) AS nn_sum,
         |  (b.d * (na + nb) * 105 < (sa + sb) * 100) AS selected
         |FROM best b JOIN sp USING (src_id) JOIN tp USING (tgt_id)
         |ORDER BY src_id""".stripMargin,

    // PQ ANN with CODEBOOK TRAINING replayed (r15; rows-only before):
    // the q29 integer k-means chain generalized with a subspace
    // column — 8 subspaces of 8 dims, 16 centroids each, pmod
    // seeding, one Lloyd round, integer argmin codes, and the exact
    // INTEGER asymmetric distance Σ_s ||q_s − c_{s,code_s}||² ranked
    // by (adc, id). No float anywhere.
    "q114_ann_pq" ->
      """WITH dm AS MATERIALIZED (SELECT vec_id, t.j, (t.j - 1) // 8 AS sub, q[t.j] AS x
        |  FROM (SELECT vec_id, list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)) AS q FROM embeddings)
        |    CROSS JOIN range(1, 65) t(j)),
        |s0 AS (SELECT vec_id % 16 AS cid, sub, j, sum(x) AS sm, count(*) AS n
        |  FROM dm GROUP BY 1, 2, 3),
        |c0 AS (SELECT cid, sub, j, sm // n AS cv FROM s0),
        |e1 AS (SELECT dm.vec_id, c0.sub, c0.cid, sum((dm.x - c0.cv) * (dm.x - c0.cv)) AS d
        |  FROM dm JOIN c0 ON c0.sub = dm.sub AND c0.j = dm.j GROUP BY 1, 2, 3),
        |a1 AS (SELECT vec_id, sub, cid FROM (
        |    SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rr FROM e1)
        |  WHERE rr = 1),
        |s1 AS (SELECT a1.cid, a1.sub, dm.j, sum(dm.x) AS sm, count(*) AS n
        |  FROM a1 JOIN dm ON dm.vec_id = a1.vec_id AND dm.sub = a1.sub GROUP BY 1, 2, 3),
        |c1 AS MATERIALIZED (SELECT cid, sub, j, sm // n AS cv FROM s1),
        |e2 AS (SELECT dm.vec_id, c1.sub, c1.cid, sum((dm.x - c1.cv) * (dm.x - c1.cv)) AS d
        |  FROM dm JOIN c1 ON c1.sub = dm.sub AND c1.j = dm.j GROUP BY 1, 2, 3),
        |codes AS MATERIALIZED (SELECT vec_id, sub, cid FROM (
        |    SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rr FROM e2)
        |  WHERE rr = 1),
        |adc AS (SELECT qd.vec_id AS qid, ct.vec_id AS nid, sum((qd.x - c1.cv) * (qd.x - c1.cv)) AS d
        |  FROM codes ct JOIN c1 ON c1.sub = ct.sub AND c1.cid = ct.cid
        |    JOIN dm qd ON qd.sub = c1.sub AND qd.j = c1.j
        |  WHERE qd.vec_id < 3 GROUP BY 1, 2)
        |SELECT qid AS query_id, CAST(rr AS BIGINT) AS rk, nid AS vec_id,
        |  CAST(d AS BIGINT) AS adc_dist FROM (
        |    SELECT qid, nid, d, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rr FROM adc)
        |WHERE rr <= 5 ORDER BY query_id, rk""".stripMargin,

    // Graph-ANN (q210, r15): the full HNSW-style chain replayed —
    // shared integer k-means training, 3-probe bucket membership
    // (single-bucket kNN graphs disconnect across buckets and strand
    // the beam — measured 0.15 recall), per-node top-10 kNN edges,
    // md5-fold levels (entry tier = trailing base-4 zeros == 3), a
    // 3-entry seed beam and FOUR beam-8 rounds unrolled as
    // MATERIALIZED CTE layers (the PageRank unroll; without
    // MATERIALIZED DuckDB re-inlines each doubly-referenced layer —
    // measured 15-25×). SSE folds run as n² = |a|²+|b|²−2a·b over
    // native list_inner_product doubles — exact for these integers
    // (all magnitudes ≪ 2^53), cast back to BIGINT. No float reaches
    // the output: idist is the exact integer SSE.
    "q210_graph_ann" -> {
      // r16: knobs SCALE with the corpus, mirroring GraphAnn.scaledKnobs
      // exactly — fl2 = ⌊log2 n⌋ via the bit length of printf('%b', n)
      // (integer-exact; float log2 drifts at exact powers). rounds(n)
      // is STRUCTURAL in unrolled SQL, so the chain unrolls to 8 layers
      // (covers exactly n < 32768, i.e. fl2 ≤ 14 → rounds ≤ 8; the
      // fixture corpora are ≤ 2000, and the ENGINE side asserts
      // kn.rounds <= 8 in q210GraphAnn so a larger corpus fails loudly
      // instead of silently under-iterating the oracle) and each
      // round r guards its beam front with r <= rn: an inactive round's
      // front is empty, so its layer degenerates to a pass-through copy
      // of the previous visited set and the final top-k equals the
      // engine's rounds(n)-round search.
      val beamRounds = (1 to 8).map { r =>
        val prev = s"v${r - 1}"
        s"""b$r AS (SELECT qid, nid FROM (
           |    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rr FROM $prev)
           |  WHERE rr <= (SELECT beam FROM kn) AND $r <= (SELECT rn FROM kn)),
           |n$r AS (SELECT DISTINCT b$r.qid, ed.dst AS nid FROM b$r JOIN edges ed ON ed.src = b$r.nid),
           |m$r AS (SELECT n$r.qid, n$r.nid,
           |    CAST(qs.qn2 + xn.n2 - 2 * list_inner_product(qs.qqd, xn.qd) AS BIGINT) AS d
           |  FROM n$r JOIN qs ON qs.qid = n$r.qid JOIN xqd xn ON xn.vec_id = n$r.nid),
           |v$r AS MATERIALIZED (SELECT qid, nid, min(d) AS d FROM (
           |    SELECT qid, nid, d FROM $prev UNION ALL SELECT qid, nid, d FROM m$r) GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH $ivfQuantTrainCtes,
         |$xqdAmCtes,
         |kn AS MATERIALIZED (SELECT n, fl2,
         |    greatest(10, fl2 + 6) AS degree,
         |    greatest(8, fl2 + 6) AS beam,
         |    greatest(4, (fl2 + 1) // 2 + 1) AS rn,
         |    least(15, greatest(1, (fl2 - 4) // 2)) AS ml
         |  FROM (SELECT count(*) AS n, length(printf('%b', count(*))) - 1 AS fl2 FROM embeddings)),
         |nb AS (SELECT am.vec_id AS id, am.cid FROM am),
         |cand AS (SELECT DISTINCT a.id AS src, b.id AS dst
         |  FROM nb a JOIN nb b ON a.cid = b.cid AND a.id <> b.id),
         |cd AS (SELECT cand.src, cand.dst,
         |    CAST(xa.n2 + xb.n2 - 2 * list_inner_product(xa.qd, xb.qd) AS BIGINT) AS d
         |  FROM cand JOIN xqd xa ON xa.vec_id = cand.src JOIN xqd xb ON xb.vec_id = cand.dst),
         |edges AS MATERIALIZED (SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY d, dst) AS rr FROM cd)
         |  WHERE rr <= (SELECT degree FROM kn)),
         |ent AS (SELECT vec_id FROM (
         |    SELECT vec_id, ${md5fold("CAST(vec_id AS VARCHAR)", 8)} AS h FROM embeddings)
         |  WHERE h % (CAST(1 AS BIGINT) << (2 * (SELECT ml FROM kn))) = 0),
         |qs AS MATERIALIZED (SELECT vec_id AS qid, qd AS qqd, n2 AS qn2 FROM xqd WHERE vec_id < 8),
         |v0p AS (SELECT qs.qid, en.vec_id AS nid,
         |    CAST(qs.qn2 + x.n2 - 2 * list_inner_product(qs.qqd, x.qd) AS BIGINT) AS d
         |  FROM qs CROSS JOIN ent en JOIN xqd x ON x.vec_id = en.vec_id),
         |v0 AS MATERIALIZED (SELECT qid, nid, d FROM (
         |    SELECT qid, nid, d, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rr FROM v0p)
         |  WHERE rr <= 3),
         |$beamRounds
         |SELECT qid AS query_id, CAST(rr AS BIGINT) AS rk, nid AS vec_id, d AS idist FROM (
         |    SELECT qid, nid, d, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rr FROM v8)
         |WHERE rr <= 5 ORDER BY query_id, rk""".stripMargin
    },

    // IVF ANN with the TRAINING ROUND replayed (r15; rows-only before):
    // floor(x*2^10) quantization, pmod seeding, integer sum//count
    // means, one Lloyd round on exact integer SSE with cid tie-break,
    // then the corpus assignment, 3-probe routing and q40's cosine
    // scoring tier — the whole chain hash-checked end to end.
    "q29_ann_ivf" ->
      s"""WITH $ivfQuantTrainCtes,
         |a2 AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr FROM e2)
         |  WHERE rr = 1),
         |pr AS (SELECT vec_id AS query_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr
         |    FROM e2 WHERE vec_id < 8)
         |  WHERE rr <= 3),
         |p AS (SELECT pr.query_id, a.vec_id, qe.embedding AS ea, xe.embedding AS eb
         |  FROM pr JOIN a2 a USING (cid)
         |    JOIN embeddings qe ON qe.vec_id = pr.query_id
         |    JOIN embeddings xe ON xe.vec_id = a.vec_id),
         |${cosineCte("p")},
         |r AS (SELECT query_id, vec_id, cosine,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk FROM c)
         |SELECT query_id, rk, vec_id, cosine FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    // The IVF scoring tier on deterministic probe routing (bucket =
    // vec_id % 8, probes = qid..qid+2 mod 8): bucket join + cosine
    // ranking mirrored with the same left-fold dot product as q28.
    "q40_ivf_scoring" ->
      s"""WITH a AS (SELECT vec_id, embedding, vec_id % 8 AS cid FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
         |pr AS (SELECT query_id, qe, (query_id + t.i) % 8 AS cid FROM q CROSS JOIN range(0, 3) t(i)),
         |p AS (SELECT pr.query_id, a.vec_id, pr.qe AS ea, a.embedding AS eb FROM pr JOIN a USING (cid)),
         |${cosineCte("p")},
         |r AS (SELECT query_id, vec_id, cosine,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk FROM c)
         |SELECT query_id, rk, vec_id, cosine FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    // SimHashImpl.simhash64 mirrored exactly: FNV-1a per whitespace
    // token of the lowercased text, per-bit votes, sign bits -> signed
    // 64-bit fingerprint; Hamming to the successor doc via
    // bit_count(xor).
    "q26_simhash" ->
      s"""WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0) AS tk FROM documents),
         |hs AS (SELECT doc_id, list_transform(tk, t -> ${fnv("t")}) AS hl FROM toks),
         |bits AS (SELECT doc_id, hl, unnest(range(0, 64)) AS b FROM hs),
         |votes AS (SELECT doc_id, b, 2 * len(list_filter(hl, h -> (h // (CAST(1 AS HUGEINT) << CAST(b AS INTEGER))) % 2 = 1)) - len(hl) AS v FROM bits),
         |acc AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << CAST(b AS INTEGER) ELSE CAST(0 AS HUGEINT) END) AS u FROM votes GROUP BY 1),
         |sim AS (SELECT doc_id, ${signed("u")} AS simhash FROM acc)
         |SELECT a.doc_id, a.simhash,
         |  CAST(bit_count(xor(a.simhash, coalesce(b.simhash, a.simhash))) AS BIGINT) AS hamming_next
         |FROM sim a LEFT JOIN sim b ON b.doc_id = a.doc_id + 1
         |ORDER BY a.doc_id""".stripMargin,

    // The deterministic subset of the multimodal decode record: byte
    // size, content SHA-256, format routing, success.
    // (width/height/ocr_text are stub-derived via Arrays.hashCode —
    // spec-checked in MultimodalSpec, not portable SQL.)
    // `format` mirrors the Spark magic-byte sniff EXACTLY
    // (Multimodal.sniffImageFormat): of the four magics, only GIF
    // ("GIF", ≥6 bytes) and BMP ("BM", ≥2 bytes) are printable ASCII
    // and therefore reachable from UTF-8 text payloads (PNG's 0x89 is
    // a UTF-8 continuation byte, JPEG's 0xFF is invalid UTF-8 — a
    // text-cast payload can never start with either); everything the
    // sniff misses falls to the byte-length-parity stub branch.
    "q30_multimodal" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_size,
        |  sha256(text) AS content_sha,
        |  CASE
        |    WHEN octet_length(encode(text)) >= 6 AND text LIKE 'GIF%' THEN 'gif'
        |    WHEN text LIKE 'BM%' THEN 'bmp'
        |    WHEN octet_length(encode(text)) % 2 = 0 THEN 'png'
        |    ELSE 'jpeg'
        |  END AS format,
        |  octet_length(encode(text)) > 0 AS success
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Two-phase exact heavy hitters: the oracle is simply the true
    // top-3 tokens per lang — the Spark side must produce the same
    // despite routing through the Misra-Gries candidate sketch.
    "q34_heavy_hitters" ->
      """WITH t AS (SELECT lang, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS tok FROM documents),
        |c AS (SELECT lang, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
        |r AS (SELECT lang, tok, cnt, CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS BIGINT) AS rk FROM c)
        |SELECT lang, rk, tok AS item, cnt FROM r WHERE rk <= 3 ORDER BY lang, rk""".stripMargin,

    // Exact distinct oracle-checked directly; the sketch side as the
    // 10%-bound assertion (each engine runs its own HLL; both must
    // land inside the bound for the booleans to hash-match).
    "q38_approx_distinct" ->
      """WITH t AS (SELECT lang, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS tok FROM documents)
        |SELECT lang, count(DISTINCT tok) AS exact_distinct,
        |  CAST(abs(approx_count_distinct(tok) - count(DISTINCT tok)) AS DOUBLE) <= CAST(count(DISTINCT tok) AS DOUBLE) * 0.1 AS approx_ok
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // Fuzzy matching: identical classic levenshtein in both engines;
    // corruption (drop one char at a partkey-derived position),
    // prefix-2 blocking and the length-band prune mirrored exactly.
    "q49_fuzzy_match" ->
      """WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey % 20 = 0),
        |l AS (SELECT p_partkey AS id_l, p_name AS kl FROM p),
        |r AS (SELECT p_partkey AS id_r,
        |  substring(p_name, 1, CAST(p_partkey % (length(p_name) - 1) AS INTEGER)) ||
        |  substring(p_name, CAST(p_partkey % (length(p_name) - 1) AS INTEGER) + 2) AS kr FROM p),
        |lb AS (SELECT id_l, kl, substring(regexp_replace(lower(trim(kl)), '\s+', ' ', 'g'), 1, 2) AS blk FROM l),
        |rb AS (SELECT id_r, kr, substring(regexp_replace(lower(trim(kr)), '\s+', ' ', 'g'), 1, 2) AS blk FROM r)
        |SELECT id_l, id_r, CAST(levenshtein(kl, kr) AS BIGINT) AS distance
        |FROM lb JOIN rb USING (blk)
        |WHERE abs(length(kl) - length(kr)) <= 1 AND levenshtein(kl, kr) <= 1
        |ORDER BY id_l, id_r""".stripMargin,

    // PII redaction mirrored stage by stage (URL → email → phone, each
    // counted on the previous stage's redacted text), final text md5'd.
    "q48_redact" ->
      """WITH d AS (SELECT doc_id, text || ' Contact user' || doc_id || '@example.com or +1-555-01' || printf('%02d', doc_id % 100) || ' via https://ex.com/m/' || doc_id AS t FROM documents),
        |r1 AS (SELECT doc_id, t, regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g') AS t1 FROM d),
        |r2 AS (SELECT doc_id, t, t1, regexp_replace(t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t2 FROM r1)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, 'https?://[^\s]+')) AS BIGINT) AS n_url,
        |  CAST(len(regexp_extract_all(t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(t2, '\+?[0-9][0-9()\- ]{6,}[0-9]')) AS BIGINT) AS n_phone,
        |  md5(regexp_replace(t2, '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g')) AS redacted_md5
        |FROM r2 ORDER BY doc_id""".stripMargin,

    // Deterministic hash split: fold the first 8 hex chars of md5 to
    // the same 32-bit bucket Spark's conv(substring(md5,1,8),16,10)
    // produces, then the same CASE thresholds.
    "q44_hash_split" ->
      """WITH b AS (SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |    (a, v) -> a * 16 + v) % 100 AS bucket
        | FROM documents)
        |SELECT doc_id,
        |  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
        |  bucket
        |FROM b ORDER BY doc_id""".stripMargin,

    // Intra-doc line dedup: first-occurrence keep mirrored with
    // list slicing + contains; md5 of the rejoined text.
    "q53_line_dedup" ->
      """WITH d AS (SELECT doc_id, concat_ws(chr(10),
        |  'PROMO banner ' || (doc_id % 7), text, 'PROMO banner ' || (doc_id % 7),
        |  'footer', 'PROMO banner ' || (doc_id % 7), 'footer') AS t FROM documents),
        |ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM d),
        |k AS (SELECT doc_id, l, list_filter(list_transform(range(1, len(l) + 1),
        |  i -> CASE WHEN NOT list_contains(l[1:i-1], l[i]) THEN i END), x -> x IS NOT NULL) AS keep_idx FROM ls)
        |SELECT doc_id,
        |  CAST(len(l) - len(keep_idx) AS DOUBLE) / CAST(len(l) AS DOUBLE) AS dup_fraction,
        |  md5(array_to_string(list_transform(keep_idx, i -> l[i]), chr(10))) AS cleaned_md5
        |FROM k ORDER BY doc_id""".stripMargin,

    // Incremental dedup vs the persisted MinHash index — the
    // reconstruct-expected-output pattern: the batch is synthesized
    // from the corpus (doc_id%5==0 → verbatim copy, guaranteed found:
    // identical signatures collide in every band and Jaccard is
    // exactly 1; doc_id%5==1 → unique hex text, guaranteed novel: the
    // verify tier rejects any accidental collision at Jaccard ≈ 0),
    // so is_novel follows from the construction alone and the oracle
    // never mirrors MinHash internals. Eligibility (non-empty shingle
    // set) mirrors Spark's normalized-length >= 3 guard.
    "q54_incremental_dedup" ->
      """SELECT doc_id + 100000 AS doc_id, (doc_id % 5 = 1) AS is_novel
        |FROM documents
        |WHERE doc_id % 5 IN (0, 1)
        |  AND length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) >= 3
        |ORDER BY doc_id""".stripMargin,

    // Gopher quality rules: every signal is an integer count mirrored
    // verbatim (token split + per-token length fold as in q21; line
    // split on chr(10); replace()-based symbol counts are non-
    // overlapping left-to-right in both engines); thresholds evaluate
    // in cross-multiplied integer space so no double exists anywhere.
    "q55_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0) AS toks,
        |  list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS ltoks,
        |  string_split(text, chr(10)) AS lines
        | FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_words,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, b) -> a + b) AS BIGINT) AS sum_len,
        |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS BIGINT) AS n_bullet,
        |  CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS BIGINT) AS n_ellipsis,
        |  CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
        |    + CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT)
        |    + CAST(length(text) - length(replace(text, '…', '')) AS BIGINT) AS n_symbols,
        |  CAST(len(list_intersect(list_distinct(ltoks), ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stop
        | FROM t)
        |SELECT doc_id, n_words, n_lines, n_alpha, n_symbols, n_bullet, n_ellipsis, n_stop,
        |  n_words BETWEEN 50 AND 100000 AS pass_words,
        |  n_words > 0 AND sum_len >= n_words * 3 AND sum_len <= n_words * 10 AS pass_mean_len,
        |  n_words > 0 AND n_symbols * 10 <= n_words AS pass_symbol,
        |  n_bullet * 10 <= n_lines * 9 AS pass_bullet,
        |  n_ellipsis * 10 <= n_lines * 3 AS pass_ellipsis,
        |  n_words > 0 AND n_alpha * 5 >= n_words * 4 AS pass_alpha,
        |  n_stop >= 2 AS pass_stop,
        |  (n_words BETWEEN 50 AND 100000)
        |    AND (n_words > 0 AND sum_len >= n_words * 3 AND sum_len <= n_words * 10)
        |    AND (n_words > 0 AND n_symbols * 10 <= n_words)
        |    AND (n_bullet * 10 <= n_lines * 9)
        |    AND (n_ellipsis * 10 <= n_lines * 3)
        |    AND (n_words > 0 AND n_alpha * 5 >= n_words * 4)
        |    AND (n_stop >= 2) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    // Token-budget selection: md5-hash order with unique tiebreak →
    // exact integer cumulative sums; the window frame is tie-free so
    // RANGE (both engines' default) equals ROWS.
    "q56_token_budget" ->
      """WITH t AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0)) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (SELECT doc_id, lang, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
        | FROM t)
        |SELECT doc_id, lang, n_tokens, CAST(cum AS BIGINT) AS cum_tokens, cum <= 500 AS kept
        |FROM c ORDER BY doc_id""".stripMargin,

    // Per-domain cap: md5-hash row_number per source, keep rank <= 3.
    "q57_domain_cap" ->
      """SELECT doc_id, source,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS domain_rank,
        |  row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 3 AS kept
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Gopher repetition rules: gram construction (overlapping
    // space-joined word n-grams), char-mass arithmetic and the
    // (count DESC, gram ASC) tie-break mirrored exactly; all integer.
    "q58_repetition" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0) AS toks FROM documents),
        |b AS (SELECT doc_id,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, c) -> a + c) AS BIGINT)
        |    + CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS total_chars, toks FROM t),
        |g2 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1), i -> array_to_string(toks[i:i+1], ' '))) AS gram FROM b),
        |c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
        |r2 AS (SELECT doc_id, gram, cnt, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rk FROM c2),
        |top2 AS (SELECT doc_id, gram AS top_2gram, CAST(cnt AS BIGINT) AS top2_count, CAST(cnt * length(gram) AS BIGINT) AS top2_chars FROM r2 WHERE rk = 1),
        |g5 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 4, 0) + 1), i -> array_to_string(toks[i:i+4], ' '))) AS gram FROM b),
        |c5 AS (SELECT doc_id, gram, count(*) AS cnt FROM g5 GROUP BY 1, 2),
        |d5 AS (SELECT doc_id, CAST(sum(cnt * length(gram)) AS BIGINT) AS dup5_chars FROM c5 WHERE cnt > 1 GROUP BY 1)
        |SELECT b.doc_id, total_chars,
        |  coalesce(top_2gram, '') AS top_2gram,
        |  coalesce(top2_count, 0) AS top2_count,
        |  coalesce(top2_chars, 0) AS top2_chars,
        |  coalesce(dup5_chars, 0) AS dup5_chars,
        |  coalesce(top2_chars, 0) * 5 <= total_chars AS pass_top2,
        |  coalesce(dup5_chars, 0) * 10 <= total_chars * 3 AS pass_dup5
        |FROM b LEFT JOIN top2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // Corpus-level boilerplate removal: identical frequency
    // computation (md5 per line, count distinct docs, threshold),
    // keep-index filtering via a collected frequent-hash list, md5 of
    // the order-preserving rejoin — q53's list idioms plus a corpus
    // aggregate.
    "q59_boilerplate" ->
      """WITH d AS (SELECT doc_id, concat_ws(chr(10),
        |  'PROMO banner ' || (doc_id % 7), text, 'PROMO banner ' || (doc_id % 7),
        |  'footer') AS t FROM documents),
        |ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM d),
        |e AS (SELECT doc_id, unnest(l) AS line FROM ls),
        |f AS (SELECT md5(line) AS lh FROM e GROUP BY 1 HAVING count(DISTINCT doc_id) >= 10),
        |fl AS (SELECT coalesce(list(lh), []) AS fls FROM f),
        |k AS (SELECT doc_id, l, list_filter(range(1, len(l) + 1),
        |  i -> NOT list_contains(fls, md5(l[i]))) AS keep FROM ls, fl)
        |SELECT doc_id,
        |  CAST(len(l) AS BIGINT) AS n_lines,
        |  CAST(len(keep) AS BIGINT) AS n_kept,
        |  md5(array_to_string(list_transform(keep, i -> l[i]), chr(10))) AS cleaned_md5
        |FROM k ORDER BY doc_id""".stripMargin,

    // Stratified downsampling: q44's md5 bucket + per-language CASE
    // thresholds mirrored exactly.
    "q52_stratified" ->
      """WITH b AS (SELECT doc_id, lang,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |    (a, v) -> a * 16 + v) % 100 AS bucket
        | FROM documents)
        |SELECT doc_id, lang, bucket,
        |  bucket < (CASE WHEN lang = 'en' THEN 50 WHEN lang = 'es' THEN 80 ELSE 100 END) AS kept
        |FROM b ORDER BY doc_id""".stripMargin,

    // Decontamination: same md5-bucket split as q44, word 8-grams
    // (lowercased whitespace tokens, distinct per doc), test-set gram
    // semi-join, per-train-doc shared counts.
    "q51_decontaminate" ->
      """WITH b AS (SELECT doc_id, text,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |    (a, v) -> a * 16 + v) % 100 AS bucket
        | FROM documents),
        |sp AS (SELECT doc_id, text,
        |  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split FROM b),
        |tk AS (SELECT doc_id, split, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS toks FROM sp),
        |g AS (SELECT doc_id, split, unnest(list_distinct(list_transform(
        |  range(1, greatest(len(toks) - 7, 0) + 1), i -> array_to_string(toks[i:i+7], ' ')))) AS gram FROM tk),
        |tg AS (SELECT DISTINCT gram FROM g WHERE split = 'test'),
        |sh AS (SELECT doc_id, count(DISTINCT gram) AS n_shared FROM g JOIN tg USING (gram) WHERE split = 'train' GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared,
        |  coalesce(sh.n_shared, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM sp WHERE split = 'train') d LEFT JOIN sh USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // MinHash verification tier on the fixed successor-pair candidate
    // set: jaccard over hashed shingle sets, shingle hashing mirrored
    // bit-for-bit (FNV-1a over chars, floorMod 1e9+7, distinct).
    "q39_minhash_verify" ->
      s"""WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t FROM documents),
         |g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(t) - 1, 1)), i -> ${shingleHash("substring(t, CAST(i AS BIGINT), 3)")})) AS sh FROM n),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sa, b.sh AS sb
         |  FROM g a JOIN g b ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0),
         |j AS (SELECT id_a, id_b,
         |  CASE WHEN len(sa) = 0 AND len(sb) = 0 THEN 0.0
         |       ELSE CAST(len(list_intersect(sa, sb)) AS DOUBLE) / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE) END AS jaccard
         |FROM p)
         |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= CAST(0.1 AS DOUBLE) ORDER BY id_a""".stripMargin,

    // Unigram-LM integer evidence: vocabulary pass (per-token corpus
    // counts) joined onto per-(doc,token) counts, both from the same
    // lowercased whitespace tokenization as q20/q21; left join keeps
    // token-less docs with zeroed evidence.
    "q60_unigram_lm" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS token FROM documents),
        |vocab AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY token),
        |dt AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS k FROM toks GROUP BY doc_id, token),
        |per AS (SELECT dt.doc_id AS doc_id,
        |  CAST(sum(k) AS BIGINT) AS n_toks,
        |  CAST(sum(k * cnt) AS BIGINT) AS sum_cnt,
        |  min(cnt) AS min_cnt,
        |  CAST(sum(CASE WHEN cnt = 1 THEN k ELSE 0 END) AS BIGINT) AS n_hapax
        | FROM dt JOIN vocab USING (token) GROUP BY dt.doc_id)
        |SELECT d.doc_id,
        |  coalesce(n_toks, 0) AS n_toks,
        |  coalesce(sum_cnt, 0) AS sum_cnt,
        |  coalesce(min_cnt, 0) AS min_cnt,
        |  coalesce(n_hapax, 0) AS n_hapax
        |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // URL canonicalization + domain cap: the 5-shape URL synthesis is
    // reconstructed verbatim, every extraction is an RE2-safe regex
    // mirrored from UrlFunctions, the registered-domain heuristic uses
    // the same label arithmetic, and the cap is q57's md5 row_number.
    "q61_url_canonicalize" ->
      """WITH u AS (SELECT doc_id,
        |  CASE doc_id % 5
        |    WHEN 0 THEN 'https://www.example' || (doc_id % 10) || '.com/a/b/page' || doc_id || '?utm_source=feed&id=' || doc_id || '&utm_campaign=x#frag'
        |    WHEN 1 THEN 'http://blog.example' || (doc_id % 10) || '.co.uk/post/' || doc_id
        |    WHEN 2 THEN 'https://user@media.example' || (doc_id % 10) || '.org:8080/v/' || doc_id || '?gclid=abc' || doc_id
        |    WHEN 3 THEN 'ftp://files.example' || (doc_id % 10) || '.net/'
        |    ELSE 'not a url ' || doc_id END AS url
        | FROM documents),
        |p AS (SELECT doc_id,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://(?:[^/?#@]*@)?([^/:?#]+)', 2)) AS host,
        |  regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://[^/?#]*(/[^?#]*)', 2) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS q
        | FROM u),
        |r AS (SELECT *, string_split(host, '.') AS ls, len(string_split(host, '.')) AS n FROM p),
        |rd AS (SELECT doc_id, scheme, host, path, q,
        |  CASE WHEN n >= 3 AND ls[n-1] IN ('co','com','org','net','ac','gov') THEN ls[n-2] || '.' || ls[n-1] || '.' || ls[n]
        |       WHEN n >= 2 THEN ls[n-1] || '.' || ls[n]
        |       ELSE host END AS reg_domain,
        |  CAST(len(list_filter(string_split(path, '/'), x -> length(x) > 0)) AS BIGINT) AS path_depth,
        |  array_to_string(list_filter(string_split(q, '&'), x -> NOT regexp_matches(x, '^(utm_[a-z]+|gclid|fbclid|ref)=') AND length(x) > 0), '&') AS kq
        | FROM r),
        |c AS (SELECT doc_id, scheme, host, reg_domain, path_depth,
        |  scheme || '://' || host || path || CASE WHEN length(kq) > 0 THEN '?' || kq ELSE '' END AS canon_url
        | FROM rd)
        |SELECT doc_id, scheme, host, reg_domain, path_depth, canon_url,
        |  CAST(row_number() OVER (PARTITION BY reg_domain ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS domain_rank,
        |  row_number() OVER (PARTITION BY reg_domain ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 3 AS kept
        |FROM c ORDER BY doc_id""".stripMargin,

    // Markup strip: identical HTML synthesis, then the 7-step chain
    // mirrored — script/style wholesale, block closers -> newline,
    // remaining tags -> space, entity decode in the same order (&amp;
    // last), space-run collapse, line-edge trim, blank-line collapse.
    // All patterns are Java-regex/RE2-identical constructs; md5 of
    // the cleaned text checks every byte.
    "q63_strip_markup" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || doc_id || ' &amp; friends</title>' ||
        |  '<style>p { color: red; }</style></head><body>' ||
        |  '<script>var x = 1 < 2 && 3 > 2;</script>' ||
        |  '<h1>Doc ' || doc_id || '</h1>' ||
        |  '<p>' || substring(text, 1, 120) || '</p>' ||
        |  '<div>Tom &amp; Jerry &lt;3 say &quot;hi&#39;&nbsp;there</div>' ||
        |  '<ul><li>alpha</li><li>beta ' || doc_id || '</li></ul>' ||
        |  '<br><hr/></body></html>' AS html FROM documents),
        |s1 AS (SELECT doc_id, html, regexp_replace(html, '(?is)<(script|style)[^>]*>.*?</(script|style)\s*>', ' ', 'g') AS a FROM h),
        |s2 AS (SELECT doc_id, html, regexp_replace(a, '(?i)<(br|hr)\s*/?>|</(p|div|li|tr|h[1-6]|ul|ol|table)\s*>', chr(10), 'g') AS b FROM s1),
        |s3 AS (SELECT doc_id, html, regexp_replace(b, '(?s)<[^>]*>', ' ', 'g') AS c FROM s2),
        |s4 AS (SELECT doc_id, html,
        |  replace(replace(replace(replace(replace(replace(c,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS d FROM s3),
        |s5 AS (SELECT doc_id, html, regexp_replace(d, '[ \t]+', ' ', 'g') AS e FROM s4),
        |s6 AS (SELECT doc_id, html, regexp_replace(e, '(?m)^ +| +$', '', 'g') AS f FROM s5),
        |s7 AS (SELECT doc_id, html, trim(regexp_replace(f, '\n{2,}', chr(10), 'g'), chr(10)) AS clean FROM s6)
        |SELECT doc_id,
        |  regexp_extract(html, '(?is)<title[^>]*>(.*?)</title\s*>', 1) AS title,
        |  CAST(length(clean) AS BIGINT) AS clean_chars,
        |  CAST(len(string_split(clean, chr(10))) AS BIGINT) AS n_lines,
        |  md5(clean) AS clean_md5
        |FROM s7 ORDER BY doc_id""".stripMargin,

    // Semantic dedup: identical union construction (corpus + exact
    // copies of every 10th vector at id+100000), identical 4-bit sign
    // signature, the shared mirrored cosine chain, min-id keeper
    // verdicts.
    "q65_semantic_dedup" ->
      s"""WITH u AS (SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 10 = 0),
         |sb AS (SELECT vec_id, embedding,
         |  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END) +
         |  (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS b
         | FROM u),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
         |  FROM sb a JOIN sb b ON a.b = b.b AND a.vec_id < b.vec_id),
         |${cosineCte("p")},
         |d AS (SELECT id_b, min(id_a) AS dup_of, CAST(count(*) AS BIGINT) AS n_matches, max(cosine) AS best_cosine
         |  FROM c WHERE cosine >= CAST(0.99 AS DOUBLE) GROUP BY id_b)
         |SELECT u.vec_id, d.dup_of IS NULL AS kept, d.dup_of,
         |  coalesce(d.n_matches, 0) AS n_matches, d.best_cosine
         |FROM u LEFT JOIN d ON u.vec_id = d.id_b ORDER BY u.vec_id""".stripMargin,

    // Audio features: the oracle reconstructs the EXPECTED decode
    // output from the same doc_id-keyed sawtooth arithmetic the Spark
    // side encodes into real WAV bytes — if either the RIFF encoder
    // or the chunk-walking decoder is wrong, integers mismatch.
    "q64_audio_features" ->
      """WITH p AS (SELECT doc_id, 400 + (doc_id % 50) * 8 AS n, 13 + doc_id % 7 AS f FROM documents),
        |s AS (SELECT doc_id, n, f, list_transform(range(0, n), i -> (i * f) % 2048 - 1024) AS smp FROM p)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST((n * 1000) // 8000 AS BIGINT) AS duration_ms,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(smp, x -> x * x)), (a, b) -> a + b) AS BIGINT) AS sum_sq,
        |  CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT) AS peak_abs,
        |  true AS valid
        |FROM s ORDER BY doc_id""".stripMargin,

    // Equi-width histogram: all-integer bucket math ((v-lo)*n // span
    // with non-negative operands, so // == Spark's `div`), underflow
    // bucket -1 / overflow bucket 16; bounds derived from the bucket
    // id by the same integer expressions.
    "q62_histogram" ->
      """WITH v AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS c FROM orders),
        |b AS (SELECT c, CASE WHEN c < 250000 THEN CAST(-1 AS BIGINT)
        |                     WHEN c >= 45000000 THEN CAST(16 AS BIGINT)
        |                     ELSE CAST(((c - 250000) * 16) // 44750000 AS BIGINT) END AS bucket FROM v),
        |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sum_cents,
        |             min(c) AS min_cents, max(c) AS max_cents FROM b GROUP BY bucket)
        |SELECT bucket,
        |  CAST(CASE WHEN bucket = -1 THEN NULL ELSE 250000 + (bucket * 44750000 + 15) // 16 END AS BIGINT) AS lo_cents,
        |  CAST(CASE WHEN bucket = 16 THEN NULL ELSE 250000 + ((bucket + 1) * 44750000 + 15) // 16 END AS BIGINT) AS hi_cents,
        |  n, sum_cents, min_cents, max_cents
        |FROM g ORDER BY bucket""".stripMargin,

    // Count-Min sketch: exact probe counts computed by DuckDB; the
    // two sketch certificates asserted true (Spark emits false on an
    // undercounting merge or an over-bound collision → hash mismatch).
    "q66_cms_frequency" ->
      """WITH t AS (SELECT lang, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS tok FROM documents),
        |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens FROM t GROUP BY 1),
        |p AS (SELECT unnest(['column','filter','hash','join','merge','order','scan','window']) AS tok),
        |e AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS exact_cnt FROM t
        |  WHERE tok IN ('column','filter','hash','join','merge','order','scan','window') GROUP BY 1, 2)
        |SELECT g.lang, p.tok, g.n_tokens, coalesce(e.exact_cnt, 0) AS exact_cnt,
        |  true AS never_undercounts, true AS within_bound
        |FROM g CROSS JOIN p LEFT JOIN e ON e.lang = g.lang AND e.tok = p.tok
        |ORDER BY g.lang, p.tok""".stripMargin,

    // Bloom decontamination: q51's split + 8-gram construction, then
    // the bloom mirrored bit-for-bit — 3 md5-fold positions mod 2^20
    // per gram, distinct test-set positions as the filter, membership
    // = all distinct positions present. Bloom counts (false positives
    // included) AND the exact tier both hash-checked.
    "q67_bloom_decontaminate" ->
      s"""WITH b AS (SELECT doc_id, text, ${md5fold("CAST(doc_id AS VARCHAR)", 8)} % 100 AS bucket FROM documents),
         |sp AS (SELECT doc_id, text,
         |  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split FROM b),
         |tk AS (SELECT doc_id, split, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0) AS toks FROM sp),
         |g AS (SELECT doc_id, split, unnest(list_distinct(list_transform(
         |  range(1, greatest(len(toks) - 7, 0) + 1), i -> array_to_string(toks[i:i+7], ' ')))) AS gram FROM tk),
         |gp AS (SELECT doc_id, split, gram, list_distinct([
         |  ${md5fold("'0:' || gram", 15)} % 1048576,
         |  ${md5fold("'1:' || gram", 15)} % 1048576,
         |  ${md5fold("'2:' || gram", 15)} % 1048576]) AS ps FROM g),
         |bp AS (SELECT DISTINCT bloom_pos FROM
         |  (SELECT unnest(ps) AS bloom_pos FROM gp WHERE split = 'test')),
         |tp AS (SELECT doc_id, gram, len(ps) AS np, unnest(ps) AS p FROM gp WHERE split = 'train'),
         |hits AS (SELECT doc_id, gram, any_value(np) AS np, count(bp.bloom_pos) AS nh
         |  FROM tp LEFT JOIN bp ON tp.p = bp.bloom_pos GROUP BY doc_id, gram),
         |fl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN nh = np THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_flagged FROM hits GROUP BY 1),
         |tg AS (SELECT DISTINCT gram FROM g WHERE split = 'test'),
         |ex AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_exact_shared
         |  FROM (SELECT DISTINCT doc_id, gram FROM g WHERE split = 'train') t JOIN tg USING (gram) GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(fl.n_grams, 0) AS n_grams,
         |  coalesce(fl.n_bloom_flagged, 0) AS n_bloom_flagged,
         |  coalesce(ex.n_exact_shared, 0) AS n_exact_shared,
         |  coalesce(fl.n_bloom_flagged, 0) > 0 AS bloom_contaminated,
         |  coalesce(ex.n_exact_shared, 0) > 0 AS exact_contaminated,
         |  coalesce(fl.n_bloom_flagged, 0) >= coalesce(ex.n_exact_shared, 0) AS no_false_negatives
         |FROM (SELECT doc_id FROM sp WHERE split = 'train') d
         |LEFT JOIN fl USING (doc_id) LEFT JOIN ex USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Sequence packing: same md5-bucket writer assignment as q44's
    // split, md5-order exclusive window prefix-sum per writer, `//`
    // sequence ids (non-negative operands, so // == Spark's div).
    "q68_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0)) AS BIGINT) AS n_tokens FROM documents),
         |w AS (SELECT doc_id, n_tokens, ${md5fold("CAST(doc_id AS VARCHAR)", 8)} % 8 AS writer,
         |  md5(CAST(doc_id AS VARCHAR)) AS h FROM t),
         |c AS (SELECT doc_id, writer, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY writer ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM w)
         |SELECT doc_id, writer, n_tokens, cum_before,
         |  cum_before // 2048 AS start_seq,
         |  greatest(cum_before, cum_before + n_tokens - 1) // 2048 AS end_seq,
         |  greatest(cum_before, cum_before + n_tokens - 1) // 2048 > cum_before // 2048 AS crosses_boundary
         |FROM c ORDER BY doc_id""".stripMargin,

    // Temperature (T=2) mixing: the same md5-fold hash halved to 31
    // bits, and the squared-comparison Bernoulli draw in HUGEINT —
    // h31²·domain_tokens < min_tokens·2^62 ⟺ hashFrac < sqrt(min/domain).
    "q69_temperature_mix" ->
      s"""WITH t AS (SELECT doc_id, lang, CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0)) AS BIGINT) AS n_tokens FROM documents),
         |dom AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS domain_tokens FROM t GROUP BY 1),
         |mn AS (SELECT min(domain_tokens) AS min_tokens FROM dom),
         |h AS (SELECT doc_id, lang, n_tokens, ${md5fold("CAST(doc_id AS VARCHAR)", 8)} // 2 AS h31 FROM t)
         |SELECT doc_id, h.lang, n_tokens, domain_tokens, min_tokens,
         |  CAST(h31 AS HUGEINT) * h31 * domain_tokens < CAST(min_tokens AS HUGEINT) * 4611686018427387904 AS kept
         |FROM h JOIN dom ON h.lang = dom.lang CROSS JOIN mn ORDER BY doc_id""".stripMargin,

    // Image pixel stats: the oracle reconstructs the EXPECTED decode
    // output from the same doc_id-keyed channel arithmetic the Spark
    // side encodes into real BMP bytes — a broken BMP encoder or
    // padded-row decoder mismatches the integer sums.
    "q70_image_pixels" ->
      """WITH p AS (SELECT doc_id, 8 + doc_id % 8 AS w, 6 + doc_id % 5 AS h FROM documents),
        |py AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM p),
        |px AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM py),
        |s AS (SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |  CAST(sum((x*7 + y*3 + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((x*5 + y*11 + 2*doc_id) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((x*13 + y + 3*doc_id) % 256) AS BIGINT) AS sum_b,
        |  CAST(greatest(max((x*7 + y*3 + doc_id) % 256), max((x*5 + y*11 + 2*doc_id) % 256),
        |                max((x*13 + y + 3*doc_id) % 256)) AS BIGINT) AS peak
        | FROM px GROUP BY doc_id)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  sum_r, sum_g, sum_b, peak, true AS valid
        |FROM s ORDER BY doc_id""".stripMargin,

    // GIF pixel stats: the oracle reconstructs the EXPECTED decode
    // output from the same doc_id-keyed palette + index arithmetic the
    // Spark side encodes into real GIF bytes (indexed-in/indexed-out
    // through the JDK writer is lossless) — a broken LZW decode or
    // color-table walk mismatches the integer sums.
    "q83_gif_pixels" ->
      """WITH p AS (SELECT doc_id, 8 + doc_id % 8 AS w, 6 + doc_id % 5 AS h FROM documents),
        |py AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM p),
        |px AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM py),
        |j AS (SELECT doc_id, w, h, (x*3 + y*5 + doc_id) % 64 AS ci FROM px),
        |s AS (SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |  CAST(sum((ci*5 + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((ci*11 + 3*doc_id) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((ci*3 + 7*doc_id) % 256) AS BIGINT) AS sum_b,
        |  CAST(greatest(max((ci*5 + doc_id) % 256), max((ci*11 + 3*doc_id) % 256),
        |                max((ci*3 + 7*doc_id) % 256)) AS BIGINT) AS peak
        | FROM j GROUP BY doc_id)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  sum_r, sum_g, sum_b, peak, true AS valid
        |FROM s ORDER BY doc_id""".stripMargin,

    // Span dedup: stride-1 20-token windows hashed with the portable
    // md5 fold; a hash in ≥2 distinct docs flags its span; flagged
    // positions merge into islands (gap > w splits) whose exact token
    // coverage is max−min+w per island. Mirrors SpanDedup bit-for-bit,
    // hash collisions included.
    "q71_span_dedup" ->
      s"""WITH tk AS (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0) AS toks FROM documents),
         |w AS (SELECT doc_id, s.pos AS pos, s.whash AS whash FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 19, 0) + 1),
         |    i -> {'pos': CAST(i - 1 AS BIGINT), 'whash': ${md5fold("array_to_string(toks[i:i+19], ' ')", 15)}})) AS s
         |  FROM tk)),
         |dup AS (SELECT whash FROM (SELECT DISTINCT doc_id, whash FROM w) GROUP BY whash HAVING count(*) >= 2),
         |f AS (SELECT doc_id, pos FROM w WHERE whash IN (SELECT whash FROM dup)),
         |i AS (SELECT doc_id, pos, sum(CASE WHEN prev IS NULL OR pos - prev > 20 THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY doc_id ORDER BY pos) AS isl
         |      FROM (SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM f)),
         |c AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_dup_windows, CAST(sum(cov) AS BIGINT) AS dup_tokens FROM (
         |  SELECT doc_id, isl, count(*) AS cnt, max(pos) - min(pos) + 20 AS cov FROM i GROUP BY doc_id, isl)
         |  GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(greatest(len(toks) - 19, 0) AS BIGINT) AS n_windows,
         |  coalesce(n_dup_windows, 0) AS n_dup_windows,
         |  coalesce(dup_tokens, 0) AS dup_tokens,
         |  coalesce(n_dup_windows, 0) > 0 AS has_dup_span
         |FROM tk t LEFT JOIN c USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    // Trained-classifier scoring from the PERSISTED model (r17): the
    // engine trains (q212's batch perceptron), saves the weight table,
    // loads it back and scores; the oracle replays the training epochs
    // (perceptronCtes) so a green row certifies the save→load→score
    // round trip reproduces in-training margins bit-for-bit.
    // n_tokens stays the whitespace token count; keep = margin > 0.
    "q72_quality_classifier" ->
      s"""WITH $perceptronCtes
         |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(psc.margin, 0) AS BIGINT) AS margin,
         |  coalesce(psc.margin, 0) > 0 AS keep
         |FROM toksP t LEFT JOIN psc USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    // Calibration table: the q72 margin chain + the q165 label,
    // equal-depth bins by the total order (margin, doc_id), exact
    // integer evidence per bin, frac_pos the one mirrored division.
    "q175_calibration" ->
      s"""WITH tk AS (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0) AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks,
         |    t -> ${md5fold("t", 8)} % 2001 - 1000)), (a, v) -> a + v) AS margin,
         |  len(toks) >= 50 AS label
         | FROM tk),
         |rk AS (SELECT margin, label,
         |    row_number() OVER (ORDER BY margin, doc_id) - 1 AS r FROM m),
         |nn AS (SELECT count(*) AS n FROM m),
         |b AS (SELECT margin, label, (r * 10) // n AS bin FROM rk CROSS JOIN nn)
         |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |  CAST(min(margin) AS BIGINT) AS score_lo,
         |  CAST(max(margin) AS BIGINT) AS score_hi,
         |  CAST(sum(margin) AS BIGINT) AS score_sum,
         |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS frac_pos
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    // Ordered funnel: events per user in deterministic (ts_us,
    // event_id) order, folded through the same 4-state automaton
    // (view→click→purchase, each step strictly after the previous).
    // Event types are encoded to step numbers so the fold is an
    // integer left-fold; 'view' == step 1 ⟺ acc 0→1, etc.
    "q73_funnel" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  list(CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 ELSE 0 END AS BIGINT)
        |       ORDER BY ts_us, event_id) AS steps
        | FROM e GROUP BY user_id),
        |f AS (SELECT user_id, n_events,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), steps),
        |    (acc, t) -> CASE WHEN t = acc + 1 THEN acc + 1 ELSE acc END) AS funnel_stage
        | FROM g)
        |SELECT user_id, n_events, funnel_stage, funnel_stage = 3 AS converted
        |FROM f ORDER BY user_id""".stripMargin,

    // Windowed funnel: EXISTS self-joins — level k iff some strictly
    // (ts, event_id)-ordered chain view<click<... completes within
    // 12h of ITS OWN first event. Provably equals the Spark
    // anchors-array fold: the fold keeps the latest chain anchor per
    // step, and replacing an anchor with a later one never loses a
    // completable chain (later start => longer future reach), so
    // fold-reachable == EXISTS-reachable.
    "q84_window_funnel" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events FROM e GROUP BY user_id),
        |v AS (SELECT user_id, ts_us, event_id FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id, ts_us, event_id FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts_us, event_id FROM e WHERE event_type = 'purchase'),
        |l1 AS (SELECT DISTINCT user_id FROM v),
        |l2 AS (SELECT DISTINCT v.user_id FROM v JOIN c ON c.user_id = v.user_id
        |  AND (c.ts_us > v.ts_us OR (c.ts_us = v.ts_us AND c.event_id > v.event_id))
        |  AND c.ts_us - v.ts_us <= 43200000000),
        |l3 AS (SELECT DISTINCT v.user_id FROM v JOIN c ON c.user_id = v.user_id
        |  AND (c.ts_us > v.ts_us OR (c.ts_us = v.ts_us AND c.event_id > v.event_id))
        |  JOIN p ON p.user_id = v.user_id
        |  AND (p.ts_us > c.ts_us OR (p.ts_us = c.ts_us AND p.event_id > c.event_id))
        |  AND p.ts_us - v.ts_us <= 43200000000)
        |SELECT g.user_id, g.n_events,
        |  CAST(CASE WHEN g.user_id IN (SELECT user_id FROM l3) THEN 3
        |            WHEN g.user_id IN (SELECT user_id FROM l2) THEN 2
        |            WHEN g.user_id IN (SELECT user_id FROM l1) THEN 1
        |            ELSE 0 END AS BIGINT) AS funnel_stage,
        |  g.user_id IN (SELECT user_id FROM l3) AS converted
        |FROM g ORDER BY g.user_id""".stripMargin,

    // Range-frame rolling window: trailing 1 hour on the microsecond
    // axis; RANGE frames bound by ORDER-BY value, so both engines
    // include every row within [ts−1h, ts] regardless of ties.
    "q74_rolling" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CAST(round(value*100) AS BIGINT) AS vc FROM events)
        |SELECT event_id, user_id, ts_us,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum(vc) OVER w AS BIGINT) AS sum_1h_cents
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // Keyed-snapshot merge: the same deterministic change batch
    // replayed through SQL FULL OUTER JOIN semantics; op verdicts
    // from explicit side-presence tests.
    "q75_upsert" ->
      """WITH base AS (SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents, c_mktsegment FROM customer),
        |u AS (
        |  SELECT c_custkey, bal_cents + 1000 AS bal_cents, c_mktsegment, false AS del FROM base WHERE c_custkey % 3 = 0
        |  UNION ALL SELECT c_custkey, bal_cents, c_mktsegment, true FROM base WHERE c_custkey % 7 = 0 AND c_custkey % 3 <> 0
        |  UNION ALL SELECT c_custkey + 10000000, bal_cents, c_mktsegment, false FROM base WHERE c_custkey % 11 = 0)
        |SELECT coalesce(b.c_custkey, u.c_custkey) AS c_custkey,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.bal_cents ELSE b.bal_cents END AS bal_cents,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment,
        |  CASE WHEN u.c_custkey IS NOT NULL AND u.del THEN 'delete'
        |       WHEN u.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL THEN 'update'
        |       WHEN u.c_custkey IS NOT NULL THEN 'insert'
        |       ELSE 'carry' END AS op
        |FROM base b FULL OUTER JOIN u ON b.c_custkey = u.c_custkey
        |ORDER BY 1""".stripMargin,

    // SCD2 history: row_number versioning + lead-derived half-open
    // validity over the same deterministic (date, orderkey) order.
    "q76_scd2" ->
      """WITH c AS (SELECT o_custkey, o_orderdate, o_orderkey,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        | FROM orders WHERE o_custkey % 50 = 0)
        |SELECT o_custkey, CAST(row_number() OVER w AS BIGINT) AS version_no,
        |  o_orderdate AS valid_from, lead(o_orderdate) OVER w AS valid_to,
        |  lead(o_orderdate) OVER w IS NULL AS is_current, o_orderkey, price_cents
        |FROM c WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version_no""".stripMargin,

    // Bucketed-checksum reconciliation: row hash = md5 fold of the
    // unit-separator-joined stringified row (nulls → chr(0) sentinel,
    // mirroring Reconcile.rowHash), bucket = q44's 8-hex md5 fold of
    // the key, combiner = bit_xor.
    "q77_reconcile" ->
      s"""WITH a AS (SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents, o_orderstatus FROM orders),
         |b AS (SELECT o_orderkey,
         |  CASE WHEN o_orderkey % 1000 = 13 THEN price_cents + 100 ELSE price_cents END AS price_cents,
         |  o_orderstatus FROM a WHERE o_orderkey % 1000 <> 7),
         |ha AS (SELECT ${md5fold("CAST(o_orderkey AS VARCHAR)", 8)} % 64 AS bucket,
         |  ${md5fold("concat_ws(chr(1), coalesce(CAST(o_orderkey AS VARCHAR), chr(0)), coalesce(CAST(price_cents AS VARCHAR), chr(0)), coalesce(o_orderstatus, chr(0)))", 15)} AS h FROM a),
         |hb AS (SELECT ${md5fold("CAST(o_orderkey AS VARCHAR)", 8)} % 64 AS bucket,
         |  ${md5fold("concat_ws(chr(1), coalesce(CAST(o_orderkey AS VARCHAR), chr(0)), coalesce(CAST(price_cents AS VARCHAR), chr(0)), coalesce(o_orderstatus, chr(0)))", 15)} AS h FROM b),
         |ca AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_a, bit_xor(h) AS xor_a FROM ha GROUP BY bucket),
         |cb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_b, bit_xor(h) AS xor_b FROM hb GROUP BY bucket)
         |SELECT coalesce(ca.bucket, cb.bucket) AS bucket,
         |  coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b, xor_a, xor_b,
         |  coalesce(n_a, 0) = coalesce(n_b, 0) AND xor_a IS NOT DISTINCT FROM xor_b AS matches
         |FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket
         |ORDER BY 1""".stripMargin,

    // Gap-fill + LOCF: per-user daily spine (generate_series over the
    // user's [min, max] day), left-joined daily counts and the
    // last-event-of-day value (row_number pick, (ts_us, event_id)
    // DESC), forward-filled with IGNORE NULLS last_value.
    "q78_gapfill" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d, epoch_us(ts) AS ts_us, event_id,
        |  CAST(round(value*100) AS BIGINT) AS vc FROM events),
        |cnt AS (SELECT user_id, d, CAST(count(*) AS BIGINT) AS n_events FROM e GROUP BY 1, 2),
        |lastv AS (SELECT user_id, d, vc AS last_vc FROM (
        |  SELECT user_id, d, vc, row_number() OVER (PARTITION BY user_id, d ORDER BY ts_us DESC, event_id DESC) AS rn FROM e) WHERE rn = 1),
        |spine AS (SELECT user_id, unnest(generate_series(min(d), max(d), INTERVAL 1 DAY))::DATE AS d FROM e GROUP BY user_id),
        |j AS (SELECT s.user_id, s.d, coalesce(n_events, 0) AS n_events, last_vc
        |      FROM spine s LEFT JOIN cnt USING (user_id, d) LEFT JOIN lastv USING (user_id, d))
        |SELECT user_id, d, n_events,
        |  last_value(last_vc IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_vc,
        |  n_events = 0 AS is_gap
        |FROM j ORDER BY user_id, d""".stripMargin,

    // Span removal: q71's windows with per-hash min-id keepers; loser
    // positions merge into islands whose covered ranges are cut from
    // the lowercased token sequence; md5 of the single-space rejoin
    // hash-checks the whole treatment end-to-end.
    "q79_span_removal" ->
      s"""WITH tk AS (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0) AS toks FROM documents),
         |w AS (SELECT doc_id, s.pos AS pos, s.whash AS whash FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 19, 0) + 1),
         |    i -> {'pos': CAST(i - 1 AS BIGINT), 'whash': ${md5fold("array_to_string(toks[i:i+19], ' ')", 15)}})) AS s
         |  FROM tk)),
         |own AS (SELECT whash, min(doc_id) AS keeper FROM (SELECT DISTINCT doc_id, whash FROM w) GROUP BY whash HAVING count(*) >= 2),
         |lose AS (SELECT doc_id, pos FROM w JOIN own USING (whash) WHERE doc_id <> keeper),
         |i AS (SELECT doc_id, pos, sum(CASE WHEN prev IS NULL OR pos - prev > 20 THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY doc_id ORDER BY pos) AS isl
         |      FROM (SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM lose)),
         |cuts AS (SELECT doc_id, list({'s': s, 'e': e}) AS cuts FROM (
         |  SELECT doc_id, isl, min(pos) AS s, max(pos) + 19 AS e FROM i GROUP BY doc_id, isl) GROUP BY doc_id),
         |c AS (SELECT t.doc_id, toks, coalesce(cuts, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])) AS cuts
         |      FROM tk t LEFT JOIN cuts USING (doc_id)),
         |f AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks,
         |  list_filter(range(1, len(toks) + 1),
         |    i -> len(list_filter(cuts, r -> i - 1 >= r.s AND i - 1 <= r.e)) = 0) AS keepidx
         | FROM c)
         |SELECT doc_id, n_tokens,
         |  CAST(n_tokens - len(keepidx) AS BIGINT) AS n_removed_tokens,
         |  -- array_to_string([]) is NULL in DuckDB but '' in Spark's
         |  -- array_join: coalesce so fully-cut docs hash the empty string
         |  md5(coalesce(array_to_string(list_transform(keepidx, i -> toks[i]), ' '), '')) AS cleaned_md5
         |FROM f ORDER BY doc_id""".stripMargin,

    // PNG pixel decode: expected statistics rebuilt from the synthesis
    // arithmetic (q70's reconstruct-expected pattern) — the oracle
    // never sees a PNG byte, so encoder, inflater plumbing, and filter
    // reconstruction must all be right for the hash to match.
    "q80_png_pixels" ->
      """WITH p AS (SELECT doc_id, 9 + doc_id % 7 AS w, 5 + doc_id % 6 AS h FROM documents),
        |py AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM p),
        |px AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM py),
        |s AS (SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |  CAST(sum((x*11 + y*5 + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((x*3 + y*13 + 2*doc_id) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((x*7 + y*9 + 3*doc_id) % 256) AS BIGINT) AS sum_b,
        |  CAST(greatest(max((x*11 + y*5 + doc_id) % 256), max((x*3 + y*13 + 2*doc_id) % 256),
        |                max((x*7 + y*9 + 3*doc_id) % 256)) AS BIGINT) AS peak
        | FROM px GROUP BY doc_id)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  sum_r, sum_g, sum_b, peak, true AS valid
        |FROM s ORDER BY doc_id""".stripMargin,

    // CUBE: same MSB-first grouping bitmask in both engines
    // (GROUPING(a, b) == Spark grouping_id() over cube(a, b)).
    "q81_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, 1, 2""".stripMargin,

    // Cluster-balanced sampling: sign-bit bucket (exact float > 0
    // comparisons) + q57's md5-ordered per-cluster cap.
    "q82_cluster_sample" ->
      """WITH c AS (SELECT vec_id,
        |  (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
        |  + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
        |  + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) AS cid
        | FROM embeddings),
        |r AS (SELECT vec_id, CAST(cid AS BIGINT) AS cid,
        |  CAST(row_number() OVER (PARTITION BY cid
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS domain_rank
        | FROM c)
        |SELECT vec_id, cid, domain_rank, domain_rank <= 40 AS kept
        |FROM r ORDER BY vec_id""".stripMargin,

    // Incremental aggregate maintenance: the oracle is the FULL
    // RECOMPUTE over the post-CDC fact (m=13 deleted, m=7 inserted
    // back, m=21 updated +100, l_partkey%97=0 prices NULL) — the
    // hash match proves delta-apply ≡ recompute, including NULL-sum
    // bookkeeping via count(price_cents).
    "q85_incremental_agg" ->
      """WITH li AS (SELECT l_suppkey, l_returnflag, l_orderkey % 100 AS m,
        |  CASE WHEN l_partkey % 97 <> 0
        |    THEN CAST(round(l_extendedprice*100) AS BIGINT) END AS price_cents
        | FROM lineitem),
        |fact AS (SELECT l_suppkey, l_returnflag,
        |  CASE WHEN m = 21 THEN price_cents + 100 ELSE price_cents END AS price_cents
        | FROM li WHERE m <> 13)
        |SELECT l_suppkey, l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(price_cents) AS BIGINT) AS sum_price_cents,
        |  CAST(count(price_cents) AS BIGINT) AS nn_price_cents
        |FROM fact GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Graph degree + triangles: id-ordered a<b<c triangle self-join —
    // orientation-invariant counts, so exact agreement cross-checks
    // the Spark side's degree-ordered enumeration.
    "q86_graph_metrics" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 5 = 0),
        |pairs AS (SELECT DISTINCT x.l_partkey AS u, y.l_partkey AS v
        |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        |  SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs) GROUP BY 1),
        |tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |  FROM pairs e1 JOIN pairs e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v),
        |tcnt AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
        |  SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri) GROUP BY 1)
        |SELECT d.node AS part_id, d.degree, coalesce(t.triangles, 0) AS triangles
        |FROM deg d LEFT JOIN tcnt t ON d.node = t.node ORDER BY 1""".stripMargin,

    // BM25 retrieval (odds-ratio idf variant — see Bm25.scala): the
    // score is a pure + × ÷ double composition with the association
    // order mirrored operator-for-operator ((1.2 + 1.0), (1.0 - 0.75)
    // are COMPUTED, not folded to 2.2/0.25 — Scala's k1+1.0 is not
    // the double literal 2.2), and the per-doc sum is a token-ordered
    // left fold (the q27 dot-product pattern) — so the hash match is
    // bit-exact.
    "q87_bm25" ->
      """WITH q AS (SELECT CAST(query_id AS BIGINT) AS query_id, term
        |  FROM (VALUES (1,'hash'),(1,'join'),(2,'window'),(2,'merge'),(2,'batch'),
        |               (3,'vector'),(3,'scan'),(3,'slow'),(3,'data')) t(query_id, term)),
        |toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS token FROM documents),
        |tc AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS n_term FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(n_term) AS BIGINT) AS n_doc_tokens FROM tc GROUP BY 1),
        |st AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS nd,
        |       CAST((SELECT sum(n_doc_tokens) FROM dl) AS DOUBLE) AS tot),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tc
        |  WHERE token IN (SELECT term FROM q) GROUP BY 1),
        |c AS (SELECT q.query_id, tc.doc_id, tc.token,
        |    ((nd - CAST(df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
        |    * ((CAST(tc.n_term AS DOUBLE) * (1.2 + 1.0))
        |       / (CAST(tc.n_term AS DOUBLE) + 1.2 * ((1.0 - 0.75)
        |          + (0.75 * CAST(dl.n_doc_tokens AS DOUBLE)) / (tot / nd)))) AS contrib
        |  FROM q JOIN tc ON tc.token = q.term
        |  JOIN dl USING (doc_id) JOIN df ON df.token = tc.token CROSS JOIN st),
        |s AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(contrib ORDER BY token)),
        |      (acc, v) -> acc + v) AS score
        |  FROM c GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank FROM s)
        |SELECT query_id, rank, doc_id, n_hit_terms, score
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // Z-order curve math (ZOrderLayout.morton2/zBucket): the 5-step
    // shift-mask bit spread mirrored constant-for-constant — pure
    // BIGINT & | << arithmetic, trivially bit-exact.
    "q88_zorder" -> {
      def spread(v: String): String = {
        val a = s"($v & 65535)"
        val b = s"(($a | ($a << 8)) & 16711935)"
        val c = s"(($b | ($b << 4)) & 252645135)"
        val d = s"(($c | ($c << 2)) & 858993459)"
        s"(($d | ($d << 1)) & 1431655765)"
      }
      val z = s"(${spread("x")} | (${spread("y")} << 1))"
      s"""WITH li AS (SELECT l_orderkey, l_partkey, l_suppkey,
         |  l_partkey % 65536 AS x, l_suppkey % 65536 AS y
         | FROM lineitem WHERE l_orderkey % 50 = 0),
         |m AS (SELECT l_orderkey, l_partkey, l_suppkey, CAST($z AS BIGINT) AS zval FROM li)
         |SELECT l_orderkey, l_partkey, l_suppkey, zval,
         |  CAST(zval >> 26 AS BIGINT) AS z_cell
         |FROM m ORDER BY l_orderkey, l_partkey, l_suppkey""".stripMargin
    },

    // The bloom pre-filter is semantically transparent (false
    // positives die in the real join, false negatives impossible), so
    // the oracle is the PLAIN selective join.
    "q89_bloom_join" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_size = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // JPEG pixel stats: flat 8×8 blocks are DC-only with all-ones
    // quant tables, so the hand-rolled decode (Huffman → dequant →
    // IDCT → fixed-point YCbCr→RGB) is EXACT integer arithmetic the
    // oracle mirrors constant-for-constant (91881/22554/46802/116130
    // over 2^16; /65536.0 is a power-of-two division, so floor() is
    // bit-exact, matching the decoder's arithmetic >> 16).
    "q90_jpeg_pixels" ->
      """WITH p AS (SELECT doc_id, 1 + doc_id % 4 AS bw, 1 + doc_id % 3 AS bh FROM documents),
        |pby AS (SELECT doc_id, bw, bh, unnest(range(0, bh)) AS by FROM p),
        |pbx AS (SELECT doc_id, bw, bh, by, unnest(range(0, bw)) AS bx FROM pby),
        |ycc AS (SELECT doc_id, bw, bh,
        |  (17*bx + 29*by + doc_id) % 256 AS y,
        |  ((11*bx + 7*by + 3*doc_id) % 97) - 48 AS cb,
        |  ((13*bx + 5*by + 7*doc_id) % 89) - 44 AS cr
        | FROM pbx),
        |rgb AS (SELECT doc_id, bw, bh,
        |  least(greatest(y + CAST(floor((91881*cr + 32768)/65536.0) AS BIGINT), 0), 255) AS r,
        |  least(greatest(y + CAST(floor((-22554*cb - 46802*cr + 32768)/65536.0) AS BIGINT), 0), 255) AS g,
        |  least(greatest(y + CAST(floor((116130*cb + 32768)/65536.0) AS BIGINT), 0), 255) AS b
        | FROM ycc),
        |s AS (SELECT doc_id, any_value(bw) AS bw, any_value(bh) AS bh,
        |  CAST(64*sum(r) AS BIGINT) AS sum_r,
        |  CAST(64*sum(g) AS BIGINT) AS sum_g,
        |  CAST(64*sum(b) AS BIGINT) AS sum_b,
        |  CAST(greatest(max(r), max(g), max(b)) AS BIGINT) AS peak
        | FROM rgb GROUP BY doc_id)
        |SELECT doc_id, CAST(8*bw AS BIGINT) AS width, CAST(8*bh AS BIGINT) AS height,
        |  sum_r, sum_g, sum_b, peak, true AS valid
        |FROM s ORDER BY doc_id""".stripMargin,

    // BPE training: the oracle replays all 6 rounds (pair counting,
    // argmax tie-break, greedy merge application) — see bpeOracle.
    "q91_bpe_train" -> bpeOracle(6),

    // BPE encode: training replayed, then per-doc nested merge folds
    // in rank order — see bpeEncodeOracle.
    "q92_bpe_encode" -> bpeEncodeOracle(6),

    // Blocklist: per-pattern non-overlapping counts via string_split —
    // the exact semantics of the Aho-Corasick greedy keep (q93's
    // scaladoc); dominant-pattern ties break on min(p).
    "q93_blocklist" -> {
      val pats = graft.functions.Blocklist.defaultPatterns
        .map(p => s"'$p'").mkString(", ")
      s"""WITH pats AS (SELECT unnest([$pats]) AS p),
         |h AS (SELECT doc_id, p,
         |    CAST(len(string_split(lower(text), p)) - 1 AS BIGINT) AS c
         |  FROM documents CROSS JOIN pats),
         |m AS (SELECT doc_id, max(c) AS mx FROM h GROUP BY doc_id)
         |SELECT h.doc_id,
         |  CAST(sum(h.c) AS BIGINT) AS total_hits,
         |  CAST(count(CASE WHEN h.c > 0 THEN 1 END) AS BIGINT) AS n_matched,
         |  coalesce(min(CASE WHEN h.c = m.mx AND h.c > 0 THEN h.p END), '') AS top_pattern
         |FROM h JOIN m USING (doc_id)
         |GROUP BY h.doc_id ORDER BY h.doc_id""".stripMargin
    },

    // OCR: the classifier must recover the rendered snippet exactly
    // (font separation ≥ 3 makes one-flip recovery provable), and its
    // reported template distance is exactly one per non-space glyph —
    // both reconstructible from the synthesis arithmetic alone.
    "q94_ocr" ->
      """WITH s AS (SELECT doc_id,
        |    coalesce(nullif(substr(regexp_replace(lower(coalesce(text, '')),
        |      '[^a-z0-9 ]', '', 'g'), 1, 16), ''), ' ') AS snip
        |  FROM documents)
        |SELECT doc_id, snip AS ocr_text,
        |  CAST(length(snip) AS BIGINT) AS n_chars,
        |  CAST(length(replace(snip, ' ', '')) AS BIGINT) AS sum_dist,
        |  TRUE AS valid
        |FROM s ORDER BY doc_id""".stripMargin,

    // Bigram LM: adjacent pairs via DuckDB's positional zip of two
    // unnested list slices (head, tail-shift), then the same
    // aggregate tree as the Spark side — doc-pair counts, corpus
    // pair counts, context totals, per-doc integer evidence. ln-based
    // score is pruned on both engines (q60's libm tradeoff).
    "q95_bigram_lm" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS t
        |  FROM documents),
        |bgl AS (SELECT doc_id, unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
        |  FROM toks),
        |dbt AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS k
        |  FROM bgl GROUP BY doc_id, w1, w2),
        |bg AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS cnt FROM dbt GROUP BY w1, w2),
        |ctx AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS ctx FROM bg GROUP BY w1),
        |per AS (SELECT dbt.doc_id AS doc_id,
        |  CAST(sum(k) AS BIGINT) AS n_bigrams,
        |  CAST(sum(k * cnt) AS BIGINT) AS sum_cnt,
        |  min(cnt) AS min_cnt,
        |  CAST(sum(CASE WHEN cnt = 1 THEN k ELSE 0 END) AS BIGINT) AS n_hapax,
        |  CAST(sum(k * ctx) AS BIGINT) AS sum_ctx
        | FROM dbt JOIN bg USING (w1, w2) JOIN ctx USING (w1) GROUP BY dbt.doc_id)
        |SELECT d.doc_id,
        |  coalesce(n_bigrams, 0) AS n_bigrams,
        |  coalesce(sum_cnt, 0) AS sum_cnt,
        |  coalesce(min_cnt, 0) AS min_cnt,
        |  coalesce(n_hapax, 0) AS n_hapax,
        |  coalesce(sum_ctx, 0) AS sum_ctx
        |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // Largest-remainder apportionment: the whole Hamilton arithmetic
    // replayed in integer SQL — floor shares via //, remainder rank
    // with the same (rem DESC, key ASC) tie-break.
    "q96_apportion" ->
      """WITH m AS (SELECT source AS key,
        |    CAST(sum(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      x -> length(x) > 0))) AS BIGINT) AS mass
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(mass) AS BIGINT) AS M FROM m),
        |b AS (SELECT key, mass,
        |    CAST(mass * 1000000 // M AS BIGINT) AS base_quota,
        |    CAST(mass * 1000000 % M AS BIGINT) AS rem
        |  FROM m, t),
        |r AS (SELECT CAST(1000000 - sum(base_quota) AS BIGINT) AS xt FROM b),
        |rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, key) AS rn FROM b)
        |SELECT key, mass, base_quota,
        |  CAST(CASE WHEN rn <= xt THEN 1 ELSE 0 END AS BIGINT) AS extra,
        |  CAST(base_quota + CASE WHEN rn <= xt THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM rk, r ORDER BY key""".stripMargin,

    // Link graph: identical HTML synthesis, the same anchor-href
    // regex, the q61 host + registered-domain chain on the hrefs,
    // external-scheme filter, then the weighted edge aggregate.
    "q98_link_graph" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><body><a href="https://www.example' || ((doc_id + 1) % 10) || '.com/a/' || doc_id || '?utm_source=f&id=' || doc_id || '">one</a>' ||
        |  '<p>filler</p><a class="x" href="http://blog.example' || ((doc_id + 2) % 10) || '.co.uk/post/' || doc_id || '">two</a>' ||
        |  '<a href="https://www.example' || ((doc_id + 1) % 10) || '.com/a/' || doc_id || '?utm_source=f&id=' || doc_id || '">dup</a>' ||
        |  '<a href="/rel/' || doc_id || '">rel</a>' ||
        |  '<a href="mailto:u@example.com">mail</a></body></html>' AS html,
        |  'example' || (doc_id % 10) || '.com' AS src
        | FROM documents),
        |l AS (SELECT src, unnest(regexp_extract_all(html, '<a [^>]*href="([^"]*)"', 1)) AS href FROM h),
        |e AS (SELECT src,
        |    lower(regexp_extract(href, '^([A-Za-z][A-Za-z0-9+.-]*)://(?:[^/?#@]*@)?([^/:?#]+)', 2)) AS host
        |  FROM l
        |  WHERE lower(regexp_extract(href, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) IN ('http', 'https')),
        |r AS (SELECT src, host, string_split(host, '.') AS ls, len(string_split(host, '.')) AS n FROM e),
        |rd AS (SELECT src,
        |  CASE WHEN n >= 3 AND ls[n-1] IN ('co','com','org','net','ac','gov') THEN ls[n-2] || '.' || ls[n-1] || '.' || ls[n]
        |       WHEN n >= 2 THEN ls[n-1] || '.' || ls[n]
        |       ELSE host END AS dst
        | FROM r)
        |SELECT src, dst, CAST(count(*) AS BIGINT) AS n_links
        |FROM rd GROUP BY src, dst ORDER BY src, dst""".stripMargin,

    // MP3 frame-header walk: every output reconstructed from the
    // synthesis arithmetic — the published MPEG-1 Layer III bitrate/
    // samplerate tables as 1-based list lookups, sample-exact
    // duration, the id3-presence cadence.
    "q99_mp3_meta" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 13 AS BIGINT) AS n_frames,
        |  CAST(([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[CAST(doc_id % 14 AS INT) + 1] AS BIGINT) AS bitrate_kbps,
        |  CAST(([44100,48000,32000])[CAST(doc_id % 3 AS INT) + 1] AS BIGINT) AS sample_rate,
        |  CAST((8 + doc_id % 13) * 1152 * 1000
        |    // ([44100,48000,32000])[CAST(doc_id % 3 AS INT) + 1] AS BIGINT) AS duration_ms,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 10 + (doc_id % 5) * 7 END AS BIGINT) AS id3_bytes,
        |  TRUE AS valid
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Exact set-similarity join: the oracle is the FULL brute-force
    // word-3-gram-shingle self-join — a hash match proves the Spark
    // side's prefix filtering pruned without losing a single pair.
    // Threshold τ = 1/2 as integer cross-multiplication on both
    // sides; jaccard is the one final division.
    "q100_setsim_join" ->
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents),
        |w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n WHERE norm <> ''),
        |t AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS tok
        |      FROM w, unnest(range(1, len(ws) - 1)) AS r(i)),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
        |          FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, sa.n AS n_a, sb.n AS n_b, inter,
        |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE inter * 2 >= (sa.n + sb.n - inter) * 1
        |ORDER BY id_a, id_b""".stripMargin,

    // BFS hop distances: independent declarative formulation — a
    // recursive fixpoint enumerating (node, depth) pairs with a depth
    // cap (97 nodes bounds every shortest path), then min-over-paths.
    // Agreement with the Spark frontier algorithm cross-checks
    // settle-at-first-visit == shortest hop, incl. unreachable = -1.
    "q101_bfs" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT doc_id % 97 AS src, (doc_id * 3 + 1) % 97 AS dst FROM documents
        |  UNION
        |  SELECT doc_id % 97, (doc_id * 5 + 2) % 97 FROM documents),
        |r AS (
        |  SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS d
        |  UNION
        |  SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id WHERE r.d < 97),
        |m AS (SELECT id, min(d) AS dist FROM r GROUP BY id),
        |nodes AS (SELECT DISTINCT doc_id % 97 AS id FROM documents)
        |SELECT n.id, coalesce(m.dist, CAST(-1 AS BIGINT)) AS dist
        |FROM nodes n LEFT JOIN m ON m.id = n.id
        |ORDER BY n.id""".stripMargin,

    // Frequent pairs: brute-force pair counting with NO A-priori
    // pruning — agreement proves the Spark side's downward-closure
    // candidate cut is lossless on real data.
    "q102_frequent_pairs" ->
      """WITH i AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS it FROM lineitem),
        |f AS (SELECT it, CAST(count(*) AS BIGINT) AS n FROM i GROUP BY it),
        |p AS (SELECT a.it AS item_a, b.it AS item_b, CAST(count(*) AS BIGINT) AS support
        |      FROM i a JOIN i b ON a.b = b.b AND a.it < b.it GROUP BY 1, 2)
        |SELECT item_a, item_b, fa.n AS n_a, fb.n AS n_b, support
        |FROM p JOIN f fa ON fa.it = item_a JOIN f fb ON fb.it = item_b
        |WHERE support >= 3
        |ORDER BY item_a, item_b""".stripMargin,

    // HLL distinct: the oracle owns the exact side and asserts the
    // certificate column is TRUE — the q66 pattern (sketch internals
    // never reach the output, the bound does).
    "q103_hll_distinct" ->
      """WITH tt AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM documents),
        |t AS (SELECT lang, tok FROM tt WHERE tok <> ''),
        |g AS (SELECT lang AS grp, CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct FROM t GROUP BY 1
        |      UNION ALL
        |      SELECT 'ALL', CAST(count(DISTINCT tok) AS BIGINT) FROM t)
        |SELECT grp, exact_distinct, TRUE AS within_bound FROM g ORDER BY grp""".stripMargin,

    // CMS join-size estimates: the oracle owns both exact sizes (sum
    // of squared key frequencies; the real filtered-join count) and
    // asserts both certificates are TRUE.
    "q104_joinsize_est" ->
      """WITH li AS (SELECT l_partkey AS k FROM lineitem),
        |sp AS (SELECT p_partkey AS k FROM part WHERE p_size < 10),
        |self AS (SELECT CAST(sum(n * n) AS BIGINT) AS ex_self, CAST(sum(n) AS BIGINT) AS n_li
        |         FROM (SELECT count(*) AS n FROM li GROUP BY k)),
        |j AS (SELECT CAST(count(*) AS BIGINT) AS ex_join FROM li JOIN sp USING (k)),
        |nsp AS (SELECT CAST(count(*) AS BIGINT) AS n_sp FROM sp)
        |SELECT 'li_self_partkey' AS pair, n_li AS n_a, n_li AS n_b, ex_self AS exact_size,
        |  TRUE AS never_undercounts, TRUE AS within_bound FROM self
        |UNION ALL
        |SELECT 'li_x_smallparts', n_li, n_sp, ex_join, TRUE, TRUE FROM self, j, nsp
        |ORDER BY pair""".stripMargin,

    // G.711 decode: every statistic reconstructed by mirroring the
    // CCITT expansion formulas per synthesized sample byte — μ-law
    // (u = ~b: bias 132, mantissa<<3, 2^exponent; sign bit set =
    // negative) and A-law (a = b xor 0x55: mantissa<<4, segment
    // offsets 8/0x108, 2^(seg-1); sign bit set = POSITIVE).
    "q105_g711_audio" ->
      """WITH d AS (SELECT doc_id, 300 + (doc_id % 40) * 5 AS n FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        |b AS (SELECT doc_id, n, (doc_id * 7 + i * 13) % 256 AS byv FROM s),
        |v AS (SELECT doc_id, n,
        |  CASE WHEN doc_id % 2 = 0 THEN
        |    CASE WHEN (255 - byv) >= 128
        |      THEN 132 - (((255 - byv) % 16) * 8 + 132) * ([1,2,4,8,16,32,64,128])[CAST(((255 - byv) // 16) % 8 AS INT) + 1]
        |      ELSE (((255 - byv) % 16) * 8 + 132) * ([1,2,4,8,16,32,64,128])[CAST(((255 - byv) // 16) % 8 AS INT) + 1] - 132 END
        |  ELSE
        |    (CASE WHEN xor(byv, 85) >= 128 THEN 1 ELSE -1 END) *
        |    (CASE WHEN ((xor(byv, 85) // 16) % 8) = 0 THEN (xor(byv, 85) % 16) * 16 + 8
        |          WHEN ((xor(byv, 85) // 16) % 8) = 1 THEN (xor(byv, 85) % 16) * 16 + 264
        |          ELSE ((xor(byv, 85) % 16) * 16 + 264) * ([1,2,4,8,16,32,64])[CAST((xor(byv, 85) // 16) % 8 AS INT)] END)
        |  END AS v FROM b)
        |SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS codec,
        |  CAST(n AS BIGINT) AS n_samples, CAST(n // 8 AS BIGINT) AS duration_ms,
        |  CAST(sum(v * v) AS BIGINT) AS sum_sq, CAST(max(abs(v)) AS BIGINT) AS peak_abs,
        |  TRUE AS valid
        |FROM v GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,

    // Batch anomaly flagging: exact integer prefix moments per user,
    // then the identical short double chain for the 3-sigma decision.
    "q106_anomaly" ->
      """WITH c AS (SELECT event_id, user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |p AS (SELECT event_id, user_id, cents,
        |  count(*) OVER w AS n_before,
        |  coalesce(sum(cents) OVER w, 0) AS s_prev,
        |  coalesce(sum(cents * cents) OVER w, 0) AS q_prev
        |  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, CAST(n_before AS BIGINT) AS n_before, cents,
        |  CASE WHEN n_before < 5 THEN FALSE ELSE
        |    (cents - CAST(s_prev AS DOUBLE) / n_before) * (cents - CAST(s_prev AS DOUBLE) / n_before) >
        |      9 * (CAST(q_prev AS DOUBLE) / n_before - (CAST(s_prev AS DOUBLE) / n_before) * (CAST(s_prev AS DOUBLE) / n_before))
        |  END AS is_anomaly
        |FROM p ORDER BY event_id""".stripMargin,

    // IMA ADPCM: the oracle replays the predictor recurrence itself —
    // a recursive CTE steps (pred, idx, sumsq, peak) over every
    // nibble position (low nibble first), with the published step
    // table as a list literal, int16/index clamps via least/greatest,
    // and the shift-approximated diff as floor divisions.
    "q107_adpcm_audio" ->
      """WITH RECURSIVE d AS (SELECT doc_id, 60 + doc_id % 16 AS nbytes,
        |    (doc_id * 37) % 4000 - 2000 AS pred0, doc_id % 89 AS idx0 FROM documents),
        |r AS (
        |  SELECT doc_id, nbytes, 0 AS t, pred0 AS pred, idx0 AS idx,
        |         pred0 * pred0 AS sumsq, abs(pred0) AS peak FROM d
        |  UNION ALL
        |  SELECT doc_id, nbytes, t + 1, np, ni, sumsq + np * np, greatest(peak, abs(np))
        |  FROM (
        |    SELECT doc_id, nbytes, t, sumsq, peak,
        |      least(32767, greatest(-32768,
        |        CASE WHEN nib >= 8 THEN pred - diff ELSE pred + diff END)) AS np,
        |      least(88, greatest(0, idx + ([-1,-1,-1,-1,2,4,6,8])[CAST(nib % 8 AS INT) + 1])) AS ni
        |    FROM (
        |      SELECT *, (step // 8) + (nib % 2) * (step // 4) + ((nib // 2) % 2) * (step // 2) + ((nib // 4) % 2) * step AS diff
        |      FROM (
        |        SELECT doc_id, nbytes, t, pred, idx, sumsq, peak,
        |          CASE WHEN t % 2 = 0 THEN ((doc_id * 11 + (t // 2) * 29) % 256) % 16
        |               ELSE ((doc_id * 11 + (t // 2) * 29) % 256) // 16 END AS nib,
        |          ([7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,279,307,337,371,408,449,494,544,598,658,724,796,876,963,1060,1166,1282,1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,16818,18500,20350,22385,24623,27086,29794,32767])[CAST(idx AS INT) + 1] AS step
        |        FROM r WHERE t < 2 * nbytes) s1) s2) s3)
        |SELECT doc_id, CAST(1 + 2 * nbytes AS BIGINT) AS n_samples,
        |  CAST((1 + 2 * nbytes) * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST(sumsq AS BIGINT) AS sum_sq, CAST(peak AS BIGINT) AS peak_abs, TRUE AS valid
        |FROM r WHERE t = 2 * nbytes ORDER BY doc_id""".stripMargin,

    // Sorted-neighborhood blocking: the same (key, id) order from a
    // row_number window, pairs within 3 ranks — rank assignment,
    // window semantics, and key equality all pinned by the hash.
    "q108_sorted_neighborhood" ->
      """WITH n AS (SELECT doc_id, substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 16) AS k FROM documents),
        |r AS (SELECT doc_id, k, row_number() OVER (ORDER BY k, doc_id) AS rnk FROM n)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(b.rnk - a.rnk AS BIGINT) AS rank_distance,
        |  a.k = b.k AS same_key
        |FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 3
        |ORDER BY id_a, id_b""".stripMargin,

    // Equi-depth histogram: same rank order, same integer bucket
    // assignment, from a row_number formulation.
    "q109_equidepth" ->
      """WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |             l_orderkey AS o, l_linenumber AS l FROM lineitem),
        |r AS (SELECT v, row_number() OVER (ORDER BY v, o, l) - 1 AS rnk,
        |             count(*) OVER () AS n FROM c)
        |SELECT CAST(rnk * 16 // n AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
        |  min(v) AS lo_cents, max(v) AS hi_cents, CAST(sum(v) AS BIGINT) AS sum_cents
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // Entity resolution: blocking + levenshtein verification mirrored
    // from q49, clusters via a recursive transitive closure (an
    // independent formulation of the CC fixpoint), then the same
    // golden-record election.
    "q110_entity_resolution" ->
      """WITH RECURSIVE p AS (SELECT p_partkey, p_name, CAST(round(p_retailprice * 100) AS BIGINT) AS pc
        |           FROM part WHERE p_partkey % 20 = 0),
        |o AS (SELECT p_partkey AS id, p_name AS name, pc FROM p),
        |cc AS (SELECT p_partkey + 1000000 AS id,
        |        substring(p_name, 1, CAST(p_partkey % (length(p_name) - 1) AS INT)) ||
        |        substring(p_name, CAST(p_partkey % (length(p_name) - 1) AS INT) + 2) AS name,
        |        pc - 150 AS pc FROM p),
        |a AS (SELECT * FROM o UNION ALL SELECT * FROM cc),
        |ab AS (SELECT id, name, pc,
        |         substring(regexp_replace(lower(trim(name)), '\s+', ' ', 'g'), 1, 2) AS blk FROM a),
        |pr AS (SELECT x.id AS ia, y.id AS ib FROM ab x JOIN ab y USING (blk)
        |       WHERE x.id < y.id AND abs(length(x.name) - length(y.name)) <= 1
        |         AND levenshtein(x.name, y.name) <= 1),
        |e AS (SELECT ia AS s, ib AS t FROM pr UNION SELECT ib, ia FROM pr),
        |reach AS (SELECT s, t FROM e
        |          UNION
        |          SELECT r.s, e2.t FROM reach r JOIN e e2 ON e2.s = r.t),
        |comp AS (SELECT s AS id, min(t) AS mn FROM reach GROUP BY s),
        |wc AS (SELECT a.id, a.name, a.pc,
        |         CASE WHEN comp.mn IS NULL OR a.id < comp.mn THEN a.id ELSE comp.mn END AS comp
        |       FROM a LEFT JOIN comp ON comp.id = a.id),
        |g AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_members, max(pc) AS max_price_cents
        |      FROM wc GROUP BY comp)
        |SELECT g.comp, a2.name AS canonical_name, g.n_members, g.max_price_cents
        |FROM g JOIN a a2 ON a2.id = g.comp
        |ORDER BY g.comp""".stripMargin,

    // Interval coalescing: the identical gaps-and-islands window
    // chain (running max of prior ends, strict-exceed opens).
    "q111_interval_coalesce" ->
      """WITH iv AS (SELECT l_suppkey AS key,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s0,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      + CAST(l_quantity AS BIGINT) % 5 + 1 AS e0
        |  FROM lineitem),
        |u AS (SELECT key, s0, e0, count(*) AS cnt FROM iv GROUP BY 1, 2, 3),
        |w AS (SELECT key, s0, e0, cnt,
        |    max(e0) OVER (PARTITION BY key ORDER BY s0, e0
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM u),
        |o AS (SELECT key, s0, e0, cnt,
        |    CASE WHEN pm IS NULL OR s0 > pm THEN 1 ELSE 0 END AS op FROM w),
        |i AS (SELECT key, s0, e0, cnt,
        |    sum(op) OVER (PARTITION BY key ORDER BY s0, e0
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM o)
        |SELECT key, min(s0) AS island_start, max(e0) AS island_end,
        |  CAST(sum(cnt) AS BIGINT) AS n_intervals
        |FROM i GROUP BY key, island
        |ORDER BY key, island_start""".stripMargin,

    // Skyline: the declarative NOT EXISTS dominator formulation —
    // agreement proves the distributed two-phase scan exact.
    "q112_skyline" ->
      """WITH p AS (SELECT p_partkey AS id, CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
        |             CAST(p_size AS BIGINT) AS size FROM part)
        |SELECT id, price_cents, size FROM p a
        |WHERE NOT EXISTS (SELECT 1 FROM p b
        |  WHERE b.price_cents <= a.price_cents AND b.size <= a.size
        |    AND (b.price_cents < a.price_cents OR b.size < a.size))
        |ORDER BY id""".stripMargin,

    // PMI collocations: counts, marginals, and both integer
    // certificates replayed exactly — no floats anywhere.
    "q113_pmi_collocations" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS t
        |  FROM documents),
        |bgl AS (SELECT doc_id, unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2 FROM toks),
        |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bgl GROUP BY w1, w2),
        |n AS (SELECT CAST(sum(c12) AS BIGINT) AS n_total FROM bg),
        |l AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bg GROUP BY w1),
        |r AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM bg GROUP BY w2)
        |SELECT w1, w2, c12, c1, c2, n_total,
        |  c12 * n_total > c1 * c2 AS pmi_positive,
        |  CAST((c12 * n_total * 1000) // (c1 * c2) AS BIGINT) AS lift_x1000
        |FROM bg JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
        |WHERE c12 >= 5
        |ORDER BY w1, w2""".stripMargin,

    // Inverted index: probe-term postings + term stats re-derived
    // directly from token counts.
    "q115_inverted_index" ->
      """WITH t AS (SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS term FROM documents),
        |post AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY term, doc_id),
        |stats AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf FROM post GROUP BY term)
        |SELECT term, doc_id, tf, df, total_tf
        |FROM post JOIN stats USING (term)
        |WHERE term IN ('column','filter','hash','join','merge','order','scan','window')
        |ORDER BY term, doc_id""".stripMargin,

    // Soundex: the identical translate + portable-regexp chain (no
    // backreferences — RE2-safe), mirrored stage for stage.
    "q116_soundex" ->
      """WITH w0 AS (SELECT unnest(string_split(p_name, ' ')) AS w FROM part),
        |w1 AS (SELECT w FROM w0 WHERE length(w) > 0),
        |s1 AS (SELECT w, regexp_replace(upper(w), '[^A-Z]', '', 'g') AS letters FROM w1),
        |s2 AS (SELECT w, letters,
        |         substr(letters, 1, 1) || regexp_replace(substr(letters, 2), '[HW]', '', 'g') AS hw
        |       FROM s1),
        |s3 AS (SELECT w, letters,
        |         translate(hw, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '01230120022455012623010202') AS digits
        |       FROM s2),
        |s4 AS (SELECT w, letters, digits,
        |         regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |           digits, '11+', '1', 'g'), '22+', '2', 'g'), '33+', '3', 'g'),
        |           '44+', '4', 'g'), '55+', '5', 'g'), '66+', '6', 'g') AS collapsed
        |       FROM s3),
        |s5 AS (SELECT w, letters, digits,
        |         regexp_replace(collapsed, '0', '', 'g') AS nz FROM s4),
        |s6 AS (SELECT w, letters,
        |         CASE WHEN substr(digits, 1, 1) = '0' THEN nz ELSE substr(nz, 2) END AS tl
        |       FROM s5),
        |sx AS (SELECT w,
        |         CASE WHEN length(letters) = 0 THEN NULL
        |              ELSE substr(letters, 1, 1) || rpad(substr(tl, 1, 3), 3, '0') END AS code
        |       FROM s6),
        |g AS (SELECT code, CAST(count(*) AS BIGINT) AS n_words,
        |        CAST(count(DISTINCT w) AS BIGINT) AS n_distinct, min(w) AS sample_word
        |      FROM sx GROUP BY code)
        |SELECT code, n_words, n_distinct, sample_word,
        |  n_words * (n_words - 1) // 2 AS block_pairs
        |FROM g WHERE n_words >= 20
        |ORDER BY code""".stripMargin,

    // BOM explosion: the oracle enumerates EVERY root path with a
    // recursive CTE, carrying the quantity product and path length —
    // sum of products and max length per node independently
    // reproduce the level-synchronous sweep.
    "q117_bom_explode" ->
      """WITH RECURSIVE p AS (SELECT p_partkey AS i FROM part WHERE p_partkey >= 1),
        |e0 AS (SELECT i // 3 AS parent, i AS child, i % 3 + 1 AS qty FROM p
        |       UNION ALL
        |       SELECT i // 7, i, i % 5 + 1 FROM p WHERE i // 7 <> i // 3),
        |e AS (SELECT parent, child, CAST(sum(qty) AS BIGINT) AS q FROM e0 GROUP BY parent, child),
        |r AS (SELECT CAST(0 AS BIGINT) AS node, CAST(1 AS BIGINT) AS mult, CAST(0 AS BIGINT) AS len
        |      UNION ALL
        |      SELECT e.child, r.mult * e.q, r.len + 1 FROM r JOIN e ON e.parent = r.node)
        |SELECT node, max(len) AS level, CAST(sum(mult) AS BIGINT) AS total_qty
        |FROM r GROUP BY node ORDER BY node""".stripMargin,

    // PDF text extraction: the oracle rebuilds the expected extracted
    // text from the raw source column with pure string SQL — the same
    // sanitize + 40-char-chunk + 2-lines-per-page derivation the Spark
    // side typesets into real PDF bytes and decodes back. The hash
    // match therefore proves the whole xref/inflate/text-operator
    // chain, across both compression variants and all three operator
    // styles (which must extract identically).
    "q118_pdf_text" ->
      """WITH s AS (SELECT doc_id,
        |             substr(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'), 1, 120) AS p
        |           FROM documents),
        |x AS (SELECT doc_id, p,
        |        nullif(substr(p, 1, 40), '') AS l1,
        |        nullif(substr(p, 41, 40), '') AS l2,
        |        nullif(substr(p, 81, 40), '') AS l3
        |      FROM s),
        |y AS (SELECT doc_id,
        |        CAST(ceil(length(p) / 40.0) AS BIGINT) AS n_lines,
        |        concat_ws(chr(10), l1, l2, l3) AS extracted
        |      FROM x)
        |SELECT doc_id,
        |  greatest(CAST(1 AS BIGINT), CAST(ceil(n_lines / 2.0) AS BIGINT)) AS n_pages,
        |  CAST(length(extracted) AS BIGINT) AS n_chars,
        |  extracted, true AS valid
        |FROM y ORDER BY doc_id""".stripMargin,

    // PDF embedded images: every per-image sum is rebuilt from the
    // synthesis arithmetic alone (modular sample generators over
    // unnest(range(...)); the q90 fixed-point YCbCr constants for the
    // DCT leg — flat blocks are 64 copies of the clamped block
    // color), so the hash match proves the XObject walk + the full
    // raw/Flate/LZW/DCT filter chain, DeviceGray collapse, and the
    // geometry-mismatch valid=false row on the id%7 residue.
    // A6d two-level hierarchy + rule-1 description joining: the
    // oracle rebuilds the expected category/subcategory propagation
    // (nearest subheader wins, a new ALL-CAPS header resets it,
    // category repeats when no subheader) and the r=1 wrapped
    // description directly from the four-residue construction.
    "q163_menu_hierarchy" ->
      """WITH base AS (SELECT p_partkey AS doc_id, p_name, p_partkey % 6 AS r,
        |    CAST(round(p_retailprice*100) AS BIGINT) / 100.0 AS price FROM part),
        |r1 AS (SELECT doc_id, p_name AS item_name, 'Starters' AS category,
        |    CASE WHEN r IN (0, 5) THEN 'Starters' ELSE 'Veg Specials' END AS subcategory,
        |    CASE WHEN r = 1 THEN 'extra crispy, served hot' END AS description, price
        |  FROM base),
        |r2 AS (SELECT doc_id, p_name || ' II' AS item_name,
        |    CASE WHEN r = 2 THEN 'Mains' WHEN r = 4 THEN 'Desserts' ELSE 'Starters' END AS category,
        |    CASE WHEN r = 2 THEN 'Mains' WHEN r = 3 THEN 'Tandoori Bites'
        |         WHEN r = 4 THEN 'Desserts' ELSE 'Starters' END AS subcategory,
        |    CAST(NULL AS VARCHAR) AS description, price
        |  FROM base WHERE r IN (2, 3, 4, 5)),
        |r3 AS (SELECT doc_id, 'Chef Special' AS item_name, 'Starters' AS category,
        |    'Starters' AS subcategory, CAST(NULL AS VARCHAR) AS description,
        |    CAST(NULL AS DOUBLE) AS price
        |  FROM base WHERE r = 5)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
        |ORDER BY doc_id, item_name""".stripMargin,

    "q162_pdf_images" ->
      """WITH dims AS (SELECT doc_id,
        |    2 + doc_id % 3 AS w0, 1 + doc_id % 2 AS h0,
        |    3 + doc_id % 4 AS w1, 2 + doc_id % 3 AS h1,
        |    16 + doc_id % 5 AS w2, 10 AS h2,
        |    1 + doc_id % 2 AS bw,
        |    4 + doc_id % 3 AS wg, 3 AS hg
        |  FROM documents),
        |k0 AS (SELECT doc_id, w0 AS w, h0 AS h, unnest(range(0, w0*h0*3)) AS k FROM dims),
        |s0 AS (SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |    CAST(sum(CASE WHEN k % 3 = 0 THEN (5*k + doc_id) % 256 ELSE 0 END) AS BIGINT) AS sr,
        |    CAST(sum(CASE WHEN k % 3 = 1 THEN (5*k + doc_id) % 256 ELSE 0 END) AS BIGINT) AS sg,
        |    CAST(sum(CASE WHEN k % 3 = 2 THEN (5*k + doc_id) % 256 ELSE 0 END) AS BIGINT) AS sb
        |  FROM k0 GROUP BY doc_id),
        |k1 AS (SELECT doc_id, w1 AS w, h1 AS h, unnest(range(0, w1*h1*3)) AS k FROM dims),
        |s1 AS (SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |    CAST(sum(CASE WHEN k % 3 = 0 THEN (11*k + 3*doc_id) % 256 ELSE 0 END) AS BIGINT) AS sr,
        |    CAST(sum(CASE WHEN k % 3 = 1 THEN (11*k + 3*doc_id) % 256 ELSE 0 END) AS BIGINT) AS sg,
        |    CAST(sum(CASE WHEN k % 3 = 2 THEN (11*k + 3*doc_id) % 256 ELSE 0 END) AS BIGINT) AS sb
        |  FROM k1 GROUP BY doc_id),
        |k2 AS (SELECT doc_id, w2 AS w, h2 AS h, unnest(range(0, w2*h2*3)) AS k FROM dims),
        |s2 AS (SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |    CAST(sum(CASE WHEN k % 3 = 0 THEN (7*k + doc_id) % 256 ELSE 0 END) AS BIGINT) AS sr,
        |    CAST(sum(CASE WHEN k % 3 = 1 THEN (7*k + doc_id) % 256 ELSE 0 END) AS BIGINT) AS sg,
        |    CAST(sum(CASE WHEN k % 3 = 2 THEN (7*k + doc_id) % 256 ELSE 0 END) AS BIGINT) AS sb
        |  FROM k2 GROUP BY doc_id),
        |bxs AS (SELECT doc_id, bw, unnest(range(0, bw)) AS bx FROM dims),
        |ycc AS (SELECT doc_id, bw,
        |    (23*bx + doc_id) % 256 AS y,
        |    ((5*bx + 3*doc_id) % 97) - 48 AS cb,
        |    ((7*bx + 5*doc_id) % 89) - 44 AS cr
        |  FROM bxs),
        |rgbb AS (SELECT doc_id, bw,
        |    least(greatest(y + CAST(floor((91881*cr + 32768)/65536.0) AS BIGINT), 0), 255) AS r,
        |    least(greatest(y + CAST(floor((-22554*cb - 46802*cr + 32768)/65536.0) AS BIGINT), 0), 255) AS g,
        |    least(greatest(y + CAST(floor((116130*cb + 32768)/65536.0) AS BIGINT), 0), 255) AS b
        |  FROM ycc),
        |s3 AS (SELECT doc_id, any_value(bw) AS bw,
        |    CAST(64*sum(r) AS BIGINT) AS sr,
        |    CAST(64*sum(g) AS BIGINT) AS sg,
        |    CAST(64*sum(b) AS BIGINT) AS sb
        |  FROM rgbb GROUP BY doc_id),
        |kg AS (SELECT doc_id, wg AS w, hg AS h, unnest(range(0, wg*hg)) AS k FROM dims),
        |s4 AS (SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |    CAST(sum((9*k + 2*doc_id) % 256) AS BIGINT) AS sr
        |  FROM kg GROUP BY doc_id),
        |allrows AS (
        |  SELECT doc_id, 0 AS img_idx, w AS width, h AS height, w*h*3 AS n_bytes,
        |         sr, sg, sb, true AS valid FROM s0
        |  UNION ALL SELECT doc_id, 1, w, h, w*h*3, sr, sg, sb, true FROM s1
        |  UNION ALL SELECT doc_id, 2, w, h, w*h*3, sr, sg, sb, true FROM s2
        |  UNION ALL SELECT doc_id, 3, 8*bw, 8, 8*bw*8*3, sr, sg, sb, true FROM s3
        |  UNION ALL SELECT doc_id, 4, w, h, w*h, sr, sr, sr, true FROM s4
        |  UNION ALL SELECT doc_id, 5, 0, 0, 0, 0, 0, 0, false FROM dims WHERE doc_id % 7 = 0)
        |SELECT doc_id, CAST(img_idx AS BIGINT) AS img_idx,
        |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
        |  CAST(n_bytes AS BIGINT) AS n_bytes,
        |  CAST(sr AS BIGINT) AS sum_r, CAST(sg AS BIGINT) AS sum_g,
        |  CAST(sb AS BIGINT) AS sum_b, valid
        |FROM allrows ORDER BY doc_id, img_idx""".stripMargin,

    // PQ scoring tier: the oracle replays nearest-sub-centroid
    // assignment (min over (dist, cid) — Spark's array_min struct
    // order) and the ADC distance chain with the SAME sequential
    // double folds the engine's FloatDotFold uses (list_reduce in
    // index order; centroid components are integer-valued doubles so
    // their norms are exact), then ranks by (adc_dist, vec_id).
    "q119_pq_scoring" -> pqAdcScoringSql,

    // Maintained PQ index (q216, r17): the ENGINE serves from the D38
    // appended (cid, batch_no) artifact; the ORACLE is q119's
    // rebuild-from-scratch chain VERBATIM — encode all vectors, score,
    // rank. Hash equality is the append ≡ rebuild certification under
    // the driver's own gate.
    "q216_index_maintain" -> pqAdcScoringSql,


    // IVFADC composition: the q119 ADC chain restricted to the q40
    // deterministic probe routing — codes for PROBED buckets only,
    // then the same per-subspace term fold, ordered sum and ranking.
    "q176_ivf_pq" ->
      """WITH cents AS (
        |  SELECT list_transform(range(0,8), s ->
        |           list_transform(range(0,4), c ->
        |             list_transform(range(0,8), j -> CAST((s + 2*c + 3*j) % 5 - 2 AS DOUBLE)))) AS cb),
        |e AS (SELECT vec_id, embedding, vec_id % 8 AS cid FROM embeddings),
        |sd AS (SELECT e.vec_id, s.s AS s, c.c AS c,
        |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list_transform(range(1,9), j -> cb[s.s+1][c.c+1][j] * cb[s.s+1][c.c+1][j])),
        |           (a,v) -> a + v)
        |         - 2.0 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list_transform(range(1,9), j -> CAST(e.embedding[s.s*8 + j] AS DOUBLE) * cb[s.s+1][c.c+1][j])),
        |           (a,v) -> a + v) AS d
        |       FROM e CROSS JOIN cents CROSS JOIN range(0,8) s(s) CROSS JOIN range(0,4) c(c)),
        |codes AS (SELECT vec_id, s, c AS code FROM
        |            (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn FROM sd) z
        |          WHERE rn = 1),
        |pr AS (SELECT q.vec_id AS query_id, q.embedding AS qe, (q.vec_id + t.i) % 8 AS cid
        |  FROM embeddings q CROSS JOIN range(0, 3) t(i) WHERE q.vec_id < 8),
        |cand AS (SELECT pr.query_id, pr.qe, e.vec_id FROM pr JOIN e USING (cid)),
        |tm AS (SELECT cand.query_id, cand.vec_id, cd.s,
        |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list_transform(range(1,9), j -> CAST(cand.qe[cd.s*8 + j] AS DOUBLE) * CAST(cand.qe[cd.s*8 + j] AS DOUBLE))),
        |           (a,v) -> a + v)
        |         - 2.0 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list_transform(range(1,9), j -> CAST(cand.qe[cd.s*8 + j] AS DOUBLE) * cb[cd.s+1][cd.code+1][j])),
        |           (a,v) -> a + v)
        |         + list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list_transform(range(1,9), j -> cb[cd.s+1][cd.code+1][j] * cb[cd.s+1][cd.code+1][j])),
        |           (a,v) -> a + v) AS t
        |       FROM cand JOIN codes cd ON cd.vec_id = cand.vec_id CROSS JOIN cents),
        |adc AS (SELECT query_id, vec_id,
        |          list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(t ORDER BY s)), (a,v) -> a + v) AS adc_dist
        |        FROM tm GROUP BY query_id, vec_id),
        |r AS (SELECT query_id, vec_id, adc_dist,
        |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, vec_id) AS BIGINT) AS rk FROM adc)
        |SELECT query_id, rk, vec_id, adc_dist FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    // Adam7 PNG: the synthesis arithmetic replayed per pixel — channel
    // sums, peak, and the position-weighted checksum that certifies
    // the de-interleave PLACEMENT (sums alone are permutation-blind).
    "q177_png_interlaced" ->
      """WITH p AS (SELECT doc_id, 3 + doc_id % 30 AS w, 2 + doc_id % 23 AS h FROM documents),
        |gy AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM p),
        |gx AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM gy),
        |v AS (SELECT doc_id, w, h, x, y,
        |  (x*7 + y*3 + doc_id) % 256 AS r,
        |  (x*5 + y*11 + 2*doc_id) % 256 AS g,
        |  (x*13 + y + 3*doc_id) % 256 AS b FROM gx),
        |s AS (SELECT doc_id,
        |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(max(greatest(r, g, b)) AS BIGINT) AS peak,
        |  CAST(sum((y * w + x) * (r + g + b)) AS BIGINT) AS pos_sum
        | FROM v GROUP BY doc_id)
        |SELECT p.doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  sum_r, sum_g, sum_b, peak, pos_sum, true AS valid
        |FROM p JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Animated GIF: palette synthesis, every-2nd-frame sampling and
    // the graphic-control delay sum replayed closed-form.
    "q178_gif_frames" ->
      """WITH p AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
        |    2 + doc_id % 5 AS nf FROM documents),
        |fr AS (SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS f FROM p),
        |dur AS (SELECT doc_id, CAST(10 * sum(4 + (f*3 + doc_id) % 12) AS BIGINT) AS duration_ms
        |  FROM fr GROUP BY doc_id),
        |sf AS (SELECT * FROM fr WHERE f % 2 = 0),
        |ns AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled FROM sf GROUP BY doc_id),
        |gy AS (SELECT doc_id, w, h, f, unnest(range(0, h)) AS y FROM sf),
        |gx AS (SELECT doc_id, w, f, y, unnest(range(0, w)) AS x FROM gy),
        |px AS (SELECT doc_id, (x*3 + y*5 + f*7 + doc_id) % 16 AS k FROM gx),
        |cc AS (SELECT doc_id, (k*37 + doc_id) % 256 AS r,
        |    (k*53 + 2*doc_id) % 256 AS g, (k*11 + 3*doc_id) % 256 AS b FROM px),
        |st AS (SELECT doc_id, CAST(sum(r) AS BIGINT) AS sum_r,
        |    CAST(sum(g) AS BIGINT) AS sum_g, CAST(sum(b) AS BIGINT) AS sum_b,
        |    CAST(max(greatest(r, g, b)) AS BIGINT) AS peak
        |  FROM cc GROUP BY doc_id)
        |SELECT p.doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(nf AS BIGINT) AS n_frames, ns.n_sampled, dur.duration_ms,
        |  st.sum_r, st.sum_g, st.sum_b, st.peak, true AS valid
        |FROM p JOIN dur USING (doc_id) JOIN ns USING (doc_id) JOIN st USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // HITS hubs/authorities: the q172 link graph, three exact-integer
    // normalize-by-max rounds unrolled as CTE layers — each layer
    // certifies a fan-in sum, a max fold and a floor-division rescale
    // on both the authority and the hub side. HUGEINT carries the
    // x*scale products; // on non-negatives mirrors Scala Long '/'.
    "q179_hits" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |base AS (SELECT doc_id AS src, unnest(range(0, 1 + doc_id % 3)) AS k
        |  FROM documents WHERE doc_id % 7 <> 3),
        |e0 AS (SELECT src, (src * (k + 3) + k + 1) % n AS d0, n FROM base CROSS JOIN nn),
        |ed AS (SELECT src, CASE WHEN d0 = src THEN (d0 + 1) % n ELSE d0 END AS dst FROM e0),
        |nodes AS (SELECT src AS id FROM ed UNION SELECT dst FROM ed),
        |odeg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS dg FROM ed GROUP BY 1),
        |ideg AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS dg FROM ed GROUP BY 1),
        |h0 AS (SELECT id, CAST(1000000 AS HUGEINT) AS h FROM nodes),
        |ar1 AS (SELECT dst AS id, CAST(sum(h) AS HUGEINT) AS x FROM ed JOIN h0 ON h0.id = ed.src GROUP BY dst),
        |ma1 AS (SELECT max(x) AS m FROM ar1),
        |a1 AS (SELECT id, CASE WHEN m = 0 THEN 0 ELSE (x * 1000000) // m END AS a FROM ar1 CROSS JOIN ma1),
        |hr1 AS (SELECT src AS id, CAST(sum(a) AS HUGEINT) AS x FROM ed JOIN a1 ON a1.id = ed.dst GROUP BY src),
        |mh1 AS (SELECT max(x) AS m FROM hr1),
        |h1 AS (SELECT nodes.id, coalesce(CASE WHEN m = 0 THEN 0 ELSE (x * 1000000) // m END, 0) AS h
        |  FROM nodes LEFT JOIN hr1 USING (id) CROSS JOIN mh1),
        |ar2 AS (SELECT dst AS id, CAST(sum(h) AS HUGEINT) AS x FROM ed JOIN h1 ON h1.id = ed.src GROUP BY dst),
        |ma2 AS (SELECT max(x) AS m FROM ar2),
        |a2 AS (SELECT id, CASE WHEN m = 0 THEN 0 ELSE (x * 1000000) // m END AS a FROM ar2 CROSS JOIN ma2),
        |hr2 AS (SELECT src AS id, CAST(sum(a) AS HUGEINT) AS x FROM ed JOIN a2 ON a2.id = ed.dst GROUP BY src),
        |mh2 AS (SELECT max(x) AS m FROM hr2),
        |h2 AS (SELECT nodes.id, coalesce(CASE WHEN m = 0 THEN 0 ELSE (x * 1000000) // m END, 0) AS h
        |  FROM nodes LEFT JOIN hr2 USING (id) CROSS JOIN mh2),
        |ar3 AS (SELECT dst AS id, CAST(sum(h) AS HUGEINT) AS x FROM ed JOIN h2 ON h2.id = ed.src GROUP BY dst),
        |ma3 AS (SELECT max(x) AS m FROM ar3),
        |a3 AS (SELECT id, CASE WHEN m = 0 THEN 0 ELSE (x * 1000000) // m END AS a FROM ar3 CROSS JOIN ma3),
        |hr3 AS (SELECT src AS id, CAST(sum(a) AS HUGEINT) AS x FROM ed JOIN a3 ON a3.id = ed.dst GROUP BY src),
        |mh3 AS (SELECT max(x) AS m FROM hr3),
        |h3 AS (SELECT nodes.id, coalesce(CASE WHEN m = 0 THEN 0 ELSE (x * 1000000) // m END, 0) AS h
        |  FROM nodes LEFT JOIN hr3 USING (id) CROSS JOIN mh3)
        |SELECT nodes.id AS node_id, CAST(h3.h AS BIGINT) AS hub_scaled,
        |  CAST(coalesce(a3.a, 0) AS BIGINT) AS auth_scaled,
        |  CAST(coalesce(odeg.dg, 0) AS BIGINT) AS out_degree,
        |  CAST(coalesce(ideg.dg, 0) AS BIGINT) AS in_degree
        |FROM nodes JOIN h3 ON h3.id = nodes.id LEFT JOIN a3 ON a3.id = nodes.id
        |LEFT JOIN odeg ON odeg.id = nodes.id LEFT JOIN ideg ON ideg.id = nodes.id
        |ORDER BY node_id""".stripMargin,

    // KLL certification: the oracle replays the EXACT side (value-
    // level cumulative first-cover quantiles) and the certificate
    // literal — the sketch estimate is merge-order-dependent by
    // design (like q34's Misra-Gries) and stays out of the hash; its
    // bound is asserted engine-side and spec-pinned.
    "q190_kll_certify" ->
      """WITH src AS (SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem),
        |vc AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM src GROUP BY 1, 2),
        |cum AS (SELECT g, v, c, CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cm,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n FROM vc),
        |ps AS (SELECT unnest([100, 2500, 5000, 7500, 9900]) AS p)
        |SELECT g AS grp, CAST(p AS BIGINT) AS p_bp, CAST(max(n) AS BIGINT) AS n,
        |  CAST(min(CASE WHEN cm > ((n - 1) * p) // 10000 THEN v END) AS BIGINT) AS exact_cents,
        |  true AS kll_within_eps
        |FROM cum CROSS JOIN ps GROUP BY g, p ORDER BY grp, p_bp""".stripMargin,

    // Percentile normalization: the q72/q175 margin fragment, then
    // doubled average ranks (min+max of each value's contiguous
    // row_number block — tie-order-independent) and the integer
    // basis-point division.
    "q189_percentile_norm" ->
      s"""WITH tk AS (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0) AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks,
         |    t -> ${md5fold("t", 8)} % 2001 - 1000)), (a, v) -> a + v) AS margin
         | FROM tk),
         |g AS (SELECT margin, CAST(min(r) + max(r) AS BIGINT) AS r2 FROM
         |    (SELECT margin, row_number() OVER (ORDER BY margin) AS r FROM m)
         |  GROUP BY margin),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m)
         |SELECT m.doc_id, CAST(m.margin AS BIGINT) AS margin,
         |  CAST((g.r2 * 5000) // n AS BIGINT) AS pct_bp
         |FROM m JOIN g USING (margin) CROSS JOIN nn ORDER BY doc_id""".stripMargin,

    // Exact substring decontamination: the oracle replays the side-
    // aware nearest-train lookup with global ignore-null windows over
    // the same (key, id, p) total order, then the capped LCP fold per
    // side — certifying the rank, both boundary-carried lookups and
    // the per-eval-doc aggregation.
    // k-core (k=2): the planted-clique graph plus bounded pendant
    // chains; eight peel layers unrolled as plain CTEs (fixpoint is
    // reached by round ≤ 6 on this fixture, so the tail layers are
    // no-ops) — the surviving nodes AND their in-core degrees must
    // match GraphMetrics.kCore's fixpoint exactly.
    "q192_kcore" -> {
      // AS MATERIALIZED: each layer references its predecessor several
      // times — DuckDB inlines plain CTEs, which here would expand to
      // ~5^8 scans of the base relation.
      val peels = (1 to 8).map { r =>
        s"""dg$r AS MATERIALIZED (SELECT id, count(*) AS dg
           |  FROM (SELECT a AS id FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1}) GROUP BY 1),
           |e$r AS MATERIALIZED (SELECT a, b FROM e${r - 1}
           |  WHERE a NOT IN (SELECT id FROM dg$r WHERE dg < 2)
           |    AND b NOT IN (SELECT id FROM dg$r WHERE dg < 2))""".stripMargin
      }.mkString(",\n")
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
         |cq AS (SELECT doc_id AS src, doc_id + k AS dst
         |  FROM (SELECT doc_id, unnest(range(1, 6)) AS k FROM documents) CROSS JOIN nn
         |  WHERE doc_id % 6 + k < 6 AND doc_id + k < n),
         |cl AS (SELECT doc_id AS src, doc_id + 6 AS dst
         |  FROM documents CROSS JOIN nn WHERE doc_id % 29 = 0 AND doc_id + 6 < n),
         |ch AS (SELECT doc_id + (s - 1) * n AS src, doc_id + s * n AS dst
         |  FROM (SELECT doc_id, n, unnest(range(1, 4)) AS s
         |        FROM documents CROSS JOIN nn WHERE doc_id % 6 = 0)),
         |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM (SELECT src, dst FROM cq UNION ALL SELECT src, dst FROM cl
         |        UNION ALL SELECT src, dst FROM ch)
         |  WHERE src <> dst),
         |$peels
         |SELECT CAST(id AS BIGINT) AS node_id, CAST(count(*) AS BIGINT) AS degree
         |FROM (SELECT a AS id FROM e8 UNION ALL SELECT b FROM e8)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // Release diff: full-outer on the id, the q19 fingerprint
    // decides changed-vs-unchanged, per-(lang, status) counts.
    "q209_release_diff" ->
      """WITH o AS (SELECT doc_id, lang,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fo
        |  FROM documents WHERE doc_id % 10 <> 9),
        |n AS (SELECT doc_id, lang AS ln,
        |    md5(regexp_replace(lower(trim(
        |      CASE WHEN doc_id % 7 = 3 THEN text || ' [rev2]' ELSE text END)),
        |      '\s+', ' ', 'g')) AS fn
        |  FROM documents WHERE doc_id % 10 <> 0),
        |j AS (SELECT coalesce(lang, ln) AS lang,
        |    CASE WHEN fo IS NULL THEN 'added'
        |         WHEN fn IS NULL THEN 'removed'
        |         WHEN fo = fn THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM o FULL OUTER JOIN n USING (doc_id))
        |SELECT lang, status, CAST(count(*) AS BIGINT) AS n
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Packing eval: the q68 chain cross-joined with the length set,
    // aggregated per (seq_len, writer) — tail waste and crossers.
    "q208_packing_eval" ->
      s"""WITH t AS (SELECT doc_id, CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0)) AS BIGINT) AS n_tokens FROM documents),
         |w AS (SELECT doc_id, n_tokens, ${md5fold("CAST(doc_id AS VARCHAR)", 8)} % 8 AS writer,
         |  md5(CAST(doc_id AS VARCHAR)) AS h FROM t),
         |c AS (SELECT doc_id, writer, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY writer ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM w),
         |ls AS (SELECT CAST(unnest([512, 2048]) AS BIGINT) AS L),
         |e AS (SELECT L, writer, n_tokens,
         |    greatest(cum_before, cum_before + n_tokens - 1) // L AS end_seq,
         |    greatest(cum_before, cum_before + n_tokens - 1) // L > cum_before // L AS crossed
         |  FROM c CROSS JOIN ls)
         |SELECT L AS seq_len, CAST(writer AS BIGINT) AS writer,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(max(end_seq) + 1 AS BIGINT) AS n_seqs,
         |  CAST(sum(CASE WHEN crossed THEN 1 ELSE 0 END) AS BIGINT) AS n_crossers,
         |  CAST((max(end_seq) + 1) * L - sum(n_tokens) AS BIGINT) AS tail_waste,
         |  CAST(((max(end_seq) + 1) * L - sum(n_tokens)) * 10000 // ((max(end_seq) + 1) * L) AS BIGINT) AS waste_bp
         |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Tokenizer fertility: the q92 train+encode chain aggregated per
    // language; integer-div basis points.
    "q207_tokenizer_fertility" ->
      (bpeEncCtes(6) +
      """,
        |w AS (SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS nw
        |  FROM documents),
        |j AS (SELECT lang, nw, CAST(len(toks) AS BIGINT) AS nt
        |  FROM enc JOIN w USING (doc_id))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nw) AS BIGINT) AS n_words,
        |  CAST(sum(nt) AS BIGINT) AS n_bpe_tokens,
        |  CASE WHEN sum(nw) = 0 THEN NULL
        |       ELSE CAST(sum(nt) * 10000 // sum(nw) AS BIGINT) END AS fertility_bp
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin),

    // k-anonymity audit: quasi-identifier group sizes + the k flag.
    "q206_k_anonymity" ->
      """SELECT lang, source, CAST(length(text) // 100 AS BIGINT) AS len_bucket,
        |  CAST(count(*) AS BIGINT) AS n, count(*) >= 5 AS k_ok
        |FROM documents GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // Contrastive pairs: the md5-fold draw + the order-statistics
    // skip replayed exactly — every sampled negative mirrors.
    "q205_contrastive_pairs" ->
      ("""WITH nn AS (SELECT count(*) AS n FROM documents),
        |a AS (SELECT doc_id AS anchor_id, doc_id + 1 AS pos_id, n
        |  FROM documents CROSS JOIN nn WHERE doc_id % 5 = 0 AND doc_id + 1 < n),
        |pos AS (SELECT anchor_id, 'positive' AS role, CAST(0 AS BIGINT) AS rank,
        |    pos_id AS other_id FROM a),
        |n0 AS (SELECT anchor_id, pos_id, n, unnest(range(1, 5)) AS rank FROM a),
        |n1 AS (SELECT anchor_id, pos_id, rank,
        |    GRAFT_DRAW % (n - 2) AS draw FROM n0),
        |n2 AS (SELECT anchor_id, rank,
        |    least(anchor_id, pos_id) AS e1, greatest(anchor_id, pos_id) AS e2, draw FROM n1),
        |n3 AS (SELECT anchor_id, rank, e2,
        |    CASE WHEN draw >= e1 THEN draw + 1 ELSE draw END AS s1 FROM n2),
        |neg AS (SELECT anchor_id, 'negative' AS role, CAST(rank AS BIGINT) AS rank,
        |    CASE WHEN s1 >= e2 THEN s1 + 1 ELSE s1 END AS other_id FROM n3)
        |SELECT anchor_id, role, rank, CAST(other_id AS BIGINT) AS other_id FROM pos
        |UNION ALL SELECT anchor_id, role, rank, CAST(other_id AS BIGINT) FROM neg
        |ORDER BY anchor_id, rank""".stripMargin
        .replace("GRAFT_DRAW", md5fold("anchor_id || ':' || rank", 15))),

    // Span corruption: the mask decision, span structure, sentinel
    // numbering and both streams replayed with SQL windows over the
    // same (doc, pos) order; the md5-fold mask mirrors bit-for-bit.
    "q204_span_corruption" ->
      (s"""WITH tk AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\\s+'), x -> length(x) > 0) AS tks
        |  FROM documents),
        |tp AS (SELECT doc_id, unnest(tks) AS tok,
        |    CAST(unnest(range(1, len(tks) + 1)) AS BIGINT) AS pos FROM tk),
        |ms AS (SELECT doc_id, pos, tok,
        |    GRAFT_MASK % 5 = 0 AS masked FROM tp),
        |st AS (SELECT doc_id, pos, tok, masked,
        |    masked AND NOT coalesce(lag(masked) OVER w, false) AS span_start
        |  FROM ms WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |mk AS (SELECT doc_id, pos, tok, masked, span_start,
        |    sum(CASE WHEN span_start THEN 1 ELSE 0 END) OVER w - 1 AS k
        |  FROM st WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |pieces AS (
        |  SELECT doc_id, 'input' AS stream, pos * 2 AS ord, tok AS piece
        |    FROM mk WHERE NOT masked
        |  UNION ALL SELECT doc_id, 'input', pos * 2 - 1,
        |    '<extra_id_' || k || '>' FROM mk WHERE span_start
        |  UNION ALL SELECT doc_id, 'target', pos * 2 - 1,
        |    '<extra_id_' || k || '>' FROM mk WHERE span_start
        |  UNION ALL SELECT doc_id, 'target', pos * 2, tok FROM mk WHERE masked)
        |SELECT doc_id, stream, CAST(ord AS BIGINT) AS ord, piece
        |FROM pieces ORDER BY doc_id, stream, ord""".stripMargin
        .replace("GRAFT_MASK", md5fold("doc_id || ':' || pos", 15))),

    // Data card: the release-statement table — integer totals,
    // language inventory, exact-dup count on the q19 fingerprint.
    "q203_data_card" ->
      """WITH b AS (SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0)) AS BIGINT) AS tok,
        |    CAST(length(text) AS BIGINT) AS chars,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |tot AS (
        |  SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM b
        |  UNION ALL SELECT 'n_tokens', CAST(sum(tok) AS BIGINT) FROM b
        |  UNION ALL SELECT 'n_chars', CAST(sum(chars) AS BIGINT) FROM b
        |  UNION ALL SELECT 'n_langs', CAST(count(DISTINCT lang) AS BIGINT) FROM b
        |  UNION ALL SELECT 'n_exact_dups',
        |    CAST(count(*) - count(DISTINCT fp) AS BIGINT) FROM b
        |  UNION ALL SELECT 'docs_lang_' || lang, CAST(count(*) AS BIGINT)
        |    FROM b GROUP BY lang)
        |SELECT metric, value FROM tot ORDER BY metric""".stripMargin,

    // Restore: five closed-form version states — v3 must equal v1
    // exactly (the roll-forward undo), v4 builds on the restored
    // state, never the deleted one.
    "q202_txlog_restore" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS pc FROM orders),
        |v0 AS (SELECT * FROM o WHERE k % 3 = 0),
        |v1 AS (SELECT * FROM o WHERE k % 3 IN (0, 1)),
        |v2 AS (SELECT * FROM v1 WHERE st <> 'F'),
        |v4 AS (SELECT * FROM v1 UNION ALL SELECT * FROM o WHERE k % 3 = 2),
        |agg AS (
        |  SELECT 0 AS version, count(*) AS n, sum(pc) AS sc, max(k) AS mk FROM v0
        |  UNION ALL SELECT 1, count(*), sum(pc), max(k) FROM v1
        |  UNION ALL SELECT 2, count(*), sum(pc), max(k) FROM v2
        |  UNION ALL SELECT 3, count(*), sum(pc), max(k) FROM v1
        |  UNION ALL SELECT 4, count(*), sum(pc), max(k) FROM v4)
        |SELECT CAST(n AS BIGINT) AS n, CAST(sc AS BIGINT) AS sum_cents,
        |  CAST(mk AS BIGINT) AS max_key, CAST(version AS BIGINT) AS version
        |FROM agg ORDER BY version""".stripMargin,

    // Host-level near-dup: the shared minhash chain over the host-doc
    // relation (its per-(id, i) min merge IS the signature union),
    // host shingle sets as flattened distinct unions, exact jaccard
    // on candidates — every stage mirrored, banding included.
    "q201_host_neardup" ->
      (minhashPrsCtes(
        """(SELECT CAST(doc_id % 40 AS BIGINT) AS doc_id, text FROM documents
          | UNION ALL SELECT 40, text FROM documents WHERE doc_id % 40 = 7 AND doc_id % 11 <> 0
          | UNION ALL SELECT 41, text FROM documents WHERE doc_id % 40 = 13) hd""".stripMargin,
        wordMode = true) + "\n" +
      """|hb AS (SELECT doc_id, list_distinct(flatten(array_agg(sh))) AS sh FROM g GROUP BY 1),
        |jj AS (SELECT p.id_a, p.id_b,
        |    len(list_intersect(a.sh, b.sh)) AS ni, len(a.sh) AS na, len(b.sh) AS nb
        |  FROM prs p JOIN hb a ON a.doc_id = p.id_a JOIN hb b ON b.doc_id = p.id_b),
        |jf AS (SELECT id_a, id_b, ni, na, nb,
        |    CASE WHEN na + nb - ni = 0 THEN 0.0
        |         ELSE CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE) END AS jaccard
        |  FROM jj)
        |SELECT id_a AS grp_a, id_b AS grp_b, CAST(ni AS BIGINT) AS n_inter,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, jaccard
        |FROM jf WHERE jaccard >= CAST(0.5 AS DOUBLE)
        |ORDER BY grp_a, grp_b""".stripMargin),

    // Symmetric int8 ANN: codes re-derived from the q196 chain, then
    // integer dot products and an exact (score desc, id) re-rank.
    "q200_int8_ann" ->
      """WITH e AS (SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |sc AS (SELECT dim, max(abs(x)) AS scale FROM e GROUP BY 1),
        |q AS (SELECT e.vec_id, e.dim,
        |    CASE WHEN sc.scale = 0.0 THEN 0
        |         ELSE CAST(floor(x * 127.0 / sc.scale) AS BIGINT) END AS code
        |  FROM e JOIN sc USING (dim)),
        |qs AS (SELECT vec_id AS query_id, dim, code AS qc FROM q WHERE vec_id < 8),
        |p AS (SELECT qs.query_id, q.vec_id, CAST(sum(qs.qc * q.code) AS BIGINT) AS score
        |  FROM q JOIN qs USING (dim) GROUP BY 1, 2),
        |r AS (SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS BIGINT) AS rk
        |  FROM p)
        |SELECT query_id, rk, vec_id, score FROM r WHERE rk <= 10
        |ORDER BY query_id, rk""".stripMargin,

    // JSONL quarantine ingest: DuckDB parses the SAME lines with its
    // own JSON engine — a genuine cross-engine parse equivalence.
    "q199_jsonl_ingest" ->
      """WITH l AS (SELECT doc_id, lang,
        |    '{"id": ' || doc_id || ', "lang": "' || lang || '", "nc": ' || length(text)
        |      || ', "tags": ["a' || (doc_id % 5) || '", "b' || (doc_id % 3)
        |      || CASE WHEN doc_id % 7 = 3 THEN '"]' ELSE '"]}' END AS line
        |  FROM documents),
        |p AS (SELECT line, try_cast(line AS JSON) IS NOT NULL AS ok FROM l),
        |g AS (SELECT
        |    CASE WHEN ok THEN json_extract_string(line, '$.lang')
        |         ELSE '__quarantined' END AS grp,
        |    CASE WHEN ok THEN CAST(json_extract(line, '$.id') AS BIGINT) END AS id,
        |    CASE WHEN ok THEN CAST(json_extract(line, '$.nc') AS BIGINT) END AS nc,
        |    CASE WHEN ok THEN CAST(json_array_length(json_extract(line, '$.tags')) AS BIGINT) END AS ntags
        |  FROM p)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(id) AS BIGINT) AS sum_id,
        |  CAST(sum(nc) AS BIGINT) AS sum_nc, CAST(sum(ntags) AS BIGINT) AS sum_tags
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // Wavelet-hash near-dup: q171's replay with the MEDIAN threshold
    // (32nd+33rd order stats, cross-multiplied) and the extreme-white
    // outlier perturbation; grayscale pixels hash on their raw value.
    "q198_whash_neardup" ->
      """WITH ids AS (SELECT doc_id, doc_id // 2 AS b, doc_id % 2 = 1 AS odd FROM documents),
        |g AS (SELECT doc_id, b, odd, x, y FROM ids, range(0, 16) rx(x), range(0, 16) ry(y)),
        |v AS (SELECT doc_id, x, y,
        |   CASE WHEN odd AND (x * 16 + y) % 67 = 0 THEN 255
        |        ELSE ((3 + b % 251) * x * y + (1 + b % 127) * x + (2 + b % 61) * y) % 256
        |   END AS val
        |  FROM g),
        |cells AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS ci, CAST(sum(val) AS BIGINT) AS cs
        |  FROM v GROUP BY 1, 2),
        |ranked AS (SELECT doc_id, ci, cs,
        |   row_number() OVER (PARTITION BY doc_id ORDER BY cs, ci) AS rk FROM cells),
        |med AS (SELECT doc_id,
        |   CAST(sum(CASE WHEN rk IN (32, 33) THEN cs ELSE 0 END) AS BIGINT) AS m2
        |  FROM ranked GROUP BY 1),
        |bits AS (SELECT cells.doc_id, ci, CASE WHEN cs * 2 > m2 THEN 1 ELSE 0 END AS bit
        |  FROM cells JOIN med USING (doc_id)),
        |bands AS (SELECT doc_id, ci // 16 AS band,
        |   CAST(sum(bit * (1 << (15 - ci % 16))) AS BIGINT) AS bval
        |  FROM bits GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
        |  FROM bands a JOIN bands b2
        |    ON a.band = b2.band AND a.bval = b2.bval AND a.doc_id < b2.doc_id),
        |ham AS (SELECT id_a, id_b,
        |   CAST(sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        |  FROM cand JOIN bits ba ON ba.doc_id = id_a
        |   JOIN bits bb ON bb.doc_id = id_b AND bb.ci = ba.ci
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 10
        |ORDER BY id_a, id_b""".stripMargin,

    // Distinct-n diversity: the q95 tokenization, parallel-unnest
    // bigrams, exact distinct counts, integer-div basis points.
    "q197_distinct_ngrams" ->
      """WITH toks AS (SELECT lang AS grp,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS t
        |  FROM documents),
        |uni AS (SELECT grp, unnest(t) AS w FROM toks),
        |u AS (SELECT grp, CAST(count(*) AS BIGINT) AS total_1,
        |    CAST(count(DISTINCT w) AS BIGINT) AS distinct_1 FROM uni GROUP BY 1),
        |big AS (SELECT grp, unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
        |  FROM toks WHERE len(t) >= 2),
        |b AS (SELECT grp, CAST(count(*) AS BIGINT) AS total_2,
        |    CAST(count(DISTINCT w1 || ' ' || w2) AS BIGINT) AS distinct_2 FROM big GROUP BY 1)
        |SELECT u.grp, total_1, distinct_1,
        |  CAST(distinct_1 * 10000 // total_1 AS BIGINT) AS d1_bp,
        |  coalesce(total_2, 0) AS total_2, coalesce(distinct_2, 0) AS distinct_2,
        |  CAST(distinct_2 * 10000 // total_2 AS BIGINT) AS d2_bp
        |FROM u LEFT JOIN b USING (grp) ORDER BY 1""".stripMargin,

    // Int8 quantization: the whole matrix replayed — order-free
    // max-abs scales, per-element floor codes (identical double
    // arithmetic), integer-only aggregates (id-weighted sum pins the
    // assignment). DuckDB lists are 1-based; posexplode dims 0-based.
    "q196_embed_quantize" ->
      """WITH e AS (SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |sc AS (SELECT dim, max(abs(x)) AS scale FROM e GROUP BY 1),
        |q AS (SELECT e.vec_id, e.dim, sc.scale,
        |    CASE WHEN sc.scale = 0.0 THEN 0
        |         ELSE CAST(floor(x * 127.0 / sc.scale) AS BIGINT) END AS code
        |  FROM e JOIN sc USING (dim))
        |SELECT CAST(dim AS BIGINT) AS dim, max(scale) AS scale,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(code) AS BIGINT) AS sum_code,
        |  CAST(min(code) AS BIGINT) AS min_code,
        |  CAST(max(code) AS BIGINT) AS max_code,
        |  CAST(sum(code * (vec_id + 1)) AS BIGINT) AS sum_code_weighted
        |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

    // Salted skew join: the oracle is the PLAIN join — agreement
    // proves the 16-way hot-key salting lost and duplicated nothing.
    "q195_salted_join" ->
      """WITH f AS (SELECT
        |    CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE l_partkey END AS k,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
        |  FROM lineitem)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(pc) AS BIGINT) AS sum_cents
        |FROM f JOIN part ON p_partkey = k
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Bucketed co-located join: plain join + aggregate, with the
    // Spark side's plan-derived exchange count pinned to 0 — the
    // hash certifies both the result and the zero-shuffle property.
    "q194_bucketed_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |  CAST(0 AS BIGINT) AS join_exchanges
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Additive schema evolution: old files (the %3==0 create) never
    // carried the new columns → the NULL o_flag group with 0 scored
    // rows and NULL sum; the %3==1 append carries real values. The
    // metadata-only/no-rewrite half of the contract is pinned by
    // in-query requires on the Spark side.
    "q193_txlog_schema_evolution" ->
      """WITH v0 AS (SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
        |    CAST(NULL AS VARCHAR) AS o_flag, CAST(NULL AS BIGINT) AS o_score
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |v2 AS (SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
        |    CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'done' END AS o_flag,
        |    o_orderkey % 7 AS o_score
        |  FROM orders WHERE o_orderkey % 3 = 1),
        |u AS (SELECT * FROM v0 UNION ALL SELECT * FROM v2)
        |SELECT o_flag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(pc) AS BIGINT) AS sum_cents,
        |  CAST(count(o_score) AS BIGINT) AS n_scored,
        |  CAST(sum(o_score) AS BIGINT) AS sum_score
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q191_decontaminate" ->
      """WITH tr AS (SELECT doc_id AS id, text AS t, true AS is_tr FROM documents),
        |ev AS (SELECT doc_id + 1000000 AS id,
        |    CASE WHEN doc_id % 7 = 0 THEN 'xq' || substring(text, 21, 40) || 'qx'
        |         ELSE upper(text) END AS t, false AS is_tr FROM documents
        |  WHERE doc_id % 5 = 0),
        |u AS (SELECT * FROM tr UNION ALL SELECT * FROM ev),
        |pos AS (SELECT id, is_tr, unnest(range(1, length(t) + 1)) AS p, t FROM u
        |  WHERE length(t) >= 1),
        |kx AS (SELECT id, is_tr, p, substring(t, p, 48) AS key FROM pos),
        |nb AS (SELECT id, is_tr, key,
        |    last_value(CASE WHEN is_tr THEN key END IGNORE NULLS)
        |      OVER (ORDER BY key, id, p ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kb,
        |    first_value(CASE WHEN is_tr THEN key END IGNORE NULLS)
        |      OVER (ORDER BY key, id, p ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ka
        |  FROM kx),
        |lc AS (SELECT id, greatest(
        |    CASE WHEN kb IS NULL THEN 0 ELSE least(
        |      list_reduce(list_prepend(0, range(1, 49)),
        |        (acc, i) -> CASE WHEN acc = i - 1
        |          AND substring(key, i, 1) = substring(kb, i, 1) THEN i ELSE acc END),
        |      length(key), length(kb)) END,
        |    CASE WHEN ka IS NULL THEN 0 ELSE least(
        |      list_reduce(list_prepend(0, range(1, 49)),
        |        (acc, i) -> CASE WHEN acc = i - 1
        |          AND substring(key, i, 1) = substring(ka, i, 1) THEN i ELSE acc END),
        |      length(key), length(ka)) END) AS l
        |  FROM nb WHERE NOT is_tr)
        |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_positions,
        |  CAST(sum(CASE WHEN l >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |  CAST(max(l) AS BIGINT) AS max_train_lcp
        |FROM lc GROUP BY id ORDER BY doc_id""".stripMargin,

    // Suffix-array span dedup: the oracle sorts the ACTUAL truncated
    // suffixes (window lag/lead over the same (key, id, p) total
    // order the range sort produces) and replays the capped LCP fold
    // per neighbor — certifying the rank, the join-shift and the fold.
    "q188_suffix_dedup" ->
      """WITH aug AS (SELECT d.doc_id AS id,
        |    d.text || CASE WHEN d.doc_id % 11 = 0 AND d2.text IS NOT NULL
        |      THEN substring(d2.text, 11, 30) ELSE '' END AS t
        |  FROM documents d LEFT JOIN documents d2 ON d2.doc_id = d.doc_id + 1),
        |pos AS (SELECT id, unnest(range(1, length(t) + 1)) AS p, t FROM aug WHERE length(t) >= 1),
        |kx AS (SELECT id, p, substring(t, p, 48) AS key FROM pos),
        |nb AS (SELECT id, key,
        |    lag(key) OVER w AS key_prev, coalesce(lag(id) OVER w, -1) AS id_prev,
        |    lead(key) OVER w AS key_next, coalesce(lead(id) OVER w, -1) AS id_next
        |  FROM kx WINDOW w AS (ORDER BY key, id, p)),
        |lc AS (SELECT id, id_prev, id_next,
        |    CASE WHEN key_prev IS NULL THEN 0 ELSE least(
        |      list_reduce(list_prepend(0, range(1, 49)),
        |        (acc, i) -> CASE WHEN acc = i - 1
        |          AND substring(key, i, 1) = substring(key_prev, i, 1) THEN i ELSE acc END),
        |      length(key), length(key_prev)) END AS lcp_prev,
        |    CASE WHEN key_next IS NULL THEN 0 ELSE least(
        |      list_reduce(list_prepend(0, range(1, 49)),
        |        (acc, i) -> CASE WHEN acc = i - 1
        |          AND substring(key, i, 1) = substring(key_next, i, 1) THEN i ELSE acc END),
        |      length(key), length(key_next)) END AS lcp_next
        |  FROM nb)
        |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_positions,
        |  CAST(sum(CASE WHEN lcp_prev >= 20 OR lcp_next >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_pos,
        |  CAST(sum(CASE WHEN (id_prev <> id AND lcp_prev >= 20)
        |      OR (id_next <> id AND lcp_next >= 20) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_cross,
        |  CAST(max(greatest(lcp_prev, lcp_next)) AS BIGINT) AS max_lcp,
        |  CAST(max(greatest(CASE WHEN id_prev <> id THEN lcp_prev ELSE 0 END,
        |    CASE WHEN id_next <> id THEN lcp_next ELSE 0 END)) AS BIGINT) AS max_lcp_cross
        |FROM lc GROUP BY id ORDER BY doc_id""".stripMargin,

    // Robust MAD outliers: the q46 integer median interpolation at
    // value level (cumulative weights over distinct values), twice
    // (median, then MAD over re-aggregated deviations), then the
    // all-long |x−med| > 3·MAD flag — no division anywhere.
    "q187_mad_outliers" ->
      """WITH src AS (SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      (CASE WHEN l_orderkey % 997 = 0 THEN 100 ELSE 1 END) AS v
        |  FROM lineitem),
        |vc AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM src GROUP BY 1, 2),
        |cum AS (SELECT g, v, c,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cm,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n FROM vc),
        |meda AS (SELECT g, max(n) AS n,
        |    min(CASE WHEN cm >= ((n - 1) * 50) // 100 + 1 THEN v END) AS lo,
        |    min(CASE WHEN cm >= ((n - 1) * 50) // 100 +
        |      (CASE WHEN ((n - 1) * 50) % 100 > 0 THEN 1 ELSE 0 END) + 1 THEN v END) AS hi
        |  FROM cum GROUP BY g),
        |med AS (SELECT g, n,
        |    (lo * (100 - ((n - 1) * 50) % 100) + hi * (((n - 1) * 50) % 100) + 50) // 100 AS md
        |  FROM meda),
        |dv AS (SELECT vc.g, abs(v - md) AS v, CAST(sum(c) AS BIGINT) AS c
        |  FROM vc JOIN med USING (g) GROUP BY 1, 2),
        |dcum AS (SELECT g, v, c,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cm,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n FROM dv),
        |mada AS (SELECT g, max(n) AS n,
        |    min(CASE WHEN cm >= ((n - 1) * 50) // 100 + 1 THEN v END) AS lo,
        |    min(CASE WHEN cm >= ((n - 1) * 50) // 100 +
        |      (CASE WHEN ((n - 1) * 50) % 100 > 0 THEN 1 ELSE 0 END) + 1 THEN v END) AS hi
        |  FROM dcum GROUP BY g),
        |mad AS (SELECT g,
        |    (lo * (100 - ((n - 1) * 50) % 100) + hi * (((n - 1) * 50) % 100) + 50) // 100 AS md
        |  FROM mada)
        |SELECT vc.g AS grp, CAST(max(med.n) AS BIGINT) AS n,
        |  CAST(max(med.md) AS BIGINT) AS median, CAST(max(mad.md) AS BIGINT) AS mad,
        |  CAST(sum(CASE WHEN abs(v - med.md) > 3 * mad.md THEN c ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(max(abs(v - med.md)) AS BIGINT) AS max_dev
        |FROM vc JOIN med USING (g) JOIN mad USING (g)
        |GROUP BY vc.g ORDER BY grp""".stripMargin,

    // Matroska/WebM walk: every field reconstructs from the synthesis
    // arithmetic. The vint/float/unknown-size/Void knobs change the
    // BYTES but never the parsed VALUES — the walk's guarantee.
    "q186_mkv_meta" ->
      """WITH p AS (SELECT doc_id, 1 + doc_id % 3 AS nc,
        |    CASE WHEN doc_id % 3 = 0 THEN 500000 ELSE 1000000 END AS ts,
        |    1000 + doc_id % 50 AS du, doc_id % 2 = 0 AS vid FROM documents),
        |cl AS (SELECT doc_id, unnest(range(0, nc)) AS c FROM p),
        |bl AS (SELECT doc_id, c, unnest(range(0, 1 + (doc_id + c) % 4)) AS b FROM cl),
        |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(CASE WHEN (b + c + doc_id) % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nk
        |  FROM bl GROUP BY doc_id)
        |SELECT p.doc_id,
        |  CASE WHEN vid THEN 'webm' ELSE 'matroska' END AS doc_type,
        |  CAST(ts AS BIGINT) AS timestamp_scale,
        |  CAST((du * ts) // 1000000 AS BIGINT) AS duration_ms,
        |  CAST(1 AS BIGINT) AS n_tracks,
        |  CAST(CASE WHEN vid THEN 1 ELSE 2 END AS BIGINT) AS track_type,
        |  CASE WHEN vid THEN 'V_VP9' ELSE 'A_OPUS' END AS codec_id,
        |  CAST(CASE WHEN vid THEN 16 + doc_id % 8 ELSE 0 END AS BIGINT) AS width,
        |  CAST(CASE WHEN vid THEN 9 + doc_id % 5 ELSE 0 END AS BIGINT) AS height,
        |  CAST(CASE WHEN vid THEN 0 ELSE 2 END AS BIGINT) AS channels,
        |  CAST(nc AS BIGINT) AS n_clusters, ag.nb AS n_blocks, ag.nk AS n_keyframes,
        |  true AS valid
        |FROM p JOIN ag USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Personalized PageRank (TrustRank): the q172 link graph, three
    // exact-integer rounds unrolled — seed-gated teleport, dangling
    // mass to seeds only, non-seed arm pure damped contribution.
    "q185_trustrank" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |base AS (SELECT doc_id AS src, unnest(range(0, 1 + doc_id % 3)) AS k
        |  FROM documents WHERE doc_id % 7 <> 3),
        |e0 AS (SELECT src, (src * (k + 3) + k + 1) % n AS d0, n FROM base CROSS JOIN nn),
        |ed AS (SELECT src, CASE WHEN d0 = src THEN (d0 + 1) % n ELSE d0 END AS dst FROM e0),
        |nodes AS (SELECT src AS id FROM ed UNION SELECT dst FROM ed),
        |nds AS (SELECT id, id % 13 = 0 AS sd FROM nodes),
        |sc AS (SELECT CAST(count(*) AS BIGINT) AS s FROM nds WHERE sd),
        |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS dg FROM ed GROUP BY 1),
        |r0 AS (SELECT id, sd, CAST(CASE WHEN sd THEN 1000000000000 ELSE 0 END AS BIGINT) AS r FROM nds),
        |d1 AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dm FROM r0 LEFT JOIN deg USING (id) WHERE dg IS NULL),
        |c1 AS (SELECT dst AS id, CAST(sum(r // dg) AS BIGINT) AS c FROM ed JOIN r0 ON r0.id = ed.src JOIN deg ON deg.id = ed.src GROUP BY dst),
        |r1 AS (SELECT nds.id, sd, CAST(CASE WHEN sd THEN 150000000000 + (85 * (coalesce(c, 0) + dm // s)) // 100
        |    ELSE (85 * coalesce(c, 0)) // 100 END AS BIGINT) AS r
        |  FROM nds LEFT JOIN c1 USING (id) CROSS JOIN d1 CROSS JOIN sc),
        |d2 AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dm FROM r1 LEFT JOIN deg USING (id) WHERE dg IS NULL),
        |c2 AS (SELECT dst AS id, CAST(sum(r // dg) AS BIGINT) AS c FROM ed JOIN r1 ON r1.id = ed.src JOIN deg ON deg.id = ed.src GROUP BY dst),
        |r2 AS (SELECT nds.id, sd, CAST(CASE WHEN sd THEN 150000000000 + (85 * (coalesce(c, 0) + dm // s)) // 100
        |    ELSE (85 * coalesce(c, 0)) // 100 END AS BIGINT) AS r
        |  FROM nds LEFT JOIN c2 USING (id) CROSS JOIN d2 CROSS JOIN sc),
        |d3 AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dm FROM r2 LEFT JOIN deg USING (id) WHERE dg IS NULL),
        |c3 AS (SELECT dst AS id, CAST(sum(r // dg) AS BIGINT) AS c FROM ed JOIN r2 ON r2.id = ed.src JOIN deg ON deg.id = ed.src GROUP BY dst),
        |r3 AS (SELECT nds.id, sd, CAST(CASE WHEN sd THEN 150000000000 + (85 * (coalesce(c, 0) + dm // s)) // 100
        |    ELSE (85 * coalesce(c, 0)) // 100 END AS BIGINT) AS r
        |  FROM nds LEFT JOIN c3 USING (id) CROSS JOIN d3 CROSS JOIN sc)
        |SELECT r3.id AS node_id, r AS rank_scaled,
        |  CAST(coalesce(dg, 0) AS BIGINT) AS out_degree, sd AS is_seed
        |FROM r3 LEFT JOIN deg ON deg.id = r3.id ORDER BY node_id""".stripMargin,

    // Chi-square homogeneity: exact HUGEINT D_c = a·nB − b·nA per
    // category, the per-term double chain ((dD·dD)/dT)/(dA·dB)
    // folded IN CATEGORY ORDER via list_reduce — mirroring Spark's
    // aggregate() over the sorted struct array bit-for-bit.
    "q180_chisq_drift" ->
      """WITH d AS (SELECT lang AS c, doc_id % 2 = 0 AS ia FROM documents
        |  WHERE NOT (doc_id % 2 = 1 AND lang = 'en' AND doc_id % 3 = 0)),
        |g AS (SELECT c, CAST(sum(CASE WHEN ia THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN ia THEN 0 ELSE 1 END) AS BIGINT) AS b FROM d GROUP BY c),
        |t AS (SELECT CAST(sum(a) AS HUGEINT) AS na, CAST(sum(b) AS HUGEINT) AS nb,
        |    CAST(count(*) AS BIGINT) AS k FROM g),
        |terms AS (SELECT g.c,
        |    CAST(CAST(g.a AS HUGEINT) * t.nb - CAST(g.b AS HUGEINT) * t.na AS DOUBLE) AS dd,
        |    CAST(g.a + g.b AS DOUBLE) AS dt,
        |    CAST(t.na AS DOUBLE) AS dna, CAST(t.nb AS DOUBLE) AS dnb
        |  FROM g CROSS JOIN t),
        |f AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(dd * dd / dt / (dna * dnb) ORDER BY c)), (x, y) -> x + y) AS chi2
        |  FROM terms)
        |SELECT t.k AS k_categories, CAST(t.na AS BIGINT) AS n_a,
        |  CAST(t.nb AS BIGINT) AS n_b, t.k - 1 AS df,
        |  CASE WHEN t.na = 0 OR t.nb = 0 THEN NULL ELSE f.chi2 END AS chi2
        |FROM t CROSS JOIN f""".stripMargin,

    // Ogg container walk: every output field reconstructs from the
    // synthesis arithmetic — page/packet counts (id header + per-page
    // packets + the spanning packet), granule clock, integer-floor
    // duration. Packet SIZES vary the lacing bytes but not the parsed
    // counts, which is exactly what the walk must guarantee.
    "q181_ogg_meta" ->
      """WITH p AS (SELECT doc_id, 1 + doc_id % 2 AS ch,
        |    8000 + (doc_id % 5) * 4000 AS rate, 1 + doc_id % 4 AS np,
        |    240 + (doc_id % 7) * 16 AS gs,
        |    (doc_id % 5 = 2 AND 1 + doc_id % 4 >= 2) AS span FROM documents),
        |pg AS (SELECT doc_id, unnest(range(0, np)) AS i FROM p),
        |pk AS (SELECT doc_id, CAST(sum(1 + (doc_id + i) % 3) AS BIGINT) AS audio_pkts
        |  FROM pg GROUP BY doc_id)
        |SELECT p.doc_id, CAST(1 + np AS BIGINT) AS n_pages,
        |  CAST(1 + audio_pkts + CASE WHEN span THEN 1 ELSE 0 END AS BIGINT) AS n_packets,
        |  CAST(1 AS BIGINT) AS n_streams, CAST(ch AS BIGINT) AS channels,
        |  CAST(rate AS BIGINT) AS sample_rate, CAST(np * gs AS BIGINT) AS granule_max,
        |  CAST((np * gs * 1000) // rate AS BIGINT) AS duration_ms, true AS valid
        |FROM p JOIN pk USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Arrow IPC read: the writer's synthesis replayed closed-form —
    // per-column null masks and value formulas over the (batch, row)
    // grid; the float column is integer-valued by construction so its
    // sum is exact. The hash certifies schema parse, footer/block
    // walk, validity-bitmap decode (incl. the empty-buffer no-null
    // arm), int/double/utf8 buffer layouts and batch boundaries.
    "q182_arrow_read" ->
      """WITH p AS (SELECT doc_id, 1 + doc_id % 3 AS nb FROM documents),
        |bt AS (SELECT doc_id, unnest(range(0, nb)) AS b FROM p),
        |rw AS (SELECT doc_id, b, 3 + (doc_id + b) % 5 AS n FROM bt),
        |rws AS (SELECT doc_id, b, unnest(range(0, n)) AS i FROM rw),
        |c AS (SELECT doc_id,
        |    CASE WHEN (i + b + doc_id) % 5 = 0 THEN NULL
        |         ELSE doc_id * 7 + b * 31 + i * 3 END AS a,
        |    CASE WHEN (i * 2 + b + doc_id) % 7 = 0 THEN NULL
        |         ELSE (doc_id + b * 2 + i * 5) % 97 END AS x,
        |    CASE WHEN (i + 2 * b + doc_id) % 4 = 0 THEN NULL
        |         ELSE (i + b + doc_id) % 6 END AS slen
        |  FROM rws),
        |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN a IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS a_nulls,
        |    CAST(coalesce(sum(a), 0) AS BIGINT) AS a_sum,
        |    CAST(sum(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS x_nulls,
        |    CAST(coalesce(sum(x), 0) AS BIGINT) AS x_sum,
        |    CAST(sum(CASE WHEN slen IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_nulls,
        |    CAST(coalesce(sum(slen), 0) AS BIGINT) AS s_len_sum
        |  FROM c GROUP BY doc_id)
        |SELECT p.doc_id, CAST(nb AS BIGINT) AS n_batches, g.n_rows,
        |  g.a_nulls, g.a_sum, g.x_nulls, g.x_sum, g.s_nulls, g.s_len_sum,
        |  true AS valid
        |FROM p JOIN g USING (doc_id) ORDER BY doc_id""".stripMargin,

    // LPA communities: four synchronous rounds unrolled (the shared
    // lpaChain fragment), each layer certifying the undirected vote
    // count and the deterministic argmax.
    "q183_label_prop" ->
      s"""WITH $lpaChain
         |SELECT id AS node_id, CAST(label AS BIGINT) AS label
         |FROM l4 ORDER BY node_id""".stripMargin,

    // Modularity of the q183 labels: same chain, then exact-integer
    // evidence per community and the one mirrored division — HUGEINT
    // numerator Σ (4m·e_c − d_c²), Q = num / (2m)².
    "q184_modularity" ->
      s"""WITH $lpaChain,
         |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS dg FROM
         |    (SELECT src AS id FROM ed UNION ALL SELECT dst FROM ed) GROUP BY 1),
         |mm AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM ed),
         |dc AS (SELECT l4.label, CAST(count(*) AS BIGINT) AS size,
         |    CAST(sum(dg) AS HUGEINT) AS dsum
         |  FROM l4 JOIN deg USING (id) GROUP BY 1),
         |ec AS (SELECT la.label, CAST(count(*) AS HUGEINT) AS intra
         |  FROM ed JOIN l4 la ON la.id = ed.src JOIN l4 lb ON lb.id = ed.dst
         |  WHERE la.label = lb.label GROUP BY 1),
         |qn AS (SELECT CAST(sum(4 * m * coalesce(intra, 0) - dsum * dsum) AS HUGEINT) AS qnum
         |  FROM dc LEFT JOIN ec USING (label) CROSS JOIN mm)
         |SELECT dc.label, dc.size, CAST(dc.dsum AS BIGINT) AS degree_sum,
         |  CAST(coalesce(ec.intra, 0) AS BIGINT) AS intra_edges,
         |  CAST(mm.m AS BIGINT) AS m_edges,
         |  CAST(qn.qnum AS DOUBLE) / (CAST(2 * mm.m AS DOUBLE) * CAST(2 * mm.m AS DOUBLE)) AS q
         |FROM dc LEFT JOIN ec USING (label) CROSS JOIN mm CROSS JOIN qn
         |ORDER BY label""".stripMargin,

    // Progressive JPEG: the q90 oracle pattern over the SOF2 path —
    // flat DC-only blocks decode exactly, so the statistics rebuild
    // from the synthesis arithmetic + the decoder's fixed-point
    // YCbCr→RGB (JpegSpec pins progressive ≡ baseline ≡ this
    // closed form, and the JDK multi-scan cross-check covers the
    // general-coefficient path no SQL can express).
    "q120_jpeg_progressive" ->
      """WITH p AS (SELECT doc_id, 1 + doc_id % 3 AS bw, 1 + doc_id % 4 AS bh FROM documents),
        |pby AS (SELECT doc_id, bw, bh, unnest(range(0, bh)) AS by FROM p),
        |pbx AS (SELECT doc_id, bw, bh, by, unnest(range(0, bw)) AS bx FROM pby),
        |ycc AS (SELECT doc_id, bw, bh,
        |  (19*bx + 23*by + doc_id) % 256 AS y,
        |  ((7*bx + 13*by + 5*doc_id) % 91) - 45 AS cb,
        |  ((3*bx + 17*by + 11*doc_id) % 83) - 41 AS cr
        | FROM pbx),
        |rgb AS (SELECT doc_id, bw, bh,
        |  least(greatest(y + CAST(floor((91881*cr + 32768)/65536.0) AS BIGINT), 0), 255) AS r,
        |  least(greatest(y + CAST(floor((-22554*cb - 46802*cr + 32768)/65536.0) AS BIGINT), 0), 255) AS g,
        |  least(greatest(y + CAST(floor((116130*cb + 32768)/65536.0) AS BIGINT), 0), 255) AS b
        | FROM ycc),
        |s AS (SELECT doc_id, any_value(bw) AS bw, any_value(bh) AS bh,
        |  CAST(64*sum(r) AS BIGINT) AS sum_r,
        |  CAST(64*sum(g) AS BIGINT) AS sum_g,
        |  CAST(64*sum(b) AS BIGINT) AS sum_b,
        |  CAST(greatest(max(r), max(g), max(b)) AS BIGINT) AS peak
        | FROM rgb GROUP BY doc_id)
        |SELECT doc_id, CAST(8*bw AS BIGINT) AS width, CAST(8*bh AS BIGINT) AS height,
        |  sum_r, sum_g, sum_b, peak, true AS valid
        |FROM s ORDER BY doc_id""".stripMargin,

    // Proportional OCR: clean-render recognition is exact (init-
    // asserted font invariants), so the oracle is the normalization
    // chain itself — the hash match proves render → segmentation →
    // classification recovered every character of every document.
    "q121_ocr_proportional" ->
      """WITH s AS (SELECT doc_id,
        |  rtrim(substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), 1, 40)) AS t
        |FROM documents)
        |SELECT doc_id, t AS ocr_text, CAST(length(t) AS BIGINT) AS n_chars, true AS valid
        |FROM s WHERE length(t) > 0 ORDER BY doc_id""".stripMargin,

    // Photographic OCR: the oracle rebuilds the source snippet (q94's
    // normalization) — the hash match certifies exact recovery through
    // grayscale antialiased render + quarter-pixel phase + max-provable
    // sensor noise + SAD classification (the margin theorem in
    // Ocr.scala is why equality always holds).
    "q122_ocr_photographic" ->
      """WITH s AS (SELECT doc_id,
        |    coalesce(nullif(substr(regexp_replace(lower(coalesce(text, '')),
        |      '[^a-z0-9 ]', '', 'g'), 1, 16), ''), ' ') AS snip
        |  FROM documents)
        |SELECT doc_id, snip AS ocr_text,
        |  CAST(length(snip) AS BIGINT) AS n_chars,
        |  TRUE AS valid
        |FROM s ORDER BY doc_id""".stripMargin,

    // TIFF pixel stats: the oracle reconstructs the EXPECTED decode
    // output from the same doc_id-keyed synthesis arithmetic the Spark
    // side encodes into real TIFF bytes (our writer is lossless in
    // every swept configuration — both byte orders, none/LZW/PackBits,
    // multi-strip, predictor, both grayscale polarities) — a broken
    // IFD walk, LZW table, predictor undo or polarity flip mismatches
    // the integer sums.
    "q123_tiff_pixels" ->
      """WITH p AS (SELECT doc_id, 8 + doc_id % 8 AS w, 6 + doc_id % 5 AS h FROM documents),
        |py AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM p),
        |px AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM py),
        |v AS (SELECT doc_id, w, h,
        |  (x*11 + y*5 + doc_id) % 256 AS r0,
        |  CASE WHEN doc_id % 4 = 0 THEN (x*11 + y*5 + doc_id) % 256
        |       ELSE (x*3 + y*13 + 2*doc_id) % 256 END AS g0,
        |  CASE WHEN doc_id % 4 = 0 THEN (x*11 + y*5 + doc_id) % 256
        |       ELSE (x*7 + y*9 + 3*doc_id) % 256 END AS b0
        | FROM px),
        |s AS (SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |  CAST(sum(r0) AS BIGINT) AS sum_r,
        |  CAST(sum(g0) AS BIGINT) AS sum_g,
        |  CAST(sum(b0) AS BIGINT) AS sum_b,
        |  CAST(greatest(max(r0), max(g0), max(b0)) AS BIGINT) AS peak
        | FROM v GROUP BY doc_id)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  sum_r, sum_g, sum_b, peak, true AS valid
        |FROM s ORDER BY doc_id""".stripMargin,

    // Row-pattern matching (view+ click* purchase, longest-match,
    // skip past last row): the oracle is the pattern's CLOSED FORM
    // under these semantics — maximal same-type runs
    // (gaps-and-islands), where a view-island + optional click-island
    // + purchase-island matches from the view head to the FIRST
    // purchase. Cross-validated against an independent NFA
    // simulation; a Spark engine deviating in scan order, skip mode
    // or greediness hash-mismatches.
    "q124_sequence_match" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rnt
        |  FROM events),
        |isl AS (
        |  SELECT user_id, event_type, min(rn) AS srn, count(*) AS sz,
        |    arg_min(event_id, rn) AS first_id
        |  FROM e GROUP BY user_id, event_type, rn - rnt),
        |ord AS (
        |  SELECT user_id, event_type, srn, sz, first_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY srn) AS k
        |  FROM isl),
        |m AS (
        |  SELECT v.user_id, v.srn, v.first_id AS start_id,
        |    CASE WHEN c.event_type = 'click' AND p2.event_type = 'purchase' THEN p2.first_id
        |         WHEN c.event_type = 'purchase' THEN c.first_id END AS end_id,
        |    CASE WHEN c.event_type = 'click' AND p2.event_type = 'purchase' THEN v.sz + c.sz + 1
        |         WHEN c.event_type = 'purchase' THEN v.sz + 1 END AS n_rows
        |  FROM ord v
        |  LEFT JOIN ord c ON c.user_id = v.user_id AND c.k = v.k + 1
        |  LEFT JOIN ord p2 ON p2.user_id = v.user_id AND p2.k = v.k + 2
        |  WHERE v.event_type = 'view')
        |SELECT user_id, CAST(row_number() OVER (PARTITION BY user_id ORDER BY srn) AS BIGINT) AS match_id,
        |  start_id, end_id, CAST(n_rows AS BIGINT) AS n_rows
        |FROM m WHERE end_id IS NOT NULL
        |ORDER BY user_id, match_id""".stripMargin,

    // FLAC lossless decode: the oracle computes the statistics from
    // the PCM synthesis formulas directly and never sees a FLAC byte;
    // agreement therefore certifies decode(encode(pcm)) == pcm sample-
    // for-sample (with md5_ok carrying the decoder's own MD5 proof).
    "q125_flac_audio" ->
      """WITH d AS (SELECT doc_id, doc_id % 4 AS mode, 200 + (doc_id % 7) * 50 AS n FROM documents),
        |s AS (SELECT doc_id, mode, n, unnest(range(0, n)) AS i FROM d),
        |v AS (SELECT doc_id, mode, n,
        |  CASE CAST(mode AS INT)
        |    WHEN 0 THEN (doc_id * 13) % 4001 - 2000
        |    WHEN 1 THEN (doc_id % 100) - 50 + ((doc_id % 11) - 5) * i
        |    WHEN 2 THEN abs(((i + doc_id) % 256) - 128) * ((doc_id % 16) + 1) - 1000
        |    ELSE (doc_id * 7 + i * 131) % 4001 - 2000 END AS v
        |  FROM s)
        |SELECT doc_id, CAST(mode AS BIGINT) AS mode, CAST(n AS BIGINT) AS n_samples,
        |  CAST(n // 8 AS BIGINT) AS duration_ms,
        |  CAST(sum(v * v) AS BIGINT) AS sum_sq, CAST(max(abs(v)) AS BIGINT) AS peak_abs,
        |  TRUE AS md5_ok, TRUE AS valid
        |FROM v GROUP BY doc_id, mode, n ORDER BY doc_id""".stripMargin,

    // Priority sampling: the oracle re-derives the per-language top-k
    // with a window formulation over the SAME bit-exact priority (one
    // IEEE division of exact integers — no libm), so the hash match
    // certifies the heap-topk path against window-topk, the md5
    // uniform, the rank order, and the DLT tau threshold at once.
    "q126_weighted_sample" ->
      s"""WITH d AS (SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS weight,
        |  ${md5fold("'prio:' || CAST(doc_id AS VARCHAR)", 8)} AS v
        |  FROM documents WHERE n_chars > 0),
        |p AS (SELECT lang, doc_id, weight,
        |  CAST(weight * 4294967296 AS DOUBLE) / CAST(v + 1 AS DOUBLE) AS pr FROM d),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY pr DESC, doc_id) AS rnk FROM p),
        |t AS (SELECT lang, max(CASE WHEN rnk = 11 THEN pr END) AS tau11 FROM r GROUP BY lang)
        |SELECT r.lang, CAST(rnk AS BIGINT) AS sample_rank, doc_id, weight, pr,
        |  coalesce(tau11, 0.0) AS tau
        |FROM r LEFT JOIN t ON r.lang = t.lang
        |WHERE rnk <= 10 ORDER BY r.lang, rnk""".stripMargin,

    // OLS trend fit: exact HUGEINT moments mirror Spark's
    // DECIMAL(38,0) sums; slope/intercept/r² replay the identical
    // correctly-rounded double chain (cast → divide → sqrt), so the
    // three doubles hash bit-exactly.
    "q127_trend_fit" ->
      """WITH d AS (SELECT o_orderpriority AS g,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS x,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x * y AS HUGEINT)) AS sxy, sum(CAST(x * x AS HUGEINT)) AS sxx,
        |    sum(CAST(y * y AS HUGEINT)) AS syy
        |  FROM d GROUP BY g),
        |m AS (SELECT g, n,
        |    CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) AS num,
        |    CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS denx,
        |    CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE) AS deny,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM a),
        |s AS (SELECT g, n, num, denx, deny, sxd, syd,
        |    CASE WHEN denx = 0 THEN NULL ELSE num / denx END AS slope FROM m)
        |SELECT g AS o_orderpriority, n, slope,
        |  CASE WHEN denx = 0 THEN NULL
        |       ELSE (syd - slope * sxd) / CAST(n AS DOUBLE) END AS intercept,
        |  CASE WHEN denx = 0 OR deny = 0 THEN NULL
        |       ELSE (num / sqrt(denx) / sqrt(deny)) * (num / sqrt(denx) / sqrt(deny)) END AS r2
        |FROM s ORDER BY o_orderpriority""".stripMargin,

    // CUSUM: the oracle replays the same prefix-closed-form windows
    // (running sum + running min/max of integer cents deviations) —
    // scan order (ts, event_id), thresholds as literals.
    "q128_cusum" ->
      """WITH c AS (SELECT user_id, event_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |p AS (SELECT user_id, event_id, ts, cents,
        |    sum(cents - 3000) OVER w AS pu,
        |    sum(cents - 2000) OVER w AS pd
        |  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, event_id, ts,
        |    pu - least(CAST(0 AS BIGINT), min(pu) OVER w) AS s_pos,
        |    greatest(CAST(0 AS BIGINT), max(pd) OVER w) - pd AS s_neg
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |a AS (SELECT user_id, event_id, ts, s_pos, s_neg,
        |    (s_pos > 10000 OR s_neg > 10000) AS alarm FROM s)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(s_pos) AS BIGINT) AS max_s_pos,
        |  CAST(max(s_neg) AS BIGINT) AS max_s_neg,
        |  CAST(coalesce(sum(CASE WHEN alarm THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_alarms,
        |  first(event_id ORDER BY ts, event_id) FILTER (WHERE alarm) AS first_alarm_id
        |FROM a GROUP BY user_id ORDER BY user_id""".stripMargin,

    // UTF-8 hygiene: the oracle PREDICTS the validator's outputs from
    // the synthesis parameters with pure string SQL (chunk-join for
    // the insert modes, U+FFFD splices for the corruption kinds) —
    // it never sees a payload byte, so the md5 match certifies the
    // WHATWG state machine's replacement policy end to end.
    "q129_utf8_hygiene" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 80) AS c
        |  FROM documents),
        |d AS (SELECT doc_id, doc_id % 4 AS mode,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base FROM b),
        |ch AS (SELECT doc_id, i,
        |    CASE WHEN i = 0 THEN '' WHEN mode = 1 THEN 'é' ELSE 'Ã©' END ||
        |      substring(base, CAST(i * 10 + 1 AS INT), 10) AS piece
        |  FROM d, LATERAL unnest(range(0, (length(base) + 9) // 10)) AS t(i)
        |  WHERE mode IN (1, 2)),
        |joined AS (SELECT doc_id, string_agg(piece, '' ORDER BY i) AS rep
        |  FROM ch GROUP BY doc_id),
        |r AS (SELECT d.doc_id AS doc_id, d.mode AS mode, length(base) AS len,
        |    (length(base) + 9) // 10 - 1 AS inserts,
        |    CASE CAST((d.doc_id // 4) % 3 AS INT) WHEN 2 THEN 2 ELSE 1 END AS k,
        |    CASE CAST(d.mode AS INT)
        |      WHEN 0 THEN base
        |      WHEN 3 THEN substring(base, 1, 10) ||
        |        repeat(chr(65533), CASE CAST((d.doc_id // 4) % 3 AS INT) WHEN 2 THEN 2 ELSE 1 END) ||
        |        substring(base, 11)
        |      ELSE joined.rep END AS rep
        |  FROM d LEFT JOIN joined ON d.doc_id = joined.doc_id)
        |SELECT doc_id, CAST(mode AS BIGINT) AS mode,
        |  CAST(CASE CAST(mode AS INT) WHEN 0 THEN len WHEN 1 THEN len + inserts
        |       WHEN 2 THEN len + 2 * inserts ELSE len + k END AS BIGINT) AS n_codepoints,
        |  CAST(CASE WHEN mode = 3 THEN k ELSE 0 END AS BIGINT) AS n_invalid,
        |  CAST(CASE WHEN mode = 2 THEN inserts ELSE 0 END AS BIGINT) AS n_mojibake,
        |  md5(rep) AS repaired_md5,
        |  mode <> 3 AS valid
        |FROM r ORDER BY doc_id""".stripMargin,

    // Bottom-k hash-sample quantiles: the oracle rebuilds the SAMPLE
    // itself (bottom-256 by the same 60-bit md5 fold), the empirical
    // index arithmetic, and the integer rank-error certificate — the
    // whole sketch is hash-deterministic, so everything hashes.
    "q130_sample_quantiles" ->
      s"""WITH c AS (SELECT event_type AS g, event_id AS id,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT g, id, v, ${md5fold("CAST(id AS VARCHAR)", 15)} AS hv FROM c),
        |s AS (SELECT g, id, v, row_number() OVER (PARTITION BY g ORDER BY hv, id) AS hr FROM h),
        |samp AS (SELECT g, id, v FROM s WHERE hr <= 256),
        |r AS (SELECT g, id, v, row_number() OVER (PARTITION BY g ORDER BY v, id) - 1 AS vr,
        |      count(*) OVER (PARTITION BY g) AS m FROM samp),
        |e AS (SELECT g, p, v AS est, m FROM r JOIN (VALUES (50), (90), (99)) AS pv(p)
        |      ON vr = (p * (m - 1)) // 100),
        |n AS (SELECT g, count(*) AS n FROM c GROUP BY g),
        |rk AS (SELECT e.g AS g, e.p AS p, e.est AS est, e.m AS m,
        |      coalesce(cnt.cnt, 0) AS exact_rank
        |    FROM e LEFT JOIN (SELECT e2.g, e2.p, count(*) AS cnt
        |      FROM e e2 JOIN c ON c.g = e2.g AND c.v < e2.est GROUP BY e2.g, e2.p) cnt
        |      ON cnt.g = e.g AND cnt.p = e.p)
        |SELECT rk.g AS event_type, CAST(rk.p AS BIGINT) AS p, est,
        |  CAST(m AS BIGINT) AS m, n, exact_rank,
        |  CAST(100 * exact_rank - rk.p * (n - 1) AS HUGEINT) *
        |    (100 * exact_rank - rk.p * (n - 1)) * 256
        |    <= CAST(9 AS HUGEINT) * (100 * n) * (100 * n) AS within_bound
        |FROM rk JOIN n ON n.g = rk.g
        |ORDER BY event_type, p""".stripMargin,

    // WARC extraction: every output is predicted from the synthesis
    // with string SQL — the md5 match certifies record framing, the
    // gzip member layout, and the HTTP payload parse end to end.
    "q131_warc_extract" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 100) AS c
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    '<html><body>' || (CASE WHEN length(c) = 0 THEN ' ' ELSE c END) || '</body></html>' AS body
        |  FROM b)
        |SELECT doc_id, CAST(3 AS BIGINT) AS n_records, CAST(1 AS BIGINT) AS n_responses,
        |  CAST(CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS BIGINT) AS status,
        |  'http://crawl.test/doc/' || CAST(doc_id AS VARCHAR) AS uri,
        |  CAST(length(body) AS BIGINT) AS body_chars,
        |  md5(body) AS body_md5,
        |  TRUE AS valid
        |FROM d ORDER BY doc_id""".stripMargin,

    // ZIP extraction: counts, sizes and the name/content md5s are all
    // predicted from the synthesis with string SQL — agreement
    // certifies the central-directory walk, raw-deflate inflation,
    // and CRC verification without the oracle seeing an archive byte.
    "q132_zip_extract" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 120) AS c
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base,
        |    '{"id":' || CAST(doc_id AS VARCHAR) || '}' AS meta
        |  FROM b)
        |SELECT doc_id, CAST(2 AS BIGINT) AS n_entries,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_deflated,
        |  CAST(length(base) + length(meta) AS BIGINT) AS total_bytes,
        |  md5('doc.txt' || 'meta.json') AS names_md5,
        |  md5(base || meta) AS content_md5,
        |  TRUE AS valid
        |FROM d ORDER BY doc_id""".stripMargin,

    // robots.txt evaluation: the oracle states RFC 9309's closed form
    // for the five synthesized path shapes (longest-pattern
    // precedence, Allow tie-break, $-anchor) — verdict AND matched
    // pattern per shape; the real parser/matcher must land exactly.
    "q133_robots_eval" ->
      """WITH d AS (SELECT doc_id, doc_id % 5 AS mode FROM documents)
        |SELECT doc_id, CAST(mode AS BIGINT) AS mode,
        |  CASE CAST(mode AS INT)
        |    WHEN 0 THEN '/public/page' || CAST(doc_id AS VARCHAR)
        |    WHEN 1 THEN '/private/x' || CAST(doc_id AS VARCHAR)
        |    WHEN 2 THEN '/private/open/x' || CAST(doc_id AS VARCHAR)
        |    WHEN 3 THEN '/cache/f' || CAST(doc_id AS VARCHAR) || '.tmp'
        |    ELSE '/cache/f' || CAST(doc_id AS VARCHAR) || '.tmpx' END AS path,
        |  mode IN (0, 2, 4) AS allowed,
        |  CASE CAST(mode AS INT)
        |    WHEN 0 THEN '/' WHEN 1 THEN '/private' WHEN 2 THEN '/private/open'
        |    WHEN 3 THEN '/*.tmp$' ELSE '/' END AS rule
        |FROM d ORDER BY doc_id""".stripMargin,

    // tar extraction: counts, sizes and the name/content md5s are all
    // predicted with string SQL — agreement certifies the 512-byte
    // header walk, octal size parse, checksum verification and (on
    // half the ids) the gzip route, without seeing an archive byte.
    "q134_tar_extract" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 90) AS c
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base,
        |    'id=' || CAST(doc_id AS VARCHAR) AS meta
        |  FROM b)
        |SELECT doc_id, CAST(3 AS BIGINT) AS n_entries, CAST(2 AS BIGINT) AS n_files,
        |  CAST(1 AS BIGINT) AS n_dirs,
        |  CAST(length(base) + length(meta) AS BIGINT) AS total_bytes,
        |  md5('docs/' || 'docs/text.txt' || 'docs/meta.txt') AS names_md5,
        |  md5(base || meta) AS content_md5,
        |  TRUE AS valid
        |FROM d ORDER BY doc_id""".stripMargin,

    // Uniform archive ingestion: one row per extracted entry across
    // all three containers, every column predicted with string SQL —
    // one hash certifies content routing, the three container walks,
    // and the UTF-8 step behind one API.
    "q135_ingest_archives" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 80) AS c
        |  FROM documents),
        |d AS (SELECT doc_id, doc_id % 3 AS mode,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base FROM b),
        |rows_out AS (
        |  SELECT doc_id, 'warc' AS format,
        |    'http://crawl.test/doc/' || CAST(doc_id AS VARCHAR) AS entry,
        |    md5('<html><body>' || base || '</body></html>') AS text_md5
        |  FROM d WHERE mode = 0
        |  UNION ALL
        |  SELECT doc_id, 'zip', 'doc.txt', md5(base) FROM d WHERE mode = 1
        |  UNION ALL
        |  SELECT doc_id, 'zip', 'meta.json',
        |    md5('{"id":' || CAST(doc_id AS VARCHAR) || '}') FROM d WHERE mode = 1
        |  UNION ALL
        |  SELECT doc_id, 'tar', 'docs/text.txt', md5(base) FROM d WHERE mode = 2
        |  UNION ALL
        |  SELECT doc_id, 'tar', 'docs/meta.txt',
        |    md5('id=' || CAST(doc_id AS VARCHAR)) FROM d WHERE mode = 2)
        |SELECT doc_id, format, entry, text_md5,
        |  CAST(0 AS BIGINT) AS n_invalid_utf8, TRUE AS valid
        |FROM rows_out ORDER BY doc_id, entry""".stripMargin,

    // Avro OCF read-back: every decoded column predicted from the
    // synthesis with string SQL — block count from the framing
    // (blockSize=2), sums/md5s over the generated records; the hash
    // certifies varints, doubles, three codecs and the block walk.
    "q136_avro_read" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 60) AS c
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base,
        |    3 + doc_id % 4 AS k FROM b),
        |e AS (SELECT doc_id, base, k, unnest(range(k)) AS i FROM d),
        |a AS (SELECT doc_id, any_value(k) AS k, any_value(base) AS base,
        |    md5(string_agg('row' || CAST(doc_id AS VARCHAR) || '_' || CAST(i AS VARCHAR),
        |                   '' ORDER BY i)) AS names_md5,
        |    CAST(sum(doc_id * 10 + i) AS BIGINT) AS sum_id,
        |    sum(CAST(i % 4 AS DOUBLE) * CAST(0.25 AS DOUBLE)) AS sum_score,
        |    CAST(sum(CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flags
        |  FROM e GROUP BY doc_id)
        |SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'null' WHEN 1 THEN 'deflate' ELSE 'snappy' END AS codec,
        |  CAST((k + 1) // 2 AS BIGINT) AS n_blocks,
        |  CAST(k AS BIGINT) AS n_records,
        |  sum_id, names_md5, md5(repeat(base, CAST(k AS INTEGER))) AS body_md5,
        |  sum_score, n_flags, TRUE AS valid
        |FROM a ORDER BY doc_id""".stripMargin,

    // TFRecord/tf.Example read-back: record/feature counts, id sums,
    // text md5, the exact float-quarter embedding sum and label
    // counts — all closed-form from the synthesis; the hash
    // certifies the framing, both masked CRCs and the wire walk.
    // sum_emb = Σ_i (i*0.5 + i*0.5+0.25) = k(k-1)/2 + k/4, exact in
    // binary at any fold order.
    "q137_tfrecord" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 60) AS c
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base,
        |    2 + doc_id % 3 AS k FROM b)
        |SELECT doc_id,
        |  CAST(k AS BIGINT) AS n_records,
        |  CAST(4 * k AS BIGINT) AS n_features,
        |  CAST(10 * k * doc_id + k * (k - 1) / 2 AS BIGINT) AS sum_id,
        |  md5(repeat(base, CAST(k AS INTEGER))) AS text_md5,
        |  CAST(k * (k - 1) AS DOUBLE) / 2 + CAST(k AS DOUBLE) / 4 AS sum_emb,
        |  CAST(k // 2 AS BIGINT) AS n_pos,
        |  TRUE AS valid
        |FROM d ORDER BY doc_id""".stripMargin,

    // LZ4 frame round trip: block count is pure arithmetic
    // (ceil(40·len/256)), payload md5/length mirror the synthesis,
    // checksum knobs follow the id sweep; valid certifies the
    // decoded bytes equal the input bit-for-bit.
    "q138_lz4_frames" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 60) AS c
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base FROM b)
        |SELECT doc_id,
        |  CAST((40 * length(base) + 255) // 256 AS BIGINT) AS n_blocks,
        |  CAST(40 * length(base) AS BIGINT) AS out_len,
        |  md5(repeat(base, 40)) AS out_md5,
        |  doc_id % 2 = 0 AS block_cksum,
        |  TRUE AS content_cksum,
        |  TRUE AS valid
        |FROM d ORDER BY doc_id""".stripMargin,

    // Zstandard round trip: block count is ceil(40·len/512), the
    // decoded md5/length mirror the synthesis; checksum_ok certifies
    // the XXH64 verification ran, valid the bit-exact round trip.
    "q139_zstd" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 60) AS c
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base FROM b)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS n_frames,
        |  CAST((40 * length(base) + 511) // 512 AS BIGINT) AS n_blocks,
        |  CAST(40 * length(base) AS BIGINT) AS out_len,
        |  md5(repeat(base, 40)) AS out_md5,
        |  TRUE AS checksum_ok,
        |  TRUE AS valid
        |FROM d ORDER BY doc_id""".stripMargin,

    // bzip2 round trip: one stream, one block (payloads are far below
    // the 100k block bound at any level), the level echoes the id
    // sweep, md5/length mirror the synthesis; valid certifies the
    // bit-exact round trip through RLE1/BWT/MTF/Huffman + both CRCs.
    "q140_bzip2" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 60) AS c
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base FROM b)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS n_streams,
        |  CAST(1 AS BIGINT) AS n_blocks,
        |  CAST(1 + doc_id % 9 AS BIGINT) AS level,
        |  CAST(40 * length(base) AS BIGINT) AS out_len,
        |  md5(repeat(base, 40)) AS out_md5,
        |  TRUE AS valid
        |FROM d ORDER BY doc_id""".stripMargin,

    // XZ round trip: one block, chunk count ceil(40·len/512), check
    // type CRC64 (4); md5/len mirror the synthesis; valid certifies
    // both the verified checks and the bit-exact round trip.
    "q141_xz" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 60) AS c
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base FROM b)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS n_blocks,
        |  CAST((40 * length(base) + 511) // 512 AS BIGINT) AS n_chunks,
        |  CAST(4 AS BIGINT) AS check_type,
        |  CAST(40 * length(base) AS BIGINT) AS out_len,
        |  md5(repeat(base, 40)) AS out_md5,
        |  TRUE AS valid
        |FROM d ORDER BY doc_id""".stripMargin,

    // Record-format ingestion: one row per Avro record / tf.Example,
    // the text is "<base> #<i>", k = 2 + id%2 rows per doc; the hash
    // certifies content routing (incl. TFRecord's CRC-based
    // self-identification), both record walks, and the gzip outer.
    "q142_ingest_records" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 80) AS c
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base,
        |    2 + doc_id % 2 AS k,
        |    CASE WHEN doc_id % 2 = 0 THEN 'avro' ELSE 'tfrecord' END AS format
        |  FROM b),
        |e AS (SELECT doc_id, base, format, unnest(range(k)) AS i FROM d)
        |SELECT doc_id, format, CAST(i AS VARCHAR) AS entry,
        |  md5(base || ' #' || CAST(i AS VARCHAR)) AS text_md5,
        |  CAST(0 AS BIGINT) AS n_invalid_utf8, TRUE AS valid
        |FROM e ORDER BY doc_id, entry""".stripMargin,

    // Native parquet footer read: the oracle is the DATA — per-column
    // count/min/max over `part` must equal what the footer's
    // statistics claim; null counts via count(*)-count(col).
    "q143_parquet_meta" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM part)
        |SELECT * FROM (
        |SELECT 'p_partkey' AS col_name, 'INT64' AS ptype, 'SNAPPY' AS codec,
        |  (SELECT cnt FROM n) AS n_values,
        |  (SELECT cnt FROM n) - CAST(count(p_partkey) AS BIGINT) AS null_count,
        |  CAST(min(p_partkey) AS DOUBLE) AS min_num, CAST(max(p_partkey) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str, TRUE AS valid
        |FROM part
        |UNION ALL
        |SELECT 'p_size', 'INT32', 'SNAPPY', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_size) AS BIGINT),
        |  CAST(min(p_size) AS DOUBLE), CAST(max(p_size) AS DOUBLE),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), TRUE FROM part
        |UNION ALL
        |SELECT 'p_retailprice', 'DOUBLE', 'SNAPPY', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_retailprice) AS BIGINT),
        |  min(p_retailprice), max(p_retailprice),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), TRUE FROM part
        |UNION ALL
        |SELECT 'p_name', 'BYTE_ARRAY', 'SNAPPY', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_name) AS BIGINT),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min(p_name), max(p_name), TRUE FROM part
        |UNION ALL
        |SELECT 'p_brand', 'BYTE_ARRAY', 'SNAPPY', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_brand) AS BIGINT),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min(p_brand), max(p_brand), TRUE FROM part
        |UNION ALL
        |SELECT 'p_type', 'BYTE_ARRAY', 'SNAPPY', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_type) AS BIGINT),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min(p_type), max(p_type), TRUE FROM part
        |) ORDER BY col_name""".stripMargin,

    // Native parquet column decode: counts, null counts, exact
    // integer sums, min/max, and order-canonical string md5s from
    // the natively decoded pages must equal SQL over the table.
    "q144_parquet_decode" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM part)
        |SELECT * FROM (
        |SELECT 'p_partkey' AS col_name, (SELECT cnt FROM n) AS n_rows,
        |  (SELECT cnt FROM n) - CAST(count(p_partkey) AS BIGINT) AS n_nulls,
        |  CAST(sum(p_partkey) AS BIGINT) AS sum_int,
        |  CAST(min(p_partkey) AS DOUBLE) AS min_num, CAST(max(p_partkey) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS str_md5, TRUE AS valid FROM part
        |UNION ALL
        |SELECT 'p_size', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_size) AS BIGINT),
        |  CAST(sum(p_size) AS BIGINT),
        |  CAST(min(p_size) AS DOUBLE), CAST(max(p_size) AS DOUBLE),
        |  CAST(NULL AS VARCHAR), TRUE FROM part
        |UNION ALL
        |SELECT 'p_retailprice', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_retailprice) AS BIGINT),
        |  CAST(NULL AS BIGINT),
        |  min(p_retailprice), max(p_retailprice),
        |  CAST(NULL AS VARCHAR), TRUE FROM part
        |UNION ALL
        |SELECT 'p_name', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_name) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  md5(string_agg(p_name, '' ORDER BY p_name)), TRUE FROM part
        |UNION ALL
        |SELECT 'p_brand', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_brand) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  md5(string_agg(p_brand, '' ORDER BY p_brand)), TRUE FROM part
        |UNION ALL
        |SELECT 'p_type', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_type) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  md5(string_agg(p_type, '' ORDER BY p_type)), TRUE FROM part
        |) ORDER BY col_name""".stripMargin,

    // Native parquet write: Spark's reader aggregates our bytes; the
    // oracle states the same aggregates from the source table. Score
    // quarters are exact at any fold order.
    "q145_parquet_write" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 60) AS c
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base FROM b)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |  CAST(min(doc_id) AS BIGINT) AS min_id,
        |  CAST(max(doc_id) AS BIGINT) AS max_id,
        |  sum(CAST(doc_id % 4 AS DOUBLE) * CAST(0.25 AS DOUBLE)) AS sum_score,
        |  md5(string_agg(base, '' ORDER BY doc_id)) AS names_md5
        |FROM d""".stripMargin,

    // Native ORC footer read: every statistic the footer claims must
    // equal SQL over the data itself (the q143 pattern, ORC flavor).
    "q149_orc_meta" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM part)
        |SELECT * FROM (
        |SELECT 'p_partkey' AS col_name, 'LONG' AS orc_type, 'ZLIB' AS codec,
        |  CAST(count(p_partkey) AS BIGINT) AS n_values,
        |  (SELECT cnt FROM n) > CAST(count(p_partkey) AS BIGINT) AS has_null,
        |  CAST(min(p_partkey) AS BIGINT) AS min_long,
        |  CAST(max(p_partkey) AS BIGINT) AS max_long,
        |  CAST(sum(p_partkey) AS BIGINT) AS sum_long,
        |  CAST(NULL AS DOUBLE) AS min_dbl, CAST(NULL AS DOUBLE) AS max_dbl,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
        |  TRUE AS valid FROM part
        |UNION ALL
        |SELECT 'p_size', 'INT', 'ZLIB',
        |  CAST(count(p_size) AS BIGINT),
        |  (SELECT cnt FROM n) > CAST(count(p_size) AS BIGINT),
        |  CAST(min(p_size) AS BIGINT), CAST(max(p_size) AS BIGINT),
        |  CAST(sum(p_size) AS BIGINT),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), TRUE FROM part
        |UNION ALL
        |SELECT 'p_retailprice', 'DOUBLE', 'ZLIB',
        |  CAST(count(p_retailprice) AS BIGINT),
        |  (SELECT cnt FROM n) > CAST(count(p_retailprice) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  min(p_retailprice), max(p_retailprice),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), TRUE FROM part
        |UNION ALL
        |SELECT 'p_name', 'STRING', 'ZLIB',
        |  CAST(count(p_name) AS BIGINT),
        |  (SELECT cnt FROM n) > CAST(count(p_name) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  min(p_name), max(p_name), TRUE FROM part
        |UNION ALL
        |SELECT 'p_brand', 'STRING', 'ZLIB',
        |  CAST(count(p_brand) AS BIGINT),
        |  (SELECT cnt FROM n) > CAST(count(p_brand) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  min(p_brand), max(p_brand), TRUE FROM part
        |UNION ALL
        |SELECT 'p_type', 'STRING', 'ZLIB',
        |  CAST(count(p_type) AS BIGINT),
        |  (SELECT cnt FROM n) > CAST(count(p_type) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  min(p_type), max(p_type), TRUE FROM part
        |) ORDER BY col_name""".stripMargin,

    // Native ORC column decode: same certificate shape as q144 (the
    // parquet twin) — counts, exact integer sums, min/max, and
    // order-canonical string md5s over the same table.
    "q150_orc_decode" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM part)
        |SELECT * FROM (
        |SELECT 'p_partkey' AS col_name, (SELECT cnt FROM n) AS n_rows,
        |  (SELECT cnt FROM n) - CAST(count(p_partkey) AS BIGINT) AS n_nulls,
        |  CAST(sum(p_partkey) AS BIGINT) AS sum_int,
        |  CAST(min(p_partkey) AS DOUBLE) AS min_num, CAST(max(p_partkey) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS str_md5, TRUE AS valid FROM part
        |UNION ALL
        |SELECT 'p_size', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_size) AS BIGINT),
        |  CAST(sum(p_size) AS BIGINT),
        |  CAST(min(p_size) AS DOUBLE), CAST(max(p_size) AS DOUBLE),
        |  CAST(NULL AS VARCHAR), TRUE FROM part
        |UNION ALL
        |SELECT 'p_retailprice', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_retailprice) AS BIGINT),
        |  CAST(NULL AS BIGINT),
        |  min(p_retailprice), max(p_retailprice),
        |  CAST(NULL AS VARCHAR), TRUE FROM part
        |UNION ALL
        |SELECT 'p_name', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_name) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  md5(string_agg(p_name, '' ORDER BY p_name)), TRUE FROM part
        |UNION ALL
        |SELECT 'p_brand', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_brand) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  md5(string_agg(p_brand, '' ORDER BY p_brand)), TRUE FROM part
        |UNION ALL
        |SELECT 'p_type', (SELECT cnt FROM n),
        |  (SELECT cnt FROM n) - CAST(count(p_type) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  md5(string_agg(p_type, '' ORDER BY p_type)), TRUE FROM part
        |) ORDER BY col_name""".stripMargin,

    // Native ORC write: Spark's orc-core reader aggregates our bytes;
    // same closed form as q145 (the parquet write twin).
    "q151_orc_write" ->
      """WITH b AS (SELECT doc_id,
        |    substring(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'), 1, 60) AS c
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    CASE WHEN length(c) = 0 THEN ' ' ELSE c END AS base FROM b)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |  CAST(min(doc_id) AS BIGINT) AS min_id,
        |  CAST(max(doc_id) AS BIGINT) AS max_id,
        |  sum(CAST(doc_id % 4 AS DOUBLE) * CAST(0.25 AS DOUBLE)) AS sum_score,
        |  md5(string_agg(base, '' ORDER BY doc_id)) AS names_md5
        |FROM d""".stripMargin,

    // Kneser-Ney: integer model statistics + the identical
    // parenthesized double chain for p_kn (the q127 discipline).
    // LM quality gate: the model CTEs are q152's verbatim; scoring
    // replays the one-formula seen/unseen chain and the ORDERED
    // sequential fold (list_reduce over array_agg ORDER BY pos — the
    // q119 discipline; Spark's aggregate(.., 0.0, +) matches because
    // 0.0 + p == p bitwise for p >= 0).
    // Exact AUC: replay q72's margin CTE, rank by score (the oracle
    // may use a window — single-node), tie groups via min/max rank,
    // all-integer numerator, one mirrored division (2.0 * p * n is
    // left-associative on both engines).
    // ANN recall@k: both top-5 sides restate their own oracles (q28
    // exact, q40 probed) with distinct CTE names, intersect by id.
    // Spearman: average-tie ranks via row_number min+max per distinct
    // value (doubled to stay integer), HUGEINT moments, the same
    // mirrored rho chain as the engine (two IEEE sqrts).
    // KS drift: cumulative counts over the per-distinct-value (a, b)
    // table in value order (single-node window is fine oracle-side),
    // integer cross products, one mirrored division.
    // MJPEG AVI frame sampling: every 2nd frame's flat DC-only blocks
    // decode to exact integers (the q90 arithmetic with a frame axis);
    // the oracle replays synthesis → sampled frames → the identical
    // fixed-point YCbCr→RGB fold. duration is integer µs arithmetic.
    "q169_video_frames" ->
      """WITH p AS (SELECT doc_id, 1 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh,
        |    2 + doc_id % 5 AS nf, (40 + doc_id % 10) * 1000 AS us FROM documents),
        |pf AS (SELECT doc_id, bw, bh, nf, us, unnest(range(0, nf, 2)) AS f FROM p),
        |pby AS (SELECT doc_id, bw, bh, f, unnest(range(0, bh)) AS by FROM pf),
        |pbx AS (SELECT doc_id, bw, bh, f, by, unnest(range(0, bw)) AS bx FROM pby),
        |ycc AS (SELECT doc_id, f,
        |  (17*bx + 29*by + 31*f + doc_id) % 256 AS y,
        |  ((11*bx + 7*by + 13*f + 3*doc_id) % 97) - 48 AS cb,
        |  ((13*bx + 5*by + 19*f + 7*doc_id) % 89) - 44 AS cr
        | FROM pbx),
        |rgb AS (SELECT doc_id, f,
        |  least(greatest(y + CAST(floor((91881*cr + 32768)/65536.0) AS BIGINT), 0), 255) AS r,
        |  least(greatest(y + CAST(floor((-22554*cb - 46802*cr + 32768)/65536.0) AS BIGINT), 0), 255) AS g,
        |  least(greatest(y + CAST(floor((116130*cb + 32768)/65536.0) AS BIGINT), 0), 255) AS b
        | FROM ycc),
        |s AS (SELECT doc_id,
        |  CAST(count(DISTINCT f) AS BIGINT) AS n_sampled,
        |  CAST(64*sum(r) AS BIGINT) AS sum_r,
        |  CAST(64*sum(g) AS BIGINT) AS sum_g,
        |  CAST(64*sum(b) AS BIGINT) AS sum_b,
        |  CAST(greatest(max(r), max(g), max(b)) AS BIGINT) AS peak
        | FROM rgb GROUP BY doc_id)
        |SELECT p.doc_id, CAST(8*bw AS BIGINT) AS width, CAST(8*bh AS BIGINT) AS height,
        |  CAST(nf AS BIGINT) AS n_frames, s.n_sampled,
        |  CAST(nf * us // 1000 AS BIGINT) AS duration_ms,
        |  s.sum_r, s.sum_g, s.sum_b, s.peak, true AS valid
        |FROM p JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,

    // DSIR selection: the whole chain mirrored — hashed unigram+bigram
    // buckets (the md5 fold), target/raw bucket masses, the exact
    // cross-multiplied surrogate score in HUGEINT, top-50 by
    // (score desc, doc_id).
    "q170_dsir" ->
      s"""WITH toks AS (SELECT doc_id,
         |    CAST(regexp_extract(source, '[0-9]+', 0) AS BIGINT) % 2 = 0 AS tgt,
         |    list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0) AS t
         |  FROM documents),
         |grams AS (SELECT doc_id, tgt, list_concat(
         |    list_transform(t, x -> '1:' || x),
         |    list_transform(range(len(t) - 1), i -> '2:' || t[i + 1] || ' ' || t[i + 2])) AS gs
         |  FROM toks),
         |f AS (SELECT doc_id, tgt, unnest(gs) AS gram FROM grams),
         |fb AS (SELECT doc_id, tgt, ${md5fold("gram", 8)} % 4096 AS bucket FROM f),
         |db AS (SELECT doc_id, tgt, bucket, CAST(count(*) AS BIGINT) AS n
         |  FROM fb GROUP BY 1, 2, 3),
         |model AS (SELECT bucket,
         |    CAST(sum(CASE WHEN tgt THEN n ELSE 0 END) AS BIGINT) AS ct,
         |    CAST(sum(CASE WHEN tgt THEN 0 ELSE n END) AS BIGINT) AS cr
         |  FROM db GROUP BY bucket),
         |tot AS (SELECT CAST(sum(ct) AS HUGEINT) AS nt, CAST(sum(cr) AS HUGEINT) AS nr FROM model),
         |sc AS (SELECT db.doc_id,
         |    CAST(sum(n) AS BIGINT) AS n_feats,
         |    CAST(sum(n * ct) AS BIGINT) AS sum_tgt,
         |    CAST(sum(n * cr) AS BIGINT) AS sum_raw,
         |    sum(CAST(n AS HUGEINT) * (CAST(ct AS HUGEINT) * nr - CAST(cr AS HUGEINT) * nt)) AS score
         |  FROM db JOIN model USING (bucket) CROSS JOIN tot
         |  WHERE NOT tgt GROUP BY db.doc_id),
         |rk AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM sc)
         |SELECT sc.doc_id, n_feats, sum_tgt, sum_raw,
         |  CAST(score AS VARCHAR) AS score,
         |  (rk.r <= 50) AS selected
         |FROM sc JOIN rk USING (doc_id) ORDER BY sc.doc_id""".stripMargin,

    // Image aHash near-dup: pixel synthesis → integer luma (gray ⇒
    // luma = value) → exact 2×2 box sums → cross-multiplied mean bits
    // → 16-bit bands → candidate join → popcount verify, replayed
    // row-for-row.
    "q171_image_neardup" ->
      """WITH ids AS (SELECT doc_id, doc_id // 2 AS b, doc_id % 2 = 1 AS odd FROM documents),
        |g AS (SELECT doc_id, b, odd, x, y FROM ids, range(0, 16) rx(x), range(0, 16) ry(y)),
        |v AS (SELECT doc_id, x, y,
        |   (((3 + b % 251) * x * y + (1 + b % 127) * x + (2 + b % 61) * y) % 256
        |    + CASE WHEN odd AND (x * 16 + y) % 53 = 0 THEN 40 ELSE 0 END) % 256 AS val
        |  FROM g),
        |cells AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS ci, CAST(sum(val) AS BIGINT) AS cs
        |  FROM v GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(sum(cs) AS BIGINT) AS t FROM cells GROUP BY 1),
        |bits AS (SELECT doc_id, ci, CASE WHEN cs * 64 >= t THEN 1 ELSE 0 END AS bit
        |  FROM cells JOIN tot USING (doc_id)),
        |bands AS (SELECT doc_id, ci // 16 AS band,
        |   CAST(sum(bit * (1 << (15 - ci % 16))) AS BIGINT) AS bval
        |  FROM bits GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
        |  FROM bands a JOIN bands b2
        |    ON a.band = b2.band AND a.bval = b2.bval AND a.doc_id < b2.doc_id),
        |ham AS (SELECT id_a, id_b,
        |   CAST(sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        |  FROM cand JOIN bits ba ON ba.doc_id = id_a
        |   JOIN bits bb ON bb.doc_id = id_b AND bb.ci = ba.ci
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 10
        |ORDER BY id_a, id_b""".stripMargin,

    // Exact-integer PageRank: the edge synthesis (1+id%3 out-edges,
    // id%7==3 dangling, self-loop deflection) and FOUR power-iteration
    // rounds unrolled as CTE layers — shares as floor divisions,
    // dangling mass redistributed uniformly, teleport
    // (100-85)*scale//100 — so the hash certifies every round, not
    // just the last table. All non-negative integers; DuckDB's // is
    // floor division, identical to long division here.
    "q172_pagerank" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |base AS (SELECT doc_id AS src, unnest(range(0, 1 + doc_id % 3)) AS k
        |  FROM documents WHERE doc_id % 7 <> 3),
        |e0 AS (SELECT src, (src * (k + 3) + k + 1) % n AS d0, n FROM base CROSS JOIN nn),
        |ed AS (SELECT src, CASE WHEN d0 = src THEN (d0 + 1) % n ELSE d0 END AS dst FROM e0),
        |nodes AS (SELECT src AS id FROM ed UNION SELECT dst FROM ed),
        |un AS (SELECT count(*) AS u FROM nodes),
        |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS dg FROM ed GROUP BY 1),
        |r0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS r FROM nodes),
        |d1 AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dm FROM r0 LEFT JOIN deg USING (id) WHERE dg IS NULL),
        |c1 AS (SELECT dst AS id, CAST(sum(r // dg) AS BIGINT) AS c FROM ed JOIN r0 ON r0.id = ed.src JOIN deg ON deg.id = ed.src GROUP BY dst),
        |r1 AS (SELECT nodes.id, CAST(150000000000 + (85 * (coalesce(c, 0) + dm // u)) // 100 AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c1 USING (id) CROSS JOIN d1 CROSS JOIN un),
        |d2 AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dm FROM r1 LEFT JOIN deg USING (id) WHERE dg IS NULL),
        |c2 AS (SELECT dst AS id, CAST(sum(r // dg) AS BIGINT) AS c FROM ed JOIN r1 ON r1.id = ed.src JOIN deg ON deg.id = ed.src GROUP BY dst),
        |r2 AS (SELECT nodes.id, CAST(150000000000 + (85 * (coalesce(c, 0) + dm // u)) // 100 AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c2 USING (id) CROSS JOIN d2 CROSS JOIN un),
        |d3 AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dm FROM r2 LEFT JOIN deg USING (id) WHERE dg IS NULL),
        |c3 AS (SELECT dst AS id, CAST(sum(r // dg) AS BIGINT) AS c FROM ed JOIN r2 ON r2.id = ed.src JOIN deg ON deg.id = ed.src GROUP BY dst),
        |r3 AS (SELECT nodes.id, CAST(150000000000 + (85 * (coalesce(c, 0) + dm // u)) // 100 AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c3 USING (id) CROSS JOIN d3 CROSS JOIN un),
        |d4 AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dm FROM r3 LEFT JOIN deg USING (id) WHERE dg IS NULL),
        |c4 AS (SELECT dst AS id, CAST(sum(r // dg) AS BIGINT) AS c FROM ed JOIN r3 ON r3.id = ed.src JOIN deg ON deg.id = ed.src GROUP BY dst),
        |r4 AS (SELECT nodes.id, CAST(150000000000 + (85 * (coalesce(c, 0) + dm // u)) // 100 AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c4 USING (id) CROSS JOIN d4 CROSS JOIN un)
        |SELECT r4.id AS node_id, CAST(coalesce(dg, 0) AS BIGINT) AS out_degree,
        |  r AS rank_scaled
        |FROM r4 LEFT JOIN deg ON deg.id = r4.id ORDER BY node_id""".stripMargin,

    // ISO-BMFF container walk: every field reconstructed from the
    // synthesis arithmetic — integer duration divisions, the per-
    // sample size fold, the every-3rd sync table (or the no-stss
    // all-sync fallback). The box/version/free knobs change the BYTES
    // but not the parsed VALUES, which is exactly what the walk must
    // guarantee.
    "q173_mp4_meta" ->
      """WITH p AS (SELECT doc_id, 5 + doc_id % 9 AS n,
        |    600 + (doc_id % 5) * 100 AS mts, 1000 + doc_id % 7 AS medts,
        |    100 + doc_id % 50 AS delta FROM documents),
        |szi AS (SELECT doc_id, unnest(range(0, n)) AS i FROM p),
        |sz AS (SELECT doc_id, CAST(sum((i * 17 + doc_id) % 211 + 1) AS BIGINT) AS ssum,
        |    CAST(max((i * 17 + doc_id) % 211 + 1) AS BIGINT) AS smax
        |  FROM szi GROUP BY doc_id)
        |SELECT p.doc_id, CAST(mts AS BIGINT) AS movie_timescale,
        |  CAST((2 + doc_id % 10) * 1000 AS BIGINT) AS duration_ms,
        |  CAST(1 AS BIGINT) AS n_tracks,
        |  CASE WHEN doc_id % 2 = 0 THEN 'vide' ELSE 'soun' END AS handler,
        |  CAST(medts AS BIGINT) AS media_timescale,
        |  CAST((n * delta * 1000) // medts AS BIGINT) AS media_duration_ms,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(CASE WHEN doc_id % 4 = 1 THEN n ELSE (n + 2) // 3 END AS BIGINT) AS n_keyframes,
        |  sz.ssum AS sum_sample_bytes, sz.smax AS max_sample_bytes,
        |  true AS valid
        |FROM p JOIN sz USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q168_ks_drift" ->
      """WITH d AS (SELECT CAST(n_chars AS BIGINT) AS v,
        |    CAST(regexp_extract(source, '[0-9]+', 0) AS BIGINT) % 2 = 0 AS ia
        |  FROM documents),
        |g AS (SELECT v, CAST(sum(CASE WHEN ia THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN ia THEN 0 ELSE 1 END) AS BIGINT) AS b
        |  FROM d GROUP BY v),
        |t AS (SELECT CAST(sum(a) AS HUGEINT) AS na, CAST(sum(b) AS HUGEINT) AS nb,
        |    CAST(count(*) AS BIGINT) AS nv FROM g),
        |c AS (SELECT v, CAST(sum(a) OVER (ORDER BY v) AS HUGEINT) AS ca,
        |    CAST(sum(b) OVER (ORDER BY v) AS HUGEINT) AS cb FROM g),
        |m AS (SELECT max(abs(ca * t.nb - cb * t.na)) AS dnum FROM c CROSS JOIN t)
        |SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b, t.nv AS n_values,
        |  CAST(m.dnum AS BIGINT) AS d_num,
        |  CASE WHEN t.na = 0 OR t.nb = 0 THEN NULL
        |       ELSE CAST(m.dnum AS DOUBLE) / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)) END AS d
        |FROM m CROSS JOIN t""".stripMargin,

    "q167_spearman" ->
      s"""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS xv,
         |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> length(t) > 0)) AS BIGINT) AS yv
         |  FROM documents),
         |rxr AS (SELECT xv, row_number() OVER (ORDER BY xv) AS r FROM d),
         |rx AS (SELECT xv, CAST(min(r) + max(r) AS HUGEINT) AS xr2 FROM rxr GROUP BY xv),
         |ryr AS (SELECT yv, row_number() OVER (ORDER BY yv) AS r FROM d),
         |ry AS (SELECT yv, CAST(min(r) + max(r) AS HUGEINT) AS yr2 FROM ryr GROUP BY yv),
         |j AS (SELECT xr2 AS rxv, yr2 AS ryv FROM d JOIN rx USING (xv) JOIN ry USING (yv)),
         |t AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(rxv) AS sx, sum(ryv) AS sy,
         |    sum(rxv * ryv) AS sxy, sum(rxv * rxv) AS sxx, sum(ryv * ryv) AS syy FROM j)
         |SELECT CAST(n AS BIGINT) AS n,
         |  CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) = 0.0
         |         OR CAST(n * syy - sy * sy AS DOUBLE) = 0.0 THEN NULL
         |       ELSE CAST(n * sxy - sx * sy AS DOUBLE)
         |            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END AS rho
         |FROM t""".stripMargin,

    "q166_ann_recall" ->
      s"""WITH px AS (SELECT q.vec_id AS query_id, e.vec_id, q.embedding AS ea, e.embedding AS eb
         |  FROM embeddings q CROSS JOIN embeddings e WHERE q.vec_id < 8),
         |sx AS (SELECT *, ${dot("ea", "eb")} AS dp, sqrt(${dot("ea", "ea")}) AS na, sqrt(${dot("eb", "eb")}) AS nb FROM px),
         |cx AS (SELECT query_id, vec_id, CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0 ELSE dp / (na * nb) END AS cosine FROM sx),
         |rx AS (SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM cx),
         |ex AS (SELECT query_id, vec_id FROM rx WHERE rk <= 5),
         |av AS (SELECT vec_id, embedding, vec_id % 8 AS cid FROM embeddings),
         |pr AS (SELECT q.vec_id AS query_id, q.embedding AS qe, (q.vec_id + t.i) % 8 AS cid
         |  FROM embeddings q CROSS JOIN range(0, 3) t(i) WHERE q.vec_id < 8),
         |pa AS (SELECT pr.query_id, av.vec_id, pr.qe AS ea, av.embedding AS eb FROM pr JOIN av USING (cid)),
         |sa AS (SELECT *, ${dot("ea", "eb")} AS dp, sqrt(${dot("ea", "ea")}) AS na, sqrt(${dot("eb", "eb")}) AS nb FROM pa),
         |ca AS (SELECT query_id, vec_id, CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0 ELSE dp / (na * nb) END AS cosine FROM sa),
         |ra AS (SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM ca),
         |iv AS (SELECT query_id, vec_id FROM ra WHERE rk <= 5),
         |j AS (SELECT ex.query_id, CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(CASE WHEN iv.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |  FROM ex LEFT JOIN iv ON iv.query_id = ex.query_id AND iv.vec_id = ex.vec_id
         |  GROUP BY ex.query_id)
         |SELECT query_id, k, n_hit, CAST(n_hit AS DOUBLE) / 5.0 AS recall
         |FROM j ORDER BY query_id""".stripMargin,

    "q165_classifier_auc" ->
      s"""WITH tk AS (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0) AS toks FROM documents),
         |m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks,
         |    t -> ${md5fold("t", 8)} % 2001 - 1000)), (a, v) -> a + v) AS margin
         | FROM tk),
         |lab AS (SELECT margin AS s, n_tokens >= 50 AS y FROM m),
         |rk AS (SELECT s, y, row_number() OVER (ORDER BY s) AS r FROM lab),
         |g AS (SELECT s, CAST(min(r) AS HUGEINT) AS lo, CAST(max(r) AS HUGEINT) AS hi,
         |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS HUGEINT) AS p,
         |    CAST(count(*) AS HUGEINT) AS ng
         |  FROM rk GROUP BY s),
         |t AS (SELECT sum(p * (lo + hi)) AS rs2, sum(p) AS pt, sum(ng - p) AS nt FROM g)
         |SELECT CAST(pt + nt AS BIGINT) AS n, CAST(pt AS BIGINT) AS n_pos,
         |  CAST(nt AS BIGINT) AS n_neg,
         |  CAST(rs2 - pt * (pt + 1) AS BIGINT) AS numer2,
         |  CASE WHEN pt = 0 OR nt = 0 THEN NULL
         |       ELSE CAST(rs2 - pt * (pt + 1) AS DOUBLE)
         |            / (2.0 * CAST(pt AS DOUBLE) * CAST(nt AS DOUBLE)) END AS auc
         |FROM t""".stripMargin,

    "q164_lm_quality" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS t
        |  FROM documents),
        |bgl AS (SELECT unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2 FROM toks WHERE len(t) >= 2),
        |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bgl GROUP BY w1, w2),
        |l AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1f FROM bg GROUP BY w1),
        |r AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM bg GROUP BY w2),
        |b AS (SELECT CAST(count(*) AS BIGINT) AS b_total FROM bg),
        |pairs AS (SELECT doc_id, unnest(range(0, len(t) - 1)) AS pos,
        |    unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
        |  FROM toks WHERE len(t) >= 2),
        |sc AS (SELECT p.doc_id, p.pos,
        |    CASE WHEN l.c1 IS NULL THEN 0.0
        |         ELSE greatest(CAST(coalesce(bg.c12, 0) AS DOUBLE) - 0.75, 0.0) / CAST(l.c1 AS DOUBLE)
        |              + ((0.75 * CAST(l.n1f AS DOUBLE)) / CAST(l.c1 AS DOUBLE))
        |                * (CAST(coalesce(r.n1b, 0) AS DOUBLE) / CAST(b.b_total AS DOUBLE)) END AS p,
        |    CASE WHEN bg.c12 IS NOT NULL THEN 1 ELSE 0 END AS seen,
        |    CASE WHEN l.c1 IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM pairs p LEFT JOIN bg ON p.w1 = bg.w1 AND p.w2 = bg.w2
        |    LEFT JOIN l ON p.w1 = l.w1
        |    LEFT JOIN r ON p.w2 = r.w2
        |    CROSS JOIN b),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(seen) AS BIGINT) AS n_seen, CAST(sum(oov) AS BIGINT) AS n_oov_ctx,
        |    list_reduce(array_agg(p ORDER BY pos), (a, x) -> a + x) / CAST(count(*) AS DOUBLE) AS mean_p
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_pairs, n_seen, n_oov_ctx, mean_p,
        |  CASE WHEN mean_p >= 0.035 THEN 'head' WHEN mean_p >= 0.033 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM agg ORDER BY doc_id""".stripMargin,

    "q152_kneser_ney" ->
      """WITH toks AS (SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS t
        |  FROM documents),
        |bgl AS (SELECT unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2 FROM toks WHERE len(t) >= 2),
        |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bgl GROUP BY w1, w2),
        |l AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1f FROM bg GROUP BY w1),
        |r AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM bg GROUP BY w2),
        |b AS (SELECT CAST(count(*) AS BIGINT) AS b_total FROM bg)
        |SELECT w1, w2, c12, c1, n1f, n1b, b_total,
        |  greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE)
        |    + ((0.75 * CAST(n1f AS DOUBLE)) / CAST(c1 AS DOUBLE))
        |      * (CAST(n1b AS DOUBLE) / CAST(b_total AS DOUBLE)) AS p_kn
        |FROM bg JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN b
        |WHERE c12 >= 5
        |ORDER BY w1, w2""".stripMargin,

    // Bloom data skipping: the answer for one scattered key, plus the
    // literal file counts the in-query require stands behind.
    "q153_txlog_bloom_skip" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(5 AS BIGINT) AS files_total,
        |  TRUE AS bloom_pruned
        |FROM orders WHERE o_custkey = 7""".stripMargin,

    // Z-order clustering: the 2-D box answer; hash equality across the
    // cluster rewrite also certifies the rewrite lost nothing.
    "q154_txlog_zorder" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  TRUE AS clustered_pruned
        |FROM orders
        |WHERE o_custkey <= 100
        |  AND CAST(floor(o_totalprice) AS BIGINT) BETWEEN 50000 AND 150000""".stripMargin,

    // Epoch shuffle: the permutation itself is in order_md5 (ids
    // concatenated in shuffle order); shard via the q44 hex fold.
    "q155_epoch_shuffle" ->
      """WITH e AS (SELECT 1 AS epoch UNION ALL SELECT 2),
        |a AS (SELECT epoch, doc_id,
        |    md5('42:' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h,
        |    len(list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
        |        x -> length(x) > 0)) AS toks
        |  FROM documents CROSS JOIN e),
        |s AS (SELECT epoch, doc_id, h, toks,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substring(h, 1, 15), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (acc, v) -> acc * 16 + v) % 4 AS shard
        |  FROM a)
        |SELECT epoch, shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS sum_tokens,
        |  md5(string_agg(CAST(doc_id AS VARCHAR), ''
        |      ORDER BY h, CAST(doc_id AS VARCHAR))) AS order_md5
        |FROM s GROUP BY epoch, shard ORDER BY epoch, shard""".stripMargin,

    // Change feed over the delete+upsert interval: net inserts =
    // doubled ≡0 rows + ≡2 rows; net deletes = original ≡0 rows +
    // F-status ≡1 rows; untouched-value ≡1 rows cancel.
    "q156_txlog_cdc" ->
      """WITH ch AS (
        |  SELECT 'insert' AS _change, o_orderstatus, o_totalprice * 2 AS p
        |    FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT 'insert', o_orderstatus, o_totalprice
        |    FROM orders WHERE o_orderkey % 3 = 2
        |  UNION ALL
        |  SELECT 'delete', o_orderstatus, o_totalprice
        |    FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT 'delete', o_orderstatus, o_totalprice
        |    FROM orders WHERE o_orderkey % 3 = 1 AND o_orderstatus = 'F')
        |SELECT _change, o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM ch GROUP BY _change, o_orderstatus
        |ORDER BY _change, o_orderstatus""".stripMargin,

    // Incremental view over the change feed: the maintained view must
    // equal a direct aggregate of the FINAL table state.
    "q157_txlog_incremental_view" ->
      """WITH fin AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |    WHERE o_orderkey % 3 = 1 AND o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |    WHERE o_orderkey % 3 = 2
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice * 2 FROM orders
        |    WHERE o_orderkey % 3 = 0)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(count(o_totalprice) AS BIGINT) AS nn_cents
        |FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // WebP/VP8L: the q80 synthesis closed form — decoded pixels are
    // identical across all five encoding-knob paths.
    "q158_webp_pixels" ->
      """WITH p AS (SELECT doc_id, 9 + doc_id % 7 AS w, 5 + doc_id % 6 AS h FROM documents),
        |py AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM p),
        |px AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM py),
        |s AS (SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |  CAST(sum((x*11 + y*5 + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((x*3 + y*13 + 2*doc_id) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((x*7 + y*9 + 3*doc_id) % 256) AS BIGINT) AS sum_b,
        |  CAST(greatest(max((x*11 + y*5 + doc_id) % 256), max((x*3 + y*13 + 2*doc_id) % 256),
        |                max((x*7 + y*9 + 3*doc_id) % 256)) AS BIGINT) AS peak
        | FROM px GROUP BY doc_id)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  sum_r, sum_g, sum_b, peak, true AS valid
        |FROM s ORDER BY doc_id""".stripMargin,

    // ORC record ingestion: every row restated closed-form from the
    // synthesis arithmetic (one row per ORC record, 3 per archive).
    "q159_ingest_orc" ->
      """WITH j AS (SELECT unnest(range(0, 3)) AS j)
        |SELECT doc_id, 'orc' AS format, CAST(j AS VARCHAR) AS entry,
        |  's' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR) AS text,
        |  CAST(0 AS BIGINT) AS n_invalid_utf8, TRUE AS valid
        |FROM documents CROSS JOIN j
        |ORDER BY doc_id, entry""".stripMargin,

    // Trigram KN: all eight integer statistics + the nested mirrored
    // double chain (same parenthesization as pkn3Expr).
    "q160_kneser_ney3" ->
      ("""WITH toks AS (SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS t
        |  FROM documents),
        |tgl AS (SELECT unnest(t[1:len(t) - 2]) AS w1, unnest(t[2:len(t) - 1]) AS w2,
        |               unnest(t[3:len(t)]) AS w3 FROM toks WHERE len(t) >= 3),
        |tg AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c123 FROM tgl GROUP BY 1, 2, 3),
        |ctx AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12,
        |               CAST(count(*) AS BIGINT) AS n3f FROM tg GROUP BY 1, 2),
        |mid AS (SELECT w2, w3, CAST(count(*) AS BIGINT) AS mnum FROM tg GROUP BY 1, 2),
        |midctx AS (SELECT w2, CAST(sum(mnum) AS BIGINT) AS mden,
        |                  CAST(count(*) AS BIGINT) AS mf FROM mid GROUP BY 1),
        |uni AS (SELECT w3, CAST(count(*) AS BIGINT) AS unum FROM mid GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS uden FROM mid)
        |SELECT w1, w2, w3, c123, c12, n3f, mnum, mden, mf, unum, uden,
        |  greatest(CAST(c123 AS DOUBLE) - 0.75, 0.0) / CAST(c12 AS DOUBLE)
        |    + ((0.75 * CAST(n3f AS DOUBLE)) / CAST(c12 AS DOUBLE))
        |      * (greatest(CAST(mnum AS DOUBLE) - 0.75, 0.0) / CAST(mden AS DOUBLE)
        |         + ((0.75 * CAST(mf AS DOUBLE)) / CAST(mden AS DOUBLE))
        |           * (CAST(unum AS DOUBLE) / CAST(uden AS DOUBLE))) AS p_kn3
        |FROM tg JOIN ctx USING (w1, w2) JOIN mid USING (w2, w3)
        |  JOIN midctx USING (w2) JOIN uni USING (w3) CROSS JOIN tot
        |WHERE c123 >= 3
        |ORDER BY w1, w2, w3""").stripMargin,

    // Deletion vectors: the effective relation after two DV deletes
    // (status F, then priority 5-LOW) with zero file rewrites.
    "q161_txlog_deletion_vectors" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders
        |WHERE o_orderstatus <> 'F' AND o_orderpriority <> '5-LOW'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // Transactional-table lifecycle: create(≡0) + append(≡1) + delete
    // (status F) + upsert(≡2 new; ≡0 replaced, price doubled — which
    // re-inserts deleted ≡0 F rows) + compact. Final relation stated
    // directly over orders; cents sums are order-independent.
    "q146_txlog_lifecycle" ->
      """WITH fin AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |    WHERE o_orderkey % 3 = 1 AND o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |    WHERE o_orderkey % 3 = 2
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 FROM orders
        |    WHERE o_orderkey % 3 = 0)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // Time travel: version 0 = keys ≡0, version 1 = ≡0 ∪ ≡1,
    // version 2 = after deleting status F.
    "q147_txlog_timetravel" ->
      """SELECT * FROM (
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key, CAST(0 AS BIGINT) AS version
        |FROM orders WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT CAST(count(*) AS BIGINT),
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT),
        |  CAST(max(o_orderkey) AS BIGINT), CAST(1 AS BIGINT)
        |FROM orders WHERE o_orderkey % 3 IN (0, 1)
        |UNION ALL
        |SELECT CAST(count(*) AS BIGINT),
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT),
        |  CAST(max(o_orderkey) AS BIGINT), CAST(2 AS BIGINT)
        |FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderstatus <> 'F'
        |) ORDER BY version""".stripMargin,

    // Stats-pruned read: one file per priority by construction, so
    // exactly 1 of 5 files serves the 1-URGENT predicate — the file
    // counts are part of the oracled row.
    "q148_txlog_prune" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(1 AS BIGINT) AS files_scanned,
        |  CAST(5 AS BIGINT) AS files_total
        |FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin)
}
