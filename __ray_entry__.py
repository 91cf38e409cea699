"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline over sf0.001 (documents
wrapped as real HTML pages → parse → boilerplate strip → markdown serialize).
``queries()``/``oracle_sql()`` expose one entry per implemented operator from
SURVEY.md §2 with DuckDB-oracle SQL twins; column names match exactly.

Ray is initialised by the driver BEFORE this module is imported: nothing here
or in ``engine`` calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from engine.queries import q_extract_roundtrip

    return q_extract_roundtrip("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from engine.queries import QUERIES

    return dict(QUERIES)


def _knn_lsh_sql() -> str:
    """knn_lsh oracle: the hyperplane matrix is data-INdependent (seeded
    numpy, dim 64 = the embeddings fixture dim), so the 8 signature bits are
    reproducible in SQL as literal dot products (double precision; the sign
    is scale-invariant, so the engine's pre-normalization is irrelevant).
    Candidates = rows within Hamming ≤ 1 of ANY query's signature — the
    union probe set, exactly what knn_lsh's multi-probe BucketFilter scans —
    then exact top-10 by cosine over the union (scores dropped: DuckDB's
    list_cosine_similarity is float32, ids+ranks are exact — the knn_cosine
    precedent)."""
    from engine.similarity import _hyperplanes

    planes = _hyperplanes(64)

    def dot_expr(p: int) -> str:
        # float() — numpy>=2 repr of np.float64 is not valid SQL
        return " + ".join(
            f"embedding[{i + 1}]*({float(planes[p][i])!r})" for i in range(64))

    bits = ",\n".join(
        f"CASE WHEN ({dot_expr(p)}) > 0 THEN 1 ELSE 0 END AS b{p}"
        for p in range(8))
    ham = " + ".join(f"abs(s.b{p} - q.b{p})" for p in range(8))
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, {bits}
  FROM embeddings
), qs AS (SELECT * FROM sigs WHERE vec_id < 5),
cand AS (
  SELECT DISTINCT s.vec_id, s.embedding
  FROM sigs s JOIN qs q ON ({ham}) <= 1
),
scored AS (
  SELECT qq.vec_id AS query_id, c.vec_id,
         list_cosine_similarity(qq.embedding, c.embedding) AS cosine
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) qq
  CROSS JOIN cand c)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored) WHERE rnk <= 10"""


def _knn_ivf_sql() -> str:
    """knn_ivf oracle: the query uses the data-INdependent spherical
    codebook (engine.similarity.fixed_codebook — seeded, dim 64), so cell
    assignment (argmax dot, ties → lowest cell, scale-invariant so the
    engine's normalization is irrelevant), 4-cell probing and exact ranking
    over the probed union are all reproducible in SQL."""
    from engine.similarity import fixed_codebook

    cents = fixed_codebook(64, 16)

    def dot_expr(j: int) -> str:
        return " + ".join(
            f"embedding[{i + 1}]*({float(cents[j][i])!r})" for i in range(64))

    branches = "\n  UNION ALL ".join(
        f"SELECT vec_id, embedding, {j} AS cell, ({dot_expr(j)}) AS d "
        f"FROM embeddings"
        for j in range(16))
    return f"""
WITH dots AS (
  {branches}
), assign AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d DESC, cell) AS rn
    FROM dots) WHERE rn = 1
), qcells AS (
  SELECT cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                                            ORDER BY d DESC, cell) AS rn
    FROM dots WHERE vec_id < 5) WHERE rn <= 4
), probe AS (SELECT DISTINCT cell FROM qcells),
cand AS (
  SELECT a.vec_id, a.embedding FROM assign a JOIN probe p ON a.cell = p.cell
), scored AS (
  SELECT qq.vec_id AS query_id, c.vec_id,
         list_cosine_similarity(qq.embedding, c.embedding) AS cosine
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) qq
  CROSS JOIN cand c)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored) WHERE rnk <= 10"""


def _pii_redact_sql() -> str:
    """pii_redact oracle: the planted email/phone are pure doc_id string
    derivations; redaction regexes come from engine.textops.PII_PATTERNS
    (RE2 on both sides — Arrow replace_substring_regex and DuckDB
    regexp_replace are both RE2 GlobalReplace), counts on the planted text,
    replacements nested in PII_PATTERNS order exactly as the engine
    applies them."""
    from engine.textops import PII_PATTERNS

    planted = (
        "text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@mail' || "
        "CAST(doc_id % 7 AS VARCHAR) || '.example.com or +1-' || "
        "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-555-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'"
    )
    counts = ",\n       ".join(
        f"CAST(length(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS)
    clean = "t"
    for _, pat, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return f"""
WITH p AS (SELECT doc_id, {planted} AS t FROM documents)
SELECT doc_id,
       {counts},
       {clean} AS text_clean
FROM p"""


def _bpe_ctes(k: int) -> str:
    """Shared CTE chain for the BPE oracles: w0 = per-word-type symbol
    strings (each symbol wrapped as '|sym|', so boundaries are '||' and a
    pair pattern '|l||r|' can only match two FULL adjacent symbols), then k
    rounds of pair-count → argmax (count DESC, pair ASC) → replace().
    SQL replace() substitutes left-to-right non-overlapping — exactly the
    BPE merge rule ('|a||a||a||a|' → '|aa||aa|')."""
    parts = [r"""WITH w0 AS (
  SELECT '|' || array_to_string(regexp_extract_all(word, '.'), '||')
             || '|' AS ws,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS word
        FROM documents)
  WHERE word NOT LIKE '%|%'
  GROUP BY 1)"""]
    for i in range(1, k + 1):
        parts.append(f""",
p{i} AS (
  SELECT syms[j] AS l, syms[j + 1] AS r, CAST(sum(cnt) AS BIGINT) AS c
  FROM (SELECT string_split(substr(ws, 2, length(ws) - 2), '||') AS syms,
               cnt
        FROM w{i - 1}) t,
       LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS j) u
  GROUP BY 1, 2),
b{i} AS (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1),
w{i} AS (SELECT replace(ws, '|' || b{i}.l || '||' || b{i}.r || '|',
                        '|' || b{i}.l || b{i}.r || '|') AS ws, cnt
         FROM w{i - 1}, b{i})""")
    return "".join(parts)


def _bpe_merges_sql(k: int) -> str:
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, l AS lhs, r AS rhs, "
        f"c AS pair_count FROM b{i}" for i in range(1, k + 1))
    return _bpe_ctes(k) + "\n" + rows


def _bpe_segments_sql(k: int) -> str:
    repl = "'|' || array_to_string(regexp_extract_all(word, '.'), '||') || '|'"
    for i in range(1, k + 1):
        repl = (f"replace({repl}, '|' || b{i}.l || '||' || b{i}.r || '|', "
                f"'|' || b{i}.l || b{i}.r || '|')")
    froms = ", ".join(f"b{i}" for i in range(1, k + 1))
    return _bpe_ctes(k) + f""",
docwords AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS word
    FROM documents)
  WHERE word NOT LIKE '%|%'),
seg AS (
  SELECT doc_id,
         len(string_split(substr({repl}, 2,
             length({repl}) - 2), '||')) AS n_syms
  FROM docwords, {froms}),
per_doc AS (
  SELECT doc_id, CAST(sum(n_syms) AS BIGINT) AS n_symbols
  FROM seg GROUP BY doc_id)
SELECT d.doc_id, COALESCE(p.n_symbols, 0) AS n_symbols
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id"""


def _profile_sql() -> str:
    """Twin of q_profile's cardinality-gated profiler: per column the n /
    n_null / exact-distinct counts PLUS the integer-exact HLL estimate
    (engine.stats.hll_estimate_int — md5 60-bit hash, m=256, rho via
    length(bin(low)), S as a BIGINT power-of-two sum, the final rational
    alpha ladder in HUGEINT), then the SAME gate decision: report the
    exact count when est <= PROFILE_CAP, else the estimate itself. No
    float anywhere, so the gate and the reported value hash-match the Ray
    side at any sf / parallelism."""
    from engine.queries import PROFILE_CAP

    cols = ["user_id", "event_type", "value_k", "event_id"]
    ctes = [r"""p AS (
  SELECT user_id, event_type,
         CASE WHEN event_id % 11 = 0 THEN NULL
              ELSE CAST(floor(value * 10) AS BIGINT) % 50 END AS value_k,
         event_id
  FROM events)"""]
    branches = []
    for c in cols:
        ctes.append(f"""c_{c} AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null,
         count(DISTINCT {c}) AS nd
  FROM p),
r_{c} AS (
  SELECT hv // 4503599627370496 AS register,
         max(52 - (CASE WHEN hv % 4503599627370496 = 0 THEN 0
                        ELSE length(bin(hv % 4503599627370496)) END) + 1)
           AS rho_max
  FROM (SELECT CAST('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 15)
               AS BIGINT) AS hv
        FROM p WHERE {c} IS NOT NULL)
  GROUP BY 1),
e_{c} AS (
  SELECT CAST(CAST(7213 AS HUGEINT) * 16777216 * 9007199254740992
              // (CAST(2570790 AS HUGEINT) *
                  (CAST(256 - count(*) AS BIGINT) * 9007199254740992
                   + COALESCE(CAST(sum(CAST(1 AS BIGINT)
                                       << (53 - rho_max)) AS BIGINT), 0)))
         AS BIGINT) AS est
  FROM r_{c})""")
        branches.append(f"""SELECT '{c}' AS col, c.n, c.n_null,
       CASE WHEN e.est <= {PROFILE_CAP} THEN c.nd ELSE e.est END
         AS n_distinct,
       e.est <= {PROFILE_CAP} AS distinct_exact
FROM c_{c} c, e_{c} e""")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(branches))


def oracle_sql() -> dict[str, str]:
    from engine.textstats import _ALL_STOP, _STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in sorted(_ALL_STOP))
    langs = sorted(_STOPWORDS)
    lang_filters = ",\n         ".join(
        "CAST(count(*) FILTER (WHERE tok IN ({})) AS BIGINT) AS hits_{}"
        .format(", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lang])),
                lang)
        for lang in langs)
    hit_cols = ", ".join(f"coalesce(h.hits_{lang}, 0)" for lang in langs)
    lang_hits_sql = rf"""
WITH f AS (
  SELECT doc_id, lower(tok) AS tok
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '[\W\d_]+')) AS tok
        FROM documents)
  WHERE tok <> ''),
h AS (
  SELECT doc_id,
         {lang_filters},
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM f GROUP BY doc_id)
SELECT d.doc_id,
       {", ".join(f"coalesce(h.hits_{lang}, 0) AS hits_{lang}"
                  for lang in langs)},
       coalesce(h.n_tokens, 0) AS n_tokens,
       CAST(list_sort([{hit_cols}])[{len(langs)}] -
            list_sort([{hit_cols}])[{len(langs) - 1}] AS BIGINT) AS margin
FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id"""
    chunk = r"""
WITH exploded AS (
    SELECT doc_id,
           string_split(replace(text, ' ', chr(10)), chr(10)) AS lines
    FROM documents
), numbered AS (
    SELECT doc_id, lines[i] AS line, i
    FROM exploded, LATERAL (SELECT unnest(generate_series(1, len(lines))) AS i)
)
SELECT doc_id,
       CAST(floor((i - 1) / 20) AS INTEGER) AS chunk_index,
       string_agg(line, chr(10) ORDER BY i) AS content,
       CAST(length(string_agg(line, chr(10) ORDER BY i)) AS BIGINT) AS char_count
FROM numbered
GROUP BY doc_id, CAST(floor((i - 1) / 20) AS INTEGER)
"""
    synth_md = (
        "'# Title ' || source || chr(10) || '**' || lang || '** *' || source || "
        "'* [link](http://x/' || CAST(doc_id AS VARCHAR) || ') `' || lang || "
        "'`' || chr(10) || text"
    )
    plain = (
        r"regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        r"regexp_replace(" + synth_md + r", '#{1,6}\s+', '', 'g'),"
        r" '\*\*(.*?)\*\*', '\1', 'g'),"
        r" '\*(.*?)\*', '\1', 'g'),"
        r" '\[([^\]]+)\]\(([^\)]+)\)', '\1', 'g'),"
        r" '`([^`]+)`', '\1', 'g')"
    )
    gdocs = (
        "replace(replace(replace(replace(replace(" + synth_md + ", "
        "'# ', ''), '## ', ''), '### ', ''), '**', ''), '*', '')"
    )
    sanitize_expr = (
        r"trim(regexp_replace(regexp_replace(regexp_replace("
        r"source || ' #' || CAST(doc_id AS VARCHAR) || '.txt',"
        r" '\.[^.]*$', ''),"
        r" '[^\w\s-]', '', 'g'),"
        r" '[-\s]+', '-', 'g'), '-')"
    )
    # the six r1 textops oracles folded into one multi-column twin
    # (VERDICT r4 #2); the per-kernel expressions are byte-identical to the
    # individual oracles that were driver-green in CORRECTNESS_r0{1,2,3}
    textops_composite = f"""
WITH exploded AS (
    SELECT doc_id,
           string_split(replace(text, ' ', chr(10)), chr(10)) AS lines
    FROM documents
), numbered AS (
    SELECT doc_id, lines[i] AS line, i
    FROM exploded, LATERAL (SELECT unnest(generate_series(1, len(lines))) AS i)
), chunks AS (
    SELECT doc_id,
           string_agg(line, chr(10) ORDER BY i) AS content
    FROM numbered
    GROUP BY doc_id, CAST(floor((i - 1) / 20) AS INTEGER)
), per_doc AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(length(content)) AS BIGINT) AS chunk_chars
    FROM chunks GROUP BY doc_id
), scalars AS (
    SELECT doc_id,
           {sanitize_expr} AS safe_name,
           {plain} AS plain_text,
           {gdocs} AS gdocs_text,
           CASE WHEN length(text) > 200 THEN substr(text, 1, 200) || '...'
                ELSE text END AS preview,
           CAST(greatest(1, (n_chars * 4096) // 1048576) AS BIGINT)
               AS est_minutes
    FROM documents
)
SELECT s.*, p.n_chunks, p.chunk_chars
FROM scalars s JOIN per_doc p USING (doc_id)"""
    return {
        "textops_composite": textops_composite,
        "status_counts": "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
        "value_rollup": """
SELECT round(sum(value), 6) AS sum_value,
       round(avg(value), 6) AS mean_value,
       count(*) AS n
FROM events""",
        "user_value_stats": """
SELECT user_id,
       round(sum(value), 6) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value,
       count(*) AS n
FROM events GROUP BY user_id""",
        "recent_events": """
SELECT event_id, ts, user_id, value
FROM events WHERE event_type = 'click'
ORDER BY ts DESC, event_id DESC LIMIT 50""",
        "top_parts": """
SELECT p_partkey, p_name, p_retailprice
FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 20""",
        "exact_dedup": """
SELECT md5(text) AS content_hash,
       min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY 1""",
        "orders_join": """
SELECT c_mktsegment, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment""",
        "large_join": """
SELECT o_orderpriority, count(*) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority""",
        "lineitem_pricing": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "token_count": r"""
SELECT doc_id, CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
FROM documents""",
        "fingerprint": "SELECT doc_id, md5(text) AS fingerprint FROM documents",
        "json_props": r"""
SELECT user_id,
       CAST(sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY user_id""",
        "extract_roundtrip": r"""
SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS markdown_text
FROM documents""",
        "pdf_roundtrip": """
SELECT doc_id, text AS pdf_text, 'ok' AS status FROM documents""",
        "docx_roundtrip": r"""
SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS docx_text
FROM documents""",
        # knn_cosine: scores dropped on purpose — DuckDB's
        # list_cosine_similarity computes in float32 (max |Δ| ~1e-7 vs the
        # engine's float64); ids+ranks are exact (verified margins ~3e-4).
        "knn_cosine": """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.embedding, e.embedding) AS cosine
  FROM q CROSS JOIN embeddings e)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored) WHERE rnk <= 10""",
        "chunk_page": f"SELECT * FROM ({chunk}) WHERE chunk_index = 1",
        "event_dates": """
SELECT event_id, strftime(ts, '%Y-%m-%d') AS day,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST((epoch_us(ts) - 1704067200000000) // 1000000 AS BIGINT) AS elapsed_s
FROM events""",
        "tumbling_window": """
SELECT event_type,
       CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
       count(*) AS n,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2""",
        "first_per_user": """
SELECT user_id, event_id, ts FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events) WHERE rn = 1""",
        # embedding_near_dup: the query plants PLANT_N exact copies at
        # vec_id + 1e6 over a base table with no natural pairs >= 0.95, so
        # the full output is exactly the planted pairs at cosine 1.0.
        "embedding_near_dup": """
SELECT CAST(vec_id AS BIGINT) AS id_a,
       CAST(vec_id + 1000000 AS BIGINT) AS id_b,
       1.0 AS cosine
FROM embeddings WHERE vec_id < 20""",
        "url_buckets": """
SELECT CAST(CAST('0x' || substr(md5('https://docs.example/' ||
            CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS BIGINT) AS bucket,
       count(*) AS n_docs
FROM documents GROUP BY 1""",
        # Planted-dup corpora (engine/queries.py _planted_docs): texts are
        # built deterministically from doc_id alone, so the near-dup truth —
        # groups of 3 consecutive ids — is SQL-derivable even though the
        # MinHash/SimHash/Jaccard pipelines themselves are not.
        "minhash_clusters": """
SELECT doc_id, (doc_id // 3) * 3 AS cluster_id FROM documents""",
        "simhash": """
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
FROM documents a JOIN documents b
  ON a.doc_id // 3 = b.doc_id // 3 AND a.doc_id < b.doc_id""",
        "ngram_dedup_pairs": """
SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0.975 AS jaccard
FROM documents a JOIN documents b
  ON a.doc_id // 3 = b.doc_id // 3 AND a.doc_id < b.doc_id""",
        "lang_id": """
SELECT doc_id,
       CASE doc_id % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'es' WHEN 2 THEN 'de'
            WHEN 3 THEN 'fr' ELSE 'zh' END AS lang_pred
FROM documents""",
        "quality": rf"""
WITH f AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         CAST(length(list_distinct(regexp_extract_all(text, '\S+')))
              AS BIGINT) AS n_uniq,
         CAST(length(list_filter(regexp_extract_all(lower(text), '\S+'),
              x -> list_contains([{stop_list}], x))) AS BIGINT) AS n_stop,
         length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace
  FROM documents)
SELECT doc_id, n_tokens, n_uniq, n_stop,
       round(
         CASE WHEN n_tokens < 5 THEN 0.2
              WHEN n_tokens < 20 THEN 0.7 ELSE 1.0 END
         * CASE WHEN coalesce(CAST(n_uniq AS DOUBLE) / nullif(n_tokens, 0),
                              0.0) < 0.3 THEN 0.5 ELSE 1.0 END
         * CASE WHEN n_stop = 0 THEN 0.7 ELSE 1.0 END
         * CASE WHEN mean_tok > 15 OR (mean_tok > 0 AND mean_tok < 2)
                THEN 0.5 ELSE 1.0 END,
         4) AS quality
FROM (SELECT *,
             coalesce(CAST(n_nonspace AS DOUBLE) / nullif(n_tokens, 0),
                      0.0) AS mean_tok
      FROM f)""",
        "knn_lsh": _knn_lsh_sql(),
        "knn_ivf": _knn_ivf_sql(),
        "stable_split": """
SELECT doc_id,
       CASE WHEN pct < 80 THEN 'train'
            WHEN pct < 90 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id,
             CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                 1, 8) AS BIGINT) % 100 AS pct
      FROM documents)""",
        "asof_join": """
WITH v AS (
  SELECT user_id, ts AS vts, count(*) AS n_view,
         max(event_id) AS view_event
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       coalesce(v.vts, TIMESTAMP '1970-01-01') AS vts,
       CAST(coalesce(v.view_event, -1) AS BIGINT) AS view_event
FROM events e ASOF LEFT JOIN v
  ON e.user_id = v.user_id AND e.ts >= v.vts
WHERE e.event_type = 'click'""",
        "session_windows": """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 1 HOUR
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM numbered GROUP BY user_id, sid""",
        "customers_without_orders": """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')""",
        "top_parts_per_brand": """
SELECT p_brand, p_partkey, round(p_retailprice, 2) AS p_retailprice
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) WHERE rn <= 3""",
        "token_df": """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
  FROM documents
)
SELECT token, count(DISTINCT doc_id) AS df
FROM toks WHERE token <> ''
GROUP BY token ORDER BY df DESC, token LIMIT 50""",
        "interval_attribution": """
WITH clicks AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
), windows AS (
  SELECT user_id, ts AS wstart,
         ts + INTERVAL 30 MINUTE AS wend,
         max(event_id) AS view_event
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id,
       coalesce(w.wstart, TIMESTAMP '1970-01-01') AS wstart,
       coalesce(w.view_event, -1) AS view_event
FROM clicks c LEFT JOIN LATERAL (
  SELECT wstart, view_event FROM windows w
  WHERE w.user_id = c.user_id AND w.wstart <= c.ts AND c.ts < w.wend
  ORDER BY w.wstart DESC LIMIT 1
) w ON TRUE""",
        # quantile_disc only takes constant parameters → list form + unnest
        "quantity_percentiles": """
SELECT CAST(u.q AS DOUBLE) AS q, CAST(v[u.i] AS BIGINT) AS value
FROM (SELECT quantile_disc(l_quantity, [0.1, 0.25, 0.5, 0.75, 0.9]) AS v
      FROM lineitem),
     (SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS q,
             unnest(generate_series(1, 5)) AS i) u""",
        "normalize_text": """
SELECT doc_id,
       regexp_replace(nfc_normalize(text),
                      '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '',
                      'g') AS text_norm,
       length(regexp_replace(nfc_normalize(text),
                             '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '',
                             'g')) AS n_chars
FROM documents""",
        "doc_sample": """
SELECT doc_id FROM documents
WHERE CAST('0x' || substr(md5('sample:' || doc_id), 1, 8) AS BIGINT)
      % 100 < 10""",
        "user_event_sequences": """
SELECT user_id, count(*) AS n_events,
       string_agg(CAST(event_id AS VARCHAR), ','
                  ORDER BY ts, event_id) AS seq
FROM events GROUP BY user_id""",
        # planted groups are 3 consecutive ids; canonical = min member
        "dedup_canonical": """
SELECT doc_id FROM documents WHERE doc_id % 3 = 0""",
        "value_histogram": """
SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin, count(*) AS n
FROM events GROUP BY bin""",
        "distinct_users": """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type""",
        # sum(BIGINT) is HUGEINT in DuckDB (fetchdf would floatify) — CAST
        "token_freq_score": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents
), tf AS (
  SELECT token, count(*) AS c FROM toks GROUP BY token
), scores AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(tf.c) AS BIGINT) AS freq_score
  FROM toks t JOIN tf USING (token) GROUP BY t.doc_id
)
SELECT d.doc_id,
       coalesce(s.n_tokens, 0) AS n_tokens,
       coalesce(s.freq_score, 0) AS freq_score
FROM documents d LEFT JOIN scores s USING (doc_id)""",
        # utf8_slice_codeunits is codepoint-based like substr; the corpus
        # is ASCII so both equal the byte slice
        "decontaminate": """
WITH bench AS (
  SELECT substr(text, 11, 30) AS snip FROM documents
  WHERE doc_id % 50 = 0 AND length(text) >= 40
)
SELECT d.doc_id,
       CAST(EXISTS (SELECT 1 FROM bench b
                    WHERE contains(d.text, b.snip)) AS BIGINT)
         AS contaminated
FROM documents d""",
        "bloom_semi_join": """
SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS l_quantity
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')""",
        # toks-mode counts: ties don't matter (every mode shares the max
        # count); n<2 tokens ⇒ empty bigram list ⇒ mode NULL ⇒ filter 0
        "doc_repetition": """
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents
), b AS (
  SELECT doc_id, ts,
         list_transform(generate_series(1, length(ts) - 1),
                        i -> ts[i] || ' ' || ts[i + 1]) AS bs
  FROM d
)
SELECT doc_id,
       CAST(length(ts) AS BIGINT) AS n_tokens,
       CAST(length(list_distinct(ts)) AS BIGINT) AS n_uniq,
       CAST(length(list_filter(ts, x -> x = list_aggregate(ts, 'mode')))
            AS BIGINT) AS top_token_count,
       CAST(coalesce(length(list_filter(bs,
                x -> x = list_aggregate(bs, 'mode'))), 0)
            AS BIGINT) AS top_bigram_count
FROM b""",
        "domain_counts": """
SELECT regexp_extract('https://site' || CAST(doc_id % 97 AS VARCHAR)
                      || '.example.com/page/' || CAST(doc_id AS VARCHAR),
                      '^https?://([^/]+)', 1) AS domain,
       count(*) AS n
FROM documents GROUP BY domain""",
        "event_type_pivot": """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events GROUP BY user_id""",
        # ROLLUP emits NULL group keys; the engine uses the 'ALL' sentinel
        # instead (None-vs-NaN stringification is ambiguous in the gate)
        "orders_rollup": """
SELECT coalesce(o_orderstatus, 'ALL')   AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*) AS n,
       CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT) AS sum_cents
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
        "rolling_spend": """
SELECT user_id, event_id,
       CAST(floor(value * 1000) AS BIGINT) AS value_milli,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS roll3_sum
FROM events""",
        # media_features: the media table is DERIVED from documents
        # (payload = UTF-8 text bytes, empty every 17th id), so id/kind/
        # sha256/status are SQL facts even with the decode kernels stubbed;
        # the feature vectors themselves stay pinned by pytest only.
        "pii_redact": _pii_redact_sql(),
        # value is a picked data element (not a sum) quantized to integer
        # milli on BOTH sides — no float rounding convention needed
        "value_percentiles_by_type": """
WITH m AS (SELECT event_type,
                  CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
g AS (SELECT event_type, quantile_disc(v, [0.25, 0.5, 0.75]) AS vs
      FROM m GROUP BY event_type)
SELECT event_type, CAST(u.q AS DOUBLE) AS q, CAST(vs[u.i] AS BIGINT) AS value
FROM g, (SELECT unnest([0.25, 0.5, 0.75]) AS q,
                unnest(generate_series(1, 3)) AS i) u""",
        "latest_event_per_user": """
SELECT user_id, ts, event_id,
       CAST(floor(value * 1000) AS BIGINT) AS value_milli
FROM (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1""",
        "top_bigrams": """
WITH d AS (SELECT regexp_extract_all(text, '\\S+') AS ts FROM documents),
b AS (SELECT unnest(list_transform(generate_series(1, length(ts) - 1),
                                   i -> ts[i] || ' ' || ts[i + 1]))
               AS bigram FROM d)
SELECT bigram, count(*) AS n
FROM b GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50""",
        "event_gaps": """
SELECT user_id, ts, event_id,
       coalesce(epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id),
                -1) AS gap_us
FROM events""",
        "region_revenue": """
SELECT r_name, count(*) AS n_orders,
       CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT) AS sum_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name""",
        "stratified_sample": """
SELECT event_id, user_id, event_type FROM events
WHERE CAST('0x' || substr(md5('strat:' || event_type || ':' ||
             CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
      < CASE event_type WHEN 'click' THEN 50
                        WHEN 'view' THEN 10 ELSE 25 END""",
        "media_features": """
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INTEGER)
            WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       sha256(CASE WHEN doc_id % 17 = 0 THEN '' ELSE text END) AS sha256,
       CASE WHEN doc_id % 17 = 0 OR text = '' THEN 'failed'
            ELSE 'ok' END AS status
FROM documents""",
        "hopping_window": """
SELECT event_type,
       CAST(floor(epoch(ts) / 900) * 900 - u.i * 900 AS BIGINT)
         AS window_start_s,
       count(*) AS n,
       round(sum(value), 6) AS sum_value
FROM events, (SELECT unnest(generate_series(0, 3)) AS i) u
GROUP BY 1, 2""",
        # length(bin(x)) is the exact integer bit length — the Ray side's
        # np.frexp exponent; no float log convention needed
        "tfidf_terms": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         tf.tf * ((SELECT length(bin(count(*))) FROM documents)
                  - length(bin(df.df)) + 1) AS score
  FROM tf JOIN df USING (token)
)
SELECT doc_id, token, tf, df, score FROM (
  SELECT scored.*, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, token) AS rn
  FROM scored) WHERE rn <= 3""",
        "value_outliers": """
WITH m AS (SELECT event_id, event_type,
                  CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
g AS (SELECT event_type, quantile_disc(v, [0.25, 0.75]) AS vs
      FROM m GROUP BY 1)
SELECT m.event_id, m.event_type, m.v
FROM m JOIN g USING (event_type)
WHERE m.v > vs[2] + (3 * (vs[2] - vs[1])) // 2""",
        "event_ntile": """
SELECT event_id, user_id,
       ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ntile
FROM events""",
        "inverted_index": """
WITH toks AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
    FROM documents)
)
SELECT token, count(*) AS df,
       array_to_string((list(doc_id ORDER BY doc_id))[1:10], ',') AS posting
FROM toks GROUP BY token""",
        "user_drift": """
WITH m AS (SELECT event_id, user_id,
                  CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
a AS (SELECT user_id, count(*) AS n_a, sum(v) AS sum_a
      FROM m WHERE event_id % 2 = 0 GROUP BY 1),
b AS (SELECT user_id, count(*) AS n_b, sum(v) AS sum_b
      FROM m WHERE event_id % 2 = 1 GROUP BY 1)
SELECT user_id,
       coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
       CAST(coalesce(sum_a, 0) AS BIGINT) AS sum_a,
       CAST(coalesce(sum_b, 0) AS BIGINT) AS sum_b,
       coalesce(n_b, 0) - coalesce(n_a, 0) AS n_delta,
       CAST(coalesce(sum_b, 0) - coalesce(sum_a, 0) AS BIGINT) AS sum_delta
FROM a FULL JOIN b USING (user_id)""",
        "skew_join": """
WITH f AS (SELECT l_orderkey, l_linenumber,
                  CASE WHEN l_orderkey % 3 = 0 THEN 1
                       ELSE CAST(l_suppkey AS BIGINT) END AS k,
                  CAST(l_quantity AS BIGINT) AS l_quantity
           FROM lineitem)
SELECT f.l_orderkey, f.l_linenumber, f.k, f.l_quantity, s.s_name
FROM f JOIN supplier s ON s.s_suppkey = f.k""",
        "user_top_event": """
SELECT user_id, event_type, n FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY 1, 2) WHERE rn = 1""",
        "funnel": """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY e.user_id)
SELECT u.user_id,
       coalesce(v.t1, TIMESTAMP '1970-01-01') AS t_view,
       coalesce(c.t2, TIMESTAMP '1970-01-01') AS t_click,
       coalesce(p.t3, TIMESTAMP '1970-01-01') AS t_purchase,
       CAST(CASE WHEN p.t3 IS NOT NULL THEN 3
                 WHEN c.t2 IS NOT NULL THEN 2
                 WHEN v.t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS n_steps
FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
       LEFT JOIN p USING (user_id)""",
        "hll_events": """
WITH h AS (SELECT CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
                       AS BIGINT) AS hv FROM events),
r AS (SELECT hv // 4503599627370496 AS register,
             hv % 4503599627370496 AS low FROM h)
SELECT register,
       max(52 - (CASE WHEN low = 0 THEN 0 ELSE length(bin(low)) END) + 1)
         AS rho_max
FROM r GROUP BY register""",
        "hll_by_type": """
WITH h AS (SELECT event_type,
                  CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) AS hv FROM events),
r AS (SELECT event_type, hv // 4503599627370496 AS register,
             hv % 4503599627370496 AS low FROM h)
SELECT event_type, register,
       max(52 - (CASE WHEN low = 0 THEN 0 ELSE length(bin(low)) END) + 1)
         AS rho_max
FROM r GROUP BY event_type, register""",
        "running_total": """
SELECT user_id, event_id,
       CAST(sum(CAST(floor(value * 1000.0) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_sum
FROM events""",
        "url_dedup": """
WITH raw AS (
  SELECT doc_id,
         'https://ex' || CAST((doc_id // 2) % 7 AS VARCHAR) ||
         '.com/p/' || CAST(doc_id // 2 AS VARCHAR) AS url
  FROM documents)
SELECT url, min(doc_id) AS doc_id, count(*) AS n_copies
FROM raw GROUP BY url""",
        "audience_overlap": """
WITH d AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_shared
FROM d a JOIN d b ON a.user_id = b.user_id
                 AND a.event_type < b.event_type
GROUP BY 1, 2""",
        "components": """
WITH RECURSIVE e0 AS (
  SELECT DISTINCT user_id AS src, user_id + 1 AS dst
  FROM events WHERE user_id % 10 != 9),
sym AS (SELECT src AS u, dst AS v FROM e0
        UNION SELECT dst, src FROM e0),
nodes AS (SELECT DISTINCT u AS n FROM sym),
reach(node, r) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT sym.v, reach.r FROM reach JOIN sym ON sym.u = reach.node)
SELECT node, min(r) AS component FROM reach GROUP BY node""",
        "global_rank": """
SELECT event_id, value,
       CAST(rank() OVER (ORDER BY value) AS BIGINT) AS rnk
FROM events""",
        "dense_rank": """
SELECT event_id, value,
       CAST(dense_rank() OVER (ORDER BY value) AS BIGINT) AS rnk
FROM events""",
        "bloom_users": """
WITH j AS (SELECT unnest(generate_series(0, 2)) AS r)
SELECT DISTINCT
       CAST('0x' || substr(md5(CAST(j.r AS VARCHAR) || ':' ||
                               CAST(e.user_id AS VARCHAR)), 1, 15)
            AS BIGINT) % 4096 AS bit
FROM events e CROSS JOIN j""",
        "fuzzy_decontam": """
SELECT d.doc_id, b.doc_id AS bench_id
FROM documents d JOIN documents b ON d.doc_id // 3 = b.doc_id // 3
WHERE b.doc_id % 25 = 0""",
        "strip_spans": """
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN 'extra ' || CAST(doc_id AS VARCHAR) || '. '
              ELSE '' END ||
         'b zero. b one. b two. uniq ' || CAST(doc_id AS VARCHAR) ||
         '. pair' || CAST(doc_id // 2 AS VARCHAR) || ' a. pair' ||
         CAST(doc_id // 2 AS VARCHAR) || ' b' AS text
  FROM documents),
sents AS (
  SELECT doc_id, i AS pos, parts[i] AS sent
  FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM raw),
       LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i)),
spans AS (
  SELECT doc_id, pos, sent || '. ' || l1 || '. ' || l2 AS span
  FROM (SELECT doc_id, pos, sent,
               lead(sent, 1) OVER w AS l1, lead(sent, 2) OVER w AS l2
        FROM sents WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
  WHERE l2 IS NOT NULL),
hot AS (SELECT span FROM spans GROUP BY span HAVING count(*) > 1),
dropped AS (
  SELECT DISTINCT s.doc_id, s.pos + o AS dpos
  FROM spans s JOIN hot USING (span),
       LATERAL (SELECT unnest(generate_series(0, 2)) AS o)),
kept AS (
  SELECT * FROM sents t WHERE NOT EXISTS (
    SELECT 1 FROM dropped x
    WHERE x.doc_id = t.doc_id AND x.dpos = t.pos))
SELECT doc_id, string_agg(sent, '. ' ORDER BY pos) AS text
FROM kept GROUP BY doc_id""",
        "transitions": """
WITH x AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events)
SELECT prev, event_type AS curr, count(*) AS n
FROM x WHERE prev IS NOT NULL GROUP BY 1, 2""",
        "heavy_hitters": """
WITH k AS (SELECT CASE WHEN event_id % 10 < 5 THEN event_id % 7
                       ELSE event_id END AS key FROM events)
SELECT key, count(*) AS n FROM k GROUP BY key
HAVING count(*) >=
       CAST(ceil(0.01 * (SELECT count(*) FROM events)) AS BIGINT)""",
        "kmeans": """
WITH dims AS (SELECT unnest(generate_series(0, 7)) AS dim),
v AS (SELECT d.doc_id, dims.dim,
             CASE WHEN dims.dim = d.doc_id % 4 THEN 12
                  ELSE ((d.doc_id // (dims.dim + 1)) % 3) - 1 END AS val
      FROM documents d CROSS JOIN dims)
SELECT doc_id % 4 AS cluster, CAST(dim AS BIGINT) AS dim,
       CAST(sum(val) AS BIGINT) AS centroid_sum, count(*) AS n
FROM v GROUP BY 1, 2""",
        "hll_merged": """
WITH h AS (SELECT event_type,
                  CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) AS hv FROM events),
r AS (SELECT event_type, hv // 4503599627370496 AS register,
             hv % 4503599627370496 AS low FROM h),
pk AS (SELECT event_type, register,
              max(52 - (CASE WHEN low = 0 THEN 0
                             ELSE length(bin(low)) END) + 1) AS rho_max
       FROM r GROUP BY 1, 2)
SELECT * FROM pk
UNION ALL
SELECT '__all__' AS event_type, register, max(rho_max) AS rho_max
FROM pk GROUP BY register""",
        "cms_users": """
WITH j AS (SELECT unnest(generate_series(0, 3)) AS r),
h AS (SELECT j.r,
             CAST('0x' || substr(md5(CAST(j.r AS VARCHAR) || ':' ||
                                     CAST(e.user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 1024 AS cell
      FROM events e CROSS JOIN j)
SELECT r, cell, count(*) AS n FROM h GROUP BY 1, 2""",
        "vocab": r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS token FROM documents),
c AS (SELECT token, count(*) AS n FROM toks GROUP BY token)
SELECT token, n,
       CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
         AS vocab_id
FROM c""",
        "corpus_prep": r"""
WITH tc AS (
  SELECT doc_id, text,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT)
           AS n_tokens
  FROM documents),
q AS (SELECT * FROM tc WHERE n_tokens >= 5),
k AS (SELECT md5(text) AS h, min(doc_id) AS keep FROM q GROUP BY 1),
d AS (SELECT q.* FROM q JOIN k ON q.doc_id = k.keep),
s AS (SELECT d.*,
             CASE WHEN pct < 80 THEN 'train'
                  WHEN pct < 90 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT d.*,
                   CAST('0x' || substr(md5('split:' ||
                                           CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 100 AS pct
            FROM d) d)
SELECT split, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM s GROUP BY split""",
        "cap_per_source": """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rn
  FROM documents) WHERE rn <= 10""",
        "normalize_urls": r"""
WITH raw AS (
  SELECT doc_id,
         CASE doc_id % 3
           WHEN 0 THEN 'HTTPS://WWW.Ex' || CAST(doc_id % 5 AS VARCHAR) ||
                       '.COM:443/a/' || CAST(doc_id AS VARCHAR) ||
                       '?utm_source=x&id=' || CAST(doc_id AS VARCHAR) ||
                       '#top'
           WHEN 1 THEN 'http://ex' || CAST(doc_id % 5 AS VARCHAR) ||
                       '.org:80/b/' || CAST(doc_id AS VARCHAR) ||
                       '?utm_a=1&utm_b=2&utm_c=3&q=' ||
                       CAST(doc_id AS VARCHAR)
           ELSE 'https://Sub.Ex' || CAST(doc_id % 5 AS VARCHAR) ||
                '.net/c/' || CAST(doc_id AS VARCHAR)
         END AS u
  FROM documents),
s1 AS (SELECT doc_id, regexp_replace(u, '#.*$', '', 'g') AS u FROM raw),
s2 AS (SELECT doc_id, regexp_replace(u, '([?&])utm_[^&]*&', '\1', 'g') AS u
       FROM s1),
s3 AS (SELECT doc_id, regexp_replace(u, '([?&])utm_[^&]*&', '\1', 'g') AS u
       FROM s2),
s4 AS (SELECT doc_id, regexp_replace(u, '[?&]utm_[^&]*$', '', 'g') AS u
       FROM s3),
s5 AS (SELECT doc_id, regexp_replace(u, '\?$', '', 'g') AS u FROM s4),
s6 AS (SELECT doc_id,
              regexp_replace(u, '^((?i:https?)://[^/?#:]*):(?:80|443)(/|\?|$)',
                             '\1\2', 'g') AS u FROM s5)
SELECT doc_id,
       lower(coalesce(regexp_extract(u, '^((?i:https?)://[^/?#]*)', 1),
                      '')) ||
       regexp_replace(u, '^(?i:https?)://[^/?#]*', '') AS url
FROM s6""",
        "window_dedup": """
WITH raw AS (
  SELECT doc_id,
         'c0 c1 c2 c3 u' || CAST(doc_id AS VARCHAR) ||
         ' c0 c1 c2 c3 z' || CAST(doc_id % 4 AS VARCHAR) AS text
  FROM documents),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM raw),
win AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+2], ' ') AS w
  FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)),
f AS (SELECT w FROM win GROUP BY w HAVING count(*) >= 2),
dup AS (SELECT doc_id, pos FROM win WHERE w IN (SELECT w FROM f)),
cov AS (
  SELECT doc_id, count(DISTINCT pos) AS n_dup_windows,
         count(DISTINCT tp) AS n_covered_tokens
  FROM (SELECT doc_id, pos, unnest(generate_series(pos, pos + 2)) AS tp
        FROM dup)
  GROUP BY doc_id),
base AS (SELECT doc_id, CAST(len(t) - 2 AS BIGINT) AS n_windows FROM toks)
SELECT b.doc_id, b.n_windows,
       CAST(coalesce(c.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(c.n_covered_tokens, 0) AS BIGINT) AS n_covered_tokens
FROM base b LEFT JOIN cov c USING (doc_id)""",
        "jpeg420": """
WITH p AS (
  SELECT doc_id AS i, 1 + doc_id % 2 AS wm, 1 + doc_id % 3 AS hm
  FROM documents),
cells AS (
  SELECT i, wm, hm, xs.cx, ys.cy
  FROM p,
       LATERAL (SELECT unnest(generate_series(0, 2 * wm - 1)) AS cx) xs,
       LATERAL (SELECT unnest(generate_series(0, 2 * hm - 1)) AS cy) ys),
vals AS (
  SELECT i, wm, hm,
    CAST((5 * i + 11 * cx + 17 * cy) % 256 AS DOUBLE) AS yv,
    CAST((7 * i + 13 * (cx // 2)) % 256 AS DOUBLE) AS cb,
    CAST((3 * i + 19 * (cy // 2)) % 256 AS DOUBLE) AS cr
  FROM cells),
px AS (
  SELECT i, wm, hm,
    LEAST(GREATEST(floor(yv + 1.402 * (cr - 128) + 0.5), 0), 255) AS r,
    LEAST(GREATEST(floor(yv - 0.344136 * (cb - 128)
                         - 0.714136 * (cr - 128) + 0.5), 0), 255) AS g,
    LEAST(GREATEST(floor(yv + 1.772 * (cb - 128) + 0.5), 0), 255) AS b
  FROM vals)
SELECT i AS media_id,
       CAST(16 * MIN(wm) AS BIGINT) AS width,
       CAST(16 * MIN(hm) AS BIGINT) AS height,
       CAST(64 * SUM(r) AS BIGINT) AS sum_r,
       CAST(64 * SUM(g) AS BIGINT) AS sum_g,
       CAST(64 * SUM(b) AS BIGINT) AS sum_b
FROM px GROUP BY i""",
        "bm25_search": """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\\S+') AS t
  FROM documents),
dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
p AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
             GREATEST(1, CAST((SELECT SUM(dl) FROM dl) AS BIGINT)
                          // (SELECT count(*) FROM documents)) AS avgdl),
flat AS (SELECT doc_id, unnest(t) AS token FROM toks),
qtf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM flat WHERE token IN ('hash', 'merge', 'window')
  GROUP BY doc_id, token),
df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM qtf
       GROUP BY token),
sc AS (
  SELECT q.doc_id,
         SUM(((length(bin(p.n_docs)) - length(bin(df.df)) + 1)
              * 22 * q.tf * p.avgdl * 4096)
             // (10 * q.tf * p.avgdl + 3 * p.avgdl + 9 * d.dl)) AS score
  FROM qtf q JOIN df USING (token) JOIN dl d USING (doc_id), p
  GROUP BY q.doc_id)
SELECT doc_id, CAST(score AS BIGINT) AS score
FROM sc ORDER BY score DESC, doc_id LIMIT 10""",
        "cluster_rep": """
WITH c AS (
  SELECT doc_id,
         CAST(min(doc_id) OVER (PARTITION BY doc_id // 10) AS BIGINT)
           AS cluster,
         CAST(length(coalesce(text, '')) AS BIGINT) AS score
  FROM documents)
SELECT cluster, doc_id, score
FROM c
QUALIFY row_number()
        OVER (PARTITION BY cluster ORDER BY score DESC, doc_id) = 1""",
        "jpeg_progressive": """
WITH p AS (
  SELECT doc_id AS i, 1 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb
  FROM documents),
cells AS (
  SELECT i, wb, hb, xs.bx, ys.by
  FROM p,
       LATERAL (SELECT unnest(generate_series(0, wb - 1)) AS bx) xs,
       LATERAL (SELECT unnest(generate_series(0, hb - 1)) AS by) ys),
vals AS (
  SELECT i, wb, hb,
    CAST((5 * i + 11 * bx + 17 * by) % 256 AS DOUBLE) AS yv,
    CAST((7 * i + 13 * bx) % 256 AS DOUBLE) AS cb,
    CAST((3 * i + 19 * by) % 256 AS DOUBLE) AS cr
  FROM cells),
px AS (
  SELECT i, wb, hb,
    CASE WHEN i % 2 = 0 THEN yv ELSE
      LEAST(GREATEST(floor(yv + 1.402 * (cr - 128) + 0.5), 0), 255)
    END AS r,
    CASE WHEN i % 2 = 0 THEN yv ELSE
      LEAST(GREATEST(floor(yv - 0.344136 * (cb - 128)
                           - 0.714136 * (cr - 128) + 0.5), 0), 255)
    END AS g,
    CASE WHEN i % 2 = 0 THEN yv ELSE
      LEAST(GREATEST(floor(yv + 1.772 * (cb - 128) + 0.5), 0), 255)
    END AS b
  FROM vals)
SELECT i AS media_id,
       CAST(8 * MIN(wb) AS BIGINT) AS width,
       CAST(8 * MIN(hb) AS BIGINT) AS height,
       CAST(64 * SUM(r) AS BIGINT) AS sum_r,
       CAST(64 * SUM(g) AS BIGINT) AS sum_g,
       CAST(64 * SUM(b) AS BIGINT) AS sum_b
FROM px GROUP BY i""",
        "jpeg_decode": """
WITH p AS (
  SELECT doc_id AS i, 1 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb
  FROM documents),
cells AS (
  SELECT i, wb, hb, xs.bx, ys.by
  FROM p,
       LATERAL (SELECT unnest(generate_series(0, wb - 1)) AS bx) xs,
       LATERAL (SELECT unnest(generate_series(0, hb - 1)) AS by) ys),
vals AS (
  SELECT i, wb, hb,
    CAST((5 * i + 11 * bx + 17 * by) % 256 AS DOUBLE) AS yv,
    CAST((7 * i + 13 * bx) % 256 AS DOUBLE) AS cb,
    CAST((3 * i + 19 * by) % 256 AS DOUBLE) AS cr
  FROM cells),
px AS (
  SELECT i, wb, hb,
    CASE WHEN i % 2 = 0 THEN yv ELSE
      LEAST(GREATEST(floor(yv + 1.402 * (cr - 128) + 0.5), 0), 255)
    END AS r,
    CASE WHEN i % 2 = 0 THEN yv ELSE
      LEAST(GREATEST(floor(yv - 0.344136 * (cb - 128)
                           - 0.714136 * (cr - 128) + 0.5), 0), 255)
    END AS g,
    CASE WHEN i % 2 = 0 THEN yv ELSE
      LEAST(GREATEST(floor(yv + 1.772 * (cb - 128) + 0.5), 0), 255)
    END AS b
  FROM vals)
SELECT i AS media_id,
       CAST(8 * MIN(wb) AS BIGINT) AS width,
       CAST(8 * MIN(hb) AS BIGINT) AS height,
       CAST(64 * SUM(r) AS BIGINT) AS sum_r,
       CAST(64 * SUM(g) AS BIGINT) AS sum_g,
       CAST(64 * SUM(b) AS BIGINT) AS sum_b
FROM px GROUP BY i""",
        "bigram_lm": """
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(coalesce(text, ''), '\\S+') AS t
  FROM documents),
pairs AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram, t[i] AS w1
  FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)),
c2 AS (SELECT bigram, count(*) AS n2 FROM pairs GROUP BY bigram),
c1 AS (SELECT w1, count(*) AS n1 FROM pairs GROUP BY w1),
sc AS (
  SELECT p.doc_id,
         SUM(length(bin(c1.n1)) - length(bin(c2.n2))) AS lm_bits,
         count(*) AS n_pairs
  FROM pairs p JOIN c2 USING (bigram) JOIN c1 USING (w1)
  GROUP BY p.doc_id)
SELECT d.doc_id,
       CAST(coalesce(sc.lm_bits, 0) AS BIGINT) AS lm_bits,
       CAST(coalesce(sc.n_pairs, 0) AS BIGINT) AS n_pairs
FROM documents d LEFT JOIN sc USING (doc_id)""",
        "redirects": """
WITH RECURSIVE e AS (
  SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
  WHERE doc_id % 5 < 4
  UNION ALL
  SELECT doc_id, doc_id - 4 FROM documents
  WHERE doc_id % 5 = 4 AND (doc_id // 5) % 10 = 0),
walk(src, cur, hops) AS (
  SELECT src, dst, 1 FROM e
  UNION ALL
  SELECT w.src, e.dst, w.hops + 1
  FROM walk w JOIN e ON w.cur = e.src
  WHERE w.hops < 3),
term AS (
  SELECT w.src, w.cur AS final, w.hops
  FROM walk w WHERE w.cur NOT IN (SELECT src FROM e))
SELECT e.src, t.final, CAST(t.hops AS BIGINT) AS hops,
       CAST(t.src IS NOT NULL AS BIGINT) AS resolved
FROM e LEFT JOIN term t ON e.src = t.src""",
        "sitemap": """
WITH p AS (
  SELECT doc_id, doc_id % 10 AS m, doc_id % 3 AS n FROM documents),
built AS (
  SELECT doc_id,
    'https://s' || m || '/sitemap' || doc_id || '.xml' AS url,
    '<?xml version="1.0"?><urlset>' || chr(10) ||
    '<url><loc> https://s' || m || '/p' || doc_id || '_1 </loc>' ||
    CASE WHEN (doc_id + 1) % 2 = 0
         THEN '<lastmod>2024-01-01</lastmod>' ELSE '' END ||
    '</url>' || chr(10) ||
    CASE WHEN n >= 1 THEN
      '<url><loc>https://s' || m || '/p' || doc_id || '_2</loc>' ||
      CASE WHEN (doc_id + 2) % 2 = 0
           THEN '<lastmod>2024-01-02</lastmod>' ELSE '' END ||
      '</url>' || chr(10) ELSE '' END ||
    CASE WHEN n >= 2 THEN
      '<url><loc>https://s' || m || '/p' || doc_id || '_3</loc>' ||
      CASE WHEN (doc_id + 3) % 2 = 0
           THEN '<lastmod>2024-01-03</lastmod>' ELSE '' END ||
      '</url>' || chr(10) ELSE '' END ||
    CASE WHEN doc_id % 11 = 0
         THEN '<url><lastmod>2020-01-01</lastmod></url>' || chr(10)
         ELSE '' END ||
    CASE WHEN doc_id % 7 = 0
         THEN '<sitemap><loc>https://s' || m ||
              '/sub.xml</loc></sitemap>' || chr(10) ELSE '' END ||
    '</urlset>' AS xml
  FROM p),
blocks AS (
  SELECT url,
    regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1) AS bl,
    regexp_extract_all(xml, '(?s)<sitemap>(.*?)</sitemap>', 1) AS sl
  FROM built),
uent AS (
  SELECT url AS src, 'url' AS kind, i AS bidx,
    regexp_extract(bl[i], '(?s)<loc>\\s*([^<]*?)\\s*</loc>', 1) AS loc,
    regexp_extract(bl[i], '(?s)<lastmod>\\s*([^<]*?)\\s*</lastmod>',
                   1) AS lastmod
  FROM blocks,
       LATERAL (SELECT unnest(generate_series(1, len(bl))) AS i)),
sent AS (
  SELECT url AS src, 'sitemap' AS kind, i AS bidx,
    regexp_extract(sl[i], '(?s)<loc>\\s*([^<]*?)\\s*</loc>', 1) AS loc,
    regexp_extract(sl[i], '(?s)<lastmod>\\s*([^<]*?)\\s*</lastmod>',
                   1) AS lastmod
  FROM blocks,
       LATERAL (SELECT unnest(generate_series(1, len(sl))) AS i)),
allent AS (SELECT * FROM uent UNION ALL SELECT * FROM sent)
SELECT src, kind,
       row_number() OVER (PARTITION BY src, kind ORDER BY bidx) AS pos,
       loc, NULLIF(lastmod, '') AS lastmod
FROM allent WHERE loc <> ''""",
        "robots_gate": """
WITH hosts AS (SELECT DISTINCT doc_id % 10 AS m FROM documents),
rb AS (
  SELECT m,
    '# robots for h' || m || chr(10) ||
    'User-agent: otherbot' || chr(10) || 'Disallow: /' || chr(10) ||
    chr(10) ||
    CASE WHEN m % 4 = 1 THEN
      'User-agent: mybot' || chr(10) || 'Disallow: /only' || chr(10) ||
      'Allow: /only/ok' || chr(10) ELSE '' END ||
    'User-agent: helper' || chr(10) || 'User-agent: *' || chr(10) ||
    'Disallow: /private' || chr(10) || 'Allow: /private/pub' || chr(10) ||
    CASE WHEN m % 2 = 0 THEN 'Disallow: /tmp*' || chr(10) ELSE '' END ||
    'Disallow:' || chr(10) ||
    CASE WHEN m % 5 = 2 THEN 'Disallow: /bad$path' || chr(10) ELSE '' END
    AS robots
  FROM hosts),
lines0 AS (
  SELECT m, i AS ln, trim(regexp_replace(l[i], '#.*$', '')) AS line
  FROM (SELECT m, string_split(robots, chr(10)) AS l FROM rb),
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)),
cls AS (
  SELECT m, ln,
    lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:\\s*(\\S*)', 1)) AS k,
    regexp_extract(line, '^([A-Za-z-]+)\\s*:\\s*(\\S*)', 2) AS v,
    regexp_matches(line, '^[A-Za-z-]+\\s*:') AS valid
  FROM lines0),
flags AS (
  SELECT m, ln, k, v,
    (valid AND k = 'user-agent') AS is_ua,
    (valid AND k IN ('allow', 'disallow')) AS is_rule
  FROM cls),
ng AS (
  SELECT m, ln, k, v, is_ua, is_rule,
    CASE WHEN is_ua AND NOT coalesce(
           lag(is_ua) OVER (PARTITION BY m ORDER BY ln), FALSE)
         THEN 1 ELSE 0 END AS new_g
  FROM flags),
grp AS (
  SELECT m, ln, k, v, is_ua, is_rule,
    CAST(SUM(new_g) OVER (PARTITION BY m ORDER BY ln) AS BIGINT) AS gid
  FROM ng),
gflags AS (
  SELECT m, gid,
    bool_or(is_ua AND lower(v) = 'mybot') AS g_agent,
    bool_or(is_ua AND v = '*') AS g_star
  FROM grp WHERE gid >= 1 GROUP BY m, gid),
hspec AS (SELECT m, bool_or(g_agent) AS has_spec FROM gflags GROUP BY m),
rul0 AS (
  SELECT g.m, regexp_replace(g.v, '\\*$', '') AS rule,
         CASE WHEN g.k = 'allow' THEN 1 ELSE 0 END AS allow
  FROM grp g
  JOIN gflags f ON g.m = f.m AND g.gid = f.gid
  JOIN hspec h ON g.m = h.m
  WHERE g.is_rule AND g.gid >= 1
    AND ((h.has_spec AND f.g_agent) OR (NOT h.has_spec AND f.g_star))),
rul AS (
  SELECT m, rule, allow, length(rule) AS rlen
  FROM rul0
  WHERE length(rule) > 0 AND NOT regexp_matches(rule, '[*$]')),
u2 AS (
  SELECT doc_id, doc_id % 10 AS m,
    'https://h' || (doc_id % 10) ||
    CASE doc_id % 8 WHEN 0 THEN '' WHEN 1 THEN '/private/x'
      WHEN 2 THEN '/private/pub/ok' WHEN 3 THEN '/tmp/file'
      WHEN 4 THEN '/only/ok/deep' WHEN 5 THEN '/only/no'
      WHEN 6 THEN '/pub' ELSE '/private' END ||
    '?d=' || doc_id ||
    CASE WHEN doc_id % 8 = 6 THEN '#f' ELSE '' END AS url
  FROM documents),
pp AS (
  SELECT doc_id, url, m,
    CASE WHEN p0 = '' THEN '/' ELSE p0 END AS path
  FROM (SELECT doc_id, url, m,
          regexp_replace(regexp_replace(url, '#.*$', ''),
                         '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS p0
        FROM u2)),
cand AS (
  SELECT pp.doc_id, r.allow, r.rlen
  FROM pp JOIN rul r ON pp.m = r.m
  WHERE substr(pp.path, 1, CAST(r.rlen AS INT)) = r.rule),
win AS (
  SELECT doc_id, allow FROM cand
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY rlen DESC, allow DESC) = 1)
SELECT pp.url, CAST(coalesce(w.allow, 1) AS BIGINT) AS allowed
FROM pp LEFT JOIN win w USING (doc_id)""",
        "fim_split": """
WITH h AS (
  SELECT doc_id, coalesce(text, '') AS text,
         md5('fim:' || CAST(doc_id AS VARCHAR)) AS hx
  FROM documents),
p AS (
  SELECT doc_id, text, length(text) AS n,
         CAST('0x' || substr(hx, 1, 8) AS BIGINT) % 100 < 60 AS g,
         CAST('0x' || substr(hx, 9, 8) AS BIGINT) AS h1,
         CAST('0x' || substr(hx, 17, 8) AS BIGINT) AS h2
  FROM h),
q AS (
  SELECT doc_id, text, n, g,
         CASE WHEN g THEN h1 % (n + 1) ELSE n END AS p1, h2
  FROM p),
r AS (
  SELECT doc_id, text, g, p1,
         CASE WHEN g THEN p1 + h2 % (n - p1 + 1) ELSE n END AS p2
  FROM q)
SELECT doc_id,
       substr(text, 1, CAST(p1 AS INT)) AS prefix,
       substr(text, CAST(p1 + 1 AS INT), CAST(p2 - p1 AS INT)) AS middle,
       substr(text, CAST(p2 + 1 AS INT)) AS suffix,
       CAST(g AS BIGINT) AS is_fim
FROM r""",
        "cut_dup_windows": """
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN
           'a' || CAST(doc_id AS VARCHAR) || ' b' || CAST(doc_id AS VARCHAR)
           || ' c' || CAST(doc_id AS VARCHAR) || ' d'
           || CAST(doc_id AS VARCHAR) || ' e' || CAST(doc_id AS VARCHAR)
         ELSE
           'c0 c1 c2 c3 u' || CAST(doc_id AS VARCHAR) ||
           ' c0 c1 c2 c3 z' || CAST(doc_id % 4 AS VARCHAR)
         END AS text
  FROM documents),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM raw),
tok AS (
  SELECT doc_id, i AS pos, t[i] AS w
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)),
win AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+2], ' ') AS w
  FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)),
f AS (SELECT w FROM win GROUP BY w HAVING count(*) >= 2),
dup AS (SELECT doc_id, pos FROM win WHERE w IN (SELECT w FROM f)),
cov AS (
  SELECT DISTINCT doc_id, tp
  FROM (SELECT doc_id, unnest(generate_series(pos, pos + 2)) AS tp
        FROM dup)),
kept AS (
  SELECT k.doc_id, k.pos, k.w
  FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.pos = c.tp
  WHERE c.tp IS NULL),
agg AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id),
base AS (SELECT doc_id, len(t) AS n_tok FROM toks)
SELECT b.doc_id, coalesce(a.text, '') AS text,
       CAST(b.n_tok - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed_tokens
FROM base b LEFT JOIN agg a USING (doc_id)""",
        "lang_hits": lang_hits_sql,
        "corpus_prep2": r"""
WITH raw AS (
  SELECT doc_id,
         'shared header' || chr(10) ||
         'sec ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) ||
         'uniq ' || CAST(doc_id AS VARCHAR) || chr(10) ||
         'pair ' || CAST(doc_id // 2 AS VARCHAR) || chr(10) ||
         'shared footer' AS text
  FROM documents),
l AS (
  SELECT doc_id, i AS pos, lines[i] AS para
  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines FROM raw),
       LATERAL (SELECT unnest(generate_series(1, len(lines))) AS i)),
w AS (SELECT para, min(doc_id * 1048576 + pos) AS k FROM l GROUP BY para),
d AS (
  SELECT CAST(k // 1048576 AS BIGINT) AS doc_id,
         string_agg(para, chr(10) ORDER BY k % 1048576) AS text
  FROM w GROUP BY 1),
t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM d WHERE len(regexp_extract_all(text, '\S+')) >= 2),
c AS (
  SELECT doc_id, n_tokens,
         CAST(min(doc_id) OVER (PARTITION BY doc_id // 10) AS BIGINT)
           AS cluster
  FROM t),
s AS (
  SELECT n_tokens,
         CASE WHEN pct < 80 THEN 'train'
              WHEN pct < 90 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT n_tokens,
               CAST('0x' || substr(md5('split:' ||
                                       CAST(cluster AS VARCHAR)), 1, 8)
                    AS BIGINT) % 100 AS pct
        FROM c))
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM s GROUP BY split""",
        "url_features": r"""
WITH pages AS (
  SELECT CASE
    WHEN doc_id % 4 = 0 THEN
      'https://w' || (doc_id % 9) || '.ex/a' || doc_id || '/b/c?x=1&y='
      || doc_id || '#frag'
    WHEN doc_id % 4 = 1 THEN 'https://w' || (doc_id % 9) || '.ex/p'
      || doc_id
    WHEN doc_id % 4 = 2 THEN 'https://w' || (doc_id % 9) || '.ex/'
    ELSE 'http://w' || (doc_id % 9) || '.ex/dl/f' || doc_id || '.pdf?'
  END AS url
  FROM documents),
x AS (
  SELECT url,
         regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
         coalesce(NULLIF(regexp_extract(url,
             '^https?://[^/?#]+(/[^?#]*)', 1), ''), '/') AS path,
         CASE WHEN url LIKE '%?%'
              THEN regexp_extract(url, '\?([^#]*)', 1) END AS query
  FROM pages)
SELECT url, host,
       CAST(len(regexp_extract_all(path, '[^/]+')) AS BIGINT) AS depth,
       CAST(CASE WHEN query IS NOT NULL
                 THEN len(string_split(query, '&')) ELSE 0 END
            AS BIGINT) AS n_params,
       CAST(len(regexp_extract_all(path, '[0-9]')) AS BIGINT)
         AS path_digits,
       CAST(length(path) AS BIGINT) AS path_len,
       CAST(CASE WHEN query IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS has_query
FROM x""",
        "phrase_search": r"""
WITH f AS (
  SELECT doc_id, i AS pos, ts[i] AS tok
  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
        FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i)),
m AS (
  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM f a JOIN f b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.tok = 'batch' AND b.tok = 'batch'
  GROUP BY a.doc_id)
SELECT doc_id, n_hits,
       CAST(row_number() OVER (ORDER BY n_hits DESC, doc_id)
            AS BIGINT) AS rank
FROM m""",
        "term_search": r"""
WITH f AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
  FROM documents),
m AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS tf_total,
         count(DISTINCT tok) AS nd
  FROM f WHERE tok IN ('hash', 'merge', 'window') GROUP BY doc_id)
SELECT doc_id, tf_total,
       CAST(row_number() OVER (ORDER BY tf_total DESC, doc_id)
            AS BIGINT) AS rank
FROM m WHERE nd = 3""",
        "frontier": """
WITH nn AS (SELECT count(*) AS n FROM documents),
disc AS (
  SELECT 'https://c' || (((doc_id + 2) % nn.n) % 5) || '.ex/p' ||
         ((doc_id + 2) % nn.n) AS url
  FROM documents, nn WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'https://new' || (doc_id % 7) || '.ex/x' || (doc_id % 50)
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'https://c' || (((doc_id + 3) % nn.n) % 5) || '.ex/p' ||
         ((doc_id + 3) % nn.n)
  FROM documents, nn WHERE doc_id % 2 = 1
  UNION ALL
  SELECT 'https://new' || (doc_id % 7) || '.ex/y' || (doc_id % 50)
  FROM documents WHERE doc_id % 2 = 1),
corpus AS (
  SELECT 'https://c' || (doc_id % 5) || '.ex/p' || doc_id AS url
  FROM documents)
SELECT url, CAST(count(*) AS BIGINT) AS n_refs
FROM disc WHERE url NOT IN (SELECT url FROM corpus)
GROUP BY url""",
        "robots_sitemaps": r"""
WITH p AS (
  SELECT doc_id, doc_id % 3 AS m,
         'h' || CAST(doc_id AS VARCHAR) || '.ex' AS host
  FROM documents),
built AS (
  SELECT host,
    CASE WHEN m = 0 THEN
      'User-agent: *' || chr(10) || 'Disallow: /tmp' || chr(10) ||
      'Sitemap: https://h' || doc_id || '.ex/sm1.xml # main' || chr(10) ||
      'sitemap: https://h' || doc_id || '.ex/sm2.xml' || chr(10)
    WHEN m = 1 THEN
      '# header' || chr(10) || '  SITEMAP:https://h' || doc_id ||
      '.ex/only.xml' || chr(10) ||
      'User-agent: *' || chr(10) || 'Allow: /' || chr(10)
    ELSE 'User-agent: *' || chr(10) || 'Disallow:' || chr(10) END
      AS robots
  FROM p),
l AS (
  SELECT host, i AS lno, regexp_replace(lines[i], '#.*$', '') AS line
  FROM (SELECT host, string_split(robots, chr(10)) AS lines FROM built),
       LATERAL (SELECT unnest(generate_series(1, len(lines))) AS i)),
x AS (
  SELECT host, lno,
         regexp_extract(line, '(?i)^\s*sitemap\s*:\s*(\S+)', 1) AS sitemap
  FROM l)
SELECT host, row_number() OVER (PARTITION BY host ORDER BY lno) AS pos,
       sitemap
FROM x WHERE sitemap <> ''""",
        "jsonl_roundtrip": """
SELECT doc_id, text FROM documents""",
        "video_stats": """
SELECT doc_id AS media_id,
       CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
       CAST(4 + doc_id % 3 AS BIGINT) AS width,
       CAST(3 + doc_id % 2 AS BIGINT) AS height,
       CAST((4 + doc_id % 3) * (3 + doc_id % 2) * (doc_id % 256)
            AS BIGINT) AS sum_r,
       CAST((4 + doc_id % 3) * (3 + doc_id % 2) * ((2 * doc_id) % 256)
            AS BIGINT) AS sum_g,
       CAST((4 + doc_id % 3) * (3 + doc_id % 2) * ((3 * doc_id) % 256)
            AS BIGINT) AS sum_b,
       'ok' AS status
FROM documents""",
        "mjpeg_video": """
SELECT doc_id AS media_id,
       CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
       CAST(8 * (1 + doc_id % 2) AS BIGINT) AS width,
       CAST(8 * (1 + doc_id % 3) AS BIGINT) AS height,
       CAST(64 * (1 + doc_id % 2) * (1 + doc_id % 3) * (doc_id % 256)
            AS BIGINT) AS sum_r,
       CAST(64 * (1 + doc_id % 2) * (1 + doc_id % 3) * (doc_id % 256)
            AS BIGINT) AS sum_g,
       CAST(64 * (1 + doc_id % 2) * (1 + doc_id % 3) * (doc_id % 256)
            AS BIGINT) AS sum_b,
       'ok' AS status
FROM documents""",
        "outline": r"""
WITH pages AS (
  SELECT 'https://o' || CAST(doc_id % 7 AS VARCHAR) || '.ex/p' ||
         CAST(doc_id AS VARCHAR) AS url,
         '<html><body><h1 class="t">Title ' || CAST(doc_id AS VARCHAR) ||
         '</h1><p>x</p><h2>Sec <em>' || CAST(doc_id % 7 AS VARCHAR) ||
         '</em></h2><h2>  </h2><h2>More ' || CAST(doc_id % 3 AS VARCHAR)
         || '</h2>' ||
         CASE WHEN doc_id % 2 = 0
              THEN '<h3>Deep ' || CAST(doc_id AS VARCHAR) || '</h3>'
              ELSE '' END ||
         '<h4>oops</body></html>' AS html
  FROM documents),
lv AS (SELECT unnest(generate_series(1, 6)) AS k),
hx AS (
  SELECT p.url AS src, lv.k,
         regexp_extract_all(p.html,
           '(?s)<h' || lv.k || '[^>]*>(.*?)</h' || lv.k || '>', 1) AS hs
  FROM pages p, lv),
e AS (
  SELECT src, k, t.i AS bidx,
         trim(regexp_replace(hs[t.i], '<[^>]*>', '', 'g')) AS text
  FROM hx, LATERAL (SELECT unnest(generate_series(1, len(hs))) AS i) t)
SELECT src, CAST(k AS BIGINT) AS level,
       row_number() OVER (PARTITION BY src, k ORDER BY bidx) AS pos, text
FROM e WHERE text <> ''""",
        "anchor_corpus": r"""
WITH pages AS (
  SELECT 'https://an' || CAST(doc_id % 4 AS VARCHAR) || '.ex.com/p/' ||
         CAST(doc_id AS VARCHAR) AS url,
         '<html><p>intro</p><a href="/a/' || CAST(doc_id AS VARCHAR) ||
         '">first ' || CAST(doc_id AS VARCHAR) || '</a> mid <a href="b' ||
         CAST(doc_id % 9 AS VARCHAR) || '.html" class="x">second-' ||
         CAST(doc_id % 5 AS VARCHAR) ||
         '</a><a href="#f">frag anchor</a></html>' AS html
  FROM documents),
hx AS (
  SELECT url AS src,
         regexp_extract_all(html, 'href="([^"]*)"', 1) AS hrefs,
         regexp_extract_all(html, 'href="[^"]*"[^>]*>([^<]*)', 1) AS texts
  FROM pages),
e AS (
  SELECT src, t.i AS pos, hrefs[t.i] AS href, texts[t.i] AS text
  FROM hx, LATERAL (SELECT unnest(generate_series(1, len(hrefs))) AS i) t),
r AS (
  SELECT regexp_replace(
           CASE
             WHEN href LIKE 'http://%' OR href LIKE 'https://%' THEN href
             WHEN href LIKE '//%'
               THEN regexp_extract(src, '^(https?):', 1) || ':' || href
             WHEN href LIKE '/%'
               THEN regexp_extract(src, '^(https?://[^/]+)', 1) || href
             ELSE regexp_extract(src, '^(.*/)', 1) || href
           END, '#.*$', '') AS dst,
         src, pos, text
  FROM e
  WHERE href <> '' AND href NOT LIKE '#%' AND href NOT LIKE 'mailto:%'
        AND href NOT LIKE 'javascript:%' AND href NOT LIKE 'data:%'
        AND text <> '')
SELECT dst, CAST(count(*) AS BIGINT) AS n_anchors,
       string_agg(text, ' | ' ORDER BY src, pos) AS anchors
FROM r GROUP BY dst""",
        "hreflang": r"""
WITH pages AS (
  SELECT 'https://ex' || CAST(doc_id % 7 AS VARCHAR) || '.com/d' ||
         CAST(doc_id % 3 AS VARCHAR) || '/p' || CAST(doc_id AS VARCHAR)
           AS url,
         '<html><head>' ||
         CASE
           WHEN doc_id % 4 = 0 THEN
             '<link rel="alternate" hreflang="es" href="https://es.ex' ||
             CAST(doc_id % 7 AS VARCHAR) || '.com/p' ||
             CAST(doc_id AS VARCHAR) || '">' ||
             '<link hreflang="fr" href="/fr/p' || CAST(doc_id AS VARCHAR)
             || '" rel="alternate">'
           WHEN doc_id % 4 = 1 THEN
             '<link rel="alternate" href="de/p' || CAST(doc_id AS VARCHAR)
             || '" hreflang="de">'
           WHEN doc_id % 4 = 2 THEN '<link rel="stylesheet" href="/s.css">'
           ELSE '' END ||
         '</head><body>x</body></html>' AS html
  FROM documents),
tags AS (
  SELECT url AS src, regexp_extract_all(html, '<link([^>]*)>', 1) AS tl
  FROM pages),
e AS (
  SELECT src, t.i AS bidx, tl[t.i] AS tag
  FROM tags, LATERAL (SELECT unnest(generate_series(1, len(tl))) AS i) t),
x AS (
  SELECT src, bidx,
         regexp_extract(tag, 'hreflang="([^"]*)"', 1) AS hreflang,
         regexp_extract(tag, 'href="([^"]*)"', 1) AS h
  FROM e WHERE tag LIKE '%rel="alternate"%')
SELECT src,
       row_number() OVER (PARTITION BY src ORDER BY bidx) AS pos,
       hreflang,
       regexp_replace(
         CASE
           WHEN h LIKE 'http://%' OR h LIKE 'https://%' THEN h
           WHEN h LIKE '//%'
             THEN regexp_extract(src, '^(https?):', 1) || ':' || h
           WHEN h LIKE '/%'
             THEN regexp_extract(src, '^(https?://[^/]+)', 1) || h
           ELSE regexp_extract(src, '^(.*/)', 1) || h
         END, '#.*$', '') AS href
FROM x WHERE hreflang <> '' AND h <> ''""",
        "domain_prior": """
WITH rows_ AS (
  SELECT doc_id, 'd' || CAST(doc_id % 20 AS VARCHAR) AS domain,
         CAST(length(text) AS BIGINT) AS nchars
  FROM documents)
SELECT doc_id, domain, nchars,
       CAST(sum(nchars) OVER (PARTITION BY domain) AS BIGINT)
         AS domain_sum,
       CAST(count(*) OVER (PARTITION BY domain) AS BIGINT) AS domain_n
FROM rows_""",
        "feed": r"""
WITH p AS (
  SELECT doc_id, doc_id % 10 AS m, doc_id % 9 + 1 AS day,
         doc_id % 3 AS r
  FROM documents),
built AS (
  SELECT doc_id,
    'https://h' || m || '/feed' || doc_id || '.xml' AS url,
    CASE WHEN r = 0 THEN
      '<rss><channel><title>chan</title><link>https://h' || m ||
      '/</link>' ||
      '<item><title>T' || doc_id || 'a</title><link> https://h' || m ||
      '/a' || doc_id || ' </link><pubDate>2024-01-' || day ||
      '</pubDate></item>' ||
      '<item><title>orphan</title></item>' ||
      '<item><title></title><link>https://h' || m || '/b' || doc_id ||
      '</link></item>' ||
      '</channel></rss>'
    WHEN r = 1 THEN
      '<feed><title>f</title><entry><title>A' || doc_id ||
      '</title><link rel="alternate" href="https://h' || m || '/e' ||
      doc_id || '"/><updated>2024-02-' || day || '</updated></entry>' ||
      '<entry><link href="https://h' || m || '/f' || doc_id ||
      '"/></entry></feed>'
    ELSE '<html><body>not a feed</body></html>' END AS xml
  FROM p),
blocks AS (
  SELECT url,
    regexp_extract_all(xml, '(?s)<item>(.*?)</item>', 1) AS il,
    regexp_extract_all(xml, '(?s)<entry>(.*?)</entry>', 1) AS el
  FROM built),
rent AS (
  SELECT url AS src, 'rss' AS kind, i AS bidx,
    regexp_extract(il[i], '(?s)<title>\s*([^<]*?)\s*</title>', 1) AS title,
    regexp_extract(il[i], '(?s)<link>\s*([^<]*?)\s*</link>', 1) AS link,
    regexp_extract(il[i], '(?s)<pubDate>\s*([^<]*?)\s*</pubDate>',
                   1) AS published
  FROM blocks, LATERAL (SELECT unnest(generate_series(1, len(il))) AS i)),
aent AS (
  SELECT url AS src, 'atom' AS kind, i AS bidx,
    regexp_extract(el[i], '(?s)<title>\s*([^<]*?)\s*</title>', 1) AS title,
    regexp_extract(el[i], '<link[^>]*href="([^"]*)"', 1) AS link,
    regexp_extract(el[i], '(?s)<updated>\s*([^<]*?)\s*</updated>',
                   1) AS published
  FROM blocks, LATERAL (SELECT unnest(generate_series(1, len(el))) AS i)),
allent AS (SELECT * FROM rent UNION ALL SELECT * FROM aent)
SELECT src, kind,
       row_number() OVER (PARTITION BY src, kind ORDER BY bidx) AS pos,
       NULLIF(title, '') AS title, link,
       NULLIF(published, '') AS published
FROM allent WHERE link <> ''""",
        "meta_refresh": r"""
WITH pages AS (
  SELECT 'https://ex' || CAST(doc_id % 7 AS VARCHAR) || '.com/d' ||
         CAST(doc_id % 3 AS VARCHAR) || '/p' || CAST(doc_id AS VARCHAR)
           AS url,
         '<html><head><title>t</title>' ||
         CASE
           WHEN doc_id % 4 = 0 THEN
             '<meta http-equiv="refresh" content="0; url=https://ex' ||
             CAST((doc_id + 1) % 7 AS VARCHAR) || '.com/home">'
           WHEN doc_id % 4 = 1 THEN
             '<meta http-equiv="refresh" content="5;URL=/next' ||
             CAST(doc_id AS VARCHAR) || '">'
           WHEN doc_id % 4 = 2 THEN
             '<meta http-equiv="refresh" content="2; url=go' ||
             CAST(doc_id AS VARCHAR) || '.html#frag">'
           WHEN doc_id % 8 = 3 THEN
             '<meta http-equiv="refresh" content="300">'
           ELSE '' END ||
         '</head><body>x</body></html>' AS html
  FROM documents),
x AS (
  SELECT url AS src,
         regexp_extract(html,
           '(?i)<meta[^>]*http-equiv="refresh"[^>]*content="([^"]*)"',
           1) AS content
  FROM pages),
y AS (
  SELECT src,
         regexp_extract(content, '^\s*([0-9]+)', 1) AS dstr,
         regexp_extract(content, '(?i);\s*url\s*=\s*(.*?)\s*$', 1) AS tgt
  FROM x WHERE content <> '')
SELECT src, CAST(dstr AS BIGINT) AS delay,
       regexp_replace(
         CASE
           WHEN tgt LIKE 'http://%' OR tgt LIKE 'https://%' THEN tgt
           WHEN tgt LIKE '//%'
             THEN regexp_extract(src, '^(https?):', 1) || ':' || tgt
           WHEN tgt LIKE '/%'
             THEN regexp_extract(src, '^(https?://[^/]+)', 1) || tgt
           ELSE regexp_extract(src, '^(.*/)', 1) || tgt
         END, '#.*$', '') AS dst
FROM y WHERE tgt <> ''""",
        "cluster_split": """
WITH c AS (
  SELECT doc_id,
         CAST(min(doc_id) OVER (PARTITION BY doc_id // 10) AS BIGINT)
           AS cluster
  FROM documents)
SELECT doc_id, cluster,
       CASE WHEN pct < 80 THEN 'train'
            WHEN pct < 90 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id, cluster,
             CAST('0x' || substr(md5('split:' || CAST(cluster AS VARCHAR)),
                                 1, 8) AS BIGINT) % 100 AS pct
      FROM c)""",
        "dedup_paragraphs": """
WITH raw AS (
  SELECT doc_id,
         'shared header' || chr(10) ||
         'sec ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) ||
         'uniq ' || CAST(doc_id AS VARCHAR) || chr(10) ||
         'pair ' || CAST(doc_id // 2 AS VARCHAR) || chr(10) ||
         'shared footer' AS text
  FROM documents),
l AS (
  SELECT doc_id, i AS pos, lines[i] AS para
  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines FROM raw),
       LATERAL (SELECT unnest(generate_series(1, len(lines))) AS i)),
w AS (SELECT para, min(doc_id * 1048576 + pos) AS k FROM l GROUP BY para)
SELECT CAST(k // 1048576 AS BIGINT) AS doc_id,
       string_agg(para, chr(10) ORDER BY k % 1048576) AS text
FROM w GROUP BY 1""",
        "strip_lines": """
WITH raw AS (
  SELECT doc_id,
         'shared header' || chr(10) ||
         'sec ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) ||
         'uniq ' || CAST(doc_id AS VARCHAR) || chr(10) ||
         'pair ' || CAST(doc_id // 2 AS VARCHAR) || chr(10) ||
         'shared footer' AS text
  FROM documents),
l AS (
  SELECT doc_id, i AS line_no, lines[i] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines FROM raw),
       LATERAL (SELECT unnest(generate_series(1, len(lines))) AS i)),
f AS (SELECT line FROM l GROUP BY line HAVING count(*) > 2),
kept AS (SELECT * FROM l WHERE line NOT IN (SELECT line FROM f))
SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text
FROM kept GROUP BY doc_id""",
        "encode_tokens": r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents),
c AS (SELECT token, count(*) AS n
      FROM (SELECT unnest(ts) AS token FROM toks) GROUP BY 1),
v AS (SELECT token, row_number() OVER (ORDER BY n DESC, token) AS vid
      FROM c),
flat AS (
  SELECT doc_id, i, ts[i] AS token
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i)),
enc AS (SELECT f.doc_id, f.i, v.vid FROM flat f JOIN v USING (token)),
agg AS (SELECT doc_id,
               string_agg(CAST(vid AS VARCHAR), ',' ORDER BY i) AS s
        FROM enc GROUP BY doc_id)
SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
       coalesce(a.s, '') AS token_ids
FROM toks t LEFT JOIN agg a USING (doc_id)""",
        "pack_sequences": r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents),
c AS (SELECT token, count(*) AS n
      FROM (SELECT unnest(ts) AS token FROM toks) GROUP BY 1),
v AS (SELECT token, row_number() OVER (ORDER BY n DESC, token) AS vid
      FROM c),
flat AS (
  SELECT doc_id, i, ts[i] AS token
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i)),
enc AS (SELECT f.doc_id, f.i, v.vid FROM flat f JOIN v USING (token)),
g AS (SELECT vid,
             row_number() OVER (ORDER BY doc_id, i) - 1 AS gpos
      FROM enc),
lim AS (SELECT count(*) // 64 * 64 AS cut FROM g)
SELECT CAST(gpos // 64 AS BIGINT) AS seq_id,
       string_agg(CAST(vid AS VARCHAR), ',' ORDER BY gpos) AS token_ids
FROM g, lim WHERE gpos < lim.cut GROUP BY 1""",
        "global_shuffle": """
SELECT doc_id,
       CAST(rank() OVER (ORDER BY
         CAST('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)),
                             1, 15) AS BIGINT)) AS BIGINT) AS shuffle_pos
FROM documents""",
        "quantile_sketch": """
WITH v AS (SELECT event_id % 10 AS val FROM events),
p AS (SELECT unnest([0.05,0.13,0.25,0.37,0.45,0.55,0.67,0.75,0.87,0.95])
        AS q,
      unnest(quantile_disc(val,
        [0.05,0.13,0.25,0.37,0.45,0.55,0.67,0.75,0.87,0.95])) AS value
      FROM v)
SELECT q, CAST(value AS BIGINT) AS value FROM p""",
        "group_quantile_sketch": """
WITH v AS (SELECT event_id % 5 AS key, event_id % 10 AS val FROM events),
p AS (SELECT key,
             unnest([0.13,0.25,0.37,0.63,0.75,0.87]) AS q,
             unnest(quantile_disc(val,
               [0.13,0.25,0.37,0.63,0.75,0.87])) AS value
      FROM v GROUP BY key)
SELECT key, q, CAST(value AS BIGINT) AS value FROM p""",
        "mix_corpora": """
WITH src AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'web'
                         WHEN 1 THEN 'books' ELSE 'code' END AS source
  FROM documents),
kept AS (
  SELECT * FROM src
  WHERE CAST('0x' || substr(md5('mix:' || source || ':' ||
               CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
        < CASE source WHEN 'web' THEN 80
                      WHEN 'books' THEN 50 ELSE 25 END)
SELECT doc_id, source,
       CAST(rank() OVER (ORDER BY
         CAST('0x' || substr(md5('mix:order:' || source || ':' ||
                CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT))
            AS BIGINT) AS mix_pos
FROM kept""",
        "quantile_filter": """
WITH s AS (SELECT doc_id, doc_id % 10 AS score FROM documents)
SELECT doc_id, CAST(score AS BIGINT) AS score FROM s
WHERE score >= (SELECT quantile_disc(score, 0.75) FROM s)""",
        "crawl_delta": """
WITH old AS (
  SELECT 'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS url,
         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS fp
  FROM documents),
new AS (
  SELECT 'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS url,
         CAST('0x' || substr(md5(text ||
                CASE WHEN doc_id % 7 = 0 THEN ' v2' ELSE '' END),
              1, 15) AS BIGINT) AS fp
  FROM documents WHERE doc_id % 10 <> 0
  UNION ALL
  SELECT 'https://ex.com/n/' || CAST(doc_id AS VARCHAR),
         CAST('0x' || substr(md5('fresh:' || CAST(doc_id AS VARCHAR)),
              1, 15) AS BIGINT)
  FROM documents WHERE doc_id % 13 = 0)
SELECT coalesce(o.url, n.url) AS url,
       CASE WHEN o.url IS NULL THEN 'new'
            WHEN n.url IS NULL THEN 'deleted'
            WHEN o.fp = n.fp THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.url = n.url""",
        "charset_decode": """
SELECT doc_id,
       'T' || CAST(doc_id % 6 AS VARCHAR) AS title,
       CASE doc_id % 6
         WHEN 0 THEN 'plain ascii '
         WHEN 1 THEN 'Привет мир '
         WHEN 2 THEN '日本語テキスト '
         WHEN 3 THEN 'café déjà vu '
         WHEN 4 THEN 'bom text '
         ELSE '中文文本 '
       END || CAST(doc_id AS VARCHAR) AS text
FROM documents""",
        "quality_classifier": r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
  FROM documents
), b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 4096 AS bk
  FROM toks
), s AS (
  SELECT doc_id, CAST(sum(bk % 1001 - 500) AS BIGINT) AS score
  FROM b GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.score, 0) AS score,
       COALESCE(s.score, 0) > 0 AS keep
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id""",
        "url_filter": r"""
WITH u AS (
  SELECT CASE doc_id % 8
    WHEN 0 THEN 'https://ok' || CAST(doc_id % 7 AS VARCHAR)
                || '.example.com/a/p' || CAST(doc_id AS VARCHAR)
    WHEN 1 THEN 'https://bad' || CAST(doc_id % 5 AS VARCHAR)
                || '.xxx/p' || CAST(doc_id AS VARCHAR)
    WHEN 2 THEN 'https://w' || CAST(doc_id % 5 AS VARCHAR)
                || '.example.com/casino/p' || CAST(doc_id AS VARCHAR)
    WHEN 3 THEN 'https://d' || CAST(doc_id % 5 AS VARCHAR)
                || '.example.com/a/b/c/d/e/f/g/p' || CAST(doc_id AS VARCHAR)
    WHEN 4 THEN 'https://q' || CAST(doc_id % 5 AS VARCHAR)
                || '.example.com/p?a=1&b=2&c=3&d=4&e=5&f='
                || CAST(doc_id AS VARCHAR)
    WHEN 5 THEN 'https://long.example.com/' || repeat('x', 160)
                || CAST(doc_id AS VARCHAR)
    WHEN 6 THEN 'https://mix.xxx/casino/' || CAST(doc_id AS VARCHAR)
    ELSE 'https://ok.example.com/p' || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
  END AS url
  FROM documents),
c AS (
  SELECT url,
         regexp_replace(
           regexp_replace(url, '^[a-z][a-z0-9+.-]*://[^/?#]*', ''),
           '[?#].*$', '') AS path,
         regexp_replace(url, '^[^?]*\??', '') AS query
  FROM u)
SELECT url,
  CASE
    WHEN length(url) > 160 THEN 'len'
    WHEN regexp_matches(url,
      '^[a-z][a-z0-9+.-]*://[^/?#]*\.(xxx|casino|poker)([/?#]|$)') THEN 'tld'
    WHEN regexp_matches(url, '(?i)(porn|casino|viagra|escort|xxx)')
      THEN 'word'
    WHEN length(path) - length(replace(path, '/', '')) > 6 THEN 'depth'
    WHEN length(query) - length(replace(query, '&', '')) >= 5 THEN 'query'
    ELSE ''
  END AS reason,
  CASE
    WHEN length(url) > 160 THEN FALSE
    WHEN regexp_matches(url,
      '^[a-z][a-z0-9+.-]*://[^/?#]*\.(xxx|casino|poker)([/?#]|$)') THEN FALSE
    WHEN regexp_matches(url, '(?i)(porn|casino|viagra|escort|xxx)')
      THEN FALSE
    WHEN length(path) - length(replace(path, '/', '')) > 6 THEN FALSE
    WHEN length(query) - length(replace(query, '&', '')) >= 5 THEN FALSE
    ELSE TRUE
  END AS keep
FROM c""",
        "banned_words": r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '\b(slow|scan|merge)\b'))
            AS BIGINT) AS n_banned,
       len(regexp_extract_all(text, '\b(slow|scan|merge)\b')) * 1000
         <= len(regexp_extract_all(text, '\S+')) * 100 AS keep
FROM documents""",
        "tiff_decode": r"""
WITH p AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         8 + (doc_id % 3) * 4 AS h,
         (7 * doc_id) % 200 AS rbase,
         (13 * doc_id) % 256 AS g,
         (29 * doc_id) % 256 AS b
  FROM documents)
SELECT doc_id AS media_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(h * (w * rbase + (w * (w - 1)) // 2) AS BIGINT) AS sum_r,
       CAST(h * w * g AS BIGINT) AS sum_g,
       CAST(h * w * b AS BIGINT) AS sum_b
FROM p""",
        "image_decode": r"""
WITH p AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         8 + (doc_id % 3) * 4 AS h,
         (7 * doc_id) % 200 AS rbase,
         (13 * doc_id) % 256 AS g,
         (29 * doc_id) % 256 AS b
  FROM documents)
SELECT doc_id AS media_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(h * (w * rbase + (w * (w - 1)) // 2) AS BIGINT) AS sum_r,
       CAST(h * w * g AS BIGINT) AS sum_g,
       CAST(h * w * b AS BIGINT) AS sum_b
FROM p""",
        "audio_decode": r"""
WITH p AS (
  SELECT doc_id,
         64 + (doc_id % 7) * 16 AS n,
         (37 * doc_id) % 1000 AS base
  FROM documents)
SELECT doc_id AS media_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * base + (n * (n - 1)) // 2 AS BIGINT) AS sum_s
FROM p""",
        # Code blocks: planted <pre>/<code> layout reproduced in closed
        # form (ordinals, language-class routing, entity unescape).
        "code_blocks": r"""
WITH p AS (SELECT doc_id, doc_id % 3 AS k FROM documents),
j AS (SELECT doc_id, unnest(generate_series(0, k - 1)) AS j
      FROM p WHERE k > 0),
b AS (
  SELECT doc_id, j + 1 AS pos,
         CASE WHEN (doc_id + j) % 2 = 0
              THEN (['py', 'js', 'cpp'])[((doc_id + j) % 3) + 1]
         END AS lang,
         'line' || doc_id || '_' || j || '<x' || chr(10)
             || 'ret ' || (doc_id * j) AS text
  FROM j)
SELECT doc_id,
       CAST(pos AS BIGINT) AS pos,
       lang,
       CAST(2 AS BIGINT) AS n_lines,
       CAST(length(text) AS BIGINT) AS n_chars,
       text
FROM b""",
        # FLAC: the planted ramps decode to base+k regardless of the
        # per-id subframe mode / stereo decorrelation, so both reductions
        # are closed-form.
        "flac_decode": r"""
WITH p AS (
  SELECT doc_id,
         160 + (doc_id % 5) * 48 AS n,
         (29 * doc_id) % 500 AS base
  FROM documents)
SELECT doc_id AS media_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * base + (n * (n - 1)) // 2 AS BIGINT) AS sum_s
FROM p""",
        # VP8L: planted channels stay < 256 (no wraparound), so the
        # decoded sums are closed-form arithmetic series per image.
        "webp_decode": r"""
WITH p AS (
  SELECT doc_id,
         4 + doc_id % 5 AS w,
         2 + doc_id % 3 AS h,
         doc_id % 200 AS rb,
         doc_id % 220 AS gb,
         (13 * doc_id) % 190 AS bb
  FROM documents)
SELECT doc_id AS media_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(w * h * rb + 3 * h * (w * (w - 1) // 2)
            + 7 * w * (h * (h - 1) // 2) AS BIGINT) AS sum_r,
       CAST(w * h * gb + 2 * h * (w * (w - 1) // 2) AS BIGINT) AS sum_g,
       CAST(w * h * bb + h * (w * (w - 1) // 2)
            + w * (h * (h - 1) // 2) AS BIGINT) AS sum_b
FROM p""",
        # G.711: the CCITT segment/mantissa expansion is closed-form
        # integer math — recompute every decoded sample from the planted
        # codeword (µ-law even ids, A-law odd ids) and sum.
        "g711_decode": r"""
WITH p AS (
  SELECT doc_id, 48 + (doc_id % 5) * 16 AS n FROM documents),
k AS (
  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM p),
cw AS (
  SELECT doc_id, n,
         xor((7 * doc_id + 13 * i) % 256, 255) AS u,
         xor((7 * doc_id + 13 * i) % 256, 85) AS a
  FROM k),
expand AS (
  SELECT doc_id, n, u, a,
         ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) AS tu,
         CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
              WHEN (a // 16) % 8 = 1 THEN (a % 16) * 16 + 264
              ELSE ((a % 16) * 16 + 264) * (1 << ((a // 16) % 8 - 1))
         END AS ta
  FROM cw),
dec AS (
  SELECT doc_id, n,
         CASE WHEN doc_id % 2 = 0
              THEN CASE WHEN u >= 128 THEN 132 - tu ELSE tu - 132 END
              ELSE CASE WHEN a >= 128 THEN ta ELSE -ta END
         END AS s
  FROM expand)
SELECT doc_id AS media_id,
       CAST(any_value(n) AS BIGINT) AS n_samples,
       CAST(sum(s) AS BIGINT) AS sum_s
FROM dec GROUP BY doc_id""",
        # IMA ADPCM: replay the sequential quantizer recurrence (89-entry
        # step table, magnitude from the three code bits, clamp to int16,
        # index walk clamped to [0, 88]) in a recursive CTE; the header
        # predictor is sample 0, nibble k produces sample k+1.
        "adpcm_decode": r"""
WITH RECURSIVE st(doc_id, k, pred, idx, ssum) AS (
  SELECT doc_id, 0,
         (31 * doc_id) % 2048 - 1024,
         doc_id % 89,
         CAST((31 * doc_id) % 2048 - 1024 AS BIGINT)
  FROM documents
  UNION ALL
  SELECT doc_id, k + 1, npred, nidx, ssum + npred
  FROM (
    SELECT doc_id, k, ssum,
           greatest(-32768, least(32767,
             pred + CASE WHEN d >= 8 THEN -mag ELSE mag END)) AS npred,
           greatest(0, least(88,
             idx + ([-1,-1,-1,-1,2,4,6,8])[(d % 8) + 1])) AS nidx
    FROM (
      SELECT doc_id, k, pred, idx, ssum, d,
             (step // 8)
             + CASE WHEN d % 2 = 1 THEN step // 4 ELSE 0 END
             + CASE WHEN (d // 2) % 2 = 1 THEN step // 2 ELSE 0 END
             + CASE WHEN (d // 4) % 2 = 1 THEN step ELSE 0 END AS mag
      FROM (
        SELECT doc_id, k, pred, idx, ssum,
               (doc_id + 5 * k) % 16 AS d,
               ([7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,
                 41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,
                 190,209,230,253,279,307,337,371,408,449,494,544,598,658,
                 724,796,876,963,1060,1166,1282,1411,1552,1707,1878,2066,
                 2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,
                 6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,
                 16818,18500,20350,22385,24623,27086,29794,32767])[idx + 1]
               AS step
        FROM st WHERE k < 24))))
SELECT doc_id AS media_id,
       CAST(25 AS BIGINT) AS n_samples,
       CAST(ssum AS BIGINT) AS sum_s
FROM st WHERE k = 24""",
        "dsir_weights": r"""
WITH bk AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024 AS b
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
        FROM documents)),
tcnt AS (
  SELECT b, count(*) AS n FROM bk WHERE doc_id % 7 = 0 GROUP BY b),
rcnt AS (
  SELECT b, count(*) AS n FROM bk GROUP BY b),
score AS (
  SELECT r.b,
         length(bin(COALESCE(t.n, 0) + 1)) - length(bin(r.n + 1)) AS s
  FROM rcnt r LEFT JOIN tcnt t ON r.b = t.b),
per_doc AS (
  SELECT bk.doc_id, CAST(sum(score.s) AS BIGINT) AS w
  FROM bk JOIN score ON bk.b = score.b
  GROUP BY bk.doc_id)
SELECT d.doc_id, COALESCE(p.w, 0) AS dsir_weight
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id""",
        "semdedup": r"""
WITH p AS (
  SELECT doc_id, (doc_id // 3) % 16 AS r FROM documents),
k AS (
  SELECT r, min(doc_id) AS keeper FROM p GROUP BY r)
SELECT CAST(p.r % 4 AS BIGINT) AS cluster,
       CAST(p.doc_id AS BIGINT) AS dup_id,
       CAST(k.keeper AS BIGINT) AS keeper_id
FROM p JOIN k USING (r)
WHERE p.doc_id <> k.keeper""",
        "pub_dates": r"""
WITH p AS (
  SELECT doc_id AS i, doc_id % 6 AS c,
         CAST(2000 + doc_id % 25 AS VARCHAR) AS y,
         lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') AS m,
         lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS d,
         lpad(CAST(1 + (doc_id + 5) % 12 AS VARCHAR), 2, '0') AS m2,
         lpad(CAST(1 + (doc_id + 7) % 28 AS VARCHAR), 2, '0') AS d2
  FROM documents)
SELECT CASE
         WHEN c = 1 THEN 'https://pd' || CAST(i % 3 AS VARCHAR)
           || '.ex.com/' || y || '/' || m2 || '/' || d2 || '/p'
           || CAST(i AS VARCHAR)
         WHEN c IN (3, 4) THEN 'https://pd' || CAST(i % 3 AS VARCHAR)
           || '.ex.com/' || y || '/' || m || '/' || d || '/p'
           || CAST(i AS VARCHAR)
         ELSE 'https://pd' || CAST(i % 3 AS VARCHAR) || '.ex.com/post/'
           || CAST(i AS VARCHAR)
       END AS url,
       CASE WHEN c = 5 THEN NULL
            ELSE y || '-' || m || '-' || d END AS pub_date,
       CASE c WHEN 0 THEN 'meta' WHEN 1 THEN 'time' WHEN 2 THEN 'jsonld'
              WHEN 3 THEN 'url' WHEN 4 THEN 'url' END AS pub_source
FROM p""",
        "extract_tables": r"""
WITH d AS (
  SELECT doc_id AS i,
         'https://tb' || CAST(doc_id % 5 AS VARCHAR) || '.ex.com/t/'
           || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
cols(col) AS (VALUES (0), (1)),
hdr AS (
  SELECT url, 0 AS table_idx, 0 AS row_idx, col AS col_idx,
         1 AS rowspan, 1 AS colspan, TRUE AS is_header,
         CASE col WHEN 0 THEN 'Name' ELSE 'Val' END AS text
  FROM d, cols),
body AS (
  SELECT url, 0 AS table_idx, r.r + 1 AS row_idx, col AS col_idx,
         1 AS rowspan, 1 AS colspan, FALSE AS is_header,
         CASE col
           WHEN 0 THEN 'k' || CAST(i AS VARCHAR) || '-'
                       || CAST(r.r AS VARCHAR)
           ELSE 'v' || CAST((i * 7 + r.r) % 100 AS VARCHAR)
         END AS text
  FROM d,
       LATERAL (SELECT unnest(generate_series(0, i % 3)) AS r) r,
       cols),
span AS (
  SELECT url, 1 AS table_idx, 0 AS row_idx, 0 AS col_idx,
         2 AS rowspan, 1 AS colspan, FALSE AS is_header,
         's' || CAST(i AS VARCHAR) AS text FROM d WHERE i % 4 = 0
  UNION ALL
  SELECT url, 1, 0, 1, 1, 1, FALSE, 'a' || CAST(i AS VARCHAR)
  FROM d WHERE i % 4 = 0
  UNION ALL
  SELECT url, 1, 1, 1, 1, 1, FALSE, 'b' || CAST(i AS VARCHAR)
  FROM d WHERE i % 4 = 0),
allrows AS (
  SELECT * FROM hdr UNION ALL SELECT * FROM body UNION ALL
  SELECT * FROM span)
SELECT url, CAST(table_idx AS BIGINT) AS table_idx,
       CAST(row_idx AS BIGINT) AS row_idx,
       CAST(col_idx AS BIGINT) AS col_idx,
       CAST(rowspan AS BIGINT) AS rowspan,
       CAST(colspan AS BIGINT) AS colspan,
       is_header, text
FROM allrows""",
        "jsonld": r"""
WITH p AS (
  SELECT 'https://jl' || CAST(doc_id % 3 AS VARCHAR) || '.ex.com/p/'
           || CAST(doc_id AS VARCHAR) AS url,
         CASE doc_id % 5
           WHEN 0 THEN '{"@type": "Article", "name": "Story '
                       || CAST(doc_id AS VARCHAR) || '"}'
           WHEN 1 THEN '{"@type": "Product"}'
           WHEN 2 THEN '{broken json ' || CAST(doc_id AS VARCHAR)
           WHEN 4 THEN '[1, 2, ' || CAST(doc_id AS VARCHAR) || ']'
           ELSE NULL
         END AS block
  FROM documents)
SELECT url,
       CASE WHEN block IS NOT NULL AND json_valid(block)
                 AND json_type(block) = 'OBJECT'
            THEN json_extract_string(block, '$."@type"') END AS jsonld_type,
       CASE WHEN block IS NOT NULL AND json_valid(block)
                 AND json_type(block) = 'OBJECT'
            THEN json_extract_string(block, '$.name') END AS jsonld_name
FROM p""",
        "robots_meta": r"""
WITH p AS (
  SELECT 'https://rb' || CAST(doc_id % 3 AS VARCHAR) || '.ex.com/p/'
           || CAST(doc_id AS VARCHAR) AS url,
         CASE doc_id % 6
           WHEN 0 THEN 'index, follow'
           WHEN 1 THEN 'noindex'
           WHEN 2 THEN 'nofollow,noarchive'
           WHEN 3 THEN 'NOINDEX, NOFOLLOW'
           WHEN 4 THEN 'none'
           ELSE NULL
         END AS content
  FROM documents)
SELECT url,
       regexp_matches(COALESCE(content, ''),
                      '(?i)(^|[,\s])(noindex|none)([,\s]|$)') AS noindex,
       regexp_matches(COALESCE(content, ''),
                      '(?i)(^|[,\s])(nofollow|none)([,\s]|$)') AS nofollow
FROM p""",
        "canonical_dedup": r"""
WITH k AS (
  SELECT CASE WHEN doc_id % 5 = 0
              THEN 'https://cd' || CAST(doc_id % 6 AS VARCHAR)
                   || '.ex.com/p/' || CAST(doc_id AS VARCHAR)
              ELSE 'https://canon.ex/c/' || CAST(doc_id // 3 AS VARCHAR)
         END AS key,
         'https://cd' || CAST(doc_id % 6 AS VARCHAR) || '.ex.com/p/'
           || CAST(doc_id AS VARCHAR) AS url
  FROM documents)
SELECT key, min(url) AS keeper, CAST(count(*) AS BIGINT) AS n_pages
FROM k GROUP BY key""",
        "head_meta": r"""
SELECT 'https://hm' || CAST(doc_id % 4 AS VARCHAR) || '.ex.com/a/'
         || CAST(doc_id AS VARCHAR) AS url,
       CASE WHEN doc_id % 5 <> 0
            THEN 'Title ' || CAST(doc_id AS VARCHAR) END AS og_title,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            WHEN doc_id % 3 = 0
              THEN 'https://cdn.ex/img' || CAST(doc_id AS VARCHAR) || '.png'
            ELSE 'https://hm' || CAST(doc_id % 4 AS VARCHAR)
                 || '.ex.com/im/' || CAST(doc_id AS VARCHAR) || '.png'
       END AS og_image,
       'Desc ' || CAST(doc_id AS VARCHAR) AS description,
       CASE WHEN doc_id % 2 = 0
            THEN 'https://hm' || CAST(doc_id % 4 AS VARCHAR)
                 || '.ex.com/a/c' || CAST(doc_id AS VARCHAR)
            ELSE 'https://can.ex/' || CAST(doc_id AS VARCHAR)
       END AS canonical
FROM documents""",
        "image_refs": r"""
WITH pages AS (
  SELECT 'https://im' || CAST(doc_id % 5 AS VARCHAR) || '.ex.com/g/'
           || CAST(doc_id AS VARCHAR) AS url,
         '<html><img src="/img/' || CAST(doc_id AS VARCHAR)
           || '.png" alt="cap ' || CAST(doc_id AS VARCHAR)
           || '"><p>t</p><img src="th' || CAST(doc_id % 7 AS VARCHAR)
           || '.jpg"><img src="data:image/gif;base64,x" alt="skip">'
           || '<img alt="nosrc"><img src="//cdn'
           || CAST(doc_id % 3 AS VARCHAR) || '.ex.net/l'
           || CAST(doc_id AS VARCHAR) || '.webp" alt=""></html>' AS html
  FROM documents),
tg AS (
  SELECT url, regexp_extract_all(html, '<img[^>]*>') AS tags
  FROM pages),
e AS (
  SELECT url, tags[t.i] AS tag, t.i
  FROM tg, LATERAL (SELECT unnest(generate_series(1, len(tags))) AS i) t),
x AS (
  SELECT url, i,
         CASE WHEN regexp_matches(tag, 'src="([^"]*)"')
              THEN regexp_extract(tag, 'src="([^"]*)"', 1) END AS s,
         CASE WHEN regexp_matches(tag, 'alt="([^"]*)"')
              THEN regexp_extract(tag, 'alt="([^"]*)"', 1) END AS alt
  FROM e),
k AS (
  SELECT url, s, alt,
         CAST(row_number() OVER (PARTITION BY url ORDER BY i) AS BIGINT)
           AS pos
  FROM x
  WHERE s IS NOT NULL AND s <> '' AND s NOT LIKE 'data:%'
        AND s NOT LIKE '#%' AND s NOT LIKE 'mailto:%'
        AND s NOT LIKE 'javascript:%')
SELECT url AS src, pos,
       regexp_replace(
         CASE
           WHEN s LIKE 'http://%' OR s LIKE 'https://%' THEN s
           WHEN s LIKE '//%'
             THEN regexp_extract(url, '^(https?):', 1) || ':' || s
           WHEN s LIKE '/%'
             THEN regexp_extract(url, '^(https?://[^/]+)', 1) || s
           ELSE regexp_extract(url, '^(.*/)', 1) || s
         END, '#.*$', '') AS img,
       alt
FROM k""",
        "token_windows": r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS t
  FROM documents),
w AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
k AS (
  SELECT doc_id, t, n,
         unnest(generate_series(
           0, CAST((greatest(n - 32, 0) + 23) // 24 AS INT))) AS ci
  FROM w)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_idx,
       array_to_string(t[ci * 24 + 1 : least(ci * 24 + 32, n)], ' ')
         AS chunk
FROM k""",
        "bpe_merges": _bpe_merges_sql(6),
        "bpe_segments": _bpe_segments_sql(6),
        "outlinks": r"""
WITH nn AS (SELECT count(*) AS n FROM documents),
p AS (
  SELECT doc_id AS i,
         (3 * doc_id + 1) % nn.n AS j,
         (7 * doc_id + 2) % nn.n AS k,
         (5 * doc_id + 3) % nn.n AS m
  FROM documents, nn),
pages AS (
  SELECT 'https://ex' || CAST(i % 7 AS VARCHAR) || '.com/d' ||
         CAST(i % 3 AS VARCHAR) || '/p' || CAST(i AS VARCHAR) AS url,
         '<html><body><a href="https://ex' || CAST(j % 7 AS VARCHAR) ||
         '.com/d' || CAST(j % 3 AS VARCHAR) || '/p' || CAST(j AS VARCHAR) ||
         '"><a href="/d' || CAST(k % 3 AS VARCHAR) || '/p' ||
         CAST(k AS VARCHAR) || '"><a href="q' || CAST(m AS VARCHAR) ||
         '.html#sec"><a href="#top"><a href="mailto:a@b.c"><a href="//cdn' ||
         CAST(i % 5 AS VARCHAR) || '.ex.com/lib.js"><a href="https://ex' ||
         CAST(j % 7 AS VARCHAR) || '.com/d' || CAST(j % 3 AS VARCHAR) ||
         '/p' || CAST(j AS VARCHAR) || '#frag"></body></html>' AS html
  FROM p),
hx AS (
  SELECT url AS src,
         regexp_extract_all(html, 'href="([^"]*)"', 1) AS hrefs
  FROM pages),
e AS (
  SELECT src, CAST(t.i AS BIGINT) AS pos, hrefs[t.i] AS h
  FROM hx, LATERAL (SELECT unnest(generate_series(1, len(hrefs))) AS i) t),
r AS (
  SELECT src, pos,
         regexp_replace(
           CASE
             WHEN h LIKE 'http://%' OR h LIKE 'https://%' THEN h
             WHEN h LIKE '//%'
               THEN regexp_extract(src, '^(https?):', 1) || ':' || h
             WHEN h LIKE '/%'
               THEN regexp_extract(src, '^(https?://[^/]+)', 1) || h
             ELSE regexp_extract(src, '^(.*/)', 1) || h
           END, '#.*$', '') AS dst
  FROM e
  WHERE h <> '' AND h NOT LIKE '#%' AND h NOT LIKE 'mailto:%'
        AND h NOT LIKE 'javascript:%' AND h NOT LIKE 'data:%')
SELECT src, pos, dst FROM r
WHERE dst <> ''
QUALIFY row_number() OVER (PARTITION BY src, dst ORDER BY pos) = 1""",
        "anchor_texts": r"""
WITH pages AS (
  SELECT 'https://an' || CAST(doc_id % 4 AS VARCHAR) || '.ex.com/p/' ||
         CAST(doc_id AS VARCHAR) AS url,
         '<html><p>intro</p><a href="/a/' || CAST(doc_id AS VARCHAR) ||
         '">first ' || CAST(doc_id AS VARCHAR) || '</a> mid <a href="b' ||
         CAST(doc_id % 9 AS VARCHAR) || '.html" class="x">second-' ||
         CAST(doc_id % 5 AS VARCHAR) ||
         '</a><a href="#f">frag anchor</a></html>' AS html
  FROM documents),
hx AS (
  SELECT url AS src,
         regexp_extract_all(html, 'href="([^"]*)"', 1) AS hrefs,
         regexp_extract_all(html, 'href="[^"]*"[^>]*>([^<]*)', 1) AS texts
  FROM pages)
SELECT src, CAST(t.i AS BIGINT) AS pos, hrefs[t.i] AS href,
       texts[t.i] AS text
FROM hx, LATERAL (SELECT unnest(generate_series(1, len(hrefs))) AS i) t""",
        "link_density": r"""
WITH lk AS (
  SELECT d.doc_id,
         string_agg('<a href="https://x' || CAST(s.t AS VARCHAR) ||
                    '.ex/l' || CAST(d.doc_id AS VARCHAR) || '-' ||
                    CAST(s.t AS VARCHAR) || '">', '') AS links
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(0, d.doc_id % 11 - 1)) AS t) s
  GROUP BY d.doc_id),
pages AS (
  SELECT 'https://ld' || CAST(d.doc_id % 5 AS VARCHAR) || '.ex.com/p/' ||
         CAST(d.doc_id AS VARCHAR) AS url,
         '<html><p>' || repeat('w ', (d.doc_id % 13) * 10) || '</p>' ||
         coalesce(lk.links, '') || '</html>' AS html
  FROM documents d LEFT JOIN lk ON d.doc_id = lk.doc_id),
c AS (
  SELECT url AS src, CAST(length(html) AS BIGINT) AS n_chars,
         CAST(len(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS BIGINT)
           AS n_links
  FROM pages)
SELECT src, n_links, n_chars,
       CAST(CASE WHEN n_links * 40 <= n_chars THEN 1 ELSE 0 END AS BIGINT)
         AS keep
FROM c""",
        "link_graph": r"""
WITH nn AS (SELECT count(*) AS n FROM documents),
p AS (
  SELECT doc_id AS i,
         (3 * doc_id + 1) % nn.n AS j,
         (7 * doc_id + 2) % nn.n AS k,
         (5 * doc_id + 3) % nn.n AS m
  FROM documents, nn),
pages AS (
  SELECT i AS doc_id,
         'https://ex' || CAST(i % 7 AS VARCHAR) || '.com/d' ||
         CAST(i % 3 AS VARCHAR) || '/p' || CAST(i AS VARCHAR) AS url,
         '<html><body><a href="https://ex' || CAST(j % 7 AS VARCHAR) ||
         '.com/d' || CAST(j % 3 AS VARCHAR) || '/p' || CAST(j AS VARCHAR) ||
         '"><a href="/d' || CAST(k % 3 AS VARCHAR) || '/p' ||
         CAST(k AS VARCHAR) || '"><a href="q' || CAST(m AS VARCHAR) ||
         '.html#sec"><a href="#top"><a href="mailto:a@b.c"><a href="//cdn' ||
         CAST(i % 5 AS VARCHAR) || '.ex.com/lib.js"><a href="https://ex' ||
         CAST(j % 7 AS VARCHAR) || '.com/d' || CAST(j % 3 AS VARCHAR) ||
         '/p' || CAST(j AS VARCHAR) || '#frag"></body></html>' AS html
  FROM p),
hx AS (
  SELECT url AS src,
         regexp_extract_all(html, 'href="([^"]*)"', 1) AS hrefs
  FROM pages),
e AS (
  SELECT src, CAST(t.i AS BIGINT) AS pos, hrefs[t.i] AS h
  FROM hx, LATERAL (SELECT unnest(generate_series(1, len(hrefs))) AS i) t),
r AS (
  SELECT src, pos,
         regexp_replace(
           CASE
             WHEN h LIKE 'http://%' OR h LIKE 'https://%' THEN h
             WHEN h LIKE '//%'
               THEN regexp_extract(src, '^(https?):', 1) || ':' || h
             WHEN h LIKE '/%'
               THEN regexp_extract(src, '^(https?://[^/]+)', 1) || h
             ELSE regexp_extract(src, '^(.*/)', 1) || h
           END, '#.*$', '') AS dst
  FROM e
  WHERE h <> '' AND h NOT LIKE '#%' AND h NOT LIKE 'mailto:%'
        AND h NOT LIKE 'javascript:%' AND h NOT LIKE 'data:%'),
links AS (
  SELECT src, dst FROM r
  WHERE dst <> ''
  QUALIFY row_number() OVER (PARTITION BY src, dst ORDER BY pos) = 1)
SELECT s.doc_id AS src_id, d.doc_id AS dst_id
FROM links l
JOIN pages d ON l.dst = d.url
JOIN pages s ON l.src = s.url""",
        "pagerank": """
WITH nn AS (SELECT count(*) AS n FROM documents),
e AS (
  SELECT doc_id AS src, (doc_id * 3 + 1) % nn.n AS dst, 2 AS outdeg
  FROM documents, nn
  UNION ALL
  SELECT doc_id, (doc_id * 7 + 2) % nn.n, 2 FROM documents, nn),
m0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS m FROM documents),
s1 AS (SELECT e.dst AS node, CAST(sum(m0.m // e.outdeg) AS BIGINT) AS in_m
       FROM e JOIN m0 ON e.src = m0.node GROUP BY 1),
m1 AS (SELECT m0.node,
              CAST(150000 + 85 * coalesce(s1.in_m, 0) // 100 AS BIGINT) AS m
       FROM m0 LEFT JOIN s1 USING (node)),
s2 AS (SELECT e.dst AS node, CAST(sum(m1.m // e.outdeg) AS BIGINT) AS in_m
       FROM e JOIN m1 ON e.src = m1.node GROUP BY 1),
m2 AS (SELECT m1.node,
              CAST(150000 + 85 * coalesce(s2.in_m, 0) // 100 AS BIGINT) AS m
       FROM m1 LEFT JOIN s2 USING (node)),
s3 AS (SELECT e.dst AS node, CAST(sum(m2.m // e.outdeg) AS BIGINT) AS in_m
       FROM e JOIN m2 ON e.src = m2.node GROUP BY 1),
m3 AS (SELECT m2.node,
              CAST(150000 + 85 * coalesce(s3.in_m, 0) // 100 AS BIGINT) AS m
       FROM m2 LEFT JOIN s3 USING (node))
SELECT node AS doc_id, m AS mass FROM m3""",
        "shard_pack": r"""
WITH t AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT)
           AS n_tokens,
         CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
              1, 15) AS BIGINT) AS k
  FROM documents)
SELECT doc_id, n_tokens,
       (CAST(sum(n_tokens) OVER (ORDER BY k) AS BIGINT) - n_tokens)
         // 2000 AS shard_id
FROM t""",
        "profile": _profile_sql(),
        "range_partition": """
WITH v AS (SELECT event_id, event_id % 7 AS val FROM events),
c AS (SELECT unnest(quantile_disc(val, [0.25, 0.5, 0.75])) AS cut FROM v)
SELECT event_id, val,
       CAST((SELECT count(*) FROM c WHERE c.cut < v.val) AS BIGINT) AS part
FROM v""",
        "upsample": """
WITH c AS (
  SELECT doc_id,
         2 + CASE WHEN CAST('0x' || substr(md5('rep:' ||
                    CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 2 < 1
                  THEN 1 ELSE 0 END AS k
  FROM documents)
SELECT doc_id, CAST(u.i AS BIGINT) AS copy
FROM c, LATERAL (SELECT unnest(generate_series(0, k - 1)) AS i) u""",
        "curriculum": """
WITH t AS (
  SELECT doc_id, doc_id % 4 AS tier,
         CAST('0x' || substr(md5('cur:' || CAST(doc_id AS VARCHAR)),
              1, 15) AS BIGINT) AS h
  FROM documents)
SELECT doc_id, tier,
       CAST(rank() OVER (ORDER BY
              (3 - tier) * 1152921504606846976 + h) AS BIGINT) AS cur_pos
FROM t""",
    }
