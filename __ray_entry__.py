"""Driver contract for the graft builder (Ray Data target).

``queries()`` exposes every implemented pipeline/operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL over the same parquet
tables. The pages corpus is synthesized deterministically from
``documents.parquet`` (documentai_ray/sources/pages.py), and every derived
value is a closed-form function of ``doc_id``/``source``/``text`` — so the
oracle SQL reconstructs expected pipeline outputs independently, making the
extraction/classification/entity/rule pipelines fully oracle-checkable.

DETERMINISM: float columns are floor-truncated (``floor(x*1e6)/1e6``) with
op-for-op mirrored arithmetic between the Ray UDFs and the SQL — IEEE
doubles through identical op sequences are bit-identical across engines.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# Ray workers must not depend on this repo being importable from their own
# sys.path (the driver may have initialised Ray from any cwd): ship all
# documentai_ray UDF code by value inside task specs.
import documentai_ray  # noqa: E402

documentai_ray.register_for_ray_by_value()

from documentai_ray.stages.sketches import HLL_ALPHA_PPM as _HLL_ALPHA_PPM  # noqa: E402

# ---------------------------------------------------------------------------
# shared SQL fragments (mirror documentai_ray/sources/pages.py — keep in sync)
# ---------------------------------------------------------------------------

_SQL_URL = (
    "'https://' || CASE WHEN doc_id % 3 = 0 THEN 'heavy.example.com' "
    "ELSE source || '.example.com' END || '/p/' || doc_id"
)

_SQL_PO_TEXT = (
    "'PO NUMBER: PO-' || (10000 + doc_id) || ' DATED ' || "
    "lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') || '.' || "
    "lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '.2024' || chr(10) || "
    "'SELLER: GLOBAL TRADING COMPANY ' || (doc_id % 7) || ' LIMITED' || chr(10) || "
    "'BUYER: ACME IMPORTS ' || (doc_id % 5) || ' LLC' || chr(10) || "
    "'DESCRIPTION OF GOODS: STEEL COILS GRADE ' || (doc_id % 9) || chr(10) || "
    "'QUANTITY: ' || (100 + doc_id % 400) || '.00 MT NET WEIGHT' || chr(10) || "
    "'TOTAL AMOUNT: USD ' || format('{:,}', (100 + doc_id % 400) * 500) || '.00' || chr(10) || "
    "'DELIVERY CFR SINGAPORE (INCOTERMS 2020)'"
)

# invoice goods-row arithmetic (mirror sources/pages.py invoice_goods)
_INV_Q1 = "(50 + doc_id % 100)"
_INV_P1 = "(500 + doc_id % 50)"
_INV_Q2 = "(20 + doc_id % 80)"
_INV_P2 = "(30 + doc_id % 20)"

_SQL_INV_TEXT = (
    "'PROFORMA INVOICE NUMBER: INV-' || (20000 + doc_id) || ' DATED ' || "
    "lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') || '.' || "
    "lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '.2024' || chr(10) || "
    "'SELLER: GLOBAL TRADING COMPANY ' || (doc_id % 7) || ' LIMITED' || chr(10) || "
    "'BUYER: ACME IMPORTS ' || (doc_id % 5) || ' LLC' || chr(10) || "
    "'DESCRIPTION HS CODE QTY UNIT PRICE AMOUNT' || chr(10) || "
    f"'STEEL COILS GRADE ' || (doc_id % 9) || ' 7209.1' || (doc_id % 7) || ' ' || "
    f"{_INV_Q1} || ' MT ' || {_INV_P1} || '.00 ' || ({_INV_Q1} * {_INV_P1}) || '.00' || chr(10) || "
    f"'ALUMINIUM SHEETS TYPE ' || (doc_id % 4) || ' 7606.1' || (doc_id % 7) || ' ' || "
    f"{_INV_Q2} || ' KG ' || {_INV_P2} || '.00 ' || ({_INV_Q2} * {_INV_P2}) || '.00' || chr(10) || "
    f"'TOTAL AMOUNT: USD ' || ({_INV_Q1} * {_INV_P1} + {_INV_Q2} * {_INV_P2}) || '.00' || chr(10) || "
    "'DELIVERY CIF ROTTERDAM (INCOTERMS 2020)'"
)

# planted technique-disagreement suffix (sources/pages.py AMBIGUOUS_PO_SUFFIX)
_SQL_AMB_SUFFIX = (
    "CASE WHEN doc_id % 20 = 12 THEN chr(10) || "
    "'data query table row spark merge join scan filter sort group hash' "
    "ELSE '' END"
)

_SQL_GOLDEN_TEXT = (
    "CASE WHEN doc_id % 97 = 0 THEN '' "
    "WHEN doc_id % 5 IN (0, 3) THEN text "
    f"WHEN doc_id % 5 = 2 THEN {_SQL_PO_TEXT} || {_SQL_AMB_SUFFIX} "
    f"WHEN doc_id % 10 = 4 THEN {_SQL_INV_TEXT} "
    "ELSE '' END"
)

# votes: planted ambiguous POs fuse at 2/4 (regex+tokenset defect), all
# other classified docs at 4/4
_SQL_VOTES = (
    "CASE WHEN doc_id % 97 <> 0 AND doc_id % 5 = 2 AND doc_id % 20 = 12 "
    "THEN '2/4' ELSE '4/4' END"
)

# expected pages after exact dedup: one row per doc_id
_SQL_EXPECTED_PAGES = (
    f"SELECT {_SQL_URL} AS url, {_SQL_GOLDEN_TEXT} AS text, lang, doc_id "
    "FROM documents"
)

# pages corpus including planted near-dup (?amp=1) rows — mirror of
# synth_pages_table(with_near_dups=True)
_SQL_PAGES_WITH_AMP = (
    f"SELECT url, text FROM ({_SQL_EXPECTED_PAGES}) "
    "UNION ALL "
    f"SELECT url || '?amp=1' AS url, text || ' the' AS text FROM ({_SQL_EXPECTED_PAGES}) "
    "WHERE doc_id % 50 IN (3, 7) AND doc_id % 97 <> 0 AND text <> ''"
)

# exact word-3-shingle Jaccard ground truth over every page pair — the
# MinHash-LSH pipeline must recover exactly this set (recall AND precision)
_SQL_JACCARD_PAIRS = (
    f"WITH pages AS ({_SQL_PAGES_WITH_AMP}), "
    "sh AS (SELECT url, list_distinct(list_transform(generate_series(1, len(toks) - 2), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh "
    "FROM (SELECT url, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks "
    "FROM pages WHERE text <> '')) "
    "SELECT a.url AS url_a, b.url AS url_b FROM sh a JOIN sh b ON a.url < b.url "
    "WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
    "len(list_distinct(a.sh || b.sh)) >= 0.8"
)

_SQL_CATEGORY = (
    "CASE WHEN doc_id % 97 = 0 THEN 'unclassified' "
    "WHEN doc_id % 5 = 2 THEN 'purchase_order' "
    "WHEN doc_id % 5 IN (0, 3) THEN 'data_report' "
    "WHEN doc_id % 10 = 4 THEN 'invoice' "
    "ELSE 'unclassified' END"
)

# quality metrics mirrored from documentai_ray/stages/quality.py::score_text
_SQL_QUALITY_METRICS = """
  length(text) AS n_chars,
  len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens,
  len(list_distinct(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS uniq_tokens,
  len(list_filter(string_split(text, chr(10)), x -> length(x) >= 20)) AS good_lines,
  len(string_split(text, chr(10))) AS n_lines
"""

_SQL_QUALITY_DERIVED = """
  floor(CASE WHEN n_tokens > 0 THEN CAST(uniq_tokens AS DOUBLE) / n_tokens ELSE 0.0 END * 1e6) / 1e6 AS rep_ratio,
  floor(CAST(good_lines AS DOUBLE) / n_lines * 1e6) / 1e6 AS struct_ratio,
  floor((0.4 * (least(n_chars, 400) / 400.0)
       + 0.4 * (CASE WHEN n_tokens > 0 THEN CAST(uniq_tokens AS DOUBLE) / n_tokens ELSE 0.0 END)
       + 0.2 * (CAST(good_lines AS DOUBLE) / n_lines)) * 1e6) / 1e6 AS confidence
"""

_SQL_VERDICT = (
    "CASE WHEN n_chars = 0 THEN 're_scan' "
    "WHEN confidence >= 0.95 THEN 'direct_analysis' "
    "WHEN confidence >= 0.80 THEN 'pre_processing' "
    "WHEN confidence >= 0.60 THEN 'deep_analysis' "
    "ELSE 'reupload' END"
)


def _sql_md5_le64(col: str) -> str:
    """HUGEINT expression for the repo-standard u64 hash of a string
    column: md5 hex → first 8 bytes little-endian (same construction the
    fingerprint oracle uses, parameterized by column name)."""
    pows = ", ".join(f"CAST({256 ** i} AS HUGEINT)" for i in range(8))
    return (
        "list_sum(list_transform(generate_series(0, 7), i -> "
        f"(CAST(strpos('0123456789abcdef', substr(md5({col}), 2*i+1, 1)) - 1 AS HUGEINT) * 16 "
        f"+ CAST(strpos('0123456789abcdef', substr(md5({col}), 2*i+2, 1)) - 1 AS HUGEINT)) "
        f"* [{pows}][i + 1]))"
    )


def _sql_hex_slice16(hexcol: str, i: int) -> str:
    """BIGINT expression for the i-th 16-bit slice of a precomputed md5
    hex column (chars [4i, 4i+4)) — the count-min row-hash convention
    (sketches.countmin_cols): ONE md5 per token, d disjoint slices."""
    return ("(" + " + ".join(
        f"(strpos('0123456789abcdef', substr({hexcol}, {4 * i + j + 1}, 1))"
        f" - 1) * {16 ** (3 - j)}" for j in range(4)) + ")")


def _sql_hits(iters: int = 2) -> str:
    """Unrolled integer-ppm HITS oracle over the same 3-out graph as
    pagerank: per half-step a JOIN-groupby raw sum, a LEFT JOIN zero
    fill, a global-sum rescale CTE (cross join) — mirroring
    stages/graph.py::hits_int op-for-op incl. the floor division."""
    sql = (
        "WITH nn AS (SELECT count(*) AS cnt FROM documents), "
        "e AS (SELECT doc_id AS src, (doc_id * 7 + 1) % cnt AS dst "
        "FROM documents, nn UNION ALL "
        "SELECT doc_id, (doc_id * 13 + 2) % cnt FROM documents, nn "
        "UNION ALL "
        "SELECT doc_id, (doc_id * 31 + 3) % cnt FROM documents, nn), "
        "h0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS s "
        "FROM documents), "
    )
    prev_h = "h0"
    for i in range(1, iters + 1):
        for name, jsrc, jdst, feed in ((f"a{i}", "src", "dst", prev_h),
                                       (f"h{i}", "dst", "src", f"a{i}")):
            sql += (
                f"{name}r AS (SELECT e.{jdst} AS node, sum({feed}.s) AS raw "
                f"FROM e JOIN {feed} ON e.{jsrc} = {feed}.node "
                f"GROUP BY e.{jdst}), "
                f"{name}f AS (SELECT d.doc_id AS node, "
                f"coalesce({name}r.raw, 0) AS raw FROM documents d "
                f"LEFT JOIN {name}r ON d.doc_id = {name}r.node), "
                f"{name}t AS (SELECT greatest(sum(raw), 1) AS t "
                f"FROM {name}f), "
                f"{name} AS (SELECT node, CAST(raw * 1000000 // t "
                f"AS BIGINT) AS s FROM {name}f, {name}t), "
            )
        prev_h = f"h{i}"
    sql = sql.rstrip(", ")
    sql += (f" SELECT a{iters}.node, a{iters}.s AS auth_ppm, "
            f"h{iters}.s AS hub_ppm FROM a{iters} "
            f"JOIN h{iters} ON a{iters}.node = h{iters}.node")
    return sql


def _sql_pagerank_irregular(iters: int = 2) -> str:
    """Unrolled integer-ppm PageRank oracle over the irregular
    1–3-out graph (edge j exists when doc_id % 3 ≥ j), mirroring
    graph.py::pagerank_int's degree-table path op-for-op: contribution
    is ``r // deg`` with deg joined from the per-src count."""
    sql = (
        "WITH nn AS (SELECT count(*) AS cnt FROM documents), "
        "e AS (SELECT doc_id AS src, (doc_id * 7 + 1) % cnt AS dst "
        "FROM documents, nn UNION ALL "
        "SELECT doc_id, (doc_id * 13 + 2) % cnt FROM documents, nn "
        "WHERE doc_id % 3 >= 1 UNION ALL "
        "SELECT doc_id, (doc_id * 31 + 3) % cnt FROM documents, nn "
        "WHERE doc_id % 3 = 2), "
        "d AS (SELECT src, count(*) AS deg FROM e GROUP BY src), "
        "e2 AS (SELECT e.src, e.dst, d.deg FROM e JOIN d USING (src)), "
        "r0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS r "
        "FROM documents), "
    )
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        sql += (
            f"s{i} AS (SELECT e2.dst AS node, sum({prev}.r // e2.deg) "
            f"AS s FROM e2 JOIN {prev} ON e2.src = {prev}.node "
            f"GROUP BY e2.dst), "
            f"r{i} AS (SELECT {prev}.node, CAST(150000 + "
            f"(850000 * coalesce(s{i}.s, 0)) // 1000000 AS BIGINT) AS r "
            f"FROM {prev} LEFT JOIN s{i} ON {prev}.node = s{i}.node), "
        )
    sql = sql.rstrip(", ")
    sql += f" SELECT node, r AS rank_ppm FROM r{iters}"
    return sql


def _sql_pagerank(iters: int = 2) -> str:
    """Unrolled integer-ppm PageRank oracle over the deterministic 3-out
    link graph dst ∈ {(i·7+1), (i·13+2), (i·31+3)} mod N — one
    (contribution, update) CTE pair per iteration, mirroring
    stages/graph.py::pagerank_int op-for-op (floor divisions included)."""
    sql = (
        "WITH nn AS (SELECT count(*) AS cnt FROM documents), "
        "e AS (SELECT doc_id AS src, (doc_id * 7 + 1) % cnt AS dst "
        "FROM documents, nn UNION ALL "
        "SELECT doc_id, (doc_id * 13 + 2) % cnt FROM documents, nn "
        "UNION ALL "
        "SELECT doc_id, (doc_id * 31 + 3) % cnt FROM documents, nn), "
        "r0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS r "
        "FROM documents), "
    )
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        sql += (
            f"s{i} AS (SELECT e.dst AS node, sum({prev}.r // 3) AS s "
            f"FROM e JOIN {prev} ON e.src = {prev}.node GROUP BY e.dst), "
            f"r{i} AS (SELECT {prev}.node, CAST(150000 + "
            f"(850000 * coalesce(s{i}.s, 0)) // 1000000 AS BIGINT) AS r "
            f"FROM {prev} LEFT JOIN s{i} ON {prev}.node = s{i}.node), "
        )
    sql = sql.rstrip(", ")
    sql += f" SELECT node, r AS rank_ppm FROM r{iters}"
    return sql


def _sql_pq(m: int = 4, k: int = 4, iters: int = 2, dim: int = 64) -> str:
    """Unrolled product-quantization oracle: the kmeans CTE trio per
    subspace slice, all m final assignments joined on vec_id — mirrors
    similarity.py::pq_fit/pq_encode op-for-op."""
    sub = dim // m
    sql = "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        p = f"s{j}"
        sql += (
            f"e{j} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM e), "
            f"{p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 "
            f"AS BIGINT) AS cid, v FROM (SELECT vec_id, v FROM e{j} "
            f"ORDER BY vec_id LIMIT {k})), "
        )
        for i in range(1, iters + 1):
            prev = f"{p}c{i - 1}"
            sql += (
                f"{p}a{i} AS (SELECT vec_id, cid FROM ("
                f"SELECT e{j}.vec_id, {prev}.cid, row_number() OVER ("
                f"PARTITION BY e{j}.vec_id ORDER BY "
                f"list_distance(e{j}.v, {prev}.v), {prev}.cid) AS rn "
                f"FROM e{j} CROSS JOIN {prev}) WHERE rn = 1), "
                f"{p}m{i} AS (SELECT cid, list(mv ORDER BY dim) AS nv FROM ("
                f"SELECT cid, dim, avg(val) AS mv FROM ("
                f"SELECT {p}a{i}.cid AS cid, unnest(e{j}.v) AS val, "
                f"unnest(range(1, len(e{j}.v) + 1)) AS dim "
                f"FROM {p}a{i} JOIN e{j} ON {p}a{i}.vec_id = e{j}.vec_id) "
                f"GROUP BY cid, dim) GROUP BY cid), "
                f"{p}c{i} AS (SELECT {prev}.cid, coalesce({p}m{i}.nv, {prev}.v) "
                f"AS v FROM {prev} LEFT JOIN {p}m{i} "
                f"ON {prev}.cid = {p}m{i}.cid), "
            )
        sql += (
            f"fin{j} AS (SELECT vec_id, cid AS code_{j} FROM ("
            f"SELECT e{j}.vec_id, {p}c{iters}.cid, row_number() OVER ("
            f"PARTITION BY e{j}.vec_id ORDER BY "
            f"list_distance(e{j}.v, {p}c{iters}.v), {p}c{iters}.cid) AS rn "
            f"FROM e{j} CROSS JOIN {p}c{iters}) WHERE rn = 1), "
        )
    sql = sql.rstrip(", ")
    joins = " ".join(f"JOIN fin{j} ON fin0.vec_id = fin{j}.vec_id"
                     for j in range(1, m))
    cols = ", ".join(f"fin{j}.code_{j}" for j in range(m))
    sql += f" SELECT fin0.vec_id, {cols} FROM fin0 {joins}"
    return sql


def _sql_kmeans(k: int = 4, iters: int = 2) -> str:
    """Unrolled Lloyd's k-means oracle: one (assign, mean, centroid) CTE
    trio per iteration, then a final assignment. Mirrors
    stages/similarity.py::kmeans_fit op-for-op — first-k init, squared-L2
    argmin with lowest-cid tie-break (list_distance's sqrt is monotone),
    empty clusters keep the previous centroid via LEFT JOIN + coalesce."""
    sql = (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        "c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) "
        f"AS cid, v FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k})), "
    )
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        sql += (
            f"a{i} AS (SELECT vec_id, cid FROM ("
            f"SELECT e.vec_id, {prev}.cid, row_number() OVER ("
            f"PARTITION BY e.vec_id ORDER BY list_distance(e.v, {prev}.v), "
            f"{prev}.cid) AS rn FROM e CROSS JOIN {prev}) WHERE rn = 1), "
            f"m{i} AS (SELECT cid, list(mv ORDER BY dim) AS nv FROM ("
            f"SELECT cid, dim, avg(val) AS mv FROM ("
            f"SELECT a{i}.cid AS cid, unnest(e.v) AS val, "
            f"unnest(range(1, len(e.v) + 1)) AS dim "
            f"FROM a{i} JOIN e ON a{i}.vec_id = e.vec_id) "
            f"GROUP BY cid, dim) GROUP BY cid), "
            f"c{i} AS (SELECT {prev}.cid, coalesce(m{i}.nv, {prev}.v) AS v "
            f"FROM {prev} LEFT JOIN m{i} ON {prev}.cid = m{i}.cid), "
        )
    sql += (
        f"fin AS (SELECT e.vec_id, c{iters}.cid, row_number() OVER ("
        f"PARTITION BY e.vec_id ORDER BY list_distance(e.v, c{iters}.v), "
        f"c{iters}.cid) AS rn FROM e CROSS JOIN c{iters}) "
        "SELECT vec_id, cid AS cluster FROM fin WHERE rn = 1"
    )
    return sql


def _sql_lang_id(id_col: str, table_expr: str) -> str:
    """lang_id oracle, generated from the SAME profile dicts the engine
    uses (stages/textstats.py) so they cannot drift. Mirrors the two-stage
    heuristic op-for-op: stopword-hit argmax (strict-greater update over
    sorted codes → first-max-wins tie-break), char-n-gram fallback when no
    stopword fires. The word regex [A-Za-z]+ equals the engine's
    ``[^\\W\\d_]+`` on ASCII corpora (documents fixture is ASCII)."""
    from documentai_ray.stages.textstats import CHAR_NGRAM_PROFILES, LANG_PROFILES

    codes = ["de", "en", "es", "fr"]  # sorted() order in the Python loop

    def sql_list(vals):
        return "[" + ", ".join("'" + v.replace("'", "''") + "'" for v in sorted(vals)) + "]"

    hits = ", ".join(
        f"len(list_filter(toks, x -> list_contains({sql_list(LANG_PROFILES[c])}, x))) AS h_{c}"
        for c in codes
    )

    def gcount(c):
        terms = " + ".join(
            f"(length(low) - length(replace(low, '{g}', ''))) // {len(g)}"
            for g in sorted(CHAR_NGRAM_PROFILES[c])
        )
        return f"({terms}) AS g_{c}"

    grams = ", ".join(gcount(c) for c in codes)
    return (
        f"WITH t AS (SELECT {id_col}, lower(text) AS low, "
        "list_transform(regexp_extract_all(text, '[A-Za-z]+'), w -> lower(w)) AS toks "
        f"FROM {table_expr}), "
        f"h AS (SELECT {id_col}, low, len(toks) AS n, {hits} FROM t), "
        f"g AS (SELECT *, {grams} FROM h) "
        f"SELECT {id_col}, CASE "
        "WHEN n = 0 THEN 'und' "
        "WHEN h_de > 0 OR h_en > 0 OR h_es > 0 OR h_fr > 0 THEN "
        "CASE WHEN h_de >= greatest(h_en, h_es, h_fr) AND h_de > 0 THEN 'de' "
        "WHEN h_en >= greatest(h_es, h_fr) AND h_en > 0 THEN 'en' "
        "WHEN h_es >= h_fr AND h_es > 0 THEN 'es' ELSE 'fr' END "
        "WHEN g_de = 0 AND g_en = 0 AND g_es = 0 AND g_fr = 0 THEN 'und' "
        "ELSE CASE WHEN g_de >= greatest(g_en, g_es, g_fr) AND g_de > 0 THEN 'de' "
        "WHEN g_en >= greatest(g_es, g_fr) AND g_en > 0 THEN 'en' "
        "WHEN g_es >= g_fr AND g_es > 0 THEN 'es' ELSE 'fr' END "
        "END AS pred_lang FROM g"
    )


def _norm_strings(table):
    """Cast large_string → string so schemas line up with DuckDB output."""
    import pyarrow as pa

    fields = []
    for f in table.schema:
        if f.type == pa.large_string():
            fields.append(pa.field(f.name, pa.string()))
        else:
            fields.append(f)
    return table.cast(pa.schema(fields))


def _norm_strings_ds(ds):
    """Streaming variant of ``_norm_strings`` (no driver materialization)."""
    return ds.map_batches(_norm_strings, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# entry + queries
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship pipeline on sf0.001 (read → dedup → extract → quality →
    classify → entities → rules), returned as a Dataset."""
    from documentai_ray.pipelines.flagship import flagship

    return flagship(sf_dir="/root/testdata/sf0.001")


def _q_extract_text(sf_dir: str):
    from documentai_ray.pipelines.flagship import flagship  # noqa: F401
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256,
                        zero_copy_batch=True)
    # project to the dedup-relevant columns BEFORE the shuffle: the exchange
    # moves (url, ts, text) only — never payload or word boxes
    ds = ds.select_columns(["url", "warc_ts", "text"])
    ds = dedup_latest(ds)
    out = ds.select_columns(["url", "text"]).take_all()
    import pyarrow as pa

    return _norm_strings(pa.Table.from_pylist(out))


def _q_charset_extract(sf_dir: str):
    """Charset-sniffing extraction (WHATWG sniff order: BOM → strict
    UTF-8 → meta charset → cp1252 fallback) over a corpus where pages
    ship as UTF-8 / UTF-16-BOM / ISO-8859-1 / windows-1252 by
    ``doc_id % 4`` — the legacy variants carry head-only non-ASCII bytes
    that are invalid UTF-8, so only a decoder that actually honors the
    BOM/meta-charset recovers the golden text (real Common Crawl is
    ~5-10% legacy-encoded). Oracle: the encoding-independent golden."""
    import functools

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir, with_dups=False, encodings=True)
    ds = ds.map_batches(
        functools.partial(extract_batch, charset_sniff=True),
        batch_format="pyarrow", batch_size=256, zero_copy_batch=True)
    return _norm_strings_ds(ds.select_columns(["url", "text"]))


def _q_quality_pages(sf_dir: str):
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch
    from documentai_ray.stages.quality import quality_batch

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    ds = ds.select_columns(["url", "warc_ts", "text", "lang"])
    ds = dedup_latest(ds)
    ds = ds.map_batches(quality_batch, batch_format="pyarrow", batch_size=256)
    return ds.select_columns(
        ["url", "n_chars", "n_tokens", "uniq_tokens", "rep_ratio",
         "struct_ratio", "confidence", "verdict", "lang_ok"]
    )


def _q_classify_pages(sf_dir: str):
    from documentai_ray.pipelines.flagship import flagship

    ds = flagship(sf_dir=sf_dir)
    return ds.select_columns(["url", "category", "votes"])


def _q_entities_po(sf_dir: str):
    from documentai_ray.pipelines.flagship import flagship
    import pyarrow.compute as pc

    ds = flagship(sf_dir=sf_dir)
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("category"), "purchase_order")),
        batch_format="pyarrow",
    )
    return ds.select_columns(
        ["url", "po_number", "po_date", "seller", "buyer", "goods",
         "quantity", "unit", "currency", "total_amount", "incoterms"]
    )


def _q_entities_invoice(sf_dir: str):
    """Proforma-invoice extraction (M18): flat fields + nested
    ``goods_items: list<struct>`` parsed with the header-anchored
    rsplit(" ", 5) goods-table parser (reference
    entity_extraction_updated/extractor/performa_invoice.py:43-65)."""
    from documentai_ray.pipelines.flagship import flagship
    import pyarrow.compute as pc

    ds = flagship(sf_dir=sf_dir)
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("category"), "invoice")),
        batch_format="pyarrow",
    )
    return ds.select_columns(
        ["url", "inv_number", "inv_date", "seller", "buyer", "currency",
         "total_amount", "incoterms", "goods_items"]
    )


def _q_rules_po(sf_dir: str):
    from documentai_ray.pipelines.flagship import flagship
    import pyarrow.compute as pc

    ds = flagship(sf_dir=sf_dir)
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("category"), "purchase_order")),
        batch_format="pyarrow",
    )
    return ds.select_columns(["url", "rules_passed", "rules_failed", "overall_valid"])


def _q_preprocess_decision(sf_dir: str):
    """M15 preprocess decision as emitted by the flagship chain (quality →
    decision → classify): verdict → needs_preprocessing / operations /
    priority (reference gateway app.py:132-219)."""
    from documentai_ray.pipelines.flagship import flagship

    ds = flagship(sf_dir=sf_dir)
    return ds.select_columns(
        ["url", "verdict", "needs_preprocessing", "pp_operations", "pp_priority"]
    )


def _q_wordbox_match(sf_dir: str):
    """M23 entity↔word-box matching end-to-end on the PDF path: PO docs laid
    out as MINIPDF (line-preserving) → layout walk keeps ``word_boxes`` →
    ``extract_po`` on the walk text → ``match_entity_boxes`` (exact /
    consecutive-multi-word / substring, reference
    entity-extraction-service/app.py:890-966) → matched bbox columns per
    field. Oracle: the layout geometry's closed form (×2 walk scale,
    x = 36 + Σ(6·len+4), y = 50 + 100·block + 12·line)."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.functions.minipdf import build_from_lines
    from documentai_ray.sources.pages import is_malformed, po_lines, url_for
    from documentai_ray.stages.entities import extract_po, match_entity_boxes
    from documentai_ray.stages.extract import extract_batch

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])

    def gen(batch: pa.Table) -> pa.Table:
        urls, payloads = [], []
        for did, src in zip(batch.column("doc_id").to_pylist(),
                            batch.column("source").to_pylist()):
            if did % 5 != 2 or is_malformed(did):
                continue
            urls.append(url_for(did, src))
            payloads.append(build_from_lines(po_lines(did), shuffle_key=did)[0])
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(payloads, pa.large_binary())})

    ds = docs.map_batches(gen, batch_format="pyarrow", batch_size=256)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)

    fields = ["po_number", "po_date", "seller", "buyer", "total_amount"]

    def match(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {"url": batch.column("url").to_pylist()}
        for f in fields:
            for suf in ("page", "x0", "y0", "x1", "y1"):
                cols[f"{f}_{suf}"] = []
        for text, boxes in zip(batch.column("text").to_pylist(),
                               batch.column("word_boxes").to_pylist()):
            ents = extract_po(text)
            matched = match_entity_boxes({f: ents[f] for f in fields}, boxes)
            for f in fields:
                b = matched[f]
                cols[f"{f}_page"].append(b["page"] if b else None)
                for suf in ("x0", "y0", "x1", "y1"):
                    cols[f"{f}_{suf}"].append(b[suf] if b else None)
        out = {"url": pa.array(cols["url"], pa.string())}
        for f in fields:
            out[f"{f}_page"] = pa.array(cols[f"{f}_page"], pa.int64())
            for suf in ("x0", "y0", "x1", "y1"):
                out[f"{f}_{suf}"] = pa.array(cols[f"{f}_{suf}"], pa.float64())
        return pa.table(out)

    return ds.map_batches(match, batch_format="pyarrow")


def _q_docs_exact_dedup(sf_dir: str):
    import ray.data

    from documentai_ray.stages.dedup import dedup_exact_first

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang", "source"])
    out = dedup_exact_first(ds, id_col="doc_id", content_col="text")
    return out.select_columns(["doc_id", "lang", "source"])


def _q_token_stats(sf_dir: str):
    """Per-language token totals with per-batch partial aggregation
    (combiner before the groupby shuffle — SURVEY 'Aggregation at scale')."""
    import math

    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        # single-space split, empty pieces counted — exact mirror of the
        # oracle's len(string_split(text, ' ')) (ADVICE r1: .split() with no
        # arg diverges on runs of whitespace/tabs/newlines)
        toks = [len((t or "").split(" ")) for t in batch.column("text").to_pylist()]
        df = pd.DataFrame({"lang": langs, "toks": toks})
        g = df.groupby("lang", as_index=False).agg(
            total_tokens=("toks", "sum"), n_docs=("toks", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("total_tokens", alias_name="total_tokens"),
                   Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
    )
    agg["avg_tokens"] = [
        math.floor(t / n * 1e6) / 1e6
        for t, n in zip(agg["total_tokens"], agg["n_docs"])
    ]
    return agg[["lang", "n_docs", "total_tokens", "avg_tokens"]]


def _q_doc_quality(sf_dir: str):
    import ray.data

    from documentai_ray.stages.quality import quality_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    ds = ds.map_batches(quality_batch, batch_format="pyarrow", batch_size=512)
    return ds.select_columns(
        ["doc_id", "n_chars", "n_tokens", "uniq_tokens", "rep_ratio",
         "struct_ratio", "confidence", "verdict", "lang_ok"]
    )


def _q_events_hourly(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def add_hour(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "hour", pc.floor_temporal(batch.column("ts"), unit="hour")
        )

    agg = (
        ds.map_batches(add_hour, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    agg["sum_value"] = agg["sum_value"].round(2)
    return agg[["hour", "event_type", "n_events", "sum_value"]]


def _q_events_sessions(sf_dir: str):
    """Gap-based sessionization via the bucketed vectorized path (all users
    of a hash partition sessionized in one pandas pass — group count bounded
    by P, not by user cardinality)."""
    import ray.data

    from documentai_ray.stages.windows import session_windows

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    return session_windows(ds, key_col="user_id", ts_col="ts",
                           gap_minutes=30).select_columns(
        ["user_id", "n_sessions"])


def _q_q1_lineitem(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate with per-batch partial aggregation."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        df = batch.to_pandas()
        # money in EXACT integer cents: float summation order differs
        # between engines, and across ~10^5+ rows the drift exceeds any
        # rounding grid — integer partial sums are order-independent.
        # (int64 holds sums to ~9e18 ≈ 10^12 rows of 10^4-cent² values per
        # partial; beyond that, widen to two-level partials.)
        price_c = np.rint(df["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc_c = np.rint(df["l_discount"].to_numpy() * 100).astype("int64")
        df["_rev_c2"] = price_c * (100 - disc_c)   # price_cents × pct → 1e-4 units
        df["_base_c"] = price_c
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            _base_c=("_base_c", "sum"),
            _rev_c2=("_rev_c2", "sum"),
            n_rows=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                   Sum("_base_c", alias_name="_base_c"),
                   Sum("_rev_c2", alias_name="_rev_c2"),
                   Sum("n_rows", alias_name="n_rows"))
        .to_pandas()
    )
    agg["sum_qty"] = agg["sum_qty"].round(2)
    agg["sum_base_price"] = agg["_base_c"] / 100.0
    agg["sum_revenue"] = agg["_rev_c2"] / 10000.0
    return agg[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                "sum_revenue", "n_rows"]]


def _q_orders_by_nation(sf_dir: str):
    """Broadcast join: small dims (customer⋈nation) shipped via ray.put,
    looked up per batch — no shuffle of the fact table (SURVEY J-patterns)."""
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet",
                                   columns=["n_nationkey", "n_name"]).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    lookup = ray.put(dict(zip(dim["c_custkey"], dim["n_name"])))

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])

    def attach(batch: pa.Table) -> pa.Table:
        import numpy as np

        lk = ray.get(lookup)
        names = [lk.get(k) for k in batch.column("o_custkey").to_pylist()]
        cents = np.rint(batch.column("o_totalprice").to_numpy() * 100).astype("int64")
        out = batch.append_column("n_name", pa.array(names, pa.string()))
        return out.append_column("_price_c", pa.array(cents, pa.int64()))

    agg = (
        orders.map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_orders"),
                   Sum("_price_c", alias_name="_price_c"))
        .to_pandas()
    )
    agg["total_price"] = agg["_price_c"] / 100.0  # exact integer-cents sum
    return agg[["n_name", "n_orders", "total_price"]]


def _minhash_verified_pairs(sf_dir: str):
    """Shared helper: (pages(url,text) Dataset, verified-pairs Dataset) for
    the near-dup queries — LSH candidates verified with exact 3-shingle
    Jaccard ≥ 0.8 (broadcast or join-based verification auto-selected by
    corpus size, dedup.verify_jaccard_pairs)."""
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import lsh_candidate_pairs, verify_jaccard_pairs
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir, with_dups=False, with_near_dups=True)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    # materialize the (url, text) projection once: LSH, verification and
    # the caller's id pass all re-consume it, and each unpinned
    # consumption would re-run the extract chain over the corpus
    ds = ds.select_columns(["url", "text"]).materialize()
    cand = lsh_candidate_pairs(ds, id_col="url", num_perm=64, bands=16)
    return ds, verify_jaccard_pairs(ds, cand, threshold=0.8)


def _q_minhash_neardup(sf_dir: str):
    """MinHash-LSH near-dup pairs over the pages corpus (with planted
    near-dups), verified with exact 3-shingle Jaccard ≥ 0.8."""
    _, pairs = _minhash_verified_pairs(sf_dir)
    out = pairs.to_pandas()
    return out.rename(columns={"id_a": "url_a", "id_b": "url_b"})


def _q_minhash_dedup_keep(sf_dir: str):
    """Full near-dup dedup: verified pairs → distributed connected
    components (min-label propagation) → keep one representative (min url)
    per component. Output: surviving urls."""
    from documentai_ray.stages.dedup import neardup_components_auto
    import pyarrow.compute as pc

    pages, pairs = _minhash_verified_pairs(sf_dir)
    comp = neardup_components_auto(pages.select_columns(["url"]), pairs,
                                   id_col="url", max_iters=3,
                                   num_partitions=16)

    def survivors(batch):
        return batch.filter(
            pc.equal(batch.column("url"), batch.column("component"))
        ).select(["url"])

    return comp.map_batches(survivors, batch_format="pyarrow")


def _q_ppjoin_pairs(sf_dir: str):
    """EXACT set-similarity join via prefix filtering (PPJoin family) —
    deterministic-recall near-dup pairs, the LSH alternative with NO
    probabilistic misses: md5-ordered shingle prefixes as candidate keys
    (dedup.prefix_filter_pairs), exact-Jaccard verification.  Must equal
    the full-pairwise ground truth EXACTLY — the same oracle
    minhash_neardup uses, with recall guaranteed by construction here
    rather than by band/row tuning."""
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import (prefix_filter_pairs,
                                             verify_jaccard_pairs)
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir, with_dups=False, with_near_dups=True)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        batch_size=256)
    ds = ds.select_columns(["url", "text"]).materialize()
    cand = prefix_filter_pairs(ds, id_col="url", threshold=0.8,
                               num_partitions=16)
    out = verify_jaccard_pairs(ds, cand, threshold=0.8).to_pandas()
    return out.rename(columns={"id_a": "url_a", "id_b": "url_b"})


def _q_containment_pairs(sf_dir: str):
    """SET CONTAINMENT join (asymmetric near-dup): (sub, super) pairs
    where ≥ 80% of sub's 3-shingles appear in super — quotation /
    inclusion / template-wrapping detection, where Jaccard fails
    because the container can be arbitrarily larger. Exercises
    ``dedup.containment_candidate_pairs`` (sub side explodes only its
    pigeonhole prefix, container side is the inverted index) +
    ``verify_containment_pairs`` (integer ppm compare, inter/n_sub
    emitted for value comparison)."""
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import (containment_candidate_pairs,
                                             verify_containment_pairs)
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir, with_dups=False, with_near_dups=True)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        batch_size=256)
    ds = ds.select_columns(["url", "text"]).materialize()
    cand = containment_candidate_pairs(ds, id_col="url",
                                       threshold_ppm=800_000,
                                       num_partitions=16)
    return verify_containment_pairs(ds, cand, id_col="url",
                                    threshold_ppm=800_000)


def _q_jaccard_pairs(sf_dir: str):
    """Standalone blocked n-gram Jaccard: exact pairwise word-3-gram
    similarity ≥ 0.5 within ``source`` blocks, via the inverted-index
    co-occurrence counter (``dedup.blocked_jaccard_pairs``) — only doc
    pairs sharing ≥1 shingle are touched; no n²-per-block Python loop."""
    import pandas as pd
    import ray.data

    from documentai_ray.stages.dedup import blocked_jaccard_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "text"])
    out = blocked_jaccard_pairs(ds, id_col="doc_id", block_col="source",
                                threshold=0.5, k=3).to_pandas()
    if out.empty:
        out = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                            "id_b": pd.Series(dtype="int64")})
    return out


def _q_embedding_neardup(sf_dir: str):
    import ray.data

    from documentai_ray.stages.similarity import embedding_neardup_pairs

    import pandas as pd

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_neardup_pairs(ds, threshold=0.4).to_pandas()
    if out.empty:  # empty Dataset loses its schema through to_pandas
        out = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                            "id_b": pd.Series(dtype="int64")})
    return out


def _q_topk_similarity(sf_dir: str):
    import math

    import pyarrow.parquet as pq
    import ray.data

    from documentai_ray.stages.similarity import brute_force_topk

    q = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    query = next(r["embedding"] for r in q if r["vec_id"] == 0)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    top = brute_force_topk(ds, query, k=10, exclude_ids={0})
    top["score"] = [math.floor(s * 1e4) / 1e4 for s in top["score"]]
    return top


def _q_pdf_layout_text(sf_dir: str):
    """PDF layout walk path (reading-order). Non-SQL-expressible: the oracle
    is the generator's own walk-order construction, asserted in pytest;
    driver records rows-only."""
    import pyarrow as pa

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir, with_dups=False, pdf_mode=True)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=128)
    out = ds.select_columns(["url", "text", "payload_kind"]).take_all()
    return _norm_strings(pa.Table.from_pylist(out))


def _q_lang_id(sf_dir: str):
    import ray.data

    from documentai_ray.stages.textstats import lang_id_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    ds = ds.map_batches(lang_id_batch, batch_format="pyarrow", batch_size=512)
    return ds.select_columns(["doc_id", "pred_lang"])


def _q_lang_kappa(sf_dir: str):
    """Cohen's kappa between the stored ``lang`` label and the
    ``lang_id`` prediction (``aggregates.cohens_kappa_int``) — the
    chance-corrected model-vs-annotation agreement eval (raw accuracy
    rewards majority-class parroting; kappa subtracts what the
    marginals alone would agree on). Integer ppm with explicit
    trunc-toward-zero division (the SQL ``//`` semantics). ONE
    confusion-cell exchange bounded by |langs|²."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import cohens_kappa_int
    from documentai_ray.stages.textstats import lang_id_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
    ds = ds.map_batches(lang_id_batch, batch_format="pyarrow",
                        batch_size=512)
    return cohens_kappa_int(ds, col_a="lang", col_b="pred_lang")


def _q_lang_prf(sf_dir: str):
    """Per-class precision/recall/F1 of the lang_id prediction against
    the stored label (``aggregates.classification_prf_int``) — the
    class-level eval completing rank_auc (ranking) and lang_kappa
    (agreement): WHERE does the model fail. F1's harmonic mean clears
    to one integer division (2·tp·10⁶ // (2·tp+fp+fn)), so all three
    metrics are bit-exact in the nested lang_id SQL mirror. ONE
    confusion-cell exchange."""
    import ray.data

    from documentai_ray.stages.aggregates import classification_prf_int
    from documentai_ray.stages.textstats import lang_id_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
    ds = ds.map_batches(lang_id_batch, batch_format="pyarrow",
                        batch_size=512)
    return classification_prf_int(ds, true_col="lang",
                                  pred_col="pred_lang")


def _q_token_count_bpe(sf_dir: str):
    import ray.data

    from documentai_ray.stages.textstats import token_count_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow", batch_size=512)
    return ds.select_columns(["doc_id", "n_ws_tokens", "n_bpe_tokens"])


def _q_bpe_pair_counts(sf_dir: str):
    """Top-20 adjacent character-pair frequencies over the corpus — the
    inner kernel of BPE training, fully distributed: per-batch word-Counter
    combiner → one groupby over DISTINCT words → per-word pair expansion
    (still over the compact word table, not the corpus) → groupby pair.
    Both shuffles carry rows bounded by vocabulary size, not corpus size."""
    import collections

    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.bpe import word_freqs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    wf = word_freqs(ds)

    def expand(batch: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for w, n in zip(batch.column("word").to_pylist(),
                        batch.column("n").to_pylist()):
            for i in range(len(w) - 1):
                c[w[i:i + 2]] += n
        return pa.table({"pair": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    agg = (
        wf.map_batches(expand, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    agg = agg.sort_values(["n", "pair"], ascending=[False, True],
                          kind="mergesort")
    return agg.head(20).reset_index(drop=True)


def _q_bpe_train_merges(sf_dir: str):
    """First 3 BPE merges learned from the corpus (distributed word-count
    pass + driver merge loop over the compact vocab — stages/bpe.py). The
    oracle unrolls all 3 rounds in SQL: sentinel-delimited symbol strings,
    pair counts from adjacent list positions, argmax with the (n desc,
    lhs, rhs) tie-break, and a string `replace` as the merge pass (the
    left-to-right non-overlapping semantics both engines pin)."""
    import pandas as pd
    import ray.data

    from documentai_ray.stages.bpe import bpe_train_distributed

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    merges = bpe_train_distributed(ds, num_merges=3)
    return pd.DataFrame(
        {"rank": range(1, len(merges) + 1),
         "lhs": [m[0] for m in merges],
         "rhs": [m[1] for m in merges],
         "n": [m[2] for m in merges]}).astype(
             {"rank": "int64", "n": "int64"})


def _q_bpe_encode(sf_dir: str):
    """Per-document token count under the fixed PRETRAINED_MERGES table
    (train once / encode everywhere — the map-only production shape).
    Per-batch distinct-word cache inside the stage; the oracle applies the
    same merges as nested sentinel-string replaces."""
    import ray.data

    from documentai_ray.stages.bpe import BpeEncodeStage

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    ds = ds.map_batches(BpeEncodeStage(), batch_format="pyarrow",
                        batch_size=512)
    return ds.select_columns(["doc_id", "n_bpe_tokens"])


def _q_fingerprint(sf_dir: str):
    """Winnowing document fingerprint (rolling md5-token polynomial hash,
    content-defined anchors, XOR-reduced). Emitted as SIGNED int64 (the
    uint64 value wrapped) so both engines compare in a lossless dtype —
    the oracle reconstructs the md5→LE64→window-hash→anchor→bit_xor chain
    entirely in SQL (HUGEINT modular arithmetic)."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.textstats import fingerprint_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    ds = ds.map_batches(fingerprint_batch, batch_format="pyarrow", batch_size=512)

    def signed(batch: pa.Table) -> pa.Table:
        import numpy as np

        u = batch.column("fingerprint").to_numpy().astype(np.uint64)
        s = u.astype(np.int64)  # two's-complement wrap
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fingerprint": pa.array(s, pa.int64())})

    return ds.map_batches(signed, batch_format="pyarrow")


# SimHash screening radius for url-variant recaptures. 64-bit unigram
# SimHash of a page vs the same page plus ONE trailing token measures 0-10
# bits on this corpus (token-set deltas flip bits where the bit-vote margin
# is small); 20 gives 2× headroom while staying far below the ~32-bit
# expectation for unrelated pages. NOT a general near-dup radius: template
# twins (two POs differing only in digits) measure as low as 4-5 bits, so a
# corpus-wide Hamming ball at this radius needs an exact-similarity verify
# behind it (the MinHash→Jaccard path; simhash_candidate_pairs is the
# banded generator for that).
SIMHASH_VARIANT_MAX_HAMMING = 20


def _q_simhash_hamming(sf_dir: str):
    """SimHash screen of url-variant recaptures (?amp=1 ↔ base url), fully
    distributed: fingerprint per batch → partitioned hash join of the
    variant side onto its base url → vectorized 64-bit popcount filter at
    ``SIMHASH_VARIANT_MAX_HAMMING``. No driver-side materialization — the
    only exchange moves (url, simhash) projections."""
    import numpy as np
    import pyarrow as pa

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import add_simhash
    from documentai_ray.stages.extract import extract_batch
    from documentai_ray.stages.joins import hash_join

    ds = pages_dataset(sf_dir, with_dups=False, with_near_dups=True)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    ds = add_simhash(ds.select_columns(["url", "text"])).drop_columns(["text"])

    suffix = "?amp=1"

    def base_side(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(
            pc.invert(pc.ends_with(batch.column("url"), pattern=suffix)))
        return pa.table({"url_a": t.column("url"),
                         "simhash_a": t.column("simhash")})

    def amp_side(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.ends_with(batch.column("url"), pattern=suffix))
        bases = [u[: -len(suffix)] for u in t.column("url").to_pylist()]
        return pa.table({"url_a": pa.array(bases, pa.string()),
                         "url_b": t.column("url"),
                         "simhash_b": t.column("simhash")})

    joined = hash_join(
        ds.map_batches(base_side, batch_format="pyarrow"),
        ds.map_batches(amp_side, batch_format="pyarrow"),
        on="url_a",
    )

    def verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.is_valid(batch.column("url_b")))
        if t.num_rows == 0:
            return pa.table({"url_a": pa.array([], pa.string()),
                             "url_b": pa.array([], pa.string())})
        ha = t.column("simhash_a").to_numpy().astype(np.uint64)
        hb = t.column("simhash_b").to_numpy().astype(np.uint64)
        x = ha ^ hb
        lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
        dist = np.zeros(len(x), dtype=np.int64)
        for shift in range(0, 64, 8):
            dist += lut[((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.int64)]
        keep = dist <= SIMHASH_VARIANT_MAX_HAMMING
        return pa.table({"url_a": t.column("url_a").filter(pa.array(keep)),
                         "url_b": t.column("url_b").filter(pa.array(keep))})

    return joined.map_batches(verify, batch_format="pyarrow")


_GROUP_CATS = ["data_report", "purchase_order", "report_misc"]


def _q_group_pages(sf_dir: str):
    """A4 page→output-group segmentation (documentClassifier.py:1045-1080):
    consecutive same-category pages share a group, capped at
    ``max_pages_per_group=2``; ``purchase_order`` is ``always_separate``
    (singleton groups). Page-category sequences are synthesized
    deterministically per doc (3-8 pages, runs up to 3); the segmentation
    runs per row (ordered in-row list — never a global sort), exploded to
    (doc_id, page_num, category, group_id) rows for the oracle."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.preprocess import group_pages

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def explode(batch: pa.Table) -> pa.Table:
        d_out, p_out, c_out, g_out = [], [], [], []
        for doc_id in batch.column("doc_id").to_pylist():
            n = 3 + doc_id % 6
            cats = [_GROUP_CATS[((doc_id + i) // 3) % 3] for i in range(n)]
            gids = group_pages(cats, max_pages_per_group=2,
                               always_separate=("purchase_order",))
            for i, (c, g) in enumerate(zip(cats, gids)):
                d_out.append(doc_id); p_out.append(i + 1)
                c_out.append(c); g_out.append(g)
        return pa.table({"doc_id": pa.array(d_out, pa.int64()),
                         "page_num": pa.array(p_out, pa.int64()),
                         "category": pa.array(c_out, pa.string()),
                         "group_id": pa.array(g_out, pa.int64())})

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=512)


def _q_category_summary(sf_dir: str):
    """A5 analog: per-category roll-up (files/pages/avg-confidence shape of
    the reference's pdf_summary, classification-service/app.py:366-421)."""
    import math

    from ray.data.aggregate import Count, Sum

    from documentai_ray.pipelines.flagship import flagship

    agg = (
        flagship(sf_dir=sf_dir)
        .groupby("category")
        .aggregate(Count(alias_name="n_docs"),
                   Sum("n_chars", alias_name="total_chars"),
                   Sum("confidence", alias_name="_conf_sum"))
        .to_pandas()
    )
    agg["avg_confidence"] = [
        math.floor(s / n * 1e6) / 1e6 for s, n in zip(agg["_conf_sum"], agg["n_docs"])
    ]
    return agg[["category", "n_docs", "total_chars", "avg_confidence"]]


def _q_vote_distribution(sf_dir: str):
    """A2 analog: confidence ("k/4") distribution across the corpus."""
    from ray.data.aggregate import Count

    from documentai_ray.pipelines.flagship import flagship

    return (
        flagship(sf_dir=sf_dir)
        .groupby(["category", "votes"])
        .aggregate(Count(alias_name="n_docs"))
    )


def _q_ann_ivf(sf_dir: str):
    """IVF-flat ANN top-10, full probe (nprobe=nlist): exercises the whole
    distributed IVF machinery — centroid train, broadcast index, per-batch
    assignment matmul, probe filter, exact re-rank, partial top-k — with a
    result that equals brute-force top-10 BY CONSTRUCTION, so the exact
    SQL oracle holds at every scale. The sub-linear approximate regime
    (nprobe<nlist) has no scale-stable exact oracle — its recall margin
    collapses as the corpus outgrows the trained cells (measured: recall
    1.0 needs nprobe≥10 at sf0.01 but ≥15 at sf0.1) — so that regime is
    pinned by the planted-cluster recall tests in
    tests/test_dedup_similarity.py instead; nprobe is the documented
    recall/throughput scale knob."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from documentai_ray.stages.similarity import IVFIndex, ivf_topk

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    sample = np.asarray(tbl.column("embedding").to_pylist()[:512], dtype=np.float64)
    query = np.asarray(
        next(r["embedding"] for r in tbl.to_pylist() if r["vec_id"] == 0),
        dtype=np.float64,
    )
    index = IVFIndex(nlist=16, nprobe=16).train(sample)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(ds, query, k=10, index=index, exclude_ids={0})[["vec_id"]]


def _q_q5_local_revenue(sf_dir: str):
    """TPC-H-Q5-style composition: lineitem ⋈ orders via a partitioned
    ``hash_join`` (BOTH fact-adjacent sides large — orders is 1.5B rows at
    sf1000, never driver-broadcastable), with only the genuinely small
    dims (customer/supplier/nation, ≤ O(10⁵) rows) broadcast as ``ray.put``
    lookups inside ``map_batches``. After the join, rows filter to
    cust_nation == supp_nation and pre-aggregate per batch, so only the
    tiny per-nation partials shuffle into the final groupby."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.joins import hash_join

    def load(name, cols):
        return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=cols).to_pandas()

    customer = load("customer", ["c_custkey", "c_nationkey"])
    supplier = load("supplier", ["s_suppkey", "s_nationkey"])
    nation = load("nation", ["n_nationkey", "n_name"])

    cust_to_nation = ray.put(dict(zip(customer["c_custkey"], customer["c_nationkey"])))
    supp_to_nation = ray.put(dict(zip(supplier["s_suppkey"], supplier["s_nationkey"])))
    nation_name = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        price_c = np.rint(batch.column("l_extendedprice").to_numpy() * 100).astype("int64")
        disc_c = np.rint(batch.column("l_discount").to_numpy() * 100).astype("int64")
        sn = ray.get(supp_to_nation)
        supp_nation = pa.array(
            [sn.get(k, -1) for k in batch.column("l_suppkey").to_pylist()],
            pa.int64())
        return pa.table({"orderkey": batch.column("l_orderkey"),
                         "supp_nation": supp_nation,
                         "rev_c2": pa.array(price_c * (100 - disc_c), pa.int64())})

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])

    def o_prep(batch: pa.Table) -> pa.Table:
        cn = ray.get(cust_to_nation)
        cust_nation = pa.array(
            [cn.get(k, -2) for k in batch.column("o_custkey").to_pylist()],
            pa.int64())
        return pa.table({"orderkey": batch.column("o_orderkey"),
                         "cust_nation": cust_nation})

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        orders.map_batches(o_prep, batch_format="pyarrow"),
        on="orderkey",
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["cust_nation"] == df["supp_nation"]]
        if df.empty:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "rev_c2": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64())})
        names = ray.get(nation_name)
        df["n_name"] = df["cust_nation"].map(names)
        g = df.groupby("n_name", as_index=False).agg(
            rev_c2=("rev_c2", "sum"), n_items=("rev_c2", "size"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev_c2", alias_name="_rev_c2"),
                   Sum("n_items", alias_name="n_items"))
        .to_pandas()
    )
    agg["revenue"] = agg["_rev_c2"] / 10000.0
    return agg[["n_name", "n_items", "revenue"]]


def _q_events_sliding(sf_dir: str):
    """Sliding-window aggregate (60-min window, 15-min slide)."""
    import ray.data

    from documentai_ray.stages.windows import sliding_window_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
    return sliding_window_agg(ds, window_minutes=60, slide_minutes=15)


def _q_rnn_pairs(sf_dir: str):
    """Reciprocal nearest neighbors under max inner product: embedding
    pairs that are each other's best match — the mutual-best filter of
    entity resolution / semantic dedup. Exercises
    ``similarity.mips_rnn_pairs``: int64-quantized exact dots (no
    cosine division anywhere), smallest-id tie-break, per-batch block ×
    corpus matmul against the broadcast matrix, one bounded self-join
    of the n-row best-match table for mutuality."""
    import ray.data

    from documentai_ray.stages.similarity import mips_rnn_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return mips_rnn_pairs(ds, id_col="vec_id", vec_col="embedding")


def _q_mean_embedding(sf_dir: str):
    """Per-label embedding centroid sufficient statistics — the class-
    prototype computation behind cluster seeding / domain signatures.
    Exercises ``similarity.grouped_centroid``: components quantized to
    int64 BEFORE summing so the per-group sum is associative (bit-
    identical at any parallelism / in any engine); one vectorized
    np.add.at pass per block ships ≤ keys × dims partial rows, one tiny
    exchange sums them."""
    import ray.data

    from documentai_ray.stages.similarity import grouped_centroid

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])
    return grouped_centroid(ds, key_col="label", vec_col="embedding")


def _q_kmv_intersect(sf_dir: str):
    """Audience overlap via KMV θ-sketch INTERSECTION: estimated count
    of users who both clicked AND purchased, without co-locating the
    two sets — each side ships only its k smallest distinct user-hash
    values, the combine is sketch algebra on ≤2k integers. Exercises
    ``sketches.kmv_intersect_sets``; integer end to end, so the SQL
    mirror (row_number θ, HUGEINT divisions) lands bit-identically."""
    import ray.data

    from documentai_ray.stages.sketches import kmv_intersect_sets

    def side(t):
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type"],
        ).filter(expr=f"event_type == '{t}'")

    return kmv_intersect_sets(side("click"), side("purchase"),
                              val_col="user_id", k=64)


def _q_kmv_difference(sf_dir: str):
    """Audience set DIFFERENCE via θ-sketch: estimated count of users
    who clicked but never purchased (and vice versa), completing the
    sketch set algebra (union / intersect / difference) — still no
    co-location of the sets, ≤ k hashes per side per block. Exercises
    ``sketches.kmv_difference_sets``; bit-identical SQL mirror."""
    import ray.data

    from documentai_ray.stages.sketches import kmv_difference_sets

    def side(t):
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type"],
        ).filter(expr=f"event_type == '{t}'")

    return kmv_difference_sets(side("click"), side("purchase"),
                               val_col="user_id", k=64)


def _q_copurchase_pairs(sf_dir: str):
    """Market-basket co-occurrence: part pairs ordered together in ≥ 2
    orders — frequently-bought-together / co-citation. Exercises
    ``graph.cooccurrence_pairs``: one basket-hash exchange, per-basket
    vectorized distinct + self-merge pair emission pre-combined to
    per-partition pair counts, second exchange bounded by distinct
    pairs (not pair instances), loud ``max_basket`` skew guard."""
    import ray.data

    from documentai_ray.stages.graph import cooccurrence_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])
    return cooccurrence_pairs(ds, basket_col="l_orderkey",
                              item_col="l_partkey", min_support=2,
                              num_partitions=32)


def _q_grouped_mode(sf_dir: str):
    """Per-user dominant action: statistical MODE of event_type per
    user_id, count ties broken toward the lexicographically smallest
    type. Exercises ``aggregates.grouped_mode``: per-batch (key, value)
    count pre-combine, ONE key-hash exchange bounded by
    keys × distinct values, per-partition sum + single-sort argmax."""
    import ray.data

    from documentai_ray.stages.aggregates import grouped_mode

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return grouped_mode(ds, key_col="user_id", val_col="event_type",
                        num_partitions=32)


def _q_pareto_parts(sf_dir: str):
    """Distributed skyline (Pareto frontier): parts not dominated on
    (minimize retail price, maximize size) — the multi-objective
    reduction behind "cheapest for its quality tier" curation picks.
    Exercises ``aggregates.pareto_frontier``: skylines compose, so a
    map-side vectorized dominance pass keeps each block's frontier and
    ONE final task reduces the (small) survivor union — no shuffle.
    Exact ties all survive, matching the SQL NOT-EXISTS strict-clause
    skyline; price compared in exact cents."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import pareto_frontier

    def prep(batch: pa.Table) -> pa.Table:
        import numpy as np
        c = np.rint(batch.column("p_retailprice").to_numpy() * 100
                    ).astype("int64")
        return pa.table({
            "p_partkey": batch.column("p_partkey"),
            "p_size": batch.column("p_size").cast(pa.int64()),
            "price_c": pa.array(c, pa.int64()),
        })

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice"],
    ).map_batches(prep, batch_format="pyarrow")
    return pareto_frontier(ds, maximize=["p_size"], minimize=["price_c"])


def _q_band_join_balances(sf_dir: str):
    """Numeric tolerance (band / ε) join — the non-equi join class a
    naive plan can only express as a cross join: every (customer,
    supplier) pair whose account balances are within $5.00.  Exercises
    ``joins.band_join``: delta-width bucketing, right side replicated to
    the 3 adjacent buckets so each qualifying pair meets exactly once,
    ONE bucket-hash exchange, vectorized in-partition merge + exact
    integer |diff| ≤ delta filter.  Balances compared in exact cents —
    no float crosses the engine boundary."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.joins import band_join

    def cents(src: str, dst: str):
        def f(batch: pa.Table) -> pa.Table:
            import numpy as np
            c = np.rint(batch.column(src).to_numpy() * 100).astype("int64")
            return (batch.drop_columns([src])
                    .append_column(dst, pa.array(c, pa.int64())))
        return f

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(cents("c_acctbal", "c_bal_c"), batch_format="pyarrow")
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    ).map_batches(cents("s_acctbal", "s_bal_c"), batch_format="pyarrow")

    out = band_join(cust, supp, left_on="c_bal_c", right_on="s_bal_c",
                    delta=500, num_partitions=32)
    return out.select_columns(["c_custkey", "s_suppkey",
                               "c_bal_c", "s_bal_c"])


def _q_overlap_join_windows(sf_dir: str):
    """Distributed interval-overlap join (range × range, NO equi-key,
    both sides distributed): each order's active window
    [orderdate, orderdate + orderkey%20 days] paired with every audit
    window it intersects. Exercises ``joins.overlap_join``: fixed-grid
    tiling (64-day tiles), each interval replicated to the tiles it
    touches, pairs emitted only from the tile containing
    max(starts) — one guard predicate instead of a pair-dedup exchange.
    All endpoints in integer epoch days; audit windows derived
    deterministically from supplier keys (every 10th supplier)."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.joins import overlap_join

    def orders_iv(batch: pa.Table) -> pa.Table:
        import numpy as np
        d = batch.column("o_orderdate").to_numpy().astype(
            "datetime64[us]").astype("int64") // 86_400_000_000
        k = batch.column("o_orderkey").to_numpy().astype("int64")
        return pa.table({"o_orderkey": pa.array(k, pa.int64()),
                         "o_start": pa.array(d, pa.int64()),
                         "o_end": pa.array(d + k % 20, pa.int64())})

    def audit_iv(batch: pa.Table) -> pa.Table:
        import numpy as np
        k = batch.column("s_suppkey").to_numpy().astype("int64")
        k = k[k % 10 == 0]
        s = 8035 + (k * 131) % 2300
        return pa.table({"s_suppkey": pa.array(k, pa.int64()),
                         "a_start": pa.array(s, pa.int64()),
                         "a_end": pa.array(s + k % 30 + 5, pa.int64())})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(orders_iv, batch_format="pyarrow")
    audits = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey"]
    ).map_batches(audit_iv, batch_format="pyarrow")

    return overlap_join(orders, audits,
                        left_start="o_start", left_end="o_end",
                        right_start="a_start", right_end="a_end",
                        tile=64, num_partitions=32)


def _q_q3_topn(sf_dir: str):
    """TPC-H-Q3-shaped 3-table plan: BUILDING-segment customers'
    unshipped-revenue top 10 — a distributed SEMI join (orders filtered
    by the customer segment WITHOUT carrying customer columns), a
    partitioned hash join of the two fact tables, map-side partial
    aggregation in exact cents, and a global sort+limit on the tiny
    aggregated result. The multi-join planning pattern: semi joins for
    EXISTS-style filters, inner joins only where columns are needed."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.joins import hash_join

    cutoff = np.datetime64("1995-03-15T00:00:00", "us")

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).filter(expr="c_mktsegment == 'BUILDING'").select_columns(["c_custkey"])

    def o_prep(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy().astype("datetime64[us]")
        keep = d < cutoff
        t = batch.filter(pa.array(keep))
        return pa.table({"c_custkey": t.column("o_custkey"),
                         "o_orderkey": t.column("o_orderkey"),
                         "o_orderdate": t.column("o_orderdate"),
                         "o_orderpriority": t.column("o_orderpriority")})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
    ).map_batches(o_prep, batch_format="pyarrow")
    orders = hash_join(orders, cust, on="c_custkey", how="semi",
                       num_partitions=32).drop_columns(["c_custkey"]
                                                       ).materialize()

    def li_prep(batch: pa.Table) -> pa.Table:
        d = batch.column("l_shipdate").to_numpy().astype("datetime64[us]")
        t = batch.filter(pa.array(d > cutoff))
        price_c = np.rint(t.column("l_extendedprice").to_numpy() * 100
                          ).astype("int64")
        disc_c = np.rint(t.column("l_discount").to_numpy() * 100
                         ).astype("int64")
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "rev_c2": pa.array(price_c * (100 - disc_c),
                                            pa.int64())})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    ).map_batches(li_prep, batch_format="pyarrow")

    joined = hash_join(li, orders, on="o_orderkey", num_partitions=32)
    agg = (joined.groupby("o_orderkey")
           .aggregate(Sum("rev_c2", alias_name="_rev_c2")))
    top = (agg.sort(["_rev_c2", "o_orderkey"], descending=[True, False])
           .limit(10).to_pandas())
    # re-attach the order attributes for the surviving 10 keys only
    # (orders is materialized above: both consumers reuse its blocks)
    keys = set(top["o_orderkey"].tolist())

    def keep10(batch: pa.Table) -> pa.Table:
        mask = [k in keys for k in batch.column("o_orderkey").to_pylist()]
        return batch.filter(pa.array(mask))

    attrs = (orders.map_batches(keep10, batch_format="pyarrow")
             .to_pandas()[["o_orderkey", "o_orderdate", "o_orderpriority"]])
    out = top.merge(attrs, on="o_orderkey")
    out["revenue"] = out.pop("_rev_c2") / 10000.0
    return out[["o_orderkey", "revenue", "o_orderdate", "o_orderpriority"]]


def _q_retention_cohorts(sf_dir: str):
    """Weekly retention cohorts — the product-analytics staple: users
    grouped by their FIRST event week, distinct-user counts per
    (cohort_week, week_offset). Physical plan: per-batch distinct
    (user, week) pre-combine shrinks the ONE user-hash exchange; each
    partition then resolves ALL its users in one vectorized pass
    (global distinct → per-user min → offsets → partial counts), and a
    tiny (cohort, offset) exchange sums the partials — no join, and
    distinctness is guaranteed where the key is co-located."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.dedup import _add_pkey

    def weeks(batch: pa.Table) -> pa.Table:
        import pandas as pd
        wk = (batch.column("ts").to_numpy().astype("datetime64[us]")
              .astype("int64") // (604_800 * 1_000_000))
        # per-batch dedup shrinks the exchange; GLOBAL distinctness is
        # established per user partition below (a batch-level dedup
        # alone would double-count pairs that span blocks)
        df = pd.DataFrame({"user_id": batch.column("user_id").to_numpy(),
                           "wk": wk}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    pairs = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(weeks, batch_format="pyarrow")

    def per_partition(g):
        import pandas as pd
        g = g.drop_duplicates(subset=["user_id", "wk"])
        first = g.groupby("user_id", sort=False)["wk"].transform("min")
        out = pd.DataFrame({"cohort_week": first,
                            "week_offset": g["wk"] - first})
        return (out.groupby(["cohort_week", "week_offset"], sort=False)
                .size().reset_index(name="_n"))

    partials = (_add_pkey(pairs, "user_id", 32)
                .groupby("_pkey")
                .map_groups(lambda g: per_partition(
                    g.drop(columns=["_pkey"])), batch_format="pandas"))
    return (partials.groupby(["cohort_week", "week_offset"])
            .aggregate(Sum("_n", alias_name="n_users")))


def _q_sliding_unique_users(sf_dir: str):
    """Trailing-24h unique users, per hour — the live-audience metric.
    Exercises ``windows.sliding_distinct_count``: instead of expanding
    every (user, hour) pair 24× or running COUNT DISTINCT per window,
    each user's observed hours open [h, h+24) intervals, islands merge
    per user, and ±1 island-boundary deltas cumsum'd over the bounded
    hour axis give the exact distinct count per hour."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.windows import sliding_distinct_count

    def hours(batch: pa.Table) -> pa.Table:
        h = (batch.column("ts").to_numpy().astype("datetime64[us]")
             .astype("int64") // 3_600_000_000)
        return pa.table({"user_id": batch.column("user_id"),
                         "hour": pa.array(h, pa.int64())})

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"]
                               ).map_batches(hours, batch_format="pyarrow")
    return sliding_distinct_count(ds, key_col="user_id",
                                  bucket_col="hour", width=24,
                                  num_partitions=32)


def _q_segment_digests(sf_dir: str):
    """Merkle-style SEGMENT digests — the anti-entropy primitive behind
    replica reconciliation: instead of one whole-table checksum
    (table_checksum), a digest per key-range segment (custkey // 100)
    so two replicas can binary-search WHICH ranges differ and resync
    only those. Same wrapping mod-2⁶⁴ sum of md5-LE64 row hashes,
    2³²-split (hi, lo) partials so no engine-side overflow, one
    segment-keyed exchange, Python-bignum reassembly."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.sketches import md5_le64

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        keys = batch.column("c_custkey").to_pylist()
        names = batch.column("c_name").to_pylist()
        segs = [k // 100 for k in keys]
        acc: dict[int, list] = {}
        for sg, k, nm in zip(segs, keys, names):
            h = md5_le64(f"{k}|{nm}")
            st = acc.setdefault(sg, [0, 0])
            st[0] = (st[0] + h) % (1 << 64)
            st[1] += 1
        out = pd.DataFrame(
            [(sg, st[1], st[0] >> 32, st[0] & 0xFFFFFFFF)
             for sg, st in acc.items()],
            columns=["segment", "n_rows", "hi", "lo"])
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    agg = (ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("segment")
           .aggregate(Sum("n_rows", alias_name="n_rows"),
                      Sum("hi", alias_name="hi"),
                      Sum("lo", alias_name="lo")))

    def derive(batch: pa.Table) -> pa.Table:
        out = []
        for hi, lo in zip(batch.column("hi").to_pylist(),
                          batch.column("lo").to_pylist()):
            v = ((hi << 32) + lo) % (1 << 64)
            out.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pa.table({"segment": batch.column("segment"),
                         "n_rows": batch.column("n_rows"),
                         "digest": pa.array(out, pa.int64())})

    return agg.map_batches(derive, batch_format="pyarrow")


def _q_user_coverage(sf_dir: str):
    """Active-time coverage per user: each event opens a 300-second
    window; overlapping windows must not double-count, so the metric is
    the UNION length of each user's intervals. Exercises
    ``windows.interval_coverage`` — distributed gaps-and-islands: one
    key-hash exchange, per-partition vectorized grouped-cummax island
    merge, Σ(max end − min start) per island."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.windows import interval_coverage

    def iv(batch: pa.Table) -> pa.Table:
        s = (batch.column("ts").to_numpy().astype("datetime64[us]")
             .astype("int64") // 1_000_000)
        return pa.table({"user_id": batch.column("user_id"),
                         "s": pa.array(s, pa.int64()),
                         "e": pa.array(s + 300, pa.int64())})

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"]
                               ).map_batches(iv, batch_format="pyarrow")
    return interval_coverage(ds, key_col="user_id", start_col="s",
                             end_col="e", num_partitions=32)


def _q_quantity_dense_rank(sf_dir: str):
    """dense_rank() of each lineitem's quantity within its returnflag
    group — rank over distinct values, no gaps after ties; completes
    the distributed rank-window family. Same collapsed plan as
    quantity_percentile: one bounded histogram exchange + broadcast
    lookup, rows never shuffle
    (``aggregates.grouped_dense_rank``)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import grouped_dense_rank

    def prep(batch: pa.Table) -> pa.Table:
        q = np.rint(batch.column("l_quantity").to_numpy()).astype("int64")
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "l_linenumber": batch.column("l_linenumber"),
                         "l_returnflag": batch.column("l_returnflag"),
                         "qty": pa.array(q, pa.int64())})

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag",
                 "l_quantity"],
    ).map_batches(prep, batch_format="pyarrow")
    out = grouped_dense_rank(ds, key_col="l_returnflag", val_col="qty")
    return out.select_columns(["l_orderkey", "l_linenumber",
                               "dense_rank"])


def _q_global_index(sf_dir: str):
    """zipWithIndex: assign every document a contiguous 0-based GLOBAL
    index under ``ORDER BY (n_chars, doc_id)`` — the stable sample-id /
    curriculum-position assignment, computed with NO global sort
    (``aggregates.global_row_index``): one histogram exchange bounded
    by distinct n_chars values + one tie-group exchange with a
    vectorized cumcount; block layout never affects the result."""
    import ray.data

    from documentai_ray.stages.aggregates import global_row_index

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])
    out = global_row_index(ds, val_col="n_chars", tiebreak_col="doc_id")
    return out.select_columns(["doc_id", "row_idx"])


def _q_record_linkage(sf_dir: str):
    """Record linkage / entity resolution (Fellegi–Sunter shape): match
    the customer master against a synthesized dirty CRM extract of
    itself (deterministic per-row perturbations: custkey%3==0 drops the
    name's last char, %3==1 upper-cases it, balance shifts by
    custkey%7−3 cents). Blocking on (nationkey, mktsegment) bounds
    candidate pairs; agreement weights — exact normalized name +40,
    else edit-distance ≤ 1 +35, |balance diff| ≤ 3¢ +25 — keep pairs at
    score ≥ 60. ONE block-key exchange, scoring fused into the join
    partition (``stages/linkage.py``); the ≤1-edit comparator is the
    O(len) single-pass check, not a DP matrix."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.linkage import blocked_linkage, within_edit1

    def prep_left(batch: pa.Table) -> pa.Table:
        names = batch.column("c_name").to_pylist()
        nk = batch.column("c_nationkey").to_numpy()
        seg = batch.column("c_mktsegment").to_pylist()
        bal = np.rint(batch.column("c_acctbal").to_numpy() * 100
                      ).astype("int64")
        return pa.table({
            "c_custkey": batch.column("c_custkey"),
            "name_n": pa.array([n.lower() for n in names], pa.string()),
            "bal": pa.array(bal, pa.int64()),
            "block": pa.array([f"{k}|{s}" for k, s in zip(nk, seg)],
                              pa.string()),
        })

    def prep_right(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy()
        names = batch.column("c_name").to_pylist()
        nk = batch.column("c_nationkey").to_numpy()
        seg = batch.column("c_mktsegment").to_pylist()
        bal = np.rint(batch.column("c_acctbal").to_numpy() * 100
                      ).astype("int64")
        dirty = [n[:-1] if k % 3 == 0 else (n.upper() if k % 3 == 1 else n)
                 for k, n in zip(ck, names)]
        return pa.table({
            "crm_id": pa.array(ck + 1_000_000, pa.int64()),
            "d_name_n": pa.array([n.lower() for n in dirty], pa.string()),
            "d_bal": pa.array(bal + ck % 7 - 3, pa.int64()),
            "block": pa.array([f"{k}|{s}" for k, s in zip(nk, seg)],
                              pa.string()),
        })

    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment"]
    left = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=cols
                                 ).map_batches(prep_left,
                                               batch_format="pyarrow")
    right = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=cols
                                  ).map_batches(prep_right,
                                                batch_format="pyarrow")

    def scorer(pairs):
        a = pairs["name_n"].to_numpy()
        b = pairs["d_name_n"].to_numpy()
        eq = a == b
        score = np.where(eq, 40, 0).astype(np.int64)
        # edit-distance path only for non-equal names (O(len) each)
        for i in np.flatnonzero(~eq):
            if within_edit1(a[i], b[i]):
                score[i] += 35
        close = np.abs(pairs["bal"].to_numpy()
                       - pairs["d_bal"].to_numpy()) <= 3
        return score + np.where(close, 25, 0)

    return blocked_linkage(left, right, block_col="block", scorer=scorer,
                           out_cols=["c_custkey", "crm_id"], threshold=60)


def _q_golden_record(sf_dir: str):
    """Survivorship merge after linkage: per customer, 3 synthesized
    observation versions with deterministic field gaps (name present
    only in version custkey%3, segment in even-parity versions, balance
    in versions ≠ 1) collapse to one golden record — per FIELD, the
    latest non-null observation wins (per-row recency would let a newer
    record's missing field erase an older value). One key-hash
    exchange + a single vectorized groupby-last per partition
    (``linkage.golden_record``)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.linkage import golden_record

    def versions(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy()
        names = batch.column("c_name").to_pylist()
        segs = batch.column("c_mktsegment").to_pylist()
        bal = np.rint(batch.column("c_acctbal").to_numpy() * 100
                      ).astype("int64")
        n = len(ck)
        k3 = np.repeat(ck, 3)
        v = np.tile(np.arange(3, dtype=np.int64), n)
        name3 = [f"{names[i // 3]}/{v[i]}" if v[i] == ck[i // 3] % 3
                 else None for i in range(3 * n)]
        seg3 = [f"{segs[i // 3]}/{v[i]}" if (ck[i // 3] + v[i]) % 2 == 0
                else None for i in range(3 * n)]
        bal3 = pa.array([int(bal[i // 3] + v[i]) if v[i] != 1 else None
                         for i in range(3 * n)], pa.int64())
        return pa.table({"c_custkey": pa.array(k3, pa.int64()),
                         "ver": pa.array(v, pa.int64()),
                         "g_name": pa.array(name3, pa.string()),
                         "g_seg": pa.array(seg3, pa.string()),
                         "g_bal": bal3})

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment", "c_acctbal"],
    ).map_batches(versions, batch_format="pyarrow")
    out = golden_record(ds, key_col="c_custkey", order_col="ver",
                        field_cols=["g_name", "g_seg", "g_bal"])

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("g_bal"), "g_bal",
            batch.column("g_bal").cast(pa.int64()))

    return out.map_batches(finish, batch_format="pyarrow")


def _q_cc_labels(sf_dir: str):
    """Standalone connected components over an explicit edge table —
    the general union-find-as-a-dataset-op (dedup clusters, account
    graphs, citation components), exposed directly rather than inside
    minhash_dedup_keep. Graph: star blocks of 8 customer keys (hub =
    ⌊k/8⌋·8) plus a bridge from every hub with k%40==16 to member
    k+13 of the next block — component diameter ≤ 4, so the
    distributed min-label propagation (one key-projected hash join +
    grouped min per round, digest early-exit;
    ``dedup.neardup_components``) converges well inside its round
    budget. Output: (c_custkey, component = min key reachable)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.dedup import neardup_components

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])
    maxk = int(cust.max("c_custkey"))

    def mkedges(batch: pa.Table) -> pa.Table:
        k = batch.column("c_custkey").to_numpy()
        m1 = k % 8 != 0
        a = ((k[m1] // 8) * 8).astype("int64")
        b = k[m1].astype("int64")
        m2 = (k % 40 == 16) & (k + 13 <= maxk)
        a2 = k[m2].astype("int64")
        b2 = (k[m2] + 13).astype("int64")
        return pa.table({"id_a": pa.array(np.concatenate([a, a2])),
                         "id_b": pa.array(np.concatenate([b, b2]))})

    edges = cust.map_batches(mkedges, batch_format="pyarrow")
    return neardup_components(cust, edges, id_col="c_custkey")


def _q_dag_layers(sf_dir: str):
    """Topological layering / critical-path depth over a DAG
    (``graph.dag_layers``): which dependency wave does each node run
    in. Deterministic DAG on customer keys — chain edges k→k+1 inside
    blocks of 4 plus skip edges k→k+3 when k%9==2; every edge
    increases the key, so acyclicity holds by construction and the
    longest path is ≤ 7 edges (round budget 8 ⇒ exact). Max-relaxation
    per round = one key-projected hash join + grouped max."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.graph import dag_layers

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])
    maxk = int(cust.max("c_custkey"))

    def mkedges(batch: pa.Table) -> pa.Table:
        k = batch.column("c_custkey").to_numpy()
        m1 = (k % 4 != 3) & (k + 1 <= maxk)
        m2 = (k % 9 == 2) & (k + 3 <= maxk)
        src = np.concatenate([k[m1], k[m2]]).astype("int64")
        dst = np.concatenate([k[m1] + 1, k[m2] + 3]).astype("int64")
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = cust.map_batches(mkedges, batch_format="pyarrow")
    nodes = cust.map_batches(
        lambda b: pa.table({"node": b.column("c_custkey")}),
        batch_format="pyarrow")
    out = dag_layers(edges, nodes, rounds=8)
    return out.map_batches(
        lambda b: pa.table({"c_custkey": b.column("node"),
                            "layer": b.column("layer")}),
        batch_format="pyarrow")


def _q_ks_drift(sf_dir: str):
    """Two-sample KS drift check: do returned ('R') lineitems draw
    their quantities from the same distribution as the rest? Exercises
    ``aggregates.ks_statistic_int``: per-side value histograms (one
    bounded exchange each), cross-multiplied integer CDF compare —
    D = d_scaled / (n_a·n_b) with no float division crossing the
    engine boundary."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import ks_statistic_int

    def side(flag_eq: bool):
        def prep(batch: pa.Table) -> pa.Table:
            f = np.asarray(batch.column("l_returnflag").to_pylist())
            keep = (f == "R") if flag_eq else (f != "R")
            q = np.rint(batch.column("l_quantity").to_numpy()
                        ).astype("int64")[keep]
            return pa.table({"qty": pa.array(q, pa.int64())})
        return ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity"],
        ).map_batches(prep, batch_format="pyarrow")

    return ks_statistic_int(side(True), side(False), val_col="qty")


def _q_quantity_percentile(sf_dir: str):
    """Per-row CDF position: each lineitem's quantity percent_rank
    within its returnflag group, exact integer ppm. Exercises
    ``aggregates.grouped_percent_rank``: rank() min-rank tie semantics
    collapse the window to ONE histogram exchange (keys × distinct
    values) + a broadcast lookup — rows never shuffle."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import grouped_percent_rank

    def prep(batch: pa.Table) -> pa.Table:
        q = np.rint(batch.column("l_quantity").to_numpy()).astype("int64")
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "l_linenumber": batch.column("l_linenumber"),
                         "l_returnflag": batch.column("l_returnflag"),
                         "qty": pa.array(q, pa.int64())})

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag",
                 "l_quantity"],
    ).map_batches(prep, batch_format="pyarrow")
    out = grouped_percent_rank(ds, key_col="l_returnflag", val_col="qty")
    return out.select_columns(["l_orderkey", "l_linenumber", "pct_ppm"])


def _q_quantity_cume_dist(sf_dir: str):
    """Per-row inclusive CDF position: each lineitem quantity's
    cume_dist within its linestatus group, exact integer ppm.
    Exercises ``aggregates.grouped_cume_dist`` — the inclusive sibling
    of percent_rank (fraction of the group at or BELOW the value, ties
    share their peer group's cumulative count): ONE histogram exchange
    bounded by keys × distinct values + a broadcast lookup, rows never
    shuffle."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import grouped_cume_dist

    def prep(batch: pa.Table) -> pa.Table:
        q = np.rint(batch.column("l_quantity").to_numpy()).astype("int64")
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "l_linenumber": batch.column("l_linenumber"),
                         "l_linestatus": batch.column("l_linestatus"),
                         "qty": pa.array(q, pa.int64())})

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_linestatus",
                 "l_quantity"],
    ).map_batches(prep, batch_format="pyarrow")
    out = grouped_cume_dist(ds, key_col="l_linestatus", val_col="qty")
    return out.select_columns(["l_orderkey", "l_linenumber", "cume_ppm"])


def _q_gini_gain(sf_dir: str):
    """Decision-stump feature score (``aggregates.gini_gain_int``):
    exact integer-ppm Gini impurity gain of the binary split
    "quantity ≥ 26" over the 3-class return flag — the CART
    feature-selection primitive, chosen over information gain because
    Gini is rational (one cleared division in bigint/HUGEINT, bit-exact
    in SQL; entropy's log never is). ONE exchange bounded by
    2 × |labels| cells."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import gini_gain_int

    def prep(batch: pa.Table) -> pa.Table:
        q = np.rint(batch.column("l_quantity").to_numpy()).astype("int64")
        return pa.table({
            "hi_qty": pa.array((q >= 26).tolist(), pa.bool_()),
            "flag": batch.column("l_returnflag")})

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_returnflag"],
    ).map_batches(prep, batch_format="pyarrow")
    return gini_gain_int(ds, split_col="hi_qty", label_col="flag")


def _q_rank_auc(sf_dir: str):
    """Exact ROC-AUC in integer ppm (``aggregates.rank_auc_int``):
    does quantity rank returned lineitems above kept ones? Rank-based
    Mann–Whitney identity with the tie term kept integral in doubled
    units (u2 = Σ p·(2·cumneg + q)) — the threshold-free score eval a
    float trapezoid can't reproduce bit-exactly. ONE exchange bounded
    by distinct score values, driver cumulative scan."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from documentai_ray.stages.aggregates import rank_auc_int

    def prep(batch: pa.Table) -> pa.Table:
        v = np.rint(batch.column("l_quantity").to_numpy()).astype("int64")
        return pa.table({
            "qty": pa.array(v, pa.int64()),
            "returned": pc.equal(batch.column("l_returnflag"), "R")})

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_returnflag"],
    ).map_batches(prep, batch_format="pyarrow")
    return rank_auc_int(ds, score_col="qty", label_col="returned")


def _q_waterfill_budget(sf_dir: str):
    """Max-min fair crawl-budget allocation
    (``curation.waterfill_allocate``): per-user event counts are the
    demands; a global budget of exactly 3/5 of total demand is split by
    progressive water-filling — keys whose demand fits under the fair
    share are fully satisfied, the rest split the remainder evenly with
    the deterministic (demand, key)-order +1 rule for the integer
    leftover. Exact closed form prefix + d·(n−k+1) ≤ B, integer end to
    end; ONE exchange bounded by distinct users, driver fill over the
    key-bounded table."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.curation import waterfill_allocate

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"user_id": batch.column("user_id"),
                         "one": pa.array([1] * batch.num_rows,
                                         pa.int64())})

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"]
                               ).map_batches(prep, batch_format="pyarrow")
    return waterfill_allocate(ev, key_col="user_id", demand_col="one",
                              budget_num=3, budget_den=5)


def _q_target_encode(sf_dir: str):
    """Smoothed target encoding of market segment by account balance
    (``aggregates.target_encode_int``): each category becomes the
    smoothed mean of its target, ``(sum_c + m·prior) // (n_c + m)`` —
    rare categories shrink toward the global mean with pseudo-count
    weight m=10. Balance shifted to cents + 100000 so everything is
    non-negative and floor division is unambiguous cross-engine. ONE
    exchange bounded by distinct categories + ray.put broadcast attach;
    rows never shuffle."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import target_encode_int

    def prep(batch: pa.Table) -> pa.Table:
        c = (np.rint(batch.column("c_acctbal").to_numpy() * 100)
             .astype("int64") + 100_000)
        return pa.table({"c_custkey": batch.column("c_custkey"),
                         "c_mktsegment": batch.column("c_mktsegment"),
                         "bal_shifted": pa.array(c, pa.int64())})

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    ).map_batches(prep, batch_format="pyarrow")
    out = target_encode_int(cust, cat_col="c_mktsegment",
                            target_col="bal_shifted", m=10)
    return out.select_columns(["c_custkey", "c_mktsegment", "enc"])


def _q_log2_p99(sf_dir: str):
    """Bounded-state p99 per key (``sketches.log2_quantile_sketch``):
    order totals bucketed by octave (floor(log2) via exact np.frexp),
    ONE exchange of keys × ≤64 bucket counts no matter the value
    distribution — the DDSketch trade: the answer is the interval
    [2^b, 2^(b+1)−1] with guaranteed ≤2× relative error, where the
    exact-histogram quantile ops pay an exchange bounded by distinct
    values. Integer rank rule cum·100 ≥ 99·n mirrors the SQL
    bit-exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.sketches import log2_quantile_sketch

    def prep(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("o_totalprice").to_numpy() * 100
                    ).astype("int64")
        return pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "cents": pa.array(c, pa.int64())})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
    ).map_batches(prep, batch_format="pyarrow")
    return log2_quantile_sketch(orders, key_col="o_orderpriority",
                                val_col="cents", q_pct=99)


def _q_value_histogram(sf_dir: str):
    """Equal-width histogram of event values (20 bins) — the ANALYZE /
    data-profiling primitive beside profile_columns' min/max/KMV: a
    tiny global min/max aggregate fixes the domain, then binning is a
    pure integer map ``(v − lo) · nbins // (hi − lo + 1)`` (exact in
    any engine, last bin inclusive by construction) pre-combined per
    batch into an exchange bounded by nbins."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    NBINS = 20

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("value").to_numpy() * 100).astype("int64")
        return pa.table({"val_c": pa.array(c, pa.int64())})

    read = lambda: ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value"]
    ).map_batches(cents, batch_format="pyarrow")

    mm = read().aggregate(Min("val_c"), Max("val_c"))
    lo, hi = int(mm["min(val_c)"]), int(mm["max(val_c)"])
    span = hi - lo + 1

    def binify(batch: pa.Table) -> pa.Table:
        import pandas as pd
        v = batch.column("val_c").to_numpy()
        b = (v - lo) * NBINS // span
        df = (pd.DataFrame({"bin": b, "v": v})
              .groupby("bin", sort=False)
              .agg(n=("v", "size"), lo_c=("v", "min"), hi_c=("v", "max"))
              .reset_index())
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    return (read().map_batches(binify, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(Sum("n", alias_name="n"),
                       Min("lo_c", alias_name="lo_c"),
                       Max("hi_c", alias_name="hi_c")))


def _q_type_share(sf_dir: str):
    """Percent-of-total (the ratio_to_report window): each event type's
    share of total event value, in exact integer ppm — share arithmetic
    is where float division diverges across engines, so the grand total
    is derived from the (tiny) grouped sums themselves and each share is
    ``group_cents · 10⁶ // total_cents``. One pre-combined exchange; the
    total needs no second pass over the data."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("value").to_numpy() * 100).astype("int64")
        return pa.table({"event_type": batch.column("event_type"),
                         "val_c": pa.array(c, pa.int64())})

    grp = (ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["event_type", "value"])
           .map_batches(cents, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("val_c", alias_name="total_c"))
           .to_pandas())
    total = int(grp["total_c"].sum())
    grp["share_ppm"] = grp["total_c"] * 1_000_000 // total
    return grp[["event_type", "total_c", "share_ppm"]]


def _q_bag_intersect(sf_dir: str):
    """Multiset INTERSECT ALL (bag intersection with multiplicity) —
    completes the bag algebra beside ``bag_difference``: the high-value
    (≥ $50) event-type stream ∩ the even-user stream, each type
    surviving ``min(count_left, count_right)`` times. Same count-algebra
    plan: per-side pre-combined value counts, ONE value-hash exchange,
    survivors re-exploded by ``np.repeat`` — multiplicity arithmetic on
    aggregates, never an n×m row pairing."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.dedup import _add_pkey

    def counts(which: str):
        def f(batch: pa.Table) -> pa.Table:
            import pandas as pd
            v = np.rint(batch.column("value").to_numpy() * 100
                        ).astype("int64")
            u = batch.column("user_id").to_numpy()
            df = pd.DataFrame({"event_type":
                               batch.column("event_type").to_pylist()})
            df = df[v >= 5_000] if which == "left" else df[u % 2 == 0]
            out = (df.groupby("event_type", sort=False)
                   .size().reset_index(name="_n"))
            out["_side"] = which
            return pa.Table.from_pandas(out, preserve_index=False) \
                           .replace_schema_metadata(None)
        return f

    read = lambda: ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value", "user_id"])
    both = (read().map_batches(counts("left"), batch_format="pyarrow")
            .union(read().map_batches(counts("right"),
                                      batch_format="pyarrow")))

    def isect(g):
        import pandas as pd
        c = (g.pivot_table(index="event_type", columns="_side",
                           values="_n", aggfunc="sum", fill_value=0)
             .reindex(columns=["left", "right"], fill_value=0)
             .reset_index())
        n = np.minimum(c["left"].to_numpy(), c["right"].to_numpy())
        return pd.DataFrame({"event_type":
                             np.repeat(c["event_type"].to_numpy(), n)})

    return (_add_pkey(both, "event_type", 8)
            .groupby("_pkey")
            .map_groups(lambda g: isect(g.drop(columns=["_pkey"])),
                        batch_format="pandas"))


def _q_bag_difference(sf_dir: str):
    """Multiset EXCEPT ALL (bag difference with multiplicity): the
    event-type stream MINUS its high-value (≥ $100) sub-stream — each
    type survives ``count_all − count_high`` times. Exercises
    ``curation``-style count algebra instead of row matching: per-side
    per-batch value counts pre-combine, ONE value-hash exchange joins
    the two count tables, survivors are re-exploded by ``np.repeat`` —
    multiplicity arithmetic on aggregates, never an n×m row pairing."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.dedup import _add_pkey

    def counts(which: str):
        def f(batch: pa.Table) -> pa.Table:
            import pandas as pd
            v = np.rint(batch.column("value").to_numpy() * 100
                        ).astype("int64")
            df = pd.DataFrame({"event_type":
                               batch.column("event_type").to_pylist()})
            if which == "right":
                df = df[v >= 10_000]
            out = (df.groupby("event_type", sort=False)
                   .size().reset_index(name="_n"))
            out["_side"] = which
            return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
        return f

    read = lambda: ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    both = (read().map_batches(counts("left"), batch_format="pyarrow")
            .union(read().map_batches(counts("right"),
                                      batch_format="pyarrow")))

    def diff(g):
        import pandas as pd
        c = (g.pivot_table(index="event_type", columns="_side",
                           values="_n", aggfunc="sum", fill_value=0)
             .reindex(columns=["left", "right"], fill_value=0)
             .reset_index())
        n = (c["left"] - c["right"]).clip(lower=0).to_numpy()
        return pd.DataFrame({"event_type":
                             np.repeat(c["event_type"].to_numpy(), n)})

    return (_add_pkey(both, "event_type", 8)
            .groupby("_pkey")
            .map_groups(lambda g: diff(g.drop(columns=["_pkey"])),
                        batch_format="pandas"))


def _q_event_pairs_window(sf_dir: str):
    """Windowed equi self-join: pairs of SAME-USER events within 600
    seconds of each other — the temporal-proximity join behind burst /
    co-click analysis. Exercises ``joins.band_join`` with its equi-key
    extension: routing hash and in-partition merge both include
    user_id, so only same-user rows pair and a hot time band splits
    across users; the unordered pair is kept once via id_l < id_r (each
    ordered combination meets exactly once by the band plan)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from documentai_ray.stages.joins import band_join

    def prep(side: str):
        def f(batch: pa.Table) -> pa.Table:
            s = (batch.column("ts").to_numpy().astype("datetime64[us]")
                 .astype("int64") // 1_000_000)
            return pa.table({f"id_{side}": batch.column("event_id"),
                             f"user_{side}": batch.column("user_id"),
                             f"ts_{side}": pa.array(s, pa.int64())})
        return f

    read = lambda: ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    left = read().map_batches(prep("l"), batch_format="pyarrow")
    right = read().map_batches(prep("r"), batch_format="pyarrow")
    out = band_join(left, right, left_on="ts_l", right_on="ts_r",
                    delta=600, num_partitions=32,
                    left_by="user_l", right_by="user_r")

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch.column("id_l"), batch.column("id_r"))
        t = batch.filter(keep)
        return pa.table({"id_l": t.column("id_l"),
                         "id_r": t.column("id_r"),
                         "user_id": t.column("user_l")})

    return out.map_batches(finish, batch_format="pyarrow")


def _q_path_rollup(sf_dir: str):
    """Hierarchical path-prefix rollup — the URL-tree census a crawl
    publishes (docs per /section, /section/lang, …): each doc's
    4-level synthetic path contributes one count to every prefix
    depth. Per-batch vectorized prefix construction + count pre-combine
    keeps the ONE exchange bounded by DISTINCT prefixes (the leaf level
    legitimately degenerates to one row per doc — the rollup's own
    output size, documented, not a shuffle amplification)."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    def prefixes(batch: pa.Table) -> pa.Table:
        import pandas as pd
        ids = batch.column("doc_id").to_pylist()
        src = batch.column("source").to_pylist()
        lang = batch.column("lang").to_pylist()
        rows_p, rows_d = [], []
        for i, s, lg in zip(ids, src, lang):
            p1 = f"/{s}"
            p2 = f"{p1}/{lg}"
            p3 = f"{p2}/{i % 10}"
            p4 = f"{p3}/{i}"
            rows_p += [p1, p2, p3, p4]
            rows_d += [1, 2, 3, 4]
        df = (pd.DataFrame({"depth": rows_d, "prefix": rows_p})
              .groupby(["depth", "prefix"], sort=False)
              .size().reset_index(name="_n"))
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "lang"])
    out = (ds.map_batches(prefixes, batch_format="pyarrow")
           .groupby(["depth", "prefix"])
           .aggregate(Sum("_n", alias_name="n")))
    return out


def _q_cumulative_users(sf_dir: str):
    """Cumulative distinct users per day — running COUNT(DISTINCT)
    without a quadratic window: distinct-per-day collapses to each
    user's FIRST day (groupby-min, per-batch pre-combined), daily
    new-user counts are a tiny aggregate, and the running sum over the
    bounded day axis is a driver-side cumsum (days ≪ rows; the
    documented small-axis exception)."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Min

    def days(batch: pa.Table) -> pa.Table:
        import pandas as pd
        d = (batch.column("ts").to_numpy().astype("datetime64[us]")
             .astype("int64") // (86_400 * 1_000_000))
        df = (pd.DataFrame({"user_id": batch.column("user_id").to_numpy(),
                            "d": d})
              .groupby("user_id", sort=False)["d"].min().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    first = (ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["user_id", "ts"])
             .map_batches(days, batch_format="pyarrow")
             .groupby("user_id").aggregate(Min("d", alias_name="day")))
    daily = (first.groupby("day").aggregate(Count(alias_name="new_users"))
             .to_pandas().sort_values("day"))
    daily["cum_users"] = daily["new_users"].cumsum()
    return daily.reset_index(drop=True)


def _q_join_revenue(sf_dir: str):
    """Partitioned hash join (both sides large): lineitem ⋈ orders on
    orderkey → revenue per order priority."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Sum

    from documentai_ray.stages.joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        import numpy as np

        price_c = np.rint(batch.column("l_extendedprice").to_numpy() * 100).astype("int64")
        disc_c = np.rint(batch.column("l_discount").to_numpy() * 100).astype("int64")
        return pa.table({"orderkey": batch.column("l_orderkey"),
                         "rev_c2": pa.array(price_c * (100 - disc_c), pa.int64())})

    li = li.map_batches(li_prep, batch_format="pyarrow")
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_orderpriority"])

    def o_prep(batch: pa.Table) -> pa.Table:
        return pa.table({"orderkey": batch.column("o_orderkey"),
                         "o_orderpriority": batch.column("o_orderpriority")})

    orders = orders.map_batches(o_prep, batch_format="pyarrow")
    joined = hash_join(li, orders, on="orderkey")
    agg = (
        joined.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_items"), Sum("rev_c2", alias_name="_rev_c2"))
        .to_pandas()
    )
    agg["revenue"] = agg["_rev_c2"] / 10000.0  # exact integer-cents sum
    return agg[["o_orderpriority", "n_items", "revenue"]]


def _q_events_asof(sf_dir: str):
    """As-of join: each purchase event matched to the user's most recent
    signup at-or-before it (bucketed ``merge_asof``; DuckDB ASOF JOIN
    oracle)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from documentai_ray.stages.joins import asof_join

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts", "event_type"])

    def split(kind):
        def f(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch.column("event_type"), kind))
            return t.drop_columns(["event_type"])
        return f

    purchases = ev.map_batches(split("purchase"), batch_format="pyarrow")

    def signup_prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "signup"))
        return pa.table({"user_id": t.column("user_id"), "ts": t.column("ts"),
                         "signup_ts": t.column("ts")})

    signups = ev.map_batches(signup_prep, batch_format="pyarrow")
    joined = asof_join(purchases.drop_columns([]), signups, on="ts", by="user_id")

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("signup_ts")))
        return t.select(["event_id", "user_id", "signup_ts"])

    return joined.map_batches(finish, batch_format="pyarrow")


def _q_entities_table(sf_dir: str):
    """HTML-table tag extraction (M19/LC analog): label→value dicts from the
    PO pages' summary tables, straight off the raw html payload."""
    import pyarrow as pa

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.entities import extract_table_tags

    ds = pages_dataset(sf_dir)

    def tags(batch: pa.Table) -> pa.Table:
        urls, po, qty, ccy = [], [], [], []
        for u, payload in zip(batch.column("url").to_pylist(),
                              batch.column("html").to_pylist()):
            try:
                d = extract_table_tags(payload.decode("utf-8"))
            except UnicodeDecodeError:
                continue
            if "PO" in d:
                urls.append(u)
                po.append(d.get("PO", ""))
                qty.append(d.get("QTY", ""))
                ccy.append(d.get("CCY", ""))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "tag_po": pa.array(po, pa.string()),
                         "tag_qty": pa.array(qty, pa.string()),
                         "tag_ccy": pa.array(ccy, pa.string())})

    return ds.map_batches(tags, batch_format="pyarrow")


def _q_lc_tags(sf_dir: str):
    """LC-application extraction (M19, full 34-SWIFT-code coverage) + LC
    rule validation (T4): HTML-table walk keyed by normalized code cells
    (reference lc_application.py:16-38), rule-covered tags validated
    against configs/validation_rules/lc_rules.txt (40A/31C/31D incl. the
    cross-field date rule/32B/50/59)."""
    import os

    import pyarrow as pa

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.entities import extract_lc_tags, lc_rule_field
    from documentai_ray.stages.rules import load_rules, validate_entities

    rules = load_rules(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "configs", "validation_rules", "lc_rules.txt"))
    rule_fields = ("40A", "31C", "31D", "32B", "50", "59")

    ds = pages_dataset(sf_dir)

    def tags(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in
                                 ("url", "tag_40a", "tag_31c", "tag_31d",
                                  "tag_32b", "tag_50", "tag_59", "n_tags",
                                  "rules_passed", "rules_failed", "overall_valid")}
        for u, payload in zip(batch.column("url").to_pylist(),
                              batch.column("html").to_pylist()):
            try:
                d = extract_lc_tags(payload.decode("utf-8"))
            except UnicodeDecodeError:
                continue
            if not d:
                continue
            ents = {lc_rule_field(c): v for c, v in d.items()}
            res = validate_entities({f: ents.get(f, "") for f in rule_fields},
                                    rules)
            cols["url"].append(u)
            cols["tag_40a"].append(ents.get("40A", ""))
            cols["tag_31c"].append(ents.get("31C", ""))
            cols["tag_31d"].append(ents.get("31D", ""))
            cols["tag_32b"].append(ents.get("32B", ""))
            cols["tag_50"].append(ents.get("50", ""))
            cols["tag_59"].append(ents.get("59", ""))
            cols["n_tags"].append(len(d))
            cols["rules_passed"].append(res["rules_passed"])
            cols["rules_failed"].append(res["rules_failed"])
            cols["overall_valid"].append(res["overall_valid"])
        return pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "tag_40a": pa.array(cols["tag_40a"], pa.string()),
            "tag_31c": pa.array(cols["tag_31c"], pa.string()),
            "tag_31d": pa.array(cols["tag_31d"], pa.string()),
            "tag_32b": pa.array(cols["tag_32b"], pa.string()),
            "tag_50": pa.array(cols["tag_50"], pa.string()),
            "tag_59": pa.array(cols["tag_59"], pa.string()),
            "n_tags": pa.array(cols["n_tags"], pa.int64()),
            "rules_passed": pa.array(cols["rules_passed"], pa.int64()),
            "rules_failed": pa.array(cols["rules_failed"], pa.int64()),
            "overall_valid": pa.array(cols["overall_valid"], pa.bool_()),
        })

    return ds.map_batches(tags, batch_format="pyarrow")


def _q_technique_stats(sf_dir: str):
    """A8 analog: per-technique agreement with the fused category
    (documentClassifier.py:1138-1288 technique performance stats).
    Per-batch partial counts → tiny groupby."""
    import math

    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from documentai_ray.pipelines.flagship import flagship

    ds = flagship(sf_dir=sf_dir)
    techs = ["keyword", "regex", "tokenset", "ml"]

    def partial(batch: pa.Table) -> pa.Table:
        cat = batch.column("category").to_pylist()
        rows = []
        for t in techs:
            tv = batch.column(f"tech_{t}").to_pylist()
            rows.append({"technique": t, "n_docs": len(cat),
                         "n_agree": sum(a == b for a, b in zip(tv, cat))})
        return pa.Table.from_pylist(rows)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("technique")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_agree", alias_name="n_agree"))
        .to_pandas()
    )
    agg["agree_rate"] = [
        math.floor(a / n * 1e6) / 1e6 for a, n in zip(agg["n_agree"], agg["n_docs"])
    ]
    return agg[["technique", "n_docs", "n_agree", "agree_rate"]]


def _q_curate_corpus(sf_dir: str):
    """Training-data curation: quality-filter the documents table (keep
    confident, supported-language, long-enough docs) — the canonical
    LLM-corpus quality-filtering op, built on the quality transform."""
    import pyarrow.compute as pc
    import ray.data

    from documentai_ray.stages.quality import quality_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    ds = ds.map_batches(quality_batch, batch_format="pyarrow", batch_size=512)

    def keep(t):
        mask = pc.and_(
            pc.and_(pc.greater_equal(t.column("confidence"), 0.6),
                    t.column("lang_ok")),
            pc.greater_equal(t.column("n_chars"), 100),
        )
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow").select_columns(
        ["doc_id", "lang", "n_chars", "confidence"])


def _q_group_split(sf_dir: str):
    """Leakage-safe GROUP-aware fold assignment: every document of a
    source lands in the same fold (fold = md5-LE64(source) % 5) — the
    split a contamination-aware training pipeline needs (near-dup pages
    of one host must never straddle train/test). Pure per-batch map,
    deterministic at any parallelism; the SQL mirror reuses the
    repo-standard md5 expression."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.sketches import md5_le64

    def assign(batch: pa.Table) -> pa.Table:
        folds = [md5_le64(s) % 5
                 for s in batch.column("source").to_pylist()]
        return batch.append_column("fold", pa.array(folds, pa.int64()))

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(assign, batch_format="pyarrow")


def _q_schema_union(sf_dir: str):
    """Schema-evolution read (UNION ALL BY NAME): an old snapshot
    written before the ``source`` column existed (even doc_ids,
    2 columns) unions with the evolved snapshot (odd doc_ids,
    3 columns) — old rows null-filled. Exercises
    ``schema.union_by_name``: ordered name-union schema, per-input
    null-fill projection, conflicting types fail loudly."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from documentai_ray.stages.schema import union_by_name

    def old_snap(batch: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(batch.column("doc_id"),
                                        pa.scalar(1)), pa.scalar(0))
        t = batch.filter(keep)
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": t.column("lang")})

    def new_snap(batch: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(batch.column("doc_id"),
                                        pa.scalar(1)), pa.scalar(1))
        t = batch.filter(keep)
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": t.column("lang"),
                         "source": t.column("source")})

    read = lambda: ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source"])
    return union_by_name([
        read().map_batches(old_snap, batch_format="pyarrow"),
        read().map_batches(new_snap, batch_format="pyarrow")])


def _q_split_assign(sf_dir: str):
    """Deterministic train/val/test split: multiplicative (Knuth) hash of
    the id → stable 80/10/10 assignment, identical at any parallelism and
    reproducible in SQL (no RNG state)."""
    import pyarrow as pa
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    M = 2654435761
    MOD = 1 << 32

    def assign(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("doc_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(M)) % np.uint64(MOD)
        frac = h.astype(np.float64) / float(MOD)
        split = np.where(frac < 0.8, "train", np.where(frac < 0.9, "val", "test"))
        return batch.append_column("split", pa.array(split.tolist(), pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def _q_cm_counts(sf_dir: str):
    """Count-Min point-frequency estimates for the corpus' top-20 tokens:
    the (4×1024) counter grid merges per-batch partials (sketch-sized
    state, same contract as KMV/HLL), est = min over the 4 salted-hash
    rows — never under the true count, over by ≤ εN. Oracle: the
    identical grid and min-lookup in SQL. Complements Misra-Gries
    (exact WHICH-is-heavy) with HOW-OFTEN-is-this for any token."""
    import collections

    import pandas as pd
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.sketches import (cm_estimate,
                                                cm_sketch_tokens)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"]).materialize()
    grid = cm_sketch_tokens(ds)

    def partial(batch: pa.Table) -> pa.Table:
        c = collections.Counter()
        for t in batch.column("text").to_pylist():
            c.update((t or "").split())
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("n", alias_name="n_true"))
           .to_pandas())
    agg = agg.sort_values(["n_true", "token"], ascending=[False, True],
                          kind="mergesort").head(20).reset_index(drop=True)
    agg["cm_est"] = [cm_estimate(grid, t) for t in agg["token"]]
    return agg


def _q_feature_hash(sf_dir: str):
    """Feature hashing (the hashing trick): each document's tokens
    bucketed by md5-LE64 % 16 into a fixed-width count vector — the
    vocabulary-free featurization the warm ML classifier (M12) uses
    internally, exposed as a standalone columnar op. Pure per-batch
    map emitting (doc_id, bucket, n) rows for non-empty buckets; no
    exchange at all (features are per-row)."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.sketches import md5_le64

    NB = 16

    def hashfeat(batch: pa.Table) -> pa.Table:
        ids_out, buckets, counts = [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            acc: dict[int, int] = {}
            for tok in (text or "").split():
                b = md5_le64(tok) % NB
                acc[b] = acc.get(b, 0) + 1
            for b in sorted(acc):
                ids_out.append(did)
                buckets.append(b)
                counts.append(acc[b])
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "bucket": pa.array(buckets, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(hashfeat, batch_format="pyarrow")


def _q_top_tokens(sf_dir: str):
    """Corpus token frequencies: per-batch Counter partials → groupby sum →
    top-20 (count desc, token asc). The combiner keeps the shuffle at
    one row per distinct token per batch."""
    import collections

    import pyarrow as pa
    from ray.data.aggregate import Sum
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        c = collections.Counter()
        for t in batch.column("text").to_pylist():
            c.update((t or "").split(" "))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    agg = agg.sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
    return agg.head(20).reset_index(drop=True)


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3 13-gram rule): flag corpus docs
    sharing any 13-gram with the benchmark set (here: docs with
    ``doc_id % 31 == 5`` stand in for the benchmark). The benchmark n-gram
    hash set broadcasts once; membership is vectorized per batch."""
    import pyarrow.parquet as pq
    import ray.data

    from documentai_ray.stages.curation import build_ngram_set, decontaminate

    bench = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
    bench_texts = [t for i, t in zip(bench.column("doc_id").to_pylist(),
                                     bench.column("text").to_pylist())
                   if i % 31 == 5]
    ngrams = build_ngram_set(bench_texts, n=13)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return decontaminate(ds, ngrams, n=13).select_columns(
        ["doc_id", "contaminated"])


def _q_sample_weighted(sf_dir: str):
    """Deterministic domain-weighted sampling: per-source keep rates
    (¼/½/¾/1 by source index mod 4) via a salted multiplicative hash —
    parallelism-independent and SQL-reproducible."""
    import ray.data

    from documentai_ray.stages.curation import sample_by_source

    rates = {f"src{i}": (i % 4 + 1) / 4.0 for i in range(100)}
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])
    return sample_by_source(ds, rates)


def _q_gopher_repetition(sf_dir: str):
    """Gopher-style repetition filters (Rae et al. 2021 Table A1):
    duplicate-token fraction + top-2-gram fraction per doc, keep flag at
    top2gram_frac ≤ 0.03."""
    import ray.data

    from documentai_ray.stages.curation import repetition_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(repetition_batch, batch_format="pyarrow",
                          batch_size=512).select_columns(
        ["doc_id", "dup_token_frac", "top2gram_frac", "rep_keep"])


def _q_redact_pii(sf_dir: str):
    """Pattern redaction over the pages corpus: dates and currency amounts
    in the extracted text replaced by placeholder tokens (compiled-regex
    sub per row; PO/invoice pages actually change)."""
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.curation import redact_batch
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))
    ds = ds.map_batches(redact_batch, batch_format="pyarrow", batch_size=256)
    return ds.select_columns(["url", "redacted"])


def _q_audio_frames(sf_dir: str):
    """REAL audio path: deterministic square-wave WAVs (PCM-16 mono, stdlib
    miniwav codec) → 1024-sample RMS frames. A ±A square wave has RMS
    exactly A in every window — closed-form oracle."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.functions.miniwav import encode_pcm16
    from documentai_ray.stages.multimodal import AudioFrameStage

    N, SR = 4096, 8000

    def gen(batch: pa.Table) -> pa.Table:
        payloads = []
        for did in batch.column("doc_id").to_pylist():
            amp = 1000 + did % 9000
            half = (16 + did % 32) // 2
            n = np.arange(N)
            sig = np.where((n // half) % 2 == 0, amp, -amp).astype(np.int16)
            payloads.append(encode_pcm16(sig, sample_rate=SR))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "payload": pa.array(payloads, pa.large_binary())})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ds = ds.map_batches(gen, batch_format="pyarrow", batch_size=128)
    ds = ds.map_batches(AudioFrameStage, batch_format="pyarrow",
                        batch_size=128, concurrency=(1, 4))

    def summarize(batch: pa.Table) -> pa.Table:
        n_frames, rms = [], []
        for fr in batch.column("frames").to_pylist():
            n_frames.append(len(fr))
            rms.append(fr[0]["energy"] if fr else 0.0)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_frames": pa.array(n_frames, pa.int64()),
                         "frame_rms": pa.array(rms, pa.float64())})

    return ds.map_batches(summarize, batch_format="pyarrow")


def _q_anti_join_customers(sf_dir: str):
    """Partitioned ANTI join: customers with no order above 400k —
    existence tests run as a vectorized isin per hash partition
    (joins.hash_join how='anti'; matching keys co-locate by bucketing)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from documentai_ray.stages.joins import hash_join

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])

    def cust_prep(batch: pa.Table) -> pa.Table:
        return pa.table({"custkey": batch.column("c_custkey"),
                         "c_mktsegment": batch.column("c_mktsegment")})

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])

    def big_orders(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch.column("o_totalprice"), 400000.0))
        return pa.table({"custkey": t.column("o_custkey")})

    return hash_join(
        cust.map_batches(cust_prep, batch_format="pyarrow"),
        orders.map_batches(big_orders, batch_format="pyarrow"),
        on="custkey", how="anti",
    )


def _q_rollup_counts(sf_dir: str):
    """Multi-level rollup (grouping sets): doc counts by (lang), (source)
    and (lang, source) in ONE pass — the per-batch combiner emits partial
    rows for every grouping level ('ALL' sentinel), so the shuffle carries
    ≤ 3 × distinct-combination partials per batch."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        outs = []
        for keep in ((True, False), (False, True), (True, True)):
            g = df.copy()
            if not keep[0]:
                g["lang"] = "ALL"
            if not keep[1]:
                g["source"] = "ALL"
            outs.append(g.groupby(["lang", "source"], as_index=False).size()
                        .rename(columns={"size": "n"}))
        out = pd.concat(outs, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n_docs"))
    )


def _q_topk_per_group(sf_dir: str):
    """Grouped top-k (top-3 orders by price per order priority): map-side
    partial top-k per key, hash-partitioned final selection — never a
    global sort, never one group call per key."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import grouped_topk

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("o_totalprice").to_numpy() * 100).astype("int64")
        return batch.append_column("_price_c", pa.array(c, pa.int64()))

    out = grouped_topk(
        ds.map_batches(cents, batch_format="pyarrow"),
        key_col="o_orderpriority",
        sort_cols=["_price_c", "o_orderkey"], ascending=[False, True], k=3,
    ).to_pandas()
    out["o_totalprice"] = out["_price_c"] / 100.0
    return out[["o_orderpriority", "o_orderkey", "o_totalprice"]]


def _q_median_quantity(sf_dir: str):
    """Exact distributed median per group via integer histograms (shuffle
    volume = keys × distinct values, not rows) — matches SQL median()
    incl. even-count averaging."""
    import ray.data

    from documentai_ray.stages.aggregates import grouped_median_int

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return grouped_median_int(
        ds, key_cols=["l_returnflag", "l_linestatus"], val_col="l_quantity",
        out_col="median_qty")


def _q_image_quality(sf_dir: str):
    """REAL pixel-metric chain (Q1-Q10 analogs on actual pixels): PNG
    payloads decoded by the stdlib minipng codec, metrics in pure numpy.
    Oracle columns derive from exact integer pixel sums with closed forms
    per synthetic archetype; the convolution metrics (blur/sharpness/
    noise) are pytest-pinned (tests/test_imaging.py)."""
    import ray.data

    from documentai_ray.sources.images import image_payload_batch
    from documentai_ray.stages.imaging import ImageQualityStage

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    ds = ds.map_batches(image_payload_batch, batch_format="pyarrow",
                        batch_size=64)  # wide binary rows → small batches
    ds = ds.map_batches(ImageQualityStage, batch_format="pyarrow",
                        batch_size=64, concurrency=(1, 4))
    return ds.select_columns(
        ["doc_id", "width", "height", "brightness", "contrast",
         "blank_ratio", "dark_ratio", "glare_ratio", "img_verdict"])


def _q_image_preprocess(sf_dir: str):
    """M14 adaptive preprocessing on REAL pixels: low-contrast pages get a
    percentile stretch (120/136 → 0/255), blank pages record a no-op
    stretch, everything else passes through — applied-ops list + processed
    brightness, all closed-form per archetype."""
    import ray.data

    from documentai_ray.sources.images import image_payload_batch
    from documentai_ray.stages.imaging import ImagePreprocessStage

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    ds = ds.map_batches(image_payload_batch, batch_format="pyarrow",
                        batch_size=64)
    ds = ds.map_batches(ImagePreprocessStage, batch_format="pyarrow",
                        batch_size=64, concurrency=(1, 4))
    return ds.select_columns(["doc_id", "pp_ops", "new_brightness"])


def _q_top_orders(sf_dir: str):
    """Global sort + limit (``ds.sort``): top-20 orders by total price,
    orderkey as the deterministic tiebreak."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(20)


def _extracted_pages_with_doc_id(sf_dir: str):
    """Shared prefix for line-level queries: pages → extract → exact dedup
    (latest capture per url) → non-empty docs with ``doc_id`` parsed back
    from the url tail (``/p/<doc_id>``) so line order has an int64 total
    order without a join."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch.column("text"), ""))
        ids = [int(u.rsplit("/", 1)[1]) for u in batch.column("url").to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": batch.column("url").cast(pa.string()),
                         "text": batch.column("text").cast(pa.large_string())})

    return ds.map_batches(prep, batch_format="pyarrow")


def _q_line_dedup(sf_dir: str):
    """Corpus-level exact line dedup (C4 §2.2 / CCNet §3.1): keep only the
    first occurrence of every distinct line across the whole corpus (order
    = (doc_id, line_idx)), reconstruct docs from surviving lines. The
    winner shuffle moves 16 bytes/line (u64 line hash + packed i64 key) —
    never line text; see stages/lines.py for the 100 TB plan."""
    from documentai_ray.stages.lines import dedup_lines

    ds = _extracted_pages_with_doc_id(sf_dir)
    return dedup_lines(ds, num_partitions=16)


def _q_c4_line_filter(sf_dir: str):
    """C4-style per-line heuristics (Raffel et al. 2020 §2.2, re-targeted
    at the synthetic corpus): drop lines with <5 words, containing '{',
    or ending in ':'. Pure map stage over extracted pages."""
    from documentai_ray.stages.lines import c4_line_filter_batch

    ds = _extracted_pages_with_doc_id(sf_dir)
    return ds.map_batches(c4_line_filter_batch, batch_format="pyarrow",
                          batch_size=256).select_columns(
        ["url", "clean_text", "n_lines_kept", "n_lines"])


def _q_normalize_text(sf_dir: str):
    """Unicode NFC + whitespace normalization (the CCNet/mC4 cleanup
    pass). The corpus is ASCII, so deterministic 'messy' markers
    (decomposed accents / tab-newline runs) are planted by doc_id — the
    SQL oracle plants the identical markers and normalizes with DuckDB's
    ``nfc_normalize``; NFC itself is the cross-engine standard."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.curation import normalize_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def messy(batch: pa.Table) -> pa.Table:
        out = []
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if i % 3 == 1:
                t = t + " nai\u0308ve fac\u0327ade"  # decomposed; NFC recomposes
            elif i % 3 == 2:
                t = "\t " + t + " \n\nout  "
            out.append(t)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(out, pa.large_string())})

    ds = ds.map_batches(messy, batch_format="pyarrow")
    ds = ds.map_batches(normalize_batch, batch_format="pyarrow",
                        batch_size=512)
    return ds.select_columns(["doc_id", "norm_text", "n_chars_raw",
                              "n_chars_norm"])


def _q_chunk_documents(sf_dir: str):
    """Overlapping token-window chunking (window 32, stride 24) — RAG /
    context-window prep. Map-only row explosion; chunk count and slice
    bounds are integer math mirrored op-for-op in SQL."""
    import functools

    import ray.data

    from documentai_ray.stages.curation import chunk_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(functools.partial(chunk_batch, window=32, stride=24),
                          batch_format="pyarrow", batch_size=512)


def _q_pack_sequences(sf_dir: str):
    """Greedy sequence packing into 256-token training bins per source
    shard (docs in doc_id order; over-budget docs capped to a full bin).
    One bucketed shuffle + one ordered pass per partition; the oracle is
    a recursive CTE stepping the same greedy recurrence."""
    from documentai_ray.stages.curation import pack_sequences

    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "text"])
    out = pack_sequences(ds, budget=256, num_partitions=16)
    return out.select_columns(["doc_id", "source", "n_tokens", "cost",
                               "bin_id"])


def _q_inverted_index(sf_dir: str):
    """Inverted index over the documents table: token → (df, sorted
    postings). Shuffle carries the DISTINCT (token, doc) relation only;
    posting lists built per token-hash bucket (group count bounded by P,
    not vocabulary)."""
    import ray.data

    from documentai_ray.stages.indexing import inverted_index

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return inverted_index(ds, num_partitions=16)


def _q_tfidf_topk(sf_dir: str):
    """Per-doc top-3 terms by integer rarity score tf·10⁶//df (pure
    integer math — bit-exact across engines, unlike float log idf).
    df pass is distributed; the vocabulary-sized df table broadcasts
    once via ray.put."""
    import ray.data

    from documentai_ray.stages.indexing import tfidf_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return tfidf_topk(ds, k=3)


def _q_canonical_url_dedup(sf_dir: str):
    """Crawl-frontier URL canonicalization: collapse ?query/#fragment
    variants (the planted ?amp=1 near-dup pages) to one row per canonical
    URL, keeping the smallest variant + the variant count."""
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import dedup_canonical_url
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir, with_dups=False, with_near_dups=True)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    return dedup_canonical_url(ds.select_columns(["url", "text"]),
                               num_partitions=16)


def _q_host_stats(sf_dir: str):
    """Per-host crawl statistics (doc count + exact total chars) over the
    deduped pages corpus — the skew-detection pass that feeds salted
    partitioning (state/partitioning.py): the heavy host is visible as
    one row with ~a third of the corpus."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Sum

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))

    def host(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table({"host": pa.array([u.split("/")[2] for u in urls],
                                          pa.string()),
                         "n_chars": pa.array([len(t or "") for t in texts],
                                             pa.int64())})

    return (ds.map_batches(host, batch_format="pyarrow")
            .groupby("host")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_chars", alias_name="total_chars")))


def _q_skew_join(sf_dir: str):
    """Skew-aware partitioned join: attach per-host crawl stats (doc
    count) to EVERY page. The dim side is host-cardinality (~1e8 hosts at
    crawl scale — never driver-broadcastable), and the fact side is
    skewed: ``heavy.example.com`` carries ~33% of rows, so a plain
    bucketed join sends a third of the exchange into ONE reducer.
    ``detect_heavy_hosts`` (share ≥ 10%) feeds ``salted_join``: the hot
    host's fact rows spread over k=8 salt sub-buckets with its dim row
    replicated into each — output is row-identical to the unsalted join
    (the pytest pins that equality; this query pins values vs SQL).

    The (url, host) projection is pinned once — it feeds three consumers
    (skew detection, the dim aggregate, the join) and re-deriving it per
    consumer would triple the synthesis pass (NOTES.md lazy-lineage
    lesson)."""
    import pyarrow as pa
    from ray.data.aggregate import Count

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.joins import salted_join
    from documentai_ray.state.partitioning import detect_heavy_hosts

    ds = pages_dataset(sf_dir, with_dups=False, with_near_dups=False)

    def host(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        return pa.table({
            "url": batch.column("url"),
            "host": pa.array([u.split("/")[2] for u in urls], pa.string()),
        })

    fact = ds.select_columns(["url"]).map_batches(
        host, batch_format="pyarrow").materialize()
    heavy = detect_heavy_hosts(fact, share_threshold=0.10, salt_k=8)
    dim = fact.groupby("host").aggregate(Count(alias_name="host_docs"))
    out = salted_join(fact, dim, on="host", heavy_keys=heavy,
                      num_partitions=32)
    return out.select_columns(["url", "host", "host_docs"])


def _q_host_template_strip(sf_dir: str):
    """Per-host template-line removal (RefinedWeb "line-wise corrections"
    / CCNet per-shard repeated-paragraph strip): lines on ≥ 1/4 of a
    host's non-empty pages (host ≥ 5 such pages) are site chrome and are
    stripped from every page of that host. The heavy host's repeated PO
    chrome ("DELIVERY CFR …", "BUYER: …") crosses the threshold by
    construction; unique body lines never do. Integer-exact share test
    (4·n ≥ host_pages) so Ray and SQL agree bit-for-bit."""
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch
    from documentai_ray.stages.lines import strip_host_templates

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))
    return strip_host_templates(ds.select_columns(["url", "text"]),
                                min_pages=5, share_num=1, share_den=4)


def _q_warc_ingest(sf_dir: str):
    """Real-container ingestion: the pages corpus serialized as 8
    per-record-gzipped ``.warc.gz`` shards (Common Crawl's ISO-28500
    layout), then read back with the shard-parallel WARC reader (one
    parse task per shard — CC's parallelism unit) → extraction. Oracle:
    the encoding-independent golden text, so a framing/envelope bug
    anywhere in the WARC writer/reader chain surfaces as a text
    mismatch. In production the shards are the INPUT; the synthesis here
    only stands in for the crawl dump."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from documentai_ray.functions.warc import read_warc, write_warc
    from documentai_ray.sources.pages import (payload_for, url_for,
                                              warc_ts_for)
    from documentai_ray.stages.extract import extract_batch

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = f"/tmp/warc_shards_{tag}"
    n_shards = 8
    paths = [os.path.join(d, f"shard-{i:02d}.warc.gz")
             for i in range(n_shards)]
    marker = os.path.join(d, f"_done_{docs.num_rows}")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        shards: list[list] = [[] for _ in range(n_shards)]
        for did, text, src in zip(docs.column("doc_id").to_pylist(),
                                  docs.column("text").to_pylist(),
                                  docs.column("source").to_pylist()):
            shards[did % n_shards].append(
                (url_for(did, src), warc_ts_for(did), payload_for(did, text)))
        for p, recs in zip(paths, shards):
            write_warc(p, recs)
        with open(marker, "w") as f:
            f.write("ok")

    ds = read_warc(paths)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        batch_size=256)
    return _norm_strings_ds(ds.select_columns(["url", "text"]))


def _q_wet_roundtrip(sf_dir: str):
    """WET sink + source roundtrip: extract → latest-capture dedup →
    distributed WET write (url-hash bucketed ``.warc.wet.gz`` shards,
    per-record gzip members, atomic per-shard publish) → shard-parallel
    WET read-back. Oracle: the golden (url, text) set — any framing or
    encoding defect in the conversion-record chain breaks the match."""
    import hashlib
    import os

    from documentai_ray.functions.warc import read_wet, write_wet_shards
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = f"/tmp/wet_shards_{tag}"
    manifest = write_wet_shards(ds, out_dir, num_shards=8)
    paths = sorted(r["path"] for r in manifest.iter_rows())
    return _norm_strings_ds(read_wet(paths).select_columns(["url", "text"]))


def _q_jsonl_roundtrip(sf_dir: str):
    """JSONL.gz sink + source roundtrip (the C4/Pile interchange layout):
    extract → latest-capture dedup → url-hash bucketed byte-deterministic
    .jsonl.gz shards (sort_keys, mtime=0, atomic per-shard publish) →
    shard-parallel read-back. Oracle: the golden (url, text) set — any
    serialization/escaping defect (unicode, newlines-in-text) breaks the
    match."""
    import hashlib

    from documentai_ray.sources.jsonl import read_jsonl, write_jsonl_shards
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = f"/tmp/jsonl_shards_{tag}"
    manifest = write_jsonl_shards(ds.select_columns(["url", "text"]), out_dir,
                                  num_shards=8)
    paths = sorted(r["path"] for r in manifest.iter_rows())
    return _norm_strings_ds(read_jsonl(paths).select_columns(["url", "text"]))


def _q_cdx_fetch(sf_dir: str):
    """CDX random-access path end-to-end: distributed indexed-WARC write
    (url-hash bucketed shards whose write tasks EMIT their CDX index
    rows), select a deterministic url subset (doc_id % 9 == 2 parsed
    from the url), range-read exactly those records (one gzip member
    each — never a shard scan), then extract. Oracle: the golden
    (url, text) subset — a framing/offset defect anywhere in the
    write→index→fetch chain breaks the match."""
    import hashlib

    import pyarrow as pa

    from documentai_ray.functions.warc import (fetch_record,
                                               write_warc_shards_indexed)
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir, with_dups=False)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = f"/tmp/cdx_shards_{tag}"
    idx = write_warc_shards_indexed(
        ds.select_columns(["url", "warc_ts", "html"]), out_dir, num_shards=8)

    def want(batch: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[1])
               for u in batch.column("url").to_pylist()]
        mask = pa.array([i % 9 == 2 for i in ids])
        return batch.filter(mask)

    def fetch_and_extract(batch: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for p, off, ln in zip(batch.column("path").to_pylist(),
                              batch.column("offset").to_pylist(),
                              batch.column("length").to_pylist()):
            u, _ts, body = fetch_record(p, off, ln)
            urls.append(u)
            htmls.append(body)
        t = pa.table({"url": pa.array(urls, pa.string()),
                      "html": pa.array(htmls, pa.large_binary())})
        return extract_batch(t).select(["url", "text"])

    sel = idx.map_batches(want, batch_format="pyarrow")
    return _norm_strings_ds(sel.map_batches(fetch_and_extract,
                                            batch_format="pyarrow",
                                            batch_size=64))


def _q_kcenter_select(sf_dir: str):
    """Greedy k-center (farthest-point) coreset selection over the
    embeddings table, k=4 — the diversity-coverage sampling op: one
    streaming pass per round, each batch ships ONE candidate row, global
    argmax ties to smallest id. Oracle: the greedy unrolled in SQL
    (ORDER BY least(list_distance...) DESC, vec_id chains — sqrt is
    monotone so L2 vs squared-L2 ordering agrees; margins ≫ ulp drift
    per the kmeans float contract)."""
    import ray.data

    from documentai_ray.stages.similarity import kcenter_select

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return kcenter_select(ds, k=4)


def _q_zorder_keys(sf_dir: str):
    """Z-order (Morton) clustering keys over (l_orderkey, l_partkey) low
    16 bits — the multi-dimensional layout key a storage optimizer sorts
    by so range scans on EITHER column touch few files. Map-only
    vectorized bit interleave; oracle mirrors the interleave bit-for-bit
    with a list_sum over generate_series."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import zorder_key

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey",
                                        "l_linenumber"])

    def add_key(batch: pa.Table) -> pa.Table:
        z = zorder_key(batch.column("l_orderkey").to_numpy(),
                       batch.column("l_partkey").to_numpy())
        return batch.append_column("zkey", pa.array(z, pa.int64()))

    return ds.map_batches(add_key, batch_format="pyarrow")


def _q_merge_upsert(sf_dir: str):
    """CDC MERGE over the document snapshot: a changelog of updates
    (doc_id%3==0, ts=1, version=1) and deletes (doc_id%7==0, ts=2) is
    applied to the base (ts=0, version=0) — one key-hash exchange, one
    vectorized latest-wins-with-delete-priority pass per partition
    (joins.merge_changelog). Expected state is the closed form: deleted
    iff %7==0, else version = 1 iff %3==0."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    base = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])

    def base_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"doc_id": batch.column("doc_id"),
                         "source": batch.column("source"),
                         "version": pa.array([0] * n, pa.int64()),
                         "ts": pa.array([0] * n, pa.int64()),
                         "op": pa.array(["I"] * n, pa.string())})

    def change_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(), np.int64)
        srcs = batch.column("source").to_pylist()
        out = {"doc_id": [], "source": [], "version": [], "ts": [], "op": []}
        for i, s in zip(ids, srcs):
            if i % 3 == 0:
                out["doc_id"].append(int(i)); out["source"].append(s)
                out["version"].append(1); out["ts"].append(1)
                out["op"].append("U")
            if i % 7 == 0:
                out["doc_id"].append(int(i)); out["source"].append(s)
                out["version"].append(-1); out["ts"].append(2)
                out["op"].append("D")
        return pa.table({"doc_id": pa.array(out["doc_id"], pa.int64()),
                         "source": pa.array(out["source"], pa.string()),
                         "version": pa.array(out["version"], pa.int64()),
                         "ts": pa.array(out["ts"], pa.int64()),
                         "op": pa.array(out["op"], pa.string())})

    from documentai_ray.stages.joins import merge_changelog

    changes = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(change_rows, batch_format="pyarrow")
    merged = merge_changelog(base.map_batches(base_rows,
                                              batch_format="pyarrow"),
                             changes, key_col="doc_id")
    return merged.select_columns(["doc_id", "source", "version"])


def _q_scd2_build(sf_dir: str):
    """Build an SCD Type-2 dimension from the raw event stream — the
    inverse of scd2_join's consumer side: per user, consecutive equal
    event_type observations collapse into one [valid_from, valid_to)
    range, a change closes the previous range, the latest stays open
    (valid_to = 2100-01-01 epoch). Exercises ``windows.scd2_build``:
    one key-hash exchange, all keys per partition resolved in one
    vectorized change-mask pass; equal-ts ties resolve to the smallest
    value globally because keys co-locate."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.windows import scd2_build

    def prep(batch: pa.Table) -> pa.Table:
        t = (batch.column("ts").to_numpy().astype("datetime64[us]")
             .astype("int64") // 1_000_000)
        return pa.table({"user_id": batch.column("user_id"),
                         "t": pa.array(t, pa.int64()),
                         "event_type": batch.column("event_type")})

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"]
                               ).map_batches(prep, batch_format="pyarrow")
    return scd2_build(ds, key_col="user_id", val_col="event_type",
                      ts_col="t", open_end=4102444800,
                      num_partitions=32)


def _q_asof_snapshot(sf_dir: str):
    """Time-travel read (AS OF version 1): reconstruct the table state
    after the updates but BEFORE the deletes of merge_upsert's
    changelog — the lakehouse MVCC query, expressed as the same
    merge_changelog plan over changes filtered to ``ts ≤ 1``. The
    version cutoff is a pure pre-merge filter: snapshot isolation falls
    out of the changelog's own ordering, no extra state. Expected
    state: every doc present (deletes are at ts 2), version 1 iff
    doc_id % 3 == 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.joins import merge_changelog

    base = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])

    def base_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"doc_id": batch.column("doc_id"),
                         "source": batch.column("source"),
                         "version": pa.array([0] * n, pa.int64()),
                         "ts": pa.array([0] * n, pa.int64()),
                         "op": pa.array(["I"] * n, pa.string())})

    def change_rows_upto_v1(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(), np.int64)
        srcs = batch.column("source").to_pylist()
        keep = ids % 3 == 0      # the ts=2 deletes are beyond the cutoff
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "source": pa.array([s for s, k in zip(srcs, keep) if k],
                               pa.string()),
            "version": pa.array([1] * int(keep.sum()), pa.int64()),
            "ts": pa.array([1] * int(keep.sum()), pa.int64()),
            "op": pa.array(["U"] * int(keep.sum()), pa.string())})

    changes = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(change_rows_upto_v1, batch_format="pyarrow")
    merged = merge_changelog(base.map_batches(base_rows,
                                              batch_format="pyarrow"),
                             changes, key_col="doc_id")
    return merged.select_columns(["doc_id", "source", "version"])


def _q_late_events(sf_dir: str):
    """Watermark late-event routing: per-user watermark = max(ts) − 120
    min (one groupby-max row per key), shipped back via a bucketed
    hash_join; late = older than the watermark — the rows a streaming
    engine diverts to the late side-output. Oracle: the same flag via a
    max() window."""
    import ray.data

    from documentai_ray.stages.windows import route_late_events

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])
    out = route_late_events(ds)
    return out.select_columns(["event_id", "user_id", "is_late"])


def _q_online_neardup(sf_dir: str):
    """Online near-dup lookup against a SHARED MUTABLE LSH INDEX — the
    one shape the Dataset API can't express (state written by the index
    phase must be readable by later query batches), so it runs on
    hash-sharded Ray actors (state/lsh_index.py): band keys route to the
    shard that owns their bucket slice; adds and probes are batched RPCs.
    Index = the base pages; queries = the planted ?amp=1 variants; LSH
    candidates re-rank by exact Jaccard ≥ 0.8 (broadcast text maps —
    documented small-side path). Oracle: each amp variant matches exactly
    its original (the minhash_neardup recall/precision contract)."""
    import pyarrow as pa

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.state.lsh_index import (build_lsh_index,
                                                query_lsh_index,
                                                verify_with_texts)

    ds = pages_dataset(sf_dir, with_dups=False, with_near_dups=True)
    ds = ds.select_columns(["url", "text"]).materialize()

    def is_amp(batch: pa.Table, want: bool) -> pa.Table:
        mask = [u.endswith("?amp=1") == want
                for u in batch.column("url").to_pylist()]
        return batch.filter(pa.array(mask))

    base = ds.map_batches(lambda b: is_amp(b, False), batch_format="pyarrow")
    amps = ds.map_batches(lambda b: is_amp(b, True), batch_format="pyarrow")

    shards = build_lsh_index(base, id_col="url")
    cands = query_lsh_index(amps, shards, id_col="url")
    imap = {r["url"]: r["text"] for r in base.iter_rows()}
    qmap = {r["url"]: r["text"] for r in amps.iter_rows()}
    out = verify_with_texts(cands, qmap, imap, threshold=0.8)
    return out.select_columns(["query_id", "match_id"])


def _q_fetch_schedule(sf_dir: str):
    """Politeness-complete fetch schedule: per-host Crawl-delay parsed
    from synthesized robots.txt by the REAL parser (group selection
    incl. delay), waves from the bucketed per-host row_number, and
    fetch_at_s = (wave−1) × delay — the actual timestamp plan a polite
    crawler executes. Oracle: row_number window × the closed-form delay
    rule (1 + N%4 s for srcN, 5 s for the heavy host)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from documentai_ray.functions.robots import parse_robots_txt
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.windows import running_per_key

    srcs = sorted(set(pq.read_table(f"{sf_dir}/documents.parquet",
                                    columns=["source"])
                      .column("source").to_pylist()))
    robots = {"heavy.example.com": "User-agent: *\nCrawl-delay: 5\n"}
    for s in srcs:
        n = int(s[3:])
        robots[f"{s}.example.com"] = (
            f"User-agent: *\nCrawl-delay: {1 + n % 4}\n")
    delays = {h: int(parse_robots_txt(t).crawl_delay)
              for h, t in robots.items()}
    dref = ray.put(delays)

    ds = pages_dataset(sf_dir, with_dups=False).select_columns(["url"])

    def add_host(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts = [u.split("/")[2] for u in urls]
        return pa.table({"url": batch.column("url"),
                         "host": pa.array(hosts, pa.string()),
                         "_one": pa.array([1] * len(urls), pa.int64())})

    waved = running_per_key(ds.map_batches(add_host, batch_format="pyarrow"),
                            key_col="host", order_cols=["url"],
                            cum_col="_one", seq_col="wave", out_col="_run")

    def schedule(batch: pa.Table) -> pa.Table:
        d = ray.get(dref)
        hosts = batch.column("host").to_pylist()
        waves = batch.column("wave").to_pylist()
        at = [int((w - 1) * d[h]) for h, w in zip(hosts, waves)]
        return pa.table({"url": batch.column("url"),
                         "host": batch.column("host"),
                         "wave": batch.column("wave"),
                         "fetch_at_s": pa.array(at, pa.int64())})

    return waved.map_batches(schedule, batch_format="pyarrow")


def _q_users_sketch(sf_dir: str):
    """Per-event-type distinct-user KMV sketch — the scale path past
    exact COUNT(DISTINCT) per key (users_per_event shuffles every
    distinct pair; this ships ≤ k=128 hashes per key per batch no matter
    how many users exist). Exact below k per group; estimator above.
    Oracle: the identical sketch per group via a row_number window +
    HUGEINT division."""
    import ray.data

    from documentai_ray.stages.sketches import grouped_kmv_distinct

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return grouped_kmv_distinct(ds, key_col="event_type",
                                val_col="user_id", k=128)


def _q_events_anomaly(sf_dir: str):
    """Hourly event-count spike detection per event type in EXACT integer
    arithmetic: |x−μ| > 3σ cross-multiplied to (xn−S)² > 9(nQ−S²) so no
    float mean/std ever reaches the compared columns (windows.
    flag_count_anomalies). Oracle: the same integer inequality over SQL
    window sums."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.windows import flag_count_anomalies

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])

    def add_hour(batch: pa.Table) -> pa.Table:
        import pandas as pd
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        return pa.Table.from_pandas(df[["event_type", "hour"]],
                                    preserve_index=False)

    hours = ds.map_batches(add_hour, batch_format="pyarrow")
    return flag_count_anomalies(hours, key_col="event_type",
                                bucket_col="hour")


def _q_table_checksum(sf_dir: str):
    """Order-independent cross-engine table digests — the data-validation
    primitive for migrations/replication: per table, a wrapping mod-2⁶⁴
    sum of the md5-LE64 hash of each row's canonical string.  Per-batch
    partials carry the sum as (hi, lo) 2³²-split int64 columns so no
    engine-side overflow is possible; one tiny groupby merges them and a
    final map reassembles (hi·2³² + lo) mod 2⁶⁴ → signed int64 with
    Python bignums.  Oracle: HUGEINT sum of the identical md5 expression
    % 2⁶⁴, signed-reinterpreted."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.sketches import md5_le64

    specs = {
        "customer": (["c_custkey", "c_name", "c_mktsegment"], "customer"),
        "orders": (["o_orderkey", "o_orderstatus", "o_orderpriority"],
                   "orders"),
        "nation": (["n_nationkey", "n_name"], "nation"),
    }

    def make_partial(tname: str, cols: list):
        def partial(batch: pa.Table) -> pa.Table:
            arrays = [batch.column(c).to_pylist() for c in cols]
            total = 0
            for vals in zip(*arrays):
                s = tname + "|" + "|".join(str(v) for v in vals)
                total = (total + md5_le64(s)) % (1 << 64)
            return pa.table({"table_name": pa.array([tname], pa.string()),
                             "n_rows": pa.array([batch.num_rows], pa.int64()),
                             "hi": pa.array([total >> 32], pa.int64()),
                             "lo": pa.array([total & 0xFFFFFFFF],
                                            pa.int64())})
        return partial

    parts = None
    for tname, (cols, fname) in specs.items():
        ds = ray.data.read_parquet(f"{sf_dir}/{fname}.parquet",
                                   columns=cols)
        p = ds.map_batches(make_partial(tname, cols),
                           batch_format="pyarrow")
        parts = p if parts is None else parts.union(p)

    agg = parts.groupby("table_name").aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("hi", alias_name="hi"), Sum("lo", alias_name="lo"))

    def derive(batch: pa.Table) -> pa.Table:
        out = []
        for hi, lo in zip(batch.column("hi").to_pylist(),
                          batch.column("lo").to_pylist()):
            v = ((hi << 32) + lo) % (1 << 64)
            out.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pa.table({"table_name": batch.column("table_name"),
                         "n_rows": batch.column("n_rows"),
                         "checksum": pa.array(out, pa.int64())})

    return agg.map_batches(derive, batch_format="pyarrow")


def _q_string_agg_topdocs(sf_dir: str):
    """Grouped ORDERED string aggregation (string_agg ... ORDER BY): per
    source, the comma-joined list of its 5 smallest doc_ids.  Ordered
    concat can't pre-combine across unordered partials, so the scale-safe
    plan bounds the per-key row count FIRST (grouped_topk: map-side
    partial top-k, one key exchange) and concatenates only the ≤k
    surviving rows per key."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import grouped_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])
    top = grouped_topk(ds, key_col="source", sort_cols=["doc_id"],
                       ascending=[True], k=5, num_partitions=16)

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "doc_list": [",".join(str(d) for d in g["doc_id"])],
            "n_top": pd.array([len(g)], dtype="int64")})

    return top.groupby("source").map_groups(concat, batch_format="pandas")


def _q_gap_fill(sf_dir: str):
    """Time-series gap fill: the per-type hourly series densified to the
    full global hour grid — missing hours get n_events=0 and carry the
    last observed hourly cents total forward (LOCF); hours before a
    type's first observation stay NULL.  Physical plan: one exchange
    aggregates (type, hour) cells with per-batch pre-combined partials;
    the grid construction + LOCF run on the AGGREGATED cells only
    (|types|·|hours| rows — bounded by the time span, not the corpus, a
    documented size contract), vectorized via reindex + groupby-ffill.
    Oracle: generate_series grid + last_value(... IGNORE NULLS) OVER."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        df["cents"] = np.rint(df["value"].to_numpy() * 100).astype("int64")
        g = (df.groupby(["event_type", "hour"], as_index=False)
             .agg(n_events=("cents", "size"), cents=("cents", "sum")))
        g["n_events"] = g["n_events"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["event_type", "hour"])
             .aggregate(Sum("n_events", alias_name="n_events"),
                        Sum("cents", alias_name="cents")))

    # aggregated cells are span-bounded (|types| x |hours|) — the one
    # documented driver-side materialization, same contract as the
    # anomaly stats broadcast.
    from documentai_ray.stages.windows import gap_fill_locf

    full = gap_fill_locf(cells.to_pandas(), key_col="event_type",
                         bucket_col="hour", count_col="n_events",
                         gauge_col="cents")
    return ray.data.from_arrow(
        pa.Table.from_pandas(full, preserve_index=False))


def _q_cube_counts(sf_dir: str):
    """GROUPING SETS / CUBE(lang, source): counts and char totals at all
    four aggregation levels with an 'ALL' sentinel on rolled-up axes.
    Physical plan: ONE exchange aggregates the finest (lang, source)
    cells (per-batch pre-combined partials); the cube expansion then runs
    over the aggregated cells only (|langs|·|sources| rows — a flat-map
    emitting each cell's 4 grouping-set projections plus a tiny second
    groupby), never over the raw rows.  Oracle: GROUP BY CUBE +
    coalesce."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (df.groupby(["lang", "source"], as_index=False)
             .agg(n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")))
        g["n_docs"] = g["n_docs"].astype("int64")
        g["total_chars"] = g["total_chars"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["lang", "source"])
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("total_chars", alias_name="total_chars")))

    def expand(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        sets = []
        for roll_lang, roll_src in ((False, False), (False, True),
                                    (True, False), (True, True)):
            p = df.copy()
            if roll_lang:
                p["lang"] = "ALL"
            if roll_src:
                p["source"] = "ALL"
            sets.append(p)
        out = (pd.concat(sets, ignore_index=True)
               .groupby(["lang", "source"], as_index=False).sum())
        out["n_docs"] = out["n_docs"].astype("int64")
        out["total_chars"] = out["total_chars"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    # the cell table is tiny (|langs|·|sources|); a second 2-key groupby
    # merges the per-block expansions into exact cube cells.
    return (cells.map_batches(expand, batch_format="pyarrow")
            .groupby(["lang", "source"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("total_chars", alias_name="total_chars")))


_SCD2_SEGMENTS = ("BRONZE", "SILVER", "GOLD", "PLATINUM", "TRIAL")


def _q_scd2_join(sf_dir: str):
    """SCD Type-2 effective-dated dimension join: each order picks the
    customer-segment VERSION valid at its order date (valid_from ≤ date <
    valid_to).  Because every key's versions tile time completely, this
    is exactly a per-key backward as-of join — one bucketed exchange
    (joins.asof_join), never a broadcast (the dimension is
    customer-sized, i.e. fact-adjacent).  The versioned dimension is
    synthesized deterministically from customer (3 versions per key with
    custkey-derived boundaries); the oracle rebuilds it with
    lead() OVER and joins on the interval."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.joins import asof_join

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])

    def versions(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy()
        n = len(ck)
        keys = np.repeat(ck, 3)
        ver = np.tile(np.array([1, 2, 3], np.int64), n)
        base = np.empty(3 * n, "datetime64[us]")
        base[0::3] = np.datetime64("1992-01-01", "us")
        base[1::3] = (np.datetime64("1996-01-01", "us")
                      + (ck % 365).astype("timedelta64[D]").astype(
                          "timedelta64[us]"))
        base[2::3] = (np.datetime64("1999-01-01", "us")
                      + ((ck * 7) % 365).astype("timedelta64[D]").astype(
                          "timedelta64[us]"))
        seg = np.array(_SCD2_SEGMENTS)[(keys + ver) % 5]
        return pa.table({"o_custkey": pa.array(keys, pa.int64()),
                         "o_orderdate": pa.array(base,
                                                 pa.timestamp("us")),
                         "version": pa.array(ver, pa.int64()),
                         "segment": pa.array(seg, pa.string())})

    dim = cust.map_batches(versions, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    return asof_join(orders, dim, on="o_orderdate", by="o_custkey",
                     direction="backward")


def _q_grouped_regression(sf_dir: str):
    """Per-group OLS sufficient statistics in exact integer arithmetic —
    the corr/covar_pop/regr_slope aggregate family with no float crossing
    the engine boundary (aggregates.grouped_linreg): quantity vs
    extendedprice-cents per returnflag.  cov_num = n·Σxy−Σx·Σy,
    var_num = n·Σxx−(Σx)², slope_q = trunc-division — bit-identical to
    the HUGEINT-safe SQL mirror.  Domain bound n·max|x·y| < 2⁶³ holds
    through sf0.1 (≈3.4e18); rescale y for bigger corpora (documented)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import grouped_linreg

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def prep(batch: pa.Table) -> pa.Table:
        q = batch.column("l_quantity").to_numpy().astype("int64")
        cents = np.rint(batch.column("l_extendedprice").to_numpy()
                        * 100).astype("int64")
        return pa.table({"l_returnflag": batch.column("l_returnflag"),
                         "x": pa.array(q, pa.int64()),
                         "y": pa.array(cents, pa.int64())})

    return grouped_linreg(ds.map_batches(prep, batch_format="pyarrow"),
                          key_col="l_returnflag", x_col="x", y_col="y")


def _q_event_transitions(sf_dir: str):
    """Markov transition matrix over per-user event streams — the LAG
    window primitive (prev_type → next_type adjacency counts, ordered by
    ts with event_id tiebreak). One key-hash exchange; each partition
    pre-combines to ≤|types|² rows (windows.transitions_per_key).
    Oracle: lag() OVER (PARTITION BY user ORDER BY ts, event_id)."""
    import ray.data

    from documentai_ray.stages.windows import transitions_per_key

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"])
    return transitions_per_key(ds, key_col="user_id", ts_col="ts",
                               type_col="event_type",
                               tiebreak_col="event_id")


def _q_funnel_conversion(sf_dir: str):
    """Ordered multi-step funnel (view → click → purchase, strict time
    order): per-user deepest completed prefix, aggregated to a depth
    histogram. Per-partition vectorized step resolution (3 filtered
    groupby-min + merge passes for ALL users at once), partial depth
    counts pre-combined before the final tiny groupby
    (windows.funnel_depth). Only high-value events (value ≥ 150) count
    as funnel steps — the cutoff keeps every depth bucket populated
    (otherwise the dense synthetic stream puts all users at depth 3 and
    the check is vacuous). Oracle: chained min-ts subqueries."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.windows import funnel_depth

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])
    ds = (ds.filter(expr="value >= 150")
          .select_columns(["user_id", "ts", "event_type"]))
    per_user = funnel_depth(ds, key_col="user_id", ts_col="ts",
                            type_col="event_type",
                            steps=("view", "click", "purchase"))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = (df.groupby("depth", sort=False).size()
               .rename("n_users").reset_index())
        out["n_users"] = out["n_users"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return (per_user.map_batches(partial, batch_format="pyarrow")
            .groupby("depth").aggregate(Sum("n_users", alias_name="n_users")))


def _q_lang_rebalance(sf_dir: str):
    """Language-balanced corpus cap: keep the K=30 longest docs per
    language — the rebalancing step multilingual corpora apply so
    high-resource languages don't swamp the mix (same grouped_topk
    physical plan as the per-domain cap: partial top-k per batch, one
    key-hash exchange). Oracle: row_number window."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import grouped_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])

    def measure(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": batch.column("lang"),
                         "n_chars": pa.array([len(t or "") for t in texts],
                                             pa.int64())})

    sized = ds.map_batches(measure, batch_format="pyarrow")
    return grouped_topk(sized, key_col="lang",
                        sort_cols=["n_chars", "doc_id"],
                        ascending=[False, True], k=30)


def _q_drop_funnel(sf_dir: str):
    """Curation drop-funnel audit: every document tagged with the FIRST
    rule that drops it (short → bad_lang → low_confidence → kept, the
    curate_corpus rule set in fixed order) — the funnel report a corpus
    run publishes so "why did my doc disappear" is answerable. Oracle:
    the same CASE ladder over the mirrored quality SQL."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.quality import quality_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    ds = ds.map_batches(quality_batch, batch_format="pyarrow",
                        batch_size=512)

    def tag(t: pa.Table) -> pa.Table:
        import numpy as np
        n_chars = np.asarray(t.column("n_chars").to_pylist())
        lang_ok = np.asarray(t.column("lang_ok").to_pylist())
        conf = np.asarray(t.column("confidence").to_pylist())
        reason = np.where(n_chars < 100, "short",
                          np.where(~lang_ok, "bad_lang",
                                   np.where(conf < 0.6, "low_confidence",
                                            "kept")))
        return pa.table({"doc_id": t.column("doc_id"),
                         "drop_reason": pa.array(reason.tolist(),
                                                 pa.string())})

    return ds.map_batches(tag, batch_format="pyarrow")


def _q_tfrecord_roundtrip(sf_dir: str):
    """TFRecord sink + source roundtrip (the TF-ecosystem shard
    container, spec framing with masked CRC32C integrity — Castagnoli
    table in numpy, RFC 3720 vector pinned in tests): extract →
    latest-capture dedup → url-hash bucketed shards (atomic publish) →
    CRC-VALIDATING shard-parallel read-back. Oracle: the golden
    (url, text) set."""
    import hashlib

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.sources.tfrecord import (read_tfrecord,
                                                 write_tfrecord_shards)
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = f"/tmp/tfrecord_shards_{tag}"
    manifest = write_tfrecord_shards(ds.select_columns(["url", "text"]),
                                     out_dir, num_shards=8)
    paths = sorted(r["path"] for r in manifest.iter_rows())
    return _norm_strings_ds(
        read_tfrecord(paths).select_columns(["url", "text"]))


def _q_csv_roundtrip(sf_dir: str):
    """CSV sink + source roundtrip (RFC 4180, QUOTE_ALL + CRLF so
    embedded newlines/quotes in extracted text survive): extract →
    latest-capture dedup → url-hash bucketed shards → shard-parallel
    read-back. Oracle: the golden (url, text) set — any quoting defect
    breaks the match on the first multi-line document."""
    import hashlib

    from documentai_ray.sources.jsonl import (read_csv_shards,
                                              write_csv_shards)
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = f"/tmp/csv_shards_{tag}"
    manifest = write_csv_shards(ds.select_columns(["url", "text"]), out_dir,
                                num_shards=8)
    paths = sorted(r["path"] for r in manifest.iter_rows())
    return _norm_strings_ds(
        read_csv_shards(paths).select_columns(["url", "text"]))


def _q_ipc_roundtrip(sf_dir: str):
    """Arrow IPC (Feather V2) sink + source roundtrip — the zero-copy
    columnar interchange: readers memory-map record batches with no
    parse step, the natural hand-off between Arrow-native engines.
    Oracle: the golden (url, text) set."""
    import hashlib

    from documentai_ray.sources.jsonl import read_ipc_shards, write_ipc_shards
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = f"/tmp/ipc_shards_{tag}"
    manifest = write_ipc_shards(ds.select_columns(["url", "text"]), out_dir,
                                num_shards=8)
    paths = sorted(r["path"] for r in manifest.iter_rows())
    return _norm_strings_ds(
        read_ipc_shards(paths).select_columns(["url", "text"]))


def _q_sorted_export(sf_dir: str):
    """Range-partitioned sorted export of the SURT key space (the CDX
    shard layout): explicit driver-chosen boundaries split the reversed-
    host key space into 4 shards, each written key-sorted with atomic
    publish — manifest (shard, n_rows, min_key, max_key) is the
    binary-searchable index. Oracle: bucket = count of boundaries ≤ key
    (string compare), group counts + min/max. Cross-shard global order
    pinned in pytest by reading the shards back."""
    import hashlib

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.curation import sorted_range_export
    from documentai_ray.stages.dedup import surt_batch

    ds = pages_dataset(sf_dir, with_dups=False).select_columns(["url"])
    keyed = ds.map_batches(surt_batch, batch_format="pyarrow",
                           batch_size=512)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = f"/tmp/sorted_export_{tag}"
    bounds = ["com,example,src1", "com,example,src3",
              "com,example,src6"]
    return sorted_range_export(keyed, out_dir, key_col="surt_key",
                               boundaries=bounds)


def _q_orc_roundtrip(sf_dir: str):
    """ORC sink + source roundtrip (the Hive/Trino lake format) — rounds
    out the columnar interchange trio next to parquet and Arrow IPC.
    Oracle: the golden (url, text) set."""
    import hashlib

    from documentai_ray.sources.jsonl import read_orc_shards, write_orc_shards
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = f"/tmp/orc_shards_{tag}"
    manifest = write_orc_shards(ds.select_columns(["url", "text"]), out_dir,
                                num_shards=8)
    paths = sorted(r["path"] for r in manifest.iter_rows())
    return _norm_strings_ds(
        read_orc_shards(paths).select_columns(["url", "text"]))


def _q_page_meta(sf_dir: str):
    """Page-metadata extraction: first ``<title>`` text per decodable
    page (whitespace-collapsed). Oracle: the archetype→title closed form
    of the corpus templates; malformed pages emit no row."""
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.extract import page_meta_batch

    ds = pages_dataset(sf_dir, with_dups=False)
    return ds.select_columns(["url", "html"]).map_batches(
        page_meta_batch, batch_format="pyarrow", batch_size=512)


def _q_robots_filter(sf_dir: str):
    """Crawl-compliance filtering: pages carrying
    ``<meta name="robots" content="noindex">`` (planted on
    ``doc_id % 11 == 5``) are dropped by a byte-level head scan BEFORE
    any parse/extract cost; everything else passes through. Oracle: the
    url set minus the noindex rule."""
    import pyarrow as pa

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.extract import robots_filter_batch

    ds = pages_dataset(sf_dir, with_dups=False, robots=True)
    ds = ds.select_columns(["url", "html"]).map_batches(
        robots_filter_batch, batch_format="pyarrow", batch_size=512)
    return ds.select_columns(["url"])


def _q_robots_txt_rules(sf_dir: str):
    """Host-side robots.txt compliance (RFC 9309, functions/robots.py):
    per-host policies — synthesized deterministically from the corpus'
    host names — are parsed by the real parser (group selection,
    longest-match, allow-wins ties, empty-Disallow no-op, unknown keys)
    and applied to every page URL as vectorized prefix masks. The heavy
    host exercises agent-group fallback past a googlebot Disallow-all;
    src-hosts exercise a 3-layer longest-match stack (/p/2 < /p/23 <
    /p/234). Oracle: the matching CASE ladder in SQL."""
    import pyarrow.parquet as pq

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.curation import robots_txt_gate

    srcs = sorted(set(pq.read_table(f"{sf_dir}/documents.parquet",
                                    columns=["source"])
                      .column("source").to_pylist()))
    robots = {"heavy.example.com":
              "User-agent: googlebot\nDisallow: /\n\n"
              "User-agent: *\nDisallow: /p/1\nAllow: /p/12\n"}
    for s in srcs:
        n = int(s[3:])
        if n % 3 == 0:
            robots[f"{s}.example.com"] = (
                "# crawl policy\nUser-agent: *\nDisallow: /p/2\n"
                "Allow: /p/23\nDisallow: /p/234\n"
                "Sitemap: https://example.com/sitemap.xml\n")
        elif n % 3 == 1:
            robots[f"{s}.example.com"] = "User-agent: *\nDisallow:\n"
        # n % 3 == 2: no robots.txt published → allow everything

    ds = pages_dataset(sf_dir, with_dups=False).select_columns(["url"])
    return robots_txt_gate(ds, robots)


def _q_surt_keys(sf_dir: str):
    """SURT canonical keys (the Common Crawl CDX sort key): reversed
    comma-joined host labels + ')' + path?query-sorted, lowercased — the
    key form that makes one domain a contiguous range. Runs over the
    amp-variant page set so the query-string path is exercised; www/port
    stripping pinned in pytest. Oracle: the same transform in SQL string
    ops (single-param corpus: sorted == original, multi-param order
    pinned in tests)."""
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import surt_batch

    ds = pages_dataset(sf_dir, with_dups=False, with_near_dups=True)
    return (ds.select_columns(["url"])
            .map_batches(surt_batch, batch_format="pyarrow", batch_size=512))


def _q_anchor_text(sf_dir: str):
    """Anchor-text index (the classic link-graph enrichment signal):
    flat-map (page, link, anchor) edges, per-batch pandas pre-combine,
    then ONE (link, anchor)-keyed exchange summing partial counts — the
    shuffle carries (link, anchor, partial_n), never the edge stream.
    Oracle: the template closed form — every decodable page links
    nav+footer (6 fixed paths), article/report add /rel/1-2, link farms
    add 12 unique /cat/<id>/<i> targets."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.extract import anchor_edges_batch

    ds = pages_dataset(sf_dir, with_dups=False)
    edges = ds.select_columns(["url", "html"]).map_batches(
        anchor_edges_batch, batch_format="pyarrow", batch_size=256)

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.select(["link", "anchor"]).to_pandas()
        n = df.value_counts(["link", "anchor"]).reset_index(name="n")
        return pa.Table.from_pandas(n, preserve_index=False)

    return (edges.map_batches(combine, batch_format="pyarrow")
            .groupby(["link", "anchor"])
            .aggregate(Sum("n", alias_name="n_refs")))


def _q_sitemap_frontier(sf_dir: str):
    """Crawl-frontier discovery composition: per-host sitemapindex →
    child urlsets (real namespace-aware XML parse, broadcast body map
    standing in for the fetch cache) → anti hash_join against the
    already-crawled url set (only url hashes cross the exchange) →
    robots.txt gate (keep_only) — the sitemap-proposes / robots-disposes
    / index-dedups pipeline every recrawl runs. Sitemaps list each
    host's even-doc pages (all already crawled, so the anti-join must
    eliminate them) plus 3 phantom /new/<n> urls; robots blocks /new/2
    on heavy + even-numbered src hosts. Oracle: the phantom closed
    form."""
    import pyarrow.parquet as pq
    import ray.data

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.curation import robots_txt_gate, sitemap_expand
    from documentai_ray.stages.joins import hash_join

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    ids = docs.column("doc_id").to_pylist()
    sources = docs.column("source").to_pylist()
    srcs = sorted(set(sources))
    hosts = ["heavy.example.com"] + [f"{s}.example.com" for s in srcs]

    def page_url(i: int, s: str) -> str:
        host = "heavy.example.com" if i % 3 == 0 else f"{s}.example.com"
        return f"https://{host}/p/{i}"

    by_host: dict[str, list[str]] = {h: [] for h in hosts}
    for i, s in zip(ids, sources):
        if i % 2 == 0:
            h = "heavy.example.com" if i % 3 == 0 else f"{s}.example.com"
            by_host[h].append(page_url(i, s))

    def urlset(entries):
        rows = "".join(
            f"<url><loc>{u}</loc><lastmod>{m}</lastmod></url>"
            for u, m in entries)
        return ('<?xml version="1.0"?><urlset '
                'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                f"{rows}</urlset>")

    entry_rows, bodies = [], {}
    for h in hosts:
        crawled = [(u, "2024-01-01") for u in by_host[h]]
        phantoms = [(f"https://{h}/new/{n}", f"2024-0{n + 1}-01")
                    for n in range(3)]
        c1, c2 = f"https://{h}/sm/1.xml", f"https://{h}/sm/2.xml"
        bodies[c1] = urlset(crawled)
        bodies[c2] = urlset(phantoms)
        entry_rows.append({"host": h, "xml": (
            '<?xml version="1.0"?><sitemapindex '
            'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"<sitemap><loc>{c1}</loc></sitemap>"
            f"<sitemap><loc>{c2}</loc></sitemap></sitemapindex>")})

    robots = {h: "User-agent: *\nDisallow: /new/2\n" for h in hosts
              if h == "heavy.example.com" or int(h.split(".")[0][3:]) % 2 == 0}

    proposed = sitemap_expand(ray.data.from_items(entry_rows), bodies)
    crawled_ds = pages_dataset(sf_dir, with_dups=False).select_columns(["url"])
    fresh = hash_join(proposed, crawled_ds, on="url", how="anti")
    gated = robots_txt_gate(fresh, robots, keep_only=True)
    return gated.select_columns(["host", "url", "lastmod"])


def _q_recrawl_priority(sf_dir: str):
    """Freshness-driven recrawl scheduling over synthesized capture
    histories: each doc gets 1 + doc_id%4 captures; capture j's content
    hash flips to a revision whenever (doc_id+j)%3 == 0 — a closed-form
    mix of never-changed, sometimes-changed and always-changing urls.
    The operator (curation.recrawl_priority) co-locates each url's
    history with one crc32(url)%P exchange and computes change-rate ppm
    + hot/warm/cold buckets in a single vectorized pass per partition.
    Oracle: the same capture table + lag() window in SQL."""
    import hashlib

    import pyarrow as pa
    import ray.data

    from documentai_ray.sources.pages import url_for
    from documentai_ray.stages.curation import recrawl_priority

    def captures(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        srcs = batch.column("source").to_pylist()
        urls, tss, hs = [], [], []
        for i, t, s in zip(ids, texts, srcs):
            for j in range(1 + i % 4):
                urls.append(url_for(i, s))
                tss.append(j)
                body = (t or "") + f" rev{j}" if (i + j) % 3 == 0 else (t or "")
                hs.append(hashlib.md5(body.encode("utf-8")).hexdigest())
        return pa.table({"url": pa.array(urls, pa.string()),
                         "ts": pa.array(tss, pa.int64()),
                         "content_hash": pa.array(hs, pa.string())})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    caps = ds.map_batches(captures, batch_format="pyarrow", batch_size=256)
    return recrawl_priority(caps)


def _q_price_quantiles(sf_dir: str):
    """Approximate p50/p95/p99 of l_extendedprice (exact integer cents)
    per returnflag via the mergeable HDR sketch (16 sub-buckets/octave,
    ≤1/16 relative error by construction): sketch state is keys×buckets
    regardless of value cardinality — the scale path past
    grouped_quantile_int's keys×distinct-values histogram. Oracle: the
    identical bucketing in SQL (length(bin()) bit-length, shift/mask
    sub-bucket, window cumsum rank pick)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import grouped_quantile_sketch

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_returnflag", "l_extendedprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("l_extendedprice").to_numpy() * 100
                    ).astype("int64")
        return pa.table({"l_returnflag": batch.column("l_returnflag"),
                         "price_c": pa.array(c, pa.int64())})

    return grouped_quantile_sketch(
        ds.map_batches(cents, batch_format="pyarrow"),
        key_cols=["l_returnflag"], val_col="price_c")


def _q_fetch_waves(sf_dir: str):
    """Politeness-constrained fetch scheduling: assign every frontier URL
    a wave number = row_number within its host (ordered by url) so wave w
    contains AT MOST ONE url per host — the per-host rate-limit batching
    a crawler executes wave-by-wave. Pure composition of the bucketed
    window stage (windows.running_per_key: one crc32(host)%P exchange,
    vectorized cumcount per partition). Oracle: row_number() window."""
    import pyarrow as pa

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.windows import running_per_key

    ds = pages_dataset(sf_dir, with_dups=False).select_columns(["url"])

    def add_host(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts = [u.split("/")[2] for u in urls]
        ones = [1] * len(urls)
        return pa.table({"url": batch.column("url"),
                         "host": pa.array(hosts, pa.string()),
                         "_one": pa.array(ones, pa.int64())})

    out = running_per_key(ds.map_batches(add_host, batch_format="pyarrow"),
                          key_col="host", order_cols=["url"], cum_col="_one",
                          seq_col="wave", out_col="_run")
    return out.select_columns(["url", "host", "wave"])


def _q_profile_columns(sf_dir: str):
    """ANALYZE-style catalog stats over lineitem dimension-ish columns:
    one streaming pass shipping only sketch-sized per-batch partials
    (counts, native-domain min/max, KMV hash state); n_distinct is exact
    below k=128 — the regime these columns live in — and the oracle
    computes the true count(DISTINCT). min/max stringified only at the
    driver so ordering is value-domain."""
    import ray.data

    from documentai_ray.stages.aggregates import profile_columns

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_linenumber"])
    return profile_columns(
        ds, ["l_returnflag", "l_linestatus", "l_quantity", "l_linenumber"])


def _q_dq_audit(sf_dir: str):
    """Declarative data-quality constraint suite (Deequ/dbt-test-style,
    ``stages/dq.py``) over the orders table — the attest-before-trust
    gate a 100 TB ingest runs ahead of every downstream consumer. Seven
    checks spanning all four physical plans: row-scope checks
    (NOT NULL / accepted domains / numeric range) fuse into ONE
    streaming partial-counts pass; each uniqueness check is one
    exchange bounded by the key's distinct count (violations =
    count(*) − count(DISTINCT)); referential integrity ships
    pre-combined child key counts through the partitioned anti
    hash_join against customers in good standing (c_acctbal ≥ 0) —
    negative-balance customers make the orphan count genuinely nonzero,
    so the audit exercises real failures, not just all-green rows."""
    import ray.data

    from documentai_ray.stages.dq import (AcceptedValues, ForeignKey,
                                          InRange, NotNull, Unique,
                                          dq_report)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_orderpriority", "o_totalprice"])

    import pyarrow as pa

    def good_standing(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.greater_equal(batch.column("c_acctbal"), 0.0)
        return batch.filter(keep).select(["c_custkey"])

    ref = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal"]).map_batches(
            good_standing, batch_format="pyarrow")

    checks = [
        NotNull("o_custkey"),
        Unique("o_orderkey"),
        Unique("o_custkey"),
        AcceptedValues("o_orderstatus", ("O", "F", "P")),
        AcceptedValues("o_orderpriority",
                       ("1-URGENT", "2-HIGH", "3-MEDIUM")),
        InRange("o_totalprice", 0.01, 300000.0),
        ForeignKey("o_custkey", "customer_good"),
    ]
    return dq_report(orders, checks,
                     ref_datasets={"customer_good": (ref, "c_custkey")})


def _q_k_anonymity(sf_dir: str):
    """k-anonymity suppression over customer metadata
    (``privacy.k_anonymize``): before attribute tables ship with a
    corpus, quasi-identifier combinations that single out fewer than
    k=10 individuals are suppressed to '*' (the QI here is
    (nationkey, mktsegment) — re-identification comes from the JOIN of
    harmless columns, not any one). ONE row exchange keyed by the QI
    tuple hash; every equivalence class lands whole in one partition,
    which sizes all its classes in a single vectorized
    groupby-transform. At sf0.01 class sizes span 5–21, so both the
    suppressed and the passing population are genuinely nonempty."""
    import ray.data

    from documentai_ray.stages.privacy import k_anonymize

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"])
    return k_anonymize(cust, qi_cols=["c_nationkey", "c_mktsegment"],
                       k=10)


def _q_l_diversity(sf_dir: str):
    """l-diversity suppression over customer metadata
    (``privacy.l_diversify``) — k-anonymity's homogeneity-attack
    complement: a QI class whose members all share the SAME sensitive
    value (here the account-in-arrears flag) leaks it regardless of
    class size, so classes carrying < 2 distinct sensitive values get
    their QI suppressed to '*'. Same ONE-row-exchange plan as
    k_anonymity (classes co-locate whole, per-partition vectorized
    nunique-transform); at sf0.01 ~9% of balances are negative, so
    all-nonnegative classes genuinely fail while mixed ones pass."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from documentai_ray.stages.privacy import l_diversify

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch.column("c_custkey"),
            "c_nationkey": batch.column("c_nationkey"),
            "c_mktsegment": batch.column("c_mktsegment"),
            "bal_neg": pc.less(batch.column("c_acctbal"), 0.0)})

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"],
    ).map_batches(prep, batch_format="pyarrow")
    return l_diversify(cust, qi_cols=["c_nationkey", "c_mktsegment"],
                       sensitive_col="bal_neg", l=2)


def _q_diversity_index(sf_dir: str):
    """Per-source language diversity of the documents table
    (``aggregates.grouped_diversity``): exact integer-ppm Gini–Simpson
    index 1 − Σ(c_i/n)² — the corpus-mix concentration check run
    before a training mix ships (a source whose diversity ≈ 0 is
    effectively monolingual; a crawl slice dominated by one domain
    shows the same signature). Chosen over Shannon entropy because it
    is rational: scale − (scale·Σc²) // n² reproduces bit-exactly in
    SQL. Two bounded exchanges (distinct (source, lang) pairs, then
    sources); rows never shuffle."""
    import ray.data

    from documentai_ray.stages.aggregates import grouped_diversity

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "lang"])
    return grouped_diversity(docs, key_col="source", cat_col="lang")


def _q_mad_outliers(sf_dir: str):
    """Robust per-source length-anomaly flags over documents
    (``aggregates.mad_outliers``): |n_chars − median| > 3·MAD, the
    distribution-free outlier rule (mean/σ break down exactly when
    outliers are present; median/MAD have 50% breakdown) — the
    curation pass that catches documents anomalously long/short FOR
    THEIR SOURCE. Doubled-unit integer arithmetic end to end (med×2,
    MAD×4, rule ×4) so the SQL oracle reproduces every flag
    bit-exactly; both medians read off ONE (source, n_chars)
    histogram exchange; at sf0.01 ten documents genuinely flag."""
    import ray.data

    from documentai_ray.stages.aggregates import mad_outliers

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source", "n_chars"])
    return mad_outliers(docs, key_col="source", val_col="n_chars",
                        k_num=3, k_den=1)


def _q_unpivot_measures(sf_dir: str):
    """Wide → long reshaping (``schema.unpivot`` — pandas melt / SQL
    UNPIVOT): lineitem's four measure columns become
    (l_orderkey, l_linenumber, measure, value) tall rows, 4× the input
    row count, in a pure per-batch Arrow transform with ZERO exchange
    — the layout the grouped/windowed ops downstream want. Cross-engine
    value identity holds because the doubles are carried, never
    recomputed."""
    import ray.data

    from documentai_ray.stages.schema import unpivot

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"])
    return unpivot(li, id_cols=["l_orderkey", "l_linenumber"],
                   value_cols=["l_quantity", "l_extendedprice",
                               "l_discount", "l_tax"],
                   var_name="measure", value_name="value")


def _q_benford_audit(sf_dir: str):
    """First-digit Benford audit of order amounts per priority class
    (``dq.benford_audit``): the forensic screen for fabricated or
    unit-corrupted numeric columns — natural multi-magnitude amounts
    lead with 1 ~30% of the time, re-scaled or invented ones don't
    (this corpus's price generator visibly doesn't: digits 5–9 are
    starved, dev_ppm shows it). Amounts integerized to cents with the
    house np.rint idiom; first digit via decimal-string head (no float
    log10); ONE exchange bounded by 9 × keys; shares in integer ppm
    against fixed Benford constants so SQL reproduces bit-exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.dq import benford_audit

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice").to_numpy()
                        * 100).astype("int64")
        return pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "cents": pa.array(cents, pa.int64())})

    return benford_audit(orders.map_batches(to_cents,
                                            batch_format="pyarrow"),
                         key_col="o_orderpriority", val_col="cents")


def _q_dead_letter(sf_dir: str):
    """Dead-letter routing summary: the extraction stage's row-level
    failure contract (any per-row exception → error record, job
    continues) aggregated into the ops view a 100 TB run monitors —
    per (source, error_kind) counts, error_kind = the exception class
    prefix of the error column. The malformed corpus slice (%97) is the
    planted failure population (strict-UTF-8 decode errors). Partial
    counts pre-combine per batch; the exchange carries (source, kind,
    n)."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir, with_dups=False)

    def err_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        df = batch.select(["url", "error"]).to_pandas()
        df = df[df["error"] != ""]
        df["source"] = df["url"].str.split("/").str[2]
        df["error_kind"] = df["error"].str.split(":").str[0]
        g = (df.groupby(["source", "error_kind"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(extract_batch, batch_format="pyarrow",
                           batch_size=256)
            .map_batches(err_partial, batch_format="pyarrow")
            .groupby(["source", "error_kind"])
            .aggregate(Sum("n", alias_name="n_errors")))


def _q_curation_hostaware(sf_dir: str):
    """End-to-end host-aware curation chain composing the round-2 web
    ops as ONE streaming Dataset: extract → latest-capture dedup →
    per-host template-line strip → per-domain cap (5 longest cleaned
    docs per host) → deterministic Knuth-hash split. Exchanges: the
    dedup sort, the 16-byte template-count shuffles, and one key-hash
    top-k exchange — text crosses only the dedup exchange."""
    import pyarrow as pa

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.aggregates import grouped_topk
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch
    from documentai_ray.stages.lines import strip_host_templates

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))
    stripped = strip_host_templates(ds.select_columns(["url", "text"]),
                                    min_pages=5, share_num=1, share_den=4)

    M, MOD = 2654435761, 1 << 32

    def enrich(batch: pa.Table) -> pa.Table:
        import numpy as np
        urls = batch.column("url").to_pylist()
        texts = batch.column("text_clean").to_pylist()
        ids = np.array([int(u.rsplit("/", 1)[1]) for u in urls], np.int64)
        h = (ids.astype(np.uint64) * np.uint64(M)) % np.uint64(MOD)
        frac = h.astype(np.float64) / float(MOD)
        split = np.where(frac < 0.8, "train", np.where(frac < 0.9, "val",
                                                       "test"))
        return pa.table({
            "host": pa.array([u.split("/")[2] for u in urls], pa.string()),
            "url": batch.column("url"),
            "n_chars_clean": pa.array([len(t) for t in texts], pa.int64()),
            "split": pa.array(split.tolist(), pa.string()),
        })

    enriched = stripped.map_batches(enrich, batch_format="pyarrow")
    return grouped_topk(enriched, key_col="host",
                        sort_cols=["n_chars_clean", "url"],
                        ascending=[False, True], k=5)


def _q_snapshot_diff(sf_dir: str):
    """Crawl-snapshot diff (the recrawl bookkeeping pass): FULL OUTER
    join of the old snapshot (docs with ``doc_id % 4 == 1``) against the
    new one (``doc_id % 3 != 0``; docs with ``doc_id % 5 == 0``
    re-crawled with edited content) → per-doc status
    added / removed / changed / unchanged. Both sides ship only
    (doc_id, md5-hash) through the one bucketed exchange — text never
    shuffles; the status CASE is a vectorized post-join map."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from documentai_ray.stages.joins import hash_join

    def snap(which: str):
        def f(batch: pa.Table) -> pa.Table:
            import numpy as np
            ids = np.asarray(batch.column("doc_id").to_pylist())
            texts = batch.column("text").to_pylist()
            if which == "old":
                keep = ids % 4 == 1
                h = [int.from_bytes(
                    hashlib.md5(t.encode()).digest()[:8], "little",
                    signed=True) for t, k in zip(texts, keep) if k]
                return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                                 "h_old": pa.array(h, pa.int64())})
            keep = ids % 3 != 0
            h = [int.from_bytes(
                hashlib.md5((t + " v2" if i % 5 == 0 else t).encode())
                .digest()[:8], "little", signed=True)
                for i, t, k in zip(ids.tolist(), texts, keep) if k]
            return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                             "h_new": pa.array(h, pa.int64())})
        return f

    read = lambda: ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                         columns=["doc_id", "text"])
    old = read().map_batches(snap("old"), batch_format="pyarrow")
    new = read().map_batches(snap("new"), batch_format="pyarrow")
    j = hash_join(old, new, on="doc_id", how="outer", num_partitions=32)

    def status(batch: pa.Table) -> pa.Table:
        ho, hn = batch.column("h_old"), batch.column("h_new")
        st = pc.if_else(
            pc.is_null(ho), pa.scalar("added"),
            pc.if_else(pc.is_null(hn), pa.scalar("removed"),
                       pc.if_else(pc.equal(ho, hn), pa.scalar("unchanged"),
                                  pa.scalar("changed"))))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "status": st})

    return j.map_batches(status, batch_format="pyarrow")


def _q_host_cap(sf_dir: str):
    """Per-domain document cap (RefinedWeb-style domain-diversity
    curation: no host may contribute more than K docs): keep the 5
    longest extracted docs per host, ties broken by url. Runs on the
    generic ``grouped_topk`` — map-side partial top-k per host, one
    bounded key-hash exchange, never a global sort; the heavy host's 33%
    share reduces to the same 5 rows as any other host."""
    import pyarrow as pa

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.aggregates import grouped_topk
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))

    def host(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table({
            "host": pa.array([u.split("/")[2] for u in urls], pa.string()),
            "url": batch.column("url"),
            "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
        })

    ds = ds.map_batches(host, batch_format="pyarrow")
    return grouped_topk(ds, key_col="host", sort_cols=["n_chars", "url"],
                        ascending=[False, True], k=5)


def _q_outlink_count(sf_dir: str):
    """Outlink extraction (``<a href>`` parse + urljoin resolution,
    http(s) only) over the pages corpus → per-page link counts. The
    oracle is the template closed form: article/report pages carry
    nav(3)+aside(2)+footer(3)=8 links, link farms 3+12+3=18, PO/invoice/
    LC 6, blank 0 (no row), malformed pages decode-fail (no row). The
    flat-map edge stream is the input the host link graph / pagerank
    stage consumes at crawl scale."""
    import ray.data
    from ray.data.aggregate import Count

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.extract import outlinks_batch

    ds = pages_dataset(sf_dir, with_dups=False)
    edges = ds.select_columns(["url", "html"]).map_batches(
        outlinks_batch, batch_format="pyarrow", batch_size=256)
    return edges.groupby("url").aggregate(Count(alias_name="n_links"))


def _q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd's k-means (k=4, 2 iterations) over the embeddings
    table — the canonical iterative algorithm: each iteration is one
    streaming pass emitting k partial (sum, count) rows per batch; only
    the k×(d+1) centroid state ever returns to the driver. Init = vectors
    of the 4 smallest ids (deterministic; at 10¹² rows you'd init from a
    pushdown-sampled shard instead of sort+limit). The oracle unrolls both
    iterations in SQL with list_distance; assignments are integers, so
    the ulp-level float drift between partial-sum orders never reaches
    the compared columns (clusters are separated by construction)."""
    import ray.data

    from documentai_ray.stages.similarity import kmeans_assign, kmeans_fit

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    C = kmeans_fit(ds, k=4, iters=2)
    return kmeans_assign(ds, C)


def _q_video_frames(sf_dir: str):
    """REAL video path: MPNG container (length-prefixed minipng PNG
    frames, functions/minivideo.py) with deterministic constant-gray
    frames g=(doc_id·7+f·13)%256; every 2nd frame is sampled and DECODED
    (skipped frames are hopped over, never decoded), brightness as exact
    integer ppm — closed-form construction oracle, the video analog of
    audio_frames."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.functions.minivideo import encode_frames
    from documentai_ray.stages.multimodal import VideoFrameSampleStage

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def gen(batch: pa.Table) -> pa.Table:
        payloads = []
        for did in batch.column("doc_id").to_pylist():
            frames = [np.full((16, 16), (did * 7 + f * 13) % 256, np.uint8)
                      for f in range(4 + did % 5)]
            payloads.append(encode_frames(frames))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "payload": pa.array(payloads, pa.large_binary())})

    ds = ds.map_batches(gen, batch_format="pyarrow", batch_size=64)
    ds = ds.map_batches(VideoFrameSampleStage, batch_format="pyarrow",
                        batch_size=64, concurrency=(1, 4),
                        fn_constructor_kwargs={"step": 2})
    return ds


def _q_kmv_distinct(sf_dir: str):
    """KMV distinct-count sketch: corpus-wide distinct 3-shingle estimate
    from the k=128 smallest md5-LE64 hashes — each batch ships ≤128
    hashes, the estimator is pure integer math, and the oracle recomputes
    the identical sketch in HUGEINT SQL (exact below k, (k-1)·2⁶⁴//h_k
    above)."""
    import ray.data

    from documentai_ray.stages.sketches import kmv_distinct_shingles

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    return kmv_distinct_shingles(ds, k=128)


def _q_hll_distinct(sf_dir: str):
    """HyperLogLog distinct-count sketch over the same corpus-wide
    3-shingle stream as kmv_distinct: per-batch register arrays merged by
    a 1024-group max — register state is fixed-size no matter how much
    data streams in, the scale advantage over KMV. Bit-exact oracle: the
    harmonic sum is the integer Σ 2^(64-M_j) and the raw estimator is one
    HUGEINT division (alpha in ppm shared from sketches.HLL_ALPHA_PPM);
    the ln()-based small-range correction deliberately stays out of the
    oracle surface (documented in hll_estimate_raw)."""
    import ray.data

    from documentai_ray.stages.sketches import hll_distinct_shingles

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    return hll_distinct_shingles(ds)


def _q_p95_quantity(sf_dir: str):
    """Exact p95 per group via the bounded integer histogram (the
    grouped_median generalization): shuffle carries keys × distinct
    values, never rows; quantile = smallest value whose cumulative count
    reaches ceil(0.95·n) — a closed form the SQL window mirror hits
    exactly (no interpolation)."""
    import ray.data

    from documentai_ray.stages.aggregates import grouped_quantile_int

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return grouped_quantile_int(ds, key_cols=["l_returnflag", "l_linestatus"],
                                val_col="l_quantity", q=0.95,
                                out_col="p95_qty")


def _q_users_per_event(sf_dir: str):
    """Exact COUNT(DISTINCT user) per event type: batch-local pair dedup
    → distributed pair-distinct → per-key count (both exchanges carry
    only the (type, user) projection)."""
    import ray.data

    from documentai_ray.stages.aggregates import grouped_count_distinct

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return grouped_count_distinct(ds, key_col="event_type",
                                  val_col="user_id")


def _q_events_rate_windows(sf_dir: str):
    """Range join (the join type Ray Data lacks natively): events ×
    overlapping 60-min rate windows starting every 45 min — each event
    matches 1-2 windows. The interval side is broadcast-small; candidates
    come from two vectorized searchsorted calls bounded by the max
    interval length (stages/joins.py::interval_join)."""
    import pandas as pd
    import ray.data

    from documentai_ray.stages.joins import interval_join

    base = pd.Timestamp("2024-01-01")
    k = pd.RangeIndex(960)
    iv = pd.DataFrame({
        "interval_id": k.astype("int64"),
        "start": base + pd.to_timedelta(k * 45, unit="m"),
        "end": base + pd.to_timedelta(k * 45 + 60, unit="m"),
        "rate_class": (k % 3).astype("int64"),
    })
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts"])
    out = interval_join(ds, iv, ts_col="ts", carry_cols=["rate_class"])
    return out.select_columns(["event_id", "interval_id", "rate_class"])


def _q_images_to_pdf(sf_dir: str):
    """REAL images→PDF sink (K2): per doc, 1+doc_id%3 constant-gray PNG
    pages → minipng decode → a genuine PDF 1.4 (real xref/XObject byte
    layout, functions/pdfwrite.py). ``pdf_valid`` re-parses every xref
    offset and round-trips the embedded pixels per row — the writer
    validates its own output inside the pipeline; page counts are the
    closed-form oracle."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.functions import minipng
    from documentai_ray.functions.pdfwrite import validate
    from documentai_ray.stages.multimodal import ImagesToPdfStage

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def gen(batch: pa.Table) -> pa.Table:
        pages = []
        for did in batch.column("doc_id").to_pylist():
            pages.append([minipng.encode_gray(
                np.full((12, 16), (did + 31 * p) % 256, np.uint8))
                for p in range(1 + did % 3)])
        return pa.table({"doc_id": batch.column("doc_id"),
                         "pages": pa.array(pages,
                                           pa.list_(pa.large_binary()))})

    ds = ds.map_batches(gen, batch_format="pyarrow", batch_size=64)
    ds = ds.map_batches(ImagesToPdfStage, batch_format="pyarrow",
                        batch_size=64, concurrency=(1, 4))

    def check(batch: pa.Table) -> pa.Table:
        ok = []
        for pdf in batch.column("pdf").to_pylist():
            try:
                validate(pdf)
                ok.append(True)
            except ValueError:
                ok.append(False)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_pages": batch.column("n_pages"),
                         "pdf_valid": pa.array(ok, pa.bool_())})

    return ds.map_batches(check, batch_format="pyarrow")


def _q_base64_pages(sf_dir: str):
    """K5 base64 emitter: binary payloads (here the utf-8 text bytes, so
    the oracle can rebuild them) → standard-alphabet base64 column,
    mirrored bit-exactly by DuckDB to_base64(encode(text))."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.multimodal import base64_emit_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "payload": pa.array([(t or "").encode("utf-8")
                                 for t in batch.column("text").to_pylist()],
                                pa.large_binary())})

    ds = ds.map_batches(to_payload, batch_format="pyarrow")
    ds = ds.map_batches(base64_emit_batch, batch_format="pyarrow",
                        batch_size=512)
    return ds.select_columns(["doc_id", "payload_b64"])


def _q_rasterize_pages(sf_dir: str):
    """REAL S3 (pdf2image) analog: MINIPDF pages render to letter-size
    grayscale pixels (every span bbox an ink rectangle), first page only.
    Span boxes are disjoint 6·len×10 rectangles by construction, so
    ink_px has the closed form 60·Σ len(word) over the first page's ≤96
    words — the oracle; error payloads (doc_id%97) emit zeroed dims."""
    import ray.data

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.multimodal import RasterizeStage

    ds = pages_dataset(sf_dir, with_dups=False, pdf_mode=True)
    ds = ds.map_batches(RasterizeStage, batch_format="pyarrow",
                        batch_size=64, concurrency=(1, 4))
    return ds.select_columns(["url", "ink_px", "raster_w", "raster_h"])


def _q_urgent_revenue(sf_dir: str):
    """Bloom-prefiltered join: lineitem is pre-filtered against a
    distributed bloom bitmap of URGENT orderkeys BEFORE the all-to-all
    join exchange (the classic shuffle-volume reducer — the fact side
    shrinks to matches + ~1% false positives, and the exact hash_join
    removes the false positives, so the result is exact regardless of
    filter error). Bitmap build is a batch-bitmap OR (sketch-sized state
    only); output matches the plain-join oracle bit-for-bit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count, Sum

    from documentai_ray.stages.joins import (bloom_prefilter, build_bloom,
                                             hash_join)

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_orderpriority"])

    def urgent(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.equal(batch.column("o_orderpriority"), "1-URGENT"))
        return pa.table({"orderkey": batch.column("o_orderkey"),
                         "o_orderpriority": batch.column("o_orderpriority")})

    orders = orders.map_batches(urgent, batch_format="pyarrow")
    bloom = build_bloom(orders.select_columns(["orderkey"]),
                        key_col="orderkey", m_bits=1 << 20)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_prep(batch: pa.Table) -> pa.Table:
        price_c = np.rint(batch.column("l_extendedprice").to_numpy() * 100).astype("int64")
        disc_c = np.rint(batch.column("l_discount").to_numpy() * 100).astype("int64")
        return pa.table({"orderkey": batch.column("l_orderkey"),
                         "rev_c2": pa.array(price_c * (100 - disc_c), pa.int64())})

    li = bloom_prefilter(li.map_batches(li_prep, batch_format="pyarrow"),
                         bloom, key_col="orderkey")
    joined = hash_join(li, orders, on="orderkey")
    agg = (
        joined.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_items"),
                   Sum("rev_c2", alias_name="_rev_c2"))
        .to_pandas()
    )
    agg["revenue"] = agg["_rev_c2"] / 10000.0  # exact integer-cents sum
    return agg[["o_orderpriority", "n_items", "revenue"]]


def _q_gopher_quality(sf_dir: str):
    """The non-repetition half of the Gopher quality rules (Rae et al.
    2021 Table A1): word-count bounds, mean word length in [3,10], symbol
    ratio ≤ 0.1, bullet-line ratio ≤ 0.9 — all ratios integer ppm so the
    SQL mirror is bit-exact. Runs over the extracted pages corpus."""
    from documentai_ray.stages.curation import gopher_quality_batch

    ds = _extracted_pages_with_doc_id(sf_dir)
    return ds.map_batches(gopher_quality_batch, batch_format="pyarrow",
                          batch_size=256).select_columns(
        ["url", "n_words", "mean_word_len_ppm", "symbol_ppm",
         "bullet_ppm", "gq_keep"])


def _q_repeated_passages(sf_dir: str):
    """Repeated-passage detection (the k-token-granular analog of Lee et
    al. 2022 suffix-array substring dedup): every maximal token span
    covered by 8-gram shingles occurring ≥2 times corpus-wide, marked in
    every doc that contains it. Three key-projected exchanges (explode →
    dup-set count → semi join), islands merged per doc bucket; grouping by
    64-bit shingle hash ≡ grouping by shingle string modulo ~2⁻⁶⁴
    collisions (the SQL oracle groups by the string)."""
    import ray.data

    from documentai_ray.stages.dedup import repeated_spans

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return repeated_spans(ds, k=8, num_partitions=16)


def _q_dedup_passages(sf_dir: str):
    """Passage-removal half of substring dedup (Lee et al. 2022): cut
    every span found by repeated_passages out of every doc (wholesale
    removal policy), rebuilding token streams in a doc-bucketed pass;
    unchanged docs pass through with 0 removed."""
    import ray.data

    from documentai_ray.stages.dedup import remove_repeated_spans, repeated_spans

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    spans = repeated_spans(ds, k=8, num_partitions=16)
    return remove_repeated_spans(ds, spans, num_partitions=16)


def _q_json_props(sf_dir: str):
    """Semi-structured column handling: events.props (JSON string) parsed
    ONCE into a typed int64 column at the pipeline edge, then plain
    columnar aggregation per event type — mirrored by DuckDB
    json_extract."""
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    from documentai_ray.stages.jsoncol import parse_json_column

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "props"])
    ds = parse_json_column(ds, col="props", fields={"k": "int64"})
    return (ds.groupby("event_type")
            .aggregate(Count(alias_name="n"),
                       Sum("k", alias_name="sum_k"),
                       Max("k", alias_name="max_k")))


def _q_customer_running(sf_dir: str):
    """Window functions (row_number + running sum) — the per-key ordered
    state Ray Data lacks natively, as a bucketed vectorized pass: every
    customer's order sequence and cumulative spend in exact integer
    cents."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.windows import running_per_key

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice").to_numpy() * 100).astype("int64")
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "o_custkey": batch.column("o_custkey"),
                         "o_orderdate": batch.column("o_orderdate"),
                         "cents": pa.array(cents, pa.int64())})

    out = running_per_key(ds.map_batches(prep, batch_format="pyarrow"),
                          key_col="o_custkey",
                          order_cols=["o_orderdate", "o_orderkey"],
                          cum_col="cents", num_partitions=16,
                          out_col="run_cents")
    return out.select_columns(["o_orderkey", "o_custkey", "seq", "run_cents"])


def _q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: exactly 5 docs per source,
    chosen as the 5 smallest multiplicative-hash values (grouped_topk
    composition — map-side partial top-k, so only ≤5 rows per source per
    block reach the shuffle). Parallelism-independent; SQL mirrors the
    hash in integer math."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import grouped_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])

    def h(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        hv = (ids * 2654435761 + 12345) % (1 << 32)
        return batch.append_column("h", pa.array(hv, pa.int64()))

    ds = ds.map_batches(h, batch_format="pyarrow")
    return grouped_topk(ds, key_col="source", sort_cols=["h", "doc_id"],
                        ascending=[True, True], k=5, num_partitions=16)


def _q_events_pivot(sf_dir: str):
    """Pivot (wide aggregation): hour-of-day × event-type counts as
    columns. Map-side crosstab partials collapse each block to ≤24 rows
    before the shuffle; the final groupby sums per-type columns."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.windows import EVENT_TYPES

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.hour.astype("int64")
        ct = pd.crosstab(df["hour"], df["event_type"])
        ct = ct.reindex(columns=EVENT_TYPES, fill_value=0).reset_index()
        cols = {"hour": pa.array(ct["hour"].astype("int64"), pa.int64())}
        for t in EVENT_TYPES:
            cols[f"n_{t}"] = pa.array(ct[t].astype("int64"), pa.int64())
        return pa.table(cols)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("hour")
            .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}")
                         for t in EVENT_TYPES]))


def _q_category_split_pdfs(sf_dir: str):
    """K1 REAL: the reference's category-split writer — pages grouped by
    the A4 segmentation (consecutive same-category, cap 2, purchase_order
    always separate) and each group written as a GENUINE PDF (pdfwrite,
    one rasterized page per group page), validated in-row by xref/pixel
    round-trip. Output: one row per emitted PDF."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.functions.pdfwrite import images_to_pdf, validate
    from documentai_ray.stages.preprocess import group_pages

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def split(batch: pa.Table) -> pa.Table:
        d_out, g_out, c_out, n_out, ok_out = [], [], [], [], []
        for doc_id in batch.column("doc_id").to_pylist():
            n = 3 + doc_id % 6
            cats = [_GROUP_CATS[((doc_id + i) // 3) % 3] for i in range(n)]
            gids = group_pages(cats, max_pages_per_group=2,
                               always_separate=("purchase_order",))
            by_group: dict[int, list[int]] = {}
            for i, g in enumerate(gids):
                by_group.setdefault(g, []).append(i)
            for g, pages in sorted(by_group.items()):
                imgs = [np.full((12, 16), (doc_id + p * 17) % 256, np.uint8)
                        for p in pages]
                pdf = images_to_pdf(imgs)
                try:
                    ok = len(validate(pdf)) == len(pages)
                except ValueError:
                    ok = False
                d_out.append(doc_id)
                g_out.append(g)
                c_out.append(cats[pages[0]])
                n_out.append(len(pages))
                ok_out.append(ok)
        return pa.table({"doc_id": pa.array(d_out, pa.int64()),
                         "group_id": pa.array(g_out, pa.int64()),
                         "category": pa.array(c_out, pa.string()),
                         "n_pages": pa.array(n_out, pa.int64()),
                         "pdf_valid": pa.array(ok_out, pa.bool_())})

    return ds.map_batches(split, batch_format="pyarrow", batch_size=256)


def _q_bigram_lm(sf_dir: str):
    """CCNet-style LM quality scoring with a corpus-fit bigram model: the
    count fit is one distributed combiner pass, the vocabulary-sized
    tables broadcast once, and the per-doc score is mean conditional
    bigram probability in integer ppm (every division floors — bit-exact
    oracle, no float log)."""
    import ray
    import ray.data

    from documentai_ray.stages.textstats import (BigramScoreStage,
                                                 fit_bigram_counts)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    counts = fit_bigram_counts(ds)
    ref = ray.put(counts)
    out = ds.map_batches(BigramScoreStage, batch_format="pyarrow",
                         batch_size=512, concurrency=(1, 4),
                         fn_constructor_kwargs={"counts_ref": ref})
    return out.select_columns(["doc_id", "lm_score_ppm"])


def _q_pagerank(sf_dir: str):
    """Distributed PageRank (2 damped iterations) over the deterministic
    3-out link graph on doc ids — the join-per-iteration graph shape:
    edges ⋈ ranks, per-target contribution sum, left-join update (nodes
    without in-edges fall to the base term). Integer-ppm arithmetic
    throughout, so the unrolled SQL oracle is bit-exact."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.graph import pagerank_int

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        src = list(ids) * 3
        dst = (list((ids * 7 + 1) % n) + list((ids * 13 + 2) % n)
               + list((ids * 31 + 3) % n))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    def nodes(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("doc_id").cast(pa.int64())})

    e = docs.map_batches(edges, batch_format="pyarrow")
    nd = docs.map_batches(nodes, batch_format="pyarrow")
    return pagerank_int(e, nd, iters=2, out_deg=3, num_partitions=16)


def _q_pagerank_irregular(sf_dir: str):
    """PageRank over an IRREGULAR out-degree graph (1–3 out-edges per
    node, degree = 1 + doc_id % 3): exercises pagerank_int's
    degree-table path — out-degrees computed once (src-count partials →
    one exchange bounded by distinct src nodes), joined into the edge
    table ONCE before the loop and materialized, contribution =
    rank // deg per edge. Every node keeps ≥ 1 out-edge so no dangling
    mass; integer-ppm throughout so the unrolled oracle is bit-exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.graph import pagerank_int

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        src, dst = [ids], [(ids * 7 + 1) % n]
        m1 = ids % 3 >= 1
        src.append(ids[m1]); dst.append((ids[m1] * 13 + 2) % n)
        m2 = ids % 3 == 2
        src.append(ids[m2]); dst.append((ids[m2] * 31 + 3) % n)
        return pa.table({
            "src": pa.array(np.concatenate(src).astype("int64")),
            "dst": pa.array(np.concatenate(dst).astype("int64"))})

    def nodes(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("doc_id").cast(pa.int64())})

    e = docs.map_batches(edges, batch_format="pyarrow")
    nd = docs.map_batches(nodes, batch_format="pyarrow")
    return pagerank_int(e, nd, iters=2, out_deg=None, num_partitions=16)


def _q_windowed_paths(sf_dir: str):
    """Time-bounded path counting (``windows.windowed_path_counts``):
    per user, distinct view→click→purchase paths where each step
    follows within 600 s (strictly later second) — the attribution
    counter unbounded subsequence counting overstates when old context
    should expire. Each DP level's windowed per-key prefix sum is one
    global composite-key searchsorted + cumsum difference (no per-key
    loop); SQL mirror is the stacked RANGE 600 PRECEDING AND 1
    PRECEDING frame."""
    import ray.data

    from documentai_ray.stages.windows import windowed_path_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])
    return windowed_path_counts(
        ev, key_col="user_id", ts_col="ts", type_col="event_type",
        pattern=["view", "click", "purchase"], window_s=600)


def _q_user_features(sf_dir: str):
    """Feature-matrix builder (``windows.user_feature_matrix``): one
    wide row per user — event count, per-type counts over the closed
    vocabulary, first/last activity, active span, value sum in cents —
    the churn/propensity model input, built in ONE fused pass
    (per-batch pre-combined partials, a single key exchange; no
    per-feature passes or joins)."""
    import ray.data

    from documentai_ray.stages.windows import user_feature_matrix

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])
    return user_feature_matrix(ev)


def _q_user_ledger(sf_dir: str):
    """Floor-clamped running ledger (``windows.clamped_ledger_int``):
    per user, ordered by (ts, event_id), credits add round(value·100)
    cents and purchase/error debits subtract them but the balance never
    drops below zero — an overdraw is absorbed at the floor, so the
    forgiven deficit shifts every later balance (NOT a plain sum). The
    sequential recurrence b=max(0, b+d) clears to the Skorokhod
    reflection closed form b_n = A_n − min(0, min A_k): two vectorized
    grouped scans (cumsum + cummin), ONE co-locating exchange. SQL
    mirror stacks a running SUM and a running MIN window."""
    import ray.data

    from documentai_ray.stages.windows import clamped_ledger_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"])
    return clamped_ledger_int(ev)


def _q_cusum_alarms(sf_dir: str):
    """CUSUM changepoint monitor (``windows.cusum_alarms_int``): per
    event type, S = max(0, S + (hourly_count − k)) with self-calibrated
    target k = floor(mean)+1 and alarm line h = 3k — sustained upshifts
    ramp S past h while one-hour spikes decay, the drift detector plain
    threshold alerts miss. Same reflection closed form as user_ledger
    over the tiny pre-combined (hour, key) series; at sf0.1 some keys
    alarm and some never do, so the oracle discriminates."""
    import ray.data

    from documentai_ray.stages.windows import cusum_alarms_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return cusum_alarms_int(ev)


def _q_mann_kendall(sf_dir: str):
    """Mann–Kendall trend statistic (``windows.mann_kendall_int``):
    per event type, S = Σ sgn(x_j − x_i) over all time-ordered hourly
    pairs — monotone-drift score immune to outlier magnitude, where a
    least-squares slope is dominated by one spike. Completes the trend
    family (trend_flips = thrash, cusum_alarms = level shifts). One
    pre-combined hourly exchange; the bounded-series pair count is a
    chunked (K, T, T) broadcast; SQL mirror is the within-key
    self-join on a.w < b.w."""
    import ray.data

    from documentai_ray.stages.windows import mann_kendall_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return mann_kendall_int(ev)


def _q_lag_coactivity(sf_dir: str):
    """Lagged co-activity (``windows.lag_coactivity_int``): for every
    ordered event-type pair, the integer cross-correlation dot
    Σ n_a(t)·n_b(t+ℓ) over lags 0..6 h and its argmax (smallest lag
    wins ties) — "errors lead purchase drops by 2 hours" is a lag peak
    the same-hour join can't see. One hourly exchange; the sweep is
    L+1 K×K matmuls on the dense zero-filled series (missing hour IS
    zero events, so dense zeros are exact)."""
    import ray.data

    from documentai_ray.stages.windows import lag_coactivity_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return lag_coactivity_int(ev, max_lag_h=6)


def _q_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary growth (``textstats.vocab_growth``):
    distinct whitespace tokens within each doubling corpus prefix
    (doc_id < 2^k) — K nested COUNT DISTINCTs collapsed to ONE pass
    via first occurrences: vocab(k) = #{tokens with min(doc_id) <
    2^k} = a cumulative bit_length(min_id) histogram. Token→min-id
    exchange bounded by distinct tokens; only ≤64-row histograms
    reach the driver on both axes."""
    import ray.data

    from documentai_ray.stages.textstats import vocab_growth

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return vocab_growth(ds)


def _q_trend_flips(sf_dir: str):
    """Series volatility as direction-change counts
    (``windows.trend_flips``): per event type, how often the hourly
    volume series flips rise↔fall — the thrash statistic level-based
    anomaly flags miss; plateaus (zero diffs) neither continue nor
    break a trend. Bounded hourly exchange + tiny series scan; SQL
    double-lag mirror."""
    import ray.data

    from documentai_ray.stages.windows import trend_flips

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
    return trend_flips(ev, ts_col="ts", key_col="event_type")


def _q_skew_histogram(sf_dir: str):
    """Group-size histogram over orders-per-customer
    (``aggregates.key_size_histogram``): the skew-diagnosis picture a
    shuffle planner reads before choosing partitioning. Two bounded
    exchanges — per-key counts pre-combined, then counts-of-counts."""
    import ray.data

    from documentai_ray.stages.aggregates import key_size_histogram

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    return key_size_histogram(orders, key_col="o_custkey")


def _q_gini_orders(sf_dir: str):
    """Order-volume concentration over customers
    (``aggregates.gini_concentration_int``): exact integer-ppm Gini of
    rows-per-key — the one-number skew summary (0 even, → 10⁶ one key
    owns all). Closed form Σ(2i−n−1)x_i over ascending sizes; ONE
    per-key count exchange + driver fold."""
    import ray.data

    from documentai_ray.stages.aggregates import gini_concentration_int

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    return gini_concentration_int(orders, key_col="o_custkey")


def _q_backtest_mae(sf_dir: str):
    """Seasonal-naive forecast backtest (``windows.seasonal_naive_mae``):
    MAE of predicting each event type's hourly volume with the same
    hour yesterday — the baseline every forecasting model must beat and
    the day-over-day predictability metric. Exact integer error sums,
    pairs only where both hours observed; the hourly aggregate rides
    ONE bounded exchange and the 24h-lag join runs over the tiny
    series table."""
    import ray.data

    from documentai_ray.stages.windows import seasonal_naive_mae

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
    return seasonal_naive_mae(ev, ts_col="ts", key_col="event_type",
                              season_hours=24)


def _q_tvd_drift(sf_dir: str):
    """Per-source language-mix drift vs the corpus
    (``aggregates.tvd_drift_int``): total variation distance between
    each source's language distribution and the global one, exact
    integer ppm via cross-multiplication — the categorical sibling of
    ks_drift (KS needs an ordered domain; TVD doesn't), with absent
    categories contributing their full global mass (the zero-cell term
    skewed sources need). ONE exchange bounded by sources × langs."""
    import ray.data

    from documentai_ray.stages.aggregates import tvd_drift_int

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "lang"])
    return tvd_drift_int(docs, key_col="source", cat_col="lang")


def _q_chi2_independence(sf_dir: str):
    """Pearson χ² decomposition (``aggregates.chi2_independence_int``)
    over the source × lang contingency grid, per-cell integer ppm —
    completes the drift family (tvd = L1, ks = sup, χ² = variance-
    weighted L2 that amplifies rare-cell deviations). Zero-observed
    cells still contribute their (r·c)² evidence. ONE exchange bounded
    by sources × langs."""
    import ray.data

    from documentai_ray.stages.aggregates import chi2_independence_int

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "lang"])
    return chi2_independence_int(docs, key_col="source", cat_col="lang")


def _q_readability(sf_dir: str):
    """Flesch reading-ease in integer ppm
    (``textstats.readability_batch``): sentence-length × syllable-
    weight score from regex run counts (words=[a-z]+ runs,
    sentences=[.!?]+ runs, syllables=[aeiouy]+ runs, clamped), each
    ratio floored at milli precision — completes the text-quality
    family (gopher gates junk, quality scores structure, this grades
    how hard fluent text reads). Pure per-row map, zero exchange."""
    import ray.data

    from documentai_ray.stages.textstats import readability_batch

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return docs.map_batches(readability_batch, batch_format="pyarrow")


def _q_clustering_coeff(sf_dir: str):
    """Global transitivity (``graph.clustering_coefficient``):
    3·triangles/wedges in exact ppm over the same deterministic web-ish
    link graph as triangle_count — the one-number clumpiness score (a
    spam link-farm shows as a transitivity spike). Wedges fold as a
    distributed Σ C(d,2) over the degree exchange; only scalars reach
    the driver."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.graph import clustering_coefficient

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        src = list(ids) * 3
        dst = (list((ids + 1) % n) + list((ids + 2) % n)
               + list((ids * 7 + 1) % n))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return clustering_coefficient(
        docs.map_batches(edges, batch_format="pyarrow"),
        num_partitions=16)


def _q_unique_prefix(sf_dir: str):
    """Shortest distinguishing prefix per distinct part name
    (``indexing.shortest_unique_prefix``): the prefix-index sizing
    primitive — answer depends only on lexicographic neighbours, made
    distributed-exact WITHOUT a global sort by first-char bucketing
    (cross-bucket LCP is exactly 0); in-bucket neighbour LCPs are one
    padded char-matrix cumprod pass. Strict-prefix strings cap at
    their own length."""
    import ray.data

    from documentai_ray.stages.indexing import shortest_unique_prefix

    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_name"])
    return shortest_unique_prefix(part, col="p_name")


def _q_soundex_blocking(sf_dir: str):
    """Phonetic blocking census (``fuzzy.soundex_blocking``): distinct
    part names grouped by simplified American Soundex (letter + 3
    class digits, runs collapsed, zeros dropped) — the sound-alike
    blocking key symspell's edit distance misses; counts size the
    candidate blocks before quadratic comparison. SQL mirror chains
    seven fixed-pattern regexp_replace calls because RE2 has no
    backreferences."""
    import ray.data

    from documentai_ray.stages.fuzzy import soundex_blocking

    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_name"])
    return soundex_blocking(part, col="p_name")


def _q_zonemap_prune(sf_dir: str):
    """Zone-map pruning audit (``indexing.zonemap_prune``): with
    64-row buckets on doc_id and the band 1500 ≤ n_chars ≤ 3000, how
    many buckets a min/max zone map skips and what the surviving scan
    wastes — measures whether re-sorting on n_chars would pay
    (zorder_keys plans layouts; this scores the current one). One
    bucket-bounded exchange, scalars to the driver."""
    import ray.data

    from documentai_ray.stages.indexing import zonemap_prune

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "n_chars"])
    return zonemap_prune(docs, id_col="doc_id", val_col="n_chars",
                         bucket_size=64, lo=1500, hi=3000)


def _q_nest_tokens(sf_dir: str):
    """Explode→nest round trip (``schema.nest_list`` — the inverse of
    posexplode_tokens and the fourth reshaping surface): documents
    explode to (doc_id, pos, token) rows, then nest_list gathers each
    doc's tokens back into ONE ordered list cell; the query certifies
    the round trip by emitting the re-joined normalized text, which
    must equal the whitespace-normalized original. ONE co-locating
    exchange, per-partition vectorized groupby-agg(list) — never one
    map_groups per key."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.schema import nest_list, posexplode_tokens

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    toks = posexplode_tokens(docs, id_cols=["doc_id"], text_col="text")
    nested = nest_list(toks, key_cols=["doc_id"], order_cols=["pos"],
                       val_col="token", out_col="tokens")

    def finish(batch: pa.Table) -> pa.Table:
        toks_col = batch.column("tokens").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array([len(t) for t in toks_col], pa.int64()),
            "text_norm": pa.array([" ".join(t) for t in toks_col],
                                  pa.string())})

    return nested.map_batches(finish, batch_format="pyarrow")


def _q_longest_streak(sf_dir: str):
    """Longest same-type event streak per user
    (``windows.longest_streak``): value-change islands — the
    engagement-streak / repeated-failure-run metric a plain groupby
    can't see; run ids are cumsums of change-points, vectorized across
    all keys of a partition. ONE 4-column row exchange; (ts, event_id)
    total order mirrors the SQL row_number-difference trick
    bit-exactly."""
    import ray.data

    from documentai_ray.stages.windows import longest_streak

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    return longest_streak(ev, key_col="user_id", ts_col="ts",
                          tie_col="event_id", type_col="event_type")


def _q_supplier_percentile(sf_dir: str):
    """Cross-table empirical CDF scoring
    (``aggregates.crosstable_percentile_int``): each supplier's balance
    placed within the CUSTOMER balance distribution in exact integer
    ppm — the benchmark-against-reference-population op. ONE histogram
    exchange over the reference, driver fold broadcast, probe scored by
    vectorized searchsorted; probe rows never shuffle."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import crosstable_percentile_int

    def cents(col_in, col_key, key_name):
        def f(batch: pa.Table) -> pa.Table:
            c = np.rint(batch.column(col_in).to_numpy() * 100
                        ).astype("int64")
            return pa.table({key_name: batch.column(col_key),
                             "bal_c": pa.array(c, pa.int64())})
        return f

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal"],
    ).map_batches(cents("c_acctbal", "c_custkey", "c_custkey"),
                  batch_format="pyarrow")
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_acctbal"],
    ).map_batches(cents("s_acctbal", "s_suppkey", "s_suppkey"),
                  batch_format="pyarrow")
    return crosstable_percentile_int(cust, supp, ref_val_col="bal_c",
                                     probe_val_col="bal_c")


def _q_delta_varint(sf_dir: str):
    """Storage-layout advisor (``schema.delta_varint_size``): exact
    byte cost of order dates under sorted delta + LEB128 varint vs raw
    int64 — 150k rows over 2.4k distinct days delta-encode to ~1
    byte/row (duplicates are 1-byte zero deltas, each distinct day one
    real delta), the measurement behind choosing a sort key. ONE
    histogram exchange bounded by distinct values, driver scan over
    the distinct axis only."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.schema import delta_varint_size

    def prep(batch: pa.Table) -> pa.Table:
        us = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        days = us // 86_400_000_000
        return pa.table({"day": pa.array(days, pa.int64())})

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderdate"]
                                   ).map_batches(prep,
                                                 batch_format="pyarrow")
    return delta_varint_size(orders, val_col="day")


def _q_impute_mode(sf_dir: str):
    """Group-mode imputation (``dq.impute_group_mode``): customers
    whose segment is 'missing' (deterministically: custkey % 20 == 0)
    get their NATION's modal segment (smallest-value tie-break from
    grouped_mode) — the standard categorical repair after a dq_audit
    flags NULLs; group mode beats global mode exactly when the column
    correlates with the grouping. Mode table rides one bounded
    exchange; data rows never shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from documentai_ray.stages.dq import impute_group_mode

    def knock_out(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy()
        seg = batch.column("c_mktsegment").to_pylist()
        seg = [None if k % 20 == 0 else s for k, s in zip(ck, seg)]
        return pa.table({"c_custkey": batch.column("c_custkey"),
                         "c_nationkey": batch.column("c_nationkey"),
                         "seg": pa.array(seg, pa.string())})

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
    ).map_batches(knock_out, batch_format="pyarrow")
    return impute_group_mode(cust, key_col="c_nationkey", val_col="seg")


def _q_rrf_fusion(sf_dir: str):
    """Reciprocal Rank Fusion (``indexing.rrf_fuse``): parts ranked by
    retail price AND by size, fused as Σ 10⁹ // (60 + rank) — the
    standard incomparable-scores ranking combiner (BM25 + cosine in a
    search stack), kept integer-exact by flooring each term so near-tie
    fused orders can't flip across libms. One bounded histogram
    exchange per ranking + broadcast min-rank maps; global top-20 as a
    per-batch partial top-N aggregation."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.indexing import rrf_fuse

    def prep(batch: pa.Table) -> pa.Table:
        pc_ = np.rint(batch.column("p_retailprice").to_numpy() * 100
                      ).astype("int64")
        return pa.table({
            "p_partkey": batch.column("p_partkey"),
            "price_c": pa.array(pc_, pa.int64()),
            "size_v": batch.column("p_size").cast(pa.int64())})

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice", "p_size"],
    ).map_batches(prep, batch_format="pyarrow")
    return rrf_fuse(parts, id_col="p_partkey",
                    score_cols=["price_c", "size_v"], k=60, top_n=20)


def _q_quantile_normalize(sf_dir: str):
    """Cross-source quantile normalization of document lengths
    (``aggregates.quantile_normalize_int``): each doc's n_chars is
    replaced by the GLOBAL length at the same within-source quantile —
    the calibration step before mixing per-source quality scores whose
    raw scales differ. Rank-exact integer mapping (smallest global w
    with cum_g(w)·n_s ≥ cum_s(v)·n_g); ONE (source, value) histogram
    exchange serves both CDFs; rows never shuffle."""
    import ray.data

    from documentai_ray.stages.aggregates import quantile_normalize_int

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source", "n_chars"])
    out = quantile_normalize_int(docs, key_col="source",
                                 val_col="n_chars")
    return out.select_columns(["doc_id", "source", "n_chars", "norm_v"])


def _q_subsequence_counts(sf_dir: str):
    """Order-preserving subsequence motif counting
    (``windows.subsequence_counts``): per user, how many distinct
    index-increasing ways the event stream spells view→click→purchase
    — the path-multiplicity signal behind path-weighted attribution
    (funnels only answer "converted or not"). Linear DP vectorized
    across all keys of a partition (k levels of per-key exclusive
    cumsums, no per-key Python loop); ONE 4-column row exchange; the
    (ts, event_id) order is total so the nested-window SQL mirror is
    bit-exact."""
    import ray.data

    from documentai_ray.stages.windows import subsequence_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    return subsequence_counts(
        ev, key_col="user_id", ts_col="ts", tie_col="event_id",
        type_col="event_type",
        pattern=["view", "click", "purchase"])


def _q_coordinated_sample(sf_dir: str):
    """Coordinated sampling across tables
    (``partitioning.coordinated_sample``): orders AND lineitems each
    keep rows whose join key's md5 starts with '0'/'1'/'2' (≈18.75 %) —
    the SAME deterministic rule on the SAME key, so referential
    integrity survives: every sampled order keeps ALL its line items
    (independent per-table sampling would keep only p² of joinable
    pairs and break FK completeness). Revenue per priority over the
    coordinated slice: two ZERO-exchange filters, one partitioned
    hash_join, one 5-group aggregate."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Sum

    from documentai_ray.stages.joins import hash_join
    from documentai_ray.state.partitioning import coordinated_sample

    orders = coordinated_sample(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderpriority"]),
        key_col="o_orderkey")

    def prep_line(batch: pa.Table) -> pa.Table:
        rc = np.rint(batch.column("l_extendedprice").to_numpy() * 100
                     ).astype("int64")
        return pa.table({"o_orderkey": batch.column("l_orderkey"),
                         "rc": pa.array(rc, pa.int64())})

    line = coordinated_sample(
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_extendedprice"]
                              ).map_batches(prep_line,
                                            batch_format="pyarrow"),
        key_col="o_orderkey")
    j = hash_join(line, orders, on="o_orderkey", num_partitions=32)
    return (j.groupby("o_orderpriority")
            .aggregate(Count(alias_name="n_items"),
                       Sum("rc", alias_name="rev_c")))


def _q_kcore_nodes(sf_dir: str):
    """k-core decomposition (``graph.kcore_nodes``): iterative peeling
    of degree-<k nodes until fixpoint — the dense-backbone screen one
    degree pass cannot compute because peeling CASCADES (removing a
    pendant drops its neighbor below k next round). Graph: per block of
    6 consecutive customer keys, a triangle (b0-b1-b2) with a pendant
    chain b2-b3-b4-b5 — the 2-core is exactly the triangles and the
    peel takes 3 cascading rounds by construction. Per round: one
    degree groupby + two key-projected semi hash_joins; the live node
    count is a monotone fixed-point witness (early exit)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.graph import kcore_nodes

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])
    n_full = (cust.count() // 6) * 6

    def edges(batch: pa.Table) -> pa.Table:
        c = batch.column("c_custkey").to_numpy().astype("int64")
        c = c[c <= n_full]
        r = (c - 1) % 6
        src1 = c[r <= 4]
        src2 = c[r == 2]
        return pa.table({
            "src": pa.array(np.concatenate([src1, src2]), pa.int64()),
            "dst": pa.array(np.concatenate([src1 + 1, src2 - 2]),
                            pa.int64())})

    e = cust.map_batches(edges, batch_format="pyarrow")
    return kcore_nodes(e, k=2, rounds=6)


def _q_rendezvous_shards(sf_dir: str):
    """Rendezvous / highest-random-weight shard routing
    (``partitioning.rendezvous_assign``): every doc goes to the shard
    maximizing md5-LE64("{key}|{shard}") — the consistent-placement
    rule where adding a shard moves only ~1/(K+1) of keys and removing
    one moves only its own (mod-N would reshuffle everything). Pure
    per-batch map over K=5 hash columns, ZERO exchange; deterministic
    lexically-larger tie-break mirrored in the oracle's
    ORDER BY h DESC, shard DESC."""
    import ray.data

    from documentai_ray.state.partitioning import rendezvous_assign

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    return rendezvous_assign(
        docs, key_col="doc_id",
        shards=["shard-a", "shard-b", "shard-c", "shard-d", "shard-e"])


def _q_kwic_snippets(sf_dir: str):
    """KWIC concordance (``indexing.kwic_snippets``): every exact-token
    occurrence of 'merge' in the documents corpus becomes one
    (doc_id, pos, snippet) row with a ±3-token context window clamped
    at document edges — the search-result snippet surface. ZERO
    exchange; vectorized token scan, Python assembly only on the
    sparse hits."""
    import ray.data

    from documentai_ray.stages.indexing import kwic_snippets

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return kwic_snippets(docs, id_cols=["doc_id"], text_col="text",
                         keyword="merge", before=3, after=3)


def _q_skipgram_pairs(sf_dir: str):
    """word2vec-style windowed co-occurrence counts
    (``textstats.skipgram_pair_counts``): ordered (left, right) token
    pairs at distance ≤ 3 within a document, counted corpus-wide —
    per-batch fully vectorized shift-and-mask pairing pre-combined into
    (pair, n) partials, ONE exchange bounded by distinct pairs (never
    token count), Zipf tail pruned at n ≥ 3 post-exchange."""
    import ray.data

    from documentai_ray.stages.textstats import skipgram_pair_counts

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    return skipgram_pair_counts(docs, text_col="text", window=3,
                                min_count=3)


def _q_collocation_lift(sf_dir: str):
    """Collocation mining via integer-ppm lift (the log-free PMI,
    ``textstats.collocation_lift``): for adjacent bigrams with ≥ 5
    occurrences, ``lift_ppm = c_ab·T·10⁶ // (c_a·c_b)`` — how much more
    often the pair occurs than token independence predicts. Bigram
    counts ride the skipgram exchange (window=1); unigram counts are a
    vocab-bounded exchange broadcast via ray.put; arithmetic is Python
    bigint / HUGEINT so the SQL mirror is bit-exact."""
    import ray.data

    from documentai_ray.stages.textstats import collocation_lift

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    return collocation_lift(docs, text_col="text", min_pair=5)


def _q_posexplode_tokens(sf_dir: str):
    """Positional token explode (``schema.posexplode_tokens`` — Spark's
    posexplode over the repo-standard whitespace tokenization): each
    document becomes one (doc_id, pos, token) row per token, pos
    1-based in document order — the layout positional n-gram,
    co-occurrence and index builds start from. Pure per-batch pandas
    explode + vectorized offset arithmetic, ZERO exchange."""
    import ray.data

    from documentai_ray.stages.schema import posexplode_tokens

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return posexplode_tokens(docs, id_cols=["doc_id"], text_col="text")


def _q_weighted_median(sf_dir: str):
    """Revenue-weighted median quantity per return flag
    (``aggregates.grouped_weighted_median_int``): the quantity at which
    half of each flag's extended-price revenue sits at or below — the
    distribution summary a plain median misstates whenever weight and
    value correlate. Lower-median rule (smallest v with 2·cumw ≥ W),
    integer-exact end to end (weights in cents); ONE exchange bounded
    by flags × 50 distinct quantities."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import grouped_weighted_median_int

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def prep(batch: pa.Table) -> pa.Table:
        q = np.rint(batch.column("l_quantity").to_numpy()).astype("int64")
        c = np.rint(batch.column("l_extendedprice").to_numpy()
                    * 100).astype("int64")
        return pa.table({"l_returnflag": batch.column("l_returnflag"),
                         "qty": pa.array(q), "cents": pa.array(c)})

    return grouped_weighted_median_int(
        li.map_batches(prep, batch_format="pyarrow"),
        key_col="l_returnflag", val_col="qty", weight_col="cents",
        out_col="wmedian_qty")


def _q_ntile_split(sf_dir: str):
    """Exact distributed NTILE(10) per language by document size — the
    quantile-bucketed split labeling (size-decile stratification) done
    with two bounded exchanges (histogram offsets + tie-group cumcount)
    instead of a global sort. Matches SQL NTILE semantics exactly,
    including the first n%k tiles getting the extra row."""
    import ray.data

    from documentai_ray.stages.aggregates import grouped_ntile

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])
    return grouped_ntile(ds, key_col="lang", val_col="n_chars",
                         tiebreak_col="doc_id", k=10,
                         num_partitions=16)


def _q_fuzzy_hosts(sf_dir: str):
    """Edit-distance fuzzy join: every doc's host string gets a planted
    single-character deletion (at position doc_id % len), then is snapped
    back to the canonical host vocabulary by minimum Levenshtein distance
    (tie → lexicographically smallest, drop beyond dist 2). Physical
    plan: distinct dirty-key projection → small vocabulary match →
    broadcast lookup (stages/fuzzy.py's documented contract). Oracle:
    DuckDB's levenshtein() with the identical argmin/tie-break window."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.fuzzy import fuzzy_match_join

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])
    sources = sorted(docs.unique("source"))
    canon = ["heavy.example.com"] + [f"{s}.example.com" for s in sources]

    def dirty(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        out = []
        for did, s in zip(ids, srcs):
            host = ("heavy.example.com" if did % 3 == 0
                    else f"{s}.example.com")
            p = did % len(host)
            out.append(host[:p] + host[p + 1:])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "dirty": pa.array(out, pa.string())})

    ds = docs.map_batches(dirty, batch_format="pyarrow")
    out = fuzzy_match_join(ds, col="dirty", canon=canon, max_dist=2,
                           matched_col="canon_host", num_partitions=8)
    return out.select_columns(["doc_id", "dirty", "canon_host", "dist"])


def _q_symspell_pairs(sf_dir: str):
    """Fully-distributed edit-distance ≤ 1 join via SymSpell deletion-
    neighborhood hashing — the scale path past fuzzy_hosts'
    distinct-set × vocabulary quadratic: every (dirty host, canonical
    host) pair within one edit, both sides distributed, no broadcast.
    Candidates = pairs sharing a deletion variant (complete for ed ≤ 1
    by the deletion-intersection property), verified with the exact DP.
    Same planted-deletion corpus as fuzzy_hosts, compared as DISTINCT
    value pairs."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.fuzzy import symspell_join

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])

    def dirty(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        out = []
        for did, s in zip(ids, srcs):
            host = ("heavy.example.com" if did % 3 == 0
                    else f"{s}.example.com")
            p = did % len(host)
            out.append(host[:p] + host[p + 1:])
        return pa.table({"dirty": pa.array(out, pa.string())})

    def canon(batch: pa.Table) -> pa.Table:
        hosts = sorted({f"{s}.example.com"
                        for s in batch.column("source").to_pylist()}
                       | {"heavy.example.com"})
        return pa.table({"canon": pa.array(hosts, pa.string())})

    dirty_ds = docs.map_batches(dirty, batch_format="pyarrow")
    canon_ds = docs.map_batches(canon, batch_format="pyarrow")
    return symspell_join(dirty_ds, canon_ds, left_col="dirty",
                         right_col="canon", num_partitions=16)


def _q_triangle_count(sf_dir: str):
    """Per-apex triangle counting over a deterministic web-ish link graph
    (local band edges i→i+1, i→i+2 that close ~n triangles, plus a hash
    jump i→(7i+1) mod n): oriented wedge enumeration via edge self-join,
    closing-edge semi-join on the composite (b,c) key — each triangle
    counted once at its smallest node. The oracle builds the identical
    edge set in SQL and closes wedges with a 3-way self-join."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.graph import triangle_counts

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        src = list(ids) * 3
        dst = (list((ids + 1) % n) + list((ids + 2) % n)
               + list((ids * 7 + 1) % n))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return triangle_counts(docs.map_batches(edges, batch_format="pyarrow"),
                           num_partitions=16)


def _q_redirect_resolve(sf_dir: str):
    """HTTP-redirect chain canonicalization via pointer doubling: every
    url whose doc_id is not a multiple of 8 301-redirects to doc_id-1,
    multiples of 8 are terminal — chains up to 7 hops, so 3 doubling
    rounds (2³ ≥ 7) resolve every url to its final target in O(log L)
    self-joins instead of O(L) sequential hops. The closed form the
    oracle checks: final(i) = (i // 8) * 8."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.graph import resolve_pointers

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def ptrs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        ptr = ids - (ids % 8 != 0)
        return pa.table({"node": pa.array(ids, pa.int64()),
                         "ptr": pa.array(ptr, pa.int64())})

    resolved = resolve_pointers(
        docs.map_batches(ptrs, batch_format="pyarrow"),
        iters=3, num_partitions=16)
    return resolved.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "final": b.column("ptr")}),
        batch_format="pyarrow")


def _q_khop_frontier(sf_dir: str):
    """k-hop BFS over the directed link graph (same deterministic edge
    synthesis as triangle_count: i→i+1, i→i+2, i→7i+1 mod n): min hop
    depth ≤ 3 from the doc_id ≡ 0 (mod 997) seed set — the
    crawl-frontier-expansion / blast-radius primitive (graph.bfs_khop:
    one key-projected hash_join + groupby-min per round).  Oracle:
    WITH RECURSIVE level-by-level expansion + final min."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.graph import bfs_khop

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        src = list(ids) * 3
        dst = (list((ids + 1) % n) + list((ids + 2) % n)
               + list((ids * 7 + 1) % n))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    def seeds(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return pa.table({"node": pa.array(ids[ids % 997 == 0], pa.int64())})

    return bfs_khop(docs.map_batches(edges, batch_format="pyarrow"),
                    docs.map_batches(seeds, batch_format="pyarrow"),
                    k=3, num_partitions=16)


def _q_sssp_weighted(sf_dir: str):
    """Bounded-round WEIGHTED shortest paths (Bellman-Ford, 3 rounds)
    over the same link graph as khop_frontier, with deterministic edge
    weights w = 1 + (src + dst) % 5 — min COST, not min hops: a 2-hop
    path can undercut a heavy direct edge, which the oracle's
    unrestricted ≤3-edge path expansion confirms. graph.sssp_bounded:
    one key-projected join + monotone groupby-min fold per round."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.graph import sssp_bounded

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = batch.column("doc_id").to_numpy()
        src = np.concatenate([ids, ids, ids])
        dst = np.concatenate([(ids + 1) % n, (ids + 2) % n,
                              (ids * 7 + 1) % n])
        w = 1 + (src + dst) % 5
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64()),
                         "w": pa.array(w, pa.int64())})

    def seeds(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return pa.table({"node": pa.array(ids[ids % 997 == 0], pa.int64())})

    return sssp_bounded(docs.map_batches(edges, batch_format="pyarrow"),
                        docs.map_batches(seeds, batch_format="pyarrow"),
                        rounds=3, num_partitions=16)


def _q_ocr_roundtrip(sf_dir: str):
    """REAL OCR path (M3): MINIPDF pages render with the 5×7 bitfont →
    PNG encode → PNG decode → matched-template recognition — two
    independent real computations whose composition must reproduce the
    first page's walk text BYTE-IDENTICALLY (error payloads → '').
    The oracle is the closed-form first-page layout text."""
    import ray.data

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.multimodal import RasterizeStage
    from documentai_ray.stages.ocr import OcrStage

    ds = pages_dataset(sf_dir, with_dups=False, pdf_mode=True)
    ds = ds.map_batches(RasterizeStage, batch_format="pyarrow",
                        batch_size=32, concurrency=(1, 4),
                        fn_constructor_kwargs={"emit_png": True,
                                               "glyphs": True})
    ds = ds.map_batches(OcrStage, batch_format="pyarrow", batch_size=32,
                        concurrency=(1, 4))
    return ds.select_columns(["url", "ocr_text"])


def _q_ocr_classify(sf_dir: str):
    """M11 OCR-path classification: the 4-technique vote runs over text
    recovered by the REAL OCR chain (bitfont raster → PNG → template
    match) instead of native extraction — the reference's scanned-page
    branch. Walk text is plain report prose, so the closed form is
    data_report 4/4 (unclassified for error pages); any OCR corruption
    that touched keywords would break the vote and fail the oracle."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.classify import classify_batch_task
    from documentai_ray.stages.multimodal import RasterizeStage
    from documentai_ray.stages.ocr import OcrStage

    ds = pages_dataset(sf_dir, with_dups=False, pdf_mode=True)
    ds = ds.map_batches(RasterizeStage, batch_format="pyarrow",
                        batch_size=32, concurrency=(1, 4),
                        fn_constructor_kwargs={"emit_png": True,
                                               "glyphs": True})
    ds = ds.map_batches(OcrStage, batch_format="pyarrow", batch_size=32,
                        concurrency=(1, 4))

    def to_text(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch.column("url"),
                         "text": batch.column("ocr_text")})

    ds = ds.map_batches(to_text, batch_format="pyarrow")
    ds = ds.map_batches(classify_batch_task, batch_format="pyarrow",
                        batch_size=256)
    return ds.select_columns(["url", "category", "votes"])


def _q_office_extract(sf_dir: str):
    """S4/S5 driver-level exercise: real DOCX / XLSX payloads (stdlib
    zip+XML builders) flow through the extraction dispatch. Even docs are
    DOCX (1-3 paragraphs); odd docs are XLSX with the 100-row cap binding
    above 100 rows and a planted 1200-char row (doc_id%50==7) exercising
    the 1000-char cap — all closed-form."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.sources import office
    from documentai_ray.stages.extract import extract_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def gen(batch: pa.Table) -> pa.Table:
        payloads: list[bytes] = []
        for did in batch.column("doc_id").to_pylist():
            if did % 2 == 0:
                payloads.append(office.make_docx(
                    [f"Paragraph {j} of doc {did}"
                     for j in range(1 + did % 3)]))
            elif did % 50 == 7:
                payloads.append(office.make_xlsx([["x" * 1200]]))
            else:
                payloads.append(office.make_xlsx(
                    [[f"r{i}d{did % 10}"] for i in range(2 + did % 150)]))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "url": pa.array([f"u{d}" for d in
                                          batch.column("doc_id").to_pylist()],
                                         pa.string()),
                         "html": pa.array(payloads, pa.large_binary())})

    ds = ds.map_batches(gen, batch_format="pyarrow", batch_size=128)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=128)
    return ds.select_columns(["doc_id", "text", "payload_kind"])


def _q_generic_entities(sf_dir: str):
    """M20 generic extractor over PO pages: dates / currency amounts /
    number counts from the compiled regex battery — every value and count
    closed-form from the PO archetype construction (the planted
    technique-disagreement suffix adds words, never digits)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from documentai_ray.stages.entities import extract_generic

    ds = _extracted_pages_with_doc_id(sf_dir)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keep = [i % 5 == 2 and i % 97 != 0 for i in ids]
        batch = batch.filter(pa.array(keep))
        fd, fa, nd, na, nn, ne, np_ = [], [], [], [], [], [], []
        for t in batch.column("text").to_pylist():
            g = extract_generic(t or "")
            fd.append(g["dates"][0] if g["dates"] else "")
            fa.append(g["amounts"][0] if g["amounts"] else "")
            nd.append(len(g["dates"]))
            na.append(len(g["amounts"]))
            nn.append(len(g["numbers"]))
            ne.append(len(g["emails"]))
            np_.append(len(g["phones"]))
        return pa.table({"url": batch.column("url"),
                         "first_date": pa.array(fd, pa.string()),
                         "first_amount": pa.array(fa, pa.string()),
                         "n_dates": pa.array(nd, pa.int64()),
                         "n_amounts": pa.array(na, pa.int64()),
                         "n_numbers": pa.array(nn, pa.int64()),
                         "n_emails": pa.array(ne, pa.int64()),
                         "n_phones": pa.array(np_, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def _q_layout_structure(sf_dir: str):
    """T3-analog layout analysis over PIXELS: first-page raster → line
    bands / word boxes / block grouping recovered from ink geometry alone
    (never the source layout tree). Closed form: m = min(n_words, 96)
    first-page words, ceil(m/8) lines, ceil(lines/3) blocks."""
    import ray.data

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.multimodal import RasterizeStage
    from documentai_ray.stages.ocr import LayoutAnalysisStage

    ds = pages_dataset(sf_dir, with_dups=False, pdf_mode=True)
    ds = ds.map_batches(RasterizeStage, batch_format="pyarrow",
                        batch_size=32, concurrency=(1, 4),
                        fn_constructor_kwargs={"emit_png": True,
                                               "glyphs": True})
    ds = ds.map_batches(LayoutAnalysisStage, batch_format="pyarrow",
                        batch_size=32, concurrency=(1, 4))
    return ds.select_columns(["url", "n_blocks", "n_lines", "n_words"])


def _q_page_type_detect(sf_dir: str):
    """M5 text-vs-image page detection: the 15-word / 8-word+images /
    0.08-density decision tree over closed-form synthetic page stats that
    sweep all three branches (wc=doc_id%25, images=doc_id%3,
    density=(doc_id%20)/100)."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.extract import detect_page_type

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def f(batch: pa.Table) -> pa.Table:
        kinds = [detect_page_type(d % 25, d % 3, (d % 20) / 100.0)
                 for d in batch.column("doc_id").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "page_type": pa.array(kinds, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


def _q_table_detect(sf_dir: str):
    """M21 text→table detection (2+-space column split, ≥2-row runs) over
    synthetic texts: docs with doc_id%4==0 carry only single-column lines
    (no table), others a 3-column run of 2+doc_id%3 rows."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.entities import detect_tables

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def f(batch: pa.Table) -> pa.Table:
        nt, nr = [], []
        for d in batch.column("doc_id").to_pylist():
            if d % 4 == 0:
                text = "\n".join(f"single column {i}" for i in range(3))
            else:
                rows = [f"a{i}  b{i}  c{i}" for i in range(2 + d % 3)]
                text = "\n".join(rows + ["just one column line"])
            tables = detect_tables(text)
            nt.append(len(tables))
            nr.append(len(tables[0]) if tables else 0)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tables": pa.array(nt, pa.int64()),
                         "n_rows_first": pa.array(nr, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


def _q_field_validation(sf_dir: str):
    """M24 field-format validators over planted valid/invalid values:
    date format breaks for doc_id%3==0 (slash-year-first), amount for
    %5==0 ('N/A'), currency for %7==0 (lowercase)."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.entities import validate_field_formats

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def f(batch: pa.Table) -> pa.Table:
        date_ok, amount_ok, ccy_ok = [], [], []
        for d in batch.column("doc_id").to_pylist():
            fields = {
                "po_date": "2024/01/01" if d % 3 == 0 else "01.01.2024",
                "total_amount": "N/A" if d % 5 == 0 else "1,000.00",
                "currency": "usd" if d % 7 == 0 else "USD",
            }
            checks = validate_field_formats(fields)
            date_ok.append(checks["po_date"])
            amount_ok.append(checks["total_amount"])
            ccy_ok.append(checks["currency"])
        return pa.table({"doc_id": batch.column("doc_id"),
                         "date_ok": pa.array(date_ok, pa.bool_()),
                         "amount_ok": pa.array(amount_ok, pa.bool_()),
                         "currency_ok": pa.array(ccy_ok, pa.bool_())})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


def _q_doc_type_autodetect(sf_dir: str):
    """M22 keyword doc-type autodetect over extracted pages: PO pages hit
    the purchase_order keyword set, invoices the invoice set, prose pages
    fall to unknown — archetype-discriminating closed form."""
    import pyarrow as pa

    from documentai_ray.stages.entities import autodetect_doc_type

    ds = _extracted_pages_with_doc_id(sf_dir)

    def f(batch: pa.Table) -> pa.Table:
        kinds = [autodetect_doc_type(t or "")
                 for t in batch.column("text").to_pylist()]
        return pa.table({"url": batch.column("url"),
                         "doc_type": pa.array(kinds, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def _q_pq_codes(sf_dir: str):
    """Product quantization (Jégou et al. 2011): 64-dim embeddings split
    into 4 subspaces, a distributed Lloyd's fit per subspace (the kmeans
    plan), then map-side encoding to 4 small codes — the ANN-at-scale
    compression path (a 256-byte float32 vector becomes 4 bytes). The
    oracle unrolls all four per-subspace fits in SQL and joins the final
    assignments; integer code columns keep float drift out of the
    compare."""
    import ray.data

    from documentai_ray.stages.similarity import pq_encode, pq_fit

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    books = pq_fit(ds, m=4, k=4, iters=2)
    return pq_encode(ds, books)


def _q_jpeg_roundtrip(sf_dir: str):
    """REAL JPEG path (minijpeg, baseline JFIF): constant-gray pages with
    EVEN (c-128) offsets encode → decode EXACTLY (a constant block's only
    nonzero coefficient is the DC; with an even level shift the quantize/
    dequantize chain is lossless), so the decoded mean brightness has the
    same exact-integer oracle as the PNG path. Odd offsets would round —
    evenness is the planted closed-form contract, not a codec limit."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.functions.minijpeg import (decode_gray_jpeg,
                                                   encode_gray_jpeg)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        means = []
        nbytes = []
        for did in batch.column("doc_id").to_pylist():
            c = 84 + 2 * (did % 45)  # even offset from 128, range 84-172
            img = np.full((16, 24), c, np.uint8)
            payload = encode_gray_jpeg(img)
            back = decode_gray_jpeg(payload)
            s = int(back.astype(np.int64).sum())
            means.append(s * 1_000_000 // (back.size * 255))
            nbytes.append(len(payload))
        out = pa.table({"doc_id": batch.column("doc_id"),
                        "brightness_ppm": pa.array(means, pa.int64())})
        return out.append_column("jpeg_nonempty",
                                 pa.array([n > 100 for n in nbytes],
                                          pa.bool_()))

    return ds.map_batches(roundtrip, batch_format="pyarrow", batch_size=64)


def _q_tiff_roundtrip(sf_dir: str):
    """REAL uncompressed-TIFF path (minitiff): row-gradient images encode
    → decode LOSSLESSLY, so the exact pixel sum is the oracle (no
    constant-block restriction — baseline TIFF is raw bytes)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.functions.minitiff import (decode_gray_tiff,
                                                   encode_gray_tiff)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        sums = []
        for did in batch.column("doc_id").to_pylist():
            rows = np.array([(did + y) % 256 for y in range(8)], np.uint8)
            img = np.repeat(rows[:, None], 16, axis=1)
            back = decode_gray_tiff(encode_gray_tiff(img))
            sums.append(int(back.astype(np.int64).sum()))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "pixel_sum": pa.array(sums, pa.int64())})

    return ds.map_batches(roundtrip, batch_format="pyarrow", batch_size=128)


def _q_incremental_dedup(sf_dir: str):
    """Incremental crawl dedup (CCNet per-snapshot pattern): new snapshot
    (here: all documents) anti-joined by exact content hash against the
    prior snapshot (docs with ``doc_id % 4 == 1``) — only rows whose text
    never appeared before survive. The old side ships ONLY its md5 column
    through one bucketed anti hash_join."""
    import ray.data

    from documentai_ray.stages.dedup import dedup_against_snapshot

    new = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "source", "text"])
    def old_rows(batch):
        import numpy as np
        import pyarrow as pa
        ids = np.asarray(batch.column("doc_id").to_pylist())
        return batch.filter(pa.array(ids % 4 == 1)).select(["text"])

    old = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "text"]).map_batches(
        old_rows, batch_format="pyarrow")
    return dedup_against_snapshot(new, old).select_columns(
        ["doc_id", "source"])


def _q_bloom_dedup(sf_dir: str):
    """Incremental dedup on the bloom-prefilter scale path: the prior
    snapshot's u64 content hashes build a broadcast bitmap; new rows that
    MISS it bypass the exchange (no false negatives), only hits + ~1% FPs
    cross the exact anti-join on the FULL md5 (a bare 64-bit join key
    would birthday-collide at 10¹² docs). Output is provably identical to
    incremental_dedup's plain anti-join — same oracle."""
    import ray.data

    from documentai_ray.stages.dedup import dedup_against_snapshot_bloom

    new = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "source", "text"])

    def old_rows(batch):
        import numpy as np
        import pyarrow as pa
        ids = np.asarray(batch.column("doc_id").to_pylist())
        return batch.filter(pa.array(ids % 4 == 1)).select(["text"])

    old = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "text"]).map_batches(
        old_rows, batch_format="pyarrow")
    return dedup_against_snapshot_bloom(new, old).select_columns(
        ["doc_id", "source"])


def _q_url_filter(sf_dir: str):
    """Crawl-frontier URL filtering (UT1-blocklist style): drop blocked
    hosts (the heavy host + every srcN host with N % 7 == 3 — the
    blocklist itself is derived from the corpus' distinct sources, a
    broadcast-small side) and query-string tracking variants (the planted
    ?amp=1 pages). Pure map over the url column."""
    import pyarrow.parquet as pq
    import ray.data

    from documentai_ray.sources.pages import HEAVY_HOST, pages_dataset
    from documentai_ray.stages.curation import url_filter_batch

    srcs = set(pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["source"]).column("source").to_pylist())
    blocked = frozenset({HEAVY_HOST} | {
        f"{s}.example.com" for s in srcs if int(s[3:]) % 7 == 3})
    ds = pages_dataset(sf_dir, with_dups=False, with_near_dups=True)
    ds = ds.select_columns(["url"])
    return ds.map_batches(
        lambda b: url_filter_batch(b, blocked_hosts=blocked),
        batch_format="pyarrow", batch_size=512)


def _q_semdedup(sf_dir: str):
    """SemDeDup: distributed k-means (k=4, 2 iters — same fit the
    kmeans_clusters oracle pins) then per-cluster cosine prune — a vector
    is dropped iff a LOWER-id same-cluster vector sits at cosine ≥ 0.4
    (margin to the nearest pair ~1e-4 vs ~1e-15 cross-engine drift, same
    contract embedding_neardup relies on). One bounded exchange on the
    cluster id; the oracle unrolls the fit and mirrors the prune as a
    self-join."""
    import ray.data

    from documentai_ray.stages.similarity import semdedup

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return semdedup(ds, k=4, iters=2, threshold=0.4)


def _q_shard_export(sf_dir: str):
    """Deterministic training-shard export order: shard = knuth(id) % 16,
    position = rank of (hash, id) within the shard — the reproducible
    global shuffle a training-data writer needs (hash order IS the
    shuffle; every shard is an independently resumable partition)."""
    import ray.data

    from documentai_ray.stages.curation import assign_shards

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    return assign_shards(ds, n_shards=16)


def _q_dsir_weights(sf_dir: str):
    """DSIR-style importance weights (Xie et al. 2023): hashed-unigram
    bucket counts for the target set (docs with doc_id % 31 == 5 — the
    decontaminate benchmark subset) and the raw corpus (two streaming
    passes, each exchanging only 64-int partial bincounts), then a
    map-side per-doc score Σ ((target[b]+1)·10⁶)//(raw[b]+1) over token
    buckets — the integer-ratio analog of the log-likelihood ratio,
    bit-exact in SQL."""
    import ray.data

    from documentai_ray.stages.curation import dsir_bucket_counts, dsir_score

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def target_mask(batch):
        return [i % 31 == 5 for i in batch.column("doc_id").to_pylist()]

    raw = dsir_bucket_counts(ds)
    tgt = dsir_bucket_counts(ds, doc_filter=target_mask)
    return dsir_score(ds, tgt, raw)


def _q_heavy_hitters(sf_dir: str):
    """Misra-Gries heavy hitters: tokens with frequency > n/(k+1), exact
    counts, via two bounded passes (per-batch k-counter summaries, then
    exact counting of the guaranteed-superset candidates) — the no-shuffle
    alternative to a full token groupby. Integer threshold → no float
    margin; the oracle is the plain GROUP BY ... HAVING mirror."""
    import ray.data

    from documentai_ray.stages.sketches import heavy_hitter_tokens

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    return heavy_hitter_tokens(ds, k=30)


def _q_web_curation(sf_dir: str):
    """END-TO-END web-corpus curation — the training-data counterpart of
    the flagship extraction chain, composed from verified parts as ONE
    streaming pipeline in the canonical order:

        raw frontier (stale dups + ?amp variants)
          → URL filter (blocklist + query-string rules; dropped rows'
            html never leaves the read stage)
          → main-content extraction
          → exact dedup by url (latest capture wins)   [the only shuffle]
          → drop empty extractions
          → C4 line filter (docs with 0 surviving lines drop)
          → deterministic train/val/test split

    Output: (url, n_lines_kept, n_chars, split). The oracle composes the
    same steps as CTEs over the golden-page closed forms."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data  # noqa: F401

    from documentai_ray.sources.pages import HEAVY_HOST, pages_dataset
    from documentai_ray.stages.curation import url_filter_batch
    from documentai_ray.stages.dedup import dedup_latest
    from documentai_ray.stages.extract import extract_batch
    from documentai_ray.stages.lines import c4_line_filter_batch

    srcs = set(pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["source"]).column("source").to_pylist())
    blocked = frozenset({HEAVY_HOST} | {
        f"{s}.example.com" for s in srcs if int(s[3:]) % 7 == 3})

    ds = pages_dataset(sf_dir, with_dups=True, with_near_dups=True)

    def frontier(batch: pa.Table) -> pa.Table:
        out = url_filter_batch(batch, blocked_hosts=blocked)
        out = out.filter(out.column("keep"))
        return out.drop_columns(["host", "keep", "drop_reason"])

    ds = ds.map_batches(frontier, batch_format="pyarrow", batch_size=256)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    ds = dedup_latest(ds.select_columns(["url", "warc_ts", "text"]))

    def lines_and_split(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch.column("text"), ""))
        batch = c4_line_filter_batch(batch)
        batch = batch.filter(pc.greater(batch.column("n_lines_kept"), 0))
        urls = batch.column("url").to_pylist()
        ids = np.asarray([int(u.rsplit("/", 1)[1]) for u in urls], np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        frac = h.astype(np.float64) / float(1 << 32)
        split = np.where(frac < 0.8, "train",
                         np.where(frac < 0.9, "val", "test"))
        n_chars = pa.array(
            [len(t) for t in batch.column("clean_text").to_pylist()],
            pa.int64())
        return pa.table({"url": batch.column("url"),
                         "n_lines_kept": batch.column("n_lines_kept"),
                         "n_chars": n_chars,
                         "split": pa.array(split.tolist(), pa.string())})

    return ds.map_batches(lines_and_split, batch_format="pyarrow",
                          batch_size=256)


def _q_config_pipeline(sf_dir: str):
    """The web-curation chain compiled from configs/pipelines/
    web_curation.yaml by the declarative pipeline surface
    (pipelines/declarative.py: named-stage registry, compile-time
    validation, folds to ONE lazy Dataset) — a user re-orders or extends
    curation without code, the reference's config-surface idea applied
    to pipeline STRUCTURE. Must match the hand-composed web_curation
    oracle exactly."""
    import os

    from documentai_ray.pipelines.declarative import load_yaml_pipeline
    from documentai_ray.sources.pages import pages_dataset

    run = load_yaml_pipeline(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "configs", "pipelines", "web_curation.yaml"))
    ds = pages_dataset(sf_dir, with_dups=True, with_near_dups=True)
    return run(ds, sf_dir)


def _q_ivm_counts(sf_dir: str):
    """Incremental view maintenance of per-source token totals: the base
    aggregate plus SIGNED changelog deltas (deletes %7: −tokens; updates
    %3: +2 tokens from an appended " extra extra") — the delta pass
    touches only changed docs, never re-reads the base (aggregates.
    ivm_delta_counts). Oracle: aggregate the post-change state directly
    — delta maintenance must land on the identical totals."""
    import pyarrow as pa
    import ray.data

    base = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source", "text"])

    def base_rows(batch: pa.Table) -> pa.Table:
        toks = [len((t or "").split(" ")) for t in
                batch.column("text").to_pylist()]
        return pa.table({"source": batch.column("source"),
                         "n_tokens": pa.array(toks, pa.int64())})

    def delta_rows(batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = np.asarray(batch.column("doc_id").to_pylist(), np.int64)
        srcs = batch.column("source").to_pylist()
        toks = [len((t or "").split(" ")) for t in
                batch.column("text").to_pylist()]
        out_s, out_d = [], []
        for i, s, n in zip(ids, srcs, toks):
            if i % 7 == 0:                      # delete: -old
                out_s.append(s)
                out_d.append(-n)
            elif i % 3 == 0:                    # update: new - old = +2
                out_s.append(s)
                out_d.append(2)
        return pa.table({"source": pa.array(out_s, pa.string()),
                         "delta": pa.array(out_d, pa.int64())})

    from documentai_ray.stages.aggregates import ivm_delta_counts

    changes = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "text"]).map_batches(
        delta_rows, batch_format="pyarrow")
    return ivm_delta_counts(base.map_batches(base_rows,
                                             batch_format="pyarrow"),
                            changes, key_col="source", val_col="n_tokens")


def _q_pseudonymize(sf_dir: str):
    """Keyed-hash pseudonymization of the events export: user_id →
    md5-LE64("s1:<id>") — stable (joinable) but unlinkable without the
    salt, the structured-identifier complement of redact_pii. Oracle:
    the identical keyed hash in HUGEINT SQL."""
    import ray.data

    from documentai_ray.stages.curation import pseudonymize

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id"])
    return pseudonymize(ds, ["user_id"], salt="s1")


def _q_customer_order_counts(sf_dir: str):
    """LEFT hash_join coverage: every customer joined to its
    pre-aggregated order count — customers with no orders survive with
    n_orders 0 (the non-vacuous null side; ~1/3 of TPC-H customers).
    The order side pre-aggregates BEFORE the join so the exchange
    carries one row per customer, not per order. Oracle: LEFT JOIN +
    coalesce."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count

    from documentai_ray.stages.joins import hash_join

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    per_cust = (orders.groupby("o_custkey")
                .aggregate(Count(alias_name="n_orders")))

    def rekey(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch.column("o_custkey"),
                         "n_orders": batch.column("n_orders")})

    joined = hash_join(cust, per_cust.map_batches(rekey,
                                                  batch_format="pyarrow"),
                       on="c_custkey", how="left")

    def fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = pc.fill_null(batch.column("n_orders"), 0)
        return batch.set_column(batch.column_names.index("n_orders"),
                                "n_orders", pc.cast(n, pa.int64()))

    return joined.map_batches(fill, batch_format="pyarrow")


def _q_incremental_session(sf_dir: str):
    """Multi-round incremental ingestion — the steady-state life of a
    crawl pipeline: three snapshots arrive where EVERY round resends all
    previously-seen documents (t0 = docs %4==1, t1 = %4∈{1,2}, t2 = all)
    and each round keeps only content never seen before, then folds it
    into the accumulated state (dedup_against_snapshot per round; state
    materialized between rounds — the documented input-reuse exception).
    Output: (doc_id, first_snapshot). Oracle: the %4 class closed form —
    correct ONLY if every re-sent row is deduped in every later round,
    so any state leak double-emits and breaks the row count."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.dedup import dedup_against_snapshot

    def snapshot(mods: tuple):
        def keep(batch: pa.Table) -> pa.Table:
            import numpy as np
            ids = np.asarray(batch.column("doc_id").to_pylist())
            return batch.filter(pa.array(np.isin(ids % 4, list(mods))))

        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text"]).map_batches(
            keep, batch_format="pyarrow")

    rounds = [snapshot((1,)), snapshot((1, 2)), snapshot((0, 1, 2, 3))]
    state = None
    outs = []
    for i, snap in enumerate(rounds):
        if state is None:
            new = snap
        else:
            new = dedup_against_snapshot(snap, state)
        new = new.map_batches(
            lambda b, _i=i: b.append_column(
                "first_snapshot",
                pa.array([_i] * b.num_rows, pa.int64())),
            batch_format="pyarrow").materialize()
        outs.append(new)
        kept = new.select_columns(["doc_id", "text"])
        state = kept if state is None else state.union(kept).materialize()

    result = outs[0]
    for o in outs[1:]:
        result = result.union(o)
    return result.select_columns(["doc_id", "first_snapshot"])


def _q_f2_selfjoin(sf_dir: str):
    """AMS F2 sketch over orders.o_custkey: estimates the self-join size
    Σ f_k² (what a planner consults before a shuffle join) from d=8
    integer counters — each batch ships one 8-vector, the lower median
    of the squared merged counters is the estimate (integer end to end).
    Oracle: the identical d counters + lower median in SQL, plus the
    TRUE F2 for reference."""
    import ray.data

    from documentai_ray.stages.sketches import ams_f2_sketch

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey"])
    import pyarrow as pa

    est = ams_f2_sketch(ds, key_col="o_custkey")

    true_f2 = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                     columns=["o_custkey"])
               .groupby("o_custkey").count().to_pandas())
    tf2 = int((true_f2["count()"].to_numpy().astype("int64") ** 2).sum())
    return est.append_column("true_f2", pa.array([tf2], pa.int64()))


def _q_winsorize(sf_dir: str):
    """Group-wise winsorization of l_quantity per returnflag: clip to
    the group's exact integer [p05, p95] (bounded histogram → broadcast
    boundaries → vectorized clip) — the outlier-taming pass before
    statistics feed a model. Oracle: window-cumsum quantile closed form
    + least/greatest."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import winsorize_grouped

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag",
                 "l_quantity"])

    def to_int(batch: pa.Table) -> pa.Table:
        import numpy as np
        q = batch.column("l_quantity").to_numpy().astype("int64")
        return batch.set_column(batch.column_names.index("l_quantity"),
                                "l_quantity", pa.array(q, pa.int64()))

    out = winsorize_grouped(ds.map_batches(to_int, batch_format="pyarrow"),
                            key_cols=["l_returnflag"],
                            val_col="l_quantity")
    return out.select_columns(["l_orderkey", "l_linenumber",
                               "l_returnflag", "clipped"])


def _q_hits(sf_dir: str):
    """HITS hubs & authorities (2 iterations, integer-ppm L1 rescale)
    over the deterministic 3-out doc graph — the link-analysis
    complement of pagerank (graph.py::hits_int: join + zero-injected
    groupby + scalar-rescale per half-step). Bit-exact unrolled SQL
    oracle."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.graph import hits_int

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        src = list(ids) * 3
        dst = (list((ids * 7 + 1) % n) + list((ids * 13 + 2) % n)
               + list((ids * 31 + 3) % n))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    def nodes(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("doc_id").cast(pa.int64())})

    e = docs.map_batches(edges, batch_format="pyarrow")
    nd = docs.map_batches(nodes, batch_format="pyarrow")
    return hits_int(e, nd, iters=2, num_partitions=16)


def _q_mix_assemble(sf_dir: str):
    """EXECUTE the data-mixing plan: mix_plan's per-source (n_epochs,
    rate_ppm) broadcasts, then one flat-map emits (doc_id, epoch) copies
    kept iff md5-LE64("mix:<doc>:<epoch>") % 10⁶ < rate_ppm — the
    deterministic per-copy sampling that lands each source on its token
    target. Oracle: the plan CTEs + generate_series epochs + the same
    hash rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from documentai_ray.stages.curation import mix_plan
    from documentai_ray.stages.sketches import md5_le64

    srcs = set(pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["source"]).column("source").to_pylist())
    weights = {s: int(s[3:]) % 4 + 1 for s in srcs}
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])
    plan = mix_plan(ds, weights, budget_factor=2).to_pandas()
    pref = ray.put({r["source"]: (int(r["n_epochs"]), int(r["rate_ppm"]))
                    for _, r in plan.iterrows()})

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])

    def assemble(batch: pa.Table) -> pa.Table:
        p = ray.get(pref)
        out_d, out_s, out_e = [], [], []
        for d, s in zip(batch.column("doc_id").to_pylist(),
                        batch.column("source").to_pylist()):
            epochs, rate = p[s]
            for e in range(epochs):
                if md5_le64(f"mix:{d}:{e}") % 1_000_000 < rate:
                    out_d.append(d)
                    out_s.append(s)
                    out_e.append(e)
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "source": pa.array(out_s, pa.string()),
                         "epoch": pa.array(out_e, pa.int64())})

    return docs.map_batches(assemble, batch_format="pyarrow",
                            batch_size=512)


def _q_mix_plan(sf_dir: str):
    """Data-mixing plan (Pile/DoReMi static mix): per-source token counts
    (combiner pass bounded by source cardinality) + integer epoch/rate
    math against a 2x-corpus token budget with weights (srcN: N%4+1).
    Token = whitespace split, mirroring token_stats."""
    import pyarrow.parquet as pq
    import ray.data

    from documentai_ray.stages.curation import mix_plan

    srcs = set(pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["source"]).column("source").to_pylist())
    weights = {s: int(s[3:]) % 4 + 1 for s in srcs}
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])
    return mix_plan(ds, weights, budget_factor=2)


def _q_seasonality_strength(sf_dir: str):
    """Hour-of-day seasonality strength per event type
    (``windows.seasonality_strength_int``): one-way ANOVA eta² of the
    hourly-count series grouped by hour of day, exact integer ppm — the
    within-day STRUCTURE question (crawl-rate shaping, peak-hour
    budgeting) where trend/cusum/changepoint ask about drift ALONG
    time.  Balance comes free (whole-day window, dense zeros), which
    clears every fraction: num = 24·ΣS_h² − S², den = 24D·Σc² − S² —
    and zero cells contribute nothing, so the observed (hour, key)
    histogram suffices without materializing the grid.  Mirror:
    HUGEINT folds over the hourly CTE + a 24-row hour-of-day grid for
    peak/trough."""
    import ray.data

    from documentai_ray.stages.windows import seasonality_strength_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return seasonality_strength_int(ev)


def _q_theil_sen(sf_dir: str):
    """Theil–Sen robust trend slope per event type
    (``windows.theil_sen_int``): the median pairwise slope of the
    hourly series in doubled-milli units — the MAGNITUDE companion to
    mann_kendall's direction-only S, immune to the outlier hours OLS
    chases.  Slopes are trunc-milli by definition (SQL ``//``) so both
    engines rank identical integers; x = epoch hours so missing hours
    stretch dx.  One (hour, key) exchange (calendar-bounded), numpy
    triangle fold.  Mirror: within-key self-join + the doubled-median
    row_number pick."""
    import ray.data

    from documentai_ray.stages.windows import theil_sen_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return theil_sen_int(ev)


def _q_interarrival_stats(sf_dir: str):
    """Inter-arrival gap distribution per event type
    (``windows.interarrival_stats``): min / doubled-median / max of
    consecutive gaps in whole seconds, ordered by (ts, event_id) — the
    evidence behind every session-threshold and rate-limit choice
    (events_sessions ASSUMES a cutoff; this measures the gap
    distribution it should come from).  One key-hash exchange, one
    vectorized grouped-shift diff for ALL keys per partition,
    per-key gap-value histograms summed in a second tiny exchange so
    the median is exact (the grouped_median_int plan).  Mirror: lag()
    window + the doubled-median row_number pick."""
    import ray.data

    from documentai_ray.stages.windows import interarrival_stats

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "event_id"])
    return interarrival_stats(ev)


def _q_changepoint_localize(sf_dir: str):
    """Binary segmentation's first split per event type
    (``windows.changepoint_binary_int``): the hour t* maximizing the
    between-segment term S1²/n1 + S2²/n2 of the hourly-count series —
    WHERE the level moved, where cusum_alarms only says THAT it moved.
    Defined on the milli-floored integer score so both engines rank the
    identical integer (fraction denominators vary with t); argmax ties
    break toward the smallest t.  ONE pre-combined (hour, key) exchange;
    the split scan folds the bounded series driver-side.  Mirror:
    running-sum windows + HUGEINT score + row_number pick."""
    import ray.data

    from documentai_ray.stages.windows import changepoint_binary_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return changepoint_binary_int(ev)


def _q_bloom_semijoin(sf_dir: str):
    """Bloom-pushdown semi-join audit (``sketches.bloom_build_bits`` /
    ``bloom_semijoin_stats``): the BUILDING-segment customer keys fold
    into a 4096-bit bloom filter (one exchange bounded by m positions),
    the filter broadcasts ONCE via ray.put, and the orders fact side is
    screened with a vectorized distinct-key lookup — the pushdown
    pattern for when the build side's exact key set is too big to
    broadcast but its m-bit summary isn't.  The exact key set rides
    along precisely to MEASURE the summary: n_fp and the false-positive
    rate over true negatives in ppm (4096 bits vs ~thousands of keys
    keeps fp genuinely nonzero at sf≥0.01, so the oracle
    discriminates); the no-false-negative contract is asserted
    engine-side.  One md5 per distinct key, kh=3 disjoint 16-bit hex
    slices (the countmin convention) — the SQL mirror carves the same
    nibbles."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from documentai_ray.stages.sketches import (bloom_build_bits,
                                                bloom_semijoin_stats)

    M, KH = 4096, 3
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"])

    def building_only(batch):
        import pyarrow.compute as pc
        return batch.filter(
            pc.equal(batch.column("c_mktsegment"), "BUILDING"))

    small = cust.map_batches(building_only, batch_format="pyarrow")
    bits = bloom_build_bits(small, key_col="c_custkey", m=M, kh=KH)
    truth = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filters=[("c_mktsegment", "=", "BUILDING")]
    ).column("c_custkey").to_numpy()
    fact = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey"])
    return bloom_semijoin_stats(fact, key_col="o_custkey",
                                bits_ref=ray.put(bits),
                                truth_ref=ray.put(truth), m=M, kh=KH)


def _q_ngram_novelty(sf_dir: str):
    """Per-document 3-gram novelty (``textstats.ngram_novelty``): the
    fraction of each doc's distinct shingles first seen in the corpus
    at this doc_id — the repetition-between-documents curation signal
    at per-doc granularity (the corpus deliberately plants exact and
    near duplicates, which score ~0 here).  A distinct n-gram is novel
    exactly where its min(doc_id) lands, so novel counts come from the
    min table grouped by its own value — no join back to the pair
    stream; the only big exchange is the corpus-ngram (ngram, id)
    shuffle, the MinHash band-shuffle cost class.  Docs join their
    denominator via a distributed left hash join (zero-ngram docs keep
    rows, ppm 0).  Shingles are the dedup convention."""
    import ray.data

    from documentai_ray.stages.textstats import ngram_novelty

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ngram_novelty(ds, id_col="doc_id", text_col="text", n=3)


def _q_attribution_credit(sf_dir: str):
    """Linear multi-touch attribution (``windows.attribution_linear``):
    each purchase splits 10⁶ ppm of credit equally (floor per
    conversion) among the user's non-purchase events in the strict
    half-open hour before it — the budget question (WHICH channels
    earned the conversions) the funnel family's ordered-completion
    counts don't answer.  One user-hash exchange; each partition
    resolves all users with two searchsorted calls + prefix sums + the
    range-add delta trick — no per-conversion loop.  Mirror: window
    join + per-conversion count + floor-divided credit sum."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.windows import attribution_linear

    def to_us(batch: pa.Table) -> pa.Table:
        us = (batch.column("ts").to_numpy().astype("datetime64[us]")
              .astype("int64"))
        return pa.table({"user_id": batch.column("user_id"),
                         "ts_us": pa.array(us, pa.int64()),
                         "event_type": batch.column("event_type")})

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"]
                               ).map_batches(to_us, batch_format="pyarrow")
    return attribution_linear(ds, key_col="user_id", ts_col="ts_us",
                              type_col="event_type",
                              conversion_type="purchase",
                              window=3_600_000_000, num_partitions=32)


def _q_fd_error(sf_dir: str):
    """Approximate-FD discovery scores (``dq.fd_g3_error``): the g3
    error — minimum deletions for lhs→rhs to hold — for three candidate
    dependencies across three tables (custkey→orderpriority,
    partkey→returnflag, user→event_type).  dq_audit asserts declared
    constraints; this RANKS undeclared ones by how far they are from
    true, the TANE-style profiling primitive.  Per FD: pair-count
    exchange bounded by distinct (lhs, rhs), per-lhs MAX, per-block
    scalar folds — the pair table never reaches the driver.  Mirror:
    n − Σ max per lhs, per table."""
    import pandas as pd
    import ray.data

    from documentai_ray.stages.dq import fd_g3_error

    fds = [
        ("orders_cust_to_priority", "orders.parquet",
         "o_custkey", "o_orderpriority"),
        ("lineitem_part_to_flag", "lineitem.parquet",
         "l_partkey", "l_returnflag"),
        ("events_user_to_type", "events.parquet",
         "user_id", "event_type"),
    ]
    out = []
    for name, table, lhs, rhs in fds:
        ds = ray.data.read_parquet(f"{sf_dir}/{table}", columns=[lhs, rhs])
        row = fd_g3_error(ds, lhs_col=lhs, rhs_col=rhs)
        row.insert(0, "fd", name)
        out.append(row)
    return pd.concat(out, ignore_index=True)


def _q_oov_rate(sf_dir: str):
    """Per-document out-of-vocabulary rate against a reference
    vocabulary built from the ``doc_id % 10 == 0`` slice
    (``textstats.build_vocab_distributed`` + ``oov_rate``) — the
    tokenizer-coverage eval.  The vocab is a distributed distinct
    (bounded by |V|, Heaps' law), ships ONCE via ray.put, and
    membership is one hash-based np.isin per batch over the flattened
    token array with reduceat per-doc folds — zero exchange on the
    scoring pass, no per-token Python.  Slice docs score 0 by
    construction (their tokens define the vocab); the rest
    discriminate.  Mirror: anti-join of unnested tokens vs the slice
    vocab CTE."""
    import ray
    import ray.data

    from documentai_ray.stages.textstats import (build_vocab_distributed,
                                                 oov_rate)

    import pyarrow as pa

    def slice_only(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return batch.filter(pa.array(ids % 10 == 0))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    vocab = build_vocab_distributed(
        ds.map_batches(slice_only, batch_format="pyarrow"),
        text_col="text")
    return oov_rate(ds, ray.put(vocab), id_col="doc_id", text_col="text")


def _q_kendall_tau(sf_dir: str):
    """Kendall concordance between quantity and discount-cents per
    returnflag (``aggregates.grouped_kendall_int``) — rank correlation
    WITHOUT the O(n²) pair scan: both columns have tiny value domains
    (50 × 11), so every row-pair comparison is determined by the joint
    histogram and C/D/tie pair counts are cell-product sums over ≤550
    cells per group.  ONE bounded histogram exchange; the n² pairs
    never materialize anywhere.  Full tie decomposition (Tx, Ty, Txy;
    the P = C+D+Tx+Ty−Txy identity is asserted engine-side) plus
    tau_a_ppm with trunc-toward-zero division (SQL ``//``).  Mirror:
    HUGEINT histogram self-join."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import grouped_kendall_int

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"])

    def prep(batch: pa.Table) -> pa.Table:
        q = batch.column("l_quantity").to_numpy().astype("int64")
        dc = np.rint(batch.column("l_discount").to_numpy() * 100
                     ).astype("int64")
        return pa.table({"l_returnflag": batch.column("l_returnflag"),
                         "x": pa.array(q, pa.int64()),
                         "y": pa.array(dc, pa.int64())})

    return grouped_kendall_int(ds.map_batches(prep, batch_format="pyarrow"),
                               key_col="l_returnflag", x_col="x", y_col="y")


def _q_max_concurrency(sf_dir: str):
    """Peak simultaneous open intervals per user — each event opens a
    window of floor(value) seconds (floor, not round: the corpus has
    exact-half values like x.50 where numpy's banker's rounding and
    SQL's half-away-from-zero round() diverge); the statistic is the
    maximum overlap DEPTH (``windows.max_concurrency``), the load metric
    user_coverage's union length deliberately erases (ten nested
    windows cover like one but stack depth 10).  Boundary sweep made
    distributed: one user-hash exchange, per-partition +1/−1 explode +
    grouped cumsum + grouped max for ALL users at once.  Half-open
    [s, e): at equal t the −1 sorts first, so touching intervals never
    overlap and zero-length intervals (value < 1 floors to 0 — the
    corpus has them) contribute depth 0.  Mirror: UNION ALL boundary rows +
    running SUM window + MAX."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.windows import max_concurrency

    def iv(batch: pa.Table) -> pa.Table:
        import numpy as np
        s = (batch.column("ts").to_numpy().astype("datetime64[us]")
             .astype("int64") // 1_000_000)
        dur = np.floor(batch.column("value").to_numpy()).astype("int64")
        return pa.table({"user_id": batch.column("user_id"),
                         "s": pa.array(s, pa.int64()),
                         "e": pa.array(s + dur, pa.int64())})

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"]
                               ).map_batches(iv, batch_format="pyarrow")
    return max_concurrency(ds, key_col="user_id", start_col="s",
                           end_col="e", num_partitions=32)


def _q_countmin_estimate(sf_dir: str):
    """Count-min sketch frequency estimates for the exact top-20 corpus
    tokens (``sketches.countmin_cells`` / ``countmin_estimate``): the
    fixed-size (4×256 counters) mergeable frequency summary whose point
    estimate is ALWAYS ≥ the true count — the one-sided contract the
    output exposes as over_est = cms_est − n_true ≥ 0 per probe (256
    columns against thousands of distinct tokens guarantees collisions,
    so the overestimates are genuinely nonzero and the oracle
    discriminates).  One md5 per token addresses all 4 rows (disjoint
    16-bit hex slices), so the SQL mirror carves the same nibbles from
    the same hex.  Physical plan: map-side token Counter → per-batch
    (row, col) partials → ONE exchange bounded by d·w = 1024 cells;
    exact probe counts ride the top_tokens combiner plan.  Token =
    single-space split, empties counted (the top_tokens convention)."""
    import collections

    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.sketches import (countmin_cells,
                                                countmin_estimate)

    D, W = 4, 256
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        c = collections.Counter()
        for t in batch.column("text").to_pylist():
            c.update((t or "").split(" "))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    exact = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("token")
             .aggregate(Sum("n", alias_name="n"))
             .to_pandas()
             .sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort")
             .head(20).reset_index(drop=True))
    cells = countmin_cells(ds, text_col="text", d=D, w=W)
    exact["cms_est"] = countmin_estimate(cells, exact["token"].tolist(),
                                         d=D, w=W)
    exact["cms_est"] = exact["cms_est"].astype("int64")
    exact["over_est"] = (exact["cms_est"] - exact["n"]).astype("int64")
    assert (exact["over_est"] >= 0).all(), \
        "count-min one-sided contract violated"
    return exact.rename(columns={"n": "n_true"})


def _q_acf_lag(sf_dir: str):
    """Hourly-series autocorrelation at lags 1 and 24 per event type
    (``windows.acf_lag_int``): the PERIODICITY detector the trend
    family can't see — mann_kendall/theil_sen score monotone drift,
    seasonality_strength scores hour-of-day bucket structure; ACF(24)
    measures whether the series actually REPEATS at day scale (phase
    included) and ACF(1) how sticky adjacent hours are.  Dense global
    hour grid (zeros counted: absence is a measurement), mean-centered
    products cleared to integers by y_t = n·x_t − S, trunc-toward-zero
    ppm.  ONE bounded (hour, key) exchange.  Mirror: generate_series
    hour grid + lag() windows + HUGEINT folds + sign-split division."""
    import ray.data

    from documentai_ray.stages.windows import acf_lag_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return acf_lag_int(ev, lags=(1, 24))


def _q_runs_test(sf_dir: str):
    """Wald–Wolfowitz runs test of the dense hourly series per event
    type (``windows.runs_test_int``): the LEVEL-CLUSTERING question —
    do above-median and below-median hours arrive in long blocks
    (bursty regimes) or alternate?  trend_flips counts direction
    thrash, cusum catches sustained shifts; this scores the run
    structure against its exact expectation E[R] = 1 + 2n₁n₂/(n₁+n₂)
    (rational → exact ppm).  Ties at the doubled-unit median drop (the
    classic convention).  Same single bounded exchange.  Mirror:
    dense grid + doubled-median row_number pick + lag() change count."""
    import ray.data

    from documentai_ray.stages.windows import runs_test_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return runs_test_int(ev)


def _q_frequent_triples(sf_dir: str):
    """A-priori frequent 3-itemsets over order baskets
    (``graph.frequent_triples``): part triples ordered together in ≥ 2
    orders — the market-basket level above copurchase_pairs, where
    naive enumeration dies (m³/6 candidates per basket) and the
    a-priori principle starts paying: a cheap distributed item-support
    pass prunes the combination base BEFORE any triple materializes,
    the surviving item set broadcasts ONCE via ray.put, baskets
    co-locate on one hash exchange, and each partition emits triples
    for all its baskets grouped BY SIZE in one numpy gather (no
    per-basket loop).  Second exchange bounded by distinct candidate
    triples.  Mirror: distinct-pair CTE three-way self-join."""
    import ray.data

    from documentai_ray.stages.graph import frequent_triples

    import pandas as pd

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])
    out = frequent_triples(ds, basket_col="l_orderkey",
                           item_col="l_partkey", min_support=2,
                           num_partitions=32).to_pandas()
    if out.shape[1] == 0:
        # Dataset.to_pandas drops schema on zero rows; at high sf the
        # support-2 triple set is legitimately empty — keep the columns
        out = pd.DataFrame({c: pd.Series([], dtype="int64")
                            for c in ["item_a", "item_b", "item_c", "n"]})
    return out


def _q_haar_energy(sf_dir: str):
    """Haar wavelet energy decomposition of the hourly series per event
    type (``windows.haar_energy_int``): AT WHICH TIMESCALE does the
    variance live — level 1 = hour-to-hour jitter, level 5 = 16–32 h ≈
    daily structure, level 9 = 256 h regime shifts — the multi-scale
    question acf (one lag) and seasonality (one grouping) can't answer
    in one pass.  Dyadic truncation to m = 2^⌊log₂H⌋ leading hours is
    the documented contract; the unnormalized-Haar Parseval identity
    m·Σx² − A² = Σ_l E_l·(m/2^l) holds in INTEGERS and is asserted
    per key, so every share_ppm is exact.  ONE bounded (hour, key)
    exchange.  Mirror: a generated 13-level pairwise-CTE pyramid with
    HAVING count(*)=2 terminating the fold exactly at the top."""
    import ray.data

    from documentai_ray.stages.windows import haar_energy_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return haar_energy_int(ev)


def _q_ewma_backtest(sf_dir: str):
    """Dyadic-EWMA one-step forecast backtest per event type
    (``windows.ewma_backtest_int``): MAE of predicting each hour from
    the 8 trailing hours with halving weights 2⁷…2⁰ — the LOCAL-
    MOMENTUM predictor, the complement of seasonal_naive_mae's
    same-hour-yesterday periodicity bet; comparing the two MAEs says
    which signal the series actually carries.  Mersenne denominator
    2⁸−1 keeps every error integer (err = |255·x_t − Σ 2^{8−k}·x_{t−k}|);
    first 8 hours skipped (no full history).  Same single bounded
    exchange; one vectorized shift-and-add across all keys.  Mirror:
    8 lag() terms over the dense grid."""
    import ray.data

    from documentai_ray.stages.windows import ewma_backtest_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return ewma_backtest_int(ev, window=8)


def _q_url_templates(sf_dir: str):
    """URL template census over the outlink stream
    (``extract.url_template_batch``): collapse every digit run in the
    link path?query to ``{n}`` and count instances per (host, template)
    — the crawl-frontier signal behind trap detection, pattern dedup
    and budgeting (a template with 10⁹ instances and near-identical
    content is a calendar trap; a flat page set isn't).  Anchor edges
    flat-map → one pyarrow regex kernel per batch → per-batch pandas
    pre-combine → ONE exchange bounded by distinct (host, template),
    never the edge stream.  Oracle: the template closed form (6 fixed
    nav/footer paths per decodable page, /rel/{n} ×2 on article/report
    pages, /cat/{n}/{n} ×12 on link-farm pages)."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.extract import (anchor_edges_batch,
                                               url_template_batch)

    ds = pages_dataset(sf_dir, with_dups=False)
    edges = ds.select_columns(["url", "html"]).map_batches(
        anchor_edges_batch, batch_format="pyarrow", batch_size=256)
    tmpl = edges.map_batches(url_template_batch, batch_format="pyarrow")

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (df.groupby(["host", "template"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    return (tmpl.map_batches(combine, batch_format="pyarrow")
            .groupby(["host", "template"])
            .aggregate(Sum("n", alias_name="n_links")))


def _q_conversion_lag(sf_dir: str):
    """Funnel timing per user (``windows.conversion_lag``): whole
    seconds from the user's FIRST signup to their first purchase
    strictly after it — the metric LTV windows and re-engagement
    deadlines are set from; funnel_conversion counts WHO converts,
    attribution_credit says WHICH touches earn it, this measures HOW
    LONG it takes.  Read-side type prefilter (nothing else shuffles),
    ONE user-hash exchange, two vectorized groupby-min passes per
    partition.  Mirror: first-signup CTE + strict-after min-purchase
    join + epoch // 10⁶."""
    import ray.data

    from documentai_ray.stages.windows import conversion_lag

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])
    return conversion_lag(ev, from_type="signup", to_type="purchase",
                          num_partitions=32)


def _q_q17_decorrelated(sf_dir: str):
    """TPC-H Q17-style correlated aggregate, decorrelated: revenue
    locked in small-quantity line items (quantity below 20% of the
    part's own average) — the canonical subquery-per-row pattern
    rewritten as per-part stats + a partitioned hash_join back onto
    the fact, with the threshold kept EXACT in integers:
    q < 0.2·(Σq/n) ⟺ 5·q·n < Σq (no float average anywhere).
    Per-part (Σq, n) folds on one part-bounded exchange; the fact
    re-joins on the same key (both sides large → ``joins.hash_join``,
    not a broadcast); one scalar fold.  Mirror: the same inequality
    verbatim."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Sum

    from documentai_ray.stages.joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def prep(batch: pa.Table) -> pa.Table:
        q = np.rint(batch.column("l_quantity").to_numpy()).astype("int64")
        price_c = np.rint(batch.column("l_extendedprice").to_numpy()
                          * 100).astype("int64")
        return pa.table({"partkey": batch.column("l_partkey"),
                         "qty": pa.array(q, pa.int64()),
                         "price_c": pa.array(price_c, pa.int64())})

    fact = li.map_batches(prep, batch_format="pyarrow")
    stats = (fact.groupby("partkey")
             .aggregate(Sum("qty", alias_name="sq"),
                        Count(alias_name="np")))
    joined = hash_join(fact, stats, on="partkey")

    def small(batch: pa.Table) -> pa.Table:
        qty = batch.column("qty").to_numpy()
        sq = batch.column("sq").to_numpy()
        n = batch.column("np").to_numpy()
        keep = 5 * qty * n < sq
        price = batch.column("price_c").to_numpy()[keep]
        return pa.table({"n_small": pa.array([int(keep.sum())], pa.int64()),
                         "rev_c": pa.array([int(price.sum())], pa.int64())})

    out = (joined.map_batches(small, batch_format="pyarrow")
           .aggregate(Sum("n_small", alias_name="n_small"),
                      Sum("rev_c", alias_name="revenue_cents")))
    import pandas as pd
    return pd.DataFrame([{"n_small": int(out["n_small"]),
                          "revenue_cents": int(out["revenue_cents"])}])


def _q_relational_division(sf_dir: str):
    """Relational DIVISION (``joins.relational_division``): customers
    with orders in EVERY priority class — the classic for-all operator
    the inner/semi/anti family can't express without double negation,
    done by counting: distinct (customer, priority) pairs fold on one
    bounded exchange, a key qualifies iff its distinct-value count
    equals the global divisor count (a scalar; the divisor set never
    ships).  Mirror: HAVING count(DISTINCT) = scalar subquery."""
    import ray.data

    from documentai_ray.stages.joins import relational_division

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"])
    return relational_division(orders, key_col="o_custkey",
                               div_col="o_orderpriority")


def _q_t_closeness(sf_dir: str):
    """t-closeness audit over customer metadata
    (``privacy.t_closeness_audit``): completes the privacy trio —
    k-anonymity bounds class size, l-diversity bounds distinct
    sensitive values, this bounds the DISTRIBUTION gap: a class that's
    99% in-arrears against a 9% global base rate leaks membership
    regardless of size or diversity.  TVD is rational → exact ppm via
    Σ|c_v·N − g_v·m| / (2mN) with absent values contributing g_v·m off
    the observed histogram (no dense grid).  ONE (QI, sensitive)
    exchange + one QI-hash exchange, all classes per partition folded
    vectorized.  t = 0.1 (100000 ppm)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from documentai_ray.stages.privacy import t_closeness_audit

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": batch.column("c_nationkey"),
            "c_mktsegment": batch.column("c_mktsegment"),
            "bal_neg": pc.less(batch.column("c_acctbal"), 0.0)})

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"]
    ).map_batches(prep, batch_format="pyarrow")
    return t_closeness_audit(
        cust, qi_cols=["c_nationkey", "c_mktsegment"],
        sensitive_col="bal_neg", t_ppm=100_000, num_partitions=32)


def _q_orders_all_ontime(sf_dir: str):
    """Universal child predicate per order (the SLA fill-rate
    pattern): orders where EVERY line item shipped within 30 days of
    the order date, rolled up per priority — relational_division's
    sibling on a CONDITION over join children rather than a divisor
    set.  ``joins.hash_join`` co-locates each order's lines, the
    all-pass flag is one vectorized groupby-min per partition, and
    only (priority, flag) partials cross the second exchange.
    Orders with no line items drop on the inner join (both engines,
    documented).  Mirror: min(CASE) per order + priority rollup."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])

    def li_prep(batch: pa.Table) -> pa.Table:
        return pa.table({"orderkey": batch.column("l_orderkey"),
                         "ship_d": batch.column("l_shipdate")
                         .cast(pa.date32()).cast(pa.int32())})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_prep(batch: pa.Table) -> pa.Table:
        return pa.table({"orderkey": batch.column("o_orderkey"),
                         "order_d": batch.column("o_orderdate")
                         .cast(pa.date32()).cast(pa.int32()),
                         "pri": batch.column("o_orderpriority")})

    joined = hash_join(li.map_batches(li_prep, batch_format="pyarrow"),
                       orders.map_batches(o_prep, batch_format="pyarrow"),
                       on="orderkey")

    def per_order(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["_ok"] = (df["ship_d"] - df["order_d"] <= 30).astype("int64")
        g = (df.groupby("orderkey", sort=False)
             .agg(pri=("pri", "first"), ontime=("_ok", "min"))
             .reset_index())
        out = (g.groupby("pri", sort=False)
               .agg(n_orders=("ontime", "size"),
                    n_all_ontime=("ontime", "sum")).reset_index())
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    agg = (joined.map_batches(per_order, batch_format="pyarrow")
           .groupby("pri")
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("n_all_ontime", alias_name="n_all_ontime"))
           ).to_pandas()
    agg = agg.rename(columns={"pri": "o_orderpriority"})
    agg["n_orders"] = agg["n_orders"].astype("int64")
    agg["n_all_ontime"] = agg["n_all_ontime"].astype("int64")
    agg["ontime_ppm"] = (1_000_000 * agg["n_all_ontime"]
                         // agg["n_orders"]).astype("int64")
    return agg


def _q_minmax_scale(sf_dir: str):
    """Per-key min-max feature scaling in exact ppm — the affine
    member of the featurizer family (target_encode handles categorical,
    quantile_normalize rank; this is the plain (v − min)/(max − min)
    every feature pipeline starts with), exact because value cents are
    integers: scaled_ppm = 10⁶·(v_c − lo) // (hi − lo).  Per-key
    (lo, hi) folds on one bounded exchange and broadcasts in a closure
    (|keys| rows); the scaling pass is one vectorized map, zero
    further exchange.  Raises on a constant key (hi = lo: scale
    undefined).  Mirror: min/max CTE join + the same floor."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Max, Min

    def cents(batch: pa.Table) -> pa.Table:
        v = np.rint(batch.column("value").to_numpy() * 100).astype("int64")
        return pa.table({"event_id": batch.column("event_id"),
                         "event_type": batch.column("event_type"),
                         "vc": pa.array(v, pa.int64())})

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"]
    ).map_batches(cents, batch_format="pyarrow")
    mm = (ev.groupby("event_type")
          .aggregate(Min("vc", alias_name="lo"),
                     Max("vc", alias_name="hi"))).to_pandas()
    if (mm["hi"] == mm["lo"]).any():
        bad = mm.loc[mm["hi"] == mm["lo"], "event_type"].iloc[0]
        raise ValueError(f"minmax_scale: constant value for {bad!r}")
    lo = dict(zip(mm["event_type"], mm["lo"].astype("int64")))
    hi = dict(zip(mm["event_type"], mm["hi"].astype("int64")))

    def scale(batch: pa.Table) -> pa.Table:
        import pandas as pd
        k = batch.column("event_type").to_pandas()
        v = batch.column("vc").to_numpy()
        l = k.map(lo).to_numpy()
        h = k.map(hi).to_numpy()
        s = (1_000_000 * (v - l)) // (h - l)
        return pa.table({"event_id": batch.column("event_id"),
                         "event_type": batch.column("event_type"),
                         "scaled_ppm": pa.array(s, pa.int64())})

    return ev.map_batches(scale, batch_format="pyarrow")


def _q_markov_kstep(sf_dir: str):
    """k-step Markov forecast over user event streams
    (``windows.markov_kstep_int``): where does the process concentrate
    after 4 hops from a uniform start — the FORWARD question
    event_transitions' adjacency census doesn't answer, with the
    finite horizon + per-step trunc-ppm fold standing in for the
    (irrational) stationary distribution so both engines land on the
    identical integers.  Transition census rides transitions_per_key's
    exchanges; the fold runs on the ≤|types|² matrix.  Mirror: k
    generated left-join CTEs applying the same sum-then-floor step."""
    import ray.data

    from documentai_ray.stages.windows import markov_kstep_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"])
    return markov_kstep_int(ev, steps=4)


def _q_rfm_segments(sf_dir: str):
    """RFM segmentation of purchasers (the classic CRM featurizer):
    recency (days since last purchase, vs corpus max ts), frequency
    (purchase count), monetary (whole dollars) — each quintile-ranked
    1..5 (1 = best) with the DETERMINISTIC rank rule
    q = 1 + 5·rank // n on a (metric, user_id) total order, because
    SQL ntile() on ties is order-dependent where row_number is not.
    Metrics are day/dollar-granular BY DEFINITION — that is standard
    RFM practice and what keeps ``aggregates.global_row_index``'s
    value histogram bounded (days ≤ span, dollars ≤ price cap) so the
    rank assignment never global-sorts.  One purchase-filtered user
    exchange + three bounded-histogram rank passes.  Mirror:
    row_number() windows with the same tiebreak."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    from documentai_ray.stages.aggregates import global_row_index

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = batch.filter(pc.equal(batch.column("event_type"), "purchase"))
        v = np.rint(b.column("value").to_numpy() * 100).astype("int64")
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"user_id": b.column("user_id"),
                         "t_us": t, "cents": pa.array(v, pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Max("t_us", alias_name="last_us"),
                           Count(alias_name="frequency"),
                           Sum("cents", alias_name="monetary_c")))
    t_max = int(per_user.max("last_us"))

    def metrics(batch: pa.Table) -> pa.Table:
        last = batch.column("last_us").to_numpy()
        rec_d = (t_max - last) // 86_400_000_000
        mon_d = batch.column("monetary_c").to_numpy() // 100
        return pa.table({
            "user_id": batch.column("user_id"),
            "recency_d": pa.array(rec_d.astype("int64"), pa.int64()),
            "frequency": batch.column("frequency").cast(pa.int64()),
            "monetary_d": pa.array(mon_d.astype("int64"), pa.int64()),
            "neg_f": pa.array((-batch.column("frequency").to_numpy())
                              .astype("int64"), pa.int64()),
            "neg_m": pa.array((-mon_d).astype("int64"), pa.int64())})

    m = per_user.map_batches(metrics, batch_format="pyarrow")
    n_users = m.count()
    m = global_row_index(m, val_col="recency_d", tiebreak_col="user_id",
                         out_col="_ri_r")
    m = global_row_index(m, val_col="neg_f", tiebreak_col="user_id",
                         out_col="_ri_f")
    m = global_row_index(m, val_col="neg_m", tiebreak_col="user_id",
                         out_col="_ri_m")

    def buckets(batch: pa.Table) -> pa.Table:
        def q(col):
            return (1 + 5 * batch.column(col).to_numpy()
                    // n_users).astype("int64")
        rq, fq, mq = q("_ri_r"), q("_ri_f"), q("_ri_m")
        return pa.table({
            "user_id": batch.column("user_id"),
            "recency_d": batch.column("recency_d"),
            "frequency": batch.column("frequency"),
            "monetary_d": batch.column("monetary_d"),
            "r_q": pa.array(rq, pa.int64()),
            "f_q": pa.array(fq, pa.int64()),
            "m_q": pa.array(mq, pa.int64()),
            "rfm_code": pa.array(100 * rq + 10 * fq + mq, pa.int64())})

    return m.map_batches(buckets, batch_format="pyarrow")


def _q_revenue_share(sf_dir: str):
    """Ratio-to-parent rollup (the report-share window family):
    order revenue per nation with share-of-region and share-of-global
    in exact ppm — orders join customer on the partitioned
    ``joins.hash_join`` (both fact-sized at scale; the round-1 verdict
    retired the orders-dict broadcast for exactly this shape), nation
    and region ride as a 25-row closure lookup, shares fold on the
    25-row driver frame.  Mirror: two-level join + HUGEINT share."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.joins import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])

    def o_prep(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("o_totalprice").to_numpy()
                    * 100).astype("int64")
        return pa.table({"custkey": batch.column("o_custkey"),
                         "cents": pa.array(c, pa.int64())})

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    def c_prep(batch: pa.Table) -> pa.Table:
        return pa.table({"custkey": batch.column("c_custkey"),
                         "nationkey": batch.column("c_nationkey")})

    joined = hash_join(orders.map_batches(o_prep, batch_format="pyarrow"),
                       cust.map_batches(c_prep, batch_format="pyarrow"),
                       on="custkey")
    per_nation = (joined.groupby("nationkey")
                  .aggregate(Sum("cents", alias_name="revenue_cents"))
                  ).to_pandas()

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    df = (per_nation.merge(nat, left_on="nationkey",
                           right_on="n_nationkey")
          .merge(reg, left_on="n_regionkey", right_on="r_regionkey"))
    df["revenue_cents"] = df["revenue_cents"].astype("int64")
    reg_tot = df.groupby("r_name")["revenue_cents"].transform("sum")
    glob_tot = int(df["revenue_cents"].sum())
    # 25-row driver fold in Python ints: 10⁶·cents clears int64 at sf ≥ 1
    df["share_region_ppm"] = pd.array(
        [1_000_000 * int(r) // int(t)
         for r, t in zip(df["revenue_cents"], reg_tot)], dtype="int64")
    df["share_global_ppm"] = pd.array(
        [1_000_000 * int(r) // glob_tot
         for r in df["revenue_cents"]], dtype="int64")
    return df[["n_name", "r_name", "revenue_cents",
               "share_region_ppm", "share_global_ppm"]]


_BM25_QUERIES = {
    "q_rare": ["dup", "merge"],
    "q_exec": ["window", "sort", "scan"],
    "q_cust": ["customer", "order", "dup"],
}


def _q_bm25_topk(sf_dir: str):
    """Integer-exact BM25 retrieval (``indexing.bm25_topk``): top-5
    docs per fixed query under the Okapi shape — tf saturation
    (k₁ = 6/5) and length normalization (b = 3/4) cleared to the exact
    rational 22·tf·L / (10·tf·L + 3·L + 9·dl·N), weighted by the
    RATIONAL idf 10⁶·(N−df+1)//(df+1) (log idf is irrational; libm ulp
    noise would flip near-tie ranks across engines) — the two scoring
    behaviors tfidf_topk's raw tf·10⁶//df deliberately lacks.  Pass 1
    folds (N, L, per-term df) through one P·(|terms|+1)-row exchange;
    pass 2 is map-side flat-token scan with Python-int exact division
    on the sparse hits only; grouped_topk selects.  Mirror: the same
    cleared fractions over unnest + VALUES query table + row_number."""
    import ray.data

    from documentai_ray.stages.indexing import bm25_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return bm25_topk(ds, queries=_BM25_QUERIES, k=5)


def _q_dispersion_index(sf_dir: str):
    """Fano factor of the dense hourly series per event type
    (``windows.dispersion_index_int``): the POISSON question the series
    family doesn't ask — acf/runs/haar score time structure, this
    scores the count distribution against the var = mean yardstick
    (D ≫ 1: the same total arriving in clumps; D < 1: rate-limited
    regularity).  n·Σx² − S² clears the variance to integers, so
    D is rational → exact floor ppm, and ``overdispersed`` compares
    the UN-truncated sides.  Dense zeros counted (dropping empty hours
    biases D down exactly when burstiness is highest).  One bounded
    (hour, key) exchange.  Mirror: dense grid + HUGEINT sums."""
    import ray.data

    from documentai_ray.stages.windows import dispersion_index_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return dispersion_index_int(ev)


def _q_leadlag_beta(sf_dir: str):
    """Lead–lag regression slope of purchases on clicks k hours earlier
    at lags 0..3 (``windows.leadlag_beta_int``): the CENTERED
    complement to lag_coactivity's raw dot — two busy series co-move
    trivially through their shared baseline, so the uncentered sum
    peaks wherever volume is high; removing full-series means (the
    acf_lag_int convention, x̃ = n·x − S clearing every fraction)
    leaves the signed "extra purchases per extra click, k hours later".
    One bounded exchange; |lags| dot products on two calendar-bounded
    vectors.  Mirror: dense grid + hr-join + lead() windows +
    sign-split division."""
    import ray.data

    from documentai_ray.stages.windows import leadlag_beta_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return leadlag_beta_int(ev, x_type="click", y_type="purchase",
                            lags=(0, 1, 2, 3))


def _q_km_survival(sf_dir: str):
    """Kaplan–Meier user-survival curve (``windows.km_survival_int``):
    the survival-analysis question the engagement family doesn't ask —
    retention_cohorts counts who returns in week k, but "what fraction
    is still alive at day d" needs CENSORING: users still active near
    the horizon haven't died, and counting them dead or immortal
    biases the curve.  Lifetime = whole days first→last event; death
    observed iff the user went quiet ≥ 7 days before corpus max;
    30-day window, per-step trunc-ppm product fold (the markov_kstep
    discipline; deaths past day 29 invisible — the haar truncation
    analogue).  The gap is HOUR-granular (6 h): the synthetic month
    keeps every user active into the final days, so a day-scale gap
    observes zero deaths and the fold never exercises.  ONE user
    exchange + a ≤ 2·horizon histogram.  Mirror: 30 generated CTEs
    applying the identical fold."""
    import ray.data

    from documentai_ray.stages.windows import km_survival_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return km_survival_int(ev, horizon_days=30, censor_gap_hours=6)


def _q_mrr_eval(sf_dir: str):
    """Reciprocal-rank evaluation of the bm25_topk ranking against
    AND-relevance (doc contains EVERY query term) — the rank-POSITION
    metric the eval family lacks: rank_auc scores pairwise order,
    lang_prf set overlap, cohens_kappa agreement; none says "how far
    down is the first right answer".  rr_ppm = 10⁶ // first relevant
    rank (0 when none lands in the top-k); MRR is the mean of the
    column.  The candidate set is ≤ |queries|·k rows, so relevance
    needs one pruned corpus scan filtered to candidate ids (the
    index-free fetch) — nothing else materializes.  Mirror: the bm25
    CTE chain + per-(q,doc) matched-term counts vs |q|."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from documentai_ray.stages.indexing import bm25_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    top = bm25_topk(ds, queries=_BM25_QUERIES, k=5)
    cand = set(int(d) for d in top["doc_id"])

    def pick(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column("doc_id"),
                     value_set=pa.array(sorted(cand), pa.int64()))
        return batch.filter(m)

    toksets = {}
    for row in (ds.map_batches(pick, batch_format="pyarrow")
                .take_all()):
        toksets[int(row["doc_id"])] = set((row["text"] or "").split(" "))

    recs = []
    for qid, terms in sorted(_BM25_QUERIES.items()):
        need = set(terms)
        rows = top[top["query_id"] == qid].sort_values("rank")
        rel = [int(r) for r, d in zip(rows["rank"], rows["doc_id"])
               if need <= toksets[int(d)]]
        first = min(rel) if rel else 0
        recs.append((qid, len(rel), first,
                     1_000_000 // first if first else 0))
    out = pd.DataFrame(recs, columns=["query_id", "n_rel",
                                      "first_rank", "rr_ppm"])
    for c in ("n_rel", "first_rank", "rr_ppm"):
        out[c] = out[c].astype("int64")
    return out


def _q_decayed_leaderboard(sf_dir: str):
    """Freshness-weighted top-10 users (``windows.decayed_sum_topk``):
    Σ 10⁶ // 2^age_days per user — the leaderboard a plain count gets
    wrong (a user active yesterday outranks one with twice the events
    three weeks ago).  The half-life is DYADIC so every weight is an
    exact shift (e^{−λt} is irrational; the ewma_backtest discipline);
    weights vanish past day 19 (10⁶ < 2²⁰).  Vectorized shift +
    per-batch pre-combine, ONE user-bounded exchange, partial top-k.
    Mirror: SUM(1000000 // (1 << age)) + row_number."""
    import ray.data

    from documentai_ray.stages.windows import decayed_sum_topk

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return decayed_sum_topk(ev, key_col="user_id", k=10)


def _q_degree_assortativity(sf_dir: str):
    """Degree assortativity of the irregular link graph as Kendall
    concordance over edge endpoints (in-deg(src) vs in-deg(dst)) — the
    MIXING question the rest of the graph family doesn't ask:
    pagerank scores importance, clustering_coeff local closure,
    kcore peeling depth; this asks whether well-linked pages link TO
    well-linked pages (assortative, tau > 0) or to obscure ones
    (disassortative) — the hub-wiring signature.  tau_a with the full
    tie decomposition rides ``grouped_kendall_int``'s joint-histogram
    plan (in-degrees have a tiny domain — Poisson-ish around 2 — so
    pair counts are cell products, never edge² comparisons).  In-deg
    table from ONE dst-bounded exchange, stitched to edges by two
    partitioned hash_joins (deg 0 for never-cited sources).  Mirror:
    UNION edge generator + histogram self-join."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.aggregates import grouped_kendall_int
    from documentai_ray.stages.joins import hash_join

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        src, dst = [ids], [(ids * 7 + 1) % n]
        m1 = ids % 3 >= 1
        src.append(ids[m1]); dst.append((ids[m1] * 13 + 2) % n)
        m2 = ids % 3 == 2
        src.append(ids[m2]); dst.append((ids[m2] * 31 + 3) % n)
        return pa.table({
            "src": pa.array(np.concatenate(src).astype("int64")),
            "dst": pa.array(np.concatenate(dst).astype("int64"))})

    e = docs.map_batches(edges, batch_format="pyarrow")
    from ray.data.aggregate import Count

    ind = (e.groupby("dst").aggregate(Count(alias_name="deg")))

    def as_src(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("dst"),
                         "deg_src": batch.column("deg").cast(pa.int64())})

    def as_dst(batch: pa.Table) -> pa.Table:
        return pa.table({"dst": batch.column("dst"),
                         "deg_dst": batch.column("deg").cast(pa.int64())})

    j1 = hash_join(e, ind.map_batches(as_src, batch_format="pyarrow"),
                   on="src", how="left")
    j2 = hash_join(j1, ind.map_batches(as_dst, batch_format="pyarrow"),
                   on="dst", how="left")

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        x = pc.fill_null(batch.column("deg_src"), 0)
        y = pc.fill_null(batch.column("deg_dst"), 0)
        return pa.table({"g": pa.array(["all"] * len(batch)),
                         "x": x.cast(pa.int64()), "y": y.cast(pa.int64())})

    return grouped_kendall_int(
        j2.map_batches(prep, batch_format="pyarrow"),
        key_col="g", x_col="x", y_col="y")


def _q_ndcg_eval(sf_dir: str):
    """nDCG@5 of the bm25_topk ranking under AND-relevance — the
    FULL-LIST companion to mrr_eval's first-hit position: MRR is blind
    to everything after the first relevant result; nDCG credits every
    relevant doc, discounted by depth.  The discount is the RATIONAL
    harmonic 10⁶ // (1 + rank) (log₂ discounts are irrational — same
    reasoning as bm25's idf), so dcg, the ideal idcg (all R relevant
    docs packed at the top, R from one corpus-bounded count), and
    ndcg_ppm = 10⁶·dcg // idcg are exact integers.  Costs the bm25
    chain + one pruned AND-count scan.  Mirror: shared _SQL_BM25_CORE
    + generate_series ideal fold."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.indexing import bm25_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    top = bm25_topk(ds, queries=_BM25_QUERIES, k=5)
    qlist = sorted(_BM25_QUERIES.items())

    def rel_partial(batch: pa.Table) -> pa.Table:
        texts = batch.select(["text"]).to_pandas()["text"].fillna("")
        sets = [set(t.split(" ")) for t in texts]
        ids = batch.column("doc_id").to_numpy()
        qs, ds_, fl = [], [], []
        for qid, terms in qlist:
            need = set(terms)
            for i, s in enumerate(sets):
                if need <= s:
                    qs.append(qid)
                    ds_.append(int(ids[i]))
                    fl.append(1)
        return pa.table({"query_id": pa.array(qs, pa.string()),
                         "doc_id": pa.array(ds_, pa.int64()),
                         "_one": pa.array(fl, pa.int64())})

    rel = (ds.map_batches(rel_partial, batch_format="pyarrow")
           .groupby("query_id")
           .aggregate(Sum("_one", alias_name="n_rel_total"))).to_pandas()
    n_rel = dict(zip(rel["query_id"], rel["n_rel_total"].astype(int)))
    # relevance FLAGS only for the ≤ |queries|·k candidates (the total
    # count above is the only corpus-wide fact; materializing all
    # relevant pairs would scale with the corpus)
    cand = set(int(d) for d in top["doc_id"])

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = pc.is_in(batch.column("doc_id"),
                     value_set=pa.array(sorted(cand), pa.int64()))
        return batch.filter(m)

    rel_pairs = set()
    for row in (ds.map_batches(pick, batch_format="pyarrow")
                .map_batches(rel_partial, batch_format="pyarrow")
                .take_all()):
        rel_pairs.add((row["query_id"], int(row["doc_id"])))

    recs = []
    for qid, _terms in qlist:
        rows = top[top["query_id"] == qid]
        dcg = sum(1_000_000 // (1 + int(r))
                  for r, d in zip(rows["rank"], rows["doc_id"])
                  if (qid, int(d)) in rel_pairs)
        r_tot = n_rel.get(qid, 0)
        idcg = sum(1_000_000 // (1 + s)
                   for s in range(1, min(r_tot, 5) + 1))
        recs.append((qid, r_tot, dcg, idcg,
                     1_000_000 * dcg // idcg if idcg else 0))
    out = pd.DataFrame(recs, columns=["query_id", "n_rel_total",
                                      "dcg_ppm", "idcg_ppm", "ndcg_ppm"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def _q_seasonal_anomaly(sf_dir: str):
    """Hour-of-day-conditioned spikes (``windows.seasonal_anomaly_int``)
    — the SEASONAL complement to events_anomaly's global 3σ: a 3 a.m.
    burst sits inside the global band (nights are quiet; daytime drags
    the mean up) while being ten sigma against other 3 a.m. hours.
    Each hour competes only with its own hod peer group; the test is
    the same cross-multiplied integer inequality
    (m_h·x − S_h)² > 9·(m_h·Q_h − S_h²), conditioned.  Emits only the
    bounded alert set.  One (hour, key) exchange.  Mirror: dense grid
    + extract(hour) peer sums + the identical inequality."""
    import ray.data

    from documentai_ray.stages.windows import seasonal_anomaly_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return seasonal_anomaly_int(ev)


def _q_did_estimator(sf_dir: str):
    """Difference-in-differences over purchase spend: treatment = the
    Knuth-hash coin (split_assign's convention — deterministic,
    parallelism-independent, SQL-reproducible where RNG isn't), period
    split at the integer midpoint of purchase timestamps, outcome =
    value cents.  Cell means are TRUNC MILLI-CENTS (1000·Σc // n, one
    floor per cell — the defined contract; clearing the 4-cell
    difference to a single fraction needs the n₁₁n₁₀n₀₁n₀₀ product,
    which overflows for nothing gained), did_mc = (m₁₁−m₁₀)−(m₀₁−m₀₀).
    ONE exchange bounded by 4·P partial cells.  Mirror: identical
    CASE-pivoted fold."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = batch.filter(pc.equal(batch.column("event_type"), "purchase"))
        ids = b.column("user_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        c = np.rint(b.column("value").to_numpy() * 100).astype("int64")
        return pa.table({
            "treat": pa.array(h < np.uint64(1 << 31)),
            "t_us": t, "cents": pa.array(c, pa.int64())})

    p = ev.map_batches(prep, batch_format="pyarrow")
    t_min, t_max = int(p.min("t_us")), int(p.max("t_us"))
    mid = (t_min + t_max) // 2

    def cell(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "treat": batch.column("treat"),
            "post": pc.greater_equal(batch.column("t_us"),
                                     pa.scalar(mid, pa.int64())),
            "cents": batch.column("cents")})

    g = (p.map_batches(cell, batch_format="pyarrow")
         .groupby(["treat", "post"])
         .aggregate(Sum("cents", alias_name="s"),
                    Count(alias_name="n"))).to_pandas()
    if len(g) != 4:
        raise ValueError(f"did_estimator: expected 4 cells, got {len(g)}")
    cells = {(bool(t), bool(po)): (int(s), int(n))
             for t, po, s, n in zip(g["treat"], g["post"], g["s"], g["n"])}
    mm = {k: 1000 * s // n for k, (s, n) in cells.items()}
    did = ((mm[(True, True)] - mm[(True, False)])
           - (mm[(False, True)] - mm[(False, False)]))
    out = pd.DataFrame([{
        "n_ctrl_pre": cells[(False, False)][1],
        "n_ctrl_post": cells[(False, True)][1],
        "n_treat_pre": cells[(True, False)][1],
        "n_treat_post": cells[(True, True)][1],
        "m_ctrl_pre_mc": mm[(False, False)],
        "m_ctrl_post_mc": mm[(False, True)],
        "m_treat_pre_mc": mm[(True, False)],
        "m_treat_post_mc": mm[(True, True)],
        "did_mc": did}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_laspeyres_index(sf_dir: str):
    """Laspeyres price index across the shipdate midpoint — the
    index-number family none of the 290 queries touch: what the BASE
    period's basket costs at CURRENT prices, over parts traded in both
    periods.  Per part, base value v₀ = Σprice_c (exact: p̄₀·q₀ is the
    sum itself) and repriced value v₁ = s₁·q₀ // q₁ (current unit
    price × base quantity, ONE floor per part — the defined contract);
    index_ppm = 10⁶·Σv₁ // Σv₀.  (partkey, period) sums cross ONE
    exchange bounded by parts×2; the part-level pivot co-locates via
    the bucketed-pkey pattern; only per-partition (n, Σv₀, Σv₁)
    partials reach the driver.  Mirror: period self-join + identical
    HUGEINT per-part floor."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.dedup import _add_pkey

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity",
                 "l_extendedprice"])

    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        d = (batch.column("l_shipdate").cast(pa.timestamp("us"))
             .cast(pa.int64()).to_numpy() // day_us)
        q = batch.column("l_quantity").to_numpy().astype("int64")
        c = np.rint(batch.column("l_extendedprice").to_numpy()
                    * 100).astype("int64")
        return pa.table({"partkey": batch.column("l_partkey"),
                         "dd": pa.array(d, pa.int64()),
                         "q": pa.array(q, pa.int64()),
                         "pc": pa.array(c, pa.int64())})

    d = li.map_batches(prep, batch_format="pyarrow")
    d_min, d_max = int(d.min("dd")), int(d.max("dd"))
    mid = (d_min + d_max) // 2

    def cell(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_
        return pa.table({
            "partkey": batch.column("partkey"),
            "post": pc_.greater_equal(batch.column("dd"),
                                      pa.scalar(mid, pa.int64())),
            "q": batch.column("q"), "pc": batch.column("pc")})

    g = (d.map_batches(cell, batch_format="pyarrow")
         .groupby(["partkey", "post"])
         .aggregate(Sum("q", alias_name="q"),
                    Sum("pc", alias_name="s")))

    def pivot(gdf: pd.DataFrame) -> pd.DataFrame:
        pre = gdf[~gdf["post"]].set_index("partkey")
        post = gdf[gdf["post"]].set_index("partkey")
        common = pre.index.intersection(post.index)
        if len(common) == 0:
            return pd.DataFrame({"n": pd.array([0], dtype="int64"),
                                 "v0": pd.array([0], dtype="int64"),
                                 "v1": pd.array([0], dtype="int64")})
        q0 = pre.loc[common, "q"].astype(object)
        s0 = pre.loc[common, "s"].astype(object)
        q1 = post.loc[common, "q"].astype(object)
        s1 = post.loc[common, "s"].astype(object)
        v1 = int(sum(int(a) * int(b) // int(cq)
                     for a, b, cq in zip(s1, q0, q1)))
        return pd.DataFrame({"n": pd.array([len(common)], dtype="int64"),
                             "v0": pd.array([int(s0.sum())], dtype="int64"),
                             "v1": pd.array([v1], dtype="int64")})

    parts = (_add_pkey(g, "partkey", 32)
             .groupby("_pkey")
             .map_groups(lambda x: pivot(x.drop(columns=["_pkey"])),
                         batch_format="pandas"))
    tot = parts.aggregate(Sum("n", alias_name="n"),
                          Sum("v0", alias_name="v0"),
                          Sum("v1", alias_name="v1"))
    n, v0, v1 = int(tot["n"]), int(tot["v0"]), int(tot["v1"])
    if v0 == 0:
        raise ValueError("laspeyres_index: empty base period")
    out = pd.DataFrame([{
        "n_parts": n, "base_value_cents": v0,
        "repriced_value_cents": v1,
        "laspeyres_ppm": 1_000_000 * v1 // v0}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_ab_conversion(sf_dir: str):
    """2×2 A/B experiment readout with an EXACT significance flag —
    the hypothesis-test step did_estimator's point estimate and
    chi2_independence's grid audit both stop short of: arms from the
    Knuth-hash coin, conversion = user has a high-value purchase
    (≥ 150 — funnel_conversion's cutoff, keeping the rate off the
    boundary), and the χ² test cross-multiplied so NO float ever
    decides: significant ⟺ 10⁶·N·(ad−bc)² > 3841459·n₁·n₀·(a+c)·(b+d)
    (χ²₍₀.₀₅,1₎ = 3.841459 as the exact rational contract constant;
    chi2_milli reported with one floor).  Per-user conversion folds
    through ONE user exchange; cells are a 4-row aggregate.
    Mirror: identical HUGEINT inequality."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Max

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Max("conv", alias_name="conv"))).to_pandas()
    ids = per_user["user_id"].to_numpy()
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    treat = h < np.uint64(1 << 31)
    conv = per_user["conv"].to_numpy() > 0
    a = int((treat & conv).sum())        # converted treated
    b = int((treat & ~conv).sum())
    c = int((~treat & conv).sum())
    d = int((~treat & ~conv).sum())
    n1, n0 = a + b, c + d
    det = a * d - b * c
    den = n1 * n0 * (a + c) * (b + d)
    chi2_milli = 1000 * (n1 + n0) * det * det // den if den else 0
    sig = (1_000_000 * (n1 + n0) * det * det > 3_841_459 * den
           if den else False)
    out = pd.DataFrame([{
        "n_treat": n1, "n_ctrl": n0, "conv_treat": a, "conv_ctrl": c,
        "rate_treat_ppm": 1_000_000 * a // n1,
        "rate_ctrl_ppm": 1_000_000 * c // n0,
        "uplift_ppm": 1_000_000 * a // n1 - 1_000_000 * c // n0,
        "chi2_milli": chi2_milli, "significant": sig}])
    for col in out.columns[:-1]:
        out[col] = out[col].astype("int64")
    out["significant"] = out["significant"].astype(bool)
    return out


def _q_assoc_rules(sf_dir: str):
    """Directional association rules from the co-purchase relation —
    the RULE step copurchase_pairs' symmetric support stops short of:
    support says dup-bought-together; only confidence says WHICH WAY
    to recommend (conf(a→b) = P(b|a) differs from conf(b→a) exactly
    when the items' popularities differ), and lift vs the consequent's
    base rate separates genuine affinity from 'b is just popular'.
    conf_ppm = 10⁶·supp(ab) // supp(a); lift_ppm = 10⁶·supp(ab)·B //
    (supp(a)·supp(b)) with B = distinct baskets — each ONE floor.
    Pair supports ride ``cooccurrence_pairs``' bounded plan; item
    supports are one item-bounded exchange stitched to BOTH rule
    directions by two partitioned hash_joins (never an item-table
    broadcast).  Mirror: distinct-pair self-join + the same floors."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count

    from documentai_ray.stages.graph import cooccurrence_pairs
    from documentai_ray.stages.joins import hash_join

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])

    def dedup(batch: pa.Table) -> pa.Table:
        import pandas as pd
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False) \
                       .replace_schema_metadata(None)

    # the distinct (basket, item) relation feeds pair supports, item
    # supports AND the basket count — materialize it ONCE (bounded
    # projection, never payloads) instead of re-running the scan+
    # distinct lineage three times
    dist = (ds.map_batches(dedup, batch_format="pyarrow")
            .groupby(["l_orderkey", "l_partkey"])
            .aggregate(Count(alias_name="_c"))
            .drop_columns(["_c"])).materialize()
    pairs = cooccurrence_pairs(dist, basket_col="l_orderkey",
                               item_col="l_partkey", min_support=2,
                               num_partitions=32)
    supp = (dist.groupby("l_partkey")
            .aggregate(Count(alias_name="supp")))
    n_baskets = (dist.groupby("l_orderkey")
                 .aggregate(Count(alias_name="_n"))).count()

    def both_dirs(batch: pa.Table) -> pa.Table:
        import numpy as np
        a = batch.column("item_a").to_numpy()
        b = batch.column("item_b").to_numpy()
        n = batch.column("n").to_numpy()
        return pa.table({
            "antecedent": pa.array(np.concatenate([a, b]), pa.int64()),
            "consequent": pa.array(np.concatenate([b, a]), pa.int64()),
            "supp_ab": pa.array(np.concatenate([n, n]).astype("int64"),
                                pa.int64())})

    rules = pairs.map_batches(both_dirs, batch_format="pyarrow")

    def s_ante(batch: pa.Table) -> pa.Table:
        return pa.table({"antecedent": batch.column("l_partkey"),
                         "supp_a": batch.column("supp").cast(pa.int64())})

    def s_cons(batch: pa.Table) -> pa.Table:
        return pa.table({"consequent": batch.column("l_partkey"),
                         "supp_b": batch.column("supp").cast(pa.int64())})

    j = hash_join(rules, supp.map_batches(s_ante, batch_format="pyarrow"),
                  on="antecedent")
    j = hash_join(j, supp.map_batches(s_cons, batch_format="pyarrow"),
                  on="consequent")

    def score(batch: pa.Table) -> pa.Table:
        sab = batch.column("supp_ab").to_numpy()
        sa = batch.column("supp_a").to_numpy()
        sb = batch.column("supp_b").to_numpy()
        conf = 1_000_000 * sab // sa
        lift = 1_000_000 * sab * n_baskets // (sa * sb)
        return pa.table({
            "antecedent": batch.column("antecedent"),
            "consequent": batch.column("consequent"),
            "supp_ab": batch.column("supp_ab"),
            "supp_a": batch.column("supp_a"),
            "conf_ppm": pa.array(conf.astype("int64"), pa.int64()),
            "lift_ppm": pa.array(lift.astype("int64"), pa.int64())})

    return j.map_batches(score, batch_format="pyarrow")


def _q_logrank_test(sf_dir: str):
    """Log-rank test between Knuth-coin survival arms
    (``windows.logrank_test_int``) — the A/B of survival:
    ab_conversion compares end-state rates and km_survival draws one
    pooled curve, but "does the treatment arm die SLOWER" needs the
    whole time axis under censoring (two arms with identical death
    totals differ if one front-loads its deaths — invisible to a rate
    test).  Per-day trunc-ppm hypergeometric terms (one floor per day;
    clearing across days needs Πn_d), O₁ exact, cross-multiplied χ²
    significance.  A PLAIN SUM over days — no generated CTEs needed.
    One user exchange + a ≤ 4·horizon histogram."""
    import ray.data

    from documentai_ray.stages.windows import logrank_test_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return logrank_test_int(ev, horizon_days=30, censor_gap_hours=6)


def _q_uplift_deciles(sf_dir: str):
    """Heterogeneous-treatment readout: conversion uplift per ACTIVITY
    decile — ab_conversion's single number hides who responds (heavy
    users may convert regardless; the uplift lives in the middle
    deciles), which is the question targeting budgets hang on.  Users
    rank by (event count desc, user_id) through
    ``aggregates.global_row_index`` (the rfm_segments discipline:
    row_number is tie-deterministic where ntile isn't; the count
    domain is bounded so the rank never global-sorts), decile =
    1 + 10·rank // n; per decile the Knuth arms' conversion rates and
    uplift in exact ppm.  One user exchange + one bounded-histogram
    rank pass + a 10×4 fold.  Mirror: row_number + identical floors."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max

    from documentai_ray.stages.aggregates import global_row_index

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Count(alias_name="n_ev"),
                           Max("conv", alias_name="conv")))
    n_users = per_user.count()

    def neg(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "neg_n", pa.array((-batch.column("n_ev").to_numpy())
                              .astype("int64"), pa.int64()))

    ranked = global_row_index(
        per_user.map_batches(neg, batch_format="pyarrow"),
        val_col="neg_n", tiebreak_col="user_id", out_col="_ri")

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        treat = h < np.uint64(1 << 31)
        dec = 1 + 10 * batch.column("_ri").to_numpy() // n_users
        conv = batch.column("conv").to_numpy() > 0
        df = pd.DataFrame({"decile": dec.astype("int64"),
                           "t": treat, "c": conv})
        g = df.groupby(["decile", "t"], as_index=False).agg(
            n=("c", "size"), conv=("c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    g = (ranked.map_batches(cells, batch_format="pyarrow")
         .groupby(["decile", "t"])
         .aggregate(Sum("n", alias_name="n"),
                    Sum("conv", alias_name="conv"))).to_pandas()
    recs = []
    for d in sorted(g["decile"].unique()):
        gt = g[(g["decile"] == d) & g["t"]]
        gc = g[(g["decile"] == d) & ~g["t"]]
        nt = int(gt["n"].sum())
        nc = int(gc["n"].sum())
        ct = int(gt["conv"].sum())
        cc = int(gc["conv"].sum())
        rt = 1_000_000 * ct // nt if nt else 0
        rc = 1_000_000 * cc // nc if nc else 0
        recs.append((int(d), nt, ct, nc, cc, rt, rc, rt - rc))
    out = pd.DataFrame(recs, columns=[
        "decile", "n_treat", "conv_treat", "n_ctrl", "conv_ctrl",
        "rate_treat_ppm", "rate_ctrl_ppm", "uplift_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_paasche_index(sf_dir: str):
    """Paasche price index — Laspeyres' mirror twin (CURRENT basket at
    base prices in the denominator): Laspeyres asks what the OLD
    basket costs now and overstates inflation when buyers substitute
    away from items whose price rose; Paasche reprices the NEW basket
    and understates it — the gap between the two IS the substitution
    effect, which is why index shops publish both.  Numerator Σs₁ is
    EXACT (no division); denominator floors once per part
    (s₀·q₁ // q₀ under HUGEINT).  Same bounded plan as
    laspeyres_index.  Mirror: period self-join with the mirrored
    floor."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.dedup import _add_pkey

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity",
                 "l_extendedprice"])
    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        d = (batch.column("l_shipdate").cast(pa.timestamp("us"))
             .cast(pa.int64()).to_numpy() // day_us)
        q = batch.column("l_quantity").to_numpy().astype("int64")
        c = np.rint(batch.column("l_extendedprice").to_numpy()
                    * 100).astype("int64")
        return pa.table({"partkey": batch.column("l_partkey"),
                         "dd": pa.array(d, pa.int64()),
                         "q": pa.array(q, pa.int64()),
                         "pc": pa.array(c, pa.int64())})

    d = li.map_batches(prep, batch_format="pyarrow")
    d_min, d_max = int(d.min("dd")), int(d.max("dd"))
    mid = (d_min + d_max) // 2

    def cell(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_
        return pa.table({
            "partkey": batch.column("partkey"),
            "post": pc_.greater_equal(batch.column("dd"),
                                      pa.scalar(mid, pa.int64())),
            "q": batch.column("q"), "pc": batch.column("pc")})

    g = (d.map_batches(cell, batch_format="pyarrow")
         .groupby(["partkey", "post"])
         .aggregate(Sum("q", alias_name="q"),
                    Sum("pc", alias_name="s")))

    def pivot(gdf: pd.DataFrame) -> pd.DataFrame:
        pre = gdf[~gdf["post"]].set_index("partkey")
        post = gdf[gdf["post"]].set_index("partkey")
        common = pre.index.intersection(post.index)
        if len(common) == 0:
            return pd.DataFrame({"n": pd.array([0], dtype="int64"),
                                 "v1": pd.array([0], dtype="int64"),
                                 "v0": pd.array([0], dtype="int64")})
        q0 = pre.loc[common, "q"].astype(object)
        s0 = pre.loc[common, "s"].astype(object)
        q1 = post.loc[common, "q"].astype(object)
        s1 = post.loc[common, "s"].astype(object)
        v0 = int(sum(int(a) * int(b) // int(cq)
                     for a, b, cq in zip(s0, q1, q0)))
        return pd.DataFrame({"n": pd.array([len(common)], dtype="int64"),
                             "v1": pd.array([int(s1.sum())],
                                            dtype="int64"),
                             "v0": pd.array([v0], dtype="int64")})

    parts = (_add_pkey(g, "partkey", 32)
             .groupby("_pkey")
             .map_groups(lambda x: pivot(x.drop(columns=["_pkey"])),
                         batch_format="pandas"))
    tot = parts.aggregate(Sum("n", alias_name="n"),
                          Sum("v0", alias_name="v0"),
                          Sum("v1", alias_name="v1"))
    n, v0, v1 = int(tot["n"]), int(tot["v0"]), int(tot["v1"])
    if v0 == 0:
        raise ValueError("paasche_index: empty repriced base")
    out = pd.DataFrame([{
        "n_parts": n, "current_value_cents": v1,
        "repriced_base_cents": v0,
        "paasche_ppm": 1_000_000 * v1 // v0}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


_FD_CANDIDATES = [
    ("o_orderkey", "o_orderstatus"),      # key → anything: holds
    ("o_custkey", "o_orderstatus"),       # fails where a customer mixes
    ("o_custkey", "o_orderpriority"),
    ("o_orderstatus", "o_orderpriority"),
    ("o_orderpriority", "o_orderstatus"),
]


def _q_fd_mine(sf_dir: str):
    """Functional-dependency DISCOVERY over a candidate list — the
    mining side of fd_error's single-FD check (profiling asks "which
    dependencies hold?" before anyone can assert one): for each
    candidate A→B, violations = |distinct(A,B)| − |distinct(A)| (zero
    ⟺ every A value maps to one B), with the key column as the planted
    true positive.  ONE pass emits per-batch distinct (pair, a, b)
    projections; two bounded exchanges (distinct pairs, then per-pair
    lhs counts); the per-pair fold is a ≤|candidates| driver frame.
    Mirror: generated UNION of distinct-count subqueries."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count

    cols = sorted({c for p in _FD_CANDIDATES for c in p})
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)

    def explode(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        outs = []
        for i, (a, b) in enumerate(_FD_CANDIDATES):
            d = df[[a, b]].drop_duplicates()
            outs.append(pd.DataFrame({
                "_pair": i,
                "_a": d[a].astype(str), "_b": d[b].astype(str)}))
        out = pd.concat(outs, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    per_lhs = (ds.map_batches(explode, batch_format="pyarrow")
               .groupby(["_pair", "_a", "_b"])
               .aggregate(Count(alias_name="_c"))
               .groupby(["_pair", "_a"])
               .aggregate(Count(alias_name="n_b")))

    def fold(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("_pair").agg(
            n_lhs=("_a", "size"), n_pairs=("n_b", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    tot = (per_lhs.map_batches(fold, batch_format="pyarrow")
           .groupby("_pair")
           .aggregate(Sum("n_lhs", alias_name="n_lhs"),
                      Sum("n_pairs", alias_name="n_pairs"))).to_pandas()
    tot = tot.sort_values("_pair")
    recs = []
    for _p, nl, np_ in zip(tot["_pair"], tot["n_lhs"], tot["n_pairs"]):
        a, b = _FD_CANDIDATES[int(_p)]
        recs.append((a, b, int(nl), int(np_), int(np_ - nl),
                     bool(np_ == nl)))
    out = pd.DataFrame(recs, columns=["lhs", "rhs", "n_lhs", "n_pairs",
                                      "violations", "holds"])
    for c in ("n_lhs", "n_pairs", "violations"):
        out[c] = out[c].astype("int64")
    out["holds"] = out["holds"].astype(bool)
    return out


def _q_bounce_rate(sf_dir: str):
    """Bounce rate by landing event type
    (``windows.bounce_rate_int``) — the landing-quality readout
    events_sessions' per-user counts can't give: a session opening
    with an error bounces for a different reason than one opening with
    a view, and fixing the wrong one wastes the sprint.  Standard
    bucketed sessionize (30-min strict gap, event_id tiebreak making
    "first of session" well-defined under simultaneous events), per-
    partition (landing, n, bounced) partials, |types|-bounded final
    exchange.  Mirror: lag-window session ids + first_value."""
    import ray.data

    from documentai_ray.stages.windows import bounce_rate_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"])
    return bounce_rate_int(ev, gap_minutes=30)


def _q_rank_overlap(sf_dir: str):
    """Ranking-STABILITY audit: how much do the top-20 token lists of
    two Knuth-split corpus halves agree — the reproducibility question
    behind every 'top terms' dashboard (if two random halves disagree,
    the list is noise, not signal), which per-item drift tests
    (tvd/ks) can't answer because rank lists weight the TOP.  Depth-
    weighted agreement is RBO with the persistence DYADIC (p = 1/2, the
    decayed_leaderboard discipline): rbo_ppm = Σ_{d=1..20}
    10⁶·overlap@d // (d·2^d), one floor per depth (identical lists
    score 999980, not 10⁶ — the truncation residue, documented);
    jaccard@20 rides along as the unweighted check.  Token counts per
    half cross ONE vocab-bounded exchange; the 20-row lists rank
    driver-side with the (count desc, token) tiebreak.  Mirror:
    FILTER-split counts + row_number + a depth grid join."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = batch.column("doc_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        half = (h < np.uint64(1 << 31))
        texts = batch.select(["text"]).to_pandas()["text"].fillna("")
        toks = texts.str.split(" ")
        lens = toks.str.len().astype("int64").to_numpy()
        flat = np.fromiter((t for lst in toks for t in lst),
                           dtype=object, count=int(lens.sum()))
        hrep = np.repeat(half, lens)
        df = pd.DataFrame({"token": flat, "_h": hrep})
        g = df.groupby(["token", "_h"], as_index=False).size()
        g["size"] = g["size"].astype("int64")
        return pa.Table.from_pandas(
            g.rename(columns={"size": "_n"}),
            preserve_index=False).replace_schema_metadata(None)

    g = (ds.map_batches(counts, batch_format="pyarrow")
         .groupby(["token", "_h"])
         .aggregate(Sum("_n", alias_name="n"))).to_pandas()

    def top20(half: bool) -> list[str]:
        sub = g[g["_h"] == half].sort_values(
            ["n", "token"], ascending=[False, True], kind="mergesort")
        return list(sub["token"].head(20))

    a, b = top20(True), top20(False)
    sa, sb = set(a), set(b)
    rbo = 0
    for d in range(1, 21):
        ov = len(set(a[:d]) & set(b[:d]))
        rbo += 1_000_000 * ov // (d * (1 << d))
    out = pd.DataFrame([{
        "k": 20,
        "overlap_at_5": len(set(a[:5]) & set(b[:5])),
        "overlap_at_20": len(sa & sb),
        "jaccard20_ppm": 1_000_000 * len(sa & sb) // len(sa | sb),
        "rbo_ppm": rbo}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_chain_index(sf_dir: str):
    """Chained Laspeyres across shipdate quarters — how real CPIs
    link: a fixed-base index drifts as the basket ages (laspeyres_index
    measures exactly once across one midpoint), so statistical offices
    re-base every period and MULTIPLY the links.  Quarter k vs k−1
    links on parts traded in both (v₀ = Σs_{k−1} exact, v₁ floors once
    per part — the laspeyres_index contract), then the chain is the
    sequential trunc-ppm product c_k = c_{k−1}·link_k // 10⁶ (the
    markov_kstep discipline).  One (part, quarter) exchange, bucketed
    per-part pivot, per-partition (k, n, v₀, v₁) partials, 3-row
    driver fold.  Mirror: VALUES-join links + 3 chained CTEs."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.dedup import _add_pkey

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity",
                 "l_extendedprice"])
    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        d = (batch.column("l_shipdate").cast(pa.timestamp("us"))
             .cast(pa.int64()).to_numpy() // day_us)
        q = batch.column("l_quantity").to_numpy().astype("int64")
        c = np.rint(batch.column("l_extendedprice").to_numpy()
                    * 100).astype("int64")
        return pa.table({"partkey": batch.column("l_partkey"),
                         "dd": pa.array(d, pa.int64()),
                         "q": pa.array(q, pa.int64()),
                         "pc": pa.array(c, pa.int64())})

    d = li.map_batches(prep, batch_format="pyarrow")
    d_min, d_max = int(d.min("dd")), int(d.max("dd"))
    span1 = d_max - d_min + 1

    def cell(batch: pa.Table) -> pa.Table:
        dd = batch.column("dd").to_numpy()
        qk = (dd - d_min) * 4 // span1
        return pa.table({"partkey": batch.column("partkey"),
                         "qk": pa.array(qk.astype("int64"), pa.int64()),
                         "q": batch.column("q"),
                         "pc": batch.column("pc")})

    g = (d.map_batches(cell, batch_format="pyarrow")
         .groupby(["partkey", "qk"])
         .aggregate(Sum("q", alias_name="q"),
                    Sum("pc", alias_name="s")))

    def links(gdf: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for k in (1, 2, 3):
            pre = gdf[gdf["qk"] == k - 1].set_index("partkey")
            post = gdf[gdf["qk"] == k].set_index("partkey")
            common = pre.index.intersection(post.index)
            v0 = int(pre.loc[common, "s"].astype(object).sum()) \
                if len(common) else 0
            v1 = int(sum(int(s1) * int(q0) // int(q1) for s1, q0, q1
                         in zip(post.loc[common, "s"],
                                pre.loc[common, "q"],
                                post.loc[common, "q"]))) \
                if len(common) else 0
            recs.append((k, len(common), v0, v1))
        out = pd.DataFrame(recs, columns=["k", "n", "v0", "v1"])
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    tot = (_add_pkey(g, "partkey", 32)
           .groupby("_pkey")
           .map_groups(lambda x: links(x.drop(columns=["_pkey"])),
                       batch_format="pandas")
           .groupby("k")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("v0", alias_name="v0"),
                      Sum("v1", alias_name="v1"))).to_pandas()
    tot = tot.sort_values("k")
    recs = []
    chain = 1_000_000
    for k, n, v0, v1 in zip(tot["k"], tot["n"], tot["v0"], tot["v1"]):
        if int(v0) == 0:
            raise ValueError(f"chain_index: empty base for link {k}")
        link = 1_000_000 * int(v1) // int(v0)
        chain = chain * link // 1_000_000
        recs.append((int(k), int(n), link, chain))
    out = pd.DataFrame(recs, columns=["link", "n_parts", "link_ppm",
                                      "chain_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_lorenz_deciles(sf_dir: str):
    """Lorenz curve of customer revenue by decile — the CURVE behind
    gini_orders' single number (two populations can share a Gini while
    concentrating in different tails; budget and fairness decisions
    read the curve, not the scalar).  Customers rank ASCENDING by
    whole-dollar revenue (the rfm_segments trick: the dollar domain is
    bounded so ``global_row_index``'s histogram broadcast stays small
    where raw cents wouldn't; custkey tiebreak), decile =
    1 + 10·rank // n; per decile the EXACT cent sum, share and
    cumulative share in ppm (floors on the 10-row driver frame only).
    One customer exchange + one bounded-histogram rank pass.
    Mirror: row_number over (dollars, custkey) + identical floors."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.aggregates import global_row_index

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("o_totalprice").to_numpy()
                    * 100).astype("int64")
        return pa.table({"custkey": batch.column("o_custkey"),
                         "cents": pa.array(c, pa.int64())})

    per_cust = (orders.map_batches(prep, batch_format="pyarrow")
                .groupby("custkey")
                .aggregate(Sum("cents", alias_name="cents")))
    n_cust = per_cust.count()

    def dollars(batch: pa.Table) -> pa.Table:
        d = batch.column("cents").to_numpy() // 100
        return batch.append_column(
            "rev_d", pa.array(d.astype("int64"), pa.int64()))

    ranked = global_row_index(
        per_cust.map_batches(dollars, batch_format="pyarrow"),
        val_col="rev_d", tiebreak_col="custkey", out_col="_ri")

    def bucket(batch: pa.Table) -> pa.Table:
        dec = 1 + 10 * batch.column("_ri").to_numpy() // n_cust
        return pa.table({"decile": pa.array(dec.astype("int64"),
                                            pa.int64()),
                         "cents": batch.column("cents")})

    g = (ranked.map_batches(bucket, batch_format="pyarrow")
         .groupby("decile")
         .aggregate(Sum("cents", alias_name="cents"))).to_pandas()
    g = g.sort_values("decile")
    total = int(g["cents"].astype(object).sum())
    recs, cum = [], 0
    for dec, c in zip(g["decile"], g["cents"]):
        cum += int(c)
        recs.append((int(dec), int(c), 1_000_000 * int(c) // total,
                     1_000_000 * cum // total))
    out = pd.DataFrame(recs, columns=["decile", "revenue_cents",
                                      "share_ppm", "cum_share_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_rmst_summary(sf_dir: str):
    """Survival summary scalars over the km_survival fold: RMST
    (restricted mean survival time — the AREA under the 30-day curve,
    in ppm·days: the 'average user-days alive per user' number a
    retention budget multiplies) and the median survival day (first
    day the curve drops below 500000 ppm; −1 = not reached inside the
    window — the standard censoring-honest answer, NOT a guess).
    Derived driver-side from the same one-exchange fold.  Mirror:
    the km_survival CTE chain wrapped in one aggregate."""
    import pandas as pd
    import ray.data

    from documentai_ray.stages.windows import km_survival_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    km = km_survival_int(ev, horizon_days=30, censor_gap_hours=6)
    rmst = int(km["s_ppm"].astype(object).sum())
    below = km[km["s_ppm"] < 500_000]
    med = int(below["day"].iloc[0]) if len(below) else -1
    out = pd.DataFrame([{
        "horizon_days": 30,
        "rmst_ppm_days": rmst,
        "median_day": med,
        "s_end_ppm": int(km["s_ppm"].iloc[-1])}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_q10_returns(sf_dir: str):
    """TPC-H-Q10-shaped returned-item report: revenue lost to 'R'
    returns per customer, top-20 — the 3-join + top-k reporting shape
    (filtered fact → orders → customer + broadcast nation) the
    relational suite (q1/q3/q5/q17) didn't yet exercise end-to-end
    with a grouped top-k on the joined result.  Revenue EXACT in
    cent·percent units: rev_c4 = Σ round(ep·100)·(100 − round(d·100))
    per line, summed per customer, ONE floor to cents at the end.
    Both fact joins are partitioned ``hash_join``s (the round-1
    verdict's no-orders-broadcast rule); nation is the 25-row closure.
    Top-20 via grouped_topk on a constant group.  Mirror: same units,
    same floor, row_number tiebreak."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq_
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.aggregates import grouped_topk
    from documentai_ray.stages.joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"])

    def l_prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        ep = np.rint(b.column("l_extendedprice").to_numpy()
                     * 100).astype("int64")
        dc = np.rint(b.column("l_discount").to_numpy()
                     * 100).astype("int64")
        return pa.table({"orderkey": b.column("l_orderkey"),
                         "rev_c4": pa.array(ep * (100 - dc), pa.int64())})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    def o_prep(batch: pa.Table) -> pa.Table:
        return pa.table({"orderkey": batch.column("o_orderkey"),
                         "custkey": batch.column("o_custkey")})

    j = hash_join(li.map_batches(l_prep, batch_format="pyarrow"),
                  orders.map_batches(o_prep, batch_format="pyarrow"),
                  on="orderkey")
    per_cust = (j.groupby("custkey")
                .aggregate(Sum("rev_c4", alias_name="rev_c4")))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"])

    def c_prep(batch: pa.Table) -> pa.Table:
        return pa.table({"custkey": batch.column("c_custkey"),
                         "c_name": batch.column("c_name"),
                         "nationkey": batch.column("c_nationkey")})

    j2 = hash_join(per_cust,
                   cust.map_batches(c_prep, batch_format="pyarrow"),
                   on="custkey")

    def const_key(batch: pa.Table) -> pa.Table:
        import numpy as np
        return batch.append_column(
            "_g", pa.array(np.zeros(len(batch), dtype="int64")))

    top = grouped_topk(j2.map_batches(const_key, batch_format="pyarrow"),
                       key_col="_g", sort_cols=["rev_c4", "custkey"],
                       ascending=[False, True], k=20).to_pandas()
    nat = pq_.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    top = top.merge(nat, left_on="nationkey", right_on="n_nationkey")
    top = top.sort_values(["rev_c4", "custkey"],
                          ascending=[False, True], kind="mergesort")
    top["revenue_cents"] = (top["rev_c4"].astype(object) // 100) \
        .astype("int64")
    top["rank"] = pd.array(range(1, len(top) + 1), dtype="int64")
    top["custkey"] = top["custkey"].astype("int64")
    return top[["rank", "custkey", "c_name", "n_name",
                "revenue_cents"]].reset_index(drop=True)


def _q_q8_market_share(sf_dir: str):
    """TPC-H-Q8-shaped market share: of all revenue that region-0
    CUSTOMERS spend, what fraction flows to SUPPLIERS of nation 1,
    per order-year — the 4-way join + ratio-within-group showcase
    (lineitem ⋈ supplier-nation ⋈ orders-year ⋈ customer-nation-region)
    where both fact joins are partitioned hash_joins and both dims are
    25-row closures.  Exact cent·percent units per line; the share
    floors ONCE per year on the ≤|years| driver frame:
    share_ppm = 10⁶·Σ_target // Σ_all.  Mirror: same joins, CASE'd
    numerator, HUGEINT."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq_
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.joins import hash_join

    nat = pq_.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg0_nations = set(
        nat.loc[nat["n_regionkey"] == 0, "n_nationkey"].astype(int))
    sup = pq_.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup_nation = dict(zip(sup["s_suppkey"].astype(int),
                          sup["s_nationkey"].astype(int)))
    cust_nation = None  # customer is fact-sized: joined, not broadcast

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def l_prep(batch: pa.Table) -> pa.Table:
        ep = np.rint(batch.column("l_extendedprice").to_numpy()
                     * 100).astype("int64")
        dc = np.rint(batch.column("l_discount").to_numpy()
                     * 100).astype("int64")
        sk = batch.column("l_suppkey").to_numpy()
        tgt = np.fromiter((sup_nation.get(int(s), -1) == 1 for s in sk),
                          dtype=bool, count=len(sk))
        return pa.table({"orderkey": batch.column("l_orderkey"),
                         "rev_c4": pa.array(ep * (100 - dc), pa.int64()),
                         "is_target": pa.array(tgt)})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        yr = pc.year(batch.column("o_orderdate")).cast(pa.int64())
        return pa.table({"orderkey": batch.column("o_orderkey"),
                         "custkey": batch.column("o_custkey"),
                         "o_year": yr})

    j = hash_join(li.map_batches(l_prep, batch_format="pyarrow"),
                  orders.map_batches(o_prep, batch_format="pyarrow"),
                  on="orderkey")

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"])

    def c_prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        nk = batch.column("c_nationkey").to_numpy()
        inr = np.fromiter((int(v) in reg0_nations for v in nk),
                          dtype=bool, count=len(nk))
        b = batch.filter(pa.array(inr))
        return pa.table({"custkey": b.column("c_custkey")})

    j2 = hash_join(j, cust.map_batches(c_prep, batch_format="pyarrow"),
                   on="custkey")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["o_year", "rev_c4", "is_target"]).to_pandas()
        df["tgt_c4"] = df["rev_c4"].where(df["is_target"], 0)
        g = df.groupby("o_year", as_index=False).agg(
            total_c4=("rev_c4", "sum"), target_c4=("tgt_c4", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    g = (j2.map_batches(partial, batch_format="pyarrow")
         .groupby("o_year")
         .aggregate(Sum("total_c4", alias_name="total_c4"),
                    Sum("target_c4", alias_name="target_c4"))).to_pandas()
    g = g.sort_values("o_year")
    out = pd.DataFrame({
        "o_year": g["o_year"].astype("int64"),
        "total_c4": g["total_c4"].astype("int64"),
        "target_c4": g["target_c4"].astype("int64"),
        "share_ppm": pd.array(
            [1_000_000 * int(t) // int(a)
             for t, a in zip(g["target_c4"], g["total_c4"])],
            dtype="int64")})
    return out.reset_index(drop=True)


def _q_pinball_eval(sf_dir: str):
    """Quantile (pinball) loss of the hour-of-day median predictor —
    the ASYMMETRIC loss the MAE backtests (backtest_mae /
    ewma_backtest / seasonal variants) can't express: a capacity
    planner who under-provisions pays 9× what over-provisioning costs,
    which is exactly the q = 0.9 pinball weighting; q = 0.5 rides
    along (pinball@0.5 ≡ MAE/2, the consistency anchor).  Predictor =
    per (type, hour-of-day) DOUBLED-UNIT median of the dense hourly
    counts (sum-of-middles, the repo's even-count convention);
    residual d = 2·x − m2 keeps everything integer, loss reported in
    d20 units (20× the real loss: ×2 doubling ×10 clearing q):
    pinball90_d20 = Σ(9·d if d ≥ 0 else −d), pinball50_d20 = Σ5·|d|.
    One bounded (hour, key) exchange; folds on the K×H matrix.
    Mirror: row_number middles + the identical piecewise sum."""
    import numpy as np
    import pandas as pd
    import ray.data

    from documentai_ray.stages.windows import _dense_hourly_matrix

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    keys, h, mat = _dense_hourly_matrix(
        ev, key_col="event_type", ts_col="ts", max_obs=8784)

    import pyarrow as pa
    import pyarrow.compute as pc

    def to_hour(batch: pa.Table) -> pa.Table:
        t = pc.floor_temporal(batch.column("ts"), unit="hour")
        return pa.table({"_h": t.cast(pa.timestamp("us")).cast(pa.int64())})

    h0 = int(ev.map_batches(to_hour, batch_format="pyarrow").min("_h"))
    hods = ((h0 // 3_600_000_000) + np.arange(h)) % 24
    recs = []
    for i, key in enumerate(keys):
        x = mat[i]
        p50 = 0
        p90 = 0
        for hd in range(24):
            sel = np.sort(x[hods == hd])
            m = len(sel)
            if m == 0:
                continue
            m2 = int(sel[(m - 1) // 2]) + int(sel[m // 2])
            d = 2 * sel.astype("int64") - m2
            p50 += int(5 * np.abs(d).sum())
            p90 += int(np.where(d >= 0, 9 * d, -d).sum())
        recs.append((key, h, p50, p90))
    out = pd.DataFrame(recs, columns=["event_type", "n_obs",
                                      "pinball50_d20", "pinball90_d20"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def _q_cohort_ltv(sf_dir: str):
    """Cohort LTV accumulation — the MONEY dimension
    retention_cohorts' distinct-user counts deliberately erase: users
    grouped by first-event week (the retention convention), purchase
    revenue per (cohort_week, week_offset) and its running total —
    the curve a payback-period decision reads ("cohort X recovers
    acquisition cost by week k").  One user-hash exchange co-locates
    each user's events; per partition a vectorized pass finds first
    weeks and purchase offsets for ALL users; only (cohort, offset,
    cents) partials cross the second tiny exchange; the cumulative
    fold runs on the ≤cohorts×offsets driver frame.  Mirror:
    min-week join + window cumsum."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.dedup import _add_pkey

    import pyarrow.compute as pc

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        wk = (batch.column("ts").cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy() // 604_800_000_000)
        c = np.rint(batch.column("value").to_numpy() * 100).astype("int64")
        is_p = pc.equal(batch.column("event_type"), "purchase").to_numpy(
            zero_copy_only=False)
        return pa.table({"user_id": batch.column("user_id"),
                         "wk": pa.array(wk.astype("int64"), pa.int64()),
                         "cents": pa.array(np.where(is_p, c, 0),
                                           pa.int64()),
                         "is_p": pa.array(is_p)})

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("user_id")["wk"].min().rename("cw")
        p = g[g["is_p"]].merge(first, left_on="user_id",
                               right_index=True)
        p["week_offset"] = p["wk"] - p["cw"]
        out = (p.groupby(["cw", "week_offset"], as_index=False)
               ["cents"].sum())
        out = out.rename(columns={"cw": "cohort_week",
                                  "cents": "revenue_cents"})
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    g = (_add_pkey(ev.map_batches(prep, batch_format="pyarrow"),
                   "user_id", 64)
         .groupby("_pkey")
         .map_groups(lambda x: partial(x.drop(columns=["_pkey"])),
                     batch_format="pandas")
         .groupby(["cohort_week", "week_offset"])
         .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
         ).to_pandas()
    g = g.sort_values(["cohort_week", "week_offset"])
    g["cum_revenue_cents"] = (g.groupby("cohort_week")["revenue_cents"]
                              .cumsum())
    for c in g.columns:
        g[c] = g[c].astype("int64")
    return g.reset_index(drop=True)


def _q_post_stratify(sf_dir: str):
    """Post-stratification weights — the survey-calibration step every
    sample-based dashboard needs before quoting population numbers: a
    10% Knuth-coin sample of customers won't hit every market segment
    at exactly 10%, so per-segment weights w = n_pop/n_samp correct
    the imbalance (the estimator Σ w·y over the sample is then
    segment-exact).  weight_ppm = 10⁶·n_pop // n_samp, loud raise on
    an unsampled segment (silent zero would bias every downstream
    estimate).  ONE pass, one segment-bounded exchange carrying both
    the population and conditional sample counts.  Mirror: FILTER
    counts + the same floor."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"])

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column("c_custkey").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        samp = h < np.uint64((1 << 32) // 10)
        return pa.table({"c_mktsegment": batch.column("c_mktsegment"),
                         "_one": pa.array(np.ones(len(ids), "int64")),
                         "_s": pa.array(samp.astype("int64"), pa.int64())})

    g = (cust.map_batches(prep, batch_format="pyarrow")
         .groupby("c_mktsegment")
         .aggregate(Sum("_one", alias_name="n_pop"),
                    Sum("_s", alias_name="n_samp"))).to_pandas()
    g = g.sort_values("c_mktsegment")
    if (g["n_samp"] == 0).any():
        bad = g.loc[g["n_samp"] == 0, "c_mktsegment"].iloc[0]
        raise ValueError(f"post_stratify: segment {bad!r} unsampled")
    g["weight_ppm"] = pd.array(
        [1_000_000 * int(p) // int(s)
         for p, s in zip(g["n_pop"], g["n_samp"])], dtype="int64")
    for c in ("n_pop", "n_samp"):
        g[c] = g[c].astype("int64")
    return g.reset_index(drop=True)


def _q_lincoln_petersen(sf_dir: str):
    """Mark–recapture population estimate (Lincoln–Petersen) — the
    two-independent-samples size estimator behind overlap-based
    census tricks (how many distinct users does the full log hold,
    given two cheap subsamples?): draw two INDEPENDENT Knuth-coin
    samples (different odd multipliers), N̂ = n₁·n₂ // m where m is
    the overlap — exact integers, loud raise on zero overlap.  The
    err_ppm column against the true count is the point: the driver-
    checked row demonstrates the estimator lands near truth on real
    data without ever counting the population in the sample path.
    ONE pass, a 4-counter fold.  Mirror: same coins, same floor."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])
    TH = (1 << 32) // 5  # 20% coins → overlap ≈ 4% of N, stable

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column("c_custkey").to_numpy().astype(np.uint64)
        a = (ids * np.uint64(2654435761)) % np.uint64(1 << 32) \
            < np.uint64(TH)
        b = (ids * np.uint64(2246822519)) % np.uint64(1 << 32) \
            < np.uint64(TH)
        return pa.table({
            "_n": pa.array(np.ones(len(ids), "int64")),
            "_a": pa.array(a.astype("int64"), pa.int64()),
            "_b": pa.array(b.astype("int64"), pa.int64()),
            "_m": pa.array((a & b).astype("int64"), pa.int64())})

    t = (cust.map_batches(prep, batch_format="pyarrow")
         .aggregate(Sum("_n", alias_name="n"),
                    Sum("_a", alias_name="a"),
                    Sum("_b", alias_name="b"),
                    Sum("_m", alias_name="m")))
    n, a, b, m = (int(t["n"]), int(t["a"]), int(t["b"]), int(t["m"]))
    if m == 0:
        raise ValueError("lincoln_petersen: zero overlap")
    est = a * b // m
    out = pd.DataFrame([{
        "n1": a, "n2": b, "m_both": m, "n_true": n, "n_est": est,
        "err_ppm": 1_000_000 * abs(est - n) // n}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_german_tank(sf_dir: str):
    """Serial-number (German-tank) population estimate: from a 10%
    Knuth sample of order keys, N̂ = max + max//k − 1 — the
    minimum-variance unbiased estimator when serials run 1..N, and
    the third member of the estimation family (post_stratify
    calibrates shares, Lincoln–Petersen uses overlap, this uses
    ORDER STRUCTURE: dense ids leak their own count).  err measured
    against the true max key.  ONE pass, a 3-counter fold.
    Mirror: same coin, same closed form."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Max, Sum

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey"])

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column("o_orderkey").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        samp = h < np.uint64((1 << 32) // 10)
        kk = ids.astype("int64")
        return pa.table({
            "_k": pa.array(samp.astype("int64"), pa.int64()),
            "_mx": pa.array(np.where(samp, kk, np.int64(-1)), pa.int64()),
            "_tmx": pa.array(kk, pa.int64())})

    agg = (orders.map_batches(prep, batch_format="pyarrow")
           .aggregate(Sum("_k", alias_name="k"),
                      Max("_mx", alias_name="mx"),
                      Max("_tmx", alias_name="tmx")))
    k, mx, tmx = int(agg["k"]), int(agg["mx"]), int(agg["tmx"])
    if k == 0:
        raise ValueError("german_tank: empty sample")
    est = mx + mx // k - 1
    out = pd.DataFrame([{
        "k": k, "sample_max": mx, "max_true": tmx, "n_est": est,
        "err_ppm": 1_000_000 * abs(est - tmx) // tmx}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_fifo_cogs(sf_dir: str):
    """FIFO cost basis of returned stock per part — inventory
    accounting, the family the ledger ops (user_ledger /
    customer_running) don't touch: treat non-'R' lines as BUYS in
    shipdate order and the part's 'R' quantity as the SELL; FIFO
    consumes the earliest buys first, so the cost of goods returned
    differs from the weighted-average basis exactly when prices
    drift — the FIFO-vs-WAVG gap IS the holding-gain signal auditors
    look for.

    The sequential queue has a CLOSED FORM (no recursion): with buys
    ordered by (shipdate, orderkey, linenumber) and B_{i−1} the
    cumulative quantity before buy i, consumed_i = clamp(S − B_{i−1},
    0, q_i).  Cost per buy floors once: consumed·price_c // q_i (unit
    price is a fraction; ONE trunc per consumed line is the
    contract).  WAVG basis floors once per part: S·Σprice_c // Σq.
    Oversold parts (S > ΣQ) consume everything — documented.  One
    (part)-hash exchange, vectorized cumsum+clip per partition, only
    per-part result rows ship.  Mirror: window cumsum + GREATEST/
    LEAST + identical floors.  Emits parts with S > 0."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.dedup import _add_pkey

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_orderkey", "l_linenumber",
                 "l_shipdate", "l_quantity", "l_extendedprice",
                 "l_returnflag"])

    def prep(batch: pa.Table) -> pa.Table:
        ep = np.rint(batch.column("l_extendedprice").to_numpy()
                     * 100).astype("int64")
        d = (batch.column("l_shipdate").cast(pa.timestamp("us"))
             .cast(pa.int64()))
        return pa.table({
            "partkey": batch.column("l_partkey"),
            "orderkey": batch.column("l_orderkey"),
            "linenumber": batch.column("l_linenumber"),
            "sd": d,
            "q": batch.column("l_quantity").cast(pa.int64()),
            "pc": pa.array(ep, pa.int64()),
            "is_r": pa.array(
                (batch.column("l_returnflag").to_numpy(
                    zero_copy_only=False) == "R"))})

    def fifo(g: pd.DataFrame) -> pd.DataFrame:
        sells = (g[g["is_r"]].groupby("partkey")["q"].sum()
                 .rename("s"))
        buys = g[~g["is_r"]].merge(sells, left_on="partkey",
                                   right_index=True)
        if buys.empty:
            return pd.DataFrame({
                "partkey": pd.array([], dtype="int64"),
                "sold_qty": pd.array([], dtype="int64"),
                "fifo_cogs_cents": pd.array([], dtype="int64"),
                "wavg_cogs_cents": pd.array([], dtype="int64")})
        buys = buys.sort_values(["partkey", "sd", "orderkey",
                                 "linenumber"], kind="mergesort")
        grp = buys.groupby("partkey", sort=False)
        cum = grp["q"].cumsum()
        before = cum - buys["q"]
        consumed = np.clip(buys["s"] - before, 0, buys["q"])
        cost = [int(c) * int(p) // int(q) if c > 0 else 0
                for c, p, q in zip(consumed, buys["pc"], buys["q"])]
        buys = buys.assign(_cons=consumed, _cost=cost)
        agg = grp.agg(s=("s", "first"), qsum=("q", "sum"),
                      psum=("pc", "sum")).reset_index()
        costs = (buys.groupby("partkey", sort=False)["_cost"].sum()
                 .reset_index())
        out = agg.merge(costs, on="partkey")
        out["sold_qty"] = out["s"].astype("int64")
        out["fifo_cogs_cents"] = out["_cost"].astype("int64")
        out["wavg_cogs_cents"] = pd.array(
            [min(int(s), int(qq)) * int(p) // int(qq)
             for s, qq, p in zip(out["s"], out["qsum"], out["psum"])],
            dtype="int64")
        out["partkey"] = out["partkey"].astype("int64")
        return out[["partkey", "sold_qty", "fifo_cogs_cents",
                    "wavg_cogs_cents"]]

    return (_add_pkey(li.map_batches(prep, batch_format="pyarrow"),
                      "partkey", 64)
            .groupby("_pkey")
            .map_groups(lambda x: fifo(x.drop(columns=["_pkey"])),
                        batch_format="pandas"))


def _q_capture_diff(sf_dir: str):
    """Page-change detection between the earliest and latest capture
    of each multi-captured url — the CHANGE measurement the dedup
    family deliberately erases (dedup_latest keeps one winner;
    recrawl_priority guesses from age; this op reads what actually
    changed): per url with ≥ 2 captures, distinct-LINE set difference
    (n_added / n_removed / n_common) and
    change_ppm = 10⁶·(added+removed) // |union| — the recrawl-value
    signal a freshness scheduler feeds on.

    Physical plan: extract → project (url, warc_ts, text) → ONE
    url-hash exchange; per partition a vectorized capture-count
    prefilter keeps only multi-capture urls (5% by construction)
    before any Python-level set work.  Oracle: the corpus plants the
    stale capture as a BLANK page one day earlier, so earliest = ∅
    lines and latest = the golden text — the closed-form census
    pattern (url_templates)."""
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.dedup import capture_line_diff
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset(sf_dir, with_dups=True)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        batch_size=256)
    return capture_line_diff(
        ds.select_columns(["url", "warc_ts", "text"]))


def _trunc_ppm(num: int, den: int) -> int:
    return 1_000_000 * num // den


def _score_label_hist(sf_dir: str):
    """Shared (score, label) bounded histogram for the threshold-eval
    pair (rank_auc's conventions: score = quantity 1..50, label =
    returned 'R') — ONE exchange bounded by |scores|×2."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count

    def prep(batch: pa.Table) -> pa.Table:
        v = np.rint(batch.column("l_quantity").to_numpy()).astype("int64")
        return pa.table({
            "qty": pa.array(v, pa.int64()),
            "returned": pc.equal(batch.column("l_returnflag"), "R")})

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_returnflag"]
    ).map_batches(prep, batch_format="pyarrow")
    return (ds.groupby(["qty", "returned"])
            .aggregate(Count(alias_name="n"))).to_pandas()


def _q_youden_threshold(sf_dir: str):
    """Operating-point selection by Youden's J — the decision AUC
    refuses to make: rank_auc says HOW WELL quantity ranks returns,
    but a filter needs ONE threshold, and J = TPR − FPR picks the
    point where the classifier beats chance by the most (the
    sensitivity+specificity−1 maximizer).  Classifier: positive ⟺
    score ≥ t, candidates = distinct scores; per candidate
    tpr_ppm = 10⁶·tp // P and fpr_ppm = 10⁶·fp // N (one floor each —
    the contract), J = tpr − fpr, ties → SMALLEST threshold (the more
    sensitive operating point).  Same bounded histogram exchange as
    rank_auc; the sweep is a cumulative scan over ≤|scores| rows.
    Mirror: histogram + window sums + ORDER BY LIMIT 1."""
    import pandas as pd

    h = _score_label_hist(sf_dir)
    g = h.pivot_table(index="qty", columns="returned", values="n",
                      aggfunc="sum", fill_value=0).sort_index(
        ascending=False)
    pos = g[True].to_numpy() if True in g else 0 * g.iloc[:, 0].to_numpy()
    neg = g[False].to_numpy() if False in g else 0 * g.iloc[:, 0].to_numpy()
    p_tot, n_tot = int(pos.sum()), int(neg.sum())
    best = None
    cum_p = cum_n = 0
    for t, tp_add, fp_add in zip(g.index, pos, neg):
        cum_p += int(tp_add)
        cum_n += int(fp_add)
        tpr = _trunc_ppm(cum_p, p_tot)
        fpr = _trunc_ppm(cum_n, n_tot)
        j = tpr - fpr
        cand = (j, -int(t), cum_p, cum_n, tpr, fpr)
        if best is None or cand[:2] > best[:2]:
            best = cand
    j, negt, tp, fp, tpr, fpr = best
    t = -negt
    out = pd.DataFrame([{
        "threshold": t, "tp": tp, "fp": fp,
        "fn": p_tot - tp, "tn": n_tot - fp,
        "tpr_ppm": tpr, "fpr_ppm": fpr, "youden_ppm": j}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_average_precision(sf_dir: str):
    """Average precision (PR-curve area) under the BLOCK tie contract
    — the eval for imbalanced problems where ROC flatters (rank_auc's
    denominator P·N barely moves when negatives dominate; AP weights
    by precision, which collapses): scores sweep DESCENDING in
    distinct-value blocks (ties are physical — every equal score is
    the same operating point, so precision is measured at each block
    END, the pessimistic tie convention), contribution per block
    floors once: 10⁶·rel_b·cumpos_b // (cumtot_b·R).  Same bounded
    histogram exchange.  Mirror: window sums + identical per-block
    floor."""
    import pandas as pd

    h = _score_label_hist(sf_dir)
    g = h.pivot_table(index="qty", columns="returned", values="n",
                      aggfunc="sum", fill_value=0).sort_index(
        ascending=False)
    pos = g[True].to_numpy()
    neg = g[False].to_numpy()
    r_tot = int(pos.sum())
    ap = 0
    cum_p = cum_t = 0
    for tp_add, fp_add in zip(pos, neg):
        rel = int(tp_add)
        cum_p += rel
        cum_t += rel + int(fp_add)
        ap += 1_000_000 * rel * cum_p // (cum_t * r_tot)
    out = pd.DataFrame([{
        "n_pos": r_tot,
        "n_neg": int(neg.sum()),
        "ap_ppm": ap}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_xmr_alarms(sf_dir: str):
    """XmR control-chart alarms (``windows.xmr_alarms_int``) — the
    THIRD spike rule: the 3σ band (events_anomaly) inflates under slow
    drift and hides spikes; the hod band (seasonal_anomaly) needs a
    daily cycle; XmR scales its limit with the MOVING RANGE
    MR̄ = mean |x_t − x_{t−1}|, so drift-dominated series still alarm
    on sharp jumps and noisy-but-stationary ones don't false-alarm.
    x̄ ± 2.66·MR̄ with the Shewhart constant kept RATIONAL (266/100),
    cross-multiplied: flag ⟺ 100·(m−1)·|m·x − S| > 266·m·ΣMR.
    One bounded exchange; emits only alarms.  Mirror: lag() moving
    ranges + the identical inequality."""
    import ray.data

    from documentai_ray.stages.windows import xmr_alarms_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return xmr_alarms_int(ev)


def _q_tukey_outliers(sf_dir: str):
    """Boxplot (Tukey-fence) outlier census per returnflag — the
    third outlier RULE next to 3σ (mean-based, wrecked by the very
    outliers it hunts) and MAD (median-based z): the 1.5·IQR fence is
    what every boxplot draws, and on integer quantities it is exactly
    representable — hinges via Tukey's median-of-halves (both halves
    include the middle row when m is odd), DOUBLED units for the
    hinges (sum-of-middles) and ×4 units for the fences
    (lo₄ = 2·q1₂ − 3·(q3₂ − q1₂)); a value x is an outlier iff
    4x < lo₄ or 4x > hi₄, counted from the bounded histogram.  ONE
    (flag, value) exchange (the grouped_median_int contract).
    Mirror: row_number rank picks + the same ×4 arithmetic."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_returnflag"])

    def prep(batch: pa.Table) -> pa.Table:
        v = np.rint(batch.column("l_quantity").to_numpy()).astype("int64")
        return pa.table({"flag": batch.column("l_returnflag"),
                         "v": pa.array(v, pa.int64())})

    h = (li.map_batches(prep, batch_format="pyarrow")
         .groupby(["flag", "v"])
         .aggregate(Count(alias_name="n"))).to_pandas()

    def pick(vals, cnts, rank):  # 1-based rank in the sorted expansion
        cum = 0
        for v, c in zip(vals, cnts):
            cum += c
            if cum >= rank:
                return int(v)
        raise AssertionError("rank out of range")

    recs = []
    for flag, g in h.groupby("flag", sort=True):
        g = g.sort_values("v")
        vals = g["v"].to_numpy()
        cnts = g["n"].astype(int).to_numpy()
        m = int(cnts.sum())
        k = (m + 1) // 2            # half size (middle included if odd)
        q1_2 = pick(vals, cnts, (k + 1) // 2) \
            + pick(vals, cnts, k // 2 + 1)
        off = m // 2
        q3_2 = pick(vals, cnts, off + (k + 1) // 2) \
            + pick(vals, cnts, off + k // 2 + 1)
        lo4 = 2 * q1_2 - 3 * (q3_2 - q1_2)
        hi4 = 2 * q3_2 + 3 * (q3_2 - q1_2)
        n_lo = int(cnts[4 * vals < lo4].sum())
        n_hi = int(cnts[4 * vals > hi4].sum())
        recs.append((flag, m, q1_2, q3_2, lo4, hi4, n_lo, n_hi))
    out = pd.DataFrame(recs, columns=[
        "flag", "n", "q1_x2", "q3_x2", "fence_lo_x4", "fence_hi_x4",
        "n_out_lo", "n_out_hi"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def _q_mase_eval(sf_dir: str):
    """Scaled forecast error (``windows.naive_mase``): backtest_mae's
    raw seasonal-naive MAE divided by the in-sample one-step naive MAE
    — Hyndman's MASE, the unit-free grade that makes forecast error
    comparable ACROSS series (a raw MAE of 40 is great on a volatile
    stream and terrible on a flat one; mase_ppm < 10⁶ means same-hour-
    yesterday beats repeat-last-hour).  Both error sums exact integers
    over observed-hour pairs, the ratio clears both means in ONE floor
    (10⁶·sae₂₄·n₁ // (sae₁·n₂₄)).  Same ONE bounded (hour, type)
    exchange as backtest_mae.  Mirror: two lag self-joins + the
    identical floor under HUGEINT."""
    import ray.data

    from documentai_ray.stages.windows import naive_mase

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
    return naive_mase(ev, ts_col="ts", key_col="event_type",
                      season_hours=24)


def _q_qini_auuc(sf_dir: str):
    """Qini curve + AUUC over the activity ranking — the AREA reading
    of uplift_deciles: per-decile uplift says WHERE the response
    lives, but choosing a targeting CUTOFF needs the cumulative view
    (treat the top-k deciles; how many incremental conversions vs
    random targeting?).  Same plan as uplift_deciles (Knuth arms, one
    user exchange, ``global_row_index`` activity rank, decile =
    1 + 10·rank // n), then the cumulative fold per decile d:

        qini_d  = Ct_d − Cc_d·Nt_d // Nc_d      (ONE floor, counts ≥ 0)
        auuc_d  = Σ_{e≤d} qini_e                 (exact)
        rand_d  = sign-split d·qini₁₀ // 10      (the random diagonal)
        gain_d  = qini_d − rand_d

    qini₁₀ can be negative (control may out-convert), so rand_d floors
    on |qini₁₀| and re-signs — Python floor and DuckDB trunc agree only
    on non-negative operands (the sign-split discipline).  10-row
    driver fold over the 40-cell aggregate.  Mirror: the uplift_deciles
    CTE + window cumsums + identical floors."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    from documentai_ray.stages.aggregates import global_row_index

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Count(alias_name="n_ev"),
                           Max("conv", alias_name="conv")))
    n_users = per_user.count()

    def neg(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "neg_n", pa.array((-batch.column("n_ev").to_numpy())
                              .astype("int64"), pa.int64()))

    ranked = global_row_index(
        per_user.map_batches(neg, batch_format="pyarrow"),
        val_col="neg_n", tiebreak_col="user_id", out_col="_ri")

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        treat = h < np.uint64(1 << 31)
        dec = 1 + 10 * batch.column("_ri").to_numpy() // n_users
        conv = batch.column("conv").to_numpy() > 0
        df = pd.DataFrame({"decile": dec.astype("int64"),
                           "t": treat, "c": conv})
        g = df.groupby(["decile", "t"], as_index=False).agg(
            n=("c", "size"), conv=("c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    g = (ranked.map_batches(cells, batch_format="pyarrow")
         .groupby(["decile", "t"])
         .aggregate(Sum("n", alias_name="n"),
                    Sum("conv", alias_name="conv"))).to_pandas()

    cum = {"nt": 0, "ct": 0, "nc": 0, "cc": 0}
    pre = []
    for d in sorted(g["decile"].unique()):
        gt = g[(g["decile"] == d) & g["t"]]
        gc = g[(g["decile"] == d) & ~g["t"]]
        cum["nt"] += int(gt["n"].sum())
        cum["ct"] += int(gt["conv"].sum())
        cum["nc"] += int(gc["n"].sum())
        cum["cc"] += int(gc["conv"].sum())
        qini = (cum["ct"] - cum["cc"] * cum["nt"] // cum["nc"]
                if cum["nc"] > 0 else cum["ct"])
        pre.append((int(d), cum["nt"], cum["ct"], cum["nc"],
                    cum["cc"], qini))
    q10 = pre[-1][5]
    recs, auuc = [], 0
    for d, nt, ct, nc, cc, qini in pre:
        auuc += qini
        rand = ((d * q10) // 10 if q10 >= 0
                else -((d * (-q10)) // 10))
        recs.append((d, nt, ct, nc, cc, qini, auuc, rand,
                     qini - rand))
    out = pd.DataFrame(recs, columns=[
        "decile", "cum_n_treat", "cum_conv_treat", "cum_n_ctrl",
        "cum_conv_ctrl", "qini", "auuc_cum", "rand_base", "gain"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_calibration_bins(sf_dir: str):
    """Probability CALIBRATION — the eval axis the discrimination ops
    (rank_auc, youden_threshold, average_precision) can't see: a score
    can rank perfectly yet lie about the probabilities (say 90% when
    35% convert), and any system that THRESHOLDS on the raw score or
    multiplies it into an expected value needs the reliability
    diagram, not the ROC.  The score is the deterministic activity
    heuristic p_ppm = clamp((n_ev − 40)·20000, 0, 10⁶) vs the actual
    purchase≥150 conversion; fixed-width bins b = min(9, p // 10⁵),
    per bin:

        conf_ppm = Σp // n          (mean claimed probability)
        acc_ppm  = 10⁶·conv // n    (observed rate)
        gap_ppm  = |acc − conf|     (of the two FLOORED values — the
                                     deterministic convention)
        brier_sum = Σ (p − 10⁶·y)²  (exact; the Brier numerator)

    and the scalar ECE rides every row: ece_ppm = Σ n_b·gap_b // N
    (one floor).  ONE user exchange + ONE 10-cell bin exchange of
    4-integer partials.  Mirror: identical CASE bins + FILTER sums +
    the same floors under HUGEINT."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Count(alias_name="n_ev"),
                           Max("conv", alias_name="conv")))

    def score(batch: pa.Table) -> pa.Table:
        n_ev = batch.column("n_ev").to_numpy().astype("int64")
        p = np.clip((n_ev - 40) * 20_000, 0, 1_000_000)
        y = (batch.column("conv").to_numpy() > 0).astype("int64")
        sq = (p - 1_000_000 * y) ** 2
        return pa.table({
            "bin": pa.array(np.minimum(9, p // 100_000), pa.int64()),
            "_n": pa.array(np.ones_like(p), pa.int64()),
            "_conv": pa.array(y, pa.int64()),
            "_p": pa.array(p, pa.int64()),
            "_sq": pa.array(sq, pa.int64())})

    g = (per_user.map_batches(score, batch_format="pyarrow")
         .groupby("bin")
         .aggregate(Sum("_n", alias_name="n"),
                    Sum("_conv", alias_name="n_conv"),
                    Sum("_p", alias_name="sum_p"),
                    Sum("_sq", alias_name="brier_sum"))).to_pandas()
    g = g.sort_values("bin").reset_index(drop=True)
    n_total = int(g["n"].sum())
    g["conf_ppm"] = [int(sp) // int(n)
                     for sp, n in zip(g["sum_p"], g["n"])]
    g["acc_ppm"] = [1_000_000 * int(c) // int(n)
                    for c, n in zip(g["n_conv"], g["n"])]
    g["gap_ppm"] = (g["acc_ppm"] - g["conf_ppm"]).abs()
    ece = int((g["n"] * g["gap_ppm"]).sum()) // n_total
    g["ece_ppm"] = ece
    out = g[["bin", "n", "n_conv", "conf_ppm", "acc_ppm", "gap_ppm",
             "brier_sum", "ece_ppm"]].copy()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_srm_check(sf_dir: str):
    """Sample-ratio-mismatch guardrail — the experiment-HEALTH check
    every arm-comparison op in this repo (ab_conversion, uplift,
    logrank, did) silently assumes: if the 50/50 Knuth assignment
    doesn't hold in the observed data (a bucketing bug, a bot filter
    that correlates with the coin), every downstream uplift number is
    garbage, and the industry-standard tripwire is a χ² of the arm
    counts against the design ratio.  With E = N/2 the statistic
    collapses to χ² = (n_t − n_c)²/N — exact integer numerator, ONE
    floor at milli precision — and the flag cross-multiplies against
    the χ²₁ 5% critical value: (n_t − n_c)²·10⁶ > 3841459·N (the
    logrank_test discipline).  Scalars only; the user exchange is the
    plan's single shuffle.  Mirror: the same coin + cross-multiplied
    inequality."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from ray.data.aggregate import Count

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    users = ev.groupby("user_id").aggregate(Count(alias_name="_cnt"))

    def arms(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        t = (h < np.uint64(1 << 31)).astype("int64")
        return pa.table({"_t": pa.array(t, pa.int64()),
                         "_c": pa.array(1 - t, pa.int64())})

    g = (users.map_batches(arms, batch_format="pyarrow")
         .aggregate(Sum("_t", alias_name="nt"),
                    Sum("_c", alias_name="nc")))
    nt = int(g["nt"])
    nc = int(g["nc"])
    n = nt + nc
    d = nt - nc
    chi2_milli = 1000 * d * d // n
    flag = d * d * 1_000_000 > 3_841_459 * n
    out = pd.DataFrame([{
        "n_treat": nt, "n_ctrl": nc, "delta": d,
        "chi2_milli": chi2_milli, "srm_flag": bool(flag)}])
    for c in ("n_treat", "n_ctrl", "delta", "chi2_milli"):
        out[c] = out[c].astype("int64")
    return out


def _q_ips_policy_eval(sf_dir: str):
    """Off-policy evaluation — the counterfactual question the A/B ops
    can't answer: ab_conversion grades the arms that RAN; this grades a
    NEW targeting policy (treat iff n_ev ≥ 66) from the same logs
    without deploying it.  The Knuth coin is the logged behavior policy
    with propensity exactly 1/2 for every user, so the IPS estimator's
    weights are the exact rational 2 and everything stays integer:

        ips_ppm    = 2·10⁶ · Σ y·match // n        (Horvitz-Thompson)
        snips_ppm  = 10⁶ · Σ y·match // Σ match    (self-normalized —
                     the 2s cancel; 0-guarded when no user matches)
        logged_ppm = 10⁶ · Σ y // n                (behavior baseline)

    match = [coin arm == policy arm]; n_match is the effective-sample
    diagnostic every OPE report carries (IPS variance blows up as it
    shrinks).  ONE user exchange, scalar partials only.  Mirror: the
    same coin + CASE policy + identical floors."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Count(alias_name="n_ev"),
                           Max("conv", alias_name="conv")))

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        logged = (h < np.uint64(1 << 31)).astype("int64")
        pol = (batch.column("n_ev").to_numpy() >= 66).astype("int64")
        match = (logged == pol).astype("int64")
        y = (batch.column("conv").to_numpy() > 0).astype("int64")
        return pa.table({
            "_n": pa.array(np.ones_like(match), pa.int64()),
            "_y": pa.array(y, pa.int64()),
            "_m": pa.array(match, pa.int64()),
            "_my": pa.array(match * y, pa.int64())})

    g = (per_user.map_batches(cells, batch_format="pyarrow")
         .aggregate(Sum("_n", alias_name="n"),
                    Sum("_y", alias_name="y"),
                    Sum("_m", alias_name="m"),
                    Sum("_my", alias_name="my")))
    n, y, m, my = (int(g["n"]), int(g["y"]), int(g["m"]),
                   int(g["my"]))
    out = pd.DataFrame([{
        "n": n, "n_match": m, "n_match_conv": my,
        "logged_ppm": 1_000_000 * y // n,
        "ips_ppm": 2_000_000 * my // n,
        "snips_ppm": 1_000_000 * my // m if m > 0 else 0}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_label_shift(sf_dir: str):
    """Black-box label-shift estimation (BBSE) — the drift family's
    missing half: tvd/ks/chi2 DETECT that a segment differs; this
    QUANTIFIES the new label prior using only a frozen classifier's
    confusion rates, the estimator behind every "how much did the
    positive rate move in production?" dashboard where target labels
    are unavailable.  Source = Knuth-true users; target = Knuth-false
    users with ≥ 12 purchases (a label-correlated segment, so the
    prior genuinely shifts); classifier ŷ = (n_ev ≥ 66), label
    y = converts.  BBSE inverts the 2×2 confusion:

        q = (μ − fpr)/(tpr − fpr)

    cleared to ONE sign-split floor: with P = TP+FN, N = FP+TN,
    num = P·(m1·N − FP·m), den = m·(TP·N − FP·P),
    est_prior_ppm = sign(num·den) · (10⁶·|num| // |den|) (0 when den
    is 0 — a chance-level classifier can't see the shift).  The true
    target prior rides along, making the estimator's error visible.
    ONE user exchange, 8 scalar partials.  Mirror: identical counts +
    the same sign-split CASE under HUGEINT."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        purch = pc.equal(batch.column("event_type"), "purchase")
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64()),
                         "purch": purch.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Count(alias_name="n_ev"),
                           Max("conv", alias_name="conv"),
                           Sum("purch", alias_name="np")))

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        src = h < np.uint64(1 << 31)
        tgt = (~src) & (batch.column("np").to_numpy() >= 12)
        yh = batch.column("n_ev").to_numpy() >= 66
        y = batch.column("conv").to_numpy() > 0
        def n(mask):
            return pa.array(mask.astype("int64"), pa.int64())
        return pa.table({
            "_tp": n(src & y & yh), "_fn": n(src & y & ~yh),
            "_fp": n(src & ~y & yh), "_tn": n(src & ~y & ~yh),
            "_m": n(tgt), "_m1": n(tgt & yh), "_t1": n(tgt & y)})

    g = (per_user.map_batches(cells, batch_format="pyarrow")
         .aggregate(*[Sum(c, alias_name=c.lstrip("_")) for c in
                      ("_tp", "_fn", "_fp", "_tn", "_m", "_m1",
                       "_t1")]))
    tp, fn, fp, tn, m, m1, t1 = (int(g[k]) for k in
                                 ("tp", "fn", "fp", "tn", "m", "m1",
                                  "t1"))
    p_src, n_src = tp + fn, fp + tn
    num = p_src * (m1 * n_src - fp * m)
    den = m * (tp * n_src - fp * p_src)
    if den == 0:
        est = 0
    else:
        s = 1 if (num >= 0) == (den > 0) else -1
        est = s * (1_000_000 * abs(num) // abs(den))
    out = pd.DataFrame([{
        "n_src": p_src + n_src, "tp": tp, "fp": fp, "fn": fn,
        "tn": tn, "n_tgt": m, "m1": m1,
        "mu_ppm": 1_000_000 * m1 // m if m else 0,
        "tpr_ppm": 1_000_000 * tp // p_src if p_src else 0,
        "fpr_ppm": 1_000_000 * fp // n_src if n_src else 0,
        "est_prior_ppm": est,
        "true_prior_ppm": 1_000_000 * t1 // m if m else 0}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_conformal_interval(sf_dir: str):
    """Split-conformal 90% interval for the hourly forecast
    (``windows.conformal_backtest``): backtest_mae/mase_eval grade the
    POINT error; an alerting threshold needs "how far off can the
    forecast be at 90% confidence", and split conformal answers it
    distribution-free — k-th smallest calibration nonconformity with
    the finite-sample rank k = (9·n_cal+18)//10 (⌈(n+1)·0.9⌉ exact),
    Knuth epoch-hour coin as the calibration split, held-out coverage
    floored once to ppm.  Same ONE bounded (hour, type) exchange as
    the other backtests.  Mirror: lag self-join + the same coin +
    row_number rank pick + FILTER coverage count."""
    import ray.data

    from documentai_ray.stages.windows import conformal_backtest

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
    return conformal_backtest(ev, ts_col="ts", key_col="event_type",
                              season_hours=24)


def _q_cohort_payback(sf_dir: str):
    """CAC payback day per signup cohort — the DECISION scalar
    cohort_ltv's running curve feeds: finance doesn't read the curve,
    it asks "on which day does cohort X's cumulative purchase revenue
    cross its acquisition cost?" (constant CAC 30000¢/user — the
    knob's value is arbitrary, the fold isn't).  Same one user-hash
    exchange as cohort_ltv (first-event day per user found per
    partition, vectorized), but partials carry BOTH the per-(cohort,
    day-offset) revenue cents AND the cohort's user count (sentinel
    offset −1), so the payback fold is a cumsum + first-crossing scan
    over the ≤cohorts×days driver frame: payback_day = min offset
    with cum ≥ 30000·n_users, −1 if the cohort never pays back.
    Revenue is exact integer cents (the money-sum lesson).  Mirror:
    min-day join + window cumsum + min(off) FILTER crossing."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.dedup import _add_pkey

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        dd = (batch.column("ts").cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy() // 86_400_000_000)
        c = np.rint(batch.column("value").to_numpy() * 100) \
            .astype("int64")
        is_p = pc.equal(batch.column("event_type"),
                        "purchase").to_numpy(zero_copy_only=False)
        return pa.table({"user_id": batch.column("user_id"),
                         "dd": pa.array(dd.astype("int64"), pa.int64()),
                         "cents": pa.array(np.where(is_p, c, 0),
                                           pa.int64()),
                         "is_p": pa.array(is_p)})

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("user_id")["dd"].min().rename("fd")
        users = first.reset_index()
        users["cohort_week"] = users["fd"] // 7
        uc = (users.groupby("cohort_week", as_index=False)
              .agg(n=("user_id", "size")))
        uc["off"] = -1
        uc["cents"] = 0
        p = g[g["is_p"]].merge(first, left_on="user_id",
                               right_index=True)
        p["cohort_week"] = p["fd"] // 7
        p["off"] = p["dd"] - p["fd"]
        pr = (p.groupby(["cohort_week", "off"], as_index=False)
              ["cents"].sum())
        pr["n"] = 0
        out = pd.concat([uc[["cohort_week", "off", "cents", "n"]],
                         pr[["cohort_week", "off", "cents", "n"]]],
                        ignore_index=True)
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    g = (_add_pkey(ev.map_batches(prep, batch_format="pyarrow"),
                   "user_id", 64)
         .groupby("_pkey")
         .map_groups(lambda x: partial(x.drop(columns=["_pkey"])),
                     batch_format="pandas")
         .groupby(["cohort_week", "off"])
         .aggregate(Sum("cents", alias_name="cents"),
                    Sum("n", alias_name="n"))).to_pandas()
    recs = []
    for cw, sub in g.groupby("cohort_week", sort=True):
        n_users = int(sub.loc[sub["off"] == -1, "n"].sum())
        rev = (sub[sub["off"] >= 0].sort_values("off"))
        cum = rev["cents"].cumsum()
        total = int(rev["cents"].sum())
        cac = 30000 * n_users
        crossed = rev.loc[cum >= cac, "off"]
        payback = int(crossed.iloc[0]) if len(crossed) else -1
        recs.append((int(cw), n_users, total, cac, payback))
    out = pd.DataFrame(recs, columns=[
        "cohort_week", "n_users", "total_revenue_cents", "cac_cents",
        "payback_day"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_bootstrap_ci(sf_dir: str):
    """Deterministic multiplier-bootstrap CI for mean quantity — the
    resampling-INFERENCE family: every point estimate in this repo is
    exact, but "mean 25.5" without an interval can't tell a real move
    from noise, and the classical bootstrap is the distribution-free
    way to get one.  The distributed form is the MULTIPLIER bootstrap
    (each row gets an independent integer weight with mean 1 per
    replicate — no global resample pass), and determinism comes from
    drawing the weight's two Bernoulli(1/2) components from hash
    bits:  k = (rid·32 + b) mod 1048573,
    h = k·2654435761 mod 2³², w = ((h>>30)&1) + ((h>>31)&1)
    ∈ {0,1,2} (mean 1, variance ½ — a valid multiplier law; rid =
    8·orderkey + linenumber is the stable row id, the prime
    pre-reduction keeps every product in int64 at any scale, and the
    bits are the TOP two — the low bits of a multiplicative hash are
    constant across keys that differ by a multiple of 4, which made
    every row in a replicate share one weight until this used the
    high end).  Each of
    the B=32 replicate means floors once (10⁶·Σwv // Σw); the CI is
    the RANK-PICKED 2nd and 31st of the sorted replicate means (the
    ~94% interval 32 replicates can support — more replicates is a
    knob, not a design change).  Per-batch partials are 32 (Σwv, Σw)
    pairs, so the exchange is 32 rows × blocks regardless of data
    size.  Mirror: generate_series(0,31) cross join + identical hash
    arithmetic + row_number rank picks."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"])
    B = 32

    def partial(batch: pa.Table) -> pa.Table:
        rid = (8 * batch.column("l_orderkey").to_numpy()
               + batch.column("l_linenumber").to_numpy()) \
            .astype("int64")
        v = np.rint(batch.column("l_quantity").to_numpy()) \
            .astype("int64")
        b = np.arange(B, dtype="int64")
        k = (rid[:, None] * 32 + b[None, :]) % 1048573
        h = (k.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        w = (((h >> np.uint64(30)) & np.uint64(1))
             + ((h >> np.uint64(31)) & np.uint64(1))).astype("int64")
        return pa.table({
            "b": pa.array(b, pa.int64()),
            "swv": pa.array((w * v[:, None]).sum(axis=0), pa.int64()),
            "sw": pa.array(w.sum(axis=0), pa.int64()),
            "sv": pa.array(np.full(B, int(v.sum()), dtype="int64"),
                           pa.int64()),
            "n": pa.array(np.full(B, len(v), dtype="int64"),
                          pa.int64())})

    g = (li.map_batches(partial, batch_format="pyarrow")
         .groupby("b")
         .aggregate(Sum("swv", alias_name="swv"),
                    Sum("sw", alias_name="sw"),
                    Sum("sv", alias_name="sv"),
                    Sum("n", alias_name="n"))).to_pandas()
    means = sorted(int(1_000_000 * swv // sw) if sw > 0 else 0
                   for swv, sw in zip(g["swv"], g["sw"]))
    n = int(g["n"].iloc[0])
    sv = int(g["sv"].iloc[0])
    out = pd.DataFrame([{
        "n": n, "n_reps": B,
        "mean_ppm": 1_000_000 * sv // n,
        "ci_lo_ppm": means[1], "ci_hi_ppm": means[B - 2]}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_jackknife_sources(sf_dir: str):
    """Leave-one-source-out influence — the ROBUSTNESS check next to
    bootstrap_ci's sampling noise: a corpus metric (English share)
    that looks healthy can be propped up by a single source, and the
    jackknife answers "which source moves the number most if it
    vanished" EXACTLY from the per-source totals (no resampling —
    deletion statistics have a closed form):

        share_wo_ppm  = 10⁶·(E − e_s) // (N − n_s)
        influence_ppm = share_wo_ppm − share_full_ppm

    (one floor each; the full-corpus share rides every row for
    context).  ONE source-bounded exchange of (n, n_en) partials.
    Mirror: FILTER sums + window totals + identical floors."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "lang"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        en = pc.equal(batch.column("lang"), "en").cast(pa.int64())
        ones = pa.array([1] * len(batch), pa.int64())
        return pa.table({"source": batch.column("source"),
                         "_n": ones, "_en": en})

    g = (docs.map_batches(prep, batch_format="pyarrow")
         .groupby("source")
         .aggregate(Sum("_n", alias_name="n_docs"),
                    Sum("_en", alias_name="n_en"))).to_pandas()
    g = g.sort_values("source").reset_index(drop=True)
    N = int(g["n_docs"].sum())
    E = int(g["n_en"].sum())
    full = 1_000_000 * E // N
    g["share_full_ppm"] = full
    g["share_wo_ppm"] = [
        1_000_000 * (E - int(e)) // (N - int(n)) if N > int(n) else 0
        for e, n in zip(g["n_en"], g["n_docs"])]
    g["influence_ppm"] = g["share_wo_ppm"] - full
    for c in g.columns[1:]:
        g[c] = g[c].astype("int64")
    return g


def _q_emd_hourly(sf_dir: str):
    """1-D Wasserstein (earth-mover) distance between the weekday and
    weekend hour-of-day profiles per event type — the distribution
    distance WITH GEOMETRY that the drift family lacks: TVD/χ² treat
    hours as unordered labels, so a profile shifted by 1 hour and one
    shifted by 12 score the same; EMD on the ordered 24-bin domain is
    Σ|CDF diff| and prices the shift in HOURS MOVED PER UNIT MASS.
    Cross-multiplied exact: emd_milli = 1000·Σ_h |CA_h·N_B −
    CB_h·N_A| // (N_A·N_B) (one floor; 0 when either class is empty).
    Weekday/weekend from pure epoch-day arithmetic ((dd+4) mod 7 ∈
    {0,6} = Sunday/Saturday — no engine calendar builtins, so both
    sides share one convention).  ONE exchange bounded by
    types×2×24.  Mirror: dense grid + window cumsum + the identical
    HUGEINT fold."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        us = (batch.column("ts").cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        dd = us // 86_400_000_000
        hod = (us // 3_600_000_000) % 24
        cls = (((dd + 4) % 7 == 0) | ((dd + 4) % 7 == 6)) \
            .astype("int64")
        df = pd.DataFrame({"event_type":
                           batch.column("event_type").to_pandas(),
                           "cls": cls, "hod": hod.astype("int64")})
        g = df.groupby(["event_type", "cls", "hod"],
                       as_index=False).size()
        g["size"] = g["size"].astype("int64")
        return pa.Table.from_pandas(
            g.rename(columns={"size": "_n"}),
            preserve_index=False).replace_schema_metadata(None)

    g = (ev.map_batches(prep, batch_format="pyarrow")
         .groupby(["event_type", "cls", "hod"])
         .aggregate(Sum("_n", alias_name="n"))).to_pandas()
    recs = []
    for et, sub in g.groupby("event_type", sort=True):
        a = np.zeros(24, dtype="int64")
        b = np.zeros(24, dtype="int64")
        for _, r in sub.iterrows():
            (a if r["cls"] == 0 else b)[int(r["hod"])] = int(r["n"])
        na, nb = int(a.sum()), int(b.sum())
        if na > 0 and nb > 0:
            ca, cb = a.cumsum(), b.cumsum()
            s = sum(abs(int(x) * nb - int(y) * na)
                    for x, y in zip(ca, cb))
            emd = 1000 * s // (na * nb)
        else:
            emd = 0
        recs.append((et, na, nb, emd))
    out = pd.DataFrame(recs, columns=[
        "event_type", "n_weekday", "n_weekend", "emd_milli"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def _q_price_elasticity(sf_dir: str):
    """Arc price elasticity of demand per part across the shipdate
    halves — the demand-economics readout the index family stops short
    of: laspeyres/paasche say prices rose; a buyer wants to know
    whether QUANTITY responded, and the midpoint (arc) formula is the
    textbook two-period estimate.  With unit value p_i = R_i/Q_i the
    whole expression clears to integers:

        e = [(Q₁−Q₀)/(Q₁+Q₀)] / [(p₁−p₀)/(p₁+p₀)]
          = (Q₁−Q₀)·(R₁Q₀ + R₀Q₁) / [(Q₁+Q₀)·(R₁Q₀ − R₀Q₁)]

    floored once at ppm with the FULL sign-split (numerator and
    denominator each carry a sign — Python floors, DuckDB truncates).
    Parts missing a period or with an unchanged unit value (den = 0)
    drop — no elasticity is measurable there.  The (part, period)
    aggregate rides ONE exchange; the per-part fold is bucketed
    (``_add_pkey``) with Python-int arithmetic because R·Q²-scale
    products overflow int64 at large SF.  Mirror: midpoint-split sums
    + self-join + the identical HUGEINT sign-split."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    from documentai_ray.stages.dedup import _add_pkey

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity",
                 "l_extendedprice"])

    def prep(batch: pa.Table) -> pa.Table:
        import numpy as np
        dd = (batch.column("l_shipdate").cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy() // 86_400_000_000)
        q = batch.column("l_quantity").to_numpy().astype("int64")
        rc = np.rint(batch.column("l_extendedprice").to_numpy()
                     * 100).astype("int64")
        return pa.table({"pk": batch.column("l_partkey"),
                         "dd": pa.array(dd.astype("int64"), pa.int64()),
                         "q": pa.array(q, pa.int64()),
                         "rc": pa.array(rc, pa.int64())})

    # the span scan re-reads ONLY the shipdate column (the documented
    # double-consumption rule: re-read a pruned source, don't pin)
    sd = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_shipdate"])

    def days(batch: pa.Table) -> pa.Table:
        dd = (batch.column("l_shipdate").cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy() // 86_400_000_000)
        return pa.table({"dd": pa.array(dd.astype("int64"),
                                        pa.int64())})

    mm = sd.map_batches(days, batch_format="pyarrow") \
        .aggregate(Min("dd"), Max("dd"))
    mid = (int(mm["min(dd)"]) + int(mm["max(dd)"])) // 2
    d = li.map_batches(prep, batch_format="pyarrow")

    def label(batch: pa.Table) -> pa.Table:
        import numpy as np
        post = (batch.column("dd").to_numpy() >= mid).astype("int64")
        return pa.table({"pk": batch.column("pk"),
                         "post": pa.array(post, pa.int64()),
                         "q": batch.column("q"),
                         "rc": batch.column("rc")})

    agg = (d.map_batches(label, batch_format="pyarrow")
           .groupby(["pk", "post"])
           .aggregate(Sum("q", alias_name="q"),
                      Sum("rc", alias_name="rc")))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for pk, sub in g.groupby("pk", sort=False):
            if len(sub) != 2:
                continue
            s = sub.set_index("post")
            q0, r0 = int(s.loc[0, "q"]), int(s.loc[0, "rc"])
            q1, r1 = int(s.loc[1, "q"]), int(s.loc[1, "rc"])
            den = (q1 + q0) * (r1 * q0 - r0 * q1)
            if den == 0:
                continue
            num = (q1 - q0) * (r1 * q0 + r0 * q1)
            sgn = 1 if (num >= 0) == (den > 0) else -1
            e = sgn * (1_000_000 * abs(num) // abs(den))
            recs.append((int(pk), q0, q1, r0, r1, e))
        out = pd.DataFrame(recs, columns=[
            "partkey", "q0", "q1", "r0_cents", "r1_cents",
            "elasticity_ppm"])
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return (_add_pkey(agg, "pk", 64)
            .groupby("_pkey")
            .map_groups(lambda x: fold(x.drop(columns=["_pkey"])),
                        batch_format="pandas"))


def _q_permutation_test(sf_dir: str):
    """Re-randomization (permutation) p-value for the arm conversion
    gap — the ASSUMPTION-FREE significance check next to the
    parametric ones (logrank's χ², srm's critical value): under the
    null the coin labels are exchangeable, so re-flipping them B=32
    times and counting how often the re-randomized gap is at least as
    extreme IS the p-value, no distribution assumed.  Replicate b
    re-coins each user from hash bit 31 of k·2654435761 with
    k = (uid·32 + b) mod 1048573 (the bootstrap_ci discipline: TOP
    bit, prime pre-reduction).  All comparisons are exact
    cross-multiplications: with A = ct·nc − cc·nt and D = nt·nc,
    |gap_b| ≥ |gap_obs| ⟺ |A_b|·D_obs ≥ |A_obs|·D_b (D > 0), so no
    replicate ever floors.  p uses the standard add-one rule:
    p_ppm = 10⁶·(n_extreme + 1) // (B + 1).  Per-batch partials are
    32×4 counts; ONE user exchange.  Mirror: generate_series cross
    join + identical hash + HUGEINT cross-multiplied FILTER."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Count(alias_name="n_ev"),
                           Max("conv", alias_name="conv")))
    B = 32

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").to_numpy().astype("int64")
        y = (batch.column("conv").to_numpy() > 0).astype("int64")
        h0 = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        obs = (h0 < np.uint64(1 << 31)).astype("int64")
        b = np.arange(B, dtype="int64")
        k = (ids[:, None] * 32 + b[None, :]) % 1048573
        h = (k.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        t = ((h >> np.uint64(31)) & np.uint64(1)).astype("int64")
        rep = pa.table({
            "b": pa.array(b, pa.int64()),
            "nt": pa.array(t.sum(axis=0), pa.int64()),
            "ct": pa.array((t * y[:, None]).sum(axis=0), pa.int64()),
            "n": pa.array(np.full(B, len(y), dtype="int64"),
                          pa.int64()),
            "cy": pa.array(np.full(B, int(y.sum()), dtype="int64"),
                           pa.int64()),
            "ont": pa.array(np.full(B, int(obs.sum()),
                                    dtype="int64"), pa.int64()),
            "oct": pa.array(np.full(B, int((obs * y).sum()),
                                    dtype="int64"), pa.int64())})
        return rep

    g = (per_user.map_batches(cells, batch_format="pyarrow")
         .groupby("b")
         .aggregate(*[Sum(c, alias_name=c) for c in
                      ("nt", "ct", "n", "cy", "ont", "oct")])
         ).to_pandas()
    n = int(g["n"].iloc[0])
    cy = int(g["cy"].iloc[0])
    ont, octv = int(g["ont"].iloc[0]), int(g["oct"].iloc[0])
    onc, occ = n - ont, cy - octv
    a_obs = octv * onc - occ * ont
    d_obs = ont * onc
    n_ext = 0
    for nt, ct in zip(g["nt"], g["ct"]):
        nt, ct = int(nt), int(ct)
        nc, cc = n - nt, cy - ct
        a_b, d_b = ct * nc - cc * nt, nt * nc
        if d_b == 0 or abs(a_b) * d_obs >= abs(a_obs) * d_b:
            n_ext += 1
    sgn = 1 if a_obs >= 0 else -1
    gap = sgn * (1_000_000 * abs(a_obs) // d_obs) if d_obs else 0
    out = pd.DataFrame([{
        "n": n, "b_reps": B, "obs_gap_ppm": gap,
        "n_extreme": n_ext,
        "p_ppm": 1_000_000 * (n_ext + 1) // (B + 1)}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_cuped_adjust(sf_dir: str):
    """CUPED variance reduction — the technique every mature
    experimentation platform applies before reading an uplift: the
    arm gap is noisy because users differ hugely in baseline
    behavior, and regressing the metric on a PRE-EXPOSURE covariate
    (here: each user's first-15-day event count, unaffected by
    assignment by construction) removes the explained variance:

        θ        = Σ(x−x̄)(y−ȳ) / Σ(x−x̄)²
        adj gap  = (ȳ_t − ȳ_c) − θ·(x̄_t − x̄_c)

    cleared to integers: θ_ppm = sign-split 10⁶·(n·Σxy − Σx·Σy) //
    (n·Σx² − (Σx)²); the arm means and the covariate gap each floor
    once at ppm; the correction composes two floored values
    (θ_ppm·xgap_ppm // 10⁶, sign-split) — a documented double-floor,
    mirrored op-for-op.  If the coin is truly random the covariate
    gap is small and adj ≈ raw; a lopsided segment moves it — which
    is exactly what the number is for.  ONE user exchange, 7 scalar
    partials.  Mirror: identical sums + the same three sign-split
    floors under HUGEINT."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])

    # pre-period boundary: first 15 days of the corpus span (the
    # pruned-column re-read rule)
    sd = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def days(batch: pa.Table) -> pa.Table:
        dd = (batch.column("ts").cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy() // 86_400_000_000)
        return pa.table({"dd": pa.array(dd.astype("int64"),
                                        pa.int64())})

    d0 = int(sd.map_batches(days, batch_format="pyarrow").min("dd"))
    cut = d0 + 15

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        dd = (batch.column("ts").cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy() // 86_400_000_000)
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        pre = (dd < cut).astype("int64")
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64()),
                         "pre": pa.array(pre, pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Max("conv", alias_name="y"),
                           Sum("pre", alias_name="x")))

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        t = (h < np.uint64(1 << 31)).astype("int64")
        x = batch.column("x").to_numpy().astype("int64")
        y = (batch.column("y").to_numpy() > 0).astype("int64")
        one = np.ones_like(x)
        return pa.table({
            "n": pa.array(one, pa.int64()),
            "sx": pa.array(x, pa.int64()),
            "sy": pa.array(y, pa.int64()),
            "sxy": pa.array(x * y, pa.int64()),
            "sxx": pa.array(x * x, pa.int64()),
            "nt": pa.array(t, pa.int64()),
            "ct": pa.array(t * y, pa.int64()),
            "xt": pa.array(t * x, pa.int64())})

    g = (per_user.map_batches(cells, batch_format="pyarrow")
         .aggregate(*[Sum(c, alias_name=c) for c in
                      ("n", "sx", "sy", "sxy", "sxx", "nt", "ct",
                       "xt")]))
    n, sx, sy, sxy, sxx = (int(g[k]) for k in
                           ("n", "sx", "sy", "sxy", "sxx"))
    nt, ct, xt = int(g["nt"]), int(g["ct"]), int(g["xt"])
    nc, cc, xc = n - nt, sy - ct, sx - xt

    def ssfloor(num: int, den: int) -> int:
        if den == 0:
            return 0
        s = 1 if (num >= 0) == (den > 0) else -1
        return s * (1_000_000 * abs(num) // abs(den))

    theta = ssfloor(n * sxy - sx * sy, n * sxx - sx * sx)
    uplift = (1_000_000 * ct // nt if nt else 0) \
        - (1_000_000 * cc // nc if nc else 0)
    xgap = ssfloor(xt * nc - xc * nt, nt * nc)
    corr_num = theta * xgap
    s = 1 if corr_num >= 0 else -1
    corr = s * (abs(corr_num) // 1_000_000)
    out = pd.DataFrame([{
        "n": n, "n_treat": nt, "theta_ppm": theta,
        "uplift_ppm": uplift, "xgap_ppm": xgap,
        "correction_ppm": corr,
        "adj_uplift_ppm": uplift - corr}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_rdd_jump(sf_dir: str):
    """Sharp regression-discontinuity at the activity cutoff — the
    quasi-experimental family's second member (did_estimator compares
    groups over time; RDD reads the causal jump off a THRESHOLD RULE):
    when a treatment switches exactly at x = 66 events, users just
    below and just above are exchangeable, so the outcome gap between
    the two side-local regression intercepts AT the cutoff estimates
    the effect.  Local-linear on each side within bandwidth 20
    (u = x−66 ∈ [−20,−1] left, [0,19] right), the grouped_regression
    integer contract: den = n·Σuu − (Σu)² (non-negative by
    Cauchy-Schwarz), intercept num = Σy·Σuu − Σu·Σuy, slope num =
    n·Σuy − Σu·Σy, each sign-split floored once to ppm;
    jump = a_R − a_L.  On the synthetic corpus conversion is smooth
    in activity, so the jump reads ≈ 0 — the placebo the estimator
    should produce.  ONE user exchange, 2×5 scalar partials.
    Mirror: FILTER sums + identical sign-split floors under
    HUGEINT."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Count(alias_name="n_ev"),
                           Max("conv", alias_name="conv")))

    def cells(batch: pa.Table) -> pa.Table:
        x = batch.column("n_ev").to_numpy().astype("int64")
        y = (batch.column("conv").to_numpy() > 0).astype("int64")
        u = x - 66
        left = (u >= -20) & (u <= -1)
        right = (u >= 0) & (u <= 19)
        cols = {}
        for tag, m in (("l", left), ("r", right)):
            uu = u[m]
            yy = y[m]
            cols[f"n_{tag}"] = int(m.sum())
            cols[f"su_{tag}"] = int(uu.sum())
            cols[f"sy_{tag}"] = int(yy.sum())
            cols[f"suy_{tag}"] = int((uu * yy).sum())
            cols[f"suu_{tag}"] = int((uu * uu).sum())
        return pa.table({k: pa.array([v], pa.int64())
                         for k, v in cols.items()})

    names = [f"{s}_{t}" for t in ("l", "r")
             for s in ("n", "su", "sy", "suy", "suu")]
    g = (per_user.map_batches(cells, batch_format="pyarrow")
         .aggregate(*[Sum(c, alias_name=c) for c in names]))

    def ssfloor(num: int, den: int) -> int:
        if den == 0:
            return 0
        s = 1 if (num >= 0) == (den > 0) else -1
        return s * (1_000_000 * abs(num) // abs(den))

    vals = {}
    for tag in ("l", "r"):
        n, su, sy, suy, suu = (int(g[f"{s}_{tag}"]) for s in
                               ("n", "su", "sy", "suy", "suu"))
        den = n * suu - su * su
        vals[f"n_{tag}"] = n
        vals[f"a_{tag}"] = ssfloor(sy * suu - su * suy, den)
        vals[f"b_{tag}"] = ssfloor(n * suy - su * sy, den)
    out = pd.DataFrame([{
        "n_left": vals["n_l"], "n_right": vals["n_r"],
        "a_left_ppm": vals["a_l"], "b_left_ppm": vals["b_l"],
        "a_right_ppm": vals["a_r"], "b_right_ppm": vals["b_r"],
        "jump_ppm": vals["a_r"] - vals["a_l"]}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_kitagawa_decomp(sf_dir: str):
    """Kitagawa/Oaxaca mix-vs-rate decomposition — the BI question no
    drift test answers: the corpus purchase share moved between the
    shipdate halves, but WHY — did the hour-of-day MIX shift toward
    segments that always purchase less, or did the within-segment
    RATES drop?  With segment s ∈ hod//6 (4 buckets), period counts
    c_i,s (events) and p_i,s (purchases), w = c/N and r = p/c, each
    segment's three terms clear to single sign-split floors:

        mix_s   = (w₁−w₀)·r₀  = (c₁N₀−c₀N₁)·p₀ / (N₁N₀c₀)
        rate_s  = w₀·(r₁−r₀)  = (p₁c₀−p₀c₁) / (N₀c₁)
        inter_s = (w₁−w₀)(r₁−r₀)
                = (c₁N₀−c₀N₁)(p₁c₀−p₀c₁) / (N₀N₁c₁c₀)

    Σ_s(mix+rate+inter) equals the total share change up to the
    flooring residue (documented; the identity is exact in rationals).
    Periods split at the event-span midpoint (the laspeyres
    convention).  ONE exchange bounded by 4×2 cells.  Mirror: FILTER
    sums + totals cross join + the identical three sign-split CASEs
    under HUGEINT."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    sd = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def days(batch: pa.Table) -> pa.Table:
        dd = (batch.column("ts").cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy() // 86_400_000_000)
        return pa.table({"dd": pa.array(dd.astype("int64"),
                                        pa.int64())})

    mm = sd.map_batches(days, batch_format="pyarrow") \
        .aggregate(Min("dd"), Max("dd"))
    mid = (int(mm["min(dd)"]) + int(mm["max(dd)"])) // 2

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        us = (batch.column("ts").cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        dd = us // 86_400_000_000
        seg = (us // 3_600_000_000) % 24 // 6
        per = (dd >= mid).astype("int64")
        p = pc.equal(batch.column("event_type"),
                     "purchase").to_numpy(zero_copy_only=False) \
            .astype("int64")
        return pa.table({"seg": pa.array(seg.astype("int64"),
                                         pa.int64()),
                         "per": pa.array(per, pa.int64()),
                         "_c": pa.array(np.ones_like(per), pa.int64()),
                         "_p": pa.array(p, pa.int64())})

    g = (ev.map_batches(prep, batch_format="pyarrow")
         .groupby(["seg", "per"])
         .aggregate(Sum("_c", alias_name="c"),
                    Sum("_p", alias_name="p"))).to_pandas()
    n0 = int(g.loc[g["per"] == 0, "c"].sum())
    n1 = int(g.loc[g["per"] == 1, "c"].sum())

    def ssfloor(num: int, den: int) -> int:
        if den == 0:
            return 0
        s = 1 if (num >= 0) == (den > 0) else -1
        return s * (1_000_000 * abs(num) // abs(den))

    recs = []
    for seg in sorted(g["seg"].unique()):
        r0 = g[(g["seg"] == seg) & (g["per"] == 0)]
        r1 = g[(g["seg"] == seg) & (g["per"] == 1)]
        c0 = int(r0["c"].sum())
        p0 = int(r0["p"].sum())
        c1 = int(r1["c"].sum())
        p1 = int(r1["p"].sum())
        wnum = c1 * n0 - c0 * n1
        rnum = p1 * c0 - p0 * c1
        recs.append((int(seg), c0, p0, c1, p1,
                     ssfloor(wnum * p0, n1 * n0 * c0),
                     ssfloor(rnum, n0 * c1),
                     ssfloor(wnum * rnum, n0 * n1 * c1 * c0)))
    out = pd.DataFrame(recs, columns=[
        "seg", "c0", "p0", "c1", "p1", "mix_ppm", "rate_ppm",
        "inter_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_spillover_exposure(sf_dir: str):
    """Interference / network-effect readout — the SUTVA check the A/B
    ops silently assume away: if treated users influence their
    neighbors, control is contaminated and every uplift number lies;
    the standard diagnostic is conversion BY TREATED-NEIGHBOR COUNT.
    The user graph is id-adjacency (u±1, u±2 — ids are contiguous by
    construction; a user's neighborhood is its 4 nearest ids), and
    existence is a real distributed check: each user emits 4 probe
    rows, an inner ``hash_join`` against the user set keeps probes
    whose neighbor exists, the Knuth coin of the SURVIVING neighbor id
    is a pure function (computed post-join — no coin column ever
    ships), and edge users (< 4 neighbors) drop for a clean 0..4
    domain.  Under the null (the coin can't cause spillover) the five
    rates should be flat — the placebo shape.  Exchanges: one user
    groupby + one bucketed join + one 5-row rollup.  Mirror: IN-list
    self-join + identical coin + the same n=4 filter."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    from documentai_ray.stages.joins import hash_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Max("conv", alias_name="conv")))

    def probes(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy().astype("int64")
        y = batch.column("conv").to_numpy().astype("int64")
        offs = np.array([-2, -1, 1, 2], dtype="int64")
        nbr = (u[:, None] + offs[None, :]).ravel()
        return pa.table({"nbr": pa.array(nbr, pa.int64()),
                         "uid": pa.array(np.repeat(u, 4), pa.int64()),
                         "y": pa.array(np.repeat(y, 4), pa.int64())})

    def ids_only(batch: pa.Table) -> pa.Table:
        return pa.table({"nbr": batch.column("user_id")})

    joined = hash_join(
        per_user.map_batches(probes, batch_format="pyarrow"),
        per_user.map_batches(ids_only, batch_format="pyarrow"),
        on="nbr", how="semi")

    def coin(batch: pa.Table) -> pa.Table:
        nbr = batch.column("nbr").to_numpy().astype("int64")
        h = (nbr.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        t = (h < np.uint64(1 << 31)).astype("int64")
        return pa.table({"uid": batch.column("uid"),
                         "y": batch.column("y"),
                         "_t": pa.array(t, pa.int64())})

    g = (joined.map_batches(coin, batch_format="pyarrow")
         .groupby("uid")
         .aggregate(Count(alias_name="nn"),
                    Max("y", alias_name="y"),
                    Sum("_t", alias_name="expo")))

    def cells(batch: pa.Table) -> pa.Table:
        import pandas as pd
        df = batch.to_pandas()
        df = df[df["nn"] == 4]
        out = (df.groupby("expo", as_index=False)
               .agg(n_users=("y", "size"), n_conv=("y", "sum")))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    f = (g.map_batches(cells, batch_format="pyarrow")
         .groupby("expo")
         .aggregate(Sum("n_users", alias_name="n_users"),
                    Sum("n_conv", alias_name="n_conv"))).to_pandas()
    f = f.sort_values("expo").reset_index(drop=True)
    f = f.rename(columns={"expo": "exposure"})
    f["rate_ppm"] = [1_000_000 * int(c) // int(n)
                     for c, n in zip(f["n_conv"], f["n_users"])]
    for c in f.columns:
        f[c] = f[c].astype("int64")
    return f


def _q_mh_stratified(sf_dir: str):
    """Mantel-Haenszel stratified uplift — the Simpson's-paradox guard
    the crude arm gap lacks: if arm balance varies across activity
    strata (a bucketing bug, a targeting rule), the crude difference
    mixes the effect with the mix, and MH pools the WITHIN-stratum
    differences with the classic nt·nc/n weights.  Strata are the
    activity deciles (the uplift_deciles rank discipline).  Integer
    contract — three documented flooring layers, mirrored op-for-op:

        term_s = ss(10⁶·(ct·nc − cc·nt) / n_s)   (per-stratum RD·w)
        w_s    = 10⁶·nt·nc // n_s                (per-stratum weight)
        mh     = ss(10⁶·Σterm / Σw)

    The Knuth coin is independent of activity, so crude ≈ MH here (the
    placebo); the pinned hand case plants real confounding and shows
    the crude estimate flipping sign while MH reads the true 0.  ONE
    user exchange + the 40-cell decile rollup.  Mirror: the
    uplift_deciles CTE + per-stratum sign-split SUMs."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    from documentai_ray.stages.aggregates import global_row_index

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Count(alias_name="n_ev"),
                           Max("conv", alias_name="conv")))
    n_users = per_user.count()

    def neg(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "neg_n", pa.array((-batch.column("n_ev").to_numpy())
                              .astype("int64"), pa.int64()))

    ranked = global_row_index(
        per_user.map_batches(neg, batch_format="pyarrow"),
        val_col="neg_n", tiebreak_col="user_id", out_col="_ri")

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        t = (h < np.uint64(1 << 31)).astype("int64")
        dec = 1 + 10 * batch.column("_ri").to_numpy() // n_users
        y = (batch.column("conv").to_numpy() > 0).astype("int64")
        df = pd.DataFrame({"s": dec.astype("int64"),
                           "nt": t, "ct": t * y,
                           "nc": 1 - t, "cc": (1 - t) * y})
        g = df.groupby("s", as_index=False).sum()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    g = (ranked.map_batches(cells, batch_format="pyarrow")
         .groupby("s")
         .aggregate(*[Sum(c, alias_name=c) for c in
                      ("nt", "ct", "nc", "cc")])).to_pandas()

    def ssfloor(num: int, den: int) -> int:
        if den == 0:
            return 0
        s = 1 if (num >= 0) == (den > 0) else -1
        return s * (1_000_000 * abs(num) // abs(den))

    NT, CT = int(g["nt"].sum()), int(g["ct"].sum())
    NC, CC = int(g["nc"].sum()), int(g["cc"].sum())
    crude = (1_000_000 * CT // NT if NT else 0) \
        - (1_000_000 * CC // NC if NC else 0)
    sum_t, sum_w = 0, 0
    for _, r in g.iterrows():
        nt, ct, nc, cc = (int(r[k]) for k in ("nt", "ct", "nc", "cc"))
        ns = nt + nc
        if ns == 0:
            continue
        sum_t += ssfloor(ct * nc - cc * nt, ns)
        sum_w += 1_000_000 * nt * nc // ns
    mh = ssfloor(sum_t, sum_w)
    out = pd.DataFrame([{
        "n": NT + NC, "n_strata": len(g),
        "crude_uplift_ppm": crude, "mh_uplift_ppm": mh,
        "gap_ppm": crude - mh}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_ipf_raking(sf_dir: str):
    """Two-margin survey raking (iterative proportional fitting) —
    post_stratify's big sibling: one-margin weights fix ONE
    imbalance, but a sample skewed on source AND lang jointly needs
    the cross-classified calibration every survey shop runs.  The
    Knuth doc-coin half-sample calibrates to the full corpus's
    (source, lang) margins in two unrolled IPF steps, each a single
    floor:

        w₁(s)    = 10⁶·R_s // m_s            (row step: source margin)
        w₂(s,l)  = w₁(s)·10⁶·C_l // T_l      (col step: lang margin,
                   T_l = Σ_s n_sl·w₁(s) the current weighted total)

    After the col step the weighted lang margins match C_l up to
    flooring residue while source margins drift slightly — the classic
    IPF alternation, frozen at 2 steps so the mirror is two chained
    CTEs.  Only sampled cells emit.  Exchanges bounded by
    sources×langs (both full and sample counts ride one pass).
    Mirror: identical chained floors under HUGEINT."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source", "lang"])

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        samp = (h < np.uint64(1 << 31)).astype("int64")
        ones = np.ones(len(ids), dtype="int64")
        return pa.table({"source": batch.column("source"),
                         "lang": batch.column("lang"),
                         "_n": pa.array(ones, pa.int64()),
                         "_s": pa.array(samp, pa.int64())})

    g = (docs.map_batches(prep, batch_format="pyarrow")
         .groupby(["source", "lang"])
         .aggregate(Sum("_n", alias_name="n_full"),
                    Sum("_s", alias_name="n_samp"))).to_pandas()
    rs = g.groupby("source")["n_full"].sum().to_dict()      # R_s
    cl = g.groupby("lang")["n_full"].sum().to_dict()        # C_l
    ms = g.groupby("source")["n_samp"].sum().to_dict()      # m_s
    g = g[g["n_samp"] > 0].copy()
    g["w1"] = [1_000_000 * int(rs[s]) // int(ms[s])
               for s in g["source"]]
    tl = {}
    for _, r in g.iterrows():
        tl[r["lang"]] = tl.get(r["lang"], 0) \
            + int(r["n_samp"]) * int(r["w1"])
    g["w2_ppm"] = [int(w1) * 1_000_000 * int(cl[l]) // tl[l]
                   for w1, l in zip(g["w1"], g["lang"])]
    out = (g[["source", "lang", "n_samp", "w2_ppm"]]
           .sort_values(["source", "lang"]).reset_index(drop=True))
    out["n_samp"] = out["n_samp"].astype("int64")
    out["w2_ppm"] = out["w2_ppm"].astype("int64")
    return out


def _q_term_dispersion(sf_dir: str):
    """Gries' DP corpus dispersion for the top-10 tokens — the lexical
    statistic frequency hides: two terms with equal counts can be
    evenly spread or dumped in one source, and downstream IDF/quality
    decisions differ (a bursty term is topical or boilerplate, not
    general vocabulary).  DP = ½·Σ_s |observed share − expected
    share|, expected = each source's share of ALL tokens; exact via
    cross-multiplication with O = Σo_s (term count) and V = Σv_s
    (all tokens):

        dp_ppm = 10⁶ · Σ_s |o_s·V − v_s·O| // (2·V·O)

    one floor.  0 = perfectly proportional, →1 = one-source burst.
    ONE (token, source) exchange bounded by vocab×sources; the top-10
    pick and the 20-source fold run on the driver.  Token = the
    top_tokens single-space-split convention.  Mirror: unnest counts
    + window totals + the identical HUGEINT fold."""
    import collections

    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        c: collections.Counter = collections.Counter()
        for s, t in zip(srcs, texts):
            for tok in (t or "").split(" "):
                c[(s, tok)] += 1
        ks = list(c.keys())
        return pa.table({
            "source": pa.array([k[0] for k in ks], pa.string()),
            "token": pa.array([k[1] for k in ks], pa.string()),
            "_n": pa.array(list(c.values()), pa.int64())})

    g = (docs.map_batches(partial, batch_format="pyarrow")
         .groupby(["source", "token"])
         .aggregate(Sum("_n", alias_name="n"))).to_pandas()
    v_s = g.groupby("source")["n"].sum().to_dict()
    V = sum(int(x) for x in v_s.values())
    totals = (g.groupby("token", as_index=False)["n"].sum()
              .sort_values(["n", "token"], ascending=[False, True],
                           kind="mergesort").head(10))
    recs = []
    for tok, O in zip(totals["token"], totals["n"]):
        O = int(O)
        sub = g[g["token"] == tok].set_index("source")["n"].to_dict()
        s_abs = sum(abs(int(sub.get(s, 0)) * V - int(v) * O)
                    for s, v in v_s.items())
        recs.append((tok, O, 1_000_000 * s_abs // (2 * V * O)))
    out = pd.DataFrame(recs, columns=["token", "n_total", "dp_ppm"])
    out["n_total"] = out["n_total"].astype("int64")
    out["dp_ppm"] = out["dp_ppm"].astype("int64")
    return out


def _q_chain_ladder(sf_dir: str):
    """Chain-ladder run-off triangle — the actuarial RESERVING family:
    every cohort op so far reads what HAS happened; a finance close
    needs what's STILL COMING ("orders placed last month have only
    shipped their first tranche — project the tail").  Cohort = order
    month (order_dd//30), development = shipping delay bucketed to
    months AFTER filtering to 0 ≤ delay_days ≤ 119 (filter-then-bucket
    is load-bearing: Python floors and DuckDB truncates on negative
    days, and the synthetic dates do go negative).  With CAL =
    max(i+j) the calendar frontier, cohort i's observed age is
    J_i = min(3, CAL − i); development factors pool all cohorts that
    reached j+1:

        f_j_ppm = 10⁶·Σ_i C_{i,j+1} // Σ_i C_{i,j}   (i ≤ CAL−j−1)

    and each immature cohort chains its latest cumulative through the
    remaining factors with the markov_kstep trunc discipline
    (u ← u·f // 10⁶ per step).  ibnr = ultimate − latest is the
    revenue still to ship.  Physical plan: ONE partitioned hash_join
    (lineitem→orders, the join_revenue pattern) + ONE
    (cohort, delay) exchange bounded by months×4; the triangle fold
    is a driver pass over ≤ months×4 cells.  Mirror: identical join +
    window cumulative + 3 factor scalars + the unrolled trunc
    chain."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.joins import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice"])

    def oprep(batch: pa.Table) -> pa.Table:
        odd = (batch.column("o_orderdate").cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // 86_400_000_000)
        return pa.table({"ok": batch.column("o_orderkey"),
                         "odd": pa.array(odd.astype("int64"),
                                         pa.int64())})

    def lprep(batch: pa.Table) -> pa.Table:
        sdd = (batch.column("l_shipdate").cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // 86_400_000_000)
        rc = np.rint(batch.column("l_extendedprice").to_numpy()
                     * 100).astype("int64")
        return pa.table({"ok": batch.column("l_orderkey"),
                         "sdd": pa.array(sdd.astype("int64"),
                                         pa.int64()),
                         "rc": pa.array(rc, pa.int64())})

    joined = hash_join(li.map_batches(lprep, batch_format="pyarrow"),
                       orders.map_batches(oprep,
                                          batch_format="pyarrow"),
                       on="ok", how="inner")

    def cells(batch: pa.Table) -> pa.Table:
        sdd = batch.column("sdd").to_numpy()
        odd = batch.column("odd").to_numpy()
        rc = batch.column("rc").to_numpy()
        delay_days = sdd - odd
        keep = (delay_days >= 0) & (delay_days <= 119)
        i = (odd[keep] // 30).astype("int64")
        j = (delay_days[keep] // 30).astype("int64")
        df = pd.DataFrame({"i": i, "j": j, "rc": rc[keep]})
        g = df.groupby(["i", "j"], as_index=False)["rc"].sum()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    g = (joined.map_batches(cells, batch_format="pyarrow")
         .groupby(["i", "j"])
         .aggregate(Sum("rc", alias_name="rc"))).to_pandas()
    cal = int((g["i"] + g["j"]).max())
    # cumulative C[i][j] with missing cells as 0
    cum: dict[int, list[int]] = {}
    for i in sorted(g["i"].unique()):
        sub = g[g["i"] == i].set_index("j")["rc"].to_dict()
        run, row = 0, []
        for j in range(4):
            run += int(sub.get(j, 0))
            row.append(run)
        cum[int(i)] = row
    f = []
    for j in range(3):
        num = sum(r[j + 1] for i, r in cum.items() if i <= cal - j - 1)
        den = sum(r[j] for i, r in cum.items() if i <= cal - j - 1)
        f.append(1_000_000 * num // den if den > 0 else 1_000_000)
    recs = []
    for i, row in sorted(cum.items()):
        age = min(3, cal - i)
        latest = row[age]
        ult = latest
        for j in range(age, 3):
            ult = ult * f[j] // 1_000_000
        recs.append((i, age, latest, ult, ult - latest))
    out = pd.DataFrame(recs, columns=[
        "cohort_month", "age", "latest_cum_cents", "ultimate_cents",
        "ibnr_cents"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_fe_panel(sf_dir: str):
    """Pooled vs fixed-effects (within) slope over the customer×month
    revenue panel — the panel-econometrics readout grouped_regression
    can't give: the pooled slope of revenue on time mixes the real
    within-customer trend with COMPOSITION (big spenders entering or
    leaving the panel), and the within estimator demeans per customer
    to remove every time-invariant customer effect.  Integer
    contract: pooled is the grouped_regression formula on totals (one
    sign-split floor); within needs per-group rationals
    (Σxy_i − Σx_iΣy_i/n_i), so each group's numerator and denominator
    term floors once at micro precision

        t_i = ss(10⁶·(n_iΣxy_i − Σx_iΣy_i) / n_i)
        d_i = 10⁶·(n_iΣxx_i − (Σx_i)²) // n_i        (non-negative)

    and β_within = ss(10⁶·Σt // Σd) — the MH-style documented layered
    flooring, mirrored op-for-op.  gap = pooled − within is the
    composition bias.  Exchanges: one (customer, month) rollup + one
    customer rollup of 5 sums; scalars to the driver.  Mirror:
    two-level GROUP BY + the identical _sql_ss floors under
    HUGEINT."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        m = (batch.column("o_orderdate").cast(pa.timestamp("us"))
             .cast(pa.int64()).to_numpy() // 86_400_000_000 // 30)
        yc = np.rint(batch.column("o_totalprice").to_numpy() * 100) \
            .astype("int64")
        return pa.table({"cust": batch.column("o_custkey"),
                         "m": pa.array(m.astype("int64"), pa.int64()),
                         "y": pa.array(yc, pa.int64())})

    panel = (orders.map_batches(prep, batch_format="pyarrow")
             .groupby(["cust", "m"])
             .aggregate(Sum("y", alias_name="y")))

    def sums(batch: pa.Table) -> pa.Table:
        x = batch.column("m").to_numpy().astype("int64")
        y = batch.column("y").to_numpy().astype("int64")
        one = np.ones_like(x)
        return pa.table({"cust": batch.column("cust"),
                         "n": pa.array(one, pa.int64()),
                         "sx": pa.array(x, pa.int64()),
                         "sy": pa.array(y, pa.int64()),
                         "sxy": pa.array(x * y, pa.int64()),
                         "sxx": pa.array(x * x, pa.int64())})

    g = (panel.map_batches(sums, batch_format="pyarrow")
         .groupby("cust")
         .aggregate(*[Sum(c, alias_name=c) for c in
                      ("n", "sx", "sy", "sxy", "sxx")])).to_pandas()

    def ss(num: int, den: int) -> int:
        if den == 0:
            return 0
        s = 1 if (num >= 0) == (den > 0) else -1
        return s * (1_000_000 * abs(num) // abs(den))

    N = int(g["n"].sum())
    SX, SY = int(g["sx"].sum()), int(g["sy"].sum())
    SXY, SXX = int(g["sxy"].sum()), int(g["sxx"].sum())
    pooled = ss(N * SXY - SX * SY, N * SXX - SX * SX)
    sum_t, sum_d = 0, 0
    for _, r in g.iterrows():
        n, sx, sy, sxy, sxx = (int(r[k]) for k in
                               ("n", "sx", "sy", "sxy", "sxx"))
        wn = n * sxy - sx * sy
        wd = n * sxx - sx * sx
        st = 1 if wn >= 0 else -1
        sum_t += st * (1_000_000 * abs(wn) // n)
        sum_d += 1_000_000 * wd // n
    within = ss(sum_t, sum_d)
    out = pd.DataFrame([{
        "n_obs": N, "n_groups": len(g),
        "pooled_slope_ppm": pooled, "within_slope_ppm": within,
        "gap_ppm": pooled - within}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_matching_att(sf_dir: str):
    """Nearest-neighbor matching ATT — the causal family's
    non-parametric member (rdd needs a threshold rule, did needs two
    periods, cuped needs linearity; matching just needs overlap):
    each treated user is compared to control users at the NEAREST
    activity level, with replacement, so the treated-vs-control gap
    is read at like-for-like activity.  The covariate domain is
    bounded (n_ev ∈ a few hundred values), so matching is exact on
    the (x, arm) HISTOGRAM — no per-user pairing ever materializes:

        r_c(v)   = 10⁶·conv_c(v) // n_c(v)     (floor per ctrl value)
        match(x) = argmin_v |x−v|, tie → the SMALLER v (documented)
        att_ppm  = ss(10⁶·CT − Σ_x n_t(x)·r_c(match(x)) / N_t)

    The naive (unmatched) diff rides along — their gap is the
    selection bias matching removed.  ONE (x, arm) exchange bounded
    by the activity domain; the nearest-value fold runs over ≤
    domain² driver cells.  Mirror: histogram + row_number nearest
    join + identical floors."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Count(alias_name="n_ev"),
                           Max("conv", alias_name="conv")))

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        t = (h < np.uint64(1 << 31)).astype("int64")
        x = batch.column("n_ev").to_numpy().astype("int64")
        y = (batch.column("conv").to_numpy() > 0).astype("int64")
        df = pd.DataFrame({"x": x, "t": t, "n": 1, "c": y})
        g = df.groupby(["x", "t"], as_index=False).sum()
        for col in g.columns:
            g[col] = g[col].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    g = (per_user.map_batches(cells, batch_format="pyarrow")
         .groupby(["x", "t"])
         .aggregate(Sum("n", alias_name="n"),
                    Sum("c", alias_name="c"))).to_pandas()
    tr = g[g["t"] == 1].set_index("x")[["n", "c"]]
    ct = g[g["t"] == 0].set_index("x")[["n", "c"]]
    NT, CT = int(tr["n"].sum()), int(tr["c"].sum())
    NC, CC = int(ct["n"].sum()), int(ct["c"].sum())
    cvals = sorted(ct.index)
    rc = {v: 1_000_000 * int(ct.loc[v, "c"]) // int(ct.loc[v, "n"])
          for v in cvals}

    def match(x: int) -> int:
        return min(cvals, key=lambda v: (abs(x - v), v))

    def ss(num: int, den: int) -> int:
        if den == 0:
            return 0
        s = 1 if (num >= 0) == (den > 0) else -1
        return s * (1_000_000 * abs(num) // abs(den))

    msum = sum(int(tr.loc[x, "n"]) * rc[match(int(x))]
               for x in tr.index)
    att = ss(1_000_000 * CT - msum, 1_000_000 * NT)
    naive = (1_000_000 * CT // NT if NT else 0) \
        - (1_000_000 * CC // NC if NC else 0)
    out = pd.DataFrame([{
        "n_treat": NT, "n_ctrl": NC, "att_ppm": att,
        "naive_diff_ppm": naive, "bias_removed_ppm": naive - att}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_eb_shrink(sf_dir: str):
    """Empirical-Bayes (add-k) shrinkage of per-source English share
    toward the corpus mean — the small-segment dashboard fix: a
    source with 3 docs and 3 English reads a meaningless 100%, and
    ranking segments by raw rate always crowns the tiny ones; pulling
    each rate toward the global mean with prior strength k = 50
    pseudo-docs is the standard remedy, and with the rational mean
    E/N the whole shrunken rate clears to ONE floor:

        shrunk = (e_s + k·E/N)/(n_s + k)
               = 10⁶·(e_s·N + k·E) // (N·(n_s + k))

    raw rides along; move_ppm = shrunk − raw is the applied
    correction (small segments move a lot, big ones barely).  ONE
    source-bounded exchange.  Mirror: identical floor under
    HUGEINT."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "lang"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        en = pc.equal(batch.column("lang"), "en").cast(pa.int64())
        ones = pa.array([1] * len(batch), pa.int64())
        return pa.table({"source": batch.column("source"),
                         "_n": ones, "_en": en})

    g = (docs.map_batches(prep, batch_format="pyarrow")
         .groupby("source")
         .aggregate(Sum("_n", alias_name="n_docs"),
                    Sum("_en", alias_name="n_en"))).to_pandas()
    g = g.sort_values("source").reset_index(drop=True)
    N = int(g["n_docs"].sum())
    E = int(g["n_en"].sum())
    K = 50
    g["raw_ppm"] = [1_000_000 * int(e) // int(n)
                    for e, n in zip(g["n_en"], g["n_docs"])]
    g["shrunk_ppm"] = [
        1_000_000 * (int(e) * N + K * E) // (N * (int(n) + K))
        for e, n in zip(g["n_en"], g["n_docs"])]
    g["move_ppm"] = g["shrunk_ppm"] - g["raw_ppm"]
    for c in g.columns[1:]:
        g[c] = g[c].astype("int64")
    return g


def _q_yule_q(sf_dir: str):
    """Yule's Q per source — the bounded EFFECT SIZE the association
    family lacks: chi2_independence says the (lang, length) link is
    significant, but significance scales with n (every link is
    "significant" at corpus size); Q = (ad − bc)/(ad + bc) ∈ [−1, 1]
    is the odds-ratio transform that reads the same at any n, and
    it's fully rational — ONE sign-split floor:

        q_ppm = ss(10⁶·(ad − bc) / (ad + bc))    (0 when ad+bc = 0)

    over the per-source 2×2 of (lang = en) × (n_chars ≥ 300, the
    corpus median cut).  ONE source-bounded exchange of 4 cell
    counts.  Mirror: FILTER cells + the identical _sql_ss floor under
    HUGEINT."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["source", "lang", "n_chars"])

    def prep(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        en = pc.equal(batch.column("lang"), "en") \
            .to_numpy(zero_copy_only=False)
        lg = batch.column("n_chars").to_numpy() >= 300

        def n(mask):
            return pa.array(mask.astype("int64"), pa.int64())

        return pa.table({"source": batch.column("source"),
                         "_a": n(en & lg), "_b": n(en & ~lg),
                         "_c": n(~en & lg), "_d": n(~en & ~lg)})

    g = (docs.map_batches(prep, batch_format="pyarrow")
         .groupby("source")
         .aggregate(*[Sum(c, alias_name=c.lstrip("_")) for c in
                      ("_a", "_b", "_c", "_d")])).to_pandas()
    g = g.sort_values("source").reset_index(drop=True)

    def q(a, b, c, d):
        num = a * d - b * c
        den = a * d + b * c
        if den == 0:
            return 0
        s = 1 if num >= 0 else -1
        return s * (1_000_000 * abs(num) // den)

    g["q_ppm"] = [q(int(a), int(b), int(c), int(d))
                  for a, b, c, d in zip(g["a"], g["b"], g["c"],
                                        g["d"])]
    for c in g.columns[1:]:
        g[c] = g[c].astype("int64")
    return g


def _q_kish_neff(sf_dir: str):
    """Kish effective sample size of the IPF raking weights — the
    price tag survey calibration always carries: raking
    (``ipf_raking``) fixes the margins but UNEQUAL weights inflate
    variance, and Kish's n_eff = (Σw)²/Σw² says how many
    equal-weight observations the weighted sample is actually worth
    (deff = n/n_eff > 1 is the inflation factor).  With the cell
    weights in ppm the ratio's 10⁶ scales cancel exactly:

        n_eff_milli = 1000·S₁² // S₂      (S₁ = Σn·w, S₂ = Σn·w²)
        deff_milli  = 1000·n·S₂ // S₁²

    Same bounded (source, lang) exchange as ipf_raking; the weight
    fold reuses its two chained floors verbatim.  Mirror: the
    ipf_raking CTEs + the two HUGEINT ratios."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source", "lang"])

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        samp = (h < np.uint64(1 << 31)).astype("int64")
        ones = np.ones(len(ids), dtype="int64")
        return pa.table({"source": batch.column("source"),
                         "lang": batch.column("lang"),
                         "_n": pa.array(ones, pa.int64()),
                         "_s": pa.array(samp, pa.int64())})

    g = (docs.map_batches(prep, batch_format="pyarrow")
         .groupby(["source", "lang"])
         .aggregate(Sum("_n", alias_name="n_full"),
                    Sum("_s", alias_name="n_samp"))).to_pandas()
    rs = g.groupby("source")["n_full"].sum().to_dict()
    cl = g.groupby("lang")["n_full"].sum().to_dict()
    ms = g.groupby("source")["n_samp"].sum().to_dict()
    g = g[g["n_samp"] > 0].copy()
    g["w1"] = [1_000_000 * int(rs[s]) // int(ms[s])
               for s in g["source"]]
    tl = {}
    for _, r in g.iterrows():
        tl[r["lang"]] = tl.get(r["lang"], 0) \
            + int(r["n_samp"]) * int(r["w1"])
    g["w2"] = [int(w1) * 1_000_000 * int(cl[l]) // tl[l]
               for w1, l in zip(g["w1"], g["lang"])]
    n = int(g["n_samp"].sum())
    s1 = int((g["n_samp"] * g["w2"]).sum())
    s2 = sum(int(ns) * int(w) * int(w)
             for ns, w in zip(g["n_samp"], g["w2"]))
    out = pd.DataFrame([{
        "n_samp": n,
        "n_eff_milli": 1000 * s1 * s1 // s2,
        "deff_milli": 1000 * n * s2 // (s1 * s1)}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_cochran_armitage(sf_dir: str):
    """Cochran-Armitage trend test — the ORDERED-groups question the
    drift family can't pose: chi2_independence asks "do conversion
    rates differ across activity deciles AT ALL", but the monotone
    question ("does conversion RISE with activity") concentrates all
    the power on one degree of freedom, and CA is its exact test.
    With decile scores x_i, sizes n_i, successes r_i, everything
    clears to integers:

        T  = n·Σx_i·r_i − R·Σx_i·n_i
        B  = n·Σx_i²·n_i − (Σx_i·n_i)²
        χ² = n·T² / (R·(n−R)·B)     → chi2_milli, one floor

    flag: n·T²·10⁶ > 3841459·R(n−R)·B (the logrank cross-multiply
    discipline); trend_sign carries T's direction.  Magnitude bound
    n·T² ≲ 100·n⁵ stays inside HUGEINT through n ≈ 10⁷ users
    (documented).  ONE user exchange + the 10-row decile fold.
    Mirror: the uplift_deciles rank CTE + the identical fold."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    from documentai_ray.stages.aggregates import global_row_index

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Count(alias_name="n_ev"),
                           Max("conv", alias_name="conv")))
    n_users = per_user.count()

    def neg(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "neg_n", pa.array((-batch.column("n_ev").to_numpy())
                              .astype("int64"), pa.int64()))

    ranked = global_row_index(
        per_user.map_batches(neg, batch_format="pyarrow"),
        val_col="neg_n", tiebreak_col="user_id", out_col="_ri")

    def cells(batch: pa.Table) -> pa.Table:
        dec = 1 + 10 * batch.column("_ri").to_numpy() // n_users
        y = (batch.column("conv").to_numpy() > 0).astype("int64")
        df = pd.DataFrame({"x": dec.astype("int64"), "n": 1, "r": y})
        g = df.groupby("x", as_index=False).sum()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    g = (ranked.map_batches(cells, batch_format="pyarrow")
         .groupby("x")
         .aggregate(Sum("n", alias_name="n"),
                    Sum("r", alias_name="r"))).to_pandas()
    n = int(g["n"].sum())
    R = int(g["r"].sum())
    sxr = sum(int(x) * int(r) for x, r in zip(g["x"], g["r"]))
    sxn = sum(int(x) * int(m) for x, m in zip(g["x"], g["n"]))
    sxxn = sum(int(x) * int(x) * int(m)
               for x, m in zip(g["x"], g["n"]))
    T = n * sxr - R * sxn
    B = n * sxxn - sxn * sxn
    den = R * (n - R) * B
    chi2 = 1000 * n * T * T // den if den > 0 else 0
    sig = n * T * T * 1_000_000 > 3_841_459 * den if den > 0 \
        else False
    out = pd.DataFrame([{
        "n": n, "r": R, "trend_sign": (T > 0) - (T < 0),
        "chi2_milli": chi2, "significant": bool(sig)}])
    for c in ("n", "r", "trend_sign", "chi2_milli"):
        out[c] = out[c].astype("int64")
    return out


def _q_cost_threshold(sf_dir: str):
    """Profit-maximizing operating point — the BUSINESS sibling of
    youden_threshold: J weighs sensitivity and specificity equally,
    but a review queue where a caught return is worth 3× a wasted
    review wants argmax (3·TP − FP), an INTEGER objective needing no
    flooring at all during the sweep.  Candidates are the distinct
    scores (positive ⟺ qty ≥ t), ties take the SMALLEST threshold
    (the youden discipline); the chosen point reports its exact
    confusion and profit, with the all-positive baseline profit
    riding along (a threshold must beat classifying everything
    positive, or the queue is pointless).  Same bounded histogram
    exchange as rank_auc/youden.  Mirror: window sums + ORDER BY
    LIMIT 1."""
    import pandas as pd

    h = _score_label_hist(sf_dir)
    g = h.pivot_table(index="qty", columns="returned", values="n",
                      aggfunc="sum", fill_value=0).sort_index(
        ascending=False)
    pos = g[True].to_numpy() if True in g.columns else 0 * g.iloc[:, 0]
    neg = g[False].to_numpy() if False in g.columns \
        else 0 * g.iloc[:, 0]
    p_tot, n_tot = int(pos.sum()), int(neg.sum())
    best = None
    cum_tp = cum_fp = 0
    for qty, tp_add, fp_add in zip(g.index, pos, neg):
        cum_tp += int(tp_add)
        cum_fp += int(fp_add)
        profit = 3 * cum_tp - cum_fp
        cand = (profit, int(qty), cum_tp, cum_fp)
        # max profit; tie -> smallest threshold (qty ASC at same
        # profit == later in this descending sweep, so >= keeps it)
        if best is None or profit >= best[0]:
            best = cand
    profit, t, tp, fp = best
    out = pd.DataFrame([{
        "threshold": t, "tp": tp, "fp": fp,
        "fn": p_tot - tp, "tn": n_tot - fp,
        "profit": profit,
        "profit_all": 3 * p_tot - n_tot}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_anomaly_ensemble(sf_dir: str):
    """Detector-consensus alerts (``windows.anomaly_ensemble_int``):
    the alert-fatigue fix production monitoring actually runs — each
    spike rule in this repo has a known blind spot (events_anomaly's
    global 3σ inflates under drift, xmr_alarms under-reacts when the
    jump inflates its own moving range, seasonal_anomaly needs a real
    daily cycle), so an hour pages only when ≥ 2 of the 3 UPWARD
    rules agree, with the individual votes exposed.  Same bounded
    dense-grid exchange as the single rules.  Mirror: the dense grid
    + the three cross-multiplied inequalities + a votes filter."""
    import ray.data

    from documentai_ray.stages.windows import anomaly_ensemble_int

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
    return anomaly_ensemble_int(ev)


def _q_attribution_decay(sf_dir: str):
    """Time-decay multi-touch attribution
    (``windows.attribution_time_decay``): attribution_credit's equal
    split ignores RECENCY — a touch 5 minutes before the purchase
    deserves more than one 55 minutes before — and the decay is
    dyadic so everything stays exact: 6 ten-minute buckets across the
    hour window, bucket-k weight 2^(5−k), one floor per touch
    (10⁶·w // Σw per conversion).  The per-(conversion, touch) weight
    structure dissolves into 6 range-adds per conversion (the
    attribution_linear searchsorted pass, generalized) — no pair loop.
    Mirror: window join + the identical (diff−1)//600s bucket rule +
    per-conversion weight sums + the same floor."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.windows import attribution_time_decay

    def to_us(batch: pa.Table) -> pa.Table:
        us = (batch.column("ts").to_numpy().astype("datetime64[us]")
              .astype("int64"))
        return pa.table({"user_id": batch.column("user_id"),
                         "ts_us": pa.array(us, pa.int64()),
                         "event_type": batch.column("event_type")})

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"]
                               ).map_batches(to_us,
                                             batch_format="pyarrow")
    return attribution_time_decay(
        ds, key_col="user_id", ts_col="ts_us", type_col="event_type",
        conversion_type="purchase", window=3_600_000_000,
        bucket=600_000_000, num_partitions=32)


def _q_exposure_fairness(sf_dir: str):
    """Ranking-exposure fairness audit — the question retrieval eval
    (ndcg/mrr) never asks: a ranker can be accurate AND starve a
    source group, because user attention decays with rank; position
    exposure here is the harmonic 10⁶ // r (the ndcg discount
    discipline — exact integers, no log), over the top-100 docs by
    (n_chars DESC, doc_id) — the deterministic relevance stand-in.
    Per source group in the top-k:

        exp_share_ppm  = 10⁶·Σ_{r∈g} (10⁶//r) // Σ_r (10⁶//r)
        item_share_ppm = 10⁶·n_g // k
        disparity_ppm  = exp_share − item_share

    (> 0: the group's items cluster at the TOP of the list — it gets
    more attention than its item count earns; the equal-exposure
    baseline is item share by construction).  Top-k is a global
    sort+limit (the top_orders pattern, k bounded); the fold is a
    k-row driver pass.  Mirror: row_number + identical floors."""
    import pandas as pd
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"])
    k = 100
    top = (docs.sort(["n_chars", "doc_id"], descending=[True, False])
           .limit(k).to_pandas())
    top["rank"] = range(1, len(top) + 1)
    top["w"] = [1_000_000 // r for r in top["rank"]]
    total_w = int(top["w"].sum())
    n = len(top)
    g = (top.groupby("source", as_index=False)
         .agg(n_topk=("rank", "size"), exposure=("w", "sum")))
    g = g.sort_values("source").reset_index(drop=True)
    g["exp_share_ppm"] = [1_000_000 * int(e) // total_w
                          for e in g["exposure"]]
    g["item_share_ppm"] = [1_000_000 * int(m) // n
                           for m in g["n_topk"]]
    g["disparity_ppm"] = g["exp_share_ppm"] - g["item_share_ppm"]
    for c in g.columns[1:]:
        g[c] = g[c].astype("int64")
    return g


def _q_qte_quantiles(sf_dir: str):
    """Quantile treatment effects — the DISTRIBUTIONAL causal readout
    the mean-based ops (ab_conversion, cuped) can't see: a treatment
    can leave the mean flat while fattening the tail (heavy buyers
    spend more, light buyers less), and the QTE reads the arm gap at
    each quantile.  Purchase values in exact cents per Knuth arm, the
    p95_quantity rank discipline (smallest value whose cumulative
    count reaches ⌈p·n⌉ — no interpolation) at p ∈ {25, 50, 75, 90}:

        qte_cents(p) = v_treat(p) − v_ctrl(p)

    ONE exchange bounded by distinct cents × 2; the four rank picks
    are a driver scan over that bounded histogram.  Mirror: histogram
    + window cumsum + the same ⌈p·n⌉ pick."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = pc.equal(batch.column("event_type"),
                     "purchase").to_numpy(zero_copy_only=False)
        ids = batch.column("user_id").to_numpy()[m]
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        t = (h < np.uint64(1 << 31)).astype("int64")
        c = np.rint(batch.column("value").to_numpy()[m] * 100) \
            .astype("int64")
        df = pd.DataFrame({"cents": c, "t": t, "n": 1})
        g = df.groupby(["cents", "t"], as_index=False).sum()
        for col in g.columns:
            g[col] = g[col].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    g = (ev.map_batches(prep, batch_format="pyarrow")
         .groupby(["cents", "t"])
         .aggregate(Sum("n", alias_name="n"))).to_pandas()

    def pick(arm: int, p_num: int, p_den: int) -> int:
        sub = g[g["t"] == arm].sort_values("cents")
        n = int(sub["n"].sum())
        rank = -(-p_num * n // p_den)  # ceil(p*n)
        cum = 0
        for v, c in zip(sub["cents"], sub["n"]):
            cum += int(c)
            if cum >= rank:
                return int(v)
        raise AssertionError("rank out of range")

    recs = []
    for p in (25, 50, 75, 90):
        vt = pick(1, p, 100)
        vc = pick(0, p, 100)
        recs.append((p, vt, vc, vt - vc))
    out = pd.DataFrame(recs, columns=[
        "p_pct", "v_treat_cents", "v_ctrl_cents", "qte_cents"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_newsvendor_stock(sf_dir: str):
    """Newsvendor optimal stock — stochastic inventory OPTIMIZATION,
    not description: the quantile family reports the demand
    distribution; a buyer must pick ONE stock level s balancing
    underage cost cu = 3 (lost margin per unit short) against overage
    co = 1 (holding cost per unit over), and the newsvendor solution
    is the critical fractile cu/(cu+co) = 3/4 — stock = smallest
    demand value whose cumulative count reaches ⌈3n/4⌉ (the
    p95_quantity rank discipline).  The expected cost is EXACT on the
    demand histogram (Σ n_d·(co·(s−d)⁺ + cu·(d−s)⁺), integer), and
    the MEDIAN stock's cost rides along — the gap is what the
    fractile optimization buys over the naive mid pick (cost_opt ≤
    cost_med by construction, pinned).  Per l_returnflag; ONE
    bounded (flag, qty) histogram exchange, folds driver-side.
    Mirror: window cumsum picks + a histogram cross join for the two
    exact cost sums."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count

    CU, CO = 3, 1
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity"])

    def prep(batch: pa.Table) -> pa.Table:
        v = np.rint(batch.column("l_quantity").to_numpy()) \
            .astype("int64")
        return pa.table({"flag": batch.column("l_returnflag"),
                         "d": pa.array(v, pa.int64())})

    h = (li.map_batches(prep, batch_format="pyarrow")
         .groupby(["flag", "d"])
         .aggregate(Count(alias_name="n"))).to_pandas()
    recs = []
    for flag, sub in h.groupby("flag", sort=True):
        sub = sub.sort_values("d")
        d = sub["d"].to_numpy()
        n = sub["n"].to_numpy().astype("int64")
        tot = int(n.sum())

        def stock_at(num: int, den: int) -> int:
            rank = (num * tot + den - 1) // den
            cum = 0
            for v, c in zip(d, n):
                cum += int(c)
                if cum >= rank:
                    return int(v)
            raise AssertionError("rank out of range")

        def cost_at(s: int) -> int:
            over = np.maximum(s - d, 0)
            under = np.maximum(d - s, 0)
            return int((n * (CO * over + CU * under)).sum())

        s_opt = stock_at(CU, CU + CO)
        s_med = stock_at(1, 2)
        recs.append((flag, tot, s_opt, cost_at(s_opt), s_med,
                     cost_at(s_med)))
    out = pd.DataFrame(recs, columns=[
        "flag", "n", "stock_opt", "cost_opt", "stock_median",
        "cost_median"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def _q_competing_risks(sf_dir: str):
    """Aalen-Johansen cumulative incidence
    (``windows.competing_risks_int``): the two-cause exit question
    km_survival can't pose — a user who goes quiet either exits
    CONVERTED (last event a purchase) or ABANDONS, and per-cause
    1−KM overestimates both because a cause-1 exit removes the user
    from cause-2 risk; AJ shares s_{d−1}/n_d correctly.  Same
    lifetime/censoring contract as km_survival, per-step trunc fold
    carrying (s, cif1, cif2).  ONE key-hash exchange; ≤ horizon×3
    histogram.  Mirror: row_number last-event + the generated 30-step
    3-accumulator CTE chain."""
    import ray.data

    from documentai_ray.stages.windows import competing_risks_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"])
    return competing_risks_int(ev)


def _q_sequential_looks(sf_dir: str):
    """Group-sequential A/B monitoring — the peeking problem made
    explicit: reading the arm χ² once a week and stopping at the
    first 3.84 crossing inflates false positives several-fold, so
    sequential designs spend the α across looks; this runs the 5
    interim looks with the Bonferroni boundary (χ²₁ at α/5 = 0.01,
    the fixed constant 6634897 ppm — conservative but assumption-free,
    the same fixed-decimal convention as 3841459).  Look k uses only
    events in the first k/5 of the corpus day span (users enter as
    they first act); per look the 2×2 χ² is fully cleared:

        χ² = n·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))   → milli, 1 floor

    Emits one row per look (n, conv, chi2_milli, crossed) — the
    monitoring table itself.  ONE pass building (user, look-of-first-
    conv...) is wrong — conversion status must be AS OF the look, so
    the exchange carries per-user (first_day, conv_day_or_never) and
    the 5 looks fold from that bounded table.  Mirror: per-look
    FILTER counts + identical HUGEINT fold."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        dd = (batch.column("ts").cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy() // 86_400_000_000)
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0))) \
            .to_numpy(zero_copy_only=False)
        big = np.int64(1 << 40)
        return pa.table({
            "user_id": batch.column("user_id"),
            "dd": pa.array(dd.astype("int64"), pa.int64()),
            "cd": pa.array(np.where(conv, dd, big).astype("int64"),
                           pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Min("dd", alias_name="fd"),
                           Min("cd", alias_name="cd")))

    # look cuts from the corpus event-day span (pruned re-read, the
    # documented double-consumption rule)
    sd = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def days(batch: pa.Table) -> pa.Table:
        dd = (batch.column("ts").cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy() // 86_400_000_000)
        return pa.table({"dd": pa.array(dd.astype("int64"),
                                        pa.int64())})

    mm = sd.map_batches(days, batch_format="pyarrow") \
        .aggregate(Min("dd"), Max("dd"))
    d0, d1 = int(mm["min(dd)"]), int(mm["max(dd)"])
    span = d1 - d0 + 1
    cuts = [d0 + (span * k + 4) // 5 - 1 for k in range(1, 6)]

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").to_numpy()
        hh = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        tr = hh < np.uint64(1 << 31)
        fd = batch.column("fd").to_numpy()
        cd = batch.column("cd").to_numpy()
        rows = []
        for k, cut in enumerate(cuts, start=1):
            inn = fd <= cut
            y = cd <= cut
            rows.append((k, int((inn & tr & y).sum()),
                         int((inn & tr & ~y).sum()),
                         int((inn & ~tr & y).sum()),
                         int((inn & ~tr & ~y).sum())))
        arr = np.array(rows, dtype="int64")
        return pa.table({"look": pa.array(arr[:, 0], pa.int64()),
                         "a": pa.array(arr[:, 1], pa.int64()),
                         "b": pa.array(arr[:, 2], pa.int64()),
                         "c": pa.array(arr[:, 3], pa.int64()),
                         "d": pa.array(arr[:, 4], pa.int64())})

    g = (per_user.map_batches(cells, batch_format="pyarrow")
         .groupby("look")
         .aggregate(*[Sum(c, alias_name=c) for c in
                      ("a", "b", "c", "d")])).to_pandas()
    g = g.sort_values("look")
    CRIT = 6_634_897  # chi2_1 at alpha/5 = 0.01, ppm
    recs = []
    for _, r in g.iterrows():
        k, a, b, c, d = (int(r[x]) for x in
                         ("look", "a", "b", "c", "d"))
        n = a + b + c + d
        den = (a + b) * (c + d) * (a + c) * (b + d)
        num = a * d - b * c
        chi2 = 1000 * n * num * num // den if den > 0 else 0
        crossed = (n * num * num * 1_000_000 > CRIT * den) \
            if den > 0 else False
        recs.append((k, n, a + c, chi2, bool(crossed)))
    out = pd.DataFrame(recs, columns=[
        "look", "n", "n_conv", "chi2_milli", "crossed"])
    for col in ("look", "n", "n_conv", "chi2_milli"):
        out[col] = out[col].astype("int64")
    return out


def _q_wilcoxon_signed(sf_dir: str):
    """Wilcoxon signed-rank test — the PAIRED location test the
    two-sample family lacks: mann_whitney compares independent
    populations, but "did each user's activity CHANGE from the first
    half of the month to the second" pairs every user with itself,
    and the signed-rank statistic uses the magnitude ordering of the
    per-user differences d_u = n₂ − n₁ (zeros dropped — the classic
    convention).  Doubled midranks of |d| keep ties integral;
    W'₊ = Σ_{d>0} R' is the doubled positive-rank sum with
    E[W'₊] = n(n+1)/2 (integer), and clearing Var by 12 absorbs the
    tie cubic exactly:

        var12   = 2n(n+1)(2n+1) − T₃          (exact, NO floor)
        z2_milli = 12000·D² // var12,  D = W'₊ − n(n+1)/2
        sig      = 12·10⁶·D² > 3841459·var12

    ONE user exchange (two conditional counts), then a bounded
    diff histogram; the fold is driver-side.  Mirror: half-split
    FILTER counts + midrank windows + the identical fold."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def to_us(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"user_id": batch.column("user_id"),
                         "t_us": t})

    t = ev.map_batches(to_us, batch_format="pyarrow")
    t0 = int(t.min("t_us"))
    t1 = int(t.max("t_us"))
    t_mid = (t0 + t1 + 1) // 2

    def halves(batch: pa.Table) -> pa.Table:
        import numpy as np
        tu = batch.column("t_us").to_numpy()
        first = (tu < t_mid).astype("int64")
        return pa.table({"user_id": batch.column("user_id"),
                         "n1": pa.array(first, pa.int64()),
                         "n2": pa.array(1 - first, pa.int64())})

    per_user = (t.map_batches(halves, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Sum("n1", alias_name="n1"),
                           Sum("n2", alias_name="n2")))

    def dhist(batch: pa.Table) -> pa.Table:
        import pandas as pd
        d = (batch.column("n2").to_numpy()
             - batch.column("n1").to_numpy())
        df = pd.DataFrame({"d": d[d != 0], "n": 1})
        g = df.groupby("d", as_index=False)["n"].sum()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    h = (per_user.map_batches(dhist, batch_format="pyarrow")
         .groupby("d")
         .aggregate(Sum("n", alias_name="n"))).to_pandas()
    h["ad"] = h["d"].abs()
    v = h.groupby("ad", as_index=False)["n"].sum().sort_values("ad")
    v["cl"] = v["n"].cumsum().shift(fill_value=0)
    rp = {a: 2 * int(c) + int(m) + 1
          for a, c, m in zip(v["ad"], v["cl"], v["n"])}
    t3 = sum(int(m) ** 3 - int(m) for m in v["n"])
    n = int(h["n"].sum())
    w2 = int(sum(int(m) * rp[int(a)]
                 for d, a, m in zip(h["d"], h["ad"], h["n"])
                 if int(d) > 0))
    dd = w2 - n * (n + 1) // 2
    var12 = 2 * n * (n + 1) * (2 * n + 1) - t3
    if var12 > 0:
        z2 = 12_000 * dd * dd // var12
        sig = 12_000_000 * dd * dd > 3_841_459 * var12
    else:
        z2, sig = 0, False
    out = pd.DataFrame([{
        "n_nonzero": n, "w2_pos": w2, "t3": t3, "var12": var12,
        "z2_milli": z2,
        "shift_sign": (dd > 0) - (dd < 0),
        "significant": bool(sig)}])
    for c in out.columns[:-1]:
        out[c] = out[c].astype("int64")
    return out


def _q_nelson_aalen(sf_dir: str):
    """Nelson-Aalen cumulative hazard — the SUM companion to
    km_survival's product: KM multiplies survival factors (one
    pessimistic floor per step compounds), NA adds hazard increments
    Σ d_k/n_k, the estimator actuaries integrate risk over and the
    one whose increments are additive across strata.  Same lifetime
    / 6 h-censoring / 30-day-horizon contracts as km_survival
    (shared kernel ``windows.km_survival_int`` supplies the
    (day, at_risk, deaths, hazard_ppm) table); the NA layer is the
    running sum of the per-day hazard floors:

        cumhaz_ppm_d = Σ_{k ≤ d} 10⁶·deaths_k // at_risk_k

    — floors SUM here rather than compound, so (unlike the KM chain)
    the mirror needs NO recursive CTE, just a window cumsum: the
    structural difference between the two estimators is visible in
    the two oracles' shapes.  Cost: identical to km_survival."""
    import ray.data

    from documentai_ray.stages.windows import km_survival_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    km = km_survival_int(ev, horizon_days=30, censor_gap_hours=6)
    km = km.sort_values("day").reset_index(drop=True)
    km["cumhaz_ppm"] = km["hazard_ppm"].cumsum().astype("int64")
    return km[["day", "at_risk", "deaths", "hazard_ppm",
               "cumhaz_ppm"]]


def _q_rle_advisor(sf_dir: str):
    """RLE/dictionary encoding advisor under a candidate sort key —
    the layout question delta_varint answers for integers, asked for
    the LOW-CARDINALITY string columns: if the table were sorted by
    (ship-day, column), how many runs would each flag column
    collapse to, and does run-length or dictionary encoding win?
    The layout is histogram-computable with NO row order anywhere:
    within a day the column is sorted, so runs-in-day = distinct
    values that day, and a day boundary merges exactly when
    max(day_i) = min(day_{i+1}) over the OBSERVED-day sequence:

        n_runs     = Σ_day k_day − Σ_adjacent [max_i = min_{i+1}]
        raw_bytes  = n           (1-byte codes)
        rle_bytes  = 5·n_runs    (1-byte value + 4-byte run length)
        dict_bytes = 8·k + (n·bits(k) + 7) // 8,
                     bits(k) = max(1, bit_length(k−1))
        best       = min bytes, ties by label asc (dict<raw<rle)

    ONE (col, day, value) histogram exchange (≤ days×|values|×2);
    the fold is driver-side.  Mirror: per-day distinct/min/max +
    lag() boundary windows, UNION ALL per column."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count

    cols = ["l_returnflag", "l_linestatus"]

    def prep(batch: pa.Table) -> pa.Table:
        day = batch.column("l_shipdate").to_pandas().dt.floor("D")
        outs = []
        for c in cols:
            outs.append(pa.table({
                "col": pa.array([c] * batch.num_rows, pa.string()),
                "day": pa.Array.from_pandas(day),
                "val": batch.column(c)}))
        return pa.concat_tables(outs)

    h = (ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate"] + cols)
         .map_batches(prep, batch_format="pyarrow")
         .groupby(["col", "day", "val"])
         .aggregate(Count(alias_name="n"))).to_pandas()
    recs = []
    for c in cols:
        g = h[h["col"] == c]
        n = int(g["n"].sum())
        k = g["val"].nunique()
        per_day = g.groupby("day").agg(
            kd=("val", "nunique"), mn=("val", "min"),
            mx=("val", "max")).sort_index()
        runs = int(per_day["kd"].sum())
        merged = sum(1 for prev_mx, mn in zip(per_day["mx"][:-1],
                                              per_day["mn"][1:])
                     if prev_mx == mn)
        runs -= merged
        bits = max(1, (k - 1).bit_length())
        raw_b = n
        rle_b = 5 * runs
        dict_b = 8 * k + (n * bits + 7) // 8
        best = min([("dict", dict_b), ("raw", raw_b), ("rle", rle_b)],
                   key=lambda t: (t[1], t[0]))[0]
        recs.append((c, n, k, runs, raw_b, rle_b, dict_b, best))
    out = pd.DataFrame(recs, columns=[
        "col", "n", "n_distinct", "n_runs", "raw_bytes", "rle_bytes",
        "dict_bytes", "best"])
    for col in out.columns[1:-1]:
        out[col] = out[col].astype("int64")
    return out


def _arm_metric_stats(sf_dir: str):
    """Shared 5-metric × 2-arm 2×2 census for the multiple-testing
    pair (holm_bonferroni / bh_fdr): ONE user exchange carrying the
    five binary flags, Knuth-hash arms, fully-cleared per-metric χ²
    pieces.  Returns [(metric, n, chi2_milli, lhs, den)] with
    lhs = n·(ad−bc)² for the cross-multiplied comparisons."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        et = batch.column("event_type")
        conv = pc.and_(pc.equal(et, "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({
            "user_id": batch.column("user_id"),
            "conv": conv.cast(pa.int64()),
            "err": pc.equal(et, "error").cast(pa.int64()),
            "clk": pc.equal(et, "click").cast(pa.int64()),
            "pur": pc.equal(et, "purchase").cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Count(alias_name="n_ev"),
                           Max("conv", alias_name="conv"),
                           Max("err", alias_name="err"),
                           Max("clk", alias_name="clk"),
                           Sum("pur", alias_name="np")))
    names = ["converted", "any_error", "any_click", "repeat_buyer",
             "high_activity"]

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").to_numpy()
        hh = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        tr = hh < np.uint64(1 << 31)
        ys = [batch.column("conv").to_numpy() > 0,
              batch.column("err").to_numpy() > 0,
              batch.column("clk").to_numpy() > 0,
              batch.column("np").to_numpy() >= 12,
              batch.column("n_ev").to_numpy() >= 66]
        rows = [(name, int((tr & y).sum()), int((tr & ~y).sum()),
                 int((~tr & y).sum()), int((~tr & ~y).sum()))
                for name, y in zip(names, ys)]
        return pa.table({
            "metric": pa.array([r[0] for r in rows], pa.string()),
            "a": pa.array([r[1] for r in rows], pa.int64()),
            "b": pa.array([r[2] for r in rows], pa.int64()),
            "c": pa.array([r[3] for r in rows], pa.int64()),
            "d": pa.array([r[4] for r in rows], pa.int64())})

    g = (per_user.map_batches(cells, batch_format="pyarrow")
         .groupby("metric")
         .aggregate(*[Sum(c, alias_name=c) for c in
                      ("a", "b", "c", "d")])).to_pandas()
    stats = []
    for _, r in g.iterrows():
        name = r["metric"]
        a, b, c, d = (int(r[x]) for x in ("a", "b", "c", "d"))
        n = a + b + c + d
        den = (a + b) * (c + d) * (a + c) * (b + d)
        num = a * d - b * c
        chi2 = 1000 * n * num * num // den if den > 0 else 0
        stats.append((name, n, chi2, n * num * num, den))
    return stats


def _q_bh_fdr(sf_dir: str):
    """Benjamini-Hochberg step-UP across the same five arm metrics —
    the FDR sibling holm_bonferroni deliberately isn't: Holm controls
    the chance of ANY false positive (step-DOWN: reject until the
    first failure), BH controls the expected FALSE-DISCOVERY RATE
    and walks the other way — find the LARGEST rank i whose χ²
    clears its own threshold and reject EVERYTHING at or above it,
    so a middle metric that fails its own bar is still rejected when
    a weaker metric below it passes (the semantic difference, pinned
    in the kernel test).  Thresholds are χ²₁ at α·i/m, the fixed ppm
    constants {6634897, 5411894, 4709292, 4217885, 3841459} for
    ranks 1..5 (rank 1 = largest χ²); every comparison
    cross-multiplies the cleared n(ad−bc)² pieces.  Shares
    ``_arm_metric_stats`` (ONE user exchange) with holm.  Mirror:
    the identical CASE chain + a window MAX of the passing ranks."""
    import pandas as pd

    from documentai_ray.stages.aggregates import bh_stepup_int

    stats = _arm_metric_stats(sf_dir)
    recs = bh_stepup_int(stats)
    out = pd.DataFrame(recs, columns=[
        "metric", "rank", "chi2_milli", "crit_ppm", "rejected"])
    for col in ("rank", "chi2_milli", "crit_ppm"):
        out[col] = out[col].astype("int64")
    return out


def _q_holm_bonferroni(sf_dir: str):
    """Holm step-down correction across FIVE arm metrics — the
    multiple-comparisons discipline a metrics dashboard needs: test
    conversion AND error rate AND click rate AND repeat-purchase AND
    activity against the arms and the chance of SOME false positive
    balloons; plain Bonferroni divides α by 5 everywhere, Holm
    spends it adaptively (largest χ² faces α/5, the next α/4, …)
    and still controls FWER.  All comparisons cross-multiply against
    the fixed χ²₁ ppm constants {3841459, 5023886, 5731305, 6238804,
    6634897} (α/1..α/5 at α = 0.05 — the 3841459 fixed-decimal
    convention); rejection stops at the first failure (step-down).
    Per metric the 2×2 χ² is fully cleared (one milli floor for
    display).  ONE user exchange carrying 5 binary flags (shared
    via ``_arm_metric_stats`` with bh_fdr).  Mirror: FILTER counts
    + the identical ordered CASE chain."""
    import pandas as pd

    stats = _arm_metric_stats(sf_dir)
    CRITS = [3_841_459, 5_023_886, 5_731_305, 6_238_804, 6_634_897]
    # step-down: largest chi2 faces the strictest threshold
    stats.sort(key=lambda r: (-r[2], r[0]))
    recs, alive = [], True
    for i, (name, n, chi2, lhs, den) in enumerate(stats):
        crit = CRITS[len(stats) - 1 - i]
        passes = den > 0 and lhs * 1_000_000 > crit * den
        rejected = alive and passes
        if not passes:
            alive = False
        recs.append((name, i + 1, chi2, crit, bool(rejected)))
    out = pd.DataFrame(recs, columns=[
        "metric", "rank", "chi2_milli", "crit_ppm", "rejected"])
    for col in ("rank", "chi2_milli", "crit_ppm"):
        out[col] = out[col].astype("int64")
    return out


_RAKE_STOPWORDS = ["the", "a", "and", "of", "is", "to", "in"]


def _q_cdc_chunks(sf_dir: str):
    """Content-defined chunking dedup audit — the STORAGE-dedup
    primitive the document-level family can't see: docs_exact_dedup
    kills whole-document duplicates and minhash finds near-dup
    DOCUMENTS, but backup/blob stores (LBFS, restic, borg) dedup
    SUB-document chunks whose boundaries are content-defined — a
    token whose hash ≡ 0 (mod 16) ends a chunk, so an edit
    invalidates only the chunks it touches while fixed blocking
    shifts every later boundary.  Runs ``dedup.cdc_chunk_stats``
    (per-batch pre-combined, ONE distinct-chunk-bounded exchange)
    and folds the corpus readout:

        dedup_ratio_ppm = 10⁶·(total_chars − distinct_chars)
                          // total_chars

    — the fraction of stored bytes a chunk store would NOT write
    again.  The template-heavy corpus (PO/invoice archetypes differ
    only in planted numbers) guarantees shared chunks, asserted
    nonzero.  Mirror: token islands via shifted-cumsum windows +
    string_agg + the md5-LE64 expression."""
    import pandas as pd
    import ray.data

    from documentai_ray.stages.dedup import cdc_chunk_stats

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    n_docs = ds.count()
    g = cdc_chunk_stats(ds).to_pandas()
    total_chunks = int(g["n"].sum())
    distinct_chunks = len(g)
    total_chars = int((g["n"] * g["chars"]).sum())
    distinct_chars = int(g["chars"].sum())
    out = pd.DataFrame([{
        "n_docs": n_docs, "total_chunks": total_chunks,
        "distinct_chunks": distinct_chunks,
        "total_chars": total_chars,
        "distinct_chars": distinct_chars,
        "dedup_ratio_ppm": (1_000_000
                            * (total_chars - distinct_chars)
                            // total_chars if total_chars else 0)}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_rake_keyphrases(sf_dir: str):
    """RAKE keyphrase extraction — the PHRASE-level salience op the
    token family lacks: top_tokens/tfidf_topk score single tokens,
    collocation_lift scores fixed bigrams, but "which multi-word
    phrases characterize the corpus" wants stopword-delimited
    candidate phrases scored by their words' degree/frequency ratio
    (RAKE: a word appearing in long phrases earns degree ≫
    frequency).  Contracts:

        phrase      = maximal run of non-stopword tokens (single-
                      space join), per document
        freq(w)     = occurrences of w across all phrase instances
        deg(w)      = Σ phrase length over w's occurrences
        score(w)    = 10⁶·deg(w) // freq(w)    (one floor per word)
        score(phr)  = Σ_w score(w)  (per occurrence, repeats count)

    Top-20 by (score desc, phrase asc).  Physical plan: per-batch
    phrase extraction (the top_tokens Counter discipline) → ONE
    vocab-bounded word-stat exchange broadcast back via ray.put
    (stopword-free vocab is small by construction — documented) →
    phrase-count exchange → global sort+limit.  Mirror: island
    windows + per-token deg/freq joins + identical floors."""
    import collections

    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    stops = set(_RAKE_STOPWORDS)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def phrases_of(t: str):
        cur = []
        for tok in (t or "").split():
            if tok in stops:
                if cur:
                    yield cur
                    cur = []
            else:
                cur.append(tok)
        if cur:
            yield cur

    def word_partial(batch: pa.Table) -> pa.Table:
        freq = collections.Counter()
        deg = collections.Counter()
        for t in batch.column("text").to_pylist():
            for ph in phrases_of(t):
                for w in ph:
                    freq[w] += 1
                    deg[w] += len(ph)
        ws = list(freq.keys())
        return pa.table({
            "w": pa.array(ws, pa.string()),
            "freq": pa.array([freq[w] for w in ws], pa.int64()),
            "deg": pa.array([deg[w] for w in ws], pa.int64())})

    wstats = (ds.map_batches(word_partial, batch_format="pyarrow")
              .groupby("w")
              .aggregate(Sum("freq", alias_name="freq"),
                         Sum("deg", alias_name="deg"))).to_pandas()
    wscore = {w: 1_000_000 * int(d) // int(f)
              for w, f, d in zip(wstats["w"], wstats["freq"],
                                 wstats["deg"])}
    ref = ray.put(wscore)

    def phrase_partial(batch: pa.Table) -> pa.Table:
        sc = ray.get(ref)
        c = collections.Counter()
        score = {}
        for t in batch.column("text").to_pylist():
            for ph in phrases_of(t):
                s = " ".join(ph)
                c[s] += 1
                if s not in score:
                    score[s] = sum(sc[w] for w in ph)
        ps = list(c.keys())
        return pa.table({
            "phrase": pa.array(ps, pa.string()),
            "n": pa.array([c[p] for p in ps], pa.int64()),
            "score_ppm": pa.array([score[p] for p in ps], pa.int64())})

    from ray.data.aggregate import Max

    out = (ds.map_batches(phrase_partial, batch_format="pyarrow")
           .groupby("phrase")
           .aggregate(Sum("n", alias_name="n"),
                      Max("score_ppm", alias_name="score_ppm"))
           .sort(["score_ppm", "phrase"], descending=[True, False])
           .limit(20)).to_pandas()
    for c in ("n", "score_ppm"):
        out[c] = out[c].astype("int64")
    return out[["phrase", "n", "score_ppm"]]


_CONFORMANCE_MODEL = [
    ("signup", "view"), ("view", "view"), ("view", "click"),
    ("click", "view"), ("click", "purchase"), ("purchase", "view"),
]


def _q_cochran_q(sf_dir: str):
    """Cochran's Q over the four technique-agreement indicators —
    the k-RATER marginal-homogeneity test that closes the agreement
    suite: mcnemar_test compares TWO techniques' error rates,
    fleiss_kappa scores agreement beyond chance, kr20 scores
    reliability — Q asks "do the FOUR techniques have different
    marginal agreement rates at all", the k-sample McNemar.  With
    binary items x_ui, item totals C_j, page totals X_u, S = ΣC_j:

        Q = (k−1)·[k·ΣC_j² − S²] / [k·S − ΣX_u²]
        q_milli = 1000·num // den, trunc (num ≥ 0 by Cauchy-Schwarz)
        sig: num·10⁶ > 7814728·den   (chi²₃ at 5%)

    The planted corpus collapses Q to a CLOSED FORM: only ambiguous
    POs defect and both defectors defect together, so
    num = 3·(4·ΣC² − S²) = 12b² and den = 4b — Q = 3b exactly, and
    significance is literally "are there ≥ 3 ambiguous pages"
    (3b·10⁶ > 7814728 ⟺ b ≥ 3), pinned.  Same single-row partials
    as kr20 (ONE 6-integer fold).  Mirror: the census closed form
    kept in general Q shape."""
    import pandas as pd
    import pyarrow as pa

    from documentai_ray.pipelines.flagship import flagship

    techs = ["tech_keyword", "tech_regex", "tech_tokenset", "tech_ml"]
    ds = flagship(sf_dir=sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        cat = batch.column("category").to_pandas()
        x = sum((batch.column(t).to_pandas() == cat).astype(int)
                for t in techs)
        cols = {"n": [batch.num_rows], "sxx": [int((x * x).sum())]}
        for t in techs:
            cols[f"c_{t[5:]}"] = [
                int((batch.column(t).to_pandas() == cat).sum())]
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in cols.items()})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .sum(["n", "sxx"] + [f"c_{t[5:]}" for t in techs]))
    n = int(g["sum(n)"])
    sxx = int(g["sum(sxx)"])
    cs = [int(g[f"sum(c_{t[5:]})"]) for t in techs]
    s = sum(cs)
    num = 3 * (4 * sum(c * c for c in cs) - s * s)
    den = 4 * s - sxx
    q = 1000 * num // den if den > 0 else 0
    sig = num * 1_000_000 > 7_814_728 * den if den > 0 else False
    out = pd.DataFrame([{
        "n_pages": n, "c_keyword": cs[0], "c_regex": cs[1],
        "c_tokenset": cs[2], "c_ml": cs[3],
        "q_milli": q, "significant": bool(sig)}])
    for col in out.columns[:-1]:
        out[col] = out[col].astype("int64")
    return out


def _q_conformance_check(sf_dir: str):
    """Process-mining log conformance — the REFERENCE-MODEL judgment
    event_transitions refuses to make: the transition matrix says
    what users DO, conformance says how much of it the designed
    funnel (signup→view→click→purchase with view loops and
    click/purchase returns) ALLOWS.  Every observed (prev → next)
    adjacency (per user, ordered by ts with event_id tiebreak — the
    transitions_per_key contract) is judged against the 6-edge
    model; output is the judged transition matrix plus the log
    fitness scalar conformance_ppm = 10⁶·Σ allowed n // Σ n (one
    floor) riding every row.  Transitions into/out of 'error' are
    off-model by design — the corpus guarantees a nonzero violation
    mass.  Costs ONE key-hash exchange of ≤ P·|types|² partials.
    Mirror: lag() window + the literal IN list."""
    import pandas as pd
    import ray.data

    from documentai_ray.stages.windows import transitions_per_key

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"])
    g = transitions_per_key(ev).to_pandas()
    allowed = set(_CONFORMANCE_MODEL)
    g["allowed"] = [
        (p, x) in allowed
        for p, x in zip(g["prev_type"], g["next_type"])]
    total = int(g["n"].sum())
    ok = int(g.loc[g["allowed"], "n"].sum())
    g["conformance_ppm"] = 1_000_000 * ok // total if total else 0
    g = g.sort_values(["prev_type", "next_type"]).reset_index(drop=True)
    for c in ("n", "conformance_ppm"):
        g[c] = g[c].astype("int64")
    return g[["prev_type", "next_type", "n", "allowed",
              "conformance_ppm"]]


def _q_page_trend(sf_dir: str):
    """Page's L test for ORDERED within-block trend — the cell that
    completes the rank-test matrix: kruskal_wallis (independent,
    unordered), cochran_armitage (independent, ordered), friedman
    (blocked, unordered) — Page is blocked AND ordered: "does
    per-user activity RISE across the four quarters of the corpus
    month", ranking each user's quarter counts WITHIN the user
    (volume-free) and concentrating all power on the monotone
    alternative Friedman dilutes over k−1 df.  Quarters are the
    deterministic time buckets j = 1 + min(k−1,
    (t − t₀)·k // (span+1)) from the global min/max; doubled
    midranks (the friedman discipline) make L' = Σ j·R'_j integer
    with E[L'] = n·k(k+1)²/2 (always integral — k(k+1)² is even)
    and 36·Var(L') = n·k²(k+1)(k²−1):

        z2_milli = 36000·D² // (n·k²(k+1)(k²−1)),  D = L' − E[L']
        sig      = 36·10⁶·D² > 3841459·n·k²(k+1)(k²−1)
        trend_sign = sign(D)  (+1 = later quarters rank higher)

    (within-block ties uncorrected — the KW/friedman convention.)
    ONE (user, bucket) count exchange + user-hash partitions ranking
    vectorized; k-row partials.  Mirror: bucket CTE + the friedman
    grid/midrank windows + the identical fold."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    from documentai_ray.stages.dedup import _add_pkey

    k = 4
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def to_us(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"user_id": batch.column("user_id"),
                         "t_us": t})

    t = ev.map_batches(to_us, batch_format="pyarrow")
    t0 = int(t.min("t_us"))
    t1 = int(t.max("t_us"))
    span = t1 - t0 + 1

    def bucket(batch: pa.Table) -> pa.Table:
        import numpy as np
        tu = batch.column("t_us").to_numpy()
        j = 1 + np.minimum(k - 1, (tu - t0) * k // span)
        return pa.table({"user_id": batch.column("user_id"),
                         "bucket": pa.array(j, pa.int64())})

    counts = (t.map_batches(bucket, batch_format="pyarrow")
              .groupby(["user_id", "bucket"])
              .aggregate(Count(alias_name="cnt")))
    buckets = list(range(1, k + 1))

    def rank_block(g: pd.DataFrame) -> pd.DataFrame:
        wide = g.pivot_table(index="user_id", columns="bucket",
                             values="cnt", aggfunc="sum", fill_value=0)
        wide = wide.reindex(columns=buckets, fill_value=0)
        r2 = (wide.rank(axis=1, method="average") * 2).astype("int64")
        return pd.DataFrame({
            "bucket": buckets,
            "rsum2": [int(r2[b].sum()) for b in buckets],
            "nu": len(wide)})

    keyed = _add_pkey(counts, "user_id", 16)
    g = (keyed.groupby("_pkey")
         .map_groups(lambda d: rank_block(d.drop(columns=["_pkey"])),
                     batch_format="pandas")
         .groupby("bucket")
         .aggregate(Sum("rsum2", alias_name="rsum2"),
                    Sum("nu", alias_name="nu"))).to_pandas()
    g = g.sort_values("bucket").reset_index(drop=True)
    n = int(g["nu"].sum()) // k
    l2 = int(sum(int(b) * int(r) for b, r in zip(g["bucket"],
                                                 g["rsum2"])))
    d = l2 - n * k * (k + 1) * (k + 1) // 2
    den = n * k * k * (k + 1) * (k * k - 1)
    z2 = 36_000 * d * d // den
    sig = 36_000_000 * d * d > 3_841_459 * den
    out = g[["bucket", "rsum2"]].copy()
    out["n_users"] = n
    out["l2"] = l2
    out["z2_milli"] = z2
    out["trend_sign"] = (d > 0) - (d < 0)
    out["significant"] = bool(sig)
    for c in ("bucket", "rsum2", "n_users", "l2", "z2_milli",
              "trend_sign"):
        out[c] = out[c].astype("int64")
    return out


def _q_survival_cindex(sf_dir: str):
    """Harrell's concordance index — the MODEL-EVAL layer the
    survival family lacks: km_survival describes the population
    curve, competing_risks splits it by cause, but "does per-user
    activity PREDICT who goes quiet sooner" scores a risk score
    against censored outcomes, and no ROC applies (rank_auc needs
    uncensored labels).  Conventions shared verbatim with
    km_survival: lifetime T = whole days first→last event, death
    observed iff the user went quiet ≥ 6 h before corpus max; risk
    score S = the user's event count.  The pair contract:

        comparable: (T_i < T_j ∧ E_i=1) ∨ (T_i = T_j ∧ E_i=1 ∧ E_j=0)
        credit:     2 if S_i > S_j, 1 if S_i = S_j (doubled units)
        c_index_ppm = 10⁶·c2 // comp2   (one floor; 500000 = chance)

    Physical plan: ONE user exchange → a bounded (T, E, S) histogram
    (≤ days×2×|scores|) → an O(cells·|scores|) suffix-cumulative
    fold driver-side — NO pair enumeration anywhere distributed.
    The oracle is deliberately a DIFFERENT algorithm (the direct
    quadratic pair join DuckDB can afford at test scale), so the
    suffix fold is checked against first principles rather than a
    mirror of itself."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Min

    day_us = 86_400_000_000
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def to_us(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"user_id": batch.column("user_id"),
                         "t_us": t})

    t = ev.map_batches(to_us, batch_format="pyarrow")
    t_max = int(t.max("t_us"))
    per_user = (t.groupby("user_id")
                .aggregate(Min("t_us", alias_name="f"),
                           Max("t_us", alias_name="l"),
                           Count(alias_name="s")))

    def cells(batch: pa.Table) -> pa.Table:
        f = batch.column("f").to_numpy()
        l = batch.column("l").to_numpy()
        s = batch.column("s").to_numpy().astype("int64")
        td = (l - f) // day_us
        e = ((t_max - l) >= 6 * 3_600_000_000).astype("int64")
        df = pd.DataFrame({"t": td.astype("int64"), "e": e, "s": s,
                           "n": 1})
        g = df.groupby(["t", "e", "s"], as_index=False)["n"].sum()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    from ray.data.aggregate import Sum
    h = (per_user.map_batches(cells, batch_format="pyarrow")
         .groupby(["t", "e", "s"])
         .aggregate(Sum("n", alias_name="n"))).to_pandas()
    scores = np.sort(h["s"].unique())
    idx = {v: i for i, v in enumerate(scores)}
    suffix = np.zeros(len(scores), dtype=object)   # counts with T > t
    c2 = comp2 = 0
    for tt in sorted(h["t"].unique(), reverse=True):
        at_t = h[h["t"] == tt]
        cens = np.zeros(len(scores), dtype=object)
        for _, r in at_t[at_t["e"] == 0].iterrows():
            cens[idx[int(r["s"])]] += int(r["n"])
        suf_prefix = np.cumsum(suffix)
        cen_prefix = np.cumsum(cens)
        suf_tot = int(suf_prefix[-1]) if len(scores) else 0
        cen_tot = int(cen_prefix[-1]) if len(scores) else 0
        for _, r in at_t[at_t["e"] == 1].iterrows():
            si, ni = idx[int(r["s"])], int(r["n"])
            lower = int(suf_prefix[si - 1]) if si else 0
            equal = int(suffix[si])
            c_lower = int(cen_prefix[si - 1]) if si else 0
            c_equal = int(cens[si])
            c2 += ni * (2 * (lower + c_lower) + equal + c_equal)
            comp2 += ni * 2 * (suf_tot + cen_tot)
        for _, r in at_t.iterrows():
            suffix[idx[int(r["s"])]] += int(r["n"])
    out = pd.DataFrame([{
        "n_users": int(h["n"].sum()),
        "n_events": int(h.loc[h["e"] == 1, "n"].sum()),
        "comp2": comp2, "c2": c2,
        "c_index_ppm": 1_000_000 * c2 // comp2 if comp2 else 0}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_selectivity_audit(sf_dir: str):
    """Attribute-value-independence (AVI) selectivity audit — the
    QUERY-PLANNER statistic the profiling family lacks:
    profile_columns gives per-column stats, fd_mine finds exact
    dependencies, but a cost-based optimizer multiplies single-column
    selectivities (the AVI assumption) and the interesting question
    is WHERE that lie is worst.  For the three lineitem predicates
    return (l_returnflag = 'R'), bigqty (qty ≥ 30), lsF
    (l_linestatus = 'F'), each pair/triple row reports

        actual_ppm = 10⁶·c_combo // n           (one floor)
        avi_ppm    = 10⁶·Πc_i // n^k            (one floor)
        diff_ppm   = actual − avi   (signed; ≈0 ⟺ independent)

    This corpus draws all three columns independently, so the audit
    READS ≈0 everywhere (|diff| ≲ 10² ppm sampling noise at sf0.01 —
    a verified-independence finding is still a finding: the planner
    may multiply); the hand test plants a fully dependent corpus
    where AVI under-estimates 4× .  Πc_i ≤ n³ ~ 10²⁰ at sf1 —
    HUGEINT, documented.  ONE scan of 8 FILTER counters; no
    exchange beyond the scalar partials.  Mirror: the same FILTER
    counts + identical floors."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        r = pc.equal(batch.column("l_returnflag"), "R").to_numpy(
            zero_copy_only=False)
        q = np.rint(batch.column("l_quantity").to_numpy()) >= 30
        f = pc.equal(batch.column("l_linestatus"), "F").to_numpy(
            zero_copy_only=False)
        vals = [batch.num_rows, int(r.sum()), int(q.sum()),
                int(f.sum()), int((r & q).sum()), int((r & f).sum()),
                int((q & f).sum()), int((r & q & f).sum())]
        names = ["n", "c_r", "c_q", "c_f", "c_rq", "c_rf", "c_qf",
                 "c_rqf"]
        return pa.table({k: pa.array([v], pa.int64())
                         for k, v in zip(names, vals)})

    g = (ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_linestatus"])
         .map_batches(partial, batch_format="pyarrow")
         .sum(["n", "c_r", "c_q", "c_f", "c_rq", "c_rf", "c_qf",
               "c_rqf"]))
    n = int(g["sum(n)"])
    c = {k: int(g[f"sum({k})"]) for k in
         ["c_r", "c_q", "c_f", "c_rq", "c_rf", "c_qf", "c_rqf"]}
    combos = [
        ("return&bigqty", c["c_rq"], c["c_r"] * c["c_q"], n * n),
        ("return&lsF", c["c_rf"], c["c_r"] * c["c_f"], n * n),
        ("bigqty&lsF", c["c_qf"], c["c_q"] * c["c_f"], n * n),
        ("return&bigqty&lsF", c["c_rqf"],
         c["c_r"] * c["c_q"] * c["c_f"], n * n * n)]
    recs = []
    for name, actual, prod, den in combos:
        a_ppm = 1_000_000 * actual // n
        avi = 1_000_000 * prod // den
        recs.append((name, n, a_ppm, avi, a_ppm - avi))
    out = pd.DataFrame(recs, columns=["pred", "n_rows", "actual_ppm",
                                      "avi_ppm", "diff_ppm"])
    for col in out.columns[1:]:
        out[col] = out[col].astype("int64")
    return out


def _q_yule_k(sf_dir: str):
    """Yule's characteristic K + Simpson repeat rate — the
    LENGTH-INVARIANT lexical-diversity constants the richness family
    doesn't give: vocab/TTR shrinks as any corpus grows (Heaps), so
    two corpora of different sizes can't be compared on it;
    Yule's K and Simpson's repeat probability are (asymptotically)
    length-free, and both are pure functions of the SAME
    frequency-of-frequency exchange species_richness ships:

        S2          = Σ_m m²·V_m  (= Σ_tokens freq² — computed as
                      Σ m·mass_m, mass already on the exchange)
        yule_k_milli = 10⁷·(S2 − N) // N²       (K ≈ 100-200 for
                       natural text; milli-K, one floor)
        simpson_ppm  = 10⁶·(S2 − N) // (N·(N−1))  (the chance two
                       tokens drawn WITHOUT replacement coincide)

    10⁷·S2 ≲ 10⁷·N·max_f — HUGEINT at web scale, documented.
    Mirror: unnest + two GROUP BYs + the identical fold."""
    import collections

    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        c = collections.Counter()
        for t in batch.column("text").to_pylist():
            c.update((t or "").split())
        return pa.table({
            "token": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64())})

    tf = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby("token")
          .aggregate(Sum("n", alias_name="n")))

    def freq_partial(batch: pa.Table) -> pa.Table:
        c = collections.Counter(batch.column("n").to_pylist())
        return pa.table({
            "freq": pa.array(list(c.keys()), pa.int64()),
            "n_tokens": pa.array(list(c.values()), pa.int64()),
            "mass": pa.array([k * v for k, v in c.items()],
                             pa.int64())})

    ff = (tf.map_batches(freq_partial, batch_format="pyarrow")
          .groupby("freq")
          .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                     Sum("mass", alias_name="mass"))).to_pandas()
    s_obs = int(ff["n_tokens"].sum())
    n = int(ff["mass"].sum())
    s2 = int(sum(int(m) * int(ms)
                 for m, ms in zip(ff["freq"], ff["mass"])))
    out = pd.DataFrame([{
        "n_tokens": n, "vocab": s_obs, "s2": s2,
        "yule_k_milli": 10_000_000 * (s2 - n) // (n * n),
        "simpson_ppm": 1_000_000 * (s2 - n) // (n * (n - 1))}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_mann_whitney(sf_dir: str):
    """Mann-Whitney U with tie-corrected normal significance — the
    INFERENCE layer rank_auc deliberately lacks: AUC = U/(n₁n₂) says
    HOW WELL quantity ranks returns, but not whether the separation
    beats chance at this sample size; the U test is that answer, and
    every piece is rational.  Doubled midranks (the kruskal_wallis
    discipline): U' = R'₊ − n₁(n₁+1) is the DOUBLED U, the centered
    statistic D = U' − n₁n₂ = 2(U − μ), and with the tie cubic
    T₃ = Σ(t³−t),

        var12     = n₁n₂·(n(n−1)(n+1) − T₃) // (n(n−1))
                    (12·Var(U), ONE shared floor)
        z2_milli  = 3000·D² // var12
        sig       = 3·10⁶·D² > 3841459·var12
                    (z² vs the chi²₁ 5% bound, exact on the shared
                     var12)

    D ≤ n₁n₂ keeps 3·10⁶·D² ≲ 2·10³² at sf1 — HUGEINT, documented.
    All-tied corpora have var12 = 0 → z2 = 0, not significant (the
    guard).  Same ONE bounded (qty, returned) histogram exchange as
    rank_auc/youden.  Mirror: histogram + window midranks +
    identical HUGEINT fold."""
    import pandas as pd

    h = _score_label_hist(sf_dir)
    v = h.groupby("qty", as_index=False)["n"].sum().sort_values("qty")
    v["cl"] = v["n"].cumsum().shift(fill_value=0)
    rp = {q: 2 * int(c) + int(m) + 1
          for q, c, m in zip(v["qty"], v["cl"], v["n"])}
    t3 = sum(int(m) ** 3 - int(m) for m in v["n"])
    pos = h[h["returned"]]
    neg = h[~h["returned"]]
    n1 = int(pos["n"].sum())
    n2 = int(neg["n"].sum())
    n = n1 + n2
    rsum2 = sum(int(m) * rp[q] for q, m in zip(pos["qty"], pos["n"]))
    u2 = rsum2 - n1 * (n1 + 1)
    d = u2 - n1 * n2
    var12 = n1 * n2 * (n * (n - 1) * (n + 1) - t3) // (n * (n - 1))
    if var12 > 0:
        z2 = 3000 * d * d // var12
        sig = 3_000_000 * d * d > 3_841_459 * var12
    else:
        z2, sig = 0, False
    out = pd.DataFrame([{
        "n_pos": n1, "n_neg": n2, "u2": u2, "t3": t3,
        "var12": var12, "z2_milli": z2, "significant": bool(sig)}])
    for c in out.columns[:-1]:
        out[c] = out[c].astype("int64")
    return out


def _q_kr20_reliability(sf_dir: str):
    """Kuder-Richardson 20 (Cronbach's α for binary items) over the
    four technique-agreement indicators — the INTERNAL-CONSISTENCY
    question the agreement family hasn't asked: fleiss_kappa scores
    raters against each other, mcnemar_test compares two of them,
    but "do the four indicators measure ONE underlying thing"
    (page classifiability) is reliability, and with binary items
    x_ui = [technique i matched the fused verdict on page u] every
    term clears to integers: item totals c_i, page totals X_u,

        V = n·ΣX² − (ΣX)²          (n²·the total-score variance)
        S = Σ_i c_i·(n − c_i)      (n²·Σ p_i·q_i)
        α = k/(k−1) · (V − S)/V    → alpha_milli, trunc-toward-zero

    (V = 0 — every page the same total — reads 1000 by convention.)
    The planted corpus makes α CLOSED-FORM: only ambiguous POs
    defect, and both defectors (regex, tokenset) defect on the SAME
    pages, so S = 2b(n−b), V = 4b(n−b), α = (4/3)·(1/2) = 2/3 →
    exactly 666 at every scale — the perfectly-correlated-defectors
    signature, pinned.  ΣX and ΣX² are single-row per-batch
    partials; ONE 4-integer fold.  Mirror: the census closed form."""
    import pandas as pd
    import pyarrow as pa

    from documentai_ray.pipelines.flagship import flagship

    techs = ["tech_keyword", "tech_regex", "tech_tokenset", "tech_ml"]
    ds = flagship(sf_dir=sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        cat = batch.column("category").to_pandas()
        x = sum((batch.column(t).to_pandas() == cat).astype(int)
                for t in techs)
        cols = {"n": [batch.num_rows],
                "sx": [int(x.sum())], "sxx": [int((x * x).sum())]}
        for t in techs:
            cols[f"c_{t[5:]}"] = [
                int((batch.column(t).to_pandas() == cat).sum())]
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in cols.items()})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .sum(["n", "sx", "sxx"] + [f"c_{t[5:]}" for t in techs]))
    n = int(g["sum(n)"])
    sx = int(g["sum(sx)"])
    sxx = int(g["sum(sxx)"])
    cs = [int(g[f"sum(c_{t[5:]})"]) for t in techs]
    v = n * sxx - sx * sx
    s = sum(c * (n - c) for c in cs)
    if v == 0:
        alpha = 1000
    else:
        num = 4 * (v - s)
        den = 3 * v
        alpha = (abs(num) * 1000 // den) * (1 if num >= 0 else -1)
    out = pd.DataFrame([{
        "n_pages": n, "k_items": 4, "sum_pq_n2": s,
        "var_n2": v, "alpha_milli": alpha}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_friedman_test(sf_dir: str):
    """Friedman within-block rank test — the REPEATED-MEASURES
    question kruskal_wallis can't pose: KW pools independent samples,
    but "do the five event types differ in per-USER activity" must
    rank WITHIN each user (users differ wildly in total volume — a
    between-user pooling would measure user size, not type
    preference).  Each user is a block: their k per-type counts
    (absent types = 0) rank 1..k with DOUBLED midranks; per-type
    sums R'_j feed ``aggregates.friedman_int`` (S = ΣR'_j² exact —
    uniform block membership needs NO per-group floor, unlike KW).
    Distribution: ONE (user,type) count exchange, then user-hash
    partitions rank ALL their users in one vectorized pandas pass
    (pivot + rank(axis=1)·2 — the sessionize discipline, groups
    bounded by P not by user count) and ship k-row partials.
    Mirror: user×type grid via CROSS JOIN + LEFT JOIN, doubled
    midranks as 2·rank + tie-count − 1 windows, identical fold."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Sum

    from documentai_ray.stages.aggregates import friedman_int
    from documentai_ray.stages.dedup import _add_pkey

    counts = (ray.data.read_parquet(
                  f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type"])
              .groupby(["user_id", "event_type"])
              .aggregate(Count(alias_name="cnt")))
    types = sorted(counts.groupby("event_type")
                   .aggregate(Count(alias_name="_n"))
                   .to_pandas()["event_type"])

    def rank_block(g: pd.DataFrame) -> pd.DataFrame:
        wide = g.pivot_table(index="user_id", columns="event_type",
                             values="cnt", aggfunc="sum", fill_value=0)
        wide = wide.reindex(columns=types, fill_value=0)
        r2 = (wide.rank(axis=1, method="average") * 2).astype("int64")
        return pd.DataFrame({
            "event_type": types,
            "rsum2": [int(r2[t].sum()) for t in types],
            "nu": len(wide)})

    keyed = _add_pkey(counts, "user_id", 16)
    g = (keyed.groupby("_pkey")
         .map_groups(lambda d: rank_block(d.drop(columns=["_pkey"])),
                     batch_format="pandas")
         .groupby("event_type")
         .aggregate(Sum("rsum2", alias_name="rsum2"),
                    Sum("nu", alias_name="nu"))).to_pandas()
    n = int(g["nu"].sum()) // len(types)
    chi2, sig = friedman_int(dict(zip(g["event_type"], g["rsum2"])), n)
    out = g[["event_type", "rsum2"]].copy()
    out["n_users"] = n
    out["chi2_milli"] = chi2
    out["significant"] = sig
    for c in ("rsum2", "n_users", "chi2_milli"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def _q_mcnemar_test(sf_dir: str):
    """McNemar's paired test on the keyword-vs-regex techniques —
    the PAIRED question the independence family can't pose:
    chi2_independence compares unpaired populations, but two
    classifiers judged on the SAME pages share every item, and only
    the DISCORDANT pairs carry information: b = keyword matches the
    fused consensus where regex doesn't, c = the reverse; the
    marginal-homogeneity statistic is (b−c)²/(b+c), already integer:

        chi2_milli  = 1000·(b−c)² // (b+c)      (0 when b+c = 0)
        significant = (b−c)²·10⁶ > 3841459·(b+c)

    (consensus = the fused 4-vote verdict — the production reference
    for "which technique deviates more".)  The planted corpus makes
    every discordance one-sided: ambiguous POs vote keyword=PO=fused,
    regex=data_report, so b = |ambiguous|, c = 0, chi2 = 1000·b.
    In-row compares, single-row partials, ONE 4-cell fold.  Mirror:
    the planted closed-form census."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from documentai_ray.pipelines.flagship import flagship

    ds = flagship(sf_dir=sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        cat = batch.column("category").to_pandas()
        kw = batch.column("tech_keyword").to_pandas() == cat
        rx = batch.column("tech_regex").to_pandas() == cat
        return pa.table({
            "a": pa.array([int((kw & rx).sum())], pa.int64()),
            "b": pa.array([int((kw & ~rx).sum())], pa.int64()),
            "c": pa.array([int((~kw & rx).sum())], pa.int64()),
            "d": pa.array([int((~kw & ~rx).sum())], pa.int64())})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .sum(["a", "b", "c", "d"]))
    a, b, c, d = (int(g["sum(a)"]), int(g["sum(b)"]),
                  int(g["sum(c)"]), int(g["sum(d)"]))
    chi2 = 1000 * (b - c) * (b - c) // (b + c) if b + c else 0
    sig = (b - c) * (b - c) * 1_000_000 > 3_841_459 * (b + c)
    out = pd.DataFrame([{
        "n_items": a + b + c + d, "both_agree": a, "kw_only": b,
        "rx_only": c, "neither": d, "chi2_milli": chi2,
        "significant": bool(sig)}])
    for col in out.columns[:-1]:
        out[col] = out[col].astype("int64")
    return out


def _q_max_drawdown(sf_dir: str):
    """Maximum drawdown of cumulative NET revenue — the PATH-risk
    readout the level ops can't see: cohort_ltv and customer_running
    sum flows, trend ops fit slopes, but "how deep under its own
    high-water mark did the book go, and for how long" is a statement
    about the running-max PATH.  Gross revenue only rises, so the
    series is net flow: per ship-day Σ ±cents(l_extendedprice) with
    returns (l_returnflag = 'R') negative.  Exact integer fold over
    the ≤|days| daily series: cum_t, runmax_t, dd_t = runmax − cum;

        max_drawdown_cents, trough_day = argmax dd (EARLIEST on ties)
        peak_cents = the high-water mark standing at the trough
        underwater_max_run = longest consecutive OBSERVED-day stretch
                             with dd > 0 (no calendar densification —
                             the observed-row sequence is the
                             contract)

    ONE bounded (day) exchange of per-batch partial sums; the ~2.4k-
    row fold is driver-side.  Mirror: window cumsum/max + FILTER-min
    trough + gaps-and-islands run length."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    def prep(batch: pa.Table) -> pa.Table:
        import numpy as np
        cents = np.rint(batch.column("l_extendedprice").to_numpy()
                        * 100).astype("int64")
        sign = (batch.column("l_returnflag").to_pandas() == "R") \
            .to_numpy()
        day = batch.column("l_shipdate").to_pandas().dt.floor("D")
        return pa.table({
            "day": pa.Array.from_pandas(day),
            "net": pa.array(np.where(sign, -cents, cents), pa.int64())})

    g = (ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate", "l_extendedprice", "l_returnflag"])
         .map_batches(prep, batch_format="pyarrow")
         .groupby("day")
         .aggregate(Sum("net", alias_name="net"))).to_pandas()
    g = g.sort_values("day").reset_index(drop=True)
    cum = rm = 0
    best = None          # (dd, day, peak)
    run = best_run = 0
    for day, net in zip(g["day"], g["net"]):
        cum += int(net)
        rm = max(rm, cum)
        dd = rm - cum
        if best is None or dd > best[0]:
            best = (dd, day, rm)
        run = run + 1 if dd > 0 else 0
        best_run = max(best_run, run)
    out = pd.DataFrame([{
        "n_days": len(g), "final_cents": cum,
        "max_drawdown_cents": best[0], "trough_day": best[1],
        "peak_cents": best[2], "underwater_max_run": best_run}])
    for c in ("n_days", "final_cents", "max_drawdown_cents",
              "peak_cents", "underwater_max_run"):
        out[c] = out[c].astype("int64")
    return out


def _q_link_predict(sf_dir: str):
    """Common-neighbor link prediction over the deterministic web-ish
    link graph (the triangle_count edge set: i→i+1, i→i+2,
    i→(7i+1) mod n) — the FORECAST the triangle family only audits:
    triangle_count counts wedges that DID close, clustering_coeff
    scores the closure rate; "which missing links have the most
    shared neighbors" ranks the wedges most likely to close next
    (the classic triadic-closure baseline).  Runs
    ``graph.common_neighbor_predict``: the wedge fan-out rides
    cooccurrence_pairs (middle node = basket of its distinct
    neighbors), adjacency removal is marker rows on the SAME pair
    exchange (no join), and the k-row answer is a global sort+limit.
    Top-20 by (cn desc, a, b).  Mirror: UNION ALL edge census +
    self-join wedges + NOT EXISTS + ORDER BY LIMIT."""
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.graph import common_neighbor_predict

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        src = list(ids) * 3
        dst = (list((ids + 1) % n) + list((ids + 2) % n)
               + list((ids * 7 + 1) % n))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return common_neighbor_predict(
        docs.map_batches(edges, batch_format="pyarrow"),
        top_k=20, num_partitions=16)


def _q_species_richness(sf_dir: str):
    """Chao1 vocabulary-richness + Good-Turing sample coverage — the
    HOW-MUCH-IS-MISSING question the frequency family can't pose:
    top_tokens / vocab_growth describe the vocabulary you SAW,
    hll/kmv estimate the distinct count of the stream you HAVE; a
    corpus curator choosing whether more crawling buys new vocabulary
    needs the unseen estimate, and the singleton/doubleton counts
    carry it.  With f1 singletons, f2 doubletons, S_obs distinct
    tokens, N total tokens, both estimators are rational:

        chao1        = S_obs + f1·(f1−1) // (2·(f2+1))
                       (the bias-corrected form — defined even at
                        f2 = 0, one floor)
        coverage_ppm = 10⁶·(N − f1) // N
                       (Turing: the chance the NEXT token is one
                        you've seen)

    Tokens are the non-empty whitespace split (the quality_pages
    convention).  Pipeline: Counter partials → vocab-bounded token
    groupby → per-batch freq-of-freq partials → a ≤|distinct freqs|
    exchange; the driver fold touches only (freq, count) rows —
    nothing vocab-sized reaches the driver.  Mirror: unnest +
    two GROUP BYs + FILTER counts."""
    import collections

    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        c = collections.Counter()
        for t in batch.column("text").to_pylist():
            c.update((t or "").split())
        return pa.table({
            "token": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64())})

    tf = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby("token")
          .aggregate(Sum("n", alias_name="n")))

    def freq_partial(batch: pa.Table) -> pa.Table:
        c = collections.Counter(batch.column("n").to_pylist())
        return pa.table({
            "freq": pa.array(list(c.keys()), pa.int64()),
            "n_tokens": pa.array(list(c.values()), pa.int64()),
            "mass": pa.array([k * v for k, v in c.items()],
                             pa.int64())})

    ff = (tf.map_batches(freq_partial, batch_format="pyarrow")
          .groupby("freq")
          .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                     Sum("mass", alias_name="mass"))).to_pandas()
    s_obs = int(ff["n_tokens"].sum())
    n = int(ff["mass"].sum())
    f1 = int(ff.loc[ff["freq"] == 1, "n_tokens"].sum())
    f2 = int(ff.loc[ff["freq"] == 2, "n_tokens"].sum())
    out = pd.DataFrame([{
        "n_tokens": n, "vocab": s_obs, "f1": f1, "f2": f2,
        "chao1": s_obs + f1 * (f1 - 1) // (2 * (f2 + 1)),
        "coverage_ppm": 1_000_000 * (n - f1) // n}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_brier_decomp(sf_dir: str):
    """Murphy decomposition of the Brier score — the WHY behind
    calibration_bins' ECE: the Brier score alone can't say whether a
    forecaster is bad because it LIES about probabilities
    (reliability) or because it can't SEPARATE outcomes (resolution);
    Murphy splits it exactly as Brier = REL − RES + UNC when
    forecasts are grouped by their EXACT value — and the activity
    heuristic p = clamp((n_ev−40)·20000, 0, 10⁶) takes ≤ 51 discrete
    values, so the exact-value grouping (NOT calibration_bins'
    10-wide bins) makes the identity hold in rationals.  In ppm²
    sums, with level counts n_k, conversions c_k, totals N, C:

        brier_sum = Σ_k [(n_k−c_k)·p² + c_k·(p−10⁶)²]      (exact)
        rel_sum   = Σ_k (n_k·p − 10⁶·c_k)² // n_k          (1 floor/level)
        res_sum   = Σ_k 10¹²·(c_k·N − n_k·C)² // (n_k·N²)  (1 floor/level)
        unc       = 10¹²·C·(N−C) // N                       (1 floor)

    each reported as a per-user mean (// N), with gap_ppm2 =
    brier − (rel − res + unc) riding along as the floor-noise
    residual (0 on clean hand cases, |gap| bounded by the per-level
    floor losses).  (c_k·N)²·10¹² ≲ 10³⁶ at 10⁶ users — HUGEINT,
    documented.  ONE user exchange + ONE ≤51-level exchange.
    Mirror: the calibration_bins user CTE + GROUP BY exact p +
    identical floors."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = pc.and_(pc.equal(batch.column("event_type"), "purchase"),
                       pc.greater_equal(batch.column("value"),
                                        pa.scalar(150.0)))
        return pa.table({"user_id": batch.column("user_id"),
                         "conv": conv.cast(pa.int64())})

    per_user = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Count(alias_name="n_ev"),
                           Max("conv", alias_name="conv")))

    def score(batch: pa.Table) -> pa.Table:
        n_ev = batch.column("n_ev").to_numpy().astype("int64")
        p = np.clip((n_ev - 40) * 20_000, 0, 1_000_000)
        y = (batch.column("conv").to_numpy() > 0).astype("int64")
        return pa.table({
            "p": pa.array(p, pa.int64()),
            "_n": pa.array(np.ones_like(p), pa.int64()),
            "_c": pa.array(y, pa.int64())})

    g = (per_user.map_batches(score, batch_format="pyarrow")
         .groupby("p")
         .aggregate(Sum("_n", alias_name="n"),
                    Sum("_c", alias_name="c"))).to_pandas()
    nn = int(g["n"].sum())
    cc = int(g["c"].sum())
    brier = rel = res = 0
    for p, nk, ck in zip(g["p"], g["n"], g["c"]):
        p, nk, ck = int(p), int(nk), int(ck)
        brier += (nk - ck) * p * p + ck * (p - 1_000_000) ** 2
        rel += (nk * p - 1_000_000 * ck) ** 2 // nk
        res += (10 ** 12 * (ck * nn - nk * cc) ** 2) // (nk * nn * nn)
    unc = 10 ** 12 * cc * (nn - cc) // nn
    b, r1, r2, u = brier // nn, rel // nn, res // nn, unc // nn
    out = pd.DataFrame([{
        "n_users": nn, "n_levels": len(g),
        "brier_ppm2": b, "rel_ppm2": r1, "res_ppm2": r2,
        "unc_ppm2": u, "gap_ppm2": b - (r1 - r2 + u)}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _bm25_top_rel(sf_dir: str):
    """Shared (query_id → [(rank, rel), ...]) scaffold for the
    position-weighted IR-eval pair: bm25_topk ranking + AND-relevance
    flags fetched ONLY for the ≤ |queries|·k candidate docs (the
    mrr_eval discipline — one pruned corpus scan, nothing
    corpus-sized materializes)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from documentai_ray.stages.indexing import bm25_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    top = bm25_topk(ds, queries=_BM25_QUERIES, k=5)
    cand = set(int(d) for d in top["doc_id"])

    def pick(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column("doc_id"),
                     value_set=pa.array(sorted(cand), pa.int64()))
        return batch.filter(m)

    toksets = {}
    for row in (ds.map_batches(pick, batch_format="pyarrow")
                .take_all()):
        toksets[int(row["doc_id"])] = set((row["text"] or "").split(" "))

    per_q = {}
    for qid, terms in sorted(_BM25_QUERIES.items()):
        need = set(terms)
        rows = top[top["query_id"] == qid]
        per_q[qid] = sorted(
            (int(r), int(need <= toksets.get(int(d), set())))
            for r, d in zip(rows["rank"], rows["doc_id"]))
    return per_q


def _q_rbp_eval(sf_dir: str):
    """Rank-biased precision (p = 1/2) of the bm25_topk ranking —
    the PERSISTENCE model the eval family lacks: nDCG's harmonic
    discount is a convention, MRR stops at the first hit; RBP models
    a user who inspects rank r with probability p^(r−1) and scores
    Σ (1−p)·p^(r−1)·rel_r.  With the dyadic p = 1/2 (the
    rank_overlap / decayed_leaderboard discipline) the weight at
    rank r is exactly 10⁶ // 2^r ppm — and 10⁶ is divisible by 2⁵,
    so the top-5 sum has ZERO flooring loss: a fully relevant list
    reads exactly 968750 (the 31/32 truncation-at-k residue, not a
    rounding artifact).  Costs the shared bm25 chain + the pruned
    candidate fetch.  Mirror: _SQL_BM25_CORE + the relevance CTE +
    bit-shift weights."""
    import pandas as pd

    per_q = _bm25_top_rel(sf_dir)
    recs = []
    for qid, rr in sorted(per_q.items()):
        n_rel = sum(f for _, f in rr)
        rbp = sum(1_000_000 // (1 << r) for r, f in rr if f)
        recs.append((qid, n_rel, rbp))
    out = pd.DataFrame(recs, columns=["query_id", "n_rel_topk",
                                      "rbp_ppm"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def _q_err_eval(sf_dir: str):
    """Expected reciprocal rank (cascade model) of the bm25_topk
    ranking — the DIMINISHING-RETURNS metric nDCG/RBP structurally
    can't express: their discounts are static per rank, so the 3rd
    relevant doc earns the same as if it were the only one; ERR's
    cascade user STOPS at each relevant doc with probability R, so
    every relevant doc above r shrinks r's credit.  With the dyadic
    stop probability R = 1/2 for relevant docs (0 otherwise), the
    term at rank r with j relevant docs above it is
    10⁶ // (r · 2^(j+1)) ppm — one floor per term, the contract —
    and err_ppm is their sum (all-relevant top-5 pins 688541).
    Same shared scaffold as rbp_eval.  Mirror: _SQL_BM25_CORE +
    window-counted prior relevance + identical floors."""
    import pandas as pd

    per_q = _bm25_top_rel(sf_dir)
    recs = []
    for qid, rr in sorted(per_q.items()):
        n_rel = sum(f for _, f in rr)
        err, j = 0, 0
        for r, f in rr:
            if f:
                err += 1_000_000 // (r * (1 << (j + 1)))
                j += 1
        recs.append((qid, n_rel, err))
    out = pd.DataFrame(recs, columns=["query_id", "n_rel_topk",
                                      "err_ppm"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def _q_kruskal_wallis(sf_dir: str):
    """Kruskal-Wallis k-sample rank test — the K-GROUP location
    question the two-sample family can't pose: rank_auc scores how
    well quantity separates TWO outcomes, cochran_armitage needs
    ORDERED groups; "do the three return-flag populations draw
    quantity from the same distribution" is unordered and k-ary, and
    KW is its rank test.  Everything clears to integers with DOUBLED
    midranks (ties land on half-integers, so work in half-units, the
    doubled-units discipline): for value v with cl strictly-smaller
    rows and nv equal rows, R'_v = 2·cl + nv + 1, per group
    R'_j = Σ nv_j·R'_v (invariant Σ_j R'_j = n·(n+1), pinned).  The
    statistic in quarter-cleared form, ONE floor per group (the
    shared contract):

        S       = Σ_j R'_j² // n_j
        h_milli = max(0, (3000·S − 3000·n·(n+1)²) // (n·(n+1)))

    (3/(n(n+1))·ΣR'²/n − 3(n+1) is the classic 12/(n(n+1))·ΣR²/n
    form after the doubling; ties left uncorrected — the correction
    only shrinks the denominator, documented).  Significance at 5%
    on chi²₂ cross-multiplies the SHARED floored S so both engines
    flag identically: 3·10⁶·S − 3·10⁶·n(n+1)² > 5991465·n(n+1).
    Magnitude: R'_j² ≲ 4n⁴ ≈ 5·10²³ at sf1 — HUGEINT territory,
    documented.  ONE bounded (qty, flag) histogram exchange (the
    rank_auc discipline); the ≤150-cell fold is driver-side.
    Mirror: histogram CTE + window cumsum midranks + the identical
    floors under HUGEINT."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count

    def prep(batch: pa.Table) -> pa.Table:
        v = np.rint(batch.column("l_quantity").to_numpy()).astype("int64")
        return pa.table({
            "qty": pa.array(v, pa.int64()),
            "flag": batch.column("l_returnflag")})

    from documentai_ray.stages.aggregates import kruskal_wallis_int

    h = (ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_quantity", "l_returnflag"])
         .map_batches(prep, batch_format="pyarrow")
         .groupby(["qty", "flag"])
         .aggregate(Count(alias_name="n"))).to_pandas()
    out = kruskal_wallis_int(h, val_col="qty", grp_col="flag")
    return out[["flag", "n_grp", "rsum2", "h_milli", "significant"]]


def _q_fleiss_kappa(sf_dir: str):
    """Fleiss' kappa over the FOUR classifier techniques — the
    multi-rater agreement readout the surface lacks: lang_kappa is
    Cohen's kappa (exactly 2 raters), technique_stats scores each
    technique against the FUSED verdict (which the techniques
    themselves produced — circular as an agreement measure); Fleiss
    asks how much the 4 independent raters agree with EACH OTHER
    beyond chance.  With n items, r = 4 raters, per-item category
    counts n_ij, S = Σ_ij n_ij², category totals C_j, T = Σ_j C_j²,
    M = n·r, everything is rational:

        P̄        = (S − M)/(M·(r−1))      → pbar_ppm, one floor
        P̄e       = T/M²                    → pe_ppm, one floor
        κ        = [M(S−M) − 3T] / [3(M²−T)] → kappa_milli,
                   trunc-toward-zero (the SQL ``//`` on a possibly
                   negative numerator — matched exactly)

    Per-item Σ_j n_ij² needs no per-row Python: it equals the number
    of ORDERED technique pairs that agree, so 16 vectorized
    column-pair comparisons per batch; C_j is a category-bounded
    Counter.  ONE |cats|-bounded exchange.  Mirror: the planted
    closed-form census (ambiguous POs split 2 purchase_order /
    2 data_report — verified against the live tech columns — all
    other rows unanimous) + the identical integer fold."""
    import collections

    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from documentai_ray.pipelines.flagship import flagship

    techs = ["tech_keyword", "tech_regex", "tech_tokenset", "tech_ml"]
    ds = flagship(sf_dir=sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        cols = {t: batch.column(t).to_pandas() for t in techs}
        c = collections.Counter()
        for t in techs:
            c.update(cols[t].tolist())
        s_item = 0
        for a in techs:
            for b in techs:
                s_item += int((cols[a] == cols[b]).sum())
        cats = sorted(c)
        return pa.table({
            "cat": pa.array(cats + ["__s"], pa.string()),
            "c": pa.array([c[k] for k in cats] + [s_item], pa.int64())})

    from documentai_ray.stages.aggregates import fleiss_kappa_int

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("cat")
           .aggregate(Sum("c", alias_name="c"))).to_pandas()
    s = int(agg.loc[agg["cat"] == "__s", "c"].iloc[0])
    cj = agg[agg["cat"] != "__s"]
    out = pd.DataFrame([fleiss_kappa_int(
        s, dict(zip(cj["cat"], cj["c"])))])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q_copeland_rank(sf_dir: str):
    """Copeland/Condorcet pairwise-majority ranking — SOCIAL CHOICE
    over aggregates, a family the surface lacks: top_tokens and
    heavy_hitters rank by a single global count, but "which event
    type do the DAYS prefer" treats each calendar day as a voter
    whose ballot is its own count profile, and pairwise majority is
    robust to the one mega-day a global sum lets dominate (the
    exact failure plurality voting has and Condorcet methods fix).
    Day a prefers type x to y iff count_x > count_y that day (equal
    counts abstain — NOT half a win); beats(x,y) = #days preferring
    x; support = Σ beats (the Borda count under strict rankings);
    copeland = #pairwise wins − #pairwise losses; a Condorcet winner
    has copeland = k−1, and a majority CYCLE — the phenomenon the
    family exists to expose — flattens copeland across candidates
    (pinned rock-paper-scissors hand case in the kernel tests).

    Physical plan: per-batch (day, type) count partials → ONE
    exchange bounded by days×|types| (≈ 31×6 — tiny), pairwise fold
    driver-side in ``aggregates.copeland_int``.  Mirror: the
    days×types grid (cross join + coalesce 0), a self-join on day
    for beats, a second self-join on the transposed pair for the
    sign sum."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.aggregates import copeland_int

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def daily(batch: pa.Table) -> pa.Table:
        import pandas as pd
        day = (batch.column("ts").cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // 86_400_000_000)
        df = pd.DataFrame({"day": day,
                           "event_type": batch.column("event_type")
                           .to_pylist(), "n": 1})
        g = df.groupby(["day", "event_type"], as_index=False)["n"].sum()
        return pa.table({"day": pa.array(g["day"], pa.int64()),
                         "event_type": pa.array(g["event_type"],
                                                pa.large_string()),
                         "n": pa.array(g["n"], pa.int64())})

    cell = (ev.map_batches(daily, batch_format="pyarrow")
            .groupby(["day", "event_type"])
            .aggregate(Sum("n", alias_name="n"))).to_pandas()
    return copeland_int(cell, voter_col="day", cand_col="event_type",
                        n_col="n")


def _q_dm_test(sf_dir: str):
    """Diebold-Mariano forecast-comparison test — the PAIRWISE judge
    the forecast-eval family lacks: mase_eval and backtest_mae score
    ONE forecaster against a scale, but "is the seasonal-naive
    BETTER than the naive, or just lucky" compares two loss series
    on the SAME days, and DM is the published test for exactly that
    (Diebold & Mariano 1995).  Daily event totals on the gap-filled
    calendar; forecaster A = lag-1 naive, B = lag-7 seasonal naive;
    loss = |error| (integer — no squaring blow-up), eval days where
    both are defined.  With d_t = |e_A| − |e_B|, S = Σd, Q = Σd²:

        DM² = n·S² / (n·Q − S²)      (exact integer ratio)
        z2_milli = 1000·n·S² // (n·Q − S²)
        significant ⟺ 10⁶·n·S² > 3841459·(n·Q − S²)   (χ²₁ exact)

    better_sign = sign(S) (+1 → seasonal wins).  h=1 small-sample
    variant: plain variance of d, no HAC window — the classic
    one-step-loss form.  ONE day-histogram exchange (≤ 31 cells),
    fold in ``aggregates.dm_test_int``; mirror = calendar
    generate_series + lag windows + identical fold."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from documentai_ray.stages.aggregates import dm_test_int

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def daily(batch: pa.Table) -> pa.Table:
        import pandas as pd
        day = (batch.column("ts").cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // 86_400_000_000)
        df = pd.DataFrame({"day": day, "n": 1})
        g = df.groupby("day", as_index=False)["n"].sum()
        return pa.table({"day": pa.array(g["day"], pa.int64()),
                         "n": pa.array(g["n"], pa.int64())})

    h = (ev.map_batches(daily, batch_format="pyarrow")
         .groupby("day")
         .aggregate(Sum("n", alias_name="n"))).to_pandas()
    d0, d1 = int(h["day"].min()), int(h["day"].max())
    full = {int(d): int(n) for d, n in zip(h["day"], h["n"])}
    y = [full.get(d, 0) for d in range(d0, d1 + 1)]
    r = dm_test_int(y, season=7)
    out = pd.DataFrame([r])
    for c in out.columns[:-1]:
        out[c] = out[c].astype("int64")
    out["significant"] = out["significant"].astype(bool)
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_text": _q_extract_text,
        "quality_pages": _q_quality_pages,
        "classify_pages": _q_classify_pages,
        "preprocess_decision": _q_preprocess_decision,
        "entities_po": _q_entities_po,
        "entities_invoice": _q_entities_invoice,
        "rules_po": _q_rules_po,
        "wordbox_match": _q_wordbox_match,
        "docs_exact_dedup": _q_docs_exact_dedup,
        "token_stats": _q_token_stats,
        "doc_quality": _q_doc_quality,
        "events_hourly": _q_events_hourly,
        "events_sessions": _q_events_sessions,
        "q1_lineitem": _q_q1_lineitem,
        "orders_by_nation": _q_orders_by_nation,
        "q5_local_revenue": _q_q5_local_revenue,
        "minhash_neardup": _q_minhash_neardup,
        "ppjoin_pairs": _q_ppjoin_pairs,
        "containment_pairs": _q_containment_pairs,
        "minhash_dedup_keep": _q_minhash_dedup_keep,
        "jaccard_pairs": _q_jaccard_pairs,
        "embedding_neardup": _q_embedding_neardup,
        "topk_similarity": _q_topk_similarity,
        "pdf_layout_text": _q_pdf_layout_text,
        "lang_id": _q_lang_id,
        "lang_kappa": _q_lang_kappa,
        "lang_prf": _q_lang_prf,
        "token_count_bpe": _q_token_count_bpe,
        "bpe_pair_counts": _q_bpe_pair_counts,
        "bpe_train_merges": _q_bpe_train_merges,
        "bpe_encode": _q_bpe_encode,
        "fingerprint": _q_fingerprint,
        "simhash_hamming": _q_simhash_hamming,
        "group_pages": _q_group_pages,
        "category_summary": _q_category_summary,
        "vote_distribution": _q_vote_distribution,
        "ann_ivf": _q_ann_ivf,
        "events_sliding": _q_events_sliding,
        "events_asof": _q_events_asof,
        "band_join_balances": _q_band_join_balances,
        "overlap_join_windows": _q_overlap_join_windows,
        "q3_topn": _q_q3_topn,
        "retention_cohorts": _q_retention_cohorts,
        "cumulative_users": _q_cumulative_users,
        "type_share": _q_type_share,
        "bag_difference": _q_bag_difference,
        "value_histogram": _q_value_histogram,
        "event_pairs_window": _q_event_pairs_window,
        "path_rollup": _q_path_rollup,
        "quantity_percentile": _q_quantity_percentile,
        "quantity_cume_dist": _q_quantity_cume_dist,
        "log2_p99": _q_log2_p99,
        "target_encode": _q_target_encode,
        "waterfill_budget": _q_waterfill_budget,
        "rank_auc": _q_rank_auc,
        "gini_gain": _q_gini_gain,
        "ks_drift": _q_ks_drift,
        "quantity_dense_rank": _q_quantity_dense_rank,
        "global_index": _q_global_index,
        "record_linkage": _q_record_linkage,
        "golden_record": _q_golden_record,
        "cc_labels": _q_cc_labels,
        "dag_layers": _q_dag_layers,
        "dq_audit": _q_dq_audit,
        "k_anonymity": _q_k_anonymity,
        "l_diversity": _q_l_diversity,
        "kcore_nodes": _q_kcore_nodes,
        "coordinated_sample": _q_coordinated_sample,
        "subsequence_counts": _q_subsequence_counts,
        "quantile_normalize": _q_quantile_normalize,
        "rrf_fusion": _q_rrf_fusion,
        "impute_mode": _q_impute_mode,
        "delta_varint": _q_delta_varint,
        "supplier_percentile": _q_supplier_percentile,
        "longest_streak": _q_longest_streak,
        "nest_tokens": _q_nest_tokens,
        "tvd_drift": _q_tvd_drift,
        "backtest_mae": _q_backtest_mae,
        "mase_eval": _q_mase_eval,
        "qini_auuc": _q_qini_auuc,
        "calibration_bins": _q_calibration_bins,
        "srm_check": _q_srm_check,
        "ips_policy_eval": _q_ips_policy_eval,
        "label_shift": _q_label_shift,
        "conformal_interval": _q_conformal_interval,
        "cohort_payback": _q_cohort_payback,
        "bootstrap_ci": _q_bootstrap_ci,
        "jackknife_sources": _q_jackknife_sources,
        "emd_hourly": _q_emd_hourly,
        "price_elasticity": _q_price_elasticity,
        "permutation_test": _q_permutation_test,
        "cuped_adjust": _q_cuped_adjust,
        "rdd_jump": _q_rdd_jump,
        "kitagawa_decomp": _q_kitagawa_decomp,
        "spillover_exposure": _q_spillover_exposure,
        "mh_stratified": _q_mh_stratified,
        "ipf_raking": _q_ipf_raking,
        "term_dispersion": _q_term_dispersion,
        "chain_ladder": _q_chain_ladder,
        "fe_panel": _q_fe_panel,
        "matching_att": _q_matching_att,
        "eb_shrink": _q_eb_shrink,
        "yule_q": _q_yule_q,
        "kish_neff": _q_kish_neff,
        "cochran_armitage": _q_cochran_armitage,
        "cost_threshold": _q_cost_threshold,
        "anomaly_ensemble": _q_anomaly_ensemble,
        "attribution_decay": _q_attribution_decay,
        "exposure_fairness": _q_exposure_fairness,
        "qte_quantiles": _q_qte_quantiles,
        "newsvendor_stock": _q_newsvendor_stock,
        "competing_risks": _q_competing_risks,
        "sequential_looks": _q_sequential_looks,
        "holm_bonferroni": _q_holm_bonferroni,
        "kruskal_wallis": _q_kruskal_wallis,
        "fleiss_kappa": _q_fleiss_kappa,
        "rbp_eval": _q_rbp_eval,
        "err_eval": _q_err_eval,
        "species_richness": _q_species_richness,
        "brier_decomp": _q_brier_decomp,
        "max_drawdown": _q_max_drawdown,
        "link_predict": _q_link_predict,
        "friedman_test": _q_friedman_test,
        "mcnemar_test": _q_mcnemar_test,
        "mann_whitney": _q_mann_whitney,
        "kr20_reliability": _q_kr20_reliability,
        "selectivity_audit": _q_selectivity_audit,
        "yule_k": _q_yule_k,
        "page_trend": _q_page_trend,
        "survival_cindex": _q_survival_cindex,
        "cochran_q": _q_cochran_q,
        "conformance_check": _q_conformance_check,
        "cdc_chunks": _q_cdc_chunks,
        "rake_keyphrases": _q_rake_keyphrases,
        "bh_fdr": _q_bh_fdr,
        "rle_advisor": _q_rle_advisor,
        "wilcoxon_signed": _q_wilcoxon_signed,
        "nelson_aalen": _q_nelson_aalen,
        "copeland_rank": _q_copeland_rank,
        "dm_test": _q_dm_test,
        "skew_histogram": _q_skew_histogram,
        "trend_flips": _q_trend_flips,
        "user_features": _q_user_features,
        "windowed_paths": _q_windowed_paths,
        "user_ledger": _q_user_ledger,
        "cusum_alarms": _q_cusum_alarms,
        "mann_kendall": _q_mann_kendall,
        "lag_coactivity": _q_lag_coactivity,
        "vocab_growth": _q_vocab_growth,
        "chi2_independence": _q_chi2_independence,
        "readability": _q_readability,
        "clustering_coeff": _q_clustering_coeff,
        "unique_prefix": _q_unique_prefix,
        "soundex_blocking": _q_soundex_blocking,
        "zonemap_prune": _q_zonemap_prune,
        "gini_orders": _q_gini_orders,
        "diversity_index": _q_diversity_index,
        "mad_outliers": _q_mad_outliers,
        "unpivot_measures": _q_unpivot_measures,
        "benford_audit": _q_benford_audit,
        "user_coverage": _q_user_coverage,
        "sliding_unique_users": _q_sliding_unique_users,
        "segment_digests": _q_segment_digests,
        "asof_snapshot": _q_asof_snapshot,
        "sssp_weighted": _q_sssp_weighted,
        "scd2_build": _q_scd2_build,
        "group_split": _q_group_split,
        "schema_union": _q_schema_union,
        "pareto_parts": _q_pareto_parts,
        "grouped_mode": _q_grouped_mode,
        "copurchase_pairs": _q_copurchase_pairs,
        "kmv_intersect": _q_kmv_intersect,
        "kmv_difference": _q_kmv_difference,
        "mean_embedding": _q_mean_embedding,
        "rnn_pairs": _q_rnn_pairs,
        "symspell_pairs": _q_symspell_pairs,
        "join_revenue": _q_join_revenue,
        "entities_table": _q_entities_table,
        "lc_tags": _q_lc_tags,
        "technique_stats": _q_technique_stats,
        "top_orders": _q_top_orders,
        "audio_frames": _q_audio_frames,
        "anti_join_customers": _q_anti_join_customers,
        "rollup_counts": _q_rollup_counts,
        "topk_per_group": _q_topk_per_group,
        "median_quantity": _q_median_quantity,
        "image_quality": _q_image_quality,
        "image_preprocess": _q_image_preprocess,
        "decontaminate": _q_decontaminate,
        "sample_weighted": _q_sample_weighted,
        "gopher_repetition": _q_gopher_repetition,
        "redact_pii": _q_redact_pii,
        "curate_corpus": _q_curate_corpus,
        "split_assign": _q_split_assign,
        "top_tokens": _q_top_tokens,
        "feature_hash": _q_feature_hash,
        "line_dedup": _q_line_dedup,
        "c4_line_filter": _q_c4_line_filter,
        "normalize_text": _q_normalize_text,
        "chunk_documents": _q_chunk_documents,
        "pack_sequences": _q_pack_sequences,
        "inverted_index": _q_inverted_index,
        "tfidf_topk": _q_tfidf_topk,
        "canonical_url_dedup": _q_canonical_url_dedup,
        "host_stats": _q_host_stats,
        "skew_join": _q_skew_join,
        "charset_extract": _q_charset_extract,
        "host_template_strip": _q_host_template_strip,
        "outlink_count": _q_outlink_count,
        "host_cap": _q_host_cap,
        "snapshot_diff": _q_snapshot_diff,
        "curation_hostaware": _q_curation_hostaware,
        "robots_filter": _q_robots_filter,
        "robots_txt_rules": _q_robots_txt_rules,
        "surt_keys": _q_surt_keys,
        "anchor_text": _q_anchor_text,
        "sitemap_frontier": _q_sitemap_frontier,
        "recrawl_priority": _q_recrawl_priority,
        "price_quantiles": _q_price_quantiles,
        "fetch_waves": _q_fetch_waves,
        "profile_columns": _q_profile_columns,
        "dead_letter": _q_dead_letter,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "cdx_fetch": _q_cdx_fetch,
        "kcenter_select": _q_kcenter_select,
        "zorder_keys": _q_zorder_keys,
        "merge_upsert": _q_merge_upsert,
        "late_events": _q_late_events,
        "online_neardup": _q_online_neardup,
        "fetch_schedule": _q_fetch_schedule,
        "users_sketch": _q_users_sketch,
        "events_anomaly": _q_events_anomaly,
        "khop_frontier": _q_khop_frontier,
        "table_checksum": _q_table_checksum,
        "string_agg_topdocs": _q_string_agg_topdocs,
        "gap_fill": _q_gap_fill,
        "cube_counts": _q_cube_counts,
        "scd2_join": _q_scd2_join,
        "grouped_regression": _q_grouped_regression,
        "event_transitions": _q_event_transitions,
        "funnel_conversion": _q_funnel_conversion,
        "lang_rebalance": _q_lang_rebalance,
        "drop_funnel": _q_drop_funnel,
        "cm_counts": _q_cm_counts,
        "config_pipeline": _q_config_pipeline,
        "ivm_counts": _q_ivm_counts,
        "pseudonymize": _q_pseudonymize,
        "tfrecord_roundtrip": _q_tfrecord_roundtrip,
        "customer_order_counts": _q_customer_order_counts,
        "csv_roundtrip": _q_csv_roundtrip,
        "ipc_roundtrip": _q_ipc_roundtrip,
        "orc_roundtrip": _q_orc_roundtrip,
        "mix_assemble": _q_mix_assemble,
        "sorted_export": _q_sorted_export,
        "incremental_session": _q_incremental_session,
        "f2_selfjoin": _q_f2_selfjoin,
        "winsorize": _q_winsorize,
        "hits": _q_hits,
        "page_meta": _q_page_meta,
        "warc_ingest": _q_warc_ingest,
        "wet_roundtrip": _q_wet_roundtrip,
        "kmeans_clusters": _q_kmeans_clusters,
        "video_frames": _q_video_frames,
        "kmv_distinct": _q_kmv_distinct,
        "hll_distinct": _q_hll_distinct,
        "p95_quantity": _q_p95_quantity,
        "users_per_event": _q_users_per_event,
        "events_rate_windows": _q_events_rate_windows,
        "images_to_pdf": _q_images_to_pdf,
        "base64_pages": _q_base64_pages,
        "rasterize_pages": _q_rasterize_pages,
        "urgent_revenue": _q_urgent_revenue,
        "gopher_quality": _q_gopher_quality,
        "repeated_passages": _q_repeated_passages,
        "dedup_passages": _q_dedup_passages,
        "category_split_pdfs": _q_category_split_pdfs,
        "bigram_lm": _q_bigram_lm,
        "pagerank": _q_pagerank,
        "pagerank_irregular": _q_pagerank_irregular,
        "rendezvous_shards": _q_rendezvous_shards,
        "bag_intersect": _q_bag_intersect,
        "weighted_median": _q_weighted_median,
        "posexplode_tokens": _q_posexplode_tokens,
        "skipgram_pairs": _q_skipgram_pairs,
        "kwic_snippets": _q_kwic_snippets,
        "collocation_lift": _q_collocation_lift,
        "redirect_resolve": _q_redirect_resolve,
        "triangle_count": _q_triangle_count,
        "fuzzy_hosts": _q_fuzzy_hosts,
        "ntile_split": _q_ntile_split,
        "ocr_roundtrip": _q_ocr_roundtrip,
        "ocr_classify": _q_ocr_classify,
        "office_extract": _q_office_extract,
        "generic_entities": _q_generic_entities,
        "layout_structure": _q_layout_structure,
        "page_type_detect": _q_page_type_detect,
        "table_detect": _q_table_detect,
        "field_validation": _q_field_validation,
        "doc_type_autodetect": _q_doc_type_autodetect,
        "pq_codes": _q_pq_codes,
        "jpeg_roundtrip": _q_jpeg_roundtrip,
        "tiff_roundtrip": _q_tiff_roundtrip,
        "json_props": _q_json_props,
        "customer_running": _q_customer_running,
        "stratified_sample": _q_stratified_sample,
        "events_pivot": _q_events_pivot,
        "incremental_dedup": _q_incremental_dedup,
        "bloom_dedup": _q_bloom_dedup,
        "url_filter": _q_url_filter,
        "semdedup": _q_semdedup,
        "shard_export": _q_shard_export,
        "dsir_weights": _q_dsir_weights,
        "heavy_hitters": _q_heavy_hitters,
        "web_curation": _q_web_curation,
        "mix_plan": _q_mix_plan,
        "kendall_tau": _q_kendall_tau,
        "max_concurrency": _q_max_concurrency,
        "countmin_estimate": _q_countmin_estimate,
        "attribution_credit": _q_attribution_credit,
        "fd_error": _q_fd_error,
        "oov_rate": _q_oov_rate,
        "changepoint_localize": _q_changepoint_localize,
        "bloom_semijoin": _q_bloom_semijoin,
        "ngram_novelty": _q_ngram_novelty,
        "seasonality_strength": _q_seasonality_strength,
        "theil_sen": _q_theil_sen,
        "interarrival_stats": _q_interarrival_stats,
        "acf_lag": _q_acf_lag,
        "runs_test": _q_runs_test,
        "frequent_triples": _q_frequent_triples,
        "haar_energy": _q_haar_energy,
        "ewma_backtest": _q_ewma_backtest,
        "url_templates": _q_url_templates,
        "conversion_lag": _q_conversion_lag,
        "q17_decorrelated": _q_q17_decorrelated,
        "relational_division": _q_relational_division,
        "t_closeness": _q_t_closeness,
        "orders_all_ontime": _q_orders_all_ontime,
        "minmax_scale": _q_minmax_scale,
        "markov_kstep": _q_markov_kstep,
        "rfm_segments": _q_rfm_segments,
        "revenue_share": _q_revenue_share,
        "bm25_topk": _q_bm25_topk,
        "dispersion_index": _q_dispersion_index,
        "leadlag_beta": _q_leadlag_beta,
        "km_survival": _q_km_survival,
        "mrr_eval": _q_mrr_eval,
        "decayed_leaderboard": _q_decayed_leaderboard,
        "degree_assortativity": _q_degree_assortativity,
        "ndcg_eval": _q_ndcg_eval,
        "seasonal_anomaly": _q_seasonal_anomaly,
        "did_estimator": _q_did_estimator,
        "laspeyres_index": _q_laspeyres_index,
        "ab_conversion": _q_ab_conversion,
        "assoc_rules": _q_assoc_rules,
        "logrank_test": _q_logrank_test,
        "uplift_deciles": _q_uplift_deciles,
        "paasche_index": _q_paasche_index,
        "fd_mine": _q_fd_mine,
        "bounce_rate": _q_bounce_rate,
        "rank_overlap": _q_rank_overlap,
        "chain_index": _q_chain_index,
        "lorenz_deciles": _q_lorenz_deciles,
        "rmst_summary": _q_rmst_summary,
        "q10_returns": _q_q10_returns,
        "q8_market_share": _q_q8_market_share,
        "pinball_eval": _q_pinball_eval,
        "cohort_ltv": _q_cohort_ltv,
        "post_stratify": _q_post_stratify,
        "lincoln_petersen": _q_lincoln_petersen,
        "german_tank": _q_german_tank,
        "fifo_cogs": _q_fifo_cogs,
        "capture_diff": _q_capture_diff,
        "youden_threshold": _q_youden_threshold,
        "average_precision": _q_average_precision,
        "xmr_alarms": _q_xmr_alarms,
        "tukey_outliers": _q_tukey_outliers,
    }


_SQL_BPE_WORDS = (
    "SELECT token AS word, CAST(count(*) AS BIGINT) AS n FROM "
    "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) "
    "WHERE token <> '' GROUP BY token"
)

# sentinel-delimited symbol string: chr(31)sym(chr30) per symbol, joined by
# ' ' — a string `replace` of "(31)lhs(30) (31)rhs(30)" is then EXACTLY one
# left-to-right non-overlapping whole-symbol merge pass (see stages/bpe.py)
_SQL_BPE_SPACED = (
    "array_to_string(list_transform(range(1, length({w})+1), "
    "i -> chr(31) || substr({w}, CAST(i AS INT), 1) || chr(30)), ' ')"
)


def _sql_bpe_train(num_merges: int) -> str:
    """Unrolled BPE training rounds: s{k} = vocab segmentation after k
    merges, p{k} = weighted adjacent-pair counts, m{k} = argmax pair."""
    spaced = _SQL_BPE_SPACED.format(w="word")
    parts = [f"WITH w AS ({_SQL_BPE_WORDS}), ",
             f"s0 AS (SELECT {spaced} AS s, n FROM w)"]
    for k in range(1, num_merges + 1):
        parts.append(
            f", p{k} AS (SELECT "
            "replace(replace(syms[CAST(i AS INT)], chr(31), ''), chr(30), '') AS lhs, "
            "replace(replace(syms[CAST(i AS INT)+1], chr(31), ''), chr(30), '') AS rhs, "
            "CAST(sum(n) AS BIGINT) AS n "
            "FROM (SELECT string_split(s, ' ') AS syms, n, "
            "unnest(range(1, len(string_split(s, ' ')))) AS i "
            f"FROM s{k-1}) GROUP BY lhs, rhs)"
            f", m{k} AS (SELECT lhs, rhs, n FROM p{k} "
            "ORDER BY n DESC, lhs, rhs LIMIT 1)"
            f", s{k} AS (SELECT replace(s, "
            f"chr(31) || (SELECT lhs FROM m{k}) || chr(30) || ' ' || "
            f"chr(31) || (SELECT rhs FROM m{k}) || chr(30), "
            f"chr(31) || (SELECT lhs || rhs FROM m{k}) || chr(30)) AS s, n "
            f"FROM s{k-1})")
    union = " UNION ALL ".join(
        f"SELECT {k} AS rank, lhs, rhs, n FROM m{k}"
        for k in range(1, num_merges + 1))
    return "".join(parts) + " " + union


def _sql_bpe_encode_tokens(word_expr: str) -> str:
    """Token count of a word under PRETRAINED_MERGES: nested replaces in
    training order over the sentinel symbol string."""
    from documentai_ray.stages.bpe import PRETRAINED_MERGES

    e = _SQL_BPE_SPACED.format(w=word_expr)
    for lhs, rhs in PRETRAINED_MERGES:
        pat = (f"chr(31) || '{lhs}' || chr(30) || ' ' || "
               f"chr(31) || '{rhs}' || chr(30)")
        rep = f"chr(31) || '{lhs}{rhs}' || chr(30)"
        e = f"replace({e}, {pat}, {rep})"
    return f"len(string_split({e}, ' '))"


# dense global hour grid over events — shared by the dense-series
# statistics (acf_lag / runs_test inline the same text; haar / ewma
# build on this constant)
_SQL_DENSE_GRID = (
    "span AS (SELECT date_trunc('hour', min(ts)) AS h0, "
    "date_trunc('hour', max(ts)) AS h1 FROM events), "
    "hc AS (SELECT event_type, date_trunc('hour', ts) AS hr, "
    "count(*) AS c FROM events GROUP BY 1, 2), "
    "grid AS (SELECT k.event_type, g.hr FROM "
    "(SELECT DISTINCT event_type FROM events) k, "
    "(SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) "
    "AS hr FROM span) g), "
    "dd AS (SELECT grid.event_type, grid.hr, coalesce(hc.c, 0) AS c "
    "FROM grid LEFT JOIN hc ON grid.event_type = hc.event_type "
    "AND grid.hr = hc.hr)"
)

# Haar pyramid: 13 generated pairwise levels; HAVING count(*) = 2 keeps
# only FULL pairs, so the fold terminates exactly at level L = log2(m)
# (the lone top row can never half-pair into a spurious level); m is a
# nested-CASE power of 2 — no float log anywhere
_H_LEVELS = 13
_SQL_HAAR = (
    "WITH " + _SQL_DENSE_GRID + ", "
    "cnt AS (SELECT count(DISTINCT hr) AS n FROM grid), "
    "mm AS (SELECT CASE "
    + " ".join(f"WHEN n >= {1 << k} THEN {1 << k}"
               for k in range(_H_LEVELS, 0, -1))
    + " END AS m FROM cnt), "
    "lv0 AS (SELECT t.event_type, t.i, CAST(t.c AS HUGEINT) AS a, mm.m "
    "FROM (SELECT event_type, hr, c, row_number() OVER "
    "(PARTITION BY event_type ORDER BY hr) - 1 AS i FROM dd) t, mm "
    "WHERE t.i < mm.m), "
    + ", ".join(
        f"lv{l} AS (SELECT event_type, m, i // 2 AS i, SUM(a) AS a, "
        f"SUM(CASE WHEN i % 2 = 0 THEN a ELSE -a END) AS d "
        f"FROM lv{l - 1} GROUP BY 1, 2, 3 HAVING count(*) = 2)"
        for l in range(1, _H_LEVELS + 1))
    + ", en AS ("
    + " UNION ALL ".join(
        f"SELECT event_type, m, {l} AS level, SUM(d * d) AS e "
        f"FROM lv{l} GROUP BY 1, 2"
        for l in range(1, _H_LEVELS + 1))
    + "), sc AS (SELECT event_type, m, level, "
    "e * (m // (1 << level)) AS es FROM en), "
    "tot AS (SELECT event_type, SUM(es) AS t FROM sc GROUP BY 1) "
    "SELECT sc.event_type, CAST(sc.m AS BIGINT) AS n_used, "
    "CAST(sc.level AS BIGINT) AS level, CAST(sc.es AS BIGINT) "
    "AS e_scaled, CAST(1000000 * sc.es // tot.t AS BIGINT) AS share_ppm "
    "FROM sc JOIN tot ON sc.event_type = tot.event_type"
)

# k-step Markov fold: trunc-ppm rows, per-step sum-then-floor — the
# truncation order IS the op definition; left joins keep zero-inflow
# types alive
_MK_STEPS = 4
_SQL_MARKOV = (
    "WITH tr AS (SELECT prev, next, count(*) AS n FROM "
    "(SELECT event_type AS next, lag(event_type) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events) "
    "WHERE prev IS NOT NULL GROUP BY 1, 2), "
    "rs AS (SELECT prev, SUM(n) AS tot FROM tr GROUP BY 1), "
    "p AS (SELECT tr.prev, tr.next, 1000000 * tr.n // rs.tot AS p "
    "FROM tr JOIN rs USING (prev)), "
    "t AS (SELECT DISTINCT event_type AS et FROM events), "
    "tc AS (SELECT count(*) AS tn FROM t), "
    "v0 AS (SELECT et, 1000000 // tn AS v FROM t, tc), "
    + ", ".join(
        f"v{k} AS (SELECT t.et, coalesce(SUM(v{k - 1}.v * p.p), 0) "
        f"// 1000000 AS v FROM t LEFT JOIN p ON p.next = t.et "
        f"LEFT JOIN v{k - 1} ON v{k - 1}.et = p.prev GROUP BY 1)"
        for k in range(1, _MK_STEPS + 1))
    + " SELECT v0.et AS event_type, CAST(v0.v AS BIGINT) AS p0_ppm, "
    f"CAST(v{_MK_STEPS}.v AS BIGINT) AS pk_ppm "
    f"FROM v0 JOIN v{_MK_STEPS} USING (et)"
)

# shared BM25 CTE chain (bm25_topk + mrr_eval): cleared-fraction
# saturation × rational idf, positive scores ranked per query
_SQL_BM25_CORE = (
    "dl AS (SELECT doc_id, "
    "len(string_split(text, ' ')) AS dl FROM documents), "
    "st AS (SELECT count(*) AS n, SUM(dl) AS l FROM dl), "
    "qt AS (SELECT * FROM (VALUES "
    + ", ".join(f"('{qid}', '{t}')"
                for qid, ts in sorted(_BM25_QUERIES.items())
                for t in ts)
    + ") AS v(query_id, t)), "
    "terms AS (SELECT DISTINCT t FROM qt), "
    "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t "
    "FROM documents), "
    "tf AS (SELECT tok.doc_id, tok.t, count(*) AS tf FROM tok "
    "JOIN terms USING (t) GROUP BY 1, 2), "
    "df AS (SELECT t, count(DISTINCT doc_id) AS df FROM tok "
    "JOIN terms USING (t) GROUP BY 1), "
    "sc AS (SELECT qt.query_id, tf.doc_id, "
    "SUM((1000000 * (st.n - df.df + 1) // (df.df + 1)) "
    "* (22 * CAST(tf.tf AS HUGEINT) * st.l) "
    "// (10 * CAST(tf.tf AS HUGEINT) * st.l + 3 * st.l "
    "+ 9 * CAST(dl.dl AS HUGEINT) * st.n)) AS score "
    "FROM qt JOIN tf ON tf.t = qt.t JOIN df ON df.t = qt.t "
    "JOIN dl ON dl.doc_id = tf.doc_id, st GROUP BY 1, 2), "
    "r AS (SELECT query_id, doc_id, score, row_number() OVER "
    "(PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk "
    "FROM sc WHERE score > 0)"
)

# Kaplan-Meier: 30 generated CTEs apply the per-step trunc-ppm product
# s_d = s_{d-1}*(n_d - d_d) // n_d (carried unchanged when n_d = 0)
_KM_H = 30
_SQL_KM = (
    "WITH u AS (SELECT user_id, min(epoch_us(ts)) AS f, "
    "max(epoch_us(ts)) AS l FROM events GROUP BY 1), "
    "mx AS (SELECT max(epoch_us(ts)) AS m FROM events), "
    "lt AS (SELECT (l - f) // 86400000000 AS ld, "
    "(mx.m - l) >= 21600000000 AS obs FROM u, mx), "
    f"dd AS (SELECT unnest(generate_series(0, {_KM_H - 1})) AS day), "
    "g AS (SELECT dd.day, "
    "count(*) FILTER (WHERE lt.ld >= dd.day) AS atrisk, "
    "count(*) FILTER (WHERE lt.obs AND lt.ld = dd.day) AS deaths "
    "FROM dd, lt GROUP BY 1), "
    "s0 AS (SELECT CASE WHEN atrisk > 0 THEN "
    "1000000 * (atrisk - deaths) // atrisk ELSE 1000000 END AS s "
    "FROM g WHERE day = 0), "
    + ", ".join(
        f"s{d} AS (SELECT CASE WHEN g.atrisk > 0 THEN "
        f"s{d - 1}.s * (g.atrisk - g.deaths) // g.atrisk "
        f"ELSE s{d - 1}.s END AS s FROM g, s{d - 1} WHERE g.day = {d})"
        for d in range(1, _KM_H))
    + " " + " UNION ALL ".join(
        f"SELECT CAST({d} AS BIGINT) AS day, "
        "CAST(g.atrisk AS BIGINT) AS at_risk, "
        "CAST(g.deaths AS BIGINT) AS deaths, "
        "CAST(CASE WHEN g.atrisk > 0 THEN "
        "1000000 * g.deaths // g.atrisk ELSE 0 END AS BIGINT) "
        "AS hazard_ppm, "
        f"CAST(s{d}.s AS BIGINT) AS s_ppm FROM g, s{d} "
        f"WHERE g.day = {d}"
        for d in range(_KM_H))
)

# Aalen-Johansen: the KM chain with THREE carried accumulators
# (s, cif1, cif2); cause from the row_number last event
_SQL_CIF = (
    "WITH u AS (SELECT user_id, min(epoch_us(ts)) AS f, "
    "max(epoch_us(ts)) AS l FROM events GROUP BY 1), "
    "le AS (SELECT user_id, event_type FROM "
    "(SELECT user_id, event_type, row_number() OVER "
    "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
    "FROM events) WHERE rn = 1), "
    "mx AS (SELECT max(epoch_us(ts)) AS m FROM events), "
    "lt AS (SELECT (u.l - u.f) // 86400000000 AS ld, "
    "(mx.m - u.l) >= 21600000000 AS obs, "
    "CASE WHEN le.event_type = 'purchase' THEN 1 ELSE 2 END AS cz "
    "FROM u JOIN le USING (user_id), mx), "
    f"dd AS (SELECT unnest(generate_series(0, {_KM_H - 1})) AS day), "
    "g AS (SELECT dd.day, "
    "count(*) FILTER (WHERE lt.ld >= dd.day) AS atrisk, "
    "count(*) FILTER (WHERE lt.obs AND lt.ld = dd.day AND lt.cz = 1) "
    "AS d1, "
    "count(*) FILTER (WHERE lt.obs AND lt.ld = dd.day AND lt.cz = 2) "
    "AS d2 FROM dd, lt GROUP BY 1), "
    "c0 AS (SELECT CASE WHEN atrisk > 0 THEN "
    "1000000 * (atrisk - d1 - d2) // atrisk ELSE 1000000 END AS s, "
    "CASE WHEN atrisk > 0 THEN 1000000 * d1 // atrisk ELSE 0 END "
    "AS c1, "
    "CASE WHEN atrisk > 0 THEN 1000000 * d2 // atrisk ELSE 0 END "
    "AS c2 FROM g WHERE day = 0), "
    + ", ".join(
        f"c{d} AS (SELECT CASE WHEN g.atrisk > 0 THEN "
        f"c{d - 1}.s * (g.atrisk - g.d1 - g.d2) // g.atrisk "
        f"ELSE c{d - 1}.s END AS s, "
        f"c{d - 1}.c1 + CASE WHEN g.atrisk > 0 THEN "
        f"c{d - 1}.s * g.d1 // g.atrisk ELSE 0 END AS c1, "
        f"c{d - 1}.c2 + CASE WHEN g.atrisk > 0 THEN "
        f"c{d - 1}.s * g.d2 // g.atrisk ELSE 0 END AS c2 "
        f"FROM g, c{d - 1} WHERE g.day = {d})"
        for d in range(1, _KM_H))
    + " " + " UNION ALL ".join(
        f"SELECT CAST({d} AS BIGINT) AS day, "
        "CAST(g.atrisk AS BIGINT) AS at_risk, "
        "CAST(g.d1 AS BIGINT) AS d1, CAST(g.d2 AS BIGINT) AS d2, "
        f"CAST(c{d}.s AS BIGINT) AS s_ppm, "
        f"CAST(c{d}.c1 AS BIGINT) AS cif1_ppm, "
        f"CAST(c{d}.c2 AS BIGINT) AS cif2_ppm FROM g, c{d} "
        f"WHERE g.day = {d}"
        for d in range(_KM_H))
)

# dyadic-EWMA backtest: 8 lag terms, Mersenne 255 denominator
_SQL_EWMA = (
    "WITH " + _SQL_DENSE_GRID + ", "
    "r AS (SELECT event_type, hr, c, row_number() OVER "
    "(PARTITION BY event_type ORDER BY hr) AS i FROM dd), "
    "p AS (SELECT event_type, i, 255 * c - ("
    + " + ".join(f"{1 << (8 - k)} * lag(c, {k}) OVER w"
                 for k in range(1, 9))
    + ") AS errn FROM r WINDOW w AS "
    "(PARTITION BY event_type ORDER BY i)) "
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval, "
    "CAST(SUM(abs(errn)) AS BIGINT) AS sae_scaled, "
    "CAST(1000 * SUM(abs(errn)) // (255 * count(*)) AS BIGINT) "
    "AS mae_milli FROM p WHERE i > 8 GROUP BY 1"
)


def _sql_ss(num: str, den: str) -> str:
    """Sign-split trunc-ppm division fragment: Python floors and
    DuckDB truncates on negatives, so every possibly-negative division
    routes through abs() with an explicit re-sign (the repo-wide
    discipline)."""
    return (f"CASE WHEN {den} = 0 THEN 0 "
            f"WHEN ({num} >= 0) = ({den} > 0) "
            f"THEN 1000000 * abs({num}) // abs({den}) "
            f"ELSE -(1000000 * abs({num}) // abs({den})) END")


def oracle_sql() -> dict[str, str]:
    quality_inner = (
        f"SELECT url, {_SQL_QUALITY_METRICS.strip()}, lang FROM ({_SQL_EXPECTED_PAGES})"
    )
    return {
        "extract_text": f"SELECT url, text FROM ({_SQL_EXPECTED_PAGES})",
        "quality_pages": (
            "SELECT url, n_chars, n_tokens, uniq_tokens, rep_ratio, struct_ratio, "
            f"confidence, {_SQL_VERDICT} AS verdict, "
            "lang IN ('en','de','fr','es') AS lang_ok FROM ("
            f"SELECT url, n_chars, n_tokens, uniq_tokens, good_lines, n_lines, lang, "
            f"{_SQL_QUALITY_DERIVED.strip()} FROM ({quality_inner}))"
        ),
        "classify_pages": (
            f"SELECT {_SQL_URL} AS url, {_SQL_CATEGORY} AS category, "
            f"{_SQL_VOTES} AS votes FROM documents"
        ),
        "preprocess_decision": (
            "SELECT url, verdict, "
            "verdict IN ('pre_processing', 'deep_analysis') AS needs_preprocessing, "
            "CASE verdict "
            "WHEN 'pre_processing' THEN ['contrast_stretch', 'brightness'] "
            "WHEN 'deep_analysis' THEN ['contrast_stretch', 'black_point', 'brightness'] "
            "ELSE CAST([] AS VARCHAR[]) END AS pp_operations, "
            "CASE verdict WHEN 'direct_analysis' THEN 'none' "
            "WHEN 'pre_processing' THEN 'normal' "
            "WHEN 'deep_analysis' THEN 'high' "
            "ELSE 'reject' END AS pp_priority FROM ("
            f"SELECT url, {_SQL_VERDICT} AS verdict FROM ("
            "SELECT url, n_chars, "
            f"{_SQL_QUALITY_DERIVED.strip()} FROM ("
            f"SELECT url, {_SQL_QUALITY_METRICS.strip()} FROM ({_SQL_EXPECTED_PAGES}))))"
        ),
        "entities_po": (
            f"SELECT {_SQL_URL} AS url, "
            "'PO-' || (10000 + doc_id) AS po_number, "
            "lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') || '.' || "
            "lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '.2024' AS po_date, "
            "'GLOBAL TRADING COMPANY ' || (doc_id % 7) || ' LIMITED' AS seller, "
            "'ACME IMPORTS ' || (doc_id % 5) || ' LLC' AS buyer, "
            "'STEEL COILS GRADE ' || (doc_id % 9) AS goods, "
            "(100 + doc_id % 400) || '.00' AS quantity, "
            "'MT' AS unit, 'USD' AS currency, "
            "format('{:,}', (100 + doc_id % 400) * 500) || '.00' AS total_amount, "
            "'CFR SINGAPORE (INCOTERMS 2020)' AS incoterms "
            "FROM documents WHERE doc_id % 5 = 2 AND doc_id % 97 <> 0"
        ),
        "entities_invoice": (
            f"SELECT {_SQL_URL} AS url, "
            "'INV-' || (20000 + doc_id) AS inv_number, "
            "lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') || '.' || "
            "lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '.2024' AS inv_date, "
            "'GLOBAL TRADING COMPANY ' || (doc_id % 7) || ' LIMITED' AS seller, "
            "'ACME IMPORTS ' || (doc_id % 5) || ' LLC' AS buyer, "
            "'USD' AS currency, "
            f"({_INV_Q1} * {_INV_P1} + {_INV_Q2} * {_INV_P2}) || '.00' AS total_amount, "
            "'CIF ROTTERDAM (INCOTERMS 2020)' AS incoterms, "
            "[{'description': 'STEEL COILS GRADE ' || (doc_id % 9), "
            "'hs_code': '7209.1' || (doc_id % 7), "
            f"'quantity': CAST({_INV_Q1} AS VARCHAR), 'unit': 'MT', "
            f"'unit_price': {_INV_P1} || '.00', "
            f"'amount': ({_INV_Q1} * {_INV_P1}) || '.00'}}, "
            "{'description': 'ALUMINIUM SHEETS TYPE ' || (doc_id % 4), "
            "'hs_code': '7606.1' || (doc_id % 7), "
            f"'quantity': CAST({_INV_Q2} AS VARCHAR), 'unit': 'KG', "
            f"'unit_price': {_INV_P2} || '.00', "
            f"'amount': ({_INV_Q2} * {_INV_P2}) || '.00'}}] AS goods_items "
            "FROM documents WHERE doc_id % 10 = 4 AND doc_id % 97 <> 0"
        ),
        "rules_po": (
            f"SELECT {_SQL_URL} AS url, "
            "CASE WHEN doc_id % 400 < 200 THEN 8 ELSE 7 END AS rules_passed, "
            "CASE WHEN doc_id % 400 < 200 THEN 0 ELSE 1 END AS rules_failed, "
            "doc_id % 400 < 200 AS overall_valid "
            "FROM documents WHERE doc_id % 5 = 2 AND doc_id % 97 <> 0"
        ),
        # closed-form layout geometry (minipdf.build_from_lines docstring):
        # x = 36 + Σ_before(6·len+4), y = 50 + 100·block + 12·line, ×2 scale.
        # L = len(po_number), A = len(total_amount) are the only variable widths.
        "wordbox_match": (
            f"SELECT {_SQL_URL} AS url, "
            "1 AS po_number_page, 196.0 AS po_number_x0, 100.0 AS po_number_y0, "
            "2 * (98 + 6 * L) AS po_number_x1, 120.0 AS po_number_y1, "
            "1 AS po_date_page, 2 * (136 + 6 * L) AS po_date_x0, 100.0 AS po_date_y0, "
            "2 * (136 + 6 * L) + 120.0 AS po_date_x1, 120.0 AS po_date_y1, "
            "1 AS seller_page, 164.0 AS seller_x0, 124.0 AS seller_y0, "
            "532.0 AS seller_x1, 144.0 AS seller_y1, "
            "1 AS buyer_page, 152.0 AS buyer_x0, 148.0 AS buyer_y0, "
            "356.0 AS buyer_x1, 168.0 AS buyer_y1, "
            "1 AS total_amount_page, 276.0 AS total_amount_x0, 348.0 AS total_amount_y0, "
            "2 * (138 + 6 * A) AS total_amount_x1, 368.0 AS total_amount_y1 "
            "FROM (SELECT doc_id, source, "
            "CAST(length('PO-' || (10000 + doc_id)) AS DOUBLE) AS L, "
            "CAST(length(format('{:,}', (100 + doc_id % 400) * 500) || '.00') AS DOUBLE) AS A "
            "FROM documents WHERE doc_id % 5 = 2 AND doc_id % 97 <> 0)"
        ),
        "docs_exact_dedup": (
            "SELECT doc_id, lang, source FROM documents WHERE doc_id IN "
            "(SELECT min(doc_id) FROM documents GROUP BY md5(text))"
        ),
        "token_stats": (
            # CAST: DuckDB sum() over ints is HUGEINT → float64 in pandas;
            # the Ray side sums int64 (VERDICT r1 "What's wrong" #1)
            "SELECT lang, count(*) AS n_docs, "
            "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens, "
            "floor(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) * 1e6) / 1e6 "
            "AS avg_tokens FROM documents GROUP BY lang"
        ),
        "doc_quality": (
            "SELECT doc_id, n_chars, n_tokens, uniq_tokens, rep_ratio, struct_ratio, "
            f"confidence, {_SQL_VERDICT} AS verdict, "
            "lang IN ('en','de','fr','es') AS lang_ok FROM ("
            "SELECT doc_id, n_chars, n_tokens, uniq_tokens, good_lines, n_lines, lang, "
            f"{_SQL_QUALITY_DERIVED.strip()} FROM ("
            f"SELECT doc_id, lang, {_SQL_QUALITY_METRICS.strip()} FROM documents))"
        ),
        "events_hourly": (
            "SELECT date_trunc('hour', ts) AS hour, event_type, "
            "count(*) AS n_events, round(sum(value), 2) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "events_sessions": (
            "WITH gaps AS (SELECT user_id, ts - lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts) AS gap FROM events) "
            "SELECT user_id, count(CASE WHEN gap IS NULL OR "
            "gap > INTERVAL 30 MINUTE THEN 1 END) AS n_sessions "
            "FROM gaps GROUP BY user_id"
        ),
        "q1_lineitem": (
            # money summed in exact integer cents (mirrors the Ray side;
            # float sum order differs between engines at scale)
            "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 "
            "AS sum_base_price, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 "
            "AS sum_revenue, "
            "count(*) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_by_nation": (
            "SELECT n_name, count(*) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 "
            "AS total_price "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "minhash_neardup": _SQL_JACCARD_PAIRS,
        "ppjoin_pairs": _SQL_JACCARD_PAIRS,
        "containment_pairs": (
            f"WITH pages AS ({_SQL_PAGES_WITH_AMP}), "
            "sh AS (SELECT url, "
            "list_distinct(list_transform(generate_series(1, len(toks) - 2), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh "
            "FROM (SELECT url, list_filter(string_split_regex(text, "
            "'\\s+'), x -> x <> '') AS toks FROM pages "
            "WHERE text <> '')) "
            "SELECT a.url AS id_sub, b.url AS id_super, "
            "CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter, "
            "CAST(len(a.sh) AS BIGINT) AS n_sub "
            "FROM sh a JOIN sh b ON a.url <> b.url "
            "WHERE len(a.sh) > 0 AND "
            "len(list_intersect(a.sh, b.sh)) * 1000000 >= "
            "800000 * len(a.sh)"
        ),
        "jaccard_pairs": (
            "WITH sh AS (SELECT doc_id, source, "
            "list_distinct(list_transform(generate_series(1, len(toks) - 2), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh "
            "FROM (SELECT doc_id, source, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks "
            "FROM documents)) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a JOIN sh b "
            "ON a.source = b.source AND a.doc_id < b.doc_id "
            "WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
            "len(list_distinct(a.sh || b.sh)) >= 0.5"
        ),
        # survivors = min-of-component; near-dup components in this corpus
        # are cliques (every member pair exceeds the threshold), so the min
        # node is exactly the one never appearing on the greater (url_b) side
        "minhash_dedup_keep": (
            f"WITH pairs AS ({_SQL_JACCARD_PAIRS}) "
            f"SELECT url FROM ({_SQL_PAGES_WITH_AMP}) "
            "WHERE url NOT IN (SELECT url_b FROM pairs)"
        ),
        "simhash_hamming": (
            f"SELECT {_SQL_URL} AS url_a, {_SQL_URL} || '?amp=1' AS url_b "
            "FROM documents WHERE doc_id % 50 IN (3, 7) AND doc_id % 97 <> 0"
        ),
        "embedding_neardup": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM embeddings a "
            "JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4"
        ),
        "topk_similarity": (
            "WITH s AS (SELECT vec_id, list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS c "
            "FROM embeddings WHERE vec_id <> 0) "
            "SELECT vec_id, floor(c * 1e4) / 1e4 AS score FROM s "
            "ORDER BY c DESC, vec_id LIMIT 10"
        ),
        # gaps-and-islands segmentation: island = rn − rn-per-category;
        # a new group starts at every always_separate page or at run
        # position 0, 2, 4… (the max_pages_per_group=2 cap)
        "group_pages": (
            "WITH pages AS ("
            "  SELECT doc_id, i, CASE ((doc_id + i) // 3) % 3 "
            "    WHEN 0 THEN 'data_report' WHEN 1 THEN 'purchase_order' "
            "    ELSE 'report_misc' END AS category "
            "  FROM documents, LATERAL (SELECT unnest(range(0, 3 + doc_id % 6)) AS i)"
            "), runs AS ("
            "  SELECT doc_id, i, category, "
            "    row_number() OVER (PARTITION BY doc_id ORDER BY i) "
            "    - row_number() OVER (PARTITION BY doc_id, category ORDER BY i) AS island "
            "  FROM pages"
            "), pos AS ("
            "  SELECT doc_id, i, category, "
            "    row_number() OVER (PARTITION BY doc_id, category, island ORDER BY i) - 1 AS run_pos "
            "  FROM runs"
            "), flags AS ("
            "  SELECT doc_id, i, category, "
            "    CASE WHEN category = 'purchase_order' OR run_pos % 2 = 0 "
            "    THEN 1 ELSE 0 END AS new_group FROM pos"
            ") SELECT doc_id, i + 1 AS page_num, category, "
            "CAST(sum(new_group) OVER (PARTITION BY doc_id ORDER BY i) - 1 AS BIGINT) "
            "AS group_id FROM flags"
        ),
        "category_summary": (
            f"SELECT {_SQL_CATEGORY} AS category, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
            "floor(sum(confidence) / count(*) * 1e6) / 1e6 AS avg_confidence "
            "FROM (SELECT doc_id, n_chars, "
            f"{_SQL_QUALITY_DERIVED.strip()} FROM ("
            f"SELECT doc_id, {_SQL_QUALITY_METRICS.strip()} "
            f"FROM ({_SQL_EXPECTED_PAGES}))) GROUP BY 1"
        ),
        "vote_distribution": (
            f"SELECT {_SQL_CATEGORY} AS category, {_SQL_VOTES} AS votes, "
            "count(*) AS n_docs FROM documents GROUP BY 1, 2"
        ),
        "q5_local_revenue": (
            "SELECT n_name, count(*) AS n_items, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 "
            "AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "WHERE c_nationkey = s_nationkey GROUP BY n_name"
        ),
        "events_sliding": (
            "SELECT make_timestamp(((epoch_us(ts) // 900000000) - k) * 900000000) "
            "AS window_start, event_type, count(*) AS n_events "
            "FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) GROUP BY 1, 2"
        ),
        "events_asof": (
            "SELECT p.event_id, p.user_id, s.ts AS signup_ts "
            "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
            "ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s "
            "ON p.user_id = s.user_id AND p.ts >= s.ts"
        ),
        "rnn_pairs": (
            "WITH q AS (SELECT vec_id, list_transform(embedding, "
            "x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) "
            "AS qv FROM embeddings), "
            "d AS (SELECT a.vec_id AS va, b.vec_id AS vb, "
            "CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot "
            "FROM q a JOIN q b ON a.vec_id <> b.vec_id), "
            "r AS (SELECT va, vb, dot, row_number() OVER ("
            "PARTITION BY va ORDER BY dot DESC, vb ASC) AS rn FROM d), "
            "nn AS (SELECT va, vb, dot FROM r WHERE rn = 1) "
            "SELECT a.va AS id_a, a.vb AS id_b, a.dot AS dot_ab "
            "FROM nn a JOIN nn b ON a.vb = b.va AND b.vb = a.va "
            "WHERE a.va < a.vb"
        ),
        "mean_embedding": (
            "WITH u AS (SELECT label, "
            "unnest(generate_series(1, len(embedding))) AS dim, "
            "unnest(list_transform(embedding, x -> "
            "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS q "
            "FROM embeddings) "
            "SELECT label, dim, CAST(sum(q) AS BIGINT) AS sum_q, "
            "count(*) AS n FROM u GROUP BY label, dim"
        ),
        "kmv_intersect": (
            "WITH ha AS (SELECT DISTINCT "
            + _sql_md5_le64("CAST(user_id AS VARCHAR)")
            + " AS hv FROM events WHERE event_type = 'click'), "
            "sa AS (SELECT hv FROM ha ORDER BY hv LIMIT 64), "
            "hb AS (SELECT DISTINCT "
            + _sql_md5_le64("CAST(user_id AS VARCHAR)")
            + " AS hv FROM events WHERE event_type = 'purchase'), "
            "sb AS (SELECT hv FROM hb ORDER BY hv LIMIT 64), "
            "u AS (SELECT DISTINCT hv FROM "
            "(SELECT hv FROM sa UNION ALL SELECT hv FROM sb)), "
            "o AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM u), "
            "st AS (SELECT CASE WHEN (SELECT count(*) FROM u) >= 64 "
            "THEN (SELECT hv FROM o WHERE rn = 64) "
            "ELSE (SELECT max(hv) FROM u) END AS theta, "
            "CASE WHEN (SELECT count(*) FROM u) >= 64 THEN 64 "
            "ELSE (SELECT count(*) FROM u) END AS nu), "
            "cm AS (SELECT count(*) AS c FROM sa, st "
            "WHERE sa.hv <= st.theta AND sa.hv IN (SELECT hv FROM sb)), "
            "eu AS (SELECT nu, CASE WHEN nu >= 64 "
            "THEN CAST(63 AS HUGEINT) * "
            "CAST(18446744073709551616 AS HUGEINT) // theta "
            "ELSE CAST(nu AS HUGEINT) END AS est_union FROM st) "
            "SELECT 64 AS k, CAST(nu AS BIGINT) AS n_union_kept, "
            "CAST(c AS BIGINT) AS common, "
            "CAST(est_union AS BIGINT) AS est_union, "
            "CAST(CAST(c AS HUGEINT) * est_union // nu AS BIGINT) "
            "AS est_intersect FROM eu, cm"
        ),
        "kmv_difference": (
            "WITH ha AS (SELECT DISTINCT "
            + _sql_md5_le64("CAST(user_id AS VARCHAR)")
            + " AS hv FROM events WHERE event_type = 'click'), "
            "sa AS (SELECT hv FROM ha ORDER BY hv LIMIT 64), "
            "hb AS (SELECT DISTINCT "
            + _sql_md5_le64("CAST(user_id AS VARCHAR)")
            + " AS hv FROM events WHERE event_type = 'purchase'), "
            "sb AS (SELECT hv FROM hb ORDER BY hv LIMIT 64), "
            "u AS (SELECT DISTINCT hv FROM "
            "(SELECT hv FROM sa UNION ALL SELECT hv FROM sb)), "
            "o AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM u), "
            "st AS (SELECT CASE WHEN (SELECT count(*) FROM u) >= 64 "
            "THEN (SELECT hv FROM o WHERE rn = 64) "
            "ELSE (SELECT max(hv) FROM u) END AS theta, "
            "CASE WHEN (SELECT count(*) FROM u) >= 64 THEN 64 "
            "ELSE (SELECT count(*) FROM u) END AS nu), "
            "cm AS (SELECT count(*) AS c FROM sa, st "
            "WHERE sa.hv <= st.theta AND sa.hv IN (SELECT hv FROM sb)), "
            "ab AS (SELECT count(*) AS na FROM sa, st "
            "WHERE sa.hv <= st.theta), "
            "bb AS (SELECT count(*) AS nb FROM sb, st "
            "WHERE sb.hv <= st.theta), "
            "eu AS (SELECT nu, CASE WHEN nu >= 64 "
            "THEN CAST(63 AS HUGEINT) * "
            "CAST(18446744073709551616 AS HUGEINT) // theta "
            "ELSE CAST(nu AS HUGEINT) END AS est_union FROM st) "
            "SELECT 64 AS k, CAST(nu AS BIGINT) AS n_union_kept, "
            "CAST(est_union AS BIGINT) AS est_union, "
            "CAST(CAST(na - c AS HUGEINT) * est_union // nu AS BIGINT) "
            "AS est_only_a, "
            "CAST(CAST(nb - c AS HUGEINT) * est_union // nu AS BIGINT) "
            "AS est_only_b FROM eu, cm, ab, bb"
        ),
        "copurchase_pairs": (
            "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) "
            "SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, "
            "count(*) AS n FROM d a JOIN d b "
            "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
            "GROUP BY 1, 2 HAVING count(*) >= 2"
        ),
        "grouped_mode": (
            "WITH c AS (SELECT user_id, event_type AS mode, "
            "count(*) AS n FROM events GROUP BY user_id, event_type), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY user_id "
            "ORDER BY n DESC, mode ASC) AS rn FROM c) "
            "SELECT user_id, mode, n FROM r WHERE rn = 1"
        ),
        "pareto_parts": (
            "WITH P AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(round(p_retailprice * 100) AS BIGINT) AS price_c FROM part) "
            "SELECT * FROM P p WHERE NOT EXISTS (SELECT 1 FROM P q "
            "WHERE q.price_c <= p.price_c AND q.p_size >= p.p_size "
            "AND (q.price_c < p.price_c OR q.p_size > p.p_size))"
        ),
        "q3_topn": (
            "SELECT o_orderkey, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) "
            "/ 10000.0 AS revenue, o_orderdate, o_orderpriority "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1995-03-15' "
            "AND l_shipdate > TIMESTAMP '1995-03-15' "
            "GROUP BY o_orderkey, o_orderdate, o_orderpriority "
            "ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) DESC, "
            "o_orderkey LIMIT 10"
        ),
        "retention_cohorts": (
            "WITH w AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk FROM events), "
            "f AS (SELECT user_id, min(wk) AS cohort_week FROM w "
            "GROUP BY user_id) "
            "SELECT f.cohort_week, w.wk - f.cohort_week AS week_offset, "
            "count(*) AS n_users FROM w JOIN f USING (user_id) "
            "GROUP BY 1, 2"
        ),
        "segment_digests": (
            "WITH r AS (SELECT c_custkey // 100 AS segment, "
            + _sql_md5_le64("CAST(c_custkey AS VARCHAR) || '|' || c_name")
            + " AS hv FROM customer), "
            "a AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_rows, "
            "sum(hv) % CAST(18446744073709551616 AS HUGEINT) AS chk "
            "FROM r GROUP BY segment) "
            "SELECT segment, n_rows, "
            "CAST(CASE WHEN chk >= CAST(9223372036854775808 AS HUGEINT) "
            "THEN chk - CAST(18446744073709551616 AS HUGEINT) "
            "ELSE chk END AS BIGINT) AS digest FROM a"
        ),
        "sliding_unique_users": (
            "WITH e AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h FROM events), "
            "grid AS (SELECT unnest(generate_series("
            "(SELECT min(h) FROM e), (SELECT max(h) FROM e))) AS hour) "
            "SELECT grid.hour, count(DISTINCT e.user_id) AS n_distinct "
            "FROM grid LEFT JOIN e ON e.h BETWEEN grid.hour - 23 "
            "AND grid.hour GROUP BY grid.hour"
        ),
        "user_coverage": (
            "WITH iv AS (SELECT user_id, "
            "CAST(floor(epoch(ts)) AS BIGINT) AS s, "
            "CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e FROM events), "
            "m AS (SELECT *, max(e) OVER (PARTITION BY user_id "
            "ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING) AS prev_max FROM iv), "
            "g AS (SELECT *, CASE WHEN prev_max IS NULL "
            "OR s > prev_max THEN 1 ELSE 0 END AS brk FROM m), "
            "i AS (SELECT *, sum(brk) OVER (PARTITION BY user_id "
            "ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS isl FROM g), "
            "z AS (SELECT user_id, isl, max(e) - min(s) AS len "
            "FROM i GROUP BY user_id, isl) "
            "SELECT user_id, CAST(sum(len) AS BIGINT) AS covered "
            "FROM z GROUP BY user_id"
        ),
        "quantity_dense_rank": (
            "SELECT l_orderkey, l_linenumber, "
            "CAST(dense_rank() OVER (PARTITION BY l_returnflag "
            "ORDER BY CAST(round(l_quantity) AS BIGINT)) AS BIGINT) "
            "AS dense_rank FROM lineitem"
        ),
        "global_index": (
            "SELECT doc_id, CAST(row_number() OVER "
            "(ORDER BY n_chars, doc_id) - 1 AS BIGINT) AS row_idx "
            "FROM documents"
        ),
        "record_linkage": (
            "WITH dirty AS (SELECT c_custkey + 1000000 AS crm_id, "
            "lower(CASE WHEN c_custkey % 3 = 0 "
            "THEN substr(c_name, 1, len(c_name) - 1) "
            "WHEN c_custkey % 3 = 1 THEN upper(c_name) "
            "ELSE c_name END) AS d_name_n, "
            "CAST(round(c_acctbal * 100) AS BIGINT) + c_custkey % 7 - 3 "
            "AS d_bal, c_nationkey, c_mktsegment FROM customer), "
            "base AS (SELECT c_custkey, lower(c_name) AS name_n, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS bal, "
            "c_nationkey, c_mktsegment FROM customer), "
            "p AS (SELECT b.c_custkey, d.crm_id, "
            "(CASE WHEN b.name_n = d.d_name_n THEN 40 "
            "WHEN levenshtein(b.name_n, d.d_name_n) <= 1 THEN 35 "
            "ELSE 0 END "
            "+ CASE WHEN abs(b.bal - d.d_bal) <= 3 THEN 25 ELSE 0 END) "
            "AS score FROM base b JOIN dirty d "
            "ON b.c_nationkey = d.c_nationkey "
            "AND b.c_mktsegment = d.c_mktsegment) "
            "SELECT c_custkey, crm_id, CAST(score AS BIGINT) AS score "
            "FROM p WHERE score >= 60"
        ),
        "golden_record": (
            "WITH v AS (SELECT c_custkey, t.v AS ver, "
            "CASE WHEN t.v = c_custkey % 3 "
            "THEN c_name || '/' || t.v END AS g_name, "
            "CASE WHEN (c_custkey + t.v) % 2 = 0 "
            "THEN c_mktsegment || '/' || t.v END AS g_seg, "
            "CASE WHEN t.v <> 1 "
            "THEN CAST(round(c_acctbal * 100) AS BIGINT) + t.v END "
            "AS g_bal FROM customer, range(0, 3) t(v)) "
            "SELECT c_custkey, "
            "max_by(g_name, ver) FILTER (WHERE g_name IS NOT NULL) "
            "AS g_name, "
            "max_by(g_seg, ver) FILTER (WHERE g_seg IS NOT NULL) "
            "AS g_seg, "
            "max_by(g_bal, ver) FILTER (WHERE g_bal IS NOT NULL) "
            "AS g_bal, "
            "count(*) AS n_versions FROM v GROUP BY c_custkey"
        ),
        "cc_labels": (
            "WITH RECURSIVE mx AS (SELECT max(c_custkey) AS m "
            "FROM customer), "
            "e0 AS (SELECT (c_custkey // 8) * 8 AS a, c_custkey AS b "
            "FROM customer WHERE c_custkey % 8 <> 0 "
            "UNION ALL "
            "SELECT c_custkey AS a, c_custkey + 13 AS b "
            "FROM customer, mx WHERE c_custkey % 40 = 16 "
            "AND c_custkey + 13 <= m), "
            "e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0), "
            "r AS (SELECT c_custkey AS node, c_custkey AS reach "
            "FROM customer "
            "UNION "
            "SELECT r.node, e.b AS reach FROM r JOIN e ON r.reach = e.a) "
            "SELECT node AS c_custkey, "
            "CAST(min(reach) AS BIGINT) AS component "
            "FROM r GROUP BY node"
        ),
        "dag_layers": (
            "WITH RECURSIVE mx AS (SELECT max(c_custkey) AS m "
            "FROM customer), "
            "e AS (SELECT c_custkey AS a, c_custkey + 1 AS b "
            "FROM customer, mx "
            "WHERE c_custkey % 4 <> 3 AND c_custkey + 1 <= m "
            "UNION ALL "
            "SELECT c_custkey AS a, c_custkey + 3 AS b "
            "FROM customer, mx "
            "WHERE c_custkey % 9 = 2 AND c_custkey + 3 <= m), "
            "r AS (SELECT c_custkey AS node, 0 AS d FROM customer "
            "UNION "
            "SELECT e.b AS node, r.d + 1 AS d FROM r JOIN e "
            "ON r.node = e.a) "
            "SELECT node AS c_custkey, CAST(max(d) AS BIGINT) AS layer "
            "FROM r GROUP BY node"
        ),
        "dq_audit": (
            "WITH n AS (SELECT CAST(count(*) AS BIGINT) AS t FROM orders), "
            "v AS ("
            "SELECT 'not_null:o_custkey' AS chk, "
            "(SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS v "
            "UNION ALL SELECT 'unique:o_orderkey', "
            "(SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) "
            "UNION ALL SELECT 'unique:o_custkey', "
            "(SELECT count(*) - count(DISTINCT o_custkey) FROM orders) "
            "UNION ALL SELECT 'accepted_values:o_orderstatus', "
            "(SELECT count(*) FROM orders WHERE o_orderstatus IS NULL "
            "OR o_orderstatus NOT IN ('O','F','P')) "
            "UNION ALL SELECT 'accepted_values:o_orderpriority', "
            "(SELECT count(*) FROM orders WHERE o_orderpriority IS NULL "
            "OR o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM')) "
            "UNION ALL SELECT 'in_range:o_totalprice', "
            "(SELECT count(*) FROM orders WHERE o_totalprice IS NULL "
            "OR o_totalprice < 0.01 OR o_totalprice > 300000.0) "
            "UNION ALL SELECT 'foreign_key:o_custkey->customer_good', "
            "(SELECT count(*) FROM orders o LEFT JOIN "
            "(SELECT DISTINCT c_custkey FROM customer "
            "WHERE c_acctbal >= 0) c ON o.o_custkey = c.c_custkey "
            "WHERE c.c_custkey IS NULL)) "
            "SELECT v.chk AS \"check\", CAST(v.v AS BIGINT) AS violations, "
            "n.t AS total_rows, v.v = 0 AS passed FROM v, n"
        ),
        "diversity_index": (
            "WITH c AS (SELECT source, lang, count(*) AS c "
            "FROM documents GROUP BY source, lang), "
            "a AS (SELECT source, CAST(sum(c) AS HUGEINT) AS n, "
            "sum(CAST(c AS HUGEINT) * c) AS ss, count(*) AS k "
            "FROM c GROUP BY source) "
            "SELECT source, CAST(n AS BIGINT) AS n_rows, "
            "CAST(k AS BIGINT) AS n_cats, "
            "CAST(1000000 - (1000000 * ss) // (n * n) AS BIGINT) "
            "AS diversity_ppm FROM a"
        ),
        "benford_audit": (
            "WITH v AS (SELECT o_orderpriority, "
            "substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) "
            "AS VARCHAR), 1, 1) AS digit FROM orders "
            "WHERE round(o_totalprice * 100) > 0), "
            "c AS (SELECT o_orderpriority, digit, count(*) AS c "
            "FROM v GROUP BY o_orderpriority, digit), "
            "n AS (SELECT o_orderpriority, sum(c) AS n FROM c "
            "GROUP BY o_orderpriority), "
            "b AS (SELECT * FROM (VALUES ('1', 301030), ('2', 176091), "
            "('3', 124939), ('4', 96910), ('5', 79181), ('6', 66947), "
            "('7', 57992), ('8', 51153), ('9', 45757)) "
            "AS t(digit, benford_ppm)) "
            "SELECT c.o_orderpriority, c.digit, "
            "CAST(c.c AS BIGINT) AS n_values, "
            "CAST((c.c * 1000000) // n.n AS BIGINT) AS share_ppm, "
            "CAST(b.benford_ppm AS BIGINT) AS benford_ppm, "
            "CAST(ABS((c.c * 1000000) // n.n - b.benford_ppm) AS BIGINT) "
            "AS dev_ppm "
            "FROM c JOIN n USING (o_orderpriority) JOIN b USING (digit)"
        ),
        "unpivot_measures": (
            "SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, "
            "l_quantity AS value FROM lineitem "
            "UNION ALL SELECT l_orderkey, l_linenumber, "
            "'l_extendedprice', l_extendedprice FROM lineitem "
            "UNION ALL SELECT l_orderkey, l_linenumber, "
            "'l_discount', l_discount FROM lineitem "
            "UNION ALL SELECT l_orderkey, l_linenumber, "
            "'l_tax', l_tax FROM lineitem"
        ),
        "mad_outliers": (
            "WITH m AS (SELECT source, "
            "CAST(2 * median(n_chars) AS BIGINT) AS med2 "
            "FROM documents GROUP BY source), "
            "d AS (SELECT doc.doc_id, doc.source, doc.n_chars, m.med2, "
            "ABS(2 * doc.n_chars - m.med2) AS dd "
            "FROM documents doc JOIN m USING (source)), "
            "md AS (SELECT source, CAST(2 * median(dd) AS BIGINT) AS mad4 "
            "FROM d GROUP BY source) "
            "SELECT d.doc_id, d.source, d.n_chars, d.med2 AS med_x2, "
            "md.mad4 AS mad_x4, 2 * d.dd * 1 > 3 * md.mad4 AS is_outlier "
            "FROM d JOIN md USING (source)"
        ),
        "k_anonymity": (
            "WITH s AS (SELECT c_custkey, c_nationkey, c_mktsegment, "
            "count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n "
            "FROM customer) "
            "SELECT c_custkey, "
            "CASE WHEN n >= 10 THEN CAST(c_nationkey AS VARCHAR) "
            "ELSE '*' END AS c_nationkey_qi, "
            "CASE WHEN n >= 10 THEN c_mktsegment ELSE '*' END "
            "AS c_mktsegment_qi, "
            "n >= 10 AS k_anonymous FROM s"
        ),
        "windowed_paths": (
            "WITH e AS (SELECT user_id, "
            "CAST(epoch_us(ts) // 1000000 AS BIGINT) AS s, "
            "event_type FROM events), "
            "l1 AS (SELECT *, coalesce(sum(CASE WHEN event_type = "
            "'view' THEN 1 ELSE 0 END) OVER (PARTITION BY user_id "
            "ORDER BY s RANGE BETWEEN 600 PRECEDING AND 1 PRECEDING), "
            "0) AS w1 FROM e), "
            "l2 AS (SELECT *, coalesce(sum(CASE WHEN event_type = "
            "'click' THEN w1 ELSE 0 END) OVER (PARTITION BY user_id "
            "ORDER BY s RANGE BETWEEN 600 PRECEDING AND 1 PRECEDING), "
            "0) AS w2 FROM l1) "
            "SELECT user_id, CAST(coalesce(sum(CASE WHEN event_type = "
            "'purchase' THEN w2 ELSE 0 END), 0) AS BIGINT) AS n_paths "
            "FROM l2 GROUP BY user_id"
        ),
        "user_ledger": (
            "WITH e AS (SELECT user_id, ts, event_id, "
            "CAST(round(value * 100) AS BIGINT) * "
            "(CASE WHEN event_type IN ('purchase', 'error') "
            "THEN -1 ELSE 1 END) AS d FROM events), "
            "r AS (SELECT user_id, ts, event_id, d, "
            "sum(d) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS a FROM e), "
            "m AS (SELECT *, least(min(a) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id), 0) AS mn, "
            "coalesce(least(min(a) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND 1 PRECEDING), 0), 0) AS mn_prev FROM r), "
            "b AS (SELECT user_id, a - mn AS bal, "
            "CASE WHEN a < mn_prev THEN 1 ELSE 0 END AS cl, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rn FROM m) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(max(CASE WHEN rn = 1 THEN bal END) AS BIGINT) "
            "AS final_c, CAST(max(bal) AS BIGINT) AS peak_c, "
            "CAST(sum(cl) AS BIGINT) AS n_clamps "
            "FROM b GROUP BY user_id"
        ),
        "cusum_alarms": (
            "WITH hr AS (SELECT event_type AS ky, "
            "date_trunc('hour', ts) AS w, "
            "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
            "p AS (SELECT ky, CAST(sum(n) // count(*) + 1 AS BIGINT) "
            "AS kk FROM hr GROUP BY ky), "
            "d AS (SELECT hr.ky, hr.w, hr.n, p.kk, 3 * p.kk AS hh, "
            "hr.n - p.kk AS d FROM hr JOIN p ON hr.ky = p.ky), "
            "r AS (SELECT *, sum(d) OVER (PARTITION BY ky ORDER BY w) "
            "AS a FROM d), "
            "m AS (SELECT *, least(min(a) OVER (PARTITION BY ky "
            "ORDER BY w), 0) AS mn FROM r), "
            "s AS (SELECT ky, n, kk, hh, w, a - mn AS s FROM m) "
            "SELECT ky AS event_type, CAST(count(*) AS BIGINT) "
            "AS n_obs, CAST(min(kk) AS BIGINT) AS k, "
            "CAST(min(hh) AS BIGINT) AS h, "
            "CAST(sum(CASE WHEN s >= hh THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_alarms, CAST(max(s) AS BIGINT) AS max_s, "
            "CAST(coalesce(min(CASE WHEN s >= hh THEN "
            "epoch_us(w) // 1000000 END), -1) AS BIGINT) "
            "AS first_alarm_s FROM s GROUP BY ky"
        ),
        "unique_prefix": (
            "WITH d AS (SELECT DISTINCT p_name AS name FROM part), "
            "nb AS (SELECT name, lag(name) OVER (ORDER BY name) AS pv, "
            "lead(name) OVER (ORDER BY name) AS nx FROM d), "
            "g AS (SELECT * FROM generate_series(1, 64) t(p)), "
            "lp AS (SELECT nb.name, "
            "coalesce((SELECT max(g.p) FROM g WHERE g.p <= "
            "least(len(nb.name), len(nb.pv)) AND "
            "substr(nb.name, 1, g.p) = substr(nb.pv, 1, g.p)), 0) "
            "AS l1, "
            "coalesce((SELECT max(g.p) FROM g WHERE g.p <= "
            "least(len(nb.name), len(nb.nx)) AND "
            "substr(nb.name, 1, g.p) = substr(nb.nx, 1, g.p)), 0) "
            "AS l2 FROM nb) "
            "SELECT name AS p_name, CAST(CASE WHEN len(name) = 0 "
            "THEN 0 ELSE least(len(name), 1 + greatest(l1, l2)) END "
            "AS BIGINT) AS plen FROM lp"
        ),
        "soundex_blocking": (
            "WITH c AS (SELECT p_name AS name, count(*) AS nr "
            "FROM part GROUP BY 1), "
            "s0 AS (SELECT name, nr, regexp_replace(upper(name), "
            "'[^A-Z]', '', 'g') AS up FROM c), "
            "s1 AS (SELECT name, nr, up, translate(up, "
            "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
            "'01230120022455012623010202') AS dg FROM s0), "
            "s2 AS (SELECT name, nr, up, "
            "regexp_replace(regexp_replace(regexp_replace("
            "regexp_replace(regexp_replace(regexp_replace("
            "regexp_replace(dg, '00+', '0', 'g'), '11+', '1', 'g'), "
            "'22+', '2', 'g'), '33+', '3', 'g'), '44+', '4', 'g'), "
            "'55+', '5', 'g'), '66+', '6', 'g') AS cl FROM s1), "
            "s3 AS (SELECT name, nr, CASE WHEN up = '' THEN '' ELSE "
            "substr(up, 1, 1) || substr(replace(substr(cl, 2), "
            "'0', '') || '000', 1, 3) END AS code FROM s2) "
            "SELECT code, CAST(count(*) AS BIGINT) AS n_names, "
            "CAST(sum(nr) AS BIGINT) AS n_rows FROM s3 GROUP BY code"
        ),
        "zonemap_prune": (
            "WITH z AS (SELECT doc_id // 64 AS b, min(n_chars) AS mn, "
            "max(n_chars) AS mx, count(*) AS n, "
            "sum(CASE WHEN n_chars BETWEEN 1500 AND 3000 THEN 1 "
            "ELSE 0 END) AS m FROM documents GROUP BY 1), "
            "f AS (SELECT count(*) AS n_buckets, "
            "sum(CASE WHEN mx < 1500 OR mn > 3000 THEN 1 ELSE 0 END) "
            "AS n_pruned, sum(n) AS n_rows, "
            "sum(CASE WHEN mx < 1500 OR mn > 3000 THEN 0 ELSE n END) "
            "AS n_scanned, sum(m) AS n_matched FROM z) "
            "SELECT CAST(n_buckets AS BIGINT) AS n_buckets, "
            "CAST(n_pruned AS BIGINT) AS n_pruned, "
            "CAST(n_rows AS BIGINT) AS n_rows, "
            "CAST(n_scanned AS BIGINT) AS n_scanned, "
            "CAST(n_matched AS BIGINT) AS n_matched, "
            "CAST(1000000 * n_pruned // n_buckets AS BIGINT) "
            "AS prune_ppm, "
            "CAST(CASE WHEN n_scanned = 0 THEN 0 ELSE 1000000 * "
            "(n_scanned - n_matched) // n_scanned END AS BIGINT) "
            "AS waste_ppm FROM f"
        ),
        "chi2_independence": (
            "WITH c AS (SELECT source, lang, "
            "CAST(count(*) AS HUGEINT) AS o FROM documents "
            "GROUP BY 1, 2), "
            "r AS (SELECT source, sum(o) AS rk FROM c GROUP BY 1), "
            "l AS (SELECT lang, sum(o) AS ck FROM c GROUP BY 1), "
            "nn AS (SELECT sum(o) AS n FROM c), "
            "grid AS (SELECT r.source, l.lang, r.rk, l.ck, "
            "coalesce(c.o, 0) AS o FROM r CROSS JOIN l "
            "LEFT JOIN c ON c.source = r.source AND c.lang = l.lang) "
            "SELECT g.source, g.lang, CAST(g.o AS BIGINT) AS n_obs, "
            "CAST(1000000 * (g.o * nn.n - g.rk * g.ck) "
            "* (g.o * nn.n - g.rk * g.ck) // "
            "(nn.n * g.rk * g.ck) AS BIGINT) AS contrib_ppm "
            "FROM grid g, nn"
        ),
        "readability": (
            "WITH a AS (SELECT doc_id, "
            "greatest(1, len(regexp_extract_all(lower(text), "
            "'[a-z]+'))) AS w, "
            "greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s, "
            "len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y0 "
            "FROM documents), "
            "b AS (SELECT doc_id, w, s, greatest(w, y0) AS y FROM a) "
            "SELECT doc_id, CAST(w AS BIGINT) AS n_words, "
            "CAST(s AS BIGINT) AS n_sents, CAST(y AS BIGINT) AS n_syll, "
            "CAST(206835000 - 1015 * (1000 * w // s) "
            "- 84600 * (1000 * y // w) AS BIGINT) AS flesch_ppm FROM b"
        ),
        "clustering_coeff": (
            "WITH nn AS (SELECT count(*) AS n FROM documents), "
            "raw AS ("
            "SELECT doc_id AS a, (doc_id + 1) % nn.n AS b "
            "FROM documents, nn "
            "UNION ALL SELECT doc_id, (doc_id + 2) % nn.n "
            "FROM documents, nn "
            "UNION ALL SELECT doc_id, (doc_id * 7 + 1) % nn.n "
            "FROM documents, nn), "
            "e AS (SELECT DISTINCT least(a, b) AS lo, greatest(a, b) "
            "AS hi FROM raw WHERE a <> b), "
            "w AS (SELECT e1.lo AS apex, e1.hi AS b, e2.hi AS c "
            "FROM e e1 JOIN e e2 ON e1.lo = e2.lo AND e1.hi < e2.hi), "
            "t AS (SELECT CAST(count(*) AS BIGINT) AS n_tri FROM w "
            "JOIN e ON e.lo = w.b AND e.hi = w.c), "
            "d AS (SELECT node, count(*) AS dg FROM "
            "(SELECT lo AS node FROM e UNION ALL SELECT hi FROM e) "
            "GROUP BY node), "
            "wg AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes, "
            "CAST(sum(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges "
            "FROM d), "
            "ec AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e) "
            "SELECT wg.n_nodes, ec.n_edges, wg.n_wedges, t.n_tri "
            "AS n_triangles, CAST(CASE WHEN wg.n_wedges = 0 THEN 0 "
            "ELSE 3 * t.n_tri * 1000000 // wg.n_wedges END AS BIGINT) "
            "AS clustering_ppm FROM wg, ec, t"
        ),
        "mann_kendall": (
            "WITH h AS (SELECT event_type AS ky, "
            "date_trunc('hour', ts) AS w, "
            "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
            "p AS (SELECT a.ky, "
            "CAST(sum(CASE WHEN b.n > a.n THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_conc, "
            "CAST(sum(CASE WHEN b.n < a.n THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_disc "
            "FROM h a JOIN h b ON a.ky = b.ky AND a.w < b.w "
            "GROUP BY a.ky), "
            "o AS (SELECT ky, CAST(count(*) AS BIGINT) AS n_obs "
            "FROM h GROUP BY ky) "
            "SELECT o.ky AS event_type, o.n_obs, "
            "coalesce(p.n_conc, 0) AS n_conc, "
            "coalesce(p.n_disc, 0) AS n_disc, "
            "coalesce(p.n_conc, 0) - coalesce(p.n_disc, 0) AS s_stat, "
            "CAST(sign(coalesce(p.n_conc, 0) - coalesce(p.n_disc, 0)) "
            "AS BIGINT) AS trend FROM o LEFT JOIN p USING (ky)"
        ),
        "lag_coactivity": (
            "WITH h AS (SELECT event_type AS ky, "
            "date_trunc('hour', ts) AS w, "
            "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
            "k AS (SELECT DISTINCT ky FROM h), "
            "lags AS (SELECT * FROM generate_series(0, 6) AS t(lag)), "
            "grid AS (SELECT k1.ky AS key_a, k2.ky AS key_b, lags.lag "
            "FROM k k1, k k2, lags WHERE k1.ky <> k2.ky), "
            "dots AS (SELECT g.key_a, g.key_b, g.lag, "
            "CAST(coalesce(sum(a.n * b.n), 0) AS BIGINT) AS dot "
            "FROM grid g LEFT JOIN h a ON a.ky = g.key_a "
            "LEFT JOIN h b ON b.ky = g.key_b "
            "AND b.w = a.w + g.lag * INTERVAL 1 HOUR GROUP BY 1, 2, 3), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY key_a, "
            "key_b ORDER BY dot DESC, lag ASC) AS rn FROM dots), "
            "z AS (SELECT key_a, key_b, dot AS lag0_dot FROM dots "
            "WHERE lag = 0) "
            "SELECT r.key_a, r.key_b, CAST(r.lag AS BIGINT) "
            "AS best_lag, r.dot AS best_dot, z.lag0_dot "
            "FROM r JOIN z USING (key_a, key_b) WHERE rn = 1"
        ),
        "vocab_growth": (
            "WITH tok AS (SELECT u.token, min(d.doc_id) AS mid "
            "FROM documents d, "
            "unnest(string_split(d.text, ' ')) AS u(token) "
            "WHERE u.token <> '' GROUP BY u.token), "
            "tb AS (SELECT CASE WHEN mid = 0 THEN 0 "
            "ELSE length(bin(mid)) END AS b, count(*) AS n "
            "FROM tok GROUP BY 1), "
            "db AS (SELECT CASE WHEN doc_id = 0 THEN 0 "
            "ELSE length(bin(doc_id)) END AS b, count(*) AS n "
            "FROM documents GROUP BY 1), "
            "ks AS (SELECT * FROM generate_series(0, 63) AS t(k) "
            "WHERE k <= (SELECT max(b) FROM db)) "
            "SELECT CAST(ks.k AS BIGINT) AS k, "
            "CAST((SELECT coalesce(sum(n), 0) FROM db "
            "WHERE db.b <= ks.k) AS BIGINT) AS prefix_docs, "
            "CAST((SELECT coalesce(sum(n), 0) FROM tb "
            "WHERE tb.b <= ks.k) AS BIGINT) AS vocab FROM ks"
        ),
        "user_features": (
            "SELECT user_id, count(*) AS n_events, "
            "CAST(min(epoch_us(ts)) AS BIGINT) AS first_us, "
            "CAST(max(epoch_us(ts)) AS BIGINT) AS last_us, "
            "CAST((max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 "
            "AS BIGINT) AS span_s, "
            "count(*) FILTER (WHERE event_type = 'click') AS n_click, "
            "count(*) FILTER (WHERE event_type = 'error') AS n_error, "
            "count(*) FILTER (WHERE event_type = 'purchase') "
            "AS n_purchase, "
            "count(*) FILTER (WHERE event_type = 'signup') AS n_signup, "
            "count(*) FILTER (WHERE event_type = 'view') AS n_view, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS value_c FROM events GROUP BY user_id"
        ),
        "trend_flips": (
            "WITH h AS (SELECT event_type AS k, "
            "date_trunc('hour', ts) AS w, count(*) AS n FROM events "
            "GROUP BY 1, 2), "
            "d AS (SELECT k, w, "
            "n - lag(n) OVER (PARTITION BY k ORDER BY w) AS d FROM h), "
            "nz AS (SELECT k, w, CASE WHEN d > 0 THEN 1 ELSE -1 END "
            "AS s FROM d WHERE d IS NOT NULL AND d <> 0), "
            "f AS (SELECT k, s, "
            "lag(s) OVER (PARTITION BY k ORDER BY w) AS ps FROM nz), "
            "c AS (SELECT k, count(*) FILTER (WHERE s * ps = -1) "
            "AS n_flips FROM f GROUP BY k), "
            "o AS (SELECT k, count(*) AS n_obs FROM h GROUP BY k) "
            "SELECT o.k AS event_type, CAST(o.n_obs AS BIGINT) "
            "AS n_obs, CAST(coalesce(c.n_flips, 0) AS BIGINT) "
            "AS n_flips FROM o LEFT JOIN c USING (k)"
        ),
        "skew_histogram": (
            "WITH s AS (SELECT o_custkey, count(*) AS n FROM orders "
            "GROUP BY 1) "
            "SELECT n AS size, count(*) AS n_keys FROM s GROUP BY 1"
        ),
        "gini_orders": (
            "WITH s AS (SELECT count(*) AS x FROM orders "
            "GROUP BY o_custkey), "
            "r AS (SELECT CAST(x AS HUGEINT) AS x, "
            "row_number() OVER (ORDER BY x) AS i, "
            "count(*) OVER () AS n, sum(x) OVER () AS tot FROM s) "
            "SELECT CAST(max(n) AS BIGINT) AS n_keys, "
            "CAST(max(tot) AS BIGINT) AS total, "
            "CAST(1000000 * sum((2 * i - n - 1) * x) "
            "// (max(n) * max(CAST(tot AS HUGEINT))) AS BIGINT) "
            "AS gini_ppm FROM r"
        ),
        "backtest_mae": (
            "WITH h AS (SELECT event_type, "
            "date_trunc('hour', ts) AS w, count(*) AS n FROM events "
            "GROUP BY 1, 2) "
            "SELECT a.event_type, count(*) AS n_pairs, "
            "CAST(sum(abs(a.n - b.n)) AS BIGINT) AS sum_abs_err, "
            "CAST(sum(abs(a.n - b.n)) // count(*) AS BIGINT) AS mae "
            "FROM h a JOIN h b ON a.event_type = b.event_type "
            "AND b.w = a.w - INTERVAL 24 HOURS GROUP BY 1"
        ),
        # MASE: seasonal-naive MAE scaled by one-step naive MAE, both
        # means cleared in one floor; observed-hour join semantics at
        # both lags
        "mase_eval": (
            "WITH h AS (SELECT event_type, "
            "date_trunc('hour', ts) AS w, count(*) AS n FROM events "
            "GROUP BY 1, 2), "
            "s AS (SELECT a.event_type, count(*) AS n24, "
            "sum(abs(a.n - b.n)) AS sae24 "
            "FROM h a JOIN h b ON a.event_type = b.event_type "
            "AND b.w = a.w - INTERVAL 24 HOURS GROUP BY 1), "
            "o AS (SELECT a.event_type, count(*) AS n1, "
            "sum(abs(a.n - b.n)) AS sae1 "
            "FROM h a JOIN h b ON a.event_type = b.event_type "
            "AND b.w = a.w - INTERVAL 1 HOUR GROUP BY 1) "
            "SELECT s.event_type, "
            "CAST(n24 AS BIGINT) AS n_pairs_season, "
            "CAST(sae24 AS BIGINT) AS sae_season, "
            "CAST(n1 AS BIGINT) AS n_pairs_naive, "
            "CAST(sae1 AS BIGINT) AS sae_naive, "
            "CAST(CASE WHEN sae1 * n24 > 0 THEN "
            "1000000 * CAST(sae24 AS HUGEINT) * n1 "
            "// (CAST(sae1 AS HUGEINT) * n24) ELSE 0 END AS BIGINT) "
            "AS mase_ppm "
            "FROM s JOIN o ON s.event_type = o.event_type"
        ),
        "tvd_drift": (
            "WITH c AS (SELECT source, lang, count(*) AS c "
            "FROM documents GROUP BY 1, 2), "
            "s AS (SELECT source, sum(c) AS ns FROM c GROUP BY 1), "
            "g AS (SELECT lang, sum(c) AS cg FROM c GROUP BY 1), "
            "t AS (SELECT sum(cg) AS ng FROM g), "
            "u AS (SELECT s.source, g.lang, coalesce(c.c, 0) AS cs, "
            "g.cg, s.ns, t.ng FROM s CROSS JOIN g "
            "LEFT JOIN c ON c.source = s.source AND c.lang = g.lang "
            "CROSS JOIN t) "
            "SELECT source, CAST(max(ns) AS BIGINT) AS n, "
            "CAST(1000000 * sum(abs(CAST(cs AS HUGEINT) * ng "
            "- CAST(cg AS HUGEINT) * ns)) "
            "// (2 * max(ns) * max(CAST(ng AS HUGEINT))) AS BIGINT) "
            "AS tvd_ppm FROM u GROUP BY source"
        ),
        "nest_tokens": (
            "WITH t AS (SELECT doc_id, "
            "list_filter(string_split_regex(coalesce(text, ''), '\\s+'), "
            "x -> x <> '') AS toks FROM documents) "
            "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
            "array_to_string(toks, ' ') AS text_norm "
            "FROM t WHERE len(toks) > 0"
        ),
        "longest_streak": (
            "WITH o AS (SELECT user_id, event_type, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn, "
            "row_number() OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) AS rnt FROM events), "
            "l AS (SELECT user_id, count(*) AS len FROM o "
            "GROUP BY user_id, event_type, rn - rnt) "
            "SELECT user_id, CAST(max(len) AS BIGINT) AS longest "
            "FROM l GROUP BY user_id"
        ),
        "supplier_percentile": (
            "WITH ch AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) "
            "AS v, count(*) AS c FROM customer GROUP BY 1), "
            "cc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM ch), "
            "n AS (SELECT count(*) AS n FROM customer), "
            "s AS (SELECT s_suppkey, "
            "CAST(round(s_acctbal * 100) AS BIGINT) AS bal_c "
            "FROM supplier) "
            "SELECT s.s_suppkey, s.bal_c, "
            "CAST(coalesce(cc.cum, 0) * 1000000 // n.n AS BIGINT) "
            "AS pct_ppm "
            "FROM s ASOF LEFT JOIN cc ON cc.v <= s.bal_c CROSS JOIN n"
        ),
        "delta_varint": (
            "WITH v AS (SELECT CAST(epoch_us(o_orderdate) "
            "// 86400000000 AS BIGINT) AS d FROM orders), "
            "s AS (SELECT d, lag(d) OVER (ORDER BY d) AS pd FROM v), "
            "b AS (SELECT CASE WHEN pd IS NULL THEN 8 "
            "WHEN d = pd THEN 1 "
            "ELSE (length(bin(d - pd)) + 6) // 7 END AS bytes FROM s) "
            "SELECT count(*) AS n, "
            "CAST(count(*) * 8 AS BIGINT) AS raw_bytes, "
            "CAST(sum(bytes) AS BIGINT) AS delta_bytes, "
            "CAST(sum(bytes) * 1000000 // (count(*) * 8) AS BIGINT) "
            "AS ratio_ppm FROM b"
        ),
        "impute_mode": (
            "WITH base AS (SELECT c_custkey, c_nationkey, "
            "CASE WHEN c_custkey % 20 = 0 THEN NULL "
            "ELSE c_mktsegment END AS seg FROM customer), "
            "m AS (SELECT c_nationkey, seg AS mode_seg FROM "
            "(SELECT c_nationkey, seg, "
            "row_number() OVER (PARTITION BY c_nationkey "
            "ORDER BY count(*) DESC, seg) AS rn "
            "FROM base WHERE seg IS NOT NULL GROUP BY 1, 2) "
            "WHERE rn = 1) "
            "SELECT b.c_custkey, b.c_nationkey, "
            "coalesce(b.seg, m.mode_seg) AS seg, "
            "b.seg IS NULL AS was_imputed "
            "FROM base b LEFT JOIN m USING (c_nationkey)"
        ),
        "rrf_fusion": (
            "WITH s AS (SELECT p_partkey, "
            "CAST(round(p_retailprice * 100) AS BIGINT) AS price_c, "
            "CAST(p_size AS BIGINT) AS size_v FROM part), "
            "r AS (SELECT p_partkey, "
            "rank() OVER (ORDER BY price_c DESC) AS rank_price_c, "
            "rank() OVER (ORDER BY size_v DESC) AS rank_size_v "
            "FROM s) "
            "SELECT p_partkey, "
            "CAST(rank_price_c AS BIGINT) AS rank_price_c, "
            "CAST(rank_size_v AS BIGINT) AS rank_size_v, "
            "CAST(1000000000 // (60 + rank_price_c) "
            "+ 1000000000 // (60 + rank_size_v) AS BIGINT) AS rrf "
            "FROM r ORDER BY rrf DESC, p_partkey LIMIT 20"
        ),
        "quantile_normalize": (
            "WITH h AS (SELECT source AS s, n_chars AS v, count(*) "
            "AS c FROM documents GROUP BY 1, 2), "
            "cs AS (SELECT s, v, "
            "sum(c) OVER (PARTITION BY s ORDER BY v) AS cum_s, "
            "sum(c) OVER (PARTITION BY s) AS n_s FROM h), "
            "gg AS (SELECT v, sum(c) AS c FROM h GROUP BY 1), "
            "cg AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum_g, "
            "sum(c) OVER () AS n_g FROM gg), "
            "m AS (SELECT cs.s, cs.v, min(cg.v) AS w FROM cs "
            "JOIN cg ON cg.cum_g * cs.n_s >= cs.cum_s * cg.n_g "
            "GROUP BY 1, 2) "
            "SELECT d.doc_id, d.source, d.n_chars, "
            "CAST(m.w AS BIGINT) AS norm_v FROM documents d "
            "JOIN m ON m.s = d.source AND m.v = d.n_chars"
        ),
        "subsequence_counts": (
            "WITH l1 AS (SELECT user_id, ts, event_id, event_type, "
            "coalesce(sum(CASE WHEN event_type = 'view' THEN 1 "
            "ELSE 0 END) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS c1 FROM events), "
            "l2 AS (SELECT *, coalesce(sum(CASE WHEN event_type = "
            "'click' THEN c1 ELSE 0 END) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS c2 FROM l1) "
            "SELECT user_id, CAST(coalesce(sum(CASE WHEN event_type = "
            "'purchase' THEN c2 ELSE 0 END), 0) AS BIGINT) AS n_seq "
            "FROM l2 GROUP BY user_id"
        ),
        "coordinated_sample": (
            "WITH so AS (SELECT o_orderkey, o_orderpriority FROM orders "
            "WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) "
            "IN ('0', '1', '2')), "
            "sl AS (SELECT l_orderkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS rc "
            "FROM lineitem "
            "WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) "
            "IN ('0', '1', '2')) "
            "SELECT o_orderpriority, count(*) AS n_items, "
            "CAST(sum(rc) AS BIGINT) AS rev_c "
            "FROM so JOIN sl ON so.o_orderkey = sl.l_orderkey "
            "GROUP BY 1"
        ),
        "kcore_nodes": (
            "WITH base AS (SELECT c_custkey AS c, "
            "(c_custkey - 1) % 6 AS r FROM customer "
            "WHERE c_custkey <= 6 * ((SELECT count(*) FROM customer) "
            "// 6)), "
            "one AS (SELECT c AS src, c + 1 AS dst FROM base "
            "WHERE r <= 4 "
            "UNION ALL SELECT c, c - 2 FROM base WHERE r = 2), "
            "e0 AS (SELECT src, dst FROM one "
            "UNION ALL SELECT dst, src FROM one), "
            "d1 AS (SELECT src, count(*) AS c FROM e0 GROUP BY 1), "
            "s1 AS (SELECT src AS n FROM d1 WHERE c >= 2), "
            "e1 AS (SELECT e.src, e.dst FROM e0 e "
            "JOIN s1 a ON e.src = a.n JOIN s1 b ON e.dst = b.n), "
            "d2 AS (SELECT src, count(*) AS c FROM e1 GROUP BY 1), "
            "s2 AS (SELECT src AS n FROM d2 WHERE c >= 2), "
            "e2 AS (SELECT e.src, e.dst FROM e1 e "
            "JOIN s2 a ON e.src = a.n JOIN s2 b ON e.dst = b.n), "
            "d3 AS (SELECT src, count(*) AS c FROM e2 GROUP BY 1), "
            "s3 AS (SELECT src AS n FROM d3 WHERE c >= 2), "
            "e3 AS (SELECT e.src, e.dst FROM e2 e "
            "JOIN s3 a ON e.src = a.n JOIN s3 b ON e.dst = b.n), "
            "d4 AS (SELECT src, count(*) AS c FROM e3 GROUP BY 1), "
            "s4 AS (SELECT src AS n FROM d4 WHERE c >= 2), "
            "e4 AS (SELECT e.src, e.dst FROM e3 e "
            "JOIN s4 a ON e.src = a.n JOIN s4 b ON e.dst = b.n) "
            "SELECT src AS node, count(*) AS deg FROM e4 GROUP BY 1"
        ),
        "l_diversity": (
            "WITH s AS (SELECT c_custkey, c_nationkey, c_mktsegment, "
            "c_acctbal < 0 AS bal_neg FROM customer), "
            "d AS (SELECT c_nationkey, c_mktsegment, "
            "count(DISTINCT bal_neg) AS ld FROM s GROUP BY 1, 2) "
            "SELECT c_custkey, bal_neg, "
            "CASE WHEN ld >= 2 THEN CAST(c_nationkey AS VARCHAR) "
            "ELSE '*' END AS c_nationkey_qi, "
            "CASE WHEN ld >= 2 THEN c_mktsegment ELSE '*' END "
            "AS c_mktsegment_qi, "
            "ld >= 2 AS l_diverse "
            "FROM s JOIN d USING (c_nationkey, c_mktsegment)"
        ),
        "ks_drift": (
            "WITH a AS (SELECT CAST(round(l_quantity) AS BIGINT) AS v, "
            "count(*) AS c FROM lineitem WHERE l_returnflag = 'R' "
            "GROUP BY 1), "
            "b AS (SELECT CAST(round(l_quantity) AS BIGINT) AS v, "
            "count(*) AS c FROM lineitem WHERE l_returnflag <> 'R' "
            "GROUP BY 1), "
            "u AS (SELECT v FROM a UNION SELECT v FROM b), "
            "j AS (SELECT u.v, coalesce(a.c, 0) AS ca, "
            "coalesce(b.c, 0) AS cb FROM u "
            "LEFT JOIN a USING (v) LEFT JOIN b USING (v)), "
            "w AS (SELECT v, sum(ca) OVER (ORDER BY v) AS fa, "
            "sum(cb) OVER (ORDER BY v) AS fb FROM j), "
            "t AS (SELECT (SELECT sum(c) FROM a) AS na, "
            "(SELECT sum(c) FROM b) AS nb) "
            "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, "
            "CAST(max(abs(fa * nb - fb * na)) AS BIGINT) AS d_scaled "
            "FROM w, t GROUP BY na, nb"
        ),
        "quantity_percentile": (
            "SELECT l_orderkey, l_linenumber, "
            "CAST(CASE WHEN count(*) OVER (PARTITION BY l_returnflag) = 1 "
            "THEN 0 ELSE "
            "(rank() OVER (PARTITION BY l_returnflag "
            "ORDER BY CAST(round(l_quantity) AS BIGINT)) - 1) * 1000000 "
            "// (count(*) OVER (PARTITION BY l_returnflag) - 1) END "
            "AS BIGINT) AS pct_ppm FROM lineitem"
        ),
        "gini_gain": (
            "WITH s AS (SELECT "
            "(CAST(round(l_quantity) AS BIGINT) >= 26) AS side, "
            "l_returnflag AS lab FROM lineitem), "
            "cm AS (SELECT side, lab, count(*) AS c FROM s "
            "GROUP BY 1, 2), "
            "t AS (SELECT sum(c) AS n, "
            "sum(CASE WHEN side THEN c ELSE 0 END) AS nl, "
            "sum(CASE WHEN NOT side THEN c ELSE 0 END) AS nr FROM cm), "
            "p AS (SELECT sum(cc * cc) AS sp FROM "
            "(SELECT lab, sum(c) AS cc FROM cm GROUP BY 1)), "
            "l AS (SELECT coalesce(sum(c * c), 0) AS sl FROM cm "
            "WHERE side), "
            "r AS (SELECT coalesce(sum(c * c), 0) AS sr FROM cm "
            "WHERE NOT side) "
            "SELECT CAST(n AS BIGINT) AS n, "
            "CAST(nl AS BIGINT) AS n_left, "
            "CAST(nr AS BIGINT) AS n_right, "
            "CAST(1000000 * ((n * n - sp) * nl * nr "
            "- (nl * nl - sl) * n * nr - (nr * nr - sr) * n * nl) "
            "// (n * n * nl * nr) AS BIGINT) AS gain_ppm "
            "FROM t, p, l, r"
        ),
        "rank_auc": (
            "WITH s AS (SELECT CAST(round(l_quantity) AS BIGINT) AS v, "
            "(l_returnflag = 'R') AS lab FROM lineitem), "
            "h AS (SELECT v, "
            "sum(CASE WHEN lab THEN 1 ELSE 0 END) AS p, "
            "sum(CASE WHEN lab THEN 0 ELSE 1 END) AS q "
            "FROM s GROUP BY 1), "
            "w AS (SELECT v, p, q, coalesce(sum(q) OVER (ORDER BY v "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS cq FROM h), "
            "t AS (SELECT sum(p) AS np, sum(q) AS nq, "
            "sum(p * (2 * cq + q)) AS u2 FROM w) "
            "SELECT CAST(np AS BIGINT) AS n_pos, "
            "CAST(nq AS BIGINT) AS n_neg, CAST(u2 AS BIGINT) AS u2, "
            "CAST(u2 * 1000000 // (2 * np * nq) AS BIGINT) AS auc_ppm "
            "FROM t"
        ),
        "waterfill_budget": (
            "WITH d AS (SELECT user_id, count(*) AS dem FROM events "
            "GROUP BY 1), "
            "o AS (SELECT user_id, dem, "
            "row_number() OVER (ORDER BY dem, user_id) AS rn, "
            "coalesce(sum(dem) OVER (ORDER BY dem, user_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS pfx, count(*) OVER () AS n, sum(dem) OVER () AS tot "
            "FROM d), "
            "b AS (SELECT tot * 3 // 5 AS bud FROM o LIMIT 1), "
            "s AS (SELECT o.*, bud, "
            "(pfx + dem * (n - rn + 1)) <= bud AS sat "
            "FROM o CROSS JOIN b), "
            "j AS (SELECT coalesce(min(rn), "
            "(SELECT max(rn) FROM s) + 1) AS j0 FROM s WHERE NOT sat), "
            "r AS (SELECT CASE WHEN j0 > (SELECT max(rn) FROM s) "
            "THEN 0 ELSE (SELECT bud - pfx FROM s WHERE rn = j0) END "
            "AS rem, (SELECT max(rn) FROM s) - j0 + 1 AS m FROM j), "
            "a AS (SELECT user_id, dem, "
            "CASE WHEN rn < j0 THEN dem "
            "ELSE rem // m + CASE WHEN rn - j0 < rem % m "
            "THEN 1 ELSE 0 END END AS alloc "
            "FROM s CROSS JOIN j CROSS JOIN r) "
            "SELECT user_id, CAST(dem AS BIGINT) AS demand, "
            "CAST(alloc AS BIGINT) AS alloc, alloc = dem AS satisfied "
            "FROM a"
        ),
        "target_encode": (
            "WITH t AS (SELECT c_custkey, c_mktsegment, "
            "CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS b "
            "FROM customer), "
            "g AS (SELECT c_mktsegment, sum(b) AS s, count(*) AS n "
            "FROM t GROUP BY 1), "
            "p AS (SELECT sum(s) // sum(n) AS prior FROM g) "
            "SELECT t.c_custkey, t.c_mktsegment, "
            "CAST((g.s + 10 * p.prior) // (g.n + 10) AS BIGINT) AS enc "
            "FROM t JOIN g USING (c_mktsegment) CROSS JOIN p"
        ),
        "log2_p99": (
            "WITH v AS (SELECT o_orderpriority AS k, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders), "
            "h AS (SELECT k, length(bin(c)) - 1 AS b, count(*) AS n "
            "FROM v GROUP BY 1, 2), "
            "w AS (SELECT k, b, n, "
            "sum(n) OVER (PARTITION BY k ORDER BY b) AS cum, "
            "sum(n) OVER (PARTITION BY k) AS tot FROM h) "
            "SELECT k AS o_orderpriority, CAST(tot AS BIGINT) AS n, "
            "CAST(min(b) AS BIGINT) AS q_bucket, "
            "(CAST(1 AS BIGINT) << CAST(min(b) AS INT)) AS q_lo, "
            "(CAST(1 AS BIGINT) << (CAST(min(b) AS INT) + 1)) - 1 "
            "AS q_hi "
            "FROM w WHERE cum * 100 >= 99 * tot GROUP BY k, tot"
        ),
        "quantity_cume_dist": (
            "SELECT l_orderkey, l_linenumber, "
            "CAST(count(*) OVER (PARTITION BY l_linestatus "
            "ORDER BY CAST(round(l_quantity) AS BIGINT)) * 1000000 "
            "// count(*) OVER (PARTITION BY l_linestatus) "
            "AS BIGINT) AS cume_ppm FROM lineitem"
        ),
        "value_histogram": (
            "WITH v AS (SELECT CAST(round(value * 100) AS BIGINT) AS c "
            "FROM events), "
            "mm AS (SELECT min(c) AS lo, max(c) - min(c) + 1 AS span "
            "FROM v) "
            "SELECT (c - lo) * 20 // span AS bin, count(*) AS n, "
            "min(c) AS lo_c, max(c) AS hi_c "
            "FROM v, mm GROUP BY 1"
        ),
        "type_share": (
            "WITH g AS (SELECT event_type, "
            "sum(CAST(round(value * 100) AS BIGINT)) AS total_c "
            "FROM events GROUP BY event_type) "
            "SELECT event_type, CAST(total_c AS BIGINT) AS total_c, "
            "CAST(CAST(total_c AS HUGEINT) * 1000000 "
            "// CAST(sum(total_c) OVER () AS HUGEINT) AS BIGINT) "
            "AS share_ppm FROM g"
        ),
        "posexplode_tokens": (
            "WITH t AS (SELECT doc_id, "
            "list_filter(string_split_regex(coalesce(text, ''), '\\s+'), "
            "x -> x <> '') AS toks FROM documents) "
            "SELECT doc_id, CAST(generate_subscripts(toks, 1) AS BIGINT) "
            "AS pos, unnest(toks) AS token FROM t"
        ),
        "kwic_snippets": (
            "WITH t AS (SELECT doc_id, "
            "list_filter(string_split_regex(coalesce(text, ''), '\\s+'), "
            "x -> x <> '') AS toks FROM documents), "
            "p AS (SELECT doc_id, toks, "
            "CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos, "
            "unnest(toks) AS tok FROM t) "
            "SELECT doc_id, pos, "
            "array_to_string(list_slice(toks, greatest(pos - 3, 1), "
            "least(pos + 3, len(toks))), ' ') AS snippet "
            "FROM p WHERE tok = 'merge'"
        ),
        "skipgram_pairs": (
            "WITH t AS (SELECT doc_id, "
            "list_filter(string_split_regex(coalesce(text, ''), '\\s+'), "
            "x -> x <> '') AS toks FROM documents), "
            "p AS (SELECT doc_id, "
            "CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos, "
            "unnest(toks) AS tok FROM t) "
            "SELECT a.tok AS left_tok, b.tok AS right_tok, "
            "count(*) AS n FROM p a JOIN p b ON a.doc_id = b.doc_id "
            "AND b.pos > a.pos AND b.pos <= a.pos + 3 "
            "GROUP BY 1, 2 HAVING count(*) >= 3"
        ),
        "collocation_lift": (
            "WITH t AS (SELECT doc_id, "
            "list_filter(string_split_regex(coalesce(text, ''), '\\s+'), "
            "x -> x <> '') AS toks FROM documents), "
            "p AS (SELECT doc_id, "
            "CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos, "
            "unnest(toks) AS tok FROM t), "
            "u AS (SELECT tok, count(*) AS c FROM p GROUP BY tok), "
            "tot AS (SELECT count(*) AS t FROM p), "
            "b AS (SELECT a.tok AS l, b2.tok AS r, count(*) AS c_ab "
            "FROM p a JOIN p b2 ON a.doc_id = b2.doc_id "
            "AND b2.pos = a.pos + 1 GROUP BY 1, 2 "
            "HAVING count(*) >= 5) "
            "SELECT b.l AS left_tok, b.r AS right_tok, "
            "CAST(b.c_ab AS BIGINT) AS n_pair, "
            "CAST(CAST(b.c_ab AS HUGEINT) * tot.t * 1000000 "
            "// (CAST(ul.c AS HUGEINT) * ur.c) AS BIGINT) AS lift_ppm "
            "FROM b CROSS JOIN tot "
            "JOIN u ul ON ul.tok = b.l JOIN u ur ON ur.tok = b.r"
        ),
        "weighted_median": (
            "WITH h AS (SELECT l_returnflag, "
            "CAST(round(l_quantity) AS BIGINT) AS v, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS w "
            "FROM lineitem GROUP BY l_returnflag, v), "
            "c AS (SELECT l_returnflag, v, "
            "sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw, "
            "sum(w) OVER (PARTITION BY l_returnflag) AS tw FROM h) "
            "SELECT l_returnflag, CAST(min(v) AS BIGINT) AS wmedian_qty "
            "FROM c WHERE 2 * cw >= tw GROUP BY l_returnflag"
        ),
        "bag_intersect": (
            "SELECT event_type FROM events "
            "WHERE round(value * 100) >= 5000 "
            "INTERSECT ALL "
            "SELECT event_type FROM events WHERE user_id % 2 = 0"
        ),
        "bag_difference": (
            "SELECT event_type FROM events "
            "EXCEPT ALL "
            "SELECT event_type FROM events "
            "WHERE CAST(round(value * 100) AS BIGINT) >= 10000"
        ),
        "event_pairs_window": (
            "SELECT a.event_id AS id_l, b.event_id AS id_r, "
            "a.user_id FROM events a JOIN events b "
            "ON a.user_id = b.user_id AND a.event_id < b.event_id "
            "AND abs(CAST(floor(epoch(a.ts)) AS BIGINT) "
            "- CAST(floor(epoch(b.ts)) AS BIGINT)) <= 600"
        ),
        "path_rollup": (
            "WITH p AS (SELECT source AS s1, lang AS s2, "
            "CAST(doc_id % 10 AS VARCHAR) AS s3, "
            "CAST(doc_id AS VARCHAR) AS s4 FROM documents), "
            "u AS (SELECT 1 AS depth, '/' || s1 AS prefix FROM p "
            "UNION ALL SELECT 2, '/' || s1 || '/' || s2 FROM p "
            "UNION ALL SELECT 3, '/' || s1 || '/' || s2 || '/' || s3 "
            "FROM p "
            "UNION ALL SELECT 4, "
            "'/' || s1 || '/' || s2 || '/' || s3 || '/' || s4 FROM p) "
            "SELECT depth, prefix, count(*) AS n FROM u "
            "GROUP BY depth, prefix"
        ),
        "cumulative_users": (
            "WITH f AS (SELECT user_id, "
            "min(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS day "
            "FROM events GROUP BY user_id), "
            "c AS (SELECT day, count(*) AS new_users FROM f GROUP BY day) "
            "SELECT day, new_users, "
            "CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) "
            "AS cum_users FROM c"
        ),
        "overlap_join_windows": (
            "WITH L AS (SELECT o_orderkey, "
            "CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS o_start, "
            "CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) "
            "+ o_orderkey % 20 AS o_end FROM orders), "
            "R AS (SELECT s_suppkey, 8035 + (s_suppkey * 131) % 2300 AS a_start, "
            "8035 + (s_suppkey * 131) % 2300 + s_suppkey % 30 + 5 AS a_end "
            "FROM supplier WHERE s_suppkey % 10 = 0) "
            "SELECT o_orderkey, o_start, o_end, s_suppkey, a_start, a_end "
            "FROM L, R WHERE o_start <= a_end AND a_start <= o_end"
        ),
        "band_join_balances": (
            "SELECT c_custkey, s_suppkey, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS c_bal_c, "
            "CAST(round(s_acctbal * 100) AS BIGINT) AS s_bal_c "
            "FROM customer, supplier "
            "WHERE abs(CAST(round(c_acctbal * 100) AS BIGINT) "
            "- CAST(round(s_acctbal * 100) AS BIGINT)) <= 500"
        ),
        "join_revenue": (
            "SELECT o_orderpriority, count(*) AS n_items, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 "
            "AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"
        ),
        # dup-shingle set over ALL positions (cross-doc AND within-doc),
        # then gaps-and-islands merge of fixed-length spans per doc
        "repeated_passages": (
            "WITH t AS (SELECT doc_id, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks "
            "FROM documents), "
            "p AS (SELECT doc_id, "
            "unnest(generate_series(1, len(toks) - 7)) - 1 AS pos, "
            "unnest(list_transform(generate_series(1, len(toks) - 7), "
            "i -> array_to_string(toks[i:i+7], ' '))) AS sh "
            "FROM t WHERE len(toks) >= 8), "
            "c AS (SELECT sh FROM p GROUP BY sh HAVING count(*) >= 2), "
            "m AS (SELECT doc_id, pos FROM p WHERE sh IN (SELECT sh FROM c)), "
            "w AS (SELECT doc_id, pos, CASE WHEN "
            "lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL "
            "OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 "
            "THEN 1 ELSE 0 END AS brk FROM m), "
            "g AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id "
            "ORDER BY pos) AS island FROM w) "
            "SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end, "
            "count(*) AS n_shingles FROM g GROUP BY doc_id, island"
        ),
        "category_split_pdfs": (
            "SELECT doc_id, group_id, min(category) AS category, "
            "count(*) AS n_pages, true AS pdf_valid FROM ("
            "WITH pages AS ("
            "  SELECT doc_id, i, CASE ((doc_id + i) // 3) % 3 "
            "    WHEN 0 THEN 'data_report' WHEN 1 THEN 'purchase_order' "
            "    ELSE 'report_misc' END AS category "
            "  FROM documents, LATERAL (SELECT unnest(range(0, 3 + doc_id % 6)) AS i)"
            "), runs AS ("
            "  SELECT doc_id, i, category, "
            "    row_number() OVER (PARTITION BY doc_id ORDER BY i) "
            "    - row_number() OVER (PARTITION BY doc_id, category ORDER BY i) AS island "
            "  FROM pages"
            "), pos AS ("
            "  SELECT doc_id, i, category, "
            "    row_number() OVER (PARTITION BY doc_id, category, island ORDER BY i) - 1 AS run_pos "
            "  FROM runs"
            "), flags AS ("
            "  SELECT doc_id, i, category, "
            "    CASE WHEN category = 'purchase_order' OR run_pos % 2 = 0 "
            "    THEN 1 ELSE 0 END AS new_group FROM pos"
            ") SELECT doc_id, category, "
            "CAST(sum(new_group) OVER (PARTITION BY doc_id ORDER BY i) - 1 AS BIGINT) "
            "AS group_id FROM flags) GROUP BY doc_id, group_id"
        ),
        "bigram_lm": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
            "FROM documents), "
            "uni AS (SELECT tok, count(*) AS n FROM "
            "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) "
            "GROUP BY tok), "
            "bi AS (SELECT a, b, count(*) AS n FROM "
            "(SELECT unnest(toks[1:len(toks)-1]) AS a, "
            "unnest(toks[2:len(toks)]) AS b FROM t WHERE len(toks) >= 2) "
            "GROUP BY a, b), "
            "db AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS a, "
            "unnest(toks[2:len(toks)]) AS b, len(toks) AS nt FROM t "
            "WHERE len(toks) >= 2), "
            "sc AS (SELECT db.doc_id, "
            "sum(coalesce(bi.n, 0) * 1000000 // uni.n) AS s, "
            "any_value(nt) AS nt FROM db "
            "JOIN uni ON db.a = uni.tok "
            "LEFT JOIN bi ON db.a = bi.a AND db.b = bi.b "
            "GROUP BY db.doc_id) "
            "SELECT t.doc_id, "
            "CAST(coalesce(sc.s // (sc.nt - 1), 0) AS BIGINT) AS lm_score_ppm "
            "FROM t LEFT JOIN sc ON t.doc_id = sc.doc_id"
        ),
        "json_props": (
            "SELECT event_type, count(*) AS n, "
            "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) "
            "AS sum_k, "
            "max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k "
            "FROM events GROUP BY event_type"
        ),
        "customer_running": (
            "SELECT o_orderkey, o_custkey, "
            "CAST(row_number() OVER w AS BIGINT) AS seq, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w "
            "AS BIGINT) AS run_cents "
            "FROM orders "
            "WINDOW w AS (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey)"
        ),
        "stratified_sample": (
            "SELECT doc_id, source, h FROM ("
            "SELECT doc_id, source, "
            "(doc_id * 2654435761 + 12345) % 4294967296 AS h, "
            "row_number() OVER (PARTITION BY source "
            "ORDER BY (doc_id * 2654435761 + 12345) % 4294967296, doc_id) "
            "AS rn FROM documents) WHERE rn <= 5"
        ),
        "events_pivot": (
            "SELECT CAST(hour(ts) AS BIGINT) AS hour, "
            + ", ".join(
                f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
                f"AS BIGINT) AS n_{t}"
                for t in ("click", "error", "purchase", "signup", "view"))
            + " FROM events GROUP BY 1"
        ),
        "dedup_passages": (
            "WITH t AS (SELECT doc_id, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks "
            "FROM documents), "
            "p AS (SELECT doc_id, "
            "unnest(generate_series(1, len(toks) - 7)) - 1 AS pos, "
            "unnest(list_transform(generate_series(1, len(toks) - 7), "
            "i -> array_to_string(toks[i:i+7], ' '))) AS sh "
            "FROM t WHERE len(toks) >= 8), "
            "c AS (SELECT sh FROM p GROUP BY sh HAVING count(*) >= 2), "
            "m AS (SELECT doc_id, pos FROM p WHERE sh IN (SELECT sh FROM c)), "
            "w AS (SELECT doc_id, pos, CASE WHEN "
            "lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL "
            "OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 "
            "THEN 1 ELSE 0 END AS brk FROM m), "
            "g AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id "
            "ORDER BY pos) AS island FROM w), "
            "sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e "
            "FROM g GROUP BY doc_id, island), "
            "tok AS (SELECT doc_id, unnest(toks) AS wd, "
            "unnest(range(0, len(toks))) AS j FROM t), "
            "kept AS (SELECT tok.doc_id, wd, j FROM tok WHERE NOT EXISTS ("
            "SELECT 1 FROM sp WHERE sp.doc_id = tok.doc_id "
            "AND tok.j >= sp.s AND tok.j < sp.e)), "
            "agg AS (SELECT doc_id, string_agg(wd, ' ' ORDER BY j) AS text_dedup, "
            "count(*) AS n_kept FROM kept GROUP BY doc_id) "
            "SELECT t.doc_id, coalesce(agg.text_dedup, '') AS text_dedup, "
            "len(t.toks) - coalesce(agg.n_kept, 0) AS n_tokens_removed, "
            "len(t.toks) AS n_tokens_total "
            "FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id"
        ),
        "gopher_quality": (
            f"WITH d AS (SELECT url, text FROM ({_SQL_EXPECTED_PAGES}) "
            "WHERE text <> ''), "
            "m AS (SELECT url, text, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks, "
            "string_split(text, chr(10)) AS ls FROM d), "
            "s AS (SELECT url, len(toks) AS n_words, "
            "CASE WHEN len(toks) = 0 THEN 0 ELSE "
            "list_sum(list_transform(toks, w -> length(w))) * 1000000 // len(toks) "
            "END AS mean_word_len_ppm, "
            "CASE WHEN len(toks) = 0 OR length(text) = 0 THEN 0 ELSE "
            "length(regexp_replace(text, '[a-zA-Z0-9 ' || chr(10) || ']', '', 'g')) "
            "* 1000000 // length(text) END AS symbol_ppm, "
            "CASE WHEN len(toks) = 0 THEN 0 ELSE "
            "len(list_filter(ls, l -> starts_with(l, '-') OR starts_with(l, '*'))) "
            "* 1000000 // len(ls) END AS bullet_ppm FROM m) "
            "SELECT url, n_words, mean_word_len_ppm, symbol_ppm, bullet_ppm, "
            "n_words BETWEEN 50 AND 100000 "
            "AND mean_word_len_ppm BETWEEN 3000000 AND 10000000 "
            "AND symbol_ppm <= 100000 AND bullet_ppm <= 900000 AS gq_keep "
            "FROM s"
        ),
        "urgent_revenue": (
            "SELECT o_orderpriority, count(*) AS n_items, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 "
            "AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_orderpriority = '1-URGENT' "
            "GROUP BY o_orderpriority"
        ),
        "entities_table": (
            f"SELECT {_SQL_URL} AS url, 'PO-' || (10000 + doc_id) AS tag_po, "
            "(100 + doc_id % 400) || '.00' AS tag_qty, 'USD' AS tag_ccy "
            "FROM documents WHERE doc_id % 5 = 2 AND doc_id % 97 <> 0"
        ),
        "lc_tags": (
            f"SELECT {_SQL_URL} AS url, "
            "'IRREVOCABLE' AS tag_40a, "
            "'24' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || "
            "lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS tag_31c, "
            "'25' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || "
            "lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS tag_31d, "
            "'USD ' || (CASE WHEN doc_id % 4 = 1 THEN 0 "
            "ELSE 1000 * (1 + doc_id % 50) END) || '.00' AS tag_32b, "
            "'APPLICANT COMPANY ' || (doc_id % 5) AS tag_50, "
            "'BENEFICIARY ' || (doc_id % 7) || ' CORP' AS tag_59, "
            "34 AS n_tags, "
            "CASE WHEN doc_id % 4 = 1 THEN 5 ELSE 6 END AS rules_passed, "
            "CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END AS rules_failed, "
            "doc_id % 4 <> 1 AS overall_valid "
            "FROM documents WHERE doc_id % 10 = 9 AND doc_id % 97 <> 0"
        ),
        # regex and tokenset disagree with the fused category exactly on the
        # planted ambiguous POs — a broken technique changes these counts
        "technique_stats": (
            "WITH planted AS (SELECT count(*) AS p FROM documents "
            "WHERE doc_id % 97 <> 0 AND doc_id % 5 = 2 AND doc_id % 20 = 12), "
            "tot AS (SELECT count(*) AS n FROM documents) "
            "SELECT technique, n AS n_docs, "
            "CAST(n - CASE WHEN technique IN ('regex', 'tokenset') THEN p "
            "ELSE 0 END AS BIGINT) AS n_agree, "
            "floor(CAST(n - CASE WHEN technique IN ('regex', 'tokenset') THEN p "
            "ELSE 0 END AS DOUBLE) / n * 1e6) / 1e6 AS agree_rate "
            "FROM tot, planted, "
            "(SELECT unnest(['keyword','ml','regex','tokenset']) AS technique)"
        ),
        "top_orders": (
            "SELECT o_orderkey, o_totalprice, o_orderdate FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"
        ),
        "audio_frames": (
            "SELECT doc_id, 4 AS n_frames, "
            "CAST(1000 + doc_id % 9000 AS DOUBLE) AS frame_rms FROM documents"
        ),
        "anti_join_customers": (
            "SELECT c_custkey AS custkey, c_mktsegment FROM customer "
            "WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)"
        ),
        "rollup_counts": (
            "SELECT coalesce(lang, 'ALL') AS lang, "
            "coalesce(source, 'ALL') AS source, count(*) AS n_docs "
            "FROM documents GROUP BY GROUPING SETS "
            "((lang), (source), (lang, source))"
        ),
        "topk_per_group": (
            "SELECT o_orderpriority, o_orderkey, "
            "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE) / 100.0 "
            "AS o_totalprice FROM orders "
            "QUALIFY row_number() OVER (PARTITION BY o_orderpriority "
            "ORDER BY round(o_totalprice * 100) DESC, o_orderkey) <= 3"
        ),
        "median_quantity": (
            "SELECT l_returnflag, l_linestatus, "
            "median(CAST(l_quantity AS BIGINT)) AS median_qty "
            "FROM lineitem GROUP BY 1, 2"
        ),
        # synthetic image archetypes (sources/images.py): closed-form
        # integer pixel sums per pattern; float ops mirror
        # stages/imaging.exact_metrics op-for-op (s1/n, ·m, /255.0)
        "image_quality": (
            "WITH d AS (SELECT doc_id, doc_id % 4 AS m, "
            "64 + 8 * (doc_id % 5) AS w, 64 + 8 * (doc_id % 3) AS h, "
            "40 + (doc_id % 6) * 10 AS fg, 200 + (doc_id % 5) * 10 AS bg "
            "FROM documents), "
            "s AS (SELECT doc_id, m, w, h, w * h AS n, "
            "CASE m WHEN 0 THEN (w * h - (h // 8) * w) * 255 "
            "WHEN 1 THEN w * h * 250 "
            "WHEN 2 THEN (w * h // 2) * (fg + bg) "
            "ELSE (w * h // 2) * 256 END AS s1, "
            "CASE m WHEN 0 THEN (w * h - (h // 8) * w) * 65025 "
            "WHEN 1 THEN w * h * 62500 "
            "WHEN 2 THEN (w * h // 2) * (fg * fg + bg * bg) "
            "ELSE (w * h // 2) * 32896 END AS s2, "
            "CASE m WHEN 0 THEN w * h - (h // 8) * w "
            "WHEN 1 THEN w * h ELSE 0 END AS blankpx, "
            "CASE m WHEN 0 THEN (h // 8) * w "
            "WHEN 2 THEN CASE WHEN fg < 64 THEN w * h // 2 ELSE 0 END "
            "ELSE 0 END AS darkpx "
            "FROM d) "
            "SELECT doc_id, width, height, brightness, contrast, blank_ratio, "
            "dark_ratio, glare_ratio, "
            "CASE WHEN blank_ratio > 0.95 THEN 'blank' "
            "WHEN contrast < 0.13 THEN 'low_contrast' ELSE 'ok' END AS img_verdict "
            "FROM (SELECT doc_id, w AS width, h AS height, "
            "(CAST(s1 AS DOUBLE) / n) / 255.0 AS brightness, "
            "sqrt(CAST(s2 AS DOUBLE) / n - "
            "(CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) / 255.0 AS contrast, "
            "CAST(blankpx AS DOUBLE) / n AS blank_ratio, "
            "CAST(darkpx AS DOUBLE) / n AS dark_ratio, "
            "CAST(blankpx AS DOUBLE) / n AS glare_ratio FROM s)"
        ),
        "image_preprocess": (
            # processed s1: only the low-contrast archetype actually
            # changes pixels (stretch → half 0 / half 255)
            "WITH d AS (SELECT doc_id, doc_id % 4 AS m, "
            "64 + 8 * (doc_id % 5) AS w, 64 + 8 * (doc_id % 3) AS h, "
            "40 + (doc_id % 6) * 10 AS fg, 200 + (doc_id % 5) * 10 AS bg "
            "FROM documents) "
            "SELECT doc_id, "
            "CASE WHEN m IN (1, 3) THEN ['contrast_stretch'] "
            "ELSE CAST([] AS VARCHAR[]) END AS pp_ops, "
            "(CAST(CASE m WHEN 0 THEN (w * h - (h // 8) * w) * 255 "
            "WHEN 1 THEN w * h * 250 "
            "WHEN 2 THEN (w * h // 2) * (fg + bg) "
            "ELSE (w * h // 2) * 255 END AS DOUBLE) / (w * h)) / 255.0 "
            "AS new_brightness FROM d"
        ),
        "decontaminate": (
            "WITH sh AS (SELECT doc_id, CASE WHEN len(toks) < 13 THEN [] "
            "ELSE list_distinct(list_transform(generate_series(1, len(toks) - 12), "
            "i -> array_to_string(toks[i : i + 12], ' '))) END AS s "
            "FROM (SELECT doc_id, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks "
            "FROM documents)), "
            "bench AS (SELECT list_distinct(flatten(list(s))) AS bs FROM sh "
            "WHERE doc_id % 31 = 5) "
            "SELECT doc_id, len(s) > 0 AND list_has_any(s, bs) AS contaminated "
            "FROM sh CROSS JOIN bench"
        ),
        "sample_weighted": (
            "SELECT doc_id, source FROM documents WHERE "
            "((doc_id * 2654435761 + 12345) % 4294967296) / 4294967296.0 < "
            "(CAST(substr(source, 4) AS INT) % 4 + 1) / 4.0"
        ),
        "gopher_repetition": (
            "WITH t AS (SELECT doc_id, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks "
            "FROM documents), "
            "g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1), "
            "i -> toks[i] || ' ' || toks[i + 1])) AS gram FROM t WHERE len(toks) >= 2), "
            "c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY 1, 2), "
            "m AS (SELECT doc_id, max(n) AS top, sum(n) AS tot FROM c GROUP BY 1) "
            "SELECT t.doc_id, "
            "CASE WHEN len(toks) < 2 THEN 0.0 ELSE "
            "floor((1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 1e6) / 1e6 "
            "END AS dup_token_frac, "
            "CASE WHEN len(toks) < 2 THEN 0.0 ELSE "
            "floor(CAST(top AS DOUBLE) / tot * 1e6) / 1e6 END AS top2gram_frac, "
            "CASE WHEN len(toks) < 2 THEN true ELSE "
            "floor(CAST(top AS DOUBLE) / tot * 1e6) / 1e6 <= 0.03 END AS rep_keep "
            "FROM t LEFT JOIN m ON t.doc_id = m.doc_id"
        ),
        # keep REDACT_PATTERNS (stages/curation.py) and these two
        # regexp_replace calls in sync
        "redact_pii": (
            f"SELECT url, regexp_replace(regexp_replace(text, "
            "'\\d{2}\\.\\d{2}\\.\\d{4}', '<DATE>', 'g'), "
            "'[A-Z]{3} [\\d,]+\\.\\d{2}', '<AMT>', 'g') AS redacted "
            f"FROM ({_SQL_EXPECTED_PAGES})"
        ),
        "group_split": (
            "SELECT doc_id, source, "
            f"CAST({_sql_md5_le64('source')} % 5 AS BIGINT) AS fold "
            "FROM documents"
        ),
        "schema_union": (
            "SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source "
            "FROM documents WHERE doc_id % 2 = 0 "
            "UNION ALL "
            "SELECT doc_id, lang, source FROM documents "
            "WHERE doc_id % 2 = 1"
        ),
        "split_assign": (
            "SELECT doc_id, CASE "
            "WHEN (doc_id * 2654435761) % 4294967296 / 4294967296.0 < 0.8 THEN 'train' "
            "WHEN (doc_id * 2654435761) % 4294967296 / 4294967296.0 < 0.9 THEN 'val' "
            "ELSE 'test' END AS split FROM documents"
        ),
        "feature_hash": (
            "WITH t AS (SELECT doc_id, "
            "unnest(list_filter(string_split_regex(text, '\\s+'), "
            "x -> x <> '')) AS tok FROM documents), "
            f"h AS (SELECT doc_id, {_sql_md5_le64('tok')} % 16 AS bucket "
            "FROM t) "
            "SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, "
            "count(*) AS n FROM h GROUP BY doc_id, bucket"
        ),
        "top_tokens": (
            "SELECT token, count(*) AS n FROM "
            "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) "
            "GROUP BY token ORDER BY n DESC, token LIMIT 20"
        ),
        # first occurrence per distinct line = min (doc_id, line_idx); docs
        # whose every line occurred earlier drop out (GROUP BY over kept
        # lines ≡ the engine's inner-join rebuild)
        "line_dedup": (
            f"WITH d AS (SELECT doc_id, url, text FROM ({_SQL_EXPECTED_PAGES}) "
            "WHERE text <> ''), "
            "l AS (SELECT doc_id, url, "
            "unnest(string_split(text, chr(10))) AS line, "
            "unnest(range(1, len(string_split(text, chr(10))) + 1)) AS idx, "
            "len(string_split(text, chr(10))) AS n_total FROM d), "
            "k AS (SELECT *, row_number() OVER "
            "(PARTITION BY line ORDER BY doc_id, idx) AS rn FROM l) "
            "SELECT url, string_agg(line, chr(10) ORDER BY idx) AS text_dedup, "
            "count(*) AS n_kept, any_value(n_total) AS n_total "
            "FROM k WHERE rn = 1 GROUP BY doc_id, url"
        ),
        "c4_line_filter": (
            f"WITH d AS (SELECT url, text FROM ({_SQL_EXPECTED_PAGES}) "
            "WHERE text <> ''), "
            "f AS (SELECT url, len(string_split(text, chr(10))) AS n_lines, "
            "list_filter(string_split(text, chr(10)), l -> "
            "len(list_filter(string_split_regex(l, '\\s+'), x -> x <> '')) >= 5 "
            "AND NOT contains(l, '{') AND NOT ends_with(l, ':')) AS kept FROM d) "
            "SELECT url, array_to_string(kept, chr(10)) AS clean_text, "
            "len(kept) AS n_lines_kept, n_lines FROM f"
        ),
        "normalize_text": (
            "SELECT doc_id, norm_text, n_chars_raw, "
            "length(norm_text) AS n_chars_norm FROM ("
            "SELECT doc_id, trim(regexp_replace(nfc_normalize(text), "
            "'[ \\t\\n\\r]+', ' ', 'g'), ' ') AS norm_text, "
            "length(text) AS n_chars_raw FROM ("
            "SELECT doc_id, CASE "
            "WHEN doc_id % 3 = 1 THEN text || ' nai' || chr(776) || "
            "'ve fac' || chr(807) || 'ade' "
            "WHEN doc_id % 3 = 2 THEN chr(9) || ' ' || text || ' ' || "
            "chr(10) || chr(10) || 'out  ' "
            "ELSE text END AS text FROM documents))"
        ),
        "chunk_documents": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, "
            "len(string_split(text, ' ')) AS n FROM documents), "
            "k AS (SELECT doc_id, toks, n, unnest(range(0, "
            "(CASE WHEN n <= 32 THEN 0 ELSE (n - 32 + 23) // 24 END) + 1)) "
            "AS chunk_id FROM t) "
            "SELECT doc_id, chunk_id, "
            "array_to_string(list_slice(toks, chunk_id * 24 + 1, "
            "chunk_id * 24 + 32), ' ') AS chunk_text, "
            "least(32, n - chunk_id * 24) AS chunk_tokens FROM k"
        ),
        # greedy packing recurrence stepped per (source, rn) chain
        "pack_sequences": (
            "WITH RECURSIVE d AS ("
            "SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens, "
            "least(len(string_split(text, ' ')), 256) AS cost, "
            "row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn "
            "FROM documents), "
            "r AS ("
            "SELECT doc_id, source, n_tokens, cost, rn, "
            "CAST(0 AS BIGINT) AS bin_id, cost AS cum FROM d WHERE rn = 1 "
            "UNION ALL "
            "SELECT d.doc_id, d.source, d.n_tokens, d.cost, d.rn, "
            "CASE WHEN r.cum + d.cost > 256 THEN r.bin_id + 1 "
            "ELSE r.bin_id END AS bin_id, "
            "CASE WHEN r.cum + d.cost > 256 THEN d.cost "
            "ELSE r.cum + d.cost END AS cum "
            "FROM r JOIN d ON d.source = r.source AND d.rn = r.rn + 1) "
            "SELECT doc_id, source, n_tokens, cost, bin_id FROM r"
        ),
        "inverted_index": (
            "SELECT token, count(*) AS df, "
            "list(doc_id ORDER BY doc_id) AS postings FROM "
            "(SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token "
            "FROM documents) GROUP BY token"
        ),
        "tfidf_topk": (
            "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS "
            "token FROM documents), "
            "tf AS (SELECT doc_id, token, count(*) AS tf FROM tok "
            "GROUP BY doc_id, token), "
            "df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok "
            "GROUP BY token), "
            "s AS (SELECT tf.doc_id, tf.token, tf.tf, df.df, "
            "tf.tf * 1000000 // df.df AS score_ppm, "
            "row_number() OVER (PARTITION BY tf.doc_id "
            "ORDER BY tf.tf * 1000000 // df.df DESC, tf.token) AS term_rank "
            "FROM tf JOIN df USING (token)) "
            "SELECT doc_id, term_rank, token, tf, df, score_ppm FROM s "
            "WHERE term_rank <= 3"
        ),
        "canonical_url_dedup": (
            f"WITH p AS ({_SQL_PAGES_WITH_AMP}), "
            "c AS (SELECT url, text, "
            "string_split(string_split(url, '#')[1], '?')[1] AS canonical_url "
            "FROM p) "
            "SELECT canonical_url, min(url) AS url, arg_min(text, url) AS text, "
            "count(*) AS n_variants FROM c GROUP BY canonical_url"
        ),
        "host_stats": (
            f"SELECT string_split(url, '/')[3] AS host, count(*) AS n_docs, "
            f"CAST(sum(length(text)) AS BIGINT) AS total_chars "
            f"FROM ({_SQL_EXPECTED_PAGES}) GROUP BY host"
        ),
        "charset_extract": (
            f"SELECT {_SQL_URL} AS url, {_SQL_GOLDEN_TEXT} AS text "
            "FROM documents"
        ),
        "surt_keys": (
            f"WITH p AS (SELECT url FROM ({_SQL_PAGES_WITH_AMP})), "
            "h AS (SELECT url, string_split(url, '/')[3] AS host, "
            "substr(url, 9 + length(string_split(url, '/')[3])) AS pathq "
            "FROM p) "
            "SELECT url, lower(array_to_string(list_reverse("
            "string_split(host, '.')), ',') || ')' || pathq) AS surt_key "
            "FROM h"
        ),
        # keep-in-sync: mirrors sources/pages.py _NAV/_FOOTER/_ASIDE/
        # _html_linkfarm anchor templates
        "anchor_text": (
            "WITH d AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 "
            "THEN 'heavy.example.com' ELSE source || '.example.com' END "
            "AS host FROM documents WHERE doc_id % 97 <> 0), "
            "base AS (SELECT host, count(*) AS n FROM d GROUP BY host), "
            "ar AS (SELECT host, count(*) AS n FROM d "
            "WHERE doc_id % 5 IN (0, 3) GROUP BY host), "
            "farm AS (SELECT doc_id, host FROM d WHERE doc_id % 5 = 1), "
            "fixed(path, anchor) AS (VALUES ('/', 'Home'), "
            "('/about', 'About us'), ('/contact', 'Contact'), "
            "('/privacy', 'Privacy policy'), ('/terms', 'Terms of service'), "
            "('/subscribe', 'Subscribe to the newsletter')), "
            "rel(path, anchor) AS (VALUES "
            "('/rel/1', 'Related story about data engines'), "
            "('/rel/2', 'Another related story right here')) "
            "SELECT 'https://' || b.host || f.path AS link, f.anchor, "
            "CAST(b.n AS BIGINT) AS n_refs FROM base b, fixed f "
            "UNION ALL "
            "SELECT 'https://' || a.host || r.path, r.anchor, "
            "CAST(a.n AS BIGINT) FROM ar a, rel r "
            "UNION ALL "
            "SELECT 'https://' || host || '/cat/' || doc_id || '/' || i, "
            "'Category listing number ' || i || ' with many entries', "
            "CAST(1 AS BIGINT) FROM farm, "
            "(SELECT unnest(range(0, 12)) AS i)"
        ),
        "sitemap_frontier": (
            "WITH hosts AS (SELECT 'heavy.example.com' AS host, TRUE AS blk "
            "UNION ALL SELECT DISTINCT source || '.example.com', "
            "CAST(substr(source, 4) AS INT) % 2 = 0 FROM documents) "
            "SELECT host, 'https://' || host || '/new/' || n AS url, "
            "'2024-0' || (n + 1) || '-01' AS lastmod "
            "FROM hosts, (SELECT unnest(range(0, 3)) AS n) "
            "WHERE NOT (blk AND n = 2)"
        ),
        "recrawl_priority": (
            f"WITH caps AS (SELECT {_SQL_URL} AS url, j, "
            "CASE WHEN (doc_id + j) % 3 = 0 THEN md5(text || ' rev' || j) "
            "ELSE md5(text) END AS h "
            "FROM documents, (SELECT unnest(range(0, 4)) AS j) "
            "WHERE j <= doc_id % 4), "
            "w AS (SELECT url, h, lag(h) OVER "
            "(PARTITION BY url ORDER BY j) AS ph FROM caps), "
            "a AS (SELECT url, CAST(count(*) AS BIGINT) AS n_captures, "
            "CAST(count(CASE WHEN ph IS NOT NULL AND h <> ph THEN 1 END) "
            "AS BIGINT) AS n_changes FROM w GROUP BY url) "
            "SELECT url, n_captures, n_changes, "
            "CAST(CASE WHEN n_captures > 1 "
            "THEN n_changes * 1000000 // (n_captures - 1) "
            "ELSE 0 END AS BIGINT) AS change_ppm, "
            "CASE WHEN n_captures > 1 AND "
            "n_changes * 1000000 // (n_captures - 1) >= 500000 THEN 'hot' "
            "WHEN n_changes > 0 THEN 'warm' ELSE 'cold' END "
            "AS recrawl_bucket FROM a"
        ),
        "price_quantiles": (
            "WITH v AS (SELECT l_returnflag, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem), "
            "b AS (SELECT l_returnflag, CASE WHEN v < 16 THEN v "
            "ELSE 16 * (length(bin(CAST(v AS UBIGINT))) - 4) "
            "+ ((v >> (length(bin(CAST(v AS UBIGINT))) - 5)) & 15) END "
            "AS idx FROM v), "
            "h AS (SELECT l_returnflag, idx, count(*) AS n FROM b "
            "GROUP BY l_returnflag, idx), "
            "c AS (SELECT l_returnflag, idx, "
            "sum(n) OVER (PARTITION BY l_returnflag ORDER BY idx) AS cum, "
            "sum(n) OVER (PARTITION BY l_returnflag) AS tot FROM h), "
            "q(q_ppm) AS (VALUES (500000), (950000), (990000)), "
            "sel AS (SELECT c.l_returnflag, q.q_ppm, min(c.idx) AS bidx "
            "FROM c, q WHERE c.cum >= "
            "CAST(ceil(q.q_ppm / 1000000.0 * c.tot) AS BIGINT) "
            "GROUP BY c.l_returnflag, q.q_ppm) "
            "SELECT l_returnflag, q_ppm, CAST(CASE WHEN bidx < 32 THEN bidx "
            "ELSE ((bidx % 16 + 17) << (bidx // 16 - 1)) - 1 END AS BIGINT) "
            "AS est FROM sel"
        ),
        "fetch_waves": (
            f"WITH p AS (SELECT {_SQL_URL} AS url FROM documents), "
            "h AS (SELECT url, string_split(url, '/')[3] AS host FROM p) "
            "SELECT url, host, CAST(row_number() OVER "
            "(PARTITION BY host ORDER BY url) AS BIGINT) AS wave FROM h"
        ),
        "profile_columns": (
            "SELECT 'l_returnflag' AS \"column\", CAST(count(*) AS BIGINT) "
            "AS n_rows, CAST(count(*) - count(l_returnflag) AS BIGINT) "
            "AS n_null, CAST(count(DISTINCT l_returnflag) AS BIGINT) "
            "AS n_distinct, CAST(min(l_returnflag) AS VARCHAR) AS min_v, "
            "CAST(max(l_returnflag) AS VARCHAR) AS max_v FROM lineitem "
            "UNION ALL SELECT 'l_linestatus', count(*), "
            "count(*) - count(l_linestatus), count(DISTINCT l_linestatus), "
            "CAST(min(l_linestatus) AS VARCHAR), "
            "CAST(max(l_linestatus) AS VARCHAR) FROM lineitem "
            "UNION ALL SELECT 'l_quantity', count(*), "
            "count(*) - count(l_quantity), count(DISTINCT l_quantity), "
            "CAST(CAST(min(l_quantity) AS BIGINT) AS VARCHAR), "
            "CAST(CAST(max(l_quantity) AS BIGINT) AS VARCHAR) FROM lineitem "
            "UNION ALL SELECT 'l_linenumber', count(*), "
            "count(*) - count(l_linenumber), count(DISTINCT l_linenumber), "
            "CAST(CAST(min(l_linenumber) AS BIGINT) AS VARCHAR), "
            "CAST(CAST(max(l_linenumber) AS BIGINT) AS VARCHAR) FROM lineitem"
        ),
        "dead_letter": (
            "SELECT CASE WHEN doc_id % 3 = 0 THEN 'heavy.example.com' "
            "ELSE source || '.example.com' END AS source, "
            "'UnicodeDecodeError' AS error_kind, "
            "CAST(count(*) AS BIGINT) AS n_errors FROM documents "
            "WHERE doc_id % 97 = 0 GROUP BY 1"
        ),
        "fetch_schedule": (
            f"WITH p AS (SELECT {_SQL_URL} AS url, source, doc_id "
            "FROM documents), "
            "h AS (SELECT url, CASE WHEN doc_id % 3 = 0 "
            "THEN 'heavy.example.com' ELSE source || '.example.com' END "
            "AS host, CASE WHEN doc_id % 3 = 0 THEN 5 "
            "ELSE 1 + CAST(substr(source, 4) AS INT) % 4 END AS delay "
            "FROM p), "
            "w AS (SELECT url, host, delay, CAST(row_number() OVER "
            "(PARTITION BY host ORDER BY url) AS BIGINT) AS wave FROM h) "
            "SELECT url, host, wave, CAST((wave - 1) * delay AS BIGINT) "
            "AS fetch_at_s FROM w"
        ),
        "users_sketch": (
            f"WITH h AS (SELECT DISTINCT event_type, "
            f"{_sql_md5_le64('CAST(user_id AS VARCHAR)')} AS hv FROM events), "
            "r AS (SELECT event_type, hv, row_number() OVER "
            "(PARTITION BY event_type ORDER BY hv) AS rn FROM h), "
            "o AS (SELECT event_type, hv FROM r WHERE rn <= 128), "
            "a AS (SELECT event_type, count(*) AS m, max(hv) AS hk "
            "FROM o GROUP BY event_type) "
            "SELECT event_type, CAST(m AS BIGINT) AS n_kept, "
            "CAST(CASE WHEN m < 128 THEN CAST(m AS HUGEINT) "
            "ELSE CAST(127 AS HUGEINT) * "
            "CAST(18446744073709551616 AS HUGEINT) // hk END AS BIGINT) "
            "AS est_distinct FROM a"
        ),
        "events_anomaly": (
            "WITH c AS (SELECT event_type, date_trunc('hour', ts) AS hour, "
            "CAST(count(*) AS BIGINT) AS x FROM events "
            "GROUP BY event_type, hour), "
            "w AS (SELECT event_type, hour, x, "
            "CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n, "
            "CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS s, "
            "CAST(sum(x * x) OVER (PARTITION BY event_type) AS BIGINT) AS q "
            "FROM c) "
            "SELECT event_type, hour, x, "
            "(x * n - s) > 0 AND (x * n - s) * (x * n - s) "
            "> 9 * (n * q - s * s) AS is_spike FROM w"
        ),
        "khop_frontier": (
            "WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents), "
            "e AS ("
            "SELECT doc_id AS src, (doc_id + 1) % nn.n AS dst "
            "FROM documents, nn "
            "UNION ALL SELECT doc_id, (doc_id + 2) % nn.n "
            "FROM documents, nn "
            "UNION ALL SELECT doc_id, (doc_id * 7 + 1) % nn.n "
            "FROM documents, nn), "
            "bfs(node, depth) AS ("
            "SELECT doc_id, 0 FROM documents WHERE doc_id % 997 = 0 "
            "UNION ALL "
            "SELECT e.dst, b.depth + 1 FROM bfs b "
            "JOIN e ON b.node = e.src WHERE b.depth < 3) "
            "SELECT node, CAST(min(depth) AS BIGINT) AS depth "
            "FROM bfs GROUP BY node"
        ),
        "sssp_weighted": (
            "WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents), "
            "e AS ("
            "SELECT doc_id AS src, (doc_id + 1) % nn.n AS dst "
            "FROM documents, nn "
            "UNION ALL SELECT doc_id, (doc_id + 2) % nn.n "
            "FROM documents, nn "
            "UNION ALL SELECT doc_id, (doc_id * 7 + 1) % nn.n "
            "FROM documents, nn), "
            "we AS (SELECT src, dst, 1 + (src + dst) % 5 AS w FROM e), "
            "sp(node, dist, hops) AS ("
            "SELECT doc_id, 0, 0 FROM documents WHERE doc_id % 997 = 0 "
            "UNION ALL "
            "SELECT we.dst, s.dist + we.w, s.hops + 1 FROM sp s "
            "JOIN we ON s.node = we.src WHERE s.hops < 3) "
            "SELECT node, CAST(min(dist) AS BIGINT) AS dist "
            "FROM sp GROUP BY node"
        ),
        "table_checksum": (
            "WITH rows_c AS (SELECT 'customer' AS table_name, "
            f"{_sql_md5_le64(chr(39) + 'customer|' + chr(39) + ' || CAST(c_custkey AS VARCHAR) || ' + chr(39) + '|' + chr(39) + ' || c_name || ' + chr(39) + '|' + chr(39) + ' || c_mktsegment')} AS hv FROM customer), "
            "rows_o AS (SELECT 'orders' AS table_name, "
            f"{_sql_md5_le64(chr(39) + 'orders|' + chr(39) + ' || CAST(o_orderkey AS VARCHAR) || ' + chr(39) + '|' + chr(39) + ' || o_orderstatus || ' + chr(39) + '|' + chr(39) + ' || o_orderpriority')} AS hv FROM orders), "
            "rows_n AS (SELECT 'nation' AS table_name, "
            f"{_sql_md5_le64(chr(39) + 'nation|' + chr(39) + ' || CAST(n_nationkey AS VARCHAR) || ' + chr(39) + '|' + chr(39) + ' || n_name')} AS hv FROM nation), "
            "u AS (SELECT * FROM rows_c UNION ALL SELECT * FROM rows_o "
            "UNION ALL SELECT * FROM rows_n), "
            "a AS (SELECT table_name, CAST(count(*) AS BIGINT) AS n_rows, "
            "sum(hv) % CAST(18446744073709551616 AS HUGEINT) AS chk "
            "FROM u GROUP BY table_name) "
            "SELECT table_name, n_rows, "
            "CAST(CASE WHEN chk >= CAST(9223372036854775808 AS HUGEINT) "
            "THEN chk - CAST(18446744073709551616 AS HUGEINT) "
            "ELSE chk END AS BIGINT) AS checksum FROM a"
        ),
        "string_agg_topdocs": (
            "SELECT source, string_agg(CAST(doc_id AS VARCHAR), ',' "
            "ORDER BY doc_id) AS doc_list, "
            "CAST(count(*) AS BIGINT) AS n_top FROM ("
            "SELECT source, doc_id, row_number() OVER ("
            "PARTITION BY source ORDER BY doc_id) AS rn FROM documents) "
            "WHERE rn <= 5 GROUP BY source"
        ),
        "gap_fill": (
            "WITH c AS (SELECT event_type, date_trunc('hour', ts) AS hour, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS cents FROM events GROUP BY event_type, hour), "
            "span AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM c), "
            "grid AS (SELECT t.event_type, g.hour FROM "
            "(SELECT DISTINCT event_type FROM events) t CROSS JOIN "
            "(SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) "
            "AS hour FROM span) g), "
            "j AS (SELECT grid.event_type, grid.hour, "
            "coalesce(c.n_events, 0) AS n_events, c.cents AS obs "
            "FROM grid LEFT JOIN c "
            "ON grid.event_type = c.event_type AND grid.hour = c.hour) "
            "SELECT event_type, hour, n_events, "
            "last_value(obs IGNORE NULLS) OVER (PARTITION BY event_type "
            "ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS cents FROM j"
        ),
        "cube_counts": (
            "SELECT coalesce(lang, 'ALL') AS lang, "
            "coalesce(source, 'ALL') AS source, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY CUBE (lang, source)"
        ),
        "scd2_join": (
            "WITH v AS ("
            "SELECT c_custkey, CAST(1 AS BIGINT) AS version, "
            "TIMESTAMP '1992-01-01' AS valid_from FROM customer "
            "UNION ALL SELECT c_custkey, 2, "
            "TIMESTAMP '1996-01-01' + INTERVAL (c_custkey % 365) DAY "
            "FROM customer "
            "UNION ALL SELECT c_custkey, 3, "
            "TIMESTAMP '1999-01-01' + INTERVAL ((c_custkey * 7) % 365) DAY "
            "FROM customer), "
            "d AS (SELECT c_custkey, version, valid_from, "
            "coalesce(lead(valid_from) OVER (PARTITION BY c_custkey "
            "ORDER BY valid_from), TIMESTAMP '9999-01-01') AS valid_to, "
            "CASE (c_custkey + version) % 5 WHEN 0 THEN 'BRONZE' WHEN 1 THEN 'SILVER' WHEN 2 THEN 'GOLD' WHEN 3 THEN 'PLATINUM' ELSE 'TRIAL' END AS segment FROM v) "
            "SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, "
            "d.version, d.segment FROM orders o JOIN d "
            "ON o.o_custkey = d.c_custkey "
            "AND o.o_orderdate >= d.valid_from "
            "AND o.o_orderdate < d.valid_to"
        ),
        "grouped_regression": (
            "WITH b AS (SELECT l_returnflag, "
            "CAST(l_quantity AS BIGINT) AS x, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS y "
            "FROM lineitem), "
            "a AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(x) AS BIGINT) AS sum_x, "
            "CAST(sum(y) AS BIGINT) AS sum_y, "
            "CAST(sum(x * x) AS BIGINT) AS sum_xx, "
            "CAST(sum(x * y) AS BIGINT) AS sum_xy "
            "FROM b GROUP BY l_returnflag) "
            "SELECT l_returnflag, n, sum_x, sum_y, sum_xx, sum_xy, "
            "CAST(n * sum_xy - sum_x * sum_y AS BIGINT) AS cov_num, "
            "CAST(n * sum_xx - sum_x * sum_x AS BIGINT) AS var_num, "
            "CAST(CASE WHEN n * sum_xx - sum_x * sum_x = 0 THEN 0 "
            "ELSE (n * sum_xy - sum_x * sum_y) "
            "// (n * sum_xx - sum_x * sum_x) END AS BIGINT) AS slope_q "
            "FROM a"
        ),
        "event_transitions": (
            "SELECT prev_type, event_type AS next_type, "
            "CAST(count(*) AS BIGINT) AS n FROM ("
            "SELECT event_type, lag(event_type) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_type "
            "FROM events) WHERE prev_type IS NOT NULL "
            "GROUP BY prev_type, next_type"
        ),
        "funnel_conversion": (
            "WITH f AS (SELECT * FROM events WHERE value >= 150), "
            "s1 AS (SELECT user_id, min(ts) AS t1 FROM f "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM f e "
            "JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1 "
            "WHERE e.event_type = 'click' GROUP BY e.user_id), "
            "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM f e "
            "JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2 "
            "WHERE e.event_type = 'purchase' GROUP BY e.user_id), "
            "d AS (SELECT u.user_id, CAST(CASE "
            "WHEN s3.user_id IS NOT NULL THEN 3 "
            "WHEN s2.user_id IS NOT NULL THEN 2 "
            "WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) "
            "AS depth FROM (SELECT DISTINCT user_id FROM f) u "
            "LEFT JOIN s1 ON u.user_id = s1.user_id "
            "LEFT JOIN s2 ON u.user_id = s2.user_id "
            "LEFT JOIN s3 ON u.user_id = s3.user_id) "
            "SELECT depth, CAST(count(*) AS BIGINT) AS n_users "
            "FROM d GROUP BY depth"
        ),
        "lang_rebalance": (
            "SELECT doc_id, lang, n_chars FROM ("
            "SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars, "
            "row_number() OVER (PARTITION BY lang "
            "ORDER BY length(text) DESC, doc_id) AS rn FROM documents) "
            "WHERE rn <= 30"
        ),
        "drop_funnel": (
            "SELECT doc_id, CASE WHEN n_chars < 100 THEN 'short' "
            "WHEN NOT lang_ok THEN 'bad_lang' "
            "WHEN confidence < 0.6 THEN 'low_confidence' "
            "ELSE 'kept' END AS drop_reason FROM ("
            "SELECT doc_id, n_chars, "
            "lang IN ('en','de','fr','es') AS lang_ok, "
            f"{_SQL_QUALITY_DERIVED.strip()} FROM ("
            f"SELECT doc_id, lang, {_SQL_QUALITY_METRICS.strip()} "
            "FROM documents))"
        ),
        "cm_counts": (
            "WITH toks AS (SELECT unnest(list_filter(string_split_regex("
            "text, '\\s+'), x -> x <> '')) AS tok FROM documents), "
            "top AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_true "
            "FROM toks GROUP BY tok ORDER BY n_true DESC, tok LIMIT 20), "
            "b AS (SELECT i, CAST(list_sum(list_transform(generate_series(0, 7), j -> (CAST(strpos('0123456789abcdef', substr(md5(CAST(i AS VARCHAR) || ':' || tok), 2*j+1, 1)) - 1 AS HUGEINT) * 16 + CAST(strpos('0123456789abcdef', substr(md5(CAST(i AS VARCHAR) || ':' || tok), 2*j+2, 1)) - 1 AS HUGEINT)) * [CAST(1 AS HUGEINT), CAST(256 AS HUGEINT), CAST(65536 AS HUGEINT), CAST(16777216 AS HUGEINT), CAST(4294967296 AS HUGEINT), CAST(1099511627776 AS HUGEINT), CAST(281474976710656 AS HUGEINT), CAST(72057594037927936 AS HUGEINT)][j + 1])) % 1024 AS BIGINT) AS bucket, "
            "CAST(count(*) AS BIGINT) AS n FROM toks, "
            "(SELECT unnest(range(0, 4)) AS i) GROUP BY 1, 2), "
            "q AS (SELECT tok, n_true, i, "
            "CAST(list_sum(list_transform(generate_series(0, 7), j -> (CAST(strpos('0123456789abcdef', substr(md5(CAST(i AS VARCHAR) || ':' || tok), 2*j+1, 1)) - 1 AS HUGEINT) * 16 + CAST(strpos('0123456789abcdef', substr(md5(CAST(i AS VARCHAR) || ':' || tok), 2*j+2, 1)) - 1 AS HUGEINT)) * [CAST(1 AS HUGEINT), CAST(256 AS HUGEINT), CAST(65536 AS HUGEINT), CAST(16777216 AS HUGEINT), CAST(4294967296 AS HUGEINT), CAST(1099511627776 AS HUGEINT), CAST(281474976710656 AS HUGEINT), CAST(72057594037927936 AS HUGEINT)][j + 1])) % 1024 AS BIGINT) AS bucket FROM top, "
            "(SELECT unnest(range(0, 4)) AS i)) "
            "SELECT q.tok AS token, q.n_true, "
            "CAST(min(coalesce(b.n, 0)) AS BIGINT) AS cm_est "
            "FROM q LEFT JOIN b ON q.i = b.i AND q.bucket = b.bucket "
            "GROUP BY q.tok, q.n_true"
        ),
        "robots_txt_rules": (
            # mirrors the deterministic per-host policies in the query:
            # longest-match = the CASE ladder ordered longest pattern first
            f"WITH p AS (SELECT {_SQL_URL} AS url, "
            "CASE WHEN doc_id % 3 = 0 THEN 'heavy.example.com' "
            "ELSE source || '.example.com' END AS host, "
            "'/p/' || doc_id AS path, source FROM documents) "
            "SELECT url, host, CASE "
            "WHEN host = 'heavy.example.com' THEN "
            "(CASE WHEN path LIKE '/p/12%' THEN TRUE "
            "WHEN path LIKE '/p/1%' THEN FALSE ELSE TRUE END) "
            "WHEN CAST(substr(source, 4) AS INT) % 3 = 0 THEN "
            "(CASE WHEN path LIKE '/p/234%' THEN FALSE "
            "WHEN path LIKE '/p/23%' THEN TRUE "
            "WHEN path LIKE '/p/2%' THEN FALSE ELSE TRUE END) "
            "ELSE TRUE END AS allowed FROM p"
        ),
        "robots_filter": (
            f"SELECT {_SQL_URL} AS url FROM documents "
            "WHERE doc_id % 11 <> 5 OR doc_id % 97 = 0"
        ),
        "warc_ingest": (
            f"SELECT {_SQL_URL} AS url, {_SQL_GOLDEN_TEXT} AS text "
            "FROM documents"
        ),
        "jsonl_roundtrip": (
            f"SELECT url, text FROM ({_SQL_EXPECTED_PAGES})"
        ),
        "cdx_fetch": (
            f"SELECT url, text FROM ({_SQL_EXPECTED_PAGES}) "
            "WHERE CAST(string_split(url, '/')[5] AS BIGINT) % 9 = 2"
        ),
        "kcenter_select": (
            "WITH e AS (SELECT vec_id, embedding FROM embeddings), "
            "s0 AS (SELECT vec_id, embedding AS c FROM e "
            "ORDER BY vec_id LIMIT 1), "
            "p1 AS (SELECT e.vec_id, e.embedding AS c FROM e, s0 "
            "ORDER BY list_distance(e.embedding, s0.c) DESC, e.vec_id "
            "LIMIT 1), "
            "p2 AS (SELECT e.vec_id, e.embedding AS c FROM e, s0, p1 "
            "ORDER BY least(list_distance(e.embedding, s0.c), "
            "list_distance(e.embedding, p1.c)) DESC, e.vec_id LIMIT 1), "
            "p3 AS (SELECT e.vec_id, e.embedding AS c FROM e, s0, p1, p2 "
            "ORDER BY least(list_distance(e.embedding, s0.c), "
            "list_distance(e.embedding, p1.c), "
            "list_distance(e.embedding, p2.c)) DESC, e.vec_id LIMIT 1) "
            "SELECT CAST(0 AS BIGINT) AS \"rank\", vec_id FROM s0 "
            "UNION ALL SELECT 1, vec_id FROM p1 "
            "UNION ALL SELECT 2, vec_id FROM p2 "
            "UNION ALL SELECT 3, vec_id FROM p3"
        ),
        "zorder_keys": (
            "SELECT l_orderkey, l_partkey, l_linenumber, "
            "CAST(list_sum(list_transform(generate_series(0, 15), i -> "
            "(((l_orderkey >> i) & 1) << (2 * i)) "
            "+ (((l_partkey >> i) & 1) << (2 * i + 1)))) AS BIGINT) "
            "AS zkey FROM lineitem"
        ),
        "merge_upsert": (
            "SELECT doc_id, source, CAST(CASE WHEN doc_id % 3 = 0 THEN 1 "
            "ELSE 0 END AS BIGINT) AS version FROM documents "
            "WHERE doc_id % 7 <> 0"
        ),
        "asof_snapshot": (
            "SELECT doc_id, source, CAST(CASE WHEN doc_id % 3 = 0 THEN 1 "
            "ELSE 0 END AS BIGINT) AS version FROM documents"
        ),
        "scd2_build": (
            "WITH o AS (SELECT user_id, "
            "CAST(floor(epoch(ts)) AS BIGINT) AS t, "
            "min(event_type) AS event_type FROM events "
            "GROUP BY user_id, t), "
            "s AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id "
            "ORDER BY t) AS pv FROM o), "
            "st AS (SELECT user_id, t, event_type FROM s "
            "WHERE pv IS NULL OR event_type <> pv), "
            "r AS (SELECT user_id, event_type, t AS valid_from, "
            "lead(t) OVER (PARTITION BY user_id ORDER BY t) AS nxt "
            "FROM st) "
            "SELECT user_id, event_type, valid_from, "
            "coalesce(nxt, 4102444800) AS valid_to FROM r"
        ),
        "late_events": (
            "SELECT event_id, user_id, "
            "ts < max(ts) OVER (PARTITION BY user_id) "
            "- INTERVAL 120 MINUTE AS is_late FROM events"
        ),
        # the TRUE amp-side Jaccard pair set (same ground-truth machinery
        # as minhash_neardup): at larger scales template-heavy pages make
        # an amp variant a genuine >=0.8 match of MORE than its original,
        # so a closed-form amp->original oracle is too narrow
        "online_neardup": (
            f"WITH pages AS ({_SQL_PAGES_WITH_AMP}), "
            "sh AS (SELECT url, list_distinct(list_transform("
            "generate_series(1, len(toks) - 2), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh "
            "FROM (SELECT url, list_filter(string_split_regex(text, "
            "'\\s+'), x -> x <> '') AS toks FROM pages WHERE text <> '')) "
            "SELECT q.url AS query_id, m.url AS match_id "
            "FROM sh q JOIN sh m ON q.url LIKE '%?amp=1' "
            "AND m.url NOT LIKE '%?amp=1' "
            "WHERE CAST(len(list_intersect(q.sh, m.sh)) AS DOUBLE) / "
            "len(list_distinct(q.sh || m.sh)) >= 0.8"
        ),
        "tfrecord_roundtrip": (
            f"SELECT url, text FROM ({_SQL_EXPECTED_PAGES})"
        ),
        "csv_roundtrip": (
            f"SELECT url, text FROM ({_SQL_EXPECTED_PAGES})"
        ),
        "ipc_roundtrip": (
            f"SELECT url, text FROM ({_SQL_EXPECTED_PAGES})"
        ),
        "sorted_export": (
            f"WITH p AS (SELECT {_SQL_URL} AS url FROM documents), "
            "k AS (SELECT lower(array_to_string(list_reverse(string_split("
            "string_split(url, '/')[3], '.')), ',') || ')' || "
            "substr(url, 9 + length(string_split(url, '/')[3]))) AS key "
            "FROM p), "
            "b AS (SELECT key, CAST((key >= 'com,example,src1')::INT "
            "+ (key >= 'com,example,src3')::INT "
            "+ (key >= 'com,example,src6')::INT AS BIGINT) AS shard FROM k) "
            "SELECT shard, CAST(count(*) AS BIGINT) AS n_rows, "
            "min(key) AS min_key, max(key) AS max_key FROM b GROUP BY shard"
        ),
        "orc_roundtrip": (
            f"SELECT url, text FROM ({_SQL_EXPECTED_PAGES})"
        ),
        "wet_roundtrip": (
            f"SELECT url, text FROM ({_SQL_EXPECTED_PAGES})"
        ),
        "page_meta": (
            f"SELECT {_SQL_URL} AS url, CASE "
            "WHEN doc_id % 5 = 0 THEN 'Article' "
            "WHEN doc_id % 5 = 1 THEN 'Index' "
            "WHEN doc_id % 5 = 2 THEN 'PO' "
            "WHEN doc_id % 5 = 3 THEN 'Report' "
            "WHEN doc_id % 10 = 4 THEN 'Invoice' "
            "WHEN doc_id % 10 = 9 THEN 'LC' "
            "ELSE '.' END AS title "
            "FROM documents WHERE doc_id % 97 <> 0"
        ),
        "curation_hostaware": (
            f"WITH d AS (SELECT url, string_split(url, '/')[3] AS host, "
            f"text, doc_id FROM ({_SQL_EXPECTED_PAGES}) WHERE text <> ''), "
            "hp AS (SELECT host, count(*) AS hp FROM d GROUP BY host), "
            "l AS (SELECT url, host, doc_id, "
            "unnest(string_split(text, chr(10))) AS line, "
            "unnest(range(1, len(string_split(text, chr(10))) + 1)) AS idx "
            "FROM d), "
            "lc AS (SELECT host, line, count(DISTINCT url) AS n "
            "FROM l GROUP BY host, line), "
            "t AS (SELECT lc.host, lc.line FROM lc JOIN hp USING (host) "
            "WHERE hp >= 5 AND 4 * n >= hp), "
            "k AS (SELECT l.url, l.host, l.doc_id, l.line FROM l "
            "WHERE NOT EXISTS (SELECT 1 FROM t "
            "WHERE t.host = l.host AND t.line = l.line)), "
            "c AS (SELECT url, host, any_value(doc_id) AS doc_id, "
            "CAST(sum(length(line)) + count(*) - 1 AS BIGINT) AS "
            "n_chars_clean FROM k GROUP BY url, host), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY host "
            "ORDER BY n_chars_clean DESC, url) AS rn FROM c) "
            "SELECT host, url, n_chars_clean, CASE "
            "WHEN (doc_id * 2654435761) % 4294967296 / 4294967296.0 < 0.8 "
            "THEN 'train' "
            "WHEN (doc_id * 2654435761) % 4294967296 / 4294967296.0 < 0.9 "
            "THEN 'val' ELSE 'test' END AS split FROM r WHERE rn <= 5"
        ),
        "snapshot_diff": (
            "WITH old AS (SELECT doc_id, text FROM documents "
            "WHERE doc_id % 4 = 1), "
            "new AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 "
            "THEN text || ' v2' ELSE text END AS text FROM documents "
            "WHERE doc_id % 3 <> 0) "
            "SELECT coalesce(old.doc_id, new.doc_id) AS doc_id, "
            "CASE WHEN old.doc_id IS NULL THEN 'added' "
            "WHEN new.doc_id IS NULL THEN 'removed' "
            "WHEN old.text = new.text THEN 'unchanged' "
            "ELSE 'changed' END AS status "
            "FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id"
        ),
        "host_cap": (
            f"WITH p AS (SELECT url, string_split(url, '/')[3] AS host, "
            f"length(text) AS n_chars FROM ({_SQL_EXPECTED_PAGES})), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY host "
            "ORDER BY n_chars DESC, url) AS rn FROM p) "
            "SELECT host, url, n_chars FROM r WHERE rn <= 5"
        ),
        "outlink_count": (
            f"SELECT {_SQL_URL} AS url, CAST(CASE "
            "WHEN doc_id % 5 IN (0, 3) THEN 8 "
            "WHEN doc_id % 5 = 1 THEN 18 "
            "ELSE 6 END AS BIGINT) AS n_links "
            "FROM documents WHERE doc_id % 97 <> 0 "
            "AND NOT (doc_id % 5 = 4 AND doc_id % 10 NOT IN (4, 9))"
        ),
        "host_template_strip": (
            f"WITH d AS (SELECT url, string_split(url, '/')[3] AS host, "
            f"text FROM ({_SQL_EXPECTED_PAGES}) WHERE text <> ''), "
            "hp AS (SELECT host, count(*) AS hp FROM d GROUP BY host), "
            "l AS (SELECT url, host, "
            "unnest(string_split(text, chr(10))) AS line, "
            "unnest(range(1, len(string_split(text, chr(10))) + 1)) AS idx, "
            "len(string_split(text, chr(10))) AS n_total FROM d), "
            "lc AS (SELECT host, line, count(DISTINCT url) AS n "
            "FROM l GROUP BY host, line), "
            "t AS (SELECT lc.host, lc.line FROM lc JOIN hp USING (host) "
            "WHERE hp >= 5 AND 4 * n >= hp), "
            "k AS (SELECT l.url, l.line, l.idx, l.n_total FROM l "
            "WHERE NOT EXISTS (SELECT 1 FROM t "
            "WHERE t.host = l.host AND t.line = l.line)) "
            "SELECT url, string_agg(line, chr(10) ORDER BY idx) AS "
            "text_clean, count(*) AS n_kept, any_value(n_total) AS n_total "
            "FROM k GROUP BY url"
        ),
        "skew_join": (
            f"WITH p AS (SELECT {_SQL_URL} AS url, "
            "CASE WHEN doc_id % 3 = 0 THEN 'heavy.example.com' "
            "ELSE source || '.example.com' END AS host FROM documents), "
            "h AS (SELECT host, count(*) AS host_docs FROM p GROUP BY host) "
            "SELECT p.url, p.host, h.host_docs FROM p JOIN h USING (host)"
        ),
        "kmeans_clusters": _sql_kmeans(k=4, iters=2),
        "pagerank": _sql_pagerank(iters=2),
        "pagerank_irregular": _sql_pagerank_irregular(iters=2),
        "rendezvous_shards": (
            "WITH s AS (SELECT unnest(['shard-a', 'shard-b', 'shard-c', "
            "'shard-d', 'shard-e']) AS shard), "
            "m AS (SELECT d.doc_id, s.shard, "
            + _sql_md5_le64("CAST(d.doc_id AS VARCHAR) || '|' || s.shard")
            + " AS h FROM documents d CROSS JOIN s), "
            "r AS (SELECT doc_id, shard, row_number() OVER "
            "(PARTITION BY doc_id ORDER BY h DESC, shard DESC) AS rn "
            "FROM m) "
            "SELECT doc_id, shard FROM r WHERE rn = 1"
        ),
        # closed form of the planted chain topology: i -> i-1 unless
        # i % 8 == 0, so every chain ends at the floor multiple of 8
        "redirect_resolve": (
            "SELECT doc_id AS node, (doc_id // 8) * 8 AS final "
            "FROM documents"
        ),
        "ntile_split": (
            "SELECT doc_id, lang, n_chars, "
            "ntile(10) OVER (PARTITION BY lang "
            "ORDER BY n_chars, doc_id) AS tile FROM documents"
        ),
        # keep-in-sync: mirrors _q_fuzzy_hosts' planted deletion
        # (position doc_id % len, 0-based) and the argmin/tie-break
        "fuzzy_hosts": (
            "WITH d AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 "
            "THEN 'heavy.example.com' "
            "ELSE source || '.example.com' END AS host FROM documents), "
            "t AS (SELECT doc_id, "
            "substr(host, 1, CAST(doc_id % length(host) AS INT)) || "
            "substr(host, CAST(doc_id % length(host) AS INT) + 2) "
            "AS dirty FROM d), "
            "c AS (SELECT DISTINCT source || '.example.com' AS chost "
            "FROM documents UNION SELECT 'heavy.example.com'), "
            "m AS (SELECT t.doc_id, t.dirty, c.chost, "
            "levenshtein(t.dirty, c.chost) AS dist FROM t CROSS JOIN c), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY dist, chost) AS rn FROM m) "
            "SELECT doc_id, dirty, chost AS canon_host, dist "
            "FROM r WHERE rn = 1 AND dist <= 2"
        ),
        "symspell_pairs": (
            "WITH d AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 "
            "THEN 'heavy.example.com' "
            "ELSE source || '.example.com' END AS host FROM documents), "
            "t AS (SELECT DISTINCT "
            "substr(host, 1, CAST(doc_id % length(host) AS INT)) || "
            "substr(host, CAST(doc_id % length(host) AS INT) + 2) "
            "AS dirty FROM d), "
            "c AS (SELECT DISTINCT source || '.example.com' AS canon "
            "FROM documents UNION SELECT 'heavy.example.com') "
            "SELECT t.dirty, c.canon, "
            "CAST(levenshtein(t.dirty, c.canon) AS BIGINT) AS dist "
            "FROM t CROSS JOIN c WHERE levenshtein(t.dirty, c.canon) <= 1"
        ),
        # keep-in-sync: mirrors _q_triangle_count's edge generator
        # (i -> i+1, i+2, 7i+1 mod n); wedge a<b<c closed by a 3-way
        # self-join over the oriented-distinct edge set
        "triangle_count": (
            "WITH nn AS (SELECT count(*) AS n FROM documents), "
            "raw AS ("
            "SELECT doc_id AS a, (doc_id + 1) % nn.n AS b "
            "FROM documents, nn "
            "UNION ALL SELECT doc_id, (doc_id + 2) % nn.n "
            "FROM documents, nn "
            "UNION ALL SELECT doc_id, (doc_id * 7 + 1) % nn.n "
            "FROM documents, nn), "
            "e AS (SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi "
            "FROM raw WHERE a <> b), "
            "w AS (SELECT e1.lo AS apex, e1.hi AS b, e2.hi AS c "
            "FROM e e1 JOIN e e2 ON e1.lo = e2.lo AND e1.hi < e2.hi) "
            "SELECT w.apex AS node, count(*) AS n_triangles "
            "FROM w JOIN e ON e.lo = w.b AND e.hi = w.c GROUP BY 1"
        ),
        "pq_codes": _sql_pq(m=4, k=4, iters=2, dim=64),
        "p95_quantity": (
            "WITH c AS (SELECT l_returnflag, l_linestatus, "
            "CAST(l_quantity AS BIGINT) AS v, count(*) AS n FROM lineitem "
            "GROUP BY 1, 2, 3), "
            "w AS (SELECT l_returnflag, l_linestatus, v, "
            "sum(n) OVER (PARTITION BY l_returnflag, l_linestatus "
            "ORDER BY v) AS cum, "
            "sum(n) OVER (PARTITION BY l_returnflag, l_linestatus) AS tot "
            "FROM c) "
            "SELECT l_returnflag, l_linestatus, min(v) AS p95_qty FROM w "
            "WHERE cum >= ceil(0.95 * tot) GROUP BY 1, 2"
        ),
        "users_per_event": (
            "SELECT event_type, count(DISTINCT user_id) AS n_distinct "
            "FROM events GROUP BY event_type"
        ),
        "images_to_pdf": (
            "SELECT doc_id, 1 + doc_id % 3 AS n_pages, true AS pdf_valid "
            "FROM documents"
        ),
        "base64_pages": (
            "SELECT doc_id, to_base64(encode(text)) AS payload_b64 "
            "FROM documents"
        ),
        # OCR must reproduce the first page's walk text byte-identically:
        # first min(96, n) tokens in lines of 8 joined by newlines
        "ocr_roundtrip": (
            "WITH t AS (SELECT doc_id, source, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks "
            "FROM documents) "
            f"SELECT {_SQL_URL} AS url, "
            "CASE WHEN doc_id % 97 = 0 OR len(toks) = 0 THEN '' ELSE "
            "array_to_string(list_transform("
            "generate_series(0, (least(len(toks), 96) - 1) // 8), "
            "j -> array_to_string(toks[j * 8 + 1 : least(j * 8 + 8, 96)], ' ')), "
            "chr(10)) END AS ocr_text FROM t"
        ),
        # note: the non-empty filter in the Ray prefix drops malformed
        # (empty-text) pages, so only archetype rows remain
        "doc_type_autodetect": (
            f"SELECT {_SQL_URL} AS url, CASE "
            "WHEN doc_id % 5 = 2 THEN 'purchase_order' "
            "WHEN doc_id % 10 = 4 THEN 'invoice' "
            "ELSE 'unknown' END AS doc_type "
            "FROM documents WHERE doc_id % 97 <> 0 "
            "AND (doc_id % 5 IN (0, 2, 3) OR doc_id % 10 = 4)"
        ),
        "jpeg_roundtrip": (
            "SELECT doc_id, "
            "((84 + 2 * (doc_id % 45)) * 1000000) // 255 AS brightness_ppm, "
            "true AS jpeg_nonempty FROM documents"
        ),
        "tiff_roundtrip": (
            "SELECT doc_id, 16 * list_sum(list_transform("
            "generate_series(0, 7), y -> (doc_id + y) % 256)) AS pixel_sum "
            "FROM documents"
        ),
        "page_type_detect": (
            "SELECT doc_id, CASE "
            "WHEN doc_id % 25 > 15 THEN 'text' "
            "WHEN doc_id % 3 > 0 AND doc_id % 25 < 8 THEN 'image' "
            "WHEN (doc_id % 20) / 100.0 > 0.08 THEN 'text' "
            "ELSE 'image' END AS page_type FROM documents"
        ),
        "table_detect": (
            "SELECT doc_id, "
            "CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 1 END AS n_tables, "
            "CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 2 + doc_id % 3 END "
            "AS n_rows_first FROM documents"
        ),
        "field_validation": (
            "SELECT doc_id, doc_id % 3 <> 0 AS date_ok, "
            "doc_id % 5 <> 0 AS amount_ok, "
            "doc_id % 7 <> 0 AS currency_ok FROM documents"
        ),
        "layout_structure": (
            "WITH t AS (SELECT doc_id, source, "
            "least(len(list_filter(string_split_regex(text, '\\s+'), "
            "x -> x <> '')), 96) AS m FROM documents) "
            f"SELECT {_SQL_URL} AS url, "
            "CASE WHEN doc_id % 97 = 0 OR m = 0 THEN 0 "
            "ELSE ((m + 7) // 8 + 2) // 3 END AS n_blocks, "
            "CASE WHEN doc_id % 97 = 0 THEN 0 ELSE (m + 7) // 8 END "
            "AS n_lines, "
            "CASE WHEN doc_id % 97 = 0 THEN 0 ELSE m END AS n_words "
            "FROM t"
        ),
        "generic_entities": (
            f"SELECT {_SQL_URL} AS url, "
            "lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') || '.' || "
            "lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '.2024' "
            "AS first_date, "
            "'USD ' || format('{:,}', (100 + doc_id % 400) * 500) || '.00' "
            "AS first_amount, "
            "1 AS n_dates, 1 AS n_amounts, 9 AS n_numbers, "
            "0 AS n_emails, 0 AS n_phones "
            "FROM documents WHERE doc_id % 5 = 2 AND doc_id % 97 <> 0"
        ),
        "office_extract": (
            "SELECT doc_id, CASE "
            "WHEN doc_id % 2 = 0 THEN array_to_string(list_transform("
            "generate_series(0, doc_id % 3), "
            "j -> 'Paragraph ' || j || ' of doc ' || doc_id), chr(10)) "
            "WHEN doc_id % 50 = 7 THEN repeat('x', 1000) "
            "ELSE array_to_string(list_transform("
            "generate_series(0, least(2 + doc_id % 150, 100) - 1), "
            "i -> 'r' || i || 'd' || (doc_id % 10)), chr(10)) END AS text, "
            "CASE WHEN doc_id % 2 = 0 THEN 'docx' ELSE 'xlsx' END "
            "AS payload_kind FROM documents"
        ),
        "ocr_classify": (
            f"SELECT {_SQL_URL} AS url, "
            "CASE WHEN doc_id % 97 = 0 THEN 'unclassified' "
            "ELSE 'data_report' END AS category, '4/4' AS votes "
            "FROM documents"
        ),
        # first page holds <= 4 blocks x 3 lines x 8 words = 96 words;
        # disjoint 6·len x 10 span boxes -> ink = 60·Σ len
        "rasterize_pages": (
            "WITH t AS (SELECT doc_id, source, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks "
            "FROM documents) "
            f"SELECT {_SQL_URL} AS url, "
            "CASE WHEN doc_id % 97 = 0 THEN 0 ELSE "
            "coalesce(60 * list_sum(list_transform(toks[1:96], "
            "w -> length(w))), 0) END AS ink_px, "
            "CASE WHEN doc_id % 97 = 0 THEN 0 ELSE 612 END AS raster_w, "
            "CASE WHEN doc_id % 97 = 0 THEN 0 ELSE 792 END AS raster_h "
            "FROM t"
        ),
        "events_rate_windows": (
            "WITH iv AS (SELECT k AS interval_id, "
            "TIMESTAMP '2024-01-01' + k * INTERVAL 45 MINUTE AS s, "
            "TIMESTAMP '2024-01-01' + k * INTERVAL 45 MINUTE "
            "+ INTERVAL 60 MINUTE AS e, k % 3 AS rate_class "
            "FROM (SELECT unnest(range(0, 960)) AS k)) "
            "SELECT ev.event_id, iv.interval_id, iv.rate_class "
            "FROM events ev JOIN iv ON ev.ts >= iv.s AND ev.ts < iv.e"
        ),
        "video_frames": (
            "WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS n_frames "
            "FROM documents), "
            "f AS (SELECT doc_id, n_frames, "
            "unnest(range(0, n_frames, 2)) AS frame_idx FROM d) "
            "SELECT doc_id, n_frames, frame_idx, "
            "(((doc_id * 7 + frame_idx * 13) % 256) * 1000000) // 255 "
            "AS brightness_ppm FROM f"
        ),
        "kmv_distinct": (
            "WITH t AS (SELECT list_filter(string_split_regex(text, '\\s+'), "
            "x -> x <> '') AS toks FROM documents), "
            "s AS (SELECT DISTINCT sh FROM (SELECT "
            "unnest(list_transform(generate_series(1, len(toks) - 2), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh "
            "FROM t)), "
            f"h AS (SELECT {_sql_md5_le64('sh')} AS hv FROM s), "
            "o AS (SELECT hv FROM h ORDER BY hv LIMIT 128), "
            "a AS (SELECT count(*) AS m, max(hv) AS hk FROM o) "
            "SELECT 128 AS k, m AS n_kept, "
            "CAST(CASE WHEN m < 128 THEN CAST(m AS HUGEINT) "
            "ELSE CAST(127 AS HUGEINT) * "
            "CAST(18446744073709551616 AS HUGEINT) // hk END AS BIGINT) "
            "AS est_distinct FROM a"
        ),
        # HLL: bucket = low 10 hash bits, rho = leftmost-1 position of the
        # 54-bit remainder (exact via length(bin(r)), no float log2);
        # Σ 2^-M_j carried as the integer Σ 2^(64-M_j); alpha_ppm is the
        # shared sketches.HLL_ALPHA_PPM constant. DISTINCT on shingles is
        # a no-op for register state (duplicates can't raise a max).
        "hll_distinct": (
            "WITH t AS (SELECT list_filter(string_split_regex(text, '\\s+'), "
            "x -> x <> '') AS toks FROM documents), "
            "s AS (SELECT DISTINCT sh FROM (SELECT "
            "unnest(list_transform(generate_series(1, len(toks) - 2), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh "
            "FROM t)), "
            f"h AS (SELECT {_sql_md5_le64('sh')} AS hv FROM s), "
            "b AS (SELECT CAST(hv % 1024 AS BIGINT) AS bucket, "
            "CAST(hv // 1024 AS UBIGINT) AS r FROM h), "
            "rr AS (SELECT bucket, CASE WHEN r = 0 THEN 55 "
            "ELSE 55 - length(bin(r)) END AS rho FROM b), "
            "mx AS (SELECT bucket, max(rho) AS mrho FROM rr GROUP BY bucket), "
            "a AS (SELECT count(*) AS npres, "
            "sum(CAST(1 AS HUGEINT) << (64 - mrho)) AS s_present FROM mx) "
            "SELECT 1024 AS m, CAST(1024 - npres AS BIGINT) AS n_zero, "
            f"CAST(CAST({_HLL_ALPHA_PPM} AS HUGEINT) * 1048576 "
            "* (CAST(1 AS HUGEINT) << 64) // (CAST(1000000 AS HUGEINT) "
            "* (s_present + (1024 - npres) * (CAST(1 AS HUGEINT) << 64))) "
            "AS BIGINT) AS est_raw FROM a"
        ),
        "curate_corpus": (
            "SELECT doc_id, lang, n_chars, confidence FROM ("
            "SELECT doc_id, lang, n_chars, "
            "lang IN ('en','de','fr','es') AS lang_ok, "
            f"{_SQL_QUALITY_DERIVED.strip()} FROM ("
            f"SELECT doc_id, lang, {_SQL_QUALITY_METRICS.strip()} FROM documents)) "
            "WHERE confidence >= 0.6 AND lang_ok AND n_chars >= 100"
        ),
        "lang_id": _sql_lang_id("doc_id", "documents"),
        "lang_prf": (
            "WITH pred AS (" + _sql_lang_id("doc_id", "documents")
            + "), "
            "p AS (SELECT d.lang AS t, pr.pred_lang AS y "
            "FROM documents d JOIN pred pr USING (doc_id)), "
            "labs AS (SELECT DISTINCT t AS lab FROM p "
            "UNION SELECT DISTINCT y FROM p), "
            "m AS (SELECT lab, "
            "(SELECT count(*) FROM p WHERE t = lab AND y = lab) AS tp, "
            "(SELECT count(*) FROM p WHERE t <> lab AND y = lab) "
            "AS fp, "
            "(SELECT count(*) FROM p WHERE t = lab AND y <> lab) "
            "AS fn FROM labs) "
            "SELECT lab AS label, CAST(tp AS BIGINT) AS tp, "
            "CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn, "
            "CAST(CASE WHEN tp + fp = 0 THEN 0 "
            "ELSE tp * 1000000 // (tp + fp) END AS BIGINT) "
            "AS precision_ppm, "
            "CAST(CASE WHEN tp + fn = 0 THEN 0 "
            "ELSE tp * 1000000 // (tp + fn) END AS BIGINT) "
            "AS recall_ppm, "
            "CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0 "
            "ELSE 2 * tp * 1000000 // (2 * tp + fp + fn) END "
            "AS BIGINT) AS f1_ppm FROM m"
        ),
        "lang_kappa": (
            "WITH pred AS (" + _sql_lang_id("doc_id", "documents")
            + "), "
            "pairs AS (SELECT d.lang AS a, p.pred_lang AS b "
            "FROM documents d JOIN pred p USING (doc_id)), "
            "cm AS (SELECT a, b, count(*) AS n FROM pairs "
            "GROUP BY 1, 2), "
            "tot AS (SELECT sum(n) AS n FROM cm), "
            "diag AS (SELECT coalesce(sum(n), 0) AS d FROM cm "
            "WHERE a = b), "
            "ra AS (SELECT a AS lab, sum(n) AS r FROM cm GROUP BY 1), "
            "cb AS (SELECT b AS lab, sum(n) AS c FROM cm GROUP BY 1), "
            "pe AS (SELECT coalesce(sum(ra.r * cb.c), 0) AS e "
            "FROM ra JOIN cb USING (lab)) "
            "SELECT CAST(tot.n AS BIGINT) AS n, "
            "CAST(diag.d AS BIGINT) AS n_agree, "
            "CAST(pe.e AS BIGINT) AS e_sum, "
            "CAST((tot.n * diag.d - pe.e) * 1000000 "
            "// (tot.n * tot.n - pe.e) AS BIGINT) AS kappa_ppm "
            "FROM tot, diag, pe"
        ),
        "token_count_bpe": (
            # n_ws_tokens mirrors .split() (any-whitespace, empties dropped);
            # the BPE pre-tokenizer regex is RE2-compatible and matches
            # Python findall leftmost-first alternation exactly
            "SELECT doc_id, "
            "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) "
            "AS n_ws_tokens, "
            "len(regexp_extract_all(text, "
            "'''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+')) "
            "AS n_bpe_tokens FROM documents"
        ),
        "bpe_pair_counts": (
            f"WITH w AS ({_SQL_BPE_WORDS}), "
            "p AS (SELECT substr(word, CAST(i AS INT), 2) AS pair, n FROM "
            "(SELECT word, n, unnest(range(1, length(word))) AS i FROM w)) "
            "SELECT pair, CAST(sum(n) AS BIGINT) AS n FROM p GROUP BY pair "
            "ORDER BY n DESC, pair LIMIT 20"
        ),
        "bpe_train_merges": _sql_bpe_train(3),
        "bpe_encode": (
            "WITH t AS (SELECT doc_id, "
            "unnest(string_split(coalesce(text, ''), ' ')) AS word "
            "FROM documents), "
            "e AS (SELECT doc_id, CASE WHEN word = '' THEN 0 ELSE "
            f"{_sql_bpe_encode_tokens('word')} END AS k FROM t) "
            "SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bpe_tokens "
            "FROM e GROUP BY doc_id"
        ),
        # the MINIPDF walk text is the deterministic 8-words-per-line
        # relayout of the document text (build_from_text), independently
        # reconstructed here: line/block/page joins all collapse to one
        # '\n' per line boundary
        "pdf_layout_text": (
            "WITH t AS (SELECT doc_id, source, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks "
            "FROM documents) "
            f"SELECT {_SQL_URL} AS url, "
            "CASE WHEN doc_id % 97 = 0 OR len(toks) = 0 THEN '' ELSE "
            "array_to_string(list_transform(generate_series(0, (len(toks) - 1) // 8), "
            "j -> array_to_string(toks[j * 8 + 1 : j * 8 + 8], ' ')), chr(10)) END AS text, "
            "CASE WHEN doc_id % 97 = 0 THEN 'error' ELSE 'pdf' END AS payload_kind "
            "FROM t"
        ),
        # IVF at nprobe=12/nlist=16 achieves recall 1.0 on this corpus with
        # margin (1.0 from nprobe=10 up) — the oracle IS the exact top-10;
        # nprobe is the documented recall/throughput knob at scale
        "ann_ivf": (
            "WITH s AS (SELECT vec_id, list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS c "
            "FROM embeddings WHERE vec_id <> 0) "
            "SELECT vec_id FROM s ORDER BY c DESC, vec_id LIMIT 10"
        ),
        "fingerprint": _sql_fingerprint(),
        "incremental_dedup": (
            "SELECT doc_id, source FROM documents WHERE md5(text) NOT IN "
            "(SELECT md5(text) FROM documents WHERE doc_id % 4 = 1)"
        ),
        # identical semantics by construction: the bloom path is exact
        "bloom_dedup": (
            "SELECT doc_id, source FROM documents WHERE md5(text) NOT IN "
            "(SELECT md5(text) FROM documents WHERE doc_id % 4 = 1)"
        ),
        "url_filter": (
            f"WITH p AS (SELECT url FROM ({_SQL_PAGES_WITH_AMP})), "
            "h AS (SELECT url, string_split(url, '/')[3] AS host FROM p), "
            "f AS (SELECT url, host, coalesce(host = 'heavy.example.com' OR "
            "(starts_with(host, 'src') AND TRY_CAST(substr("
            "string_split(host, '.')[1], 4) AS INT) % 7 = 3), false) "
            "AS blocked FROM h) "
            "SELECT url, host, "
            "CASE WHEN blocked OR contains(url, '?') THEN false "
            "ELSE true END AS keep, "
            "CASE WHEN blocked THEN 'blocked_host' "
            "WHEN contains(url, '?') THEN 'query_string' "
            "ELSE 'ok' END AS drop_reason FROM f"
        ),
        # prune rule mirrored as a self-join: drop iff ANY lower-id
        # same-cluster vector sits at cosine >= 0.4 (nearest pair is
        # ~1e-4 from the threshold vs ~1e-15 cross-engine drift)
        "semdedup": (
            f"WITH asg AS (SELECT vec_id, cluster FROM ({_sql_kmeans(4, 2)})), "
            "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
            "FROM embeddings), "
            "j AS (SELECT a.vec_id, a.cluster, e.v FROM asg a "
            "JOIN e ON a.vec_id = e.vec_id), "
            "p AS (SELECT j1.vec_id, "
            "bool_or(list_cosine_similarity(j1.v, j2.v) >= 0.4) AS hit "
            "FROM j j1 JOIN j j2 ON j1.cluster = j2.cluster "
            "AND j2.vec_id < j1.vec_id GROUP BY j1.vec_id) "
            "SELECT j.vec_id, j.cluster, NOT coalesce(p.hit, false) AS keep "
            "FROM j LEFT JOIN p ON j.vec_id = p.vec_id"
        ),
        "shard_export": (
            "WITH k AS (SELECT doc_id, "
            "(doc_id * 2654435761) % 4294967296 AS h FROM documents) "
            "SELECT doc_id, CAST(h % 16 AS BIGINT) AS shard, "
            "CAST(h AS BIGINT) AS h, "
            "CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) "
            "- 1 AS BIGINT) AS pos FROM k"
        ),
        # keep DSIR_BUCKETS (stages/curation.py) and the % 64 here in sync
        "dsir_weights": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(list_filter(string_split_regex(text, '\\s+'), "
            "x -> x <> '')) AS tok FROM documents), "
            f"b AS (SELECT doc_id, CAST({_sql_md5_le64('tok')} % 64 "
            "AS BIGINT) AS bucket FROM tok), "
            "raw AS (SELECT bucket, count(*) AS rc FROM b GROUP BY bucket), "
            "tgt AS (SELECT bucket, count(*) AS tc FROM b "
            "WHERE doc_id % 31 = 5 GROUP BY bucket), "
            "sc AS (SELECT raw.bucket, ((coalesce(tgt.tc, 0) + 1) * 1000000) "
            "// (raw.rc + 1) AS s FROM raw LEFT JOIN tgt "
            "ON raw.bucket = tgt.bucket), "
            "agg AS (SELECT b.doc_id, sum(sc.s) AS tot FROM b "
            "JOIN sc ON b.bucket = sc.bucket GROUP BY b.doc_id) "
            "SELECT d.doc_id, CAST(coalesce(agg.tot, 0) AS BIGINT) "
            "AS dsir_score_ppm FROM documents d "
            "LEFT JOIN agg ON d.doc_id = agg.doc_id"
        ),
        # keep k=30 in sync with _q_heavy_hitters
        "heavy_hitters": (
            "WITH tok AS (SELECT unnest(list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '')) AS token "
            "FROM documents), "
            "tot AS (SELECT count(*) AS n FROM tok) "
            "SELECT token, count(*) AS n_count FROM tok, tot "
            "GROUP BY token, tot.n HAVING count(*) * 31 > tot.n"
        ),
# composed-CTE mirror of the web_curation chain: golden pages →
        # host blocklist (amp variants never exist in the golden set; the
        # engine's query-string rule removes them pre-extract) → empty
        # drop → C4 line filter → knuth split on the url-embedded doc_id
        "config_pipeline": (
            f"WITH base AS ({_SQL_EXPECTED_PAGES}), "
            "f AS (SELECT doc_id, url, text FROM base WHERE text <> '' "
            "AND NOT coalesce(string_split(url, '/')[3] = 'heavy.example.com' "
            "OR (starts_with(string_split(url, '/')[3], 'src') AND "
            "TRY_CAST(substr(string_split(string_split(url, '/')[3], '.')[1], 4) "
            "AS INT) % 7 = 3), false)), "
            "c AS (SELECT doc_id, url, "
            "list_filter(string_split(text, chr(10)), l -> "
            "len(list_filter(string_split_regex(l, '\\s+'), x -> x <> '')) >= 5 "
            "AND NOT contains(l, '{') AND NOT ends_with(l, ':')) AS kept FROM f), "
            "k AS (SELECT doc_id, url, array_to_string(kept, chr(10)) AS ct, "
            "len(kept) AS n_lines_kept FROM c WHERE len(kept) > 0) "
            "SELECT url, n_lines_kept, length(ct) AS n_chars, CASE "
            "WHEN (doc_id * 2654435761) % 4294967296 / 4294967296.0 < 0.8 "
            "THEN 'train' "
            "WHEN (doc_id * 2654435761) % 4294967296 / 4294967296.0 < 0.9 "
            "THEN 'val' ELSE 'test' END AS split FROM k"
        ),
        # the post-change state aggregated directly: deletes %7 gone,
        # updates %3 carry " extra extra" (+2 single-space tokens)
        "ivm_counts": (
            "SELECT source, CAST(sum(CASE WHEN doc_id % 3 = 0 "
            "THEN len(string_split(text, ' ')) + 2 "
            "ELSE len(string_split(text, ' ')) END) AS BIGINT) AS total "
            "FROM documents WHERE doc_id % 7 <> 0 GROUP BY source"
        ),
        # u64 reinterpreted as signed int64 (the engine stores int64):
        # subtract 2^64 above the signed max
        "pseudonymize": (
            f"WITH h AS (SELECT event_id, "
            f"{_sql_md5_le64(chr(39) + 's1:' + chr(39) + ' || CAST(user_id AS VARCHAR)')} AS hv "
            "FROM events) "
            "SELECT event_id, CAST(CASE WHEN hv >= CAST(9223372036854775808 AS HUGEINT) "
            "THEN hv - CAST(18446744073709551616 AS HUGEINT) ELSE hv END "
            "AS BIGINT) AS user_id_pseudo FROM h"
        ),
        "customer_order_counts": (
            "SELECT c.c_custkey, c.c_mktsegment, "
            "CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders "
            "FROM customer c LEFT JOIN (SELECT o_custkey, count(*) AS n "
            "FROM orders GROUP BY o_custkey) o "
            "ON c.c_custkey = o.o_custkey"
        ),
        # a doc is emitted at its snapshot class UNLESS its text already
        # appeared in a STRICTLY earlier class (cross-doc text duplicates
        # are real at sf0.1 — 4 docs — so the bare %4 closed form is too
        # narrow; same lesson as online_neardup)
        "incremental_session": (
            "WITH d AS (SELECT doc_id, CASE WHEN doc_id % 4 = 1 THEN 0 "
            "WHEN doc_id % 4 = 2 THEN 1 ELSE 2 END AS cls, md5(text) AS h "
            "FROM documents) "
            "SELECT a.doc_id, CAST(a.cls AS BIGINT) AS first_snapshot "
            "FROM d a WHERE NOT EXISTS (SELECT 1 FROM d b "
            "WHERE b.h = a.h AND b.cls < a.cls)"
        ),
        "f2_selfjoin": (
            "WITH f AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n "
            "FROM orders GROUP BY o_custkey), "
            "z AS (SELECT j, CAST(sum(n * (CASE WHEN list_sum(list_transform(generate_series(0, 7), q -> (CAST(strpos('0123456789abcdef', substr(md5('ams' || j || ':' || CAST(o_custkey AS VARCHAR)), 2*q+1, 1)) - 1 AS HUGEINT) * 16 + CAST(strpos('0123456789abcdef', substr(md5('ams' || j || ':' || CAST(o_custkey AS VARCHAR)), 2*q+2, 1)) - 1 AS HUGEINT)) * [CAST(1 AS HUGEINT), CAST(256 AS HUGEINT), CAST(65536 AS HUGEINT), CAST(16777216 AS HUGEINT), CAST(4294967296 AS HUGEINT), CAST(1099511627776 AS HUGEINT), CAST(281474976710656 AS HUGEINT), CAST(72057594037927936 AS HUGEINT)][q + 1])) % 2 = 1 "
            "THEN 1 ELSE -1 END)) AS BIGINT) AS z FROM f, "
            "(SELECT unnest(range(0, 8)) AS j) GROUP BY j), "
            "s AS (SELECT CAST(z AS HUGEINT) * z AS zz FROM z "
            "ORDER BY zz LIMIT 4), "
            "t AS (SELECT CAST(sum(CAST(n AS HUGEINT) * n) AS BIGINT) "
            "AS true_f2 FROM f) "
            "SELECT 8 AS d, CAST(max(zz) AS BIGINT) AS est_f2, "
            "(SELECT true_f2 FROM t) AS true_f2 FROM s"
        ),
        "winsorize": (
            "WITH c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) "
            "AS v, count(*) AS n FROM lineitem GROUP BY 1, 2), "
            "w AS (SELECT l_returnflag, v, sum(n) OVER "
            "(PARTITION BY l_returnflag ORDER BY v) AS cum, "
            "sum(n) OVER (PARTITION BY l_returnflag) AS tot FROM c), "
            "lo AS (SELECT l_returnflag, min(v) AS lo FROM w "
            "WHERE cum >= ceil(0.05 * tot) GROUP BY 1), "
            "hi AS (SELECT l_returnflag, min(v) AS hi FROM w "
            "WHERE cum >= ceil(0.95 * tot) GROUP BY 1) "
            "SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, "
            "CAST(least(greatest(CAST(l.l_quantity AS BIGINT), lo.lo), "
            "hi.hi) AS BIGINT) AS clipped "
            "FROM lineitem l JOIN lo ON l.l_returnflag = lo.l_returnflag "
            "JOIN hi ON l.l_returnflag = hi.l_returnflag"
        ),
        "hits": _sql_hits(2),
        "web_curation": (
            f"WITH base AS ({_SQL_EXPECTED_PAGES}), "
            "f AS (SELECT doc_id, url, text FROM base WHERE text <> '' "
            "AND NOT coalesce(string_split(url, '/')[3] = 'heavy.example.com' "
            "OR (starts_with(string_split(url, '/')[3], 'src') AND "
            "TRY_CAST(substr(string_split(string_split(url, '/')[3], '.')[1], 4) "
            "AS INT) % 7 = 3), false)), "
            "c AS (SELECT doc_id, url, "
            "list_filter(string_split(text, chr(10)), l -> "
            "len(list_filter(string_split_regex(l, '\\s+'), x -> x <> '')) >= 5 "
            "AND NOT contains(l, '{') AND NOT ends_with(l, ':')) AS kept FROM f), "
            "k AS (SELECT doc_id, url, array_to_string(kept, chr(10)) AS ct, "
            "len(kept) AS n_lines_kept FROM c WHERE len(kept) > 0) "
            "SELECT url, n_lines_kept, length(ct) AS n_chars, CASE "
            "WHEN (doc_id * 2654435761) % 4294967296 / 4294967296.0 < 0.8 "
            "THEN 'train' "
            "WHEN (doc_id * 2654435761) % 4294967296 / 4294967296.0 < 0.9 "
            "THEN 'val' ELSE 'test' END AS split FROM k"
        ),
# keep weights (N%4+1) and budget_factor=2 in sync with _q_mix_plan
        "mix_assemble": (
            "WITH a AS (SELECT source, CAST(sum(len(list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> ''))) AS BIGINT) "
            "AS actual, CAST(substr(source, 4) AS INT) % 4 + 1 AS w "
            "FROM documents GROUP BY source), "
            "t AS (SELECT CAST(2 * sum(actual) AS BIGINT) AS budget, "
            "CAST(sum(w) AS BIGINT) AS wsum FROM a), "
            "p AS (SELECT source, actual, budget * w // wsum AS target "
            "FROM a, t), "
            "pl AS (SELECT source, CASE WHEN actual = 0 THEN 0 ELSE "
            "(target + actual - 1) // actual END AS n_epochs, "
            "CASE WHEN actual = 0 THEN 0 ELSE target * 1000000 // "
            "((target + actual - 1) // actual * actual) END AS rate_ppm "
            "FROM p) "
            "SELECT d.doc_id, d.source, CAST(e.e AS BIGINT) AS epoch "
            "FROM documents d JOIN pl ON d.source = pl.source, "
            "(SELECT unnest(range(0, 16)) AS e) e "
            "WHERE e.e < pl.n_epochs AND "
            f"list_sum(list_transform(generate_series(0, 7), q -> (CAST(strpos('0123456789abcdef', substr(md5('mix:' || d.doc_id || ':' || e.e), 2*q+1, 1)) - 1 AS HUGEINT) * 16 + CAST(strpos('0123456789abcdef', substr(md5('mix:' || d.doc_id || ':' || e.e), 2*q+2, 1)) - 1 AS HUGEINT)) * [CAST(1 AS HUGEINT), CAST(256 AS HUGEINT), CAST(65536 AS HUGEINT), CAST(16777216 AS HUGEINT), CAST(4294967296 AS HUGEINT), CAST(1099511627776 AS HUGEINT), CAST(281474976710656 AS HUGEINT), CAST(72057594037927936 AS HUGEINT)][q + 1])) % 1000000 < pl.rate_ppm"
        ),
        "mix_plan": (
            "WITH a AS (SELECT source, CAST(sum(len(list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> ''))) AS BIGINT) "
            "AS actual_tokens, CAST(substr(source, 4) AS INT) % 4 + 1 AS w "
            "FROM documents GROUP BY source), "
            "t AS (SELECT CAST(2 * sum(actual_tokens) AS BIGINT) AS budget, "
            "CAST(sum(w) AS BIGINT) AS wsum FROM a), "
            "p AS (SELECT source, actual_tokens, "
            "budget * w // wsum AS target_tokens FROM a, t) "
            "SELECT source, actual_tokens, target_tokens, "
            "CASE WHEN actual_tokens = 0 THEN 0 ELSE "
            "(target_tokens + actual_tokens - 1) // actual_tokens "
            "END AS n_epochs, "
            "CASE WHEN actual_tokens = 0 THEN 0 ELSE "
            "target_tokens * 1000000 // ("
            "(target_tokens + actual_tokens - 1) // actual_tokens "
            "* actual_tokens) END AS rate_ppm FROM p"
        ),
        # balanced ANOVA: num = 24·ΣS_h² − S², den = 24D·Σc² − S²; zero
        # cells contribute nothing so the observed histogram suffices
        "seasonality_strength": (
            "WITH hc AS (SELECT event_type, date_trunc('hour', ts) AS hr, "
            "count(*) AS c FROM events GROUP BY 1, 2), "
            "b AS (SELECT CAST(date_diff('day', "
            "date_trunc('day', min(ts)), date_trunc('day', max(ts))) + 1 "
            "AS BIGINT) AS days FROM events), "
            "agg AS (SELECT event_type, SUM(c) AS s, "
            "SUM(CAST(c AS HUGEINT) * c) AS sc2 FROM hc GROUP BY 1), "
            "shh AS (SELECT event_type, CAST(hour(hr) AS BIGINT) AS h, "
            "SUM(c) AS v FROM hc GROUP BY 1, 2), "
            "grid AS (SELECT k.event_type, g.h FROM "
            "(SELECT DISTINCT event_type FROM events) k, "
            "(SELECT unnest(range(24)) AS h) g), "
            "dns AS (SELECT grid.event_type, grid.h, "
            "coalesce(shh.v, 0) AS v FROM grid LEFT JOIN shh "
            "ON grid.event_type = shh.event_type AND grid.h = shh.h), "
            "s2 AS (SELECT event_type, SUM(CAST(v AS HUGEINT) * v) "
            "AS ssh2 FROM dns GROUP BY 1), "
            "pk AS (SELECT event_type, h, v, row_number() OVER "
            "(PARTITION BY event_type ORDER BY v DESC, h ASC) AS rmax, "
            "row_number() OVER (PARTITION BY event_type "
            "ORDER BY v ASC, h ASC) AS rmin FROM dns) "
            "SELECT a.event_type, b.days, CAST(a.s AS BIGINT) AS s_total, "
            "CAST(1000000 * (24 * s2.ssh2 - CAST(a.s AS HUGEINT) * a.s) "
            "// (24 * b.days * a.sc2 - CAST(a.s AS HUGEINT) * a.s) "
            "AS BIGINT) AS eta2_ppm, "
            "CAST(pmax.h AS BIGINT) AS peak_hour, "
            "CAST(1000000 * pmax.v // a.s AS BIGINT) AS peak_share_ppm, "
            "CAST(pmin.h AS BIGINT) AS trough_hour "
            "FROM agg a, b, s2, pk pmax, pk pmin "
            "WHERE s2.event_type = a.event_type "
            "AND pmax.event_type = a.event_type AND pmax.rmax = 1 "
            "AND pmin.event_type = a.event_type AND pmin.rmin = 1"
        ),
        # trunc-milli slopes (SQL //), doubled-unit median pick
        "theil_sen": (
            "WITH hc AS (SELECT event_type, date_trunc('hour', ts) AS hr, "
            "count(*) AS c FROM events GROUP BY 1, 2), "
            "x AS (SELECT event_type, epoch_us(hr) // 3600000000 AS x, "
            "CAST(c AS BIGINT) AS c FROM hc), "
            "p AS (SELECT a.event_type, b.c - a.c AS dy, b.x - a.x AS dx "
            "FROM x a JOIN x b ON a.event_type = b.event_type "
            "AND b.x > a.x), "
            "sl AS (SELECT event_type, CASE WHEN dy >= 0 THEN "
            "(1000 * dy) // dx ELSE -((1000 * (-dy)) // dx) END AS s "
            "FROM p), "
            "r AS (SELECT event_type, s, row_number() OVER "
            "(PARTITION BY event_type ORDER BY s) AS rn, "
            "count(*) OVER (PARTITION BY event_type) AS n FROM sl), "
            "obs AS (SELECT event_type, count(*) AS n_obs FROM x "
            "GROUP BY 1) "
            "SELECT r.event_type, CAST(obs.n_obs AS BIGINT) AS n_obs, "
            "CAST(any_value(r.n) AS BIGINT) AS n_pairs, "
            "CAST(SUM(CASE WHEN n % 2 = 1 AND rn = (n + 1) // 2 "
            "THEN 2 * s WHEN n % 2 = 0 AND rn IN (n // 2, n // 2 + 1) "
            "THEN s ELSE 0 END) AS BIGINT) AS slope_med_x2_milli "
            "FROM r JOIN obs USING (event_type) "
            "GROUP BY r.event_type, obs.n_obs"
        ),
        # gap seconds floor (positive → ≡ trunc); doubled-unit median
        "interarrival_stats": (
            "WITH g AS (SELECT event_type, (epoch_us(ts) - "
            "epoch_us(lag(ts) OVER (PARTITION BY event_type "
            "ORDER BY ts, event_id))) // 1000000 AS gap FROM events), "
            "gg AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL), "
            "r AS (SELECT event_type, gap, row_number() OVER "
            "(PARTITION BY event_type ORDER BY gap) AS rn, "
            "count(*) OVER (PARTITION BY event_type) AS n FROM gg) "
            "SELECT event_type, CAST(any_value(n) AS BIGINT) AS n_gaps, "
            "CAST(min(gap) AS BIGINT) AS min_gap_s, "
            "CAST(max(gap) AS BIGINT) AS max_gap_s, "
            "CAST(SUM(CASE WHEN n % 2 = 1 AND rn = (n + 1) // 2 "
            "THEN 2 * gap WHEN n % 2 = 0 AND rn IN (n // 2, n // 2 + 1) "
            "THEN gap ELSE 0 END) AS BIGINT) AS med_gap_x2_s "
            "FROM r GROUP BY event_type"
        ),
        # milli-floored integer score = both engines rank the identical
        # integer; argmax ties toward smallest t via row_number
        "changepoint_localize": (
            "WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr, "
            "count(*) AS c FROM events GROUP BY 1, 2), "
            "p AS (SELECT event_type, hr, c, "
            "row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i, "
            "SUM(c) OVER (PARTITION BY event_type ORDER BY hr "
            "ROWS UNBOUNDED PRECEDING) AS s1, "
            "count(*) OVER (PARTITION BY event_type) AS tt, "
            "SUM(c) OVER (PARTITION BY event_type) AS stot FROM h), "
            "sc AS (SELECT event_type, i AS t, tt, s1, stot - s1 AS s2, "
            "1000 * (CAST(s1 AS HUGEINT) * s1 * (tt - i) "
            "+ CAST(stot - s1 AS HUGEINT) * (stot - s1) * i) "
            "// (CAST(i AS HUGEINT) * (tt - i)) AS score_milli "
            "FROM p WHERE i < tt), "
            "pick AS (SELECT *, row_number() OVER (PARTITION BY event_type "
            "ORDER BY score_milli DESC, t ASC) AS rn FROM sc) "
            "SELECT pk.event_type, CAST(pk.tt AS BIGINT) AS n_obs, "
            "CAST(pk.t AS BIGINT) AS split_idx, "
            "CAST(epoch_us(p2.hr) // 1000000 AS BIGINT) AS split_hour_s, "
            "CAST(1000 * pk.s1 // pk.t AS BIGINT) AS mean_l_milli, "
            "CAST(1000 * pk.s2 // (pk.tt - pk.t) AS BIGINT) "
            "AS mean_r_milli, "
            "CAST(pk.score_milli AS BIGINT) AS score_milli "
            "FROM pick pk JOIN p p2 ON p2.event_type = pk.event_type "
            "AND p2.i = pk.t + 1 WHERE pk.rn = 1"
        ),
        # candidate = all 3 addressed bits set (HAVING count(*) = 3: op
        # emits exactly 3 rows per order; bits is distinct so each row
        # joins at most once, duplicated positions included)
        "bloom_semijoin": (
            "WITH sm AS (SELECT c_custkey, "
            "md5(CAST(c_custkey AS VARCHAR)) AS h FROM customer "
            "WHERE c_mktsegment = 'BUILDING'), "
            "bits AS (SELECT DISTINCT b FROM ("
            + " UNION ALL ".join(
                f"SELECT {_sql_hex_slice16('h', i)} % 4096 AS b FROM sm"
                for i in range(3))
            + ")), "
            "oh AS (SELECT o_orderkey, "
            "md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders), "
            "op AS ("
            + " UNION ALL ".join(
                f"SELECT o_orderkey, {_sql_hex_slice16('h', i)} % 4096 "
                "AS b FROM oh" for i in range(3))
            + "), "
            "cand AS (SELECT o_orderkey FROM op JOIN bits USING (b) "
            "GROUP BY o_orderkey HAVING count(*) = 3), "
            "tru AS (SELECT o_orderkey FROM orders WHERE o_custkey IN "
            "(SELECT c_custkey FROM sm)) "
            "SELECT CAST(nf AS BIGINT) AS n_fact, "
            "CAST(nc AS BIGINT) AS n_candidates, "
            "CAST(nt AS BIGINT) AS n_true, "
            "CAST(nc - nt AS BIGINT) AS n_fp, "
            "CAST(CASE WHEN nf - nt > 0 THEN "
            "(nc - nt) * 1000000 // (nf - nt) ELSE 0 END AS BIGINT) "
            "AS fp_ppm FROM "
            "(SELECT (SELECT count(*) FROM orders) AS nf, "
            "(SELECT count(*) FROM cand) AS nc, "
            "(SELECT count(*) FROM tru) AS nt)"
        ),
        # a distinct n-gram is novel exactly where its min(doc_id) lands
        "ngram_novelty": (
            "WITH sh AS (SELECT doc_id, "
            "list_distinct(list_transform(generate_series(1, "
            "len(toks) - 2), i -> toks[i] || ' ' || toks[i+1] || ' ' || "
            "toks[i+2])) AS sh FROM (SELECT doc_id, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') "
            "AS toks FROM documents)), "
            "g AS (SELECT doc_id, unnest(sh) AS ngram FROM sh), "
            "mn AS (SELECT ngram, min(doc_id) AS mid FROM g GROUP BY 1), "
            "nv AS (SELECT mid AS doc_id, count(*) AS n_novel FROM mn "
            "GROUP BY 1) "
            "SELECT s.doc_id, CAST(len(s.sh) AS BIGINT) AS n_ngrams, "
            "CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel, "
            "CAST(coalesce(nv.n_novel, 0) * 1000000 "
            "// greatest(len(s.sh), 1) AS BIGINT) AS novelty_ppm "
            "FROM sh s LEFT JOIN nv USING (doc_id)"
        ),
        # strict half-open hour window [c.ts − 1h, c.ts); floor-divided
        # credit per conversion, summed per touch type
        "attribution_credit": (
            "WITH conv AS (SELECT event_id AS cid, user_id, ts "
            "FROM events WHERE event_type = 'purchase'), "
            "tch AS (SELECT c.cid, e.event_type FROM events e "
            "JOIN conv c ON e.user_id = c.user_id "
            "AND e.event_type <> 'purchase' "
            "AND e.ts >= c.ts - INTERVAL 1 HOUR AND e.ts < c.ts), "
            "k AS (SELECT cid, count(*) AS kk FROM tch GROUP BY 1) "
            "SELECT t.event_type, CAST(count(*) AS BIGINT) AS n_touches, "
            "CAST(SUM(1000000 // k.kk) AS BIGINT) AS credit_ppm "
            "FROM tch t JOIN k USING (cid) GROUP BY 1"
        ),
        # g3 = n − Σ_lhs max_rhs count: minimum deletions for lhs→rhs
        "fd_error": " UNION ALL ".join(
            f"SELECT '{name}' AS fd, n, n_keep, n - n_keep AS g3_err, "
            "(n - n_keep) * 1000000 // n AS g3_ppm FROM "
            f"(SELECT (SELECT count(*) FROM {tbl}) AS n, "
            "(SELECT CAST(SUM(mx) AS BIGINT) FROM "
            f"(SELECT MAX(c) AS mx FROM (SELECT {lhs}, {rhs}, "
            f"count(*) AS c FROM {tbl} GROUP BY 1, 2) GROUP BY {lhs})) "
            "AS n_keep)"
            for name, tbl, lhs, rhs in [
                ("orders_cust_to_priority", "orders",
                 "o_custkey", "o_orderpriority"),
                ("lineitem_part_to_flag", "lineitem",
                 "l_partkey", "l_returnflag"),
                ("events_user_to_type", "events",
                 "user_id", "event_type")]),
        # anti-join of unnested tokens vs the slice vocab
        "oov_rate": (
            "WITH ref AS (SELECT DISTINCT unnest(string_split(text, ' ')) "
            "AS tok FROM documents WHERE doc_id % 10 = 0), "
            "tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "FROM documents), "
            "j AS (SELECT tk.doc_id, CASE WHEN r.tok IS NULL THEN 1 "
            "ELSE 0 END AS o FROM tk LEFT JOIN ref r USING (tok)) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(SUM(o) AS BIGINT) AS n_oov, "
            "CAST(SUM(o) * 1000000 // count(*) AS BIGINT) AS oov_ppm "
            "FROM j GROUP BY 1"
        ),
        # joint-histogram self-join: every O(n²) row-pair comparison is
        # determined by its (x, y) cells, so C/D are Σ c_i·c_j over ≤550
        # cell pairs per group (HUGEINT — counts² exceed 2⁶³ past sf10)
        "kendall_tau": (
            "WITH j AS (SELECT l_returnflag, "
            "CAST(l_quantity AS BIGINT) AS x, "
            "CAST(round(l_discount * 100) AS BIGINT) AS y, "
            "CAST(count(*) AS HUGEINT) AS c "
            "FROM lineitem GROUP BY 1, 2, 3), "
            "cd AS (SELECT a.l_returnflag AS g, "
            "coalesce(SUM(CASE WHEN a.x < b.x AND a.y < b.y "
            "THEN a.c * b.c END), 0) AS conc, "
            "coalesce(SUM(CASE WHEN a.x < b.x AND a.y > b.y "
            "THEN a.c * b.c END), 0) AS disc "
            "FROM j a JOIN j b ON a.l_returnflag = b.l_returnflag "
            "GROUP BY 1), "
            "mx AS (SELECT l_returnflag AS g, x, SUM(c) AS cx FROM j "
            "GROUP BY 1, 2), "
            "tx AS (SELECT g, SUM(cx * (cx - 1) // 2) AS tied_x FROM mx "
            "GROUP BY 1), "
            "my AS (SELECT l_returnflag AS g, y, SUM(c) AS cy FROM j "
            "GROUP BY 1, 2), "
            "ty AS (SELECT g, SUM(cy * (cy - 1) // 2) AS tied_y FROM my "
            "GROUP BY 1), "
            "nz AS (SELECT l_returnflag AS g, SUM(c) AS n, "
            "SUM(c * (c - 1) // 2) AS tied_xy FROM j GROUP BY 1) "
            "SELECT nz.g AS l_returnflag, CAST(nz.n AS BIGINT) AS n, "
            "CAST(cd.conc AS BIGINT) AS concordant, "
            "CAST(cd.disc AS BIGINT) AS discordant, "
            "CAST(tx.tied_x AS BIGINT) AS tied_x, "
            "CAST(ty.tied_y AS BIGINT) AS tied_y, "
            "CAST(nz.tied_xy AS BIGINT) AS tied_xy, "
            "CAST((cd.conc - cd.disc) * 1000000 "
            "// (nz.n * (nz.n - 1) // 2) AS BIGINT) AS tau_a_ppm "
            "FROM nz JOIN cd ON nz.g = cd.g JOIN tx ON nz.g = tx.g "
            "JOIN ty ON nz.g = ty.g"
        ),
        # boundary sweep: −1 sorts before +1 at equal t (half-open
        # intervals — touching never overlap); equal (t, d) runs are
        # permutation-invariant for the running MAX, so the ROWS frame
        # is deterministic where it matters
        "max_concurrency": (
            "WITH iv AS (SELECT user_id, "
            "epoch_us(ts) // 1000000 AS s, "
            "epoch_us(ts) // 1000000 + CAST(floor(value) AS BIGINT) AS e "
            "FROM events), "
            "b AS (SELECT user_id, s AS t, 1 AS d FROM iv "
            "UNION ALL SELECT user_id, e AS t, -1 AS d FROM iv), "
            "r AS (SELECT user_id, SUM(d) OVER (PARTITION BY user_id "
            "ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS run FROM b), "
            "pk AS (SELECT user_id, MAX(run) AS peak FROM r GROUP BY 1), "
            "nn AS (SELECT user_id, count(*) AS n_intervals FROM iv "
            "GROUP BY 1) "
            "SELECT nn.user_id, CAST(nn.n_intervals AS BIGINT) "
            "AS n_intervals, CAST(pk.peak AS BIGINT) AS peak "
            "FROM nn JOIN pk USING (user_id)"
        ),
        # one md5 per DISTINCT token; cells fold occurrence counts through
        # the 4 disjoint 16-bit hex slices % 256; estimate = min over rows
        "countmin_estimate": (
            "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t "
            "FROM documents), "
            "ex AS (SELECT t, count(*) AS n FROM tok GROUP BY t), "
            "hx AS (SELECT t, n, md5(t) AS h FROM ex), "
            "cells AS ("
            + " UNION ALL ".join(
                f"SELECT {i} AS i, {_sql_hex_slice16('h', i)} % 256 AS col, "
                "SUM(n) AS c FROM hx GROUP BY 2" for i in range(4))
            + "), "
            "top AS (SELECT t, n, md5(t) AS h FROM ex "
            "ORDER BY n DESC, t LIMIT 20), "
            "pr AS ("
            + " UNION ALL ".join(
                f"SELECT t, n, {i} AS i, "
                f"{_sql_hex_slice16('h', i)} % 256 AS col FROM top"
                for i in range(4))
            + ") "
            "SELECT pr.t AS token, CAST(pr.n AS BIGINT) AS n_true, "
            "CAST(MIN(cells.c) AS BIGINT) AS cms_est, "
            "CAST(MIN(cells.c) - pr.n AS BIGINT) AS over_est "
            "FROM pr JOIN cells ON pr.i = cells.i AND pr.col = cells.col "
            "GROUP BY pr.t, pr.n"
        ),
        # dense global hour grid (zeros counted); y = n·x − S clears the
        # mean; trunc-toward-zero ppm via sign split (DuckDB // truncates)
        "acf_lag": (
            "WITH span AS (SELECT date_trunc('hour', min(ts)) AS h0, "
            "date_trunc('hour', max(ts)) AS h1 FROM events), "
            "hc AS (SELECT event_type, date_trunc('hour', ts) AS hr, "
            "count(*) AS c FROM events GROUP BY 1, 2), "
            "grid AS (SELECT k.event_type, g.hr FROM "
            "(SELECT DISTINCT event_type FROM events) k, "
            "(SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) "
            "AS hr FROM span) g), "
            "d AS (SELECT grid.event_type, grid.hr, "
            "coalesce(hc.c, 0) AS c FROM grid LEFT JOIN hc "
            "ON grid.event_type = hc.event_type AND grid.hr = hc.hr), "
            "st AS (SELECT event_type, count(*) AS n, SUM(c) AS s "
            "FROM d GROUP BY 1), "
            "y AS (SELECT d.event_type, d.hr, "
            "CAST(st.n AS HUGEINT) * d.c - st.s AS y, st.n FROM d "
            "JOIN st USING (event_type)), "
            "l AS (SELECT event_type, n, y, "
            "lag(y, 1) OVER (PARTITION BY event_type ORDER BY hr) AS y1, "
            "lag(y, 24) OVER (PARTITION BY event_type ORDER BY hr) AS y24 "
            "FROM y), "
            "agg AS (SELECT event_type, any_value(n) AS n, "
            "SUM(y * y) AS den, SUM(y * y1) AS n1, SUM(y * y24) AS n24 "
            "FROM l GROUP BY 1) "
            "SELECT event_type, CAST(n AS BIGINT) AS n_obs, "
            "CAST(CASE WHEN n1 >= 0 THEN 1000000 * n1 // den "
            "ELSE -((1000000 * (-n1)) // den) END AS BIGINT) AS acf1_ppm, "
            "CAST(CASE WHEN n24 >= 0 THEN 1000000 * n24 // den "
            "ELSE -((1000000 * (-n24)) // den) END AS BIGINT) AS acf24_ppm "
            "FROM agg"
        ),
        # dense grid + doubled-median pick; ties at the median DROP
        # (classic runs-test convention); R = 1 + sign changes
        "runs_test": (
            "WITH span AS (SELECT date_trunc('hour', min(ts)) AS h0, "
            "date_trunc('hour', max(ts)) AS h1 FROM events), "
            "hc AS (SELECT event_type, date_trunc('hour', ts) AS hr, "
            "count(*) AS c FROM events GROUP BY 1, 2), "
            "grid AS (SELECT k.event_type, g.hr FROM "
            "(SELECT DISTINCT event_type FROM events) k, "
            "(SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) "
            "AS hr FROM span) g), "
            "d AS (SELECT grid.event_type, grid.hr, "
            "coalesce(hc.c, 0) AS c FROM grid LEFT JOIN hc "
            "ON grid.event_type = hc.event_type AND grid.hr = hc.hr), "
            "r AS (SELECT event_type, c, row_number() OVER "
            "(PARTITION BY event_type ORDER BY c) AS rn, "
            "count(*) OVER (PARTITION BY event_type) AS n FROM d), "
            "med AS (SELECT event_type, CAST(any_value(n) AS BIGINT) "
            "AS n_obs, CAST(SUM(CASE WHEN n % 2 = 1 AND rn = (n + 1) // 2 "
            "THEN 2 * c WHEN n % 2 = 0 AND rn IN (n // 2, n // 2 + 1) "
            "THEN c ELSE 0 END) AS BIGINT) AS med2 FROM r GROUP BY 1), "
            "k AS (SELECT d.event_type, d.hr, "
            "CASE WHEN 2 * d.c > m.med2 THEN 1 ELSE 0 END AS s "
            "FROM d JOIN med m USING (event_type) "
            "WHERE 2 * d.c <> m.med2), "
            "ch AS (SELECT event_type, s, lag(s) OVER "
            "(PARTITION BY event_type ORDER BY hr) AS ps FROM k), "
            "agg AS (SELECT event_type, count(*) AS nk, SUM(s) AS n1, "
            "1 + SUM(CASE WHEN ps IS NOT NULL AND s <> ps THEN 1 "
            "ELSE 0 END) AS runs FROM ch GROUP BY 1) "
            "SELECT m.event_type, m.n_obs, m.med2 AS med_x2, "
            "CAST(a.n1 AS BIGINT) AS n_above, "
            "CAST(a.nk - a.n1 AS BIGINT) AS n_below, "
            "CAST(a.runs AS BIGINT) AS n_runs, "
            "CAST(1000000 + 2000000 * a.n1 * (a.nk - a.n1) // a.nk "
            "AS BIGINT) AS exp_runs_ppm, "
            "CAST(CASE WHEN a.runs * a.nk < a.nk + "
            "2 * a.n1 * (a.nk - a.n1) THEN 1 ELSE 0 END AS BIGINT) "
            "AS clustered "
            "FROM med m JOIN agg a USING (event_type)"
        ),
        # a-priori is a pure optimization: the 3-way distinct-pair
        # self-join IS the semantics (item prune changes nothing)
        "frequent_triples": (
            "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem) "
            "SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, "
            "c.l_partkey AS item_c, count(*) AS n FROM d a "
            "JOIN d b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey "
            "JOIN d c ON b.l_orderkey = c.l_orderkey "
            "AND b.l_partkey < c.l_partkey "
            "GROUP BY 1, 2, 3 HAVING count(*) >= 2"
        ),
        "haar_energy": _SQL_HAAR,
        "ewma_backtest": _SQL_EWMA,
        # keep-in-sync: mirrors sources/pages.py anchor templates (same
        # closed form as anchor_text, digit runs collapsed to {n})
        "url_templates": (
            "WITH d AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 "
            "THEN 'heavy.example.com' ELSE source || '.example.com' END "
            "AS host FROM documents WHERE doc_id % 97 <> 0), "
            "base AS (SELECT host, count(*) AS n FROM d GROUP BY host), "
            "ar AS (SELECT host, count(*) AS n FROM d "
            "WHERE doc_id % 5 IN (0, 3) GROUP BY host), "
            "farm AS (SELECT host, count(*) AS n FROM d "
            "WHERE doc_id % 5 = 1 GROUP BY host), "
            "fixed(t) AS (VALUES ('/'), ('/about'), ('/contact'), "
            "('/privacy'), ('/terms'), ('/subscribe')) "
            "SELECT b.host, f.t AS template, CAST(b.n AS BIGINT) "
            "AS n_links FROM base b, fixed f "
            "UNION ALL SELECT a.host, '/rel/{n}', CAST(2 * a.n AS BIGINT) "
            "FROM ar a "
            "UNION ALL SELECT fm.host, '/cat/{n}/{n}', "
            "CAST(12 * fm.n AS BIGINT) FROM farm fm"
        ),
        # strict-after first purchase; lag floors whole seconds (≥ 0)
        "conversion_lag": (
            "WITH s AS (SELECT user_id, min(ts) AS ts0 FROM events "
            "WHERE event_type = 'signup' GROUP BY 1), "
            "p AS (SELECT e.user_id, min(e.ts) AS ts1 FROM events e "
            "JOIN s ON e.user_id = s.user_id AND e.ts > s.ts0 "
            "WHERE e.event_type = 'purchase' GROUP BY 1) "
            "SELECT s.user_id, CAST((epoch_us(p.ts1) - epoch_us(s.ts0)) "
            "// 1000000 AS BIGINT) AS lag_s FROM s JOIN p USING (user_id)"
        ),
        # q < 0.2·avg ⟺ 5·q·n < Σq — no float average anywhere
        "q17_decorrelated": (
            "WITH f AS (SELECT l_partkey, "
            "CAST(round(l_quantity) AS BIGINT) AS qty, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c "
            "FROM lineitem), "
            "a AS (SELECT l_partkey, SUM(qty) AS sq, count(*) AS n "
            "FROM f GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_small, "
            "CAST(SUM(f.price_c) AS BIGINT) AS revenue_cents "
            "FROM f JOIN a ON f.l_partkey = a.l_partkey "
            "WHERE 5 * f.qty * a.n < a.sq"
        ),
        "relational_division": (
            "SELECT o_custkey FROM orders GROUP BY 1 "
            "HAVING count(DISTINCT o_orderpriority) = "
            "(SELECT count(DISTINCT o_orderpriority) FROM orders)"
        ),
        # TVD over the observed histogram; absent values contribute
        # g_v·m via the dense 2-value grid (bool sensitive)
        "t_closeness": (
            "WITH b AS (SELECT c_nationkey, c_mktsegment, "
            "(c_acctbal < 0) AS bal_neg FROM customer), "
            "g AS (SELECT bal_neg, count(*) AS gv FROM b GROUP BY 1), "
            "nn AS (SELECT count(*) AS n FROM b), "
            "cs AS (SELECT c_nationkey, c_mktsegment, bal_neg, "
            "count(*) AS cv FROM b GROUP BY 1, 2, 3), "
            "m AS (SELECT c_nationkey, c_mktsegment, SUM(cv) AS m "
            "FROM cs GROUP BY 1, 2), "
            "grid AS (SELECT m.c_nationkey, m.c_mktsegment, g.bal_neg, "
            "g.gv, m.m FROM m, g), "
            "d AS (SELECT grid.c_nationkey, grid.c_mktsegment, "
            "grid.bal_neg, grid.gv, grid.m, coalesce(cs.cv, 0) AS cv "
            "FROM grid LEFT JOIN cs ON grid.c_nationkey = cs.c_nationkey "
            "AND grid.c_mktsegment = cs.c_mktsegment "
            "AND grid.bal_neg = cs.bal_neg), "
            "tv AS (SELECT c_nationkey, c_mktsegment, any_value(m) AS m, "
            "SUM(abs(CAST(cv AS HUGEINT) * nn.n "
            "- CAST(gv AS HUGEINT) * m)) AS s, any_value(nn.n) AS n "
            "FROM d, nn GROUP BY 1, 2) "
            "SELECT c_nationkey, c_mktsegment, CAST(m AS BIGINT) "
            "AS class_size, CAST(1000000 * s // (2 * m * n) AS BIGINT) "
            "AS tvd_ppm, (1000000 * s // (2 * m * n)) <= 100000 "
            "AS t_close FROM tv"
        ),
        # min(CASE) per order = the for-all flag; no-lineitem orders
        # drop on the inner join (both engines)
        "orders_all_ontime": (
            "WITH j AS (SELECT o_orderkey, "
            "any_value(o_orderpriority) AS o_orderpriority, "
            "min(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY "
            "THEN 1 ELSE 0 END) AS ontime FROM orders "
            "JOIN lineitem ON l_orderkey = o_orderkey GROUP BY 1) "
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) "
            "AS n_orders, CAST(SUM(ontime) AS BIGINT) AS n_all_ontime, "
            "CAST(1000000 * SUM(ontime) // count(*) AS BIGINT) "
            "AS ontime_ppm FROM j GROUP BY 1"
        ),
        # cents are integers → the affine scale is exact ppm
        "minmax_scale": (
            "WITH c AS (SELECT event_id, event_type, "
            "CAST(round(value * 100) AS BIGINT) AS vc FROM events), "
            "mm AS (SELECT event_type, min(vc) AS lo, max(vc) AS hi "
            "FROM c GROUP BY 1) "
            "SELECT c.event_id, c.event_type, "
            "CAST(1000000 * (c.vc - mm.lo) // (mm.hi - mm.lo) AS BIGINT) "
            "AS scaled_ppm FROM c JOIN mm USING (event_type)"
        ),
        "markov_kstep": _SQL_MARKOV,
        # BM25 with every fraction cleared: saturation 22·tf·L /
        # (10·tf·L + 3·L + 9·dl·N), rational idf 10⁶·(N−df+1)//(df+1)
        "bm25_topk": (
            "WITH " + _SQL_BM25_CORE + " "
            "SELECT query_id, CAST(rnk AS BIGINT) AS \"rank\", doc_id, "
            "CAST(score AS BIGINT) AS score_ppm FROM r WHERE rnk <= 5"
        ),
        # AND-relevance: matched-distinct-term count per (q, doc)
        # equals |q|; first relevant rank → 10⁶ // rank
        "mrr_eval": (
            "WITH " + _SQL_BM25_CORE + ", "
            "qn AS (SELECT query_id, count(*) AS nt FROM qt GROUP BY 1), "
            "tm AS (SELECT qt.query_id, tf.doc_id, count(*) AS nmatch "
            "FROM qt JOIN tf ON tf.t = qt.t GROUP BY 1, 2), "
            "rel AS (SELECT r.query_id, r.rnk FROM r "
            "JOIN tm ON tm.query_id = r.query_id "
            "AND tm.doc_id = r.doc_id "
            "JOIN qn ON qn.query_id = r.query_id "
            "WHERE r.rnk <= 5 AND tm.nmatch = qn.nt) "
            "SELECT q.query_id, "
            "CAST(count(rel.rnk) AS BIGINT) AS n_rel, "
            "CAST(coalesce(min(rel.rnk), 0) AS BIGINT) AS first_rank, "
            "CAST(CASE WHEN min(rel.rnk) IS NULL THEN 0 "
            "ELSE 1000000 // min(rel.rnk) END AS BIGINT) AS rr_ppm "
            "FROM (SELECT DISTINCT query_id FROM qt) q "
            "LEFT JOIN rel ON rel.query_id = q.query_id GROUP BY 1"
        ),
        "km_survival": _SQL_KM,
        # dyadic halving weights: 1 << age is exact where e^{-λt} isn't
        "decayed_leaderboard": (
            "WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events), "
            "w AS (SELECT user_id, 1000000 // (1 << least("
            "(mx.m - epoch_us(ts)) // 86400000000, 30)) AS w "
            "FROM events, mx), "
            "s AS (SELECT user_id, SUM(w) AS score_ppm FROM w "
            "GROUP BY 1), "
            "r AS (SELECT user_id, score_ppm, row_number() OVER "
            "(ORDER BY score_ppm DESC, user_id) AS rnk FROM s) "
            "SELECT CAST(rnk AS BIGINT) AS \"rank\", user_id, "
            "CAST(score_ppm AS BIGINT) AS score_ppm FROM r "
            "WHERE rnk <= 10"
        ),
        # Kendall over edge-endpoint in-degrees: histogram self-join,
        # single group; // truncates toward zero = the engine rule
        "degree_assortativity": (
            "WITH nn AS (SELECT count(*) AS n FROM documents), "
            "e AS (SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst "
            "FROM documents, nn "
            "UNION ALL SELECT doc_id, (doc_id * 13 + 2) % nn.n "
            "FROM documents, nn WHERE doc_id % 3 >= 1 "
            "UNION ALL SELECT doc_id, (doc_id * 31 + 3) % nn.n "
            "FROM documents, nn WHERE doc_id % 3 = 2), "
            "ind AS (SELECT dst AS node, count(*) AS deg FROM e "
            "GROUP BY 1), "
            "p AS (SELECT coalesce(i1.deg, 0) AS x, "
            "coalesce(i2.deg, 0) AS y FROM e "
            "LEFT JOIN ind i1 ON i1.node = e.src "
            "LEFT JOIN ind i2 ON i2.node = e.dst), "
            "j AS (SELECT x, y, CAST(count(*) AS HUGEINT) AS c FROM p "
            "GROUP BY 1, 2), "
            "cd AS (SELECT coalesce(SUM(CASE WHEN a.x < b.x AND "
            "a.y < b.y THEN a.c * b.c END), 0) AS conc, "
            "coalesce(SUM(CASE WHEN a.x < b.x AND a.y > b.y "
            "THEN a.c * b.c END), 0) AS disc FROM j a, j b), "
            "mx2 AS (SELECT x, SUM(c) AS cx FROM j GROUP BY 1), "
            "tx AS (SELECT SUM(cx * (cx - 1) // 2) AS tied_x FROM mx2), "
            "my2 AS (SELECT y, SUM(c) AS cy FROM j GROUP BY 1), "
            "ty AS (SELECT SUM(cy * (cy - 1) // 2) AS tied_y FROM my2), "
            "nz AS (SELECT SUM(c) AS n, SUM(c * (c - 1) // 2) "
            "AS tied_xy FROM j) "
            "SELECT 'all' AS g, CAST(nz.n AS BIGINT) AS n, "
            "CAST(cd.conc AS BIGINT) AS concordant, "
            "CAST(cd.disc AS BIGINT) AS discordant, "
            "CAST(tx.tied_x AS BIGINT) AS tied_x, "
            "CAST(ty.tied_y AS BIGINT) AS tied_y, "
            "CAST(nz.tied_xy AS BIGINT) AS tied_xy, "
            "CAST((cd.conc - cd.disc) * 1000000 "
            "// (nz.n * (nz.n - 1) // 2) AS BIGINT) AS tau_a_ppm "
            "FROM nz, cd, tx, ty"
        ),
        # hod-conditioned 3σ: same cross-multiplied inequality as
        # events_anomaly, peer group = same hour-of-day on the grid
        "seasonal_anomaly": (
            "WITH " + _SQL_DENSE_GRID + ", "
            "hd AS (SELECT event_type, hr, c, "
            "extract(hour FROM hr) AS hod FROM dd), "
            "st AS (SELECT event_type, hod, count(*) AS m, "
            "SUM(c) AS s, SUM(CAST(c AS HUGEINT) * c) AS q "
            "FROM hd GROUP BY 1, 2) "
            "SELECT hd.event_type, hd.hr, CAST(hd.c AS BIGINT) AS c "
            "FROM hd JOIN st ON hd.event_type = st.event_type "
            "AND hd.hod = st.hod "
            "WHERE (st.m * CAST(hd.c AS HUGEINT) - st.s) "
            "* (st.m * CAST(hd.c AS HUGEINT) - st.s) "
            "> 9 * (st.m * st.q - CAST(st.s AS HUGEINT) * st.s)"
        ),
        # trunc milli-cent cell means (one floor per cell); Knuth-hash
        # treatment coin, integer-midpoint period split
        "did_estimator": (
            "WITH p AS (SELECT "
            "(user_id * 2654435761) % 4294967296 < 2147483648 AS treat, "
            "epoch_us(ts) AS t, "
            "CAST(round(value * 100) AS BIGINT) AS c FROM events "
            "WHERE event_type = 'purchase'), "
            "md AS (SELECT (min(t) + max(t)) // 2 AS mid FROM p), "
            "g AS (SELECT treat, t >= md.mid AS post, SUM(c) AS s, "
            "count(*) AS n FROM p, md GROUP BY 1, 2), "
            "m AS (SELECT treat, post, n, 1000 * s // n AS mm FROM g) "
            "SELECT "
            "CAST(max(CASE WHEN NOT treat AND NOT post THEN n END) "
            "AS BIGINT) AS n_ctrl_pre, "
            "CAST(max(CASE WHEN NOT treat AND post THEN n END) "
            "AS BIGINT) AS n_ctrl_post, "
            "CAST(max(CASE WHEN treat AND NOT post THEN n END) "
            "AS BIGINT) AS n_treat_pre, "
            "CAST(max(CASE WHEN treat AND post THEN n END) "
            "AS BIGINT) AS n_treat_post, "
            "CAST(max(CASE WHEN NOT treat AND NOT post THEN mm END) "
            "AS BIGINT) AS m_ctrl_pre_mc, "
            "CAST(max(CASE WHEN NOT treat AND post THEN mm END) "
            "AS BIGINT) AS m_ctrl_post_mc, "
            "CAST(max(CASE WHEN treat AND NOT post THEN mm END) "
            "AS BIGINT) AS m_treat_pre_mc, "
            "CAST(max(CASE WHEN treat AND post THEN mm END) "
            "AS BIGINT) AS m_treat_post_mc, "
            "CAST((max(CASE WHEN treat AND post THEN mm END) "
            "- max(CASE WHEN treat AND NOT post THEN mm END)) "
            "- (max(CASE WHEN NOT treat AND post THEN mm END) "
            "- max(CASE WHEN NOT treat AND NOT post THEN mm END)) "
            "AS BIGINT) AS did_mc FROM m"
        ),
        # cross-multiplied χ² significance: no float ever decides;
        # χ²₍₀.₀₅,1₎ = 3.841459 as the exact rational constant
        "ab_conversion": (
            "WITH u AS (SELECT user_id, max(CASE WHEN event_type = "
            "'purchase' AND value >= 150 THEN 1 ELSE 0 END) AS conv "
            "FROM events GROUP BY 1), "
            "t AS (SELECT (user_id * 2654435761) % 4294967296 "
            "< 2147483648 AS treat, conv FROM u), "
            "cells AS (SELECT "
            "count(*) FILTER (WHERE treat AND conv = 1) AS a, "
            "count(*) FILTER (WHERE treat AND conv = 0) AS b, "
            "count(*) FILTER (WHERE NOT treat AND conv = 1) AS c, "
            "count(*) FILTER (WHERE NOT treat AND conv = 0) AS d "
            "FROM t), "
            "x AS (SELECT a, b, c, d, a + b AS n1, c + d AS n0, "
            "CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS det, "
            "CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d) "
            "AS den FROM cells) "
            "SELECT CAST(n1 AS BIGINT) AS n_treat, "
            "CAST(n0 AS BIGINT) AS n_ctrl, "
            "CAST(a AS BIGINT) AS conv_treat, "
            "CAST(c AS BIGINT) AS conv_ctrl, "
            "CAST(1000000 * a // n1 AS BIGINT) AS rate_treat_ppm, "
            "CAST(1000000 * c // n0 AS BIGINT) AS rate_ctrl_ppm, "
            "CAST(1000000 * a // n1 - 1000000 * c // n0 AS BIGINT) "
            "AS uplift_ppm, "
            "CAST(CASE WHEN den = 0 THEN 0 ELSE "
            "1000 * (n1 + n0) * det * det // den END AS BIGINT) "
            "AS chi2_milli, "
            "CASE WHEN den = 0 THEN FALSE ELSE "
            "1000000 * (n1 + n0) * det * det > 3841459 * den END "
            "AS significant FROM x"
        ),
        # directional rules: conf(a→b) ≠ conf(b→a) exactly when
        # popularities differ; lift vs the consequent's base rate
        "assoc_rules": (
            "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "p AS (SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, "
            "count(*) AS n FROM d a JOIN d b "
            "ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey GROUP BY 1, 2 "
            "HAVING count(*) >= 2), "
            "s AS (SELECT l_partkey, count(*) AS supp FROM d "
            "GROUP BY 1), "
            "bb AS (SELECT count(DISTINCT l_orderkey) AS nb FROM d), "
            "r AS (SELECT item_a AS antecedent, item_b AS consequent, "
            "n FROM p UNION ALL SELECT item_b, item_a, n FROM p) "
            "SELECT r.antecedent, r.consequent, "
            "CAST(r.n AS BIGINT) AS supp_ab, "
            "CAST(sa.supp AS BIGINT) AS supp_a, "
            "CAST(1000000 * r.n // sa.supp AS BIGINT) AS conf_ppm, "
            "CAST(1000000 * CAST(r.n AS HUGEINT) * bb.nb "
            "// (CAST(sa.supp AS HUGEINT) * sb.supp) AS BIGINT) "
            "AS lift_ppm "
            "FROM r JOIN s sa ON sa.l_partkey = r.antecedent "
            "JOIN s sb ON sb.l_partkey = r.consequent, bb"
        ),
        # dyadic RBO: one floor per depth; identical lists score
        # 999980 (the truncation residue), never 10⁶
        "rank_overlap": (
            "WITH tok AS (SELECT (doc_id * 2654435761) % 4294967296 "
            "< 2147483648 AS h, unnest(string_split(text, ' ')) "
            "AS token FROM documents), "
            "c AS (SELECT h, token, count(*) AS n FROM tok "
            "GROUP BY 1, 2), "
            "ra AS (SELECT token, row_number() OVER "
            "(ORDER BY n DESC, token) AS r FROM c WHERE h), "
            "rb AS (SELECT token, row_number() OVER "
            "(ORDER BY n DESC, token) AS r FROM c WHERE NOT h), "
            "ta AS (SELECT token, r FROM ra WHERE r <= 20), "
            "tb AS (SELECT token, r FROM rb WHERE r <= 20), "
            "j AS (SELECT ta.r AS raa, tb.r AS rbb FROM ta "
            "JOIN tb USING (token)), "
            "dd AS (SELECT unnest(generate_series(1, 20)) AS d), "
            "ov AS (SELECT d, count(*) FILTER (WHERE raa <= d "
            "AND rbb <= d) AS o FROM dd LEFT JOIN j ON TRUE "
            "GROUP BY 1), "
            "rbo AS (SELECT SUM(1000000 * o // (d * (1 << d))) AS rbo "
            "FROM ov), "
            "inter AS (SELECT count(*) AS i FROM j), "
            "uni AS (SELECT count(DISTINCT token) AS u FROM "
            "(SELECT token FROM ta UNION ALL SELECT token FROM tb)), "
            "o5 AS (SELECT count(*) AS o FROM j "
            "WHERE raa <= 5 AND rbb <= 5) "
            "SELECT CAST(20 AS BIGINT) AS k, "
            "CAST(o5.o AS BIGINT) AS overlap_at_5, "
            "CAST(inter.i AS BIGINT) AS overlap_at_20, "
            "CAST(1000000 * inter.i // uni.u AS BIGINT) "
            "AS jaccard20_ppm, CAST(rbo.rbo AS BIGINT) AS rbo_ppm "
            "FROM rbo, inter, uni, o5"
        ),
        # generated UNION of distinct-count probes; violations =
        # |distinct(A,B)| − |distinct(A)|
        "fd_mine": " UNION ALL ".join(
            f"SELECT '{a}' AS lhs, '{b}' AS rhs, "
            f"CAST((SELECT count(*) FROM (SELECT DISTINCT {a} "
            f"FROM orders)) AS BIGINT) AS n_lhs, "
            f"CAST((SELECT count(*) FROM (SELECT DISTINCT {a}, {b} "
            f"FROM orders)) AS BIGINT) AS n_pairs, "
            f"CAST((SELECT count(*) FROM (SELECT DISTINCT {a}, {b} "
            f"FROM orders)) - (SELECT count(*) FROM (SELECT DISTINCT "
            f"{a} FROM orders)) AS BIGINT) AS violations, "
            f"(SELECT count(*) FROM (SELECT DISTINCT {a}, {b} "
            f"FROM orders)) = (SELECT count(*) FROM (SELECT DISTINCT "
            f"{a} FROM orders)) AS holds"
            for a, b in _FD_CANDIDATES),
        # lag-window session ids + deterministic first_value landing
        "bounce_rate": (
            "WITH o AS (SELECT user_id, ts, event_type, event_id, "
            "CASE WHEN lag(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) IS NULL OR ts - lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) "
            "> INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS st FROM events), "
            "s AS (SELECT user_id, event_type, ts, event_id, "
            "SUM(st) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
            "fv AS (SELECT user_id, sid, first_value(event_type) OVER "
            "(PARTITION BY user_id, sid ORDER BY ts, event_id) AS ft "
            "FROM s), "
            "per AS (SELECT user_id, sid, any_value(ft) AS landing, "
            "count(*) AS n FROM fv GROUP BY 1, 2), "
            "g AS (SELECT landing AS landing_type, count(*) "
            "AS n_sessions, count(*) FILTER (WHERE n = 1) AS n_bounced "
            "FROM per GROUP BY 1) "
            "SELECT landing_type, CAST(n_sessions AS BIGINT) "
            "AS n_sessions, CAST(n_bounced AS BIGINT) AS n_bounced, "
            "CAST(1000000 * n_bounced // n_sessions AS BIGINT) "
            "AS bounce_ppm FROM g"
        ),
        # plain sum over days: per-day trunc-ppm hypergeometric terms,
        # exact O₁, cross-multiplied χ² — no sequential fold
        "logrank_test": (
            "WITH u AS (SELECT user_id, min(epoch_us(ts)) AS f, "
            "max(epoch_us(ts)) AS l FROM events GROUP BY 1), "
            "mx AS (SELECT max(epoch_us(ts)) AS m FROM events), "
            "lt AS (SELECT (l - f) // 86400000000 AS ld, "
            "((mx.m - l) >= 21600000000 AND "
            "(l - f) // 86400000000 < 30) AS obs, "
            "(user_id * 2654435761) % 4294967296 < 2147483648 AS tr "
            "FROM u, mx), "
            "dd AS (SELECT unnest(generate_series(0, 29)) AS day), "
            "g AS (SELECT dd.day, "
            "count(*) FILTER (WHERE ld >= day AND tr) AS n1, "
            "count(*) FILTER (WHERE ld >= day AND NOT tr) AS n0, "
            "count(*) FILTER (WHERE ld = day AND obs AND tr) AS d1, "
            "count(*) FILTER (WHERE ld = day AND obs AND NOT tr) AS d0 "
            "FROM dd, lt GROUP BY 1), "
            "agg AS (SELECT SUM(d1) AS o1, "
            "SUM(CASE WHEN n1 + n0 > 0 THEN "
            "1000000 * n1 * (d1 + d0) // (n1 + n0) ELSE 0 END) AS e1, "
            "SUM(CASE WHEN n1 + n0 > 1 THEN "
            "1000000 * CAST(n1 AS HUGEINT) * n0 * (d1 + d0) "
            "* ((n1 + n0) - (d1 + d0)) "
            "// (CAST(n1 + n0 AS HUGEINT) * (n1 + n0) * (n1 + n0 - 1)) "
            "ELSE 0 END) AS v FROM g), "
            "tot AS (SELECT count(*) FILTER (WHERE tr) AS nt, "
            "count(*) FILTER (WHERE NOT tr) AS nc FROM lt) "
            "SELECT CAST(nt AS BIGINT) AS n_treat, "
            "CAST(nc AS BIGINT) AS n_ctrl, CAST(o1 AS BIGINT) AS o1, "
            "CAST(e1 AS BIGINT) AS e1_ppm, CAST(v AS BIGINT) AS v_ppm, "
            "CAST(CASE WHEN v > 0 THEN "
            "(CAST(1000000 * o1 - e1 AS HUGEINT) * (1000000 * o1 - e1)) "
            "// (1000 * v) ELSE 0 END AS BIGINT) AS logrank_milli, "
            "CASE WHEN v > 0 THEN "
            "(CAST(1000000 * o1 - e1 AS HUGEINT) * (1000000 * o1 - e1)) "
            "> 3841459 * v ELSE FALSE END AS significant "
            "FROM agg, tot"
        ),
        # activity deciles via the deterministic 1 + 10·row_number//n
        # rule; per-decile Knuth-arm conversion rates
        "uplift_deciles": (
            "WITH u AS (SELECT user_id, count(*) AS n_ev, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS conv FROM events GROUP BY 1), "
            "nn AS (SELECT count(*) AS n FROM u), "
            "r AS (SELECT user_id, conv, "
            "(user_id * 2654435761) % 4294967296 < 2147483648 AS tr, "
            "row_number() OVER (ORDER BY n_ev DESC, user_id) - 1 "
            "AS ri FROM u), "
            "d AS (SELECT 1 + 10 * ri // nn.n AS decile, tr, conv "
            "FROM r, nn), "
            "g AS (SELECT decile, "
            "count(*) FILTER (WHERE tr) AS nt, "
            "SUM(conv) FILTER (WHERE tr) AS ct, "
            "count(*) FILTER (WHERE NOT tr) AS nc, "
            "SUM(conv) FILTER (WHERE NOT tr) AS cc "
            "FROM d GROUP BY 1), "
            "f AS (SELECT decile, coalesce(nt, 0) AS nt, "
            "coalesce(ct, 0) AS ct, coalesce(nc, 0) AS nc, "
            "coalesce(cc, 0) AS cc FROM g) "
            "SELECT CAST(decile AS BIGINT) AS decile, "
            "CAST(nt AS BIGINT) AS n_treat, "
            "CAST(ct AS BIGINT) AS conv_treat, "
            "CAST(nc AS BIGINT) AS n_ctrl, "
            "CAST(cc AS BIGINT) AS conv_ctrl, "
            "CAST(CASE WHEN nt > 0 THEN 1000000 * ct // nt ELSE 0 END "
            "AS BIGINT) AS rate_treat_ppm, "
            "CAST(CASE WHEN nc > 0 THEN 1000000 * cc // nc ELSE 0 END "
            "AS BIGINT) AS rate_ctrl_ppm, "
            "CAST(CASE WHEN nt > 0 THEN 1000000 * ct // nt ELSE 0 END "
            "- CASE WHEN nc > 0 THEN 1000000 * cc // nc ELSE 0 END "
            "AS BIGINT) AS uplift_ppm FROM f"
        ),
        # Qini/AUUC: cumulative fold over the uplift_deciles cells;
        # qini floors once (counts >= 0), the random diagonal is
        # sign-split because qini_10 may be negative
        "qini_auuc": (
            "WITH u AS (SELECT user_id, count(*) AS n_ev, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS conv FROM events GROUP BY 1), "
            "nn AS (SELECT count(*) AS n FROM u), "
            "r AS (SELECT user_id, conv, "
            "(user_id * 2654435761) % 4294967296 < 2147483648 AS tr, "
            "row_number() OVER (ORDER BY n_ev DESC, user_id) - 1 "
            "AS ri FROM u), "
            "d AS (SELECT 1 + 10 * ri // nn.n AS decile, tr, conv "
            "FROM r, nn), "
            "g AS (SELECT decile, "
            "count(*) FILTER (WHERE tr) AS nt, "
            "coalesce(SUM(conv) FILTER (WHERE tr), 0) AS ct, "
            "count(*) FILTER (WHERE NOT tr) AS nc, "
            "coalesce(SUM(conv) FILTER (WHERE NOT tr), 0) AS cc "
            "FROM d GROUP BY 1), "
            "c AS (SELECT decile, SUM(nt) OVER w AS cnt, "
            "SUM(ct) OVER w AS cct, SUM(nc) OVER w AS cnc, "
            "SUM(cc) OVER w AS ccc FROM g "
            "WINDOW w AS (ORDER BY decile)), "
            "q AS (SELECT decile, cnt, cct, cnc, ccc, "
            "CASE WHEN cnc > 0 THEN cct - ccc * cnt // cnc "
            "ELSE cct END AS qini FROM c), "
            "ql AS (SELECT qini AS q10 FROM q "
            "ORDER BY decile DESC LIMIT 1), "
            "f AS (SELECT q.*, SUM(qini) OVER (ORDER BY decile) "
            "AS auuc, CASE WHEN ql.q10 >= 0 "
            "THEN (decile * ql.q10) // 10 "
            "ELSE -((decile * (-ql.q10)) // 10) END AS rand_base "
            "FROM q, ql) "
            "SELECT CAST(decile AS BIGINT) AS decile, "
            "CAST(cnt AS BIGINT) AS cum_n_treat, "
            "CAST(cct AS BIGINT) AS cum_conv_treat, "
            "CAST(cnc AS BIGINT) AS cum_n_ctrl, "
            "CAST(ccc AS BIGINT) AS cum_conv_ctrl, "
            "CAST(qini AS BIGINT) AS qini, "
            "CAST(auuc AS BIGINT) AS auuc_cum, "
            "CAST(rand_base AS BIGINT) AS rand_base, "
            "CAST(qini - rand_base AS BIGINT) AS gain FROM f"
        ),
        # reliability bins over the deterministic activity score;
        # gap of the two FLOORED ppm values; ECE floors once over N
        "calibration_bins": (
            "WITH u AS (SELECT user_id, count(*) AS n_ev, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS conv FROM events GROUP BY 1), "
            "s AS (SELECT greatest(0, least(1000000, "
            "(n_ev - 40) * 20000)) AS p, conv FROM u), "
            "b AS (SELECT least(9, p // 100000) AS bin, "
            "count(*) AS n, SUM(conv) AS n_conv, SUM(p) AS sum_p, "
            "SUM((p - 1000000 * conv) * (p - 1000000 * conv)) "
            "AS brier_sum FROM s GROUP BY 1), "
            "c AS (SELECT bin, n, n_conv, brier_sum, "
            "sum_p // n AS conf_ppm, "
            "1000000 * n_conv // n AS acc_ppm FROM b), "
            "e AS (SELECT SUM(n * abs(acc_ppm - conf_ppm)) "
            "// SUM(n) AS ece FROM c) "
            "SELECT CAST(bin AS BIGINT) AS bin, "
            "CAST(n AS BIGINT) AS n, CAST(n_conv AS BIGINT) AS n_conv, "
            "CAST(conf_ppm AS BIGINT) AS conf_ppm, "
            "CAST(acc_ppm AS BIGINT) AS acc_ppm, "
            "CAST(abs(acc_ppm - conf_ppm) AS BIGINT) AS gap_ppm, "
            "CAST(brier_sum AS BIGINT) AS brier_sum, "
            "CAST(e.ece AS BIGINT) AS ece_ppm FROM c, e"
        ),
        # SRM: chi-square of the Knuth arms vs the 50/50 design,
        # collapsed to (nt-nc)^2/N; cross-multiplied 5% critical value
        "srm_check": (
            "WITH u AS (SELECT DISTINCT user_id FROM events), "
            "a AS (SELECT count(*) FILTER (WHERE "
            "(user_id * 2654435761) % 4294967296 < 2147483648) AS nt, "
            "count(*) FILTER (WHERE "
            "(user_id * 2654435761) % 4294967296 >= 2147483648) AS nc "
            "FROM u) "
            "SELECT CAST(nt AS BIGINT) AS n_treat, "
            "CAST(nc AS BIGINT) AS n_ctrl, "
            "CAST(nt - nc AS BIGINT) AS delta, "
            "CAST(1000 * (nt - nc) * (nt - nc) // (nt + nc) "
            "AS BIGINT) AS chi2_milli, "
            "(nt - nc) * (nt - nc) * 1000000 > 3841459 * (nt + nc) "
            "AS srm_flag FROM a"
        ),
        # IPS/SNIPS off-policy estimate: propensity exactly 1/2 ->
        # rational weight 2; match = logged coin == policy arm
        "ips_policy_eval": (
            "WITH u AS (SELECT user_id, count(*) AS n_ev, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS conv FROM events GROUP BY 1), "
            "c AS (SELECT conv AS y, CASE WHEN "
            "((user_id * 2654435761) % 4294967296 < 2147483648) "
            "= (n_ev >= 66) THEN 1 ELSE 0 END AS m FROM u), "
            "a AS (SELECT count(*) AS n, SUM(y) AS y, SUM(m) AS m, "
            "SUM(y * m) AS my FROM c) "
            "SELECT CAST(n AS BIGINT) AS n, "
            "CAST(m AS BIGINT) AS n_match, "
            "CAST(my AS BIGINT) AS n_match_conv, "
            "CAST(1000000 * y // n AS BIGINT) AS logged_ppm, "
            "CAST(2000000 * my // n AS BIGINT) AS ips_ppm, "
            "CAST(CASE WHEN m > 0 THEN 1000000 * my // m ELSE 0 END "
            "AS BIGINT) AS snips_ppm FROM a"
        ),
        # BBSE: confusion-rate inversion cleared to one sign-split
        # floor; target = coin-false users with >= 12 purchases
        "label_shift": (
            "WITH u AS (SELECT user_id, count(*) AS n_ev, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS y, "
            "count(*) FILTER (WHERE event_type = 'purchase') AS np "
            "FROM events GROUP BY 1), "
            "f AS (SELECT (user_id * 2654435761) % 4294967296 "
            "< 2147483648 AS src, np >= 12 AS seg, n_ev >= 66 AS yh, "
            "y = 1 AS yy FROM u), "
            "a AS (SELECT "
            "count(*) FILTER (WHERE src AND yy AND yh) AS tp, "
            "count(*) FILTER (WHERE src AND yy AND NOT yh) AS fn, "
            "count(*) FILTER (WHERE src AND NOT yy AND yh) AS fp, "
            "count(*) FILTER (WHERE src AND NOT yy AND NOT yh) AS tn, "
            "count(*) FILTER (WHERE NOT src AND seg) AS m, "
            "count(*) FILTER (WHERE NOT src AND seg AND yh) AS m1, "
            "count(*) FILTER (WHERE NOT src AND seg AND yy) AS t1 "
            "FROM f), "
            "b AS (SELECT *, tp + fn AS p, fp + tn AS nn, "
            "CAST(tp + fn AS HUGEINT) * (m1 * CAST(fp + tn AS HUGEINT) "
            "- CAST(fp AS HUGEINT) * m) AS num, "
            "CAST(m AS HUGEINT) * (CAST(tp AS HUGEINT) * (fp + tn) "
            "- CAST(fp AS HUGEINT) * (tp + fn)) AS den FROM a) "
            "SELECT CAST(p + nn AS BIGINT) AS n_src, "
            "CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, "
            "CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn, "
            "CAST(m AS BIGINT) AS n_tgt, CAST(m1 AS BIGINT) AS m1, "
            "CAST(CASE WHEN m > 0 THEN 1000000 * m1 // m ELSE 0 END "
            "AS BIGINT) AS mu_ppm, "
            "CAST(CASE WHEN p > 0 THEN 1000000 * tp // p ELSE 0 END "
            "AS BIGINT) AS tpr_ppm, "
            "CAST(CASE WHEN nn > 0 THEN 1000000 * fp // nn ELSE 0 END "
            "AS BIGINT) AS fpr_ppm, "
            "CAST(CASE WHEN den = 0 THEN 0 "
            "WHEN (num >= 0) = (den > 0) "
            "THEN 1000000 * abs(num) // abs(den) "
            "ELSE -(1000000 * abs(num) // abs(den)) END AS BIGINT) "
            "AS est_prior_ppm, "
            "CAST(CASE WHEN m > 0 THEN 1000000 * t1 // m ELSE 0 END "
            "AS BIGINT) AS true_prior_ppm FROM b"
        ),
        # split conformal: epoch-hour Knuth coin calibration split,
        # finite-sample rank (9n+18)//10 clamped, held-out coverage
        "conformal_interval": (
            "WITH h AS (SELECT event_type, "
            "date_trunc('hour', ts) AS w, count(*) AS n FROM events "
            "GROUP BY 1, 2), "
            "p AS (SELECT a.event_type, a.w, abs(a.n - b.n) AS s, "
            "(CAST(epoch_ms(a.w) AS BIGINT) // 3600000 * 2654435761) "
            "% 4294967296 < 2147483648 AS cal "
            "FROM h a JOIN h b ON a.event_type = b.event_type "
            "AND b.w = a.w - INTERVAL 24 HOURS), "
            "c AS (SELECT event_type, count(*) AS n_cal FROM p "
            "WHERE cal GROUP BY 1), "
            "k AS (SELECT event_type, n_cal, "
            "least((9 * n_cal + 18) // 10, n_cal) AS k FROM c), "
            "r AS (SELECT event_type, s, row_number() OVER "
            "(PARTITION BY event_type ORDER BY s) AS rn FROM p "
            "WHERE cal), "
            "q AS (SELECT k.event_type, k.n_cal, k.k, r.s AS thr "
            "FROM k JOIN r ON r.event_type = k.event_type "
            "AND r.rn = k.k), "
            "cov AS (SELECT q.event_type, max(q.n_cal) AS n_cal, "
            "max(q.k) AS k, max(q.thr) AS thr, count(*) AS n_test, "
            "count(*) FILTER (WHERE p.s <= q.thr) AS n_cov "
            "FROM q JOIN p ON p.event_type = q.event_type "
            "AND NOT p.cal GROUP BY 1) "
            "SELECT event_type, CAST(n_cal AS BIGINT) AS n_cal, "
            "CAST(n_test AS BIGINT) AS n_test, CAST(k AS BIGINT) AS k, "
            "CAST(thr AS BIGINT) AS threshold, "
            "CAST(n_cov AS BIGINT) AS n_covered, "
            "CAST(1000000 * n_cov // n_test AS BIGINT) "
            "AS coverage_ppm FROM cov"
        ),
        # payback: min-day join + window cumsum + first CAC crossing;
        # cohorts that never pay back coalesce to -1
        "cohort_payback": (
            "WITH e AS (SELECT user_id, "
            "CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS dd, "
            "event_type, CAST(round(value * 100) AS BIGINT) AS cents "
            "FROM events), "
            "f AS (SELECT user_id, min(dd) AS fd FROM e GROUP BY 1), "
            "u AS (SELECT fd // 7 AS cw, count(*) AS n_users FROM f "
            "GROUP BY 1), "
            "p AS (SELECT f.fd // 7 AS cw, e.dd - f.fd AS off, "
            "SUM(e.cents) AS rev FROM e JOIN f USING (user_id) "
            "WHERE e.event_type = 'purchase' GROUP BY 1, 2), "
            "c AS (SELECT cw, off, SUM(rev) OVER "
            "(PARTITION BY cw ORDER BY off) AS cum FROM p), "
            "pb AS (SELECT c.cw, min(c.off) AS pd FROM c "
            "JOIN u ON u.cw = c.cw WHERE c.cum >= 30000 * u.n_users "
            "GROUP BY 1), "
            "t AS (SELECT cw, SUM(rev) AS total FROM p GROUP BY 1) "
            "SELECT CAST(u.cw AS BIGINT) AS cohort_week, "
            "CAST(u.n_users AS BIGINT) AS n_users, "
            "CAST(coalesce(t.total, 0) AS BIGINT) "
            "AS total_revenue_cents, "
            "CAST(30000 * u.n_users AS BIGINT) AS cac_cents, "
            "CAST(coalesce(pb.pd, -1) AS BIGINT) AS payback_day "
            "FROM u LEFT JOIN t ON t.cw = u.cw "
            "LEFT JOIN pb ON pb.cw = u.cw"
        ),
        # multiplier bootstrap: two hash bits per (row, replicate) give
        # w in {0,1,2} mean 1; rank-picked 2nd/31st replicate means
        "bootstrap_ci": (
            "WITH r AS (SELECT 8 * l_orderkey + l_linenumber AS rid, "
            "CAST(round(l_quantity) AS BIGINT) AS v FROM lineitem), "
            "bb AS (SELECT unnest(generate_series(0, 31)) AS b), "
            "w AS (SELECT bb.b, r.v, "
            "(((r.rid * 32 + bb.b) % 1048573) * 2654435761) "
            "% 4294967296 AS h FROM r, bb), "
            "m AS (SELECT b, "
            "SUM((((h // 1073741824) % 2) + ((h // 2147483648) % 2)) "
            "* v) AS swv, "
            "SUM(((h // 1073741824) % 2) + ((h // 2147483648) % 2)) "
            "AS sw FROM w GROUP BY 1), "
            "mm AS (SELECT CASE WHEN sw > 0 "
            "THEN 1000000 * swv // sw ELSE 0 END AS m FROM m), "
            "rk AS (SELECT m, row_number() OVER (ORDER BY m) AS rn "
            "FROM mm), "
            "t AS (SELECT count(*) AS n, SUM(v) AS sv FROM r) "
            "SELECT CAST(t.n AS BIGINT) AS n, "
            "CAST(32 AS BIGINT) AS n_reps, "
            "CAST(1000000 * t.sv // t.n AS BIGINT) AS mean_ppm, "
            "(SELECT CAST(m AS BIGINT) FROM rk WHERE rn = 2) "
            "AS ci_lo_ppm, "
            "(SELECT CAST(m AS BIGINT) FROM rk WHERE rn = 31) "
            "AS ci_hi_ppm FROM t"
        ),
        # jackknife: closed-form deletion statistics from per-source
        # totals; influence vs the full-corpus share
        "jackknife_sources": (
            "WITH c AS (SELECT source, count(*) AS n_docs, "
            "count(*) FILTER (WHERE lang = 'en') AS n_en "
            "FROM documents GROUP BY 1), "
            "t AS (SELECT SUM(n_docs) AS nn, SUM(n_en) AS ee FROM c) "
            "SELECT c.source, CAST(n_docs AS BIGINT) AS n_docs, "
            "CAST(n_en AS BIGINT) AS n_en, "
            "CAST(1000000 * ee // nn AS BIGINT) AS share_full_ppm, "
            "CAST(CASE WHEN nn > n_docs THEN "
            "1000000 * (ee - n_en) // (nn - n_docs) ELSE 0 END "
            "AS BIGINT) AS share_wo_ppm, "
            "CAST(CASE WHEN nn > n_docs THEN "
            "1000000 * (ee - n_en) // (nn - n_docs) ELSE 0 END "
            "- 1000000 * ee // nn AS BIGINT) AS influence_ppm "
            "FROM c, t"
        ),
        # EMD = sum |CDF diff| over the ordered 24-hour domain,
        # cross-multiplied; weekday/weekend via (dd+4)%7 arithmetic
        "emd_hourly": (
            "WITH e AS (SELECT event_type, "
            "epoch_us(ts) // 86400000000 AS dd, "
            "(epoch_us(ts) // 3600000000) % 24 AS hod FROM events), "
            "c AS (SELECT event_type, CASE WHEN (dd + 4) % 7 IN (0, 6) "
            "THEN 1 ELSE 0 END AS cls, hod, count(*) AS n FROM e "
            "GROUP BY 1, 2, 3), "
            "grid AS (SELECT t.event_type, cc.cls, h.hod FROM "
            "(SELECT DISTINCT event_type FROM e) t, "
            "(VALUES (0), (1)) cc(cls), "
            "(SELECT unnest(generate_series(0, 23)) AS hod) h), "
            "d AS (SELECT grid.event_type, grid.cls, grid.hod, "
            "coalesce(c.n, 0) AS n FROM grid LEFT JOIN c "
            "USING (event_type, cls, hod)), "
            "cum AS (SELECT event_type, cls, hod, SUM(n) OVER "
            "(PARTITION BY event_type, cls ORDER BY hod) AS cn "
            "FROM d), "
            "tot AS (SELECT event_type, "
            "SUM(CASE WHEN cls = 0 THEN n ELSE 0 END) AS na, "
            "SUM(CASE WHEN cls = 1 THEN n ELSE 0 END) AS nb "
            "FROM d GROUP BY 1), "
            "x AS (SELECT c0.event_type, "
            "SUM(abs(CAST(c0.cn AS HUGEINT) * t.nb "
            "- CAST(c1.cn AS HUGEINT) * t.na)) AS s, "
            "max(t.na) AS na, max(t.nb) AS nb "
            "FROM cum c0 JOIN cum c1 ON c0.event_type = c1.event_type "
            "AND c0.hod = c1.hod AND c0.cls = 0 AND c1.cls = 1 "
            "JOIN tot t ON t.event_type = c0.event_type GROUP BY 1) "
            "SELECT event_type, CAST(na AS BIGINT) AS n_weekday, "
            "CAST(nb AS BIGINT) AS n_weekend, "
            "CAST(CASE WHEN na > 0 AND nb > 0 THEN "
            "1000 * s // (CAST(na AS HUGEINT) * nb) ELSE 0 END "
            "AS BIGINT) AS emd_milli FROM x"
        ),
        # arc elasticity cleared to integers; midpoint split mirrors
        # laspeyres; full sign-split floor; den=0 parts drop
        "price_elasticity": (
            "WITH d AS (SELECT l_partkey AS pk, "
            "epoch_us(l_shipdate) // 86400000000 AS dd, "
            "CAST(l_quantity AS BIGINT) AS q, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS rc "
            "FROM lineitem), "
            "md AS (SELECT (min(dd) + max(dd)) // 2 AS mid FROM d), "
            "g AS (SELECT pk, CASE WHEN dd >= md.mid THEN 1 ELSE 0 END "
            "AS post, SUM(q) AS q, SUM(rc) AS rc FROM d, md "
            "GROUP BY 1, 2), "
            "w AS (SELECT g0.pk, g0.q AS q0, g0.rc AS r0, "
            "g1.q AS q1, g1.rc AS r1 FROM g g0 JOIN g g1 "
            "ON g0.pk = g1.pk AND g0.post = 0 AND g1.post = 1), "
            "x AS (SELECT pk, q0, q1, r0, r1, "
            "CAST(q1 - q0 AS HUGEINT) * (CAST(r1 AS HUGEINT) * q0 "
            "+ CAST(r0 AS HUGEINT) * q1) AS num, "
            "CAST(q1 + q0 AS HUGEINT) * (CAST(r1 AS HUGEINT) * q0 "
            "- CAST(r0 AS HUGEINT) * q1) AS den FROM w) "
            "SELECT CAST(pk AS BIGINT) AS partkey, "
            "CAST(q0 AS BIGINT) AS q0, CAST(q1 AS BIGINT) AS q1, "
            "CAST(r0 AS BIGINT) AS r0_cents, "
            "CAST(r1 AS BIGINT) AS r1_cents, "
            "CAST(CASE WHEN (num >= 0) = (den > 0) "
            "THEN 1000000 * abs(num) // abs(den) "
            "ELSE -(1000000 * abs(num) // abs(den)) END AS BIGINT) "
            "AS elasticity_ppm FROM x WHERE den <> 0"
        ),
        # permutation p: 32 hash re-coins (top bit, prime reduction),
        # cross-multiplied extremeness, add-one rule
        "permutation_test": (
            "WITH u AS (SELECT user_id, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS y FROM events GROUP BY 1), "
            "t AS (SELECT count(*) AS n, SUM(y) AS cy, "
            "count(*) FILTER (WHERE (user_id * 2654435761) "
            "% 4294967296 < 2147483648) AS ont, "
            "coalesce(SUM(y) FILTER (WHERE (user_id * 2654435761) "
            "% 4294967296 < 2147483648), 0) AS octv FROM u), "
            "bb AS (SELECT unnest(generate_series(0, 31)) AS b), "
            "r AS (SELECT bb.b, count(*) FILTER (WHERE "
            "(((u.user_id * 32 + bb.b) % 1048573) * 2654435761) "
            "% 4294967296 >= 2147483648) AS nt, "
            "coalesce(SUM(u.y) FILTER (WHERE "
            "(((u.user_id * 32 + bb.b) % 1048573) * 2654435761) "
            "% 4294967296 >= 2147483648), 0) AS ct "
            "FROM u, bb GROUP BY 1), "
            "e AS (SELECT count(*) FILTER (WHERE "
            "nt * (t.n - nt) = 0 OR "
            "abs(CAST(ct AS HUGEINT) * (t.n - nt) "
            "- (t.cy - ct) * nt) "
            "* (CAST(t.ont AS HUGEINT) * (t.n - t.ont)) >= "
            "abs(CAST(t.octv AS HUGEINT) * (t.n - t.ont) "
            "- (t.cy - t.octv) * t.ont) "
            "* (CAST(nt AS HUGEINT) * (t.n - nt))) AS n_ext "
            "FROM r, t) "
            "SELECT CAST(t.n AS BIGINT) AS n, "
            "CAST(32 AS BIGINT) AS b_reps, "
            "CAST(CASE WHEN t.ont * (t.n - t.ont) = 0 THEN 0 "
            "WHEN CAST(t.octv AS HUGEINT) * (t.n - t.ont) "
            "- (t.cy - t.octv) * t.ont >= 0 THEN "
            "1000000 * abs(CAST(t.octv AS HUGEINT) * (t.n - t.ont) "
            "- (t.cy - t.octv) * t.ont) "
            "// (CAST(t.ont AS HUGEINT) * (t.n - t.ont)) ELSE "
            "-(1000000 * abs(CAST(t.octv AS HUGEINT) * (t.n - t.ont) "
            "- (t.cy - t.octv) * t.ont) "
            "// (CAST(t.ont AS HUGEINT) * (t.n - t.ont))) END "
            "AS BIGINT) AS obs_gap_ppm, "
            "CAST(e.n_ext AS BIGINT) AS n_extreme, "
            "CAST(1000000 * (e.n_ext + 1) // 33 AS BIGINT) AS p_ppm "
            "FROM t, e"
        ),
        # CUPED: cleared theta, ppm arm means, documented double-floor
        # correction, all sign-split
        "cuped_adjust": (
            "WITH d0 AS (SELECT min(epoch_us(ts) // 86400000000) + 15 "
            "AS cut FROM events), "
            "u AS (SELECT user_id, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS y, "
            "SUM(CASE WHEN epoch_us(ts) // 86400000000 < d0.cut "
            "THEN 1 ELSE 0 END) AS x FROM events, d0 GROUP BY 1), "
            "a AS (SELECT count(*) AS n, SUM(x) AS sx, SUM(y) AS sy, "
            "SUM(x * y) AS sxy, SUM(x * x) AS sxx, "
            "count(*) FILTER (WHERE (user_id * 2654435761) "
            "% 4294967296 < 2147483648) AS nt, "
            "coalesce(SUM(y) FILTER (WHERE (user_id * 2654435761) "
            "% 4294967296 < 2147483648), 0) AS ct, "
            "coalesce(SUM(x) FILTER (WHERE (user_id * 2654435761) "
            "% 4294967296 < 2147483648), 0) AS xt FROM u), "
            "b AS (SELECT n, nt, "
            "CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy "
            "AS tnum, "
            "CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx "
            "AS tden, "
            "(CASE WHEN nt > 0 THEN 1000000 * ct // nt ELSE 0 END) "
            "- (CASE WHEN n - nt > 0 THEN "
            "1000000 * (sy - ct) // (n - nt) ELSE 0 END) AS uplift, "
            "CAST(xt AS HUGEINT) * (n - nt) "
            "- CAST(sx - xt AS HUGEINT) * nt AS gnum, "
            "CAST(nt AS HUGEINT) * (n - nt) AS gden FROM a), "
            "c AS (SELECT n, nt, uplift, "
            "CASE WHEN tden = 0 THEN 0 WHEN tnum >= 0 THEN "
            "1000000 * tnum // tden ELSE "
            "-(1000000 * (-tnum) // tden) END AS theta, "
            "CASE WHEN gden = 0 THEN 0 WHEN gnum >= 0 THEN "
            "1000000 * gnum // gden ELSE "
            "-(1000000 * (-gnum) // gden) END AS xgap FROM b), "
            "f AS (SELECT *, CASE WHEN theta * xgap >= 0 THEN "
            "(theta * xgap) // 1000000 ELSE "
            "-((-(theta * xgap)) // 1000000) END AS corr FROM c) "
            "SELECT CAST(n AS BIGINT) AS n, "
            "CAST(nt AS BIGINT) AS n_treat, "
            "CAST(theta AS BIGINT) AS theta_ppm, "
            "CAST(uplift AS BIGINT) AS uplift_ppm, "
            "CAST(xgap AS BIGINT) AS xgap_ppm, "
            "CAST(corr AS BIGINT) AS correction_ppm, "
            "CAST(uplift - corr AS BIGINT) AS adj_uplift_ppm FROM f"
        ),
        # sharp RDD: side-local OLS intercepts at the cutoff,
        # grouped_regression contract, jump = a_R - a_L
        "rdd_jump": (
            "WITH u AS (SELECT user_id, count(*) AS n_ev, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS y FROM events GROUP BY 1), "
            "v AS (SELECT n_ev - 66 AS ux, y FROM u), "
            "a AS (SELECT "
            "count(*) FILTER (WHERE ux BETWEEN -20 AND -1) AS nl, "
            "coalesce(SUM(ux) FILTER (WHERE ux BETWEEN -20 AND -1), 0)"
            " AS sul, "
            "coalesce(SUM(y) FILTER (WHERE ux BETWEEN -20 AND -1), 0)"
            " AS syl, "
            "coalesce(SUM(ux * y) FILTER "
            "(WHERE ux BETWEEN -20 AND -1), 0) AS suyl, "
            "coalesce(SUM(ux * ux) FILTER "
            "(WHERE ux BETWEEN -20 AND -1), 0) AS suul, "
            "count(*) FILTER (WHERE ux BETWEEN 0 AND 19) AS nr, "
            "coalesce(SUM(ux) FILTER (WHERE ux BETWEEN 0 AND 19), 0)"
            " AS sur, "
            "coalesce(SUM(y) FILTER (WHERE ux BETWEEN 0 AND 19), 0)"
            " AS syr, "
            "coalesce(SUM(ux * y) FILTER "
            "(WHERE ux BETWEEN 0 AND 19), 0) AS suyr, "
            "coalesce(SUM(ux * ux) FILTER "
            "(WHERE ux BETWEEN 0 AND 19), 0) AS suur FROM v), "
            "b AS (SELECT nl, nr, "
            "CAST(nl AS HUGEINT) * suul - CAST(sul AS HUGEINT) * sul "
            "AS denl, "
            "CAST(syl AS HUGEINT) * suul - CAST(sul AS HUGEINT) * suyl"
            " AS anl, "
            "CAST(nl AS HUGEINT) * suyl - CAST(sul AS HUGEINT) * syl "
            "AS bnl, "
            "CAST(nr AS HUGEINT) * suur - CAST(sur AS HUGEINT) * sur "
            "AS denr, "
            "CAST(syr AS HUGEINT) * suur - CAST(sur AS HUGEINT) * suyr"
            " AS anr, "
            "CAST(nr AS HUGEINT) * suyr - CAST(sur AS HUGEINT) * syr "
            "AS bnr FROM a), "
            "c AS (SELECT nl, nr, "
            + _sql_ss("anl", "denl") + " AS al, "
            + _sql_ss("bnl", "denl") + " AS bl, "
            + _sql_ss("anr", "denr") + " AS ar, "
            + _sql_ss("bnr", "denr") + " AS br FROM b) "
            "SELECT CAST(nl AS BIGINT) AS n_left, "
            "CAST(nr AS BIGINT) AS n_right, "
            "CAST(al AS BIGINT) AS a_left_ppm, "
            "CAST(bl AS BIGINT) AS b_left_ppm, "
            "CAST(ar AS BIGINT) AS a_right_ppm, "
            "CAST(br AS BIGINT) AS b_right_ppm, "
            "CAST(ar - al AS BIGINT) AS jump_ppm FROM c"
        ),
        # Kitagawa: per-segment mix / rate / interaction terms, each a
        # single sign-split floor; midpoint period split
        "kitagawa_decomp": (
            "WITH md AS (SELECT (min(epoch_us(ts) // 86400000000) "
            "+ max(epoch_us(ts) // 86400000000)) // 2 AS mid "
            "FROM events), "
            "e AS (SELECT (epoch_us(ts) // 3600000000) % 24 // 6 "
            "AS seg, CASE WHEN epoch_us(ts) // 86400000000 >= md.mid "
            "THEN 1 ELSE 0 END AS per, "
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
            "AS pp FROM events, md), "
            "g AS (SELECT seg, per, count(*) AS c, SUM(pp) AS p "
            "FROM e GROUP BY 1, 2), "
            "t AS (SELECT "
            "SUM(CASE WHEN per = 0 THEN c ELSE 0 END) AS n0, "
            "SUM(CASE WHEN per = 1 THEN c ELSE 0 END) AS n1 FROM g), "
            "w AS (SELECT s.seg, coalesce(g0.c, 0) AS c0, "
            "coalesce(g0.p, 0) AS p0, coalesce(g1.c, 0) AS c1, "
            "coalesce(g1.p, 0) AS p1, t.n0, t.n1 "
            "FROM (SELECT DISTINCT seg FROM g) s "
            "LEFT JOIN g g0 ON g0.seg = s.seg AND g0.per = 0 "
            "LEFT JOIN g g1 ON g1.seg = s.seg AND g1.per = 1 "
            "CROSS JOIN t), "
            "x AS (SELECT seg, c0, p0, c1, p1, "
            "CAST(c1 AS HUGEINT) * n0 - CAST(c0 AS HUGEINT) * n1 "
            "AS wnum, "
            "CAST(p1 AS HUGEINT) * c0 - CAST(p0 AS HUGEINT) * c1 "
            "AS rnum, "
            "CAST(n1 AS HUGEINT) * n0 * c0 AS dmix, "
            "CAST(n0 AS HUGEINT) * c1 AS drate, "
            "CAST(n0 AS HUGEINT) * n1 * c1 * c0 AS dinter FROM w) "
            "SELECT CAST(seg AS BIGINT) AS seg, "
            "CAST(c0 AS BIGINT) AS c0, CAST(p0 AS BIGINT) AS p0, "
            "CAST(c1 AS BIGINT) AS c1, CAST(p1 AS BIGINT) AS p1, "
            "CAST(" + _sql_ss("wnum * p0", "dmix") + " AS BIGINT) "
            "AS mix_ppm, "
            "CAST(" + _sql_ss("rnum", "drate") + " AS BIGINT) "
            "AS rate_ppm, "
            "CAST(" + _sql_ss("wnum * rnum", "dinter") + " AS BIGINT) "
            "AS inter_ppm FROM x"
        ),
        # spillover: id-adjacency neighbors via IN-list self-join,
        # coin of the surviving neighbor, interior users only
        "spillover_exposure": (
            "WITH u AS (SELECT user_id, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS y FROM events GROUP BY 1), "
            "p AS (SELECT a.user_id AS uid, a.y, b.user_id AS nbr "
            "FROM u a JOIN u b ON b.user_id IN "
            "(a.user_id - 2, a.user_id - 1, a.user_id + 1, "
            "a.user_id + 2)), "
            "g AS (SELECT uid, max(y) AS y, count(*) AS nn, "
            "SUM(CASE WHEN (nbr * 2654435761) % 4294967296 "
            "< 2147483648 THEN 1 ELSE 0 END) AS expo FROM p "
            "GROUP BY 1), "
            "f AS (SELECT expo, count(*) AS n_users, SUM(y) AS n_conv "
            "FROM g WHERE nn = 4 GROUP BY 1) "
            "SELECT CAST(expo AS BIGINT) AS exposure, "
            "CAST(n_users AS BIGINT) AS n_users, "
            "CAST(n_conv AS BIGINT) AS n_conv, "
            "CAST(1000000 * n_conv // n_users AS BIGINT) AS rate_ppm "
            "FROM f"
        ),
        # MH: per-stratum sign-split RD terms + nt*nc/n weights pooled
        # over the activity deciles; crude gap rides along
        "mh_stratified": (
            "WITH u AS (SELECT user_id, count(*) AS n_ev, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS conv FROM events GROUP BY 1), "
            "nn AS (SELECT count(*) AS n FROM u), "
            "r AS (SELECT user_id, conv, "
            "(user_id * 2654435761) % 4294967296 < 2147483648 AS tr, "
            "row_number() OVER (ORDER BY n_ev DESC, user_id) - 1 "
            "AS ri FROM u), "
            "d AS (SELECT 1 + 10 * ri // nn.n AS s, tr, conv "
            "FROM r, nn), "
            "g AS (SELECT s, count(*) FILTER (WHERE tr) AS nt, "
            "coalesce(SUM(conv) FILTER (WHERE tr), 0) AS ct, "
            "count(*) FILTER (WHERE NOT tr) AS nc, "
            "coalesce(SUM(conv) FILTER (WHERE NOT tr), 0) AS cc "
            "FROM d GROUP BY 1), "
            "a AS (SELECT SUM(nt) AS bnt, SUM(ct) AS bct, "
            "SUM(nc) AS bnc, SUM(cc) AS bcc, count(*) AS ns, "
            "SUM(CASE WHEN nt + nc > 0 THEN "
            + _sql_ss("CAST(ct AS HUGEINT) * nc "
                      "- CAST(cc AS HUGEINT) * nt", "nt + nc")
            + " ELSE 0 END) AS sum_t, "
            "SUM(CASE WHEN nt + nc > 0 THEN "
            "1000000 * CAST(nt AS HUGEINT) * nc // (nt + nc) "
            "ELSE 0 END) AS sum_w FROM g), "
            "b AS (SELECT bnt + bnc AS n, ns, "
            "(CASE WHEN bnt > 0 THEN 1000000 * bct // bnt ELSE 0 END) "
            "- (CASE WHEN bnc > 0 THEN 1000000 * bcc // bnc "
            "ELSE 0 END) AS crude, "
            + _sql_ss("sum_t", "sum_w") + " AS mh FROM a) "
            "SELECT CAST(n AS BIGINT) AS n, "
            "CAST(ns AS BIGINT) AS n_strata, "
            "CAST(crude AS BIGINT) AS crude_uplift_ppm, "
            "CAST(mh AS BIGINT) AS mh_uplift_ppm, "
            "CAST(crude - mh AS BIGINT) AS gap_ppm FROM b"
        ),
        # IPF raking: row floor then col floor, two chained CTEs;
        # only sampled cells emit
        "ipf_raking": (
            "WITH c AS (SELECT source, lang, count(*) AS n_full, "
            "count(*) FILTER (WHERE (doc_id * 2654435761) "
            "% 4294967296 < 2147483648) AS n_samp "
            "FROM documents GROUP BY 1, 2), "
            "r AS (SELECT source, SUM(n_full) AS rs, "
            "SUM(n_samp) AS ms FROM c GROUP BY 1), "
            "l AS (SELECT lang, SUM(n_full) AS cl FROM c GROUP BY 1), "
            "w1 AS (SELECT c.source, c.lang, c.n_samp, "
            "CASE WHEN r.ms > 0 THEN 1000000 * r.rs // r.ms "
            "ELSE 0 END AS w1 FROM c JOIN r USING (source) "
            "WHERE c.n_samp > 0), "
            "t AS (SELECT lang, SUM(n_samp * w1) AS tl FROM w1 "
            "GROUP BY 1) "
            "SELECT w1.source, w1.lang, "
            "CAST(n_samp AS BIGINT) AS n_samp, "
            "CAST(CAST(w1 AS HUGEINT) * 1000000 * l.cl // t.tl "
            "AS BIGINT) AS w2_ppm "
            "FROM w1 JOIN l USING (lang) JOIN t USING (lang)"
        ),
        # Gries DP over the top-10 tokens: |obs - expected| source
        # shares cross-multiplied, halved denominator
        "term_dispersion": (
            "WITH tk AS (SELECT source, "
            "unnest(string_split(coalesce(text, ''), ' ')) AS token "
            "FROM documents), "
            "c AS (SELECT source, token, count(*) AS n FROM tk "
            "GROUP BY 1, 2), "
            "vs AS (SELECT source, SUM(n) AS v FROM c GROUP BY 1), "
            "vv AS (SELECT SUM(v) AS vt FROM vs), "
            "tt AS (SELECT token, SUM(n) AS o FROM c GROUP BY 1), "
            "top AS (SELECT token, o FROM tt "
            "ORDER BY o DESC, token LIMIT 10), "
            "x AS (SELECT top.token, top.o, vs.source, vs.v, "
            "coalesce(c.n, 0) AS osn FROM top CROSS JOIN vs "
            "LEFT JOIN c ON c.token = top.token "
            "AND c.source = vs.source), "
            "f AS (SELECT token, max(o) AS o, "
            "SUM(abs(CAST(osn AS HUGEINT) * vv.vt "
            "- CAST(v AS HUGEINT) * o)) AS s, "
            "max(vv.vt) AS vt FROM x, vv GROUP BY 1) "
            "SELECT token, CAST(o AS BIGINT) AS n_total, "
            "CAST(1000000 * s // (2 * CAST(vt AS HUGEINT) * o) "
            "AS BIGINT) AS dp_ppm FROM f"
        ),
        # chain ladder: filter-then-bucket delays, window cumulative,
        # pooled factors, unrolled trunc chain per immature cohort
        "chain_ladder": (
            "WITH o AS (SELECT o_orderkey AS ok, "
            "epoch_us(o_orderdate) // 86400000000 AS odd FROM orders), "
            "l AS (SELECT l_orderkey AS ok, "
            "epoch_us(l_shipdate) // 86400000000 AS sdd, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS rc "
            "FROM lineitem), "
            "jx AS (SELECT l.sdd - o.odd AS dd, o.odd, l.rc "
            "FROM l JOIN o USING (ok)), "
            "cell AS (SELECT odd // 30 AS i, dd // 30 AS j, "
            "SUM(rc) AS rc FROM jx WHERE dd BETWEEN 0 AND 119 "
            "GROUP BY 1, 2), "
            "cal AS (SELECT max(i + j) AS cal FROM cell), "
            "grid AS (SELECT ii.i, jj.j FROM "
            "(SELECT DISTINCT i FROM cell) ii, "
            "(SELECT unnest(generate_series(0, 3)) AS j) jj), "
            "dense AS (SELECT grid.i, grid.j, coalesce(cell.rc, 0) "
            "AS rc FROM grid LEFT JOIN cell USING (i, j)), "
            "cm AS (SELECT i, j, SUM(rc) OVER "
            "(PARTITION BY i ORDER BY j) AS c FROM dense), "
            "fr AS (SELECT cur.j AS j, CASE WHEN SUM(cur.c) > 0 THEN "
            "1000000 * SUM(nx.c) // SUM(cur.c) ELSE 1000000 END AS fp "
            "FROM cm cur JOIN cm nx ON nx.i = cur.i "
            "AND nx.j = cur.j + 1 CROSS JOIN cal "
            "WHERE cur.j <= 2 AND cur.i <= cal.cal - cur.j - 1 "
            "GROUP BY 1), "
            "fg AS (SELECT jj.j, coalesce(fr.fp, 1000000) AS fp FROM "
            "(SELECT unnest(generate_series(0, 2)) AS j) jj "
            "LEFT JOIN fr USING (j)), "
            "fx AS (SELECT "
            "max(CASE WHEN j = 0 THEN fp END) AS f0, "
            "max(CASE WHEN j = 1 THEN fp END) AS f1, "
            "max(CASE WHEN j = 2 THEN fp END) AS f2 FROM fg), "
            "lat AS (SELECT cm.i, least(3, cal.cal - cm.i) AS age, "
            "CAST(cm.c AS HUGEINT) AS c FROM cm CROSS JOIN cal "
            "WHERE cm.j = least(3, cal.cal - cm.i)), "
            "ult AS (SELECT i, age, c AS latest, CASE age "
            "WHEN 3 THEN c "
            "WHEN 2 THEN c * f2 // 1000000 "
            "WHEN 1 THEN ((c * f1 // 1000000) * f2) // 1000000 "
            "ELSE ((((c * f0 // 1000000) * f1) // 1000000) * f2) "
            "// 1000000 END AS u FROM lat CROSS JOIN fx) "
            "SELECT CAST(i AS BIGINT) AS cohort_month, "
            "CAST(age AS BIGINT) AS age, "
            "CAST(latest AS BIGINT) AS latest_cum_cents, "
            "CAST(u AS BIGINT) AS ultimate_cents, "
            "CAST(u - latest AS BIGINT) AS ibnr_cents FROM ult"
        ),
        # FE panel: per-group micro-floored within terms vs the pooled
        # totals slope; gap = composition bias
        "fe_panel": (
            "WITH p AS (SELECT o_custkey AS cust, "
            "epoch_us(o_orderdate) // 86400000000 // 30 AS m, "
            "CAST(SUM(round(o_totalprice * 100)) AS BIGINT) AS y "
            "FROM orders GROUP BY 1, 2), "
            "g AS (SELECT cust, count(*) AS n, SUM(m) AS sx, "
            "SUM(y) AS sy, SUM(m * y) AS sxy, SUM(m * m) AS sxx "
            "FROM p GROUP BY 1), "
            "w AS (SELECT cust, n, sx, sy, sxy, sxx, "
            "CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy "
            "AS wn, "
            "CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx "
            "AS wd FROM g), "
            "a AS (SELECT SUM(n) AS nn, SUM(sx) AS tsx, "
            "SUM(sy) AS tsy, SUM(sxy) AS tsxy, SUM(sxx) AS tsxx, "
            "count(*) AS ng, "
            "SUM(CASE WHEN wn >= 0 THEN 1000000 * wn // n "
            "ELSE -(1000000 * (-wn) // n) END) AS sum_t, "
            "SUM(1000000 * wd // n) AS sum_d FROM w), "
            "b AS (SELECT nn, ng, "
            + _sql_ss("CAST(nn AS HUGEINT) * tsxy "
                      "- CAST(tsx AS HUGEINT) * tsy",
                      "CAST(nn AS HUGEINT) * tsxx "
                      "- CAST(tsx AS HUGEINT) * tsx")
            + " AS pooled, "
            + _sql_ss("sum_t", "sum_d") + " AS within FROM a) "
            "SELECT CAST(nn AS BIGINT) AS n_obs, "
            "CAST(ng AS BIGINT) AS n_groups, "
            "CAST(pooled AS BIGINT) AS pooled_slope_ppm, "
            "CAST(within AS BIGINT) AS within_slope_ppm, "
            "CAST(pooled - within AS BIGINT) AS gap_ppm FROM b"
        ),
        # matching on the bounded (x, arm) histogram: nearest ctrl
        # value (tie -> smaller), per-value rate floors, final ss
        "matching_att": (
            "WITH u AS (SELECT user_id, count(*) AS n_ev, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS conv FROM events GROUP BY 1), "
            "v AS (SELECT n_ev AS x, (user_id * 2654435761) "
            "% 4294967296 < 2147483648 AS t, conv FROM u), "
            "h AS (SELECT x, t, count(*) AS n, SUM(conv) AS c "
            "FROM v GROUP BY 1, 2), "
            "tr AS (SELECT x, n, c FROM h WHERE t), "
            "ctl AS (SELECT x, n, c, 1000000 * c // n AS rc "
            "FROM h WHERE NOT t), "
            "m AS (SELECT tr.x, tr.n, ctl.rc, row_number() OVER "
            "(PARTITION BY tr.x ORDER BY abs(tr.x - ctl.x), ctl.x) "
            "AS rn FROM tr CROSS JOIN ctl), "
            "mm AS (SELECT x, n, rc FROM m WHERE rn = 1), "
            "tot AS (SELECT coalesce(SUM(tr.n), 0) AS nt, "
            "coalesce(SUM(tr.c), 0) AS ct FROM tr), "
            "ctot AS (SELECT coalesce(SUM(n), 0) AS nc, "
            "coalesce(SUM(c), 0) AS cc FROM ctl), "
            "s AS (SELECT coalesce(SUM(CAST(n AS HUGEINT) * rc), 0) "
            "AS msum FROM mm), "
            "f AS (SELECT nt, ct, nc, cc, msum, "
            + _sql_ss("1000000 * CAST(ct AS HUGEINT) - msum",
                      "1000000 * CAST(nt AS HUGEINT)")
            + " AS att, "
            "(CASE WHEN nt > 0 THEN 1000000 * ct // nt ELSE 0 END) "
            "- (CASE WHEN nc > 0 THEN 1000000 * cc // nc ELSE 0 END) "
            "AS naive FROM tot, ctot, s) "
            "SELECT CAST(nt AS BIGINT) AS n_treat, "
            "CAST(nc AS BIGINT) AS n_ctrl, "
            "CAST(att AS BIGINT) AS att_ppm, "
            "CAST(naive AS BIGINT) AS naive_diff_ppm, "
            "CAST(naive - att AS BIGINT) AS bias_removed_ppm FROM f"
        ),
        # add-k shrinkage toward the rational corpus mean, one floor
        "eb_shrink": (
            "WITH c AS (SELECT source, count(*) AS n_docs, "
            "count(*) FILTER (WHERE lang = 'en') AS n_en "
            "FROM documents GROUP BY 1), "
            "t AS (SELECT SUM(n_docs) AS nn, SUM(n_en) AS ee FROM c) "
            "SELECT source, CAST(n_docs AS BIGINT) AS n_docs, "
            "CAST(n_en AS BIGINT) AS n_en, "
            "CAST(1000000 * n_en // n_docs AS BIGINT) AS raw_ppm, "
            "CAST(1000000 * (CAST(n_en AS HUGEINT) * nn + 50 * ee) "
            "// (CAST(nn AS HUGEINT) * (n_docs + 50)) AS BIGINT) "
            "AS shrunk_ppm, "
            "CAST(1000000 * (CAST(n_en AS HUGEINT) * nn + 50 * ee) "
            "// (CAST(nn AS HUGEINT) * (n_docs + 50)) "
            "- 1000000 * n_en // n_docs AS BIGINT) AS move_ppm "
            "FROM c, t"
        ),
        # Yule's Q: odds-ratio effect size, one sign-split floor
        "yule_q": (
            "WITH c AS (SELECT source, "
            "count(*) FILTER (WHERE lang = 'en' AND n_chars >= 300) "
            "AS a, "
            "count(*) FILTER (WHERE lang = 'en' AND n_chars < 300) "
            "AS b, "
            "count(*) FILTER (WHERE lang <> 'en' AND n_chars >= 300) "
            "AS c, "
            "count(*) FILTER (WHERE lang <> 'en' AND n_chars < 300) "
            "AS d FROM documents GROUP BY 1), "
            "x AS (SELECT source, a, b, c, d, "
            "CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS num, "
            "CAST(a AS HUGEINT) * d + CAST(b AS HUGEINT) * c AS den "
            "FROM c) "
            "SELECT source, CAST(a AS BIGINT) AS a, "
            "CAST(b AS BIGINT) AS b, CAST(c AS BIGINT) AS c, "
            "CAST(d AS BIGINT) AS d, "
            "CAST(" + _sql_ss("num", "den") + " AS BIGINT) AS q_ppm "
            "FROM x"
        ),
        # Kish n_eff over the IPF weights: the ppm scales cancel in
        # (S1)^2/S2; deff is its reciprocal times n
        "kish_neff": (
            "WITH c AS (SELECT source, lang, count(*) AS n_full, "
            "count(*) FILTER (WHERE (doc_id * 2654435761) "
            "% 4294967296 < 2147483648) AS n_samp "
            "FROM documents GROUP BY 1, 2), "
            "r AS (SELECT source, SUM(n_full) AS rs, "
            "SUM(n_samp) AS ms FROM c GROUP BY 1), "
            "l AS (SELECT lang, SUM(n_full) AS cl FROM c GROUP BY 1), "
            "w1 AS (SELECT c.source, c.lang, c.n_samp, "
            "CASE WHEN r.ms > 0 THEN 1000000 * r.rs // r.ms "
            "ELSE 0 END AS w1 FROM c JOIN r USING (source) "
            "WHERE c.n_samp > 0), "
            "t AS (SELECT lang, SUM(n_samp * w1) AS tl FROM w1 "
            "GROUP BY 1), "
            "w2 AS (SELECT w1.n_samp, "
            "CAST(w1.w1 AS HUGEINT) * 1000000 * l.cl // t.tl AS w "
            "FROM w1 JOIN l USING (lang) JOIN t USING (lang)), "
            "s AS (SELECT SUM(n_samp) AS n, "
            "SUM(CAST(n_samp AS HUGEINT) * w) AS s1, "
            "SUM(CAST(n_samp AS HUGEINT) * w * w) AS s2 FROM w2) "
            "SELECT CAST(n AS BIGINT) AS n_samp, "
            "CAST(1000 * s1 * s1 // s2 AS BIGINT) AS n_eff_milli, "
            "CAST(1000 * n * s2 // (s1 * s1) AS BIGINT) "
            "AS deff_milli FROM s"
        ),
        # CA trend: one-df ordered-proportions test, fully cleared
        "cochran_armitage": (
            "WITH u AS (SELECT user_id, count(*) AS n_ev, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS conv FROM events GROUP BY 1), "
            "nn AS (SELECT count(*) AS n FROM u), "
            "rk AS (SELECT conv, row_number() OVER "
            "(ORDER BY n_ev DESC, user_id) - 1 AS ri FROM u), "
            "d AS (SELECT 1 + 10 * ri // nn.n AS x, conv "
            "FROM rk, nn), "
            "gg AS (SELECT x, count(*) AS m, SUM(conv) AS rr "
            "FROM d GROUP BY 1), "
            "a AS (SELECT SUM(m) AS n, SUM(rr) AS rt, "
            "SUM(x * rr) AS sxr, SUM(x * m) AS sxn, "
            "SUM(x * x * m) AS sxxn FROM gg), "
            "b AS (SELECT n, rt, "
            "CAST(n AS HUGEINT) * sxr - CAST(rt AS HUGEINT) * sxn "
            "AS t, "
            "CAST(n AS HUGEINT) * sxxn - CAST(sxn AS HUGEINT) * sxn "
            "AS bb FROM a), "
            "c AS (SELECT n, rt, t, "
            "CAST(rt AS HUGEINT) * (n - rt) * bb AS den FROM b) "
            "SELECT CAST(n AS BIGINT) AS n, CAST(rt AS BIGINT) AS r, "
            "CAST(CASE WHEN t > 0 THEN 1 WHEN t < 0 THEN -1 "
            "ELSE 0 END AS BIGINT) AS trend_sign, "
            "CAST(CASE WHEN den > 0 THEN 1000 * n * t * t // den "
            "ELSE 0 END AS BIGINT) AS chi2_milli, "
            "CASE WHEN den > 0 THEN "
            "n * t * t * 1000000 > 3841459 * den ELSE FALSE END "
            "AS significant FROM c"
        ),
        # profit argmax over the descending score sweep; integer
        # objective, smallest threshold on ties
        "cost_threshold": (
            "WITH t AS (SELECT CAST(round(l_quantity) AS BIGINT) AS "
            "qty, SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
            "AS p, SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) "
            "AS ng FROM lineitem GROUP BY 1), "
            "tot AS (SELECT SUM(p) AS pt, SUM(ng) AS nt FROM t), "
            "c AS (SELECT qty, SUM(p) OVER (ORDER BY qty DESC "
            "ROWS UNBOUNDED PRECEDING) AS tp, SUM(ng) OVER "
            "(ORDER BY qty DESC ROWS UNBOUNDED PRECEDING) AS fp "
            "FROM t) "
            "SELECT CAST(qty AS BIGINT) AS threshold, "
            "CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, "
            "CAST(tot.pt - tp AS BIGINT) AS fn, "
            "CAST(tot.nt - fp AS BIGINT) AS tn, "
            "CAST(3 * tp - fp AS BIGINT) AS profit, "
            "CAST(3 * tot.pt - tot.nt AS BIGINT) AS profit_all "
            "FROM c, tot ORDER BY 3 * tp - fp DESC, qty ASC LIMIT 1"
        ),
        # 2-of-3 detector consensus on the dense grid; upward
        # breaches only, votes exposed
        "anomaly_ensemble": (
            "WITH " + _SQL_DENSE_GRID + ", "
            "st AS (SELECT event_type, count(*) AS m, SUM(c) AS s, "
            "SUM(c * c) AS q FROM dd GROUP BY 1), "
            "lg AS (SELECT event_type, abs(c - lag(c) OVER "
            "(PARTITION BY event_type ORDER BY hr)) AS d FROM dd), "
            "mr AS (SELECT event_type, SUM(d) AS mrsum FROM lg "
            "GROUP BY 1), "
            "hh AS (SELECT event_type, hr, c, "
            "(epoch_us(hr) // 3600000000) % 24 AS hod FROM dd), "
            "hstat AS (SELECT event_type, hod, count(*) AS mh, "
            "SUM(c) AS sh, SUM(c * c) AS qh FROM hh GROUP BY 1, 2), "
            "v AS (SELECT hh.event_type, hh.hr, hh.c, "
            "CASE WHEN st.m * hh.c - st.s > 0 AND "
            "(st.m * CAST(hh.c AS HUGEINT) - st.s) "
            "* (st.m * hh.c - st.s) "
            "> 9 * (st.m * CAST(st.q AS HUGEINT) "
            "- CAST(st.s AS HUGEINT) * st.s) THEN 1 ELSE 0 END AS vg, "
            "CASE WHEN st.m * hh.c - st.s > 0 AND "
            "100 * (st.m - 1) * (st.m * CAST(hh.c AS HUGEINT) - st.s) "
            "> 266 * st.m * CAST(mr.mrsum AS HUGEINT) "
            "THEN 1 ELSE 0 END AS vx, "
            "CASE WHEN h.mh * hh.c - h.sh > 0 AND "
            "(h.mh * CAST(hh.c AS HUGEINT) - h.sh) "
            "* (h.mh * hh.c - h.sh) "
            "> 9 * (h.mh * CAST(h.qh AS HUGEINT) "
            "- CAST(h.sh AS HUGEINT) * h.sh) THEN 1 ELSE 0 END AS vh "
            "FROM hh JOIN st USING (event_type) "
            "JOIN mr USING (event_type) "
            "JOIN hstat h ON h.event_type = hh.event_type "
            "AND h.hod = hh.hod) "
            "SELECT event_type, hr, CAST(c AS BIGINT) AS c, "
            "CAST(vg AS BIGINT) AS vote_global, "
            "CAST(vx AS BIGINT) AS vote_xmr, "
            "CAST(vh AS BIGINT) AS vote_hod, "
            "CAST(vg + vx + vh AS BIGINT) AS votes FROM v "
            "WHERE vg + vx + vh >= 2"
        ),
        # dyadic time-decay attribution: (diff-1)//600s bucket,
        # weight 2^(5-k), one floor per touch
        "attribution_decay": (
            "WITH conv AS (SELECT event_id AS cid, user_id, ts "
            "FROM events WHERE event_type = 'purchase'), "
            "tch AS (SELECT c.cid, e.event_type, "
            "(epoch_us(c.ts) - epoch_us(e.ts) - 1) // 600000000 AS k "
            "FROM events e JOIN conv c ON e.user_id = c.user_id "
            "AND e.event_type <> 'purchase' "
            "AND e.ts >= c.ts - INTERVAL 1 HOUR AND e.ts < c.ts), "
            "w AS (SELECT cid, event_type, "
            "CAST(1 AS BIGINT) << (5 - k) AS wt FROM tch), "
            "sw AS (SELECT cid, SUM(wt) AS swt FROM w GROUP BY 1) "
            "SELECT w.event_type, "
            "CAST(count(*) AS BIGINT) AS n_touches, "
            "CAST(SUM(1000000 * w.wt // sw.swt) AS BIGINT) "
            "AS credit_ppm FROM w JOIN sw USING (cid) GROUP BY 1"
        ),
        # harmonic exposure share vs item share over the top-100
        "exposure_fairness": (
            "WITH r AS (SELECT source, row_number() OVER "
            "(ORDER BY n_chars DESC, doc_id) AS rnk FROM documents "
            "QUALIFY rnk <= 100), "
            "t AS (SELECT source, count(*) AS n_topk, "
            "SUM(1000000 // rnk) AS exposure FROM r GROUP BY 1), "
            "tot AS (SELECT SUM(exposure) AS tw, SUM(n_topk) AS n "
            "FROM t) "
            "SELECT source, CAST(n_topk AS BIGINT) AS n_topk, "
            "CAST(exposure AS BIGINT) AS exposure, "
            "CAST(1000000 * exposure // tot.tw AS BIGINT) "
            "AS exp_share_ppm, "
            "CAST(1000000 * n_topk // tot.n AS BIGINT) "
            "AS item_share_ppm, "
            "CAST(1000000 * exposure // tot.tw "
            "- 1000000 * n_topk // tot.n AS BIGINT) AS disparity_ppm "
            "FROM t, tot"
        ),
        # QTE: per-arm exact histogram quantiles at ceil(p*n)
        "qte_quantiles": (
            "WITH p AS (SELECT CAST(round(value * 100) AS BIGINT) "
            "AS cents, (user_id * 2654435761) % 4294967296 "
            "< 2147483648 AS t FROM events "
            "WHERE event_type = 'purchase'), "
            "h AS (SELECT cents, t, count(*) AS n FROM p "
            "GROUP BY 1, 2), "
            "c AS (SELECT cents, t, SUM(n) OVER "
            "(PARTITION BY t ORDER BY cents) AS cum, "
            "SUM(n) OVER (PARTITION BY t) AS tot FROM h), "
            "q AS (SELECT pp.p, c.t, min(c.cents) AS v "
            "FROM (VALUES (25), (50), (75), (90)) pp(p) "
            "JOIN c ON c.cum >= (pp.p * c.tot + 99) // 100 "
            "GROUP BY 1, 2) "
            "SELECT CAST(q.p AS BIGINT) AS p_pct, "
            "CAST(max(CASE WHEN t THEN v END) AS BIGINT) "
            "AS v_treat_cents, "
            "CAST(max(CASE WHEN NOT t THEN v END) AS BIGINT) "
            "AS v_ctrl_cents, "
            "CAST(max(CASE WHEN t THEN v END) "
            "- max(CASE WHEN NOT t THEN v END) AS BIGINT) "
            "AS qte_cents FROM q GROUP BY 1"
        ),
        # newsvendor: critical-fractile rank picks + exact histogram
        # cost sums at both stock levels
        "newsvendor_stock": (
            "WITH h AS (SELECT l_returnflag AS flag, "
            "CAST(round(l_quantity) AS BIGINT) AS d, count(*) AS n "
            "FROM lineitem GROUP BY 1, 2), "
            "t AS (SELECT flag, SUM(n) AS tot FROM h GROUP BY 1), "
            "c AS (SELECT flag, d, n, SUM(n) OVER "
            "(PARTITION BY flag ORDER BY d) AS cum FROM h), "
            "so AS (SELECT c.flag, min(c.d) AS s FROM c "
            "JOIN t USING (flag) "
            "WHERE c.cum >= (3 * t.tot + 3) // 4 GROUP BY 1), "
            "sm AS (SELECT c.flag, min(c.d) AS s FROM c "
            "JOIN t USING (flag) "
            "WHERE c.cum >= (t.tot + 1) // 2 GROUP BY 1), "
            "xo AS (SELECT h.flag, SUM(h.n * "
            "(1 * greatest(so.s - h.d, 0) "
            "+ 3 * greatest(h.d - so.s, 0))) AS cost FROM h "
            "JOIN so USING (flag) GROUP BY 1), "
            "xm AS (SELECT h.flag, SUM(h.n * "
            "(1 * greatest(sm.s - h.d, 0) "
            "+ 3 * greatest(h.d - sm.s, 0))) AS cost FROM h "
            "JOIN sm USING (flag) GROUP BY 1) "
            "SELECT t.flag, CAST(t.tot AS BIGINT) AS n, "
            "CAST(so.s AS BIGINT) AS stock_opt, "
            "CAST(xo.cost AS BIGINT) AS cost_opt, "
            "CAST(sm.s AS BIGINT) AS stock_median, "
            "CAST(xm.cost AS BIGINT) AS cost_median "
            "FROM t JOIN so USING (flag) JOIN sm USING (flag) "
            "JOIN xo USING (flag) JOIN xm USING (flag)"
        ),
        "competing_risks": _SQL_CIF,
        # 5 interim looks on the corpus-day grid, Bonferroni boundary
        "sequential_looks": (
            "WITH sp AS (SELECT min(epoch_us(ts) // 86400000000) "
            "AS d0, max(epoch_us(ts) // 86400000000) AS d1 "
            "FROM events), "
            "u AS (SELECT user_id, "
            "min(epoch_us(ts) // 86400000000) AS fd, "
            "min(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN epoch_us(ts) // 86400000000 "
            "ELSE 1099511627776 END) AS cd, "
            "(user_id * 2654435761) % 4294967296 < 2147483648 AS tr "
            "FROM events GROUP BY 1, 4), "
            "lk AS (SELECT k, sp.d0 + ((sp.d1 - sp.d0 + 1) * k + 4) "
            "// 5 - 1 AS cut FROM "
            "(SELECT unnest(generate_series(1, 5)) AS k), sp), "
            "g AS (SELECT lk.k AS look, "
            "count(*) FILTER (WHERE u.fd <= lk.cut AND u.tr "
            "AND u.cd <= lk.cut) AS a, "
            "count(*) FILTER (WHERE u.fd <= lk.cut AND u.tr "
            "AND u.cd > lk.cut) AS b, "
            "count(*) FILTER (WHERE u.fd <= lk.cut AND NOT u.tr "
            "AND u.cd <= lk.cut) AS c, "
            "count(*) FILTER (WHERE u.fd <= lk.cut AND NOT u.tr "
            "AND u.cd > lk.cut) AS d FROM lk, u GROUP BY 1), "
            "f AS (SELECT look, a + b + c + d AS n, a + c AS conv, "
            "CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS num, "
            "CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d) "
            "AS den FROM g) "
            "SELECT CAST(look AS BIGINT) AS look, "
            "CAST(n AS BIGINT) AS n, CAST(conv AS BIGINT) AS n_conv, "
            "CAST(CASE WHEN den > 0 THEN "
            "1000 * n * num * num // den ELSE 0 END AS BIGINT) "
            "AS chi2_milli, "
            "CASE WHEN den > 0 THEN "
            "n * num * num * 1000000 > 6634897 * den ELSE FALSE END "
            "AS crossed FROM f"
        ),
        # Holm step-down over 5 metrics: ordered crits, min-pass scan
        "holm_bonferroni": (
            "WITH u AS (SELECT user_id, count(*) AS n_ev, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS conv, "
            "max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
            "AS err, "
            "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
            "AS clk, "
            "count(*) FILTER (WHERE event_type = 'purchase') AS np, "
            "(user_id * 2654435761) % 4294967296 < 2147483648 AS tr "
            "FROM events GROUP BY 1, 7), "
            "m AS (SELECT 'converted' AS metric, conv = 1 AS y, tr "
            "FROM u UNION ALL "
            "SELECT 'any_error', err = 1, tr FROM u UNION ALL "
            "SELECT 'any_click', clk = 1, tr FROM u UNION ALL "
            "SELECT 'repeat_buyer', np >= 12, tr FROM u UNION ALL "
            "SELECT 'high_activity', n_ev >= 66, tr FROM u), "
            "g AS (SELECT metric, "
            "count(*) FILTER (WHERE tr AND y) AS a, "
            "count(*) FILTER (WHERE tr AND NOT y) AS b, "
            "count(*) FILTER (WHERE NOT tr AND y) AS c, "
            "count(*) FILTER (WHERE NOT tr AND NOT y) AS d "
            "FROM m GROUP BY 1), "
            "f AS (SELECT metric, a + b + c + d AS n, "
            "CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS num, "
            "CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d) "
            "AS den FROM g), "
            "s AS (SELECT metric, CASE WHEN den > 0 THEN "
            "1000 * n * num * num // den ELSE 0 END AS chi2, "
            "n * num * num AS lhs, den, row_number() OVER "
            "(ORDER BY CASE WHEN den > 0 THEN "
            "1000 * n * num * num // den ELSE 0 END DESC, metric) "
            "AS rnk FROM f), "
            "p AS (SELECT metric, rnk, chi2, CASE rnk "
            "WHEN 1 THEN 6634897 WHEN 2 THEN 6238804 "
            "WHEN 3 THEN 5731305 WHEN 4 THEN 5023886 "
            "ELSE 3841459 END AS crit, "
            "den > 0 AND lhs * 1000000 > (CASE rnk "
            "WHEN 1 THEN 6634897 WHEN 2 THEN 6238804 "
            "WHEN 3 THEN 5731305 WHEN 4 THEN 5023886 "
            "ELSE 3841459 END) * den AS pass FROM s) "
            "SELECT metric, CAST(rnk AS BIGINT) AS rank, "
            "CAST(chi2 AS BIGINT) AS chi2_milli, "
            "CAST(crit AS BIGINT) AS crit_ppm, "
            "min(CASE WHEN pass THEN 1 ELSE 0 END) OVER "
            "(ORDER BY rnk ROWS UNBOUNDED PRECEDING) = 1 AS rejected "
            "FROM p"
        ),
        # doubled midranks from the value histogram; one floor per
        # group on R'^2/n_j; chi2_2 crit cross-multiplied in micro
        "kruskal_wallis": (
            "WITH t AS (SELECT CAST(round(l_quantity) AS BIGINT) AS "
            "qty, l_returnflag AS flag, count(*) AS n FROM lineitem "
            "GROUP BY 1, 2), "
            "v AS (SELECT qty, SUM(n) AS nv FROM t GROUP BY 1), "
            "c AS (SELECT qty, 2 * (SUM(nv) OVER (ORDER BY qty "
            "ROWS UNBOUNDED PRECEDING) - nv) + nv + 1 AS rp FROM v), "
            "g AS (SELECT t.flag, SUM(t.n) AS n_grp, "
            "SUM(CAST(t.n AS HUGEINT) * c.rp) AS rsum2 "
            "FROM t JOIN c USING (qty) GROUP BY 1), "
            "s AS (SELECT SUM(n_grp) AS n, "
            "SUM(CAST(rsum2 AS HUGEINT) * rsum2 // n_grp) AS sq "
            "FROM g), "
            "f AS (SELECT n, 3000 * sq - 3000 * CAST(n AS HUGEINT) "
            "* (n + 1) * (n + 1) AS num, "
            "3000000 * sq - 3000000 * CAST(n AS HUGEINT) * (n + 1) "
            "* (n + 1) > 5991465 * CAST(n AS HUGEINT) * (n + 1) "
            "AS sig FROM s) "
            "SELECT g.flag, CAST(g.n_grp AS BIGINT) AS n_grp, "
            "CAST(g.rsum2 AS BIGINT) AS rsum2, "
            "CAST(CASE WHEN f.num < 0 THEN 0 ELSE "
            "f.num // (CAST(f.n AS HUGEINT) * (f.n + 1)) END "
            "AS BIGINT) AS h_milli, f.sig AS significant "
            "FROM g, f"
        ),
        # planted 4-rater census: ambiguous POs 2 purchase_order +
        # 2 data_report, all other rows unanimous; trunc-to-zero kappa
        "fleiss_kappa": (
            "WITH d AS (SELECT doc_id, "
            "CASE WHEN doc_id % 97 <> 0 AND doc_id % 5 = 2 THEN "
            "CASE WHEN doc_id % 20 = 12 THEN 2 ELSE 4 END "
            "ELSE 0 END AS n_po, "
            "CASE WHEN doc_id % 97 <> 0 AND doc_id % 5 IN (0, 3) "
            "THEN 4 WHEN doc_id % 97 <> 0 AND doc_id % 5 = 2 "
            "AND doc_id % 20 = 12 THEN 2 ELSE 0 END AS n_rep, "
            "CASE WHEN doc_id % 97 <> 0 AND doc_id % 5 <> 2 "
            "AND doc_id % 5 <> 0 AND doc_id % 5 <> 3 "
            "AND doc_id % 10 = 4 THEN 4 ELSE 0 END AS n_inv "
            "FROM documents), "
            "e AS (SELECT doc_id, n_po, n_rep, n_inv, "
            "4 - n_po - n_rep - n_inv AS n_unc FROM d), "
            "a AS (SELECT count(*) AS n, "
            "SUM(n_po * n_po + n_rep * n_rep + n_inv * n_inv "
            "+ n_unc * n_unc) AS s, "
            "SUM(n_po) AS cpo, SUM(n_rep) AS crep, "
            "SUM(n_inv) AS cinv, SUM(n_unc) AS cunc FROM e), "
            "b AS (SELECT n, s, 4 * n AS m, "
            "CAST(cpo AS HUGEINT) * cpo + CAST(crep AS HUGEINT) "
            "* crep + CAST(cinv AS HUGEINT) * cinv "
            "+ CAST(cunc AS HUGEINT) * cunc AS t FROM a), "
            "f AS (SELECT n, s, m, t, "
            "CAST(m AS HUGEINT) * (s - m) - 3 * t AS num, "
            "3 * (CAST(m AS HUGEINT) * m - t) AS den FROM b) "
            "SELECT CAST(n AS BIGINT) AS n_items, "
            "CAST(s AS BIGINT) AS s_sq, "
            "CAST(1000000 * CAST(s - m AS HUGEINT) // (3 * m) "
            "AS BIGINT) AS pbar_ppm, "
            "CAST(1000000 * t // (CAST(m AS HUGEINT) * m) "
            "AS BIGINT) AS pe_ppm, "
            "CAST(CASE WHEN den = 0 THEN 1000 "
            "ELSE 1000 * num // den END AS BIGINT) AS kappa_milli "
            "FROM f"
        ),
        # dyadic persistence weights 1e6 >> rnk (exact: 2^5 | 1e6)
        "rbp_eval": (
            "WITH " + _SQL_BM25_CORE + ", "
            "qn AS (SELECT query_id, count(*) AS nt FROM qt GROUP BY 1), "
            "tm AS (SELECT qt.query_id, tf.doc_id, count(*) AS nmatch "
            "FROM qt JOIN tf ON tf.t = qt.t GROUP BY 1, 2), "
            "relall AS (SELECT tm.query_id, tm.doc_id FROM tm "
            "JOIN qn USING (query_id) WHERE tm.nmatch = qn.nt), "
            "rr AS (SELECT r.query_id, r.rnk, "
            "CASE WHEN relall.doc_id IS NULL THEN 0 ELSE 1 END AS rel "
            "FROM r LEFT JOIN relall ON relall.query_id = r.query_id "
            "AND relall.doc_id = r.doc_id WHERE r.rnk <= 5), "
            "ag AS (SELECT query_id, SUM(rel) AS n_rel, "
            "SUM(rel * (1000000 // (CAST(1 AS BIGINT) << rnk))) "
            "AS rbp FROM rr GROUP BY 1) "
            "SELECT q.query_id, "
            "CAST(coalesce(ag.n_rel, 0) AS BIGINT) AS n_rel_topk, "
            "CAST(coalesce(ag.rbp, 0) AS BIGINT) AS rbp_ppm "
            "FROM (SELECT DISTINCT query_id FROM qt) q "
            "LEFT JOIN ag USING (query_id)"
        ),
        # cascade model: credit 1e6 // (rnk * 2^(j+1)), j = relevant
        # docs ranked above; one floor per term
        "err_eval": (
            "WITH " + _SQL_BM25_CORE + ", "
            "qn AS (SELECT query_id, count(*) AS nt FROM qt GROUP BY 1), "
            "tm AS (SELECT qt.query_id, tf.doc_id, count(*) AS nmatch "
            "FROM qt JOIN tf ON tf.t = qt.t GROUP BY 1, 2), "
            "relall AS (SELECT tm.query_id, tm.doc_id FROM tm "
            "JOIN qn USING (query_id) WHERE tm.nmatch = qn.nt), "
            "rr AS (SELECT r.query_id, r.rnk, "
            "CASE WHEN relall.doc_id IS NULL THEN 0 ELSE 1 END AS rel "
            "FROM r LEFT JOIN relall ON relall.query_id = r.query_id "
            "AND relall.doc_id = r.doc_id WHERE r.rnk <= 5), "
            "jj AS (SELECT query_id, rnk, rel, "
            "coalesce(SUM(rel) OVER (PARTITION BY query_id "
            "ORDER BY rnk ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS jprev FROM rr), "
            "ag AS (SELECT query_id, SUM(rel) AS n_rel, "
            "SUM(CASE WHEN rel = 1 THEN 1000000 // "
            "(rnk * (CAST(1 AS BIGINT) << (jprev + 1))) "
            "ELSE 0 END) AS err FROM jj GROUP BY 1) "
            "SELECT q.query_id, "
            "CAST(coalesce(ag.n_rel, 0) AS BIGINT) AS n_rel_topk, "
            "CAST(coalesce(ag.err, 0) AS BIGINT) AS err_ppm "
            "FROM (SELECT DISTINCT query_id FROM qt) q "
            "LEFT JOIN ag USING (query_id)"
        ),
        # Chao1 bias-corrected + Turing coverage from the
        # freq-of-freq counts; whitespace tokens, empties dropped
        "species_richness": (
            "WITH tok AS (SELECT unnest(list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '')) AS t "
            "FROM documents), "
            "tf AS (SELECT t, count(*) AS n FROM tok GROUP BY 1), "
            "a AS (SELECT count(*) AS s_obs, SUM(n) AS n, "
            "count(*) FILTER (WHERE n = 1) AS f1, "
            "count(*) FILTER (WHERE n = 2) AS f2 FROM tf) "
            "SELECT CAST(n AS BIGINT) AS n_tokens, "
            "CAST(s_obs AS BIGINT) AS vocab, "
            "CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2, "
            "CAST(s_obs + f1 * (f1 - 1) // (2 * (f2 + 1)) AS BIGINT) "
            "AS chao1, "
            "CAST(1000000 * (n - f1) // n AS BIGINT) AS coverage_ppm "
            "FROM a"
        ),
        # Murphy split at EXACT forecast levels; per-level floors on
        # REL/RES, HUGEINT for the 1e12-scaled squares
        "brier_decomp": (
            "WITH u AS (SELECT user_id, count(*) AS n_ev, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS conv FROM events GROUP BY 1), "
            "s AS (SELECT greatest(0, least(1000000, "
            "(n_ev - 40) * 20000)) AS p, conv FROM u), "
            "l AS (SELECT p, count(*) AS n, SUM(conv) AS c "
            "FROM s GROUP BY 1), "
            "t AS (SELECT SUM(n) AS nn, SUM(c) AS cc FROM l), "
            "f AS (SELECT "
            "SUM((l.n - l.c) * CAST(l.p AS HUGEINT) * l.p "
            "+ l.c * CAST(l.p - 1000000 AS HUGEINT) "
            "* (l.p - 1000000)) AS brier, "
            "SUM(CAST(l.n * l.p - 1000000 * l.c AS HUGEINT) "
            "* (l.n * l.p - 1000000 * l.c) // l.n) AS rel, "
            "SUM(1000000000000 * CAST(l.c * t.nn - l.n * t.cc "
            "AS HUGEINT) * (l.c * t.nn - l.n * t.cc) "
            "// (l.n * CAST(t.nn AS HUGEINT) * t.nn)) AS res, "
            "count(*) AS n_levels FROM l, t GROUP BY ALL), "
            "m AS (SELECT t.nn, f.n_levels, "
            "f.brier // t.nn AS b, f.rel // t.nn AS r1, "
            "f.res // t.nn AS r2, "
            "(1000000000000 * CAST(t.cc AS HUGEINT) * (t.nn - t.cc) "
            "// t.nn) // t.nn AS u FROM f, t) "
            "SELECT CAST(nn AS BIGINT) AS n_users, "
            "CAST(n_levels AS BIGINT) AS n_levels, "
            "CAST(b AS BIGINT) AS brier_ppm2, "
            "CAST(r1 AS BIGINT) AS rel_ppm2, "
            "CAST(r2 AS BIGINT) AS res_ppm2, "
            "CAST(u AS BIGINT) AS unc_ppm2, "
            "CAST(b - (r1 - r2 + u) AS BIGINT) AS gap_ppm2 FROM m"
        ),
        # half-split per-user diffs, zeros dropped; doubled midranks
        # on |d|; var12 = 2n(n+1)(2n+1) - T3 exact, no floor
        "wilcoxon_signed": (
            "WITH tt AS (SELECT min(epoch_us(ts)) AS t0, "
            "max(epoch_us(ts)) AS t1 FROM events), "
            "u AS (SELECT user_id, "
            "count(*) FILTER (WHERE epoch_us(ts) >= "
            "(tt.t0 + tt.t1 + 1) // 2) "
            "- count(*) FILTER (WHERE epoch_us(ts) < "
            "(tt.t0 + tt.t1 + 1) // 2) AS d "
            "FROM events, tt GROUP BY 1, tt.t0, tt.t1), "
            "nz AS (SELECT d, abs(d) AS ad FROM u WHERE d <> 0), "
            "v AS (SELECT ad, count(*) AS nv FROM nz GROUP BY 1), "
            "c AS (SELECT ad, 2 * (SUM(nv) OVER (ORDER BY ad "
            "ROWS UNBOUNDED PRECEDING) - nv) + nv + 1 AS rp FROM v), "
            "t3 AS (SELECT coalesce(SUM(nv * nv * nv - nv), 0) "
            "AS t3, coalesce(SUM(nv), 0) AS n FROM v), "
            "w AS (SELECT coalesce(SUM(c.rp), 0) AS w2 FROM nz "
            "JOIN c USING (ad) WHERE nz.d > 0), "
            "f AS (SELECT t3.n, w.w2, t3.t3, "
            "w.w2 - t3.n * (t3.n + 1) // 2 AS dd, "
            "2 * CAST(t3.n AS HUGEINT) * (t3.n + 1) * (2 * t3.n + 1) "
            "- t3.t3 AS var12 FROM w, t3) "
            "SELECT CAST(n AS BIGINT) AS n_nonzero, "
            "CAST(w2 AS BIGINT) AS w2_pos, "
            "CAST(t3 AS BIGINT) AS t3, "
            "CAST(var12 AS BIGINT) AS var12, "
            "CAST(CASE WHEN var12 > 0 THEN "
            "12000 * CAST(dd AS HUGEINT) * dd // var12 ELSE 0 END "
            "AS BIGINT) AS z2_milli, "
            "CAST(CASE WHEN dd > 0 THEN 1 WHEN dd < 0 THEN -1 "
            "ELSE 0 END AS BIGINT) AS shift_sign, "
            "CASE WHEN var12 > 0 THEN 12000000 "
            "* CAST(dd AS HUGEINT) * dd > 3841459 * var12 "
            "ELSE FALSE END AS significant FROM f"
        ),
        # the km day histogram WITHOUT the recursive chain — NA's
        # floors SUM, so a window cumsum is the whole mirror
        "nelson_aalen": (
            "WITH u AS (SELECT user_id, min(epoch_us(ts)) AS f, "
            "max(epoch_us(ts)) AS l FROM events GROUP BY 1), "
            "mx AS (SELECT max(epoch_us(ts)) AS m FROM events), "
            "lt AS (SELECT (l - f) // 86400000000 AS ld, "
            "(mx.m - l) >= 21600000000 AS obs FROM u, mx), "
            "dd AS (SELECT unnest(generate_series(0, 29)) AS day), "
            "g AS (SELECT dd.day, "
            "count(*) FILTER (WHERE lt.ld >= dd.day) AS atrisk, "
            "count(*) FILTER (WHERE lt.obs AND lt.ld = dd.day) "
            "AS deaths FROM dd, lt GROUP BY 1), "
            "h AS (SELECT day, atrisk, deaths, "
            "CASE WHEN atrisk > 0 THEN 1000000 * deaths // atrisk "
            "ELSE 0 END AS hz FROM g) "
            "SELECT CAST(day AS BIGINT) AS day, "
            "CAST(atrisk AS BIGINT) AS at_risk, "
            "CAST(deaths AS BIGINT) AS deaths, "
            "CAST(hz AS BIGINT) AS hazard_ppm, "
            "CAST(SUM(hz) OVER (ORDER BY day "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumhaz_ppm "
            "FROM h"
        ),
        # days×types grid + day self-join for beats + transposed
        # pair join for the copeland sign sum — no floors anywhere
        "copeland_rank": (
            "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "event_type FROM events), "
            "c AS (SELECT day, event_type, count(*) AS n "
            "FROM e GROUP BY 1, 2), "
            "dd AS (SELECT DISTINCT day FROM e), "
            "tt AS (SELECT DISTINCT event_type FROM e), "
            "g AS (SELECT dd.day, tt.event_type, "
            "coalesce(c.n, 0) AS n FROM dd CROSS JOIN tt "
            "LEFT JOIN c ON c.day = dd.day "
            "AND c.event_type = tt.event_type), "
            "p AS (SELECT a.event_type AS ca, b.event_type AS cb, "
            "count(*) FILTER (WHERE a.n > b.n) AS beats "
            "FROM g a JOIN g b ON a.day = b.day "
            "AND a.event_type <> b.event_type GROUP BY 1, 2), "
            "m AS (SELECT p.ca AS event_type, "
            "SUM(p.beats) AS support, "
            "SUM(CASE WHEN p.beats > q.beats THEN 1 "
            "WHEN p.beats < q.beats THEN -1 ELSE 0 END) AS copeland, "
            "SUM(CASE WHEN p.beats > q.beats THEN 1 ELSE 0 END) "
            "AS wins FROM p JOIN p q ON p.ca = q.cb AND p.cb = q.ca "
            "GROUP BY 1), "
            "k AS (SELECT count(*) AS k FROM tt) "
            "SELECT event_type, "
            "CAST(row_number() OVER (ORDER BY copeland DESC, "
            "support DESC, event_type) AS BIGINT) AS rank, "
            "CAST(support AS BIGINT) AS support, "
            "CAST(copeland AS BIGINT) AS copeland, "
            "wins = k.k - 1 AS is_condorcet FROM m, k"
        ),
        # gap-filled calendar + lag(1)/lag(7) windows; the DM fold
        # cross-multiplies n·S² against n·Q − S² exactly
        "dm_test": (
            "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day "
            "FROM events), "
            "c AS (SELECT day, count(*) AS n FROM e GROUP BY 1), "
            "b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e), "
            "g AS (SELECT unnest(generate_series(b.d0, b.d1)) "
            "AS day FROM b), "
            "y AS (SELECT g.day, coalesce(c.n, 0) AS n "
            "FROM g LEFT JOIN c USING (day)), "
            "l AS (SELECT day, n, lag(n, 1) OVER (ORDER BY day) "
            "AS p1, lag(n, 7) OVER (ORDER BY day) AS p7 FROM y), "
            "d AS (SELECT abs(n - p1) AS e1, abs(n - p7) AS e2, "
            "abs(n - p1) - abs(n - p7) AS dt FROM l "
            "WHERE p7 IS NOT NULL), "
            "f AS (SELECT count(*) AS ne, "
            "coalesce(SUM(e1), 0) AS l1, coalesce(SUM(e2), 0) AS l2, "
            "coalesce(SUM(dt), 0) AS s, "
            "coalesce(SUM(CAST(dt AS HUGEINT) * dt), 0) AS q FROM d), "
            "b2 AS (SELECT d1 - d0 + 1 AS nd FROM b) "
            "SELECT CAST(b2.nd AS BIGINT) AS n_days, "
            "CAST(f.ne AS BIGINT) AS n_eval, "
            "CAST(f.l1 AS BIGINT) AS loss_naive, "
            "CAST(f.l2 AS BIGINT) AS loss_seasonal, "
            "CAST(f.s AS BIGINT) AS s_d, "
            "CAST(f.q AS BIGINT) AS q_d, "
            "CAST(CASE WHEN f.ne * f.q - CAST(f.s AS HUGEINT) * f.s "
            "> 0 THEN 1000 * f.ne * CAST(f.s AS HUGEINT) * f.s "
            "// (f.ne * f.q - CAST(f.s AS HUGEINT) * f.s) "
            "ELSE 0 END AS BIGINT) AS z2_milli, "
            "CAST(CASE WHEN f.s > 0 THEN 1 WHEN f.s < 0 THEN -1 "
            "ELSE 0 END AS BIGINT) AS better_sign, "
            "CASE WHEN f.ne * f.q - CAST(f.s AS HUGEINT) * f.s > 0 "
            "THEN 1000000 * f.ne * CAST(f.s AS HUGEINT) * f.s "
            "> 3841459 * (f.ne * f.q - CAST(f.s AS HUGEINT) * f.s) "
            "ELSE FALSE END AS significant FROM f, b2"
        ),
        # same cleared-chi2 chain as holm; step-UP via window MAX of
        # passing ranks; chi2_1 crits at alpha*i/m
        "bh_fdr": (
            "WITH u AS (SELECT user_id, count(*) AS n_ev, "
            "max(CASE WHEN event_type = 'purchase' AND value >= 150 "
            "THEN 1 ELSE 0 END) AS conv, "
            "max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
            "AS err, "
            "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
            "AS clk, "
            "count(*) FILTER (WHERE event_type = 'purchase') AS np, "
            "(user_id * 2654435761) % 4294967296 < 2147483648 AS tr "
            "FROM events GROUP BY 1, 7), "
            "m AS (SELECT 'converted' AS metric, conv = 1 AS y, tr "
            "FROM u UNION ALL "
            "SELECT 'any_error', err = 1, tr FROM u UNION ALL "
            "SELECT 'any_click', clk = 1, tr FROM u UNION ALL "
            "SELECT 'repeat_buyer', np >= 12, tr FROM u UNION ALL "
            "SELECT 'high_activity', n_ev >= 66, tr FROM u), "
            "g AS (SELECT metric, "
            "count(*) FILTER (WHERE tr AND y) AS a, "
            "count(*) FILTER (WHERE tr AND NOT y) AS b, "
            "count(*) FILTER (WHERE NOT tr AND y) AS c, "
            "count(*) FILTER (WHERE NOT tr AND NOT y) AS d "
            "FROM m GROUP BY 1), "
            "f AS (SELECT metric, a + b + c + d AS n, "
            "CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS num, "
            "CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d) "
            "AS den FROM g), "
            "s AS (SELECT metric, CASE WHEN den > 0 THEN "
            "1000 * n * num * num // den ELSE 0 END AS chi2, "
            "n * num * num AS lhs, den, row_number() OVER "
            "(ORDER BY CASE WHEN den > 0 THEN "
            "1000 * n * num * num // den ELSE 0 END DESC, metric) "
            "AS rnk FROM f), "
            "p AS (SELECT metric, rnk, chi2, CASE rnk "
            "WHEN 1 THEN 6634897 WHEN 2 THEN 5411894 "
            "WHEN 3 THEN 4709292 WHEN 4 THEN 4217885 "
            "ELSE 3841459 END AS crit, "
            "den > 0 AND lhs * 1000000 > (CASE rnk "
            "WHEN 1 THEN 6634897 WHEN 2 THEN 5411894 "
            "WHEN 3 THEN 4709292 WHEN 4 THEN 4217885 "
            "ELSE 3841459 END) * den AS pass FROM s), "
            "q AS (SELECT metric, rnk, chi2, crit, "
            "max(CASE WHEN pass THEN rnk ELSE 0 END) OVER () "
            "AS istar FROM p) "
            "SELECT metric, CAST(rnk AS BIGINT) AS rank, "
            "CAST(chi2 AS BIGINT) AS chi2_milli, "
            "CAST(crit AS BIGINT) AS crit_ppm, "
            "rnk <= istar AS rejected FROM q"
        ),
        # per-day distinct/min/max histogram + lag boundary merges;
        # byte models and the (bytes, label) arg-min
        "rle_advisor": " UNION ALL ".join(
            "SELECT '" + c + "' AS col, CAST(s.n AS BIGINT) AS n, "
            "CAST(s.k AS BIGINT) AS n_distinct, "
            "CAST(r.runs AS BIGINT) AS n_runs, "
            "CAST(s.n AS BIGINT) AS raw_bytes, "
            "CAST(5 * r.runs AS BIGINT) AS rle_bytes, "
            "CAST(8 * s.k + (s.n * (CASE WHEN s.k <= 2 THEN 1 "
            "WHEN s.k <= 4 THEN 2 WHEN s.k <= 8 THEN 3 "
            "WHEN s.k <= 16 THEN 4 WHEN s.k <= 32 THEN 5 "
            "WHEN s.k <= 64 THEN 6 WHEN s.k <= 128 THEN 7 "
            "ELSE 8 END) + 7) // 8 AS BIGINT) AS dict_bytes, "
            "CASE WHEN 8 * s.k + (s.n * (CASE WHEN s.k <= 2 THEN 1 "
            "WHEN s.k <= 4 THEN 2 WHEN s.k <= 8 THEN 3 "
            "WHEN s.k <= 16 THEN 4 WHEN s.k <= 32 THEN 5 "
            "WHEN s.k <= 64 THEN 6 WHEN s.k <= 128 THEN 7 "
            "ELSE 8 END) + 7) // 8 <= s.n AND 8 * s.k + (s.n * "
            "(CASE WHEN s.k <= 2 THEN 1 WHEN s.k <= 4 THEN 2 "
            "WHEN s.k <= 8 THEN 3 WHEN s.k <= 16 THEN 4 "
            "WHEN s.k <= 32 THEN 5 WHEN s.k <= 64 THEN 6 "
            "WHEN s.k <= 128 THEN 7 ELSE 8 END) + 7) // 8 "
            "<= 5 * r.runs THEN 'dict' "
            "WHEN s.n <= 5 * r.runs THEN 'raw' ELSE 'rle' END "
            "AS best FROM "
            "(SELECT count(*) AS n, count(DISTINCT " + c + ") AS k "
            "FROM lineitem) s, "
            "(SELECT SUM(kd) - SUM(m) AS runs FROM "
            "(SELECT kd, CASE WHEN lag(mx) OVER (ORDER BY day) = mn "
            "THEN 1 ELSE 0 END AS m FROM "
            "(SELECT date_trunc('day', l_shipdate) AS day, "
            "count(DISTINCT " + c + ") AS kd, min(" + c + ") AS mn, "
            "max(" + c + ") AS mx FROM lineitem GROUP BY 1))) r"
            for c in ("l_returnflag", "l_linestatus")),
        # token islands by boundary-hash shifted cumsum; distinct
        # (key, chars) pairs carry the stored-bytes side
        "cdc_chunks": (
            "WITH d AS (SELECT doc_id, list_filter("
            "string_split_regex(coalesce(text, ''), '\\s+'), "
            "x -> x <> '') AS toks FROM documents), "
            "t AS (SELECT doc_id, generate_subscripts(toks, 1) AS i, "
            "unnest(toks) AS tok FROM d), "
            "h AS (SELECT doc_id, i, tok, "
            + _sql_md5_le64("tok") + " % 16 = 0 AS b FROM t), "
            "isl AS (SELECT doc_id, i, tok, coalesce(SUM(CASE WHEN b "
            "THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY i "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS island FROM h), "
            "ch AS (SELECT doc_id, island, "
            "string_agg(tok, ' ' ORDER BY i) AS chunk FROM isl "
            "GROUP BY 1, 2), "
            "ck AS (SELECT " + _sql_md5_le64("chunk") + " AS key, "
            "length(chunk) AS chars FROM ch), "
            "a AS (SELECT count(*) AS total_chunks, "
            "coalesce(SUM(chars), 0) AS total_chars FROM ck), "
            "b2 AS (SELECT count(*) AS distinct_chunks, "
            "coalesce(SUM(chars), 0) AS distinct_chars "
            "FROM (SELECT DISTINCT key, chars FROM ck)), "
            "nd AS (SELECT count(*) AS n_docs FROM documents) "
            "SELECT CAST(nd.n_docs AS BIGINT) AS n_docs, "
            "CAST(a.total_chunks AS BIGINT) AS total_chunks, "
            "CAST(b2.distinct_chunks AS BIGINT) AS distinct_chunks, "
            "CAST(a.total_chars AS BIGINT) AS total_chars, "
            "CAST(b2.distinct_chars AS BIGINT) AS distinct_chars, "
            "CAST(CASE WHEN a.total_chars > 0 THEN 1000000 "
            "* (a.total_chars - b2.distinct_chars) // a.total_chars "
            "ELSE 0 END AS BIGINT) AS dedup_ratio_ppm "
            "FROM a, b2, nd"
        ),
        # stopword islands; per-word deg/freq floors; phrase score
        # summed per instance, MAX over identical strings
        "rake_keyphrases": (
            "WITH d AS (SELECT doc_id, list_filter("
            "string_split_regex(coalesce(text, ''), '\\s+'), "
            "x -> x <> '') AS toks FROM documents), "
            "t AS (SELECT doc_id, generate_subscripts(toks, 1) AS i, "
            "unnest(toks) AS tok FROM d), "
            "s AS (SELECT doc_id, i, tok, tok IN ("
            + ", ".join(f"'{w}'" for w in _RAKE_STOPWORDS)
            + ") AS stop FROM t), "
            "isl AS (SELECT doc_id, i, tok, stop, "
            "coalesce(SUM(CASE WHEN stop THEN 1 ELSE 0 END) OVER "
            "(PARTITION BY doc_id ORDER BY i ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING), 0) AS island FROM s), "
            "pw AS (SELECT doc_id, island, i, tok, count(*) OVER "
            "(PARTITION BY doc_id, island) AS plen FROM isl "
            "WHERE NOT stop), "
            "ws AS (SELECT tok, count(*) AS freq, SUM(plen) AS deg "
            "FROM pw GROUP BY 1), "
            "wsc AS (SELECT tok, 1000000 * deg // freq AS wscore "
            "FROM ws), "
            "pi AS (SELECT pw.doc_id, pw.island, "
            "string_agg(pw.tok, ' ' ORDER BY pw.i) AS phrase, "
            "SUM(wsc.wscore) AS score FROM pw "
            "JOIN wsc ON wsc.tok = pw.tok GROUP BY 1, 2), "
            "pg AS (SELECT phrase, count(*) AS n, MAX(score) AS sc "
            "FROM pi GROUP BY 1) "
            "SELECT phrase, CAST(n AS BIGINT) AS n, "
            "CAST(sc AS BIGINT) AS score_ppm FROM pg "
            "ORDER BY sc DESC, phrase LIMIT 20"
        ),
        # census closed form kept in general Q shape: C = (n, n-b,
        # n-b, n), num = 12b^2, den = 4b -> Q = 3b exactly
        "cochran_q": (
            "WITH d AS (SELECT count(*) AS n, count(*) FILTER "
            "(WHERE doc_id % 97 <> 0 AND doc_id % 5 = 2 "
            "AND doc_id % 20 = 12) AS b FROM documents) "
            "SELECT CAST(n AS BIGINT) AS n_pages, "
            "CAST(n AS BIGINT) AS c_keyword, "
            "CAST(n - b AS BIGINT) AS c_regex, "
            "CAST(n - b AS BIGINT) AS c_tokenset, "
            "CAST(n AS BIGINT) AS c_ml, "
            "CAST(CASE WHEN b > 0 THEN "
            "1000 * 12 * b * b // (4 * b) ELSE 0 END AS BIGINT) "
            "AS q_milli, "
            "CASE WHEN b > 0 THEN "
            "12 * b * b * 1000000 > 7814728 * 4 * b "
            "ELSE FALSE END AS significant FROM d"
        ),
        # lag() adjacency + literal edge list; fitness scalar rides
        # every row
        "conformance_check": (
            "WITH t AS (SELECT user_id, event_type, "
            "lag(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS prev FROM events), "
            "g AS (SELECT prev AS prev_type, event_type AS next_type, "
            "count(*) AS n FROM t WHERE prev IS NOT NULL "
            "GROUP BY 1, 2), "
            "j AS (SELECT prev_type, next_type, n, "
            "prev_type || '>' || next_type IN ("
            + ", ".join(f"'{a}>{b}'" for a, b in _CONFORMANCE_MODEL)
            + ") AS allowed FROM g), "
            "tot AS (SELECT SUM(n) AS t, SUM(CASE WHEN allowed "
            "THEN n ELSE 0 END) AS ok FROM j) "
            "SELECT prev_type, next_type, CAST(n AS BIGINT) AS n, "
            "allowed, CAST(1000000 * tot.ok // tot.t AS BIGINT) "
            "AS conformance_ppm FROM j, tot"
        ),
        # deterministic quarter buckets + friedman grid/midranks;
        # L' fold with 36*Var cross-multiply
        "page_trend": (
            "WITH tt AS (SELECT min(epoch_us(ts)) AS t0, "
            "max(epoch_us(ts)) AS t1 FROM events), "
            "b AS (SELECT user_id, 1 + least(3, "
            "(epoch_us(ts) - tt.t0) * 4 // (tt.t1 - tt.t0 + 1)) "
            "AS bucket FROM events, tt), "
            "c AS (SELECT user_id, bucket, count(*) AS cnt FROM b "
            "GROUP BY 1, 2), "
            "u AS (SELECT DISTINCT user_id FROM events), "
            "ks AS (SELECT unnest(generate_series(1, 4)) AS bucket), "
            "grid AS (SELECT u.user_id, ks.bucket, "
            "coalesce(c.cnt, 0) AS cnt FROM u CROSS JOIN ks "
            "LEFT JOIN c ON c.user_id = u.user_id "
            "AND c.bucket = ks.bucket), "
            "r AS (SELECT user_id, bucket, "
            "2 * rank() OVER (PARTITION BY user_id ORDER BY cnt) "
            "+ count(*) OVER (PARTITION BY user_id, cnt) - 1 AS rp "
            "FROM grid), "
            "g AS (SELECT bucket, SUM(rp) AS rsum2 FROM r GROUP BY 1), "
            "s AS (SELECT SUM(bucket * CAST(rsum2 AS HUGEINT)) AS l2, "
            "(SELECT count(*) FROM u) AS n FROM g), "
            "f AS (SELECT n, l2, l2 - CAST(n AS HUGEINT) * 4 * 25 // 2 "
            "AS d, CAST(n AS HUGEINT) * 16 * 5 * 15 AS den FROM s) "
            "SELECT g.bucket, CAST(g.rsum2 AS BIGINT) AS rsum2, "
            "CAST(f.n AS BIGINT) AS n_users, "
            "CAST(f.l2 AS BIGINT) AS l2, "
            "CAST(36000 * f.d * f.d // f.den AS BIGINT) AS z2_milli, "
            "CAST(CASE WHEN f.d > 0 THEN 1 WHEN f.d < 0 THEN -1 "
            "ELSE 0 END AS BIGINT) AS trend_sign, "
            "36000000 * f.d * f.d > 3841459 * f.den AS significant "
            "FROM g, f"
        ),
        # DIFFERENT algorithm on purpose: the direct quadratic pair
        # join over per-user (T, E, S) rows, affordable at test scale
        "survival_cindex": (
            "WITH mx AS (SELECT max(epoch_us(ts)) AS tm FROM events), "
            "u AS (SELECT user_id, "
            "(max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000 "
            "AS t, count(*) AS s, "
            "CASE WHEN (SELECT tm FROM mx) - max(epoch_us(ts)) "
            ">= 21600000000 THEN 1 ELSE 0 END AS e "
            "FROM events GROUP BY 1), "
            "p AS (SELECT a.s AS sa, b.s AS sb FROM u a JOIN u b "
            "ON a.user_id <> b.user_id AND ((a.t < b.t AND a.e = 1) "
            "OR (a.t = b.t AND a.e = 1 AND b.e = 0))), "
            "f AS (SELECT count(*) AS comp, "
            "SUM(CASE WHEN sa > sb THEN 2 WHEN sa = sb THEN 1 "
            "ELSE 0 END) AS c2 FROM p), "
            "n AS (SELECT count(*) AS n_users, SUM(e) AS n_events "
            "FROM u) "
            "SELECT CAST(n.n_users AS BIGINT) AS n_users, "
            "CAST(n.n_events AS BIGINT) AS n_events, "
            "CAST(2 * f.comp AS BIGINT) AS comp2, "
            "CAST(coalesce(f.c2, 0) AS BIGINT) AS c2, "
            "CAST(CASE WHEN f.comp > 0 THEN "
            "1000000 * coalesce(f.c2, 0) // (2 * f.comp) ELSE 0 END "
            "AS BIGINT) AS c_index_ppm FROM f, n"
        ),
        # one FILTER-count scan; AVI product vs actual, one floor each
        "selectivity_audit": (
            "WITH a AS (SELECT count(*) AS n, "
            "count(*) FILTER (WHERE l_returnflag = 'R') AS cr, "
            "count(*) FILTER (WHERE round(l_quantity) >= 30) AS cq, "
            "count(*) FILTER (WHERE l_linestatus = 'F') AS cf, "
            "count(*) FILTER (WHERE l_returnflag = 'R' "
            "AND round(l_quantity) >= 30) AS crq, "
            "count(*) FILTER (WHERE l_returnflag = 'R' "
            "AND l_linestatus = 'F') AS crf, "
            "count(*) FILTER (WHERE round(l_quantity) >= 30 "
            "AND l_linestatus = 'F') AS cqf, "
            "count(*) FILTER (WHERE l_returnflag = 'R' "
            "AND round(l_quantity) >= 30 AND l_linestatus = 'F') "
            "AS crqf FROM lineitem), "
            "u AS (SELECT 'return&bigqty' AS pred, n, crq AS act, "
            "CAST(cr AS HUGEINT) * cq AS prod, "
            "CAST(n AS HUGEINT) * n AS den FROM a "
            "UNION ALL SELECT 'return&lsF', n, crf, "
            "CAST(cr AS HUGEINT) * cf, CAST(n AS HUGEINT) * n FROM a "
            "UNION ALL SELECT 'bigqty&lsF', n, cqf, "
            "CAST(cq AS HUGEINT) * cf, CAST(n AS HUGEINT) * n FROM a "
            "UNION ALL SELECT 'return&bigqty&lsF', n, crqf, "
            "CAST(cr AS HUGEINT) * cq * cf, "
            "CAST(n AS HUGEINT) * n * n FROM a) "
            "SELECT pred, CAST(n AS BIGINT) AS n_rows, "
            "CAST(1000000 * act // n AS BIGINT) AS actual_ppm, "
            "CAST(1000000 * prod // den AS BIGINT) AS avi_ppm, "
            "CAST(1000000 * act // n - 1000000 * prod // den "
            "AS BIGINT) AS diff_ppm FROM u"
        ),
        # S2 = sum m*mass over the freq-of-freq table; milli-K and
        # without-replacement repeat probability, one floor each
        "yule_k": (
            "WITH tok AS (SELECT unnest(list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '')) AS t "
            "FROM documents), "
            "tf AS (SELECT t, count(*) AS n FROM tok GROUP BY 1), "
            "a AS (SELECT count(*) AS s_obs, SUM(n) AS n, "
            "SUM(CAST(n AS HUGEINT) * n) AS s2 FROM tf) "
            "SELECT CAST(n AS BIGINT) AS n_tokens, "
            "CAST(s_obs AS BIGINT) AS vocab, "
            "CAST(s2 AS BIGINT) AS s2, "
            "CAST(10000000 * (s2 - n) // (CAST(n AS HUGEINT) * n) "
            "AS BIGINT) AS yule_k_milli, "
            "CAST(1000000 * (s2 - n) // (CAST(n AS HUGEINT) "
            "* (n - 1)) AS BIGINT) AS simpson_ppm FROM a"
        ),
        # doubled midranks on the value histogram; one shared floor
        # in var12; chi2_1 cross-multiply on the shared var12
        "mann_whitney": (
            "WITH t AS (SELECT CAST(round(l_quantity) AS BIGINT) AS "
            "qty, l_returnflag = 'R' AS pos, count(*) AS n "
            "FROM lineitem GROUP BY 1, 2), "
            "v AS (SELECT qty, SUM(n) AS nv FROM t GROUP BY 1), "
            "c AS (SELECT qty, 2 * (SUM(nv) OVER (ORDER BY qty "
            "ROWS UNBOUNDED PRECEDING) - nv) + nv + 1 AS rp FROM v), "
            "t3 AS (SELECT SUM(nv * nv * nv - nv) AS t3 FROM v), "
            "g AS (SELECT SUM(CASE WHEN t.pos THEN t.n ELSE 0 END) "
            "AS n1, SUM(CASE WHEN t.pos THEN 0 ELSE t.n END) AS n2, "
            "SUM(CASE WHEN t.pos THEN CAST(t.n AS HUGEINT) * c.rp "
            "ELSE 0 END) AS rs FROM t JOIN c USING (qty)), "
            "f AS (SELECT n1, n2, t3.t3, "
            "rs - CAST(n1 AS HUGEINT) * (n1 + 1) AS u2, "
            "n1 + n2 AS n FROM g, t3), "
            "h AS (SELECT n1, n2, t3, u2, "
            "u2 - CAST(n1 AS HUGEINT) * n2 AS d, "
            "CAST(n1 AS HUGEINT) * n2 * (CAST(n AS HUGEINT) "
            "* (n - 1) * (n + 1) - t3) // (CAST(n AS HUGEINT) "
            "* (n - 1)) AS var12 FROM f) "
            "SELECT CAST(n1 AS BIGINT) AS n_pos, "
            "CAST(n2 AS BIGINT) AS n_neg, CAST(u2 AS BIGINT) AS u2, "
            "CAST(t3 AS BIGINT) AS t3, "
            "CAST(var12 AS BIGINT) AS var12, "
            "CAST(CASE WHEN var12 > 0 THEN 3000 * d * d // var12 "
            "ELSE 0 END AS BIGINT) AS z2_milli, "
            "CASE WHEN var12 > 0 THEN "
            "3000000 * d * d > 3841459 * var12 ELSE FALSE END "
            "AS significant FROM h"
        ),
        # closed-form census: both defectors defect on the SAME
        # pages -> S = 2b(n-b), V = 4b(n-b), alpha = 2/3 exactly
        "kr20_reliability": (
            "WITH d AS (SELECT count(*) AS n, count(*) FILTER "
            "(WHERE doc_id % 97 <> 0 AND doc_id % 5 = 2 "
            "AND doc_id % 20 = 12) AS b FROM documents) "
            "SELECT CAST(n AS BIGINT) AS n_pages, "
            "CAST(4 AS BIGINT) AS k_items, "
            "CAST(2 * b * (n - b) AS BIGINT) AS sum_pq_n2, "
            "CAST(4 * b * (n - b) AS BIGINT) AS var_n2, "
            "CAST(CASE WHEN b = 0 OR b = n THEN 1000 ELSE 666 END "
            "AS BIGINT) AS alpha_milli FROM d"
        ),
        # user x type grid, doubled midranks 2*rank + ties - 1, exact
        # S fold (uniform blocks need no per-group floor)
        "friedman_test": (
            "WITH c AS (SELECT user_id, event_type, count(*) AS cnt "
            "FROM events GROUP BY 1, 2), "
            "u AS (SELECT DISTINCT user_id FROM events), "
            "t AS (SELECT DISTINCT event_type FROM events), "
            "grid AS (SELECT u.user_id, t.event_type, "
            "coalesce(c.cnt, 0) AS cnt FROM u CROSS JOIN t "
            "LEFT JOIN c ON c.user_id = u.user_id "
            "AND c.event_type = t.event_type), "
            "r AS (SELECT user_id, event_type, "
            "2 * rank() OVER (PARTITION BY user_id ORDER BY cnt) "
            "+ count(*) OVER (PARTITION BY user_id, cnt) - 1 AS rp "
            "FROM grid), "
            "g AS (SELECT event_type, SUM(rp) AS rsum2 FROM r "
            "GROUP BY 1), "
            "s AS (SELECT SUM(CAST(rsum2 AS HUGEINT) * rsum2) AS sq, "
            "(SELECT count(*) FROM u) AS n, "
            "(SELECT count(*) FROM t) AS k FROM g), "
            "f AS (SELECT n, k, 3000 * sq - 3000 * "
            "CAST(n AS HUGEINT) * n * k * (k + 1) * (k + 1) AS num, "
            "CASE k - 1 WHEN 1 THEN 3841459 WHEN 2 THEN 5991465 "
            "WHEN 3 THEN 7814728 WHEN 4 THEN 9487729 "
            "ELSE 11070498 END AS crit FROM s) "
            "SELECT g.event_type, CAST(g.rsum2 AS BIGINT) AS rsum2, "
            "CAST(f.n AS BIGINT) AS n_users, "
            "CAST(CASE WHEN f.num < 0 THEN 0 ELSE f.num // "
            "(CAST(f.n AS HUGEINT) * f.k * (f.k + 1)) END AS BIGINT) "
            "AS chi2_milli, "
            "1000 * f.num > f.crit * CAST(f.n AS HUGEINT) * f.k "
            "* (f.k + 1) AS significant FROM g, f"
        ),
        # planted one-sided discordance census: b = ambiguous POs
        # (keyword follows the fused verdict, regex defects), c = 0
        "mcnemar_test": (
            "WITH d AS (SELECT count(*) AS n, count(*) FILTER "
            "(WHERE doc_id % 97 <> 0 AND doc_id % 5 = 2 "
            "AND doc_id % 20 = 12) AS b FROM documents) "
            "SELECT CAST(n AS BIGINT) AS n_items, "
            "CAST(n - b AS BIGINT) AS both_agree, "
            "CAST(b AS BIGINT) AS kw_only, "
            "CAST(0 AS BIGINT) AS rx_only, "
            "CAST(0 AS BIGINT) AS neither, "
            "CAST(CASE WHEN b > 0 THEN 1000 * b ELSE 0 END AS BIGINT) "
            "AS chi2_milli, "
            "b * b * 1000000 > 3841459 * b AS significant FROM d"
        ),
        # net-flow path: window cumsum/runmax, earliest-trough FILTER,
        # gaps-and-islands underwater run over observed days
        "max_drawdown": (
            "WITH d AS (SELECT date_trunc('day', l_shipdate) AS day, "
            "SUM(CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END "
            "* CAST(round(l_extendedprice * 100) AS BIGINT)) AS net "
            "FROM lineitem GROUP BY 1), "
            "c0 AS (SELECT day, SUM(net) OVER "
            "(ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum FROM d), "
            "c AS (SELECT day, cum, greatest(MAX(cum) OVER "
            "(ORDER BY day ROWS UNBOUNDED PRECEDING), 0) AS rm "
            "FROM c0), "
            "m AS (SELECT day, cum, rm, rm - cum AS dd, "
            "row_number() OVER (ORDER BY day) "
            "- row_number() OVER (PARTITION BY (rm - cum > 0) "
            "ORDER BY day) AS island FROM c), "
            "mx AS (SELECT MAX(dd) AS maxdd FROM m), "
            "tr AS (SELECT min(day) AS trough_day FROM m, mx "
            "WHERE m.dd = mx.maxdd), "
            "uw AS (SELECT coalesce(MAX(cnt), 0) AS run FROM "
            "(SELECT count(*) AS cnt FROM m WHERE dd > 0 "
            "GROUP BY island)), "
            "fin AS (SELECT count(*) AS n_days, "
            "SUM(net) AS final_cents FROM d) "
            "SELECT CAST(fin.n_days AS BIGINT) AS n_days, "
            "CAST(fin.final_cents AS BIGINT) AS final_cents, "
            "CAST(mx.maxdd AS BIGINT) AS max_drawdown_cents, "
            "tr.trough_day, "
            "CAST((SELECT rm FROM m WHERE m.day = tr.trough_day) "
            "AS BIGINT) AS peak_cents, "
            "CAST(uw.run AS BIGINT) AS underwater_max_run "
            "FROM fin, mx, tr, uw"
        ),
        # identical deterministic edge census; wedges by middle-node
        # self-join; NOT EXISTS removes closed pairs
        "link_predict": (
            "WITH nn AS (SELECT count(*) AS n FROM documents), "
            "e0 AS (SELECT doc_id AS s, (doc_id + 1) % nn.n AS d "
            "FROM documents, nn UNION ALL "
            "SELECT doc_id, (doc_id + 2) % nn.n FROM documents, nn "
            "UNION ALL SELECT doc_id, (doc_id * 7 + 1) % nn.n "
            "FROM documents, nn), "
            "und AS (SELECT DISTINCT least(s, d) AS a, "
            "greatest(s, d) AS b FROM e0 WHERE s <> d), "
            "sym AS (SELECT a AS m, b AS x FROM und "
            "UNION ALL SELECT b, a FROM und), "
            "w AS (SELECT e1.x AS a, e2.x AS b, count(*) AS cn "
            "FROM sym e1 JOIN sym e2 ON e1.m = e2.m AND e1.x < e2.x "
            "GROUP BY 1, 2), "
            "nw AS (SELECT w.a, w.b, w.cn FROM w WHERE NOT EXISTS "
            "(SELECT 1 FROM und WHERE und.a = w.a AND und.b = w.b)) "
            "SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, "
            "CAST(cn AS BIGINT) AS cn FROM nw "
            "ORDER BY cn DESC, a, b LIMIT 20"
        ),
        # XmR: limit scales with the mean moving range; 2.66 kept
        # rational (266/100); cross-multiplied inequality
        "xmr_alarms": (
            "WITH " + _SQL_DENSE_GRID + ", "
            "lg AS (SELECT event_type, abs(c - lag(c) OVER "
            "(PARTITION BY event_type ORDER BY hr)) AS d FROM dd), "
            "mr AS (SELECT event_type, SUM(d) AS mrsum FROM lg "
            "GROUP BY 1), "
            "st AS (SELECT event_type, count(*) AS m, SUM(c) AS s "
            "FROM dd GROUP BY 1) "
            "SELECT dd.event_type, dd.hr, CAST(dd.c AS BIGINT) AS c "
            "FROM dd JOIN st USING (event_type) "
            "JOIN mr USING (event_type) "
            "WHERE 100 * (st.m - 1) "
            "* abs(st.m * CAST(dd.c AS HUGEINT) - st.s) "
            "> 266 * st.m * CAST(mr.mrsum AS HUGEINT)"
        ),
        # Tukey hinges (median-of-halves) in doubled units; fences in
        # ×4 units; outliers counted, not emitted
        "tukey_outliers": (
            "WITH r AS (SELECT l_returnflag AS flag, "
            "CAST(round(l_quantity) AS BIGINT) AS v, "
            "row_number() OVER (PARTITION BY l_returnflag "
            "ORDER BY l_quantity) AS rn FROM lineitem), "
            "m AS (SELECT flag, count(*) AS m FROM r GROUP BY 1), "
            "q AS (SELECT r.flag, "
            "SUM(CASE WHEN rn = (((m.m + 1) // 2) + 1) // 2 "
            "THEN v ELSE 0 END) "
            "+ SUM(CASE WHEN rn = ((m.m + 1) // 2) // 2 + 1 "
            "THEN v ELSE 0 END) AS q1_2, "
            "SUM(CASE WHEN rn = m.m // 2 + (((m.m + 1) // 2) + 1) // 2 "
            "THEN v ELSE 0 END) "
            "+ SUM(CASE WHEN rn = m.m // 2 + ((m.m + 1) // 2) // 2 + 1 "
            "THEN v ELSE 0 END) AS q3_2 "
            "FROM r JOIN m USING (flag) GROUP BY 1), "
            "f AS (SELECT flag, q1_2, q3_2, "
            "2 * q1_2 - 3 * (q3_2 - q1_2) AS lo4, "
            "2 * q3_2 + 3 * (q3_2 - q1_2) AS hi4 FROM q) "
            "SELECT f.flag, CAST(m.m AS BIGINT) AS n, "
            "CAST(f.q1_2 AS BIGINT) AS q1_x2, "
            "CAST(f.q3_2 AS BIGINT) AS q3_x2, "
            "CAST(f.lo4 AS BIGINT) AS fence_lo_x4, "
            "CAST(f.hi4 AS BIGINT) AS fence_hi_x4, "
            "CAST((SELECT count(*) FROM r WHERE r.flag = f.flag "
            "AND 4 * r.v < f.lo4) AS BIGINT) AS n_out_lo, "
            "CAST((SELECT count(*) FROM r WHERE r.flag = f.flag "
            "AND 4 * r.v > f.hi4) AS BIGINT) AS n_out_hi "
            "FROM f JOIN m USING (flag)"
        ),
        # J = TPR − FPR per candidate threshold; ties → smallest t
        "youden_threshold": (
            "WITH t AS (SELECT CAST(round(l_quantity) AS BIGINT) AS "
            "qty, SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
            "AS p, SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) "
            "AS ng FROM lineitem GROUP BY 1), "
            "tot AS (SELECT SUM(p) AS pt, SUM(ng) AS nt FROM t), "
            "c AS (SELECT qty, SUM(p) OVER (ORDER BY qty DESC "
            "ROWS UNBOUNDED PRECEDING) AS tp, SUM(ng) OVER "
            "(ORDER BY qty DESC ROWS UNBOUNDED PRECEDING) AS fp "
            "FROM t), "
            "j AS (SELECT qty, tp, fp, tot.pt, tot.nt, "
            "1000000 * tp // tot.pt AS tpr, "
            "1000000 * fp // tot.nt AS fpr FROM c, tot) "
            "SELECT CAST(qty AS BIGINT) AS threshold, "
            "CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, "
            "CAST(pt - tp AS BIGINT) AS fn, "
            "CAST(nt - fp AS BIGINT) AS tn, "
            "CAST(tpr AS BIGINT) AS tpr_ppm, "
            "CAST(fpr AS BIGINT) AS fpr_ppm, "
            "CAST(tpr - fpr AS BIGINT) AS youden_ppm "
            "FROM j ORDER BY tpr - fpr DESC, qty ASC LIMIT 1"
        ),
        # block-tie AP: precision at each distinct-score block end,
        # one floor per block
        "average_precision": (
            "WITH t AS (SELECT CAST(round(l_quantity) AS BIGINT) AS "
            "qty, SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
            "AS p, SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) "
            "AS ng FROM lineitem GROUP BY 1), "
            "c AS (SELECT qty, p, SUM(p) OVER w AS cum_p, "
            "SUM(p + ng) OVER w AS cum_t FROM t WINDOW w AS "
            "(ORDER BY qty DESC ROWS UNBOUNDED PRECEDING)), "
            "tot AS (SELECT SUM(p) AS r, SUM(ng) AS nneg FROM t) "
            "SELECT CAST(tot.r AS BIGINT) AS n_pos, "
            "CAST(tot.nneg AS BIGINT) AS n_neg, "
            "CAST(SUM(1000000 * CAST(c.p AS HUGEINT) * c.cum_p "
            "// (CAST(c.cum_t AS HUGEINT) * tot.r)) AS BIGINT) "
            "AS ap_ppm FROM c, tot GROUP BY tot.r, tot.nneg"
        ),
        # closed-form census: the stale capture is a planted BLANK page
        # one day earlier, so earliest = {''} and latest = golden lines
        "capture_diff": (
            f"WITH e AS ({_SQL_EXPECTED_PAGES}), "
            "d AS (SELECT url, text FROM e WHERE doc_id % 20 = 0), "
            "l AS (SELECT url, "
            "list_distinct(string_split(text, chr(10))) AS late FROM d) "
            "SELECT url, "
            "CAST(len(list_filter(late, x -> x <> '')) AS BIGINT) "
            "AS n_added, "
            "CAST(CASE WHEN list_contains(late, '') THEN 0 ELSE 1 END "
            "AS BIGINT) AS n_removed, "
            "CAST(CASE WHEN list_contains(late, '') THEN 1 ELSE 0 END "
            "AS BIGINT) AS n_common, "
            "CAST(1000000 * (len(list_filter(late, x -> x <> '')) "
            "+ CASE WHEN list_contains(late, '') THEN 0 ELSE 1 END) "
            "// (len(late) + CASE WHEN list_contains(late, '') "
            "THEN 0 ELSE 1 END) AS BIGINT) AS change_ppm FROM l"
        ),
        # FIFO via the closed form: cumsum window + GREATEST/LEAST
        # clamp, one floor per consumed buy line
        "fifo_cogs": (
            "WITH b0 AS (SELECT l_partkey, l_orderkey, l_linenumber, "
            "l_shipdate, CAST(l_quantity AS BIGINT) AS q, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS pc "
            "FROM lineitem WHERE l_returnflag <> 'R'), "
            "s AS (SELECT l_partkey, "
            "SUM(CAST(l_quantity AS BIGINT)) AS s FROM lineitem "
            "WHERE l_returnflag = 'R' GROUP BY 1), "
            "b AS (SELECT b0.l_partkey, b0.q, b0.pc, s.s, "
            "SUM(b0.q) OVER (PARTITION BY b0.l_partkey "
            "ORDER BY b0.l_shipdate, b0.l_orderkey, b0.l_linenumber "
            "ROWS UNBOUNDED PRECEDING) - b0.q AS bef "
            "FROM b0 JOIN s ON s.l_partkey = b0.l_partkey), "
            "c AS (SELECT l_partkey, s, q, pc, "
            "GREATEST(CAST(0 AS BIGINT), LEAST(q, s - bef)) AS cons "
            "FROM b) "
            "SELECT l_partkey AS partkey, "
            "CAST(any_value(s) AS BIGINT) AS sold_qty, "
            "CAST(SUM(CASE WHEN cons > 0 THEN cons * pc // q "
            "ELSE 0 END) AS BIGINT) AS fifo_cogs_cents, "
            "CAST(LEAST(any_value(s), SUM(q)) * SUM(pc) // SUM(q) "
            "AS BIGINT) AS wavg_cogs_cents FROM c GROUP BY 1"
        ),
        # calibration weights: FILTER counts + one floor per segment
        "post_stratify": (
            "SELECT c_mktsegment, "
            "CAST(count(*) AS BIGINT) AS n_pop, "
            "CAST(count(*) FILTER (WHERE (c_custkey * 2654435761) "
            "% 4294967296 < 429496729) AS BIGINT) AS n_samp, "
            "CAST(1000000 * count(*) // count(*) FILTER "
            "(WHERE (c_custkey * 2654435761) % 4294967296 "
            "< 429496729) AS BIGINT) AS weight_ppm "
            "FROM customer GROUP BY 1"
        ),
        # two independent Knuth coins; N̂ = n1·n2 // m
        "lincoln_petersen": (
            "WITH t AS (SELECT "
            "(c_custkey * 2654435761) % 4294967296 < 858993459 AS a, "
            "(c_custkey * 2246822519) % 4294967296 < 858993459 AS b "
            "FROM customer), "
            "g AS (SELECT count(*) AS n, "
            "count(*) FILTER (WHERE a) AS n1, "
            "count(*) FILTER (WHERE b) AS n2, "
            "count(*) FILTER (WHERE a AND b) AS m FROM t) "
            "SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, "
            "CAST(m AS BIGINT) AS m_both, CAST(n AS BIGINT) AS n_true, "
            "CAST(n1 * n2 // m AS BIGINT) AS n_est, "
            "CAST(1000000 * abs(n1 * n2 // m - n) // n AS BIGINT) "
            "AS err_ppm FROM g"
        ),
        # serial-number MVUE: N̂ = max + max//k − 1
        "german_tank": (
            "WITH s AS (SELECT o_orderkey FROM orders WHERE "
            "(o_orderkey * 2654435761) % 4294967296 < 429496729), "
            "g AS (SELECT count(*) AS k, max(o_orderkey) AS mx FROM s), "
            "t AS (SELECT max(o_orderkey) AS tmx FROM orders) "
            "SELECT CAST(k AS BIGINT) AS k, "
            "CAST(mx AS BIGINT) AS sample_max, "
            "CAST(tmx AS BIGINT) AS max_true, "
            "CAST(mx + mx // k - 1 AS BIGINT) AS n_est, "
            "CAST(1000000 * abs(mx + mx // k - 1 - tmx) // tmx "
            "AS BIGINT) AS err_ppm FROM g, t"
        ),
        # doubled-unit sum-of-middles medians per (type, hod); d20
        # units clear both the doubling and the q = 9/10 weights
        "pinball_eval": (
            "WITH " + _SQL_DENSE_GRID + ", "
            "hd AS (SELECT event_type, hr, c, "
            "extract(hour FROM hr) AS hod FROM dd), "
            "rk AS (SELECT event_type, hod, c, row_number() OVER "
            "(PARTITION BY event_type, hod ORDER BY c) AS rn, "
            "count(*) OVER (PARTITION BY event_type, hod) AS m "
            "FROM hd), "
            "w AS (SELECT event_type, hod, "
            "SUM(CASE WHEN rn = (m + 1) // 2 THEN c ELSE 0 END) "
            "+ SUM(CASE WHEN rn = m // 2 + 1 THEN c ELSE 0 END) AS m2 "
            "FROM rk GROUP BY 1, 2), "
            "l AS (SELECT hd.event_type, 2 * hd.c - w.m2 AS d FROM hd "
            "JOIN w ON hd.event_type = w.event_type "
            "AND hd.hod = w.hod) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs, "
            "CAST(SUM(5 * abs(d)) AS BIGINT) AS pinball50_d20, "
            "CAST(SUM(CASE WHEN d >= 0 THEN 9 * d ELSE -d END) "
            "AS BIGINT) AS pinball90_d20 FROM l GROUP BY 1"
        ),
        # retention's first-week convention + window cumsum
        "cohort_ltv": (
            "WITH w AS (SELECT user_id, "
            "epoch_us(ts) // 604800000000 AS wk, event_type, "
            "CAST(round(value * 100) AS BIGINT) AS c FROM events), "
            "f AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY 1), "
            "p AS (SELECT f.cw AS cohort_week, w.wk - f.cw "
            "AS week_offset, SUM(w.c) AS revenue_cents FROM w "
            "JOIN f USING (user_id) WHERE w.event_type = 'purchase' "
            "GROUP BY 1, 2) "
            "SELECT CAST(cohort_week AS BIGINT) AS cohort_week, "
            "CAST(week_offset AS BIGINT) AS week_offset, "
            "CAST(revenue_cents AS BIGINT) AS revenue_cents, "
            "CAST(SUM(revenue_cents) OVER (PARTITION BY cohort_week "
            "ORDER BY week_offset ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS cum_revenue_cents FROM p"
        ),
        # cent·percent units per line, ONE floor to cents per customer
        "q10_returns": (
            "WITH l AS (SELECT l_orderkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT)) "
            "AS rev_c4 FROM lineitem WHERE l_returnflag = 'R'), "
            "pc AS (SELECT o_custkey AS custkey, SUM(rev_c4) AS rev_c4 "
            "FROM l JOIN orders ON o_orderkey = l_orderkey GROUP BY 1), "
            "r AS (SELECT custkey, rev_c4, row_number() OVER "
            "(ORDER BY rev_c4 DESC, custkey) AS rnk FROM pc) "
            "SELECT CAST(rnk AS BIGINT) AS \"rank\", custkey, c_name, "
            "n_name, CAST(rev_c4 // 100 AS BIGINT) AS revenue_cents "
            "FROM r JOIN customer ON c_custkey = custkey "
            "JOIN nation ON n_nationkey = c_nationkey WHERE rnk <= 20"
        ),
        # 4-way join, CASE'd numerator, one floor per year
        "q8_market_share": (
            "WITH l AS (SELECT l_orderkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT)) "
            "AS rev_c4, s_nationkey = 1 AS is_target FROM lineitem "
            "JOIN supplier ON s_suppkey = l_suppkey), "
            "o AS (SELECT o_orderkey, o_custkey, "
            "year(o_orderdate) AS o_year FROM orders), "
            "c AS (SELECT c_custkey FROM customer "
            "JOIN nation ON n_nationkey = c_nationkey "
            "WHERE n_regionkey = 0), "
            "j AS (SELECT o.o_year, l.rev_c4, l.is_target FROM l "
            "JOIN o ON o.o_orderkey = l.l_orderkey "
            "JOIN c ON c.c_custkey = o.o_custkey) "
            "SELECT CAST(o_year AS BIGINT) AS o_year, "
            "CAST(SUM(rev_c4) AS BIGINT) AS total_c4, "
            "CAST(SUM(CASE WHEN is_target THEN rev_c4 ELSE 0 END) "
            "AS BIGINT) AS target_c4, "
            "CAST(1000000 * SUM(CASE WHEN is_target THEN "
            "CAST(rev_c4 AS HUGEINT) ELSE 0 END) // SUM(rev_c4) "
            "AS BIGINT) AS share_ppm FROM j GROUP BY 1"
        ),
        # quarterly links + sequential trunc-ppm chain (3 chained CTEs)
        "chain_index": (
            "WITH d AS (SELECT l_partkey, "
            "epoch_us(l_shipdate) // 86400000000 AS dd, "
            "CAST(l_quantity AS BIGINT) AS q, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS pc "
            "FROM lineitem), "
            "md AS (SELECT min(dd) AS lo, max(dd) AS hi FROM d), "
            "g AS (SELECT l_partkey, "
            "(dd - md.lo) * 4 // (md.hi - md.lo + 1) AS qk, "
            "SUM(q) AS q, SUM(pc) AS s FROM d, md GROUP BY 1, 2), "
            "lk AS (SELECT kk.k, count(*) AS n, SUM(g0.s) AS v0, "
            "SUM(CAST(g1.s AS HUGEINT) * g0.q // g1.q) AS v1 "
            "FROM (VALUES (1), (2), (3)) kk(k) "
            "JOIN g g0 ON g0.qk = kk.k - 1 "
            "JOIN g g1 ON g1.l_partkey = g0.l_partkey "
            "AND g1.qk = kk.k GROUP BY 1), "
            "l AS (SELECT k, n, 1000000 * v1 // v0 AS lp FROM lk), "
            "c1 AS (SELECT lp AS c FROM l WHERE k = 1), "
            "c2 AS (SELECT c1.c * l.lp // 1000000 AS c FROM l, c1 "
            "WHERE k = 2), "
            "c3 AS (SELECT c2.c * l.lp // 1000000 AS c FROM l, c2 "
            "WHERE k = 3) "
            "SELECT CAST(l.k AS BIGINT) AS link, "
            "CAST(l.n AS BIGINT) AS n_parts, "
            "CAST(l.lp AS BIGINT) AS link_ppm, "
            "CAST(CASE l.k WHEN 1 THEN c1.c WHEN 2 THEN c2.c "
            "ELSE c3.c END AS BIGINT) AS chain_ppm "
            "FROM l, c1, c2, c3"
        ),
        # curve behind the Gini scalar: dollar-rank deciles, exact
        # cent sums, ppm floors on the 10-row frame only
        "lorenz_deciles": (
            "WITH u AS (SELECT o_custkey, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1), "
            "nn AS (SELECT count(*) AS n FROM u), "
            "r AS (SELECT cents, row_number() OVER "
            "(ORDER BY cents // 100, o_custkey) - 1 AS ri FROM u), "
            "d AS (SELECT 1 + 10 * ri // nn.n AS decile, cents "
            "FROM r, nn), "
            "g AS (SELECT decile, SUM(cents) AS c FROM d GROUP BY 1), "
            "t AS (SELECT SUM(c) AS tot FROM g), "
            "f AS (SELECT decile, c, SUM(c) OVER (ORDER BY decile "
            "ROWS UNBOUNDED PRECEDING) AS cum FROM g) "
            "SELECT CAST(decile AS BIGINT) AS decile, "
            "CAST(c AS BIGINT) AS revenue_cents, "
            "CAST(1000000 * c // t.tot AS BIGINT) AS share_ppm, "
            "CAST(1000000 * cum // t.tot AS BIGINT) AS cum_share_ppm "
            "FROM f, t"
        ),
        # area under the KM curve + censoring-honest median day
        "rmst_summary": (
            "SELECT CAST(30 AS BIGINT) AS horizon_days, "
            "CAST(SUM(s_ppm) AS BIGINT) AS rmst_ppm_days, "
            "CAST(coalesce(min(day) FILTER (WHERE s_ppm < 500000), -1) "
            "AS BIGINT) AS median_day, "
            "CAST(min(s_ppm) FILTER (WHERE day = 29) AS BIGINT) "
            "AS s_end_ppm FROM (" + _SQL_KM + ") kmrows"
        ),
        # Paasche: numerator Σs₁ exact; denominator floors the
        # MIRRORED way (s₀·q₁ // q₀)
        "paasche_index": (
            "WITH d AS (SELECT l_partkey, "
            "epoch_us(l_shipdate) // 86400000000 AS dd, "
            "CAST(l_quantity AS BIGINT) AS q, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS pc "
            "FROM lineitem), "
            "md AS (SELECT (min(dd) + max(dd)) // 2 AS mid FROM d), "
            "g AS (SELECT l_partkey, dd >= md.mid AS post, "
            "SUM(q) AS q, SUM(pc) AS s FROM d, md GROUP BY 1, 2), "
            "b AS (SELECT g0.l_partkey, g1.s AS s1, "
            "CAST(g0.s AS HUGEINT) * g1.q // g0.q AS v0 "
            "FROM g g0 JOIN g g1 ON g0.l_partkey = g1.l_partkey "
            "AND NOT g0.post AND g1.post) "
            "SELECT CAST(count(*) AS BIGINT) AS n_parts, "
            "CAST(SUM(s1) AS BIGINT) AS current_value_cents, "
            "CAST(SUM(v0) AS BIGINT) AS repriced_base_cents, "
            "CAST(1000000 * SUM(CAST(s1 AS HUGEINT)) // SUM(v0) "
            "AS BIGINT) AS paasche_ppm FROM b"
        ),
        # base value is exact (p̄₀·q₀ = Σprice); repriced value floors
        # once per part — identical HUGEINT floor in the mirror
        "laspeyres_index": (
            "WITH d AS (SELECT l_partkey, "
            "epoch_us(l_shipdate) // 86400000000 AS dd, "
            "CAST(l_quantity AS BIGINT) AS q, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS pc "
            "FROM lineitem), "
            "md AS (SELECT (min(dd) + max(dd)) // 2 AS mid FROM d), "
            "g AS (SELECT l_partkey, dd >= md.mid AS post, "
            "SUM(q) AS q, SUM(pc) AS s FROM d, md GROUP BY 1, 2), "
            "b AS (SELECT g0.l_partkey, g0.s AS s0, "
            "CAST(g1.s AS HUGEINT) * g0.q // g1.q AS v1 "
            "FROM g g0 JOIN g g1 ON g0.l_partkey = g1.l_partkey "
            "AND NOT g0.post AND g1.post) "
            "SELECT CAST(count(*) AS BIGINT) AS n_parts, "
            "CAST(SUM(s0) AS BIGINT) AS base_value_cents, "
            "CAST(SUM(v1) AS BIGINT) AS repriced_value_cents, "
            "CAST(1000000 * SUM(v1) // SUM(s0) AS BIGINT) "
            "AS laspeyres_ppm FROM b"
        ),
        # harmonic discount 10⁶ // (1+rank); ideal fold closed-form
        "ndcg_eval": (
            "WITH " + _SQL_BM25_CORE + ", "
            "qn AS (SELECT query_id, count(*) AS nt FROM qt GROUP BY 1), "
            "tm AS (SELECT qt.query_id, tf.doc_id, count(*) AS nmatch "
            "FROM qt JOIN tf ON tf.t = qt.t GROUP BY 1, 2), "
            "relall AS (SELECT tm.query_id, tm.doc_id FROM tm "
            "JOIN qn USING (query_id) WHERE tm.nmatch = qn.nt), "
            "rtot AS (SELECT query_id, count(*) AS rt FROM relall "
            "GROUP BY 1), "
            "dc AS (SELECT r.query_id, SUM(1000000 // (1 + r.rnk)) AS d "
            "FROM r JOIN relall ON relall.query_id = r.query_id "
            "AND relall.doc_id = r.doc_id WHERE r.rnk <= 5 GROUP BY 1), "
            "fin AS (SELECT q.query_id, coalesce(rtot.rt, 0) AS rt, "
            "coalesce(dc.d, 0) AS d "
            "FROM (SELECT DISTINCT query_id FROM qt) q "
            "LEFT JOIN rtot USING (query_id) "
            "LEFT JOIN dc USING (query_id)), "
            "fi2 AS (SELECT query_id, rt, d, CASE least(rt, 5) "
            + " ".join(
                f"WHEN {i} THEN "
                f"{sum(1_000_000 // (1 + s) for s in range(1, i + 1))}"
                for i in range(5))
            + f" ELSE {sum(1_000_000 // (1 + s) for s in range(1, 6))} "
            "END AS ic FROM fin) "
            "SELECT query_id, CAST(rt AS BIGINT) AS n_rel_total, "
            "CAST(d AS BIGINT) AS dcg_ppm, "
            "CAST(ic AS BIGINT) AS idcg_ppm, "
            "CAST(CASE WHEN ic > 0 THEN 1000000 * d // ic ELSE 0 END "
            "AS BIGINT) AS ndcg_ppm FROM fi2"
        ),
        # Fano factor: n·Σx² − S² clears the variance; the flag
        # compares the un-truncated sides
        "dispersion_index": (
            "WITH " + _SQL_DENSE_GRID + ", "
            "st AS (SELECT event_type, count(*) AS n, SUM(c) AS s, "
            "SUM(CAST(c AS HUGEINT) * c) AS q FROM dd GROUP BY 1) "
            "SELECT event_type, CAST(n AS BIGINT) AS n_obs, "
            "CAST(s AS BIGINT) AS total, "
            "CAST(1000000 * (n * q - CAST(s AS HUGEINT) * s) "
            "// (CAST(n AS HUGEINT) * s) AS BIGINT) AS dispersion_ppm, "
            "(n * q - CAST(s AS HUGEINT) * s) > (CAST(n AS HUGEINT) * s) "
            "AS overdispersed FROM st"
        ),
        # centered lead-lag slope: full-series-mean centering (the acf
        # convention), lead() windows, sign-split trunc division
        "leadlag_beta": (
            "WITH " + _SQL_DENSE_GRID + ", "
            "st AS (SELECT event_type, count(*) AS n, SUM(c) AS s "
            "FROM dd GROUP BY 1), "
            "xs AS (SELECT dd.hr, st.n, "
            "CAST(st.n AS HUGEINT) * dd.c - st.s AS x FROM dd "
            "JOIN st USING (event_type) WHERE dd.event_type = 'click'), "
            "ys AS (SELECT dd.hr, "
            "CAST(st.n AS HUGEINT) * dd.c - st.s AS y FROM dd "
            "JOIN st USING (event_type) "
            "WHERE dd.event_type = 'purchase'), "
            "j AS (SELECT xs.hr, xs.n, xs.x, ys.y FROM xs "
            "JOIN ys USING (hr)), "
            "w AS (SELECT n, x, y AS y0, "
            "lead(y, 1) OVER (ORDER BY hr) AS y1, "
            "lead(y, 2) OVER (ORDER BY hr) AS y2, "
            "lead(y, 3) OVER (ORDER BY hr) AS y3 FROM j), "
            "agg AS (SELECT any_value(n) AS n, SUM(x * x) AS den, "
            "SUM(x * y0) AS n0, SUM(x * y1) AS n1, SUM(x * y2) AS n2, "
            "SUM(x * y3) AS n3 FROM w), "
            "u AS (SELECT 0 AS lg, n, n0 AS num, den FROM agg "
            "UNION ALL SELECT 1, n, n1, den FROM agg "
            "UNION ALL SELECT 2, n, n2, den FROM agg "
            "UNION ALL SELECT 3, n, n3, den FROM agg) "
            "SELECT CAST(lg AS BIGINT) AS \"lag\", "
            "CAST(n AS BIGINT) AS n_obs, "
            "CAST(CASE WHEN num >= 0 THEN 1000000 * num // den "
            "ELSE -((1000000 * (-num)) // den) END AS BIGINT) "
            "AS beta_ppm FROM u"
        ),
        # quintiles via the deterministic 1 + 5·row_number//n rule on a
        # (metric, user_id) total order — ntile() tie handling is
        # order-dependent, row_number with the tiebreak is not
        "rfm_segments": (
            "WITH p AS (SELECT user_id, epoch_us(ts) AS t_us, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events "
            "WHERE event_type = 'purchase'), "
            "u AS (SELECT user_id, max(t_us) AS last_us, "
            "count(*) AS freq, SUM(cents) AS mon_c FROM p GROUP BY 1), "
            "tm AS (SELECT max(last_us) AS t_max FROM u), "
            "m AS (SELECT user_id, (t_max - last_us) // 86400000000 "
            "AS recency_d, freq AS frequency, mon_c // 100 AS monetary_d "
            "FROM u, tm), "
            "nn AS (SELECT count(*) AS n FROM m), "
            "r AS (SELECT m.*, "
            "row_number() OVER (ORDER BY recency_d, user_id) - 1 AS ri_r, "
            "row_number() OVER (ORDER BY frequency DESC, user_id) - 1 "
            "AS ri_f, "
            "row_number() OVER (ORDER BY monetary_d DESC, user_id) - 1 "
            "AS ri_m FROM m) "
            "SELECT user_id, CAST(recency_d AS BIGINT) AS recency_d, "
            "CAST(frequency AS BIGINT) AS frequency, "
            "CAST(monetary_d AS BIGINT) AS monetary_d, "
            "CAST(1 + 5 * ri_r // nn.n AS BIGINT) AS r_q, "
            "CAST(1 + 5 * ri_f // nn.n AS BIGINT) AS f_q, "
            "CAST(1 + 5 * ri_m // nn.n AS BIGINT) AS m_q, "
            "CAST(100 * (1 + 5 * ri_r // nn.n) "
            "+ 10 * (1 + 5 * ri_f // nn.n) "
            "+ (1 + 5 * ri_m // nn.n) AS BIGINT) AS rfm_code "
            "FROM r, nn"
        ),
        # two-level ratio-to-parent: HUGEINT clears 10⁶·cents at any sf
        "revenue_share": (
            "WITH oc AS (SELECT c_nationkey AS nationkey, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS revenue_cents FROM orders "
            "JOIN customer ON o_custkey = c_custkey GROUP BY 1), "
            "j AS (SELECT n_name, r_name, revenue_cents FROM oc "
            "JOIN nation ON n_nationkey = nationkey "
            "JOIN region ON r_regionkey = n_regionkey), "
            "rt AS (SELECT r_name, SUM(revenue_cents) AS reg_tot "
            "FROM j GROUP BY 1), "
            "gt AS (SELECT SUM(revenue_cents) AS glob_tot FROM j) "
            "SELECT n_name, r_name, "
            "CAST(revenue_cents AS BIGINT) AS revenue_cents, "
            "CAST(1000000 * CAST(revenue_cents AS HUGEINT) // rt.reg_tot "
            "AS BIGINT) AS share_region_ppm, "
            "CAST(1000000 * CAST(revenue_cents AS HUGEINT) // gt.glob_tot "
            "AS BIGINT) AS share_global_ppm "
            "FROM j JOIN rt USING (r_name), gt"
        ),
    }


def _sql_fingerprint() -> str:
    """Fingerprint oracle: the full md5-token → LE-uint64 → 4-token window
    polynomial hash (mod 2⁶⁴ via HUGEINT) → %8 anchors → bit_xor chain in
    SQL, mirrored from stages/textstats.py (B, window, keep_mod inline).
    Verified bit-exact against the Python path over the whole corpus."""
    pows = ", ".join(f"CAST({256 ** i} AS HUGEINT)" for i in range(8))
    tok_hash = (
        "list_sum(list_transform(generate_series(0, 7), i -> "
        "(CAST(strpos('0123456789abcdef', substr(md5(tok), 2*i+1, 1)) - 1 AS HUGEINT) * 16 "
        "+ CAST(strpos('0123456789abcdef', substr(md5(tok), 2*i+2, 1)) - 1 AS HUGEINT)) "
        f"* [{pows}][i + 1]))"
    )
    B = 1000003
    M = 1 << 64
    bp = [pow(B, k, M) for k in range(4)]
    return (
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks "
        "FROM documents), "
        "th AS (SELECT doc_id, len(toks) AS nt, "
        f"list_transform(toks, tok -> {tok_hash}) AS hs FROM t), "
        "f AS (SELECT doc_id, CASE "
        "WHEN nt = 0 THEN CAST(0 AS HUGEINT) "
        f"WHEN nt < 4 THEN list_reduce(hs, (a, b) -> (a * {B} + b) % CAST({M} AS HUGEINT)) "
        "ELSE coalesce(list_aggregate(list_filter("
        "list_transform(generate_series(1, nt - 3), i -> "
        f"(hs[i] * CAST({bp[3]} AS HUGEINT) + hs[i+1] * CAST({bp[2]} AS HUGEINT) "
        f"+ hs[i+2] * CAST({bp[1]} AS HUGEINT) + hs[i+3]) % CAST({M} AS HUGEINT)), "
        "v -> v % 8 = 0), 'bit_xor'), CAST(0 AS HUGEINT)) END AS fp FROM th) "
        f"SELECT doc_id, CAST(CASE WHEN fp >= CAST({1 << 63} AS HUGEINT) "
        f"THEN fp - CAST({M} AS HUGEINT) ELSE fp END AS BIGINT) AS fingerprint "
        "FROM f"
    )
