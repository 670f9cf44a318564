"""Per-document quality scoring — the reference's quality transform for text.

Reference chain (metric → category bucket → weighted confidence → verdict):
/root/reference/quality_analysis_updated/quality_config.py:7-129 (thresholds,
weights, verdict cutoffs) and microservices/quality-service/app.py:320-333
(document roll-up). The reference scores page *images* (blur, contrast, …);
the webtext rebuild scores the extracted *text* with the analogous checks
(FIXTURES.md archetypes 5-6): length, repetition, structure, blankness,
language support — then applies the same threshold → confidence → verdict
shape, including the blank-page hard blocker
(quality_config.py:109-116 → "re-scan").

DETERMINISM CONTRACT: every arithmetic expression here is mirrored, op for
op, by the DuckDB oracle SQL in ``__ray_entry__.py`` (both engines run IEEE
doubles through the same op sequence → bit-identical results), and every
exported ratio/score is truncated with ``r6`` (floor-based, engine-neutral).
Change one side only with the other.

Metric definitions over extracted text ``t``:

- ``n_chars``      = length(t)
- tokens           = non-empty pieces of regexp-split ``\\s+``
- ``n_tokens``     = len(tokens)
- ``uniq_tokens``  = len(distinct tokens)
- ``rep_ratio``    = r6(uniq_tokens / n_tokens)   (0 when no tokens;
                     low value ⇒ heavy repetition — the blur/noise analog)
- lines            = split on ``\\n``; good line ⇔ length ≥ 20
- ``struct_ratio`` = r6(good_lines / n_lines)     (structure analog of skew)
- ``len_score``    = least(n_chars, 400) / 400.0
- ``confidence``   = r6(0.4*len_score + 0.4*raw_rep + 0.2*raw_struct)
- ``lang_ok``      = lang ∈ SUPPORTED_LANGS
- ``verdict``: blank (n_chars = 0) → ``re_scan`` (hard blocker);
  confidence ≥ 0.95 → ``direct_analysis``; ≥ 0.80 → ``pre_processing``;
  ≥ 0.60 → ``deep_analysis``; else → ``reupload``
  (the reference's 0.95/0.8/0.6 cutoffs, quality_config.py:86-94).
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

from documentai_ray.functions.text import r6

_CONFIG_PATH = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "configs",
                 "quality_config.yaml")
)

_DEFAULT_CONFIG = {
    "weights": {"length": 0.4, "repetition": 0.4, "structure": 0.2},
    "length": {"full_score_chars": 400},
    "structure": {"good_line_min_chars": 20},
    "verdicts": {"direct_analysis": 0.95, "pre_processing": 0.80,
                 "deep_analysis": 0.60},
    "supported_langs": ["en", "de", "fr", "es"],
    "recommendations": {},
}


def load_quality_config(path: str | None = None) -> dict:
    """User-extension surface (quality_config.yaml shape); falls back to
    built-in defaults when yaml or the file is absent."""
    p = path or _CONFIG_PATH
    try:
        import yaml

        with open(p) as f:
            cfg = yaml.safe_load(f)
        return {**_DEFAULT_CONFIG, **(cfg or {})}
    except (ImportError, OSError):
        return dict(_DEFAULT_CONFIG)


_CFG = load_quality_config()
SUPPORTED_LANGS = tuple(_CFG["supported_langs"])
_W_LEN = float(_CFG["weights"]["length"])
_W_REP = float(_CFG["weights"]["repetition"])
_W_STRUCT = float(_CFG["weights"]["structure"])
_FULL_CHARS = int(_CFG["length"]["full_score_chars"])
_GOOD_LINE = int(_CFG["structure"]["good_line_min_chars"])
_V_DIRECT = float(_CFG["verdicts"]["direct_analysis"])
_V_PREPROC = float(_CFG["verdicts"]["pre_processing"])
_V_DEEP = float(_CFG["verdicts"]["deep_analysis"])

_SPLIT_WS = re.compile(r"\s+")

VERDICT_RE_SCAN = "re_scan"
VERDICT_DIRECT = "direct_analysis"
VERDICT_PREPROC = "pre_processing"
VERDICT_DEEP = "deep_analysis"
VERDICT_REUPLOAD = "reupload"


def recommendation_for(verdict: str) -> str:
    """Per-verdict advice string (Q14 analog, quality_config.py:96-103)."""
    return _CFG.get("recommendations", {}).get(verdict, "")


def score_text(text: str, lang: str | None = None) -> dict:
    """Pure per-document quality record (mirrored by oracle SQL)."""
    n_chars = len(text)
    tokens = [t for t in _SPLIT_WS.split(text) if t]
    n_tokens = len(tokens)
    uniq_tokens = len(set(tokens))
    raw_rep = (uniq_tokens / n_tokens) if n_tokens > 0 else 0.0
    lines = text.split("\n")
    n_lines = len(lines)
    good_lines = sum(1 for ln in lines if len(ln) >= _GOOD_LINE)
    raw_struct = good_lines / n_lines  # n_lines >= 1 always (split of "")
    len_score = min(n_chars, _FULL_CHARS) / float(_FULL_CHARS)
    confidence = r6(_W_LEN * len_score + _W_REP * raw_rep + _W_STRUCT * raw_struct)
    if n_chars == 0:
        verdict = VERDICT_RE_SCAN
    elif confidence >= _V_DIRECT:
        verdict = VERDICT_DIRECT
    elif confidence >= _V_PREPROC:
        verdict = VERDICT_PREPROC
    elif confidence >= _V_DEEP:
        verdict = VERDICT_DEEP
    else:
        verdict = VERDICT_REUPLOAD
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "uniq_tokens": uniq_tokens,
        "rep_ratio": r6(raw_rep),
        "struct_ratio": r6(raw_struct),
        "confidence": confidence,
        "verdict": verdict,
        "lang_ok": (lang in SUPPORTED_LANGS) if lang is not None else True,
    }


def quality_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Arrow-in/Arrow-out quality stage (stateless ``map_batches`` fn).

    String tokenization is inherently per-row Python; everything else is
    columnar. Payload columns are untouched (this stage only appends).
    """
    texts = batch.column(text_col).to_pylist()
    langs = (
        batch.column("lang").to_pylist()
        if "lang" in batch.column_names
        else [None] * len(texts)
    )
    recs = [score_text(t or "", lg) for t, lg in zip(texts, langs)]
    out = batch
    out = out.append_column("n_chars", pa.array([r["n_chars"] for r in recs], pa.int64()))
    out = out.append_column("n_tokens", pa.array([r["n_tokens"] for r in recs], pa.int64()))
    out = out.append_column("uniq_tokens", pa.array([r["uniq_tokens"] for r in recs], pa.int64()))
    out = out.append_column("rep_ratio", pa.array([r["rep_ratio"] for r in recs], pa.float64()))
    out = out.append_column("struct_ratio", pa.array([r["struct_ratio"] for r in recs], pa.float64()))
    out = out.append_column("confidence", pa.array([r["confidence"] for r in recs], pa.float64()))
    out = out.append_column("verdict", pa.array([r["verdict"] for r in recs], pa.string()))
    out = out.append_column("lang_ok", pa.array([r["lang_ok"] for r in recs], pa.bool_()))
    return out
