"""4-technique page/document classification with majority-vote fusion.

Reference parity (all under /root/reference/document_classification_updated/):

- keyword technique — Σ len(kw)·4·weight over substring hits on
  alnum-lowercase-normalized text, argmax category, confidence 0.8 hit /
  0.1 miss (documentClassifier.py:373-437, "PyMuPDF" technique M8).
- regex technique — per-category compiled patterns, score = matches·weight,
  confidence = max_score / total_score (documentClassifier.py:440-509, M9).
- token-set technique — |token set ∩ keyword set|, confidence 0.7
  (documentClassifier.py:512-574, M10).
- ML technique — vectorizer + linear model scoring, argmax
  (documentClassifier.py:260-369, M12). Rebuilt as a hashed bag-of-ngrams
  multinomial Naive Bayes in pure numpy (sklearn is not available);
  batch-native predict (one matmul per batch), model artifact loaded once
  per actor (SURVEY §2.4 T1 → actor pool).
- 4/4 majority vote — votes per category across the four results,
  confidence string "k/4" (documentClassifier.py:928-948, M13); in-row fuse,
  zero shuffle.

Empty text (blank / malformed / stripped-to-nothing pages) short-circuits
every technique to ``unclassified`` — the reference's error-row degradation
(documentClassifier.py:888-896).

Config is the user-extension surface (configs/classification_config.json),
loaded once on the driver and shipped in task/actor closures (broadcast
pattern — SURVEY §2.5 J3/J4).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import numpy as np
import pyarrow as pa

from documentai_ray.functions.text import clean_ml_text, normalize_alnum_lower, tokenize

UNCLASSIFIED = "unclassified"

_CONFIG_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "configs", "classification_config.json")
_MODEL_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "configs", "ml_model.npz")

HASH_DIM = 1 << 15


def load_config(path: str | None = None) -> dict[str, Any]:
    with open(path or os.path.abspath(_CONFIG_PATH)) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# technique 1: weighted keyword substring scoring (M8)
# ---------------------------------------------------------------------------

class KeywordClassifier:
    def __init__(self, config: dict[str, Any]):
        self.table = {
            cat: [(normalize_alnum_lower(kw), kw, w) for kw, w in spec["keywords"].items()]
            for cat, spec in config["categories"].items()
        }

    def classify(self, text: str) -> tuple[str, float]:
        if not text:
            return UNCLASSIFIED, 0.1
        return self.classify_normalized(normalize_alnum_lower(text))

    def classify_normalized(self, norm: str) -> tuple[str, float]:
        """Score a pre-normalized text (shared-tokenization fast path)."""
        if not norm:
            return UNCLASSIFIED, 0.1
        best_cat, best_score = UNCLASSIFIED, 0.0
        for cat in sorted(self.table):
            score = 0.0
            for kw_norm, _kw, w in self.table[cat]:
                hits = norm.count(kw_norm) if kw_norm else 0
                if hits:
                    score += len(kw_norm) * 4 * w * hits
            if score > best_score:
                best_cat, best_score = cat, score
        return (best_cat, 0.8) if best_score > 0 else (UNCLASSIFIED, 0.1)


# ---------------------------------------------------------------------------
# technique 2: regex pattern scoring (M9)
# ---------------------------------------------------------------------------

class RegexClassifier:
    def __init__(self, config: dict[str, Any]):
        self.patterns = {
            cat: [re.compile(p, re.IGNORECASE) for p in spec["patterns"]]
            for cat, spec in config["categories"].items()
        }

    def classify(self, text: str) -> tuple[str, float]:
        if not text:
            return UNCLASSIFIED, 0.1
        scores: dict[str, int] = {}
        for cat in sorted(self.patterns):
            s = sum(len(p.findall(text)) for p in self.patterns[cat])
            if s:
                scores[cat] = s
        if not scores:
            return UNCLASSIFIED, 0.1
        total = sum(scores.values())
        best = max(sorted(scores), key=lambda c: scores[c])
        return best, scores[best] / total


# ---------------------------------------------------------------------------
# technique 3: token-set intersection (M10)
# ---------------------------------------------------------------------------

class TokenSetClassifier:
    def __init__(self, config: dict[str, Any]):
        self.sets = {cat: set(spec["tokens"]) for cat, spec in config["categories"].items()}

    def classify(self, text: str) -> tuple[str, float]:
        if not text:
            return UNCLASSIFIED, 0.1
        return self.classify_tokenset(set(tokenize(text)))

    def classify_tokenset(self, toks: set[str]) -> tuple[str, float]:
        if not toks:
            return UNCLASSIFIED, 0.1
        best_cat, best = UNCLASSIFIED, 0
        for cat in sorted(self.sets):
            n = len(toks & self.sets[cat])
            if n > best:
                best_cat, best = cat, n
        return (best_cat, 0.7) if best > 0 else (UNCLASSIFIED, 0.1)


# ---------------------------------------------------------------------------
# technique 4: hashed-ngram Naive Bayes (M12 rebuilt without sklearn)
# ---------------------------------------------------------------------------

def featurize(text: str) -> np.ndarray:
    """Hashed unigram+bigram counts → dense vector (HASH_DIM)."""
    toks = tokenize(clean_ml_text(text))
    v = np.zeros(HASH_DIM, dtype=np.float64)
    prev = None
    for t in toks:
        v[hash_token(t)] += 1.0
        if prev is not None:
            v[hash_token(prev + "_" + t)] += 1.0
        prev = t
    return v


_HASH_CACHE: dict[str, int] = {}


def hash_token(t: str) -> int:
    """crc32 → hashed-feature index, with a bounded worker-local cache
    (T2/T5 pattern): corpus vocabularies repeat heavily, so the cache turns
    the per-occurrence encode+crc32 into one dict hit. Bigram keys live in
    the same cache (bounded, so adversarial vocab can't grow it unbounded)."""
    h = _HASH_CACHE.get(t)
    if h is None:
        import zlib

        h = zlib.crc32(t.encode("utf-8")) % HASH_DIM
        if len(_HASH_CACHE) < 1_000_000:
            _HASH_CACHE[t] = h
    return h


def train_nb(samples: list[tuple[str, str]], alpha: float = 1.0) -> dict[str, np.ndarray]:
    """Multinomial NB: log P(class) + Σ count · log P(feature|class)."""
    classes = sorted({c for _t, c in samples})
    counts = np.zeros((len(classes), HASH_DIM), dtype=np.float64)
    prior = np.zeros(len(classes), dtype=np.float64)
    idx = {c: i for i, c in enumerate(classes)}
    for text, cls in samples:
        counts[idx[cls]] += featurize(text)
        prior[idx[cls]] += 1.0
    log_prior = np.log(prior / prior.sum())
    feat = counts + alpha
    log_like = np.log(feat / feat.sum(axis=1, keepdims=True))
    return {"classes": np.array(classes), "log_prior": log_prior, "log_like": log_like}


def save_model(model: dict[str, np.ndarray], path: str | None = None) -> None:
    np.savez_compressed(path or os.path.abspath(_MODEL_PATH), **model)


class MLScorer:
    """Actor-pool stage: model loaded once per actor in ``__init__``
    (reference loads joblib once per process, documentClassifier.py:99-215);
    per-batch predict is one (batch × HASH_DIM) @ (HASH_DIM × C) matmul."""

    def __init__(self, model_path: str | None = None):
        data = np.load(model_path or os.path.abspath(_MODEL_PATH), allow_pickle=False)
        self.classes = [str(c) for c in data["classes"]]
        self.log_prior = data["log_prior"]
        self.log_like = data["log_like"]

    def predict_one(self, text: str) -> tuple[str, float]:
        if not text:
            return UNCLASSIFIED, 0.1
        v = featurize(text)
        scores = self.log_prior + self.log_like @ v
        # softmax over log-joint for a confidence
        m = scores.max()
        p = np.exp(scores - m)
        p /= p.sum()
        i = int(scores.argmax())
        return self.classes[i], float(p[i])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        if n:
            # sparse scoring: score[i, c] = log_prior[c] + Σ_f log_like[c, f]
            # over the doc's hashed features — no 32k-dim dense vectors
            # (the dense matmul allocates 256 KB/doc; this is ~100 B/token)
            rows: list[int] = []
            feats: list[int] = []
            for i, t in enumerate(texts):
                toks = tokenize(clean_ml_text(t or ""))
                prev = None
                for tk in toks:
                    rows.append(i)
                    feats.append(hash_token(tk))
                    if prev is not None:
                        rows.append(i)
                        feats.append(hash_token(prev + "_" + tk))
                    prev = tk
            S = np.tile(self.log_prior, (n, 1))
            if rows:
                r = np.asarray(rows, dtype=np.int64)
                f = np.asarray(feats, dtype=np.int64)
                for c in range(len(self.classes)):
                    S[:, c] += np.bincount(r, weights=self.log_like[c, f], minlength=n)
            m = S.max(axis=1, keepdims=True)
            P = np.exp(S - m)
            P /= P.sum(axis=1, keepdims=True)
            arg = S.argmax(axis=1)
            cats = [
                self.classes[a] if t else UNCLASSIFIED
                for a, t in zip(arg, texts)
            ]
            confs = [
                float(P[i, a]) if t else 0.1
                for i, (a, t) in enumerate(zip(arg, texts))
            ]
        else:
            cats, confs = [], []
        out = batch.append_column("tech_ml", pa.array(cats, pa.string()))
        return out.append_column("tech_ml_conf", pa.array(confs, pa.float64()))


# ---------------------------------------------------------------------------
# stateless 3-technique stage + vote fusion (M13)
# ---------------------------------------------------------------------------

class ThreeTechniqueStage:
    """Stateless-state pattern: pattern tables compiled once per actor/worker
    (reference compiles per process, documentClassifier.py:31-38)."""

    def __init__(self, config: dict[str, Any] | None = None):
        cfg = config or load_config()
        self.kw = KeywordClassifier(cfg)
        self.rx = RegexClassifier(cfg)
        self.ts = TokenSetClassifier(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        kw_c, kw_f, rx_c, rx_f, ts_c, ts_f = [], [], [], [], [], []
        for t in texts:
            t = t or ""
            c, f = self.kw.classify(t); kw_c.append(c); kw_f.append(f)
            c, f = self.rx.classify(t); rx_c.append(c); rx_f.append(f)
            c, f = self.ts.classify(t); ts_c.append(c); ts_f.append(f)
        out = batch
        out = out.append_column("tech_keyword", pa.array(kw_c, pa.string()))
        out = out.append_column("tech_keyword_conf", pa.array(kw_f, pa.float64()))
        out = out.append_column("tech_regex", pa.array(rx_c, pa.string()))
        out = out.append_column("tech_regex_conf", pa.array(rx_f, pa.float64()))
        out = out.append_column("tech_tokenset", pa.array(ts_c, pa.string()))
        out = out.append_column("tech_tokenset_conf", pa.array(ts_f, pa.float64()))
        return out


def fuse_votes(batch: pa.Table) -> pa.Table:
    """Majority vote across the four technique columns → category + "k/4".

    Tie-break: vote count desc, then summed confidence desc, then category
    name asc (deterministic). Pure per-row fuse — no shuffle (SURVEY A1).
    """
    cols = ["tech_keyword", "tech_regex", "tech_tokenset", "tech_ml"]
    confs = ["tech_keyword_conf", "tech_regex_conf", "tech_tokenset_conf", "tech_ml_conf"]
    data = {c: batch.column(c).to_pylist() for c in cols + confs}
    n = batch.num_rows
    cats, votes = [], []
    for i in range(n):
        tally: dict[str, list[float]] = {}
        for c, f in zip(cols, confs):
            tally.setdefault(data[c][i], []).append(data[f][i])
        best = sorted(
            tally.items(), key=lambda kv: (-len(kv[1]), -sum(kv[1]), kv[0])
        )[0]
        cats.append(best[0])
        votes.append(f"{len(best[1])}/4")
    out = batch.append_column("category", pa.array(cats, pa.string()))
    return out.append_column("votes", pa.array(votes, pa.string()))


class ClassifyStage:
    """Fused 4-technique + vote stage: ONE actor pool holding all warm state
    (compiled keyword/regex/token tables + the NB model). One pool instead
    of three chained stages = one actor-startup barrier and no inter-stage
    batch serialization — the pipeline-level analog of the reference running
    all techniques per page inside one process (documentClassifier.py:847-926).

    Single tokenization pass per row: ``\\w+`` tokens are computed once and
    shared by the token-set technique and the NB featurizer
    (``tokenize(clean_ml_text(x)) == tokenize(x)`` — junk-char removal
    replaces non-word chars with spaces, which the ``\\w+`` tokenizer
    already ignores). Output is bit-identical to the unfused
    ThreeTechniqueStage → MLScorer → fuse_votes chain (pinned by test)."""

    def __init__(self, config: dict[str, Any] | None = None,
                 model_path: str | None = None):
        self.three = ThreeTechniqueStage(config)
        self.ml = MLScorer(model_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        kw_c: list[str] = []; kw_f: list[float] = []
        rx_c: list[str] = []; rx_f: list[float] = []
        ts_c: list[str] = []; ts_f: list[float] = []
        rows: list[int] = []
        feats: list[int] = []
        for i, t in enumerate(texts):
            t = t or ""
            if not t:
                kw_c.append(UNCLASSIFIED); kw_f.append(0.1)
                rx_c.append(UNCLASSIFIED); rx_f.append(0.1)
                ts_c.append(UNCLASSIFIED); ts_f.append(0.1)
                continue
            toks = tokenize(t)
            c, f = self.three.kw.classify_normalized(normalize_alnum_lower(t))
            kw_c.append(c); kw_f.append(f)
            c, f = self.three.rx.classify(t)
            rx_c.append(c); rx_f.append(f)
            c, f = self.three.ts.classify_tokenset(set(toks))
            ts_c.append(c); ts_f.append(f)
            prev = None
            for tk in toks:
                rows.append(i)
                feats.append(hash_token(tk))
                if prev is not None:
                    rows.append(i)
                    feats.append(hash_token(prev + "_" + tk))
                prev = tk
        # NB scoring (same sparse path as MLScorer.__call__)
        ml = self.ml
        S = np.tile(ml.log_prior, (n, 1)) if n else np.zeros((0, len(ml.classes)))
        if rows:
            r = np.asarray(rows, dtype=np.int64)
            f_ = np.asarray(feats, dtype=np.int64)
            for c in range(len(ml.classes)):
                S[:, c] += np.bincount(r, weights=ml.log_like[c, f_], minlength=n)
        if n:
            m = S.max(axis=1, keepdims=True)
            P = np.exp(S - m)
            P /= P.sum(axis=1, keepdims=True)
            arg = S.argmax(axis=1)
            ml_c = [ml.classes[a] if t else UNCLASSIFIED for a, t in zip(arg, texts)]
            ml_f = [float(P[i, a]) if t else 0.1
                    for i, (a, t) in enumerate(zip(arg, texts))]
        else:
            ml_c, ml_f = [], []
        out = batch
        out = out.append_column("tech_keyword", pa.array(kw_c, pa.string()))
        out = out.append_column("tech_keyword_conf", pa.array(kw_f, pa.float64()))
        out = out.append_column("tech_regex", pa.array(rx_c, pa.string()))
        out = out.append_column("tech_regex_conf", pa.array(rx_f, pa.float64()))
        out = out.append_column("tech_tokenset", pa.array(ts_c, pa.string()))
        out = out.append_column("tech_tokenset_conf", pa.array(ts_f, pa.float64()))
        out = out.append_column("tech_ml", pa.array(ml_c, pa.string()))
        out = out.append_column("tech_ml_conf", pa.array(ml_f, pa.float64()))
        return fuse_votes(out)


_TASK_STAGE: ClassifyStage | None = None


def classify_batch_task(batch: pa.Table) -> pa.Table:
    """Task-pool form of the fused classify stage: the warm state (compiled
    tables + NB model) builds once per WORKER PROCESS on first call and is
    reused across tasks — same load-once semantics as the actor pool, but
    with no actor-startup barrier, and the stage fuses with its task-based
    neighbors (read→extract→quality→classify→entities run as ONE operator).
    Right whenever the model is process-cache-sized (this NB artifact is
    <1 MB); switch to the actor pool (``ml_concurrency=...``) when the
    model is GB-scale and the pool must be sized to memory (SURVEY T1)."""
    global _TASK_STAGE
    if _TASK_STAGE is None:
        _TASK_STAGE = ClassifyStage()
    return _TASK_STAGE(batch)


def classify_pipeline(ds, *, ml_concurrency=None, batch_size: int = 1024):
    """text-bearing Dataset → + technique columns + fused category/votes.

    ``ml_concurrency=None`` (default) → task pool with per-worker warm
    state; a tuple/int → actor pool of that size (for heavy models)."""
    if ml_concurrency is None:
        return ds.map_batches(classify_batch_task, batch_format="pyarrow",
                              batch_size=batch_size)
    return ds.map_batches(ClassifyStage, batch_format="pyarrow",
                          concurrency=ml_concurrency, batch_size=batch_size)
