"""Auto-learning accumulator — the reference's only genuinely global mutable
state (SURVEY §2.4 T6), redesigned for Ray.

Reference behavior (/root/reference/document_classification_updated/
auto_learning.py): high-confidence classification results append to a JSON
file (min confidence 0.7, skip short texts), a background thread retrains
the ML model once ≥ 50 samples accumulate (24 h interval). That design —
shared file + thread in the serving process — cannot live inside Ray task
workers.

Ray design (SURVEY §7.3 "named singleton actor or offline job"):

- ``LearningAccumulator`` is a detached-scope NAMED actor: classification
  stages send (text, category, confidence) samples via fire-and-forget
  ``add_samples.remote`` — low QPS, never on the hot path's critical chain.
- ``maybe_retrain`` retrains the hashed-ngram NB (tools/train_model.py
  pipeline) when the sample threshold is reached, returning the new model
  arrays; the caller decides where to persist them.
- The offline alternative (append-only Parquet sample table + scheduled
  train job) is ``samples_to_table`` — both paths share the same filter
  rules as the reference (min_confidence, min_text_len).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

MIN_CONFIDENCE = 0.7   # auto_learning.py:33
MIN_TEXT_LEN = 20      # auto_learning.py:63-72 (skip short texts)
RETRAIN_THRESHOLD = 50  # auto_learning.py:94-95


class LearningAccumulator:
    """Plain class; run it as a named Ray actor:

        acc = ray.remote(LearningAccumulator).options(
            name="learning-accumulator", get_if_exists=True).remote()
        acc.add_samples.remote(texts, categories, confidences)
    """

    def __init__(self, min_confidence: float = MIN_CONFIDENCE,
                 min_text_len: int = MIN_TEXT_LEN,
                 retrain_threshold: int = RETRAIN_THRESHOLD):
        self.min_confidence = min_confidence
        self.min_text_len = min_text_len
        self.retrain_threshold = retrain_threshold
        self.samples: list[tuple[str, str]] = []
        self.n_rejected = 0
        self.n_retrains = 0

    def add_samples(self, texts: list[str], categories: list[str],
                    confidences: list[float]) -> int:
        """Filter + append; returns number accepted."""
        accepted = 0
        for t, c, f in zip(texts, categories, confidences):
            if f >= self.min_confidence and len(t) >= self.min_text_len \
                    and c and c != "unclassified":
                self.samples.append((t, c))
                accepted += 1
            else:
                self.n_rejected += 1
        return accepted

    def counts(self) -> dict[str, int]:
        return {"accepted": len(self.samples), "rejected": self.n_rejected,
                "retrains": self.n_retrains}

    def maybe_retrain(self) -> dict[str, Any] | None:
        """Retrain when the threshold is met; drains the buffer. Returns the
        new model dict (classes/log_prior/log_like) or None."""
        if len(self.samples) < self.retrain_threshold:
            return None
        from documentai_ray.stages.classify import train_nb

        model = train_nb(self.samples)
        self.samples = []
        self.n_retrains += 1
        return model

    def samples_to_table(self) -> pa.Table:
        """Offline path: drain samples as an Arrow table for an append-only
        Parquet sample store (train job aggregates later)."""
        t = pa.table(
            {"text": pa.array([s[0] for s in self.samples], pa.large_string()),
             "category": pa.array([s[1] for s in self.samples], pa.string())}
        )
        self.samples = []
        return t
