"""Offline ML-model training (analog of the reference's training pipeline:
/root/reference/document_classification_updated/training_dataset.py +
train_model_auto.py — TF-IDF + LogisticRegression, random_state=42).

Trains the hashed-ngram multinomial NB on a seeded synthetic corpus and
writes the artifact to configs/ml_model.npz. Pure numpy, fully
deterministic; rerunning produces a byte-identical model.

Usage: python tools/train_model.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from documentai_ray.sources.pages import invoice_lines, po_lines  # noqa: E402
from documentai_ray.stages.classify import save_model, train_nb  # noqa: E402

VOCAB = [
    "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window", "a",
]


def build_corpus(n_per_class: int = 400, seed: int = 7) -> list[tuple[str, str]]:
    rng = np.random.RandomState(seed)
    samples: list[tuple[str, str]] = []
    for _ in range(n_per_class):
        n = int(rng.randint(20, 120))
        words = [VOCAB[int(i)] for i in rng.randint(0, len(VOCAB), size=n)]
        samples.append((" ".join(words), "data_report"))
    for i in range(n_per_class):
        doc_id = int(rng.randint(0, 1_000_000))
        samples.append(("\n".join(po_lines(doc_id)), "purchase_order"))
    for i in range(n_per_class):
        doc_id = int(rng.randint(0, 1_000_000))
        samples.append(("\n".join(invoice_lines(doc_id)), "invoice"))
    return samples


def main() -> None:
    model = train_nb(build_corpus())
    save_model(model)
    print("wrote configs/ml_model.npz",
          {k: getattr(v, "shape", None) for k, v in model.items()})


if __name__ == "__main__":
    main()
