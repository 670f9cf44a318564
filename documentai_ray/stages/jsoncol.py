"""Semi-structured (JSON) column handling.

Crawl/event tables carry JSON side-cars (`props`, page metadata, API
payloads). The engine's contract: parse ONCE into typed Arrow columns at
the edge of the pipeline (map-only, per-batch), then every downstream
stage works on plain columns — never re-parse per use. Mirrored by
DuckDB ``json_extract`` in the oracle.
"""

from __future__ import annotations

import json

import pyarrow as pa

_TYPES = {"int64": pa.int64(), "float64": pa.float64(), "string": pa.string(),
          "bool": pa.bool_()}


def parse_json_column(ds, *, col: str = "props",
                      fields: dict[str, str] | None = None,
                      drop_source: bool = True):
    """Append one typed column per requested field (``{name: type}`` with
    type in int64/float64/string/bool). Missing keys / malformed JSON →
    null, matching ``json_extract``'s null semantics."""
    fields = fields or {}

    def parse(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in fields}
        for raw in batch.column(col).to_pylist():
            try:
                obj = json.loads(raw) if raw else {}
            except (ValueError, TypeError):
                obj = {}
            for name in fields:
                v = obj.get(name)
                cols[name].append(v)
        out = batch.drop_columns([col]) if drop_source else batch
        for name, typ in fields.items():
            out = out.append_column(name, pa.array(cols[name], _TYPES[typ]))
        return out

    return ds.map_batches(parse, batch_format="pyarrow")
