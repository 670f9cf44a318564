"""Pages-corpus synthesis: distributed generator equivalence."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from documentai_ray.sources import pages
from tests.conftest import SF_SMOKE


class TestDistributedSynthEquivalence:
    def test_content_identical_up_to_order(self, ray_session, tmp_path):
        out = os.path.join(str(tmp_path), "dist")
        pages.write_pages_corpus_distributed(out, SF_SMOKE, copies=1,
                                             with_dups=True)
        import pyarrow.dataset as pads

        dist = pads.dataset(out).to_table().to_pandas()
        loop = pages.synth_pages_table(SF_SMOKE, with_dups=True).to_pandas()
        key = ["url", "warc_ts"]
        dist = dist.sort_values(key).reset_index(drop=True)
        loop = loop.sort_values(key).reset_index(drop=True)
        assert len(dist) == len(loop)
        for col in ["url", "warc_ts", "text", "lang"]:
            assert (dist[col] == loop[col]).all(), col
        assert all(a == b for a, b in zip(dist["html"], loop["html"]))

    def test_batch_generator_copies(self):
        import pyarrow as pa

        docs = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                             columns=["doc_id", "text", "lang", "source"])
        small = docs.slice(0, 10)
        out1 = pages.synth_pages_batch(small, copies=1, with_dups=False)
        out2 = pages.synth_pages_batch(small, copies=2, with_dups=False)
        assert out2.num_rows == 2 * out1.num_rows
        # copy-1 urls carry the 10M doc_id offset
        assert any("/p/1000000" in u for u in out2.column("url").to_pylist())
