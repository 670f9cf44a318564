"""strip_host_templates — per-host boilerplate-chrome line removal."""

from __future__ import annotations

import pandas as pd
import pytest


def _corpus():
    import ray.data

    rows = []
    # host A: 8 pages sharing a footer line (8/8 = 100% ≥ 1/4) and a
    # header on 2/8 = 25% (boundary: 4·2 ≥ 8 → template)
    for i in range(8):
        head = "SPECIAL HEADER" if i < 2 else f"unique head {i}"
        rows.append({"url": f"https://a.example.com/p/{i}",
                     "text": f"{head}\nbody line {i}\nCOMMON FOOTER"})
    # host B: only 3 pages (< min_pages 5) — nothing stripped
    for i in range(3):
        rows.append({"url": f"https://b.example.com/p/{i}",
                     "text": f"SHARED\nbody {i}"})
    # empty page: dropped from output
    rows.append({"url": "https://a.example.com/p/empty", "text": ""})
    return ray.data.from_items(rows).repartition(4)


@pytest.mark.parametrize("broadcast_cap", [1_000_000, 0])
def test_template_strip_both_paths(ray_session, broadcast_cap):
    """broadcast path and the partitioned (per-host list join) path must
    produce the identical output."""
    from documentai_ray.stages.lines import strip_host_templates

    out = strip_host_templates(_corpus(), min_pages=5, share_num=1,
                               share_den=4,
                               broadcast_cap=broadcast_cap).to_pandas()
    out = out.sort_values("url").reset_index(drop=True)
    by_url = dict(zip(out["url"], out["text_clean"]))
    # host A: footer stripped everywhere, boundary header stripped too
    assert by_url["https://a.example.com/p/0"] == "body line 0"
    assert by_url["https://a.example.com/p/5"] == "unique head 5\nbody line 5"
    # host B under min_pages: untouched
    assert by_url["https://b.example.com/p/1"] == "SHARED\nbody 1"
    # empty page dropped
    assert "https://a.example.com/p/empty" not in by_url
    # n_total counts original lines, n_kept the survivors
    row = out[out.url == "https://a.example.com/p/0"].iloc[0]
    assert (row.n_total, row.n_kept) == (3, 1)


def test_all_template_page_dropped(ray_session):
    import ray.data

    from documentai_ray.stages.lines import strip_host_templates

    rows = [{"url": f"https://c.example.com/p/{i}", "text": "ONLY CHROME"}
            for i in range(6)]
    out = strip_host_templates(
        ray.data.from_items(rows), min_pages=5).to_pandas()
    assert len(out) == 0
