"""Per-operator wall-time profile of the flagship pipeline (``ds.stats()``)
— the "measure, don't guess" loop. Prints a condensed operator table plus
the full stats dump with --full.

Usage: python tools/profile_flagship.py [pages_parquet_dir] [--full]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--full"]
    full = "--full" in sys.argv
    pages = args[0] if args else "/tmp/graft_bench/pages_sf0.1_x32"

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data

    from documentai_ray.pipelines.flagship import flagship

    if not os.path.exists(pages):
        from bench import ensure_corpus

        pages = ensure_corpus()
    ds = ray.data.read_parquet(pages, columns=["url", "warc_ts", "html", "lang"])
    res = flagship(ds)
    t0 = time.perf_counter()
    res.write_parquet("/tmp/graft_bench/profile_out")  # stats need a real sink
    total = time.perf_counter() - t0
    stats = res.stats()
    print(f"total={total:.2f}s")
    blocks = stats.split("Operator ")[1:]
    if not blocks:
        print(stats[:4000])
    for block in blocks:
        header = block.split("\n")[0][:90]
        m = re.search(r"Remote wall time:.*?([\d.]+(?:ms|s|us)) total", block)
        print(f"  {header:92s} remote_wall_total={m.group(1) if m else '?'}")
    if full:
        print(stats)
    ray.shutdown()


if __name__ == "__main__":
    main()
