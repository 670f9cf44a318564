"""Cross-process / cross-parallelism determinism check (FIXTURES.md §4,
the rebuild's answer to /root/reference/test_consistency.py).

Runs the flagship pipeline on the same input in fresh processes at two
parallelism levels (num_cpus=8 and num_cpus=32) twice each, reduces every
run to one order-insensitive digest (sum of per-row md5(url, text, verdict,
category, votes, rules_passed) mod 2^64), and requires all four digests to
be identical — content equality, not block-order equality.

Usage: python tools/determinism_check.py [sf_dir]
Prints one JSON line; exit 1 on mismatch.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_WORKER = r"""
import hashlib, os, sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=int(os.environ["DCHECK_CPUS"]),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from documentai_ray.pipelines.flagship import flagship

digest = 0
n = 0
ds = flagship(sf_dir={sf_dir!r}).select_columns(
    ["url", "text", "verdict", "category", "votes", "rules_passed"])
for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
    cols = [batch.column(c).to_pylist() for c in
            ["url", "text", "verdict", "category", "votes", "rules_passed"]]
    for row in zip(*cols):
        h = hashlib.md5("\x00".join(map(str, row)).encode()).digest()
        digest = (digest + int.from_bytes(h[:8], "little")) % (1 << 64)
        n += 1
print("DIGEST", digest, n)
ray.shutdown()
"""


def run(cpus: int, sf_dir: str) -> tuple[int, int]:
    env = dict(os.environ, DCHECK_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, "-c", _WORKER.format(repo=REPO, sf_dir=sf_dir)],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    for line in out.splitlines():
        if line.startswith("DIGEST "):
            _, d, n = line.split()
            return int(d), int(n)
    raise RuntimeError(f"no digest in output:\n{out[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    runs = [("cpus8_run1", run(8, sf_dir)), ("cpus8_run2", run(8, sf_dir)),
            ("cpus32_run1", run(32, sf_dir)), ("cpus32_run2", run(32, sf_dir))]
    digests = {name: d for name, (d, _n) in runs}
    rows = {name: n for name, (_d, n) in runs}
    ok = len(set(digests.values())) == 1 and len(set(rows.values())) == 1
    print(json.dumps({"metric": "determinism", "identical": ok,
                      "digests": digests, "rows": rows, "sf_dir": sf_dir}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
