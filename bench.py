"""Benchmark harness — prints ONE JSON line with headline + per-query times.

Headline: flagship end-to-end pipeline (read parquet pages → exact dedup →
extract → quality → classify (4 techniques incl. ML actor pool) → entities →
rules → write parquet) over a deterministic pages corpus derived from
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Usage:
    python bench.py              # one timed run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # same job at 8 and 32 CPUs in fresh
                                 # processes → throughput + scaling efficiency

The pages corpus is materialized once under /tmp/graft_bench (sharded
parquet) and the OS page cache is warmed with one untimed read, so timed
runs measure compute + shuffle, not first-touch disk I/O.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_COPIES = int(os.environ.get("GRAFT_BENCH_COPIES", "64"))
CORPUS_ROOT = "/tmp/graft_bench"


def _synth_version() -> str:
    """Content hash of the corpus synthesizer — changing the page rules
    (archetypes, goldens) auto-invalidates cached bench corpora."""
    import hashlib

    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "documentai_ray", "sources", "pages.py")
    with open(p, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()[:8]


def corpus_dir(copies: int | None = None, mode: str = "") -> str:
    tag = os.path.basename(os.path.normpath(SF_DIR))
    return os.path.join(
        CORPUS_ROOT,
        f"pages_{tag}{'_' + mode if mode else ''}"
        f"_x{copies or BENCH_COPIES}_{_synth_version()}")


def ensure_corpus(copies: int | None = None, **kwargs) -> str:
    """Materialize the pages corpus to sharded parquet (deterministic).
    Built as a Ray pipeline when a session is live (the corpus generator
    is itself a map_batches stage); plain loop otherwise."""
    d = corpus_dir(copies, mode="_".join(sorted(k for k, v in kwargs.items() if v)))
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        import shutil

        import ray

        shutil.rmtree(d, ignore_errors=True)
        c = copies or BENCH_COPIES
        if ray.is_initialized():
            from documentai_ray.sources.pages import write_pages_corpus_distributed

            write_pages_corpus_distributed(d, SF_DIR, copies=c, **kwargs)
        else:
            from documentai_ray.sources.pages import write_pages_corpus

            write_pages_corpus(d, SF_DIR, shards=32, copies=c, **kwargs)
        with open(marker, "w") as f:
            f.write("ok")
    return d


def run_benchmarks() -> dict:
    import logging

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    logging.getLogger("ray").setLevel(logging.ERROR)
    import documentai_ray

    documentai_ray.register_for_ray_by_value()
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import ray.data

    from documentai_ray.pipelines.flagship import flagship
    from documentai_ray.stages.dedup import lsh_candidate_pairs
    from documentai_ray.stages.extract import extract_batch
    from documentai_ray.stages.quality import quality_batch

    # Corpus build churns workers and the object store; restart the Ray
    # session after it so timed runs start from a clean executor.
    pages_path = ensure_corpus()
    minhash_path = ensure_corpus(copies=1)
    pdf_path = ensure_corpus(copies=16, pdf_mode=True)
    ray.shutdown()
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    documentai_ray.register_for_ray_by_value()
    # warm page cache (untimed) — full read, not a metadata-only count
    n_rows = ray.data.read_parquet(pages_path).map_batches(
        lambda b: b.select(["url"]), batch_format="pyarrow").count()

    # Untimed pipeline warmup over the ×1 corpus, fanned across 2×CPU
    # blocks so EVERY worker process pays its import/module-load cost here:
    # the timed runs then measure steady-state throughput (the regime a
    # long-running crawl job is in), not cold python-worker startup.
    def _warmup():
        wout = os.path.join(CORPUS_ROOT, f"warmup_{NUM_CPUS}")
        import shutil as _sh

        _sh.rmtree(wout, ignore_errors=True)
        ds = ray.data.read_parquet(minhash_path,
                                   columns=["url", "warc_ts", "html", "lang"],
                                   override_num_blocks=NUM_CPUS * 2)
        flagship(ds, batch_size=1024).write_parquet(wout)

    _warmup()

    queries: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        queries[name] = round(dt, 3)
        return out

    # headline: flagship end-to-end to parquet
    out_dir = os.path.join(CORPUS_ROOT, f"out_{NUM_CPUS}")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)

    def run_flagship():
        # prune at the read: the corpus's golden 'text' column never leaves
        # storage (extract_batch recomputes text from the payload)
        ds = ray.data.read_parquet(pages_path,
                                   columns=["url", "warc_ts", "html", "lang"])
        res = flagship(ds, batch_size=1024)
        res.write_parquet(out_dir)
        return None

    timed("flagship_e2e", run_flagship)
    headline = queries["flagship_e2e"]

    def run_extract_only():
        ds = ray.data.read_parquet(pages_path, columns=["url", "html", "lang"])
        ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                            batch_size=256, zero_copy_batch=True)
        ds = ds.map_batches(quality_batch, batch_format="pyarrow", batch_size=256)
        return ds.count()

    timed("extract_quality", run_extract_only)

    # word-box enrichment cost delta (VERDICT r2 #6): the same flagship
    # chain over a PDF-mode corpus (rows carry real word boxes), with and
    # without the entity-bbox enrichment + box plumbing
    def run_flagship_pdf(with_boxes: bool):
        def f():
            ds = ray.data.read_parquet(
                pdf_path, columns=["url", "warc_ts", "html", "lang"])
            return flagship(ds, batch_size=1024, dedup=False,
                            with_entity_boxes=with_boxes).count()

        return f

    timed("flagship_pdf", run_flagship_pdf(False))
    timed("flagship_boxes", run_flagship_pdf(True))

    # minhash runs on the ×1 corpus: the ×N replication makes every page an
    # exact dup of N-1 others, which quadratically inflates the (correct)
    # candidate-pair set and measures pair materialization, not LSH.
    def run_minhash():
        ds = ray.data.read_parquet(minhash_path, columns=["url", "html"])
        ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=1024)
        return lsh_candidate_pairs(ds.select_columns(["url", "text"]),
                                   id_col="url").count()

    timed("minhash_lsh", run_minhash)

    def run_q1():
        import __ray_entry__ as e

        return e.queries()["q1_lineitem"](SF_DIR)

    timed("q1_lineitem", run_q1)

    # round-2 heavy corpus ops (each materializes its small result)
    def run_named(name):
        def f():
            import __ray_entry__ as e

            out = e.queries()[name](SF_DIR)
            return out.to_pandas() if hasattr(out, "to_pandas") else out

        return f

    # mixed-payload dispatch (html + minipdf + real-PDF ±Flate + docx in
    # one stream): times payload synthesis + the magic-byte dispatch parse
    timed("extract_mixed", run_named("extract_mixed"))
    # round-3 parse-surface representatives: encrypted-PDF open (RC4 +
    # AESV2 key derivation, stream decrypt, relayout parse) and the
    # scanned-fax loop (render → G4 encode → PDF → G4 decode → OCR)
    timed("pdf_encrypted_extract", run_named("pdf_encrypted_extract"))
    timed("fax_pdf_ocr", run_named("fax_pdf_ocr"))
    # round-4 parse-surface representatives: password-protected open
    # (user/owner Algorithms 6/7/11 incl. AES-256 KDF), G3 fax (T.4
    # 1-D MH + mixed MR) and JBIG2 (MQ arithmetic generic region)
    timed("pdf_password_extract", run_named("pdf_password_extract"))
    timed("pdf_g3_ocr", run_named("pdf_g3_ocr"))
    timed("pdf_jbig2_ocr", run_named("pdf_jbig2_ocr"))
    timed("pdf_jpx_extract", run_named("pdf_jpx_extract"))
    # the literal Common-Crawl entry path: .warc.gz shards → full chain
    timed("flagship_warc", run_named("flagship_warc"))
    timed("line_dedup", run_named("line_dedup"))
    timed("repeated_passages", run_named("repeated_passages"))
    timed("web_curation", run_named("web_curation"))
    timed("ppjoin_pairs", run_named("ppjoin_pairs"))
    # round-2 new-family representatives: retrieval scoring (two-pass
    # stats + map-side sparse-hit scoring + grouped top-k) and survival
    # (user exchange + histogram + 30-step fold)
    timed("bm25_topk", run_named("bm25_topk"))
    timed("km_survival", run_named("km_survival"))

    result = {
        "metric": "flagship_e2e_sec",
        "value": headline,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": n_rows,
        "docs_per_sec": round(n_rows / headline, 1),
        "cpu_calibration": _cpu_calibration(),
    }
    ray.shutdown()
    return result


def _cpu_calibration() -> dict:
    """Host-speed probe recorded alongside every benchmark: the sandbox VM
    is multi-tenant, and 32 vCPUs have delivered anywhere from ~13 to ~32
    cores of real parallel throughput across sessions — absolute seconds
    are not comparable across runs without this. ``single_md5_s`` is a
    fixed single-thread hash loop; ``par32_speedup`` is the aggregate
    speedup of 32 concurrent copies (≈ effective usable cores)."""
    import time as _time
    from concurrent.futures import ProcessPoolExecutor

    t = _time.time()
    _calib_work(0)
    single = _time.time() - t
    with ProcessPoolExecutor(32) as ex:
        list(ex.map(_calib_noop, range(32)))  # warm the pool untimed
        t = _time.time()
        list(ex.map(_calib_work, range(32)))
        wall = _time.time() - t
    return {"single_md5_s": round(single, 3),
            "par32_speedup": round(single * 32 / wall, 1)}


def _calib_noop(_):
    return 0


def _calib_work(_):
    import hashlib

    x = b"x" * 1000
    for _i in range(200000):
        x = hashlib.md5(x).digest()
    return 1


def run_scaling() -> None:
    """Same job at two parallelism levels in fresh processes (the in-sandbox
    stand-in for N- vs 4N-node clusters; see BASELINE.md).

    Runs on a 2× larger corpus than the headline bench (``×128`` by
    default): the scaling criterion measures SATURATED throughput — on the
    small corpus the one non-scaling cost (the single-node dedup exchange,
    which multi-node scales with network bandwidth) plus fixed startup
    dominates the 32-CPU wall and the ratio measures overhead, not the
    pipeline."""
    global BENCH_COPIES
    lo, hi = 8, 32
    scale_copies = int(os.environ.get("GRAFT_SCALING_COPIES",
                                      str(2 * BENCH_COPIES)))
    os.environ["GRAFT_BENCH_COPIES"] = str(scale_copies)
    BENCH_COPIES = scale_copies
    # build the corpus once (distributed) so both runs read identical input
    import ray

    ray.init(address="local", num_cpus=hi, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        ensure_corpus()
        ensure_corpus(copies=1)
        ensure_corpus(copies=16, pdf_mode=True)
    finally:
        ray.shutdown()

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        # PIN the leg to exactly ncpu physical cores: ray.init(num_cpus=N)
        # only caps Ray's logical accounting — worker-internal native
        # threads (Arrow kernels, numpy) happily spill onto the other
        # idle cores, inflating the small leg's throughput and deflating
        # the measured ratio (observed: an unpinned 8-CPU leg ran 14.3k
        # docs/s on a quiet 32-core box — 1.6× its pinned speed — turning
        # a ~0.9 efficiency into an apparent 0.56). An N-node vs 4N-node
        # cluster gives each leg only its own cores; taskset is the
        # single-box equivalent.
        cmd = ["taskset", "-c", f"0-{ncpu - 1}",
               sys.executable, os.path.abspath(__file__)]
        out = subprocess.run(cmd, env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # best-of-2 fresh processes: single runs carry ±10% shuffle/OS
        # noise, which at a 4× CPU ratio moves the efficiency by ±0.08 —
        # the minimum is the steady-state throughput estimate
        a, b = run_once(ncpu), run_once(ncpu)
        return a if a["value"] <= b["value"] else b

    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
        "rows": r_hi["rows"],
        "cpus": [lo, hi],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_benchmarks()))
