"""Job entry point — the ``ray job submit`` surface of the engine.

    ray job submit -- python -m documentai_ray.cli run \
        --input /data/pages --output /data/out --buckets 256

Runs the flagship pipeline over a Parquet pages directory with the full
scale plumbing: heavy-host detection → salted url-hash bucketing → resume
filter → extraction/quality/classification/entities/rules → partitioned
parquet + per-bucket manifests + job metrics. Re-submitting after a failure
resumes from the completed-bucket set.

This module owns a Ray session ONLY when run as a script (guarded init);
imported, it never touches the session (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def run(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(prog="documentai_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run the flagship pipeline")
    runp.add_argument("--input", required=True, help="pages parquet dir/file")
    runp.add_argument("--output", required=True, help="output dir")
    runp.add_argument("--buckets", type=int, default=64)
    runp.add_argument("--heavy-share", type=float, default=0.10)
    runp.add_argument("--salt-k", type=int, default=8)
    runp.add_argument("--batch-size", type=int, default=1024)
    # standalone-CLI analogs of the reference's classifier/quality entry
    # points (documentClassifier.py:1693-1711, universal_analyzer.py:177-218)
    for name in ("classify", "quality", "extract"):
        s = sub.add_parser(name, help=f"run the {name} sub-pipeline")
        s.add_argument("--input", required=True)
        s.add_argument("--output", required=True)
        s.add_argument("--batch-size", type=int, default=1024)
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import documentai_ray

    documentai_ray.register_for_ray_by_value()
    try:
        import ray.data

        ds = ray.data.read_parquet(args.input)
        if args.cmd == "run":
            from documentai_ray.pipelines.flagship import run_to_parquet

            manifests = run_to_parquet(
                args.output,
                ds=ds,
                n_buckets=args.buckets,
                heavy_share=args.heavy_share,
                salt_k=args.salt_k,
                batch_size=args.batch_size,
            )
            return {
                "buckets_completed": len(manifests),
                "rows": sum(m["rows"] for m in manifests.values()),
                "output": args.output,
            }

        from documentai_ray.stages.extract import extract_batch

        out = ds.map_batches(extract_batch, batch_format="pyarrow",
                             batch_size=args.batch_size)
        out = out.drop_columns(["word_boxes"])
        if args.cmd in ("quality", "classify"):
            from documentai_ray.stages.quality import quality_batch

            out = out.map_batches(quality_batch, batch_format="pyarrow",
                                  batch_size=args.batch_size)
        if args.cmd == "classify":
            from documentai_ray.stages.classify import classify_pipeline

            out = classify_pipeline(out, batch_size=args.batch_size)
        out.write_parquet(args.output)
        return {"rows": ray.data.read_parquet(args.output).count(),
                "output": args.output}
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    print(json.dumps(run(sys.argv[1:])))
