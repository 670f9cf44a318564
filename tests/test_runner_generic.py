"""Generic resumable runner: any pipeline gets the checkpoint contract."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile


def _pipeline(ds):
    from documentai_ray.stages.lines import c4_line_filter_batch

    return ds.map_batches(c4_line_filter_batch, batch_format="pyarrow",
                          batch_size=256)


def _corpus():
    from documentai_ray.sources.pages import pages_dataset
    from documentai_ray.stages.extract import extract_batch

    ds = pages_dataset("/root/testdata/sf0.001", with_dups=False)
    return ds.map_batches(extract_batch, batch_format="pyarrow",
                          batch_size=256).select_columns(["url", "text"])


def test_generic_runner_resume_reproduces_digests(ray_session):
    from documentai_ray.pipelines.runner import run_pipeline_to_parquet

    clean_dir = tempfile.mkdtemp(prefix="runner_clean_")
    crash_dir = tempfile.mkdtemp(prefix="runner_crash_")
    try:
        m_clean = run_pipeline_to_parquet(clean_dir, _corpus(), _pipeline,
                                          n_buckets=4,
                                          text_col="clean_text")
        assert set(m_clean) == {0, 1, 2, 3}

        # simulate a crash: full run, then one bucket loses its manifest
        # while its (now untrusted) partial files stay on disk
        m1 = run_pipeline_to_parquet(crash_dir, _corpus(), _pipeline,
                                     n_buckets=4, text_col="clean_text")
        victim = sorted(m1)[1]
        os.remove(os.path.join(crash_dir, "_manifests",
                               f"bucket={victim}.json"))
        files = glob.glob(os.path.join(crash_dir, f"bucket={victim}", "*"))
        assert files  # partial files present, manifest gone
        m2 = run_pipeline_to_parquet(crash_dir, _corpus(), _pipeline,
                                     n_buckets=4, text_col="clean_text")
        assert {b: m["digest"] for b, m in m2.items()} == \
               {b: m["digest"] for b, m in m_clean.items()}
        assert {b: m["rows"] for b, m in m2.items()} == \
               {b: m["rows"] for b, m in m_clean.items()}
    finally:
        shutil.rmtree(clean_dir, ignore_errors=True)
        shutil.rmtree(crash_dir, ignore_errors=True)


def test_declarative_compile_validates_up_front():
    import pytest

    from documentai_ray.pipelines.declarative import compile_pipeline

    with pytest.raises(KeyError, match="unknown stage 'nope'"):
        compile_pipeline({"pipeline": [{"stage": "nope"}]})


def test_declarative_matches_hand_composed(ray_session):
    import importlib.util as u

    spec = u.spec_from_file_location("e", "/root/repo/__ray_entry__.py")
    m = u.module_from_spec(spec)
    spec.loader.exec_module(m)
    sf = "/root/testdata/sf0.001"
    a = m.queries()["web_curation"](sf).to_pandas()
    b = m.queries()["config_pipeline"](sf).to_pandas()
    key = lambda df: df.sort_values("url").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(key(a), key(b))


def test_declarative_new_stages_compile_and_run(ray_session):
    from documentai_ray.pipelines.declarative import compile_pipeline
    spec = {"pipeline": [
        {"stage": "group_fold", "params": {"group_col": "g", "folds": 3}},
        {"stage": "percent_rank",
         "params": {"key_col": "g", "val_col": "v"}},
    ]}
    run = compile_pipeline(spec)
    ds = ray_session.data.from_items(
        [{"g": "a", "v": 1}, {"g": "a", "v": 2}, {"g": "b", "v": 5}])
    out = run(ds, "/unused").to_pandas()
    assert set(out.columns) == {"g", "v", "fold", "pct_ppm"}
    assert set(out[out["g"] == "a"]["pct_ppm"]) == {0, 1_000_000}
    assert out.groupby("g")["fold"].nunique().max() == 1
