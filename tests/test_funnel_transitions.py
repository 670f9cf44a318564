"""Per-user ordered-event operators: LAG transitions and funnel depth."""

from __future__ import annotations

import pandas as pd

from documentai_ray.stages.windows import funnel_depth, transitions_per_key


def _ts(m: int) -> pd.Timestamp:
    return pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=m)


class TestTransitions:
    def test_counts_and_key_boundary(self, ray_session):
        # user 1: a -> b -> b ; user 2: b -> a.  The boundary between
        # users must NOT produce a (b, b) or (b, a) phantom transition.
        rows = [
            {"user_id": 1, "ts": _ts(0), "event_type": "a", "event_id": 1},
            {"user_id": 1, "ts": _ts(1), "event_type": "b", "event_id": 2},
            {"user_id": 1, "ts": _ts(2), "event_type": "b", "event_id": 3},
            {"user_id": 2, "ts": _ts(0), "event_type": "b", "event_id": 4},
            {"user_id": 2, "ts": _ts(1), "event_type": "a", "event_id": 5},
        ]
        out = transitions_per_key(ray_session.data.from_items(rows),
                                  num_partitions=4).to_pandas()
        got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
        assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "a"): 1}

    def test_tiebreak_by_event_id(self, ray_session):
        # same ts: order is decided by event_id, so a(1) -> b(2) -> c(3).
        rows = [
            {"user_id": 1, "ts": _ts(0), "event_type": "b", "event_id": 2},
            {"user_id": 1, "ts": _ts(0), "event_type": "a", "event_id": 1},
            {"user_id": 1, "ts": _ts(0), "event_type": "c", "event_id": 3},
        ]
        out = transitions_per_key(ray_session.data.from_items(rows),
                                  num_partitions=2).to_pandas()
        got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
        assert got == {("a", "b"): 1, ("b", "c"): 1}


class TestFunnel:
    STEPS = ("view", "click", "purchase")

    def _depths(self, ray_session, rows):
        ds = ray_session.data.from_items(rows)
        out = funnel_depth(ds, steps=self.STEPS, num_partitions=4).to_pandas()
        return dict(zip(out["user_id"], out["depth"]))

    def test_strict_order_required(self, ray_session):
        # user 1 completes in order; user 2 clicks BEFORE viewing (depth 1);
        # user 3 never views (depth 0).
        rows = [
            {"user_id": 1, "ts": _ts(0), "event_type": "view"},
            {"user_id": 1, "ts": _ts(1), "event_type": "click"},
            {"user_id": 1, "ts": _ts(2), "event_type": "purchase"},
            {"user_id": 2, "ts": _ts(0), "event_type": "click"},
            {"user_id": 2, "ts": _ts(1), "event_type": "view"},
            {"user_id": 3, "ts": _ts(0), "event_type": "error"},
        ]
        assert self._depths(ray_session, rows) == {1: 3, 2: 1, 3: 0}

    def test_same_ts_does_not_advance(self, ray_session):
        # click at the SAME ts as the first view: strict > rejects it.
        rows = [
            {"user_id": 1, "ts": _ts(0), "event_type": "view"},
            {"user_id": 1, "ts": _ts(0), "event_type": "click"},
        ]
        assert self._depths(ray_session, rows) == {1: 1}

    def test_earliest_prior_step_is_anchor(self, ray_session):
        # first view at t0; a click at t1 counts even though a LATER view
        # exists at t2 (anchor is the EARLIEST completion of the prior step).
        rows = [
            {"user_id": 1, "ts": _ts(0), "event_type": "view"},
            {"user_id": 1, "ts": _ts(1), "event_type": "click"},
            {"user_id": 1, "ts": _ts(2), "event_type": "view"},
        ]
        assert self._depths(ray_session, rows) == {1: 2}


class TestGapFillLocf:
    def test_gap_zero_locf_and_leading_null(self):
        import pandas as pd
        from documentai_ray.stages.windows import gap_fill_locf
        h = lambda i: pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i)
        cells = pd.DataFrame({
            "k": ["a", "a", "b"],
            "hour": [h(0), h(2), h(2)],
            "n": [5, 7, 1],
            "g": [100, 200, 50],
        })
        out = gap_fill_locf(cells, key_col="k", bucket_col="hour",
                            count_col="n", gauge_col="g")
        assert len(out) == 6  # 2 keys x 3 hours
        a1 = out[(out["k"] == "a") & (out["hour"] == h(1))].iloc[0]
        assert a1["n"] == 0 and a1["g"] == 100  # gap: count 0, LOCF gauge
        b0 = out[(out["k"] == "b") & (out["hour"] == h(0))].iloc[0]
        assert b0["n"] == 0 and pd.isna(b0["g"])  # before first obs: NULL


class TestTableChecksum:
    def test_order_independent_and_content_sensitive(self, ray_session):
        # the checksum must not depend on row order but must change when
        # any row's content changes — the mod-2^64 wrapping sum contract.
        from documentai_ray.stages.sketches import md5_le64
        rows = ["t|1|a", "t|2|b", "t|3|c"]
        fwd = sum(md5_le64(s) for s in rows) % (1 << 64)
        rev = sum(md5_le64(s) for s in reversed(rows)) % (1 << 64)
        assert fwd == rev
        changed = sum(md5_le64(s) for s in ["t|1|a", "t|2|B", "t|3|c"]) \
            % (1 << 64)
        assert changed != fwd
