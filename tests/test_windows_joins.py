"""Window operators and join operators tests."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from documentai_ray.stages import joins, windows
from documentai_ray.stages.entities import extract_html_tables, extract_table_tags


def _ev(ts_min: float, typ: str = "a", user: int = 1):
    return {"ts": dt.datetime(2024, 1, 1) + dt.timedelta(minutes=ts_min),
            "event_type": typ, "user_id": user, "value": 1.0}


class TestWindows:
    def test_tumbling(self, ray_session):
        ds = ray_session.data.from_items([_ev(5), _ev(59), _ev(61), _ev(125, "b")])
        out = windows.tumbling_window_agg(ds).to_pandas()
        got = {(r.window_start.hour, r.event_type): r.n_events
               for r in out.itertuples()}
        assert got == {(0, "a"): 2, (1, "a"): 1, (2, "b"): 1}

    def test_sliding_membership_count(self, ray_session):
        # one event → member of exactly window/slide = 4 windows
        ds = ray_session.data.from_items([_ev(31)])
        out = windows.sliding_window_agg(ds, window_minutes=60,
                                         slide_minutes=15).to_pandas()
        assert len(out) == 4 and (out["n_events"] == 1).all()
        starts = sorted(out["window_start"])
        assert starts[-1] - starts[0] == pd.Timedelta(minutes=45)
        # the latest window starts at the event's slide bucket (30 min)
        assert starts[-1] == pd.Timestamp(2024, 1, 1, 0, 30)

    def test_sessions(self, ray_session):
        ds = ray_session.data.from_items(
            [_ev(0), _ev(10), _ev(60), _ev(65), _ev(200)])
        out = windows.session_windows(ds, gap_minutes=30).to_pandas()
        assert out.iloc[0]["n_sessions"] == 3
        assert out.iloc[0]["max_session_events"] == 2


class TestJoins:
    def test_hash_join_inner(self, ray_session):
        left = ray_session.data.from_items(
            [{"k": i % 3, "lv": i} for i in range(9)])
        right = ray_session.data.from_items(
            [{"k": 0, "rv": "zero"}, {"k": 1, "rv": "one"}])
        out = joins.hash_join(left, right, on="k").to_pandas()
        assert len(out) == 6  # k=2 rows dropped (inner)
        assert set(out["rv"]) == {"zero", "one"}
        assert set(out.columns) == {"k", "lv", "rv"}

    def test_hash_join_collision_detection(self, ray_session):
        a = ray_session.data.from_items([{"k": 1, "x": 1}])
        b = ray_session.data.from_items([{"k": 1, "x": 2}])
        with pytest.raises(ValueError, match="collision"):
            joins.hash_join(a, b, on="k")

    def test_broadcast_join(self, ray_session):
        fact = ray_session.data.from_items([{"ck": 1, "v": 10}, {"ck": 2, "v": 20}])
        dim = pd.DataFrame({"ck": [1, 2], "name": ["a", "b"]})
        out = joins.broadcast_join(fact, dim, fact_key="ck", dim_key="ck").to_pandas()
        assert dict(zip(out["v"], out["name"])) == {10: "a", 20: "b"}

    def test_asof_join(self, ray_session):
        quotes = ray_session.data.from_items(
            [{"sym": "x", "t": 1, "px": 1.0}, {"sym": "x", "t": 5, "px": 2.0}])
        trades = ray_session.data.from_items(
            [{"sym": "x", "t": 3, "qty": 7}, {"sym": "x", "t": 6, "qty": 8}])
        out = joins.asof_join(trades, quotes, on="t", by="sym").to_pandas()
        out = out.sort_values("t")
        assert out["px"].tolist() == [1.0, 2.0]


class TestHtmlTables:
    def test_table_rows(self):
        html = ("<table><tr><th>PO</th><td>PO-1</td></tr>"
                "<tr><th>QTY</th><td>5</td></tr></table>")
        assert extract_html_tables(html) == [[["PO", "PO-1"], ["QTY", "5"]]]

    def test_tag_dict_first_wins(self):
        html = ("<table><tr><td>A</td><td>1</td></tr></table>"
                "<table><tr><td>A</td><td>2</td><td>x</td></tr>"
                "<tr><td>B</td><td>3</td></tr></table>")
        assert extract_table_tags(html) == {"A": "1", "B": "3"}

    def test_no_tables(self):
        assert extract_table_tags("<p>hello</p>") == {}


class TestGroupedAggregates:
    def test_grouped_topk_matches_bruteforce(self, ray_session):
        import pandas as pd
        import ray.data

        from documentai_ray.stages.aggregates import grouped_topk

        rng_rows = [{"k": f"g{i % 5}", "v": (i * 37) % 101, "id": i}
                    for i in range(500)]
        ds = ray.data.from_items(rng_rows)
        got = grouped_topk(ds, key_col="k", sort_cols=["v", "id"],
                           ascending=[False, True], k=4).to_pandas()
        df = pd.DataFrame(rng_rows)
        want = (df.sort_values(["v", "id"], ascending=[False, True])
                .groupby("k", sort=False).head(4))
        assert (sorted(zip(got["k"], got["v"], got["id"]))
                == sorted(zip(want["k"], want["v"], want["id"])))

    def test_grouped_median_matches_statistics(self, ray_session):
        import statistics

        import ray.data

        from documentai_ray.stages.aggregates import grouped_median_int

        rows = [{"k": f"g{i % 3}", "v": (i * 13) % 29} for i in range(201)]
        ds = ray.data.from_items(rows)
        got = {r["k"]: r["m"] for r in
               grouped_median_int(ds, key_cols=["k"], val_col="v",
                                  out_col="m").take_all()}
        for key in ("g0", "g1", "g2"):
            vals = [r["v"] for r in rows if r["k"] == key]
            assert got[key] == float(statistics.median(vals)), key


class TestJoinVariants:
    def _sides(self):
        import ray.data

        left = ray.data.from_items(
            [{"k": i, "lv": f"L{i}"} for i in range(10)])
        right = ray.data.from_items(
            [{"k": i, "rv": f"R{i}"} for i in (2, 4, 6, 4)])  # dup key 4
        return left, right

    def test_semi_and_anti(self, ray_session):
        from documentai_ray.stages.joins import hash_join

        left, right = self._sides()
        semi = hash_join(left, right, on="k", how="semi").to_pandas()
        assert sorted(semi["k"]) == [2, 4, 6]       # no dup blowup
        assert list(semi.columns) == ["k", "lv"]     # left columns only
        left, right = self._sides()
        anti = hash_join(left, right, on="k", how="anti").to_pandas()
        assert sorted(anti["k"]) == [0, 1, 3, 5, 7, 8, 9]

    def test_left_join_null_fill(self, ray_session):
        from documentai_ray.stages.joins import hash_join

        left, right = self._sides()
        out = hash_join(left, right, on="k", how="left").to_pandas()
        assert len(out) == 11  # 10 left rows + 1 extra for dup key 4
        assert out[out["k"] == 3]["rv"].isna().all()
        assert set(out[out["k"] == 4]["rv"]) == {"R4"}


def test_merge_changelog_semantics(ray_session):
    import ray.data

    from documentai_ray.stages.joins import merge_changelog

    base = ray.data.from_items([
        {"k": 1, "v": "a", "ts": 0, "op": "I"},
        {"k": 2, "v": "b", "ts": 0, "op": "I"},
        {"k": 3, "v": "c", "ts": 0, "op": "I"},
        {"k": 4, "v": "d", "ts": 5, "op": "I"},   # base NEWER than change
    ])
    changes = ray.data.from_items([
        {"k": 2, "v": "b2", "ts": 1, "op": "U"},  # update wins
        {"k": 3, "v": "",   "ts": 1, "op": "D"},  # delete
        {"k": 3, "v": "c2", "ts": 1, "op": "U"},  # same ts as D → D wins
        {"k": 4, "v": "d2", "ts": 1, "op": "U"},  # older than base → loses
        {"k": 5, "v": "e",  "ts": 1, "op": "U"},  # upsert-new
    ])
    out = (merge_changelog(base, changes, key_col="k", num_partitions=8)
           .to_pandas().sort_values("k"))
    assert dict(zip(out["k"], out["v"])) == {1: "a", 2: "b2", 4: "d", 5: "e"}


class TestScd2Semantics:
    def test_version_boundaries_inclusive_exclusive(self, ray_session):
        # valid_from <= ts < valid_to: an order ON a version's start date
        # takes the NEW version (backward as-of picks the latest <=).
        import pandas as pd
        from documentai_ray.stages.joins import asof_join
        dim = ray_session.data.from_items([
            {"k": 1, "ts": pd.Timestamp("2020-01-01"), "version": 1},
            {"k": 1, "ts": pd.Timestamp("2020-06-01"), "version": 2},
        ])
        fact = ray_session.data.from_items([
            {"oid": 10, "k": 1, "ts": pd.Timestamp("2020-05-31")},
            {"oid": 11, "k": 1, "ts": pd.Timestamp("2020-06-01")},
            {"oid": 12, "k": 1, "ts": pd.Timestamp("2020-06-02")},
        ])
        out = asof_join(fact, dim, on="ts", by="k").to_pandas()
        got = dict(zip(out["oid"], out["version"]))
        assert got == {10: 1, 11: 2, 12: 2}


class TestBandJoin:
    def _brute(self, lrows, rrows, delta):
        return {(l["lid"], r["rid"]) for l in lrows for r in rrows
                if abs(l["lv"] - r["rv"]) <= delta}

    def test_equals_bruteforce_negatives_and_boundary(self, ray_session):
        from documentai_ray.stages.joins import band_join
        # values straddle 0 (floor-division bucketing on negatives) and
        # include exact-boundary |diff| == delta pairs on both signs
        lrows = [{"lid": i, "lv": v} for i, v in
                 enumerate([-17, -10, -5, 0, 3, 5, 9, 10, 23, 100])]
        rrows = [{"rid": i, "rv": v} for i, v in
                 enumerate([-22, -15, -10, 0, 5, 8, 15, 95, 105, 200])]
        L = ray_session.data.from_items(lrows)
        R = ray_session.data.from_items(rrows)
        out = band_join(L, R, left_on="lv", right_on="rv", delta=5,
                        num_partitions=4).to_pandas()
        got = set(zip(out["lid"], out["rid"]))
        assert got == self._brute(lrows, rrows, 5)
        # boundary pairs present: (-17) vs (-22) and 100 vs 95/105
        assert (0, 0) in got and (9, 7) in got and (9, 8) in got

    def test_each_pair_emitted_exactly_once(self, ray_session):
        from documentai_ray.stages.joins import band_join
        # equal values and cross-bucket-boundary values: the 3-copy
        # replication must never double-emit a pair
        lrows = [{"lid": i, "lv": v} for i, v in enumerate([10, 10, 14, 9])]
        rrows = [{"rid": i, "rv": v} for i, v in enumerate([10, 14, 5])]
        out = band_join(
            ray_session.data.from_items(lrows),
            ray_session.data.from_items(rrows),
            left_on="lv", right_on="rv", delta=5, num_partitions=3,
        ).to_pandas()
        pairs = list(zip(out["lid"], out["rid"]))
        assert len(pairs) == len(set(pairs))
        assert set(pairs) == self._brute(lrows, rrows, 5)

    def test_delta_validation_and_collision(self, ray_session):
        import pytest
        from documentai_ray.stages.joins import band_join
        ds = ray_session.data.from_items([{"v": 1}])
        with pytest.raises(ValueError):
            band_join(ds, ds, left_on="v", right_on="v", delta=0)
        with pytest.raises(ValueError):
            band_join(ds, ds, left_on="v", right_on="v", delta=1)


class TestOverlapJoin:
    def _brute(self, lrows, rrows):
        return {(l["lid"], r["rid"]) for l in lrows for r in rrows
                if l["ls"] <= r["re"] and r["rs"] <= l["le"]}

    def test_equals_bruteforce_with_long_and_negative_intervals(
            self, ray_session):
        from documentai_ray.stages.joins import overlap_join
        lrows = [
            {"lid": 0, "ls": -25, "le": -20},   # fully negative
            {"lid": 1, "ls": -3, "le": 4},      # straddles zero
            {"lid": 2, "ls": 10, "le": 10},     # point interval
            {"lid": 3, "ls": 0, "le": 95},      # spans many tiles
            {"lid": 4, "ls": 50, "le": 52},
        ]
        rrows = [
            {"rid": 0, "rs": -22, "re": -21},
            {"rid": 1, "rs": 4, "re": 9},       # touches lid=1 at 4 only
            {"rid": 2, "rs": 11, "re": 30},     # misses the point interval
            {"rid": 3, "rs": 90, "re": 200},
            {"rid": 4, "rs": 53, "re": 60},     # adjacent, NOT overlapping
        ]
        out = overlap_join(
            ray_session.data.from_items(lrows),
            ray_session.data.from_items(rrows),
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            tile=10, num_partitions=4,
        ).to_pandas()
        got = set(zip(out["lid"], out["rid"]))
        assert got == self._brute(lrows, rrows)
        assert (1, 1) in got           # closed-endpoint touch counts
        assert (2, 2) not in got       # 10 vs [11,30] does not
        assert (4, 4) not in got       # adjacency is not overlap

    def test_exactly_once_across_shared_tiles(self, ray_session):
        # two long intervals sharing MANY tiles must pair exactly once
        from documentai_ray.stages.joins import overlap_join
        lrows = [{"lid": 0, "ls": 0, "le": 100}]
        rrows = [{"rid": 0, "rs": 5, "re": 99},
                 {"rid": 1, "rs": 95, "re": 300}]
        out = overlap_join(
            ray_session.data.from_items(lrows),
            ray_session.data.from_items(rrows),
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            tile=7, num_partitions=3,
        ).to_pandas()
        pairs = list(zip(out["lid"], out["rid"]))
        assert sorted(pairs) == [(0, 0), (0, 1)]

    def test_validation(self, ray_session):
        import pytest
        from documentai_ray.stages.joins import overlap_join
        ds = ray_session.data.from_items([{"s": 5, "e": 1}])
        ds2 = ray_session.data.from_items([{"s2": 0, "e2": 1}])
        with pytest.raises(ValueError):
            overlap_join(ds, ds2, left_start="s", left_end="e",
                         right_start="s2", right_end="e2", tile=0)
        with pytest.raises(Exception):  # end < start raises in the task
            overlap_join(ds, ds2, left_start="s", left_end="e",
                         right_start="s2", right_end="e2",
                         tile=4).materialize()


class TestBandJoinBy:
    def test_equi_key_restricts_pairs(self, ray_session):
        from documentai_ray.stages.joins import band_join
        lrows = [{"lid": 0, "lu": "a", "lv": 10},
                 {"lid": 1, "lu": "b", "lv": 10},
                 {"lid": 2, "lu": "a", "lv": 100}]
        rrows = [{"rid": 0, "ru": "a", "rv": 12},
                 {"rid": 1, "ru": "b", "rv": 13},
                 {"rid": 2, "ru": "c", "rv": 10}]
        out = band_join(
            ray_session.data.from_items(lrows),
            ray_session.data.from_items(rrows),
            left_on="lv", right_on="rv", delta=5, num_partitions=3,
            left_by="lu", right_by="ru").to_pandas()
        got = set(zip(out["lid"], out["rid"]))
        # same value-band but different key never pairs
        assert got == {(0, 0), (1, 1)}

    def test_by_args_must_come_together(self, ray_session):
        import pytest
        from documentai_ray.stages.joins import band_join
        ds = ray_session.data.from_items([{"v": 1, "u": "x"}])
        ds2 = ray_session.data.from_items([{"w": 1, "t": "x"}])
        with pytest.raises(ValueError):
            band_join(ds, ds2, left_on="v", right_on="w", delta=5,
                      left_by="u")


class TestIntervalCoverage:
    def test_overlap_touch_disjoint_duplicate(self, ray_session):
        from documentai_ray.stages.windows import interval_coverage
        rows = [
            # user 1: [0,10) + [5,20) overlap -> 20; [20,25) touches ->
            # merges (half-open) -> 25; [40,45) disjoint -> +5 = 30
            {"u": 1, "s": 0, "e": 10}, {"u": 1, "s": 5, "e": 20},
            {"u": 1, "s": 20, "e": 25}, {"u": 1, "s": 40, "e": 45},
            # user 2: duplicate intervals count once
            {"u": 2, "s": 100, "e": 200}, {"u": 2, "s": 100, "e": 200},
            # user 3: contained interval adds nothing
            {"u": 3, "s": 0, "e": 100}, {"u": 3, "s": 10, "e": 20},
        ]
        ds = ray_session.data.from_items(rows).repartition(4)
        out = interval_coverage(ds, key_col="u", start_col="s",
                                end_col="e", num_partitions=3).to_pandas()
        got = dict(zip(out["u"], out["covered"]))
        assert got == {1: 30, 2: 100, 3: 100}


class TestSlidingDistinctCount:
    def test_matches_bruteforce_with_gap(self, ray_session):
        from documentai_ray.stages.windows import sliding_distinct_count
        # user 1 at buckets 0, 2 (merging windows); user 2 at 1;
        # user 3 far later at 20 -> a genuine zero gap in between
        rows = [{"u": 1, "b": 0}, {"u": 1, "b": 2}, {"u": 2, "b": 1},
                {"u": 3, "b": 20}, {"u": 1, "b": 0}]   # dup observation
        ds = ray_session.data.from_items(rows).repartition(3)
        out = sliding_distinct_count(ds, key_col="u", bucket_col="b",
                                     width=3, num_partitions=2)
        got = dict(zip(out["b"], out["n_distinct"]))
        brute = {}
        obs = {(1, 0), (1, 2), (2, 1), (3, 20)}
        for g in range(0, 21):
            brute[g] = len({u for (u, b) in obs if g - 2 <= b <= g})
        assert got == brute
        assert got[10] == 0           # the gap really is zero
        assert got[2] == 2 and got[4] == 1


class TestScd2Build:
    def test_collapse_changes_ties_and_open_range(self, ray_session):
        from documentai_ray.stages.windows import scd2_build
        rows = [
            # user 1: a,a,b,b,a -> ranges a[0,5) b[5,20) a[20,END)
            {"u": 1, "t": 0, "v": "a"}, {"u": 1, "t": 3, "v": "a"},
            {"u": 1, "t": 5, "v": "b"}, {"u": 1, "t": 9, "v": "b"},
            {"u": 1, "t": 20, "v": "a"},
            # user 2: equal-ts tie -> smallest value wins ('x')
            {"u": 2, "t": 7, "v": "y"}, {"u": 2, "t": 7, "v": "x"},
        ]
        ds = ray_session.data.from_items(rows).repartition(4)
        out = scd2_build(ds, key_col="u", val_col="v", ts_col="t",
                         open_end=999, num_partitions=3).to_pandas()
        got = {(r.u, r.v, r.valid_from, r.valid_to)
               for r in out.itertuples()}
        assert got == {(1, "a", 0, 5), (1, "b", 5, 20), (1, "a", 20, 999),
                       (2, "x", 7, 999)}


class TestSubsequenceCounts:
    def test_hand_computed_dp(self, ray_session):
        """Stream A A B A B C for one user, pattern A,B,C:
        ways = pairs (A..B) before each C: AB pairs = A1B1, A1B2,
        A2B1, A2B2, A3B2 = 5 -> n_seq = 5."""
        from documentai_ray.stages.windows import subsequence_counts
        types = ["A", "A", "B", "A", "B", "C"]
        rows = [{"u": 1, "ts": i, "id": i, "t": t}
                for i, t in enumerate(types)]
        out = subsequence_counts(
            ray_session.data.from_items(rows).repartition(2),
            key_col="u", ts_col="ts", tie_col="id", type_col="t",
            pattern=["A", "B", "C"]).to_pandas()
        assert list(out["n_seq"]) == [5]

    def test_strictly_increasing_positions_and_zeros(self, ray_session):
        from documentai_ray.stages.windows import subsequence_counts
        # C before any A/B never counts; user 2 has no match at all
        rows = ([{"u": 1, "ts": 0, "id": 0, "t": "C"},
                 {"u": 1, "ts": 1, "id": 1, "t": "A"},
                 {"u": 1, "ts": 2, "id": 2, "t": "B"},
                 {"u": 1, "ts": 3, "id": 3, "t": "C"}]
                + [{"u": 2, "ts": 0, "id": 4, "t": "B"}])
        out = (subsequence_counts(
            ray_session.data.from_items(rows),
            key_col="u", ts_col="ts", tie_col="id", type_col="t",
            pattern=["A", "B", "C"]).to_pandas().sort_values("u"))
        assert list(out["n_seq"]) == [1, 0]

    def test_single_step_pattern_is_count(self, ray_session):
        from documentai_ray.stages.windows import subsequence_counts
        rows = [{"u": 1, "ts": i, "id": i, "t": "X"} for i in range(4)]
        out = subsequence_counts(
            ray_session.data.from_items(rows),
            key_col="u", ts_col="ts", tie_col="id", type_col="t",
            pattern=["X"]).to_pandas()
        assert list(out["n_seq"]) == [4]

    def test_rejects_empty_pattern(self, ray_session):
        import pytest
        from documentai_ray.stages.windows import subsequence_counts
        with pytest.raises(ValueError):
            subsequence_counts(
                ray_session.data.from_items([{"u": 1, "ts": 0,
                                              "id": 0, "t": "A"}]),
                key_col="u", ts_col="ts", tie_col="id", type_col="t",
                pattern=[])


class TestLongestStreak:
    def test_runs_split_on_change_points(self, ray_session):
        from documentai_ray.stages.windows import longest_streak
        types = ["A", "A", "B", "A", "A", "A", "B", "B"]
        rows = [{"u": 1, "ts": i, "id": i, "t": t}
                for i, t in enumerate(types)]
        rows += [{"u": 2, "ts": 0, "id": 100, "t": "Z"}]
        out = (longest_streak(
            ray_session.data.from_items(rows).repartition(3),
            key_col="u", ts_col="ts", tie_col="id", type_col="t")
            .to_pandas().sort_values("u"))
        assert list(out["longest"]) == [3, 1]

    def test_streak_never_crosses_keys(self, ray_session):
        """Same type back-to-back across two users is two runs of 1."""
        from documentai_ray.stages.windows import longest_streak
        rows = [{"u": 1, "ts": 0, "id": 0, "t": "X"},
                {"u": 2, "ts": 1, "id": 1, "t": "X"}]
        out = longest_streak(ray_session.data.from_items(rows),
                             key_col="u", ts_col="ts", tie_col="id",
                             type_col="t").to_pandas()
        assert list(out["longest"]) == [1, 1]


class TestSeasonalNaiveMae:
    def test_hand_computed_and_missing_hours(self, ray_session):
        """Counts: h0=3, h24=5, h48=5; pairs (h24,h0)->|5-3|=2 and
        (h48,h24)->0 => sum 2, mae 1. An isolated hour with no
        counterpart 24h earlier forms no pair."""
        import pandas as pd
        from documentai_ray.stages.windows import seasonal_naive_mae
        base = pd.Timestamp("2024-03-01")
        rows = []
        for h, n in ((0, 3), (24, 5), (48, 5), (7, 2)):  # h=7 isolated
            for i in range(n):
                rows.append({"ts": base + pd.Timedelta(hours=h,
                                                       seconds=i),
                             "k": "t"})
        out = seasonal_naive_mae(
            ray_session.data.from_items(rows).repartition(3),
            ts_col="ts", key_col="k").to_pandas()
        assert out.iloc[0].to_dict() == {
            "k": "t", "n_pairs": 2, "sum_abs_err": 2, "mae": 1}


class TestTrendFlips:
    def test_plateaus_skipped_and_flips_counted(self, ray_session):
        """Hourly counts 1,3,3,2,4: diffs +2,0,-1,+2 -> nonzero signs
        +,-,+ -> 2 flips; plateau ignored."""
        import pandas as pd
        from documentai_ray.stages.windows import trend_flips
        base = pd.Timestamp("2024-05-01")
        rows = []
        for h, n in enumerate([1, 3, 3, 2, 4]):
            for i in range(n):
                rows.append({"ts": base + pd.Timedelta(hours=h,
                                                       seconds=i),
                             "k": "t"})
        out = trend_flips(ray_session.data.from_items(rows)
                          .repartition(3),
                          ts_col="ts", key_col="k").to_pandas()
        assert out.iloc[0].to_dict() == {"k": "t", "n_obs": 5,
                                         "n_flips": 2}

    def test_monotone_series_has_zero_flips(self, ray_session):
        import pandas as pd
        from documentai_ray.stages.windows import trend_flips
        base = pd.Timestamp("2024-05-01")
        rows = []
        for h, n in enumerate([1, 2, 4, 8]):
            for i in range(n):
                rows.append({"ts": base + pd.Timedelta(hours=h,
                                                       seconds=i),
                             "k": "m"})
        out = trend_flips(ray_session.data.from_items(rows),
                          ts_col="ts", key_col="k").to_pandas()
        assert int(out["n_flips"][0]) == 0


class TestUserFeatureMatrix:
    def test_fused_features_exact(self, ray_session):
        import pandas as pd
        from documentai_ray.stages.windows import user_feature_matrix
        base = pd.Timestamp("2024-06-01")
        rows = [
            {"user_id": 1, "ts": base, "event_type": "view",
             "value": 1.50},
            {"user_id": 1, "ts": base + pd.Timedelta(seconds=90),
             "event_type": "click", "value": 0.25},
            {"user_id": 1, "ts": base + pd.Timedelta(seconds=30),
             "event_type": "view", "value": 2.00},
            {"user_id": 2, "ts": base, "event_type": "weird",
             "value": 9.99},
        ]
        out = (user_feature_matrix(
            ray_session.data.from_items(rows).repartition(3))
            .to_pandas().sort_values("user_id"))
        u1 = out.iloc[0]
        assert (u1["n_events"], u1["n_view"], u1["n_click"],
                u1["span_s"], u1["value_c"]) == (3, 2, 1, 90, 375)
        u2 = out.iloc[1]
        # unknown type counts toward n_events, no per-type column
        assert (u2["n_events"], u2["n_view"], u2["n_click"],
                u2["value_c"]) == (1, 0, 0, 999)


class TestWindowedPathCounts:
    def _rows(self, spec):
        import pandas as pd
        base = pd.Timestamp("2024-07-01")
        return [{"u": u, "ts": base + pd.Timedelta(seconds=s), "t": t}
                for u, s, t in spec]

    def test_window_expires_old_context(self, ray_session):
        """A at t=0 expires for the B at t=700 (window 600); the A at
        t=200 still reaches it. Exactly one full path."""
        from documentai_ray.stages.windows import windowed_path_counts
        rows = self._rows([(1, 0, "A"), (1, 200, "A"),
                           (1, 700, "B"), (1, 900, "C")])
        out = windowed_path_counts(
            ray_session.data.from_items(rows).repartition(2),
            key_col="u", ts_col="ts", type_col="t",
            pattern=["A", "B", "C"], window_s=600).to_pandas()
        assert list(out["n_paths"]) == [1]

    def test_same_second_does_not_chain(self, ray_session):
        """Strictly-later-second rule: A and B in the same second do
        not pair."""
        from documentai_ray.stages.windows import windowed_path_counts
        rows = self._rows([(1, 5, "A"), (1, 5, "B"), (1, 6, "C")])
        out = windowed_path_counts(
            ray_session.data.from_items(rows),
            key_col="u", ts_col="ts", type_col="t",
            pattern=["A", "B", "C"], window_s=600).to_pandas()
        assert list(out["n_paths"]) == [0]

    def test_matches_unbounded_when_window_huge(self, ray_session):
        """With a huge window (and distinct seconds) the count equals
        subsequence_counts' unbounded DP."""
        from documentai_ray.stages.windows import (subsequence_counts,
                                                   windowed_path_counts)
        spec = [(1, i * 10, t) for i, t in
                enumerate(["A", "A", "B", "A", "B", "C"])]
        rows = self._rows(spec)
        win = windowed_path_counts(
            ray_session.data.from_items(rows),
            key_col="u", ts_col="ts", type_col="t",
            pattern=["A", "B", "C"], window_s=10**6).to_pandas()
        rows2 = [{"u": u, "ts": s, "id": i, "t": t}
                 for i, (u, s, t) in enumerate(spec)]
        unb = subsequence_counts(
            ray_session.data.from_items(rows2),
            key_col="u", ts_col="ts", tie_col="id", type_col="t",
            pattern=["A", "B", "C"]).to_pandas()
        assert list(win["n_paths"]) == list(unb["n_seq"]) == [5]

    def test_rejects_bad_params(self, ray_session):
        import pytest
        from documentai_ray.stages.windows import windowed_path_counts
        ds = ray_session.data.from_items(
            self._rows([(1, 0, "A")]))
        with pytest.raises(ValueError):
            windowed_path_counts(ds, key_col="u", ts_col="ts",
                                 type_col="t", pattern=[], window_s=10)
        with pytest.raises(ValueError):
            windowed_path_counts(ds, key_col="u", ts_col="ts",
                                 type_col="t", pattern=["A"],
                                 window_s=0)


class TestClampedLedger:
    def _rows(self, spec):
        import pandas as pd
        base = pd.Timestamp("2024-07-01")
        return [{"user_id": u, "ts": base + pd.Timedelta(seconds=s),
                 "event_id": i, "event_type": t, "value": v}
                for i, (u, s, t, v) in enumerate(spec)]

    def test_hand_computed_clamp(self, ray_session):
        """credit 1.00 -> 100c; purchase 2.50 overdraws -> floor 0
        (150c forgiven forever); credit 0.50 -> 50; error 0.30 -> 20.
        Plain sum would say -130; the ledger says 20."""
        from documentai_ray.stages.windows import clamped_ledger_int
        rows = self._rows([(1, 0, "view", 1.00),
                           (1, 10, "purchase", 2.50),
                           (1, 20, "signup", 0.50),
                           (1, 30, "error", 0.30)])
        out = clamped_ledger_int(
            ray_session.data.from_items(rows).repartition(2),
            num_partitions=4).to_pandas()
        r = out.iloc[0]
        assert (r["n_events"], r["final_c"], r["peak_c"],
                r["n_clamps"]) == (4, 20, 100, 1)

    def test_exact_zero_is_not_a_clamp(self, ray_session):
        """A debit landing exactly on 0 forgives nothing."""
        from documentai_ray.stages.windows import clamped_ledger_int
        rows = self._rows([(1, 0, "view", 1.00),
                           (1, 10, "purchase", 1.00)])
        out = clamped_ledger_int(
            ray_session.data.from_items(rows)).to_pandas()
        assert (out.iloc[0]["final_c"], out.iloc[0]["n_clamps"]) == (0, 0)

    def test_tie_broken_by_event_id(self, ray_session):
        """Same-ts rows order by event_id: debit(id=0) before
        credit(id=1) clamps; the reverse order would not."""
        from documentai_ray.stages.windows import clamped_ledger_int
        rows = self._rows([(1, 5, "purchase", 1.00),
                           (1, 5, "view", 1.00)])
        out = clamped_ledger_int(
            ray_session.data.from_items(rows)).to_pandas()
        assert (out.iloc[0]["final_c"], out.iloc[0]["n_clamps"]) == (100, 1)

    def test_matches_sequential_reference(self, ray_session):
        """Vectorized reflection == the per-row sequential recurrence
        on a multi-user shuffled corpus."""
        import numpy as np
        from documentai_ray.stages.windows import clamped_ledger_int
        rng = np.random.default_rng(7)
        spec = [(int(rng.integers(0, 5)), int(rng.integers(0, 1000)),
                 ["view", "purchase", "error", "signup"][
                     int(rng.integers(0, 4))],
                 float(rng.integers(1, 500)) / 100)
                for _ in range(200)]
        rows = self._rows(spec)
        out = (clamped_ledger_int(
            ray_session.data.from_items(rows).repartition(5),
            num_partitions=3)
            .to_pandas().set_index("user_id").sort_index())
        byu = {}
        for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
            d = round(r["value"] * 100)
            if r["event_type"] in ("purchase", "error"):
                d = -d
            b, peak, cl, n = byu.get(r["user_id"], (0, 0, 0, 0))
            nb = b + d
            if nb < 0:
                nb, cl = 0, cl + 1
            byu[r["user_id"]] = (nb, max(peak, nb), cl, n + 1)
        for u, (b, peak, cl, n) in byu.items():
            r = out.loc[u]
            assert (r["n_events"], r["final_c"], r["peak_c"],
                    r["n_clamps"]) == (n, b, peak, cl)


class TestCusumAlarms:
    def _events(self, counts, typ="click", base_h=0):
        """One synthetic event stream whose hourly volumes are
        ``counts`` starting at hour ``base_h``."""
        import pandas as pd
        base = pd.Timestamp("2024-07-01")
        rows = []
        for h, n in enumerate(counts):
            for j in range(n):
                rows.append({"ts": base + pd.Timedelta(
                    hours=base_h + h, seconds=j),
                    "event_type": typ})
        return rows

    def test_sustained_shift_alarms_spike_does_not(self, ray_session):
        """20 quiet hours (2/h) then 10 shifted hours (12/h): mean 5.33
        -> k=6, h=18; S ramps 6,12,18 and first alarms on the THIRD
        shifted hour, then stays over the line (8 alarm hours, peak
        S=60). A lone spike with the same instantaneous excess (below
        h) would decay instead -- see test_single_spike_decays."""
        import pandas as pd
        from documentai_ray.stages.windows import cusum_alarms_int
        rows = self._events([2] * 20 + [12] * 10)
        out = cusum_alarms_int(
            ray_session.data.from_items(rows).repartition(4)).to_pandas()
        r = out.iloc[0]
        base = pd.Timestamp("2024-07-01")
        want_first = int((base + pd.Timedelta(hours=22)).timestamp())
        assert (r["n_obs"], r["k"], r["h"], r["n_alarms"], r["max_s"],
                r["first_alarm_s"]) == (30, 6, 18, 8, 60, want_first)

    def test_single_spike_decays(self, ray_session):
        """Nine hours of 2 plus one spike of 8: k=3, h=9; the spike
        contributes S=5 < h and decays -- no alarm, first_alarm_s=-1."""
        from documentai_ray.stages.windows import cusum_alarms_int
        rows = self._events([2, 2, 2, 2, 8, 2, 2, 2, 2, 2])
        out = cusum_alarms_int(
            ray_session.data.from_items(rows)).to_pandas()
        r = out.iloc[0]
        assert (r["k"], r["h"], r["n_alarms"], r["max_s"],
                r["first_alarm_s"]) == (3, 9, 0, 5, -1)

    def test_per_key_independent_calibration(self, ray_session):
        """Two keys with different baselines get different (k, h)."""
        from documentai_ray.stages.windows import cusum_alarms_int
        rows = (self._events([2] * 6, "a")
                + self._events([10] * 6, "b"))
        out = (cusum_alarms_int(ray_session.data.from_items(rows))
               .to_pandas().set_index("event_type"))
        assert out.loc["a", "k"] == 3 and out.loc["b", "k"] == 11
        assert int(out.loc["a", "n_alarms"]) == 0
        assert int(out.loc["b", "n_alarms"]) == 0

    def test_rejects_bad_params(self, ray_session):
        import pytest
        from documentai_ray.stages.windows import cusum_alarms_int
        ds = ray_session.data.from_items(self._events([1]))
        with pytest.raises(ValueError):
            cusum_alarms_int(ds, k_extra=-1)
        with pytest.raises(ValueError):
            cusum_alarms_int(ds, h_mult=0)


class TestMannKendall:
    def _events(self, counts, typ="click"):
        import pandas as pd
        base = pd.Timestamp("2024-07-01")
        return [{"ts": base + pd.Timedelta(hours=h, seconds=j),
                 "event_type": typ}
                for h, n in enumerate(counts) for j in range(n)]

    def test_monotone_and_tied_series(self, ray_session):
        """[1,2,3] -> all 3 pairs concordant, S=3; [2,2] -> all tied,
        S=0, trend 0."""
        from documentai_ray.stages.windows import mann_kendall_int
        rows = (self._events([1, 2, 3], "up")
                + self._events([2, 2], "flat"))
        out = (mann_kendall_int(
            ray_session.data.from_items(rows).repartition(3))
            .to_pandas().set_index("event_type"))
        up = out.loc["up"]
        assert (up["n_obs"], up["n_conc"], up["n_disc"], up["s_stat"],
                up["trend"]) == (3, 3, 0, 3, 1)
        fl = out.loc["flat"]
        assert (fl["s_stat"], fl["trend"], fl["n_conc"]) == (0, 0, 0)

    def test_outlier_magnitude_irrelevant(self, ray_session):
        """S of [1,2,1000,3] equals S of [1,2,4,3] -- sign-only."""
        from documentai_ray.stages.windows import mann_kendall_int
        rows = (self._events([1, 2, 1000, 3], "spiky")
                + self._events([1, 2, 4, 3], "mild"))
        out = (mann_kendall_int(ray_session.data.from_items(rows))
               .to_pandas().set_index("event_type"))
        assert out.loc["spiky", "s_stat"] == out.loc["mild", "s_stat"] == 4

    def test_series_bound_enforced(self, ray_session):
        import pytest
        from documentai_ray.stages.windows import mann_kendall_int
        rows = self._events([1, 1, 1])
        with pytest.raises(ValueError):
            mann_kendall_int(ray_session.data.from_items(rows),
                             max_obs=2)


class TestLagCoactivity:
    def _events(self, spec):
        import pandas as pd
        base = pd.Timestamp("2024-07-01")
        return [{"ts": base + pd.Timedelta(hours=h, seconds=j),
                 "event_type": typ}
                for typ, counts in spec
                for h, n in enumerate(counts) for j in range(n)]

    def test_lead_lag_peak(self, ray_session):
        """a fires at t0, b at t1: (a,b) peaks at lag 1 with dot 25;
        (b,a) never co-occurs at any non-negative lag -> 0 at lag 0."""
        from documentai_ray.stages.windows import lag_coactivity_int
        rows = self._events([("a", [5, 0, 0]), ("b", [0, 5, 0])])
        out = (lag_coactivity_int(
            ray_session.data.from_items(rows).repartition(2),
            max_lag_h=2)
            .to_pandas().set_index(["key_a", "key_b"]))
        ab = out.loc[("a", "b")]
        assert (ab["best_lag"], ab["best_dot"], ab["lag0_dot"]) == (1, 25, 0)
        ba = out.loc[("b", "a")]
        assert (ba["best_lag"], ba["best_dot"]) == (0, 0)

    def test_tie_prefers_smallest_lag(self, ray_session):
        """Constant co-activity: lag 0 dot 2 beats lag 1 dot 1; equal
        dots would also keep the smaller lag (strict > update)."""
        from documentai_ray.stages.windows import lag_coactivity_int
        rows = self._events([("a", [1, 1]), ("b", [1, 1])])
        out = (lag_coactivity_int(ray_session.data.from_items(rows),
                                  max_lag_h=5)
               .to_pandas().set_index(["key_a", "key_b"]))
        assert (out.loc[("a", "b"), "best_lag"],
                out.loc[("a", "b"), "best_dot"]) == (0, 2)

    def test_rejects_negative_lag(self, ray_session):
        import pytest
        from documentai_ray.stages.windows import lag_coactivity_int
        rows = self._events([("a", [1])])
        with pytest.raises(ValueError):
            lag_coactivity_int(ray_session.data.from_items(rows),
                               max_lag_h=-1)
