"""Gini-Simpson diversity (aggregates.grouped_diversity)."""

class TestGroupedDiversity:
    def test_exact_values(self, ray_session):
        from documentai_ray.stages.aggregates import grouped_diversity
        # key A: 2+2 even split -> 1 - (4+4)/16 = 0.5 -> 500000 ppm
        # key B: 3+1 -> 1 - (9+1)/16 = 6/16 = 375000 ppm
        # key C: 4 of one -> 0 ppm
        rows = ([{"k": "A", "c": "x"}] * 2 + [{"k": "A", "c": "y"}] * 2
                + [{"k": "B", "c": "x"}] * 3 + [{"k": "B", "c": "y"}]
                + [{"k": "C", "c": "x"}] * 4)
        ds = ray_session.data.from_items(rows).repartition(3)
        out = grouped_diversity(ds, key_col="k", cat_col="c").to_pandas()
        got = {r["k"]: (r["n_rows"], r["n_cats"], r["diversity_ppm"])
               for _, r in out.iterrows()}
        assert got == {"A": (4, 2, 500000), "B": (4, 2, 375000),
                       "C": (4, 1, 0)}

    def test_floor_division_matches_sql(self, ray_session):
        from documentai_ray.stages.aggregates import grouped_diversity
        # 1+2 split: 1 - (1+4)/9 -> 1000000 - floor(5000000/9)
        #          = 1000000 - 555555 = 444445 (floor, not round)
        rows = [{"k": "A", "c": "x"}, {"k": "A", "c": "y"},
                {"k": "A", "c": "y"}]
        ds = ray_session.data.from_items(rows)
        out = grouped_diversity(ds, key_col="k", cat_col="c").to_pandas()
        assert int(out["diversity_ppm"].iloc[0]) == 444445


class TestMadOutliers:
    def test_exact_flags(self, ray_session):
        from documentai_ray.stages.aggregates import mad_outliers
        # key A: values 10,10,10,10,100 -> med=10, d=|v-10|: 0,0,0,0,90
        # MAD=0 -> mad_x4=0 -> 100 flags (2*180*1 > 3*0); the 10s don't.
        # key B: 1..7 -> med=4, deviations 0..3 -> MAD=1.5? d=3,2,1,0,1,2,3
        # sorted: 0,1,1,2,2,3,3 -> median(d)=2 -> MAD=1 (d is 2|v-med| ...
        # careful: dd = 2|v-4| = 6,4,2,0,2,4,6 -> median(dd)=4 -> mad_x4=8
        # flag: 2*dd > 3*8=24 -> dd>12 -> none flag.
        rows = ([{"k": "A", "v": 10}] * 4 + [{"k": "A", "v": 100}]
                + [{"k": "B", "v": i} for i in range(1, 8)])
        ds = ray_session.data.from_items(rows).repartition(3)
        out = mad_outliers(ds, key_col="k", val_col="v").to_pandas()
        a = out[out["k"] == "A"]
        assert set(a.loc[a["is_outlier"], "v"]) == {100}
        assert (a["med_x2"] == 20).all() and (a["mad_x4"] == 0).all()
        b = out[out["k"] == "B"]
        assert not b["is_outlier"].any()
        assert (b["med_x2"] == 8).all() and (b["mad_x4"] == 8).all()

    def test_even_count_halves_stay_exact(self, ray_session):
        from documentai_ray.stages.aggregates import mad_outliers
        # values 1,2: med=1.5 -> med_x2=3; dd=|2v-3|=1,1 -> mad_x4=2
        ds = ray_session.data.from_items(
            [{"k": "A", "v": 1}, {"k": "A", "v": 2}])
        out = mad_outliers(ds, key_col="k", val_col="v").to_pandas()
        assert (out["med_x2"] == 3).all() and (out["mad_x4"] == 2).all()
        assert not out["is_outlier"].any()


class TestGroupedWeightedMedian:
    def test_weight_pulls_median(self, ray_session):
        from documentai_ray.stages.aggregates import grouped_weighted_median_int
        # values 1,2,3 with weights 1,1,10 -> W=12, half=6 -> first v
        # with 2*cumw >= 12 is 3 (cumw: 1,2,12). Plain median would be 2.
        rows = [{"k": "A", "v": 1, "w": 1}, {"k": "A", "v": 2, "w": 1},
                {"k": "A", "v": 3, "w": 10}]
        ds = ray_session.data.from_items(rows).repartition(2)
        out = grouped_weighted_median_int(
            ds, key_col="k", val_col="v", weight_col="w").to_pandas()
        assert int(out["wmedian"].iloc[0]) == 3

    def test_equal_weights_match_lower_median(self, ray_session):
        from documentai_ray.stages.aggregates import grouped_weighted_median_int
        rows = [{"k": "A", "v": i, "w": 1} for i in (1, 2, 3, 4)]
        ds = ray_session.data.from_items(rows)
        out = grouped_weighted_median_int(
            ds, key_col="k", val_col="v", weight_col="w").to_pandas()
        # even count, lower-median rule: 2*cum(2)=4 >= 4 -> v=2
        assert int(out["wmedian"].iloc[0]) == 2

    def test_negative_weight_raises(self, ray_session):
        import pytest
        from documentai_ray.stages.aggregates import grouped_weighted_median_int
        ds = ray_session.data.from_items([{"k": "A", "v": 1, "w": -1}])
        with pytest.raises(Exception, match="negative weight"):
            grouped_weighted_median_int(
                ds, key_col="k", val_col="v", weight_col="w").to_pandas()
