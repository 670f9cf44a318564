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
