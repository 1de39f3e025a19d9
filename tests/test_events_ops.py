"""Event-stream analytics operators: spike detection (aggregates.py),
driven on synthetic streams with hand-computed answers."""

import datetime as dt


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
         for i, (k, s) in enumerate(rows)],
        "event_id long, event_type string, ts timestamp")


class TestSpikeWindows:
    def test_only_spike_window_flagged(self, spark):
        from logparse_rs_spark.operators.aggregates import spike_windows
        # key 'a': 10 windows of 1 event + 1 window of 30 -> only that
        # window beats 2x the active-window mean (40/11)
        rows = [("a", h * 3600) for h in range(10)]
        rows += [("a", 10 * 3600 + i) for i in range(30)]
        got = spike_windows(_ev(spark, rows), window_s=3600).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.event_type, r.n, r.n_windows, r.total_n) == ("a", 30, 11, 40)
        base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        want_us = int((base + dt.timedelta(hours=10)).timestamp() * 1_000_000)
        assert r.window_start_us == want_us

    def test_threshold_is_strict(self, spark):
        from logparse_rs_spark.operators.aggregates import spike_windows
        # three windows, counts (4,1,1): 4 * 3 windows == 2 * 6 total ->
        # exact equality, NOT flagged (strict >); a fifth event flips it
        rows = [("a", 0), ("a", 3600)]
        rows += [("a", 7200 + i) for i in range(4)]
        assert spike_windows(_ev(spark, rows), window_s=3600).count() == 0
        rows.append(("a", 7200 + 99))
        got = spike_windows(_ev(spark, rows), window_s=3600).collect()
        assert [(r.n, r.total_n) for r in got] == [(5, 7)]

    def test_keys_independent(self, spark):
        from logparse_rs_spark.operators.aggregates import spike_windows
        # b's uniform traffic must not dilute or amplify a's baseline
        rows = [("a", h * 3600) for h in range(5)]
        rows += [("a", 5 * 3600 + i) for i in range(20)]
        rows += [("b", h * 3600) for h in range(24)]
        got = spike_windows(_ev(spark, rows), window_s=3600).collect()
        assert {r.event_type for r in got} == {"a"}


class TestMergeAggregates:
    def test_merge_equals_full_recompute(self, spark):
        import pandas as pd
        from logparse_rs_spark.operators.aggregates import merge_aggregates
        old = spark.createDataFrame(pd.DataFrame(
            {"k": ["a", "b"], "n": [3, 5], "s": [30, 50]}))
        delta = spark.createDataFrame(pd.DataFrame(
            {"k": ["b", "c"], "n": [2, 7], "s": [20, 70]}))
        got = {r["k"]: (r["n"], r["s"])
               for r in merge_aggregates(old, delta, ["k"],
                                         ["n", "s"]).collect()}
        # keys only-old, both, only-delta all survive with exact adds
        assert got == {"a": (3, 30), "b": (7, 70), "c": (7, 70)}

    def test_jvm_only_single_join(self, spark):
        import pandas as pd
        from logparse_rs_spark.operators.aggregates import merge_aggregates
        old = spark.createDataFrame(pd.DataFrame({"k": ["a"], "n": [1]}))
        delta = spark.createDataFrame(pd.DataFrame({"k": ["a"], "n": [1]}))
        plan = (merge_aggregates(old, delta, ["k"], ["n"])
                ._jdf.queryExecution().executedPlan().toString())
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
