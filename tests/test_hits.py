"""HITS hubs/authorities + reciprocal-link stats (operators/graph.py).

Cross-checks the exact-integer Spark implementations against pure-Python
integer replicas of the same recurrences (the same role the DuckDB
oracles play for the entry queries), pins partitioning invariance, and
pins the JVM-only plan shape.
"""

import pandas as pd
import pytest


def _hits_py(edges, iterations=2, scale=10**6):
    # pure-Python replica of hits_integer's integer recurrence
    nodes = sorted({x for e in edges for x in e})
    hub = {n: scale for n in nodes}
    auth = None
    for _ in range(iterations):
        raw_a = {}
        for s, t in edges:
            raw_a[t] = raw_a.get(t, 0) + hub[s]
        mx = max(raw_a.values())
        auth = {n: (raw_a.get(n, 0) * scale) // mx for n in nodes}
        raw_h = {}
        for s, t in edges:
            raw_h[s] = raw_h.get(s, 0) + auth[t]
        mx = max(raw_h.values())
        hub = {n: (raw_h.get(n, 0) * scale) // mx for n in nodes}
    return hub, auth


class TestHitsInteger:
    def test_vs_python_replica(self, spark):
        from logparse_rs_spark.operators.graph import hits_integer
        # bipartite-ish: two hubs fanning into shared authorities + a tail
        edges = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 12),
                 (10, 20), (11, 20)]
        df = spark.createDataFrame(
            pd.DataFrame(edges, columns=["src", "dst"]))
        got = {r["node"]: (r["hub"], r["auth"])
               for r in hits_integer(df, iterations=2).collect()}
        hub, auth = _hits_py(edges)
        assert got == {n: (hub[n], auth[n]) for n in hub}

    def test_star_graph_extremes(self, spark):
        from logparse_rs_spark.operators.graph import hits_integer
        # every spoke points at the hub: the hub is the max authority
        # (auth = scale exactly) and has hub score 0 (no out-edges);
        # spokes are identical max hubs with auth 0
        edges = [(i, 99) for i in range(1, 6)]
        df = spark.createDataFrame(
            pd.DataFrame(edges, columns=["src", "dst"]))
        got = {r["node"]: (r["hub"], r["auth"])
               for r in hits_integer(df, iterations=2).collect()}
        assert got[99] == (0, 10**6)
        for spoke in range(1, 6):
            assert got[spoke] == (10**6, 0)

    def test_partitioning_invariant(self, spark):
        import numpy as np
        from logparse_rs_spark.operators.graph import hits_integer
        rng = np.random.RandomState(7)
        e = pd.DataFrame({"src": rng.randint(0, 40, 150),
                          "dst": rng.randint(0, 40, 150)})
        e = e[e.src != e.dst].drop_duplicates()
        df = spark.createDataFrame(e)
        a = sorted(map(tuple, hits_integer(df).collect()))
        b = sorted(map(tuple, hits_integer(df.repartition(13)).collect()))
        assert a == b
        hub, auth = _hits_py(list(map(tuple, e.itertuples(index=False))))
        assert a == sorted((n, hub[n], auth[n]) for n in hub)

    def test_rejects_zero_iterations(self, spark):
        from logparse_rs_spark.operators.graph import hits_integer
        df = spark.createDataFrame(
            pd.DataFrame([(1, 2)], columns=["src", "dst"]))
        with pytest.raises(ValueError):
            hits_integer(df, iterations=0)


class TestReciprocalLinkStats:
    def test_hand_case(self, spark):
        from logparse_rs_spark.operators.graph import reciprocal_link_stats
        # a<->b reciprocated, a->c not; c has no out-edges (absent);
        # duplicate a->b rows and the a->a self-loop must not count
        edges = [("a", "b"), ("b", "a"), ("a", "c"), ("a", "b"),
                 ("a", "a")]
        df = spark.createDataFrame(
            pd.DataFrame(edges, columns=["src_host", "dst_host"]))
        got = {r["node"]: (r["n_out"], r["n_recip"], r["recip_ppm"])
               for r in reciprocal_link_stats(df).collect()}
        assert got == {"a": (2, 1, 500000), "b": (1, 1, 1000000)}

    def test_jvm_only_plan(self, spark):
        from logparse_rs_spark.operators.graph import reciprocal_link_stats
        df = spark.createDataFrame(
            pd.DataFrame([("a", "b"), ("b", "a")],
                         columns=["src_host", "dst_host"]))
        plan = (reciprocal_link_stats(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
