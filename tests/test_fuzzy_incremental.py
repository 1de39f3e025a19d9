"""minhash_cross_dedup / minhash_cross_candidates unit tests.

The oracle-checked query (doc_fuzzy_incremental) pins the end-to-end
answer; these pin the row-level semantics: exact copies and near-variants
suppress, disjoint text survives with all its columns, the verify
threshold is honored, and the corpus-side bucket cap only ever ADDS
survivors (prune-only, like every cap in the dedup family).
"""

import pytest
from pyspark.sql import functions as F

from logparse_rs_spark.operators.dedup import (minhash_cross_candidates,
                                               minhash_cross_dedup,
                                               minhash_signatures)

BASE = ("the quick brown fox jumps over the lazy dog and then "
        "runs far away into the deep green forest tonight") * 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, tag string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(spark, [(i, f"{BASE} corpus variant {i}", "c")
                         for i in range(20)])


class TestCrossDedup:
    def test_copies_suppress_fresh_survive(self, spark, corpus):
        batch = _docs(spark, [
            (1000, f"{BASE} corpus variant 3", "copy"),       # exact copy
            (1001, f"{BASE} corpus variant 7 x", "near"),     # near-variant
            (1002, "completely different text about nothing "
                   "in particular whatsoever", "fresh"),
        ])
        out = minhash_cross_dedup(batch, corpus, threshold=0.5).collect()
        assert sorted((r.doc_id, r.tag) for r in out) == [(1002, "fresh")]

    def test_threshold_boundary(self, spark, corpus):
        # a mild variant: suppressed at a loose threshold, kept at a
        # near-exact one
        batch = _docs(spark, [(1000, f"{BASE} corpus variant 3 with a "
                                     f"couple of extra words", "near")])
        loose = minhash_cross_dedup(batch, corpus, threshold=0.5).count()
        strict = minhash_cross_dedup(batch, corpus, threshold=0.999).count()
        assert (loose, strict) == (0, 1)

    def test_survivors_keep_all_columns(self, spark, corpus):
        batch = _docs(spark, [(1000, "unrelated fresh text entirely",
                               "keepme")])
        out = minhash_cross_dedup(batch, corpus).collect()
        assert out[0].asDict() == {"doc_id": 1000,
                                   "text": "unrelated fresh text entirely",
                                   "tag": "keepme"}

    def test_corpus_bucket_cap_is_prune_only(self, spark, corpus):
        # max_bucket=0 drops every corpus bucket -> no candidates -> even
        # the exact copy survives: the cap can only ADD survivors
        batch = _docs(spark, [(1000, f"{BASE} corpus variant 3", "copy")])
        assert minhash_cross_dedup(batch, corpus, max_bucket=0).count() == 1
        assert minhash_cross_dedup(batch, corpus, max_bucket=1000,
                                   ).count() == 0


class TestCrossCandidates:
    def test_pairs_are_cross_side_only(self, spark, corpus):
        # two identical batch docs never pair with each other, only with
        # the corpus side
        batch = _docs(spark, [(1000, f"{BASE} corpus variant 3", "a"),
                              (1001, f"{BASE} corpus variant 3", "b")])
        sig_a = minhash_signatures(batch)
        sig_b = minhash_signatures(corpus)
        pairs = minhash_cross_candidates(sig_a, sig_b).collect()
        assert all(r.id_a >= 1000 and r.id_b < 1000 for r in pairs)
        assert {r.id_a for r in pairs} == {1000, 1001}


class TestCorpusSigsInjection:
    def test_precomputed_sigs_give_identical_answer(self, spark, corpus):
        """The persisted-signature-table path (the cross-increment reuse
        contract) must answer exactly like the recompute path."""
        batch = _docs(spark, [
            (1000, f"{BASE} corpus variant 3", "copy"),
            (1001, "totally unrelated fresh content here", "fresh"),
        ])
        sigs = minhash_signatures(corpus).persist()
        try:
            a = sorted(r.doc_id for r in
                       minhash_cross_dedup(batch, corpus).collect())
            b = sorted(r.doc_id for r in
                       minhash_cross_dedup(batch, corpus,
                                           corpus_sigs=sigs).collect())
            assert a == b == [1001]
        finally:
            sigs.unpersist(blocking=False)
