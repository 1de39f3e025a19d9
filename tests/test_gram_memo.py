"""Parity of the worker-global gram memo / bitmask intersection kernel
(_gram_entry/_pair_common) against brute-force string n-gram set math,
including the past-cap array fallback path."""

import numpy as np
import pytest

from logparse_rs_spark.operators import dedup as D


def _brute_common(a: str, b: str, n: int) -> tuple:
    ga = {a[i:i + n] for i in range(len(a) - n + 1)} if len(a) >= n else set()
    gb = {b[i:i + n] for i in range(len(b) - n + 1)} if len(b) >= n else set()
    return len(ga & gb), len(ga), len(gb)


@pytest.fixture(autouse=True)
def _fresh_memo():
    D._GRAM_MEMO.clear()
    D._GRAM_BITS.clear()
    yield
    D._GRAM_MEMO.clear()
    D._GRAM_BITS.clear()


TEXTS = ["spark fast row", "spark slow row", "", "ab", "abc",
         "the same the same the same", "xyzzy plugh", "spark fast row"]


@pytest.mark.parametrize("n", [2, 3, 5])
def test_mask_path_matches_brute(n):
    for a in TEXTS:
        for b in TEXTS:
            ea, eb = D._gram_entry(a, n), D._gram_entry(b, n)
            assert ea[2] is not None and eb[2] is not None  # small universe
            common = D._pair_common(ea, eb)
            bc, bn_a, bn_b = _brute_common(a, b, n)
            assert (common, ea[1], eb[1]) == (bc, bn_a, bn_b)


def test_cap_fallback_matches(monkeypatch):
    monkeypatch.setattr(D, "_GRAM_BITS_CAP", 8)
    rng = np.random.default_rng(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    texts = ["".join(rng.choice(list(alphabet), 40)) for _ in range(20)]
    masked = sum(1 for t in texts if D._gram_entry(t, 3)[2] is not None)
    assert masked < len(texts)  # the cap actually forced fallbacks
    for a in texts:
        for b in texts:
            ea, eb = D._gram_entry(a, 3), D._gram_entry(b, 3)
            assert D._pair_common(ea, eb) == _brute_common(a, b, 3)[0]


def test_mixed_mask_and_array_pairs(monkeypatch):
    monkeypatch.setattr(D, "_GRAM_BITS_CAP", 6)
    a = "abcabcabc"        # few distinct grams -> gets a mask
    b = "qrstuvwxyz"       # pushes past the cap -> no mask
    ea, eb = D._gram_entry(a, 3), D._gram_entry(b, 3)
    assert ea[2] is not None and eb[2] is None
    assert D._pair_common(ea, eb) == _brute_common(a, b, 3)[0]
    assert D._pair_common(ea, ea) == ea[1]


def test_memo_clear_keeps_masks_valid():
    e1 = D._gram_entry("spark fast", 3)
    D._GRAM_MEMO.clear()  # simulate the size-cap purge; bit index stays
    e2 = D._gram_entry("spark fast", 3)
    assert e1[2] == e2[2]
    assert D._pair_common(e1, e2) == e1[1]
