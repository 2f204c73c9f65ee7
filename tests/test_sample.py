"""Deterministic stratified sampling — mixture fractions, determinism,
nested-subset property, and the modulo/SQL-parity variant."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from moonray.functions.sample import stratified_sample


def _docs(n=4000):
    rng = np.random.default_rng(7)
    langs = rng.choice(["en", "de", "fr", "zh"], size=n,
                       p=[0.5, 0.2, 0.2, 0.1])
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64) * 7919 + 13),
        "lang": pa.array(langs.tolist(), pa.string()),
    })


def test_fractions_and_determinism():
    t = _docs()
    ds = rd.from_arrow(t)
    frac = {"en": 0.3, "de": 1.0, "fr": 0.5}
    out1 = stratified_sample(ds, strata_col="lang", fractions=frac,
                             key_col="doc_id").take_all()
    out2 = stratified_sample(rd.from_arrow(t), strata_col="lang",
                             fractions=frac, key_col="doc_id").take_all()
    assert sorted(r["doc_id"] for r in out1) == \
        sorted(r["doc_id"] for r in out2)  # deterministic by key
    n_by = {}
    for r in out1:
        n_by[r["lang"]] = n_by.get(r["lang"], 0) + 1
    tot = {}
    for lg in t["lang"].to_pylist():
        tot[lg] = tot.get(lg, 0) + 1
    assert n_by["de"] == tot["de"]            # fraction 1.0 keeps all
    assert "zh" not in n_by                   # default fraction 0 drops
    for lg, f in (("en", 0.3), ("fr", 0.5)):  # hash draw ≈ fraction
        assert abs(n_by[lg] / tot[lg] - f) < 0.06


def test_nested_subset():
    """Lowering a fraction strictly shrinks the kept set — ablation
    mixtures nest."""
    t = _docs()
    big = {r["doc_id"] for r in stratified_sample(
        rd.from_arrow(t), strata_col="lang", fractions={"en": 0.6},
        key_col="doc_id").take_all()}
    small = {r["doc_id"] for r in stratified_sample(
        rd.from_arrow(t), strata_col="lang", fractions={"en": 0.2},
        key_col="doc_id").take_all()}
    assert small <= big


def test_modulo_sampler_matches_plain_arithmetic():
    t = _docs(500)
    out = stratified_sample(rd.from_arrow(t), strata_col="lang",
                            fractions={"en": 0.4}, key_col="doc_id",
                            sampler="modulo").take_all()
    want = {int(i) for i, lg in zip(t["doc_id"].to_pylist(),
                                    t["lang"].to_pylist())
            if lg == "en" and i % 1_000_000 < 400_000}
    assert {r["doc_id"] for r in out} == want
