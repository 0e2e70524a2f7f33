import numpy as np
import pyarrow as pa

from seronet_data_validator_ray.sketches import Histogram, HyperLogLog, TDigest, hash64
from seronet_data_validator_ray.stattests import chi2_two_sample, ks_two_sample_from_hist


def test_hash64_stable():
    a = pa.array(["a", "b", "c"])
    h1, h2 = hash64(a), hash64(a)
    assert (h1 == h2).all()
    assert len(set(h1.tolist())) == 3


def test_hll_estimate_and_merge():
    rng = np.random.default_rng(0)
    ids = [f"id_{i}" for i in range(50_000)]
    h1, h2 = HyperLogLog(), HyperLogLog()
    h1.add_array(pa.array(ids[:30_000]))
    h2.add_array(pa.array(ids[20_000:]))  # overlap 10k
    h1.merge(h2)
    est = h1.estimate()
    assert abs(est - 50_000) / 50_000 < 0.05
    del rng


def test_tdigest_quantiles():
    rng = np.random.default_rng(1)
    vals = rng.normal(100, 15, 200_000)
    td = TDigest()
    for chunk in np.array_split(vals, 20):
        td.add_array(chunk)
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = np.quantile(vals, q)
        assert abs(td.quantile(q) - exact) < 1.0, (q, td.quantile(q), exact)


def test_tdigest_merge():
    rng = np.random.default_rng(2)
    a, b = rng.uniform(0, 1, 50_000), rng.uniform(1, 2, 50_000)
    t1, t2 = TDigest().add_array(a), TDigest().add_array(b)
    t1.merge(t2)
    assert abs(t1.quantile(0.5) - 1.0) < 0.02
    assert t1.count == 100_000


def test_histogram_merge():
    h1 = Histogram.uniform(0, 10, 5).add_array(np.array([1.0, 2.0, 9.5]))
    h2 = Histogram.uniform(0, 10, 5).add_array(np.array([0.5, 9.9]))
    h1.merge(h2)
    assert h1.total == 5
    assert h1.counts[-1] == 2


def test_chi2_detects_shift():
    rng = np.random.default_rng(3)
    ref = np.bincount(rng.integers(0, 64, 100_000), minlength=64)
    same = np.bincount(rng.integers(0, 64, 100_000), minlength=64)
    shifted = np.bincount(rng.integers(32, 64, 100_000), minlength=64)
    _, _, p_same = chi2_two_sample(same, ref)
    _, _, p_shift = chi2_two_sample(shifted, ref)
    assert p_same > 0.001
    assert p_shift < 1e-10


def test_ks_detects_shift():
    rng = np.random.default_rng(4)
    ref = np.bincount(rng.integers(0, 64, 100_000), minlength=64)
    shifted = np.bincount(rng.integers(32, 64, 100_000), minlength=64)
    d, p = ks_two_sample_from_hist(shifted, ref)
    assert d > 0.4 and p < 1e-10
    d0, p0 = ks_two_sample_from_hist(ref, ref)
    assert d0 == 0.0 and p0 == 1.0
