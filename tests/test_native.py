"""Native C++ component tests (skip when the toolchain is unavailable)."""

import numpy as np
import pytest

from cl_ica_tpu.native import (
    PackedGather,
    hungarian_solve_native,
    native_available,
)
from cl_ica_tpu.evaluation import hungarian

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)

rng = np.random.default_rng(0)


@pytest.mark.parametrize("n", [3, 10, 32, 64])
def test_native_hungarian_optimal(n):
    from scipy.optimize import linear_sum_assignment

    for _ in range(10):
        cost = rng.normal(size=(n, n))
        r2c = hungarian_solve_native(cost)
        assert sorted(r2c) == list(range(n))
        total = cost[np.arange(n), r2c].sum()
        ri, ci = linear_sum_assignment(cost)
        np.testing.assert_allclose(total, cost[ri, ci].sum(), rtol=1e-12)


def test_hungarian_router_uses_native_for_large_n():
    cost = rng.normal(size=(32, 32))
    pairs = hungarian(cost, prefer_native=True)
    pairs_py = hungarian(cost, prefer_native=False)
    total_n = sum(cost[r, c] for r, c in pairs)
    total_p = sum(cost[r, c] for r, c in pairs_py)
    np.testing.assert_allclose(total_n, total_p, rtol=1e-12)


def test_packed_gather_roundtrip(tmp_path):
    arr = rng.integers(0, 255, (50, 7, 9, 3), dtype=np.uint8)
    path = str(tmp_path / "store.npy")
    np.save(path, arr)
    pg = PackedGather(path, (7, 9, 3), 50)
    assert pg.ok
    idx = np.array([0, 17, 49, 3, 3])
    out = pg.gather(idx)
    np.testing.assert_array_equal(out, arr[idx])
    with pytest.raises(IndexError):
        pg.gather(np.array([50]))
    pg.close()


def test_packed_gather_large_batch(tmp_path):
    arr = rng.integers(0, 255, (200, 32, 32), dtype=np.uint8)
    path = str(tmp_path / "store2.npy")
    np.save(path, arr)
    pg = PackedGather(path, (32, 32), 200)
    idx = rng.integers(0, 200, 512)
    out = pg.gather(idx)
    np.testing.assert_array_equal(out, arr[idx])
    pg.close()
