"""Hungarian solver: exact-match vs scipy's optimal assignment + hand cases."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from cl_ica_tpu.evaluation import Munkres, hungarian


def test_hand_case():
    cost = np.array([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
    pairs = hungarian(cost)
    total = sum(cost[r, c] for r, c in pairs)
    assert total == 5.0  # 1 + 2 + 2
    assert pairs == [(0, 1), (1, 0), (2, 2)]


def test_identity_is_cheapest():
    cost = 1.0 - np.eye(6)
    pairs = hungarian(cost)
    assert pairs == [(i, i) for i in range(6)]


@pytest.mark.parametrize("n", [2, 5, 10, 15])
def test_matches_scipy_optimal_cost(n):
    rng = np.random.default_rng(n)
    for trial in range(20):
        cost = rng.normal(size=(n, n))
        pairs = hungarian(cost)
        assert len(pairs) == n
        rows = [p[0] for p in pairs]
        cols = [p[1] for p in pairs]
        assert sorted(rows) == list(range(n))
        assert sorted(cols) == list(range(n))
        total = sum(cost[r, c] for r, c in pairs)
        ri, ci = linear_sum_assignment(cost)
        np.testing.assert_allclose(total, cost[ri, ci].sum(), rtol=1e-12)


def test_negative_abs_corr_matrix():
    # the MCC call shape: munkres on -|corr|
    rng = np.random.default_rng(0)
    corr = rng.uniform(-1, 1, (10, 10))
    pairs = hungarian(-np.abs(corr))
    total = sum(-np.abs(corr)[r, c] for r, c in pairs)
    ri, ci = linear_sum_assignment(-np.abs(corr))
    np.testing.assert_allclose(total, (-np.abs(corr))[ri, ci].sum(), rtol=1e-12)


def test_rectangular_padding():
    m = Munkres()
    padded = m.pad_matrix([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    assert len(padded) == 3 and all(len(r) == 3 for r in padded)
    cost = np.array([[1.0, 2.0, 3.0], [2.0, 4.0, 6.0]])
    pairs = hungarian(cost)
    # padded to 3x3; rows 0..2 all present
    assert len(pairs) == 3


def test_exact_match_vs_vendored_reference():
    """BASELINE requirement: Hungarian assignment must match the
    reference's vendored munkres.py output exactly. Import it directly
    from the (read-only) reference checkout when present."""
    import importlib.util, os

    ref_path = "/root/reference/munkres.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_munkres", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng2 = np.random.default_rng(123)
    for n in (3, 5, 10):
        for _ in range(10):
            corr = rng2.uniform(-1, 1, (n, n))
            cost = -np.abs(corr)  # the MCC call shape
            ours = hungarian(cost, prefer_native=False)
            theirs = ref.Munkres().compute(cost.tolist())
            total_ours = sum(cost[r, c] for r, c in ours)
            total_theirs = sum(cost[r][c] for r, c in theirs)
            np.testing.assert_allclose(total_ours, total_theirs, rtol=1e-12)
            # exact assignment parity (not just cost): continuous random
            # matrices have no ties, so optimal assignment is unique
            assert ours == [(int(r), int(c)) for r, c in sorted(theirs)]
