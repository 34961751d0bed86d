"""Property-based tests (hypothesis) for the sampling/packing pure
kernels — no Spark session needed."""

from hypothesis import given, settings
from hypothesis import strategies as st

from osmnightwatch_spark.operators.knn import auto_res
from osmnightwatch_spark.operators.sampling import HASH_WIDTH, _keep_threshold


@settings(max_examples=200, deadline=None)
@given(f=st.floats(0.0, 1.0, allow_nan=False))
def test_keep_threshold_width_and_range(f):
    """Thresholds compare correctly against HASH_WIDTH-char hex: always
    same width (or the keep-all sentinel), lexicographically ordered
    with the hex alphabet."""
    t = _keep_threshold(f)
    if t == "g":
        assert round(f * 16 ** HASH_WIDTH) >= 16 ** HASH_WIDTH
    else:
        assert len(t) == HASH_WIDTH and int(t, 16) == round(f * 16 ** HASH_WIDTH)
    assert _keep_threshold(0.0) <= t <= "g"


@settings(max_examples=200, deadline=None)
@given(a=st.floats(0.0, 1.0), b=st.floats(0.0, 1.0))
def test_keep_threshold_monotone(a, b):
    """Larger fraction → superset sample: threshold strings order the
    same way the fractions do (string compare == numeric compare)."""
    lo, hi = sorted([a, b])
    assert _keep_threshold(lo) <= _keep_threshold(hi)


@settings(max_examples=200, deadline=None)
@given(n=st.integers(1, 10**13), k=st.integers(1, 1000))
def test_auto_res_bounds_and_monotone(n, k):
    r = auto_res(n, k)
    assert 2 <= r <= 14
    assert auto_res(n * 64, k) >= r      # more candidates → finer grid
    assert auto_res(n, min(1000, k * 64)) <= r  # bigger k → coarser grid
