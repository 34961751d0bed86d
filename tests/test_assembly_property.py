"""Property-based tests (hypothesis) for the ring stitcher — the
assembly operator's core kernel: any partition of a simple ring into
chains, in any order, with any subset reversed, stitches back to
exactly the original ring; removing a chain always yields the
reference's dangle failure."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osmnightwatch_spark.functions import geometry as G
from osmnightwatch_spark.operators.assembly import _stitch_rings


def _ring(n: int, seed: int) -> np.ndarray:
    """Simple (star-shaped) ring: n vertices at jittered radii around
    a circle — never self-intersecting, no duplicate coordinates."""
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    # enforce distinct angles (collisions would duplicate vertices)
    ang = ang + np.arange(n) * 1e-6
    rad = rng.uniform(1.0, 2.0, n)
    pts = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
    return G.snap(pts)


def _chains(ring: np.ndarray, cuts: list[int], rev_mask: int,
            order_seed: int) -> list[np.ndarray]:
    """Split the closed cycle at the cut indices into chains that share
    endpoints; reverse the chains selected by rev_mask; shuffle."""
    n = len(ring)
    cuts = sorted(set(c % n for c in cuts))
    if len(cuts) < 2:
        closed = np.vstack([ring, ring[:1]])
        return [closed]
    chains = []
    for i, start in enumerate(cuts):
        end = cuts[(i + 1) % len(cuts)]
        idx = (list(range(start, end + 1)) if end > start
               else list(range(start, n)) + list(range(0, end + 1)))
        chains.append(ring[idx])
    out = []
    for i, ch in enumerate(chains):
        out.append(ch[::-1] if (rev_mask >> i) & 1 else ch)
    rng = np.random.default_rng(order_seed)
    rng.shuffle(out)
    return out


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(6, 40),
    seed=st.integers(0, 10_000),
    cuts=st.lists(st.integers(0, 39), min_size=2, max_size=8),
    rev_mask=st.integers(0, 255),
    order_seed=st.integers(0, 1000),
)
def test_stitch_recovers_ring(n, seed, cuts, rev_mask, order_seed):
    ring = _ring(n, seed)
    chains = _chains(ring, cuts, rev_mask, order_seed)
    rings, err = _stitch_rings(chains)
    assert err is None
    assert len(rings) == 1
    out = rings[0]
    # closed, same cardinality, same vertex set (cycle up to rotation
    # and direction)
    assert np.array_equal(out[0], out[-1])
    assert len(out) == n + 1
    got = {tuple(p) for p in out[:-1]}
    exp = {tuple(p) for p in ring}
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(8, 30),
    seed=st.integers(0, 10_000),
    cuts=st.lists(st.integers(0, 29), min_size=3, max_size=6),
    drop=st.integers(0, 5),
)
def test_stitch_missing_chain_is_dangle(n, seed, cuts, drop):
    ring = _ring(n, seed)
    chains = _chains(ring, cuts, 0, 0)
    if len(chains) < 2:
        return
    chains.pop(drop % len(chains))
    rings, err = _stitch_rings(chains)
    assert rings is None and err == "unused"


@settings(max_examples=30, deadline=None)
@given(n=st.integers(6, 30), seed=st.integers(0, 10_000),
       seed2=st.integers(10_001, 20_000),
       cuts=st.lists(st.integers(0, 29), min_size=2, max_size=5))
def test_stitch_two_disjoint_rings(n, seed, seed2, cuts):
    """Two disjoint cycles stitch into exactly two rings."""
    r1 = _ring(n, seed)
    r2 = _ring(n, seed2) + np.array([10.0, 0.0])  # disjoint offset
    chains = _chains(r1, cuts, 0, 1) + _chains(G.snap(r2), cuts, 0, 2)
    rings, err = _stitch_rings(chains)
    assert err is None and len(rings) == 2


# ---------------------------------------------------------------------------
# lenient (inner-role) stitcher: NTS Polygonizer cleanup semantics
# ---------------------------------------------------------------------------

from osmnightwatch_spark.operators.assembly import _stitch_rings_lenient  # noqa: E402


def _norm_ring(r: np.ndarray) -> tuple:
    """Rotation/direction-invariant canonical form of a closed ring."""
    body = r[:-1]
    i = int(np.lexsort((body[:, 1], body[:, 0]))[0])
    fwd = np.roll(body, -i, axis=0)
    rev = np.roll(body[::-1], -int(np.lexsort((body[::-1][:, 1], body[::-1][:, 0]))[0]), axis=0)
    return min(tuple(map(tuple, fwd)), tuple(map(tuple, rev)))


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(6, 30),
    seed=st.integers(0, 10_000),
    cuts=st.lists(st.integers(0, 29), min_size=2, max_size=6),
    rev_mask=st.integers(0, 255),
    order_seed=st.integers(0, 1000),
)
def test_lenient_recovers_ring_no_dangle(n, seed, cuts, rev_mask, order_seed):
    """Clean cut ring → same recovery as the strict stitcher."""
    ring = _ring(n, seed)
    chains = _chains(ring, cuts, rev_mask, order_seed)
    rings, dangle = _stitch_rings_lenient(chains)
    assert not dangle and len(rings) == 1
    assert _norm_ring(rings[0]) == _norm_ring(np.vstack([ring, ring[:1]]))


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(6, 30),
    seed=st.integers(0, 10_000),
    cuts=st.lists(st.integers(0, 29), min_size=2, max_size=6),
    order_seed=st.integers(0, 1000),
)
def test_lenient_reports_dangle_keeps_ring(n, seed, cuts, order_seed):
    """Ring + a dangling tail chain: dangle reported AND the ring still
    recovered (the reference checks ring validity before failing on
    the dangle, so the rings must exist)."""
    ring = _ring(n, seed)
    chains = _chains(ring, cuts, 0, order_seed)
    tail = G.snap(np.array([[10.0, 10.0], [11.0, 11.0]]))
    tail[0] = ring[0]  # attach to a ring vertex; far end is free
    rings, dangle = _stitch_rings_lenient(chains + [tail])
    assert dangle and len(rings) == 1
    assert _norm_ring(rings[0]) == _norm_ring(np.vstack([ring, ring[:1]]))


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(6, 20),
    seed=st.integers(0, 10_000),
    seed2=st.integers(10_001, 20_000),
    order_seed=st.integers(0, 1000),
)
def test_lenient_drops_bridge_keeps_both_loops(n, seed, seed2, order_seed):
    """Two closed loops joined by a bridge chain (the dumbbell): both
    loops become rings, the bridge silently drops, no dangle — NTS
    DeleteCutEdges behavior."""
    r1 = _ring(n, seed)
    r2 = _ring(n, seed2) + np.array([10.0, 0.0])  # disjoint
    bridge = G.snap(np.stack([r1[0], r2[0]]))
    chains = [np.vstack([r1, r1[:1]]), np.vstack([r2, r2[:1]]), bridge]
    rng = np.random.default_rng(order_seed)
    rng.shuffle(chains)
    rings, dangle = _stitch_rings_lenient(chains)
    assert not dangle and len(rings) == 2
    got = {_norm_ring(r) for r in rings}
    exp = {_norm_ring(np.vstack([r1, r1[:1]])), _norm_ring(np.vstack([r2, r2[:1]]))}
    assert got == exp
