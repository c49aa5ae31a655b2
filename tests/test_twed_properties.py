"""Property-based tests (hypothesis) for the vectorized TWED kernel.

TWED with nu > 0 and lambda >= 0 is a metric (Marteau 2009, Thm 3):
identity, symmetry, and the triangle inequality must hold, and the
vectorized batch engine must agree with the O(n^2) Marteau-faithful
oracle on arbitrary inputs — not just the golden fixtures.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cutwed_spark.twed.core import twed, twed_reference

NU, LAMB = 0.7, 0.3


def series_strategy(max_n=12, dim=3):
    return st.integers(2, max_n).flatmap(
        lambda n: st.tuples(
            st.lists(
                st.lists(
                    st.floats(-50, 50, allow_nan=False, width=32),
                    min_size=dim,
                    max_size=dim,
                ),
                min_size=n,
                max_size=n,
            ),
            st.lists(
                st.floats(0.0625, 5.0, allow_nan=False, width=32),
                min_size=n,
                max_size=n,
            ),
        )
    )


def unpack(sv):
    vals, gaps = sv
    return np.array(vals, dtype=np.float64), np.cumsum(np.array(gaps, dtype=np.float64))


@settings(max_examples=40, deadline=None)
@given(series_strategy(), series_strategy())
def test_vectorized_matches_oracle(sa, sb):
    A, TA = unpack(sa)
    B, TB = unpack(sb)
    fast = twed(A, TA, B, TB, NU, LAMB, 2)
    slow = twed_reference(A, TA, B, TB, NU, LAMB, 2)
    assert np.isclose(fast, slow, rtol=1e-9, atol=1e-9)


@settings(max_examples=30, deadline=None)
@given(series_strategy(), series_strategy())
def test_symmetry_and_nonnegativity(sa, sb):
    A, TA = unpack(sa)
    B, TB = unpack(sb)
    d_ab = twed(A, TA, B, TB, NU, LAMB, 2)
    d_ba = twed(B, TB, A, TA, NU, LAMB, 2)
    assert d_ab >= 0
    assert np.isclose(d_ab, d_ba, rtol=1e-12)


@settings(max_examples=30, deadline=None)
@given(series_strategy())
def test_identity(sa):
    """d(A, A) == 0 exactly. The deg==2 fast path's BLAS expansion
    rescues cancellation-dominated entries with a direct-difference
    recompute (core._match_costs_block), so identical points score an
    exact 0 — the metric identity, matching the reference's
    direct-difference formulation (twed.c:139-159)."""
    A, TA = unpack(sa)
    assert twed(A, TA, A, TA, NU, LAMB, 2) == 0.0


@settings(max_examples=25, deadline=None)
@given(series_strategy(max_n=8), series_strategy(max_n=8), series_strategy(max_n=8))
def test_triangle_inequality(sa, sb, sc):
    A, TA = unpack(sa)
    B, TB = unpack(sb)
    C, TC = unpack(sc)
    d_ac = twed(A, TA, C, TC, NU, LAMB, 2)
    d_ab = twed(A, TA, B, TB, NU, LAMB, 2)
    d_bc = twed(B, TB, C, TC, NU, LAMB, 2)
    assert d_ac <= d_ab + d_bc + 1e-9
