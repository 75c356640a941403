"""Shared int64 headroom guard (functions/aggregates.headroom_guard):
every grouped statistic that documents an exact-int64 bound must refuse
LOUDLY at it instead of letting a numpy fold wrap silently. Feasible
bounds are driven for real (extreme magnitudes); row-count bounds that
would need billions of physical rows are pinned by capturing the guard
call and asserting the documented worst-case expression is what the op
actually computes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from search_engine_ray.functions import aggregates as agg


def test_guard_helper_semantics():
    agg.headroom_guard("op", 2**62 - 1)  # just under: no raise
    with pytest.raises(ValueError, match="op: .*int64 headroom"):
        agg.headroom_guard("op", 2**62)
    with pytest.raises(ValueError, match="custom hint"):
        agg.headroom_guard("op", 5, bound=5, hint="custom hint")


def _drain(ds):
    return ds.take_all() if isinstance(ds, rd.Dataset) else ds


def test_grouped_outliers_refuses_at_bound(ray_session):
    # cents = v*100 -> m ~ 4e17; n*m^2 ~ 8*1.6e35 >> 2^62. The check
    # works POST-aggregation from (n, max|cent|), which never wraps.
    v = np.full(8, 4.0e15)
    v[0] = -4.0e15
    ds = rd.from_arrow(pa.table({"event_type": ["a"] * 8, "value": v}))
    with pytest.raises(ValueError, match="grouped_outliers: .*headroom"):
        _drain(agg.grouped_outliers(ds))


def test_emd_refuses_at_bound(ray_session):
    # na*nb*range = 2*2*~8e18 >= 2^62 via magnitude, not row count
    t = pa.table(
        {
            "event_type": ["a"] * 4,
            "segment": [0, 0, 1, 1],
            "value": [-4.0e16, -1.0, 1.0, 4.0e16],
        }
    )
    with pytest.raises(ValueError, match="emd_by_group: .*headroom"):
        _drain(agg.emd_by_group(rd.from_arrow(t)))


def test_spearman_refuses_at_bound(ray_session):
    # 4n^3 >= 2^62 from n ~ 1.04e6 rows in one group — driven for real
    n = 1_050_000
    t = pa.table(
        {
            "g": pa.array(np.zeros(n, np.int64)),
            "x": pa.array(np.arange(n, dtype=np.int64)),
            "y": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    with pytest.raises(ValueError, match="spearman_by_group: .*headroom"):
        _drain(agg.spearman_by_group(rd.from_arrow(t), "g", "x", "y"))


@pytest.mark.parametrize(
    "name,build,expected",
    [
        (
            "kendall_by_group",
            lambda bound: agg.kendall_by_group(
                rd.from_arrow(
                    pa.table(
                        {
                            "event_type": ["a"] * 100,
                            "ts_us": list(range(100)),
                            "value": [float(i % 7) for i in range(100)],
                        }
                    )
                ),
                headroom_bound=bound,
            ),
            100 * 99 // 2,  # C(n, 2) — the documented |S| bound
        ),
        (
            "ks_test",
            lambda bound: agg.ks_test(
                rd.from_arrow(
                    pa.table(
                        {
                            "event_type": ["a"] * 10,
                            "segment": [0, 1] * 5,
                            "value": [float(i) for i in range(10)],
                        }
                    )
                ),
                headroom_bound=bound,
            ),
            5 * 5,  # na*nb — the documented D-numerator bound
        ),
    ],
)
def test_rowcount_bounds_wired(ray_session, name, build, expected):
    """Row-count bounds (infeasible to drive with billions of physical
    rows) are pinned EXACTLY via the overridable bound: the guard
    refuses at ``expected`` and passes at ``expected + 1``, so the op
    provably computes its documented worst-case expression — and the
    refusal path runs for real, inside the remote fold."""
    with pytest.raises(ValueError, match=f"{name}: .*headroom"):
        _drain(build(expected))
    _drain(build(expected + 1))  # one past: no raise
