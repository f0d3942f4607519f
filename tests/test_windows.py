"""Window operator tests (tumbling/sliding keys, sessionization)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from solaris_ray.stages import windows

US = 1_000_000
HOUR = 3600 * US


def test_tumbling_key():
    ts = np.array([0, HOUR - 1, HOUR, 3 * HOUR + 5])
    assert windows.tumbling_key(ts, HOUR).tolist() == [0, 0, HOUR, 3 * HOUR]


def test_sliding_keys_two_windows_each():
    ts = np.array([45 * 60 * US])  # 00:45 -> windows starting 00:00 and 00:30
    ri, ws = windows.sliding_keys(ts, HOUR, HOUR // 2)
    assert ri.tolist() == [0, 0]
    assert sorted(ws.tolist()) == [0, HOUR // 2]


def test_sessionize_gap_split(ray_session):
    import ray

    rows = []
    # user 1: events at 0, 10min, 50min (gap 40 > 30 -> two sessions)
    for i, t in enumerate([0, 10 * 60 * US, 50 * 60 * US]):
        rows.append({"event_id": i, "user_id": 1, "ts": t})
    # user 2: one event
    rows.append({"event_id": 10, "user_id": 2, "ts": 5 * US})
    tbl = pa.Table.from_pylist(rows)
    tbl = tbl.set_column(2, "ts", pa.array(tbl["ts"].to_numpy(), pa.timestamp("us")))
    out = (
        windows.sessionize(ray.data.from_arrow(tbl), gap_us=30 * 60 * US)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    u1 = out[out.user_id == 1]
    assert len(u1) == 2
    assert u1.iloc[0]["n_events"] == 2 and u1.iloc[0]["start_us"] == 0
    assert u1.iloc[1]["n_events"] == 1 and u1.iloc[1]["start_us"] == 50 * 60 * US
    assert len(out[out.user_id == 2]) == 1


def test_sliding_window_counts(ray_session):
    import ray

    rows = [
        {"ts": 10 * 60 * US, "event_type": "a"},   # windows -30:00..., 0:00...
        {"ts": 40 * 60 * US, "event_type": "a"},   # windows 0:00, 0:30
    ]
    tbl = pa.Table.from_pylist(rows)
    tbl = tbl.set_column(0, "ts", pa.array(tbl["ts"].to_numpy(), pa.timestamp("us")))
    out = windows.sliding_window_counts(
        ray.data.from_arrow(tbl), width_us=HOUR, slide_us=HOUR // 2
    ).to_pandas()
    m = {int(r["window_start_us"]): int(r["n"]) for _, r in out.iterrows()}
    assert m[0] == 2  # both events inside [0, 1h)
    assert m[-HOUR // 2] == 1 and m[HOUR // 2] == 1


def test_running_sum_negative_values(ray_session):
    # sign-safe per-user cumsum: negative values must not corrupt the
    # per-run base subtraction
    import numpy as np
    import pyarrow as pa
    import ray

    from solaris_ray.pipelines.queries import q_running_sum  # noqa: F401
    # drive the same kernel through a tiny synthetic events table
    import tempfile, os
    import pyarrow.parquet as pq

    rng = np.random.default_rng(31)
    n = 400
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                rng.integers(0, 10**9, n).astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, 7, n).astype(np.int64)),
            "event_type": pa.array(["x"] * n),
            "value": pa.array(rng.normal(0, 50, n).round(2)),
            "props": pa.array([""] * n),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        got = q_running_sum(d).to_pandas().sort_values("event_id")
    # python oracle
    cents = np.round(tbl["value"].to_numpy() * 100).astype(np.int64)
    ts = tbl["ts"].to_numpy().astype("int64")
    uid = tbl["user_id"].to_numpy()
    exp = np.zeros(n, np.int64)
    for u in np.unique(uid):
        m = np.flatnonzero(uid == u)
        order = m[np.lexsort((m, ts[m]))]
        exp[order] = np.cumsum(cents[order])
    assert (got["run_cents"].to_numpy() == exp).all()


def test_watermark_late_counts_exact(ray_session):
    import ray.data

    from solaris_ray.stages.windows import watermark_late_counts

    # arrival order 0..5; times: 100, 90 (late if delay<10), 200, 50,
    # 199, 201; watermarks: -,100,100,200,200,200
    # delay=30: late = {50}; delay=5: {90, 50} (199 >= 200-5: on time)
    tbl = pa.table({
        "arrival": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "ts_us": pa.array([100, 90, 200, 50, 199, 201], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "b", "a", "b"], pa.string()),
    })
    out = watermark_late_counts(
        ray.data.from_arrow(tbl), delay_us=30, n_ranges=3,
        id_col="arrival").to_pandas().set_index("event_type")
    assert out.loc["a", "n_late"] == 0 and out.loc["b", "n_late"] == 1
    assert out.n_events.sum() == 6
    out5 = watermark_late_counts(
        ray.data.from_arrow(tbl), delay_us=5, n_ranges=2,
        id_col="arrival").to_pandas().set_index("event_type")
    assert out5.loc["a", "n_late"] == 1  # 90
    assert out5.loc["b", "n_late"] == 1  # 50


def test_watermark_first_event_never_late(ray_session):
    import ray.data

    from solaris_ray.stages.windows import watermark_late_counts

    # regression: int64-min seed minus delay used to wrap and flag the
    # very first arrival late
    tbl = pa.table({
        "arrival": pa.array([0], pa.int64()),
        "ts_us": pa.array([1_704_067_207_179_575], pa.int64()),
        "event_type": pa.array(["x"], pa.string()),
    })
    out = watermark_late_counts(ray.data.from_arrow(tbl),
                                delay_us=3_600_000_000,
                                id_col="arrival").to_pandas()
    assert out.n_late.sum() == 0
