import pyarrow as pa

from xhs_ocr_ray.stages.windows import hopping_counts, sessionize, tumbling_counts

HOUR = 3600 * 1_000_000


def _events():
    import ray.data

    rows = {
        "user_id": [1, 1, 1, 2, 2],
        "ts": pa.array([0, HOUR, 10 * HOUR, 0, HOUR // 2], pa.timestamp("us")),
        "event_id": [1, 2, 3, 4, 5],
    }
    return ray.data.from_arrow(pa.table(rows))


def test_sessionize_gap_splits(ray_session):
    out = sessionize(_events(), "user_id", "ts", gap_us=2 * HOUR,
                     order_cols=("event_id",)).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_id")
    assert u1["n_events"].tolist() == [2, 1]  # 10h gap splits the session
    u2 = out[out["user_id"] == 2]
    assert u2["n_events"].tolist() == [2]
    assert u1["session_id"].tolist() == [1, 2]


def test_tumbling_counts(ray_session):
    out = tumbling_counts(_events(), "user_id", "ts", window_us=HOUR).to_pandas()
    u1 = out[out["user_id"] == 1].set_index("window_id")["n_events"]
    assert u1[0] == 1 and u1[1] == 1 and u1[10] == 1


def test_hopping_counts_overlap(ray_session):
    out = hopping_counts(_events(), "user_id", "ts", window_us=2 * HOUR,
                         slide_us=HOUR).to_pandas()
    u1 = out[out["user_id"] == 1].set_index("window_id")["n_events"]
    # window 0 covers [0,2h): events at 0 and 1h; window 1 covers [1h,3h): 1h only
    assert u1[0] == 2
    assert u1[1] == 1
    assert u1[10] == 1
