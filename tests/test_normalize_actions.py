"""normalize_actions schema handling: AVE class_id promotion, missing
verb/noun fill, detection-length filtering, narration prefixes."""

import numpy as np
import pytest

from tim_tpu.data.windows import normalize_actions, timestamp_to_seconds


@pytest.fixture()
def frames():
    import pandas as pd

    df = pd.DataFrame({
        "video_id": ["v1", "v1", "v2"],
        "start_timestamp": ["00:00:01.00", "00:00:05.50", "00:01:00.00"],
        "stop_timestamp": ["00:00:02.00", "00:00:30.50", "00:01:02.00"],
        "class_id": [3, 1, 2],
    })
    df.index = pd.Index(["n0", "n1", "n2"], name="narration_id")
    return df


def test_ave_visual_promotes_class_id(frames):
    out = normalize_actions(frames, "visual", dataset_name="ave")
    # AVE: action_class mirrors class_id (sliding_window.py:162-165)
    np.testing.assert_array_equal(out["action_class"], [3, 1, 2])
    # missing verb/noun filled with -1
    assert (out["verb_class"] == -1).all()
    assert out["narration_id"].tolist() == ["v_n0", "v_n1", "v_n2"]


def test_epic_visual_clears_class_id(frames):
    df = frames.copy()
    df["action_class"] = [7, 8, 9]
    out = normalize_actions(df, "visual", dataset_name="epic")
    assert (out["class_id"] == -1).all()
    np.testing.assert_array_equal(out["action_class"], [7, 8, 9])


def test_audio_clears_visual_columns(frames):
    out = normalize_actions(frames, "audio")
    assert (out["verb_class"] == -1).all()
    assert (out["action_class"] == -1).all()
    np.testing.assert_array_equal(out["class_id"], [3, 1, 2])
    assert out["narration_id"].tolist() == ["a_n0", "a_n1", "a_n2"]


def test_detection_filters_long_actions(frames):
    out = normalize_actions(frames, "audio", detection=True,
                            window_size=10.0)
    # the 25s action (n1) is dropped (duration >= window_size)
    assert out["narration_id"].tolist() == ["a_n0", "a_n2"]


def test_timestamp_parsing():
    assert timestamp_to_seconds("01:02:03.5") == pytest.approx(3723.5)
    assert timestamp_to_seconds("00:00:00.25") == pytest.approx(0.25)
