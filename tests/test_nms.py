"""NMS/Soft-NMS: native C++ vs numpy fallback identity, hand-pinned
reference semantics, seg-voting vs torch oracle, on-device variant."""

import numpy as np
import pytest

from tim_tpu.evals import nms as N


def _random_segs(n, rng):
    s = rng.uniform(0, 30, (n,))
    d = rng.uniform(0.1, 5.0, (n,))
    return np.stack([s, s + d], -1).astype(np.float32)


def test_native_library_builds():
    assert N._load_native() is not None, "C++ nms1d failed to build"


@pytest.mark.parametrize("n", [1, 7, 100])
def test_nms_native_matches_numpy(n):
    rng = np.random.default_rng(0)
    segs = _random_segs(n, rng)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    keep_c = N.nms_1d(segs, scores, 0.3)
    keep_np = N._nms_1d_numpy(segs, scores, 0.3)
    np.testing.assert_array_equal(keep_c, keep_np)


@pytest.mark.parametrize("method", [0, 1, 2])
def test_softnms_native_matches_numpy(method):
    rng = np.random.default_rng(1)
    segs = _random_segs(60, rng)
    scores = rng.uniform(0, 1, 60).astype(np.float32)
    s_c, sc_c, i_c = N.softnms_1d(segs, scores, 0.4, sigma=0.5,
                                  min_score=0.05, method=method)
    s_n, sc_n, i_n = N._softnms_1d_numpy(segs, scores, 0.4, 0.5, 0.05,
                                         method)
    np.testing.assert_array_equal(i_c, i_n)
    np.testing.assert_allclose(s_c, s_n, atol=1e-6)
    np.testing.assert_allclose(sc_c, sc_n, atol=1e-5)


def test_nms_reference_semantics():
    """>= threshold suppresses; kept indices returned in score order."""
    segs = np.asarray([[0, 10], [1, 11], [20, 30], [0, 5]], np.float32)
    scores = np.asarray([0.9, 0.8, 0.7, 0.6], np.float32)
    # iou(0,1) = 9/11 > 0.49 -> 1 suppressed; iou(0,3) ~= 0.5 (the 1e-6
    # length epsilon puts it just *under* 0.5, like the reference)
    keep = N.nms_1d(segs, scores, 0.49)
    np.testing.assert_array_equal(keep, [0, 2])
    keep = N.nms_1d(segs, scores, 0.5)
    np.testing.assert_array_equal(keep, [0, 2, 3])


def test_softnms_gaussian_decay_value():
    segs = np.asarray([[0, 10], [0, 10], [20, 30]], np.float32)
    scores = np.asarray([1.0, 0.5, 0.4], np.float32)
    out_s, out_sc, inds = N.softnms_1d(segs, scores, 0.5, sigma=0.5,
                                       min_score=0.001, method=2)
    # identical segments: iou ~= 1 -> second decays by exp(-1/0.5)
    assert inds[0] == 0
    want = 0.5 * np.exp(-((10 / (10 + 1e-6 + 10 + 1e-6 - 10)) ** 2) / 0.5)
    decayed = out_sc[list(inds).index(1)]
    assert decayed == pytest.approx(want, rel=1e-4)
    # disjoint segment untouched
    assert out_sc[list(inds).index(2)] == pytest.approx(0.4, rel=1e-6)


def test_seg_voting_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    nms_segs = _random_segs(5, rng)
    all_segs = _random_segs(40, rng)
    all_scores = rng.uniform(0, 1, 40).astype(np.float32)

    got = N.seg_voting(nms_segs, all_segs, all_scores, 0.3)

    tn, ta, ts = map(torch.tensor, (nms_segs, all_segs, all_scores))
    left = torch.maximum(tn[:, None, 0], ta[None, :, 0])
    right = torch.minimum(tn[:, None, 1], ta[None, :, 1])
    inter = (right - left).clamp(min=0)
    iou = inter / ((tn[:, 1] - tn[:, 0])[:, None]
                   + (ta[:, 1] - ta[:, 0])[None, :] - inter)
    w = (iou >= 0.3).float() * ts[None, :] * iou
    w = w / w.sum(dim=1, keepdim=True)
    want = (w @ ta).numpy()
    # reference emits NaN rows when no candidate votes; we fall back to the
    # un-voted segment there and must match the oracle everywhere else
    finite = np.isfinite(want).all(axis=1)
    np.testing.assert_allclose(got[finite], want[finite],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got[~finite], nms_segs[~finite])


def test_seg_voting_zero_weight_falls_back_to_unvoted():
    """No-neighbor edge: the reference divides by a zero weight sum and
    emits NaN rows (``eval_detection/nms.py:90-91``); we fall back to the
    kept segment itself. Rows with voters must still match the oracle."""
    torch = pytest.importorskip("torch")
    # row 0 has a voter (itself, score>0); row 1 is disjoint from every
    # candidate; row 2 overlaps only candidates with score 0.
    nms_segs = np.asarray([[0., 2.], [100., 102.], [50., 52.]], np.float32)
    all_segs = np.asarray([[0., 2.], [50., 52.], [50.5, 52.5]], np.float32)
    all_scores = np.asarray([0.9, 0.0, 0.0], np.float32)

    got = N.seg_voting(nms_segs, all_segs, all_scores, 0.3)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[1], nms_segs[1])
    np.testing.assert_allclose(got[2], nms_segs[2])

    tn, ta, ts = map(torch.tensor, (nms_segs, all_segs, all_scores))
    left = torch.maximum(tn[:, None, 0], ta[None, :, 0])
    right = torch.minimum(tn[:, None, 1], ta[None, :, 1])
    inter = (right - left).clamp(min=0)
    iou = inter / ((tn[:, 1] - tn[:, 0])[:, None]
                   + (ta[:, 1] - ta[:, 0])[None, :] - inter)
    w = (iou >= 0.3).float() * ts[None, :] * iou
    w = w / w.sum(dim=1, keepdim=True)
    want = (w @ ta).numpy()
    assert np.isnan(want[1]).all() and np.isnan(want[2]).all()
    np.testing.assert_allclose(got[0], want[0], atol=1e-4, rtol=1e-4)


def test_batched_nms_multiclass_keeps_classes_separate():
    segs = np.asarray([[0, 10], [0.5, 10.5], [0, 10]], np.float32)
    scores = np.asarray([0.9, 0.8, 0.85], np.float32)
    cls = np.asarray([0, 0, 1])
    out_s, out_sc, out_c = N.batched_nms(
        segs, scores, cls, iou_threshold=0.5, min_score=0.01,
        nms_kind="hard")
    # class 0: second suppressed; class 1 untouched
    assert len(out_sc) == 2
    assert set(out_c.tolist()) == {0, 1}


def test_softnms_multiclass_fused_matches_per_class_loop():
    """One-call native multi-class Soft-NMS == looping softnms_1d over
    np.unique(cls) (the exactness contract batched_nms relies on)."""
    rng = np.random.default_rng(7)
    n = 400
    segs = _random_segs(n, rng)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    cls = rng.integers(0, 23, n)

    fused = N.softnms_1d_multiclass(segs, scores, cls, 0.3, sigma=0.25,
                                    min_score=0.01, method=2)
    assert fused is not None
    f_segs, f_scores, f_cls = fused

    parts = []
    for c in np.unique(cls):
        sel = cls == c
        s, sc, inds = N.softnms_1d(segs[sel], scores[sel], 0.3, sigma=0.25,
                                   min_score=0.01, method=2)
        parts.append((s, sc, cls[sel][inds]))
    np.testing.assert_array_equal(f_segs, np.concatenate(
        [p[0] for p in parts]))
    np.testing.assert_array_equal(f_scores, np.concatenate(
        [p[1] for p in parts]))
    np.testing.assert_array_equal(f_cls, np.concatenate(
        [p[2] for p in parts]))


def test_batched_nms_fused_vs_fallback_identical(monkeypatch):
    rng = np.random.default_rng(11)
    n = 300
    segs = _random_segs(n, rng)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    cls = rng.integers(0, 17, n)
    kw = dict(iou_threshold=0.1, min_score=0.001, sigma=0.25, method=2,
              nms_kind="soft", multi_class=True)
    got = N.batched_nms(segs, scores, cls, **kw)
    monkeypatch.setattr(N, "softnms_1d_multiclass",
                        lambda *a, **k: None)
    want = N.batched_nms(segs, scores, cls, **kw)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_nms_1d_jax_matches_host():
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    segs = _random_segs(30, rng)
    scores = rng.uniform(0, 1, 30).astype(np.float32)
    keep_host = N.nms_1d(segs, scores, 0.3)
    keep_dev, valid = N.nms_1d_jax(jnp.asarray(segs), jnp.asarray(scores),
                                   0.3, max_keep=30)
    keep_dev = np.asarray(keep_dev)[np.asarray(valid)]
    np.testing.assert_array_equal(np.sort(keep_host), np.sort(keep_dev))
