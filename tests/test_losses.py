"""Loss primitives vs torch oracles and reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tim_tpu.ops import losses


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(32, 11)).astype(np.float32)
    labels = rng.integers(-1, 11, size=(32,))
    labels[:4] = -1  # ensure some ignored rows

    crit = torch.nn.CrossEntropyLoss(label_smoothing=0.2, ignore_index=-1)
    want = crit(torch.tensor(logits), torch.tensor(labels)).item()
    got = losses.cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), label_smoothing=0.2)
    assert abs(float(got) - want) < 1e-5


def test_cross_entropy_all_ignored_is_zero():
    logits = jnp.zeros((4, 5))
    labels = -jnp.ones((4,), jnp.int32)
    assert float(losses.cross_entropy(logits, labels)) == 0.0


def test_focal_loss_matches_torch_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(16, 7)).astype(np.float32)
    targets = rng.uniform(size=(16, 7)).astype(np.float32)

    t_logits, t_targets = torch.tensor(logits), torch.tensor(targets)
    p = torch.sigmoid(t_logits)
    ce = F.binary_cross_entropy_with_logits(t_logits, t_targets,
                                            reduction="none")
    p_t = p * t_targets + (1 - p) * (1 - t_targets)
    want = ce * ((1 - p_t) ** 2.0)
    alpha_t = 0.25 * t_targets + 0.75 * (1 - t_targets)
    want = (alpha_t * want).numpy()

    got = losses.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_diou_loss_reference_formula():
    """Spot-check the 1-D center-DIoU against a hand computation."""
    pred = jnp.asarray([[0.2, 0.4], [0.1, 0.3]])
    target = jnp.asarray([[0.2, 0.4], [0.3, 0.1]])
    got = np.asarray(losses.ctr_diou_loss_1d(pred, target))
    # identical offsets -> iou 1, center offset 0 -> loss 0
    assert got[0] == pytest.approx(0.0, abs=1e-6)
    # second row: inter = min(.1,.3)+min(.3,.1)=.2; union=.4+.4-.2=.6
    # iou=1/3; len_c=.3+.3=.6; rho=.5*(.3-.1-.1+.3)=.2; loss=2/3+(1/9)
    assert got[1] == pytest.approx(2 / 3 + (0.2 / 0.6) ** 2, abs=1e-6)


def test_diou_perfect_match_zero():
    x = jnp.asarray([[0.25, 0.75]])
    assert float(losses.ctr_diou_loss_1d(x, x)[0]) == pytest.approx(0.0,
                                                                    abs=1e-6)


def test_mixup_properties():
    rng = jax.random.PRNGKey(0)
    x = jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3)
    (mixed,), perm, lam = losses.mixup(rng, (x,), alpha=0.2)
    lam = float(lam)
    assert 0.0 <= lam <= 1.0
    np.testing.assert_allclose(
        np.asarray(mixed), lam * np.asarray(x) + (1 - lam) * np.asarray(x)[np.asarray(perm)],
        rtol=1e-6)
    # perm is a permutation
    assert sorted(np.asarray(perm).tolist()) == list(range(8))


def test_smooth_positive_labels_matches_reference():
    """Matches one_hot(C+1)*s + (1-s)/(C+1), last column dropped
    (detection tim.py:157-184)."""
    labels = jnp.asarray([2, -1, 0])
    got = np.asarray(losses.smooth_positive_labels(labels, 4, 0.9))
    floor = 0.1 / 5
    want = np.full((3, 4), floor, np.float32)
    want[0, 2] += 0.9
    want[2, 0] += 0.9
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fused_smoothed_focal_matches_explicit():
    """sigmoid_focal_loss_smoothed == focal(smooth_positive_labels) with
    explicit target materialization."""
    rng = np.random.default_rng(2)
    n, c = 20, 9
    logits = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    labels = jnp.asarray(rng.integers(-1, c, size=(n,)))
    w = jnp.asarray(rng.uniform(0.5, 1.0, n), jnp.float32)
    s = 0.9

    explicit = losses.sigmoid_focal_loss(
        logits, losses.smooth_positive_labels(labels, c, s),
        reduction="none")
    want = float(jnp.sum(explicit * w[:, None]))
    got = float(losses.sigmoid_focal_loss_smoothed(logits, labels, s,
                                                   weights=w))
    assert got == pytest.approx(want, rel=1e-5)


def test_drloc_loss_runs_and_bounded():
    rng = jax.random.PRNGKey(3)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 10, 8)),
                    jnp.float32)

    def mlp(pairs):
        return jnp.zeros(pairs.shape[:-1])

    loss = losses.drloc_loss(rng, x, x, mlp, m=16)
    # with zero predictions, loss = E|dpos|/l in [0, 1)
    assert 0.0 <= float(loss) < 1.0
