"""Modality variants: visual-only, audio-only, AVE pooled features, and
multi-host helper no-op paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tim_tpu import config as C
from tim_tpu.models import TimRecognition
from tim_tpu.parallel import multihost
from tim_tpu.train import recognition as rec_train
from tim_tpu.train.optim import make_optimizer
from tim_tpu.train.state import create_train_state


def test_visual_only_recognition():
    cfg = C.ModelConfig(
        visual_classes=(5, 6, 4), audio_classes=3,
        input_modality="visual", data_modality="visual",
        visual_input_dim=24, d_model=16, nhead=2, num_layers=1,
        num_feats=6, compute_dtype="float32")
    model = TimRecognition(cfg)
    b, nv = 2, 3
    rng = jax.random.PRNGKey(0)
    v = jnp.ones((b, 6, 24))
    times = jnp.zeros((b, 6 + nv, 2))
    variables = model.init({"params": rng, "dropout": rng}, v, None, times,
                           nv, 0, deterministic=True)
    (verb, noun, action, audio), ctx = model.apply(
        variables, v, None, times, nv, 0, deterministic=True)
    assert verb.shape == (b, nv, 5)
    assert action.shape == (b, nv, 4)
    assert audio is None
    assert ctx.shape == (b, 6, 32)
    # no audio params created
    assert "audio_embedder" not in variables["params"]["feature_encoding"]

    # train step runs
    tcfg = C.TrainConfig(mixup_alpha=0.0, lambda_drloc=0.1)
    batch = {
        "v_feats": v,
        "times": times,
        "verb": jnp.zeros((b, nv), jnp.int32),
        "noun": jnp.zeros((b, nv), jnp.int32),
        "action": jnp.zeros((b, nv), jnp.int32),
        "class_id": -jnp.ones((b, 0), jnp.int32),
    }
    tx = make_optimizer(1e-3, 1e-4, 10, 2)
    state = create_train_state(variables["params"], tx)
    step = jax.jit(rec_train.make_train_step(model, cfg, tcfg, nv, 0))
    state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert "loss_audio" not in metrics


def test_audio_only_recognition():
    cfg = C.ModelConfig(
        visual_classes=(4,), audio_classes=3,
        input_modality="audio", data_modality="audio",
        audio_input_dim=16, d_model=16, nhead=2, num_layers=1,
        num_feats=6, include_verb_noun=False, compute_dtype="float32")
    model = TimRecognition(cfg)
    b, na = 2, 2
    rng = jax.random.PRNGKey(0)
    a = jnp.ones((b, 6, 16))
    times = jnp.zeros((b, 6 + na, 2))
    variables = model.init({"params": rng, "dropout": rng}, None, a, times,
                           0, na, deterministic=True)
    (verb, noun, action, audio), ctx = model.apply(
        variables, None, a, times, 0, na, deterministic=True)
    assert audio.shape == (b, na, 3)
    assert action is None
    assert ctx.shape == (b, 6, 32)


def test_ave_pooled_features():
    """AVE path: 7x7 visual maps pooled by audio-guided attention
    (apply_feature_pooling, recognition tim.py:155-156)."""
    cfg = C.ModelConfig(
        visual_classes=(4,), audio_classes=4,
        input_modality="audio_visual", data_modality="audio_visual",
        visual_input_dim=24, audio_input_dim=16,
        include_verb_noun=False, apply_feature_pooling=True,
        d_model=16, nhead=2, num_layers=1, num_feats=6,
        compute_dtype="float32")
    model = TimRecognition(cfg)
    b, nv, na = 2, 2, 2
    rng = jax.random.PRNGKey(0)
    v = jnp.ones((b, 6, 49, 24))        # [B, T, P, Dv] spatial maps
    a = jnp.ones((b, 6, 16))
    times = jnp.zeros((b, 12 + nv + na, 2))
    variables = model.init({"params": rng, "dropout": rng}, v, a, times,
                           nv, na, deterministic=True)
    (verb, noun, action, audio), ctx = model.apply(
        variables, v, a, times, nv, na, deterministic=True)
    assert action.shape == (b, nv, 4)
    assert audio.shape == (b, na, 4)
    assert "pool" in variables["params"]


def test_multihost_helpers_single_process():
    x = np.arange(6).reshape(2, 3)
    np.testing.assert_array_equal(multihost.allgather_host_arrays(x), x)
    out = multihost.allreduce_host_scalars({"a": 1.0, "b": 2})
    assert out == {"a": 1.0, "b": 2.0}
    multihost.barrier()
    assert multihost.is_master()
    multihost.initialize()  # no-op single process
