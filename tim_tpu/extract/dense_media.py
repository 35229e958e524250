"""Overlap-aware dense raw-media extraction (frame bank + pair-embed dedup).

Dense feature timesteps are 0.2 s apart while their clips span 1.1-2.1 s
(``/root/reference/feature_extractors/make_framepickle.py:37-38``:
INTERVAL=1.1, HOP_SIZE=0.2), so consecutive clips share ~80-90% of their
frames. The naive raw-media path
(``serve.DetectionServer.detect_video_media``) uploads every clip in
full — each pixel crosses host->device ~5x — and re-embeds every shared
frame pair in every clip that contains it.

This module removes both redundancies EXACTLY (same pixels, same conv
math — no approximation):

1. **Frame bank**: the host uploads each unique video frame ONCE
   ([Nf, H, W, 3] in HBM); clips are assembled on device by gather
   (HBM-internal, ~free next to a backbone forward). ~5x less host->
   device traffic at the 0.2 s hop — the dominant cost on a relay link.
2. **Pair-embed dedup**: both visual backbones start with a VALID
   Conv3D whose temporal kernel == stride == 2 (Swin patch_size (2,4,4),
   ViT tubelet 2), so the embedding of a frame PAIR is independent of
   the rest of the clip. Each unique (frame_a, frame_b) pair is embedded
   once into a pair-embed bank; clips gather their pair rows and enter
   the trunk via the backbones' ``embedded=True`` path. Removes the
   duplicated embed FLOPs (a small fraction of the trunk — measured in
   ``scripts/bench_media_ingest.py``) and shrinks the gathered tensor
   (Swin: 56*56*128 floats/pair vs 2*224*224*3 pixels).

The trunk compute itself CANNOT be deduplicated exactly: one layer in,
every token attends across its clip (Swin's stage-0 window already
spans the full temporal extent), and clips at different offsets contain
different token sets. The exact-reuse ceiling is therefore the embed +
transfer share; see docs/PERFORMANCE.md for the measured closure.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipPlan:
    """Dedup plan for a dense per-timestep clip table.

    unique_frames: [Nf] sorted original frame numbers (upload order).
    clip_idx:      [T, F] indices into ``unique_frames`` per clip.
    pairs:         [P, pt] unique temporal-kernel groups, as indices
                   into ``unique_frames``.
    pair_idx:      [T, F/pt] indices into ``pairs`` per clip.
    """

    unique_frames: np.ndarray
    clip_idx: np.ndarray
    pairs: np.ndarray
    pair_idx: np.ndarray

    @property
    def frame_dedup(self) -> float:
        """Pixels uploaded naive / frame-bank."""
        return self.clip_idx.size / max(len(self.unique_frames), 1)

    @property
    def pair_dedup(self) -> float:
        """Pair embeds computed naive / deduped."""
        return self.pair_idx.size / max(len(self.pairs), 1)


def build_clip_plan(clip_frames: np.ndarray, tubelet: int = 2) -> ClipPlan:
    """clip_frames: [T, F] integer frame numbers of every timestep's clip
    (any sampler — ``omnivore_frame_indices`` rows, uniform stride, ...).
    Pairs are formed exactly as the backbone's VALID temporal conv
    groups them: (f_0, f_1), (f_2, f_3), ... within each clip."""
    clip_frames = np.asarray(clip_frames)
    t, f = clip_frames.shape
    if f % tubelet:
        raise ValueError(f"clip length {f} not divisible by tubelet "
                         f"{tubelet}")
    uniq, inv = np.unique(clip_frames, return_inverse=True)
    clip_idx = inv.reshape(t, f).astype(np.int32)
    grouped = clip_idx.reshape(t * (f // tubelet), tubelet)
    pairs, pinv = np.unique(grouped, axis=0, return_inverse=True)
    pair_idx = pinv.reshape(t, f // tubelet).astype(np.int32)
    return ClipPlan(uniq, clip_idx, pairs.astype(np.int32), pair_idx)


def _pad_rows(x: np.ndarray, batch: int) -> np.ndarray:
    pad = (-len(x)) % batch
    if pad:
        x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
    return x


# Jitted appliers cached on (module, apply-kwargs): flax modules hash by
# their config fields, so repeated extract calls (one per video in a
# production sweep) reuse the compiled program instead of paying a
# retrace + relay compile round-trip each time (measured: a fresh
# @jax.jit per call made the gather path SLOWER than naive).
def _ident(x):
    return x


@functools.lru_cache(maxsize=32)
def _jit_full(model, kw_items, tf=_ident):
    import jax

    @jax.jit
    def fwd(variables, clips):
        return model.apply(variables, tf(clips), **dict(kw_items))
    return fwd


@functools.lru_cache(maxsize=32)
def _jit_gather_full(model, kw_items, tf=_ident):
    import jax

    @jax.jit
    def fwd(variables, bank, idx):
        return model.apply(variables, tf(bank[idx]), **dict(kw_items))
    return fwd


@functools.lru_cache(maxsize=32)
def _jit_embed(model, kw_items, tf=_ident):
    import jax

    @jax.jit
    def embed(variables, bank, pidx):
        out = model.apply(variables, tf(bank[pidx]), embed_only=True,
                          **dict(kw_items))
        return out[:, 0]
    return embed


@functools.lru_cache(maxsize=32)
def _jit_trunk(model, kw_items):
    import jax

    @jax.jit
    def trunk(variables, bank, pidx):
        return model.apply(variables, bank[pidx], embedded=True,
                           **dict(kw_items))
    return trunk


# Single-dispatch variants: the WHOLE per-video extraction is one jit
# call — jax.lax.map over [n_chunks, batch] index chunks with the frame
# bank resident in HBM, features fetched once as [n_chunks, batch, D].
# Removes the per-batch dispatch+fetch round-trips (~30 ms relay RTT
# each, CLAUDE.md) that dominate the per-batch path on this host; math
# and batch grouping are identical.
@functools.lru_cache(maxsize=32)
def _jit_gather_scan(model, kw_items, tf=_ident):
    import jax

    @jax.jit
    def fwd(variables, bank, idx_chunks):        # [Nc, B, F]
        def body(idx):
            return model.apply(variables, tf(bank[idx]),
                               **dict(kw_items))
        return jax.lax.map(body, idx_chunks)
    return fwd


@functools.lru_cache(maxsize=32)
def _jit_embed_scan(model, kw_items, tf=_ident):
    import jax

    @jax.jit
    def embed(variables, bank, pidx_chunks):     # [Nc, B, pt]
        def body(pidx):
            out = model.apply(variables, tf(bank[pidx]),
                              embed_only=True, **dict(kw_items))
            return out[:, 0]
        return jax.lax.map(body, pidx_chunks)
    return embed


@functools.lru_cache(maxsize=32)
def _jit_trunk_scan(model, kw_items):
    import jax

    @jax.jit
    def trunk(variables, bank, pidx_chunks):     # [Nc, B, F/pt]
        def body(pidx):
            return model.apply(variables, bank[pidx], embedded=True,
                               **dict(kw_items))
        return jax.lax.map(body, pidx_chunks)
    return trunk


def _chunk_rows(x: np.ndarray, batch: int) -> np.ndarray:
    """[N, ...] -> [ceil(N/batch), batch, ...] (last chunk padded by
    repeating the final row — same padding as ``_pad_rows``)."""
    x = _pad_rows(x, batch)
    return x.reshape(len(x) // batch, batch, *x.shape[1:])


@dataclasses.dataclass(frozen=True)
class _StreamStep:
    """One batch of the incremental stream plan (all fixed-shape).

    new_rows:  [cap_new] global frame rows to UPLOAD this step (only
               frames not already on device; padded by repetition).
    idx:       [B, F] gather positions into the step's device bank
               (= concat(tail, new)).
    tail_sel:  [cap_tail] positions in this bank of the rows the NEXT
               step reuses (carried device-to-device, never re-uploaded).
    """

    new_rows: np.ndarray
    idx: np.ndarray
    tail_sel: np.ndarray


def _stream_plan(clip_idx: np.ndarray, batch: int):
    """Incremental per-batch plan for ``mode="stream"``: each batch's
    bank is concat(previous tail carried ON DEVICE, newly uploaded
    rows), so transfers overlap compute and — for monotone
    sliding-window tables, the dense serving geometry — every unique
    frame crosses host->device exactly once. Dedup is only against the
    IMMEDIATELY PRECEDING batch: a frame gapped across non-adjacent
    batches (exotic samplers) re-uploads, and padded slots ship one
    duplicate row each; results stay exact either way. Shapes are
    padded to the max across batches -> one compiled program. Returns
    (cap_tail, steps)."""
    idx = _pad_rows(clip_idx, batch)
    nb = len(idx) // batch
    uniq_per = [np.unique(idx[i * batch:(i + 1) * batch])
                for i in range(nb)]
    tails, news = [], []
    prev: set = set()
    for u in uniq_per:
        in_prev = np.asarray([r for r in u if r in prev], dtype=u.dtype)
        tails.append(in_prev)
        news.append(np.setdiff1d(u, in_prev))
        prev = set(u.tolist())
    cap_tail = max((len(t) for t in tails), default=0)
    cap_new = max(len(n) for n in news)

    steps = []
    for k in range(nb):
        pad_row = (tails[k][-1:] if len(tails[k]) else news[k][:1])
        new_rows = np.concatenate(
            [news[k], np.repeat(pad_row, cap_new - len(news[k]))])
        # positions of ACTUAL rows only — padded tail/new slots hold
        # duplicate (or, at step 0, zero-filled) content and must never
        # shadow a real row's position
        pos = {int(r): p for p, r in enumerate(tails[k])}
        for p, r in enumerate(news[k]):
            pos[int(r)] = cap_tail + p
        cur = idx[k * batch:(k + 1) * batch]
        step_idx = np.vectorize(pos.__getitem__)(cur).astype(np.int32)
        if k + 1 < nb:
            nxt = tails[k + 1]
            sel = np.asarray([pos[r] for r in nxt.tolist()], np.int32)
            sel = np.concatenate(
                [sel, np.zeros(cap_tail - len(sel), np.int32)])
        else:
            sel = np.zeros((cap_tail,), np.int32)
        steps.append(_StreamStep(new_rows, step_idx, sel))
    return cap_tail, steps


@functools.lru_cache(maxsize=32)
def _jit_stream_step(model, kw_items, tf=_ident):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(variables, tail, new, idx, tail_sel):
        bank = jnp.concatenate([tail, new])
        feats = model.apply(variables, tf(bank[idx]), **dict(kw_items))
        return feats, bank[tail_sel]
    return step


@functools.lru_cache(maxsize=8)
def uint8_normalizer(mean: Optional[tuple] = None,
                     std: Optional[tuple] = None,
                     dtype: str = "bfloat16") -> Callable:
    """``frame_transform`` for uint8 frame banks: /255, ImageNet
    normalize, cast — on device. Ship the bank as uint8 and this halves
    the host->device bytes vs bf16 (4x vs fp32) on the bandwidth-bound
    dense path; the normalize fuses into the backbone's first conv.
    lru-cached so repeated calls return the SAME function object (the
    jitted appliers key their cache on transform identity). Defaults to
    the shared clip-preprocessing constants (``extract/pipeline.py``
    OMNIVORE_MEAN/STD) so serving can never silently diverge from the
    offline extraction path."""
    import jax.numpy as jnp

    from tim_tpu.extract.pipeline import OMNIVORE_MEAN, OMNIVORE_STD

    m = OMNIVORE_MEAN if mean is None else np.asarray(mean, np.float32)
    s = OMNIVORE_STD if std is None else np.asarray(std, np.float32)

    def tf(clips):
        x = clips.astype(jnp.float32) / 255.0
        x = (x - m) / s
        return x.astype(jnp.dtype(dtype))
    return tf


def extract_dense_visual(
    model,
    variables,
    frames,                      # [Nf, H, W, 3] unique frames (host or dev)
    plan: ClipPlan,
    *,
    batch_size: int = 8,
    mode: str = "pair_embed",  # pair_embed | gather | stream | naive
    embed_batch: int = 64,
    pad_batches: bool = True,
    dispatch: str = "per_batch",  # "per_batch" | "scan"
    frame_transform: Optional[Callable] = None,
    apply_kwargs: Optional[dict] = None,
) -> np.ndarray:
    """[T, D] features for every timestep clip, computed overlap-aware.

    ``gather``: frame bank in HBM, clips assembled on device, full
    backbone forward — exact trivially (same pixels).
    ``pair_embed``: additionally embeds each unique frame pair once and
    runs the trunk from the gathered pair-embed bank — exact because the
    embed conv has no cross-pair coupling (tested vs the naive path).
    ``stream``: gather from per-batch MINI-banks uploaded as each batch
    dispatches, so the next batch's transfer overlaps this batch's
    compute (vs the serial full-bank upload of ``gather``). Same
    features; ~25% duplicate boundary bytes.
    ``naive``: assemble clips on the HOST and upload each in full (the
    detect_video_media behavior) — the A/B baseline.

    ``dispatch="scan"`` runs the whole extraction as ONE jit call per
    stage (``lax.map`` over batch chunks, single fetch) instead of one
    dispatch+fetch per batch — same batches, same math. Measured
    NEUTRAL-to-slightly-negative end-to-end (37.1 vs 35.3 s serve run):
    jax's async dispatch already overlaps each batch's fetch with the
    next batch's compute, so the per-call round-trips the scan removes
    were not on the critical path. Kept opt-in; ``naive`` always
    dispatches per batch (its clips upload from host).

    ``frame_transform`` (a jittable fn on [..., H, W, 3] clips) runs
    ON DEVICE after the bank gather / clip upload, before the backbone.
    The production use is shipping the frame bank as uint8 and
    normalizing device-side — the path is host->device-bandwidth-bound
    (docs/PERFORMANCE.md), so halving the uploaded bytes is the lever,
    and normalization is a fused elementwise epilogue on TPU. Must be a
    stable (module-level) function so the jit cache keys on identity.
    """
    import jax
    import jax.numpy as jnp

    kw = apply_kwargs or {}
    kw_items = tuple(sorted(kw.items()))
    tf = frame_transform if frame_transform is not None else _ident
    if dispatch not in ("scan", "per_batch"):
        raise ValueError(f"unknown dispatch {dispatch!r}")
    scan = dispatch == "scan"
    t = len(plan.clip_idx)
    feats = []

    if mode == "naive":
        host_frames = np.asarray(frames)
        fwd = _jit_full(model, kw_items, tf)
        idx = _pad_rows(plan.clip_idx, batch_size) if pad_batches \
            else plan.clip_idx
        for i in range(0, len(idx), batch_size):
            clips = host_frames[idx[i:i + batch_size]]
            feats.append(np.asarray(fwd(variables, jnp.asarray(clips))))
        return np.concatenate(feats)[:t]

    if mode == "stream":
        # Incremental mini-banks, uploaded as each batch is dispatched:
        # jax's async dispatch lets batch k+1's host->device transfer
        # overlap batch k's compute, and the frames adjacent batches
        # share ride along as the previous bank's tail (device-to-
        # device) — for sliding-window tables each unique frame crosses
        # the link exactly once (see _stream_plan for the caveats).
        host_frames = np.asarray(frames)
        step = _jit_stream_step(model, kw_items, tf)
        cap_tail, steps = _stream_plan(plan.clip_idx, batch_size)
        tail = jnp.zeros((cap_tail,) + host_frames.shape[1:],
                         host_frames.dtype)
        for s in steps:
            f, tail = step(variables,
                           tail, jnp.asarray(host_frames[s.new_rows]),
                           jnp.asarray(s.idx), jnp.asarray(s.tail_sel))
            feats.append(f)
        return np.concatenate(
            [np.asarray(f) for f in feats])[:t]

    dev_frames = jnp.asarray(frames)

    if mode == "gather":
        if scan:
            out = _jit_gather_scan(model, kw_items, tf)(
                variables, dev_frames,
                jnp.asarray(_chunk_rows(plan.clip_idx, batch_size)))
            return np.asarray(out).reshape(-1, *out.shape[2:])[:t]
        fwd = _jit_gather_full(model, kw_items, tf)
        idx = _pad_rows(plan.clip_idx, batch_size) if pad_batches \
            else plan.clip_idx
        for i in range(0, len(idx), batch_size):
            feats.append(np.asarray(
                fwd(variables, dev_frames,
                    jnp.asarray(idx[i:i + batch_size]))))
        return np.concatenate(feats)[:t]

    if mode != "pair_embed":
        raise ValueError(f"unknown mode {mode!r}")

    # [b, pt, H, W, 3] -> [b, 1, h, w, C] -> [b, h, w, C] pair embeds
    if scan:
        chunks = _jit_embed_scan(model, kw_items, tf)(
            variables, dev_frames,
            jnp.asarray(_chunk_rows(plan.pairs, embed_batch)))
        embed_bank = chunks.reshape(-1, *chunks.shape[2:])[
            :len(plan.pairs)]
        out = _jit_trunk_scan(model, kw_items)(
            variables, embed_bank,
            jnp.asarray(_chunk_rows(plan.pair_idx, batch_size)))
        return np.asarray(out).reshape(-1, *out.shape[2:])[:t]

    embed = _jit_embed(model, kw_items, tf)
    prows = _pad_rows(plan.pairs, embed_batch)
    embeds = []
    for i in range(0, len(prows), embed_batch):
        embeds.append(embed(variables, dev_frames,
                            jnp.asarray(prows[i:i + embed_batch])))
    embed_bank = jnp.concatenate(embeds)[:len(plan.pairs)]

    # [b, F/pt, h, w, C] assembled clip embedding -> trunk
    trunk = _jit_trunk(model, kw_items)
    idx = _pad_rows(plan.pair_idx, batch_size) if pad_batches \
        else plan.pair_idx
    for i in range(0, len(idx), batch_size):
        feats.append(np.asarray(
            trunk(variables, embed_bank,
                  jnp.asarray(idx[i:i + batch_size]))))
    return np.concatenate(feats)[:t]
