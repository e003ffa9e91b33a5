"""Device-resident frame encode step (search stage) + multi-chip sharding.

The jittable "forward step" of the encoder: for every superblock of a frame
batch, run the open-loop intra mode search, transform+quantize the best-mode
residual, and reconstruct — all on device. The host commit pass consumes the
chosen modes and re-codes with exact recon-edge prediction (wavefront), so
this stage carries the FLOPs while the host carries the serial context.

Multi-chip: frames shard over the data axis ('data') and superblock rows
over the spatial axis ('sp') of a jax.sharding.Mesh — the P2/P3 axes of
SURVEY.md §2.2 (picture parallelism / segment wavefront analog). Cross-shard
reduction (frame distortion stats for rate control) rides a psum over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svt_av1_psy_tpu.constants import TxSize, TxType
from svt_av1_psy_tpu.ops import jax_backend as jb
from svt_av1_psy_tpu.ops.quant import build_plane_quant

SB = 64


def make_frame_step(qindex: int = 60, bd: int = 8):
    """Build the single-chip jittable frame step: y (B, H, W) int32 ->
    (best_modes (B, N), qcoeff (B, N, 32, 32), distortion (B,))."""
    pq = build_plane_quant(qindex, bd=bd)

    def step(y: jnp.ndarray):
        def one(frame):
            costs, best = jb.sb_mode_costs(frame, SB, bd)
            H, W = frame.shape
            n = (H // SB) * (W // SB)
            above, left, al, ha, hl = jb._gather_sb_edges(
                frame.astype(jnp.int32), SB, bd)
            preds = jb.predict_modes_batch(above, left, al, ha, hl, SB, SB, bd)
            sel = preds[jnp.arange(n), best]                 # (N, SB, SB)
            blocks = frame.astype(jnp.int32).reshape(
                H // SB, SB, W // SB, SB).transpose(0, 2, 1, 3).reshape(
                n, SB, SB)
            resid = blocks - sel
            coeff = jb.forward_transform_batch(
                resid, int(TxSize.TX_64X64), int(TxType.DCT_DCT), bd)
            qc, dqc = jb.quantize_b_batch(coeff, int(TxSize.TX_64X64), pq)
            rec = jb.inverse_transform_add_batch(
                dqc, sel, int(TxSize.TX_64X64), int(TxType.DCT_DCT), bd)
            dist = ((blocks - rec) ** 2).sum()
            return best, qc, dist

        best, qc, dist = jax.vmap(one)(y)
        return best, qc, dist

    return step


def make_sharded_frame_step(mesh: Mesh, qindex: int = 60, bd: int = 8):
    """Multi-chip step: frame batch over 'data', SB rows over 'sp'.

    Each shard searches its SB rows independently (open-loop stages are
    embarrassingly parallel across the picture, SURVEY.md §2.2 P2/P3); the
    frame-level distortion stat is psum'd across 'sp' so every shard holds
    the rate-control input (the all-gather of per-SB RC stats in §5)."""
    from jax.experimental.shard_map import shard_map

    pq = build_plane_quant(qindex, bd=bd)

    def shard_fn(y):  # y: (B_local, H_local, W) — SB rows sharded over H
        def one(frame):
            costs, best = jb.sb_mode_costs(frame, SB, bd)
            H, W = frame.shape
            n = (H // SB) * (W // SB)
            above, left, al, ha, hl = jb._gather_sb_edges(
                frame.astype(jnp.int32), SB, bd)
            preds = jb.predict_modes_batch(above, left, al, ha, hl, SB, SB, bd)
            sel = preds[jnp.arange(n), best]
            blocks = frame.astype(jnp.int32).reshape(
                H // SB, SB, W // SB, SB).transpose(0, 2, 1, 3).reshape(
                n, SB, SB)
            resid = blocks - sel
            coeff = jb.forward_transform_batch(
                resid, int(TxSize.TX_64X64), int(TxType.DCT_DCT), bd)
            qc, _ = jb.quantize_b_batch(coeff, int(TxSize.TX_64X64), pq)
            nz = (qc != 0).sum()
            dist = (resid ** 2).sum()
            return best, nz, dist

        best, nz, dist = jax.vmap(one)(y)
        # frame stats reduced across the spatial axis (ICI psum)
        nz = jax.lax.psum(nz, axis_name="sp")
        dist = jax.lax.psum(dist, axis_name="sp")
        return best, nz, dist

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=P("data", "sp", None),
        out_specs=(P("data", "sp"), P("data"), P("data")))
