"""Random-access mini-GoP pyramid driver (fast path).

Implements the reference's hierarchical random-access prediction
structure (ref Source/Lib/Codec/pd_process.c picture-decision GoP
typing, pred_structure.c pyramid layers, packetization_process.c
decode-order packet emission) the TPU-native way: the pyramid is pure
host-side control flow over the existing single-ref device-search +
native-commit inter path — each frame picks ONE reference frame-level
(nearest coded past or future anchor, chosen by subsampled SAD), hidden
anchors are emitted with show_frame=0 and displayed later through
show_existing_frame TUs.

Decode-order emission for a 4-GoP (base b, anchors hidden `h`,
leaves shown `s`):   [b+4 h] [b+2 h] [b+1 s] [SE b+2] [b+3 s] [SE b+4]
which displays b+1, b+2, b+3, b+4 in order — the standard AV1 RA
packing.

DPB slot management: base + the recursion stack of live anchors
(max pyramid depth + 1 slots of the 8); slots are allocated from a
free pool and released when both half-GoPs under an anchor are done.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class RaPacket:
    """One temporal unit in decode order.

    display_idx: display position this TU *shows* (-1 for hidden coded
    frames); recon: clipped recon planes of the shown frame (None for
    hidden TUs)."""
    payload: bytes
    display_idx: int
    recon: tuple | None


class RaDriver:
    """Buffers a mini-GoP of source frames and encodes it out of order.

    push() returns the finished packets whenever a full GoP (or a forced
    key boundary) completes; flush() closes the tail GoP.
    """

    def __init__(self, enc, gop_levels: int = 4, keyint: int = 0,
                 tf_strength: int = 0, dynamic_gop: bool = False):
        enc.ra_mode = True
        self.enc = enc
        self.levels = max(1, min(gop_levels, 5))
        self.M = 1 << self.levels
        self.keyint = keyint          # key every N displayed frames (0 =
                                      # first frame only)
        self.tf_strength = tf_strength
        # dynamic mini-GoP (ref Docs/Appendix-Dynamic-Mini-GoP +
        # pd_process.c GoP typing): close the group early at a
        # power-of-two size when the buffered motion is high — long
        # pyramids only pay off when anchors predict the leaves
        self.dynamic_gop = dynamic_gop
        self.dyn_threshold = 12.0     # mean |diff|/px (8-bit units)
        self._mads = []
        self._dyn_prev = None
        self._buf = []                # [(display_idx, (y, u, v))]
        self._next_display = 0
        self._base_slot = 0
        self._base_display = -1
        self._recon_by_display = {}

    # -- q ladder (ref rc_process.c RA qindex offsets + PSY
    #    qp-scale-compress weights) ---------------------------------------
    #
    # Measured on the synthetic BD clips (33f cif, 4 CRFs, vs the
    # reference's p8 RA): a flat ladder + small ARF boost gives +14.6%
    # BD-rate while steeper per-layer spreads lose 20-90% — without
    # TPL-style boost statistics, pushing leaf q up quantizes away
    # exactly the residual detail the anchors cannot predict. The
    # layer_spread knob re-enables a spread (scaled by PSY
    # qp-scale-compress); tpl_strength > 0 replaces the whole ladder
    # with the measured r0/beta per-frame q from the GoP dependency
    # flow (models/tpl.tpl_gop_q; ref rc_process.c:873).
    layer_spread = 0.0
    tpl_strength = 0.0

    def _layer_q(self, depth: int) -> int:
        q = self.enc.qindex
        if depth == 0:                # ARF: boosted, everything refs it
            return max(0, q - q // 16)
        if not self.layer_spread:
            return q
        qsc = 1.0 / (1.0 + 0.5 * self.enc.qp_scale_compress_strength)
        return int(np.clip(round(q * (1 + self.layer_spread * depth *
                                      qsc)), 0, 255))

    def _is_key(self, d: int) -> bool:
        if d == 0:
            return True
        return self.keyint > 0 and d % self.keyint == 0

    # -- public api --------------------------------------------------------
    def push(self, y, u, v) -> list[RaPacket]:
        d = self._next_display
        self._next_display += 1
        out = []
        # scene-change detection in picture decision (ref
        # pic_analysis_process.c scene_change_detection feeding
        # pd_process GoP typing): a cut closes the pending mini-GoP at
        # its buffered tail and re-keys on the cut frame
        cut = getattr(self.enc, "enable_scenecut", False) and \
            self.enc._is_scene_cut(y)
        if getattr(self.enc, "enable_scenecut", False):
            self.enc._prev_src_y = np.asarray(y)[::2, ::2].astype(np.int32)
        if self._is_key(d) or cut:
            # close the pending GoP at the buffered tail, then key
            out.extend(self._encode_gop())
            out.append(self._encode_base_key(d, (y, u, v)))
            return out
        self._buf.append((d, (y, u, v)))
        if self.dynamic_gop:
            cur = np.asarray(y)[::4, ::4].astype(np.int32)
            bd_sh = getattr(self.enc, "bd", 8) - 8
            if self._dyn_prev is not None:
                self._mads.append(
                    float(np.abs(cur - self._dyn_prev).mean()) /
                    (1 << bd_sh))
            self._dyn_prev = cur
            n = len(self._buf)
            if n < self.M and n in (2, 4, 8, 16) and self._mads:
                window = self._mads[-n:]
                if sum(window) / len(window) > self.dyn_threshold:
                    out.extend(self._encode_gop())
                    return out
        if len(self._buf) >= self.M:
            out.extend(self._encode_gop())
        return out

    def flush(self) -> list[RaPacket]:
        return self._encode_gop()

    # -- internals ---------------------------------------------------------
    def _encode_base_key(self, d: int, fuv) -> RaPacket:
        y, u, v = fuv
        if self.tf_strength and self._buf:
            from svt_av1_psy_tpu.models.temporal_filter import \
                temporal_filter
            from svt_av1_psy_tpu.utils.trace import stage as _tstage
            win = [f for _, f in self._buf[-2:]] + [(y, u, v)]
            with _tstage("temporal_filter"):
                y, u, v = temporal_filter(win, len(win) - 1,
                                          strength=self.tf_strength)
        f = self.enc._encode_key(y, u, v, order_hint=d)
        self._base_slot = 0
        self._base_display = d
        self._recon_by_display[d] = (f.recon_y, f.recon_u, f.recon_v)
        return RaPacket(f.payload, d, (f.recon_y, f.recon_u, f.recon_v))

    def _free_slots(self, in_use):
        return [s for s in range(8) if s not in in_use]

    def _encode_inter(self, d, fuv, ref_slot, refresh, show, depth,
                      ref_slot2=None):
        tq = self._tpl_q.get(d) if getattr(self, "_tpl_q", None) else None
        ra = {"ref_slot": ref_slot, "refresh": refresh,
              "order_hint": d, "show": show, "layer": depth,
              "base_q": self._layer_q(depth) if tq is None else tq,
              "ref_slot2": ref_slot2}
        pre = getattr(self, "_pre_by_d", None)
        if pre:
            ra["pre"] = pre.pop(d, None)
        y, u, v = fuv
        f = self.enc._encode_p(y, u, v, ra=ra)
        self._recon_by_display[d] = (f.recon_y, f.recon_u, f.recon_v)
        return f

    # -- GoP-batched device search ----------------------------------------
    def _gop_device_search(self, b, arf_d, frames, arf_src, plan):
        """Run the whole mini-GoP's device work as ONE jitted dispatch
        (ops/jax_backend.gop_search): per-frame intra decision maps plus
        hierarchical full-pel ME for every prediction edge of the plan —
        the open-loop ME-process model of the reference (ref
        me_process.c: ME runs on source pictures before the closed loop;
        the commit walk polishes subpel against the true recon).

        Returns ({display -> pre dict for _encode_p},
                 {(display, ref_display) -> (mv16, sad16)})."""
        import jax.numpy as jnp

        from svt_av1_psy_tpu.models.fast_intra import (_host_copy_async,
                                                       _jitted_gop_search)
        from svt_av1_psy_tpu.models.intra_encoder import _pad_to
        from svt_av1_psy_tpu.ops.jax_backend import gop_search_unpack
        from svt_av1_psy_tpu.ops.quant import ac_q

        enc = self.enc
        pah, paw = enc.pah, enc.paw
        ds = [b] + [p[0] for p in plan]
        idx = {d: i for i, d in enumerate(ds)}
        fmax = self.M + 1
        emax = 2 * self.M
        dtype = np.uint8 if enc.bd == 8 else np.uint16
        planes = np.zeros((fmax, pah, paw), dtype)
        planes[0] = enc._dpb[self._base_slot][0][:pah, :paw].astype(dtype)
        self._gop_padded = {}
        for d, *_ in plan:
            src_y = arf_src[0] if d == arf_d else frames[d][0]
            p = _pad_to(np.asarray(src_y), pah, paw).astype(dtype)
            planes[idx[d]] = p
            self._gop_padded[d] = p
        edge_keys = []
        edges = np.zeros((emax, 2), np.int32)
        for d, lo, hi, *_ in plan:
            for r in ((lo,) if hi == lo else (lo, hi)):
                edges[len(edge_keys)] = (idx[d], idx[r])
                edge_keys.append((d, r))
        bias = np.int32(8 * ac_q(enc.qindex, enc.bd))
        from svt_av1_psy_tpu.utils.trace import stage as _tstage
        with _tstage("gop_upload"):
            planes_dev = jnp.asarray(planes)
            planes_dev.block_until_ready()
        with _tstage("gop_search_compute"):
            out = _jitted_gop_search()(planes_dev, jnp.asarray(edges),
                                       jnp.asarray(bias), enc.bd,
                                       enc.min_block)
            out.block_until_ready()
        with _tstage("gop_fetch"):
            _host_copy_async(out)
            buf = np.asarray(out)
        mv, sad, dec = gop_search_unpack(buf, fmax, emax, (pah, paw))
        edge_ms = {k: (mv[i], sad[i]) for i, k in enumerate(edge_keys)}
        pre_by_d = {}
        for d, lo, hi, *_ in plan:
            entry = {"decide": enc._decide_finish(dec[idx[d]]),
                     "mv16": np.clip(edge_ms[(d, lo)][0], -127,
                                     127).astype(np.int16)}
            if hi != lo:
                entry["mv16b"] = np.clip(edge_ms[(d, hi)][0], -127,
                                         127).astype(np.int16)
            pre_by_d[d] = entry
        return pre_by_d, edge_ms

    def _encode_gop(self) -> list[RaPacket]:
        buf, self._buf = self._buf, []
        self._mads = []
        self._tpl_q = None
        if not buf:
            return []
        frames = dict(buf)            # display -> (y,u,v)
        b = self._base_display
        arf_d = buf[-1][0]
        packets: list[RaPacket] = []
        in_use = {self._base_slot}

        if len(buf) == 1:
            # degenerate GoP: one shown P off the base
            plan = [(arf_d, b, b, 1)]
            self._pre_by_d, _ = self._gop_device_search(
                b, arf_d, frames, frames[arf_d], plan)
            slot = self._free_slots(in_use)[0]
            f = self._encode_inter(arf_d, frames[arf_d], self._base_slot,
                                   1 << slot, True, 1)
            packets.append(RaPacket(f.payload, arf_d,
                                    self._recon_by_display[arf_d]))
            self._base_slot, self._base_display = slot, arf_d
            return packets

        # ARF: temporal-filtered hidden anchor at the GoP end
        arf_src = frames[arf_d]
        if self.tf_strength:
            from svt_av1_psy_tpu.models.temporal_filter import \
                temporal_filter
            from svt_av1_psy_tpu.utils.trace import stage as _tstage
            win = [frames[dd] for dd in sorted(frames) if dd >= arf_d - 2]
            with _tstage("temporal_filter"):
                arf_src = temporal_filter(win, len(win) - 1,
                                          strength=self.tf_strength)
        arf_slot = self._free_slots(in_use)[0]
        in_use.add(arf_slot)

        # one device dispatch for the whole GoP: decide maps + edge HME
        plan = self._tpl_plan(b, arf_d)
        self._pre_by_d, edge_ms = self._gop_device_search(
            b, arf_d, frames, arf_src, plan)

        # TPL r0/beta: per-frame q from the GoP dependency flow
        # (ref tpl_model.c tpl_mc_flow; rc_process.c:873 generate_r0beta),
        # fed from the SAME device HME results the walks consume
        self._tpl_q = None
        if self.tpl_strength > 0:
            from svt_av1_psy_tpu.models.tpl import tpl_gop_q
            fy = dict(self._gop_padded)
            fy[b] = np.asarray(
                self.enc._dpb[self._base_slot][0])[:self.enc.pah,
                                                   :self.enc.paw]
            self._tpl_q = tpl_gop_q(fy, plan, self.enc.qindex,
                                    bd=getattr(self.enc, "bd", 8),
                                    strength=self.tpl_strength,
                                    edge_results=edge_ms)

        f = self._encode_inter(arf_d, arf_src, self._base_slot,
                               1 << arf_slot, False, 0)
        packets.append(RaPacket(f.payload, -1, None))

        self._rec_pyramid(b, arf_d, self._base_slot, arf_slot, 1,
                          frames, packets, in_use)

        from svt_av1_psy_tpu.bitstream.headers import \
            show_existing_temporal_unit
        packets.append(RaPacket(show_existing_temporal_unit(arf_slot),
                                arf_d, self._recon_by_display[arf_d]))
        in_use.discard(self._base_slot)
        self._base_slot, self._base_display = arf_slot, arf_d
        return packets

    def _tpl_plan(self, b, arf_d):
        """Encode-order (display, lo_ref, hi_ref, depth) tuples mirroring
        _rec_pyramid's frame-level reference choices (references always
        precede their dependents — the property tpl_gop_q's backward
        induction relies on)."""
        plan = [(arf_d, b, b, 0)]

        def rec(lo, hi, depth):
            if hi - lo < 2:
                return
            mid = (lo + hi) // 2
            plan.append((mid, lo, hi, depth))
            rec(lo, mid, depth + 1)
            rec(mid, hi, depth + 1)

        rec(b, arf_d, 1)
        return plan

    def _rec_pyramid(self, lo, hi, lo_slot, hi_slot, depth, frames,
                     packets, in_use):
        if hi - lo < 2:
            return
        mid = (lo + hi) // 2
        # bidirectional: LAST = past anchor, ALTREF = future anchor
        # (compound NEAREST/NEW pairs + skip_mode in the walk)
        ref, ref2 = lo_slot, (hi_slot if hi_slot != lo_slot else None)
        if hi - lo == 2:
            # leaf: shown in its own TU, never referenced
            f = self._encode_inter(mid, frames[mid], ref, 0, True, depth,
                                   ref_slot2=ref2)
            packets.append(RaPacket(f.payload,
                                    mid, self._recon_by_display[mid]))
            return
        mid_slot = self._free_slots(in_use)[0]
        in_use.add(mid_slot)
        f = self._encode_inter(mid, frames[mid], ref, 1 << mid_slot,
                               False, depth, ref_slot2=ref2)
        packets.append(RaPacket(f.payload, -1, None))
        self._rec_pyramid(lo, mid, lo_slot, mid_slot, depth + 1, frames,
                          packets, in_use)
        from svt_av1_psy_tpu.bitstream.headers import \
            show_existing_temporal_unit
        packets.append(RaPacket(show_existing_temporal_unit(mid_slot),
                                mid, self._recon_by_display[mid]))
        self._rec_pyramid(mid, hi, mid_slot, hi_slot, depth + 1, frames,
                          packets, in_use)
        in_use.discard(mid_slot)
