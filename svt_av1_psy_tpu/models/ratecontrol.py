"""Rate control: CRF (fixed base q with frame-type offsets) and a
one-pass ABR controller.

The reference implements multi-pass VBR/CBR with TPL model feedback
(ref Source/Lib/Codec/rate_control_process.c); this is the round-1
skeleton: CRF with key-frame boost, plus a proportional-integral ABR
loop over a simple bits = c / qstep model.
"""
from __future__ import annotations

from dataclasses import dataclass

from svt_av1_psy_tpu.ops.quant import dc_q


@dataclass
class RateControl:
    mode: str = "crf"              # "crf" | "abr"
    base_qindex: int = 100
    target_bits_per_frame: float = 0.0
    key_boost: int = 18            # qindex reduction for key frames
    p_offset: int = 8              # qindex increase for P frames

    def __post_init__(self):
        self._model_c = None       # bits * qstep estimate
        self._int_err = 0.0
        self._q = float(self.base_qindex)

    def frame_qindex(self, frame_index: int, is_key: bool) -> int:
        if self.mode == "crf":
            q = self.base_qindex - (self.key_boost if is_key
                                    else -self.p_offset)
            return max(1, min(255, q))
        q = self._q - (self.key_boost if is_key else 0)
        return max(1, min(255, int(round(q))))

    def update(self, qindex: int, bits: int) -> None:
        """Post-frame feedback (ABR only)."""
        if self.mode != "abr" or self.target_bits_per_frame <= 0:
            return
        qstep = dc_q(qindex, 8) / 8.0
        c = bits * qstep
        self._model_c = c if self._model_c is None else \
            0.7 * self._model_c + 0.3 * c
        # choose q so that model_c / qstep == target
        want_qstep = self._model_c / self.target_bits_per_frame
        # invert dc_q approximately by scanning (256 entries, cheap)
        best, bestd = self.base_qindex, 1e18
        for q in range(1, 256):
            d = abs(dc_q(q, 8) / 8.0 - want_qstep)
            if d < bestd:
                best, bestd = q, d
        err = bits / self.target_bits_per_frame - 1.0
        self._int_err = max(-0.5, min(0.5, self._int_err + 0.1 * err))
        self._q = max(1.0, min(255.0, best + 24.0 * self._int_err))
