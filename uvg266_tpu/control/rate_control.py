"""Rate control: lambda-domain R-lambda model with per-GOP bit allocation.

The classic algorithm of the reference's default RC path
(/root/reference/src/rate_control.c: uvg_set_picture_lambda_and_qp:1027,
gop_allocate_bits, update_parameters via uvg_update_after_picture:919):
  lambda = alpha * bpp^beta, qp = 4.2005*ln(lambda) + 13.7122
with multiplicative alpha / additive beta adaptation from the realized
bits per picture and a smoothing window for buffer feedback.
(The OBA cubic-solver variant, rate_control.c:492, is a later addition.)
"""
from __future__ import annotations

import math

from ..gop import get_gop_config

SMOOTHING_WINDOW = 40
MIN_LAMBDA = 0.1
MAX_LAMBDA = 10000.0


def lambda_to_qp(lam: float) -> int:
    return max(0, min(51, int(round(4.2005 * math.log(lam) + 13.7122))))


class RateControl:
    def __init__(self, cfg, ctrl):
        self.cfg = cfg
        self.ctrl = ctrl
        self.enabled = cfg.target_bitrate > 0
        if not self.enabled:
            return
        self.pels = ctrl.in_width * ctrl.in_height
        fps = cfg.framerate_num / max(1, cfg.framerate_denom)
        self.bits_per_pic = cfg.target_bitrate / fps
        # R-lambda model state per layer (0 = intra)
        self.alpha = {i: 3.2003 for i in range(8)}
        self.beta = {i: -1.367 for i in range(8)}
        self.bits_budget = 0.0       # rolling over/under-spend
        self.frames_coded = 0
        gop = get_gop_config(cfg)
        if gop:
            self.weights = {e.poc_offset: 1.0 / (1 + 0.5 * (e.layer - 1))
                            for e in gop}
            self.avg_weight = sum(self.weights.values()) / len(self.weights)
        else:
            self.weights = {}
            self.avg_weight = 1.0
        self.last_qp = cfg.qp

    def pick_qp(self, fs, gop_pos: int | None) -> tuple[int, float]:
        """Per-picture lambda/QP (uvg_set_picture_lambda_and_qp)."""
        if not self.enabled:
            return fs.qp, 0.0
        # smoothed per-picture target with buffer feedback
        target = self.bits_per_pic - self.bits_budget / 8.0
        if fs.slicetype == 2:    # intra pictures get a larger share
            target *= 3.0 if self.cfg.gop_len else 1.0
            layer = 0
        else:
            w = self.weights.get(gop_pos, 1.0) if gop_pos is not None else 1.0
            target *= w / max(self.avg_weight, 1e-9)
            layer = 1
        target = max(target, self.bits_per_pic * 0.1)
        bpp = target / self.pels
        lam = self.alpha[layer] * bpp ** self.beta[layer]
        lam = max(MIN_LAMBDA, min(MAX_LAMBDA, lam))
        qp = lambda_to_qp(lam)
        qp = max(self.last_qp - 10, min(self.last_qp + 10, qp))
        self.last_qp = qp
        self._pending = (layer, lam, target)
        return qp, lam

    def update(self, fs, actual_bits: int) -> None:
        """Model adaptation after a picture (uvg_update_after_picture)."""
        if not self.enabled:
            return
        layer, lam_used, target = self._pending
        self.bits_budget += actual_bits - self.bits_per_pic
        bpp = max(actual_bits / self.pels, 1e-7)
        lam_model = self.alpha[layer] * bpp ** self.beta[layer]
        lam_model = max(MIN_LAMBDA, min(MAX_LAMBDA, lam_model))
        ln_diff = max(-2.0, min(2.0,
                                math.log(lam_used) - math.log(lam_model)))
        self.alpha[layer] *= math.exp(0.25 * ln_diff)
        self.alpha[layer] = max(0.05, min(500.0, self.alpha[layer]))
        self.beta[layer] += 0.10 * ln_diff * max(-5.0, math.log(bpp))
        self.beta[layer] = max(-3.0, min(-0.1, self.beta[layer]))
        self.frames_coded += 1
