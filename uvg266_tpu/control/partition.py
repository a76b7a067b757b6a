"""RD partition decision: bottom-up DP over the fixed QT lattice.

The TPU-first replacement of the reference's recursive depth search
(search.c search_cu:1299 + work_tree copy-up): evaluate ALL CUs of every
size in parallel (batched SATD mode search per size class), then pick the
QT split structure with a cheap bottom-up argmin sweep — no sequential
tree recursion, no work-tree copies.

Cost model (ops.rd_cost batched forward path):
  leaf(s)  = SSD(recon, src) + lambda * (fast_coeff_bits + mode_bits)
  node(s)  = min(leaf(s), sum(children) + lambda * split_bits)
Blocks crossing the frame boundary are forced to split (implicit QT,
cu.c uvg_get_implicit_split).
"""
from __future__ import annotations

import numpy as np

from ..consts import LCU_WIDTH
from .cu import NO_SPLIT, QT_SPLIT, CtuNode, split_locs

INF = np.float64(1e30)

# split-flag signaling estimate (bits); leaf costs come from the batched
# RD model (SSD + lambda*bits), so the DP compares in the same units
SPLIT_BITS_EST = 1.5


def qp_to_lambda(qp: int) -> float:
    """Frame lambda (rate_control.c uvg_qp_to_lambda: 0.57 * 2^((qp-12)/3))."""
    return 0.57 * 2.0 ** ((qp - 12) / 3.0)


class PartitionSearch:
    """Per-frame QT partition decision from per-size cost grids."""

    def __init__(self, ctrl, cfg, qp: int | None = None):
        self.ctrl = ctrl
        self.cfg = cfg
        self.qp = qp if qp is not None else cfg.qp
        # size classes searched, largest to smallest
        max_depth = cfg.pu_depth_intra[1]
        min_depth = cfg.pu_depth_intra[0]
        self.sizes = [LCU_WIDTH >> d for d in range(min_depth, max_depth + 1)
                      if LCU_WIDTH >> d >= 8]
        if not self.sizes:
            self.sizes = [16]

    def _positions(self, s: int):
        fw, fh = self.ctrl.in_width, self.ctrl.in_height
        gw, gh = -(-fw // s), -(-fh // s)
        positions = []
        for by in range(gh):
            for bx in range(gw):
                x, y = bx * s, by * s
                if x + s <= fw and y + s <= fh:
                    positions.append((x, y))
        return positions, gw, gh

    def search(self, src_y: np.ndarray, search_fn) -> list[CtuNode]:
        """search_fn(w, h, positions) -> (modes, costs) for aligned blocks.

        positions: list of (x, y). Returns the chosen CTU trees with
        leaf.cu_mode set.
        """
        cost = {}
        mode = {}
        for s in self.sizes:
            positions, gw, gh = self._positions(s)
            descs, costs_arr = search_fn(s, s, positions)
            c = np.full((gh, gw), INF)
            m = {}
            for k, (x, y) in enumerate(positions):
                c[y // s, x // s] = costs_arr[k]
                m[(x, y)] = descs[k]
            cost[s] = c
            mode[s] = m
        return self._decide(cost, mode)

    def search_async(self, src_y: np.ndarray, dispatch_fn) -> list[CtuNode]:
        """Like search(), but dispatch_fn(w, h, positions) returns a
        resolve() thunk: all size classes are dispatched to the device
        back-to-back before any result is awaited (JAX async dispatch),
        removing the per-size host sync bubbles."""
        pend = []
        for s in self.sizes:
            positions, gw, gh = self._positions(s)
            pend.append((s, positions, gw, gh,
                         dispatch_fn(s, s, positions)))
        cost = {}
        mode = {}
        for s, positions, gw, gh, resolve in pend:
            descs, costs_arr = resolve()
            c = np.full((gh, gw), INF)
            m = {}
            for k, (x, y) in enumerate(positions):
                c[y // s, x // s] = costs_arr[k]
                m[(x, y)] = descs[k]
            cost[s] = c
            mode[s] = m
        return self._decide(cost, mode)

    def _decide(self, cost, mode) -> list[CtuNode]:
        ctrl = self.ctrl
        lam = qp_to_lambda(self.qp)
        # bottom-up DP over the size pyramid
        smallest = self.sizes[-1]
        total = {smallest: cost[smallest]}
        choose_split = {}
        for s in reversed(self.sizes[:-1]):
            child = total[self.sizes[self.sizes.index(s) + 1]]
            gh, gw = cost[s].shape
            ch = child[:gh * 2, :gw * 2]
            # pad child grid to even dims
            pad_h, pad_w = gh * 2 - ch.shape[0], gw * 2 - ch.shape[1]
            if pad_h or pad_w:
                ch = np.pad(ch, ((0, pad_h), (0, pad_w)), constant_values=0)
            sum4 = (ch[0::2, 0::2] + ch[0::2, 1::2]
                    + ch[1::2, 0::2] + ch[1::2, 1::2])
            split_cost = sum4 + lam * SPLIT_BITS_EST
            choose_split[s] = split_cost < cost[s]
            total[s] = np.minimum(cost[s], split_cost)

        # build CTU trees
        ctus = []
        top = self.sizes[0]
        for cty in range(ctrl.height_in_lcu):
            for ctx_ in range(ctrl.width_in_lcu):
                ctus.append(self._build(ctx_ * LCU_WIDTH, cty * LCU_WIDTH,
                                        LCU_WIDTH, choose_split, mode))
        return ctus

    def _build(self, x, y, s, choose_split, mode) -> CtuNode:
        ctrl = self.ctrl
        node = CtuNode(x, y, s, s)
        crosses = x + s > ctrl.in_width or y + s > ctrl.in_height
        must_split = s > self.sizes[0] or crosses
        do_split = must_split
        if not do_split and s in choose_split:
            do_split = bool(choose_split[s][y // s, x // s])
        if do_split and s > 8:
            node.split = QT_SPLIT
            for (sx, sy, sw, sh) in split_locs(x, y, s, s, QT_SPLIT):
                if sx >= ctrl.in_width or sy >= ctrl.in_height:
                    continue
                node.children.append(self._build(sx, sy, sw, choose_split, mode))
        else:
            node.split = NO_SPLIT
            node.cu_desc = mode[s][(x, y)]
        return node
