"""Windowed cross-attention (WCA) between the current and previous frame, on the
dense carrier.

TPU re-design of ``pcdet/models/model_utils/wca_block.py`` and the coupled
two-frame input layer ``SSTInputLayer_Temporal`` (``pcdet/models/backbones_3d/
SiamWCA.py:21-269``). Per window: queries = current-frame cells, keys/values =
previous-frame cells. The coupled-drop rule — windows empty in *either* frame get
no update — is the dense attention's natural behavior: no prev keys → masked
softmax → zero delta; no cur queries → nothing read. All current cells go through
the FFN/LayerNorms (wca_block.py:88-103).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import SubMConvBlock
from .sst import DenseGrid, DenseShiftBlock


class WCABlock(nn.Module):
    """One cross-frame stage: 2 shifted WCA layers → residual add → SubM conv_out
    (reference ``WCABlock``, SiamWCA.py:272-447; NUM_BLOCKS is forced to 1 there,
    i.e. a single BasicShiftBlock_WCA of two shifted layers)."""

    encoder_cfg: dict
    window: int = 8
    max_tokens: int = 64
    occ_window_cap: int = 0  # >0: occupied-window compaction with this cap
    occ_small_cap: int = 0   # >0: token-bucketed small-window plan (cap)
    occ_small_tokens: int = 16  # small-bucket token count S
    occ_mid_cap: int = 0     # >0: second packed bucket (cap)
    occ_mid_tokens: int = 48

    @nn.compact
    def __call__(self, grid: DenseGrid, grid_prv: DenseGrid,
                 train: bool) -> DenseGrid:
        ecfg = self.encoder_cfg
        d_model = ecfg['D_MODEL']
        layer_cfg = ecfg.get('LAYER_CFG', {})
        assert grid.grid_hw == grid_prv.grid_hw

        # compaction plan keyed on the current frame's occupancy (queries);
        # prev-frame occupancy only feeds the key mask — windows empty in prev
        # get a zero attention delta, the coupled-drop semantics (module doc)
        compact_pair = None
        conv_plan = None
        if self.occ_window_cap > 0:
            from ..ops.occ_compact import (
                build_bucketed_compact_info, build_compact_info,
                gather_window_occ, occupied_window_indices, round_cap,
            )

            conv_plan = None  # experimental sparse conv disabled (see sst.py)

            if self.occ_small_cap > 0:
                compact_pair = tuple(
                    build_bucketed_compact_info(
                        grid.occ, self.window, s, self.occ_small_cap,
                        self.occ_window_cap, grid.grid_hw,
                        kv_occ=grid_prv.occ,
                        small_tokens=self.occ_small_tokens,
                        mid_cap=self.occ_mid_cap,
                        mid_tokens=self.occ_mid_tokens)
                    for s in (False, True)
                )
            else:
                compact_pair = tuple(
                    build_compact_info(grid.occ, self.window, s,
                                       round_cap(self.occ_window_cap),
                                       grid.grid_hw, kv_occ=grid_prv.occ)
                    for s in (False, True)
                )
            self.sow('intermediates', 'occ_overflow',
                     compact_pair[0].overflow() + compact_pair[1].overflow())

        g = DenseShiftBlock(
            d_model, ecfg['NHEAD'], ecfg['DIM_FEEDFORWARD'], self.window,
            activation=ecfg.get('ACTIVATION', 'gelu'),
            cosine=layer_cfg.get('cosine', True),
            tau_min=layer_cfg.get('tau_min', 0.01),
            cross=True, serving=not train,
            name='block_0',
        )(grid, grid_prv, compact_pair)

        y = grid.x + g.x  # residual add (SiamWCA.py:438-444)
        y = nn.remat(SubMConvBlock, static_argnums=(3,))(
            d_model, name='conv_out')(y, grid.occ, train, conv_plan)
        return DenseGrid(x=y, occ=grid.occ)
