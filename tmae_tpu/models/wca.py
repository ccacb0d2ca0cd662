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

    @nn.compact
    def __call__(self, grid: DenseGrid, grid_prv: DenseGrid,
                 train: bool) -> DenseGrid:
        ecfg = self.encoder_cfg
        d_model = ecfg['D_MODEL']
        layer_cfg = ecfg.get('LAYER_CFG', {})
        assert grid.grid_hw == grid_prv.grid_hw

        g = DenseShiftBlock(
            d_model, ecfg['NHEAD'], ecfg['DIM_FEEDFORWARD'], self.window,
            activation=ecfg.get('ACTIVATION', 'gelu'),
            cosine=layer_cfg.get('cosine', True),
            tau_min=layer_cfg.get('tau_min', 0.01),
            cross=True,
            name='block_0',
        )(grid, grid_prv)

        y = grid.x + g.x  # residual add (SiamWCA.py:438-444)
        y = nn.remat(SubMConvBlock, static_argnums=(3,))(
            d_model, name='conv_out')(y, grid.occ, train)
        return DenseGrid(x=y, occ=grid.occ)
