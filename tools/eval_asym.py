#!/usr/bin/env python
"""Ablation CLI: evaluate a SiamWCA checkpoint with the asymmetric previous-frame
branch disabled (reference ``tools/eval_asym.py:158-166`` forces
``cfg.MODEL.BACKBONE_3D['ASYMMETRIC'] = False`` before building the network)."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import test as test_cli  # tools/test.py

    # reuse the test CLI with the asymmetric branch forced off
    orig_parse = test_cli.parse_config

    def parse_with_asym_off():
        args, cfg = orig_parse()
        if 'ASYMMETRIC' in cfg.MODEL.BACKBONE_3D:
            cfg.MODEL.BACKBONE_3D.ASYMMETRIC.ENABLED = False
        return args, cfg

    test_cli.parse_config = parse_with_asym_off
    test_cli.main()


if __name__ == '__main__':
    sys.path.insert(0, str(REPO / 'tools'))
    main()
