#!/usr/bin/env python
"""CLI entry point — TPU-native parity with the reference ``main.py``.

Usage (same flags as the reference):
    python main.py -a SpectralTransformer --lr 0.0003 --max-epoch 2500 --lossf L1withColor
    python main.py --evaluate --load-weights <ckpt-dir>
"""
from underwater_image_restoration_tpu.cli.main import main

if __name__ == "__main__":
    main()
