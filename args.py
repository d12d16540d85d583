"""Import-surface parity with the reference's root ``args.py``."""
from underwater_image_restoration_tpu.cli.args import argument_parser

__all__ = ["argument_parser"]
