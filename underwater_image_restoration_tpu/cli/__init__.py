"""CLI parity layer (reference ``main.py`` + ``args.py``)."""
from .args import argument_parser
from .main import main

__all__ = ["argument_parser", "main"]
