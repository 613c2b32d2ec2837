#!/usr/bin/env python
"""Root-level shim preserving the reference's ``python train.py ...`` UX;
see pggan_tpu/cli/train.py for the implementation."""

from pggan_tpu.cli.train import cli_main

if __name__ == "__main__":
    cli_main()
