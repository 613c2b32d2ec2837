#!/usr/bin/env python
"""Root-level shim preserving the reference's ``python generate.py ...`` UX;
see pggan_tpu/cli/generate.py for the implementation."""

from pggan_tpu.cli.generate import cli_main

if __name__ == "__main__":
    cli_main()
