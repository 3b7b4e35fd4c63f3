#!/usr/bin/env python3
"""Entry point: see acezero_tpu/cli/register_cli.py for the implementation."""
from acezero_tpu.cli.register_cli import main

if __name__ == "__main__":
    raise SystemExit(main())
