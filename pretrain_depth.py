#!/usr/bin/env python3
"""Entry point: see acezero_tpu/cli/pretrain_depth_cli.py."""
from acezero_tpu.cli.pretrain_depth_cli import main

if __name__ == "__main__":
    raise SystemExit(main())
