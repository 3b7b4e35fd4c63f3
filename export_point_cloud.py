#!/usr/bin/env python3
"""Entry point: see acezero_tpu/cli/export_cli.py for the implementation."""
from acezero_tpu.cli.export_cli import point_cloud_main

if __name__ == "__main__":
    raise SystemExit(point_cloud_main())
