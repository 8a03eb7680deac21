#!/usr/bin/env python3
"""CLI entry point (reference: run_BnpC.py)."""

from bnpc_tpu.cli import entry

if __name__ == "__main__":
    entry()
