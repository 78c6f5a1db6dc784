#!/usr/bin/env python
"""Forwarder: real implementation lives in colaborativempc_tpu.scripts.stress_study."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from colaborativempc_tpu.scripts.stress_study import main

if __name__ == "__main__":
    main()
