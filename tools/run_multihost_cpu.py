#!/usr/bin/env python
"""Run the multi-host test suite under a REAL 2-process jax.distributed
job on localhost (CPU backend, 8 virtual devices per process = 16 global).

This exercises the actual process boundary — coordination service,
cross-process collectives, process_allgather — that the single-process
CPU mesh cannot (SURVEY.md §4 multi-host tier; VERDICT r1 item 3):

    python tools/run_multihost_cpu.py [n_procs]

Exit code 0 iff every process's pytest run passes.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{free_port()}"
    procs = []
    for i in range(n):
        env = dict(
            os.environ,
            TPUVR_MH_COORD=coord,
            TPUVR_MH_NPROC=str(n),
            TPUVR_MH_PROC=str(i),
        )
        env.pop("TPUVR_TPU_TESTS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "pytest",
                 "tests/test_multihost.py", "-q", "--no-header",
                 "-p", "no:cacheprovider"],
                cwd=repo, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        tail = out.decode(errors="replace").strip().splitlines()[-6:]
        print(f"--- process {i} (rc={p.returncode}) ---")
        print("\n".join(tail))
        rc |= p.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
