#!/usr/bin/env python
"""Run the multi-host test suite under a REAL 2-process jax.distributed
job on localhost (CPU backend, 8 virtual devices per process = 16 global).

This exercises the actual process boundary — coordination service,
cross-process collectives, process_allgather — that the single-process
CPU mesh cannot (SURVEY.md §4 multi-host tier; VERDICT r1 item 3):

    python tools/run_multihost_cpu.py [n_procs]            # test suite
    python tools/run_multihost_cpu.py [n_procs] --scaling  # C14 row
                                                 (tools/mh_scaling.py)

Exit code 0 iff every process passes.
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 2
    scaling = "--scaling" in sys.argv
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{free_port()}"
    if scaling:
        cmd = [sys.executable, "tools/mh_scaling.py"]
    else:
        cmd = [sys.executable, "-m", "pytest",
               "tests/test_multihost.py", "-q", "--no-header",
               "-p", "no:cacheprovider"]
    procs = []
    for i in range(n):
        env = dict(
            os.environ,
            TPUVR_MH_COORD=coord,
            TPUVR_MH_NPROC=str(n),
            TPUVR_MH_PROC=str(i),
        )
        env.pop("TPUVR_TPU_TESTS", None)
        flags = env.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        procs.append(
            subprocess.Popen(
                cmd, cwd=repo, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        tail = out.decode(errors="replace").strip().splitlines()[-40:]
        print(f"--- process {i} (rc={p.returncode}) ---")
        print("\n".join(tail))
        rc |= p.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
