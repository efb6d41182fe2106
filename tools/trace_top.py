#!/usr/bin/env python
"""Top-k op attribution from a jax.profiler xplane trace.

The tensorboard profile plugin's native converter is broken in this
image (pywrap xspace_to_tools_data missing), so this parses the
.xplane.pb directly with the TF-bundled proto and aggregates TPU device
event durations by op name — enough to answer "where does the step
go" without tensorboard.

    python tools/trace_top.py /tmp/trace_dir [top_k]

or programmatically: ``capture(fn, steps)`` runs ``fn`` under the
profiler and returns the aggregated rows.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def _load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    ))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def top_ops(trace_dir: str, top_k: int = 25):
    """Aggregate device-plane event durations by event name.

    Returns [(name, total_ms, count)] sorted by total, and the plane's
    wall span in ms (first event start -> last event end).
    """
    xs = _load_xspace(trace_dir)
    rows = defaultdict(lambda: [0.0, 0])
    span = [None, None]
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            # XLA op lines carry the compiled program's op events; the
            # step line carries whole-step markers. Aggregate both; op
            # names disambiguate.
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id else "?"
                dur = ev.duration_ps / 1e9  # ms
                rows[name][0] += dur
                rows[name][1] += 1
                t0 = (line.timestamp_ns * 1e3 + ev.offset_ps) / 1e9
                t1 = t0 + dur
                span[0] = t0 if span[0] is None else min(span[0], t0)
                span[1] = t1 if span[1] is None else max(span[1], t1)
    out = sorted(((k, v[0], v[1]) for k, v in rows.items()),
                 key=lambda r: -r[1])[:top_k]
    wall = (span[1] - span[0]) if span[0] is not None else 0.0
    return out, wall


def capture(fn, trace_dir: str):
    """Run ``fn()`` under the profiler, return (result, trace_dir)."""
    import jax

    with jax.profiler.trace(trace_dir):
        out = fn()
        jax.block_until_ready(out)
    return out


def main():
    trace_dir = sys.argv[1]
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    rows, wall = top_ops(trace_dir, top_k)
    print(f"device span: {wall:.3f} ms")
    for name, ms, cnt in rows:
        print(f"{ms:10.3f} ms  x{cnt:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
