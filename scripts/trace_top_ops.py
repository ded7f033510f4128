"""Parse a jax.profiler xplane trace and print top ops by device time.

Usage: python scripts/trace_top_ops.py /tmp/otvm_trace [N]
(no tensorboard_plugin_profile in this image — we read the xplane proto
directly via tensorflow.tsl.profiler.protobuf.xplane_pb2).
"""
from __future__ import annotations

import collections
import glob
import os
import sys


def main():
    root = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no .xplane.pb under {root}"
    path = max(paths, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        meta = {m.id: m.name for m, m in ((v, v) for _, v in plane.event_metadata.items())}
        total_by_name = collections.Counter()
        count_by_name = collections.Counter()
        plane_total = 0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name \
                    and line.name not in ("XLA Ops",):
                # keep only the op-level line when present
                pass
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # ms
                total_by_name[(line.name, name)] += dur
                count_by_name[(line.name, name)] += 1
                plane_total += dur
        if not total_by_name:
            continue
        print(f"== plane: {plane.name}")
        lines_seen = sorted({ln for ln, _ in total_by_name})
        print(f"   lines: {lines_seen}")
        for (ln, name), ms in total_by_name.most_common(topn):
            print(f"  {ms:9.3f} ms  x{count_by_name[(ln, name)]:<5} [{ln}] {name[:110]}")


if __name__ == "__main__":
    main()
