"""Aggregate TPU-device op durations from a jax.profiler xplane dump.

Usage: python benchmarks/probes/xplane_top.py <dir-or-pb> [top_n]

Finds the newest ``*.xplane.pb`` under the given directory, sums event
durations per HLO op name on the TPU device plane (excluding host
planes), and prints the top-N ops plus a coarse bucket summary (fusion /
pallas / sort / scatter / gather / dma / other).
"""
import sys
from collections import defaultdict
from pathlib import Path

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore


def load(path):
    p = Path(path)
    if p.is_dir():
        cands = sorted(p.rglob("*.xplane.pb"), key=lambda f: f.stat().st_mtime)
        p = cands[-1]
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(p.read_bytes())
    return sp


def main():
    sp = load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_frame5")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    for plane in sp.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        dur = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname and "xla" not in lname:
                continue
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, "?")
                dur[name] += ev.duration_ps / 1e9  # ms
                cnt[name] += 1
        total = sum(dur.values())
        print(f"== plane {plane.name}: {len(dur)} ops, {total:.1f} ms "
              f"(all lines summed; overlapping lines double-count)")
        for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {d:9.3f} ms  x{cnt[name]:<5d} {name[:110]}")
    print()


if __name__ == "__main__":
    main()
