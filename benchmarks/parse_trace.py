"""Summarize an xplane trace: top device ops by total self-duration.

Usage: python benchmarks/parse_trace.py /tmp/vbx_trace [top_n]
Development tool (no JAX import; parses the newest *.xplane.pb found).
"""
import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vbx_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(f"{root}/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane.pb under {root}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        print(f"== plane: {plane.name} ==")
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = sorted(
                ((ev.offset_ps, ev.offset_ps + ev.duration_ps,
                  ev_meta.get(ev.metadata_id, "?")) for ev in line.events),
                key=lambda e: (e[0], -e[1]),
            )
            # Self time: subtract directly-nested child spans (stack scan).
            stack = []  # (t0, t1, name, child_total)
            def pop_to(t):
                while stack and stack[-1][1] <= t:
                    t0, t1, name, child = stack.pop()
                    self_ms = (t1 - t0 - child) / 1e9
                    tot[name] += self_ms
                    cnt[name] += 1
                    if stack:
                        stack[-1][3] += t1 - t0
            for t0, t1, name in evs:
                pop_to(t0)
                stack.append([t0, t1, name, 0])
            pop_to(float("inf"))
        print(f"  {'self ms':>9} {'count':>6}  op")
        for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ms:9.3f} {cnt[name]:6d}  {name[:150]}")
        print(f"  TOTAL self: {sum(tot.values()):.2f} ms")


if __name__ == "__main__":
    main()
