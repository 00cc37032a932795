"""Parse a jax.profiler .xplane.pb trace and print top HLO ops by SELF time.

Usage: python tools/xplane_top_ops.py [trace_dir=/tmp/s2t_prof] [top_n=40]
(The tensorboard_plugin_profile converter is broken against this image's
tensorflow; the XPlane proto schema itself still ships with tf, and self
time is recovered from the event nesting on each line.)
"""
import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2

logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s2t_prof"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
assert paths, f"no xplane.pb under {logdir}"
space = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    space.ParseFromString(f.read())


def base_name(hlo: str) -> str:
    """%fusion.7372 = ... -> fusion;   %convolution_add_fusion.282 -> conv..."""
    m = re.match(r"%([a-zA-Z_][\w-]*?)(?:\.\d+)?\s*=", hlo)
    return m.group(1) if m else hlo[:40]


for plane in space.planes:
    if "TPU" not in plane.name:
        continue
    ev_meta = plane.event_metadata
    self_tot = collections.Counter()
    self_by_kind = collections.Counter()
    cnt = collections.Counter()
    for line in plane.lines:
        if "XLA Ops" not in line.name:
            continue
        evs = sorted(
            ((ev.offset_ps, ev.duration_ps, ev_meta[ev.metadata_id].name)
             for ev in line.events),
            key=lambda t: (t[0], -t[1]),
        )
        stack = []  # [end_ps, name, child_ps]
        def close(frame):
            end, name, child, dur = frame
            self_tot[name] += max(dur - child, 0)
        for off, dur, name in evs:
            while stack and stack[-1][0] <= off:
                close(stack.pop())
            if stack:
                stack[-1][2] += dur
            stack.append([off + dur, name, 0, dur])
            cnt[name] += 1
        while stack:
            close(stack.pop())
    if not self_tot:
        continue
    total_ps = sum(self_tot.values())
    print(f"== plane {plane.name}: XLA-op self-time total {total_ps/1e9:.3f} ms")
    for name, ps in self_tot.most_common(top_n):
        print(f"{ps/1e9:10.3f} ms  n={cnt[name]:5d}  {ps/total_ps*100:5.1f}%  {name[:120]}")
    print("\n-- by op kind --")
    for name, ps in self_tot.items():
        self_by_kind[base_name(name)] += ps
    for kind, ps in self_by_kind.most_common(25):
        print(f"{ps/1e9:10.3f} ms  {ps/total_ps*100:5.1f}%  {kind}")
