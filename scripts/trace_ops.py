"""Aggregate per-op device times from a jax.profiler xplane.pb trace.

    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/trace_ops.py /tmp/trace_dir [top_n]

Prints the top ops by total device time (aggregated over repeated events),
with the XLA op category and the originating python line when recorded.
The tensorboard profile plugin's converter is broken on this image
(pywrap mismatch), so this parses the XSpace proto directly.
"""

import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def load(path: str):
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    files = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not files:
        sys.exit(f"no xplane.pb under {trace_dir}")
    xs = load(files[-1])

    # device planes hold XLA op events; lines are execution streams
    agg = collections.defaultdict(lambda: [0.0, 0, "", ""])  # ps, count
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_meta = plane.event_metadata
        for line in plane.lines:
            lname = line.name
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                name = md.name
                cat = ""
                src = ""
                for st in list(ev.stats) + list(md.stats):
                    sname = stats_meta.get(st.metadata_id, "")
                    if sname in ("hlo_category", "category"):
                        cat = st.str_value or stats_meta.get(st.metadata_id, "")
                        if st.ref_value:
                            cat = stats_meta.get(st.ref_value, cat)
                    if sname in ("source_info", "source", "tf_op"):
                        src = st.str_value
                key = (lname, name)
                a = agg[key]
                a[0] += ev.duration_ps
                a[1] += 1
                a[2] = cat
                a[3] = src or a[3]
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    total_by_line = collections.defaultdict(float)
    for (lname, name), (ps, cnt, cat, src) in rows:
        total_by_line[lname] += ps
    print("== totals per trace line ==")
    for lname, ps in sorted(total_by_line.items(), key=lambda kv: -kv[1]):
        print(f"  {lname:40s} {ps / 1e9:10.3f} ms")
    print(f"\n== top {top_n} ops ==")
    for (lname, name), (ps, cnt, cat, src) in rows[:top_n]:
        print(f"{ps / 1e9:9.3f} ms  x{cnt:<4d} [{lname[:18]:18s}] {cat[:14]:14s} {name[:80]}"
              + (f"\n            {src[:100]}" if src else ""))


if __name__ == "__main__":
    main()
