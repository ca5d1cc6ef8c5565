"""Summarise a jax.profiler xplane trace: top HLO ops by self time.

Usage: python scripts/trace_ops.py /tmp/trace_xla [N]
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import glob
import sys


def main():
    trace_dir = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    path = max(paths, key=lambda p: _os.path.getmtime(p))
    print(f"# {path}")

    from tensorboard_plugin_profile.protobuf import xplane_pb2
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        stats = {}
        total = 0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla" not in line.name.lower():
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9   # ms
                stats[name] = stats.get(name, 0.0) + dur
                total += dur
        if not stats:
            continue
        print(f"\n== plane {plane.name}: {total:.1f} ms total op time, "
              f"{len(stats)} distinct ops")
        for name, ms in sorted(stats.items(), key=lambda kv: -kv[1])[:topn]:
            print(f"  {ms:9.2f} ms  {100*ms/total:5.1f}%  {name[:100]}")


if __name__ == "__main__":
    main()
