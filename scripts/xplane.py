"""Minimal XSpace (jax.profiler xplane.pb) reader — no TF dependency.

Parses the protobuf wire format directly with the field numbers of
tsl/profiler/protobuf/xplane.proto and aggregates per-op device time.

Usage:
  python scripts/xplane.py <trace_dir_or_pb> [topn]

Library use:
  from xplane import load_xspace, op_totals
"""

import glob
import os
import struct
import sys
from collections import defaultdict


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def _map_entry(buf):
    k = v = None
    for fno, _, val in fields(buf):
        if fno == 1:
            k = val
        elif fno == 2:
            v = val
    return k, v


def parse_plane(buf):
    name = ""
    lines = []
    ev_meta = {}
    for fno, _, v in fields(buf):
        if fno == 2:
            name = v.decode()
        elif fno == 3:
            lines.append(v)
        elif fno == 4:
            k, m = _map_entry(v)
            mname = ""
            for f2, _, v2 in fields(m):
                if f2 == 2:
                    mname = v2.decode()
            ev_meta[k] = mname
    return name, lines, ev_meta


def parse_line(buf):
    name = ""
    events = []
    for fno, _, v in fields(buf):
        if fno == 2:
            name = v.decode()
        elif fno == 4:
            events.append(v)
    return name, events


def parse_event(buf):
    mid = dur = 0
    for fno, _, v in fields(buf):
        if fno == 1:
            mid = v
        elif fno == 3:
            dur = v
    return mid, dur


def load_xspace(path):
    """Returns [(plane_name, [(line_name, [(op_name, duration_ps)])])]."""
    if os.path.isdir(path):
        cands = glob.glob(f"{path}/**/*.xplane.pb", recursive=True)
        path = max(cands, key=os.path.getmtime)
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for fno, _, v in fields(buf):
        if fno != 1:
            continue
        pname, lines, ev_meta = parse_plane(v)
        plines = []
        for lb in lines:
            lname, events = parse_line(lb)
            evs = [(ev_meta.get(mid, f"#{mid}"), dur)
                   for mid, dur in map(parse_event, events)]
            plines.append((lname, evs))
        planes.append((pname, plines))
    return planes


def op_totals(planes, plane_filter="TPU", line_filter="XLA Ops"):
    """Aggregate op durations (ms) per op name."""
    tot = defaultdict(float)
    for pname, plines in planes:
        if plane_filter not in pname:
            continue
        for lname, evs in plines:
            if line_filter and line_filter not in lname:
                continue
            for name, dur in evs:
                tot[name] += dur / 1e9
    return dict(tot)


def main():
    path = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    planes = load_xspace(path)
    print("planes:", [(p, [l for l, _ in ls]) for p, ls in planes][:6])
    tot = op_totals(planes)
    if not tot:
        tot = op_totals(planes, plane_filter="", line_filter="")
    s = sum(tot.values())
    print(f"\ntotal op time {s:.1f} ms, {len(tot)} ops")
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:topn]:
        print(f"  {ms:9.2f} ms {100*ms/max(s,1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
