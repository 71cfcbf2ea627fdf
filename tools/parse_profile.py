"""Parse an xplane profile dir: print top ops by total self time.

Usage: python tools/parse_profile.py [logdir] [top]
"""

from __future__ import annotations

import glob
import json
import re
import sys


def summarize(logdir: str, top: int = 40) -> None:
    """Aggregate TPU op self-times from an xplane dir (shared by
    profile_step.py)."""
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane found under", logdir)
        return
    # a logdir can accumulate multiple profile runs; mixing xplanes from
    # different runs breaks the converter — parse only the newest run dir
    import os as _os

    newest_dir = _os.path.dirname(max(paths, key=_os.path.getmtime))
    paths = [p for p in paths if _os.path.dirname(p) == newest_dir]
    data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # gviz DataTable JSON: {"cols":[...], "rows":[{"c":[{"v":...},...]},...]}
    obj = json.loads(data)
    if isinstance(obj, list):  # [table, totals] pair in newer xprof
        obj = obj[0]
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    rows = [[(cell or {}).get("v") for cell in r["c"]] for r in obj["rows"]]
    i_name = cols.index("Operation Name")
    i_self = next(i for i, c in enumerate(cols) if "self" in c.lower() and "time" in c.lower())
    i_occ = next((i for i, c in enumerate(cols) if "occurrence" in c.lower()), None)
    agg = {}
    for r in rows:
        name = r[i_name]
        # collapse per-layer instances of the same op into one row
        key = re.sub(r"[._/]\d+$", "", name)
        agg.setdefault(key, [0.0, 0])
        agg[key][0] += float(r[i_self] or 0)
        agg[key][1] += int(r[i_occ] or 0) if i_occ is not None else 0
    total = sum(v[0] for v in agg.values())
    print(f"total self time: {total/1000:.3f} ms over {len(rows)} op rows; cols={cols}")
    for name, (t, occ) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{t/1000:9.3f} ms {100*t/total:5.1f}%  x{occ:<4d} {name}")


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skt_profile"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    summarize(logdir, top)


if __name__ == "__main__":
    main()
