"""Summarize a jax.profiler xplane capture: module totals + op classes.

The trainer writes traces under <run_dir>/profile/plugins/profile/<ts>/
(`--profile_steps`, utils/profiling.py).  This reads the device timeline
via jax.profiler.ProfileData (no tensorboard plugin needed) and prints
(a) total device time per jitted module, (b) the top op classes —
fusions, scan bodies, pallas kernels, layout copies — so MFU gaps can be
attributed (e.g. round 3: f32 relayout copies feeding the flash-attention
bwd kernel in the update path).

Run: python scripts/analyze_profile.py <path/to/*.xplane.pb> [--top N]
"""

import argparse
import collections
import glob
import os
import re
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help=".xplane.pb file, or a run dir to search")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--ops", action="store_true",
                    help="also print the top individual ops (per-fusion "
                         "granularity, for fusion-mix attribution)")
    args = ap.parse_args()

    path = args.path
    if os.path.isdir(path):
        hits = sorted(glob.glob(
            os.path.join(path, "**", "*.xplane.pb"), recursive=True))
        if not hits:
            sys.exit(f"no .xplane.pb under {path}")
        path = hits[-1]
        print(f"# {path}")

    import jax

    if jax.default_backend() == "cpu":
        pass  # parsing is host-side; any backend works
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(path)
    device_planes = [p for p in pd.planes if "/device:" in p.name
                     and any(ln.name == "XLA Ops" for ln in p.lines)]
    if not device_planes:
        sys.exit("no device plane with XLA Ops in this capture "
                 "(host-only trace?)")
    for plane in device_planes:
        print(f"\n== {plane.name} ==")
        ops = mods = []
        for ln in plane.lines:
            if ln.name == "XLA Ops":
                ops = list(ln.events)
            elif ln.name == "XLA Modules":
                mods = list(ln.events)
        mt = collections.Counter()
        mc = collections.Counter()
        for e in mods:
            name = re.sub(r"\(\d+\)$", "", e.name)
            mt[name] += e.duration_ns
            mc[name] += 1
        print("-- modules: total ms (count) --")
        for k, v in mt.most_common(10):
            print(f"{v / 1e6:10.1f}  ({mc[k]:4d}x)  {k[:64]}")
        agg = collections.Counter()
        for e in ops:
            n = e.name
            if "fusion" in n:
                key = "fusion (matmul+elementwise)"
            elif n.startswith("%copy") or "copy-start" in n or "copy-done" in n:
                key = "layout copies"
            elif n.startswith("%convert"):
                key = "dtype converts"
            elif "pallas" in n or "custom-call" in n:
                key = re.sub(r"[.\d]+ =.*$", "", n)[:48]
            elif n.startswith("%while"):
                key = "scan/while bodies (outer accounting)"
            elif n.startswith("%all-") or n.startswith("%collective"):
                key = "collectives"
            else:
                key = re.sub(r"[.\d]+ =.*$", "", n)[:48]
            agg[key] += e.duration_ns
        print("-- op classes: total ms --")
        for k, v in agg.most_common(args.top):
            print(f"{v / 1e6:10.1f}  {k}")
        if args.ops:
            # per-op granularity: individual fusions/copies with counts and
            # any source metadata the capture carries, so a dominant fusion
            # can be traced back to model code
            ot = collections.Counter()
            oc = collections.Counter()
            meta = {}
            for e in ops:
                n = e.name.split(" = ")[0]
                ot[n] += e.duration_ns
                oc[n] += 1
                if n not in meta:
                    try:
                        meta[n] = {s.name: s.value for s in e.stats}
                    except Exception:
                        meta[n] = {}
            print(f"-- top {args.top} individual ops: total ms (count) --")
            for k, v in ot.most_common(args.top):
                m = meta.get(k, {})
                src = m.get("source_info") or m.get("tf_op") or ""
                extra = f"  [{src}]" if src else ""
                print(f"{v / 1e6:10.2f}  ({oc[k]:5d}x)  {k[:72]}{extra}")


if __name__ == "__main__":
    main()
