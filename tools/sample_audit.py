"""Which registered operators has the driver's gate NEVER sampled?

The driver verifies ~50 of the ~205 registered queries per round and (rounds
2-3) re-drew the SAME 50-name sample, so most operators rest only on the
local mirror (`tools/check_oracle.py`). This tool diffs every
`CORRECTNESS_r*.json` in the repo root against the live registry and prints:

* names the driver has verified at least once (and in which rounds),
* names the driver has NEVER sampled (the residual-risk list),
* names in past gate files that no longer exist in the registry (renames).

Usage::

    python tools/sample_audit.py [--repo /root/repo] [--quiet]

`--quiet` prints only the summary counts and the never-sampled list.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument(
        "--window",
        type=int,
        default=0,
        metavar="N",
        help="preview the first N names of the next driver sample window",
    )
    args = ap.parse_args()

    # resolve the registry against the SAME checkout whose CORRECTNESS
    # files we diff — a hardcoded path would silently audit the wrong code
    sys.path.insert(0, args.repo)
    from sdu_hadoop_indexer_spark.registry import all_queries

    registry = set(all_queries())

    sampled: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(args.repo, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path).removesuffix(".json").removeprefix("CORRECTNESS_")
        with open(path) as f:
            for name in json.load(f):
                sampled.setdefault(name, []).append(rnd)

    seen = set(sampled)
    never = sorted(registry - seen)
    stale = sorted(seen - registry)

    if not args.quiet:
        for name in sorted(seen & registry):
            print(f"SAMPLED {name}: {','.join(sampled[name])}")
    for name in stale:
        print(f"STALE   {name}: in {','.join(sampled[name])} but not registered")
    for name in never:
        print(f"NEVER   {name}")
    print(
        f"== registry {len(registry)} | driver-sampled {len(seen & registry)} "
        f"| never-sampled {len(never)} | stale {len(stale)} =="
    )

    if args.window:
        # preview the driver's next sample window in queries() enumeration
        # order, labeled by rotation class (red retest / oldest-green
        # re-verify canary / never-sampled / rotated green) so the slice
        # reserved by __spark_entry__._coverage_order is auditable.
        import __spark_entry__ as e

        order = e._coverage_order(sorted(registry))
        for i, name in enumerate(order[: args.window]):
            if name not in sampled:
                cls = "fresh"
            elif i < args.window and name in never:
                cls = "fresh"
            else:
                cls = "sampled(" + ",".join(sampled[name]) + ")"
            print(f"WINDOW {i:3d} {cls:20s} {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
