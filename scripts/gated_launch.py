"""Probe-gated launcher for perf-record runs (BENCH.md policy, round
4: 7 of 8 contended-window invocations failed the scaling bar while
the one launched right after a healthy probe passed — so every
official record is launched ONLY from inside a measured-healthy
window, and the launch probe is published with the record).

Healthy bar (matches the round-4 policy): membw >= MEMBW_MIN GB/s AND
32p spin >= SPIN_MIN M iter/s. Probes loop (sleep between) until the
bar passes or --max-wait expires; then the target command launches
immediately (same second). The last probe and total wait go to stderr
as one JSON line so the record can cite them.

Usage: python scripts/gated_launch.py [--membw 9.0] [--spin 280]
           [--max-wait 3600] -- <cmd> [args...]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time


def main() -> None:
    argv = sys.argv[1:]
    if "--" in argv:
        i = argv.index("--")
        own, cmd = argv[:i], argv[i + 1:]
    else:
        own, cmd = argv, []
    ap = argparse.ArgumentParser()
    ap.add_argument("--membw", type=float, default=9.0)
    ap.add_argument("--spin", type=float, default=280.0)
    ap.add_argument("--max-wait", type=int, default=3600)
    ap.add_argument("--sleep", type=int, default=45)
    ap.add_argument("--require-healthy", dest="require_healthy",
                    action="store_true", default=True,
                    help="exit 3 at deadline instead of launching into "
                         "a contended window (the DEFAULT since round 6: "
                         "policy-violating records can't be produced "
                         "silently — round-5 advice #3)")
    ap.add_argument("--launch-anyway", dest="require_healthy",
                    action="store_false",
                    help="explicit escape hatch: launch at deadline even "
                         "into a contended window (probe still published)")
    args = ap.parse_args(own)
    if not cmd:
        sys.exit("no command after --")

    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import _cpu_probe

    t0 = time.time()
    deadline = t0 + args.max_wait
    while True:
        p = _cpu_probe(32)
        healthy = (p["membw_GBps"] >= args.membw
                   and p["Miter_s_32p"] >= args.spin)
        print(json.dumps({"launch_probe": p, "healthy": healthy,
                          "waited_s": round(time.time() - t0, 1)}),
              file=sys.stderr, flush=True)
        if healthy:
            break
        if time.time() >= deadline:
            if args.require_healthy:
                print(json.dumps({"gated_launch": "deadline, no healthy "
                                  "window; command NOT run"}),
                      file=sys.stderr, flush=True)
                sys.exit(3)
            break
        time.sleep(args.sleep)
    rc = subprocess.call(cmd)
    sys.exit(rc)


if __name__ == "__main__":
    main()
