"""Interleaved A/B driver over tools/ab_bench.py.

Alternates whole passes A1 B1 A2 B2 ... between two repo roots (the
protocol that attributed the r11/r13 drift flags), takes per-query
mins, prints a comparison table. Noise only ever ADDS time, so the
min over interleaved passes is the fair estimator on a
noisy-neighbor box.

Usage:
  python tools/ab_drive.py <rootA> <rootB> <passes> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile


def main() -> None:
    root_a, root_b, passes = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    env = dict(os.environ)
    env["AB_HEADLINE"] = json.dumps(names)
    mins: dict[str, dict[str, float]] = {"A": {}, "B": {}}
    here = os.path.dirname(os.path.abspath(__file__))
    with tempfile.TemporaryDirectory() as td:
        for p in range(passes):
            for tag, root in (("A", root_a), ("B", root_b)):
                out = os.path.join(td, f"{tag}{p}.json")
                subprocess.run(
                    [sys.executable, os.path.join(here, "ab_bench.py"), root, out],
                    env=env,
                    check=True,
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                )
                got = json.load(open(out))
                for n, t in got.items():
                    cur = mins[tag].get(n)
                    mins[tag][n] = t if cur is None else min(cur, t)
                print(f"pass {p} {tag}: " + json.dumps(got), flush=True)
    print("\n=== per-query mins (A=first root, B=second) ===")
    ta = tb = 0.0
    for n in names:
        a, b = mins["A"].get(n), mins["B"].get(n)
        if a is None or b is None:
            print(f"{n}: MISSING a={a} b={b}")
            continue
        ta += a
        tb += b
        print(f"{a:8.3f}  {b:8.3f}  {b - a:+7.3f}  {n}")
    print(f"{ta:8.3f}  {tb:8.3f}  {tb - ta:+7.3f}  TOTAL")
    print(json.dumps({"A": mins["A"], "B": mins["B"]}))


if __name__ == "__main__":
    main()
