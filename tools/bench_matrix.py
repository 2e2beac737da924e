"""TPU bench matrix -> one machine-readable BENCH_MATRIX.json artifact.

bench_matrix.sh prints its numbers to a terminal; between rounds that left
the non-default paths (Mamba flagship, 30to5, engine e2e, flash-off A/B)
unpinned — a regression there was invisible (VERDICT r3 weak #5).  This
runner executes each bench as its OWN sequential subprocess (one TPU
process at a time — two contend and can wedge the axon tunnel), parses the
single JSON line each bench prints, and writes the collected matrix to
BENCH_MATRIX.json at the repo root, to be committed every round.

Usage:
    python tools/bench_matrix.py            # full matrix (~40-70 min cold)
    python tools/bench_matrix.py --only gpt,mamba
    python tools/bench_matrix.py --out /tmp/m.json
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> (env overrides, script, timeout_s)
ITEMS = {
    # the two flagship defaults (regression re-check every round)
    "gpt": ({"DEEPSENSE_BENCH_ARCH": "gpt"}, "bench.py", 3600),
    "mamba": ({"DEEPSENSE_BENCH_ARCH": "mamba"}, "bench.py", 3600),
    # the 30-to-5 multi-step variant (1922 tokens + GRU decoder); bench
    # defaults give B=16 via 2 accumulated microbatches (beats B=8 plain
    # 43.7 vs 42.9, NOTES r5)
    "gpt_30to5": ({"DEEPSENSE_BENCH_30TO5": "1",
                   "DEEPSENSE_BENCH_ARCH": "gpt"}, "bench.py", 3600),
    # flash vs einsum A/B (einsum only fits at B=8)
    "gpt_flash_off": ({"DEEPSENSE_BENCH_ARCH": "gpt",
                       "DEEPSENSE_BENCH_FLASH": "0",
                       "DEEPSENSE_BENCH_B": "8"}, "bench.py", 3600),
    # engine end-to-end: cache -> loader -> prefetch -> h2d -> fused step
    "engine_e2e_gpt": ({}, "tools/bench_engine.py", 5400),
}


def run_item(name, env_over, script, timeout):
    env = dict(os.environ)
    env.update(env_over)
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, os.path.join(ROOT, script)],
                           env=env, cwd=ROOT, capture_output=True,
                           text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout}s"}
    line = next((ln for ln in reversed(p.stdout.strip().splitlines())
                 if ln.startswith("{")), None)
    if p.returncode != 0 or line is None:
        return {"error": f"rc={p.returncode}",
                "stderr_tail": p.stderr.strip().splitlines()[-5:]}
    try:
        out = json.loads(line)
    except json.JSONDecodeError:
        # a brace-prefixed progress line is not the result line; record the
        # failure for this item instead of aborting the whole matrix loop
        return {"error": "last brace-prefixed stdout line is not JSON",
                "line": line[:200]}
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated subset of item names")
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_MATRIX.json"))
    args = ap.parse_args()
    names = ([n.strip() for n in args.only.split(",") if n.strip()]
             or list(ITEMS))

    matrix = {"generated_unix": int(time.time()), "items": {}}
    if os.path.exists(args.out):           # partial reruns keep old entries
        try:
            with open(args.out) as f:
                matrix["items"] = json.load(f).get("items", {})
        except (json.JSONDecodeError, OSError):
            pass
    for name in names:
        env_over, script, timeout = ITEMS[name]
        print(f"=== {name} ({script}) ===", flush=True)
        matrix["items"][name] = run_item(name, env_over, script, timeout)
        print(json.dumps(matrix["items"][name]), flush=True)
        with open(args.out, "w") as f:     # persist after every item
            json.dump(matrix, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
