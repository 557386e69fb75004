"""Round-3 artifact refresh: run the full bench on the real TPU, save the
JSON as the named artifact docs cite, and regenerate the doc tables from it
(single source of truth — VERDICT r2 item 6).

Usage: python scripts/run_round3_artifacts.py [out_name]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out_name = sys.argv[1] if len(sys.argv) > 1 else "artifacts/bench_r3_local.json"
    out_path = os.path.join(REPO, out_name)
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, capture_output=True, text=True,
        timeout=3600,
    )
    line = None
    for ln in proc.stdout.strip().splitlines()[::-1]:
        if ln.startswith("{"):
            line = ln
            break
    if proc.returncode != 0 or line is None:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-2000:] + "\n")
        raise SystemExit(f"bench failed rc={proc.returncode}")
    art = json.loads(line)
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print(f"saved {out_name}")
    subprocess.run(
        [sys.executable, "scripts/sync_bench_docs.py", out_name], cwd=REPO, check=True
    )


if __name__ == "__main__":
    main()
