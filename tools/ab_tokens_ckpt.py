"""Interleaved A/B of the mention-checkpoint tokens column layout.

A = slim checkpoint (default: tokens dropped at write, re-derived by the
    scorer from the filtered description)
B = AHRD_KEEP_TOKENS=1 (tokens array encoded + checksummed into the widest
    checkpoint, scorer reads it back)

Reuses bench.py's --pipeline child (warm-up run + timed steady-state run
per fresh JVM, local[$PROFILE_PAR]).  Sides alternate A,B,A,B,... so host
drift hits both equally.  Usage: python tools/ab_tokens_ckpt.py [rounds]
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAR = int(os.environ.get("PROFILE_PAR", "4"))


def run_side(keep_tokens: bool, docs_path: str) -> dict | None:
    env = dict(os.environ)
    env.pop("AHRD_KEEP_TOKENS", None)
    if keep_tokens:
        env["AHRD_KEEP_TOKENS"] = "1"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--pipeline",
         str(PAR), docs_path],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    print(f"child FAILED (keep={keep_tokens}):\n{p.stderr[-1500:]}",
          file=sys.stderr)
    return None


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    docs_dir = tempfile.mkdtemp(prefix="ahrd_ab_docs_")
    docs_path = docs_dir + "/docs"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--synth",
         docs_path],
        check=True, capture_output=True, timeout=1800, cwd=REPO,
    )
    res: dict[str, list[dict]] = {"slim": [], "keep": []}
    for i in range(rounds):
        for side, keep in (("slim", False), ("keep", True)):
            r = run_side(keep, docs_path)
            if r:
                res[side].append(r)
                print(f"round {i} {side}: {r['sec']}s "
                      f"(mention {r['stages'].get('mention_detect')}s, "
                      f"link {r['stages'].get('link_score')}s)", flush=True)
    for side, rs in res.items():
        if not rs:
            continue
        secs = [r["sec"] for r in rs]
        ment = [r["stages"].get("mention_detect", -1) for r in rs]
        link = [r["stages"].get("link_score", -1) for r in rs]
        print(f"{side}: best {min(secs)}s median {statistics.median(secs)}s "
              f"all {secs} | mention {ment} | link {link}")
    import shutil
    shutil.rmtree(docs_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
