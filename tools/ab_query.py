"""Interleaved A/B timing of one queries() entry across two repo checkouts.

Usage: python tools/ab_query.py <repoA> <repoB> <query> [rounds] [sf_dir]

Each measurement runs in its own subprocess (fresh JVM) on local[8], warm
run + timed run against a noop sink; the two sides alternate A,B,A,B,...
so host-load drift hits both equally (same methodology as bench.py's
scaling pair).  Prints per-round times and the best-of summary.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DEFAULT = "/root/testdata/sf0.1"


def child(repo: str, query: str, sf_dir: str):
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from ahrd_spark.session import get_spark

    spark = get_spark(app_name=f"ab_{query}", master="local[8]",
                      shuffle_partitions=8)
    fn = entrymod.queries()[query]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(json.dumps({"sec": round(time.time() - t0, 3)}))
    spark.stop()


def measure(repo: str, query: str, sf_dir: str) -> float | None:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", repo, query,
         sf_dir],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)["sec"]
    print(f"child FAILED in {repo}:\n{p.stderr[-1500:]}", file=sys.stderr)
    return None


def main():
    repo_a, repo_b, query = sys.argv[1:4]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sf_dir = sys.argv[5] if len(sys.argv) > 5 else SF_DEFAULT
    times: dict[str, list[float]] = {"A": [], "B": []}
    for i in range(rounds):
        for side, repo in (("A", repo_a), ("B", repo_b)):
            sec = measure(repo, query, sf_dir)
            if sec is not None:
                times[side].append(sec)
            print(f"round {i} side {side} ({repo}): {sec}s", flush=True)
    best_a = min(times["A"]) if times["A"] else None
    best_b = min(times["B"]) if times["B"] else None
    print(json.dumps({
        "query": query, "rounds": rounds,
        "A": {"repo": repo_a, "times": times["A"], "best": best_a},
        "B": {"repo": repo_b, "times": times["B"], "best": best_b},
        "best_ratio_B_over_A": (
            round(best_b / best_a, 3) if best_a and best_b else None
        ),
    }))


if __name__ == "__main__":
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        main()
