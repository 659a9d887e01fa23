"""North-rule scaling evidence: the same KG pipeline at two parallelism
levels (local[8] vs local[32] — standing in for N vs 4N executors), same
input, reporting throughput at both + scaling efficiency.

Each run is a separate process (fresh JVM) so no state leaks between
parallelism levels.  Writes BENCH/BASELINE.md + BENCH/scaling.json.

Usage:  python tools/scaling_bench.py [n_conv]   (default 50000 ~ 1.5M turns)
        python tools/scaling_bench.py --one <cores> <corpus>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def one_run(cores: int, corpus: str) -> None:
    from kartograph_spark.pipeline import build_triples
    from kartograph_spark.session import get_spark

    spark = get_spark(
        f"kg-scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=2 * cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(f"{corpus}/transcripts.parquet")
    alias = spark.read.parquet(f"{corpus}/alias_dictionary.parquet")
    n_turns = transcripts.count()  # warm the scan outside the timed region
    t0 = time.time()
    kept, _ = build_triples(spark, transcripts, alias)
    n_triples = kept.count()
    secs = time.time() - t0
    print(
        "RESULT "
        + json.dumps(
            {
                "cores": cores,
                "secs": round(secs, 2),
                "turns": n_turns,
                "triples": n_triples,
                "triples_per_sec": round(n_triples / secs, 1),
                "turns_per_sec": round(n_turns / secs, 1),
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        one_run(int(sys.argv[2]), sys.argv[3])
        return

    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    from kartograph_spark import synth

    corpus = os.path.join(REPO, "data", f"scaling_corpus_{n_conv}")
    if not os.path.exists(os.path.join(corpus, "transcripts.parquet")):
        print("generating corpus...", synth.write_corpus(corpus, n_conv=n_conv, mean_turns=30))

    results = {}
    for cores in (8, 32):
        print(f"--- local[{cores}] ---")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(cores), corpus],
            capture_output=True,
            text=True,
            check=False,
            cwd=REPO,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(out.stdout[-3000:], out.stderr[-3000:])
            raise SystemExit(f"run at {cores} cores failed")
        results[cores] = json.loads(line[0][len("RESULT "):])
        print(results[cores])

    r8, r32 = results[8], results[32]
    speedup = r8["secs"] / r32["secs"]
    efficiency = speedup / (32 / 8)
    summary = {
        "corpus_turns": r32["turns"],
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "criterion": ">=0.8 per BASELINE.json north_rule (N vs 4N executors)",
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
