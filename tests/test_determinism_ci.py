"""CI-sized parallelism-determinism audit.

The full `scripts/determinism_audit.py` sweep (every queries() entry,
~2× the oracle gate's Spark time) runs on demand; this test keeps the
INVARIANT itself in the per-round CI path by auditing one
representative per nondeterminism-risk class at sf0.001:

- window tie-break ordering        → stay_points
- iterative checkpointed recurrence → link_distance
- global top-k cut                  → bm25_topk
- batched mapInPandas fold          → classify_actions_nodes
- pointer-jumping clustering        → minhash_lsh_clusters
- neighborhood aggregate raster     → tile_hotspots
- double-window carry interpolation → resample_track (round 4k)
- decimal-division iterative argmax → pca_top (round 4k)
- log-depth weighted pointer jumping → flow_accum (round 4m)
- frame-min position encoding        → winnow_fingerprints (round 4m)
- sweep-level running sum + argmax   → peak_concurrency (round 4m)
- max-plus frontier + probe round    → dag_levels (round 4r)
- two-level rank + forward block fan → sorted_neighborhood (round 4r)
- aggregate() struct-accumulator fold → survival_km (round 4t)
- per-track path-string Viterbi DP    → viterbi_match (round 4t)
- mergeable-sketch relaxation         → hyperball_harmonic (round 4t)
- σ-layer + backward δ-fold two-sweep → betweenness (round 4t)
- min-struct hooking + contracted merge → emst_tiles (round 5)
- frontier-incremental threshold sums   → lt_influence (round 5)
- per-key two-state backpointer DP      → event_bursts (round 5)

Each runs under local[3]/sp=7 AND local[8]/sp=32 in fresh subprocesses
(the script's own machinery — same code path as the on-demand sweep);
canonical result hashes must match.  A failure here means an operator's
output depends on physical partitioning — a 1000-executor bug even
when the single-config oracle gate is green."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REPRESENTATIVES = [
    "stay_points",
    "link_distance",
    "bm25_topk",
    "classify_actions_nodes",
    "minhash_lsh_clusters",
    "tile_hotspots",
    "resample_track",
    "pca_top",
    "flow_accum",
    "winnow_fingerprints",
    "peak_concurrency",
    "dag_levels",
    "sorted_neighborhood",
    "survival_km",
    "viterbi_match",
    "hyperball_harmonic",
    "betweenness",
    "emst_tiles",
    "lt_influence",
    "event_bursts",
]


@pytest.mark.slow
def test_representative_queries_parallelism_insensitive():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "determinism_audit.py"),
            "/root/testdata/sf0.001",
            *REPRESENTATIVES,
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-12:])
    assert proc.returncode == 0, f"audit failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "all deterministic" in proc.stdout, tail
    for name in REPRESENTATIVES:
        assert f"OK    {name}" in proc.stdout, tail
