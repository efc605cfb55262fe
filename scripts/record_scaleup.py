"""Assemble BENCH_SCALEUP.json from two same-session bench.py outputs.

``python scripts/record_scaleup.py <sf0.1.json> <sf1.json> [out.json]``

Cross-round absolute numbers swing with machine speed (see
bench-machine-variance note); this artifact is only meaningful when
both inputs came from the SAME machine back-to-back, which is how
scripts/make_scale_fixture.py + this script are meant to be driven.
"""

from __future__ import annotations

import json
import sys


def _load_bench(path: str) -> dict:
    """Accept either the legacy single-object file or the current
    two-line bench.py output (detail line + short headline line):
    merge every JSON line into one dict."""
    merged: dict = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                merged.update(json.loads(line))
    return merged


def main() -> None:
    small = _load_bench(sys.argv[1])
    big = _load_bench(sys.argv[2])
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_SCALEUP.json"
    data_factor = big["sf"] / small["sf"]
    per_query = {
        k: {
            "small_sec": small["queries"][k],
            "big_sec": big["queries"][k],
            "ratio": round(big["queries"][k] / max(small["queries"][k], 1e-9), 2),
        }
        for k in small["queries"]
        if k in big["queries"]
    }
    worst = sorted(per_query.items(), key=lambda kv: -kv[1]["ratio"])[:5]
    artifact = {
        "note": (
            "same-machine back-to-back runs; sf1 synthesized by "
            "scripts/make_scale_fixture.py (10x key-shifted replication "
            "of the sf0.1 driver fixtures, per-copy text AND embedding "
            "perturbation so dedup/similarity see near- not exact "
            "duplicates)"
        ),
        "data_factor": data_factor,
        "sf_small": small["sf"],
        "sf_big": big["sf"],
        "total_small_sec": small["value"],
        "total_big_sec": big["value"],
        "total_ratio": round(big["value"] / small["value"], 2),
        "queries": per_query,
        "worst5": [
            {"name": k, **v} for k, v in worst
        ],
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(
        f"total {small['value']}s -> {big['value']}s "
        f"(x{artifact['total_ratio']} at x{data_factor:g} data) -> {out_path}"
    )


if __name__ == "__main__":
    main()
