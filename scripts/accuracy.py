"""Accuracy harness — the analog of the reference's scripts/accuracy.sql:
RMS error of the 1..999-permille percentile vector vs exact, across
distributions × input orders × API (direct vs pre-aggregated digests),
at compressions 10/100/1000.

Kernel-level (no Spark session needed): the Spark pipeline reuses this
exact kernel, and partitioning effects are covered by the merged
column.  Prints a markdown table; used to fill BENCH.md's accuracy
section.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tdigest_spark.kernel.tdigest import merge_all, tdigest_from_values  # noqa: E402

N = 100_000
PS = np.arange(1, 1000) / 1000.0


def distributions(rng):
    z = rng.rand(N)
    yield "uniform", z
    yield "asc", np.sort(z)
    yield "desc", np.sort(z)[::-1]
    yield "sqrt", np.sqrt(z)
    yield "pow4", z**4
    g = np.clip(0.5 + 0.1 * rng.randn(N), 0, 1)
    yield "normal", g
    yield "lognormal", np.exp(rng.randn(N))
    yield "bimodal", np.concatenate([z[: N // 2], z[N // 2 :] + 5])
    yield "heavy_dup", np.floor(z * 50)


def rms_rank_error(x, est):
    xs = np.sort(x)
    ranks = np.searchsorted(xs, est, side="right") / len(xs)
    return float(np.sqrt(np.mean((ranks - PS) ** 2)))


def main() -> None:
    rng = np.random.RandomState(42)
    print("| distribution | c=10 | c=100 | c=1000 | c=100 merged(16) |")
    print("|---|---|---|---|---|")
    worst = 0.0
    for name, x in distributions(rng):
        cells = []
        for c in (10, 100, 1000):
            d = tdigest_from_values(x, c)
            cells.append(rms_rank_error(x, d.quantiles(PS)))
        m = merge_all([tdigest_from_values(x[i::16], 100) for i in range(16)])
        cells.append(rms_rank_error(x, m.quantiles(PS)))
        worst = max(worst, cells[1])
        print(
            f"| {name} | " + " | ".join(f"{v * 100:.3f}%" for v in cells) + " |"
        )
    print(f"\nworst c=100 RMS rank error: {worst * 100:.3f}% "
          "(reference band at c=100: 0.5-1%)")


if __name__ == "__main__":
    main()
