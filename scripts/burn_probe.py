"""Pure-CPU machine-ceiling probe for scaling runs (BASELINE.md protocol).

Measures the HARDWARE's own 4->16-worker scaling on this host right now:
a multiprocessing pool of N workers each runs an identical pure-Python
arithmetic burn; aggregate iterations/sec at 16 workers over 4x the
4-worker rate is the ceiling any 4->16 pipeline measurement can reach in
this window (frequency scaling + steal make it <1.0).  Bracket every
`bench.py --scaling` run with this probe and record both in
SCALING_r{N}.jsonl so a sub-0.8 raw crawl ratio can be read against what
the machine itself delivered.
"""
import json
import multiprocessing as mp
import time


def _burn(n_iter: int) -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(n_iter):
        s += i * i & 1023
    return time.perf_counter() - t0


def rate(workers: int, n_iter: int = 12_000_000) -> float:
    with mp.Pool(workers) as p:
        walls = p.map(_burn, [n_iter] * workers)
    # aggregate iterations/sec across the pool
    return workers * n_iter / max(walls)


def main() -> None:
    r4 = rate(4)
    r16 = rate(16)
    out = {
        "metric": "machine_ceiling_4_to_16",
        "value": round((r16 / r4) / 4.0, 3),
        "rate_4": round(r4 / 1e6, 2),
        "rate_16": round(r16 / 1e6, 2),
        "unit": "ratio",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
