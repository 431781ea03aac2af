"""Per-stage Ray Data stats for selected queries — the profiling loop.

Usage:  python scripts/profile_stats.py [query ...]   (default: a heavy trio)

Runs each query's pipeline and prints the tail of ``ds.stats()`` (per-stage
wall times, block counts, memory) plus total wall time, so optimization
work targets the measured hot stage rather than a guess.  Queries that
return pandas (already-consumed pipelines) only report wall time.
"""
import sys
import time

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.01"
DEFAULT = ["q1_pricing_summary", "token_count_bpe", "embed_docs"]

names = sys.argv[1:] or DEFAULT
qs = entrymod.queries()
for name in names:
    t0 = time.perf_counter()
    out = qs[name](SF)
    import ray.data as rd

    if isinstance(out, rd.Dataset):
        out = out.materialize()
        stats = out.stats()
        dt = time.perf_counter() - t0
        print(f"\n===== {name}  ({dt:.2f}s wall) =====")
        # last ~30 lines carry the per-stage summary table
        print("\n".join(stats.splitlines()[-30:]))
    else:
        dt = time.perf_counter() - t0
        print(f"\n===== {name}  ({dt:.2f}s wall) — pandas result, "
              f"{len(out)} rows (pipeline already consumed) =====")

ray.shutdown()
