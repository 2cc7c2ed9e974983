"""High-duplicate-rate dedup stress probe (the 100 TB failure mode).

Synthesizes n_docs documents at ~90% duplicate rate (worst case for any
path whose memory is 'bounded by the duplicate rate'), runs exact dedup
and MinHash+LSH clustering, and reports wall time plus DRIVER peak RSS —
the number that must stay flat now that the verify path carries
signatures through the band exchange instead of collecting survivors on
the driver (round-3 fix, dedup.py).

Usage: python scripts/stress_dedup.py [n_docs]   (default 50_000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import resource
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).parent.parent))


def make_corpus(n: int, dup_rate: float = 0.9, seed: int = 17) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(500)])
    n_uniq = max(1, int(n * (1 - dup_rate)))
    uniq = [" ".join(rng.choice(vocab, 40)) for _ in range(n_uniq)]
    src = rng.integers(0, n_uniq, n)
    texts = [uniq[i] for i in src]
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts)})


def main() -> None:
    import ray
    import ray.data

    from logray.ops import dedup

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)
    ds = ray.data.from_arrow(make_corpus(n)).repartition(16)

    t0 = time.perf_counter()
    kept = dedup.exact_dedup(ds).count()
    t_exact = time.perf_counter() - t0

    t0 = time.perf_counter()
    labels = dedup.minhash_lsh_dedup(ds, threshold=0.8)
    n_labeled = labels.count()
    t_minhash = time.perf_counter() - t0

    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    out = {"n_docs": n, "dup_rate": 0.9,
           "exact_kept": int(kept), "exact_sec": round(t_exact, 2),
           "minhash_labeled": int(n_labeled),
           "minhash_sec": round(t_minhash, 2),
           "driver_peak_rss_mb": round(peak_mb, 1)}
    assert kept <= n * 0.15, "exact dedup failed to collapse duplicates"
    assert n_labeled == n, "minhash must label every doc"
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
