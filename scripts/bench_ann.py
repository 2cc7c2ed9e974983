"""ANN scale curve (r5 verdict item 7): recall@10 and queries/s for
brute-force, IVF, PQ (ADC) and IVF-PQ over a synthetic clustered
corpus at ≥1M vectors — the measurement that locates where the
compressed indexes overtake the exact paths.

Corpus: ``n`` unit vectors in d=64 drawn around ``n//1000`` cluster
centers (the regime coarse quantizers exist for), built distributed
(one seeded map_batches over an id range — the corpus matrix never
materializes on the driver). Queries: 32 held-out points near random
centers. Ground truth: exact brute-force top-10 (the ``ann_topk``
path), which is also the brute timing entry.

For each method the corpus-side index/codes build is timed separately
from the per-query search sweep (nprobe ∈ {1, 4, 16} where relevant)
so the build-once / search-many tradeoff is visible.

Usage: python scripts/bench_ann.py [n] [--quick]
Prints one JSON line; record the table in BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).parent.parent))

D = 64
K = 10
NQ = 32


def corpus_ds(n: int, seed: int = 7):
    """Distributed clustered corpus: map over an id-range Dataset, each
    batch seeded by its ids — no driver-side matrix."""
    import ray.data

    n_centers = max(64, n // 1000)
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    import ray

    cref = ray.put(centers)

    def make(batch: pa.Table) -> pa.Table:
        import ray as _ray

        C = _ray.get(cref)
        ids = batch["id"].to_numpy(zero_copy_only=False)
        r = np.random.default_rng(int(ids[0]) + 1)
        ci = r.integers(0, len(C), len(ids))
        X = C[ci] + r.normal(scale=0.15, size=(len(ids), D))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "embedding": pa.array(list(X.astype(np.float32)))})

    ds = ray.data.range(n).map_batches(
        lambda b: pa.table({"id": b["id"]}), batch_format="pyarrow")
    return ds.map_batches(make, batch_format="pyarrow"), centers


def recall(res, truth: dict[int, set]) -> float:
    got: dict[int, set] = {}
    for _, r in res.iterrows():
        got.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    return float(np.mean([len(got.get(q, set()) & t) / len(t)
                          for q, t in truth.items()]))


def main() -> None:
    import ray

    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 1_000_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from logray.ops import similarity as S

    ds, centers = corpus_ds(n)
    ds = ds.materialize()  # build once; every method scans the same blocks
    rng = np.random.default_rng(99)
    qc = centers[rng.integers(0, len(centers), NQ)]
    Q = qc + rng.normal(scale=0.15, size=(NQ, D))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)

    sample = np.stack(
        ds.random_sample(min(1.0, 60_000 / n), seed=3)
        .limit(50_000).to_pandas()["embedding"].to_numpy())

    out = {"n": n, "d": D, "k": K, "nq": NQ, "methods": {}}

    # ---- brute force (= ground truth)
    t0 = time.perf_counter()
    bf = S.ann_topk(ds, Q, k=K)
    t_bf = time.perf_counter() - t0
    truth: dict[int, set] = {}
    for _, r in bf.iterrows():
        truth.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    out["methods"]["brute"] = {"search_s": round(t_bf, 2),
                               "qps": round(NQ / t_bf, 2), "recall": 1.0}

    # ---- IVF (exact inside probed lists)
    n_lists = max(64, int(np.sqrt(n)))
    ivf = S.IvfIndex(n_lists=n_lists, iters=6)
    t0 = time.perf_counter()
    ivf.fit(sample)
    assigned = ds.map_batches(ivf.assign_stage(),
                              batch_format="pyarrow").materialize()
    t_build = time.perf_counter() - t0
    for nprobe in (1, 4, 16):
        t0 = time.perf_counter()
        res = ivf.search(assigned, Q, k=K, nprobe=nprobe)
        dt = time.perf_counter() - t0
        out["methods"][f"ivf_np{nprobe}"] = {
            "n_lists": n_lists, "build_s": round(t_build, 2),
            "search_s": round(dt, 2), "qps": round(NQ / dt, 2),
            "recall": round(recall(res, truth), 4)}

    # ---- PQ (flat ADC over codes; 16x compression at m=16)
    pq_ = S.PqIndex(m=16, bits=8, iters=6)
    t0 = time.perf_counter()
    pq_.fit(sample)
    codes = ds.map_batches(pq_.encode_stage(),
                           batch_format="pyarrow").materialize()
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = pq_.search(codes, Q, k=K)
    dt = time.perf_counter() - t0
    out["methods"]["pq_m16"] = {
        "build_s": round(t_build, 2), "search_s": round(dt, 2),
        "qps": round(NQ / dt, 2),
        "recall": round(recall(res, truth), 4)}

    # ---- IVF-PQ (residual codes inside inverted lists)
    ivfpq = S.IvfPqIndex(n_lists=n_lists, m=16, bits=8, iters=6)
    t0 = time.perf_counter()
    ivfpq.fit(sample)
    codes2 = ds.map_batches(ivfpq.encode_stage(),
                            batch_format="pyarrow").materialize()
    t_build = time.perf_counter() - t0
    for nprobe in (1, 4, 16):
        t0 = time.perf_counter()
        res = ivfpq.search(codes2, Q, k=K, nprobe=nprobe)
        dt = time.perf_counter() - t0
        out["methods"][f"ivfpq_np{nprobe}"] = {
            "n_lists": n_lists, "build_s": round(t_build, 2),
            "search_s": round(dt, 2), "qps": round(NQ / dt, 2),
            "recall": round(recall(res, truth), 4)}

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
