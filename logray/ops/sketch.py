"""Sketch operators — approximate aggregates whose partials merge exactly.

HyperLogLog count-distinct: the scale path for DISTINCT when the key
cardinality itself is too big to shuffle. Each batch reduces to one
4 KiB register array per group (a mergeable partial — element-wise max),
so the shuffle moves O(groups) fixed-size sketches regardless of row
count; relative error ≈ 1.04/√m ≈ 1.6% at p=12.

Pure numpy, no per-row Python: hashing via ``pd.util.hash_pandas_object``
(one pass), register index = top p bits, rank = leading-zero count of the
remaining bits via a float64-exponent trick (frexp), per-register max via
``np.maximum.at``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_KEY = "0123456789123456"


def _hll_partial(values: pd.Series, p: int) -> np.ndarray:
    """One HLL register array (uint8[2**p]) for a column of values."""
    m = 1 << p
    h = pd.util.hash_pandas_object(values, index=False, hash_key=_HASH_KEY).to_numpy()
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # low bits set: rank ≤ 64-p+1
    # leading zeros of a uint64 via the float64 exponent: for x>0,
    # frexp(x) = (frac, exp) with 2**(exp-1) <= x < 2**exp → lz = 64-exp
    _, exp = np.frexp(rest.astype(np.float64))
    # float64 rounding can push exp one too high for values near 2**64; clamp
    lz = np.clip(64 - exp, 0, 64 - p).astype(np.uint8)
    rank = lz + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    E = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if E <= 2.5 * m and zeros:
        E = m * np.log(m / zeros)  # linear counting for small cardinalities
    return float(E)


def approx_distinct(ds, group_cols: list[str], value_col: str, *, p: int = 12):
    """Approximate per-group COUNT(DISTINCT value_col) via HyperLogLog.

    map_batches emits one (group, registers) row per group per batch;
    the final merge is an element-wise max over the fixed-size register
    arrays — exact regardless of how rows were split across batches.
    Returns a Dataset with ``group_cols + [n_approx]``.
    """
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(group_cols + [value_col]).to_pandas()
        rows = {c: [] for c in group_cols}
        sketches = []
        for key, g in df.groupby(group_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            for c, v in zip(group_cols, key):
                rows[c].append(v)
            sketches.append(_hll_partial(g[value_col], p).tobytes())
        out = {c: pa.array(rows[c]) for c in group_cols}
        out["_regs"] = pa.array(sketches, pa.binary(m))
        return pa.table(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        for b in g["_regs"]:
            np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
        out = g.iloc[:1][group_cols].copy()
        out["n_approx"] = int(round(_hll_estimate(regs)))
        return out

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_cols).map_groups(merge, batch_format="pandas"))


def heavy_hitters(ds, col: str, k: int, *, capacity: int | None = None) -> pd.DataFrame:
    """Approximate top-k frequent items (Misra–Gries-style summary).

    Each batch reduces to at most ``capacity`` (item, weight) rows: the
    batch's exact counts, decremented by its (capacity+1)-th largest
    count t — the Misra–Gries compression, so a partial is bounded at
    ``capacity`` rows however wide the batch's key space is. Partials
    combine by summed weights (a small groupby over O(blocks×capacity)
    rows); each batch also emits its t so the result can carry a global
    error bound: true_count - est ≤ sum(t_b) ≤ Σ n_b / (capacity+1).

    Returns a pandas DataFrame ``[col, est_count, max_err]`` with the k
    largest estimated counts (deterministic tie-break on the item).
    Exactness: any item appearing in every batch's top-``capacity`` keeps
    est = exact_count - Σt; set capacity ≥ expected distinct-per-batch
    for exact results (then t=0 and max_err=0).
    """
    capacity = capacity or 8 * k

    def partial(batch: pa.Table) -> pa.Table:
        item_type = batch.schema.field(col).type
        vc = batch.select([col]).to_pandas()[col].value_counts()
        t = 0
        if len(vc) > capacity:
            t = int(vc.iloc[capacity])
            # keep zero-weight survivors: they cost nothing and guarantee
            # the t-carrying first row exists even if all weights hit 0
            vc = vc.iloc[:capacity] - t
        n = len(vc)
        return pa.table({
            col: pa.array(vc.index.to_numpy(), type=item_type),
            "w": pa.array(vc.to_numpy(), pa.int64()),
            "__t_once": pa.array([t] + [0] * (n - 1) if n else [], pa.int64()),
        })

    from ray.data.aggregate import Sum

    # partials are O(blocks × capacity) rows — materializing them is cheap
    # and avoids re-scanning the input for the error-bound aggregate
    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    err = parts.aggregate(Sum("__t_once"))["sum(__t_once)"] or 0
    merged = (parts.groupby(col).aggregate(Sum("w", alias_name="est_count"))
              .to_pandas())
    out = (merged.sort_values(["est_count", col], ascending=[False, True])
           .head(k).reset_index(drop=True))
    out["max_err"] = int(err)
    return out


def approx_quantiles(ds, group_cols: list[str], value_col: str,
                     qs: list[float], *, bins: int = 4096) -> pd.DataFrame:
    """Approximate grouped quantiles via a mergeable fixed-bin histogram.

    Pass 1 is a tiny global min/max aggregate; pass 2 bins every value
    into ``bins`` equal-width buckets per batch (one vectorized
    ``np.bincount`` per group) and ships only non-empty (group, bin, n)
    partials — the shuffle moves O(groups × bins) rows total, independent
    of row count. Quantiles interpolate within the containing bin, so the
    absolute error is bounded by one bin width (range/bins).

    Returns a pandas DataFrame ``group_cols + [f"q{q}" ...]``.
    """
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = float(mm[f"min({value_col})"]), float(mm[f"max({value_col})"])
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / bins

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(group_cols + [value_col]).to_pandas()
        v = df[value_col].to_numpy(np.float64)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        df = df.assign(__bin=b)
        g = df.groupby(group_cols + ["__bin"], sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_cols + ["__bin"]).aggregate(Sum("n", alias_name="n"))
            .to_pandas())

    rows = []
    for key, g in hist.groupby(group_cols, sort=True):
        key = key if isinstance(key, tuple) else (key,)
        g = g.sort_values("__bin")
        counts = np.zeros(bins, np.int64)
        counts[g["__bin"].to_numpy()] = g["n"].to_numpy()
        cum = np.cumsum(counts)
        total = cum[-1]
        row = dict(zip(group_cols, key))
        for q in qs:
            target = q * total
            i = int(np.searchsorted(cum, target, side="left"))
            prev = cum[i - 1] if i > 0 else 0
            inbin = counts[i] or 1
            frac = (target - prev) / inbin
            row[f"q{q}"] = lo + (i + min(max(frac, 0.0), 1.0)) * width
        rows.append(row)
    return pd.DataFrame(rows)


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    """t-digest k1 scale function (Dunning & Ertl): k = δ/(2π)·asin(2q−1).
    dk/dq = δ/(2π·√(q(1−q))), so one unit of k-space spans
    Δq ≈ 2π·√(q(1−q))/δ of rank space — clusters are tight at the tails
    and widest at the median, which is what makes t-digest's p99/p999
    accuracy scale-free."""
    return delta / (2 * np.pi) * np.arcsin(np.clip(2 * q - 1, -1.0, 1.0))


def _tdigest_cluster(means: np.ndarray, weights: np.ndarray,
                     delta: float) -> tuple[np.ndarray, np.ndarray]:
    """Re-cluster (mean, weight) points into ≤ ~δ centroids by k-space
    quantization: sort by mean, quantize each point's mid-rank through
    _k1, and merge runs that share a floor(k) cell (weighted mean). Fully
    vectorized (argsort + cumsum + bincount); used both for the per-batch
    build (weights all 1) and for merging partial digests."""
    order = np.argsort(means, kind="stable")
    m, w = means[order], weights[order]
    W = float(w.sum())
    qmid = (np.cumsum(w) - 0.5 * w) / W
    k = np.floor(_k1(qmid, delta)).astype(np.int64)
    new = np.empty(len(k), dtype=bool)
    new[0] = True
    new[1:] = k[1:] != k[:-1]
    gid = np.cumsum(new) - 1
    n = int(gid[-1]) + 1
    wsum = np.bincount(gid, weights=w, minlength=n)
    msum = np.bincount(gid, weights=w * m, minlength=n)
    return msum / wsum, wsum


def _tdigest_quantile(means: np.ndarray, weights: np.ndarray,
                      q: float) -> float:
    """Estimate the q-quantile from a digest: centroid centers sit at
    cumulative mid-ranks; interpolate linearly between adjacent centroid
    means (np.interp clamps to the extreme centroids outside the range)."""
    centers = np.cumsum(weights) - 0.5 * weights
    return float(np.interp(q * float(weights.sum()), centers, means))


def tdigest_quantiles(ds, group_cols: list[str], value_col: str,
                      qs: list[float], *, delta: float = 256.0):
    """Approximate grouped quantiles via a mergeable t-digest.

    Unlike the fixed-bin histogram (``approx_quantiles``), accuracy needs
    no global (min, max) pre-pass and the RANK error — not the value
    error — is bounded: each k-cell spans ≤ 2π√(q(1−q))/δ of rank space,
    so tail quantiles (p99) are far tighter than central ones. Each batch
    reduces per group to ≤ ~δ (mean, weight) centroid rows (one argsort +
    bincount); partials merge by one more k-space re-clustering inside a
    grouped map_groups — merging sorted centroid streams can at most
    double a cluster's q-span, so the sound post-merge rank bound is
    ~3 × 2π√(q(1−q))/δ (one span interpolation + doubled spans).

    Returns a Dataset ``group_cols + [f"q{q}" ...]``.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(group_cols + [value_col]).to_pandas()
        rows = {c: [] for c in group_cols}
        ms, ws = [], []
        for key, g in df.groupby(group_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            v = g[value_col].to_numpy(np.float64)
            v = v[~np.isnan(v)]
            if not len(v):
                continue
            m, w = _tdigest_cluster(v, np.ones(len(v)), delta)
            for c, kv in zip(group_cols, key):
                rows[c].extend([kv] * len(m))
            ms.append(m)
            ws.append(w)
        out = {c: pa.array(rows[c]) for c in group_cols}
        out["_m"] = pa.array(np.concatenate(ms) if ms else [], pa.float64())
        out["_w"] = pa.array(np.concatenate(ws) if ws else [], pa.float64())
        return pa.table(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m, w = _tdigest_cluster(g["_m"].to_numpy(), g["_w"].to_numpy(), delta)
        out = g.iloc[:1][group_cols].copy()
        for q in qs:
            out[f"q{q}"] = _tdigest_quantile(m, w, q)
        return out

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_cols).map_groups(merge, batch_format="pandas"))


_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


def countmin_matrix(ds, key_col: str, *, width: int = 2048,
                    depth: int = 4) -> np.ndarray:
    """Mergeable Count-Min sketch of key frequencies: each batch buckets
    its keys into ``depth`` independent hash rows of ``width`` cells and
    emits only its NON-ZERO cells as (row, col, count) triples — a linear
    sketch, so per-batch partials sum exactly through one tiny grouped
    combine (≤ depth×width rows however many rows flow). Returns the
    dense [depth, width] int64 matrix on the driver; point estimate of a
    key's count = min over its depth cells (Cormode & Muthukrishnan
    2005), overestimate bounded by e·N/width w.p. 1−e^−depth."""
    from ..functions.hashing import stable_hash64
    from .bloom import _splitmix64
    from .relational import grouped_agg

    if depth > len(_CMS_SEEDS):
        raise ValueError(f"depth ≤ {len(_CMS_SEEDS)} supported")

    def local(t: pa.Table) -> pa.Table:
        h = stable_hash64(t[key_col]).view(np.uint64)
        rows, cols, cnts = [], [], []
        for d in range(depth):
            b = (_splitmix64(h ^ _CMS_SEEDS[d]) % np.uint64(width)).astype(np.int64)
            c = np.bincount(b, minlength=width)
            nz = np.flatnonzero(c)
            rows.append(np.full(len(nz), d, dtype=np.int64))
            cols.append(nz)
            cnts.append(c[nz])
        return pa.table({"row": pa.array(np.concatenate(rows)),
                         "col": pa.array(np.concatenate(cols)),
                         "c": pa.array(np.concatenate(cnts))})

    agg = grouped_agg(ds.map_batches(local, batch_format="pyarrow"),
                      ["row", "col"], {"c": ("c", "sum")}).to_pandas()
    M = np.zeros((depth, width), dtype=np.int64)
    M[agg["row"].to_numpy(), agg["col"].to_numpy()] = agg["c"].to_numpy()
    return M


def countmin_estimate(M: np.ndarray, keys: pa.Array) -> np.ndarray:
    """Point-query the CMS matrix for each key: min over depth rows."""
    from ..functions.hashing import stable_hash64
    from .bloom import _splitmix64

    depth, width = M.shape
    h = stable_hash64(keys).view(np.uint64)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        b = (_splitmix64(h ^ _CMS_SEEDS[d]) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, M[d, b])
    return est


def _kmv_partial(keys: pa.Array | pa.ChunkedArray, k: int) -> np.ndarray:
    """Bottom-k of the 64-bit key hashes in one batch (sorted uint64).

    stable_hash64 (crc32 over string uniques) only fills 32 bits, so the
    values are spread over the full uint64 range through one splitmix64
    round (a bijection — distinct stays distinct) before taking the k
    minima; the KMV estimator needs hashes ~Uniform[0, 2^64)."""
    from ..functions.hashing import stable_hash64
    from .bloom import _splitmix64

    h = np.unique(_splitmix64(stable_hash64(keys).view(np.uint64)))
    return h[:k]  # np.unique sorts ascending → prefix = bottom-k


def _kmv_estimate(sk: np.ndarray, k: int) -> float:
    """Distinct-count estimate from a bottom-k sketch: exact while the
    sketch is unsaturated, else (k-1)/U_(k) (Bar-Yossef et al. 2002)."""
    if len(sk) < k:
        return float(len(sk))
    u = (float(sk[k - 1]) + 1.0) / 2.0 ** 64
    return (k - 1) / u


def kmv_set_relations(ds, tag_col: str, key_col: str, *, k: int = 256):
    """Distinct-set algebra between tagged key populations via mergeable
    bottom-k (KMV / theta-style) sketches.

    Each batch reduces to one sorted uint64[<=k] blob per tag (its bottom-k
    distinct key hashes); partials merge by re-taking the bottom-k of the
    union — exact under any batch split, O(tags x k x 8B) ever shuffled.
    Per tag pair the merged union sketch K = bottom-k(A ∪ B) is an
    order-statistics sample of A ∪ B, so
        |A∪B| ≈ (k-1)/U_(k),   ρ̂ = |{v ∈ K: v ∈ A ∧ v ∈ B}| / |K|,
        |A∩B| ≈ ρ̂·|A∪B|,       Jaccard ≈ ρ̂
    (Beyer et al. 2007). Relative error of the cardinalities ~1/√(k-2);
    ρ̂ is a without-replacement proportion with SE ≤ √(ρ(1-ρ)/|K|).

    Returns a pandas DataFrame with one row per unordered tag pair:
    [tag_a, tag_b, n_a_est, n_b_est, union_est, inter_est, jaccard_est]
    (driver-side algebra over the O(tags) merged sketches only).
    """

    def partial(batch: pa.Table) -> pa.Table:
        tags, blobs = [], []
        enc = batch[tag_col].combine_chunks().dictionary_encode()
        idx = np.asarray(enc.indices.to_numpy(zero_copy_only=False))
        for ti, tag in enumerate(enc.dictionary.to_pylist()):
            keys = batch[key_col].combine_chunks().take(
                pa.array(np.flatnonzero(idx == ti)))
            tags.append(tag)
            blobs.append(_kmv_partial(keys, k).tobytes())
        return pa.table({tag_col: pa.array(tags, batch.schema.field(tag_col).type),
                         "_sk": pa.array(blobs, pa.binary())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        sk = np.unique(np.concatenate(
            [np.frombuffer(b, dtype=np.uint64) for b in g["_sk"]]))[:k]
        out = g.iloc[:1][[tag_col]].copy()
        out["_sk"] = [sk.tobytes()]
        return out

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(tag_col).map_groups(merge, batch_format="pandas")
              .to_pandas())
    sketches = {r[tag_col]: np.frombuffer(r["_sk"], dtype=np.uint64)
                for _, r in merged.iterrows()}
    rows = []
    for a, b in ((a, b) for a in sorted(sketches) for b in sorted(sketches)
                 if a < b):
        A, B = sketches[a], sketches[b]
        K = np.unique(np.concatenate([A, B]))[:k]
        union = _kmv_estimate(K, k)
        rho = float(np.mean(np.isin(K, A) & np.isin(K, B))) if len(K) else 0.0
        rows.append({"tag_a": a, "tag_b": b,
                     "n_a_est": _kmv_estimate(A, k),
                     "n_b_est": _kmv_estimate(B, k),
                     "union_est": union, "inter_est": rho * union,
                     "jaccard_est": rho})
    return pd.DataFrame(rows)


# ------------------------------------------------------------- ddsketch --

def _dd_bucket(v: np.ndarray, gamma: float, n_bins: int):
    """Log-bucket a strictly-positive value array into a dense
    histogram: bucket index i = ceil(log_γ(v)), clipped into
    [offset, offset+n_bins) with out-of-range values saturating the
    edge bins (counted so the guarantee check can exclude them)."""
    if not len(v):
        return np.zeros(n_bins, np.int64), 0
    idx = np.ceil(np.log(v) / np.log(gamma)).astype(np.int64)
    offset = -(n_bins // 2)
    clipped = np.clip(idx - offset, 0, n_bins - 1)
    n_sat = int(((idx - offset < 0) | (idx - offset >= n_bins)).sum())
    return np.bincount(clipped, minlength=n_bins).astype(np.int64), n_sat


def _dd_partial(values: np.ndarray, gamma: float, n_bins: int):
    """One DDSketch partial: TWO dense log-bucket histograms — a
    mirrored store for negative values (bucketed on |v|) and the
    positive store — plus the zero count (the canonical DDSketch
    three-store layout, so data containing negatives gets exact rank
    accounting instead of silently dropped rows). Partials merge by
    addition — the exact-merge property every sketch here shares."""
    fin = values[np.isfinite(values)]
    zeros = int((fin == 0).sum())
    pos, sat_p = _dd_bucket(fin[fin > 0], gamma, n_bins)
    neg, sat_n = _dd_bucket(-fin[fin < 0], gamma, n_bins)
    return neg, pos, zeros, sat_p + sat_n


def _dd_quantile(neg: np.ndarray, counts: np.ndarray, zeros: int,
                 gamma: float, n_bins: int, q: float) -> float:
    """Quantile read-out across the three stores in value order —
    negatives (descending |v|-bucket index = ascending value), zeros,
    positives: rank → first bucket whose cumulative count covers it;
    estimate = signed bucket midpoint ±2γ^i/(γ+1), which is within a
    factor (γ−1)/(γ+1) = α of every value in the bucket — DDSketch's
    relative-error THEOREM (Masson, Rim & Lee 2019), the invariant
    the registered query asserts exactly."""
    n_neg = int(neg.sum())
    total = n_neg + int(counts.sum()) + zeros
    if total == 0:
        return float("nan")
    rank = max(int(np.ceil(q * total)), 1)
    offset = -(n_bins // 2)
    if rank <= n_neg:
        # most-negative first: walk the mirrored store high-index down
        cum = np.cumsum(neg[::-1])
        b = int(np.searchsorted(cum, rank))
        i = (n_bins - 1 - b) + offset
        return float(-2.0 * gamma ** i / (gamma + 1.0))
    if rank <= n_neg + zeros:
        return 0.0
    cum = n_neg + zeros + np.cumsum(counts)
    b = int(np.searchsorted(cum, rank))
    i = b + offset
    return float(2.0 * gamma ** i / (gamma + 1.0))


def ddsketch_quantiles(ds, group_cols: list[str], value_col: str,
                       qs: list[float], *, alpha: float = 0.01,
                       n_bins: int = 4096) -> pd.DataFrame:
    """Grouped quantiles with GUARANTEED α-relative error (DDSketch,
    Masson et al. 2019, public): per-batch per-group log-bucket
    histograms (one int64[n_bins] partial per group — fixed size at
    any row count), summed through one tiny grouped exchange, read out
    on the driver. Complements t-digest (rank-space accuracy, no bound)
    with the observability-standard VALUE-space bound: every returned
    estimate is within ±α of SOME true sample value at that rank,
    provably — which is what makes the op exactly value-checkable
    despite being approximate."""
    gamma = (1.0 + alpha) / (1.0 - alpha)

    def partial(t: pa.Table) -> pa.Table:
        df_cols = {c: t[c] for c in group_cols}
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        df = pa.table({**df_cols, "__v": pa.array(vals)}).to_pandas()
        rows = {c: [] for c in group_cols}
        rows["neg"], rows["counts"] = [], []
        rows["zeros"], rows["sat"] = [], []
        for key, g in df.groupby(group_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            neg, counts, zeros, sat = _dd_partial(g["__v"].to_numpy(),
                                                  gamma, n_bins)
            for c, kv in zip(group_cols, key):
                rows[c].append(kv)
            rows["neg"].append(neg.tobytes())
            rows["counts"].append(counts.tobytes())
            rows["zeros"].append(zeros)
            rows["sat"].append(sat)
        out = {c: pa.array(rows[c]) for c in group_cols}
        out["neg"] = pa.array(rows["neg"], pa.binary())
        out["counts"] = pa.array(rows["counts"], pa.binary())
        out["zeros"] = pa.array(rows["zeros"], pa.int64())
        out["sat"] = pa.array(rows["sat"], pa.int64())
        return pa.table(out)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        total = np.zeros(n_bins, np.int64)
        for b in df["counts"]:
            total += np.frombuffer(b, dtype=np.int64)
        total_n = np.zeros(n_bins, np.int64)
        for b in df["neg"]:
            total_n += np.frombuffer(b, dtype=np.int64)
        out = df.iloc[:1][group_cols].copy()
        out["neg"] = [total_n.tobytes()]
        out["counts"] = [total.tobytes()]
        out["zeros"] = int(df["zeros"].sum())
        out["sat"] = int(df["sat"].sum())
        return out

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(group_cols)
              .map_groups(merge, batch_format="pandas")
              .to_pandas())
    rows = []
    for _, r in merged.iterrows():  # O(groups) driver rows
        neg = np.frombuffer(r["neg"], dtype=np.int64)
        counts = np.frombuffer(r["counts"], dtype=np.int64)
        row = {c: r[c] for c in group_cols}
        row["sat"] = int(r["sat"])
        row["n_neg"] = int(neg.sum())
        for q in qs:
            row[f"p{int(q * 100)}"] = _dd_quantile(
                neg, counts, int(r["zeros"]), gamma, n_bins, q)
        rows.append(row)
    return pd.DataFrame(rows)
