"""Graph operators — distributed connected components (dedup scale path).

The dedup family labels duplicate clusters through
``connected_components`` below (via ``dedup._components_dataset``), which
is size-adaptive: while the edge list is small (duplicates a small
fraction of the corpus) a driver-side union-find over just the endpoints
wins; when it is not (e.g. 90%-duplicate crawl snapshots) the iterative
min-label propagation path keeps edges and labels as distributed Datasets
where every step is a hash-partitioned join + grouped min — no
driver-side state beyond a convergence scalar.

Reference parity note: riptano/logparse has no graph ops; this is a
graft-mandated training-data operator (duplicate-pair clustering).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .relational import grouped_agg, hash_join


def connected_components(edges, *, a_col: str = "a", b_col: str = "b",
                         nodes=None, node_col: str | None = None,
                         max_iters: int = 25,
                         target_rows_per_block: int = 500_000,
                         driver_threshold: int = 2_000_000):
    """Connected components over an undirected edge Dataset.

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels (one ``hash_join`` of the
    symmetrized edges against the current labels + one grouped min), so
    labels converge to the component's minimum node id in at most
    ``diameter`` rounds. Convergence is detected by the (monotonically
    decreasing) global label sum; each round's labels are materialized —
    they are O(nodes) small rows, and without it the lazy plan would
    re-execute every prior round per iteration.

    ``nodes``: optional Dataset of ``node_col`` ids to include as
    singletons (nodes absent from any edge). Returns a Dataset with
    columns ``(node, cluster_id)`` where cluster_id is the component's
    min node id. Node ids must be a numeric or string type joinable by
    ``hash_join``; labels must support Arrow ``min`` and ``sum``
    (convergence probe), i.e. numeric ids.

    Scale shape: per round, one all-to-all of the edge list (joined
    against O(nodes) labels) — the standard label-propagation CC; for
    dedup workloads component diameters are tiny (near-cliques), so
    rounds ≈ 2–3. ``max_iters`` guards pathological chains.

    Size-adaptive: when the (already-materialized) edge list has
    ≤ ``driver_threshold`` rows, the iterative shuffle loop is replaced by
    a driver-side union-find over just the edge ENDPOINTS with the label
    map broadcast back (``ray.put`` once, vectorized lookup per batch) —
    the realistic dedup regime (duplicate pairs ≪ corpus) costs one
    execution instead of ~2 per round. The distributed loop remains the
    path for edge lists that don't fit the driver.
    """
    from ray.data.aggregate import Sum

    def sym(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.concat_arrays([t[a_col].combine_chunks(),
                                     t[b_col].combine_chunks()]),
            "dst": pa.concat_arrays([t[b_col].combine_chunks(),
                                     t[a_col].combine_chunks()]),
        })

    edges_sym = edges.map_batches(sym, batch_format="pyarrow").materialize()

    if edges_sym.count() <= driver_threshold:
        return _driver_cc(edges_sym, nodes, node_col or "node")

    seeds = edges_sym.map_batches(
        lambda t: pa.table({"node": t["src"], "label": t["src"]}),
        batch_format="pyarrow")
    if nodes is not None:
        nc = node_col or "node"
        seeds = seeds.union(nodes.map_batches(
            lambda t: pa.table({"node": t[nc], "label": t[nc]}),
            batch_format="pyarrow"))
    labels = grouped_agg(seeds, ["node"], {"label": ("label", "min")}).materialize()
    # Coalesce the shuffle's fan-out: a grouped agg emits as many (mostly
    # tiny) blocks as its shuffle width, and every later round's shuffle
    # width follows its INPUT block count — left unchecked, each round
    # pays O(blocks²) scheduling overhead (measured 19 s/round on a
    # 5 k-label toy graph vs 2 s after coalescing). Non-shuffle
    # repartition is a cheap block merge; nblocks tracks label volume.
    nblocks = max(1, min(1024, -(-labels.count() // target_rows_per_block)))
    labels = labels.repartition(nblocks).materialize()

    if edges_sym.count() == 0:
        # no edges: every node is its own singleton component
        return labels.map_batches(
            lambda t: pa.table({"node": t["node"], "cluster_id": t["label"]}),
            batch_format="pyarrow")

    prev_sum = labels.aggregate(Sum("label"))["sum(label)"]

    for _ in range(max_iters):
        lab_src = labels.map_batches(
            lambda t: pa.table({"src": t["node"], "label": t["label"]}),
            batch_format="pyarrow")
        # neighbor candidates: every dst receives its src's current label
        cand = hash_join(edges_sym, lab_src, on="src").map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
            batch_format="pyarrow")
        labels = grouped_agg(cand.union(labels), ["node"],
                             {"label": ("label", "min")}
                             ).repartition(nblocks).materialize()
        cur_sum = labels.aggregate(Sum("label"))["sum(label)"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow")


def _driver_cc(edges_sym, nodes, node_col: str):
    """Small-edge-list path: union-find on the driver over edge endpoints,
    labels broadcast once; nodes not touched by any edge are their own
    singleton cluster and never leave their batch."""
    import numpy as np

    pairs = edges_sym.to_pandas()
    if len(pairs) == 0:  # empty edge list → no columns in the frame
        import pandas as pd

        pairs = pd.DataFrame({"src": np.array([], np.int64),
                              "dst": np.array([], np.int64)})
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for s, d in zip(pairs["src"].to_numpy(), pairs["dst"].to_numpy()):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    endpoints = set(pairs["src"].tolist())
    label_map = {n: find(n) for n in endpoints}

    keys = np.array(sorted(label_map), dtype=np.int64)
    vals = np.array([label_map[k] for k in keys], dtype=np.int64)

    ref = None
    try:
        import ray

        if ray.is_initialized():
            ref = ray.put((keys, vals))
    except Exception:
        ref = None
    local = (keys, vals) if ref is None else None

    if nodes is None:
        return __import__("ray").data.from_arrow(pa.table({
            "node": pa.array(keys), "cluster_id": pa.array(vals)}))

    def assign(t: pa.Table) -> pa.Table:
        ks, vs = local if ref is None else __import__("ray").get(ref)
        node = t[node_col].to_numpy(zero_copy_only=False)
        out = np.asarray(node, dtype=np.int64).copy()
        if len(ks):
            idx = np.clip(np.searchsorted(ks, out), 0, len(ks) - 1)
            hit = ks[idx] == out
            out[hit] = vs[idx[hit]]
        return pa.table({"node": pa.array(np.asarray(node)),
                         "cluster_id": pa.array(out)})

    return nodes.map_batches(assign, batch_format="pyarrow")


def pagerank(edges, *, src_col: str = "src", dst_col: str = "dst",
             iters: int = 3, total: int = 10**12,
             broadcast_threshold: int = 20_000_000):
    """Integer-arithmetic PageRank power iteration (damping 0.85).

    All arithmetic is int64 floor-division — ``r' = (15·(total//n))//100 +
    (85·Σ_{u→v}(r_u // d_u))//100`` — so partial sums combine
    order-independently and the distributed result is EXACTLY replayable
    (and SQL-oracle-able) down to the last unit; no float summation-order
    drift across engines, cluster sizes, or formulations.

    Two formulations, chosen by node count:

    - **broadcast** (n ≤ ``broadcast_threshold``): the edge Dataset is the
      big side and never leaves its partitions — each iteration is one
      ``map_batches`` pass emitting per-batch (dst, partial-sum) combiner
      rows plus one small grouped sum; the rank vector rides along as a
      ``ray.put`` broadcast. Returns a pandas DataFrame (node, rank).
    - **join** (n above the threshold — rank vector outgrows a per-worker
      broadcast, e.g. 10⁹-node web graphs): ranks stay a distributed
      (node, d, r) Dataset; each iteration hash-joins per-node
      contributions onto the edges (grouped-by-dst partial sums fused
      into the join buckets via ``bucket_post``), finishes the sums with
      one grouped agg, and left-joins them back onto the node table with
      the rank update fused into the join buckets. Edges re-shuffle once
      per iteration — the price of not holding ranks anywhere whole.
      Returns a Dataset (node, rank).

    Both produce bit-identical ranks (integer arithmetic; forced-path
    equality is tested).

    ``edges`` must already contain both directions if the graph is
    undirected. Every node must appear as a src (degree ≥ 1)."""
    import numpy as np
    import ray

    deg_ds = grouped_agg(edges, [src_col], {"d": (src_col, "count")}).materialize()
    n = deg_ds.count()
    base = total // n

    if n <= broadcast_threshold:
        deg = deg_ds.to_pandas()
        nodes = np.sort(deg[src_col].to_numpy().astype(np.int64))
        d = deg.set_index(src_col).loc[nodes, "d"].to_numpy().astype(np.int64)
        r = np.full(n, base, dtype=np.int64)

        for _ in range(iters):
            ref = ray.put((nodes, r // d))

            def partials(t: pa.Table) -> pa.Table:
                nod, contrib = ray.get(ref)
                s = t[src_col].to_numpy(zero_copy_only=False)
                dst = t[dst_col].to_numpy(zero_copy_only=False)
                c = contrib[np.searchsorted(nod, s)]
                u, inv = np.unique(dst, return_inverse=True)
                m = np.zeros(len(u), dtype=np.int64)
                np.add.at(m, inv, c)
                return pa.table({"node": pa.array(u.astype(np.int64)),
                                 "m": pa.array(m)})

            agg = grouped_agg(edges.map_batches(partials, batch_format="pyarrow"),
                              ["node"], {"m": ("m", "sum")}).to_pandas()
            m = np.zeros(n, dtype=np.int64)
            idx = np.searchsorted(nodes, agg["node"].to_numpy().astype(np.int64))
            m[idx] = agg["m"].to_numpy().astype(np.int64)
            r = (15 * base) // 100 + (85 * m) // 100

        return pd.DataFrame({"node": nodes, "rank": r})

    # ------------------------------------------------ join formulation ---
    import numpy as _np

    ranks = deg_ds.map_batches(
        lambda t: pa.table({
            "node": pc.cast(t[src_col], pa.int64()),
            "d": pc.cast(t["d"], pa.int64()),
            "r": pa.array(_np.full(t.num_rows, base, _np.int64))}),
        batch_format="pyarrow").materialize()
    rank_schema = pa.schema([("node", pa.int64()), ("d", pa.int64()),
                             ("r", pa.int64())])
    edge_keyed = edges.map_batches(
        lambda t: pa.table({"node": pc.cast(t[src_col], pa.int64()),
                            "_dst": pc.cast(t[dst_col], pa.int64())}),
        batch_format="pyarrow")
    edge_schema = pa.schema([("node", pa.int64()), ("_dst", pa.int64())])

    def contrib_of(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        return pa.table({"node": t["node"], "c": pa.array(r // d)})

    def dst_partials(df: pd.DataFrame) -> pd.DataFrame:
        # fused into the src-keyed join buckets: a dst spans buckets, so
        # these are partial sums — finished by the grouped_agg below
        g = df.groupby("_dst", as_index=False)["c"].sum()
        return pd.DataFrame({"node": g["_dst"].astype("int64"),
                             "m": g["c"].astype("int64")})

    def rank_update(df: pd.DataFrame) -> pd.DataFrame:
        m = df["m"].fillna(0).astype("int64")  # no in-edges → m = 0
        return pd.DataFrame({
            "node": df["node"].astype("int64"),
            "d": df["d"].astype("int64"),
            "r": (15 * base) // 100 + (85 * m.to_numpy()) // 100})

    for _ in range(iters):
        contrib = ranks.map_batches(contrib_of, batch_format="pyarrow")
        j = hash_join(edge_keyed, contrib, "node", bucket_post=dst_partials,
                      left_schema=edge_schema,
                      right_schema=pa.schema([("node", pa.int64()),
                                              ("c", pa.int64())]))
        m = grouped_agg(j, ["node"], {"m": ("m", "sum")})
        ranks = hash_join(
            ranks, m, "node", how="left", bucket_post=rank_update,
            left_schema=rank_schema,
            right_schema=pa.schema([("node", pa.int64()),
                                    ("m", pa.int64())])).materialize()

    return ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "rank": t["r"]}),
        batch_format="pyarrow")


def cooccurrence_edges(ds, group_col: str, item_col: str, *,
                       min_support: int = 1,
                       num_buckets: int | None = None):
    """Canonical co-occurrence edge list: two items are linked iff they
    appear under the same ``group_col`` value (e.g. parts in the same
    order) — at least ``min_support`` times when > 1 (the basket-support
    threshold, the standard sparsifier for dense co-occurrence graphs).
    Output columns (u, v) with u < v, globally distinct.

    One bucket shuffle by group (groups never straddle buckets), then a
    vectorized within-bucket self-merge generates pairs; per-bucket dedup
    (or partial pair counts under a support threshold) keeps the second
    exchange small. Pair fan-out is bounded by the largest group's size
    squared — callers with huge groups should cap or sample groups
    first."""
    from .relational import distinct, grouped_agg
    from .window import _bucketed_apply

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[group_col, item_col]].drop_duplicates()
        m = d.merge(d, on=group_col, suffixes=("_a", "_b"))
        a = m[f"{item_col}_a"].to_numpy()
        b = m[f"{item_col}_b"].to_numpy()
        keep = a < b
        out = pd.DataFrame({"u": a[keep], "v": b[keep]})
        if min_support > 1:
            # partial per-bucket counts; the global support filter runs
            # after the grouped combine (a pair's groups span buckets)
            return (out.groupby(["u", "v"], sort=False).size()
                    .rename("c").reset_index())
        return out.drop_duplicates()

    pairs = _bucketed_apply(ds, group_col, per_bucket,
                            num_buckets=num_buckets)
    if min_support > 1:
        import pyarrow.compute as _pc

        counted = grouped_agg(pairs, ["u", "v"], {"c": ("c", "sum")})
        return counted.map_batches(
            lambda t: t.filter(_pc.greater_equal(t["c"], min_support))
            .select(["u", "v"]), batch_format="pyarrow")
    return distinct(pairs, ["u", "v"])


def triangle_counts(edges, *, out_col: str = "n_triangles",
                    orient: str = "id"):
    """Per-lowest-vertex triangle counts on an undirected simple graph
    given canonical distinct edges (u < v) — distributed wedge-closing:
    generate length-2 paths under an acyclic edge orientation, then a
    large×large semi join against the edge set keeps the wedges that
    close into triangles. Two orientations, both emitting each triangle
    exactly once, keyed by its MINIMUM VERTEX ID:

    - ``orient='id'`` (default): direct u→v by vertex id. Three narrow
      exchanges (wedge join on the middle vertex + closing semi join).
      Fastest when the degree distribution is flat — e.g. co-occurrence
      graphs with bounded group sizes — because degree ordering can't
      shrink the wedge count there and its extra rank joins + wider wedge
      rows only add shuffle bytes (measured 4× slower on the near-regular
      parts graph).
    - ``orient='degree'``: direct each edge from its lower-(degree, id)
      endpoint (compact-forward). Bounds every out-degree by O(√m) so the
      wedge intermediate is O(m^1.5) — the scale-safe choice for skewed
      graphs, where a single hub's Σ deg² wedge explosion breaks the id
      orientation. Costs one combiner degree count + two rank joins extra.

    All stages are hash-shuffles, nothing driver-side; ``edges`` is
    materialized once (an edge list is ≪ the input it was derived from)
    because it feeds several legs."""
    from .relational import grouped_agg, hash_join, hash_semi_join

    edges = edges.materialize()

    if orient == "id":
        # Wedge-count control (r5 10× soak finding): the raw wedge set
        # is orders of magnitude larger than the edge set (~450M wedge
        # rows from 21M edges on the rep-9 parts graph) — emitting it
        # into the object store and re-shuffling it through the closing
        # semi join jammed the executor's memory budget at ~9× sf0.1.
        # Fix: a Bloom filter over the packed (u, w) edge keys (sized
        # ~16 bits/edge, built distributed, broadcast once via ray.put)
        # prunes wedges INSIDE the wedge-join buckets (bucket_post), so
        # only probable triangles (+ ~0.1% false positives) ever leave
        # the join; the exact semi join then removes the residue. The
        # wedge intermediate never materializes.
        from .bloom import BloomFilter, build_bloom

        packed = edges.map_batches(
            lambda t: pa.table({"uw": pc.add(pc.multiply(
                pc.cast(t["u"], pa.int64()), 1 << 32),
                pc.cast(t["v"], pa.int64()))}),
            batch_format="pyarrow")
        n_edges = edges.count()  # metadata-cheap: edges is materialized
        m_bits = 1 << max(20, int(np.ceil(np.log2(max(1, 16 * n_edges)))))
        bloom = build_bloom(packed, "uw", m_bits=m_bits, k=5)
        bref = None
        try:
            import ray

            if ray.is_initialized():
                bref = ray.put((bloom.m, bloom.k, bloom.bits))
        except Exception:
            bref = None
        local = (bloom.m, bloom.k, bloom.bits) if bref is None else None

        def prune_wedges(df):
            m, k, bits = (local if bref is None
                          else __import__("ray").get(bref))
            f = BloomFilter(m, k, bits)
            key = ((df["u"].to_numpy().astype(np.int64) << 32)
                   | df["w"].to_numpy().astype(np.int64))
            return df[f.contains(key)]

        left = edges.map_batches(
            lambda t: t.rename_columns(["u", "mid"]), batch_format="pyarrow")
        right = edges.map_batches(
            lambda t: t.rename_columns(["mid", "w"]), batch_format="pyarrow")
        wedges = hash_join(left, right, on="mid",
                           bucket_post=prune_wedges)
        # static schemas: wedges sits behind the join all-to-all, so
        # .schema() discovery would execute that whole shuffle once for
        # discovery and again for the real run
        closed = hash_semi_join(
            wedges, edges.map_batches(
                lambda t: t.rename_columns(["u", "w"]),
                batch_format="pyarrow"),
            on=["u", "w"],
            left_schema=pa.schema([("mid", pa.int64()), ("u", pa.int64()),
                                   ("w", pa.int64())]),
            right_schema=pa.schema([("u", pa.int64()),
                                    ("w", pa.int64())]))
        return grouped_agg(closed, ["u"], {out_col: ("w", "count")})

    # degree per vertex, combiner-aggregated
    ends = edges.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays(
            [t["u"].combine_chunks(), t["v"].combine_chunks()])}),
        batch_format="pyarrow")
    deg = grouped_agg(ends, ["node"], {"deg": ("node", "count")})
    # total order (deg, id) packed into one int64 rank key (id < 2^31)
    rk = deg.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "rk": pc.add(pc.multiply(pc.cast(t["deg"], pa.int64()),
                                     1 << 32), t["node"])}),
        batch_format="pyarrow")

    e_u = hash_join(
        edges.map_batches(lambda t: t.rename_columns(["node", "v"]),
                          batch_format="pyarrow"),
        rk, on="node").map_batches(
        lambda t: pa.table({"u_id": t["node"], "v_id": t["v"],
                            "ru": t["rk"]}), batch_format="pyarrow")
    e_uv = hash_join(
        e_u.map_batches(lambda t: t.rename_columns(["u_id", "node", "ru"]),
                        batch_format="pyarrow"),
        rk, on="node")

    def orient(t: pa.Table) -> pa.Table:
        lo = pc.less(t["ru"], t["rk"])
        return pa.table({
            "a": pc.if_else(lo, t["ru"], t["rk"]),
            "b": pc.if_else(lo, t["rk"], t["ru"]),
            "a_id": pc.if_else(lo, t["u_id"], t["node"]),
            "b_id": pc.if_else(lo, t["node"], t["u_id"]),
        })

    directed = e_uv.map_batches(orient, batch_format="pyarrow").materialize()
    d_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                          ("a_id", pa.int64()), ("b_id", pa.int64())])

    def keep_lt(df):
        return df[df["b"] < df["c"]]

    wedges = hash_join(
        directed,
        directed.map_batches(
            lambda t: pa.table({"a": t["a"], "c": t["b"], "c_id": t["b_id"]}),
            batch_format="pyarrow"),
        on="a", bucket_post=keep_lt,
        left_schema=d_schema,
        right_schema=pa.schema([("a", pa.int64()), ("c", pa.int64()),
                                ("c_id", pa.int64())]))
    closed = hash_semi_join(
        wedges.map_batches(lambda t: pa.table(
            {"a": t["b"], "b": t["c"], "a_id": t["a_id"],
             "b_id": t["b_id"], "c_id": t["c_id"]}), batch_format="pyarrow"),
        directed.map_batches(lambda t: t.select(["a", "b"]),
                             batch_format="pyarrow"),
        on=["a", "b"], right_schema=pa.schema([("a", pa.int64()),
                                               ("b", pa.int64())]))

    def min_id(t: pa.Table) -> pa.Table:
        m = pc.min_element_wise(pc.min_element_wise(t["a_id"], t["b_id"]),
                                t["c_id"])
        return pa.table({"u": m})

    tri = closed.map_batches(min_id, batch_format="pyarrow")
    return grouped_agg(tri, ["u"], {out_col: ("u", "count")})


def bfs_levels(edges, source, *, u_col: str = "u", v_col: str = "v",
               max_depth: int = 3):
    """Breadth-first search levels from ``source`` on an undirected edge
    Dataset, bounded by ``max_depth`` — distributed frontier expansion:
    each round joins the CURRENT frontier against the symmetrized edge
    list (one hash shuffle), dedups the discovered neighbors, and
    anti-joins the visited set (frontiers and visited are O(reached
    nodes), orders of magnitude below the edge list; the edge list is
    materialized once and re-joined per round). Returns (node, level)
    for every node within ``max_depth`` hops, level 0 = source."""
    from .relational import distinct, hash_join, hash_semi_join

    sym = edges.map_batches(
        lambda t: pa.table({
            "node": pa.concat_arrays([t[u_col].combine_chunks(),
                                      t[v_col].combine_chunks()]),
            "nbr": pa.concat_arrays([t[v_col].combine_chunks(),
                                     t[u_col].combine_chunks()])}),
        batch_format="pyarrow").materialize()

    import ray.data

    frontier = ray.data.from_arrow(
        pa.table({"node": pa.array([source], pa.int64())})).materialize()
    visited = frontier
    out = [pd.DataFrame({"node": [source], "level": [0]})]
    for depth in range(1, max_depth + 1):
        nxt = distinct(
            hash_join(frontier, sym, on="node",
                      left_schema=pa.schema([("node", pa.int64())]),
                      right_schema=pa.schema([("node", pa.int64()),
                                              ("nbr", pa.int64())])
                      ).map_batches(
                lambda t: pa.table({"node": t["nbr"]}),
                batch_format="pyarrow"),
            ["node"])
        fresh = hash_semi_join(
            nxt, visited, on="node", anti=True,
            left_schema=pa.schema([("node", pa.int64())]),
            right_schema=pa.schema([("node", pa.int64())])).materialize()
        if fresh.count() == 0:
            break
        out.append(pd.DataFrame({
            "node": fresh.to_pandas()["node"].to_numpy(),
            "level": depth}))
        visited = visited.union(fresh).materialize()
        frontier = fresh
    return pd.concat(out, ignore_index=True)


def sssp(edges, source, *, u_col: str = "u", v_col: str = "v",
         w_col: str = "w", rounds: int = 3):
    """Weighted single-source shortest paths over an undirected edge
    Dataset, by bounded frontier relaxation (the Bellman–Ford frontier
    form): after ``rounds`` rounds every returned ``(node, dist)`` is the
    EXACT minimum cost over paths of ≤ ``rounds`` edges from ``source``
    (set ``rounds ≥ V−1`` for full convergence; non-negative int64
    weights keep parity with SQL exact).

    Distributed shape per round: the IMPROVED frontier — O(improved
    nodes), orders below the edge list — joins the symmetrized edges
    (one key exchange); relaxed candidates and the current distance
    table reduce together through ONE grouped min carrying a
    null-tagged ``d_old`` column, so "new best" and "did it improve"
    come out of the same exchange. The distance table stays a Dataset
    end to end — never driver-resident. Converges early when no node
    improves."""
    import ray.data

    from .relational import grouped_agg

    sym = edges.map_batches(
        lambda t: pa.table({
            "node": pa.concat_arrays([t[u_col].combine_chunks(),
                                      t[v_col].combine_chunks()]),
            "nbr": pa.concat_arrays([t[v_col].combine_chunks(),
                                     t[u_col].combine_chunks()]),
            "w": pa.concat_arrays(
                [pc.cast(t[w_col], pa.int64()).combine_chunks()] * 2)}),
        batch_format="pyarrow").materialize()

    dist = ray.data.from_arrow(pa.table({
        "node": pa.array([source], pa.int64()),
        "dist": pa.array([0], pa.int64())})).materialize()
    frontier = dist
    dist_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])
    sym_schema = pa.schema([("node", pa.int64()), ("nbr", pa.int64()),
                            ("w", pa.int64())])

    for _ in range(rounds):
        cand = hash_join(frontier, sym, on="node",
                         left_schema=dist_schema,
                         right_schema=sym_schema).map_batches(
            lambda t: pa.table({
                "node": t["nbr"],
                "d_old": pa.nulls(t.num_rows, pa.int64()),
                "d_all": pc.add(t["dist"], t["w"])}),
            batch_format="pyarrow")
        old = dist.map_batches(
            lambda t: pa.table({"node": t["node"], "d_old": t["dist"],
                                "d_all": t["dist"]}),
            batch_format="pyarrow")
        # grouped min skips nulls: d_old = previous distance (null when
        # the node is newly reached), d_all = best over old ∪ candidates
        agg = grouped_agg(old.union(cand), ["node"],
                          {"d_old": ("d_old", "min"),
                           "d_all": ("d_all", "min")}).materialize()
        frontier = agg.map_batches(
            lambda t: (lambda keep: pa.table({
                "node": t.filter(keep)["node"],
                "dist": t.filter(keep)["d_all"]}))(
                pc.or_kleene(t["d_old"].is_null(),
                             pc.less(t["d_all"], t["d_old"]))),
            batch_format="pyarrow").materialize()
        dist = agg.map_batches(
            lambda t: pa.table({"node": t["node"], "dist": t["d_all"]}),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
    return dist


def k_core(edges, k: int, *, max_rounds: int = 200):
    """k-core via distributed iterative peel: repeatedly drop nodes of
    degree < k (and their incident edges) until a fixpoint. Returns a
    Dataset of ``(node,)`` — the members of the k-core (empty when none).

    Scale shape: each round is one grouped degree count + two large×large
    ANTI semi-joins (removed nodes never broadcast); the symmetrized edge
    list is re-materialized per round so round r+1 reads round r's blocks
    instead of re-executing the whole peel chain (the same per-round
    pinning ``connected_components`` uses). Rounds are bounded by the
    peel depth (the degeneracy ordering's layer count), not by V.

    Correctness characterization used by the query-level oracle: the
    k-core is the UNIQUE maximal subgraph with min-degree ≥ k, so
    "every member has ≥ k member-neighbors" AND "no excluded node has
    ≥ k member-neighbors" together verify the result completely.
    """
    import pyarrow.compute as pc

    from .relational import grouped_agg, hash_semi_join

    def sym(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"s": t["u"], "d": t["v"]}),
            pa.table({"s": t["v"], "d": t["u"]}),
        ])

    alive = edges.map_batches(sym, batch_format="pyarrow").materialize()
    s_schema = pa.schema([("s", pa.int64())])
    d_schema = pa.schema([("d", pa.int64())])
    for _ in range(max_rounds):
        deg = grouped_agg(alive, ["s"], {"n": ("s", "count")})
        removed = deg.map_batches(
            lambda t: t.filter(pc.less(t["n"], k)).select(["s"]),
            batch_format="pyarrow")
        if removed.count() == 0:
            break
        alive = hash_semi_join(alive, removed, on="s", anti=True,
                               right_schema=s_schema)
        removed_d = removed.map_batches(
            lambda t: t.rename_columns(["d"]), batch_format="pyarrow")
        alive = hash_semi_join(alive, removed_d, on="d", anti=True,
                               right_schema=d_schema).materialize()
    return grouped_agg(alive, ["s"], {"n": ("s", "count")}).map_batches(
        lambda t: pa.table({"node": t["s"]}), batch_format="pyarrow")


def link_prediction(edges, *, max_middle_degree: int | None = None,
                    k: int = 50, num_buckets: int | None = None):
    """Common-neighbor link prediction (Liben-Nowell & Kleinberg 2007)
    over an undirected simple graph given canonical distinct edges
    (u < v): score every NON-adjacent pair sharing ≥ 1 common neighbor
    with three classic indices —

      ``cn``    common-neighbor count;
      ``ra_q``  Resource Allocation index Σ 1/deg(w) (Zhou et al. 2009)
                in exact 1e-9 units: Σ (10**9 // deg(w)). Integer
                division keeps partial sums order-free and lets the SQL
                oracle compare bit-identically — Adamic–Adar's 1/ln(deg)
                would drag libm floats into the exchange;
      ``jac_q`` Jaccard coefficient cn/(deg(a)+deg(b)−cn) in exact 1e-6
                units via the same integer-division trick.

    Shapes: wedges generate bucket-shuffled by MIDDLE vertex, where
    deg(w) is simply the bucket-local group size (no degree join on the
    hot path); ``max_middle_degree`` excludes hubs from the middle role —
    the standard scale lever, since a hub's RA contribution is ~0 by
    construction while its deg² wedge fan-out dominates the exchange
    (callers must replay the same cap in any oracle). Per-bucket (a, b)
    partials pre-aggregate before the ONE grouped combine; known edges
    leave via the large×large hash anti join; per-node degrees (O(V)
    rows) broadcast for the Jaccard denominator. Returns the top-k
    candidates by (ra_q, cn, u, v) as a pandas DataFrame.
    """
    import numpy as np

    from .relational import broadcast_join, grouped_agg, hash_semi_join
    from .relational import topk as _topk
    from .window import _bucketed_apply

    def sym(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"w": t["u"], "n": t["v"]}),
            pa.table({"w": t["v"], "n": t["u"]}),
        ])

    symd = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        deg = df.groupby("w")["n"].transform("size")
        if max_middle_degree is not None:
            keep = deg <= max_middle_degree
            df, deg = df[keep], deg[keep]
        df = df.assign(_ra=np.int64(10**9) // deg.to_numpy(np.int64))
        m = df.merge(df, on="w")
        m = m[m["n_x"] < m["n_y"]]
        g = (m.groupby(["n_x", "n_y"], sort=False)
             .agg(cn=("w", "size"), ra_q=("_ra_x", "sum")).reset_index()
             .rename(columns={"n_x": "u", "n_y": "v"}))
        return g.astype({"cn": np.int64, "ra_q": np.int64})

    wedged = _bucketed_apply(symd, "w", per_bucket, num_buckets=num_buckets)
    cand = grouped_agg(wedged, ["u", "v"],
                       {"cn": ("cn", "sum"), "ra_q": ("ra_q", "sum")})
    # cand (and often edges) flow out of pandas map_groups blocks whose
    # reported schema carries numpy dtypes — hand both sides explicit
    # Arrow schemas, with the key type taken from the always-Arrow symd
    kt = symd.schema().base_schema.field("w").type
    cand = hash_semi_join(
        cand, edges, ["u", "v"], anti=True,
        left_schema=pa.schema([("u", kt), ("v", kt), ("cn", pa.int64()),
                               ("ra_q", pa.int64())]),
        right_schema=pa.schema([("u", kt), ("v", kt)])).materialize()
    if cand.count() == 0:
        # zero groups upstream yield a schemaless dataset — hand back a
        # typed empty frame instead of letting the sort KeyError
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("u", "v", "cn", "ra_q", "jac_q")})

    deg_df = (grouped_agg(symd, ["w"], {"deg": ("n", "count")})
              .to_pandas())
    cand = broadcast_join(cand, deg_df.rename(
        columns={"w": "u", "deg": "deg_u"}), "u")
    cand = broadcast_join(cand, deg_df.rename(
        columns={"w": "v", "deg": "deg_v"}), "v")

    def add_jaccard(df: pd.DataFrame) -> pd.DataFrame:
        denom = df["deg_u"] + df["deg_v"] - df["cn"]
        df = df.assign(jac_q=(df["cn"].to_numpy(np.int64) * np.int64(10**6))
                       // denom.to_numpy(np.int64))
        return df[["u", "v", "cn", "ra_q", "jac_q"]]

    scored = cand.map_batches(add_jaccard, batch_format="pandas")
    return _topk(scored, [("ra_q", True), ("cn", True),
                          ("u", False), ("v", False)], k)
