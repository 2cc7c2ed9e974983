"""Sequence packing — group documents into fixed token-budget packs for
training-batch construction.

The 100 TB shape: packing is a *local* decision — each Arrow block packs
its own rows greedily (first-fit over a token-sorted block), so the op
is embarrassingly parallel with zero shuffle. The price is per-block
fragmentation: at most one under-full pack per block, negligible when
blocks hold thousands of documents (the streaming executor's normal
regime). A global optimal bin-packing would serialize the corpus for a
~1% density win — wrong trade at scale.

Pack ids are content-derived (the minimum doc id in the pack), so
re-running on the same blocks yields the same ids — retries and resumed
runs don't mint fresh identities.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_block(ids: np.ndarray, tokens: np.ndarray, budget: int
               ) -> tuple[np.ndarray, np.ndarray]:
    """First-fit-decreasing packing of one block.

    Returns (pack_index_per_row, order) where rows are reordered by
    ``order`` and ``pack_index_per_row[i]`` is the local pack slot of
    reordered row i. Oversized docs (> budget) get singleton packs.
    """
    order = np.argsort(-tokens, kind="stable")
    t = tokens[order]
    pack_of = np.empty(len(t), dtype=np.int64)
    space: list[int] = []          # remaining budget per open pack
    for i, tok in enumerate(t):
        placed = False
        for p, rem in enumerate(space):
            if tok <= rem:
                space[p] = rem - tok
                pack_of[i] = p
                placed = True
                break
        if not placed:
            space.append(max(0, budget - int(tok)))
            pack_of[i] = len(space) - 1
    return pack_of, order


def pack_documents(ds, *, token_col: str, id_col: str = "doc_id",
                   budget: int = 2048):
    """map_batches stage: assign every row a ``pack_id`` such that the
    token sum per pack is ≤ budget (singleton packs for oversized docs).
    Output columns: id_col, token_col, pack_id."""

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                             token_col: pa.array([], pa.int64()),
                             "pack_id": pa.array([], pa.int64())})
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False))
        toks = np.asarray(t[token_col].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        pack_of, order = pack_block(ids, toks, budget)
        ids_o, toks_o = ids[order], toks[order]
        # content-derived pack id: min doc id within the pack (integer ids
        # via ufunc scatter-min; string ids via a grouped min)
        n_packs = int(pack_of.max()) + 1
        if ids_o.dtype.kind in "iu":
            min_id = np.full(n_packs, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(min_id, pack_of, ids_o.astype(np.int64))
            pack_ids = pa.array(min_id[pack_of], pa.int64())
        else:
            import pandas as pd

            m = pd.Series(ids_o).groupby(pack_of).min()
            pack_ids = pa.array(m.to_numpy()[pack_of])
        return pa.table({id_col: pa.array(ids_o),
                         token_col: pa.array(toks_o, pa.int64()),
                         "pack_id": pack_ids})

    return ds.map_batches(per_block, batch_format="pyarrow")
