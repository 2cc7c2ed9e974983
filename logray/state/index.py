"""Sharded shared-state inverted index — the one place this engine drops
to raw ``@ray.remote`` actors.

Everything else in the repo is a Dataset transform; a SHARED MUTABLE
index (many writer tasks, later point lookups, state that outlives the
pipeline run) is the case the Dataset API genuinely can't express
(SURVEY.md §2C note). Design:

- ``num_shards`` actors each own a disjoint token range (stable crc32
  hash of the token % shards — the SAME partitioning key discipline as
  the shuffle ops, so one token never spans shards).
- Build is a normal streaming ``map_batches`` pass: each batch explodes
  to distinct (token, doc) postings, groups them BY SHARD, and delivers
  one batched ``add`` call per shard (acked with ``ray.get`` inside the
  task so a completed build pass implies a fully-ingested index; a
  retried task re-sends its postings — adds are idempotent because
  postings are per-doc sets).
- Lookup fans out one ``lookup`` per owning shard.

Scale note: shards hold O(vocab/shards) token entries with int64 doc
arrays; size ``num_shards`` to the cluster and spill cold tokens to
per-shard Parquet if corpora outgrow memory (not needed here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _shard_of(tokens, num_shards: int) -> np.ndarray:
    from ..functions.hashing import stable_hash64

    h = stable_hash64(tokens)
    return ((h * np.int64(2654435761)) % num_shards).astype(np.int64)


class InvertedIndex:
    """Driver-side handle over the shard actors."""

    def __init__(self, num_shards: int = 8):
        import ray

        @ray.remote(num_cpus=0.5)
        class IndexShard:
            def __init__(self):
                self.post: dict[str, set] = {}

            def add(self, tokens: list, doc_ids: list) -> int:
                for t, d in zip(tokens, doc_ids):
                    self.post.setdefault(t, set()).update(d)
                return len(tokens)

            def lookup(self, tokens: list) -> dict:
                return {t: sorted(self.post.get(t, ()))for t in tokens}

            def n_tokens(self) -> int:
                return len(self.post)

        self._ray = ray
        self.num_shards = num_shards
        self.shards = [IndexShard.remote() for _ in range(num_shards)]

    def build(self, ds, *, id_col: str = "doc_id", text_col: str = "text"):
        """Streaming build pass; returns total postings delivered."""
        shards = self.shards
        num_shards = self.num_shards

        def push(t: pa.Table) -> pa.Table:
            import ray

            trimmed = pc.utf8_trim_whitespace(
                pc.utf8_lower(pc.fill_null(t[text_col], "")))
            toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            flat = pc.list_flatten(toks)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
            lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
            docs = np.repeat(t[id_col].to_numpy(zero_copy_only=False), lens)
            tok_np = np.asarray(flat.to_pylist(), dtype=object)
            # distinct (token, doc) postings within the batch
            key = np.char.add(np.char.add(tok_np.astype(str), "\x00"),
                              docs.astype(str))
            _, first = np.unique(key, return_index=True)
            tok_u, doc_u = tok_np[first], docs[first]
            sh = _shard_of(pa.array(tok_u.astype(str)), num_shards)
            acks = []
            for s in range(num_shards):
                m = sh == s
                if not m.any():
                    continue
                toks_s = tok_u[m]
                docs_s = doc_u[m]
                # group docs per token for one batched add
                order = np.argsort(toks_s, kind="stable")
                toks_s, docs_s = toks_s[order], docs_s[order]
                uniq, starts = np.unique(toks_s, return_index=True)
                groups = np.split(docs_s, starts[1:])
                acks.append(shards[s].add.remote(
                    [str(u) for u in uniq],
                    [g.astype(np.int64).tolist() for g in groups]))
            ray.get(acks)  # ack before the task reports success
            return pa.table({"n": pa.array([len(tok_u)], pa.int64())})

        total = ds.map_batches(push, batch_format="pyarrow").sum("n")
        return int(total or 0)

    def lookup(self, tokens: list[str]) -> dict[str, list[int]]:
        sh = _shard_of(pa.array([str(t) for t in tokens]), self.num_shards)
        futs, order = [], []
        for s in range(self.num_shards):
            ts = [t for t, x in zip(tokens, sh) if x == s]
            if ts:
                futs.append(self.shards[s].lookup.remote(ts))
        out: dict[str, list[int]] = {}
        for d in self._ray.get(futs):
            out.update(d)
        return out

    def lookup_and(self, tokens: list[str]) -> list[int]:
        """Docs containing ALL tokens (intersection across shards)."""
        res = self.lookup(tokens)
        sets = [set(res.get(t, ())) for t in tokens]
        return sorted(set.intersection(*sets)) if sets else []

    def vocab_size(self) -> int:
        return int(sum(self._ray.get(
            [s.n_tokens.remote() for s in self.shards])))
