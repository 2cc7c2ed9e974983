"""Raw-log text ingestion source (SURVEY.md §2 B5/B1).

The reference's primary input is a raw log FILE — an envelope regex
(`capture_line`) splits each line into typed fields before the message
rule table runs. The graft's primary input is Parquet, but this module
keeps the raw-text path first-class: a deterministic renderer turns the
transcript corpus into `.log` text files, and `read_raw_log` ingests them
with `ray.data.read_text` + one vectorized `pc.extract_regex` envelope
pass, reconstructing the exact transcript schema (round-trip tested).

Line format (one logical record per line; newlines inside a turn's text
are escaped with the ASCII record-separator control char, which never
occurs in text):

    2026-01-01T00:00:00.000000 [assistant] c00000042#7 tool=bash :: {text}

Unmatched lines are never dropped (reference `default` semantics): they
come back as rows with null envelope fields and ``envelope_error=True``.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_NL_SENTINEL = "\x00"  # NUL escapes '\n' within a turn: unlike \x1e/\x1c,
# NUL is not a str.splitlines() boundary, so line-oriented consumers
# cannot silently split a record at the sentinel

ENVELOPE_REGEX = (
    r"^(?P<ts>\S+) \[(?P<role>[a-z]+)\] (?P<conv_id>\S+)#(?P<turn_idx>\d+)"
    r" tool=(?P<tool>\S*) :: (?P<text>.*)$"
)

_TS_FMT = "%Y-%m-%dT%H:%M:%S"  # Arrow strftime %S already emits .ffffff


def render_raw_log(corpus_dir: str | Path, out_dir: str | Path,
                   compression: str | None = None) -> list[str]:
    """Render each corpus parquet partition to one ``.log`` text file
    (``compression="gzip"`` writes ``.log.gz`` — the reference's callers
    commonly feed gzipped system logs).

    Fully vectorized (strftime + element-wise join); deterministic for a
    given corpus. Returns the list of written files."""
    import gzip

    corpus_dir, out_dir = Path(corpus_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for f in sorted(corpus_dir.glob("*.parquet")):
        t = pq.read_table(f)
        ts = pc.strftime(t["ts"], format=_TS_FMT)
        text = pc.replace_substring(t["text"], "\n", _NL_SENTINEL)
        turn = pc.cast(t["turn_idx"], pa.string())
        lines = pc.binary_join_element_wise(
            ts, " [", t["role"], "] ", t["conv_id"], "#", turn,
            " tool=", t["tool"], " :: ", text, "")
        payload = "\n".join(lines.to_pylist()) + "\n"
        if compression == "gzip":
            out = out_dir / (f.stem + ".log.gz")
            with gzip.open(out, "wt") as fh:
                fh.write(payload)
        else:
            out = out_dir / (f.stem + ".log")
            with open(out, "w") as fh:
                fh.write(payload)
        written.append(str(out))
    return written


def envelope_parse(batch: pa.Table, line_col: str = "text") -> pa.Table:
    """One-regex envelope split of raw lines back into the transcript
    schema — the vectorized analog of the reference's ``capture_line``
    rule. Unmatched lines survive with null fields + ``envelope_error``."""
    lines = batch[line_col]
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    st = pc.extract_regex(lines, ENVELOPE_REGEX)
    err = st.is_null()

    def field(name: str) -> pa.Array:
        # children of null struct rows hold '' (not null) — mask them so
        # downstream casts see proper nulls instead of un-castable strings
        return pc.if_else(err, pa.scalar(None, pa.string()), st.field(name))

    # Arrow strptime cannot parse fractional seconds; string→timestamp
    # cast handles ISO8601 with microseconds (nulls pass through)
    ts = pc.cast(field("ts"), pa.timestamp("us"))
    text = pc.replace_substring(field("text"), _NL_SENTINEL, "\n")
    return pa.table({
        "conv_id": field("conv_id"),
        "turn_idx": pc.cast(field("turn_idx"), pa.int32()),
        "role": field("role"),
        "text": text,
        "tool": field("tool"),
        "ts": ts,
        "envelope_error": err,
    })


def read_raw_log(log_dir: str | Path):
    """``ray.data.read_text`` over rendered ``.log``/``.log.gz`` files →
    envelope parse.

    Returns a Dataset with the transcript schema + ``envelope_error``.
    Downstream stages (rule parse, enrich, route) apply unchanged — the
    raw-text path and the Parquet path share everything after this stage."""
    import ray.data

    files = sorted(str(p) for p in Path(log_dir).glob("*.log"))
    gz = sorted(str(p) for p in Path(log_dir).glob("*.log.gz"))
    parts = []
    if files:
        parts.append(ray.data.read_text(files))
    if gz:
        parts.append(ray.data.read_text(
            gz, arrow_open_stream_args={"compression": "gzip"}))
    if not parts:
        raise FileNotFoundError(f"no .log/.log.gz files in {log_dir}")
    ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    return ds.map_batches(envelope_parse, batch_format="pyarrow")


def write_ipc(ds, out_dir: str | Path, *, compression: str = "zstd"):
    """Arrow IPC (Feather v2) sink (B6 format breadth): each task writes
    its batch as one ``.arrow`` file — partitioned output, no driver
    funnel, resumable by directory listing like the parquet sinks."""
    import uuid

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        from pyarrow import feather

        name = out / f"part-{uuid.uuid4().hex}.arrow"
        tmp = name.with_suffix(".tmp")
        feather.write_feather(t, str(tmp), compression=compression)
        tmp.rename(name)  # atomic: readers never see partials
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    n = ds.map_batches(write_batch, batch_format="pyarrow").sum("rows")
    return int(n or 0)


def read_ipc(in_dir: str | Path):
    """Arrow IPC (Feather v2) source: ``read_binary_files`` distributes
    one file per block; each decodes zero-copy via ``pyarrow.feather``.
    Ray Data has no native IPC reader — this composes one from the
    binary-file source, keeping decode distributed and streaming."""
    import ray.data

    files = sorted(str(p) for p in Path(in_dir).glob("*.arrow"))
    if not files:
        raise FileNotFoundError(f"no .arrow files in {in_dir}")

    def decode(t: pa.Table) -> pa.Table:
        from pyarrow import feather
        import io

        tables = [feather.read_table(io.BytesIO(b.as_py()))
                  for b in t["bytes"]]
        return pa.concat_tables(tables)

    return (ray.data.read_binary_files(files)
            .map_batches(decode, batch_format="pyarrow", batch_size=1))


def write_orc(ds, out_dir: str | Path, *, compression: str = "zstd"):
    """ORC sink (B6 format breadth): each task writes its batch as one
    ``.orc`` file through the same atomic write-then-rename protocol as
    the parquet/IPC sinks — partitioned output, no driver funnel."""
    import uuid

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        from pyarrow import orc

        name = out / f"part-{uuid.uuid4().hex}.orc"
        tmp = name.with_suffix(".tmp")
        orc.write_table(t, str(tmp), compression=compression)
        tmp.rename(name)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    n = ds.map_batches(write_batch, batch_format="pyarrow").sum("rows")
    return int(n or 0)


def read_orc(in_dir: str | Path):
    """ORC source: Ray Data here has no native ORC reader, so compose one
    from ``read_binary_files`` (one file per block, distributed) +
    ``pyarrow.orc`` decode inside the task — same shape as ``read_ipc``."""
    import ray.data

    files = sorted(str(p) for p in Path(in_dir).glob("*.orc"))
    if not files:
        raise FileNotFoundError(f"no .orc files in {in_dir}")

    def decode(t: pa.Table) -> pa.Table:
        import io

        from pyarrow import orc

        tables = [orc.ORCFile(io.BytesIO(b.as_py())).read()
                  for b in t["bytes"]]
        return pa.concat_tables(tables)

    return (ray.data.read_binary_files(files)
            .map_batches(decode, batch_format="pyarrow", batch_size=1))


def read_tar_shards(in_dir):
    """WebDataset-style source: tar shards of binary members → Dataset of
    (shard, member, payload). One shard per task via ``read_binary_files``
    (shards are the unit of parallelism and resume, exactly how sharded
    training corpora ship); the tar is exploded in the task from the
    in-memory bytes — member payloads stream through the object store and
    never concentrate on the driver. Per-member loop is payload-bound by
    nature (same note as the codec stages)."""
    import io
    import tarfile

    import ray.data

    files = sorted(str(p) for p in Path(in_dir).glob("*.tar"))
    if not files:
        raise FileNotFoundError(f"no .tar shards in {in_dir}")

    def explode(t: pa.Table) -> pa.Table:
        shards, members, payloads = [], [], []
        for path, blob in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            name = Path(path).name
            with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
                for info in tf:
                    if not info.isfile():
                        continue
                    shards.append(name)
                    members.append(info.name)
                    payloads.append(tf.extractfile(info).read())
        return pa.table({"shard": pa.array(shards, pa.string()),
                         "member": pa.array(members, pa.string()),
                         "payload": pa.array(payloads, pa.binary())})

    return (ray.data.read_binary_files(files, include_paths=True)
            .map_batches(explode, batch_format="pyarrow", batch_size=1))
