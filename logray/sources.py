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
    commonly feed gzipped system logs; ``compression="lz4"`` writes
    ``.log.lz4`` frames via the from-scratch codec in
    logray/ops/lz4codec.py, the shard-compression format modern
    pipelines ship text shards in; ``"bz2"``/``"xz"`` write stdlib
    bzip2/LZMA shards — the archival formats long-retention log stores
    hand over).

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
        elif compression == "lz4":
            from .ops.lz4codec import compress_frame

            out = out_dir / (f.stem + ".log.lz4")
            out.write_bytes(compress_frame(
                payload.encode(), block_checksums=True, content_size=True))
        elif compression == "bz2":
            import bz2

            out = out_dir / (f.stem + ".log.bz2")
            out.write_bytes(bz2.compress(payload.encode()))
        elif compression == "zstd":
            out = out_dir / (f.stem + ".log.zst")
            out.write_bytes(pa.Codec("zstd").compress(
                payload.encode(), asbytes=True))
        elif compression == "xz":
            import lzma

            out = out_dir / (f.stem + ".log.xz")
            out.write_bytes(lzma.compress(payload.encode()))
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
    lz4 = sorted(str(p) for p in Path(log_dir).glob("*.log.lz4"))
    bz2_files = sorted(str(p) for p in Path(log_dir).glob("*.log.bz2"))
    xz = sorted(str(p) for p in Path(log_dir).glob("*.log.xz"))
    parts = []
    if files:
        parts.append(ray.data.read_text(files))
    if gz:
        parts.append(ray.data.read_text(
            gz, arrow_open_stream_args={"compression": "gzip"}))
    if bz2_files:
        # bz2 is an Arrow codec on this build — same streaming-inflate
        # path as gzip, no whole-file buffer in the task
        parts.append(ray.data.read_text(
            bz2_files, arrow_open_stream_args={"compression": "bz2"}))
    zst = sorted(str(p) for p in Path(log_dir).glob("*.log.zst"))
    if zst:
        parts.append(ray.data.read_text(
            zst, arrow_open_stream_args={"compression": "zstd"}))
    if xz:
        import lzma

        def inflate_xz(t: pa.Table) -> pa.Table:
            lines: list[str] = []
            for blob in t["bytes"].to_pylist():
                # LZMA is NOT an Arrow codec, so read_binary_files can
                # never auto-inflate .xz — but sniff the stream magic
                # anyway (house rule from the .gz/.lz4 lanes: trust
                # bytes, not extensions)
                if blob[:6] == b"\xfd7zXZ\x00":
                    blob = lzma.decompress(blob)
                segs = blob.decode("utf-8").split("\n")
                if segs and segs[-1] == "":
                    segs.pop()
                lines.extend(segs)
            return pa.table({"text": pa.array(lines, pa.string())})

        parts.append(ray.data.read_binary_files(xz).map_batches(
            inflate_xz, batch_format="pyarrow", batch_size=1))
    if lz4:
        from .ops.lz4codec import MAGIC, decompress_frame

        def inflate(t: pa.Table) -> pa.Table:
            import struct

            magic = struct.pack("<I", MAGIC)
            lines: list[str] = []
            for blob in t["bytes"].to_pylist():
                # sniff the frame magic rather than trusting the
                # extension: read_binary_files auto-inflates *.lz4 via
                # the Arrow filesystem (same gotcha as the WARC .gz
                # shards), so bytes may arrive either way — our codec's
                # conformance against Arrow's is pinned in tests
                if blob[:4] == magic:
                    blob = decompress_frame(blob)
                text = blob.decode("utf-8")
                # split on '\n' ONLY (read_text semantics) — splitlines()
                # would also split on VT/FF/U+2028 inside turn text
                segs = text.split("\n")
                if segs and segs[-1] == "":
                    segs.pop()
                lines.extend(segs)
            return pa.table({"text": pa.array(lines, pa.string())})

        parts.append(ray.data.read_binary_files(lz4).map_batches(
            inflate, batch_format="pyarrow", batch_size=1))
    if not parts:
        raise FileNotFoundError(
            f"no .log/.log.gz/.log.lz4/.log.bz2/.log.xz in {log_dir}")
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


# --------------------------------------------------------------- WARC source
# The web-archive container format crawl corpora ship in (ISO 28500; the
# Common Crawl layout). Spec-exact record walk: the Content-Length header
# governs the block extent (never boundary scanning), every record must be
# terminated by exactly two CRLFs, and `.warc.gz` shards are MULTI-MEMBER
# gzip streams — one gzip member per record — walked via zlib's
# unused_data chaining (the layout that makes per-record random access
# possible in real crawl archives).

_WARC_REQUIRED = ("warc-type", "warc-record-id", "warc-date",
                  "content-length")


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz layout)."""
    import zlib

    parts = []
    while blob:
        d = zlib.decompressobj(wbits=31)
        try:
            parts.append(d.decompress(blob))
        except zlib.error as e:
            raise ValueError(f"warc.gz: corrupt gzip member: {e}") from e
        if not d.eof:
            raise ValueError("warc.gz: truncated gzip member")
        blob = d.unused_data
    return b"".join(parts)


def warc_split_records(blob: bytes) -> list[tuple[dict, bytes]]:
    """Split one (decompressed) WARC stream into (headers, block) records.

    Validates the version line (WARC/1.0 or 1.1), the presence of the
    spec's mandatory headers, and the two-CRLF record terminator; header
    names are case-insensitive per the spec."""
    records = []
    pos, n = 0, len(blob)
    while pos < n:
        end = blob.find(b"\r\n\r\n", pos)
        if end < 0:
            raise ValueError("warc: missing header terminator")
        try:
            header = blob[pos:end].decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError("warc: non-UTF-8 header block") from e
        lines = header.split("\r\n")
        if lines[0] not in ("WARC/1.0", "WARC/1.1"):
            raise ValueError(f"warc: bad version line {lines[0][:24]!r}")
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            name, sep, value = ln.partition(":")
            if not sep:
                raise ValueError(f"warc: malformed header line {ln[:40]!r}")
            fields[name.strip().lower()] = value.strip()
        missing = [k for k in _WARC_REQUIRED if k not in fields]
        if missing:
            raise ValueError(f"warc: missing mandatory header {missing[0]}")
        cl = fields["content-length"]
        # digits-only: int() also accepts '+5'/'1_0'/unicode digits, and a
        # NEGATIVE length would walk pos backward into an infinite loop
        if not (cl.isascii() and cl.isdigit()):
            raise ValueError("warc: non-integer Content-Length")
        clen = int(cl)
        body_start = end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            raise ValueError("warc: truncated record block")
        if blob[body_end:body_end + 4] != b"\r\n\r\n":
            raise ValueError("warc: record block not followed by CRLFCRLF")
        records.append((fields, blob[body_start:body_end]))
        pos = body_end + 4
    return records


def http_response_split(block: bytes) -> tuple[int, dict, bytes]:
    """Split an HTTP response payload (a 'response' record's block) into
    (status_code, headers, body)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("warc: http payload missing header terminator")
    head = block[:sep].decode("latin-1")
    lines = head.split("\r\n")
    parts = lines[0].split(" ", 2)
    if not parts[0].startswith("HTTP/") or len(parts) < 2:
        raise ValueError(f"warc: bad http status line {lines[0][:40]!r}")
    try:
        status = int(parts[1])
    except ValueError as e:
        raise ValueError("warc: non-integer http status") from e
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        name, sep2, value = ln.partition(":")
        if sep2:
            headers[name.strip().lower()] = value.strip()
    return status, headers, block[sep + 4:]


def read_warc_shards(in_dir):
    """WARC source: `.warc` / `.warc.gz` shards → Dataset of
    (shard, rec_id, rec_type, url, date, http_status, payload, n_bytes).

    One shard per task via ``read_binary_files`` (shards are the crawl's
    unit of parallelism and resume); records are walked in the task, so
    payloads stream through the object store and never concentrate on
    the driver. ``payload`` is the HTTP BODY for 'response' records
    (status surfaced as a column) and the raw block otherwise;
    ``http_status`` is null for non-response records. Per-record loop is
    payload-bound by nature (same note as the tar/codec stages)."""
    import ray.data

    files = sorted(str(p) for p in list(Path(in_dir).glob("*.warc"))
                   + list(Path(in_dir).glob("*.warc.gz")))
    if not files:
        raise FileNotFoundError(f"no .warc/.warc.gz shards in {in_dir}")

    def explode(t: pa.Table) -> pa.Table:
        out = {"shard": [], "rec_id": [], "rec_type": [], "url": [],
               "date": [], "http_status": [], "payload": [], "n_bytes": []}
        for path, blob in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            name = Path(path).name
            # sniff the gzip magic rather than trusting the extension:
            # ray.data.read_binary_files already auto-inflates *.gz via
            # the Arrow filesystem (incl. concatenated members), so bytes
            # may arrive either way
            if blob[:2] == b"\x1f\x8b":
                blob = _gunzip_members(blob)
            for fields, block in warc_split_records(blob):
                rtype = fields["warc-type"]
                status, payload = None, block
                if rtype == "response":
                    status, _, payload = http_response_split(block)
                out["shard"].append(name)
                out["rec_id"].append(fields["warc-record-id"])
                out["rec_type"].append(rtype)
                out["url"].append(fields.get("warc-target-uri"))
                out["date"].append(fields["warc-date"])
                out["http_status"].append(status)
                out["payload"].append(payload)
                out["n_bytes"].append(len(payload))
        return pa.table({
            "shard": pa.array(out["shard"], pa.string()),
            "rec_id": pa.array(out["rec_id"], pa.string()),
            "rec_type": pa.array(out["rec_type"], pa.string()),
            "url": pa.array(out["url"], pa.string()),
            "date": pa.array(out["date"], pa.string()),
            "http_status": pa.array(out["http_status"], pa.int64()),
            "payload": pa.array(out["payload"], pa.binary()),
            "n_bytes": pa.array(out["n_bytes"], pa.int64()),
        })

    return (ray.data.read_binary_files(files, include_paths=True)
            .map_batches(explode, batch_format="pyarrow", batch_size=1))


# Robots fixture: rule-set templates (host h uses template h % 3), URL
# path categories (response i uses category i % 5), and the RFC 9309
# verdict matrix HAND-DERIVED from the spec — never computed by the
# parser under test, so it checks the implementation independently.
ROBOTS_TEMPLATES = (
    # 0: longest-match precedence, Allow carve-out, wildcard + $ anchor
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/ok/\n"
    "Disallow: /*.tmp$\n",
    # 1: a specific group that must be IGNORED for agent '*', plus an
    # equal-length Allow/Disallow tie (RFC: Allow wins ties)
    "User-agent: archiver\n"
    "Disallow: /\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /cgi-bin/\n"
    "Disallow: /page/\n"
    "Allow: /page/\n",
    # 2: comments, blank lines, empty Disallow (allow-all)
    "# nothing to see here\n"
    "\n"
    "User-agent: *\n"
    "Disallow:\n",
)
ROBOTS_URL_CATEGORIES = ("/page/{i}", "/private/{i}", "/private/ok/{i}",
                         "/files/{i}.tmp", "/cgi-bin/{i}")
# Verdicts[template][category], derived by hand:
#  t0: /page allow (no rule) · /private deny (/private/, len 9)
#      · /private/ok allow (/private/ok/, len 12 beats 9)
#      · .tmp deny (/*.tmp$) · /cgi-bin allow (no rule)
#  t1: /page allow (6-byte tie → Allow) · /private allow · ok allow
#      · .tmp allow · /cgi-bin deny (and the archiver group is ignored)
#  t2: everything allowed (empty Disallow is allow-all)
ROBOTS_VERDICTS = (
    (True, False, True, False, True),
    (True, True, True, True, False),
    (True, True, True, True, True),
)


def make_warc_shards(out_dir, n: int = 180, shards: int = 6,
                     seed: int = 29) -> dict:
    """Deterministic crawl fixture: ``n`` HTTP response records (plus a
    warcinfo record and an interleaved request record per shard) spread
    round-robin over ``shards`` shards — half written plain ``.warc``,
    half ``.warc.gz`` with ONE GZIP MEMBER PER RECORD (the Common Crawl
    layout) — and a ``truth.parquet`` sidecar carrying each response's
    generation-time truth (url/host/status/body bytes/CRC32). Response
    bodies embed 0–4 absolute ``<a href>`` hyperlinks (recorded per-link
    in a second ``links.parquet`` sidecar) plus an occasional RELATIVE
    href that is deliberately NOT recorded — link extractors must keep
    absolute targets only. The reader must re-derive all of it from the
    container bytes alone."""
    import gzip
    import zlib

    import numpy as np
    import pyarrow.parquet as _pq

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    statuses = [200, 200, 200, 200, 404, 301, 500, 503]
    words = ["crawl", "corpus", "stream", "shard", "record", "archive",
             "parse", "filter", "dedup", "tokens"]
    n_hosts = 12

    def record(fields: dict, block: bytes) -> bytes:
        head = "WARC/1.0\r\n" + "".join(
            f"{k}: {v}\r\n" for k, v in fields.items())
        head += f"Content-Length: {len(block)}\r\n"
        return head.encode() + b"\r\n" + block + b"\r\n\r\n"

    shard_bufs: dict[int, list[bytes]] = {k: [] for k in range(shards)}
    names = {k: (f"crawl-{k:02d}.warc" if k < shards - shards // 2
                 else f"crawl-{k:02d}.warc.gz") for k in range(shards)}
    for k in range(shards):
        shard_bufs[k].append(record(
            {"WARC-Type": "warcinfo",
             "WARC-Record-ID": f"<urn:uuid:info-{k:04d}>",
             "WARC-Date": "2026-01-01T00:00:00Z"},
            b"software: logray-fixture\r\n"))
    truth = {"rec_id": [], "shard": [], "host": [], "status": [],
             "n_bytes": [], "body_crc32": [], "path": [],
             "robots_allowed": [], "body_text": []}
    links: dict[str, list] = {"rec_id": [], "src_host": [], "target": []}
    # (html form, rendered text) hazard words: entity decoding — &amp;
    # must decode LAST so literal "&amp;lt;" renders "&lt;" — plus an
    # inline tag that strips to its text
    specials = [("r&amp;d", "r&d"), ("&lt;tag&gt;", "<tag>"),
                ('&quot;quoted&quot;', '"quoted"'),
                ("A&#39;s", "A's"), ("<b>inline</b>", "inline"),
                ("&amp;lt;", "&lt;")]
    bodies: list[tuple[bytes, list[str], str]] = []
    for i in range(n):
        k = i % shards
        h_idx = int(rng.integers(0, n_hosts))
        host = f"host-{h_idx:02d}.example"
        cat = i % len(ROBOTS_URL_CATEGORIES)
        path = ROBOTS_URL_CATEGORIES[cat].format(i=i)
        url = f"http://{host}{path}"
        allowed = ROBOTS_VERDICTS[h_idx % len(ROBOTS_TEMPLATES)][cat]
        status = int(statuses[int(rng.integers(0, len(statuses)))])
        if i % 13 == 12 and bodies:
            # exact-duplicate body (mirror crawl / CDN copy): reuse a
            # prior record's bytes AND its planted absolute links so the
            # links sidecar stays byte-faithful
            body, targets, body_text = bodies[i - 13]
        else:
            body_words = list(rng.choice(words,
                                         size=int(rng.integers(5, 120))))
            text_words = list(body_words)
            if i % 3 == 1:  # entity / inline-tag hazards
                sp = specials[int(rng.integers(0, len(specials)))]
                pos = int(rng.integers(0, len(body_words) + 1))
                body_words.insert(pos, sp[0])
                text_words.insert(pos, sp[1])
            if i % 23 == 21:
                # invalid-UTF-8 hazard: a latin-1 stray byte the
                # extractor must decode with U+FFFD replacement
                body_words.append("UTF8HAZARD")
                text_words.append("caf�")
            anchors, anchor_texts, targets = [], [], []
            for _ in range(int(rng.integers(0, 5))):
                tgt_host = f"host-{int(rng.integers(0, 12)):02d}.example"
                tgt = (f"http://{tgt_host}/page/"
                       f"{int(rng.integers(0, 10000))}")
                anchors.append(f'<a href="{tgt}">link</a>')
                anchor_texts.append("link")
                targets.append(tgt)
            if i % 7 == 0:  # relative href: extractors must drop it
                anchors.append('<a href="/local/nav">nav</a>')
                anchor_texts.append("nav")
            body = ("<html><body>" + " ".join(body_words) + " "
                    + " ".join(anchors)
                    + f" doc {i}</body></html>").encode()
            body = body.replace(b"UTF8HAZARD", b"caf\xe9")
            body_text = " ".join(text_words + anchor_texts + [f"doc {i}"])
        bodies.append((body, targets, body_text))
        for tgt in targets:
            links["rec_id"].append(f"<urn:uuid:resp-{i:06d}>")
            links["src_host"].append(host)
            links["target"].append(tgt)
        if i % 11 == 0:  # interleave a request record (must be skipped)
            shard_bufs[k].append(record(
                {"WARC-Type": "request",
                 "WARC-Record-ID": f"<urn:uuid:req-{i:06d}>",
                 "WARC-Target-URI": url,
                 "WARC-Date": "2026-01-01T00:00:00Z"},
                f"GET {path} HTTP/1.1\r\nHost: {host}\r\n\r\n".encode()))
        http = (f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        shard_bufs[k].append(record(
            {"WARC-Type": "response",
             "WARC-Record-ID": f"<urn:uuid:resp-{i:06d}>",
             "WARC-Target-URI": url,
             "WARC-Date": "2026-01-01T00:00:00Z"},
            http))
        truth["rec_id"].append(f"<urn:uuid:resp-{i:06d}>")
        truth["shard"].append(names[k])
        truth["host"].append(host)
        truth["status"].append(status)
        truth["n_bytes"].append(len(body))
        truth["body_crc32"].append(zlib.crc32(body))
        truth["path"].append(path)
        truth["robots_allowed"].append(allowed)
        truth["body_text"].append(body_text)
    # one /robots.txt response per host (text/plain; deliberately NOT in
    # the truth rollup columns the page queries use — robots_allowed is
    # null). Engines must read the rules from crawl bytes alone.
    for h_idx in range(n_hosts):
        k = h_idx % shards
        host = f"host-{h_idx:02d}.example"
        body = ROBOTS_TEMPLATES[h_idx % len(ROBOTS_TEMPLATES)].encode()
        http = (f"HTTP/1.1 200 X\r\nContent-Type: text/plain\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        shard_bufs[k].append(record(
            {"WARC-Type": "response",
             "WARC-Record-ID": f"<urn:uuid:robots-{h_idx:04d}>",
             "WARC-Target-URI": f"http://{host}/robots.txt",
             "WARC-Date": "2026-01-01T00:00:00Z"},
            http))
        truth["rec_id"].append(f"<urn:uuid:robots-{h_idx:04d}>")
        truth["shard"].append(names[k])
        truth["host"].append(host)
        truth["status"].append(200)
        truth["n_bytes"].append(len(body))
        truth["body_crc32"].append(zlib.crc32(body))
        truth["path"].append("/robots.txt")
        truth["robots_allowed"].append(None)
        truth["body_text"].append(None)  # not HTML; extractor skips
    for k in range(shards):
        name = names[k]
        if name.endswith(".gz"):
            blob = b"".join(
                gzip.compress(r, mtime=0) for r in shard_bufs[k])
        else:
            blob = b"".join(shard_bufs[k])
        (out / name).write_bytes(blob)
    _pq.write_table(pa.table({
        "rec_id": pa.array(truth["rec_id"], pa.string()),
        "shard": pa.array(truth["shard"], pa.string()),
        "host": pa.array(truth["host"], pa.string()),
        "status": pa.array(truth["status"], pa.int64()),
        "n_bytes": pa.array(truth["n_bytes"], pa.int64()),
        "body_crc32": pa.array(truth["body_crc32"], pa.int64()),
        "path": pa.array(truth["path"], pa.string()),
        "robots_allowed": pa.array(truth["robots_allowed"], pa.bool_()),
        "body_text": pa.array(truth["body_text"], pa.string()),
    }), out / "truth.parquet")
    _pq.write_table(pa.table({
        "rec_id": pa.array(links["rec_id"], pa.string()),
        "src_host": pa.array(links["src_host"], pa.string()),
        "target": pa.array(links["target"], pa.string()),
    }), out / "links.parquet")
    (out / "fixture_rev").write_text("3\n")  # rev 3: utf8 hazards
    return {"shards": shards, "responses": n, "dir": str(out)}


# --------------------------------------------------------------- Avro source
# The row-oriented serialization format data-engineering pipelines ship
# event streams in (Kafka→archive landings). From-scratch spec codec in
# logray/ops/avrocodec.py (public Avro 1.11 spec; no avro/fastavro in the
# sandbox). One container file per task = the format's native resume
# granularity (each file is independently decodable; blocks inside a
# file are sync-marker-delimited for mid-file recovery, which the reader
# validates per block).

def _avro_to_arrow_type(schema) -> pa.DataType:
    """Map an Avro schema node to the Arrow type the reader emits."""
    if isinstance(schema, list):  # union: only [null, X] maps to Arrow
        branches = [b for b in schema if b != "null"]
        if len(schema) != 2 or len(branches) != 1:
            raise ValueError("avro: only [null, X] unions map to Arrow")
        return _avro_to_arrow_type(branches[0])
    t = schema if isinstance(schema, str) else schema["type"]
    if (isinstance(schema, dict) and t == "long"
            and schema.get("logicalType") == "timestamp-micros"):
        return pa.timestamp("us")
    prim = {"boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
            "float": pa.float32(), "double": pa.float64(),
            "bytes": pa.binary(), "string": pa.string(),
            "null": pa.null()}
    if t in prim:
        return prim[t]
    if t == "enum":
        return pa.string()
    if t == "fixed":
        return pa.binary(schema["size"])
    if t == "array":
        return pa.list_(_avro_to_arrow_type(schema["items"]))
    if t == "map":
        return pa.map_(pa.string(), _avro_to_arrow_type(schema["values"]))
    if t == "record":
        return pa.struct([(f["name"], _avro_to_arrow_type(f["type"]))
                          for f in schema["fields"]])
    raise ValueError(f"avro: unsupported type {t!r}")


def avro_arrow_schema(schema: dict, extra: list | None = None) -> pa.Schema:
    """Arrow schema for a top-level Avro record, plus reader-added fields."""
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("avro: container schema must be a record")
    fields = [pa.field(f["name"], _avro_to_arrow_type(f["type"]))
              for f in schema["fields"]]
    return pa.schema((extra or []) + fields)


def read_avro_shards(in_dir):
    """Avro object-container source: `.avro` shards → Dataset with one row
    per record, Arrow-typed from the embedded writer schema (enum→string,
    fixed→fixed_size_binary, [null,X] union→nullable X, array→list,
    map→map, nested record→struct). One file per task via
    ``read_binary_files``; records decode in the task, so rows stream
    through the object store and never concentrate on the driver.
    Per-record decode is a Python walk by nature of the row-oriented
    format (same note as the tar/WARC stages) — the ingestion boundary,
    not a hot analytic path."""
    import ray.data

    from .ops.avrocodec import read_container

    files = sorted(str(p) for p in Path(in_dir).glob("*.avro"))
    if not files:
        raise FileNotFoundError(f"no .avro shards in {in_dir}")

    def explode(t: pa.Table) -> pa.Table:
        tables = []
        for path, blob in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            schema, records = read_container(blob)
            arrow = avro_arrow_schema(schema, [pa.field("shard", pa.string())])
            name = Path(path).name
            for r in records:
                r["shard"] = name
            tables.append(pa.Table.from_pylist(records, schema=arrow))
        return pa.concat_tables(tables)

    return (ray.data.read_binary_files(files, include_paths=True)
            .map_batches(explode, batch_format="pyarrow", batch_size=1))


def _arrow_to_avro_type(t: pa.DataType, name: str):
    """Reverse mapping for the sink: Arrow type → Avro schema node.
    Named Avro types (fixed/record) derive their name from the column."""
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_unsigned_integer(t):
        # unsigned needs the NEXT-size signed Avro type; uint64 has no
        # lossless Avro integer representation at all
        if t.bit_width >= 64:
            raise ValueError("avro sink: uint64 exceeds Avro long range")
        return "long" if t.bit_width >= 32 else "int"
    if pa.types.is_integer(t):
        return "long" if t.bit_width > 32 else "int"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_floating(t):
        return "double"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_fixed_size_binary(t):
        return {"type": "fixed", "name": f"fx_{name}", "size": t.byte_width}
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        if t.unit != "us":
            raise ValueError("avro sink: only µs timestamps supported")
        return {"type": "long", "logicalType": "timestamp-micros"}
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return {"type": "array",
                "items": _arrow_to_avro_type(t.value_type, name)}
    if pa.types.is_map(t):
        if not pa.types.is_string(t.key_type):
            raise ValueError("avro sink: map keys must be strings")
        return {"type": "map",
                "values": _arrow_to_avro_type(t.item_type, name)}
    if pa.types.is_struct(t):
        return {"type": "record", "name": f"rec_{name}", "fields": [
            {"name": f.name,
             "type": _arrow_to_avro_type(f.type, f"{name}_{f.name}")}
            for f in t]}
    raise ValueError(f"avro sink: unsupported Arrow type {t}")


def arrow_to_avro_schema(schema: pa.Schema, name: str = "row") -> dict:
    """Arrow schema → top-level Avro record. Every field is wrapped in a
    ``[null, T]`` union (Arrow columns are nullable by definition); the
    reader maps that union straight back to a nullable Arrow column."""
    return {"type": "record", "name": name, "fields": [
        {"name": f.name,
         "type": ["null", _arrow_to_avro_type(f.type, f.name)],
         "default": None}
        for f in schema]}


def shard_token(payload: bytes) -> str:
    """Retry-idempotent shard name token: Ray task id (stable across
    task RETRIES — only the attempt number changes) + payload content
    hash. A uuid here would leak one duplicate shard per retried write
    task and double-count rows on re-read; with this token the retry
    regenerates the SAME name and the atomic tmp→rename collapses the
    two writes. Falls back to a pure content hash outside a task."""
    import hashlib

    try:
        import ray

        tid = ray.get_runtime_context().get_task_id() or ""
    except Exception:
        tid = ""
    h = hashlib.sha1(payload).hexdigest()[:16]
    return f"{tid[:16]}-{h}" if tid else h


def write_avro(ds, out_dir: str | Path, *, codec: str = "deflate",
               block_records: int = 1000):
    """Avro object-container sink (B6 format breadth): each task encodes
    its batch as ONE container file through the from-scratch codec —
    partitioned output, no driver funnel, atomic tmp→rename like the
    IPC/ORC sinks so readers never see partials. The Avro schema is
    derived from the batch's Arrow schema (``arrow_to_avro_schema``);
    per-record encode is a Python walk by nature of the row-oriented
    format (the egress boundary, not a hot analytic path)."""
    from .ops.avrocodec import write_container

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        schema = arrow_to_avro_schema(t.schema)
        # sync=None derives the marker from content → the container is
        # deterministic for a given batch, making retries byte-identical
        blob = write_container(schema, t.to_pylist(), None, codec=codec,
                               block_records=block_records)
        name = out / f"part-{shard_token(blob)}.avro"
        tmp = name.with_suffix(".tmp")
        tmp.write_bytes(blob)
        tmp.rename(name)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    n = ds.map_batches(write_batch, batch_format="pyarrow").sum("rows")
    return int(n or 0)


AVRO_TURN_SCHEMA = {
    "type": "record", "name": "turn", "fields": [
        {"name": "conv_id", "type": "string"},
        {"name": "turn_idx", "type": "int"},
        {"name": "role", "type": {"type": "enum", "name": "role_e",
                                  "symbols": ["user", "assistant",
                                              "system", "tool"]}},
        {"name": "text", "type": "string"},
        {"name": "tool", "type": ["null", "string"], "default": None},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "score", "type": "double"},
        {"name": "flags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "fp", "type": {"type": "fixed", "name": "fp8", "size": 8}},
    ]}


def make_avro_shards(out_dir, n: int = 600, shards: int = 6,
                     seed: int = 47) -> dict:
    """Deterministic Avro fixture: ``n`` transcript-shaped records (the
    input_hint columns plus union/enum/array/map/fixed fields so every
    branch of the datum codec is exercised) spread round-robin over
    ``shards`` container files — half ``null`` codec, half ``deflate``
    (raw RFC-1951) — plus a ``truth.parquet`` sidecar carrying each
    record's generation-time truth. The reader must re-derive all of it
    from container bytes alone."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as _pq

    from .ops.avrocodec import write_container

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    roles = ["user", "assistant", "system", "tool"]
    tools = [None, "bash", "search", "editor", "python"]
    words = ["stream", "shard", "record", "schema", "union", "varint",
             "zigzag", "block", "marker", "codec"]
    flag_pool = ["pii", "long", "truncated", "retry", "final"]

    per_shard: dict[int, list[dict]] = {k: [] for k in range(shards)}
    truth = {c: [] for c in ("rec_idx", "shard", "conv_id", "turn_idx",
                             "role", "tool", "n_chars", "ts_micros",
                             "score", "n_flags", "attr_sum", "fp_hex")}
    names = {k: f"turns-{k:02d}.avro" for k in range(shards)}
    for i in range(n):
        k = i % shards
        conv = f"c{int(rng.integers(0, 40)):07d}"
        role = roles[int(rng.integers(0, 4))]
        tool = tools[int(rng.integers(0, len(tools)))]
        text = " ".join(rng.choice(words,
                                   size=int(rng.integers(3, 30)))) + f" #{i}"
        ts = 1_767_225_600_000_000 + i * 1_000_003  # µs since epoch
        score = round(float(rng.random()), 6)
        flags = list(rng.choice(flag_pool, size=int(rng.integers(0, 4)),
                                replace=False))
        attrs = {f"k{j}": int(rng.integers(0, 1000))
                 for j in range(int(rng.integers(0, 4)))}
        fp = hashlib.md5(f"turn-{i}".encode()).digest()[:8]
        per_shard[k].append({
            "conv_id": conv, "turn_idx": i // shards, "role": role,
            "text": text, "tool": tool, "ts": ts, "score": score,
            "flags": flags, "attrs": attrs, "fp": fp})
        truth["rec_idx"].append(i)
        truth["shard"].append(names[k])
        truth["conv_id"].append(conv)
        truth["turn_idx"].append(i // shards)
        truth["role"].append(role)
        truth["tool"].append(tool)
        truth["n_chars"].append(len(text))
        truth["ts_micros"].append(ts)
        truth["score"].append(score)
        truth["n_flags"].append(len(flags))
        truth["attr_sum"].append(sum(attrs.values()))
        truth["fp_hex"].append(fp.hex())
    for k in range(shards):
        codec = "deflate" if k >= shards - shards // 2 else "null"
        sync = hashlib.md5(f"logray-avro-{k}".encode()).digest()
        blob = write_container(AVRO_TURN_SCHEMA, per_shard[k], sync,
                               codec=codec, block_records=40)
        (out / names[k]).write_bytes(blob)
    _pq.write_table(pa.table({
        "rec_idx": pa.array(truth["rec_idx"], pa.int64()),
        "shard": pa.array(truth["shard"], pa.string()),
        "conv_id": pa.array(truth["conv_id"], pa.string()),
        "turn_idx": pa.array(truth["turn_idx"], pa.int64()),
        "role": pa.array(truth["role"], pa.string()),
        "tool": pa.array(truth["tool"], pa.string()),
        "n_chars": pa.array(truth["n_chars"], pa.int64()),
        "ts_micros": pa.array(truth["ts_micros"], pa.int64()),
        "score": pa.array(truth["score"], pa.float64()),
        "n_flags": pa.array(truth["n_flags"], pa.int64()),
        "attr_sum": pa.array(truth["attr_sum"], pa.int64()),
        "fp_hex": pa.array(truth["fp_hex"], pa.string()),
    }), out / "truth.parquet")
    return {"n": n, "shards": shards}


# --------------------------------------------------- access-log (CLF) source
# The web-server log format every log-parsing tool is eventually pointed
# at (Common Log Format + the combined-format referer/agent tail). A
# SECOND envelope ruleset over raw text: its own capture regex, its own
# converter set (bracketed %d/%b/%Y strptime timestamp, int status,
# byte-size with the '-' empty marker), reference default semantics
# (malformed lines survive as error rows).

ACCESS_LOG_REGEX = (
    r'^(?P<ip>\S+) \S+ (?P<user>\S+) \[(?P<ts>[^\]]+) \+0000\] '
    r'"(?P<method>[A-Z]+) (?P<path>\S+) HTTP/[0-9.]+" '
    r'(?P<status>\d{3}) (?P<nbytes>\d+|-)'
    r'(?: "(?P<referer>[^"]*)" "(?P<agent>[^"]*)")?$'
)


def access_log_parse(batch: pa.Table, line_col: str = "text") -> pa.Table:
    """Vectorized CLF envelope: one ``extract_regex`` pass + typed
    converters. Unmatched lines are never dropped (``parse_error``)."""
    lines = batch[line_col]
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    st = pc.extract_regex(lines, ACCESS_LOG_REGEX)
    env_err = st.is_null()

    def raw(name: str) -> pa.Array:
        return pc.if_else(env_err, pa.scalar(None, pa.string()),
                          st.field(name))

    # the bracketed timestamp is the one converter whose failure makes
    # the whole line unusable — an unparseable date is a malformed line
    # (reference converter-failure semantics), not a null field
    ts = pc.strptime(raw("ts"), format="%d/%b/%Y:%H:%M:%S", unit="us",
                     error_is_null=True)
    # raw("ts") is already null on envelope failure, so a null parsed ts
    # is exactly "envelope failed OR date unparseable"
    err = ts.is_null()

    def field(name: str) -> pa.Array:
        return pc.if_else(err, pa.scalar(None, pa.string()), raw(name))
    nb = field("nbytes")
    # CLF writes '-' for "no body" — a CONVERTER failure distinct from an
    # envelope failure; surface as null bytes, not an error row
    nb = pc.if_else(pc.equal(nb, "-"), pa.scalar(None, pa.string()), nb)
    def dash_null(name: str) -> pa.Array:
        # '-' is CLF's explicit empty marker; '' is an optional combined
        # tail that didn't participate in the match (bare CLF line) —
        # both mean "absent" and surface as null
        v = field(name)
        return pc.if_else(pc.is_in(v, value_set=pa.array(["-", ""])),
                          pa.scalar(None, pa.string()), v)

    return pa.table({
        "ip": field("ip"),
        "user": dash_null("user"),
        "ts": ts,
        "method": field("method"),
        "path": field("path"),
        "status": pc.cast(field("status"), pa.int32()),
        "n_bytes": pc.cast(nb, pa.int64()),
        "referer": dash_null("referer"),
        "agent": dash_null("agent"),
        "parse_error": err,
    })


def read_access_log(log_dir: str | Path):
    """``read_text`` over ``.log`` access-log files → CLF envelope."""
    import ray.data

    files = sorted(str(p) for p in Path(log_dir).glob("*.log"))
    if not files:
        raise FileNotFoundError(f"no .log files in {log_dir}")
    return ray.data.read_text(files).map_batches(
        access_log_parse, batch_format="pyarrow")


def make_access_logs(out_dir, n: int = 800, shards: int = 4,
                     seed: int = 59) -> dict:
    """Deterministic CLF fixture: ``n`` requests over ``shards`` files
    (combined format on even shards, bare CLF on odd; a few '-' byte
    markers and anonymous users) plus a ``truth.parquet`` sidecar with
    each line's generation-time fields. The parser must re-derive all of
    it from text alone."""
    import numpy as np
    import pyarrow.parquet as _pq

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    methods = ["GET", "GET", "GET", "POST", "PUT", "DELETE"]
    statuses = [200, 200, 200, 204, 301, 304, 404, 500, 503]
    paths = ["/", "/index.html", "/api/v1/items", "/static/app.js",
             "/login", "/health", "/search?q=ray"]
    agents = ["curl/8.0", "Mozilla/5.0 (X11; Linux)", "bot/2.1"]
    base = 1_767_225_600  # epoch seconds, 2026-01-01T00:00:00Z
    months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

    bufs: dict[int, list[str]] = {k: [] for k in range(shards)}
    truth = {c: [] for c in ("line_id", "shard", "ip", "user", "ts_us",
                             "method", "path", "status", "n_bytes",
                             "agent")}
    names = {k: f"access-{k:02d}.log" for k in range(shards)}
    for i in range(n):
        k = i % shards
        ip = (f"10.{int(rng.integers(0, 4))}."
              f"{int(rng.integers(0, 256))}.{int(rng.integers(1, 255))}")
        user = None if rng.random() < 0.8 else f"u{int(rng.integers(0, 9))}"
        secs = base + i * 7
        import datetime as dt
        t = dt.datetime.fromtimestamp(secs, dt.timezone.utc)
        ts_str = (f"{t.day:02d}/{months[t.month - 1]}/{t.year}:"
                  f"{t.hour:02d}:{t.minute:02d}:{t.second:02d} +0000")
        method = methods[int(rng.integers(0, len(methods)))]
        path = paths[int(rng.integers(0, len(paths)))]
        status = int(statuses[int(rng.integers(0, len(statuses)))])
        nbytes = None if status in (204, 304) \
            else int(rng.integers(64, 200_000))
        agent = agents[int(rng.integers(0, len(agents)))] \
            if k % 2 == 0 else None
        line = (f"{ip} - {user or '-'} [{ts_str}] "
                f'"{method} {path} HTTP/1.1" {status} '
                f"{nbytes if nbytes is not None else '-'}")
        if agent is not None:  # combined format tail
            line += f' "-" "{agent}"'
        bufs[k].append(line)
        truth["line_id"].append(i)
        truth["shard"].append(names[k])
        truth["ip"].append(ip)
        truth["user"].append(user)
        truth["ts_us"].append(secs * 1_000_000)
        truth["method"].append(method)
        truth["path"].append(path)
        truth["status"].append(status)
        truth["n_bytes"].append(nbytes)
        truth["agent"].append(agent)
    for k in range(shards):
        (out / names[k]).write_text("\n".join(bufs[k]) + "\n")
    _pq.write_table(pa.table({
        "line_id": pa.array(truth["line_id"], pa.int64()),
        "shard": pa.array(truth["shard"], pa.string()),
        "ip": pa.array(truth["ip"], pa.string()),
        "user": pa.array(truth["user"], pa.string()),
        "ts_us": pa.array(truth["ts_us"], pa.int64()),
        "method": pa.array(truth["method"], pa.string()),
        "path": pa.array(truth["path"], pa.string()),
        "status": pa.array(truth["status"], pa.int64()),
        "n_bytes": pa.array(truth["n_bytes"], pa.int64()),
        "agent": pa.array(truth["agent"], pa.string()),
    }), out / "truth.parquet")
    return {"n": n, "shards": shards}


# --------------------------------------------------------------- logfmt ----

LOGFMT_KEYS = ("level", "svc", "conv", "turn", "dur_ms", "ok")


def logfmt_parse(batch: pa.Table, line_col: str = "text") -> pa.Table:
    """Vectorized logfmt envelope (key=value pairs in ARBITRARY order —
    the property that distinguishes it from positional formats like CLF).

    The one quoted free-text key (``msg``) is extracted first and then
    BLANKED from the line before the per-key passes, so message text
    containing ``turn=`` / ``level=`` can never satisfy another key's
    pattern — the vectorized equivalent of a sequential tokenizer's
    quote state. Remaining keys are bare tokens: one anchored
    ``extract_regex`` kernel pass per key, order-independent. ``msg``
    unescapes \\" and \\\\ via one RE2 rewrite. A line without a parseable
    ``ts`` key is malformed (parse_error=true, all fields null) but
    never dropped."""
    lines = batch[line_col]
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()

    msg_st = pc.extract_regex(lines, r'(?:^| )msg="(?P<m>(?:[^"\\]|\\.)*)"')
    msg = pc.if_else(msg_st.is_null(), pa.scalar(None, pa.string()),
                     msg_st.field("m"))
    msg = pc.replace_substring_regex(msg, pattern=r"\\(.)", replacement=r"\1")
    clean = pc.replace_substring_regex(
        lines, pattern=r'(?:^| )msg="(?:[^"\\]|\\.)*"', replacement="")

    def key(name: str) -> pa.Array:
        st = pc.extract_regex(clean, rf'(?:^| ){name}=(?P<v>[^"\s]\S*)')
        return pc.if_else(st.is_null(), pa.scalar(None, pa.string()),
                          st.field("v"))

    ts = pc.strptime(key("ts"), format="%Y-%m-%dT%H:%M:%SZ", unit="us",
                     error_is_null=True)
    err = ts.is_null()

    def gated(v, typ=None):
        v = pc.if_else(err, pa.scalar(None, pa.string()), v)
        return pc.cast(v, typ) if typ is not None else v

    ok = gated(key("ok"))
    return pa.table({
        "ts": ts,
        "level": gated(key("level")),
        "svc": gated(key("svc")),
        "conv": gated(key("conv")),
        "turn": gated(key("turn"), pa.int32()),
        "msg": gated(msg),
        "dur_ms": gated(key("dur_ms"), pa.int64()),
        "ok": pc.equal(ok, "true"),  # null stays null
        "parse_error": err,
    })


def read_logfmt(log_dir: str | Path):
    """``read_text`` over ``.log`` logfmt files → logfmt envelope."""
    import ray.data

    files = sorted(str(p) for p in Path(log_dir).glob("*.log"))
    if not files:
        raise FileNotFoundError(f"no .log files in {log_dir}")
    return ray.data.read_text(files).map_batches(
        logfmt_parse, batch_format="pyarrow")


def make_logfmt_logs(out_dir, n: int = 900, shards: int = 3,
                     seed: int = 67) -> dict:
    """Deterministic logfmt fixture: ``n`` records over ``shards`` files
    with PER-LINE-SHUFFLED key order, optional keys, quoted messages
    carrying escape and key-spoofing hazards (a msg containing
    ``turn=99 level=evil`` must not leak into those fields), ~2%
    malformed lines, plus a ``truth.parquet`` sidecar of the
    generation-time fields the parser must re-derive from text alone."""
    import datetime as dt

    import numpy as np
    import pyarrow.parquet as _pq

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    levels = ["info", "info", "info", "warn", "error", "debug"]
    svcs = ["gateway", "parser", "router", "sink"]
    msgs = [
        'routed batch',
        'tool call ok',
        'retry turn=99 level=evil injection',   # key-spoof hazard
        'path "quoted" segment',                # escaped-quote hazard
        'backslash C:\\tmp\\x',                 # escaped-backslash hazard
        'flush q=ray done',
        None,                                   # msg absent
    ]
    base = 1_767_312_000  # 2026-01-02T00:00:00Z
    bufs: dict[int, list[str]] = {k: [] for k in range(shards)}
    names = {k: f"app-{k:02d}.log" for k in range(shards)}
    truth = {c: [] for c in ("ts_us", "shard", "level", "svc", "conv",
                             "turn", "msg", "dur_ms", "ok")}
    for i in range(n):
        k = i % shards
        if i % 53 == 17:  # malformed: no ts key → parse_error row
            bufs[k].append("!!corrupt line #%d without structure" % i)
            continue
        secs = base + i * 3
        t = dt.datetime.fromtimestamp(secs, dt.timezone.utc)
        level = levels[int(rng.integers(0, len(levels)))]
        svc = svcs[int(rng.integers(0, len(svcs)))]
        conv = f"c{int(rng.integers(0, 40)):03d}"
        turn = int(rng.integers(0, 50))
        msg = msgs[int(rng.integers(0, len(msgs)))]
        dur = None if rng.random() < 0.3 else int(rng.integers(1, 5000))
        ok = None if rng.random() < 0.5 else bool(rng.random() < 0.9)
        parts = [f"ts={t.strftime('%Y-%m-%dT%H:%M:%SZ')}",
                 f"level={level}", f"svc={svc}", f"conv={conv}",
                 f"turn={turn}"]
        if msg is not None:
            esc = msg.replace("\\", "\\\\").replace('"', '\\"')
            parts.append(f'msg="{esc}"')
        if dur is not None:
            parts.append(f"dur_ms={dur}")
        if ok is not None:
            parts.append(f"ok={'true' if ok else 'false'}")
        order = rng.permutation(len(parts))
        bufs[k].append(" ".join(parts[j] for j in order))
        truth["ts_us"].append(secs * 1_000_000)
        truth["shard"].append(names[k])
        truth["level"].append(level)
        truth["svc"].append(svc)
        truth["conv"].append(conv)
        truth["turn"].append(turn)
        truth["msg"].append(msg)
        truth["dur_ms"].append(dur)
        truth["ok"].append(ok)
    for k in range(shards):
        (out / names[k]).write_text("\n".join(bufs[k]) + "\n")
    _pq.write_table(pa.table({
        "ts_us": pa.array(truth["ts_us"], pa.int64()),
        "shard": pa.array(truth["shard"], pa.string()),
        "level": pa.array(truth["level"], pa.string()),
        "svc": pa.array(truth["svc"], pa.string()),
        "conv": pa.array(truth["conv"], pa.string()),
        "turn": pa.array(truth["turn"], pa.int32()),
        "msg": pa.array(truth["msg"], pa.string()),
        "dur_ms": pa.array(truth["dur_ms"], pa.int64()),
        "ok": pa.array(truth["ok"], pa.bool_()),
    }), out / "truth.parquet")
    return {"n": n, "shards": shards}


# --------------------------------------------------------------- syslog ----

SYSLOG_HEADER_REGEX = (
    r"^<(?P<pri>\d{1,3})>1 "
    r"(?P<ts>\S+) (?P<host>\S+) (?P<app>\S+) (?P<procid>\S+) "
    r"(?P<msgid>\S+) "
    r"(?P<sd>-|(?:\[(?:[^\]\\]|\\.)*\])+)"
    r"(?: (?P<msg>.*))?$"
)


def syslog_parse(batch: pa.Table, line_col: str = "text") -> pa.Table:
    """Vectorized RFC 5424 syslog envelope (version 1): one header
    ``extract_regex`` covering PRI/timestamp/host/app/procid/msgid, the
    STRUCTURED-DATA region as a contiguous ``[..]``-element run whose
    values may carry escaped ``\\]`` and ``\\"`` (the classic parser
    trap — a naive ``\\[[^\\]]*\\]`` truncates at the first escaped
    bracket), and the free-text MSG after it. facility/severity derive
    from PRI (pri//8, pri%8); NILVALUE '-' surfaces as null; known SD
    params (conv, turn) extract with escape-aware value patterns and
    unescape via one RE2 rewrite; ``n_sd`` counts SD elements. A line
    failing the header is malformed (parse_error=true) but survives."""
    lines = batch[line_col]
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    st = pc.extract_regex(lines, SYSLOG_HEADER_REGEX)
    err = st.is_null()

    def raw(name: str) -> pa.Array:
        return pc.if_else(err, pa.scalar(None, pa.string()),
                          st.field(name))

    def nil(name: str) -> pa.Array:
        v = raw(name)
        return pc.if_else(pc.equal(v, "-"), pa.scalar(None, pa.string()),
                          v)

    pri = pc.cast(raw("pri"), pa.int64())
    ts = pc.strptime(raw("ts"), format="%Y-%m-%dT%H:%M:%SZ", unit="us",
                     error_is_null=True)
    sd = nil("sd")

    def sd_param(name: str) -> pa.Array:
        p = pc.extract_regex(
            sd, rf'{name}="(?P<v>(?:[^"\\]|\\.)*)"')
        v = pc.if_else(p.is_null(), pa.scalar(None, pa.string()),
                       p.field("v"))
        return pc.replace_substring_regex(v, pattern=r"\\(.)",
                                          replacement=r"\1")

    n_sd = pc.if_else(
        sd.is_null(), pa.scalar(0, pa.int64()),
        pc.cast(pc.count_substring_regex(
            sd, r"\[(?:[^\]\\]|\\.)*\]"), pa.int64()))
    return pa.table({
        "facility": pc.divide(pri, 8),
        "severity": pc.subtract(pri, pc.multiply(pc.divide(pri, 8), 8)),
        "ts": ts,
        "host": nil("host"),
        "app": nil("app"),
        "procid": pc.cast(nil("procid"), pa.int64()),
        "msgid": nil("msgid"),
        "n_sd": n_sd,
        "conv": sd_param("conv"),
        "turn": pc.cast(sd_param("turn"), pa.int32()),
        # the optional MSG group surfaces as '' when absent (the
        # null-struct-child gotcha) — absent MSG is null per RFC
        "msg": pc.if_else(pc.equal(pc.fill_null(raw("msg"), ""), ""),
                          pa.scalar(None, pa.string()), raw("msg")),
        "parse_error": err,
    })


def read_syslog(log_dir: str | Path):
    """``read_text`` over ``.log`` syslog files → RFC 5424 envelope."""
    import ray.data

    files = sorted(str(p) for p in Path(log_dir).glob("*.log"))
    if not files:
        raise FileNotFoundError(f"no .log files in {log_dir}")
    return ray.data.read_text(files).map_batches(
        syslog_parse, batch_format="pyarrow")


def make_syslog_logs(out_dir, n: int = 800, shards: int = 3,
                     seed: int = 71) -> dict:
    """Deterministic RFC 5424 fixture: severities spanning facilities,
    NIL fields, 0–2 structured-data elements per line with escaped
    ``\\]``/``\\"`` hazards inside values, messages containing literal
    brackets (must NOT read as SD), ~2% malformed lines, plus a
    ``truth.parquet`` sidecar of generation-time fields."""
    import datetime as dt

    import numpy as np
    import pyarrow.parquet as _pq

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    apps = ["gateway", "parser", "router"]
    msgs = ["routed ok", "retry scheduled", "[not sd] bracket msg",
            "flush done", None]
    convs = [f"c{i:03d}" for i in range(30)]
    base = 1_767_312_000  # 2026-01-02T00:00:00Z
    bufs: dict[int, list[str]] = {k: [] for k in range(shards)}
    names = {k: f"sys-{k:02d}.log" for k in range(shards)}
    truth = {c: [] for c in ("ts_us", "facility", "severity", "host",
                             "app", "procid", "msgid", "n_sd", "conv",
                             "turn", "msg")}
    for i in range(n):
        k = i % shards
        if i % 53 == 17:
            bufs[k].append(f"garbage line {i} no header")
            continue
        fac = int(rng.integers(0, 24))
        sev = int(rng.integers(0, 8))
        pri = fac * 8 + sev
        secs = base + i * 2
        t = dt.datetime.fromtimestamp(secs, dt.timezone.utc)
        host = f"node{int(rng.integers(0, 4)):02d}"
        app = apps[int(rng.integers(0, len(apps)))]
        procid = None if rng.random() < 0.3 else int(
            rng.integers(100, 9999))
        msgid = None if rng.random() < 0.5 else f"M{int(rng.integers(0, 9))}"
        conv = None
        turn = None
        n_sd = int(rng.integers(0, 3))
        sd_parts = []
        if n_sd >= 1:
            conv = convs[int(rng.integers(0, len(convs)))]
            turn = int(rng.integers(0, 50))
            hazard = ' note="a\\]b\\"c"' if i % 9 == 4 else ""
            sd_parts.append(f'[meta@32473 conv="{conv}" '
                            f'turn="{turn}"{hazard}]')
        if n_sd == 2:
            sd_parts.append('[origin ip="10.0.0.1"]')
        sd = "".join(sd_parts) if sd_parts else "-"
        msg = msgs[int(rng.integers(0, len(msgs)))]
        line = (f"<{pri}>1 {t.strftime('%Y-%m-%dT%H:%M:%SZ')} {host} "
                f"{app} {procid if procid is not None else '-'} "
                f"{msgid if msgid is not None else '-'} {sd}")
        if msg is not None:
            line += f" {msg}"
        bufs[k].append(line)
        truth["ts_us"].append(secs * 1_000_000)
        truth["facility"].append(fac)
        truth["severity"].append(sev)
        truth["host"].append(host)
        truth["app"].append(app)
        truth["procid"].append(procid)
        truth["msgid"].append(msgid)
        truth["n_sd"].append(n_sd)
        truth["conv"].append(conv)
        truth["turn"].append(turn)
        truth["msg"].append(msg)
    for k in range(shards):
        (out / names[k]).write_text("\n".join(bufs[k]) + "\n")
    _pq.write_table(pa.table({
        "ts_us": pa.array(truth["ts_us"], pa.int64()),
        "facility": pa.array(truth["facility"], pa.int64()),
        "severity": pa.array(truth["severity"], pa.int64()),
        "host": pa.array(truth["host"], pa.string()),
        "app": pa.array(truth["app"], pa.string()),
        "procid": pa.array(truth["procid"], pa.int64()),
        "msgid": pa.array(truth["msgid"], pa.string()),
        "n_sd": pa.array(truth["n_sd"], pa.int64()),
        "conv": pa.array(truth["conv"], pa.string()),
        "turn": pa.array(truth["turn"], pa.int32()),
        "msg": pa.array(truth["msg"], pa.string()),
    }), out / "truth.parquet")
    return {"n": n, "shards": shards}
