"""Property-based equivalence: for ARBITRARY inputs the vectorized
Arrow engine must agree row-for-row with the single-process oracle
parser (first-match-wins, gates, typed converts, parse_error flags).
This is the strongest form of the reference-semantics contract: the
golden corpus checks known shapes; hypothesis searches for shapes we
didn't think of (adversarial texts, odd whitespace, unicode, near-miss
template strings)."""

from __future__ import annotations

import datetime
import math

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from logray.oracle import OracleParser
from logray.rules_transcripts import TRANSCRIPT_PASSTHROUGH, transcript_ruleset

_RS = transcript_ruleset()
_OP = OracleParser()

# text shapes: pure random unicode, template-like strings, and mutations
# that sit right at rule boundaries
_template_texts = st.one_of(
    st.text(max_size=120),
    st.builds(lambda t, c, q: f"[tool:{t}] call id={c} args={{\"q\": \"{q}\"}}",
              st.sampled_from(["bash", "sql", "x", ""]),
              st.integers(-5, 10**12), st.text(max_size=8)),
    st.builds(lambda t, c, b, d: f"[tool:{t}] ok id={c} bytes={b} dur_ms={d}",
              st.sampled_from(["bash", "files"]), st.integers(0, 10**6),
              st.integers(-1, 10**18), st.integers(0, 10**6)),
    st.builds(lambda p: f"[status] phase=plan pct={p}%", st.integers(-5, 200)),
    st.builds(lambda n: f"[metrics] tokens={n} latency_ms=5 cost_usd=0.1",
              st.integers(0, 10**19)),  # above int64: parse_error path
    st.builds(lambda w: f"/{w}", st.text(max_size=10)),
    st.sampled_from(["", "\n", "a\nb", "z" * 401, "Traceback (most recent call last): X: y z"]),
)

_row = st.fixed_dictionaries({
    "conv_id": st.text(min_size=1, max_size=8),
    "turn_idx": st.integers(0, 1000),
    "role": st.sampled_from(["user", "assistant", "system", "tool", "other"]),
    "text": st.one_of(st.none(), _template_texts),
    "tool": st.sampled_from(["", "bash", "nope"]),
    "ts": st.datetimes(min_value=datetime.datetime(2000, 1, 1),
                       max_value=datetime.datetime(2030, 1, 1)),
})


def _eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or abs(a - b) < 1e-9
    return a == b


@settings(max_examples=200, deadline=None)
@given(st.lists(_row, min_size=1, max_size=40))
def test_engine_equals_oracle_on_arbitrary_rows(rows):
    # unique key per row (random rows may collide on (conv_id, turn_idx)
    # while differing elsewhere)
    rows = [dict(r, turn_idx=i) for i, r in enumerate(rows)]
    schema = pa.schema([pa.field(n, t) for n, t in TRANSCRIPT_PASSTHROUGH])
    table = pa.Table.from_pylist(rows, schema=schema)
    got = {(r["conv_id"], r["turn_idx"]): r
           for r in _RS.parse_batch(table).to_pylist()}
    assert len(got) == len(rows)
    for row in rows:
        want = _OP.parse_row(row)
        g = got[(row["conv_id"], row["turn_idx"])]
        for k, v in want.items():
            assert _eq(g.get(k), v), (k, g.get(k), v, row["text"])


@settings(max_examples=50, deadline=None)
@given(st.lists(_row, min_size=2, max_size=30), st.randoms())
def test_batch_split_invariance(rows, rnd):
    """Parsing a batch in one call == parsing any split of it (no
    cross-row state in the stateless engine)."""
    rows = [dict(r, turn_idx=i) for i, r in enumerate(rows)]
    schema = pa.schema([pa.field(n, t) for n, t in TRANSCRIPT_PASSTHROUGH])
    table = pa.Table.from_pylist(rows, schema=schema)
    whole = _RS.parse_batch(table).to_pylist()
    cut = rnd.randrange(1, len(rows))
    split = (_RS.parse_batch(table.slice(0, cut)).to_pylist()
             + _RS.parse_batch(table.slice(cut)).to_pylist())
    key = lambda r: (r["conv_id"], r["turn_idx"], str(r.get("text")))
    assert sorted(map(key, whole)) == sorted(map(key, split))
    by_key_whole = {key(r): r for r in whole}
    for r in split:
        assert {k: v for k, v in by_key_whole[key(r)].items()} == r


# ---- join family: distributed == single-process pandas merge ----------------

_jrow = st.fixed_dictionaries({
    "k": st.one_of(st.none(), st.integers(0, 5)),
    "v": st.integers(-100, 100),
})


@settings(max_examples=6, deadline=None)
@given(lrows=st.lists(_jrow, max_size=40), rrows=st.lists(_jrow, max_size=10))
def test_hash_join_equals_pandas_merge(ray_session, lrows, rrows):
    """For arbitrary (small) inputs incl. null keys, the bucketed shuffle
    join must equal one big pandas merge — co-location can't change the
    answer. Null-key semantics are pandas' (null matches null), noted in
    the multi_hash_join docstring."""
    import pandas as pd
    import ray.data

    from logray.ops.relational import hash_join

    lt = pa.Table.from_pylist(
        [{"k": r["k"], "v": r["v"]} for r in lrows],
        schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]))
    rt = pa.Table.from_pylist(
        [{"k": r["k"], "w": r["v"]} for r in rrows],
        schema=pa.schema([("k", pa.int64()), ("w", pa.int64())]))
    want = lt.to_pandas().merge(rt.to_pandas(), on="k", how="outer")
    got = hash_join(ray.data.from_arrow(lt).repartition(3),
                    ray.data.from_arrow(rt).repartition(2),
                    "k", how="outer", num_buckets=4,
                    left_schema=lt.schema, right_schema=rt.schema).to_pandas()
    if not len(got):  # both sides empty: Ray gives a column-less frame
        got = want.iloc[:0]
    key = ["k", "v", "w"]
    want = want.sort_values(key, na_position="last").reset_index(drop=True)
    got = got.sort_values(key, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


_doc_text = st.text(
    alphabet=st.sampled_from(list("ab c\t\n")), max_size=60)


@settings(max_examples=150, deadline=None)
@given(st.lists(_doc_text, min_size=1, max_size=8),
       st.integers(min_value=1, max_value=7))
def test_segment_explode_rejoin_is_normalized_text(texts, w):
    import pandas as pd

    from logray.ops.text import segment_explode

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = segment_explode(t, "doc_id", "text", w).to_pandas()
    for d, txt in enumerate(texts):
        words = txt.split()
        segs = out[out["doc_id"] == d].sort_values("seg_idx")
        if not words:
            assert len(segs) == 0
            continue
        assert " ".join(segs["seg"]) == " ".join(words)
        # every segment but the last is exactly w words
        lens = [len(s.split()) for s in segs["seg"]]
        assert all(n == w for n in lens[:-1]) and 1 <= lens[-1] <= w


@settings(max_examples=150, deadline=None)
@given(st.lists(_doc_text, min_size=1, max_size=6))
def test_sliding_chunks_cover_every_word_le_twice(texts):
    from logray.ops.text import sliding_chunk_explode

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = sliding_chunk_explode(t, "doc_id", "text",
                                width=4, stride=2).to_pandas()
    for d, txt in enumerate(texts):
        words = txt.split()
        chunks = out[out["doc_id"] == d].sort_values("chunk_id")
        if not words:
            assert len(chunks) == 0
            continue
        # chunk c covers words [2c, 2c+4); multiset union counts each word
        # index min(2, #windows containing it) times
        got = [w_ for c in chunks["chunk_text"] for w_ in c.split()]
        want = []
        for c in range(len(chunks)):
            want.extend(words[2 * c:2 * c + 4])
        assert got == want
        assert len(chunks) == (len(words) + 1) // 2


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=0xFFFF),
       st.integers(min_value=0, max_value=0xFFFF))
def test_morton2_matches_bitwise_reference(x, y):
    import numpy as np

    from logray.ops.layout import morton2

    z = int(morton2(np.array([x]), np.array([y]))[0])
    ref = 0
    for b in range(16):
        ref |= ((x >> b) & 1) << (2 * b)
        ref |= ((y >> b) & 1) << (2 * b + 1)
    assert z == ref


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=24),
       st.integers(0, 24), st.one_of(st.none(), st.characters()),
       st.sampled_from(["sub", "ins", "del", "dup"]))
def test_ed1_blocking_keys_complete(s, pos, ch, op):
    """The pigeonhole blocking behind edit_distance_selfjoin must be
    COMPLETE: any two strings within Levenshtein distance 1 share at
    least one (band, key) — substitutions, insertions, deletions,
    duplicates, unicode, empty strings."""
    from logray.ops.text import ed1_blocking_keys, levenshtein_batch

    p = min(pos, len(s))
    if op == "sub" and s and ch is not None:
        t = s[:min(p, len(s) - 1)] + ch + s[min(p, len(s) - 1) + 1:]
    elif op == "ins" and ch is not None:
        t = s[:p] + ch + s[p:]
    elif op == "del" and s:
        t = s[:min(p, len(s) - 1)] + s[min(p, len(s) - 1) + 1:]
    else:
        t = s
    from logray.ops.text import ed1_deletion_keys

    assert int(levenshtein_batch([s], [t])[0]) <= 1  # construction check
    assert set(ed1_blocking_keys(s)) & set(ed1_blocking_keys(t))
    assert set(ed1_deletion_keys(s)) & set(ed1_deletion_keys(t))


# --- PII redaction: engine (pyarrow RE2) vs pure-Python re replay --------

_pii_filler = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40)
_pii_tokens = st.sampled_from([
    "a.b+c@mail.example.com", "x@y.io", "10.0.0.1", "255.255.255.255",
    "+1-555-000-1234", "+44-123-456-7890", "1.2.3", "not@tld", "@", "+1-55",
])


@given(st.lists(
    st.tuples(_pii_filler, _pii_tokens, _pii_filler), min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_pii_redact_matches_pure_python_re(parts):
    """The vectorized pass chain must agree with a row-by-row ``re`` replay
    of the SAME progressive semantics on arbitrary unicode around planted
    (and near-miss) PII tokens."""
    import re

    import pyarrow as pa

    from logray.ops.text import PII_PASSES, pii_redact_batch

    texts = [f"{a} {tok} {b}" for a, tok, b in parts]
    out = pii_redact_batch(pa.table({"text": pa.array(texts, pa.string())}))

    for i, t in enumerate(texts):
        red = t
        counts = []
        for pat, token in PII_PASSES:
            counts.append(len(re.findall(pat, red)))
            red = re.sub(pat, token, red)
        assert out["redacted"][i].as_py() == red, t
        got = [out[c][i].as_py() for c in ("n_email", "n_ip", "n_phone")]
        assert got == counts, (t, got, counts)


@given(st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 59),
                          st.integers(0, 59), st.booleans(), st.booleans()),
                min_size=1, max_size=50))
def test_duration_converter_round_trips_any_span(spans):
    """duration converter property: for any (h, m, s) rendered in the
    '[Hh][Mm]Ss' surface form (with or without the optional larger
    units), the vectorized Arrow cast and the pure-Python oracle both
    recover exactly h*3600 + m*60 + s; rendering variants with
    unpadded vs zero-padded minutes/seconds parse identically."""
    import numpy as np

    from logray.ruleset import Cast, _safe_cast

    texts, want = [], []
    for h, m, s, pad, with_units in spans:
        if with_units and h:
            txt = (f"{h}h{m:02d}m{s:02d}s" if pad else f"{h}h{m}m{s}s")
            total = h * 3600 + m * 60 + s
        elif with_units and m:
            txt = f"{m}m{s:02d}s" if pad else f"{m}m{s}s"
            total = m * 60 + s
        else:
            txt = f"{s}s"
            total = s
        texts.append(txt)
        want.append(total)
    out, err = _safe_cast(pa.array(texts, pa.string()), Cast("d", "duration"))
    assert out.to_pylist() == want
    assert not err.any()
    # oracle parser parity through a rule that carries the cast
    import re as _re
    for txt, total in zip(texts, want):
        mm = _re.fullmatch(r"(?:(\d{1,15})h)?(?:(\d{1,15})m)?(\d{1,15})s", txt)
        assert mm is not None
        got = (int(mm.group(1) or 0) * 3600 + int(mm.group(2) or 0) * 60
               + int(mm.group(3)))
        assert got == total


@given(st.text(alphabet="0123456789hms", min_size=0, max_size=24))
def test_duration_converter_malformed_never_crashes(junk):
    """Any string over the duration alphabet either parses to the exact
    reference value (re-derived with the bounded regex) or yields
    null + error — the vectorized kernel must never raise or disagree
    with the scalar reference."""
    import re as _re

    from logray.ruleset import Cast, _safe_cast

    out, err = _safe_cast(pa.array([junk], pa.string()), Cast("d", "duration"))
    mm = _re.fullmatch(r"(?:(\d{1,15})h)?(?:(\d{1,15})m)?(\d{1,15})s", junk) if junk else None
    if junk == "":
        assert out[0].as_py() is None and not err[0]
    elif mm is None:
        assert out[0].as_py() is None and err[0]
    else:
        want = (int(mm.group(1) or 0) * 3600 + int(mm.group(2) or 0) * 60
                + int(mm.group(3)))
        assert out[0].as_py() == want and not err[0]


_SIZE_MULT = {"B": 1, "KiB": 1024, "MiB": 1024 ** 2,
              "GiB": 1024 ** 3, "TiB": 1024 ** 4}


@given(st.lists(st.tuples(st.integers(0, 999_999),
                          st.one_of(st.none(), st.text("0123456789",
                                                       min_size=1,
                                                       max_size=3)),
                          st.sampled_from(sorted(_SIZE_MULT))),
                min_size=1, max_size=50))
def test_size_converter_exact_for_any_rendered_size(sizes):
    """size converter property: for any '<whole>[.<frac>]<unit>' surface
    form, the vectorized Arrow cast recovers EXACTLY
    whole*mult + frac3*mult // 1000 (frac right-padded to 3 digits) —
    integer floor semantics, no float rounding — and never flags an
    error."""
    from logray.ruleset import Cast, _safe_cast

    texts, want = [], []
    for whole, frac, unit in sizes:
        mult = _SIZE_MULT[unit]
        if frac is None:
            texts.append(f"{whole}{unit}")
            want.append(whole * mult)
        else:
            texts.append(f"{whole}.{frac}{unit}")
            want.append(whole * mult + int(frac.ljust(3, "0")) * mult // 1000)
    out, err = _safe_cast(pa.array(texts, pa.string()), Cast("z", "size"))
    assert out.to_pylist() == want
    assert not err.any()


@given(st.text(alphabet="0123456789.BKMGTi", min_size=0, max_size=16))
def test_size_converter_malformed_never_crashes(junk):
    """Any string over the size alphabet either parses to the exact
    reference value (re-derived with the bounded regex) or yields
    null + error — the vectorized kernel must never raise or disagree
    with the scalar reference."""
    import re as _re

    from logray.ruleset import Cast, _safe_cast

    out, err = _safe_cast(pa.array([junk], pa.string()), Cast("z", "size"))
    mm = (_re.fullmatch(r"(\d{1,6})(?:\.(\d{1,3}))?(B|KiB|MiB|GiB|TiB)", junk)
          if junk else None)
    if junk == "":
        assert out[0].as_py() is None and not err[0]
    elif mm is None:
        assert out[0].as_py() is None and err[0]
    else:
        mult = _SIZE_MULT[mm.group(3)]
        want = (int(mm.group(1)) * mult
                + int((mm.group(2) or "").ljust(3, "0") or "0") * mult // 1000)
        assert out[0].as_py() == want and not err[0]


@settings(max_examples=25, deadline=None)
@given(
    lkeys=st.lists(st.integers(-50, 50), min_size=1, max_size=120),
    rkeys=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
    how=st.sampled_from(["inner", "left"]),
)
def test_broadcast_join_dense_kernel_equals_pandas_merge(
        ray_session, lkeys, rkeys, how):
    """r5 dense-lookup fast path ≡ pandas merge for arbitrary int keys
    (negative offsets, duplicate right keys → m:n expansion, unmatched
    lefts → nulls), inner and left."""
    import numpy as np
    import pandas as pd
    import ray.data

    from logray.ops.relational import broadcast_join

    left = pa.table({"k": pa.array(lkeys, pa.int64()),
                     "lv": pa.array(range(len(lkeys)), pa.int64())})
    right = pd.DataFrame({"k": np.asarray(rkeys, np.int64),
                          "rv": np.arange(len(rkeys), dtype=np.int64)})
    got = broadcast_join(ray.data.from_arrow(left), right, on="k",
                         how=how).to_pandas()
    want = left.to_pandas().merge(right, on="k", how=how)
    if len(want) == 0:
        # Ray's to_pandas() on an all-empty dataset drops the schema on
        # EVERY code path (pandas joiner included) — compare emptiness
        assert len(got) == 0
        return

    def norm(df):
        df = df[sorted(df.columns)].astype("float64")
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    import pandas.testing as pt

    pt.assert_frame_equal(norm(got), norm(want), check_dtype=False)


@settings(max_examples=20, deadline=None)
@given(
    n_left=st.integers(1, 80),
    n_right=st.integers(1, 60),
    tol=st.one_of(st.none(), st.integers(1, 20)),
    direction=st.sampled_from(["backward", "forward"]),
    seed=st.integers(0, 10_000),
)
def test_asof_kernel_equals_merge_asof(ray_session, n_left, n_right,
                                       tol, direction, seed):
    """r5 shared Arrow as-of kernel ≡ pd.merge_asof for arbitrary
    (key, time) layouts, both directions, with and without tolerance
    — broadcast variant (the dist twin's equality is covered by the
    DSL test)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from logray.ops.window import asof_join

    rng = np.random.default_rng(seed)
    left = pa.table({
        "key": pa.array(rng.integers(0, 5, n_left), pa.int64()),
        "t": pa.array(rng.integers(0, 100, n_left), pa.int64()),
        "lv": pa.array(np.arange(n_left, dtype=np.int64))})
    rdf = (pd.DataFrame({
        "key": rng.integers(0, 5, n_right).astype(np.int64),
        "t": rng.integers(0, 100, n_right).astype(np.int64),
        "val": np.arange(n_right, dtype=np.int64)})
        .drop_duplicates(["key", "t"]))
    got = asof_join(ray.data.from_arrow(left), rdf, by="key", on="t",
                    value_cols=["val"], direction=direction,
                    tolerance=tol).to_pandas()
    want = pd.merge_asof(
        left.to_pandas().sort_values("t", kind="mergesort"),
        rdf.sort_values("t", kind="mergesort"), on="t", by="key",
        direction=direction, tolerance=tol)
    key = ["key", "t", "lv"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)[got.columns]
    import pandas.testing as pt

    pt.assert_frame_equal(got, want, check_dtype=False)
