"""Property-based tests (SURVEY §5.2 item 4): semantics that must hold
for ALL inputs, not just fixtures — tie-break determinism under row
shuffling, tagger equivalence, keep-first stability, RFC-822 round-trip.

hypothesis settings: derandomized (stable CI), few examples (each example
runs a real Spark job on a VALUES relation — small but not free).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from newsmaper_etl_spark.fixtures import values_df
from newsmaper_etl_spark.operators.dedup import (
    incremental_remove_duplicate_spans,
    remove_duplicate_spans,
)
from newsmaper_etl_spark.operators.newsmaper import (
    dedup_keep_first,
    parse_pubdate,
    tag_country,
    tag_country_expr,
    tokenize_text,
)

_SETTINGS = dict(max_examples=8, deadline=None, derandomize=True)

_VOCAB = ["paris", "madrid", "berlin", "roma", "tokyo", "lyon", "kyoto", "x", "y"]
_KW_TO_ID = {"paris": 1, "madrid": 7, "berlin": 3, "roma": 2, "tokyo": 9}
_REFS = [
    (1, "fr", ["paris"]),
    (7, "es", ["madrid"]),
    (3, "de", ["berlin"]),
    (2, "it", ["roma"]),
    (9, "jp", ["tokyo"]),
]

_texts = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(**_SETTINGS)
@given(texts=_texts, seed=st.integers(0, 2**16))
def test_tagger_order_invariant_and_equivalent(spark, texts, seed):
    """Both taggers agree with each other AND are invariant under input
    row permutation (L3's pinned tie-break makes the vote a pure function
    of the multiset of tokens)."""
    import random

    rows = [(i, t, "", "") for i, t in enumerate(texts)]
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)

    def tag(rs, mode):
        df = tokenize_text(
            values_df(spark, rs, ["article_id", "title", "description", "x"]),
            cols=("title", "description"),
        )
        if mode == "expr":
            out = tag_country_expr(df, _KW_TO_ID)
        else:
            out = tag_country(df, values_df(spark, _REFS, ["id", "name", "words"]))
        return sorted((r["article_id"], r["id_country"]) for r in out.collect())

    base = tag(rows, "expr")
    assert tag(shuffled, "expr") == base
    assert tag(shuffled, "join") == base


@settings(**_SETTINGS)
@given(
    keys=st.lists(st.integers(0, 3), min_size=1, max_size=12),
    seed=st.integers(0, 2**16),
)
def test_dedup_keep_first_order_invariant(spark, keys, seed):
    """Survivors depend only on (key, id) content — never on row order or
    partitioning (L7: lowest id per key)."""
    import random

    rows = [(i, k) for i, k in enumerate(keys)]
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    expected = sorted(
        min((i for i, k in rows if k == key)) for key in set(keys)
    )
    for rs in (rows, shuffled):
        df = values_df(spark, rs, ["id", "k"])
        got = sorted(r["id"] for r in dedup_keep_first(df, ("k",), "id").collect())
        assert got == expected


@settings(**_SETTINGS)
@given(
    ts=st.datetimes(
        min_value=datetime(1990, 1, 1), max_value=datetime(2035, 12, 28)
    ).map(lambda d: d.replace(microsecond=0)),  # RFC-822 has second grain
    offset_minutes=st.sampled_from([-600, -60, 0, 60, 330, 600]),
)
def test_pubdate_roundtrip_all_variants(spark, ts, offset_minutes):
    """All three RFC-822 shapes (4-digit +0000, named zone, 2-digit year)
    parse back to the printed wall clock in oracle mode; strict mode
    applies the numeric offset (L9)."""
    tz = timezone(timedelta(minutes=offset_minutes))
    aware = ts.replace(tzinfo=tz)
    variants = [
        aware.strftime("%a, %d %b %Y %H:%M:%S %z"),
        ts.strftime("%a, %d %b %Y %H:%M:%S GMT"),
        aware.strftime("%a, %d %b %y %H:%M:%S %z"),
    ]
    df = values_df(spark, [(i, v) for i, v in enumerate(variants)], ["i", "date"])
    oracle = {r["i"]: r["pub_ts"] for r in parse_pubdate(df).collect()}
    # oracle mode: printed wall clock, tz token ignored (L9)
    for i in range(3):
        got = oracle[i]
        assert (got.year % 100, got.month, got.day, got.hour, got.minute) == (
            ts.year % 100, ts.month, ts.day, ts.hour, ts.minute,
        ), variants[i]
    # 2-digit year: Spark's 'yy' pivots into 2000-2099
    assert oracle[2].year == 2000 + ts.year % 100
    # strict mode normalizes variant 0 to UTC
    strict = {r["i"]: r["pub_ts"] for r in parse_pubdate(df, strict=True).collect()}
    expect_utc = aware.astimezone(timezone.utc).replace(tzinfo=None)
    assert strict[0] == expect_utc


@given(
    vectors=st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=7, max_size=7,
        ),
        min_size=2, max_size=6,
    )
)
@settings(**_SETTINGS)
def test_tree_dot_matches_hof_dot_after_rounding(spark, vectors):
    """The balanced-tree unrolled dot (codegen SQL path) must agree with
    the sequential HOF dot after the round-before-compare convention —
    the property that licenses the re-association in
    operators/similarity._tree (module invariant 3)."""
    from newsmaper_etl_spark.operators import similarity as S
    rows = [(i, vectors[i], vectors[(i + 1) % len(vectors)]) for i in range(len(vectors))]
    df = spark.createDataFrame(rows, "i INT, a ARRAY<FLOAT>, b ARRAY<FLOAT>")
    out = df.select(
        F.round(F.expr(S._dot_sql("a", "b", 7)), 4).alias("tree"),
        F.round(S._dot(F.col("a"), F.col("b")), 4).alias("hof"),
    ).collect()
    for r in out:
        assert r["tree"] == r["hof"], (r["tree"], r["hof"])


# --------------------------------------------------------------------------
# Media header parsers: round-trip + totality (pure Python — no Spark, so
# these afford real example counts)
# --------------------------------------------------------------------------

from newsmaper_etl_spark.operators import multimodal as _MM  # noqa: E402

_PURE = dict(max_examples=60, deadline=None, derandomize=True)


@settings(**_PURE)
@given(
    ch=st.integers(1, 8),
    sr=st.integers(1, 192_000),
    bits=st.sampled_from([8, 16, 24, 32]),
    n=st.integers(0, 400),
    pre_len=st.integers(0, 9),
)
def test_wav_header_roundtrip(ch, sr, bits, n, pre_len):
    """A WAV assembled from arbitrary valid field values — including an
    arbitrary (possibly odd-length, hence padded) LIST chunk BEFORE
    'fmt ' — parses back to exactly the planted fields."""
    import struct

    byte_rate = sr * ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sr, byte_rate, ch * bits // 8, bits)
    parts = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", pre_len) + b"\x4c" * pre_len
        + (b"\x00" if pre_len % 2 else b"")
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", n) + b"\x41" * n
    )
    blob = b"RIFF" + struct.pack("<I", len(parts)) + parts
    assert _MM.parse_audio_header(blob) == ("wav", sr, ch, bits, n * 1000 // byte_rate)


@settings(**_PURE)
@given(
    sr=st.integers(1, 2**20 - 1),
    ch=st.integers(1, 8),
    bits=st.integers(4, 32),
    total=st.integers(0, 2**36 - 1),
)
def test_flac_header_roundtrip(sr, ch, bits, total):
    """STREAMINFO bit-packing round-trips for the full field ranges the
    20/3/5/36-bit layout admits."""
    packed = (sr << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total
    info = b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
    blob = b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info
    assert _MM.parse_audio_header(blob) == ("flac", sr, ch, bits, total * 1000 // sr)


def _mp4_bytes(ts: int, dur: int, w: int, h: int, version: int) -> bytes:
    import struct

    u32 = lambda x: struct.pack(">I", x)  # noqa: E731
    u64 = lambda x: struct.pack(">Q", x)  # noqa: E731
    matrix = u32(0x10000) + u32(0) * 3 + u32(0x10000) + u32(0) * 3 + u32(0x40000000)
    if version == 0:
        times, tk_times = u32(0) * 2 + u32(ts) + u32(dur), u32(0) * 2 + u32(1) + u32(0) + u32(dur)
    else:
        times, tk_times = u64(0) * 2 + u32(ts) + u64(dur), u64(0) * 2 + u32(1) + u32(0) + u64(dur)
    vf = bytes([version, 0, 0, 0])
    mvhd = (
        vf[:1] + b"\x00\x00\x00" + times + u32(0x10000)
        + struct.pack(">H", 0x100) + b"\x00" * 10 + matrix + b"\x00" * 24 + u32(2)
    )
    mvhd = u32(8 + len(mvhd)) + b"mvhd" + mvhd
    tkhd = vf[:1] + b"\x00\x00\x07" + tk_times + b"\x00" * 16 + matrix + u32(w << 16) + u32(h << 16)
    tkhd = u32(8 + len(tkhd)) + b"tkhd" + tkhd
    trak = u32(8 + len(tkhd)) + b"trak" + tkhd
    moov = u32(8 + len(mvhd) + len(trak)) + b"moov" + mvhd + trak
    return u32(16) + b"ftyp" + b"isom" + u32(0x200) + moov


@settings(**_PURE)
@given(
    ts=st.integers(1, 2**32 - 1),
    dur=st.integers(0, 2**32 - 1),
    w=st.integers(1, 32767),
    h=st.integers(1, 32767),
    version=st.sampled_from([0, 1]),
    free_len=st.integers(0, 16),
)
def test_mp4_header_roundtrip(ts, dur, w, h, version, free_len):
    """An ISO-BMFF file with arbitrary valid mvhd/tkhd field values —
    and an arbitrary 'free' box between ftyp and moov, which the box
    walk must skip — parses back to the planted fields (duration
    truncated to the movie timescale)."""
    import struct

    blob = _mp4_bytes(ts, dur, w, h, version)
    free = struct.pack(">I", 8 + free_len) + b"free" + b"\x00" * free_len
    blob = blob[:16] + free + blob[16:]
    assert _MM.parse_video_header(blob) == ("mp4", w, h, dur * 1000 // ts)


@settings(**_PURE)
@given(
    uspf=st.integers(1, 1_000_000),
    frames=st.integers(0, 1_000_000),
    w=st.integers(0, 2**16),
    h=st.integers(0, 2**16),
)
def test_avi_header_roundtrip(uspf, frames, w, h):
    import struct

    u = lambda x: struct.pack("<I", x)  # noqa: E731
    avih = u(uspf) + u(0) * 3 + u(frames) + u(0) + u(1) + u(0) + u(w) + u(h) + b"\x00" * 16
    hdrl = b"LIST" + u(4 + 8 + len(avih)) + b"hdrl" + b"avih" + u(len(avih)) + avih
    body = b"AVI " + hdrl + b"LIST" + u(4) + b"movi"
    blob = b"RIFF" + u(len(body)) + body
    assert _MM.parse_video_header(blob) == ("avi", w, h, frames * uspf // 1000)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(data=st.binary(min_size=0, max_size=300))
def test_header_parsers_total_on_garbage(data):
    """Totality fuzz: arbitrary bytes must never raise from any header
    parser — at corpus scale a corrupt blob is routine input, and the
    kernels' null-out-don't-fail posture depends on parser totality.
    Magic-byte prefixes steer the fuzz into the deep branches."""
    for prefix in (
        b"", b"RIFF", b"RIFF\x10\x00\x00\x00WAVE", b"fLaC",
        b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"\xff\xd8",
        b"\x00\x00\x00\x10ftyp", b"RIFF\x10\x00\x00\x00AVI ",
        b"RIFF\x10\x00\x00\x00WEBPVP8X", b"RIFF\x10\x00\x00\x00WEBPVP8L",
        b"RIFF\x10\x00\x00\x00WEBPVP8 ", b"\xff\xfb", b"\xff\xf3",
        b"ID3\x04\x00\x00\x00\x00\x00\x04", b"II*\x00", b"MM\x00*",
    ):
        blob = prefix + data
        for parser in (
            _MM.parse_image_header, _MM.parse_audio_header, _MM.parse_video_header
        ):
            out = parser(blob)
            assert out is None or isinstance(out, tuple)


@settings(**_PURE)
@given(
    a=st.integers(1, 32767),
    b_=st.integers(1, 32767),
    c=st.integers(1, 190_000),
    pick=st.integers(0, 6),
)
def test_media_families_are_mutually_exclusive(a, b_, c, pick):
    """Dispatch invariant behind media_metadata: a valid blob of one
    container family must be None under the other families' parsers —
    for arbitrary planted field values, not just fixtures (magic-byte
    collisions would silently misclassify a corpus)."""
    import struct

    u32 = lambda x: struct.pack(">I", x)  # noqa: E731
    ule = lambda x: struct.pack("<I", x)  # noqa: E731
    if pick == 0:  # PNG
        blob = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
                + struct.pack(">II", a, b_) + b"\x00" * 9)
        kind = "image"
    elif pick == 1:  # GIF
        blob = b"GIF89a" + struct.pack("<HH", a, b_)
        kind = "image"
    elif pick == 2:  # WebP VP8X
        payload = b"\x00" * 4 + (a - 1).to_bytes(3, "little") + (b_ - 1).to_bytes(3, "little")
        chunk = b"VP8X" + ule(len(payload)) + payload
        blob = b"RIFF" + ule(4 + len(chunk)) + b"WEBP" + chunk
        kind = "image"
    elif pick == 3:  # WAV
        rate = max(c, 8)
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
        body = (b"WAVE" + b"fmt " + ule(16) + fmt + b"data" + ule(a) + b"\x00" * min(a, 64))
        blob = b"RIFF" + ule(len(body)) + body
        kind = "audio"
    elif pick == 4:  # FLAC
        packed = (max(c, 1) << 44) | (0 << 41) | (15 << 36) | a
        info = b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
        blob = b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info
        kind = "audio"
    elif pick == 5:  # MP4
        blob = _mp4_bytes(max(c, 1), a, a, b_, version=0)
        kind = "video"
    else:  # AVI
        avih = (ule(max(c, 1)) + ule(0) * 3 + ule(a) + ule(0) + ule(1) + ule(0)
                + ule(a) + ule(b_) + b"\x00" * 16)
        hdrl = b"LIST" + ule(4 + 8 + len(avih)) + b"hdrl" + b"avih" + ule(len(avih)) + avih
        body = b"AVI " + hdrl
        blob = b"RIFF" + ule(len(body)) + body
        kind = "video"
    parsers = {
        "image": _MM.parse_image_header,
        "audio": _MM.parse_audio_header,
        "video": _MM.parse_video_header,
    }
    assert parsers[kind](blob) is not None
    for other, parse in parsers.items():
        if other != kind:
            assert parse(blob) is None, (pick, other)


def _span_dedup_reference(docs: list[tuple[int, str]], k: int):
    """Pure-Python reference for remove_duplicate_spans: k-gram first
    occurrence in (doc_id, pos) order kept, every other occurrence's k
    covered positions cut, tokens rejoined in order."""
    toks = {d: t.split(" ") for d, t in docs}
    first: dict[tuple, tuple] = {}
    for d, t in sorted(docs):
        ts = toks[d]
        for i in range(len(ts) - k + 1):
            g = tuple(ts[i : i + k])
            first.setdefault(g, (d, i))
    out = {}
    for d, t in docs:
        ts = toks[d]
        cut = set()
        for i in range(len(ts) - k + 1):
            g = tuple(ts[i : i + k])
            if first[g] != (d, i):
                cut.update(range(i, i + k))
        kept = [tok for j, tok in enumerate(ts) if j not in cut]
        out[d] = (" ".join(kept), len(ts) - len(kept))
    return out


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(
            # tiny alphabet + short docs force frequent k-gram repeats,
            # overlaps, and boundary seams — the hard cases
            st.sampled_from(["a", "b", "c"]),
            min_size=1,
            max_size=10,
        ),
        min_size=1,
        max_size=6,
    ),
    k=st.sampled_from([2, 3, 4]),
)
def test_substring_dedup_matches_reference(spark, docs, k):
    """remove_duplicate_spans agrees with a pure-Python reference on
    adversarial corpora (tiny alphabet → dense repeats, within-doc
    overlaps, cross-doc seams, sub-k docs) for k = 2..4 — including the
    non-pow2 k=3 gram basis."""
    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    expect = _span_dedup_reference(rows, k)
    df = values_df(spark, rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_removed"])
        for r in remove_duplicate_spans(df, k=k).collect()
    }
    assert got == expect


@settings(**_SETTINGS)
@given(
    seen=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=8),
        min_size=1,
        max_size=4,
    ),
    batch=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=8),
        min_size=1,
        max_size=4,
    ),
    k=st.sampled_from([2, 3]),
)
def test_substring_incremental_reference_parity(spark, seen, batch, k):
    """The incremental form against its own reference on adversarial
    corpora: batch positions covered by any corpus gram, or by a
    non-first within-batch occurrence — regardless of whether the seen
    corpus is internally deduped (the operator's own promise, stronger
    than the full-run-equivalence induction)."""
    seen_rows = [(i, " ".join(t)) for i, t in enumerate(seen)]
    batch_rows = [(100 + i, " ".join(t)) for i, t in enumerate(batch)]
    seen_grams = set()
    for _, t in seen_rows:
        ts = t.split(" ")
        for i in range(len(ts) - k + 1):
            seen_grams.add(tuple(ts[i : i + k]))
    first: dict[tuple, tuple] = {}
    for d, t in sorted(batch_rows):
        ts = t.split(" ")
        for i in range(len(ts) - k + 1):
            first.setdefault(tuple(ts[i : i + k]), (d, i))
    expect = {}
    for d, t in batch_rows:
        ts = t.split(" ")
        cut = set()
        for i in range(len(ts) - k + 1):
            g = tuple(ts[i : i + k])
            if g in seen_grams or first[g] != (d, i):
                cut.update(range(i, i + k))
        kept = [tok for j, tok in enumerate(ts) if j not in cut]
        expect[d] = (" ".join(kept), len(ts) - len(kept))
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_removed"])
        for r in incremental_remove_duplicate_spans(
            values_df(spark, batch_rows, ["doc_id", "text"]),
            values_df(spark, seen_rows, ["doc_id", "text"]),
            k=k,
        ).collect()
    }
    assert got == expect


#: paragraphs of 0-4 vocab words — min_size=0 plants EMPTY paragraphs
#: (consecutive/trailing separators), the advisor-r12 corner where the
#: pre-r13 operator broke idempotence (a fully-cut doc's '' re-split
#: and duplicated another's)
_para_texts = st.lists(
    st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=4).map(
            " ".join
        ),
        min_size=1,
        max_size=4,
    ).map("\n\n".join),
    min_size=1,
    max_size=6,
)


@settings(**_SETTINGS)
@given(texts=_para_texts)
def test_paragraph_dedup_invariants_and_idempotence(spark, texts):
    """Four paragraph-dedup invariants over random paragraph corpora
    (including planted empty paragraphs): (a) the kept paragraph
    MULTISET per doc is a subsequence of the original with exactly
    n_removed cut; (b) the surviving corpus has no duplicate NON-EMPTY
    paragraph anywhere (the operator's postcondition; empty paragraphs
    are inert separator artifacts and may repeat); (c) empty
    paragraphs are never excised; (d) idempotence — a second pass
    removes nothing, INCLUDING over fully-cut docs whose text became
    '' (the advisor-r12 corner: '' re-splits to one empty paragraph,
    which inertness keeps out of the dedup group)."""
    from newsmaper_etl_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = paragraph_dedup(df).collect()
    orig = {i: t for i, t in enumerate(texts)}
    seen: list[str] = []
    for r in sorted(out, key=lambda r: r["doc_id"]):
        before = orig[r["doc_id"]].split("\n\n")
        # '' is ambiguous between zero kept paragraphs and ONE kept
        # empty paragraph; n_removed==len(before) disambiguates (a doc
        # holding any empty paragraph can never be fully cut — empties
        # are unremovable)
        if r["text_dedup"] == "" and r["n_removed"] == len(before):
            after: list[str] = []
        else:
            after = r["text_dedup"].split("\n\n")
        assert len(before) - len(after) == r["n_removed"]
        # (a) kept is a subsequence of the original paragraph list
        it = iter(before)
        assert all(p in it for p in after)
        # (c) every empty paragraph survives
        assert sum(1 for p in after if p == "") == sum(
            1 for p in before if p == ""
        )
        seen.extend(p for p in after if p != "")
    # (b) corpus-wide uniqueness of non-empty survivors
    assert len(set(seen)) == len(seen)
    # (d) idempotence — unconditional, fully-cut docs included
    again = spark.createDataFrame(
        [(r["doc_id"], r["text_dedup"]) for r in out],
        "doc_id long, text string",
    )
    out2 = {r["doc_id"]: (r["text_dedup"], r["n_removed"])
            for r in paragraph_dedup(again).collect()}
    for r in out:
        assert out2[r["doc_id"]] == (r["text_dedup"], 0)
