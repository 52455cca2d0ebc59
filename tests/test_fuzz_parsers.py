"""Property-based fuzzing for the from-scratch binary parsers.

Each parser claims two properties its unit tests sample but hypothesis can
search: (1) encode→decode roundtrips are EXACT for arbitrary well-formed
inputs, and (2) arbitrary garbage — including truncations and single-byte
corruptions of well-formed inputs — produces a typed, documented outcome
(empty prefix, PngError/PdfParseError) and NEVER an unexpected exception.
That second property is the 100 TB operational contract: one poisoned
record in a billion-row ingest must cost one row, not a stage."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from icrawler_spark.crawl.warc import build_warc_bytes, parse_warc_records
from icrawler_spark.multimodal.png import PngError, decode_png, encode_png
from icrawler_spark.textpipe.pdf import PdfParseError, extract_pdf_text

# keep examples cheap: this suite runs inside the 20-minute wall
_SETTINGS = settings(max_examples=60, deadline=None)


# --- WARC ---------------------------------------------------------------------

_url = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters="\\"),
    min_size=1,
    max_size=60,
).map(lambda p: f"https://fz.test/{p}")
_body = st.binary(min_size=0, max_size=300)


@_SETTINGS
@given(
    recs=st.lists(st.tuples(_url, st.just("2024-01-01T00:00:00Z"), _body), min_size=0, max_size=6),
    gz=st.booleans(),
)
def test_warc_roundtrip_exact(recs, gz):
    data = build_warc_bytes(recs, gzip_members=gz)
    got = list(parse_warc_records(data))
    assert len(got) == len(recs)
    for (url, _ts, body), (headers, block) in zip(recs, got):
        assert headers["warc-target-uri"] == url
        assert block.endswith(body)


@_SETTINGS
@given(junk=st.binary(min_size=0, max_size=400))
def test_warc_garbage_never_raises(junk):
    # arbitrary bytes: the well-formed-prefix contract means parse returns
    # whatever framed cleanly and stops — never throws
    list(parse_warc_records(junk))


@_SETTINGS
@given(
    recs=st.lists(st.tuples(_url, st.just("2024-01-01T00:00:00Z"), _body), min_size=1, max_size=3),
    cut=st.integers(min_value=0, max_value=10**6),
    flip=st.integers(min_value=0, max_value=10**6),
)
def test_warc_truncation_and_bitflip_keep_prefix(recs, cut, flip):
    whole = build_warc_bytes(recs)
    truncated = whole[: cut % (len(whole) + 1)]
    got = list(parse_warc_records(truncated))
    assert len(got) <= len(recs)
    mutated = bytearray(whole)
    mutated[flip % len(whole)] ^= 0xFF
    got2 = list(parse_warc_records(bytes(mutated)))  # must not raise
    assert len(got2) <= len(recs)


# --- PNG ----------------------------------------------------------------------


@_SETTINGS
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_exact(w, h, c, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


@_SETTINGS
@given(junk=st.binary(min_size=0, max_size=300))
def test_png_garbage_raises_typed(junk):
    if junk[:8] == b"\x89PNG\r\n\x1a\n" and len(junk) > 8:
        # even magic-prefixed garbage must fail TYPED
        with pytest.raises(PngError):
            decode_png(junk)
    else:
        with pytest.raises(PngError):
            decode_png(junk)


@_SETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    flip=st.integers(min_value=8, max_value=10**6),
)
def test_png_bitflip_typed_or_detected(seed, flip):
    """A corrupted well-formed PNG either raises PngError (CRC/structure) or
    — only if the flip landed in a spot the format does not checksum (it
    checksums everything after the signature, so any in-chunk flip is
    caught) — still decodes to the right shape. Never an untyped crash."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    good = bytearray(encode_png(img))
    good[flip % (len(good) - 8) + 8] ^= 0xFF
    try:
        out = decode_png(bytes(good))
        assert out.shape == (5, 7, 3)
    except PngError:
        pass


# --- PDF ----------------------------------------------------------------------


@_SETTINGS
@given(junk=st.binary(min_size=0, max_size=400))
def test_pdf_garbage_raises_typed(junk):
    with pytest.raises(PdfParseError):
        extract_pdf_text(junk)


@_SETTINGS
@given(
    tail=st.binary(min_size=0, max_size=200),
    flip=st.integers(min_value=0, max_value=10**6),
)
def test_pdf_mutations_typed_or_text(tail, flip):
    """Mutations of a well-formed PDF (appended garbage, single-byte flips)
    must yield either extracted text (str) or PdfParseError — the two
    outcomes attempt_extract maps; anything else would kill an extract
    stage instead of one row."""
    from tests.test_pdf import build_layout_pdf

    base = build_layout_pdf()
    try:
        assert isinstance(extract_pdf_text(base + b"%" + tail), str)
    except PdfParseError:
        pass
    mutated = bytearray(base)
    mutated[flip % len(base)] ^= 0xFF
    try:
        assert isinstance(extract_pdf_text(bytes(mutated)), str)
    except PdfParseError:
        pass
