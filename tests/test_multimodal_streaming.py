"""Multimodal plumbing + Structured Streaming jobs."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from icrawler_spark.multimodal import (
    decode_image_features,
    frame_sample_plan,
    media_metadata,
)
from icrawler_spark.multimodal.ops import deterministic_fake_decoder, sniff_mime
from icrawler_spark.streaming import (
    run_available_now,
    streaming_dedup,
    streaming_hourly_rollup,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", "image/jpeg", b"\xff\xd8\xff\xe0" + b"j" * 100),
        (2, "image", "image/png", b"\x89PNG\r\n\x1a\n" + b"p" * 50),
        (3, "audio", "audio/wav", b"RIFF" + b"w" * 20),
        (4, "image", None, None),
    ]
    return spark.createDataFrame(
        rows, "media_id long, media_type string, mime string, content binary"
    )


def test_media_metadata(spark, media):
    out = {r.media_id: r for r in media_metadata(media).collect()}
    assert out[1].sniffed_mime == "image/jpeg"
    assert out[2].sniffed_mime == "image/png"
    assert out[3].sniffed_mime == "audio/wav"
    assert out[4].sniffed_mime is None
    assert out[1].n_bytes == 104


def test_sniff_mime_unit():
    assert sniff_mime(b"\xff\xd8\xff\xdb") == "image/jpeg"
    assert sniff_mime(b"zz") == "application/octet-stream"
    assert sniff_mime(None) is None


def test_decode_image_features_fake(spark, media):
    out = {
        r.media_id: r
        for r in decode_image_features(media, decoder=deterministic_fake_decoder).collect()
    }
    assert out[1].decode_error is None
    assert 64 <= out[1].width < 256 and len(out[1].features) == 8
    # deterministic: same payload → same features
    again = {
        r.media_id: r
        for r in decode_image_features(media, decoder=deterministic_fake_decoder).collect()
    }
    assert out[1].features == again[1].features


def test_decode_image_features_stub_errors_captured(spark, media):
    # default decoder: PNG routes to the real from-scratch codec (this
    # payload is PNG-magic + garbage → PngError); everything else raises
    # NotImplementedError — all captured as data, never raised
    out = {r.media_id: r for r in decode_image_features(media).collect()}
    assert out[2].decode_error == "PngError"
    for mid in (1, 3, 4):
        assert out[mid].decode_error == "NotImplementedError"


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame(
        [(1, 3.5), (2, 0.2)], "media_id long, duration_s double"
    )
    plan = frame_sample_plan(vids, fps=2.0).collect()
    per = {}
    for r in plan:
        per.setdefault(r.media_id, []).append((r.frame_idx, r.ts_s))
    assert len(per[1]) == 7       # floor(3.5*2)=7 frames
    assert len(per[2]) == 1       # min 1 frame
    assert per[1][0] == (0, 0.0) and per[1][2][1] == 1.0


def _stage_events_dir(tmp_path) -> str:
    # the streaming file source requires a directory, testdata is one file
    d = tmp_path / "events_src"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_streaming_hourly_rollup(spark, tmp_path):
    src = _stage_events_dir(tmp_path)
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    ckpt = str(tmp_path / "ckpt")
    run_available_now(
        spark, src, schema, streaming_hourly_rollup, ckpt, "hourly_stream",
        output_mode="append",
    )
    got = spark.sql("select sum(n) as total from hourly_stream").collect()[0].total
    # append mode emits only watermark-closed windows; the final (open)
    # windows are withheld — so the streamed total is a large subset
    batch_total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert got is not None and 0 < got <= batch_total
    shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_dedup(spark, tmp_path):
    src = _stage_events_dir(tmp_path)
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    ckpt = str(tmp_path / "ckpt2")
    run_available_now(
        spark, src, schema,
        lambda s: streaming_dedup(s).groupBy().count(),
        ckpt, "dedup_stream", output_mode="complete",
    )
    got = spark.sql("select max(count) c from dedup_stream").collect()[0].c
    want = (
        spark.read.parquet(f"{SF_DIR}/events.parquet").select("event_id").distinct().count()
    )
    assert got == want
    shutil.rmtree(ckpt, ignore_errors=True)


def test_stateful_user_activity_tracker(spark, tmp_path):
    from icrawler_spark.streaming.stateful import user_activity_tracker

    src = _stage_events_dir(tmp_path)
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    ckpt = str(tmp_path / "ckpt_state")
    run_available_now(
        spark, src, schema, user_activity_tracker, ckpt, "user_state",
        output_mode="update",
    )
    # last emitted row per user == exact batch aggregate (cents are exact)
    got = {
        r.user_id: r
        for r in spark.sql(
            "select * from (select *, row_number() over (partition by user_id order by n_events desc) rn from user_state) where rn=1"
        ).collect()
    }
    batch = {
        r.user_id: r
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert set(got) == set(batch)
    for uid, b in batch.items():
        assert got[uid].n_events == b.n
        assert got[uid].total_cents == b.cents
    shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_page_ingest_dedup_and_simhash_parity(spark, tmp_path):
    """Pages stream through ingest: exact dups dropped first-wins across file
    drops; the in-stream simhash equals the batch simhash_expr bit-for-bit."""
    import datetime as dt

    from pyspark.sql import functions as F

    from icrawler_spark.queries.textops import simhash_expr
    from icrawler_spark.streaming.jobs import run_available_now, streaming_page_ingest

    src = str(tmp_path / "pages_src")
    ckpt = str(tmp_path / "pages_ckpt")
    schema = "url string, warc_ts timestamp_ntz, html binary, text string, lang string"

    def row(u, sec, body):
        return (u, dt.datetime(2024, 3, 1, 0, 0, sec), body.encode(), None, None)

    drop1 = spark.createDataFrame(
        [row("https://s.test/a", 0, "<html>alpha beta gamma</html>"),
         row("https://s.test/b", 1, "<html>delta epsilon zeta</html>")], schema)
    drop2 = spark.createDataFrame(
        [row("https://s.test/a2", 2, "<html>alpha beta gamma</html>"),  # exact dup of a
         row("https://s.test/c", 3, "<html>eta theta iota</html>")], schema)
    drop1.write.mode("append").parquet(src)
    drop2.write.mode("append").parquet(src)

    run_available_now(spark, src, schema, streaming_page_ingest, ckpt, "ingest_out")
    out = spark.sql("SELECT * FROM ingest_out").collect()
    urls = {r.url for r in out}
    # exactly one representative of the duplicated content survives
    assert len(out) == 3
    assert len(urls & {"https://s.test/a", "https://s.test/a2"}) == 1
    assert {"https://s.test/b", "https://s.test/c"} <= urls

    batch = (
        drop1.unionByName(drop2)
        .select("url", simhash_expr(F.col("html").cast("string")).alias("sh"))
        .collect()
    )
    want = {r.url: r.sh for r in batch}
    for r in out:
        assert r.simhash == want[r.url]  # stream == batch, bit-for-bit


def test_streaming_page_ingest_hashes_raw_bytes(spark, tmp_path):
    """Two payloads that differ ONLY in invalid-UTF-8 bytes must BOTH survive
    exact dedup: the content hash is md5 over raw bytes, not over a lossy
    binary→string cast (which replaces every invalid sequence with U+FFFD and
    would collide the two)."""
    import datetime as dt

    from icrawler_spark.streaming.jobs import run_available_now, streaming_page_ingest

    src = str(tmp_path / "raw_src")
    ckpt = str(tmp_path / "raw_ckpt")
    schema = "url string, warc_ts timestamp_ntz, html binary, text string, lang string"

    # identical printable prefix; the tails are DIFFERENT invalid-UTF-8 bytes,
    # both of which decode (lossily) to the same U+FFFD replacement
    p1 = b"<html>same prefix</html>\xff\xfe"
    p2 = b"<html>same prefix</html>\xc0\xaf"
    assert p1.decode("utf-8", errors="replace") == p2.decode("utf-8", errors="replace")

    spark.createDataFrame(
        [("https://raw.test/1", dt.datetime(2024, 5, 1, 0, 0, 0), p1, None, None),
         ("https://raw.test/2", dt.datetime(2024, 5, 1, 0, 0, 1), p2, None, None)],
        schema,
    ).write.mode("append").parquet(src)

    run_available_now(spark, src, schema, streaming_page_ingest, ckpt, "raw_ingest_out")
    out = spark.sql("SELECT url, content_hash FROM raw_ingest_out").collect()
    assert {r.url for r in out} == {"https://raw.test/1", "https://raw.test/2"}
    assert len({r.content_hash for r in out}) == 2


def test_streaming_page_ingest_resumes_dedup_state(spark, tmp_path):
    """Kill-and-resume: after draining drop 1 with a file sink + checkpoint,
    a fresh availableNow run over drop 2 suppresses content already seen in
    drop 1 — the dedup state survives the restart (the streaming twin of the
    engine's snapshot resume)."""
    import datetime as dt
    import shutil

    from icrawler_spark.streaming.jobs import streaming_page_ingest

    schema = "url string, warc_ts timestamp_ntz, html binary, text string, lang string"
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_page_ingest(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def row(u, sec, body):
        return (u, dt.datetime(2024, 4, 1, 0, 0, sec), body.encode(), None, None)

    spark.createDataFrame(
        [row("https://r.test/a", 0, "<html>one</html>"),
         row("https://r.test/b", 1, "<html>two</html>")], schema
    ).write.mode("append").parquet(src)
    drain()
    assert spark.read.parquet(out).count() == 2

    spark.createDataFrame(
        [row("https://r.test/dup", 30, "<html>one</html>"),
         row("https://r.test/new", 31, "<html>three</html>")], schema
    ).write.mode("append").parquet(src)
    drain()
    final = {r.url for r in spark.read.parquet(out).collect()}
    assert len(final) == 3 and "https://r.test/dup" not in final and "https://r.test/new" in final
    shutil.rmtree(src, ignore_errors=True)


def test_png_roundtrip_all_color_types():
    """encode → decode is exact for gray / gray+alpha / RGB / RGBA."""
    import numpy as np

    from icrawler_spark.multimodal.png import decode_png, encode_png

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 17, c), dtype=np.uint8)
        back = decode_png(encode_png(img))
        assert back.shape == (13, 17, c)
        assert (back == img).all(), f"channels={c}"


def test_png_decoder_filters_and_palette():
    """Decode a PNG using every filter type (1-4) and a palette image —
    hand-built chunk streams, verified against the spec's filter math."""
    import struct
    import zlib

    import numpy as np

    from icrawler_spark.multimodal.png import decode_png

    def chunk(ctype, body):
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(
            ">I", zlib.crc32(ctype + body)
        )

    sig = b"\x89PNG\r\n\x1a\n"

    # 3x4 grayscale, one row per filter type: Sub, Up, Average, Paeth
    w, h = 4, 4
    rows = [
        bytes([1, 10, 5, 5, 5]),        # Sub: 10,15,20,25
        bytes([2, 1, 1, 1, 1]),         # Up:  11,16,21,26
        bytes([3, 10, 10, 10, 10]),     # Avg: a=(0/…) prev row known
        bytes([4, 1, 2, 3, 4]),         # Paeth
    ]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = sig + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"".join(rows))
    ) + chunk(b"IEND", b"")
    img = decode_png(data)[:, :, 0].astype(int)
    assert img[0].tolist() == [10, 15, 20, 25]
    assert img[1].tolist() == [11, 16, 21, 26]
    # Avg row: x[i] = raw + (left + up)//2
    r2 = []
    for i in range(4):
        left = r2[i - 1] if i else 0
        r2.append((10 + (left + img[1][i]) // 2) % 256)
    assert img[2].tolist() == r2
    # Paeth row: standard predictor
    r3 = []
    for i in range(4):
        a = r3[i - 1] if i else 0
        b = img[2][i]
        c = img[2][i - 1] if i else 0
        pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        r3.append(([1, 2, 3, 4][i] + pred) % 256)
    assert img[3].tolist() == r3

    # palette image: 2x1, indices 0,1 → red, blue
    ihdr_p = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 0, 255])
    idat_p = zlib.compress(b"\x00\x00\x01")
    pdata = sig + chunk(b"IHDR", ihdr_p) + chunk(b"PLTE", plte) + chunk(
        b"IDAT", idat_p
    ) + chunk(b"IEND", b"")
    pimg = decode_png(pdata)
    assert pimg.shape == (1, 2, 3)
    assert pimg[0, 0].tolist() == [255, 0, 0] and pimg[0, 1].tolist() == [0, 0, 255]


def test_png_garbage_and_out_of_scope_raise():
    import struct
    import zlib

    import numpy as np
    import pytest

    from icrawler_spark.multimodal.png import PngError, decode_png, encode_png

    for bad in (b"", b"not a png", b"\x89PNG\r\n\x1a\x00rest"):
        with pytest.raises(PngError):
            decode_png(bad)
    # corrupt CRC
    good = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8)))
    good[20] ^= 0xFF
    with pytest.raises(PngError):
        decode_png(bytes(good))
    # interlaced → honestly unsupported
    def chunk(ctype, body):
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(
            ">I", zlib.crc32(ctype + body)
        )
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    inter = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00\x00")
    ) + chunk(b"IEND", b"")
    with pytest.raises(PngError):
        decode_png(inter)


def test_decode_image_features_real_png_default_decoder(spark):
    """The multimodal decode stage runs REAL PNG decoding with NO injected
    decoder; non-PNG payloads degrade to decode_error rows, never kill the
    stage."""
    import numpy as np

    from icrawler_spark.multimodal.ops import decode_image_features
    from icrawler_spark.multimodal.png import encode_png

    solid = np.full((8, 8, 3), 255, dtype=np.uint8)          # all-white RGB
    grad = np.tile(np.arange(0, 160, 10, dtype=np.uint8), (4, 1))  # gray ramp
    rows = [
        (1, bytearray(encode_png(solid))),
        (2, bytearray(encode_png(grad))),
        (3, bytearray(b"\xff\xd8\xffJPEG-ish")),   # jpeg: no codec → error
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in decode_image_features(df).collect()}

    assert out[1].width == 8 and out[1].height == 8 and out[1].decode_error is None
    feats1 = out[1].features
    assert abs(feats1[0] - 1.0) < 1e-5 and abs(feats1[1] - 1.0) < 1e-5  # white means
    assert feats1[4] < 1e-6                                            # zero std
    assert out[2].width == 16 and out[2].height == 4
    assert out[2].features[4] > 0.1                                    # ramp has contrast
    assert out[3].decode_error == "NotImplementedError"
    assert out[4].decode_error == "NotImplementedError"  # NULL → b"" → unknown format
