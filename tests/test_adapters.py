"""Edge adapters (SURVEY §2 stage 8): Firestore/Sheets/email/XCom shapes
with injected service callables — full path, no network."""

from __future__ import annotations

import pytest

from neulix_datahub_spark.operators.multimodal import (
    extract_image_features,
    read_binary_assets,
    sample_video_frames,
)
from neulix_datahub_spark.sources.adapters import (
    alert_attachment,
    check_allowed_values,
    dedupe_append_to_grid,
    document_query,
    flag_columns,
    grid_to_dataframe,
    task_input,
    task_output,
    upsert_to_document_store,
)
from tests.conftest import SF_DIR


def test_document_query_composition(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = document_query(
        ev, filters={"event_type": "purchase", "user_id": 12}, order_by="value",
        descending=True, limit=5,
    )
    rows = out.collect()
    assert len(rows) <= 5
    assert all(r.event_type == "purchase" and r.user_id == 12 for r in rows)
    vals = [r.value for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_document_store_upsert_batching(spark):
    df = spark.range(0, 1234).withColumnRenamed("id", "doc_id")
    batches: list[int] = []
    # executor-side callable must be picklable & stateless; collect sizes via
    # an accumulator-style driver check is not possible here, so use a tiny
    # local-mode trick: write to a temp file is overkill — assert via count.
    seen = spark.sparkContext.accumulator(0)

    def write_batch(batch):
        assert len(batch) <= 500  # db_core.py:321-326 batch cap
        assert all("__doc_id" in d and isinstance(d["__doc_id"], str) for d in batch)
        seen.add(len(batch))

    n = upsert_to_document_store(df, "doc_id", write_batch)
    assert n == 1234
    assert seen.value == 1234


def test_document_store_empty_guard(spark):
    import pyspark.sql.functions as F

    df = spark.range(1).filter(F.lit(False))
    called = []
    assert upsert_to_document_store(df, "id", lambda b: called.append(b)) == 0
    assert called == []


GRID = [
    [" Id ", "name", "homologado"],
    ["1", "ana", "SIM"],
    ["2", "bob", "NAO"],
    ["", "blank-id", "SIM"],
]


def test_grid_roundtrip_and_dedupe_append(spark):
    df = grid_to_dataframe(spark, GRID)
    assert df.columns == [" Id ", "name", "homologado"]
    assert df.count() == 3

    incoming = spark.createDataFrame(
        [(1, "ana2", "SIM"), (3, "carla", "NAO"), (4, "dan", "SIM")],
        "id long, name string, homologado string",
    )
    appended: list[list[str]] = []
    n = dedupe_append_to_grid(GRID, incoming, "id", lambda rows: appended.extend(rows) or len(rows))
    # id=1 already on the sheet → only 3 and 4 appended, projected to header
    assert n == 2
    assert sorted(r[0] for r in appended) == ["3", "4"]
    assert all(len(r) == 3 for r in appended)


def test_check_allowed_values(spark):
    good = grid_to_dataframe(spark, GRID)
    assert check_allowed_values(good, "homologado")
    bad = spark.createDataFrame([("TALVEZ",)], "homologado string")
    assert not check_allowed_values(bad, "homologado")


def test_flag_columns_case_insensitive_resolution(spark):
    df = spark.createDataFrame(
        [("sim", "0"), ("2", "1,0")], "`Sanity_Check` string, `QUALITY check` string"
    )
    out = flag_columns(df, {"sanity": "sanity_check", "quality": "quality check"})
    rows = out.collect()
    assert [(r.sanity, r.quality) for r in rows] == [(True, False), (False, True)]


def test_alert_attachment_bounds(spark):
    df = spark.range(0, 10)
    csv, n = alert_attachment(df)
    assert n == 10 and csv.splitlines()[0] == "id"
    with pytest.raises(ValueError):
        alert_attachment(spark.range(0, 50), max_rows=10)


def test_task_exchange_roundtrip(spark, tmp_path):
    df = spark.range(0, 7)
    manifest = task_output(df, str(tmp_path / "x"))
    back = task_input(spark, manifest)
    assert back.count() == 7


def test_binary_assets_pipeline(spark, tmp_path):
    import struct

    # one spec-valid PNG, one truncated/broken payload with a png name
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">IIBBBBB", 320, 240, 8, 6, 0, 0, 0)
        + b"\x00\x00\x00\x00"
    )
    (tmp_path / "a.png").write_bytes(png)
    (tmp_path / "b.jpg").write_bytes(b"\xff\xd8" + bytes(range(100)) * 30)
    assets = read_binary_assets(spark, str(tmp_path))
    rows = {r.media.kind for r in assets.collect()}
    assert rows == {"image"}

    feats = extract_image_features(assets)
    got = {
        r.path.rsplit("/", 1)[-1]: r
        for r in feats.select("path", "width", "height", "n_bytes").collect()
    }
    assert (got["a.png"].width, got["a.png"].height) == (320, 240)
    # undecodable payload: explicit nulls, never a fabricated number
    assert got["b.jpg"].width is None and got["b.jpg"].height is None
    assert all(r.n_bytes > 0 for r in got.values())

    frames = sample_video_frames(assets)
    f = frames.collect()
    assert len(f) >= 2
    assert frames.columns == ["path", "frame_idx", "frame_ts_ms", "frame"]


# --- IO22 web source (stub fetcher; plumbing is real) -------------------------

def test_fetch_url_column_plumbing(spark):
    from neulix_datahub_spark.sources.web import fetch_url_column, stub_fetch

    urls = [f"https://example.org/page/{i}" for i in range(10)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = fetch_url_column(df.repartition(4))
    rows = out.collect()
    assert len(rows) == 10
    assert set(out.columns) == {"url", "status", "title", "content_sha256", "n_bytes"}
    # deterministic across executors: re-run matches the driver-side stub
    import hashlib
    for r in rows:
        st, title, body = stub_fetch(r.url)
        assert (r.status, r.title) == (st, title)
        assert r.content_sha256 == hashlib.sha256(body).hexdigest()


def test_pipeline_tasks_chain_via_manifests(spark, tmp_path):
    from neulix_datahub_spark.orchestration.dag_template import (
        fetch_task,
        load_task,
        profile_task,
    )

    urls = [f"https://example.org/doc/{i}" for i in range(6)]
    m1 = fetch_task(spark, urls, str(tmp_path / "fetched"))
    assert m1["format"] == "parquet"  # XCom carries a manifest, not rows
    m2 = load_task(spark, m1, str(tmp_path / "loaded"), "replace")
    prof = profile_task(spark, m2)
    assert {p["column"] for p in prof} >= {"url", "status", "title"}


# --- partitioned layout + pruning ---------------------------------------------

def test_partition_pruning_and_compaction(spark, tmp_path):
    import contextlib
    import glob
    import io as _io

    from pyspark.sql import functions as F

    from neulix_datahub_spark.sources.layout import (
        compact_partitions,
        read_partitioned,
        write_date_partitioned,
    )
    from neulix_datahub_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    path = str(tmp_path / "events_by_date")
    ev = load_table(spark, SF_DIR, "events")
    write_date_partitioned(ev.repartition(8), path, ts_col="ts")

    one_day = read_partitioned(
        spark, path, prune=F.col("event_date") == "2024-01-02"
    )
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [" in plan and "event_date" in plan.split("PartitionFilters")[1][:200]
    assert one_day.count() > 0

    n_files_before = len(glob.glob(f"{path}/*/part-*.parquet"))
    compact_partitions(spark, path, target_files_per_partition=1)
    n_files_after = len(glob.glob(f"{path}/*/part-*.parquet"))
    n_dirs = len(glob.glob(f"{path}/event_date=*"))
    assert n_files_after <= n_dirs  # ~1 file per partition dir
    assert n_files_after < n_files_before
    assert spark.read.parquet(path).count() == ev.count()


def test_real_png_jpeg_header_parse(spark, tmp_path):
    """PNG IHDR and JPEG SOF dimensions are parsed for REAL (stdlib
    struct over the container headers) — pinned on handcrafted but
    spec-valid fixture binaries; undecodable payloads emit explicit
    nulls (no fabricated fallback)."""
    import struct

    from neulix_datahub_spark.operators.multimodal import (
        parse_jpeg_dimensions,
        parse_png_dimensions,
    )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">IIBBBBB", 640, 480, 8, 6, 0, 0, 0)
        + b"\x00\x00\x00\x00"  # CRC not checked by the header parser
    )
    assert parse_png_dimensions(png) == (640, 480)

    jpeg = (
        b"\xff\xd8"                                     # SOI
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)  # APP0
        + b"\xff\xc0" + struct.pack(">H", 17)           # SOF0, seg len
        + struct.pack(">BHH", 8, 1080, 1920)            # precision, H, W
        + bytes(10)
    )
    assert parse_jpeg_dimensions(jpeg) == (1920, 1080)
    assert parse_png_dimensions(b"not a png") is None
    assert parse_jpeg_dimensions(b"\xff\xd8\x00garbage") is None

    (tmp_path / "real.png").write_bytes(png)
    (tmp_path / "real.jpg").write_bytes(jpeg)
    (tmp_path / "fake.png").write_bytes(b"\x89PNG but not really" + bytes(100))
    assets = read_binary_assets(spark, str(tmp_path))
    feats = {
        r.path.rsplit("/", 1)[-1]: (r.width, r.height)
        for r in extract_image_features(assets).collect()
    }
    assert feats["real.png"] == (640, 480)
    assert feats["real.jpg"] == (1920, 1080)
    assert feats["fake.png"] == (None, None)  # unparsed: nulls, not fakes


def test_real_wav_header_parse(spark, tmp_path):
    """WAV sample-rate/channels/duration are parsed from the real RIFF
    chunks — the fixture is written by the stdlib `wave` module, so the
    header is a genuine encoder's output, not hand-assembled; an mp3
    payload gets explicit nulls (needs a real decoder)."""
    import wave

    from neulix_datahub_spark.operators.multimodal import (
        extract_audio_features,
        parse_wav_header,
    )

    p = tmp_path / "tone.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(b"\x00\x00" * 2 * 44100)  # exactly 1 s of stereo s16
    assert parse_wav_header(p.read_bytes()) == (44100, 2, 1000)
    (tmp_path / "song.mp3").write_bytes(b"ID3" + bytes(300))

    assets = read_binary_assets(spark, str(tmp_path))
    rows = {
        r.path.rsplit("/", 1)[-1]: r
        for r in extract_audio_features(assets).collect()
    }
    wav = rows["tone.wav"]
    assert (wav.sample_rate, wav.channels, wav.duration_ms) == (44100, 2, 1000)
    assert wav.n_bytes == p.stat().st_size
    mp3 = rows["song.mp3"]
    assert mp3.sample_rate is None and mp3.duration_ms is None
    assert rows["tone.wav"].media.kind == "audio"


def _bmp_fixture(pixels_rgb, top_down=False):
    """Hand-assemble a spec-valid uncompressed 24-bpp BMP from an RGB
    row-major pixel list-of-lists (row 0 = top row)."""
    import struct

    h = len(pixels_rgb)
    w = len(pixels_rgb[0])
    stride = (w * 3 + 3) & ~3
    rows = pixels_rgb if top_down else pixels_rgb[::-1]  # file storage order
    body = b"".join(
        b"".join(bytes((b_, g, r)) for (r, g, b_) in row) + bytes(stride - w * 3)
        for row in rows
    )
    hdr = (
        b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24,
                      0, len(body), 2835, 2835, 0, 0)
    )
    return hdr + body


def test_bmp_pixel_decode_is_real(spark, tmp_path):
    """decode_bmp_pixels returns the ACTUAL pixels: a handcrafted 2x2
    24-bpp BMP round-trips exactly (both bottom-up and top-down row
    orders), and extract_image_features derives the true mean RGB /
    brightness from them — not a fake."""
    import numpy as np

    from neulix_datahub_spark.operators.multimodal import (
        decode_bmp_pixels,
        extract_image_features,
    )

    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    for td in (False, True):
        arr = decode_bmp_pixels(_bmp_fixture(px, top_down=td))
        assert arr.shape == (2, 2, 3)
        assert [[tuple(int(v) for v in c) for c in row] for row in arr] == px, td

    # paletted/RLE/truncated payloads refuse, never guess
    assert decode_bmp_pixels(b"BM" + bytes(60)) is None

    (tmp_path / "quad.bmp").write_bytes(_bmp_fixture(px))
    assets = read_binary_assets(spark, str(tmp_path))
    r = extract_image_features(assets).collect()[0]
    assert (r.width, r.height) == (2, 2)
    assert (r.mean_r, r.mean_g, r.mean_b) == (127.5, 127.5, 127.5)
    want_luma = float(
        np.mean([0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2] for row in px for p in row])
    )
    assert abs(r.brightness - want_luma) < 1e-3
    assert r.contrast > 0


def test_wav_sample_decode_and_resample_are_real(spark, tmp_path):
    """decode_wav_samples returns the ACTUAL samples (sine fixture →
    RMS amp/√2, ZCR 2·freq) and resample_pcm_wav re-times them by
    linear interpolation (length scales, content preserved, output is
    itself a decodable PCM WAV)."""
    import math
    import wave

    import numpy as np

    from neulix_datahub_spark.operators.multimodal import (
        decode_wav_samples,
        extract_audio_content_features,
        resample_pcm_wav,
    )

    rate, freq, amp, secs = 8000, 440, 0.5, 1.0
    n = int(rate * secs)
    samples = [
        int(32767 * amp * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)
    ]
    p = tmp_path / "sine.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(s.to_bytes(2, "little", signed=True) for s in samples))

    got_rate, x = decode_wav_samples(p.read_bytes())
    assert got_rate == rate and x.shape == (n, 1)
    assert abs(float(np.sqrt((x**2).mean())) - amp / math.sqrt(2)) < 0.01
    (tmp_path / "noise.mp3").write_bytes(b"ID3" + bytes(200))

    assets = read_binary_assets(spark, str(tmp_path))
    rows = {
        r.path.rsplit("/", 1)[-1]: r
        for r in extract_audio_content_features(assets).collect()
    }
    sine = rows["sine.wav"]
    assert abs(sine.rms - amp / math.sqrt(2)) < 0.01
    assert abs(sine.peak - amp) < 0.01
    assert abs(sine.zero_crossing_rate - 2 * freq) < 25  # crossings/s ≈ 2f
    assert sine.n_samples == n
    assert rows["noise.mp3"].rms is None  # non-PCM: nulls, not fakes

    down = resample_pcm_wav(p.read_bytes(), 4000)
    got2_rate, y = decode_wav_samples(down)
    assert got2_rate == 4000 and abs(y.shape[0] - n // 2) <= 1
    # a 440 Hz tone is far under the 2 kHz Nyquist: energy survives
    assert abs(float(np.sqrt((y**2).mean())) - amp / math.sqrt(2)) < 0.02


def test_real_gif_bmp_header_parse(spark, tmp_path):
    """GIF logical-screen-descriptor and BMP BITMAPINFOHEADER dimensions
    parse for real; a top-down BMP (negative height) reports the
    magnitude."""
    import struct

    from neulix_datahub_spark.operators.multimodal import (
        parse_bmp_dimensions,
        parse_gif_dimensions,
    )

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + bytes(4)
    assert parse_gif_dimensions(gif) == (320, 200)
    assert parse_gif_dimensions(b"GIF00a" + bytes(10)) is None

    bmp = (
        b"BM" + struct.pack("<IHHI", 200, 0, 0, 54)      # file header
        + struct.pack("<IiiHH", 40, 800, -600, 1, 24)    # info header head
        + bytes(40)
    )
    assert parse_bmp_dimensions(bmp) == (800, 600)  # top-down -> magnitude
    assert parse_bmp_dimensions(b"BM" + bytes(10)) is None
    # legacy BITMAPCOREHEADER: DIB size 12, u16 dims — must parse, not
    # misread as i32 garbage
    core = (
        b"BM" + struct.pack("<IHHI", 100, 0, 0, 26)
        + struct.pack("<IHHHH", 12, 100, 50, 1, 24)
    )
    assert parse_bmp_dimensions(core) == (100, 50)
    # unknown DIB size -> None, never garbage
    weird = b"BM" + struct.pack("<IHHI", 100, 0, 0, 26) + struct.pack("<I", 16) + bytes(12)
    assert parse_bmp_dimensions(weird) is None

    (tmp_path / "a.gif").write_bytes(gif + bytes(20))
    (tmp_path / "b.bmp").write_bytes(bmp)
    assets = read_binary_assets(spark, str(tmp_path))
    feats = {
        r.path.rsplit("/", 1)[-1]: (r.width, r.height)
        for r in extract_image_features(assets).collect()
    }
    assert feats["a.gif"] == (320, 200)
    assert feats["b.bmp"] == (800, 600)


def test_real_mp4_duration_parse(spark, tmp_path):
    """parse_mp4_duration reads moov/mvhd for real (both versions), and
    the frame sampler's grid follows the PARSED duration for MP4
    payloads — 3.5 s at 1 fps -> 4 frames."""
    import struct

    from neulix_datahub_spark.operators.multimodal import (
        parse_mp4_duration,
        sample_video_frames,
    )

    def box(fourcc, body):
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    # mvhd v0: ver/flags + creation + modification + timescale + duration
    mvhd_v0 = box(
        b"mvhd",
        bytes(4) + struct.pack(">II", 0, 0) + struct.pack(">II", 1000, 3500)
        + bytes(80),
    )
    mp4 = box(b"ftyp", b"isom" + bytes(8)) + box(b"moov", mvhd_v0)
    assert parse_mp4_duration(mp4) == (1000, 3500)

    # v1 variant: 64-bit times, timescale 600, duration 1200 ticks = 2 s
    mvhd_v1 = box(
        b"mvhd",
        b"\x01" + bytes(3) + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 600) + struct.pack(">Q", 1200) + bytes(80),
    )
    assert parse_mp4_duration(box(b"ftyp", b"isom") + box(b"moov", mvhd_v1)) == (600, 2000)
    assert parse_mp4_duration(b"nonsense" * 4) is None

    (tmp_path / "clip.mp4").write_bytes(mp4 + bytes(4096))
    (tmp_path / "blob.bin").write_bytes(bytes(3000))
    assets = read_binary_assets(spark, str(tmp_path))
    frames = sample_video_frames(assets, every_ms=1000).collect()
    per = {}
    for r in frames:
        per.setdefault(r.path.rsplit("/", 1)[-1], []).append(r.frame_ts_ms)
    assert sorted(per["clip.mp4"]) == [0, 1000, 2000, 3000]  # real 3.5 s grid
    assert len(per["blob.bin"]) == 2  # stub model: 3000 // 1024 -> 2 frames


def test_binary_parsers_total_on_arbitrary_bytes():
    """All codec-free header parsers are TOTAL: arbitrary (including
    adversarial signature-prefixed) byte strings return a value or None,
    never raise — they run inside executors where an exception fails the
    job. Hypothesis drives random payloads plus valid-signature
    prefixes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from neulix_datahub_spark.operators.multimodal import (
        parse_bmp_dimensions,
        parse_gif_dimensions,
        parse_jpeg_dimensions,
        parse_mp4_duration,
        parse_png_dimensions,
        parse_wav_header,
    )

    parsers = (
        parse_png_dimensions, parse_jpeg_dimensions, parse_gif_dimensions,
        parse_bmp_dimensions, parse_wav_header, parse_mp4_duration,
    )
    sigs = (
        b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a", b"BM",
        b"RIFF\x00\x00\x00\x00WAVE", b"\x00\x00\x00\x0cftyp",
    )

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=256), st.sampled_from(list(range(len(sigs) + 1))))
    def run(payload, sig_idx):
        blob = (sigs[sig_idx] + payload) if sig_idx < len(sigs) else payload
        for p in parsers:
            out = p(blob)  # must not raise
            assert out is None or isinstance(out, tuple)

    run()


def test_document_query_null_filter_and_limit_zero(spark):
    """Firestore parity: a None filter value matches null fields
    (plain == against a None literal is three-valued NULL and matches
    nothing), and limit=0 means NO limit (the reference's `if limit:`),
    not an empty result."""
    from neulix_datahub_spark.sources.adapters import document_query

    df = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "id int, deleted_at string"
    )
    got = document_query(df, filters={"deleted_at": None}, order_by="id")
    assert [r.id for r in got.collect()] == [1, 3]
    assert document_query(df, limit=0).count() == 3


def test_doc_store_upsert_validates_id_column(spark):
    """A missing id column aborts BEFORE any write (reference
    db_core.py:283-289) — not as a KeyError inside executor tasks after
    earlier partitions already committed."""
    import pytest as _pytest

    from neulix_datahub_spark.sources.adapters import upsert_to_document_store

    df = spark.createDataFrame([(1, "a")], "id int, v string")
    written = []
    with _pytest.raises(ValueError, match="id column 'ID'"):
        upsert_to_document_store(df, "ID", written.append)
    assert written == []


def test_grid_dedupe_raises_when_header_lacks_id(spark):
    """Reference parity (ID_COLUMN_NOT_IN_SHEET): a grid whose header
    has no id column must raise — a substring fallback could latch onto
    'paid' for 'id' and anti-join away unrelated rows, and skipping
    dedupe silently appends duplicates on every run."""
    import pytest as _pytest

    from neulix_datahub_spark.sources.adapters import dedupe_append_to_grid

    incoming = spark.createDataFrame([(1, "a")], "id int, v string")
    grid = [["paid", "v"], ["1", "x"]]
    with _pytest.raises(ValueError, match="ID_COLUMN_NOT_IN_SHEET"):
        dedupe_append_to_grid(grid, incoming, "id", lambda rows: len(rows))


def test_grid_to_dataframe_survives_messy_header_cells(spark):
    """Blank and backtick-bearing header cells are what real sheets
    contain; the DDL-string schema choked on both."""
    from neulix_datahub_spark.sources.adapters import grid_to_dataframe

    rows = [["id", "", "Price (`R$`)"], ["1", "x", "9.5"]]
    df = grid_to_dataframe(spark, rows)
    assert df.columns == ["id", "", "Price (`R$`)"]
    assert df.collect()[0][2] == "9.5"
