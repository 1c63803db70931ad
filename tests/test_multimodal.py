

def test_media_header_roundtrip_real_bytes():
    """The synthesized headers are REAL: parseable by the byte-layout
    parser and carrying the exact encoded fields."""
    import pandas as pd

    from debezium_server_bigquery_spark.functions.multimodal import (
        _bmp_header,
        _gif_header,
        _parse_media_header,
        _png_header,
        _wav_header,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "payload": [
                _png_header(640, 480),
                _wav_header(44100),
                b"not a media file",
                _gif_header(320, 200),
                _bmp_header(64, 32),
            ],
        }
    )
    (out,) = list(_parse_media_header(iter([pdf])))
    rows = {r.doc_id: r for r in out.itertuples()}
    assert (rows[1].kind, rows[1].width, rows[1].height) == ("png", 640, 480)
    assert (rows[2].kind, rows[2].sample_rate) == ("wav", 44100)
    assert rows[3].kind == "unknown"
    assert (rows[4].kind, rows[4].width, rows[4].height) == ("gif", 320, 200)
    assert (rows[5].kind, rows[5].width, rows[5].height) == ("bmp", 64, 32)


def test_media_header_truncated_payloads_are_unknown():
    """Truncated magic-matching payloads must classify as unknown, not
    crash the Arrow task's struct.unpack."""
    import pandas as pd

    from debezium_server_bigquery_spark.functions.multimodal import (
        _parse_media_header,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "payload": [b"GIF89a\x01", b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR", b"RIFF1234WAVEfmt "],
        }
    )
    (out,) = list(_parse_media_header(iter([pdf])))
    assert list(out["kind"]) == ["unknown", "unknown", "unknown"]


def test_jpeg_sof_marker_walk():
    """The JPEG parser walks real marker segments to SOF0 and survives
    truncation (classifies unknown, never crashes)."""
    import pandas as pd

    from debezium_server_bigquery_spark.functions.multimodal import (
        _jpeg_header,
        _parse_media_header,
    )

    good = _jpeg_header(640, 480)
    truncated = good[:6]  # ends inside APP0 — no SOF reachable
    no_sof = good[: good.index(b"\xff\xc0")]  # SOI + APP0 only
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "payload": [good, truncated, no_sof]}
    )
    (out,) = list(_parse_media_header(iter([pdf])))
    rows = {r.doc_id: r for r in out.itertuples()}
    assert rows[1].kind == "jpeg" and (rows[1].width, rows[1].height) == (640, 480)
    assert rows[2].kind == "unknown"
    assert rows[3].kind == "unknown"
