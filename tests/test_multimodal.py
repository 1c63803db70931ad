

def test_media_header_roundtrip_real_bytes():
    """The synthesized headers are REAL: parseable by the byte-layout
    parser and carrying the exact encoded fields."""
    import pandas as pd

    from debezium_server_bigquery_spark.functions.multimodal import (
        _parse_media_header,
        _png_header,
        _wav_header,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "payload": [
                _png_header(640, 480),
                _wav_header(44100),
                b"not a media file",
            ],
        }
    )
    (out,) = list(_parse_media_header(iter([pdf])))
    rows = {r.doc_id: r for r in out.itertuples()}
    assert (rows[1].kind, rows[1].width, rows[1].height) == ("png", 640, 480)
    assert (rows[2].kind, rows[2].sample_rate) == ("wav", 44100)
    assert rows[3].kind == "unknown"
