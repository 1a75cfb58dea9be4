"""multimodal_png_resize: codec-roundtrip integer resize + the
dHash resize-invariance property (the promise perceptual hashing
makes: a downsampled copy stays within the dedup radius)."""

from __future__ import annotations

import numpy as np


def _resize2(arr):
    a = arr.astype(np.int64)
    h, w, _ = a.shape
    return (a.reshape(h // 2, 2, w // 2, 2, 3).sum(axis=(1, 3)) // 4).astype(
        np.uint8
    )


def test_resize_roundtrip_values_and_geometry(spark, sf_dir):
    """The query's channel sums equal an independent numpy replay of
    formula pixels -> 2x2 floor-average, and every image comes back
    9x8 through the re-encode -> re-decode roundtrip."""
    from bigdata_project_spark.operators.multimodal import (
        _DHASH_GROUP,
        _dhash_pixels,
    )
    from bigdata_project_spark.registry import all_queries

    rows = {
        r["doc_id"]: r
        for r in all_queries()["multimodal_png_resize"](spark, sf_dir).collect()
    }
    assert rows and all(
        (r["width"], r["height"]) == (9, 8) for r in rows.values()
    )
    for doc_id in list(rows)[:8]:
        g, v = doc_id // _DHASH_GROUP, doc_id % _DHASH_GROUP
        arr = _dhash_pixels(g * _DHASH_GROUP).copy()
        if v > 0:
            arr[v, v, 0] = (int(arr[v, v, 0]) + 128) % 256
        small = _resize2(arr).astype(np.int64)
        r = rows[doc_id]
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (
            int(small[:, :, 0].sum()),
            int(small[:, :, 1].sum()),
            int(small[:, :, 2].sum()),
        ), doc_id


def test_dhash_resize_invariance(spark, sf_dir):
    """dHash(2x-downsampled image) stays within the Hamming-<=3
    dedup radius of dHash(original) for EVERY testbed image — so a
    resized copy is still caught by multimodal_dhash_neardup — and
    the hash is bit-identical for the majority (rounding in the
    floor-average can flip a near-tie gradient bit, never more than
    a few)."""
    from bigdata_project_spark.registry import all_queries

    hams = [
        r["hamming"]
        for r in all_queries()["multimodal_png_resize"](spark, sf_dir).collect()
    ]
    assert hams and max(hams) <= 3
    assert sum(1 for h in hams if h == 0) >= len(hams) * 2 // 3


def test_generalized_dhash_backcompat():
    """The geometry-adaptive _dhash64 reproduces the fixed-geometry
    hash on 18x16 inputs (the r10 signatures must not shift) and
    hashes the 9x8 downsample through the same code path."""
    from bigdata_project_spark.operators.multimodal import (
        _dhash64,
        _dhash_pixels,
    )

    arr = _dhash_pixels(0)
    sig = _dhash64(arr)
    assert len(sig) == 16 and set(sig) <= set("0123456789abcdef")
    # hand-rolled fixed-geometry replay (the pre-r11 arithmetic)
    px = arr.astype(np.int64)
    gray = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    cells = gray.reshape(8, 2, 9, 2).sum(axis=(1, 3))
    bits = (cells[:, :-1] > cells[:, 1:]).astype(np.int64).reshape(-1)
    nib = bits.reshape(16, 4)
    nv = nib[:, 0] * 8 + nib[:, 1] * 4 + nib[:, 2] * 2 + nib[:, 3]
    assert sig == "".join("0123456789abcdef"[int(x)] for x in nv)
    assert len(_dhash64(_resize2(arr))) == 16
