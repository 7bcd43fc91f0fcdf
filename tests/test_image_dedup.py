"""Perceptual-hash (dHash) near-dup over real BMP payloads.

The multimodal <-> dedup bridge: 64-bit difference hashes computed from
decoded pixels (ext/codecs), banded like SimHash, Hamming-verified.
Near-identical images (small pixel edits, re-encodes) must pair up;
structurally different images must not.
"""

from __future__ import annotations

import numpy as np

from marketing_etl_analytics_spark.ext.codecs import decode_bmp, dhash, encode_bmp
from marketing_etl_analytics_spark.ext.multimodal import dhash_near_dups, image_dhash


def _base_image(seed: int, h: int = 32, w: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # seed-dependent low-frequency structure (random 8x8 control grid
    # upsampled 4x): dHash reads the downsampled luma, so distinct
    # seeds give ~random 64-bit hashes while a handful of single-pixel
    # edits barely moves the resampled grid
    control = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    return np.kron(control, np.ones((h // 8, w // 8, 1), dtype=np.uint8))


def _variant(img: np.ndarray, seed: int, n_edits: int = 10) -> np.ndarray:
    rng = np.random.default_rng(seed)
    out = img.copy()
    ys = rng.integers(0, img.shape[0], n_edits)
    xs = rng.integers(0, img.shape[1], n_edits)
    out[ys, xs] = rng.integers(0, 256, (n_edits, 3))
    return out


def test_dhash_deterministic_and_robust():
    img = _base_image(1)
    h1 = dhash(img)
    assert h1 == dhash(decode_bmp(encode_bmp(img)))  # encode/decode exact
    # small edits flip few bits; a different image flips many
    hv = dhash(_variant(img, 2))
    other = dhash(_base_image(99))
    assert bin(h1 ^ hv).count("1") <= 6
    assert bin(h1 ^ other).count("1") > 6


def test_dhash_near_dups_pairs_variants_only(spark):
    rows = []
    for group in range(4):
        img = _base_image(group * 10 + 1)
        rows.append((group * 10, bytearray(encode_bmp(img))))
        rows.append((group * 10 + 1, bytearray(encode_bmp(_variant(img, group)))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    hashes = {r.doc_id: r.dhash for r in image_dhash(df).collect()}
    assert len(hashes) == 8

    pairs = dhash_near_dups(df).collect()
    got = {(p.doc_a, p.doc_b) for p in pairs}
    want = {(g * 10, g * 10 + 1) for g in range(4)}
    # every variant pair found; no cross-group pair survives the verify
    assert want <= got
    for p in pairs:
        assert p.hamming <= 6
        assert p.doc_a // 10 == p.doc_b // 10, (p.doc_a, p.doc_b)


def test_dhash_null_payloads_skipped(spark):
    img = _base_image(5)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(img))), (2, None)],
        "doc_id long, payload binary",
    )
    out = image_dhash(df).collect()
    by_id = {r.doc_id: r.dhash for r in out}
    assert by_id[1] is not None and by_id[2] is None
    assert dhash_near_dups(df).collect() == []


def test_audio_near_dups_finds_releveled_copy(spark):
    """A gain-scaled, lightly-noised re-encode of a clip pairs with
    its original via the energy-envelope fingerprint; an unrelated
    clip doesn't. Difference coding makes the fingerprint invariant
    to volume scaling."""
    import numpy as np

    from marketing_etl_analytics_spark.ext.codecs import encode_wav
    from marketing_etl_analytics_spark.ext.multimodal import audio_near_dups

    rng = np.random.default_rng(7)
    t = np.arange(16_000 * 2)  # 2 s at 16 kHz
    # speech-ish: amplitude-modulated tone bursts
    envelope = np.abs(np.sin(2 * np.pi * t / 16_000 * 1.3)) ** 2
    base = (8000 * envelope * np.sin(2 * np.pi * 440 * t / 16_000)).astype(np.int16)
    relevel = (base.astype(np.float64) * 0.62 + rng.normal(0, 12, len(t))).astype(
        np.int16
    )
    other = (
        6000 * np.sin(2 * np.pi * 220 * t / 16_000) * (0.2 + 0.8 * (t % 16000 < 4000))
    ).astype(np.int16)

    rows = [
        (1, bytearray(encode_wav(base))),
        (2, bytearray(encode_wav(relevel))),
        (3, bytearray(encode_wav(other))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in audio_near_dups(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert (1, 3) not in pairs and (2, 3) not in pairs
