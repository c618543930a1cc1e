"""Perceptual image hashing: hash determinism, banded near-dup candidate
completeness vs brute-force hamming (pigeonhole guarantee at the default
threshold), planted-duplicate e2e, audio skip."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pie_ray.functions.multimodal import (
    ahash64,
    dhash64,
    media_near_dups,
    q_media_phash,
    synth_media,
)


def _img(seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, size=(24, 32, 3), dtype=np.uint8)


def test_hashes_deterministic_and_64bit():
    a = _img(1)
    assert dhash64(a) == dhash64(a.copy())
    assert ahash64(a) == ahash64(a.copy())
    assert 0 <= dhash64(a) < (1 << 64)
    assert dhash64(a) != dhash64(_img(2))  # distinct images differ (w.h.p.)


def _hash_table(vals: dict[str, int]) -> pa.Table:
    ids = sorted(vals)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "kind": pa.array(["image"] * len(ids), pa.string()),
            "dhash": pa.array(
                [np.array(vals[i], np.uint64).astype(np.int64).item() for i in ids],
                pa.int64(),
            ),
            "ahash": pa.array([0] * len(ids), pa.int64()),
        }
    )


def test_near_dups_match_brute_force(ray_session):
    rng = np.random.RandomState(3)
    base = int(rng.randint(0, 2**31))
    vals = {"a": base, "b": base ^ 0b101, "c": base ^ (1 << 40), "d": int(rng.randint(0, 2**31)) | (1 << 63)}
    vals["e"] = vals["d"] ^ 0b11  # near-dup of d
    ds = ray.data.from_arrow(_hash_table(vals))
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in media_near_dups(ds, max_hamming=3).take_all()
    }
    # brute force over all pairs
    def ham(x, y):
        return bin(x ^ y).count("1")

    ids = sorted(vals)
    want = {
        (a, b): ham(vals[a], vals[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(vals[a], vals[b]) <= 3
    }
    assert got == want
    assert ("a", "b") in got and ("d", "e") in got


def test_planted_duplicates_found_e2e(ray_session):
    pairs = q_media_phash("unused").take_all()
    dup_pairs = [r for r in pairs if r["id_a"].startswith("dup") or r["id_b"].startswith("dup")]
    # every planted copy pairs with its source at hamming 0 (real decode:
    # same payload => identical pixels => identical dHash). Other near-dup
    # pairs at hamming <= 3 are legitimate — the real synthetic images are
    # smooth gradients, so unrelated pairs CAN be perceptually close.
    zero_ids = {
        i
        for r in dup_pairs
        if r["hamming"] == 0
        for i in (r["id_a"], r["id_b"])
        if i.startswith("dup")
    }
    assert len(zero_ids) >= 8, (zero_ids, dup_pairs)
    assert all(r["hamming"] <= 3 for r in pairs)


def test_audio_fingerprint_and_no_cross_space_pairs(ray_session):
    from pie_ray.functions.multimodal import audiohash64, hash_media

    hashed = hash_media(synth_media(12), concurrency=(1, 2)).take_all()
    for r in hashed:
        if r["kind"] == "audio":
            assert r["dhash"] != -1 and r["ahash"] == -1  # energy-sign hash
        else:
            assert r["dhash"] != -1 and r["ahash"] != -1
    # determinism of the audio kernel
    wav = np.random.default_rng(9).standard_normal(4096).astype(np.float32)
    assert audiohash64(wav) == audiohash64(wav.copy())
    # an image and an audio row with the SAME numeric hash must never pair
    t = _hash_table({"img": 12345, "aud": 12345})
    t = t.set_column(
        t.schema.get_field_index("kind"),
        "kind",
        pa.array(["audio", "image"], pa.string()),  # ids sorted: aud, img
    )
    pairs = media_near_dups(ray.data.from_arrow(t), max_hamming=3).take_all()
    assert pairs == []


def test_planted_audio_duplicates_pair(ray_session):
    from pie_ray.functions.multimodal import hash_media

    base = synth_media(12)

    def plant(t: pa.Table) -> pa.Table:
        aud = t.filter(pa.compute.equal(t.column("kind"), "audio"))
        dup = aud.slice(0, 2)
        ids = pa.array([f"adup{i}" for i in range(dup.num_rows)], pa.string())
        dup = dup.set_column(dup.schema.get_field_index("media_id"), "media_id", ids)
        return pa.concat_tables([t, dup])

    pairs = media_near_dups(
        hash_media(base.map_batches(plant, batch_format="pyarrow"), concurrency=(1, 2))
    ).take_all()
    adup = [r for r in pairs if r["id_a"].startswith("adup") or r["id_b"].startswith("adup")]
    assert len(adup) >= 2 and all(r["hamming"] == 0 for r in adup)
