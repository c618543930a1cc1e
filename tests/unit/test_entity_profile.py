"""Entity profiles: brute-force reference parity on a planted triple set,
deterministic top-pred tie-break, provenance sample bound, and partition
independence."""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import ray.data

from pie_ray.stages.entity_profile import SAMPLE_URLS, entity_profiles


def _ts(s: str):
    return datetime.fromisoformat(s)


PLANTED = [
    # subj, pred, obj, url, warc_ts
    ("per:alice", "has_email", "a@x.com", "https://a/1", "2024-01-02T00:00:00"),
    ("per:alice", "has_email", "a2@x.com", "https://a/2", "2024-01-01T00:00:00"),
    ("per:alice", "has_phone", "111", "https://a/1", "2024-01-03T00:00:00"),
    ("per:alice", "appears_on", "a", "https://a/3", "2024-01-04T00:00:00"),
    ("per:alice", "appears_on", "b", "https://a/4", "2024-01-05T00:00:00"),
    # bob: tie between two preds at 1 each -> smallest pred wins
    ("per:bob", "has_phone", "222", "https://b/1", "2024-02-01T00:00:00"),
    ("per:bob", "appears_on", "b", "https://b/2", "2024-02-02T00:00:00"),
]


def _triples_table() -> pa.Table:
    return pa.table(
        {
            "subj": pa.array([r[0] for r in PLANTED], pa.string()),
            "pred": pa.array([r[1] for r in PLANTED], pa.string()),
            "obj": pa.array([r[2] for r in PLANTED], pa.string()),
            "url": pa.array([r[3] for r in PLANTED], pa.string()),
            "warc_ts": pa.array(
                [_ts(r[4]) for r in PLANTED], pa.timestamp("us")
            ),
            "score": pa.array([1.0] * len(PLANTED), pa.float32()),
        }
    )


def brute():
    out = {}
    for subj in {r[0] for r in PLANTED}:
        rows = [r for r in PLANTED if r[0] == subj]
        preds = sorted({r[1] for r in rows})
        urls = sorted({r[3] for r in rows})
        cnt = {p: sum(1 for r in rows if r[1] == p) for p in preds}
        top = max(preds, key=lambda p: (cnt[p], ), default=None)
        # deterministic tie-break: count desc then pred asc
        top = sorted(preds, key=lambda p: (-cnt[p], p))[0]
        out[subj] = {
            "n_triples": len(rows),
            "n_preds": len(preds),
            "n_urls": len(urls),
            "top_pred": top,
            "first_seen": min(_ts(r[4]) for r in rows),
            "last_seen": max(_ts(r[4]) for r in rows),
            "sample_urls": urls[:SAMPLE_URLS],
        }
    return out


def _got(ds) -> dict:
    out = {}
    for r in ds.take_all():
        out[r["subj"]] = {
            "n_triples": r["n_triples"],
            "n_preds": r["n_preds"],
            "n_urls": r["n_urls"],
            "top_pred": r["top_pred"],
            "first_seen": r["first_seen"],
            "last_seen": r["last_seen"],
            "sample_urls": list(r["sample_urls"]),
        }
    return out


def test_matches_brute_reference(ray_session):
    ds = ray.data.from_arrow(_triples_table())
    assert _got(entity_profiles(ds)) == brute()


def test_tie_break_and_sample_bound(ray_session):
    ds = ray.data.from_arrow(_triples_table())
    got = _got(entity_profiles(ds))
    assert got["per:bob"]["top_pred"] == "appears_on"  # tie -> smallest pred
    assert got["per:alice"]["sample_urls"] == [
        "https://a/1",
        "https://a/2",
        "https://a/3",
    ]
    assert len(got["per:alice"]["sample_urls"]) == SAMPLE_URLS


def test_partition_independence(ray_session):
    base = None
    for parts in (1, 2, 5):
        ds = ray.data.from_arrow(_triples_table()).repartition(parts)
        got = _got(entity_profiles(ds, num_buckets=3))
        if base is None:
            base = got
        assert got == base


def test_cli_profiles_writer(ray_session, tmp_path):
    """The CLI's --profiles post-step: parquet out, list column flattened."""
    import pyarrow.parquet as pq

    from pie_ray.run import _write_profiles

    tri_dir = tmp_path / "triples"
    tri_dir.mkdir()
    pq.write_table(_triples_table(), str(tri_dir / "part-0.parquet"))
    rep = _write_profiles(str(tri_dir), str(tmp_path))
    assert rep["n_entities"] == 2
    out = pq.ParquetDataset(rep["profiles_path"]).read()
    by_subj = dict(zip(out.column("subj").to_pylist(), out.column("sample_urls").to_pylist()))
    assert by_subj["per:alice"] == "https://a/1|https://a/2|https://a/3"


def test_over_real_pipeline_output(ray_session):
    from pie_ray.pipelines.kg import build_triples
    from pie_ray.sources.synth import synth_pages

    triples = build_triples(synth_pages(120, override_num_blocks=4)).materialize()
    prof = _got(entity_profiles(triples))
    n_subj = len({r["subj"] for r in triples.take_all()})
    assert len(prof) == n_subj
    total = sum(v["n_triples"] for v in prof.values())
    assert total == triples.count()
    for v in prof.values():
        assert 1 <= len(v["sample_urls"]) <= SAMPLE_URLS
        assert v["n_urls"] >= len(v["sample_urls"]) or v["n_urls"] <= SAMPLE_URLS
