"""Mirror-host detection + per-host crawl stats: planted-mirror parity,
the hot-sha boilerplate cap (counted, never silent), threshold semantics,
partition/bucket independence, and exact host-stats accounting."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pie_ray.stages.mirrors import host_stats, mirror_hosts, q_host_stats, q_mirror_hosts


def _t1(rows):
    """(url, sha, ts[, text]) -> T1-shaped table."""
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "text": pa.array(
                [r[3] if len(r) > 3 else f"text-{r[1]}" for r in rows], pa.string()
            ),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "text_sha256": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def _planted():
    rows = []
    # a.com and b.com share 3 contents (mirror pair); c.com shares 1 with
    # a.com (below threshold); boiler sha lives on 5 hosts
    for k in range(3):
        rows.append((f"https://a.com/p{k}", f"s{k}", k))
        rows.append((f"https://b.com/m{k}", f"s{k}", k + 10))
    rows.append(("https://a.com/x", "s9", 5))
    rows.append(("https://c.com/y", "s9", 6))
    for h in ("a.com", "b.com", "c.com", "d.com", "e.com"):
        rows.append((f"https://{h}/404", "boiler", 7))
    return _t1(rows)


def test_mirror_hosts_planted_and_partition_independent(ray_session):
    results = []
    for parts, nb in ((1, 4), (3, 16)):
        ds = ray.data.from_arrow(_planted()).repartition(parts)
        pairs, report = mirror_hosts(
            ds, min_shared=3, max_hosts_per_sha=3, num_buckets=nb
        )
        got = sorted(
            (r["host_a"], r["host_b"], r["n_shared"]) for r in pairs.take_all()
        )
        results.append((got, report["n_hot_shas_dropped"]))
    got, n_hot = results[0]
    assert got == [("a.com", "b.com", 3)]  # c.com link below threshold
    assert n_hot == 1  # the boiler sha was capped and counted
    assert results[0] == results[1]


def test_mirror_hosts_threshold_and_cap_interplay(ray_session):
    ds = ray.data.from_arrow(_planted())
    # lower threshold surfaces the weak a-c link too
    pairs, _ = mirror_hosts(ds, min_shared=1, max_hosts_per_sha=3)
    got = {(r["host_a"], r["host_b"]): r["n_shared"] for r in pairs.take_all()}
    assert got[("a.com", "b.com")] == 3 and got[("a.com", "c.com")] == 1
    # with a generous cap the boiler sha creates pairs among all 5 hosts
    pairs2, rep2 = mirror_hosts(ds, min_shared=1, max_hosts_per_sha=64)
    assert rep2["n_hot_shas_dropped"] == 0
    got2 = {(r["host_a"], r["host_b"]) for r in pairs2.take_all()}
    assert ("d.com", "e.com") in got2  # boilerplate-only pair now appears


def test_host_stats_exact_accounting(ray_session):
    rows = [
        ("https://a.com/1", "sA", 100, "hello"),
        ("https://a.com/2", "sA", 50, "hello"),  # duplicate content
        ("https://a.com/3", "sB", 200, "worlds"),
        ("https://b.com/1", "sC", 10, "x"),
    ]
    ds = ray.data.from_arrow(_t1(rows))
    got = {r["host"]: r for r in host_stats(ds, num_buckets=8).take_all()}
    a = got["a.com"]
    assert a["n_pages"] == 3 and a["n_distinct_content"] == 2
    assert a["text_chars"] == 5 + 5 + 6
    assert a["first_ts"] == 50 and a["last_ts"] == 200
    b = got["b.com"]
    assert b["n_pages"] == 1 and b["n_distinct_content"] == 1


def test_q_entries(ray_session):
    t = q_mirror_hosts("unused")
    pairs = list(
        zip(t.column("host_a").to_pylist(), t.column("host_b").to_pylist())
    )
    # the planted scraper mirror is found (h0 pages have distinct texts,
    # all shared verbatim by the mirror domain)
    assert ("h0.example", "mirror-of-h0.example") in pairs
    s = q_host_stats("unused")
    assert s.num_rows > 0
    assert s.column("host").to_pylist() == sorted(s.column("host").to_pylist())
    assert sum(s.column("n_pages").to_pylist()) == 1200
