"""Crawl-frontier scheduling: politeness cap, priority ordering, unknown
hosts score 0, budget cut, determinism across partitionings."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from pie_ray.stages.frontier import frontier_schedule, q_frontier


def _urls(us):
    return ray.data.from_arrow(pa.table({"url": pa.array(us, pa.string())}))


RANKS = pa.table(
    {
        "host": pa.array(["big.com", "mid.com"], pa.string()),
        "rank_scaled": pa.array([1000, 100], pa.int64()),
    }
)


def test_cap_priority_and_unknown_hosts(ray_session):
    us = (
        [f"https://big.com/p{i}" for i in range(5)]
        + [f"https://mid.com/p{i}" for i in range(3)]
        + ["https://nobody.org/x"]
    )
    out = frontier_schedule(_urls(us), RANKS, per_host_cap=2).take_all()
    rows = [(r["url"], r["host"], r["priority"]) for r in out]
    # per-host cap: 2+2+1 rows; order: big (1000) then mid (100) then 0;
    # within a host the url-asc pick wins the cap
    assert rows == [
        ("https://big.com/p0", "big.com", 1000),
        ("https://big.com/p1", "big.com", 1000),
        ("https://mid.com/p0", "mid.com", 100),
        ("https://mid.com/p1", "mid.com", 100),
        ("https://nobody.org/x", "nobody.org", 0),
    ]


def test_budget_and_partition_independence(ray_session):
    us = [f"https://big.com/p{i}" for i in range(4)] + [
        f"https://mid.com/p{i}" for i in range(4)
    ]
    outs = []
    for parts, nb in ((1, 4), (3, 8)):
        ds = _urls(us).repartition(parts)
        out = frontier_schedule(
            ds, RANKS, per_host_cap=3, budget=4, num_buckets=nb
        ).take_all()
        outs.append([r["url"] for r in out])
    assert outs[0] == outs[1]
    assert outs[0] == [
        "https://big.com/p0",
        "https://big.com/p1",
        "https://big.com/p2",
        "https://mid.com/p0",
    ]


def test_q_frontier_authorities_first(ray_session):
    from pie_ray.sources.linksynth import AUTH_FRAC, n_hosts_for

    t = q_frontier("unused")
    assert t.num_rows == 40
    hosts = t.column("host").to_pylist()
    pr = t.column("priority").to_pylist()
    assert pr == sorted(pr, reverse=True)
    # at most 2 per host, and the top picks are authority hosts
    assert all(hosts.count(h) <= 2 for h in set(hosts))
    n_auth = max(2, int(n_hosts_for(1200) * AUTH_FRAC))
    auth = {f"h{j}.example" for j in range(n_auth)}
    assert set(hosts[: 2 * n_auth]) <= auth
