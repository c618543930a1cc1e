"""Driver-surface regression guards: the flagship KG / media / ANN entries
must stay within the driver's ~50-row recording cap (round-2 lesson: dict
ordering pushed them off the end), and every oracle key must name a
registered query."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import __ray_entry__ as entrymod

DRIVER_CAP = 50


def test_flagship_entries_inside_driver_cap():
    # round-5 rotation: the hash-verified KG oracle twins take two recorded
    # slots; media_resize/media_frames (rows-only, pytest-gated) moved
    # beyond the cap with media_features staying as the family's recorded
    # representative (see the queries() comment)
    names = list(entrymod.queries().keys())
    first = set(names[:DRIVER_CAP])
    for flagship in (
        "kg_mentions", "kg_mentions_oracle",
        "kg_triples", "kg_triples_oracle",
        "kg_graph", "kg_pagerank",
        "media_features",
        "knn_cosine", "knn_ann",
        "dedup_exact", "dedup_minhash", "corpus_curation",
    ):
        assert flagship in first, f"{flagship} fell beyond the {DRIVER_CAP}-row cap"


def test_every_oracle_key_is_a_query():
    qs = set(entrymod.queries().keys())
    for k in entrymod.oracle_sql():
        assert k in qs, f"oracle_sql key {k!r} has no queries() entry"


def test_no_duplicate_entry_names():
    names = list(entrymod.queries().keys())
    assert len(names) == len(set(names))
