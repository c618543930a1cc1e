"""JSONL/CSV sources: hazard round trips, schema coercion, pruning."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray.data

from pie_ray.sources.textfiles import (
    read_csv_docs,
    read_jsonl_docs,
    write_text_corpus,
)

HAZARD_TEXTS = [
    "plain ascii",
    "comma, separated, values",
    'quoted "text" with, everything',
    "multi\nline\ntext",
    "unicode: café — 中文",
    "",
    "trailing newline\n",
    "tab\tand\rcarriage",
]


def _hazard_table():
    n = len(HAZARD_TEXTS)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(HAZARD_TEXTS, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array([f"s{i % 2}" for i in range(n)], pa.string()),
            "n_chars": pa.array(
                [len(t) for t in HAZARD_TEXTS], pa.int64()
            ),
        }
    )


def _rows(ds):
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return list(zip(df["doc_id"].astype(int), df["text"], df["lang"], df["source"]))


def test_hazard_round_trip_both_formats(ray_session, tmp_path):
    t = _hazard_table()
    want = [
        (i, HAZARD_TEXTS[i], "en", f"s{i % 2}") for i in range(len(HAZARD_TEXTS))
    ]
    for fmt, reader in (("csv", read_csv_docs), ("jsonl", read_jsonl_docs)):
        out = str(tmp_path / fmt)
        write_text_corpus(ray.data.from_arrow(t).repartition(3), out, fmt)
        back = reader(out)
        assert _rows(back) == want, fmt
        sch = back.schema()
        assert sch.names == ["doc_id", "text", "lang", "source", "n_chars"]
        assert sch.types[0] == pa.int64()


def test_jsonl_missing_column_coerces_to_null(ray_session, tmp_path):
    p = tmp_path / "part.json"
    with open(p, "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "a", "source": "s"}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": "b", "source": "s"}) + "\n")
    ds = read_jsonl_docs(str(p))
    df = ds.to_pandas()
    assert list(df["doc_id"]) == [1, 2]
    assert df["lang"].isna().all()  # absent column becomes typed nulls
    assert df["n_chars"].isna().all()


def test_column_pruning(ray_session, tmp_path):
    out = str(tmp_path / "csv")
    write_text_corpus(ray.data.from_arrow(_hazard_table()), out, "csv")
    ds = read_csv_docs(out, columns=["doc_id", "text"])
    assert ds.schema().names == ["doc_id", "text"]
    assert ds.count() == len(HAZARD_TEXTS)


def test_unknown_format_raises(ray_session):
    import pytest

    with pytest.raises(ValueError):
        write_text_corpus(ray.data.from_arrow(_hazard_table()), "/tmp/x", "xml")
