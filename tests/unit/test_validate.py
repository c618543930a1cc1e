"""Row validation + quarantine: DuckDB-oracle parity on a planted corpus
(nulls, regex, set, range rules all exercised) and over the real lineitem
table, plus the semantic guarantees the docstring promises: nulls fail only
not_null, labels appear in rule order, and results are independent of
partitioning."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from pie_ray.functions.validate import (
    LINEITEM_RULES,
    in_range,
    in_set,
    matches,
    not_null,
    q_validate,
    tag_batch,
    validate,
    validate_oracle_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ---------------------------------------------------------------------------
# planted corpus: every rule kind + nulls + empty strings
# ---------------------------------------------------------------------------

PLANTED = pa.table(
    {
        "row_id": pa.array(range(8), pa.int64()),
        "email": pa.array(
            [
                "a@b.io",          # clean
                "not-an-email",    # regex fail
                None,              # null -> fails ONLY not_null
                "c@d.org",
                "",                # regex fail
                "e@f.net",
                None,              # null
                "bad",             # regex fail
            ],
            pa.string(),
        ),
        "age": pa.array([30, -5, 200, None, 18, 65, 120, 40], pa.int64()),
        "country": pa.array(
            ["us", "zz", "us", "ca", "ca", "xx", None, "us"], pa.string()
        ),
    }
)

RULES = [
    not_null("email"),
    matches("email", r"^[^@\s]+@[^@\s]+\.[^@\s]+$"),
    in_range("age", 0, 130),
    in_set("country", ["us", "ca"]),
]


def test_tag_batch_semantics():
    tagged = tag_batch(PLANTED, RULES)
    viol = tagged.column("violations").to_pylist()
    assert viol[0] == []  # fully clean row
    assert viol[1] == ["email:regex", "age:range", "country:set"]  # rule order
    # null email fails ONLY not_null, not the regex rule too
    assert viol[2] == ["email:null", "age:range"]
    # null age / null country fail no range/set rule
    assert viol[3] == []
    assert viol[6] == ["email:null"]
    assert viol[7] == ["email:regex"]


def test_validate_split_matches_duckdb(ray_session, tmp_path):
    path = os.path.join(str(tmp_path), "planted.parquet")
    pq.write_table(PLANTED, path)
    ds = ray.data.read_parquet(path)
    clean, quarantined = validate(ds, RULES)
    clean_df = _norm(clean.to_pandas())
    quar = quarantined.to_pandas()
    quar["violations"] = quar["violations"].map(lambda v: ",".join(v))
    quar_df = _norm(quar)

    con = duckdb.connect()
    con.register("t", PLANTED)
    pred = (
        "email IS NULL "
        "OR NOT regexp_matches(email, '^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$') "
        "OR NOT (age BETWEEN 0 AND 130) "
        "OR country NOT IN ('us', 'ca')"
    )
    oracle_clean = _norm(
        con.execute(f"SELECT * FROM t WHERE NOT coalesce({pred}, FALSE)").df()
    )
    oracle_quar = _norm(
        con.execute(
            f"""
            SELECT *, concat_ws(',',
              CASE WHEN email IS NULL THEN 'email:null' END,
              CASE WHEN NOT regexp_matches(email, '^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$')
                   THEN 'email:regex' END,
              CASE WHEN NOT (age BETWEEN 0 AND 130) THEN 'age:range' END,
              CASE WHEN country NOT IN ('us', 'ca') THEN 'country:set' END
            ) AS violations
            FROM t WHERE coalesce({pred}, FALSE)
            """
        ).df()
    )
    pd.testing.assert_frame_equal(clean_df, oracle_clean, check_dtype=False)
    pd.testing.assert_frame_equal(quar_df, oracle_quar, check_dtype=False)
    # nothing dropped silently: the two sides partition the input
    assert len(clean_df) + len(quar_df) == PLANTED.num_rows


def test_q_validate_matches_oracle(ray_session):
    got = _norm(q_validate(SF_DIR).to_pandas())
    assert len(got) > 0  # non-empty at every sf (driver requirement)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    oracle = _norm(con.execute(validate_oracle_sql()).df())
    pd.testing.assert_frame_equal(got, oracle, check_dtype=False)


def test_partition_independence(ray_session, tmp_path):
    path = os.path.join(str(tmp_path), "planted.parquet")
    pq.write_table(PLANTED, path)
    outs = []
    for blocks in (1, 4):
        ds = ray.data.read_parquet(path, override_num_blocks=blocks)
        _, quarantined = validate(ds, RULES, materialize=False)
        quar = quarantined.to_pandas()
        quar["violations"] = quar["violations"].map(lambda v: ",".join(v))
        outs.append(_norm(quar))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_lineitem_rules_shape():
    # the fixed demo ruleset stays parseable by the mask evaluator
    t = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_discount"],
    )
    tagged = tag_batch(t, LINEITEM_RULES)
    viol = tagged.column("violations")
    import pyarrow.compute as pc

    n_bad = pc.sum(
        pc.cast(pc.greater(pc.list_value_length(viol), 0), pa.int64())
    ).as_py()
    assert 0 < n_bad < t.num_rows
