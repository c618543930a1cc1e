"""triples_diff: set semantics (within-side multiplicity is not a change),
both directions, empty diff, partition independence."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from pie_ray.functions.graphops import triples_diff


def _ds(rows, blocks=2):
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)

OLD = [("a", "p", "x"), ("b", "p", "y"), ("c", "q", "z"), ("c", "q", "z")]
NEW = [("a", "p", "x"), ("b", "p", "y"), ("d", "r", "w")]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_diff_both_directions(ray_session):
    got = _norm(triples_diff(_ds(OLD), _ds(NEW)).to_pandas())
    want = _norm(
        pd.DataFrame(
            [
                {"subj": "c", "pred": "q", "obj": "z", "change": "removed"},
                {"subj": "d", "pred": "r", "obj": "w", "change": "added"},
            ]
        )
    )
    pd.testing.assert_frame_equal(got, want)


def test_multiplicity_is_not_a_change(ray_session):
    # same triple twice on one side, once on the other -> no diff row
    got = triples_diff(_ds([("a", "p", "x")] * 3), _ds([("a", "p", "x")])).to_pandas()
    assert len(got) == 0


def test_partition_independence(ray_session):
    a = _norm(triples_diff(_ds(OLD, 1), _ds(NEW, 1)).to_pandas())
    b = _norm(triples_diff(_ds(OLD, 4), _ds(NEW, 4)).to_pandas())
    pd.testing.assert_frame_equal(a, b)
