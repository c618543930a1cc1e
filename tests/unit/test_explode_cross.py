"""explode_list null/empty-list semantics and cross_join multiplicity."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from pie_ray.functions.relational import cross_join, explode_list


def test_explode_nulls_and_empties(ray_session):
    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "xs": pa.array(
                [[10, 20], [], None, [30]], pa.list_(pa.int64())
            ),
        }
    )
    got = (
        explode_list(ray.data.from_arrow(t).repartition(2), ["id"], "xs")
        .to_pandas()
        .sort_values(["id", "pos"])
        .reset_index(drop=True)
    )
    assert got.id.tolist() == [1, 1, 4]
    assert got.pos.tolist() == [0, 1, 0]
    assert got.val.tolist() == [10, 20, 30]


def test_cross_join_multiplicity(ray_session):
    big = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    small = pa.table(
        {"b": pa.array(["x", "y"]), "c": pa.array([7, 8], pa.int64())}
    )
    got = (
        cross_join(ray.data.from_arrow(big).repartition(3), small)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(got) == 6
    assert got[got.a == 2].b.tolist() == ["x", "y"]
    assert got[(got.a == 3) & (got.b == "y")].c.item() == 8
