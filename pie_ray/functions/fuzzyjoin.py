"""Fuzzy string self-join at edit distance 1 — entity-resolution adjunct.

Near-identical entity NAMES (one typo / one dropped character apart) are an
entity-linking signal the MinHash path misses for short strings: shingles of
a 15-char name barely overlap after one edit, but `lev(a, b) == 1` is exact.
This module finds ALL unordered pairs of distinct strings at Levenshtein
distance exactly 1, distributed, with NO quadratic all-pairs step:

1. **Deletion-neighborhood candidate generation** (FastSS / SymSpell
   blocking): every string emits itself plus each single-character
   deletion as a "variant". Two strings at lev distance 1 ALWAYS share a
   variant — a substitution pair shares the deletion at the substituted
   position; an insertion/deletion pair shares the shorter string itself
   (the longer one's deletion at the inserted slot). So joining on
   variants is a COMPLETE candidate generator for lev <= 1; no pair is
   missed (verified against a brute-force O(n^2) scan in tests).
2. **One variant-bucketed exchange**: variants hash to buckets
   (vectorized FNV via ``bucket_hash_strings``); within a bucket, equal
   variants form runs and each run enumerates its pairs with vectorized
   repeat/arange index math (no Python loop over rows). A run's size is
   bounded by the number of strings whose deletion sets intersect at one
   variant (~ alphabet x positions, not corpus size), so no run explodes.
3. **Vectorized verify**: candidates are checked for lev == 1 exactly with
   fixed-width char-matrix comparisons (mismatch count for equal lengths;
   first-mismatch + shifted-suffix equality for length-diff-1), never a
   per-pair DP.
4. **One pair-bucketed distinct**: the same (a, b) pair can surface from
   several variants in different buckets; a second tiny exchange on
   hash(a, b) dedups.

Driver never sees row-proportional data; the variant blowup is
sum(len+1) rows, the same expansion the SQL oracle performs. Strings
longer than ``max_len`` are rejected loudly (raise) rather than silently
truncated — entity names are short by construction."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pie_ray.util import bucket_count, bucket_hash_strings, rename_grouped

PAIR_SEP = "\x1f"  # never appears in entity names; keys the pair-dedup hash


def _char_matrix(strs: np.ndarray, width: int) -> np.ndarray:
    """(n, width) single-char matrix of a U-dtype string array ('\\x00' padded)."""
    a = strs.astype(f"U{width}")
    return a.view("U1").reshape(len(a), width) if len(a) else np.empty((0, width), "U1")


def _deletion_variants(names: list[str], max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """All (name, variant) rows: the name itself + each 1-char deletion.

    Vectorized over the batch: one char-matrix build, then one numpy
    concat+view per deletion POSITION (<= max_len iterations, each an
    O(batch) array op — same shape as bucket_hash_strings' byte loop)."""
    arr = np.asarray(names, dtype=f"U{max_len + 1}")
    lens = np.char.str_len(arr)
    if len(arr) and int(lens.max()) > max_len:
        raise ValueError(
            f"lev1_self_join: string longer than max_len={max_len}; "
            "raise max_len for this corpus"
        )
    mat = _char_matrix(arr, max_len + 1)
    out_names = [arr]
    out_vars = [arr.astype(f"U{max_len}")]  # identity variant
    for i in range(int(lens.max()) if len(arr) else 0):
        keep = lens > i
        if not keep.any():
            break
        sub = np.ascontiguousarray(
            np.concatenate([mat[keep, :i], mat[keep, i + 1 :]], axis=1)
        )
        out_names.append(arr[keep])
        out_vars.append(sub.view((np.str_, max_len)).ravel())
    return np.concatenate(out_names), np.concatenate(out_vars)


def _verify_lev1(a: np.ndarray, b: np.ndarray, width: int) -> np.ndarray:
    """Exact lev(a,b)==1 for string-array pairs, fully vectorized."""
    if len(a) == 0:
        return np.zeros(0, bool)
    la = np.char.str_len(a)
    lb = np.char.str_len(b)
    # orient: A is the longer (or equal) side
    swap = lb > la
    A = np.where(swap, b, a)
    B = np.where(swap, a, b)
    LA = np.where(swap, lb, la)
    LB = np.where(swap, la, lb)
    am = _char_matrix(A, width)
    bm = _char_matrix(B, width)
    diff = LA - LB
    out = np.zeros(len(a), bool)
    eq_len = diff == 0
    if eq_len.any():
        out[eq_len] = (am[eq_len] != bm[eq_len]).sum(axis=1) == 1
    one = diff == 1
    if one.any():
        ao, bo = am[one], bm[one]
        eq = ao == bo
        k = np.argmin(eq, axis=1)  # first mismatch (exists: lengths differ)
        # suffix test: deleting A[k] aligns A[k+1:] with B[k:] — via the
        # shifted equality matrix's reverse cumulative AND ('\x00' padding
        # compares equal on both sides past the ends)
        shifted = ao[:, 1:] == bo[:, :-1]
        suffix_ok = np.flip(
            np.logical_and.accumulate(np.flip(shifted, axis=1), axis=1), axis=1
        )
        out_one = suffix_ok[np.arange(len(k)), np.minimum(k, width - 2)]
        # k == width-1 means the strings agree through width-1 chars; with
        # LA <= width that can only be the appended-char case -> lev 1
        out_one = np.where(k >= width - 1, True, out_one)
        out[one] = out_one
    return out


def lev1_self_join(ds, col: str, max_len: int = 48, num_buckets: int | None = None):
    """All unordered pairs of distinct values of ``col`` at Levenshtein
    distance EXACTLY 1. Returns a Dataset with columns (name_a, name_b),
    name_a < name_b, each pair once."""
    nb = num_buckets or bucket_count(ds.size_bytes(), floor=32)
    width = max_len + 1

    def expand(t: pa.Table) -> pa.Table:
        vals = t.column(col)
        vals = pc.drop_null(vals.combine_chunks())
        names = np.unique(np.asarray(vals.to_pylist(), dtype=f"U{width}"))
        n, v = _deletion_variants(list(names), max_len)
        va = pa.array(v, pa.string())
        b = (bucket_hash_strings(va, salt=0x1E71) % nb).astype("int32")
        return pa.table(
            {
                "name": pa.array(n, pa.string()),
                "var": va,
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def pairs_per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"name_a": pa.array([], pa.string()), "name_b": pa.array([], pa.string())}
        )
        if g.num_rows == 0:
            return empty
        # distinct (name, var) then sort by var: equal vars form runs
        g = g.drop_columns(["bucket"]).group_by(["var", "name"]).aggregate([])
        order = pc.sort_indices(
            g, sort_keys=[("var", "ascending"), ("name", "ascending")]
        )
        g = g.take(order)
        names = np.asarray(g.column("name").to_pylist(), dtype=f"U{width}")
        var = np.asarray(g.column("var").to_pylist(), dtype=f"U{width}")
        n = len(names)
        new_run = np.ones(n, bool)
        new_run[1:] = var[1:] != var[:-1]
        run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
        pos = np.arange(n) - run_start  # 0..k-1 within each run
        # each row pairs with every EARLIER row of its run (vectorized
        # all-pairs enumeration: repeat + per-row arange via cumsum offsets)
        reps = pos
        total = int(reps.sum())
        if total == 0:
            return empty
        j_idx = np.repeat(np.arange(n), reps)
        excl = np.concatenate([[0], np.cumsum(reps)[:-1]])
        within = np.arange(total) - np.repeat(excl, reps)
        i_idx = run_start[j_idx] + within
        a, b = names[i_idx], names[j_idx]  # name_a < name_b by run sort order
        ok = _verify_lev1(a, b, width)
        return pa.table(
            {
                "name_a": pa.array(a[ok], pa.string()),
                "name_b": pa.array(b[ok], pa.string()),
            }
        )

    from pie_ray.util import drop_empty_blocks

    # barrier between the two exchanges (repo rule: two all-to-alls never
    # share a streaming plan) over the SMALL verified-pair intermediate;
    # drop_empty_blocks guards the empty-schema blocks bucketed map_groups
    # can emit under some layouts
    cand = drop_empty_blocks(
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_per_bucket, batch_format="pyarrow")
        .materialize(),
        schema=pa.schema([("name_a", pa.string()), ("name_b", pa.string())]),
    )

    # pair-level distinct: the same pair can emerge from several variants
    # landing in DIFFERENT buckets — one more tiny exchange on hash(a,b)
    def tag_pair(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "name_a" not in t.column_names:
            return pa.table(
                {
                    "name_a": pa.array([], pa.string()),
                    "name_b": pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        key = pc.binary_join_element_wise(
            t.column("name_a"), t.column("name_b"), PAIR_SEP
        )
        b = (bucket_hash_strings(key, salt=0x9A12) % nb).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def distinct_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "name_a": pa.array([], pa.string()),
                    "name_b": pa.array([], pa.string()),
                }
            )
        g = g.drop_columns(["bucket"]).group_by(["name_a", "name_b"]).aggregate([])
        return rename_grouped(g, ["name_a", "name_b"], ["name_a", "name_b"])

    return (
        cand.map_batches(tag_pair, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(distinct_pairs, batch_format="pyarrow")
    )


def q_fuzzy_name_match(sf_dir: str):
    """Driver entry: customer-name pairs one edit apart (near-duplicate
    entity names — the deterministic complement of MinHash linking)."""
    import os

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_name"]
    )
    return lev1_self_join(ds, "c_name", max_len=48)
