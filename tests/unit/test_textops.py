"""Blocklist screen: RE2 word-boundary semantics over the vectorized
Arrow kernel (case folding, punctuation boundaries, empty text)."""
def test_blocklist_screen_word_boundaries_and_case():
    import pyarrow as pa

    from pie_ray.functions.textops import blocklist_pattern, blocklist_screen_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "SLOW crash, slowly",  # 2 hits: case-fold + boundary stop
                    "no banned words here",
                    "",  # empty text
                    "leak leak panic.",  # 3 hits incl. trailing punct
                ],
                pa.string(),
            ),
        }
    )
    out = blocklist_screen_batch(t, blocklist_pattern()).to_pylist()
    assert [(r["n_blocked"], r["blocked"]) for r in out] == [
        (2, True),
        (0, False),
        (0, False),
        (3, True),
    ]
