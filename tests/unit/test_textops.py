"""Blocklist screen: RE2 word-boundary semantics over the vectorized
Arrow kernel (case folding, punctuation boundaries, empty text)."""

import pyarrow as pa
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


class TestEmbedText:
    def test_deterministic_and_partition_independent(self, ray_session):
        import ray.data

        from pie_ray.functions.textops import embed_text_batch

        t = pa.table(
            {
                "doc_id": pa.array(list(range(40)), pa.int64()),
                "text": pa.array(
                    [f"document number {i} about topic {i % 5}" for i in range(40)],
                    pa.string(),
                ),
            }
        )
        outs = []
        for nb in (1, 7):
            ds = ray.data.from_arrow(t).repartition(nb)
            rows = ds.map_batches(embed_text_batch, batch_format="pyarrow").take_all()
            outs.append({r["doc_id"]: tuple(r["embedding"]) for r in rows})
        assert outs[0] == outs[1] and len(outs[0]) == 40

    def test_cosine_tracks_similarity(self):
        import numpy as np

        from pie_ray.functions.textops import embed_text_array

        base = "the quick brown fox jumps over the lazy dog near the river bank"
        near = base.replace("lazy", "sleepy")
        far = "completely unrelated text discussing quantum chromodynamics at cern"
        v = embed_text_array([base, base, near, far])
        cos = v @ v.T
        assert abs(cos[0, 1] - 1.0) < 1e-6  # identical text -> cosine 1
        assert cos[0, 2] > 0.8  # one-word edit stays near
        assert cos[0, 2] > cos[0, 3] + 0.3  # unrelated text is far
        # empty and sub-n-gram texts embed to zero (never a false near-dup)
        z = embed_text_array([None, "", "ab"])
        assert not z.any()

    def test_feeds_knn_finds_planted_near_dup(self, ray_session):
        import numpy as np

        from pie_ray.functions.textops import embed_text_array

        docs = [f"unique filler text {i} with extra words {i*7}" for i in range(30)]
        docs.append(docs[3] + " tail")  # planted near-dup of doc 3
        v = embed_text_array(docs)
        sims = v @ v[-1]
        sims[-1] = -1.0
        assert int(np.argmax(sims)) == 3
