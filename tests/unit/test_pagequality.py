"""Page-structure quality features: planted-HTML exact counts, the two
structural gates (nav-heavy / markup soup), report accounting, and
partition independence of the stateless pass."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from pie_ray.stages.pagequality import (
    RATIO_SCALE,
    filter_by_page_quality,
    page_feature_batch,
    page_features,
    q_page_features,
)


def _pages() -> pa.Table:
    good_html = b"<html><body><p>plenty of body text here to read</p>" \
        b'<a href="https://x.com/a">one link</a></body></html>'
    nav_html = b'<html><body><a href="/a">aaaa</a><a href="/b">bbbb</a>' \
        b'<a href="/c">cccc</a> x</body></html>'
    soup_html = b"<html>" + b"<div>" * 200 + b"t" + b"</div>" * 200 + b"</html>"
    rows = [
        ("https://g.com/p", good_html, "plenty of body text here to read one link"),
        ("https://n.com/p", nav_html, "aaaa bbbb cccc x"),
        ("https://s.com/p", soup_html, "t"),
    ]
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_page_feature_batch_planted_counts():
    f = page_feature_batch(_pages())
    by_url = {
        r["url"]: r for r in f.to_pylist()
    }
    g = by_url["https://g.com/p"]
    assert g["n_links"] == 1 and g["anchor_chars"] == len("one link")
    assert g["html_bytes"] == len(_pages().column("html")[0].as_py())
    assert g["text_chars"] == len("plenty of body text here to read one link")
    n = by_url["https://n.com/p"]
    assert n["n_links"] == 3 and n["anchor_chars"] == 12  # 3 x "aaaa"-len
    # nav page: 12 anchor chars of 16 text chars -> 750000 millionths
    assert n["link_density_q"] == 12 * RATIO_SCALE // 16
    s = by_url["https://s.com/p"]
    assert s["n_links"] == 0 and s["text_chars"] == 1
    assert s["text_to_html_q"] == RATIO_SCALE // s["html_bytes"]
    # tag count: 200 opens + 200 closes + html open/close
    assert s["n_tags"] == 402


def test_filter_by_page_quality_gates_and_report(ray_session):
    ds = ray.data.from_arrow(_pages())
    kept, report = filter_by_page_quality(ds)
    urls = sorted(
        u
        for b in kept.iter_batches(batch_format="pyarrow")
        for u in b.column("url").to_pylist()
    )
    assert urls == ["https://g.com/p"]  # nav-heavy and soup both cut
    assert report["n_pages"] == 3 and report["n_kept"] == 1
    assert report["n_dropped"] == 2
    assert report["n_nav_heavy"] == 1 and report["n_markup_soup"] == 1


def test_page_features_partition_independent(ray_session):
    outs = []
    for parts in (1, 3):
        ds = ray.data.from_arrow(_pages()).repartition(parts)
        outs.append(sorted(page_features(ds).take_all(), key=lambda r: r["url"]))
    assert outs[0] == outs[1]


def test_q_page_features_shape(ray_session):
    t = q_page_features("unused")
    assert t.num_rows > 0
    assert t.column("url").to_pylist() == sorted(t.column("url").to_pylist())
    # extracted corpus pages all carry real text and markup
    assert all(v > 0 for v in t.column("html_bytes").to_pylist())
    assert all(v >= 0 for v in t.column("link_density_q").to_pylist())


def test_huge_anchor_still_counts_toward_density():
    # a nav page whose single anchor wraps >4 KiB of inner markup must
    # still register its anchor text in the density signal
    inner = b"<b>x</b> " * 1000  # ~9 KiB of markup, ~2000 visible chars
    html = b'<html><body><a href="/a">' + inner + b"</a> tail</body></html>"
    t = pa.table(
        {
            "url": pa.array(["https://n.com/big"], pa.string()),
            "html": pa.array([html], pa.binary()),
            "text": pa.array(["x " * 1000 + " tail"], pa.string()),
        }
    )
    f = page_feature_batch(t).to_pylist()[0]
    assert f["n_links"] == 1
    assert f["anchor_chars"] > 1500  # the full inner text, not 0
    assert f["link_density_q"] > RATIO_SCALE // 2  # still gated as nav


def test_unclosed_anchors_cost_linear_and_zero_text():
    html = b"<html><body>" + b'<a href="/x">' * 500 + b"tail</body></html>"
    t = pa.table(
        {
            "url": pa.array(["https://u.com/p"], pa.string()),
            "html": pa.array([html], pa.binary()),
            "text": pa.array(["tail"], pa.string()),
        }
    )
    f = page_feature_batch(t).to_pylist()[0]
    assert f["n_links"] == 500  # hrefs seen even without closing tags
    assert f["anchor_chars"] == 0  # no closed anchor -> no measured text


def test_same_url_different_content_gated_independently(ray_session):
    # recrawl: one copy is markup soup, the other is clean — the clean
    # copy must survive even though they share a url
    soup = b"<html>" + b"<div>" * 300 + b"t" + b"</div>" * 300 + b"</html>"
    clean = b"<html><body><p>plenty of good body text to keep here</p></body></html>"
    t = pa.table(
        {
            "url": pa.array(["https://r.com/p", "https://r.com/p"], pa.string()),
            "html": pa.array([soup, clean], pa.binary()),
            "text": pa.array(["t", "plenty of good body text to keep here"], pa.string()),
        }
    )
    import ray.data

    kept, report = filter_by_page_quality(ray.data.from_arrow(t))
    rows = kept.take_all()
    assert len(rows) == 1 and rows[0]["html"] == clean
    assert report["n_kept"] == 1 and report["n_markup_soup"] == 1
