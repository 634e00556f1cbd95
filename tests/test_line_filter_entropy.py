"""LineFilter (C4-style line cleaning) and char_entropy: planted-case
semantics, python-reference parity, empty/edge inputs.  (SQL parity is
gate-covered by queries `c4_line_filter` / `doc_char_entropy` /
`ccnet_buckets`.)"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from featureextraction_jl_ray.stages.text import (
    CharEntropy,
    LineDedup,
    LineFilter,
    char_entropy,
)


def _ref_entropy(t: str | None) -> float:
    """naive python reference: log2 entropy of the codepoint counts"""
    t = t or ""
    if not t:
        return 0.0
    counts = {}
    for c in t:
        counts[c] = counts.get(c, 0) + 1
    n = len(t)
    return -sum(c / n * math.log2(c / n) for c in counts.values())


def _ref_line_filter(t: str | None, min_words=3, sep="\n"):
    """naive python reference for the C4 rule: terminal punct after
    space/tab rtrim AND >= min_words whitespace words."""
    kept = []
    for line in (t or "").split(sep):
        r = line.rstrip(" \t")
        if r and r[-1] in '.!?"' and len(line.split()) >= min_words:
            kept.append(line)
    return sep.join(kept), len(kept)


def test_line_filter_planted_cases():
    texts = [
        'Good line here.\nshort.\nno punct at all\nAnother fine line!',
        'all lines fail\nme too',
        None,
        '',
        'Trailing spaces count as punct line.   \nx y z"\t\nmid  space ok?',
        'one\ntwo.\nthree words here.',
    ]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = LineFilter(out_col="clean")(tbl)
    got_text = out.column("clean").to_pylist()
    got_k = out.column("n_lines_kept").to_pylist()
    for i, t in enumerate(texts):
        want_text, want_k = _ref_line_filter(t)
        assert got_text[i] == want_text, (i, t)
        assert got_k[i] == want_k, (i, t)
    # original text column untouched when out_col differs
    assert out.column("text").to_pylist() == [t for t in texts]


def test_line_filter_in_place_and_empty_batch():
    tbl = pa.table({"text": ["Keep this full line.\ndrop"]})
    out = LineFilter()(tbl)
    assert out.column("text").to_pylist() == ["Keep this full line."]
    empty = pa.table({"text": pa.array([], type=pa.string())})
    out = LineFilter()(empty)
    assert out.num_rows == 0
    assert out.schema.names == ["text", "n_lines_kept"]


def test_line_filter_params():
    tbl = pa.table({"text": ["a b.\nc d e"]})
    # min_words=2 keeps the punct line; terminal override keeps none
    out = LineFilter(min_words=2)(tbl)
    assert out.column("text").to_pylist() == ["a b."]
    out = LineFilter(min_words=2, terminal_regex=r";$")(tbl)
    assert out.column("n_lines_kept").to_pylist() == [0]


def _ref_line_dedup(t: str | None, sep="\n"):
    seen, kept = set(), []
    for line in (t or "").split(sep):
        if line not in seen:
            seen.add(line)
            kept.append(line)
    return sep.join(kept), len(kept)


def test_html_extract_planted_cases():
    from featureextraction_jl_ray.stages.text import HtmlExtract

    html = (
        "<html><head><title>Site title words</title>"
        "<style>body { color: red }</style>"
        "<script>var nav = 'menu';</script></head>"
        "<body><!-- hidden comment words here -->"
        "<nav><ul><li>Home</li><li>About</li><li>Contact</li></ul></nav>"
        "<h1>A real headline with words</h1>"
        "<p>This paragraph has plenty of real text content.</p>"
        "<p>Entities: &lt;tag&gt; &amp; &quot;quoted&quot; &#39;s&nbsp;ok"
        " and &amp;lt; stays literal.</p>"
        "<div>- - - | | | - - -</div>"
        "<div>Second real block line with text.</div>"
        "</body></html>"
    )
    tbl = pa.table({"doc_id": [1], "html": [html]})
    out = HtmlExtract()(tbl)
    text = out.column("text").to_pylist()[0]
    lines = text.split("\n")
    # title kept (3 words, dense); nav items dropped (1 word each);
    # headline + paragraphs kept; separator line dropped (density);
    # script/style/comment contents gone entirely
    assert "Site title words" in lines
    assert "Home" not in lines and "About" not in lines
    assert "A real headline with words" in lines
    assert "This paragraph has plenty of real text content." in lines
    assert "Second real block line with text." in lines
    assert not any("- - -" in l for l in lines)
    assert "color: red" not in text and "var nav" not in text
    assert "hidden comment" not in text
    # entity decode: &amp; LAST so &amp;lt; -> literal &lt;
    ent_line = next(l for l in lines if l.startswith("Entities:"))
    assert ent_line == ('Entities: <tag> & "quoted" \'s ok and &lt; '
                        'stays literal.')
    assert out.column("n_lines_kept").to_pylist() == [len(lines)]
    # html col replaced by out_col
    assert "html" not in out.schema.names


def test_html_extract_empty_and_null():
    from featureextraction_jl_ray.stages.text import HtmlExtract

    tbl = pa.table({"doc_id": [1, 2, 3],
                    "html": pa.array([None, "", "<p></p><br>"],
                                     type=pa.string())})
    out = HtmlExtract()(tbl)
    assert out.column("text").to_pylist() == ["", "", ""]
    assert out.column("n_lines_kept").to_pylist() == [0, 0, 0]
    empty = pa.table({"html": pa.array([], type=pa.string())})
    out = HtmlExtract()(empty)
    assert out.num_rows == 0 and "text" in out.schema.names


def test_html_extract_feeds_c4_clean(ray_session):
    """HTML in, cleaned corpus out: the extraction output's line
    structure drives run_c4_clean directly, and cross-page duplicated
    content dedups after extraction."""
    from featureextraction_jl_ray.pipelines.c4clean import run_c4_clean
    from featureextraction_jl_ray.stages.text import HtmlExtract

    body = ("<p>The shared body paragraph reads fine today.</p>"
            "<p>A second proper sentence appears here.</p>")
    pages = [
        "<html><body><nav><li>Home</li></nav>" + body + "</body></html>",
        "<html><body><div>different chrome</div>" + body + "</body></html>",
        ("<html><body><p>Entirely unique page content stands alone.</p>"
         "</body></html>"),
    ]
    ds = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "html": pages}))
    extracted = ds.map_batches(HtmlExtract(count=False),
                               batch_format="pyarrow", zero_copy_batch=True)
    out = (run_c4_clean(extracted, num_buckets=4)
           .to_pandas().sort_values("doc_id"))
    # pages 1 and 2 clean identical -> corpus dedup keeps min doc_id
    assert out.doc_id.tolist() == [1, 3]
    assert out.loc[out.doc_id == 1, "text_clean"].iloc[0] == (
        "The shared body paragraph reads fine today.\n"
        "A second proper sentence appears here.")


def test_line_dedup_planted_cases():
    texts = [
        "nav bar\ncontent one.\nnav bar\ncontent two.\nnav bar",
        "a\na\na",
        "",
        None,
        "unique one\nunique two",
        "x\n\nx\n\ny",  # empty lines dedup too (2nd '' drops)
    ]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = LineDedup(out_col="clean")(tbl)
    got_text = out.column("clean").to_pylist()
    got_k = out.column("n_lines_kept").to_pylist()
    for i, t in enumerate(texts):
        want_text, want_k = _ref_line_dedup(t)
        assert got_text[i] == want_text, (i, t)
        assert got_k[i] == want_k, (i, t)
    # dedup is per-document: the same line in DIFFERENT docs survives
    assert got_text[0].count("nav bar") == 1
    assert "unique one" in got_text[4]


def test_line_dedup_empty_batch_and_in_place():
    empty = pa.table({"text": pa.array([], type=pa.string())})
    out = LineDedup()(empty)
    assert out.num_rows == 0 and out.schema.names == ["text", "n_lines_kept"]
    tbl = pa.table({"text": ["a\nb\na"]})
    assert LineDedup()(tbl).column("text").to_pylist() == ["a\nb"]


def test_char_entropy_matches_python_reference():
    texts = ["aabb", "", None, "é", "the quick brown fox", "aaaa",
             "ab" * 500 + "c", "日本語テキスト 混合 abc", "\t\n  ",
             "0123456789" * 3]
    got = char_entropy(pa.array(texts, type=pa.string()))
    want = np.array([_ref_entropy(t) for t in texts])
    assert np.allclose(got, want, atol=1e-12)
    # stage wrapper appends the column
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = CharEntropy()(tbl)
    assert out.schema.names == ["doc_id", "text", "char_entropy"]
    assert np.allclose(out.column("char_entropy").to_numpy(), want,
                       atol=1e-12)


def test_char_entropy_empty_batch():
    got = char_entropy(pa.array([], type=pa.string()))
    assert got.shape == (0,)


def test_clean_normalize_composes_strips_collapses():
    """NFC composition (pyarrow's utf8_normalize does NOT compose, so
    the stage normalizes via one NUL-joined unicodedata call), control
    strip incl. NUL, whitespace collapse, trim — vs a per-row python
    reference."""
    import re
    import unicodedata

    from featureextraction_jl_ray.stages.text import CleanNormalize

    texts = ["kéy \t é\x0b stuff", "a\x00b\x07c", None, "",
             "  x  ", "plain.", "é\x00é",  # NUL between marks
             "tab\tand\nnewline\r\nrun"]
    out = CleanNormalize()(pa.table({"text": texts})).column(
        "text").to_pylist()

    def ref(t):
        t = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", t or "")
        t = unicodedata.normalize("NFC", t)
        return re.sub(r"\s+", " ", t).strip()

    assert out == [ref(t) for t in texts]
    assert all(unicodedata.is_normalized("NFC", o) for o in out)
    assert out[0] == "kéy é stuff"      # composed
    # stripping the NUL lets the two marks' bases compose independently
    assert out[6] == "éé"
    # out_col + empty batch contracts
    t2 = CleanNormalize(out_col="norm")(pa.table({"text": ["á"]}))
    assert t2.column_names == ["text", "norm"]
    empty = CleanNormalize()(pa.table({"text": pa.array([], pa.string())}))
    assert empty.num_rows == 0


def test_c4_clean_pipeline_order_and_corpus_dedup(ray_session):
    """run_c4_clean end-to-end: within-page dedup runs BEFORE the line
    filter (punct-terminated boilerplate repeats collapse to one), and
    the corpus-level exact dedup keys on the CLEANED text (docs that
    clean identical collapse to min doc_id)."""
    import ray

    from featureextraction_jl_ray.pipelines.c4clean import run_c4_clean

    rows = [
        # doc 1: repeated punct-terminated boilerplate + one real line
        {"doc_id": 1, "text": "Buy our great product now!\n"
                              "Real content sentence one.\n"
                              "Buy our great product now!"},
        # doc 2: cleans to the same text as doc 3 (raw differs)
        {"doc_id": 2, "text": "Shared cleaned line stays.\nnoise"},
        {"doc_id": 3, "text": "Shared cleaned line stays.\nother noise"},
        # doc 4: nothing survives the line filter
        {"doc_id": 4, "text": "no punct here\nshort."},
    ]
    ds = ray.data.from_items(rows)
    out = run_c4_clean(ds, num_buckets=4).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert out.doc_id.tolist() == [1, 2]
    d1 = out.loc[0]
    # boilerplate survived ONCE (dedup-before-filter), content kept
    assert d1.text_clean == ("Buy our great product now!\n"
                             "Real content sentence one.")
    assert d1.n_lines_kept == 2
    # docs 2/3 cleaned identical -> min doc_id survives
    assert out.loc[1].text_clean == "Shared cleaned line stays."


def test_c4_clean_pipeline_empty_input(ray_session):
    import ray

    from featureextraction_jl_ray.pipelines.c4clean import run_c4_clean

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    assert run_c4_clean(ds, num_buckets=2).count() == 0


# ---------------------------------------------------------------------------
# GopherQuality — one planted failure per rule
# ---------------------------------------------------------------------------

def test_gopher_quality_planted_rules():
    from featureextraction_jl_ray.stages.text import GopherQuality

    good = ("the quick brown fox jumps over the lazy dog and runs away "
            "with all of that energy to spare every single day") * 1
    docs = {
        "good": good,                                   # passes everything
        "too_short": "the cat sat with joy",            # < min_words
        "symbols": good + " " + "# # # # # # # # # # # # # # #",
        "bullets": "\n".join("- the item of note" for _ in range(10)),
        "ellipsis": "\n".join("the story trails of..." for _ in range(10)),
        "nonalpha": good + " " + " ".join(["123"] * 80),  # alpha frac < 0.8
        "no_stop": " ".join(["lorem"] * 60),              # 0 stop hits
        "long_words": " ".join(["antidisestablishmentarian"] * 60),
        "empty": "",
    }
    t = pa.table({"doc_id": list(docs), "text": list(docs.values())})
    out = GopherQuality("text", min_words=20, min_stop_hits=2)(t)
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("gopher_pass").to_pylist()))
    assert got["good"] is True
    for k in docs:
        if k != "good":
            assert got[k] is False, k
    # null ratios + False on the empty doc
    row = out.to_pandas().set_index("doc_id").loc["empty"]
    assert np.isnan(row["mean_wlen"]) and row["n_words"] == 0


def test_gopher_quality_signal_values():
    from featureextraction_jl_ray.stages.text import GopherQuality

    t = pa.table({"text": ["the cat... sat\n- on the mat..."]})
    out = GopherQuality("text")(t).to_pandas().iloc[0]
    assert out["n_words"] == 7            # the cat... sat - on the mat...
    assert out["stop_hits"] == 2          # 'the' twice; 'on' not in the list
    assert out["bullet_frac"] == 0.5      # 1 of 2 lines starts with '-'
    assert out["ellipsis_frac"] == 0.5    # second line ends with ...
    assert out["symbol_ratio"] == 2 / 7


def test_script_profile_mixed_and_dominant():
    from featureextraction_jl_ray.stages.text import ScriptProfile

    t = pa.table({"text": [
        "Hello Привет 你好 γειά",   # mixed, Cyrillic max (6 letters)
        "12345 !!!",                # no letters
        "αβγ abc",                  # tie 3-3 → first in list order (Latin)
        None,                       # null → treated as ""
    ]})
    out = ScriptProfile("text", ("Latin", "Cyrillic", "Han", "Greek"))(t)
    df = out.to_pandas()
    assert list(df["dominant_script"]) == ["Cyrillic", "other", "Latin",
                                           "other"]
    r = df.iloc[0]
    assert r["n_letters"] == 5 + 6 + 2 + 4
    assert r["cyrillic_frac"] == 6 / 17
    assert np.isnan(df.iloc[1]["latin_frac"])
