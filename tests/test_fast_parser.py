"""Differential tests: fast_parse_html must build the same tree as the
stdlib parser (the byte-identical-extraction contract that parse_html_safe's
exception fallback depends on)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from xhs_ocr_ray.html.fast_parser import fast_parse_html
from xhs_ocr_ray.html.parser import Element, parse_html


def canon(el: Element) -> tuple:
    """Canonical tree form; adjacent text nodes merged (the two parsers may
    split text runs differently without changing meaning)."""
    kids: list = []
    for ch in el.children:
        if isinstance(ch, str):
            if kids and isinstance(kids[-1], str):
                kids[-1] += ch
            else:
                kids.append(ch)
        else:
            kids.append(canon(ch))
    return (el.tag, el.attr("class"), el.attr("id"), tuple(kids))


DIRECTED = [
    "<pre>keep<script>leaks()",            # unterminated script inside pre
    "<div>a<script>x = '</div>'",          # unterminated script with markup
    "<style>p { color: red; }",            # unterminated style at EOF
    "<p>a<script>x</script>b</p>",         # terminated script
    "<script/>after",                      # self-closed script has no body
    "<pre><style>.x{}</style>text</pre>",  # terminated style inside pre
    "<b>bold<i>both</b>italic?",           # misnested inline tags
    "<table><tr><td>a<td>b<tr><td>c</table>",  # implicit closes
]


@given(
    st.lists(
        st.sampled_from(
            ["<script>", "</script>", "<style>", "</style>", "<pre>", "</pre>",
             "<p>", "</p>", "<div class='x'>", "</div>", "text ", "a&amp;b",
             "<br>", "<!-- c -->", "x < y", "&#65;"]
        ),
        max_size=12,
    )
)
@settings(max_examples=150, deadline=2000)
def test_fast_matches_stdlib_fuzz(parts):
    doc = "".join(parts)
    assert canon(fast_parse_html(doc)) == canon(parse_html(doc))


def test_fast_matches_stdlib_directed():
    for doc in DIRECTED:
        assert canon(fast_parse_html(doc)) == canon(parse_html(doc)), doc


def test_unterminated_script_drops_tail():
    # stdlib drops unterminated CDATA content; fast parser must too — raw
    # markup must never leak into the tree (e.g. into <pre> extraction).
    tree = fast_parse_html("<pre>keep<script>var x = '<div>evil</div>'")
    assert "evil" not in tree.text_content()
    assert "keep" in tree.text_content()


def test_truncated_tag_no_catastrophic_backtracking():
    # A crawl page cut mid-tag (unquoted run, then a lone quote, never a
    # closing >) must tokenize in linear time. The naive nested-quantifier
    # attr regex took >50 s on 28 chars; the unrolled loop is microseconds.
    import time

    bad = "<p>before</p><a " + "x" * 2000 + '"' + "y" * 5000
    t0 = time.perf_counter()
    tree = fast_parse_html(bad)
    assert time.perf_counter() - t0 < 1.0
    assert "before" in tree.text_content()
    # and it still agrees with the stdlib parser on the same input
    assert canon(tree) == canon(parse_html(bad))


def test_truncated_tag_variants_match_stdlib():
    for doc in [
        '<a href="unclosed',            # quote never closes
        "<a href='unclosed",
        '<div ' + "z" * 64,             # plain run, no > ever
        '<a b="c" d' + "e" * 64 + "'",  # closed quote then lone quote
    ]:
        assert canon(fast_parse_html(doc)) == canon(parse_html(doc)), doc
