"""clean_caption parity against the reference T5Embedder's normalization
(llamagen/language/t5.py:85-204), imported read-only as an oracle. The repo's
version is a distilled re-derivation; this test pins the behaviorally
significant cases to the reference output."""

import sys

import pytest

from sjd_tpu.models.t5 import clean_caption

torch = pytest.importorskip("torch")
pytest.importorskip("ftfy")
pytest.importorskip("bs4")
sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def ref_clean():
    from llamagen.language.t5 import T5Embedder

    emb = object.__new__(T5Embedder)  # no model load; methods only
    return lambda s: emb.clean_caption(s)


CASES = [
    "A photo of a cat",
    "A   photo   with   extra spaces  ",
    "visit https://example.com/image.png for more",
    "check www.site.org/page now",
    "an <b>html</b> <person> tag soup",
    "quotes “fancy” and ‘single’",
    "dashes - and – en — em",
    "ellipsis... and more....",
    "bad punct #### @@@ (parens) [brackets]",
    "html &amp;amp; entities &lt;tag&gt;",
    "trailing period .",
    "1/2 and 3-4 fractions",
    "UPPER Case MiXeD",
]


@pytest.mark.parametrize("text", CASES)
def test_clean_caption_matches_reference(ref_clean, text):
    import html as _html

    want = ref_clean(text)
    got = clean_caption(text)
    assert got == want, (got, want)
